"""Embedding-vector operators: quantized cosine, brute-force kNN,
threshold near-dup pairs (SURVEY.md §2.8 E3).

Cross-engine determinism: float32 dot products drift between engines
(summation order, FMA), so similarity is computed on a fixed-point
int64 quantization (×10⁴) — integer dot products are exact in any
order; the single final division + sqrt are identical IEEE doubles
everywhere. Quantization is part of the query definition.

Scale: brute force is O(n²·d) — correct baseline and fine under ~10⁵
vectors per partition-pair; beyond that the LSH/IVF path (bucketed
candidates, exact rerank inside buckets) bounds the join. Both share
`cosine_pairs` for the rerank step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

QUANT = 10_000


def _quant_np(m):
    """numpy fixed-point quantization matching Spark/DuckDB round()
    (half away from zero, NOT numpy's half-to-even)."""
    import numpy as np

    s = m.astype("float64") * QUANT
    return np.where(s >= 0, np.floor(s + 0.5), np.ceil(s - 0.5)).astype("int64")


def quantize(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Add int64 fixed-point vector `qv` and its exact squared norm
    `n2` (map-only; |x|·QUANT ≤ ~10⁸ keeps x² sums far inside int64)."""
    qv = F.transform(
        F.col(vec_col),
        lambda x: F.round(x.cast("double") * QUANT).cast("bigint"),
    )
    return emb.withColumn("qv", qv).withColumn(
        "n2",
        F.aggregate(
            F.col("qv"), F.lit(0).cast("bigint"), lambda a, x: a + x * x
        ),
    )


def cosine_pairs(a: DataFrame, b: DataFrame) -> DataFrame:
    """All (a, b) cosine similarities from pre-quantized frames with
    columns (vec_id, qv, n2). Caller bounds the pair space (crossJoin
    for brute force, bucket-join for LSH)."""
    pa = a.select(
        F.col("vec_id").alias("id_a"), F.col("qv").alias("qa"), F.col("n2").alias("na")
    )
    pb = b.select(
        F.col("vec_id").alias("id_b"), F.col("qv").alias("qb"), F.col("n2").alias("nb")
    )
    dot = F.aggregate(
        F.zip_with(F.col("qa"), F.col("qb"), lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    return (
        pa.crossJoin(pb)
        .withColumn("dot", dot)
        .select(
            "id_a",
            "id_b",
            (
                F.col("dot").cast("double")
                / F.sqrt(F.col("na").cast("double") * F.col("nb").cast("double"))
            ).alias("cos"),
        )
    )


def knn_topk_bruteforce(
    spark, emb: DataFrame, k: int = 3, vec_col: str = "embedding"
) -> DataFrame:
    """Exact top-k cosine neighbors via a numpy int64-matmul kernel.

    Same algorithm as `cosine_pairs` + window top-k, radically cheaper
    physically: the right side is a broadcast (n×d int64 matrix, a few
    MB for ≤10⁵ vectors), each Arrow batch of left rows does one BLAS-
    free exact integer matmul, and top-k happens *inside the kernel* —
    so the job never materializes the n² pair rows and never shuffles
    them into a window. Integer dot products are order-independent ⇒
    results stay bit-identical to the SQL/DuckDB formulation.

    Rounding matches Spark/DuckDB round() (half away from zero), not
    numpy's half-to-even.

    Scale: right side must fit an executor (~10⁵×64 int64 = 50 MB);
    beyond that, LSH/IVF bucketing bounds each kernel call to one
    bucket (q_ann_lsh_ml shape) with this same kernel as the rerank.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    _quant = _quant_np
    rows = emb.select("vec_id", vec_col).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    Q = _quant(np.array([r[1] for r in rows]))
    n2 = (Q * Q).sum(axis=1)
    b_ids = spark.sparkContext.broadcast(ids)
    b_q = spark.sparkContext.broadcast(Q)
    b_n2 = spark.sparkContext.broadcast(n2)

    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("rank", IntegerType()),
            StructField("neighbor", LongType()),
            StructField("cos", DoubleType()),
        ]
    )

    def kernel(batches):
        ids_r, Qr, n2r = b_ids.value, b_q.value, b_n2.value
        for pdf in batches:
            qa = _quant(np.stack(pdf[vec_col].to_numpy()))
            na = (qa * qa).sum(axis=1)
            dots = qa @ Qr.T  # exact int64
            cos = dots / np.sqrt(
                na[:, None].astype(np.float64) * n2r[None, :].astype(np.float64)
            )
            out_id, out_rank, out_nb, out_cos = [], [], [], []
            for i, vid in enumerate(pdf["vec_id"].to_numpy()):
                row = cos[i]
                # exclude self; order by (cos desc, neighbor asc)
                mask = ids_r != vid
                order = np.lexsort((ids_r[mask], -row[mask]))[:k]
                cand_ids = ids_r[mask][order]
                cand_cos = row[mask][order]
                out_id.extend([vid] * len(order))
                out_rank.extend(range(1, len(order) + 1))
                out_nb.extend(cand_ids.tolist())
                out_cos.extend(cand_cos.tolist())
            yield pd.DataFrame(
                {
                    "vec_id": out_id,
                    "rank": np.array(out_rank, dtype=np.int32),
                    "neighbor": out_nb,
                    "cos": out_cos,
                }
            )

    return emb.select("vec_id", vec_col).mapInPandas(kernel, schema=schema)


def neardup_pairs_bruteforce(
    spark, emb: DataFrame, threshold: float, vec_col: str = "embedding"
) -> DataFrame:
    """Unordered pairs with cosine ≥ threshold, same broadcast
    int64-matmul kernel as `knn_topk_bruteforce` — pairs above
    threshold are emitted inside the kernel, so the n² space is never
    materialized as rows."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    _quant = _quant_np
    rows = emb.select("vec_id", vec_col).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    Q = _quant(np.array([r[1] for r in rows]))
    n2 = (Q * Q).sum(axis=1)
    b = spark.sparkContext.broadcast((ids, Q, n2))

    schema = StructType(
        [
            StructField("id_a", LongType()),
            StructField("id_b", LongType()),
            StructField("cos", DoubleType()),
        ]
    )

    def kernel(batches):
        ids_r, Qr, n2r = b.value
        for pdf in batches:
            qa = _quant(np.stack(pdf[vec_col].to_numpy()))
            na = (qa * qa).sum(axis=1)
            aids = pdf["vec_id"].to_numpy()
            cos = (qa @ Qr.T) / np.sqrt(
                na[:, None].astype(np.float64) * n2r[None, :].astype(np.float64)
            )
            # unordered pairs: keep id_a < id_b only
            keep = (cos >= threshold) & (aids[:, None] < ids_r[None, :])
            ai, bi = np.nonzero(keep)
            yield pd.DataFrame(
                {
                    "id_a": aids[ai],
                    "id_b": ids_r[bi],
                    "cos": cos[ai, bi],
                }
            )

    return emb.select("vec_id", vec_col).mapInPandas(kernel, schema=schema)


# DuckDB twin of quantize(): (vec_id, qv, n2)
SQL_QUANTIZED = f"""
    SELECT vec_id,
           list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * {QUANT}) AS BIGINT)) AS qv,
           CAST(list_sum(list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * {QUANT}) AS BIGINT)
                    * CAST(round(CAST(x AS DOUBLE) * {QUANT}) AS BIGINT)))
               AS BIGINT) AS n2
    FROM embeddings
"""

# DuckDB pairwise cosine over two quantized relations aliased a/b.
SQL_COS = (
    "CAST(list_sum(list_transform(list_zip(a.qv, b.qv),"
    " x -> x[1] * x[2])) AS DOUBLE)"
    " / sqrt(CAST(a.n2 AS DOUBLE) * CAST(b.n2 AS DOUBLE))"
)
