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
