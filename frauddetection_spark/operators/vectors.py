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


def round_half_away_np(arr, scale: int = 1):
    """THE numpy fixed-point kernel for the whole engine: round half
    AWAY FROM ZERO (matching Spark/DuckDB ``round()``), never
    ``np.rint``/``round`` (half-to-even) — a .5-cent value would
    silently diverge between the Python path and the JVM/oracle."""
    import numpy as np

    s = np.asarray(arr, dtype="float64") * scale
    return np.where(s >= 0, np.floor(s + 0.5), np.ceil(s - 0.5)).astype("int64")


def _quant_np(m):
    """Fixed-point embedding quantization (×QUANT), half away from zero."""
    return round_half_away_np(m, QUANT)


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


# Block count for the block-nested-loop kNN. Pair compute is O(n²·d)
# regardless (exact all-pairs); blocks only control distribution:
# 2·B·n rows are shuffled and each of the B² kernel calls handles an
# (n/B)×(n/B) tile. Raise B so a tile's int64 matrices fit an
# executor's Arrow batch comfortably (tile rows ≈ n/B).
KNN_BLOCKS = 4


def _block_pairs_cogrouped(emb: DataFrame, vec_col: str, n_blocks: int):
    """Replicate both sides over (left_block, right_block) keys and
    cogroup — the distributed block nested loop. Every (a, b) vector
    pair meets in EXACTLY ONE kernel call: (block(a), block(b)).

    This is the scale-out replacement for the round-1 driver-collect +
    sc.broadcast kernel: nothing touches the driver, the plan is fully
    lazy (zero jobs at construction), and each kernel sees two bounded
    pandas frames. Replication cost is n_blocks× each side — the
    standard block-nested-loop trade for exact all-pairs work.
    """
    base = emb.select("vec_id", vec_col)
    blk = F.pmod(F.col("vec_id"), F.lit(n_blocks)).cast("int")
    all_blocks = F.sequence(F.lit(0), F.lit(n_blocks - 1))
    # left side: rows of block lb, replicated once per right block rb
    left = base.withColumn("lb", blk).withColumn(
        "rb", F.explode(all_blocks)
    )
    # right side: rows of block rb, replicated once per left block lb.
    # Columns are RENAMED (r_vec_id / r_vec): cogrouping a frame with
    # itself hits a Catalyst self-join attribute-dedup quirk where the
    # UDF's right-side inputs stay bound to the LEFT's expression ids
    # and the right child's payload gets column-pruned away (KeyError
    # in the kernel under count()); distinct names force distinct
    # attributes.
    right = (
        emb.select(
            F.col("vec_id").alias("r_vec_id"), F.col(vec_col).alias("r_vec")
        )
        .withColumn("rb", F.pmod(F.col("r_vec_id"), F.lit(n_blocks)).cast("int"))
        .withColumn("lb", F.explode(all_blocks))
    )
    return left.groupBy("lb", "rb").cogroup(right.groupBy("lb", "rb"))


def knn_topk_bruteforce(
    spark, emb: DataFrame, k: int = 3, vec_col: str = "embedding"
) -> DataFrame:
    """Exact top-k cosine neighbors via a distributed numpy int64
    kernel (block nested loop, `_block_pairs_cogrouped`).

    Each kernel call does one BLAS-free exact integer matmul for its
    block tile and keeps only the tile-local top-k, so the n² pair
    space is never materialized as rows; a final per-vector window
    merges the B tile top-ks into the global top-k. Integer dot
    products are order-independent ⇒ results stay bit-identical to the
    SQL/DuckDB formulation. Rounding matches Spark/DuckDB round()
    (half away from zero), not numpy's half-to-even.

    Scale: exact all-pairs is O(n²·d) compute by definition — this
    distributes it evenly with no driver participation. For corpus
    sizes where n² itself is the problem, use the bucketed paths
    (q_ann_lsh_ml / q_ann_ivf), which reuse the same quantized
    arithmetic inside buckets.
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

    tile_schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("neighbor", LongType()),
            StructField("cos", DoubleType()),
        ]
    )

    def kernel(_key, left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty or right.empty:
            return pd.DataFrame(
                {"vec_id": [], "neighbor": [], "cos": []}
            ).astype({"vec_id": "int64", "neighbor": "int64", "cos": "float64"})
        qa = _quant(np.stack(left[vec_col].to_numpy()))
        qb = _quant(np.stack(right["r_vec"].to_numpy()))
        na = (qa * qa).sum(axis=1)
        nb = (qb * qb).sum(axis=1)
        aids = left["vec_id"].to_numpy()
        bids = right["r_vec_id"].to_numpy()
        cos = (qa @ qb.T) / np.sqrt(
            na[:, None].astype(np.float64) * nb[None, :].astype(np.float64)
        )
        out_id, out_nb, out_cos = [], [], []
        for i, vid in enumerate(aids):
            row = cos[i]
            mask = bids != vid  # exclude self
            order = np.lexsort((bids[mask], -row[mask]))[:k]
            out_id.extend([vid] * len(order))
            out_nb.extend(bids[mask][order].tolist())
            out_cos.extend(row[mask][order].tolist())
        return pd.DataFrame(
            {"vec_id": out_id, "neighbor": out_nb, "cos": out_cos}
        )

    tiles = _block_pairs_cogrouped(emb, vec_col, KNN_BLOCKS).applyInPandas(
        kernel, schema=tile_schema
    )
    from pyspark.sql import Window

    w = Window.partitionBy("vec_id").orderBy(F.col("cos").desc(), "neighbor")
    return (
        tiles.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("vec_id", "rank", "neighbor", "cos")
    )


def neardup_pairs_bruteforce(
    spark, emb: DataFrame, threshold: float, vec_col: str = "embedding"
) -> DataFrame:
    """Unordered pairs with cosine ≥ threshold — same distributed
    block-nested-loop kernel as `knn_topk_bruteforce`; qualifying pairs
    are emitted inside the kernel (id_a < id_b appears in exactly one
    tile), so the n² space is never materialized and no merge window
    is needed."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    _quant = _quant_np

    schema = StructType(
        [
            StructField("id_a", LongType()),
            StructField("id_b", LongType()),
            StructField("cos", DoubleType()),
        ]
    )

    def kernel(_key, left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty or right.empty:
            return pd.DataFrame({"id_a": [], "id_b": [], "cos": []}).astype(
                {"id_a": "int64", "id_b": "int64", "cos": "float64"}
            )
        qa = _quant(np.stack(left[vec_col].to_numpy()))
        qb = _quant(np.stack(right["r_vec"].to_numpy()))
        na = (qa * qa).sum(axis=1)
        nb = (qb * qb).sum(axis=1)
        aids = left["vec_id"].to_numpy()
        bids = right["r_vec_id"].to_numpy()
        cos = (qa @ qb.T) / np.sqrt(
            na[:, None].astype(np.float64) * nb[None, :].astype(np.float64)
        )
        keep = (cos >= threshold) & (aids[:, None] < bids[None, :])
        ai, bi = np.nonzero(keep)
        return pd.DataFrame(
            {"id_a": aids[ai], "id_b": bids[bi], "cos": cos[ai, bi]}
        )

    return _block_pairs_cogrouped(emb, vec_col, KNN_BLOCKS).applyInPandas(
        kernel, schema=schema
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


# --- IVF: learned codebook + multi-probe search -----------------------------

EMB_DIM = 64  # embeddings table dimension (asserted in quantize callers)


def adaptive_centroids(n: int, floor: int = 16, max_k: int = 1 << 16) -> int:
    """Smallest power of two K >= ``floor`` with K² >= n — the √n
    centroid-count rule that keeps IVF buckets at ~√n vectors — CAPPED
    at ``max_k`` (default 2¹⁶, the same cap as the twin's CASE
    ladder). With FIXED K the probed candidate space is ~n²·nprobe/K,
    a hidden quadratic: the r12 sf0.1→sf1 audit measured
    q_ann_ivf_sampled at 72× for 10× data (20k vectors / 16 centroids
    = 1250-vector buckets). With K ~ √n and fixed nprobe the candidate
    space is ~n^1.5·nprobe — the standard IVF scaling. Integer-only on
    purpose: the DuckDB twin computes the SAME K via a CASE ladder
    over count(*) (sql_ivf), and float log2 could disagree in the last
    ulp at power-of-4 boundaries. The cap exists because the ladder is
    finite (ADVICE r12): an uncapped Python side would pick K=131072
    at n=2³²+1 while the SQL ELSE arm stops at 65536, and the engines
    would diverge — both sides now share one bound; past it, bucket
    size grows linearly again (at n=2³² that is ~65k-vector buckets —
    shard the corpus before that point)."""
    K = floor
    while K * K < n and K < max_k:
        K *= 2
    return K


def _sql_adaptive_centroids(floor: int = 16, max_k: int = 1 << 16) -> str:
    """CASE ladder mirroring :func:`adaptive_centroids` for the twin:
    K = floor while n <= floor², doubling at each power-of-4 step."""
    arms = []
    K = floor
    while K < max_k:
        arms.append(f"WHEN cnt <= {K * K} THEN {K}")
        K *= 2
    return ("CASE " + " ".join(arms) + f" ELSE {max_k} END")


# Block count for the cogrouped centroid-scoring kernel: the corpus
# side is hash-split so every core gets work even when the parquet
# scan is a single partition (a 30 MB embeddings file at sf10 is ONE
# 128 MB-rule split holding 200k vectors). ASSIGN_BLOCKS is the FLOOR;
# assign_blocks(n) scales the count with the corpus so the per-task
# pandas frame stays bounded (ADVICE r12: a fixed 32 meant ~n/32 rows
# per task — ≈16 GB/task at 10⁹ vectors, the same hidden-linear-
# footprint class the scale audit exists to catch).
ASSIGN_BLOCKS = 32

# ~rows per kernel task: 64-dim int64 qv ≈ 0.5 KB/row ⇒ ~32 MB/task.
ASSIGN_TARGET_ROWS = 1 << 16


def assign_blocks(n_rows: int | None) -> int:
    """Deterministic block count for :func:`_centroid_topn`: the
    smallest power of two ≥ ``ASSIGN_BLOCKS`` with ≤
    ``ASSIGN_TARGET_ROWS`` corpus rows per block. Block count does NOT
    affect results (each block scores its vectors against the full
    replicated codebook), so the DuckDB twin needs no mirror — it only
    bounds per-task memory and sets parallelism. ``None`` (caller has
    no cheap row count) falls back to the floor, today's behavior."""
    if n_rows is None or n_rows <= ASSIGN_BLOCKS * ASSIGN_TARGET_ROWS:
        return ASSIGN_BLOCKS
    B = ASSIGN_BLOCKS
    while B * ASSIGN_TARGET_ROWS < n_rows:
        B *= 2
    return B


def _cos_sort_key(qv, n2, r):
    """Shared scoring for the centroid kernels: the cid-ascending-sorted
    codebook plus the (rows × K) ordering-key matrix — exact int64 dot,
    one IEEE double division, NaN mapped to +inf so it ranks FIRST
    under descending order exactly like Spark's double total order and
    the SQL twin's ORDER BY ccos DESC (true ccos is bounded by 1, so
    no collision). One definition, two consumers (`_centroid_topn`,
    `_lloyd_partials`) — the ranking and the training assignment can
    never drift apart."""
    import numpy as np

    cqv = np.stack(r["cqv"].to_numpy()).astype(np.int64)
    cn2 = r["cn2"].to_numpy().astype(np.float64)
    cids = r["cid"].to_numpy()
    # pre-sort the codebook by cid ascending: a STABLE argsort (or
    # argmax's first-wins) on the score column then breaks ties by
    # column index = by cid ascending, vectorizing the ordering
    ordc = np.argsort(cids, kind="stable")
    cids, cqv, cn2 = cids[ordc], cqv[ordc], cn2[ordc]
    with np.errstate(invalid="ignore", divide="ignore"):
        cos = (qv @ cqv.T) / np.sqrt(n2[:, None] * cn2[None, :])
    key = np.where(np.isnan(cos), np.inf, cos)
    return cids, key


def _assign_rank1(qv, n2, r):
    """(sorted cids, rank-1 centroid POSITION per row) — argmax over
    the shared key; first-wins on ties = lowest cid, identical to
    `_centroid_topn(..., n_top=1)`."""
    import numpy as np

    cids, key = _cos_sort_key(qv, n2, r)
    return cids, np.argmax(key, axis=1)


def _centroid_topn(
    frame: DataFrame,
    cent: DataFrame,
    n_top: int,
    n_rows: int | None = None,
) -> DataFrame:
    """(vec_id, cid, crank) — each vector's ``n_top`` centroids by
    (ccos DESC, cid ASC), as a cogrouped numpy int64 matmul.

    This replaces the Catalyst transform/aggregate scoring expression
    (r12): higher-order functions never enter whole-stage codegen, so
    the n·K·d assignment ran as interpreted per-element expression
    eval — invisible at K=16, but the sf1→sf10 audit caught the
    adaptive codebook at n=200k/K=512 spending ~6.5e9 interpreted
    evals in one scan task (>20 min). The same arithmetic as a
    per-block matmul is seconds, and the block split parallelizes a
    single-partition scan. Semantics are bit-identical to the old
    sort_array(struct(ccos, -cid, cid)) expression AND the DuckDB
    twin's row_number window: exact int64 dot, one IEEE double
    division, NaN ranked greatest (Spark's double order), ties by cid
    ascending. Fully lazy — no driver collect, no broadcast variable,
    zero jobs at construction (lint-pinned); the ≤K-row codebook is
    replicated onto each of the assign_blocks(n_rows) corpus blocks,
    the standard small-side replication of query_batch_topk.
    ``n_rows`` is an optional caller-known corpus size hint that only
    sizes the block split (per-task memory bound), never the result.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    B = assign_blocks(n_rows)
    left = frame.select("vec_id", "qv", "n2").withColumn(
        "b", F.pmod(F.col("vec_id"), F.lit(B)).cast("int")
    )
    right = (
        cent.select("cid", "cqv", "cn2")
        .withColumn("b", F.explode(F.sequence(F.lit(0), F.lit(B - 1))))
        .withColumn("b", F.col("b").cast("int"))
    )
    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("cid", LongType()),
            StructField("crank", IntegerType()),
        ]
    )

    def kern(_key, l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if l.empty or r.empty:
            return pd.DataFrame({"vec_id": [], "cid": [], "crank": []}).astype(
                {"vec_id": "int64", "cid": "int64", "crank": "int32"}
            )
        qv = np.stack(l["qv"].to_numpy()).astype(np.int64)
        vids = l["vec_id"].to_numpy()
        # scoring + NaN/tie semantics live in the shared _cos_sort_key
        # (one definition for ranking AND the Lloyd assignment)
        cids, key = _cos_sort_key(
            qv, l["n2"].to_numpy().astype(np.float64), r
        )
        n_keep = min(n_top, len(cids))
        idx = np.argsort(-key, axis=1, kind="stable")[:, :n_keep]
        return pd.DataFrame(
            {
                "vec_id": np.repeat(vids, n_keep),
                "cid": cids[idx].ravel(),
                "crank": np.tile(
                    np.arange(1, n_keep + 1, dtype=np.int32), len(vids)
                ),
            }
        )

    return (
        left.groupBy("b")
        .cogroup(right.groupBy("b"))
        .applyInPandas(kern, schema)
    )


def _lloyd_partials(
    frame: DataFrame,
    cent: DataFrame,
    n_rows: int | None = None,
) -> DataFrame:
    """(cid, psum: array<bigint>, pcnt: bigint) — per-block PARTIAL
    sums for one Lloyd update: each cogroup block assigns its vectors
    to their rank-1 centroid (the exact `_centroid_topn` ordering —
    shared `_assign_rank1` helper, so the two can never drift) and
    emits one row per non-empty centroid with the int64 elementwise
    sum and member count of its local assignees.

    This is the map-side-combine form of the centroid-mean update
    (guide §2.3 "aggregate before you shuffle"): the previous shape
    joined the n-row assignment back onto the n-row train set (a
    train-sized shuffle per iteration) and then posexploded n·d
    (vector, dim) rows through an aggregate — 6.4e10 exploded rows per
    iteration at 10⁹ 64-dim vectors. Partial sums shuffle ≤ B·K rows
    per iteration instead, independent of n. Exactness: int64 addition
    is associative and commutative, so Σ_blocks(partial sums) is
    bit-equal to the global Σ, the member counts are identical, and
    the one IEEE division + round downstream sees identical inputs —
    the DuckDB twin (sql_ivf, unchanged) still hash-matches."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        ArrayType,
        LongType,
        StructField,
        StructType,
    )

    B = assign_blocks(n_rows)
    left = frame.select("vec_id", "qv", "n2").withColumn(
        "b", F.pmod(F.col("vec_id"), F.lit(B)).cast("int")
    )
    right = (
        cent.select("cid", "cqv", "cn2")
        .withColumn("b", F.explode(F.sequence(F.lit(0), F.lit(B - 1))))
        .withColumn("b", F.col("b").cast("int"))
    )
    schema = StructType(
        [
            StructField("cid", LongType()),
            StructField("psum", ArrayType(LongType())),
            StructField("pcnt", LongType()),
        ]
    )

    def kern(_key, l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if l.empty or r.empty:
            return pd.DataFrame(
                {"cid": pd.Series([], dtype="int64"),
                 "psum": pd.Series([], dtype="object"),
                 "pcnt": pd.Series([], dtype="int64")}
            )
        qv = np.stack(l["qv"].to_numpy()).astype(np.int64)
        cids, pos = _assign_rank1(
            qv,
            l["n2"].to_numpy().astype(np.float64),
            r,
        )
        K = len(cids)
        sums = np.zeros((K, qv.shape[1]), dtype=np.int64)
        np.add.at(sums, pos, qv)
        cnts = np.bincount(pos, minlength=K).astype(np.int64)
        keep = cnts > 0
        return pd.DataFrame(
            {
                "cid": cids[keep],
                "psum": [s.tolist() for s in sums[keep]],
                "pcnt": cnts[keep],
            }
        )

    return (
        left.groupBy("b")
        .cogroup(right.groupBy("b"))
        .applyInPandas(kern, schema)
    )


def ivf_topk(
    emb: DataFrame,
    k: int = 3,
    n_centroids: int = 16,
    nprobe: int = 4,
    iters: int = 2,
    vec_col: str = "embedding",
    seeding: str = "low_id",
    sample_pct: int = 25,
    seed: int = 9001,
    n_rows: int | None = None,
) -> DataFrame:
    """IVF approximate kNN with a LEARNED codebook, fully deterministic
    and oracle-expressible.

    Codebook (``seeding="low_id"``): Lloyd iterations over the FULL
    table, seeded with the n_centroids lowest vec_ids. Each iteration
    assigns every vector to its max-cosine centroid (ties → lower cid)
    and re-estimates centroids as the requantized elementwise mean
    ``round(sum/count)`` — int64 sums and one IEEE double division keep
    both engines bit-identical. Clusters that lose all members drop out
    (deterministically, in both twins).

    Codebook (``seeding="sampled"`` — the 100-TB shape): Lloyd trains
    on a ~``sample_pct``% hash sample of the table only; seeds are the
    n_centroids sample vectors with the smallest ``portable_hash_u32``
    values (a deterministic scatter playing k-means‖'s random-spread
    role — seed choice independent of id order, still pure SQL), and
    the full table is touched ONLY by the final assignment + search
    pass. Codebook-training cost becomes O(sample), not O(table) — the
    difference between feasible and not at 10⁹ vectors.

    Search (both modes): every vector's top-``nprobe`` centroids are
    probed; the candidate set is vectors HOMED (rank-1) in a probed
    bucket, then exact quantized-cosine rerank picks top-k. A candidate
    pair meets through exactly one bucket (home is unique), so no dedup
    shuffle.

    Scale: assignment is a broadcast of the tiny codebook (n·n_centroids
    row expansion, map-side); centroid update shuffles sample·d rows per
    iteration; search joins on bucket — pair space ~n²·nprobe/B instead
    of n².
    """
    from pyspark.sql import Window

    from frauddetection_spark.operators.caching import track_cache
    from frauddetection_spark.operators.sampling import (
        portable_hash_u32,
        portable_uniform_keep,
    )

    # The quantized corpus is referenced by every Lloyd iteration, the
    # final assignment, and both sides of the bucket join; Spark plans
    # those as independent subtrees (no ReusedExchange), so without a
    # persist the parquet scan + quantization re-executes once per
    # reference — measured 9.9s → 1.8s at sf0.1 for the sampled path.
    # Lazy persist only (zero jobs at construction, lint-pinned);
    # caller releases via operators.graph.release_caches().
    q = track_cache(
        quantize(emb, vec_col).select("vec_id", "qv", "n2").persist()
    )
    if seeding == "sampled":
        train = q.filter(portable_uniform_keep(F.col("vec_id"), sample_pct, seed))
    elif seeding == "low_id":
        train = q
    else:
        raise ValueError(f"unknown seeding {seeding!r}")

    # Scoring + ranking against the codebook runs in the cogrouped
    # numpy kernel (_centroid_topn, r12): the r07 broadcast-argmin
    # Catalyst expression (transform + aggregate over the codebook
    # array) kept the shuffle away but never entered whole-stage
    # codegen — interpreted per-element eval made the n·K·d
    # assignment the plan's bottleneck once K went adaptive (the
    # sf1→sf10 audit caught it at >20 min in a single scan task at
    # n=200k/K=512; the matmul form is seconds). Ordering semantics
    # (ccos DESC, cid ASC, NaN greatest) and the exact int64-dot +
    # IEEE-division arithmetic are unchanged — the DuckDB twin still
    # hash-matches. The persisted probe index stays n·nprobe rows.
    if seeding == "sampled":
        cent = (
            train.withColumn(
                "_h", portable_hash_u32(F.col("vec_id"), seed + 1)
            )
            .orderBy("_h", "vec_id")
            .limit(n_centroids)
            .select(
                F.col("vec_id").alias("cid"),
                F.col("qv").alias("cqv"),
                F.col("n2").alias("cn2"),
            )
        )
    else:
        cent = q.filter(F.col("vec_id") < n_centroids).select(
            F.col("vec_id").alias("cid"),
            F.col("qv").alias("cqv"),
            F.col("n2").alias("cn2"),
        )
    for _ in range(iters):
        # Update via per-block PARTIAL sums from the assignment kernel
        # (_lloyd_partials): the r12 shape joined the n-row assignment
        # back onto train (a train-sized shuffle) and posexploded n·d
        # (vector, dim) rows per iteration; partials shuffle ≤ B·K
        # rows, independent of n, and the explode below runs over
        # B·K·d rows. Σ_blocks of int64 partials is bit-equal to the
        # global Σ and Σ pcnt is the member count, so round(sum/count)
        # sees identical inputs — sql_ivf (unchanged) still
        # hash-matches.
        comp = (
            _lloyd_partials(train, cent, n_rows=n_rows)
            .select("cid", "pcnt", F.posexplode("psum").alias("dim", "s"))
            .groupBy("cid", "dim")
            .agg(
                F.round(
                    F.sum("s").cast("double") / F.sum("pcnt")
                ).cast("bigint").alias("cv")
            )
        )
        # ≤ n_centroids rows, but its lineage embeds a full Lloyd pass;
        # without the persist each of the TWO references per following
        # iteration (score + update) re-runs every preceding pass —
        # O(2^iters) training scans.
        cent = track_cache(
            comp.groupBy("cid")
            .agg(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("dim", "cv"))),
                    lambda s: s["cv"],
                ).alias("cqv")
            )
            .withColumn(
                "cn2",
                F.aggregate(
                    "cqv", F.lit(0).cast("bigint"), lambda a, x: a + x * x
                ),
            )
            .select("cid", "cqv", "cn2")
            .persist()
        )

    # referenced twice (home + probes): persist the n·nprobe probe
    # list — the standard materialized IVF index.
    ranked = track_cache(
        _centroid_topn(q, cent, nprobe, n_rows=n_rows).persist()
    )
    home = ranked.filter(F.col("crank") == 1).select(
        F.col("vec_id").alias("r_vec_id"), F.col("cid").alias("bucket")
    )
    probes = ranked.select("vec_id", F.col("cid").alias("bucket"))
    qa = q.join(probes, "vec_id").select("bucket", "vec_id", "qv", "n2")
    qb = (
        q.select(
            F.col("vec_id").alias("r_vec_id"),
            F.col("qv").alias("r_qv"),
            F.col("n2").alias("r_n2"),
        )
        .join(home, "r_vec_id")
        .select("bucket", "r_vec_id", "r_qv", "r_n2")
    )

    # Rerank: exact quantized cosine over the candidate pairs. The
    # pair space (~n²·nprobe/B) rides inside a per-bucket numpy int64
    # matmul — one cogrouped kernel per bucket, emitting only each
    # probe's bucket-local top-k — NOT as n²·nprobe/B materialized rows
    # through Catalyst array lambdas (measured 20× slower per pair than
    # the matmul; this swap took q_ann_ivf* from ~9s to ~2s at sf0.1).
    # A (probe, candidate) pair meets in exactly one bucket (home is
    # unique), so tile top-ks merge with no dedup, same as
    # knn_topk_bruteforce. Arithmetic is the identical int64 dot +
    # one IEEE division — bit-equal to the SQL form the oracle runs.
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    tile_schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("neighbor", LongType()),
            StructField("cos", DoubleType()),
        ]
    )

    def rerank(_key, left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        # Zero-norm (all-zero quantized) vectors would produce NaN
        # cosines, which np.lexsort on -cos ranks LAST while SQL's
        # ORDER BY cos DESC ranks them FIRST — keep the tile's ordering
        # domain NaN-free so both engines provably agree (ADVICE r3).
        left = left[left["n2"].to_numpy() > 0]
        right = right[right["r_n2"].to_numpy() > 0]
        if left.empty or right.empty:
            return pd.DataFrame({"vec_id": [], "neighbor": [], "cos": []}).astype(
                {"vec_id": "int64", "neighbor": "int64", "cos": "float64"}
            )
        qa_m = np.stack(left["qv"].to_numpy()).astype(np.int64)
        qb_m = np.stack(right["r_qv"].to_numpy()).astype(np.int64)
        na = left["n2"].to_numpy()
        nb = right["r_n2"].to_numpy()
        aids = left["vec_id"].to_numpy()
        bids = right["r_vec_id"].to_numpy()
        cos = (qa_m @ qb_m.T) / np.sqrt(
            na[:, None].astype(np.float64) * nb[None, :].astype(np.float64)
        )
        out_id, out_nb, out_cos = [], [], []
        for i, vid in enumerate(aids):
            row = cos[i]
            mask = bids != vid  # exclude self
            order = np.lexsort((bids[mask], -row[mask]))[:k]
            out_id.extend([vid] * len(order))
            out_nb.extend(bids[mask][order].tolist())
            out_cos.extend(row[mask][order].tolist())
        return pd.DataFrame({"vec_id": out_id, "neighbor": out_nb, "cos": out_cos})

    tiles = qa.groupBy("bucket").cogroup(qb.groupBy("bucket")).applyInPandas(
        rerank, schema=tile_schema
    )
    w_rank = Window.partitionBy("vec_id").orderBy(F.col("cos").desc(), "neighbor")
    return (
        tiles.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= k)
        .select("vec_id", "rank", "neighbor", "cos")
    )


def sql_ivf(
    k: int = 3,
    n_centroids: int | None = 16,
    nprobe: int = 4,
    iters: int = 2,
    dim: int = EMB_DIM,
    seeding: str = "low_id",
    sample_pct: int = 25,
    seed: int = 9001,
) -> str:
    """DuckDB twin of :func:`ivf_topk` — the same Lloyd iterations as
    chained CTEs. Centroid means are generated per-dimension (the SQL
    is synthesized for the fixed embedding dim), packed back into a
    list; all arithmetic mirrors the Spark side exactly. With
    ``seeding="sampled"`` the Lloyd CTEs range over the hash-sampled
    ``train`` relation and only the final search scans ``q``.

    ``n_centroids=None`` = ADAPTIVE K: a ``params`` CTE computes
    :func:`adaptive_centroids`' K from count(*) via the integer CASE
    ladder, and the seeding reads ``(SELECT kc FROM params)`` — the
    oracle string stays static (registered at import) while K follows
    the data, matching the Spark side's driver-probe K exactly."""
    from frauddetection_spark.operators.sampling import (
        sql_portable_hash_u32,
        sql_portable_uniform_keep,
    )

    cos_expr = (
        "CAST(list_sum(list_transform(list_zip(q.qv, c.cqv),"
        " x -> x[1] * x[2])) AS DOUBLE)"
        " / sqrt(CAST(q.n2 AS DOUBLE) * CAST(c.cn2 AS DOUBLE))"
    )
    mean_terms = ", ".join(
        f"CAST(round(CAST(sum(qv[{j}]) AS DOUBLE) / count(*)) AS BIGINT)"
        for j in range(1, dim + 1)
    )
    n2_terms = " + ".join(f"cqv[{j}] * cqv[{j}]" for j in range(1, dim + 1))
    ctes = [f"q AS ({SQL_QUANTIZED})"]
    if n_centroids is None:
        ctes.append(
            f"params AS (SELECT {_sql_adaptive_centroids()} AS kc"
            " FROM (SELECT count(*) AS cnt FROM q))"
        )
        kc = "(SELECT kc FROM params)"
    else:
        kc = str(n_centroids)
    if seeding == "sampled":
        ctes.append(
            f"train AS (SELECT * FROM q WHERE "
            f"{sql_portable_uniform_keep('vec_id', sample_pct, seed)})"
        )
        # row_number instead of LIMIT so K can be a scalar subquery
        ctes.append(
            f"cent0 AS (SELECT cid, cqv, cn2 FROM ("
            f"SELECT vec_id AS cid, qv AS cqv, n2 AS cn2, row_number()"
            f" OVER (ORDER BY {sql_portable_hash_u32('vec_id', seed + 1)},"
            f" vec_id) AS rn FROM train) WHERE rn <= {kc})"
        )
    else:
        ctes.append("train AS (SELECT * FROM q)")
        ctes.append(
            f"cent0 AS (SELECT vec_id AS cid, qv AS cqv, n2 AS cn2 FROM q"
            f" WHERE vec_id < {kc})"
        )
    for i in range(iters):
        ctes.append(
            f"""score{i} AS (
    SELECT q.vec_id, c.cid, {cos_expr} AS ccos
    FROM train q CROSS JOIN cent{i} c
)"""
        )
        ctes.append(
            f"""assign{i} AS (
    SELECT vec_id, cid FROM (
        SELECT *, row_number() OVER (
            PARTITION BY vec_id ORDER BY ccos DESC, cid) AS rn
        FROM score{i}) WHERE rn = 1
)"""
        )
        ctes.append(
            f"""csum{i} AS (
    SELECT a.cid, list_value({mean_terms}) AS cqv
    FROM assign{i} a JOIN train USING (vec_id) GROUP BY a.cid
)"""
        )
        ctes.append(
            f"cent{i + 1} AS (SELECT cid, cqv,"
            f" CAST({n2_terms} AS BIGINT) AS cn2 FROM csum{i})"
        )
    final = f"cent{iters}"
    ctes.append(
        f"""scoref AS (
    SELECT q.vec_id, c.cid, {cos_expr} AS ccos
    FROM q CROSS JOIN {final} c
)"""
    )
    ctes.append(
        """rankedf AS (
    SELECT vec_id, cid, row_number() OVER (
        PARTITION BY vec_id ORDER BY ccos DESC, cid) AS crank
    FROM scoref
)"""
    )
    ctes.append(
        "home AS (SELECT vec_id AS r_vec_id, cid AS bucket"
        " FROM rankedf WHERE crank = 1)"
    )
    ctes.append(
        f"probes AS (SELECT vec_id, cid AS bucket FROM rankedf"
        f" WHERE crank <= {nprobe})"
    )
    pair_cos = (
        "CAST(list_sum(list_transform(list_zip(a.qv, b.qv),"
        " x -> x[1] * x[2])) AS DOUBLE)"
        " / sqrt(CAST(a.n2 AS DOUBLE) * CAST(b.n2 AS DOUBLE))"
    )
    ctes.append(
        f"""cands AS (
    SELECT a.vec_id, b.vec_id AS neighbor, {pair_cos} AS cos
    FROM (SELECT q.*, p.bucket FROM q JOIN probes p USING (vec_id)) a
    JOIN (SELECT q.vec_id, q.qv, q.n2, h.bucket
          FROM q JOIN home h ON q.vec_id = h.r_vec_id) b
      ON a.bucket = b.bucket AND a.vec_id != b.vec_id
)"""
    )
    joined = ",\n    ".join(ctes)
    return f"""
    WITH {joined}
    SELECT vec_id, rank, neighbor, cos FROM (
        SELECT *, row_number() OVER (
            PARTITION BY vec_id ORDER BY cos DESC, neighbor) AS rank
        FROM cands
    ) WHERE rank <= {k}
    ORDER BY vec_id, rank
    """


def query_batch_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 3,
    n_blocks: int = 32,
) -> DataFrame:
    """Asymmetric (serving-shape) exact top-k: a SMALL probe set
    against the full corpus, as a cogrouped numpy int64 matmul — the
    query-batch sibling of :func:`knn_topk_bruteforce`.

    Layout: the corpus lives in its natural hash block b =
    pmod(vec_id, B); the probe set is REPLICATED onto every block
    (explode over sequence(B)), so each (probe, corpus-vector) pair
    meets in exactly one kernel call and tile top-ks merge with no
    dedup. No driver collect, no broadcast variable — the whole plan
    is lazy (zero jobs at construction, lint-enforced) and the
    replication cost is |probes|·B rows of int64 vectors (tiny by the
    asymmetry assumption). Profiled at sf0.1: 4× faster than the
    Catalyst higher-order-function dot products (same lesson as the
    IVF rerank kernel) while keeping the identical int64-dot + single
    IEEE-division arithmetic the DuckDB twin runs.

    Inputs are PRE-QUANTIZED frames (vec_id, qv, n2) from
    :func:`quantize`. Zero-norm rows are dropped inside the kernel so
    the numpy ordering domain stays NaN-free (same guard as ivf_topk).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import Window
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    blk = F.pmod(F.col("vec_id"), F.lit(n_blocks)).cast("int")
    c = corpus.select(
        F.col("vec_id").alias("r_vec_id"),
        F.col("qv").alias("r_qv"),
        F.col("n2").alias("r_n2"),
    ).withColumn("b", F.pmod(F.col("r_vec_id"), F.lit(n_blocks)).cast("int"))
    p = probes.withColumn(
        "b", F.explode(F.sequence(F.lit(0), F.lit(n_blocks - 1)))
    )

    tile_schema = StructType(
        [
            StructField("query_id", LongType()),
            StructField("neighbor", LongType()),
            StructField("cos", DoubleType()),
        ]
    )

    def kernel(_key, left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        left = left[left["n2"].to_numpy() > 0]
        right = right[right["r_n2"].to_numpy() > 0]
        if left.empty or right.empty:
            return pd.DataFrame(
                {"query_id": [], "neighbor": [], "cos": []}
            ).astype(
                {"query_id": "int64", "neighbor": "int64", "cos": "float64"}
            )
        qm = np.stack(left["qv"].to_numpy()).astype(np.int64)
        qn2 = left["n2"].to_numpy().astype(np.float64)
        qids = left["vec_id"].to_numpy()
        cm = np.stack(right["r_qv"].to_numpy()).astype(np.int64)
        cn2 = right["r_n2"].to_numpy().astype(np.float64)
        cids = right["r_vec_id"].to_numpy()
        cos = (qm @ cm.T) / np.sqrt(qn2[:, None] * cn2[None, :])
        out_q, out_n, out_c = [], [], []
        for i, qid in enumerate(qids):
            row = cos[i]
            mask = cids != qid  # exclude self when the probe is in-corpus
            order = np.lexsort((cids[mask], -row[mask]))[:k]
            out_q.extend([qid] * len(order))
            out_n.extend(cids[mask][order].tolist())
            out_c.extend(row[mask][order].tolist())
        return pd.DataFrame(
            {"query_id": out_q, "neighbor": out_n, "cos": out_c}
        )

    tiles = p.groupBy("b").cogroup(c.groupBy("b")).applyInPandas(
        kernel, schema=tile_schema
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), "neighbor")
    return (
        tiles.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor", "cos")
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) — compressed-domain ANN for a query batch
# ---------------------------------------------------------------------------


def _pq_assign_np(QV, cent_pdf, subdim: int):
    """Per-subspace argmin-L2 assignment for one kernel block: exact
    int64 matmul per subspace present in ``cent_pdf``. Candidates are
    cid-ascending-sorted so ``np.argmin``'s first-minimum IS the
    (d2 ASC, cid ASC) tie rule of the r07-r13 Catalyst expression; the
    key drops the row-constant |s|² term (a uniform shift per row that
    cannot change the argmin or its ties). Returns
    ``[(mm, cids, pos, SUB)]`` — subspace id, its sorted candidate
    cids, each row's argmin POSITION into them, and the rows'
    subvector matrix — so callers can emit codes (encode) or
    per-centroid partial sums (training) without re-scoring."""
    import numpy as np

    out = []
    for mm in sorted(cent_pdf["m"].unique()):
        cm = cent_pdf[cent_pdf["m"] == mm].sort_values("cid")
        C = np.stack(cm["csub"].to_numpy()).astype(np.int64)
        cids = cm["cid"].to_numpy().astype(np.int64)
        SUB = QV[:, mm * subdim : (mm + 1) * subdim]
        key = (C * C).sum(axis=1)[None, :] - 2 * (SUB @ C.T)
        out.append((int(mm), cids, np.argmin(key, axis=1), SUB))
    return out


def _pq_partials(
    q: DataFrame, cent: DataFrame, subdim: int, n_rows: int | None = None
) -> DataFrame:
    """(m, cid, psum: array<bigint>, pcnt: bigint) — per-block PARTIAL
    sums for one PQ Lloyd update, the `_lloyd_partials` pattern applied
    per subspace (guide §2.3 aggregate-before-you-shuffle + §4.2 numpy
    kernel at the Python boundary). The r07-r13 shape broadcast-joined
    the codebooks onto the n·m subvector rows and ran the argmin as an
    interpreted array_min(transform(...aggregate(zip_with(...))))
    Catalyst expression — n·m·ksub interpreted lambda evals per pass
    (HOFs never enter whole-stage codegen; the r13 builder's #1
    deferred item, VERDICT r13 #3; an r14 attempt to unroll it into
    ksub positional codegen'd struct keys measured 3.1s → 10.2s at
    ksub=32 — the 32-branch conditional defeats subexpression sharing).
    Here each cogroup block scores its vectors against the full
    replicated codebook as one exact int64 matmul per subspace and
    emits ≤ B·m·ksub partial-sum rows. Exactness: int64 partials are
    associative, counts are exact, and the one IEEE division + round
    downstream sees identical inputs — sql_pq (unchanged) still
    hash-matches."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    B = assign_blocks(n_rows)
    left = q.select("vec_id", "qv").withColumn(
        "b", F.pmod(F.col("vec_id"), F.lit(B)).cast("int")
    )
    right = (
        cent.select("m", "cid", "csub")
        .withColumn("b", F.explode(F.sequence(F.lit(0), F.lit(B - 1))))
        .withColumn("b", F.col("b").cast("int"))
    )
    schema = StructType(
        [
            StructField("m", IntegerType()),
            StructField("cid", LongType()),
            StructField("psum", ArrayType(LongType())),
            StructField("pcnt", LongType()),
        ]
    )

    def kern(_key, l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if l.empty or r.empty:
            return pd.DataFrame(
                {
                    "m": pd.Series([], dtype="int32"),
                    "cid": pd.Series([], dtype="int64"),
                    "psum": pd.Series([], dtype="object"),
                    "pcnt": pd.Series([], dtype="int64"),
                }
            )
        QV = np.stack(l["qv"].to_numpy()).astype(np.int64)
        out_m: list = []
        out_cid: list = []
        out_psum: list = []
        out_pcnt: list = []
        for mm, cids, pos, SUB in _pq_assign_np(QV, r, subdim):
            K = len(cids)
            sums = np.zeros((K, SUB.shape[1]), dtype=np.int64)
            np.add.at(sums, pos, SUB)
            cnts = np.bincount(pos, minlength=K).astype(np.int64)
            keep = cnts > 0
            out_m.extend([mm] * int(keep.sum()))
            out_cid.extend(cids[keep].tolist())
            out_psum.extend(s.tolist() for s in sums[keep])
            out_pcnt.extend(cnts[keep].tolist())
        return pd.DataFrame(
            {"m": out_m, "cid": out_cid, "psum": out_psum, "pcnt": out_pcnt}
        )

    return left.groupBy("b").cogroup(right.groupBy("b")).applyInPandas(
        kern, schema
    )


def _pq_encode(
    q: DataFrame, cent: DataFrame, subdim: int, n_blocks: int
) -> DataFrame:
    """(vec_id, code: array<bigint>, n2) — the corpus encode pass as
    one blocked cogroup kernel sharing `_pq_assign_np` with the
    training update (the two can never drift). Replaces three r13
    operators at once: the broadcast-join + interpreted-HOF argmin
    over n·m subvector rows, the groupBy(vec_id)
    sort_array(collect_list) re-assembly of the m codes (an n·m-row
    shuffle), and the join back onto the corpus for n2 — the kernel
    emits the assembled code array (m-ascending, exactly the old
    sort_array order) with n2 carried through, one n-row cogroup
    exchange total."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        ArrayType,
        LongType,
        StructField,
        StructType,
    )

    left = q.select("vec_id", "qv", "n2").withColumn(
        "b", F.pmod(F.col("vec_id"), F.lit(n_blocks)).cast("int")
    )
    right = (
        cent.select("m", "cid", "csub")
        .withColumn(
            "b", F.explode(F.sequence(F.lit(0), F.lit(n_blocks - 1)))
        )
        .withColumn("b", F.col("b").cast("int"))
    )
    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("code", ArrayType(LongType())),
            StructField("n2", LongType()),
        ]
    )

    def kern(_key, l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if l.empty or r.empty:
            return pd.DataFrame(
                {
                    "vec_id": pd.Series([], dtype="int64"),
                    "code": pd.Series([], dtype="object"),
                    "n2": pd.Series([], dtype="int64"),
                }
            )
        QV = np.stack(l["qv"].to_numpy()).astype(np.int64)
        per_m = _pq_assign_np(QV, r, subdim)
        codes = np.stack(
            [cids[pos] for _mm, cids, pos, _sub in per_m], axis=1
        )
        return pd.DataFrame(
            {
                "vec_id": l["vec_id"].to_numpy(),
                "code": [c.tolist() for c in codes],
                "n2": l["n2"].to_numpy(),
            }
        )

    return left.groupBy("b").cogroup(right.groupBy("b")).applyInPandas(
        kern, schema
    )


def pq_topk(
    emb: DataFrame,
    k: int = 3,
    m: int = 4,
    subdim: int = 16,
    ksub: int = 8,
    iters: int = 1,
    cand: int = 12,
    qmod: int = 20,
    qcap: int = 512,
    vec_col: str = "embedding",
) -> DataFrame:
    """Product-quantization ANN for a query batch, fully deterministic
    and oracle-expressible (:func:`sql_pq` is the same algorithm in
    DuckDB).

    The 100-TB story PQ adds over IVF: the corpus index is m small
    CODES per vector (here 4 bytes) instead of the d-dim vector —
    memory drops ~128×, which is what lets a billion-vector index live
    in executor RAM. Pipeline:

    1. split each quantized vector into ``m`` contiguous ``subdim``-dim
       subvectors;
    2. train one ``ksub``-centroid codebook per subspace (Lloyd on
       exact-int L2: d² = |s|² + |c|² − 2⟨s,c⟩, ties → lower cid;
       means requantized exactly like ivf_topk);
    3. encode the corpus: per (vector, subspace) the argmin-d² cid;
    4. ADC search: each query precomputes an m×ksub dot-product LUT
       against the codebooks; the approximate dot of query·vector is
       the sum of m LUT lookups — a join on (m, cid) + sum, never
       touching corpus vectors;
    5. exact quantized-cosine rerank of the top-``cand`` ADC
       candidates per query.

    All similarity arithmetic is exact int64 up to the final IEEE
    divisions, so even the APPROXIMATE scores hash-match the SQL twin.
    Scale: codes + codebooks broadcast-size; the ADC join fans each
    corpus code row out only to the (small) query batch."""
    from pyspark.sql import Window

    from frauddetection_spark.operators.caching import track_cache

    q = track_cache(quantize(emb, vec_col).select("vec_id", "qv", "n2").persist())
    sub_structs = F.array(
        *[
            F.struct(
                F.lit(mm).alias("m"),
                F.slice("qv", mm * subdim + 1, subdim).alias("sub"),
            )
            for mm in range(m)
        ]
    )
    # r14: `subs` is no longer persisted — only the two CONSTANT-SIZE
    # slices below (codebook seeds, probe subvectors for the LUT) read
    # it, and their vec_id filters push below the Generate to the
    # persisted q's cache scan. The full n·m subvector frame — r13's
    # hot path, carrying a broadcast-joined interpreted-HOF argmin
    # over n·m·ksub candidate evals per training/encode pass — is
    # never materialized: assignment now runs inside the blocked
    # numpy kernels (_pq_partials / _pq_encode, guide §4.2; the IVF
    # _lloyd_partials precedent, VERDICT r13 #3). An intermediate r14
    # attempt to keep the Catalyst expression and unroll it into ksub
    # positional codegen'd struct keys measured 3.1s → 10.2s at
    # ksub=32 (the 32-branch conditional defeats codegen
    # subexpression sharing) — kernels, not expressions, are the
    # right tool at this candidate count.
    subs = q.select("vec_id", F.explode(sub_structs).alias("s")).select(
        "vec_id", "s.m", "s.sub"
    )
    cent = subs.filter(F.col("vec_id") < ksub).select(
        "m",
        F.col("vec_id").alias("cid"),
        F.col("sub").alias("csub"),
    )
    for _ in range(iters):
        # Lloyd update from per-block partial sums (the IVF
        # _lloyd_partials shape): the kernel assigns AND pre-aggregates
        # map-side, so the update shuffles ≤ B·m·ksub tiny rows
        # regardless of corpus size; Σ_blocks of int64 partials is
        # bit-equal to the global Σ and the one IEEE division + round
        # sees identical inputs — sql_pq (unchanged) still
        # hash-matches.
        part = _pq_partials(q, cent, subdim)
        comp = part.groupBy("m", "cid").agg(
            F.sum("pcnt").alias("_n"),
            *[
                F.sum(F.col("psum")[j]).alias(f"_s{j}")
                for j in range(subdim)
            ],
        )
        cent = track_cache(
            comp.select(
                "m",
                "cid",
                F.array(
                    *[
                        F.round(
                            F.col(f"_s{j}").cast("double") / F.col("_n")
                        ).cast("bigint")
                        for j in range(subdim)
                    ]
                ).alias("csub"),
            )
            .select("m", "cid", "csub")
            .persist()
        )

    # Probe set = the first `qcap` multiples of `qmod` — a FIXED
    # serving batch; corpus = everything else. The original unbounded
    # "every multiple of qmod" rule made probes 5% OF THE CORPUS, and
    # ADC work probes*corpus*m = quadratic — the r13 sf1->sf10 audit
    # measured it at 18.9x on a 10x decade. With the batch pinned,
    # ADC is qcap*n*m LUT gathers: linear per decade.
    probe = (F.col("vec_id") % qmod == 0) & (F.col("vec_id") < qmod * qcap)
    lut = (
        subs.filter(probe)
        .select(F.col("vec_id").alias("query_id"), "m", "sub")
        .join(F.broadcast(cent), "m")
        .select(
            "query_id",
            "m",
            "cid",
            F.aggregate(
                F.zip_with("sub", "csub", lambda x, y: x * y),
                F.lit(0).cast("bigint"),
                lambda a, x: a + x,
            ).alias("ldot"),
        )
    )
    # ADC as a cogrouped numpy LUT-gather kernel. The relational form
    # (codes ⋈ lut on (m, cid) → groupBy sum) materializes
    # |corpus|·|queries|·m shuffle rows — ~10⁹ at sf0.1 — because every
    # code row matches every query; ADC's whole point is that those
    # "rows" are table lookups. Layout mirrors query_batch_topk: codes
    # stay in their hash block, every query's LUT is replicated onto
    # each block, the kernel gathers adot[q, x] = Σ_m LUT[q, m, code]
    # as m int64 numpy gathers (exact in any order → still hash-equal
    # to the SQL twin). Per-block top-`cand` tiles merge under the same
    # (acos DESC, neighbor) order globally.
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    n_blocks = 32
    # r14: the encode pass is the _pq_encode kernel — it emits the
    # assembled m-ascending code array with n2 carried through, so the
    # r13 groupBy(vec_id) sort_array(collect_list) re-assembly (an
    # n·m-row shuffle) and the n2 join back onto the corpus are gone.
    codes_wide = _pq_encode(
        q.filter(~probe), cent, subdim, n_blocks
    ).withColumn("b", F.pmod(F.col("vec_id"), F.lit(n_blocks)).cast("int"))
    lut_rep = (
        lut.join(
            q.select(
                F.col("vec_id").alias("query_id"), F.col("n2").alias("qn2")
            ),
            "query_id",
        )
        .withColumn("b", F.explode(F.sequence(F.lit(0), F.lit(n_blocks - 1))))
    )
    tile_schema = StructType(
        [
            StructField("query_id", LongType()),
            StructField("neighbor", LongType()),
            StructField("acos", DoubleType()),
        ]
    )
    n_m, n_ksub = m, ksub

    def adc_kernel(_key, lt: pd.DataFrame, ct: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"query_id": [], "neighbor": [], "acos": []}
        ).astype(
            {"query_id": "int64", "neighbor": "int64", "acos": "float64"}
        )
        ct = ct[ct["n2"].to_numpy() > 0]
        lt = lt[lt["qn2"].to_numpy() > 0]
        if lt.empty or ct.empty:
            return empty
        qids = np.sort(lt["query_id"].unique())
        qpos = {int(qq): i for i, qq in enumerate(qids)}
        # dense LUT tensor [nq, m*ksub] (int64, exact)
        T = np.zeros((len(qids), n_m * n_ksub), dtype=np.int64)
        li = lt["query_id"].map(qpos).to_numpy()
        T[li, lt["m"].to_numpy() * n_ksub + lt["cid"].to_numpy()] = lt[
            "ldot"
        ].to_numpy()
        qn2 = np.zeros(len(qids), dtype=np.float64)
        qn2[li] = lt["qn2"].to_numpy()
        C = np.stack(ct["code"].to_numpy()).astype(np.int64)  # [nx, m]
        xids = ct["vec_id"].to_numpy()
        xn2 = ct["n2"].to_numpy().astype(np.float64)
        adot = np.zeros((len(qids), len(xids)), dtype=np.int64)
        for mm in range(n_m):
            adot += T[:, mm * n_ksub + C[:, mm]]
        acos = adot / np.sqrt(qn2[:, None] * xn2[None, :])
        out_q, out_n, out_a = [], [], []
        for i, qid in enumerate(qids):
            row = acos[i]
            mask = xids != qid  # queries never match themselves
            order = np.lexsort((xids[mask], -row[mask]))[:cand]
            out_q.extend([int(qid)] * len(order))
            out_n.extend(xids[mask][order].tolist())
            out_a.extend(row[mask][order].tolist())
        return pd.DataFrame(
            {"query_id": out_q, "neighbor": out_n, "acos": out_a}
        )

    tiles = (
        lut_rep.groupBy("b")
        .cogroup(codes_wide.groupBy("b"))
        .applyInPandas(adc_kernel, schema=tile_schema)
    )
    w_cand = Window.partitionBy("query_id").orderBy(
        F.col("acos").desc(), F.col("neighbor").asc()
    )
    cands = (
        tiles.withColumn("crn", F.row_number().over(w_cand))
        .filter(F.col("crn") <= cand)
        .select("query_id", "neighbor")
    )
    pair_dot = F.aggregate(
        F.zip_with("qa", "qb", lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda a, x: a + x,
    )
    rr = (
        cands.join(
            q.select(
                F.col("vec_id").alias("query_id"),
                F.col("qv").alias("qa"),
                F.col("n2").alias("na"),
            ),
            "query_id",
        )
        .join(
            q.select(
                F.col("vec_id").alias("neighbor"),
                F.col("qv").alias("qb"),
                F.col("n2").alias("nb"),
            ),
            "neighbor",
        )
        .withColumn(
            "cos",
            pair_dot.cast("double")
            / F.sqrt(F.col("na").cast("double") * F.col("nb").cast("double")),
        )
    )
    w_k = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor").asc()
    )
    return (
        rr.withColumn("rank", F.row_number().over(w_k).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor", "cos")
    )


def sql_pq(
    k: int = 3,
    m: int = 4,
    subdim: int = 16,
    ksub: int = 8,
    iters: int = 1,
    cand: int = 12,
    qmod: int = 20,
    qcap: int = 512,
) -> str:
    """DuckDB twin of :func:`pq_topk` — subspace split as unrolled
    UNION ALL slices, Lloyd as chained CTEs (sql_ivf's discipline),
    ADC as the same (m, cid) join + sum. `qcap` mirrors the Spark
    side's fixed probe batch (first qcap multiples of qmod)."""
    slices = "\n        UNION ALL ".join(
        f"SELECT vec_id, {mm} AS m,"
        f" qv[{mm * subdim + 1}:{(mm + 1) * subdim}] AS sub FROM q"
        for mm in range(m)
    )
    sub_dot = (
        "CAST(list_sum(list_transform(list_zip(s.sub, c.csub),"
        " x -> x[1] * x[2])) AS BIGINT)"
    )
    mean_terms = ", ".join(
        f"CAST(round(CAST(sum(s.sub[{j}]) AS DOUBLE) / count(*)) AS BIGINT)"
        for j in range(1, subdim + 1)
    )
    n2_terms = " + ".join(f"csub[{j}] * csub[{j}]" for j in range(1, subdim + 1))
    ctes = [
        f"q AS ({SQL_QUANTIZED})",
        f"""subs0 AS (
        {slices}
    )""",
        """subs AS (
        SELECT vec_id, m, sub,
               CAST(list_sum(list_transform(sub, x -> x * x)) AS BIGINT)
                   AS sub_n2
        FROM subs0
    )""",
        f"cent0 AS (SELECT m, vec_id AS cid, sub AS csub, sub_n2 AS cn2"
        f" FROM subs WHERE vec_id < {ksub})",
    ]
    for i in range(iters):
        ctes.append(
            f"""score{i} AS (
        SELECT s.vec_id, s.m, c.cid,
               s.sub_n2 + c.cn2 - 2 * {sub_dot} AS d2
        FROM subs s JOIN cent{i} c ON s.m = c.m
    )"""
        )
        ctes.append(
            f"""assign{i} AS (
        SELECT vec_id, m, cid FROM (
            SELECT *, row_number() OVER (
                PARTITION BY vec_id, m ORDER BY d2, cid) AS rn
            FROM score{i}) WHERE rn = 1
    )"""
        )
        ctes.append(
            f"""comp{i} AS (
        SELECT a.m, a.cid, list_value({mean_terms}) AS csub
        FROM assign{i} a
        JOIN subs s ON a.vec_id = s.vec_id AND a.m = s.m
        GROUP BY a.m, a.cid
    )"""
        )
        ctes.append(
            f"cent{i + 1} AS (SELECT m, cid, csub,"
            f" CAST({n2_terms} AS BIGINT) AS cn2 FROM comp{i})"
        )
    final = f"cent{iters}"
    ctes.append(
        f"""fscore AS (
        SELECT s.vec_id, s.m, c.cid,
               s.sub_n2 + c.cn2 - 2 * {sub_dot} AS d2
        FROM subs s JOIN {final} c ON s.m = c.m
    )"""
    )
    ctes.append(
        """fassign AS (
        SELECT vec_id, m, cid FROM (
            SELECT *, row_number() OVER (
                PARTITION BY vec_id, m ORDER BY d2, cid) AS rn
            FROM fscore) WHERE rn = 1
    )"""
    )
    ctes.append(
        f"codes AS (SELECT vec_id, m, cid FROM fassign"
        f" WHERE NOT (vec_id % {qmod} = 0 AND vec_id < {qmod * qcap}))"
    )
    ctes.append(
        f"""lut AS (
        SELECT s.vec_id AS query_id, s.m, c.cid, {sub_dot} AS ldot
        FROM subs s JOIN {final} c ON s.m = c.m
        WHERE s.vec_id % {qmod} = 0 AND s.vec_id < {qmod * qcap}
    )"""
    )
    ctes.append(
        """adot AS (
        SELECT l.query_id, c.vec_id AS neighbor,
               CAST(sum(l.ldot) AS BIGINT) AS adot
        FROM codes c JOIN lut l ON c.m = l.m AND c.cid = l.cid
        GROUP BY 1, 2
    )"""
    )
    ctes.append(
        """scored AS (
        SELECT a.query_id, a.neighbor,
               CAST(a.adot AS DOUBLE)
                   / sqrt(CAST(qq.n2 AS DOUBLE) * CAST(nn.n2 AS DOUBLE))
                   AS acos
        FROM adot a
        JOIN q qq ON a.query_id = qq.vec_id
        JOIN q nn ON a.neighbor = nn.vec_id
    )"""
    )
    ctes.append(
        f"""cands AS (
        SELECT query_id, neighbor FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY acos DESC, neighbor) AS crn
            FROM scored) WHERE crn <= {cand}
    )"""
    )
    ctes.append(
        """rr AS (
        SELECT c.query_id, c.neighbor,
               CAST(list_sum(list_transform(list_zip(a.qv, b.qv),
                    x -> x[1] * x[2])) AS DOUBLE)
                   / sqrt(CAST(a.n2 AS DOUBLE) * CAST(b.n2 AS DOUBLE)) AS cos
        FROM cands c
        JOIN q a ON c.query_id = a.vec_id
        JOIN q b ON c.neighbor = b.vec_id
    )"""
    )
    joined = ",\n    ".join(ctes)
    return f"""
    WITH {joined}
    SELECT query_id, rank, neighbor, cos FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cos DESC, neighbor) AS rank
        FROM rr
    ) WHERE rank <= {k}
    ORDER BY query_id, rank
    """
