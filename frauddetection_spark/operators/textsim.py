"""Text-similarity operators: shingling, deterministic MinHash + LSH
banding, SimHash (SURVEY.md §2.8 E1/E2 + north-star dedup family).

Design constraints:
- Everything is exact int64 arithmetic end-to-end, so every stage is
  bit-reproducible in the DuckDB oracle — unlike ``ml.feature
  .MinHashLSH`` whose hash seeds are engine-private (that MLlib path is
  exercised separately as a rows-only query).
- No Python UDFs: hashing is a codegen'd fold over char sequences;
  min-hashing is explode + groupBy-min; banding is a weighted sum.
- Scale: the candidate-pair stage is the whole point of LSH — the join
  is on (band, key), never all-pairs. Hub buckets (a degenerate key
  shared by many docs) would quadratically explode exactly like J4's
  hub contacts; `max_bucket_size` prunes them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Rolling hash h = h*31 + codepoint (mod p31): the engine's canonical
# cross-engine string hash (production: xxhash64).
P31 = 1_000_000_007

# MinHash universe prime and permutation count.
P_MH = 2_147_483_647  # 2^31 - 1
N_HASHES = 16
BAND_ROWS = 4  # 4 bands x 4 rows


def _lcg_params(n: int = N_HASHES) -> list[tuple[int, int, int]]:
    """Deterministic (i, a, b) hash-permutation params via a fixed LCG
    (seeded constants — identical literals are embedded in oracle SQL)."""
    out, x = [], 88172645463325252
    for i in range(n):
        x = (6364136223846793005 * x + 1442695040888963407) % (1 << 63)
        a = (x % (P_MH - 2)) + 1
        x = (6364136223846793005 * x + 1442695040888963407) % (1 << 63)
        b = x % P_MH
        out.append((i, a, b))
    return out


HASH_PARAMS = _lcg_params()


def rolling_hash_sql(col: str) -> str:
    """Spark-SQL fold: polynomial rolling hash over a string column's
    codepoints. Exact int64 at every step."""
    return (
        f"aggregate(transform(sequence(1, length({col})),"
        f" i -> ascii(substr({col}, i, 1))),"
        f" 0L, (acc, x) -> (acc * 31 + x) % {P31})"
    )


def rolling_hash_duckdb(col: str) -> str:
    """DuckDB twin of :func:`rolling_hash_sql` (list_reduce fold)."""
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT),"
        f" list_transform(range(1, length({col}) + 1),"
        f" i -> CAST(unicode({col}[i]) AS BIGINT))),"
        f" (acc, x) -> (acc * 31 + x) % {P31})"
    )


def word_shingles(docs: DataFrame, k: int = 3) -> DataFrame:
    """Distinct word k-shingles per document: (doc_id, shingle).

    Map-side: split → transform over positions → explode → distinct
    (the distinct shuffles on (doc_id, shingle) — unavoidable, it IS
    the set semantics)."""
    toks = F.split(F.col("text"), r"\s+")
    sh = F.transform(
        F.sequence(F.lit(0), F.size(toks) - k),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j + 1) for j in range(k)]
        ),
    )
    return (
        docs.select("doc_id", F.explode(sh).alias("shingle"))
        .distinct()
    )


SQL_WORD_SHINGLES = r"""
    SELECT doc_id, unnest(list_distinct(list_transform(
               range(1, len(toks) - 1),
               i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]
           ))) AS shingle
    FROM (SELECT doc_id, string_split_regex(text, '\s+') AS toks
          FROM documents)
"""


def hashed_shingles(shingles: DataFrame) -> DataFrame:
    """(doc_id, shingle) → (doc_id, h) with the rolling hash."""
    return shingles.select(
        "doc_id", F.expr(rolling_hash_sql("shingle")).alias("h")
    )


def minhash_signatures(hashed: DataFrame) -> DataFrame:
    """MinHash: sig_i = min over shingles of (a_i*h + b_i) mod p,
    i ∈ [0, N_HASHES). Returns (doc_id, i, sig).

    explode×16 then groupBy-min — partial aggregation (map-side
    combine) makes this one small shuffle keyed on (doc_id, i)."""
    params = F.array(
        *[
            F.struct(
                F.lit(i).alias("i"), F.lit(a).alias("a"), F.lit(b).alias("b")
            )
            for i, a, b in HASH_PARAMS
        ]
    )
    return (
        hashed.select("doc_id", "h", F.explode(params).alias("p"))
        .groupBy("doc_id", F.col("p.i").alias("i"))
        .agg(F.min((F.col("p.a") * F.col("h") + F.col("p.b")) % P_MH).alias("sig"))
    )


def lsh_bands(sigs: DataFrame) -> DataFrame:
    """Band keys: band = i div BAND_ROWS, key = Σ sig·31^(i mod r) —
    an order-sensitive exact-int combine (max < 2^48, no overflow).
    Returns (doc_id, band, key)."""
    w = F.pow(F.lit(31.0), (F.col("i") % BAND_ROWS)).cast("bigint")
    return (
        sigs.withColumn("band", (F.col("i") / BAND_ROWS).cast("int"))
        .groupBy("doc_id", "band")
        .agg(F.sum(F.col("sig") * w).alias("key"))
    )


def lsh_candidates(
    bands: DataFrame, max_bucket_size: int | None = None
) -> DataFrame:
    """Distinct candidate pairs sharing ≥1 band bucket: (doc_a, doc_b).

    The self-join is on (band, key) — never all-pairs. Degenerate
    buckets explode quadratically; `max_bucket_size` prunes them
    (recall loss only for docs whose every band is degenerate)."""
    if max_bucket_size is not None:
        keep = (
            bands.groupBy("band", "key")
            .agg(F.count("*").alias("n"))
            .filter(F.col("n") <= max_bucket_size)
            .select("band", "key")
        )
        bands = bands.join(F.broadcast(keep), ["band", "key"])
    a = bands.select(F.col("doc_id").alias("doc_a"), "band", "key")
    b = bands.select(F.col("doc_id").alias("doc_b"), "band", "key")
    return (
        a.join(b, ["band", "key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def exact_jaccard(
    pairs: DataFrame, shingles: DataFrame
) -> DataFrame:
    """Verify candidate pairs with exact shingle Jaccard:
    (doc_a, doc_b) → (doc_a, doc_b, n_common, jaccard).

    Joins the pair list back to the inverted index and counts common
    shingles; |A|,|B| come from per-doc sizes. All-int until the final
    division."""
    sizes = shingles.groupBy("doc_id").agg(F.count("*").alias("n"))
    common = (
        pairs.join(
            shingles.select(F.col("doc_id").alias("doc_a"), "shingle"), "doc_a"
        )
        .join(
            shingles.select(F.col("doc_id").alias("doc_b"), "shingle"),
            ["doc_b", "shingle"],
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_common"))
    )
    return (
        common.join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb")), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "n_common",
            (
                F.col("n_common").cast("double")
                / (F.col("na") + F.col("nb") - F.col("n_common"))
            ).alias("jaccard"),
        )
    )


# --- SimHash -----------------------------------------------------------------

SIMHASH_BITS = 32


def simhash(docs: DataFrame) -> DataFrame:
    """Per-doc 32-bit SimHash over whitespace tokens weighted by count.

    token → rolling hash → per-bit ±count contributions (32 parallel
    sum-aggregates over array elements — stays columnar, one shuffle on
    doc_id) → sign → packed bigint. Returns (doc_id, simhash)."""
    toks = (
        docs.select("doc_id", F.explode(F.split("text", r"\s+")).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("cnt"))
        .withColumn("h", F.expr(rolling_hash_sql("token")))
    )
    contrib = toks.select(
        "doc_id",
        *[
            F.when(F.expr(f"(h >> {b}) & 1") == 1, F.col("cnt"))
            .otherwise(-F.col("cnt"))
            .alias(f"c{b}")
            for b in range(SIMHASH_BITS)
        ],
    )
    agg = contrib.groupBy("doc_id").agg(
        *[F.sum(f"c{b}").alias(f"s{b}") for b in range(SIMHASH_BITS)]
    )
    packed = None
    for b in range(SIMHASH_BITS):
        term = F.when(F.col(f"s{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        packed = term if packed is None else packed + term
    return agg.select("doc_id", packed.cast("bigint").alias("simhash"))
