"""Training-data pipeline queries beyond the survey's E-rows: document
chunking, deterministic sequence packing, TF-IDF term weighting, and
near-dup GROUP resolution (pairs → components → canonical keeper).

These are the operations a 100 TB pretraining-data pipeline runs after
quality filtering and dedup candidate generation (queries/text.py,
queries/similarity.py): split long documents into model-window chunks,
pack short ones into fixed-token sequences, weight terms for retrieval
or filtering, and collapse duplicate clusters to one keeper each. All
four are pure DataFrame ops (no Python in the hot path) and — except
the iterative component step — oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from frauddetection_spark.plans.registry import register
from frauddetection_spark.queries._util import r6, t

CHUNK_CHARS = 400
PACK_TARGET_TOKENS = 256
PACK_BUCKETS = 8
TFIDF_TOP = 3


# ---------------------------------------------------------------------------
# chunking: one row per fixed-size model-window slice
# ---------------------------------------------------------------------------


@register(
    "q_doc_chunks",
    oracle=f"""
    WITH spans AS (
        SELECT doc_id, length(text) AS n,
               unnest(range((length(text) + {CHUNK_CHARS} - 1)
                            // {CHUNK_CHARS})) AS chunk_id,
               text
        FROM documents
    )
    SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
           length(substr(text, CAST(chunk_id * {CHUNK_CHARS} + 1 AS INTEGER),
                         {CHUNK_CHARS})) AS chunk_len,
           sha256(substr(text, CAST(chunk_id * {CHUNK_CHARS} + 1 AS INTEGER),
                         {CHUNK_CHARS})) AS chunk_hash
    FROM spans ORDER BY doc_id, chunk_id
    """,
    survey="E4",
)
def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size character chunking: each document becomes
    ceil(len/400) rows of ≤400 chars — the map-only explode that feeds
    context-window-bounded training. Chunks are compared by sha256 so
    the oracle hash covers content without shipping bodies. At 100 TB
    this is scan → explode → project: zero shuffles."""
    docs = t(spark, sf_dir, "documents")
    n_chunks = F.floor(
        (F.length("text") + CHUNK_CHARS - 1) / CHUNK_CHARS
    ).cast("bigint")
    chunk = F.expr(
        f"substring(text, CAST(chunk_id * {CHUNK_CHARS} + 1 AS INT),"
        f" {CHUNK_CHARS})"
    )
    return (
        docs.select(
            "doc_id",
            "text",
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
        )
        .select(
            "doc_id",
            F.col("chunk_id").cast("bigint").alias("chunk_id"),
            F.length(chunk).alias("chunk_len"),
            F.sha2(chunk, 256).alias("chunk_hash"),
        )
        .orderBy("doc_id", "chunk_id")
    )


# ---------------------------------------------------------------------------
# sequence packing: contiguous-fill bins of ~target tokens
# ---------------------------------------------------------------------------


@register(
    "q_pack_sequences",
    oracle=f"""
    WITH sized AS (
        SELECT doc_id, doc_id % {PACK_BUCKETS} AS bucket,
               len(string_split_regex(text, '\\s+')) AS n_tokens
        FROM documents
    ),
    filled AS (
        SELECT doc_id, bucket, n_tokens,
               sum(n_tokens) OVER (
                   PARTITION BY bucket ORDER BY doc_id
                   ROWS UNBOUNDED PRECEDING
               ) - n_tokens AS start_tok
        FROM sized
    ),
    binned AS (
        SELECT doc_id, bucket, n_tokens,
               start_tok // {PACK_TARGET_TOKENS} AS seq_id
        FROM filled
    )
    SELECT CAST(bucket AS BIGINT) AS bucket, CAST(seq_id AS BIGINT) AS seq_id,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           min(doc_id) AS first_doc, max(doc_id) AS last_doc
    FROM binned GROUP BY bucket, seq_id ORDER BY bucket, seq_id
    """,
    survey="E4",
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic sequence packing: documents are hash-bucketed
    (doc_id % 8), ordered by id within each bucket, and assigned to the
    bin their running-token-offset falls in (contiguous fill, 256-token
    target) — the shuffle-once, coordination-free form of training
    sequence packing. Greedy first-fit packs tighter but is inherently
    sequential; contiguous fill parallelizes per bucket, so at 100 TB
    each bucket's window runs independently (NO global window — the
    bucket key bounds every partition's state)."""
    docs = t(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id",
        F.pmod(F.col("doc_id"), F.lit(PACK_BUCKETS)).alias("bucket"),
        F.size(F.split(F.col("text"), r"\s+")).cast("bigint").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    binned = sized.withColumn(
        "seq_id",
        F.floor(
            (F.sum("n_tokens").over(w) - F.col("n_tokens"))
            / PACK_TARGET_TOKENS
        ),
    )
    return (
        binned.groupBy(
            F.col("bucket").cast("bigint").alias("bucket"),
            F.col("seq_id").cast("bigint").alias("seq_id"),
        )
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("bucket", "seq_id")
    )


# ---------------------------------------------------------------------------
# TF-IDF: top terms per document
# ---------------------------------------------------------------------------


@register(
    "q_tfidf",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS token
        FROM documents
    ),
    tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
    df AS (SELECT token, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.token,
               tf.tf * ln((n.n_docs + 1.0) / (df.df + 1.0)) AS score
        FROM tf JOIN df USING (token) CROSS JOIN n
    )
    SELECT doc_id, rank, token, round(score, 6) AS score FROM (
        SELECT *, row_number() OVER (
            PARTITION BY doc_id ORDER BY score DESC, token) AS rank
        FROM scored
    ) WHERE rank <= {TFIDF_TOP}
    ORDER BY doc_id, rank
    """,
    survey="E4,E5",
)
def q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (smoothed idf = ln((N+1)/(df+1)))
    — the classic term-weighting pass for retrieval-based filtering and
    topic tagging. The corpus size N attaches via broadcast 1-row
    aggregate (never a driver .count()); df is one shuffle on token,
    the ranking one shuffle on doc. r6 rounding absorbs ln() libm
    1-ulp drift per the transcendental policy."""
    docs = t(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), r"\s+")).alias("token")
    )
    tf = tok.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    df = tok.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    n = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(df, "token")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "score",
            F.col("tf") * F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "token")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TFIDF_TOP)
        .select("doc_id", "rank", "token", r6("score").alias("score"))
        .orderBy("doc_id", "rank")
    )


# ---------------------------------------------------------------------------
# dup-group resolution: near-dup pairs → components → canonical keeper
# ---------------------------------------------------------------------------


@register(
    "q_dedup_groups",
    oracle=None,  # set below — needs the similarity module's CTEs
    survey="E1,E2,M2",
)
def q_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE dedup endgame: MinHash-LSH near-dup pairs (≥0.2 Jaccard,
    q_dedup_minhash's exact pipeline) become undirected edges, connected
    components collapse transitive duplicate clusters, and each group
    keeps min(doc_id) as canonical — what a pretraining pipeline
    actually emits (one keeper per cluster, not raw pairs). Documents
    with no near-dup form singleton groups. Iterative component step ⇒
    this query (like q_connected_components) executes at construction;
    the oracle is a recursive-CTE transitive closure."""
    from frauddetection_spark.operators.graph import connected_components
    from frauddetection_spark.operators.textsim import (
        exact_jaccard,
        lsh_bands,
        lsh_candidates,
        minhash_signatures,
        word_shingles,
    )
    from frauddetection_spark.queries.similarity import JACCARD_MIN

    docs = t(spark, sf_dir, "documents")
    sh = word_shingles(docs)
    pairs = (
        exact_jaccard(lsh_candidates(lsh_bands(minhash_signatures(sh))), sh)
        .filter(F.col("jaccard") >= JACCARD_MIN)
        .select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    )
    comp = connected_components(pairs)
    groups = docs.select("doc_id").join(
        comp.withColumnRenamed("node", "doc_id"), "doc_id", "left"
    ).select(
        "doc_id",
        F.coalesce("component", "doc_id").alias("group_id"),
    )
    return (
        groups.groupBy("group_id")
        .agg(
            F.count("*").alias("n_docs"),
            # string, not array<bigint>: cross-engine array stringification
            # differs; a joined string hashes identically in both twins
            F.expr(
                "array_join(transform(sort_array(collect_list(doc_id)),"
                " x -> cast(x AS string)), ',')"
            ).alias("members"),
        )
        .orderBy("group_id")
    )


def _dedup_groups_oracle() -> str:
    from frauddetection_spark.queries.similarity import sql_minhash_pair_ctes

    return f"""
    WITH RECURSIVE {sql_minhash_pair_ctes()},
    und AS (
        SELECT doc_a AS src, doc_b AS dst FROM dup
        UNION
        SELECT doc_b, doc_a FROM dup
    ),
    nodes AS (SELECT DISTINCT src AS node FROM und),
    reach(node, r) AS (
        SELECT node, node FROM nodes
        UNION
        SELECT reach.node, und.dst
        FROM reach JOIN und ON und.src = reach.r
    ),
    comp AS (SELECT node, min(r) AS component FROM reach GROUP BY node),
    g AS (
        SELECT d.doc_id, coalesce(c.component, d.doc_id) AS group_id
        FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
    )
    SELECT group_id, count(*) AS n_docs,
           string_agg(doc_id, ',' ORDER BY doc_id) AS members
    FROM g GROUP BY group_id ORDER BY group_id
    """


# late-bind the oracle (avoids a circular import at module load)
from frauddetection_spark.plans.registry import REGISTRY as _REG  # noqa: E402
import dataclasses as _dc  # noqa: E402

_REG["q_dedup_groups"] = _dc.replace(
    _REG["q_dedup_groups"], oracle=_dedup_groups_oracle()
)
