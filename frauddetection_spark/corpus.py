"""End-to-end pretraining-corpus preparation: the [EXT] text operators
composed into one pipeline (quality gate → exact dedup → near-dup
removal → fingerprint), the job a 100 TB corpus actually runs.

Stage order matters at scale: the cheap map-only quality gate runs
FIRST (shrinks everything downstream), exact hash dedup second (one
shuffle on a 32-byte key), MinHash-LSH near-dup last (the only
multi-shuffle stage, now over the smallest surviving set). Survivor
policy is deterministic everywhere: min(doc_id) wins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from frauddetection_spark.operators.textsim import (
    exact_jaccard,
    lsh_bands,
    lsh_candidates,
    minhash_signatures,
    word_shingles,
)

MIN_TOKENS = 5
MAX_TOKENS = 100_000
MIN_UNIQ_RATIO = 0.2
NEARDUP_JACCARD = 0.8


def quality_gate(docs: DataFrame) -> DataFrame:
    """Map-only quality filter (E5): token-count bounds + unique-token
    ratio. Adds n_tokens/uniq_ratio columns and keeps passing docs."""
    toks = F.split(F.col("text"), r"\s+")
    q = docs.withColumn("n_tokens", F.size(toks)).withColumn(
        "uniq_ratio",
        F.size(F.array_distinct(toks)).cast("double") / F.size(toks),
    )
    return q.filter(
        (F.col("n_tokens") >= MIN_TOKENS)
        & (F.col("n_tokens") <= MAX_TOKENS)
        & (F.col("uniq_ratio") > MIN_UNIQ_RATIO)
    )


def exact_dedup(docs: DataFrame) -> DataFrame:
    """E1: keep min(doc_id) per sha256(text). Hash-then-shuffle: the
    exchange moves 32-byte digests, not document bodies."""
    keepers = (
        docs.select("doc_id", F.sha2("text", 256).alias("h"))
        .groupBy("h")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    return docs.join(keepers, "doc_id", "left_semi")


def neardup_dedup(docs: DataFrame, jaccard: float = NEARDUP_JACCARD) -> DataFrame:
    """E2: MinHash-LSH candidates → exact-Jaccard verify ≥ threshold →
    drop the higher doc_id of each pair (union-find-free policy: a doc
    survives unless it near-duplicates a LOWER id; correct for pair
    clusters, approximate for chains — the standard corpus-dedup
    trade-off, deterministic either way)."""
    sh = word_shingles(docs)
    cands = lsh_candidates(lsh_bands(minhash_signatures(sh)))
    dupes = (
        exact_jaccard(cands, sh)
        .filter(F.col("jaccard") >= jaccard)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    return docs.join(dupes, "doc_id", "left_anti")


def fingerprint(docs: DataFrame) -> DataFrame:
    """Content address for incremental reprocessing (xxhash64 — engine-
    internal, no oracle constraint here)."""
    return docs.withColumn("fingerprint", F.xxhash64("text"))


def prepare_corpus(docs: DataFrame) -> DataFrame:
    """quality → exact dedup → near-dup dedup → fingerprint."""
    return fingerprint(neardup_dedup(exact_dedup(quality_gate(docs))))
