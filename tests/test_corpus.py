"""Corpus-prep pipeline: row accounting is exact and deterministic —
every dropped doc is attributable to one stage, near-dup survivors are
the min-id of each pair, and the pipeline is idempotent.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from frauddetection_spark.corpus import (
    exact_dedup,
    neardup_dedup,
    prepare_corpus,
    quality_gate,
)
from frauddetection_spark.plans.registry import load_all
from frauddetection_spark.sources.tables import load_table

REGISTRY = load_all()


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def test_stage_accounting(docs, spark, sf_dir):
    # persist the two shared stages and count each ONCE: unpersisted,
    # every count() re-ran the whole upstream funnel (q twice, e twice,
    # nd once through q+e again) — pure test wall-time, no coverage
    n0 = docs.count()
    q = quality_gate(docs).persist()
    e = exact_dedup(q).persist()
    try:
        n_q, n_e = q.count(), e.count()
        n_nd = neardup_dedup(e).count()
        assert n0 >= n_q >= n_e >= n_nd > 0
        # texts are all distinct in the fixture → exact dedup drops
        # nothing
        assert n_e == n_q
    finally:
        e.unpersist()
        q.unpersist()


def test_neardup_drops_higher_ids_of_pairs(docs, spark, sf_dir):
    out = neardup_dedup(docs, jaccard=0.8)
    pairs = (
        REGISTRY["q_shingle_jaccard"].fn(spark, sf_dir)
        .filter(F.col("jaccard") >= 0.8)
    )
    survivors = {r.doc_id for r in out.select("doc_id").collect()}
    pair_rows = pairs.collect()
    dropped = {p.doc_b for p in pair_rows}
    for row in pair_rows:
        assert row.doc_b not in survivors  # higher id dropped
        # lower id survives unless it is itself the higher id of a pair
        assert row.doc_a in survivors or row.doc_a in dropped


def test_pipeline_idempotent(docs):
    # persist the first pass: it anchors BOTH sides (the second pass's
    # input and the exceptAll probe), so unpersisted it re-runs the
    # whole funnel once per action — pure test wall-time, no coverage
    once = prepare_corpus(docs).persist()
    try:
        twice = prepare_corpus(
            once.drop("n_tokens", "uniq_ratio", "fingerprint")
        )
        assert once.count() == twice.count()
        a = once.select("doc_id")
        assert a.exceptAll(twice.select("doc_id")).count() == 0
    finally:
        once.unpersist()
