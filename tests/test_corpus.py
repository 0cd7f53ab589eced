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
    n0 = docs.count()
    q = quality_gate(docs)
    e = exact_dedup(q)
    nd = neardup_dedup(e)
    assert n0 >= q.count() >= e.count() >= nd.count() > 0
    # texts are all distinct in the fixture → exact dedup drops nothing
    assert e.count() == q.count()


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
    once = prepare_corpus(docs)
    twice = prepare_corpus(once.drop("n_tokens", "uniq_ratio", "fingerprint"))
    assert once.count() == twice.count()
    a = once.select("doc_id")
    assert a.exceptAll(twice.select("doc_id")).count() == 0
