"""Executed-plan reuse lint (VERDICT r10 item 2).

Round 10's reuse probe found ~18 plans re-running their full upstream
lineage once per reference (zero ReusedExchange) and fixed them with
aggregate-sized persists or single-evaluation restructures (MIGRATION
"reuse probe"; commits a942447, 1952c95, 147ef49, d06424c). This lint
pins those wins so the recompute class cannot silently return: each
persist-based plan is EXECUTED (collect — AQE only finalizes the plan
after an action) and its final plan must read the shared frame from
cache (InMemoryTableScan) or reuse the exchange (ReusedExchange) —
dropping the ``.persist()`` makes both vanish and fails a named test
here, not a future bench line.

The single-evaluation restructures (q_winsorize, q_edge_novelty) have
no shared frame left by construction; their pins assert the plan-shape
invariant the rewrite established instead (window count / no
join-back).
"""

from __future__ import annotations

import re

import pytest

from frauddetection_spark.operators.caching import release_caches
from frauddetection_spark.plans.registry import REGISTRY, load_all

load_all()


def _final_plan(df) -> str:
    """Final AQE plan text only — ``AdaptiveSparkPlan.toString`` appends
    an ``== Initial Plan ==`` section after execution, which would
    double every node count."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.split("== Initial Plan ==")[0]


# Queries whose r10 rewrite persists a shared aggregate-sized frame.
# Each reference to the cached frame surfaces as an InMemoryTableScan
# in the final plan, so a dropped persist drives the count to zero
# (Catalyst sometimes saves the day with ReusedExchange — also
# acceptable: the work still runs once).
_PERSIST_BACKED = [
    "q_bm25",               # per-doc tf table feeds tf, dl, corpus stats
    "q_rolling_dau",        # (user, day) frontier + per-day DAU table
    "q_reciprocal_flows",   # aggregated flow table, both self-join sides
    "q_class_rates",        # type-sized rate table feeds total + output
    "q_eb_shrinkage",       # user-sized quantized-rate table
    "q_backtest_snaive",    # (type, day) daily table, both shift sides
    "q_linear_interp",      # (user, hour) observations: bounds + spine
    "q_growth_accounting",  # (user, day) frontier + marked frame
    "q_retention_cohorts",  # cohort triangle read at offset 0 and k>0
    "q_dedup_minhash",      # banded LSH candidate table
    "q_cooccurrence",       # basket collect_set feeds pairs + marginals
    "q_mutual_info",        # small frontier shared across terms
    "q_hits",               # iterated hub/authority invariant frames
    "q_item_cf",            # whale-pruned basket + count tables
    "q_rfm",                # ranked frame feeds grid + bracketing filter
    "q_bigram_pmi",         # shared bigram/unigram LM tables
    "q_bigram_perplexity",  # shared LM tables
    "q_date_spread",        # shared boundary aggregate
]


@pytest.mark.parametrize("name", _PERSIST_BACKED)
def test_shared_frame_reused(spark, sf_dir, name):
    df = REGISTRY[name].fn(spark, sf_dir)
    try:
        df.collect()
        plan = _final_plan(df)
        reused = plan.count("InMemoryTableScan") + plan.count(
            "ReusedExchange"
        )
        assert reused >= 1, (
            f"{name}: final executed plan shows neither an "
            "InMemoryTableScan nor a ReusedExchange — the shared frame "
            "is being recomputed per reference (was a .persist() "
            "dropped?)"
        )
    finally:
        release_caches()


def test_winsorize_windows_run_once(spark, sf_dir):
    """r10: the clip side reads the raw projection, so the two rank
    windows run exactly once (bounds only). A regression back to
    clipping from the ranked frame doubles the Window nodes."""
    df = REGISTRY["q_winsorize"].fn(spark, sf_dir)
    try:
        df.collect()
        plan = _final_plan(df)
        assert len(re.findall(r"\bWindow\b", plan)) <= 2
    finally:
        release_caches()


def test_edge_novelty_no_join_back(spark, sf_dir):
    """r10: first_week is a window min over the edge key — the old
    groupBy + join-back shape must not return."""
    df = REGISTRY["q_edge_novelty"].fn(spark, sf_dir)
    try:
        df.collect()
        plan = _final_plan(df)
        assert "SortMergeJoin" not in plan
        assert "BroadcastHashJoin" not in plan
    finally:
        release_caches()
