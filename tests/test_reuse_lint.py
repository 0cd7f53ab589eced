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

import os
import re
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from frauddetection_spark.operators.caching import release_caches
from frauddetection_spark.plans.registry import REGISTRY, load_all

load_all()


def _final_plan(df) -> str:
    """Final AQE plan text only — ``AdaptiveSparkPlan.toString`` appends
    an ``== Initial Plan ==`` section after execution, which would
    double every node count."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.split("== Initial Plan ==")[0]


# Every query whose defining function calls track_cache persists a
# shared frame the RETURNED plan is supposed to read from cache — each
# reference surfaces as an InMemoryTableScan in the final plan, so a
# dropped persist drives the count to zero (Catalyst sometimes saves
# the day with ReusedExchange — also acceptable: the work still runs
# once). Computed from source rather than hand-listed (r11) so every
# FUTURE persist-backed query is covered the commit it lands; the r10
# rewrites the lint was built for (q_bm25, q_rolling_dau,
# q_cooccurrence, q_dedup_minhash, q_rfm, q_item_cf, ...) are all in
# the computed set.
#
# Exceptions, each verified by the r11 catalog probe: their persists
# feed CONSTRUCTION-TIME fixpoint/driver-hop actions (convergence
# loops, collected constant-size matrices) and are fully consumed
# before the returned plan exists, so the final plan legitimately
# shows no cache read.
_CONSTRUCTION_CONSUMED = {
    "q_recursive_cte",      # frontier persists drive the fixpoint loop
    "q_dedup_groups",       # LSH pairs -> CC convergence at construction
    "q_attribution_markov", # transition matrix collected driver-side
}


def _persist_backed() -> list[str]:
    """Queries whose own source OR any called package helper (one
    import level, same resolution as the staleness tool) contains a
    ``track_cache`` site — a dropped persist in ``prefix_rank`` or
    ``ivf_topk`` must fail its consumers' lint rows, not just direct
    callers' (review r11: the hand-scan covered only the query body).
    Granularity caveat, stated honestly: the assertion is reuse >= 1
    per QUERY plan, so a consumer with both its own persist and a
    helper persist can mask exactly one of the two being dropped;
    per-frame attribution would need plan-node provenance the lint
    doesn't have."""
    import importlib
    import inspect

    from rotate_window import helpers_of, unwrap_query_fn

    def has_track_cache(fn) -> bool:
        try:
            return "track_cache" in inspect.getsource(fn)
        except (OSError, TypeError):
            return False

    out = []
    for name, spec in sorted(REGISTRY.items()):
        if name in _CONSTRUCTION_CONSUMED:
            continue
        fn = unwrap_query_fn(spec.fn)
        hit = has_track_cache(fn)
        if not hit:
            for hname, hrel in helpers_of(fn):
                mod = hrel.replace(os.sep, ".").removesuffix(".py")
                try:
                    helper = getattr(importlib.import_module(mod), hname)
                except (ImportError, AttributeError):
                    continue
                if has_track_cache(helper):
                    hit = True
                    break
        if hit:
            out.append(name)
    return out


_PERSIST_BACKED = _persist_backed()


def test_persist_backed_set_is_nonempty_and_mechanical():
    # the computed set must keep covering the r10 rewrite class the
    # lint was built for — an empty or shrunken-by-accident set would
    # silently disable the whole lint
    for expected in ("q_bm25", "q_rolling_dau", "q_cooccurrence",
                     "q_dedup_minhash", "q_rfm", "q_item_cf",
                     # helper-level persists (prefix_rank, pq_topk,
                     # pagerank_integer) must pull their consumers in
                     "q_user_deciles", "q_ann_pq", "q_pagerank"):
        assert expected in _PERSIST_BACKED
    assert len(_PERSIST_BACKED) >= 60


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
