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


def _track_cache_call_sites(fn) -> int:
    """Number of ``track_cache(`` CALL SITES reachable from the query
    function (its own source plus helpers one import level deep,
    excluding the wrapper's definition in operators/caching.py) — the
    mechanical definition of "multi-persist" for the floor pin below."""
    import importlib
    import inspect

    from rotate_window import helpers_of

    seen: set[tuple[str, str]] = set()
    n = 0

    def count(f) -> None:
        nonlocal n
        try:
            src = inspect.getsource(f)
            rel = os.path.relpath(inspect.getsourcefile(f), _REPO)
        except (OSError, TypeError):
            return
        key = (f.__name__, rel)
        if key in seen or rel.endswith(os.path.join("operators", "caching.py")):
            return
        seen.add(key)
        n += src.count("track_cache(")

    count(fn)
    for hname, hrel in helpers_of(fn):
        mod = hrel.replace(os.sep, ".").removesuffix(".py")
        try:
            helper = getattr(importlib.import_module(mod), hname)
        except (ImportError, AttributeError):
            continue
        count(helper)
    return n


# ADVICE r11: reuse >= 1 per query lets a plan with BOTH its own
# persist and a helper-level persist drop exactly one of the two
# without failing. For every query with >= 2 reachable track_cache
# call sites, pin the InMemoryTableScan count MEASURED on the
# certified tree (sf0.001, shuffle_partitions=8 — the suite config);
# dropping any one persist removes at least one cache read and lands
# below the floor. Floors below the call-site count are deliberate:
# those queries' extra persists feed construction-time fixpoints
# (q_bfs_levels, q_pagerank, q_taint_tracing...) so only one cache
# read legitimately survives into the returned plan. ReusedExchange
# is excluded from the pinned number (exchange reuse is
# config-sensitive); the base >= 1 assertion still accepts it.
# Regenerate after an intentional persist-structure change:
#   run the query, collect(), count "InMemoryTableScan" in
#   _final_plan(df), update the entry in the same commit.
_MULTI_PERSIST_FLOOR = {
    "q_adamic_adar": 2,
    "q_ann_ivf": 8,
    "q_ann_ivf_sampled": 8,
    # r14 kernel rewrite: subs is no longer persisted (only constant-
    # size slices read it) and the encode/training argmin moved into
    # blocked cogroup kernels, so the final plan reads the persisted q
    # and trained-cent frames 4 times (measured on the suite config;
    # was 7 when the n·m subs frame was a third persist).
    "q_ann_pq": 4,
    "q_assortativity": 1,
    "q_bfs_levels": 1,
    "q_bpe_merge": 2,
    "q_cascade_delete": 3,
    "q_cooccurrence": 2,
    "q_corpus_funnel": 1,
    "q_date_spread": 2,
    "q_dedup_minhash": 2,
    "q_edge_weights": 2,
    "q_graph_jaccard": 2,
    "q_graph_triangles": 2,
    "q_growth_accounting": 2,
    "q_hits": 2,
    # q_hyperplane_est left this table in r13: the kernel rewrite's
    # single persisted signature frame (read by both spine sides)
    # replaced the old comp/sig/norms persist trio, so the query is
    # single-persist and rides the base >= 1 assertion.
    "q_minhash_est": 2,
    "q_money_loops": 2,
    "q_pagerank": 1,
    "q_peer_outlier": 2,
    "q_ppr": 2,
    "q_quantile_grid": 2,
    "q_quantile_interp": 2,
    "q_random_walks": 2,
    # r13 flatten: the three ntile passes rank narrow PROJECTIONS of
    # one persisted base and join back (they no longer chain, so the
    # nested per-pass range frames left the top-level plan); the final
    # plan reads the persisted base + the last join's rank frame — the
    # other rank frames are read inside AQE-materialized stages.
    "q_rfm": 2,
    "q_rolling_dau": 2,
    "q_sampling_weights": 2,
    "q_sequence_gaps": 2,
    "q_sparse_cosine": 2,
    "q_taint_tracing": 1,
}


def test_multi_persist_queries_have_pinned_floors():
    """Every persist-backed query with >= 2 reachable track_cache call
    sites must carry an explicit floor — a future multi-persist query
    cannot silently ride the >= 1 base assertion."""
    from rotate_window import unwrap_query_fn

    multi = {
        name
        for name in _PERSIST_BACKED
        if _track_cache_call_sites(unwrap_query_fn(REGISTRY[name].fn)) >= 2
    }
    untriaged = multi - set(_MULTI_PERSIST_FLOOR)
    assert untriaged == set(), (
        f"multi-persist queries without a pinned reuse floor: "
        f"{sorted(untriaged)} — measure the final-plan "
        "InMemoryTableScan count and add an entry to "
        "_MULTI_PERSIST_FLOOR"
    )
    # and the pin list must not rot: every entry still is multi-persist
    stale = set(_MULTI_PERSIST_FLOOR) - multi
    assert stale == set(), f"pinned floors for non-multi-persist queries: {sorted(stale)}"


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


# Queries whose sf0.001 result is EMPTY: AQE's EmptyRelation
# propagation elides the whole final plan (cache reads included), so
# the reuse assertion is vacuous at the suite sf — lint them at the
# oracle sf (sf0.01), where the result is non-empty and the plan is
# real. (q_fuzzy_match returns 0 histogram rows at sf0.001: no two
# parts share a (brand, size) block there.)
_LINT_AT_ORACLE_SF = {"q_fuzzy_match"}


@pytest.mark.parametrize("name", _PERSIST_BACKED)
def test_shared_frame_reused(spark, sf_dir, name):
    if name in _LINT_AT_ORACLE_SF:
        from tests.conftest import SF_DIR_ORACLE

        sf_dir = SF_DIR_ORACLE
    df = REGISTRY[name].fn(spark, sf_dir)
    try:
        df.collect()
        plan = _final_plan(df)
        imts = plan.count("InMemoryTableScan")
        reused = imts + plan.count("ReusedExchange")
        assert reused >= 1, (
            f"{name}: final executed plan shows neither an "
            "InMemoryTableScan nor a ReusedExchange — the shared frame "
            "is being recomputed per reference (was a .persist() "
            "dropped?)"
        )
        floor = _MULTI_PERSIST_FLOOR.get(name, 0)
        assert imts >= floor, (
            f"{name}: final plan shows {imts} InMemoryTableScan reads, "
            f"pinned floor is {floor} — one of this query's multiple "
            "persists was dropped or stopped being read (see "
            "_MULTI_PERSIST_FLOOR)"
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
