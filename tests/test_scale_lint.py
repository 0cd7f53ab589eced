"""Scale lints over EVERY registered query, pinned as tests:

1. **Zero Spark jobs at plan construction** — calling any
   ``queries()[name](spark, sf_dir)`` must only BUILD a plan. Round 2's
   common-neighbor auto path ran persist() + two probe actions at
   construction time; stats now come from a driver-side DuckDB catalog
   probe (queries/graph.py). Driver-side (non-Spark) prep like the
   DuckDB fixture COPYs is allowed — the lint counts Spark jobs only.

2. **No unpartitioned row-level windows** — a
   ``Window.orderBy(...)`` without ``partitionBy`` funnels every row
   through ONE task (the "No Partition Defined for Window operation"
   WindowExec). The only allowed unpartitioned windows are the
   bounded-by-construction ones: prefix offsets over per-range-partition
   totals (≤ RANK_PARTITIONS rows, order col ``_pid``) and the bitmask
   contact-domain index (≤ BITMASK_MAX_CONTACTS rows, order col ``ct``).
"""

from __future__ import annotations

import pytest

from frauddetection_spark.plans.registry import load_all

REGISTRY = load_all()

# Unpartitioned windows whose input is bounded by construction, keyed
# by the name of their first order column. Keep in sync with
# operators/rank.py (offsets over ≤ RANK_PARTITIONS per-partition
# totals), operators/graph.py::_dense_index (same shape), and
# operators/graph.py::_common_neighbors_bitmask (contact-domain index,
# ≤ BITMASK_MAX_CONTACTS rows).
BOUNDED_ORDER_COLS = {"_pid", "ct"}


def _unpartitioned_windows(df) -> list[str]:
    """First-order-column names of Window nodes with an empty
    partitionSpec anywhere in the analyzed logical plan."""
    out: list[str] = []

    def walk(node) -> None:
        if node.getClass().getSimpleName() == "Window":
            part = node.partitionSpec()
            if part.isEmpty():
                order = node.orderSpec()
                first = (
                    order.apply(0).child().toString() if order.size() else "?"
                )
                out.append(first.split("#")[0])
        kids = node.children()
        for i in range(kids.size()):
            walk(kids.apply(i))

    walk(df._jdf.queryExecution().analyzed())
    return out


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_no_unpartitioned_windows(name, spark, sf_dir):
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    bad = [
        c
        for c in _unpartitioned_windows(df)
        if c not in BOUNDED_ORDER_COLS
    ]
    assert bad == [], (
        f"{name}: unpartitioned (single-reducer) window over order "
        f"col(s) {bad} — use operators/rank.py::prefix_rank or add the "
        "bounded case to BOUNDED_ORDER_COLS with a justification"
    )
    # Piggyback on the same plan construction: no query may plan a
    # CartesianProduct — the non-broadcast nested-loop fallback whose
    # cost is |L|·|R| tasks at any scale. BroadcastNestedLoopJoin is
    # fine (it exists only when one side fits the broadcast threshold
    # — the catalog's 1-row totals / tiny literal frames); the
    # Cartesian fallback means BOTH sides were data-sized, which is
    # never an acceptable 100-TB shape. Verified 0 occurrences across
    # all 309 queries when this lint landed (round 6).
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in phys, (
        f"{name}: CartesianProduct in the physical plan — add an equi "
        "key, broadcast a bounded side, or bucket the pair space"
    )
    # Piggyback #3 (r07): LIVE file-scan budget — replayed-subtree
    # detector. A DataFrame referenced twice without a persist replays
    # its whole derivation per reference (q_bfs_levels planned 20 live
    # scans before the r07 sweep; at 100 TB each replay is another
    # full fact-table scan). Walk the physical tree WITHOUT descending
    # into InMemoryTableScan (a cached subtree's build plan prints its
    # scans but never re-executes): every query in the catalog plans
    # ≤ 9 live scans after the sweep (worst: TPC-H Q2 and the
    # 6-aggregate q_ref_integrity, both legitimately multi-table), so
    # 10 flags any future replay regression without false positives.
    live = 0
    stack = [df._jdf.queryExecution().executedPlan()]
    while stack:
        node = stack.pop()
        cls = node.getClass().getSimpleName()
        if "InMemoryTableScan" in cls:
            continue
        # Reused exchanges/subqueries execute ONCE and are replayed
        # from shuffle files / the first result — zero additional scan
        # cost; descending into them would double-count the original
        # subtree's scans (ADVICE r07).
        if "ReusedExchange" in cls or "ReusedSubquery" in cls:
            continue
        if "FileSourceScan" in cls or "BatchScan" in cls:
            live += 1
        kids = node.children()
        for i in range(kids.size()):
            stack.append(kids.apply(i))
        # Scans hidden in scalar/IN subquery expressions are live cost
        # too (ADVICE r07): QueryPlan.subqueries yields each plan
        # referenced from this node's expressions.
        subs = node.subqueries()
        for i in range(subs.size()):
            stack.append(subs.apply(i))
        if cls == "AdaptiveSparkPlanExec":
            stack.append(node.initialPlan())
    assert live <= 10, (
        f"{name}: {live} live file scans in one plan — a "
        "multi-referenced subtree is replaying; persist it "
        "(track_cache) or restructure so each base relation is "
        "scanned a bounded number of times"
    )


# Queries whose CONSTRUCTION legitimately runs Spark jobs: iterative
# fixpoints whose round count is data-dependent (min-label propagation
# runs joins until a changed-row count hits zero — the convergence
# check IS the algorithm, not a stats probe). Everything else must be
# a pure plan builder.
ITERATIVE_FIXPOINT = {
    "q_connected_components",
    "q_dedup_groups",
    "q_entity_resolution",
    # constant-size (grid-geometry-bounded) edge collect + union-find
    "q_cluster_griddensity",
    # constant-size (state-space-bounded) transition-matrix collect +
    # driver-side exact-integer chain iteration
    "q_attribution_markov",
    # cosine-pair mining + connected-components fixpoint
    "q_dedup_semantic",
}

# MLlib estimator queries: ``Estimator.fit`` is TRAINING — an action by
# nature (the model is data). Not a stats probe; exempt, like M3/M4's
# explicit training loops.
ML_FIT = {"q_ann_lsh_ml", "q_dedup_minhash_ml", "q_model_score",
          "q_viz_projection"}


def test_every_persist_is_tracked_or_local():
    """Cache-lifetime lint (VERDICT r3 item 8): every ``.persist(`` call
    site in frauddetection_spark/ must either be wrapped in
    ``track_cache(`` (released by operators.caching.release_caches()
    between bench/driver
    queries) or be followed by a local ``.unpersist()`` in the same
    function. Untracked persists accumulated across the r3 bench's
    19-query headline and inflated later queries 1.5-3x."""
    import ast
    import os

    pkg = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "frauddetection_spark",
    )

    offenders: list[str] = []
    for root, _dirs, files in os.walk(pkg):
        for fname in files:
            if not fname.endswith(".py"):
                continue
            path = os.path.join(root, fname)
            with open(path) as fh:
                src = fh.read()
            tree = ast.parse(src, filename=path)
            # map every node to its parent for ancestor walks
            parents: dict[ast.AST, ast.AST] = {}
            for node in ast.walk(tree):
                for child in ast.iter_child_nodes(node):
                    parents[child] = node
            for node in ast.walk(tree):
                if not (
                    isinstance(node, ast.Call)
                    and isinstance(node.func, ast.Attribute)
                    and node.func.attr == "persist"
                ):
                    continue
                # tracked: some ancestor is a track_cache(...) call
                anc, tracked = node, False
                while anc in parents:
                    anc = parents[anc]
                    if (
                        isinstance(anc, ast.Call)
                        and isinstance(anc.func, ast.Name)
                        and anc.func.id in ("track_cache", "_track")
                    ):
                        tracked = True
                        break
                if tracked:
                    continue
                # locally managed: enclosing function also unpersists
                fn = node
                while fn in parents and not isinstance(
                    fn, (ast.FunctionDef, ast.AsyncFunctionDef)
                ):
                    fn = parents[fn]
                local_unpersist = isinstance(
                    fn, (ast.FunctionDef, ast.AsyncFunctionDef)
                ) and any(
                    isinstance(n, ast.Attribute) and n.attr == "unpersist"
                    for n in ast.walk(fn)
                )
                if local_unpersist:
                    continue
                offenders.append(f"{path}:{node.lineno}")
    assert offenders == [], (
        "untracked persist() call sites (wrap in operators.caching."
        "track_cache "
        "or unpersist in the same function):\n" + "\n".join(offenders)
    )


def test_zero_jobs_at_construction(spark, sf_dir):
    tracker = spark.sparkContext.statusTracker()
    before = set(tracker.getJobIdsForGroup(None) or [])
    for name, spec in REGISTRY.items():
        if name in ITERATIVE_FIXPOINT | ML_FIT:
            continue
        df = spec.fn(spark, sf_dir)
        assert df is not None
        after = set(tracker.getJobIdsForGroup(None) or [])
        new = after - before
        assert not new, (
            f"constructing {name} launched Spark job(s) {sorted(new)} — "
            "query constructors must be pure plan builders (move stats "
            "probes to the driver-side catalog, defer actions to the "
            "caller)"
        )
        before = after
