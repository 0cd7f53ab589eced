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


def _live_scan_count(df) -> int:
    """Live (re-executed) file scans in the physical plan: walk WITHOUT
    descending into InMemoryTableScan (a cached subtree's build plan
    prints its scans but never re-executes) or ReusedExchange/
    ReusedSubquery (executed once, replayed from shuffle files /
    the first result — descending would double-count, ADVICE r07)."""
    live = 0
    stack = [df._jdf.queryExecution().executedPlan()]
    while stack:
        node = stack.pop()
        cls = node.getClass().getSimpleName()
        if "InMemoryTableScan" in cls:
            continue
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
    return live


@pytest.fixture(scope="module")
def plan_inspections(spark, sf_dir):
    """ONE construction-and-inspection pass over the whole catalog,
    shared by every plan lint in this module (suite wall-time, VERDICT
    r10 item 5: the window/cartesian/live-scan params and the
    zero-jobs lint each re-built all ~300 plans — ~60s of duplicated
    GIL-bound Py4J chatter per pass; a thread pool was measured NOT to
    help). Each plan is inspected IMMEDIATELY after its own
    construction — the registry guard releases tracked caches when a
    DIFFERENT query constructs, so deferring inspection to the
    parametrized tests would read plans whose InMemoryRelations were
    already unpersisted (observed: q_attribution_shapley counted 12
    live scans instead of its true ≤10 when inspected after the full
    catalog pass). Storing the three verdicts (window order-cols,
    cartesian presence, live-scan count) keeps the per-query
    attribution in the params while paying construction once.

    Also returns the set of Spark job ids launched while constructing
    the NON-exempt queries — snapshotted twice TOTAL, not per query,
    because each ``getJobIdsForGroup(None)`` call transfers the
    session's full accumulated job-id array (tens of thousands of ids
    in-suite; ~580 such transfers dominated the old standalone
    zero-jobs lint's 238s in-suite wall). Exempt constructors
    (ITERATIVE_FIXPOINT convergence loops, ML_FIT training) run
    OUTSIDE the bracket; plan inspection itself plans but never runs
    jobs."""
    tracker = spark.sparkContext.statusTracker()
    exempt = ITERATIVE_FIXPOINT | ML_FIT

    def inspect(name):
        df = REGISTRY[name].fn(spark, sf_dir)
        assert df is not None
        return {
            "unpartitioned_windows": _unpartitioned_windows(df),
            "cartesian": "CartesianProduct"
            in df._jdf.queryExecution().executedPlan().toString(),
            "live_scans": _live_scan_count(df),
        }

    inspections = {}
    before = set(tracker.getJobIdsForGroup(None) or [])
    for name in sorted(REGISTRY):
        if name not in exempt:
            inspections[name] = inspect(name)
    construction_jobs = set(tracker.getJobIdsForGroup(None) or []) - before
    for name in sorted(exempt & set(REGISTRY)):
        inspections[name] = inspect(name)
    return inspections, construction_jobs


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_no_unpartitioned_windows(name, plan_inspections):
    found = plan_inspections[0][name]
    bad = [
        c
        for c in found["unpartitioned_windows"]
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
    assert not found["cartesian"], (
        f"{name}: CartesianProduct in the physical plan — add an equi "
        "key, broadcast a bounded side, or bucket the pair space"
    )
    # Piggyback #3 (r07): LIVE file-scan budget — replayed-subtree
    # detector (_live_scan_count above). A DataFrame referenced twice
    # without a persist replays its whole derivation per reference
    # (q_bfs_levels planned 20 live scans before the r07 sweep; at
    # 100 TB each replay is another full fact-table scan). Every query
    # in the catalog plans ≤ 9 live scans after the sweep (worst:
    # TPC-H Q2 and the 6-aggregate q_ref_integrity, both legitimately
    # multi-table), so 10 flags any future replay regression without
    # false positives.
    assert found["live_scans"] <= 10, (
        f"{name}: {found['live_scans']} live file scans in one plan — "
        "a multi-referenced subtree is replaying; persist it "
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


def test_zero_jobs_at_construction(spark, sf_dir, plan_inspections):
    """Constructing any non-exempt query must launch ZERO Spark jobs —
    constructors are pure plan builders (round 2's common-neighbor
    auto path ran persist() + two probe actions at construction; stats
    probes belong in the driver-side DuckDB catalog, actions in the
    caller). The construction pass and its two job-id snapshots live
    in the shared ``plan_inspections`` fixture (see its docstring for
    the cost story); only a failure pays for the serial per-query
    re-run that names the offending constructor."""
    _, new = plan_inspections
    if not new:
        return
    # A job fired somewhere in the batch: re-run serially to name it.
    # The re-run repeats the SAME work the fixture bracketed —
    # construct AND inspect (physical planning included) — so a job
    # launched by either step attributes to its query (review r11).
    tracker = spark.sparkContext.statusTracker()
    names = [n for n in REGISTRY if n not in ITERATIVE_FIXPOINT | ML_FIT]
    before = set(tracker.getJobIdsForGroup(None) or [])
    for name in names:
        df = REGISTRY[name].fn(spark, sf_dir)
        _unpartitioned_windows(df)
        df._jdf.queryExecution().executedPlan().toString()
        _live_scan_count(df)
        after = set(tracker.getJobIdsForGroup(None) or [])
        assert not (after - before), (
            f"constructing {name} launched Spark job(s) "
            f"{sorted(after - before)} — query constructors must be "
            "pure plan builders (move stats probes to the driver-side "
            "catalog, defer actions to the caller)"
        )
        before = after
    raise AssertionError(
        f"batch construction launched Spark job(s) {sorted(new)} but "
        "the serial re-run could not attribute them — most likely a "
        "ONE-SHOT job absorbed by session state on first construction "
        "(e.g. InMemoryFileIndex parallel listing, cached afterwards); "
        "bisect by running the fixture pass on a fresh session with a "
        "subset of names"
    )
