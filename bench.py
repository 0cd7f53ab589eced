"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

from frauddetection_spark.plans.registry import load_all
from frauddetection_spark.session import get_spark

# Headline set: one per operator family, weighted toward shuffle-heavy
# shapes where the engine's plan quality actually matters.
HEADLINE = [
    "q_behavioral_features",
    "q_groupby_agg",
    "q_join_inner",
    "q_topk",
    "q_window_agg_transform",
    "q_join_common_neighbor",
    "q_graph_aggregate",
    "q_jaccard_lag",
    "q_dense_spine",
    # q_knn_cosine is the EXACT O(n²·d) brute-force baseline, kept in
    # the headline as the reference point for the ANN entries below
    # (q_ann_ivf_sampled is the scale path) — do not read it as the
    # production similarity-search plan.
    "q_knn_cosine",
    "q_token_stats",
    # LLM-pipeline heavies (added round 2 — totals are not comparable
    # to BENCH_r01.json's 11-query total; per-query times are)
    "q_dedup_minhash",
    "q_tfidf",
    # round-2 operator surface (added round 3 per VERDICT item 8) —
    # iterative graph, distributed global rank, broadcast-bounds clip,
    # LSH-pair connected components
    "q_pagerank",
    "q_user_deciles",
    "q_winsorize",
    "q_dedup_groups",
    # round-3 additions: bucketed range join + sampled-codebook ANN
    "q_interval_join",
    "q_ann_ivf_sampled",
    # round-4 additions: distributed-rank multi-quantile + broadcast
    # query-batch ANN (the serving shape)
    "q_quantile_grid",
    "q_ann_query_batch",
    # round-4b additions: compressed-index ANN (PQ codes + ADC) and
    # the three-pass distributed-ntile segmentation
    "q_ann_pq",
    "q_rfm",
    # round-4d additions: df-pruned inverted-index similarity join
    # (the weighted all-pairs shape) and the wedge-join link scorer
    "q_sparse_cosine",
    "q_adamic_adar",
    # round-4e additions: triangle-based edge similarity (the exact
    # hub-immune cn formulation), grid-cell spatial join, and the
    # quantized-transcendental sparse-retrieval scorer
    "q_graph_jaccard",
    "q_spatial_join",
    "q_bm25",
    # round-5 additions: the widest TPC-H join tree (eight tables),
    # the constant-shuffle Count-Min build+probe, and the 64-plane
    # sign-sketch pipeline (explode×planes → signature words →
    # popcount estimate)
    "q_tpch_q8",
    "q_countmin",
    "q_hyperplane_est",
    # round-5b additions: the difference-array interval allocator
    # (3 boundary deltas/line + calendar-spine prefix sum — replaces a
    # flagged 5.2x naive explode) and the vocab-weighted BPE merge
    # step (pair stats O(|vocab|), corpus touched once)
    "q_date_spread",
    "q_bpe_merge",
    # round-11 addition: the iterative k-core peel — the round-11
    # scale audit measured it as the most expensive catalog query
    # (5.4s at sf0.01, flat 1.1x to sf0.1 = pure fixed overhead), and
    # the windows-in-rounds rewrite that halved it deserves a tracked
    # series so a regression back to the 26-job shape shows up here
    "q_kcore",
    # round-6 additions (VERDICT r05 item 4): the largest TPC-H join
    # tree (Q9: part×supplier×lineitem×orders×nation with per-year
    # profit), and the item-item collaborative-filtering join — the
    # slowest data-sized query in SCALE_AUDIT_r05 (5.5s) — so their
    # wall-times are tracked round-over-round.
    "q_tpch_q9",
    "q_item_cf",
]



def _quiet_cache_warnings(spark) -> None:
    """Min-of-N re-runs the same query without releasing its tracked
    caches (deliberate: the warm run is the steady-state number), so
    the second run's plan-matched persist triggers CacheManager's
    "Asked to cache already cached data" WARN on every such query.
    It is noise here by construction — drop that one logger to ERROR so
    real cache bugs elsewhere stay visible (VERDICT r05 item 6)."""
    try:
        jvm = spark._jvm
        jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
            "org.apache.spark.sql.execution.CacheManager",
            jvm.org.apache.logging.log4j.Level.ERROR,
        )
    except Exception:  # noqa: BLE001 — logging tweak must never kill a run
        pass


def _min3_wall(fn, spark, sf_dir: str) -> tuple[float, int]:
    """Min-of-3 wall time with plan CONSTRUCTION inside the timer (for
    iterative queries — connected components, MLlib fits — construction
    executes jobs, and excluding it would under-measure them). ONE
    timing protocol shared by the headline sweep and the flag recheck:
    the recheck adjudicates the sweep's flags, so the two must never
    drift apart (the scale audit learned this the hard way, review
    r09; review r10 applied it here). Returns (best_sec, rowcount)."""
    best, n = float("inf"), 0
    for _ in range(3):
        t0 = time.perf_counter()
        n = fn(spark, sf_dir).count()
        best = min(best, time.perf_counter() - t0)
    return best, n


# Queries whose super-linear growth is the DOCUMENTED DEFINITION, not
# a plan defect: a scale-audit flag on these is annotated in-artifact
# ("by_design") instead of adjudicated by a standalone recheck — the
# growth is not contested, and rechecking the quadratic costs more
# than the rest of the sweep. Keep this list tiny and justified; a
# new entry needs the same docstring-level bound its members carry.
AUDIT_QUADRATIC_BY_DESIGN = {
    "q_knn_cosine": (
        "exact brute-force kNN — the O(n²·d) oracle anchor the ANN "
        "paths are measured against; docstring bounds it at ~1e5 "
        "vectors and points to q_ann_ivf/_sampled/_pq as the scale "
        "paths (r12 sf0.1->sf1: 100x pair growth for 10x rows, as "
        "the definition implies)"
    ),
    # The IVF pair is ~n^1.5 BY CONSTRUCTION: K ~ sqrt(n) centroids
    # keep buckets at ~sqrt(n) vectors, so all-corpus self-kNN probes
    # n * nprobe * sqrt(n) candidate pairs — 10^1.5 ≈ 31.6x of WORK
    # per 10x decade. That IS the designed trade (vs the anchor's
    # 100x/decade). Measured wall-clock at sf1->sf10 sits well under
    # the work asymptote (4.2x warm, r12's 7.2x; one r13 cold-page-
    # cache reading hit 32.8x) because the lo side is overhead-bound
    # at these sizes — the entry exists so a sweep that DOES read the
    # asymptote (cold cache, larger decades) reports design, not
    # defect. The linear-per-decade serving shape is
    # q_ann_query_batch (fixed probe batch against the corpus); the
    # all-pairs self-join at 10^9 vectors is what you'd shard or
    # sample regardless of engine.
    "q_ann_ivf": (
        "IVF all-corpus self-kNN with K~sqrt(n) — designed ~n^1.5 "
        "work: 10^1.5 ≈ 31.6x per decade ceiling (measured 4.2x warm "
        "at sf1->sf10, overhead-bound; serving-scale path is "
        "q_ann_query_batch)"
    ),
    "q_ann_ivf_sampled": (
        "same ~n^1.5 IVF search as q_ann_ivf (sampled codebook "
        "training only changes the Lloyd cost, not the probe/rerank "
        "asymptotics); serving-scale path is q_ann_query_batch"
    ),
    "q_spatial_join": (
        "fixed-radius proximity self-join on a FIXED synthetic "
        "coordinate square — the OUTPUT is ~n^2*(2r/side)^2/2 pairs "
        "(5.6e7 rows at sf10's 150k users), quadratic by definition "
        "once the scale ladder packs 10x the users into the same "
        "domain; the grid-cell plan stays within ~4-5x of output "
        "size (optimal — no plan beats its own output), and the "
        "docstring's scale claim is 'linear for BOUNDED density', "
        "which physical geo data satisfies and the synthetic ladder "
        "deliberately does not"
    ),
}


# A by-design quadratic can also carry a DOCSTRING INPUT BOUND: the
# operator's own contract names the corpus size past which the exact
# definition stops being runnable and the bucketed paths take over.
# Auditing it beyond that bound measures nothing (hours of wall-clock
# that can only re-confirm the definition the by-design note already
# states), so the sweep skips it and records the skip IN-ARTIFACT —
# a silent cap would read as "covered", which the audit's own no-
# silent-caps rule forbids. name -> (table, max hi-side rows, why).
AUDIT_INPUT_BOUNDS = {
    "q_knn_cosine": (
        "embeddings", 100_000,
        "docstring bounds the exact O(n^2*d) kNN anchor at ~1e5 "
        "vectors (the ANN paths q_ann_ivf/_sampled/_pq/_query_batch "
        "are the scale story past it); measured by-design at 60x on "
        "the sf0.1->sf1 decade (SCALE_AUDIT_r12_sf1.json), and a "
        "200k-vector hi side would cost ~2h/pass locally only to "
        "re-confirm the definition",
    ),
}


# Queries whose AUTO plan crosses a cost-model boundary inside the
# audited decade: the CBO picks a different physical strategy at lo
# and hi (each the cheapest at its size), so the sweep's growth ratio
# compares two different plans and says nothing about either plan's
# scaling. On a flag, the audit re-measures BOTH sfs with the scale
# strategy pinned via the listed env (the query contract guarantees
# the strategies are semantically identical — results never depend on
# it); if the pinned ratio is under the flag line, the flag moves to
# `boundary` with both numbers in-artifact. name -> (env, note).
AUDIT_STRATEGY_BOUNDARY = {
    "q_join_common_neighbor": (
        {"SPARK_GRAFT_CN_STRATEGY": "inverted"},
        "the CBO flips bitmask->inverted at the 4096-contact domain "
        "bound (sf1: 1000 contacts, sf10: 10000); pinning the "
        "inverted index — the 100-TB strategy — on both sides "
        "measures the scale plan's own growth",
    ),
}


def _parquet_rows(path: str) -> int:
    """Row count from parquet footer metadata — no Spark job."""
    import pyarrow.parquet as _pq

    if os.path.isdir(path):
        return sum(
            _pq.ParquetFile(os.path.join(path, f)).metadata.num_rows
            for f in os.listdir(path) if f.endswith(".parquet")
        )
    return _pq.ParquetFile(path).metadata.num_rows


def scale_audit() -> None:
    """`python bench.py --scale-audit [names...]`: run queries at two
    scale factors and report the runtime growth ratio against the data
    growth — the harness that catches super-linear scale bombs (the
    q_adamic_adar wedge join grew 28× across a 100× data step while
    every healthy query grew <4×; this mode finds the next one BEFORE
    a cluster does). Audits ALL declared queries by default (oracle
    and rows-only — growth needs only a count), or the names given.
    Growth is measured min-of-2 at each sf; flag line printed for
    ratio > AUDIT_FLAG_RATIO."""
    lo_dir = os.environ.get("SPARK_GRAFT_AUDIT_LO", "/root/testdata/sf0.01")
    hi_dir = os.environ.get("SPARK_GRAFT_AUDIT_HI", "/root/testdata/sf0.1")
    flag_ratio = float(os.environ.get("SPARK_GRAFT_AUDIT_FLAG", "6.0"))
    names = sys.argv[2:] or None
    registry = load_all()
    # Heap auto-sizing (VERDICT r12): at sf10 the default 8g local JVM
    # heap is ~20x under production executor sizing per concurrent task
    # (32 tasks share one heap; a real cluster gives each executor core
    # ~5g), and q_item_cf's 250 MB/task OOMed the r12 sweep before its
    # healthy 3.3x could be measured at 24g. Size the heap from the hi
    # data directory so the audit measures PLANS, not the harness: ~16x
    # the on-disk parquet bytes (compressed parquet decompresses ~4x,
    # and shuffle/cache copies multiply again), floor 8g, cap 96g
    # (the box has 125g). Explicit SPARK_GRAFT_DRIVER_MEM still wins.
    if not os.environ.get("SPARK_GRAFT_DRIVER_MEM"):
        hi_bytes = sum(
            os.path.getsize(os.path.join(root, f))
            for root, _, files in os.walk(hi_dir)
            for f in files
        )
        heap_g = min(96, max(8, (hi_bytes * 16) >> 30))
        os.environ["SPARK_GRAFT_DRIVER_MEM"] = f"{heap_g}g"
        print(f"# driver heap auto-sized to {heap_g}g for "
              f"{hi_bytes >> 20} MB hi data", file=sys.stderr)
    spark = get_spark(app_name="frauddetection-scale-audit")
    _quiet_cache_warnings(spark)
    registry["q_scan_parquet"].fn(spark, lo_dir).collect()
    from frauddetection_spark.operators.caching import release_caches

    def _min2_per_sf(fn):
        """Min-of-2 wall time at each sf, caches drained between sfs.
        ONE timing protocol shared by the sweep and the standalone
        recheck — the recheck adjudicates the sweep's flags, so the two
        must never drift apart (review r09)."""
        per_sf = []
        for d in (lo_dir, hi_dir):
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                fn(spark, d).count()
                best = min(best, time.perf_counter() - t0)
            release_caches()
            per_sf.append(best)
        return per_sf

    rows = []
    skipped = {}
    for name, spec in registry.items():
        if names is not None and name not in names:
            continue
        bound = AUDIT_INPUT_BOUNDS.get(name)
        if bound is not None:
            table, max_rows, why = bound
            hi_rows = _parquet_rows(os.path.join(hi_dir, table + ".parquet"))
            if hi_rows > max_rows:
                skipped[name] = {
                    "table": table, "hi_rows": hi_rows,
                    "bound_rows": max_rows,
                    "skipped_beyond_bound": why,
                }
                print(f"# {name}: SKIPPED beyond docstring bound "
                      f"({table} hi rows {hi_rows} > {max_rows}) — "
                      f"{why}", file=sys.stderr)
                continue
        # rows-only queries (spec.oracle is None) are audited too —
        # growth ratios need only a count(), not a twin (r11: the ten
        # rows-only queries had never been growth-audited because this
        # loop skipped them; all measured healthy, worst 2.4x, in
        # SCALE_AUDIT_r11_rowsonly.json)
        try:
            per_sf = _min2_per_sf(spec.fn)
        except Exception as e:  # noqa: BLE001 — audit must not die mid-sweep
            print(f"# {name}: ERR {str(e)[:120]}", file=sys.stderr)
            continue
        ratio = per_sf[1] / per_sf[0] if per_sf[0] > 0 else float("inf")
        flagged = ratio > flag_ratio
        rows.append((name, round(per_sf[0], 2), round(per_sf[1], 2),
                     round(ratio, 1), flagged))
        mark = "  << SUPER-LINEAR" if flagged else ""
        print(f"# {name}: {per_sf[0]:.2f}s -> {per_sf[1]:.2f}s "
              f"({ratio:.1f}x){mark}", file=sys.stderr)
    flagged = [r[0] for r in rows if r[4]]
    # Standalone recheck (VERDICT r08 item 6): a mid-sweep flag can be
    # sweep pollution (JVM/JIT state, cache churn from 298 neighbors),
    # not a plan property — r08's only flag, q_python_udtf at 6.3×, was
    # refuted at 2.4× standalone but the artifact still carried it.
    # Adjudicate INSIDE the artifact: re-measure each flagged query in
    # a clean-cache state; flags that re-measure under the threshold
    # move to `refuted` with their recheck ratio, so the shipped JSON
    # reflects adjudicated reality and no out-of-band commit-message
    # refutation is needed.
    queries_out = {r[0]: {"lo_s": r[1], "hi_s": r[2], "ratio": r[3]}
                   for r in rows}
    queries_out.update(skipped)
    by_design = {}
    for name in list(flagged):
        note = AUDIT_QUADRATIC_BY_DESIGN.get(name)
        if note is not None:
            flagged.remove(name)
            by_design[name] = queries_out[name]["ratio"]
            queries_out[name]["by_design"] = note
            print(f"# {name}: super-linear BY DESIGN (no recheck) — "
                  f"{note}", file=sys.stderr)
    boundary = {}
    for name in list(flagged):
        entry = AUDIT_STRATEGY_BOUNDARY.get(name)
        if entry is None:
            continue
        env, note = entry
        release_caches()
        saved = {k: os.environ.get(k) for k in env}
        os.environ.update(env)
        try:
            per_sf = _min2_per_sf(registry[name].fn)
        except Exception as e:  # noqa: BLE001 — adjudication must not die
            print(f"# boundary {name}: ERR {str(e)[:120]}", file=sys.stderr)
            continue
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v
        ratio = per_sf[1] / per_sf[0] if per_sf[0] > 0 else float("inf")
        queries_out[name]["pinned_lo_s"] = round(per_sf[0], 2)
        queries_out[name]["pinned_hi_s"] = round(per_sf[1], 2)
        queries_out[name]["pinned_ratio"] = round(ratio, 1)
        queries_out[name]["boundary_note"] = note
        if ratio <= flag_ratio:
            flagged.remove(name)
            boundary[name] = {
                "auto_ratio": queries_out[name]["ratio"],
                "pinned_ratio": round(ratio, 1),
            }
            print(f"# boundary {name}: {ratio:.1f}x with the scale "
                  f"strategy pinned both sides — COST-MODEL BOUNDARY, "
                  f"not a plan defect ({note})", file=sys.stderr)
        else:
            print(f"# boundary {name}: {ratio:.1f}x even pinned — the "
                  f"scale plan itself is super-linear", file=sys.stderr)
    refuted = {}
    for name in list(flagged):
        release_caches()
        try:
            per_sf = _min2_per_sf(registry[name].fn)
        except Exception as e:  # noqa: BLE001 — recheck must not die
            print(f"# recheck {name}: ERR {str(e)[:120]}", file=sys.stderr)
            continue
        ratio = per_sf[1] / per_sf[0] if per_sf[0] > 0 else float("inf")
        queries_out[name]["recheck_ratio"] = round(ratio, 1)
        if ratio <= flag_ratio:
            flagged.remove(name)
            refuted[name] = round(ratio, 1)
            print(f"# recheck {name}: {ratio:.1f}x standalone — flag "
                  f"REFUTED", file=sys.stderr)
        else:
            print(f"# recheck {name}: {ratio:.1f}x standalone — flag "
                  f"CONFIRMED", file=sys.stderr)
    print(json.dumps({
        "metric": "scale_audit",
        "lo": lo_dir, "hi": hi_dir,
        "n_queries": len(rows),
        "skipped_beyond_bound": sorted(skipped),
        "flagged": flagged,
        "refuted": refuted,
        "boundary": boundary,
        "by_design": by_design,
        "queries": queries_out,
    }))


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--scale-audit":
        scale_audit()
        return
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0
    registry = load_all()
    spark = get_spark(app_name="frauddetection-bench")
    _quiet_cache_warnings(spark)

    # Warm the JVM + parquet footers + Arrow Python workers once so
    # per-query numbers measure the plan, not first-touch costs.
    registry["q_scan_parquet"].fn(spark, sf_dir).collect()
    import pandas as _pd

    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, schema="id long"
    ).count()
    # r13 extension of the SAME warmup intent: the r12/r13 kernels
    # moved the heavy ANN/dedup math into cogrouped-pandas plans, and
    # profiling the sweep showed the first queries exercising each
    # executor code path (cogroup exchange + Arrow cogroup writer,
    # BroadcastExchange, WindowExec) paying multi-second C2 JIT
    # compilation *inside their timed min-of-3* — q_dedup_minhash
    # measured 11.4s in-sweep vs 1.0s in the same JVM minutes later
    # (thread dump mid-run: C2 CompilerThread at 11.3s CPU). Touch
    # each machinery path once on synthetic rows (no test-data reads,
    # no caching — pure JVM/Python-worker warmup; timing protocol
    # unchanged). Old numbers: OPTIMIZATION_r13.md "Bench warmup".
    from pyspark.sql import Window as _W
    from pyspark.sql import functions as _F

    _warm = spark.range(1024).select("id", (_F.col("id") % 7).alias("k"))
    _warm.groupBy("k").cogroup(_warm.groupBy("k")).applyInPandas(
        lambda left, right: left, schema="id long, k long"
    ).count()
    _warm.join(_F.broadcast(_warm.groupBy("k").count()), "k").count()
    _warm.select(
        _F.row_number().over(_W.partitionBy("k").orderBy("id")).alias("rn")
    ).count()

    # Host-speed calibration: a FIXED synthetic workload (hash-agg over
    # 20M generated longs, data-independent) timed min-of-3 and emitted
    # as "calib_sec" in the JSON line. The shared host's speed varies
    # up to ~2x between round invocations (r06 measured q_tpch_q8 at
    # 1.8x its r05 wall-time on an otherwise idle session), so
    # round-over-round query deltas are only interpretable relative to
    # this constant — compare queries[q]/calib_sec across rounds, not
    # raw seconds.
    from pyspark.sql import functions as F

    calib = float("inf")
    for _ in range(3):
        c0 = time.perf_counter()
        spark.range(20_000_000).groupBy((F.col("id") % 1024).alias("k")).agg(
            F.sum("id"), F.count("*")
        ).count()
        calib = min(calib, time.perf_counter() - c0)
    calib = round(calib, 3)
    print(f"# calib (20M hash-agg): {calib}s", file=sys.stderr)

    # Second probe, SCAN-bound (r09): the hash-agg above is pure CPU,
    # and the round-9 session proved host drift can live elsewhere —
    # calib read 0.84x (faster) vs r08 while the whole catalog measured
    # ~1.2-1.3x slower, i.e. the drift was in the I/O/scheduler
    # dimension the CPU probe can't see. Time a full parquet scan+agg
    # of the largest table at this sf (fixed workload per sf; the
    # regression gate already only compares same-sf rounds) and emit it
    # as "calib_scan_sec", so future adjudications can attribute drift
    # to CPU vs scan before believing any per-query delta.
    calib_scan = None
    try:
        # one untimed warmup first: the probe must measure steady-state
        # scan+decode, not page-cache population — a cold first touch
        # inflates even min-of-3 when the file was never read this boot
        # (r10: probe read 0.494s vs r09's 0.225s while the catalog ran
        # 0.95x — warm/cold asymmetry, not host drift)
        spark.read.parquet(f"{sf_dir}/lineitem.parquet").agg(
            F.count("*"), F.sum("l_quantity")
        ).count()
        best_scan = float("inf")
        for _ in range(3):
            c0 = time.perf_counter()
            spark.read.parquet(f"{sf_dir}/lineitem.parquet").agg(
                F.count("*"), F.sum("l_quantity")
            ).count()
            best_scan = min(best_scan, time.perf_counter() - c0)
        calib_scan = round(best_scan, 3)
        print(f"# calib_scan (lineitem scan-agg): {calib_scan}s",
              file=sys.stderr)
    except Exception as e:  # noqa: BLE001 — a missing table must not
        # kill the bench (review r09): emit null and keep timing
        print(f"# calib_scan unavailable: {str(e)[:100]}", file=sys.stderr)

    # Three timed runs per query, report the min: the shared host shows
    # 2-5x run-to-run noise, whole-stage-codegen JIT makes run 1 (and
    # often run 2) pay compilation cost (q_dedup_minhash measured
    # 7.0/3.9/2.7/1.1s over four runs), and the steady-state plan cost
    # is what the benchmark is meant to measure.
    from frauddetection_spark.operators.caching import release_caches

    timings: dict[str, float] = {}
    for name in HEADLINE:
        spec = registry.get(name)
        if spec is None:
            continue
        best, n = _min3_wall(spec.fn, spark, sf_dir)
        # Release tracked invariant caches BETWEEN queries (not between
        # the two runs: min-of-2 deliberately measures the steady-state
        # warm run, comparable across rounds — CacheManager plan-matches
        # the rebuilt frame). Without this, the 19-query headline
        # accumulated cached shingle/IVF/CC frontiers and executor
        # memory pressure inflated later queries 1.5-3x (BENCH_r03).
        release_caches()
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]}s ({n} rows)", file=sys.stderr)

    core = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "calib_sec": calib,
        "calib_scan_sec": calib_scan,
    }
    optional: dict = {}

    # unparseable sf dir (-1.0 sentinel in the JSON) → sf=None to the
    # report, so the guard doesn't silently drop every prior round
    # (review r09: -1.0 compared unequal to all recorded sfs)
    flags: list[dict] = []
    adjusted: dict = {}
    for line in regression_report(
        timings, calib, sf=sf if m else None, calib_scan=calib_scan,
        flags_out=flags, adjusted_out=adjusted,
    ):
        print(line, file=sys.stderr)
    if adjusted:
        optional["host_adjusted"] = adjusted

    # Self-adjudicate surviving flags INSIDE the artifact, exactly as
    # the scale audit does for its own (VERDICT r09 #1/#3): every
    # REGRESSION since r06 has adjudicated to sweep pollution (cache
    # churn / JVM state from the preceding headline queries), and a
    # line shipped in the driver's post-commit artifact used to wait a
    # full round for a refutation. Re-measure each flagged query
    # standalone in a clean-cache state against the SAME gate; the
    # JSON records sweep time, recheck time, and the verdict, so the
    # shipped artifact reflects adjudicated reality.
    if flags:
        to_check, capped = select_rechecks(flags)
        adjud = {}
        for fl in capped:
            adjud[fl["name"]] = {
                "sweep_s": fl["now_s"],
                "prior_s": fl["prior_s"],
                "prior_file": fl["prior_file"],
                "host": fl["host"],
                "band": fl.get("band", "regression"),
                "verdict": "recheck_capped",
            }
            print(f"# recheck {fl['name']}: skipped — beyond the "
                  f"{RECHECK_CAP}-recheck cap (flag kept, unadjudicated)",
                  file=sys.stderr)
        for fl in to_check:
            release_caches()
            entry = {
                "sweep_s": fl["now_s"],
                "prior_s": fl["prior_s"],
                "prior_file": fl["prior_file"],
                "host": fl["host"],
                "band": fl.get("band", "regression"),
            }
            try:
                best, _ = _min3_wall(registry[fl["name"]].fn, spark, sf_dir)
            except Exception as e:  # noqa: BLE001 — recheck must not
                # kill the bench line the driver parses; a flag whose
                # recheck ERRORS stays in the artifact UNADJUDICATED
                # (review r10: dropping it entirely would make a real
                # regression invisible exactly when the host is sick)
                entry["verdict"] = "recheck_error"
                entry["error"] = str(e)[:200]
                adjud[fl["name"]] = entry
                print(f"# recheck {fl['name']}: ERR {str(e)[:120]} — "
                      "flag kept UNADJUDICATED", file=sys.stderr)
                continue
            release_caches()
            # three-way verdict (VERDICT r11 item 2): the standalone
            # number re-banded against the same gate — <=1.5x refutes
            # the flag outright, (1.5, 2] is real-but-sub-regression
            # drift, >2x confirms a regression
            denom = fl["host"] * fl["prior_s"]
            entry["recheck_s"] = round(best, 3)
            if best <= 1.5 * denom:
                entry["verdict"] = "refuted"
            elif best <= 2 * denom:
                entry["verdict"] = "elevated"
            else:
                entry["verdict"] = "confirmed"
            adjud[fl["name"]] = entry
            print(
                f"# recheck {fl['name']}: {best:.3f}s standalone — "
                f"flag {entry['verdict'].upper()}",
                file=sys.stderr,
            )
        optional["regressions"] = adjud
    print(json.dumps(order_payload(core, optional)))


RECHECK_CAP = 8


def select_rechecks(flags: list[dict], cap: int = RECHECK_CAP) -> tuple[list[dict], list[dict]]:
    """Split gate flags into (recheck now, capped) — the worst ``cap``
    by host-adjusted ratio get a standalone recheck, the rest are
    recorded verdict="recheck_capped" so the artifact never silently
    drops an elevated query. Bounds recheck wall-time when a sick host
    flags half the headline (each recheck is min-of-3 runs)."""
    def ratio(fl: dict) -> float:
        denom = fl["host"] * fl["prior_s"]
        return fl["now_s"] / denom if denom else float("inf")

    ranked = sorted(flags, key=ratio, reverse=True)
    return ranked[:cap], ranked[cap:]


def order_payload(core: dict, optional: dict) -> dict:
    """Emission order for the ONE stdout JSON line: big optional
    blocks (host_adjusted ratios, recheck verdicts) FIRST, the compact
    gate record (metric/value/queries/sf/calib) LAST. The round driver
    keeps only the last ~2000 chars of output — BENCH_r11's line
    outgrew that and the driver recorded parsed=null with the queries
    dict amputated (VERDICT r11 item 4). With this order a truncated
    tail still ends in the complete compact record, which
    _prior_from_tail() recovers."""
    return {**optional, **core}


def _prior_from_tail(tail: str) -> dict | None:
    """Recover a gate-usable prior from a driver-truncated artifact.

    The round driver keeps only the LAST ~2000 chars of bench stdout;
    when the JSON line outgrew that (BENCH_r11: host_adjusted ratios +
    recheck verdicts), the driver recorded ``"parsed": null`` plus the
    tail — and the r12 gate crashed on ``None.get``. main() now emits
    the big optional blocks FIRST and the compact gate record
    (queries/sf/calib) LAST, so any tail slice that still contains the
    complete ``"queries": {...}`` object reconstructs here. Returns
    None when the queries object itself was amputated (BENCH_r11's
    pre-reorder tail) — the caller skips that prior with a note."""
    idx = tail.rfind('"queries": {')
    if idx < 0:
        return None
    dec = json.JSONDecoder()
    try:
        queries, end = dec.raw_decode(tail, idx + len('"queries": '))
    except ValueError:
        return None
    if not isinstance(queries, dict) or not queries:
        return None
    out: dict = {"queries": queries}
    rest = tail[end:]
    for key in ("sf", "calib_sec", "calib_scan_sec"):
        m = re.search(rf'"{key}": (null|-?[\d.]+)', rest)
        if m and m.group(1) != "null":
            out[key] = float(m.group(1))
    return out


def regression_report(
    timings: dict[str, float],
    calib: float,
    bench_files: list[str] | None = None,
    sf: float | None = None,
    calib_scan: float | None = None,
    flags_out: list[dict] | None = None,
    adjusted_out: dict | None = None,
) -> list[str]:
    """Round-over-round regression report lines: like-for-like OVERLAP
    subtotals vs EVERY prior round — a grown headline must never hide
    per-query drift inside a "total grew" narrative (VERDICT r3 item
    3). The per-query gate (newest prior round only) flags two
    bands — >2x host-adjusted is a REGRESSION, (1.5, 2] is ELEVATED
    (VERDICT r11 item 2: the 1.5-2x band used to leave the round with
    no in-artifact adjudication) — and is CALIB-RELATIVE when both
    rounds carry calib_sec (VERDICT r6 item
    2: BENCH_r06 recorded three false regressions because its host ran
    ~1.8x slower than round 5's — q_dedup_minhash "3.45s vs 0.87s" was
    refuted by the same round's scale audit at 1.66s). The host factor
    is max(CPU factor, SCAN factor) when both rounds also carry
    calib_scan_sec (VERDICT r09 item 2: the r09 session's drift lived
    in the I/O/scheduler dimension — CPU calib read FASTER while the
    whole catalog ran ~1.2x slower, producing seven phantom REGRESSION
    lines the CPU probe alone could not cancel). Comparing against the
    slower of the two probes kills the phantom class at the source.
    The max() is DELIBERATELY asymmetric: when the host got FASTER in
    one dimension only, the flat probe's 1.0 floors the factor, so a
    marginal (~2x) regression in a query bound by the sped-up
    dimension can slip the gate — accepted, because the alternative
    (min, or per-query probe choice without knowing the query's
    resource class) re-sprays phantom flags on the other class, and
    marginal true regressions are still caught by the scale audit's
    growth ratios and the round-over-round calib-relative series. Raw
    seconds remain the fallback against pre-calibration rounds
    (r01-r05). Factored out of main() so the gate itself is
    unit-testable without a Spark session (tests/test_bench_gate.py).

    ``flags_out``, when given, receives one dict per flag line
    ({name, now_s, prior_s, prior_file, host, band}) so the caller can
    adjudicate each flag standalone INSIDE the same artifact (VERDICT
    r09 "What's wrong" #3: the driver's bench run lands after the
    final commit, so a line it prints could previously only be
    adjudicated a round later — BENCH_r09 shipped q_groupby_agg
    flagged for a whole round when a 3-second recheck refutes it).

    ``adjusted_out``, when given, receives the per-query HOST-ADJUSTED
    ratio vs the gate round (now_s / (host * prior_s)) plus the host
    factor and prior file, so the emitted artifact is readable
    standalone (VERDICT r10 item 3: BENCH_r10's q_rfm printed 2.37x
    raw on a 1.35x-slower host — an honest ~1.76x — and a reader had
    to cross-reference ADJUDICATION_r10.json to know). Report lines
    and gate behavior are unchanged; this only surfaces the number the
    gate already computes."""
    import glob

    if bench_files is None:
        bench_files = sorted(glob.glob("BENCH_r*.json"))
    # Pre-pass: load priors and drop sf-incompatible rounds (r09 guard:
    # a sf0.001 smoke run must not be gated against sf0.1 artifacts —
    # raw seconds across scale factors are incomparable; fixed
    # overheads dominate small sf, q_interval_join "regressed"
    # 0.49s-vs-0.23s exactly this way). Filtering BEFORE picking the
    # gate round matters: the per-query gate must run against the
    # newest SAME-SF prior, not silently vanish because the newest
    # artifact happens to be a different-sf run (review r09).
    eligible: list[tuple[str, dict]] = []
    lines: list[str] = []
    for pf in bench_files:
        try:
            with open(pf) as f:
                prior = json.load(f)
        except (OSError, ValueError):
            continue
        if not isinstance(prior, dict):
            continue
        # driver wraps our JSON line under "parsed"; a line that
        # outgrew the driver's 2000-char tail arrives as
        # "parsed": null (BENCH_r11) — recover the compact gate record
        # from the tail if the queries object survived truncation,
        # else skip the round WITH A NOTE (never crash the bench)
        parsed = prior.get("parsed", prior)
        if isinstance(parsed, dict):
            prior = parsed
        else:
            recovered = _prior_from_tail(prior.get("tail") or "")
            if recovered is None:
                lines.append(
                    f"# prior {pf} unusable: driver-truncated line "
                    "(parsed=null) and no complete queries object in "
                    "the tail — excluded from overlap/gate"
                )
                continue
            lines.append(
                f"# prior {pf}: recovered "
                f"{len(recovered['queries'])} query timings from the "
                "driver-truncated tail"
            )
            prior = recovered
        prior_sf = prior.get("sf")
        # -1.0 is the sentinel main() WRITES for an unparseable sf dir
        # (review r10): normalize it back to "unknown" here, or a pair
        # of runs from the same non-sf-named dir would treat -1.0 as a
        # declared scale factor — never gating against each other and
        # printing a misleading 'prior recorded sf=-1.0' annotation.
        if prior_sf == -1.0:
            prior_sf = None
            prior = {**prior, "sf": None}
        if sf is not None and prior_sf is not None and prior_sf != sf:
            continue
        eligible.append((pf, prior))
    for pf, prior in eligible:
        pq = prior.get("queries", {})
        overlap = [n for n in timings if n in pq]
        if not overlap:
            continue
        now_s = round(sum(timings[n] for n in overlap), 3)
        old_s = round(sum(pq[n] for n in overlap), 3)
        ratio = round(now_s / old_s, 2) if old_s else float("nan")
        lines.append(
            f"# overlap vs {pf}: {len(overlap)} queries, "
            f"{now_s}s now vs {old_s}s then ({ratio}x)"
        )
        if pf == eligible[-1][0]:
            # Unknown CURRENT sf against a prior that declares one:
            # raw seconds across scale factors are incomparable, and
            # with sf=None the eligibility filter above kept ALL
            # priors — gating here would reintroduce the cross-sf
            # phantom class for exactly the nonstandard runs most
            # likely to be off-sf (ADVICE r09). Keep the overlap
            # subtotals, skip the per-query gate, say so.
            if sf is None and prior.get("sf") is not None:
                lines.append(
                    f"# gate skipped vs {pf}: current sf unknown but "
                    f"prior recorded sf={prior.get('sf')} — raw "
                    "cross-sf comparison is unreliable"
                )
                continue
            prior_calib = prior.get("calib_sec") or 0.0
            cpu_host = calib / prior_calib if prior_calib and calib else 1.0
            prior_scan = prior.get("calib_scan_sec") or 0.0
            scan_host = (
                calib_scan / prior_scan
                if prior_scan and calib_scan
                else 1.0
            )
            # max of the two probes: drift in EITHER dimension (CPU or
            # I/O/scheduler) relaxes the gate; a true 2x plan
            # regression exceeds the gate against both (VERDICT r09 #2)
            host = max(cpu_host, scan_host)
            if host != 1.0:
                scan_note = (
                    f"calib_scan {calib_scan}s vs {prior_scan}s"
                    if calib_scan and prior_scan
                    else "scan probe unavailable in one round — "
                    "CPU-only gate"
                )
                lines.append(
                    f"# host factor vs {pf}: {host:.2f}x = max(cpu "
                    f"{cpu_host:.2f}x, scan {scan_host:.2f}x) "
                    f"(calib {calib}s vs {prior_calib}s, {scan_note}) "
                    "— regression gate is calib-relative"
                )
            if adjusted_out is not None:
                # the number the gate compares against 2.0, per query:
                # >1 means slower than the prior round after dividing
                # out host drift; the artifact carries it so no reader
                # needs a second file to interpret a raw-seconds spike
                adjusted_out["prior_file"] = os.path.basename(pf)
                adjusted_out["host_factor"] = round(host, 3)
                # a prior that rounded to 0.0s gets an explicit null —
                # its ratio is undefined, but the gate below flags it
                # whenever the CURRENT timing is nonzero
                # (now > 1.5*host*0); a 0.0-vs-0.0 pair stays silent —
                # both rounds are sub-resolution, nothing to adjudicate
                # (ADVICE r11). Either way the key must not vanish from
                # the one field added for standalone readability.
                adjusted_out["ratios"] = {
                    name: (
                        round(timings[name] / (host * pq[name]), 2)
                        if pq[name]
                        else None
                    )
                    for name in overlap
                }
            # Two flag bands (VERDICT r11 item 2: BENCH_r11 left five
            # queries in the 1.5-2x host-adjusted band with no
            # in-artifact standalone adjudication because only >2x
            # triggered a recheck): >2x keeps the REGRESSION label,
            # (1.5, 2] is ELEVATED — both enter flags_out so main()
            # rechecks them in the same artifact.
            for name in overlap:
                now = timings[name]
                if now <= 1.5 * host * pq[name]:
                    continue
                regression = now > 2 * host * pq[name]
                band = "REGRESSION" if regression else "ELEVATED"
                lines.append(
                    f"# {band} {name}: {now}s vs "
                    f"{pq[name]}s in {pf} "
                    f"(>{'2' if regression else '1.5'}x at host "
                    f"factor {host:.2f})"
                )
                if flags_out is not None:
                    flags_out.append({
                        "name": name,
                        "now_s": now,
                        "prior_s": pq[name],
                        "prior_file": pf,
                        "host": round(host, 3),
                        "band": band.lower(),
                    })
    return lines


if __name__ == "__main__":
    main()
