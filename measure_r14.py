"""Round-14 optimization measurement harness (measure_r13.py with the
plans directory retargeted at plans/r14).

For a list of query names: min-of-3 wall time with the BENCH
methodology (count() with plan construction inside the timer — the
number comparable to BENCH_r*.json), an optional noop-sink timing
(guide §1.4 — computes every column, isolates computation from the
count()-pruned plan), and the formatted physical plan written to
plans/r14/<name>_<tag>.txt.

Usage:
    python measure_r14.py q_rfm q_item_cf            # time only
    python measure_r14.py --plans before q_rfm       # + capture plans
    python measure_r14.py --noop q_rfm               # + noop timing
    SPARK_GRAFT_SF_DIR=... overrides the data dir (default sf0.1).

Emits one JSON line per query to stdout:
    {"name": ..., "count_s": ..., "noop_s": ..., "rows": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

from frauddetection_spark.plans.registry import load_all
from frauddetection_spark.session import get_spark


def min3(fn, spark, sf_dir, action):
    best, n = float("inf"), 0
    for _ in range(3):
        t0 = time.perf_counter()
        n = action(fn(spark, sf_dir))
        best = min(best, time.perf_counter() - t0)
    return best, n


def job_stats(spark, group: str) -> dict:
    """Jobs/stages/tasks for a job group via the UI REST API — the
    empirical loop of guide §1.1 without a browser. Returns totals and
    the slowest stages so the optimization target is visible."""
    import urllib.request

    base = spark.sparkContext.uiWebUrl
    if not base:
        return {}
    app = json.load(
        urllib.request.urlopen(f"{base}/api/v1/applications", timeout=5)
    )[0]["id"]
    jobs = json.load(
        urllib.request.urlopen(
            f"{base}/api/v1/applications/{app}/jobs?status=succeeded",
            timeout=10,
        )
    )
    mine = [j for j in jobs if j.get("jobGroup") == group]
    stage_ids = sorted({s for j in mine for s in j.get("stageIds", [])})
    stages = json.load(
        urllib.request.urlopen(
            f"{base}/api/v1/applications/{app}/stages?status=complete",
            timeout=10,
        )
    )
    mine_stages = [s for s in stages if s["stageId"] in set(stage_ids)]
    top = sorted(
        (
            {
                "stage": s["stageId"],
                "name": s["name"].split("\n")[0][:60],
                "tasks": s["numCompleteTasks"],
                "ms": s.get("executorRunTime", 0),
                "shuffle_read": s.get("shuffleReadBytes", 0),
                "shuffle_write": s.get("shuffleWriteBytes", 0),
            }
            for s in mine_stages
        ),
        key=lambda d: -d["ms"],
    )
    return {
        "n_jobs": len(mine),
        "n_stages": len(mine_stages),
        "n_tasks": sum(s["numCompleteTasks"] for s in mine_stages),
        "top_stages": top[:6],
    }


def main() -> None:
    args = sys.argv[1:]
    tag = None
    if "--plans" in args:
        i = args.index("--plans")
        tag = args[i + 1]
        del args[i : i + 2]
    do_noop = "--noop" in args
    if do_noop:
        args.remove("--noop")
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="frauddetection-measure-r14")
    registry = load_all()
    # bench.py-parity warmup: JVM + parquet footers + Arrow workers,
    # so per-query numbers here are comparable to the sweep's.
    registry["q_scan_parquet"].fn(spark, sf_dir).collect()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, schema="id long"
    ).count()
    plans_dir = os.path.join(os.path.dirname(__file__), "plans", "r14")
    os.makedirs(plans_dir, exist_ok=True)
    jvm_mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode

    from frauddetection_spark.operators.caching import release_caches

    for name in names:
        spec = registry[name]
        rec: dict = {"name": name, "sf_dir": sf_dir}
        group = f"measure:{name}"
        spark.sparkContext.setJobGroup(group, f"measure:{name}:count")
        release_caches()
        best, n = min3(spec.fn, spark, sf_dir, lambda df: df.count())
        rec["count_s"] = round(best, 3)
        rec["rows"] = n
        try:
            js = job_stats(spark, group)
            # min-of-3: divide job counts by the 3 runs for the
            # per-run shape (caches released between runs, so runs
            # are structurally identical)
            rec["jobs_3runs"] = js
        except Exception as e:  # noqa: BLE001
            rec["jobs_err"] = str(e)[:100]
        spark.sparkContext.setLocalProperty("spark.jobGroup.id", None)
        spark.sparkContext.setLocalProperty("spark.job.description", None)
        if do_noop:
            spark.sparkContext.setJobDescription(f"measure:{name}:noop")
            release_caches()

            def noop(df):
                df.write.format("noop").mode("overwrite").save()
                return -1

            best, _ = min3(spec.fn, spark, sf_dir, noop)
            rec["noop_s"] = round(best, 3)
        if tag:
            release_caches()
            plan = (
                spec.fn(spark, sf_dir)
                ._jdf.queryExecution()
                .explainString(jvm_mode.fromString("formatted"))
                .strip()
            )
            path = os.path.join(plans_dir, f"{name}_{tag}.txt")
            with open(path, "w") as f:
                f.write(plan + "\n")
            rec["plan"] = path
        release_caches()
        spark.sparkContext.setJobDescription(None)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
