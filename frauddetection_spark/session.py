"""SparkSession factory with scale-oriented defaults.

Every knob here is chosen for the 1000-executor / 100 TB target, not for
the local[32] test box:

- AQE on (runtime shuffle-partition coalescing, skew-join splitting,
  dynamic broadcast conversion) — the single highest-leverage setting
  for plans whose cardinalities we can't predict at authoring time.
- Arrow on — every pandas interchange (pandas_udf, applyInPandas,
  toPandas at the ML boundary) goes through columnar batches instead of
  pickled rows.
- UTC session timezone — timestamp semantics must not depend on the
  machine the driver happens to run on (and must match the DuckDB
  oracle, which compares naive timestamps).
- Explicit shuffle partitions as a *starting point*; AQE coalesces down.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "frauddetection-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession configured for this engine.

    Parameters are overridable for tests; production deployments pass
    ``master=None`` and let spark-submit supply the cluster manager.
    """
    cpus = DEFAULT_CPUS
    builder = (
        SparkSession.builder.appName(app_name)
        # --- adaptivity: let the runtime fix what the planner can't know
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # --- columnar python interchange
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # --- deterministic timestamp semantics (matches DuckDB oracle)
        .config("spark.sql.session.timeZone", "UTC")
        # --- testdata writes TIMESTAMP(NANOS); Spark has no nanos type.
        #     Read as int64 and convert to micros in the loader (same
        #     truncation DuckDB applies).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # --- shuffle sizing: start at #cores locally; a real cluster
        #     would start at ~2-3x total cores and let AQE coalesce.
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions if shuffle_partitions is not None else cpus),
        )
        # --- scan sizing: default 128m is right for the 100 TB target
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # --- broadcast: dims (region/nation/customer/supplier/part at
        #     test SFs) should broadcast; AQE also converts at runtime.
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        # --- heap: scaled with the core count (0.75 GiB per local
        #     core, floor 8g), SPARK_GRAFT_DRIVER_MEM overrides (the
        #     scale audit auto-sizes from data; clusters pass their
        #     own). local[N] packs N executor cores into ONE driver
        #     JVM, so a flat heap starves concurrent tasks as N grows:
        #     the flat-8g default gave 32 tasks 0.25 GiB each — ~10x
        #     under any production executor sizing (guide §5) — and a
        #     controlled r13 profile measured jvmGcTime 119s→40s when
        #     raising it to 24g, with three r13 sweep queries running
        #     2-8x over their own same-JVM standalone rechecks from GC
        #     churn alone. r14 makes heap-per-core the default (24g at
        #     32 cores, 8g at ≤10 — the 8-core comparison run keeps
        #     its r13 heap). This is §5 memory sizing that transfers
        #     to any executor shape, not a local-only tune; the
        #     round-over-round comparability break is documented in
        #     OPTIMIZATION_r14.md.
        .config(
            "spark.driver.memory",
            os.environ.get(
                "SPARK_GRAFT_DRIVER_MEM", f"{max(8, (cpus * 3) // 4)}g"
            ),
        )
    )
    if master is not None:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER_URL"):
        builder = builder.master(f"local[{cpus}]")
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
