"""Batch twins of the streaming window operators (SURVEY.md §2.8 E7).

Each query here is the oracle-checked *definition* of a window
semantics; frauddetection_spark/streaming/windows.py runs the same
expressions over an unbounded source. Window starts are emitted as
epoch seconds (bigint) — tz-free, dtype-drift-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from frauddetection_spark.plans.registry import register
from frauddetection_spark.queries._util import r6, t

SESSION_GAP_S = 30 * 60


# ---------------------------------------------------------------------------
# tumbling windows
# ---------------------------------------------------------------------------


@register(
    "q_tumbling_counts",
    oracle="""
    SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS window_start,
           event_type,
           count(*) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100
               AS value_sum
    FROM events
    GROUP BY 1, 2 ORDER BY window_start, event_type
    """,
    survey="E7,A1",
)
def q_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly tumbling counts + exact-cents sums per event_type —
    window() is epoch-aligned, so batch and stream bucket identically.
    This is the batch form of streaming.windows.tumbling_counts."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            (
                F.sum(F.round(F.col("value") * 100).cast("bigint")).cast("double")
                / 100
            ).alias("value_sum"),
        )
        .select(
            F.unix_timestamp("w.start").alias("window_start"),
            "event_type",
            "n",
            "value_sum",
        )
        .orderBy("window_start", "event_type")
    )


# ---------------------------------------------------------------------------
# sliding windows
# ---------------------------------------------------------------------------


@register(
    "q_sliding_counts",
    oracle="""
    WITH expanded AS (
        SELECT CAST(floor(epoch(ts) / 1800) * 1800 - k * 1800 AS BIGINT)
                   AS window_start,
               event_type
        FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k)
    )
    SELECT window_start, event_type, count(*) AS n
    FROM expanded GROUP BY 1, 2 ORDER BY window_start, event_type
    """,
    survey="E7",
)
def q_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 30 min: each event belongs to two
    windows (the oracle derives both starts arithmetically — the
    definition window() implements)."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.unix_timestamp("w.start").alias("window_start"),
            "event_type",
            "n",
        )
        .orderBy("window_start", "event_type")
    )


# ---------------------------------------------------------------------------
# session windows (gaps-and-islands form)
# ---------------------------------------------------------------------------


@register(
    "q_session_stats",
    oracle=f"""
    WITH ordered AS (
        SELECT user_id, ts, event_id,
               CAST(round(value * 100) AS BIGINT) AS cents,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS prev_ts
        FROM events
    ),
    marked AS (
        SELECT *,
               CASE WHEN prev_ts IS NULL
                         OR epoch(ts) - epoch(prev_ts) > {SESSION_GAP_S}
                    THEN 1 ELSE 0 END AS is_new
        FROM ordered
    ),
    numbered AS (
        SELECT user_id, ts, cents,
               sum(is_new) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING
               ) AS session_id
        FROM marked
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start,
           CAST(floor(epoch(max(ts))) AS BIGINT) AS session_end,
           count(*) AS n_events,
           CAST(sum(cents) AS DOUBLE) / 100 AS value_sum
    FROM numbered
    GROUP BY 1, 2 ORDER BY user_id, session_id
    """,
    survey="E7,A8",
)
def q_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user 30-min-gap activity sessions as gaps-and-islands
    (lag → new-session flag → running sum → group) — the relational
    decomposition of session_window(); the native operator runs on the
    stream path and parity is asserted in tests/test_streaming.py.
    Scale: both forms shuffle once on user_id."""
    e = t(spark, sf_dir, "events")
    w_order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # (ts, event_id) is a TOTAL order: a ts-only running sum would make
    # session assignment tie-order-dependent (nondeterministic in both
    # engines) for duplicate timestamps at a session boundary.
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = (
        e.select(
            "user_id",
            "ts",
            "event_id",
            F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        )
        .withColumn("prev_ts", F.lag("ts").over(w_order))
        .withColumn(
            "is_new",
            F.when(
                F.col("prev_ts").isNull()
                | (
                    F.unix_timestamp("ts") - F.unix_timestamp("prev_ts")
                    > SESSION_GAP_S
                ),
                1,
            ).otherwise(0),
        )
    )
    numbered = marked.withColumn("session_id", F.sum("is_new").over(w_run))
    return (
        numbered.groupBy("user_id", "session_id")
        .agg(
            F.unix_timestamp(F.min("ts")).alias("session_start"),
            F.unix_timestamp(F.max("ts")).alias("session_end"),
            F.count("*").alias("n_events"),
            (F.sum("cents").cast("double") / 100).alias("value_sum"),
        )
        .orderBy("user_id", "session_id")
    )
