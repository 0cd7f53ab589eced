"""Evaluation-metric queries (SURVEY.md §2.7 M5): confusion matrix,
per-class + macro precision/recall/F1, rank-statistic ROC-AUC, and
average precision — all as DataFrame aggregations, so the metric code
itself is oracle-checked (the reference trusts sklearn,
main.py:158-162 / new_utlis_1.py:35-50; we re-derive the formulas
relationally and verify them against DuckDB).

Fixture model: a deterministic "classifier" on the events users —
score = error_share = n_errors / n_events (exact int division), label
= n_errors ≥ 15 (same as queries/sampling.py), prediction = score ≥
0.15. Score correlates with but does not determine the label, so the
confusion matrix and AUC are non-degenerate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from frauddetection_spark.operators.rank import auc_stats, prefix_rank
from frauddetection_spark.plans.registry import register
from frauddetection_spark.queries._util import r6, t

ERROR_THRESHOLD = 15
SCORE_THRESHOLD = 0.15

_SQL_SCORED = f"""
        SELECT user_id,
               CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                    >= {ERROR_THRESHOLD} AS INTEGER) AS label,
               CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                    AS DOUBLE) / count(*) AS score
        FROM events GROUP BY user_id
"""


def _scored(events: DataFrame) -> DataFrame:
    n_err = F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
    return events.groupBy("user_id").agg(
        (n_err >= ERROR_THRESHOLD).cast("int").alias("label"),
        (n_err.cast("double") / F.count("*")).alias("score"),
    )


# ---------------------------------------------------------------------------
# confusion matrix
# ---------------------------------------------------------------------------


@register(
    "q_metric_confusion",
    oracle=f"""
    WITH s AS ({_SQL_SCORED})
    SELECT label,
           CAST(score >= {SCORE_THRESHOLD} AS INTEGER) AS pred,
           count(*) AS n
    FROM s GROUP BY 1, 2 ORDER BY label, pred
    """,
    survey="M5,A11",
)
def q_metric_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix as a groupBy over (label, pred) — the primitive
    every threshold metric derives from. One small shuffle."""
    s = _scored(t(spark, sf_dir, "events"))
    return (
        s.withColumn("pred", (F.col("score") >= SCORE_THRESHOLD).cast("int"))
        .groupBy("label", "pred")
        .agg(F.count("*").alias("n"))
        .orderBy("label", "pred")
    )


# ---------------------------------------------------------------------------
# per-class + macro precision / recall / F1
# ---------------------------------------------------------------------------


@register(
    "q_metric_prf",
    oracle=f"""
    WITH s AS ({_SQL_SCORED}),
    p AS (
        SELECT label, CAST(score >= {SCORE_THRESHOLD} AS INTEGER) AS pred
        FROM s
    ),
    per AS (
        SELECT cls,
               sum(CASE WHEN label = cls AND pred = cls THEN 1 ELSE 0 END) AS tp,
               sum(CASE WHEN label != cls AND pred = cls THEN 1 ELSE 0 END) AS fp,
               sum(CASE WHEN label = cls AND pred != cls THEN 1 ELSE 0 END) AS fn
        FROM p CROSS JOIN (SELECT unnest([0, 1]) AS cls)
        GROUP BY cls
    )
    SELECT cls,
           CAST(tp AS BIGINT) AS tp,
           CAST(fp AS BIGINT) AS fp,
           CAST(fn AS BIGINT) AS fn,
           CAST(tp AS DOUBLE) / nullif(tp + fp, 0) AS precision,
           CAST(tp AS DOUBLE) / nullif(tp + fn, 0) AS recall,
           CAST(2 * tp AS DOUBLE) / nullif(2 * tp + fp + fn, 0) AS f1
    FROM per ORDER BY cls
    """,
    survey="M5",
)
def q_metric_prf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class precision/recall/F1 from exact TP/FP/FN counts
    (macro = mean over this table's rows; reference prints sklearn's
    macro scores, new_utlis_1.py:42-48). The class dimension comes
    from an explode — no per-class query replays."""
    s = _scored(t(spark, sf_dir, "events")).withColumn(
        "pred", (F.col("score") >= SCORE_THRESHOLD).cast("int")
    )
    classes = s.crossJoin(
        F.broadcast(
            spark.range(2).select(F.col("id").cast("int").alias("cls"))
        )
    )
    per = classes.groupBy("cls").agg(
        F.sum(
            F.when((F.col("label") == F.col("cls")) & (F.col("pred") == F.col("cls")), 1).otherwise(0)
        ).alias("tp"),
        F.sum(
            F.when((F.col("label") != F.col("cls")) & (F.col("pred") == F.col("cls")), 1).otherwise(0)
        ).alias("fp"),
        F.sum(
            F.when((F.col("label") == F.col("cls")) & (F.col("pred") != F.col("cls")), 1).otherwise(0)
        ).alias("fn"),
    )
    tp, fp, fn = F.col("tp"), F.col("fp"), F.col("fn")
    return per.select(
        "cls",
        "tp",
        "fp",
        "fn",
        (tp.cast("double") / F.nullif(tp + fp, F.lit(0))).alias("precision"),
        (tp.cast("double") / F.nullif(tp + fn, F.lit(0))).alias("recall"),
        ((2 * tp).cast("double") / F.nullif(2 * tp + fp + fn, F.lit(0))).alias("f1"),
    ).orderBy("cls")


# ---------------------------------------------------------------------------
# ROC-AUC via the Mann-Whitney rank statistic
# ---------------------------------------------------------------------------


@register(
    "q_metric_auc",
    oracle=f"""
    WITH s AS ({_SQL_SCORED}),
    ranked AS (
        SELECT label,
               rank() OVER (ORDER BY score)
                 + (count(*) OVER (PARTITION BY score) - 1) / 2.0 AS avg_rank
        FROM s
    ),
    agg AS (
        SELECT sum(CASE WHEN label = 1 THEN avg_rank ELSE 0 END) AS r_pos,
               sum(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS n_pos,
               sum(CASE WHEN label = 0 THEN 1 ELSE 0 END) AS n_neg
        FROM ranked
    )
    SELECT CAST(n_pos AS BIGINT) AS n_pos, CAST(n_neg AS BIGINT) AS n_neg,
           (r_pos - n_pos * (n_pos + 1) / 2.0)
               / (CAST(n_pos AS DOUBLE) * n_neg) AS auc
    FROM agg
    """,
    survey="M5",
)
def q_metric_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC-AUC without thresholds: AUC = (R⁺ − n⁺(n⁺+1)/2)/(n⁺·n⁻)
    where R⁺ is the summed average-rank of positives (ties → midrank;
    exact: ranks are half-integers, binary-exact doubles).

    Fully distributed (operators/rank.py::auc_stats): ties collapse to
    score grain in one shuffle, midranks come from a range-partitioned
    prefix count — no unpartitioned row-level window, so the query no
    longer funnels every scored row through one task the way the round-2
    ``rank().over(Window.orderBy(score))`` form did. The oracle twin
    keeps the row-level rank formulation — equal by the midrank
    identity."""
    s = _scored(t(spark, sf_dir, "events"))
    return auc_stats(s)


# ---------------------------------------------------------------------------
# average precision (deterministic tie-break ranking)
# ---------------------------------------------------------------------------


@register(
    "q_metric_ap",
    oracle=f"""
    WITH s AS ({_SQL_SCORED}),
    ranked AS (
        SELECT label,
               row_number() OVER (ORDER BY score DESC, user_id) AS k,
               sum(label) OVER (ORDER BY score DESC, user_id) AS cum_pos
        FROM s
    ),
    terms AS (
        SELECT CAST(round(CAST(cum_pos AS DOUBLE) / k * 1000000000)
                    AS BIGINT) AS prec_q,
               label
        FROM ranked
    )
    SELECT CAST(sum(CASE WHEN label = 1 THEN prec_q ELSE 0 END) AS DOUBLE)
               / sum(label) / 1000000000 AS average_precision,
           CAST(sum(label) AS BIGINT) AS n_pos
    FROM terms
    """,
    survey="M5",
)
def q_metric_ap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average precision AP = Σ_k P(k)·rel(k) / n⁺ over the ranked
    list (ties broken by user_id so the ranking is total and identical
    everywhere). Per-term precisions are fixed-point-quantized before
    the sum → exact-int accumulation, one final division.

    The rank and running positive count come from the two-phase
    range-partitioned prefix (operators/rank.py::prefix_rank) — the
    round-2 global ``Window.orderBy(score DESC, user_id)`` was a
    single-reducer sort; now both are partition-local plus broadcast
    offsets, exact because range partitions are ordered and disjoint."""
    s = _scored(t(spark, sf_dir, "events"))
    ranked = prefix_rank(
        s,
        [F.col("score").desc(), F.col("user_id")],
        sums={"cum_pos": F.col("label")},
    ).select("label", F.col("rn").alias("k"), "cum_pos")
    terms = ranked.select(
        "label",
        F.round(F.col("cum_pos").cast("double") / F.col("k") * 1_000_000_000)
        .cast("bigint")
        .alias("prec_q"),
    )
    return terms.agg(
        (
            F.sum(F.when(F.col("label") == 1, F.col("prec_q")).otherwise(0)).cast("double")
            / F.sum("label")
            / 1_000_000_000
        ).alias("average_precision"),
        F.sum("label").cast("bigint").alias("n_pos"),
    )


# ---------------------------------------------------------------------------
# calibration curve (reliability diagram bins)
# ---------------------------------------------------------------------------


@register(
    "q_metric_calibration",
    oracle=f"""
    WITH counts AS (
        SELECT user_id,
               sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS n_err,
               count(*) AS n
        FROM events GROUP BY user_id
    ),
    binned AS (
        SELECT CASE WHEN (10 * n_err) // n > 9 THEN 9
                    ELSE (10 * n_err) // n END AS bin,
               CAST(n_err >= {ERROR_THRESHOLD} AS INTEGER) AS label,
               n_err, n
        FROM counts
    )
    SELECT CAST(bin AS BIGINT) AS bin,
           count(*) AS n_users,
           CAST(sum(label) AS BIGINT) AS positives,
           CAST(sum(n_err) AS BIGINT) AS err_events,
           CAST(sum(n) AS BIGINT) AS events
    FROM binned GROUP BY bin ORDER BY bin
    """,
    survey="M5",
)
def q_metric_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability-diagram bins for the fixture classifier: decile
    score bins by PURE INTEGER arithmetic (bin = ⌊10·n_err/n⌋ capped
    at 9 — no float score materialized, so no boundary drift), with
    integer tallies per bin; observed positive rate = positives /
    n_users and mean predicted rate = err_events / events are exact
    ratios the consumer derives. Reference trusts sklearn's
    calibration_curve; here the binning itself is oracle-checked.
    One groupBy(user) + one groupBy(bin) — two shuffles at any scale.
    """
    e = t(spark, sf_dir, "events")
    n_err = F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
    counts = e.groupBy("user_id").agg(
        n_err.alias("n_err"), F.count("*").alias("n")
    )
    binned = counts.select(
        F.least(F.expr("(10 * n_err) div n"), F.lit(9)).alias("bin"),
        (F.col("n_err") >= ERROR_THRESHOLD).cast("int").alias("label"),
        "n_err",
        "n",
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count("*").alias("n_users"),
            F.sum("label").alias("positives"),
            F.sum("n_err").alias("err_events"),
            F.sum("n").alias("events"),
        )
        .orderBy("bin")
    )
