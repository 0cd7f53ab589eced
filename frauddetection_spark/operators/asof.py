"""As-of join (SURVEY.md §2.3 J3 family): for each left row, the most
recent right row at-or-before it on a time axis, per key.

The naive formulation is an inequality join (left ⋈ right ON key AND
r.ts <= l.ts, then max) — quadratic per key, a disaster on hot keys.
The engine's form is the union-tag-window pattern: interleave both
sides on (key, ts), carry the last-seen right value forward with a
running window, and keep the left rows. ONE shuffle on key, linear
work, no pair explosion — the standard scale answer for as-of /
point-in-time joins (time-series enrichment, attribution, SCD
lookups).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_last_before(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_cols: list[str],
    strict: bool = False,
) -> DataFrame:
    """Enrich `left` with the latest `right_cols` from `right` whose
    `ts` is ≤ (or < when strict) the left row's `ts`, per `key`.

    Implementation: tag and union both sides, sort within key by
    (ts, side) — right side first on ties unless strict — and carry
    right values forward with last_value(ignorenulls) over an
    unbounded-preceding window. Left rows then hold the as-of match.
    """
    lt = left.withColumn("_side", F.lit(1))
    rt = right.withColumn("_side", F.lit(0))
    all_cols = set(lt.columns) | set(rt.columns)
    for c in sorted(all_cols):
        if c not in lt.columns:
            lt = lt.withColumn(c, F.lit(None))
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None))
    ordered_cols = sorted(all_cols)
    u = lt.select(*ordered_cols).union(rt.select(*ordered_cols))
    # strict: left rows sort BEFORE right rows at equal ts, so an
    # equal-ts right row is not visible to them
    side_order = F.col("_side").asc() if not strict else F.col("_side").desc()
    # event_id tiebreak makes the carried value a total-order choice
    # (max (ts, event_id) right row) — deterministic under ts ties
    tiebreak = [F.col("event_id").asc()] if "event_id" in all_cols else []
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), side_order, *tiebreak)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u
    for rc in right_cols:
        carried = carried.withColumn(
            f"asof_{rc}",
            F.last(
                F.when(F.col("_side") == 0, F.col(rc)), ignorenulls=True
            ).over(w),
        )
    return carried.filter(F.col("_side") == 1).drop("_side", *right_cols)
