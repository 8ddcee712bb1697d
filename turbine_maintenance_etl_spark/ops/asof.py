"""As-of (point-in-time) join — Spark has no native one; this is the
union + forward-fill-window formulation.

For each left row, attach the most recent right row with
``right.ts <= left.ts`` sharing the join key (the standard
quote-to-trade / last-known-state join for time-series work).

Plan shape: union both sides tagged → ONE shuffle on the key → one
window sort on (ts, side) → ``last(value, ignorenulls)`` forward fill →
filter back to left rows. This beats the bucketize-and-range-filter
alternative when right-side density is unbounded, and it never builds a
quadratic range join. Ties (equal ts) count the right row as visible,
matching standard ASOF semantics (right rows sort before left rows at
the same timestamp).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    tie_break: str | None = None,
) -> DataFrame:
    """Returns ``left`` with each of ``value_cols`` (default: every right
    column except keys/ts) carrying the latest right-side value as of the
    left row's timestamp (NULL when no right row precedes it).
    ``tie_break`` optionally names a unique left column used to keep the
    window order fully deterministic."""
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in set(on) | {right_ts}]

    l_tagged = left.withColumn("_ts", F.col(left_ts)).withColumn("_side", F.lit(1))
    for c in value_cols:
        l_tagged = l_tagged.withColumn(f"_v_{c}", F.lit(None).cast(right.schema[c].dataType))
    r_tagged = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_v_{c}") for c in value_cols],
    )
    for c in left.columns:
        if c not in r_tagged.columns:
            r_tagged = r_tagged.withColumn(c, F.lit(None).cast(left.schema[c].dataType))

    unioned = l_tagged.unionByName(r_tagged.select(l_tagged.columns))
    order = [F.col("_ts").asc(), F.col("_side").asc()]
    if tie_break:
        order.append(F.col(tie_break).asc_nulls_first())
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.select(
        *left.columns,
        F.col("_side"),
        *[
            F.last(f"_v_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in value_cols
        ],
    )
    return filled.filter(F.col("_side") == 1).drop("_side")
