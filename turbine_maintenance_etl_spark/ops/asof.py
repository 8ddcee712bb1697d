"""As-of (point-in-time) join — Spark has no native one; this is the
union + forward-fill-window formulation.

For each left row, attach the most recent right row with
``right.ts <= left.ts`` sharing the join key (the standard
quote-to-trade / last-known-state join for time-series work).

Plan shape: union both sides tagged → ONE shuffle on the key → one
window sort on (ts, side) → forward fill of the right-row STRUCT →
filter back to left rows. This beats the bucketize-and-range-filter
alternative when right-side density is unbounded, and it never builds a
quadratic range join. Ties (equal ts) count the right row as visible,
matching standard ASOF semantics (right rows sort before left rows at
the same timestamp).

Semantics at the edges (all SQL-ASOF-consistent, pinned by tests):

- Right rows with a NULL key or NULL timestamp match NOTHING (they are
  filtered out — left un-filtered, a NULL-ts right row sorts first and
  its value would forward-fill EVERY row of its key).
- Left rows with a NULL key or NULL timestamp get NULL as-of values.
- A right row whose VALUE is genuinely NULL still wins as the latest
  state: values forward-fill inside one struct per right row, so 'no
  preceding row' (struct NULL) is distinguishable from 'latest value is
  NULL' (struct present, field NULL) — a bare last(ignorenulls) per
  value column would skip the NULL and resurrect stale state.
- Duplicate right rows at the same (key, ts) resolve deterministically
  (content-hash order; the last one in hash order wins).
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
    right_tie_cols: list[str] | None = None,
) -> DataFrame:
    """Returns ``left`` with each of ``value_cols`` (default: every right
    column except keys/ts) carrying the latest right-side value as of the
    left row's timestamp (NULL when no right row precedes it).
    ``tie_break`` optionally names a unique left column used to keep the
    window order fully deterministic.

    ``right_tie_cols`` optionally names right VALUE columns that decide
    which of several right rows sharing one (key, ts) wins: they sort
    ascending with NULLs first, so the row with the LARGEST tuple is the
    one forward-filled (e.g. ``["price"]`` makes the max-price quote at
    a tied timestamp the as-of state). This expresses the
    collapse-ties-to-max contract INSIDE the single window pass — the
    equivalent pre-aggregation (groupBy key, ts -> max) costs a second
    shuffle because it hash-partitions on (key, ts) while the window
    partitions on the key alone (r10 plan audit). The content hash
    stays as the final disambiguator for fully identical rows."""
    if not on:
        # partitionBy() with no columns is a single-partition global
        # sort of the entire union — the exact 100 TB failure mode this
        # operator exists to avoid. A keyless as-of needs an explicit
        # constant key so the caller owns that decision.
        raise ValueError(
            "asof_join requires at least one join key; for a keyless "
            "point-in-time join add an explicit constant key column to "
            "both sides (and accept the single-reducer sort it implies)"
        )
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in set(on) | {right_ts}]

    l_tagged = (
        left.withColumn("_ts", F.col(left_ts))
        .withColumn("_side", F.lit(1))
        .withColumn(
            "_rv",
            F.lit(None).cast(
                "struct<" + ", ".join(
                    f"`{c}`: {right.schema[c].dataType.simpleString()}"
                    for c in value_cols
                ) + ">"
            ),
        )
    )
    # right rows that can never match under SQL equality/ordering
    # semantics are dropped up front: a NULL key equals no left key, and
    # a NULL timestamp precedes no left timestamp (un-filtered it sorts
    # FIRST and forward-fills everything)
    r_clean = right.filter(F.col(right_ts).isNotNull())
    for k in on:
        r_clean = r_clean.filter(F.col(k).isNotNull())
    r_tagged = r_clean.select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c) for c in value_cols]).alias("_rv"),
    )
    for c in left.columns:
        if c not in r_tagged.columns:
            r_tagged = r_tagged.withColumn(c, F.lit(None).cast(left.schema[c].dataType))

    unioned = l_tagged.unionByName(r_tagged.select(l_tagged.columns))
    # third key: content hash of the right struct — duplicate right rows
    # at one (key, ts) resolve to the max-hash row on every run/replan
    # instead of whichever the sort happened to emit last. Hash via the
    # shared map-safe tiebreak (r10 review): raw xxhash64 raises
    # AnalysisException when a value column contains a MapType —
    # identical hash for map-free schemas, JSON-canonicalized otherwise.
    from turbine_maintenance_etl_spark.io.acid import value_tiebreak_hash

    rv_type = unioned.schema["_rv"].dataType
    order = [
        F.col("_ts").asc(),
        F.col("_side").asc(),
        # caller-preferred tie winners first (largest tuple sorts last
        # and wins the forward fill); left rows carry a NULL struct, so
        # these keys are constant within the left side and cannot
        # perturb its ordering
        *[F.col("_rv")[c].asc_nulls_first() for c in (right_tie_cols or [])],
        value_tiebreak_hash(F.col("_rv"), rv_type).asc(),
    ]
    if tie_break:
        order.append(F.col(tie_break).asc_nulls_first())
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    key_ok = F.lit(True)
    for k in on:
        key_ok = key_ok & F.col(k).isNotNull()
    fill = F.when(
        key_ok & F.col("_ts").isNotNull(),
        F.last("_rv", ignorenulls=True).over(w),
    )
    filled = unioned.select(
        *left.columns,
        F.col("_side"),
        *[fill[c].alias(f"asof_{c}") for c in value_cols],
    )
    return filled.filter(F.col("_side") == 1).drop("_side")
