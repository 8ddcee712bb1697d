"""SCD Type-2 merge: maintain a dimension table with full change
history (valid_from / valid_to / is_current) from change batches —
the warehouse pattern behind every "as of" lookup, expressed as plain
DataFrame ops (no engine MERGE needed).

Scale shape: one window over the update batch (latest change per key),
one key-shuffle join of updates against the CURRENT slice only (open
rows ≈ key cardinality, usually broadcastable — history rows never
join), then a union. History rows pass through untouched, so the cost
is proportional to the update batch + open set, not to accumulated
history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    tracked_cols: list[str],
    ts_col: str = "ts",
) -> DataFrame:
    """Apply a change batch to an SCD2 dimension.

    ``dim`` columns: key_cols + tracked_cols + (valid_from, valid_to,
    is_current). ``updates`` columns: key_cols + tracked_cols + ts_col.
    If several updates share a key, only the latest (by ts, then
    tracked-column tie-break) applies — batch grain is one effective
    change per key, the standard daily-merge contract.

    Rules: a genuinely changed key closes its open row (valid_to = the
    update's ts) and opens a new one; an unseen key inserts an open
    row; a no-op update (tracked values equal) leaves the dimension
    untouched."""
    w = Window.partitionBy(*key_cols).orderBy(
        F.desc(ts_col), *[F.desc(c) for c in tracked_cols]
    )
    latest = (
        updates.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )

    open_rows = dim.filter(F.col("is_current"))
    history = dim.filter(~F.col("is_current"))

    upd = latest.select(
        *[F.col(c).alias(f"_u_{c}") for c in key_cols],
        *[F.col(c).alias(f"_u_{c}") for c in tracked_cols],
        F.col(ts_col).alias("_u_ts"),
        F.lit(True).alias("_upd"),
    )
    cond = [F.col(c).eqNullSafe(F.col(f"_u_{c}")) for c in key_cols]
    joined = open_rows.withColumn("_dim", F.lit(True)).join(upd, cond, "full_outer")

    same = None
    for c in tracked_cols:
        eq = F.col(c).eqNullSafe(F.col(f"_u_{c}"))
        same = eq if same is None else (same & eq)

    # presence comes from explicit flags, NOT from nullable data columns
    # (valid_from / ts can legitimately be NULL — using them as join
    # sentinels silently deleted any open row with a NULL valid_from and
    # discarded NULL-ts inserts for new keys)
    has_dim = F.col("_dim").isNotNull()
    has_upd = F.col("_upd").isNotNull()
    # stale guard: an update not strictly newer than the open row's
    # valid_from is already superseded — applying it would produce a
    # corrupt interval (valid_to <= valid_from). Treat it as a no-op.
    # NULL-safe three-way: an open row with NULL valid_from accepts any
    # timestamped update (its start is unknown, the update supersedes);
    # an update with a NULL ts is never fresh (it cannot be ordered) —
    # left as raw comparisons the NULLs would make EVERY branch filter
    # false and the row would vanish from the dimension entirely.
    # _u_ts gates FIRST: the old form checked valid_from.isNull() before
    # the ts coalesce, so a NULL-ts update against a NULL-valid_from
    # open row counted as fresh and closed the row with valid_to = NULL
    # — which scd2_as_of reads as still-valid, duplicating the key in
    # every as-of slice.
    fresh = F.when(F.col("_u_ts").isNull(), F.lit(False)).otherwise(
        F.when(F.col("valid_from").isNull(), F.lit(True)).otherwise(
            F.col("_u_ts") > F.col("valid_from")
        )
    )

    # open rows with no update, a no-op update, or a stale update: unchanged
    untouched = joined.filter(has_dim & (~has_upd | same | ~fresh)).select(
        *dim.columns
    )
    # open rows with a real, fresh change: close them at the update timestamp
    closed = (
        joined.filter(has_dim & has_upd & ~same & fresh)
        .select(
            *key_cols, *tracked_cols, "valid_from",
            F.col("_u_ts").alias("valid_to"),
            F.lit(False).alias("is_current"),
        )
    )
    # real fresh changes + brand-new keys: open a fresh row
    opened = (
        joined.filter(has_upd & (~has_dim | (~same & fresh)))
        .select(
            *[F.col(f"_u_{c}").alias(c) for c in key_cols],
            *[F.col(f"_u_{c}").alias(c) for c in tracked_cols],
            F.col("_u_ts").alias("valid_from"),
            F.lit(None).cast(dim.schema["valid_to"].dataType).alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
    )
    return (
        history.unionByName(untouched)
        .unionByName(closed.select(*dim.columns))
        .unionByName(opened.select(*dim.columns))
    )


def scd2_bootstrap(
    snapshot: DataFrame,
    key_cols: list[str],
    tracked_cols: list[str],
    ts_col: str = "ts",
) -> DataFrame:
    """Turn an initial snapshot into an SCD2 dimension (all rows open)."""
    return snapshot.select(
        *key_cols, *tracked_cols,
        F.col(ts_col).alias("valid_from"),
        F.lit(None).cast(snapshot.schema[ts_col].dataType).alias("valid_to"),
        F.lit(True).alias("is_current"),
    )


def scd2_as_of(dim: DataFrame, ts) -> DataFrame:
    """Point-in-time slice: the version of every key valid at ``ts``.

    A NULL ``valid_from`` counts as valid-from-the-beginning: scd2_apply
    deliberately preserves NULL-ts inserts as open rows (see its NULL-ts
    note), so filtering them with a bare ``valid_from <= t`` (NULL ->
    row dropped) would silently lose keys the dimension itself reports
    as current (r10 review)."""
    t = F.lit(ts)
    return dim.filter(
        (F.col("valid_from").isNull() | (F.col("valid_from") <= t))
        & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    )
