"""Range (interval) join — points-in-interval without the quadratic
theta-join.

Spark compiles ``p.ts BETWEEN i.start AND i.end`` (plus an equi key) to
a sort-merge join on the key alone with the range as a post-filter; when
one key has many intervals AND many points that degenerates to per-key
O(P x I). The classic fix (Interval/Grid partitioning — see the range
partitioning literature and Databricks' range-join bin optimization) is
bucketization:

1. pick a bucket width ~ the typical interval length;
2. each point maps to ONE bucket (``floor(epoch / width)``);
3. each interval EXPLODES to every bucket it overlaps
   (``sequence(floor(start/width), floor(end/width))``) — duplication
   factor = interval_len / width + 1, bounded by construction;
4. equi-join on (keys..., bucket) — a plain shuffle/broadcast hash join
   Catalyst + AQE handle well — then apply the exact range predicate as
   a residual filter.

At 100 TB the join is a standard equi-shuffle on a high-cardinality
composite key, so it parallelizes and AQE skew-splits it; no per-key
quadratic blowup, no global sort over point rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str = "ts",
    start_col: str = "w_start",
    end_col: str = "w_end",
    on: list[str] | None = None,
    bucket_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row whose
    ``[start_col, end_col]`` (closed) contains ``point_ts``, matching on
    the optional equi-keys ``on``. Non-key column names must be disjoint
    between the two inputs. ``how`` is ``inner`` or ``left`` (left also
    keeps point rows with no containing interval, interval cols NULL).
    Unmatched left rows are recovered via a synthetic row id — never by
    equality on all point columns, which both breaks on NULLs (NULL
    never equals itself, so a NULL-bearing row would appear matched AND
    NULL-padded) and duplicates genuinely repeated point tuples."""
    on = on or []
    dup = (set(points.columns) & set(intervals.columns)) - set(on)
    if dup:
        raise ValueError(f"ambiguous non-key columns on both sides: {sorted(dup)}")

    if how == "left":
        # id assigned on the source scan; the same plan subtree feeds both
        # the matched and anti-join branches, so ids are consistent
        points = points.withColumn("_pid", F.monotonically_increasing_id())
    pb = points.withColumn(
        "_bucket", F.floor(F.unix_timestamp(F.col(point_ts)) / F.lit(bucket_seconds))
    )
    ib = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start_col)) / F.lit(bucket_seconds)),
                F.floor(F.unix_timestamp(F.col(end_col)) / F.lit(bucket_seconds)),
            )
        ),
    )
    in_range = (F.col(point_ts) >= F.col(start_col)) & (
        F.col(point_ts) <= F.col(end_col)
    )
    if how == "inner":
        return pb.join(ib, on + ["_bucket"]).filter(in_range).drop("_bucket")
    if how == "left":
        matched = pb.join(ib, on + ["_bucket"]).filter(in_range).drop("_bucket")
        interval_only = [c for c in intervals.columns if c not in on]
        missing = points.join(matched.select("_pid"), "_pid", "left_anti")
        for c in interval_only:
            missing = missing.withColumn(c, F.lit(None).cast(intervals.schema[c].dataType))
        return matched.unionByName(missing).drop("_pid")
    raise ValueError(f"unsupported how={how!r}")
