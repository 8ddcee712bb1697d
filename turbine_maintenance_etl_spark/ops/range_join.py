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
    max_buckets_per_interval: int = 100_000,
) -> DataFrame:
    """Join each point row to every interval row whose
    ``[start_col, end_col]`` (closed) contains ``point_ts``, matching on
    the optional equi-keys ``on``. Non-key column names must be disjoint
    between the two inputs. ``how`` is ``inner`` or ``left``: left keeps
    point rows with no containing interval (interval cols NULL) by
    carrying the range predicate INSIDE one outer join condition —
    Catalyst still extracts the bucket/key equalities as the equi part
    and applies the range as the residual, so the plan stays a hash/SMJ
    join, and no synthetic row ids are needed (they are not stable
    across plan-subtree re-evaluations). ``max_buckets_per_interval``
    fails loudly on intervals whose bucket explosion would OOM an
    executor (sentinel end dates)."""
    on = on or []
    dup = (set(points.columns) & set(intervals.columns)) - set(on)
    if dup:
        raise ValueError(f"ambiguous non-key columns on both sides: {sorted(dup)}")

    pb = points.withColumn(
        "_bucket", F.floor(F.unix_timestamp(F.col(point_ts)) / F.lit(bucket_seconds))
    )
    start_b = F.floor(F.unix_timestamp(F.col(start_col)) / F.lit(bucket_seconds))
    end_b = F.floor(F.unix_timestamp(F.col(end_col)) / F.lit(bucket_seconds))
    # LOUD cap on the per-interval explosion: one sentinel-ended interval
    # (end = 9999-12-31) would otherwise sequence() tens of millions of
    # bucket rows and OOM an executor — the docstring's "bounded by
    # construction" only holds when bucket width ~ interval length, so
    # enforce it instead of assuming it
    span = end_b - start_b + F.lit(1)
    # a NULL start/end bound matches NOTHING (BETWEEN semantics — the
    # theta-join this operator replaces yields no rows for it), it must
    # not fall through the NULL `span <= cap` comparison into the
    # loud-cap error branch (r10 review): NULL sequence -> explode
    # drops the interval row
    seq = F.when(
        F.col(start_col).isNull() | F.col(end_col).isNull(),
        F.lit(None).cast("array<bigint>"),
    ).when(span <= F.lit(max_buckets_per_interval), F.sequence(start_b, end_b)).otherwise(
        F.raise_error(
            F.concat(
                F.lit("range_join: interval spans "),
                span.cast("string"),
                F.lit(
                    f" buckets (> max_buckets_per_interval="
                    f"{max_buckets_per_interval}); raise bucket_seconds to "
                    "match the interval scale, or cap open-ended intervals"
                ),
            )
        ).cast("array<bigint>")
    )
    ib = intervals.withColumn("_bucket", F.explode(seq))
    in_range = (F.col(point_ts) >= F.col(start_col)) & (
        F.col(point_ts) <= F.col(end_col)
    )
    if how == "inner":
        return pb.join(ib, on + ["_bucket"]).filter(in_range).drop("_bucket")
    if how == "left":
        # the range predicate rides IN the join condition, so an
        # unmatched point surfaces as ONE NULL-padded row straight from
        # the outer join — no synthetic row ids (monotonically_increasing
        # _id is NOT stable across the two plan-subtree evaluations a
        # matched/anti-join split would need: a task retry or
        # shuffle-order change reassigns ids and silently duplicates or
        # drops rows)
        interval_only = [c for c in intervals.columns if c not in on]
        ib2 = ib.select(
            *[F.col(k).alias(f"_i_{k}") for k in on],
            F.col("_bucket").alias("_ib"),
            *interval_only,
        )
        cond = pb["_bucket"] == ib2["_ib"]
        for k in on:
            cond = cond & (pb[k] == ib2[f"_i_{k}"])
        cond = cond & in_range
        out = pb.join(ib2, cond, "left")
        return out.select(*points.columns, *interval_only)
    raise ValueError(f"unsupported how={how!r}")
