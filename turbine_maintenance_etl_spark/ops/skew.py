"""Skew-mitigation operators (SURVEY.md §7.4.6, 100 TB design).

AQE handles skewed *joins* automatically; skewed *aggregations* on a hot
key still funnel one key's rows to one task at the final stage. Salting
splits a hot key across ``salt_factor`` sub-keys, aggregates partials,
then merges — two small shuffles instead of one straggler.

Only associative aggregates decompose this way; the helper supports the
common count/sum/min/max family (avg = sum/count at merge time) plus
``approx_distinct``: a Datasketches HLL sketch (``hll_sketch_agg``)
whose partials merge losslessly via ``hll_union_agg`` — the ONLY way a
distinct count decomposes (exact COUNT DISTINCT is not mergeable). The
merged state column holds the BINARY sketch; read the number with
``F.hll_sketch_estimate(col)``. At 100 TB this is the distinct-count
primitive: ~1 KB of state per group regardless of cardinality,
mergeable across salted partials, incremental batches, and commit
windows alike.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MERGES = {
    "count": F.sum,
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
    "approx_distinct": F.hll_union_agg,
}

_PARTIALS = {
    "count": F.count,
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
    "approx_distinct": F.hll_sketch_agg,
}


def partial_agg_exprs(
    aggs: dict[str, tuple[str, str]], prefix: str = ""
) -> list[Column]:
    """Partial (map-side) expressions for a decomposable-aggregate spec
    ``out -> (fn, col)`` with fn in _MERGES; raises on anything that
    can't be merged associatively. Shared by the skew-salted and
    incremental-maintenance operators so the decomposability contract
    lives in one place."""
    unsupported = {fn for fn, _ in aggs.values()} - set(_MERGES)
    if unsupported:
        raise ValueError(f"non-decomposable aggregates: {unsupported}")
    return [
        _PARTIALS[fn](col).alias(f"{prefix}{out}")
        for out, (fn, col) in aggs.items()
    ]


def salted_groupby_agg(
    df: DataFrame,
    group_cols: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_factor: int = 16,
) -> DataFrame:
    """``groupBy(group_cols).agg(...)`` resilient to hot keys.

    ``aggs`` maps output name -> (function, input column) with function
    in {count, sum, min, max}. Stage 1 groups by (key, salt) — hot keys
    split across ``salt_factor`` reducers; stage 2 merges partials by
    key. The salt is CONTENT-DEFINED (full-row hash mod factor), not
    F.rand(): a nondeterministic salt re-rolls on task retry / fetch-
    failure recompute, so reducers that already consumed the original
    map output double-count or lose rows (the SPARK-23207 class of
    silent corruption). A content salt recomputes identically; the one
    trade is that EXACTLY identical rows share a salt bucket — counts
    stay exact, and hot KEYS (the case salting exists for) still spread
    because their non-key columns vary.

    Degenerate shape (round-6 advice): when the frame has NO non-key
    columns (the count-duplicates pattern), a content hash is constant
    per key — every hot-key row lands in ONE salt bucket and the
    straggler returns. There the salt falls back to
    ``spark_partition_id()``: rows spread by physical location, still
    retry-deterministic (a recomputed task keeps its partition id, and
    row->partition assignment upstream is hash-based, order-free)."""
    degenerate = not (set(df.columns) - set(group_cols))
    if degenerate:
        salt_src = F.spark_partition_id().cast("bigint")
    else:
        # map-safe full-row hash (r10 review): raw xxhash64 raises
        # AnalysisException on MapType columns — the same bug class
        # merge_table and asof_join already route through the shared
        # canonicalizing helper; identical hash for map-free schemas
        from turbine_maintenance_etl_spark.io.acid import row_tiebreak_hash

        salt_src = row_tiebreak_hash(df)
    salted = df.withColumn("_salt", F.pmod(salt_src, F.lit(salt_factor)))
    partials = salted.groupBy(*group_cols, "_salt").agg(
        *partial_agg_exprs(aggs, prefix="_p_")
    )
    merge_exprs = [
        _MERGES[fn](f"_p_{out}").alias(out) for out, (fn, _) in aggs.items()
    ]
    return partials.groupBy(*group_cols).agg(*merge_exprs)
