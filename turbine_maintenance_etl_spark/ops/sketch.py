"""Mergeable distinct-count sketches (Apache DataSketches HLL via
``hll_sketch_agg`` / ``hll_union_agg``, Spark 3.5+).

The 100 TB pattern these enable: ``approx_count_distinct`` answers ONE
question per scan, but a *stored sketch* is a reusable aggregate —
sketch each partition (day / shard / source) once at ingest, persist the
~KB binary per group, and answer any later union of partitions
(rolling 7-day uniques, per-region rollups, global totals) by merging
sketches — no rescan of the raw data, ever. Sketch merge is exact with
respect to the sketch state: union-of-sketches == sketch-of-union,
which is what makes the pre-aggregation sound (pinned by test).

Plain ``COUNT(DISTINCT)`` at this scale shuffles every distinct value;
a sketch shuffles a fixed ~2^lg_k-register state per group, and the
estimate lands within ~1.6%/sqrt(2^lg_k / 2) relative error.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_LG_K = 12  # 4096 registers, ~1.6% standard error, ~2-4 KB per sketch


def shard_sketches(
    df: DataFrame,
    shard_cols: list[str],
    key_col: str,
    lg_k: int = DEFAULT_LG_K,
    sketch_col: str = "hll_sketch",
) -> DataFrame:
    """Per-shard HLL sketch of ``key_col`` — the INGEST-TIME aggregate
    you persist (binary column, write to parquet alongside row counts).
    One shuffle on the shard key, map-side partial sketching."""
    return df.groupBy(*shard_cols).agg(
        F.hll_sketch_agg(key_col, F.lit(lg_k)).alias(sketch_col),
        F.count("*").alias("n_rows"),
    )


def merge_estimate(
    sketches: DataFrame,
    group_cols: list[str] | None = None,
    sketch_col: str = "hll_sketch",
    estimate_col: str = "approx_distinct",
) -> DataFrame:
    """Merge stored sketches (optionally regrouped to a coarser grain)
    and estimate distinct counts. Input is the sketch table — shard-
    count rows, not raw data — so this runs in milliseconds regardless
    of the original corpus size."""
    agg = [
        F.hll_sketch_estimate(F.hll_union_agg(sketch_col)).alias(estimate_col),
        F.sum("n_rows").alias("n_rows"),
    ]
    if group_cols:
        return sketches.groupBy(*group_cols).agg(*agg)
    return sketches.agg(*agg)


# --- Count-min sketch: the FREQUENCY twin of the HLL distinct-count
# --- sketches above -------------------------------------------------------


def cms_shard_sketches(
    df: DataFrame,
    item_col: str,
    shard_cols: list[str],
    eps: float = 0.001,
    confidence: float = 0.99,
    seed: int = 42,
) -> DataFrame:
    """Per-shard count-min sketches via Spark's built-in
    ``count_min_sketch`` aggregate (JVM, map-side partial merge): one
    fixed-size binary per shard (size ~ ln(1/δ) x e/ε, independent of
    item cardinality). Like the HLL table, the sketch table answers
    later frequency questions at ANY coarser grain by merging — no
    corpus rescan, which is the point at 100 TB: sketch once at ingest,
    query forever."""
    return df.groupBy(*shard_cols).agg(
        F.expr(
            f"count_min_sketch({item_col}, {eps}d, {confidence}d, {seed})"
        ).alias("cms")
    )


def cms_merge_estimate(
    spark,
    sketches: DataFrame,
    items: list,
) -> dict:
    """Merge all shard sketches (driver-side: each sketch is a bounded
    binary, shard count is small by construction) and estimate the
    frequency of each candidate item. CMS NEVER underestimates
    (estimate >= true count) and overestimates by at most ε x N with
    probability >= confidence — the right tool for heavy-hitter
    screening where false positives get exact-verified downstream."""
    rows = sketches.select("cms").collect()
    jvm = spark.sparkContext._jvm
    merged = None
    for r in rows:
        s = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
            bytearray(bytes(r["cms"]))
        )
        merged = s if merged is None else merged.mergeInPlace(s)
    if merged is None:
        return {it: 0 for it in items}
    return {it: int(merged.estimateCount(it)) for it in items}
