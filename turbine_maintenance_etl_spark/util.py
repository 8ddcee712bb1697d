"""Small shared utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_factor: float = 1.0) -> DataFrame:
    """Repartition up to the cluster's default parallelism when the input
    has fewer partitions.

    Small parquet files (one row group) arrive as a single partition; any
    compute-heavy per-row operator (hashing, shingling, vector math)
    would then run on one core. One cheap shuffle of the raw rows buys
    full-width parallelism. On big inputs (>= default parallelism
    partitions — the 100 TB case) this is a no-op, so library operators
    can call it unconditionally."""
    sc = df.sparkSession.sparkContext
    target = int(sc.defaultParallelism * min_factor)
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
