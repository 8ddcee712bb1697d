"""Sinks (SURVEY.md §2.1 S6/S7/S9/S10).

The reference's SQLite tables + (dataset, unit_nr) B-tree indexes map to
partitioned parquet: ``partitionBy("dataset")`` gives partition pruning on
the coarse axis (4 values) and parquet min/max row-group stats serve the
unit_nr axis. The per-dataset replace/append pattern
(scripts/etl_turbofan.py:118-133) becomes dynamic partition overwrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_partitioned_parquet(
    df: DataFrame,
    path: str,
    partition_cols: tuple[str, ...] = ("dataset",),
    mode: str = "overwrite",
) -> None:
    """Partitioned parquet sink. With
    ``spark.sql.sources.partitionOverwriteMode=dynamic`` (set by
    ``get_spark``), mode='overwrite' replaces only the partitions present
    in ``df`` — the Spark analog of the reference's FD001-replace /
    FD002+-append loop."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_table(df: DataFrame, name: str, mode: str = "overwrite", partition_cols: tuple[str, ...] = ()) -> None:
    """Catalog table sink (S6): ``saveAsTable`` so downstream stages load
    by name via ``spark.table`` like the reference's ``SELECT * FROM
    fct_cycles_features`` (scripts/ml_pipeline.py:107-125)."""
    writer = df.write.mode(mode)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.saveAsTable(name)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """CSV sink kept for parity with the reference's checkpoint CSVs
    (scripts/etl_turbofan.py:141-146); parquet is the preferred format."""
    df.write.mode(mode).option("header", True).csv(path)


def write_bucketed(
    df: DataFrame,
    name: str,
    bucket_cols: tuple[str, ...],
    num_buckets: int = 8,
    sort_cols: tuple[str, ...] = (),
    mode: str = "overwrite",
) -> None:
    """Bucketed catalog table (S10 at scale): pre-shuffles rows into
    ``num_buckets`` files by hash of ``bucket_cols`` at WRITE time, so
    every later join/aggregation on those keys reads co-located data and
    skips its Exchange entirely (verified by
    tests/test_explain_plans.py::test_bucketed_join_eliminates_shuffle).

    The 100 TB play: bucket the big fact tables ONCE on the dominant
    join key (e.g. user_id, orderkey); every downstream join between
    co-bucketed tables with matching bucket counts becomes a zero-
    shuffle merge. ``sort_cols`` additionally pre-sorts within buckets
    so sort-merge joins skip their sort pass."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(name)
