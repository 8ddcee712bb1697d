"""Lakehouse maintenance sinks: upsert-by-key, compaction, range
clustering — correctness and layout properties."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from turbine_maintenance_etl_spark.io.sinks import (
    compact_parquet,
    upsert_by_key,
    write_range_clustered,
)


def test_upsert_by_key_latest_wins_and_idempotent(spark, tmp_path):
    path = str(tmp_path / "preds")
    batch1 = spark.createDataFrame(
        [(1, "m", 10.0, 1), (2, "m", 20.0, 1), (3, "m", 30.0, 1)],
        "unit_nr int, model string, pred double, version int",
    )
    upsert_by_key(spark, batch1, path, keys=("unit_nr", "model"), order_col="version")
    batch2 = spark.createDataFrame(
        [(2, "m", 99.0, 2), (4, "m", 40.0, 2)],
        "unit_nr int, model string, pred double, version int",
    )
    upsert_by_key(spark, batch2, path, keys=("unit_nr", "model"), order_col="version")
    got = {r["unit_nr"]: r["pred"] for r in spark.read.parquet(path).collect()}
    assert got == {1: 10.0, 2: 99.0, 3: 30.0, 4: 40.0}
    # idempotent: re-applying the same batch changes nothing
    upsert_by_key(spark, batch2, path, keys=("unit_nr", "model"), order_col="version")
    again = {r["unit_nr"]: r["pred"] for r in spark.read.parquet(path).collect()}
    assert again == got


def test_upsert_partitioned_touches_only_new_partitions(spark, tmp_path):
    path = str(tmp_path / "parted")
    b1 = spark.createDataFrame(
        [("FD001", 1, 10.0, 1), ("FD002", 1, 20.0, 1)],
        "dataset string, unit_nr int, pred double, version int",
    )
    upsert_by_key(
        spark, b1, path, keys=("dataset", "unit_nr"), order_col="version",
        partition_cols=("dataset",),
    )
    b2 = spark.createDataFrame(
        [("FD002", 1, 99.0, 2)], "dataset string, unit_nr int, pred double, version int"
    )
    upsert_by_key(
        spark, b2, path, keys=("dataset", "unit_nr"), order_col="version",
        partition_cols=("dataset",),
    )
    rows = {(r["dataset"], r["unit_nr"]): r["pred"] for r in spark.read.parquet(path).collect()}
    assert rows == {("FD001", 1): 10.0, ("FD002", 1): 99.0}


def test_compact_parquet_reduces_files(spark, tmp_path):
    path = str(tmp_path / "frag")
    df = spark.range(0, 10000).withColumn("v", F.rand(42))
    df.repartition(64).write.parquet(path)
    before = sum(1 for f in os.listdir(path) if f.endswith(".parquet"))
    assert before >= 32
    n = compact_parquet(spark, path, target_partitions=4, sort_cols=("id",))
    assert n == 4
    assert spark.read.parquet(path).count() == 10000


def test_range_clustered_files_have_disjoint_ranges(spark, tmp_path):
    path = str(tmp_path / "clustered")
    df = spark.range(0, 20000).withColumn("v", F.rand(7))
    write_range_clustered(df, path, ("id",), num_files=4)
    files = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert len(files) == 4
    spans = []
    for f in files:
        stats = spark.read.parquet(os.path.join(path, f)).agg(
            F.min("id"), F.max("id")
        ).collect()[0]
        spans.append((stats[0], stats[1]))
    spans.sort()
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 < lo2  # disjoint key ranges -> min/max pruning works


def test_zorder_clusters_both_dimensions(spark, tmp_path):
    """Z-order layout gives tight per-file min/max ranges on BOTH
    cluster columns; lexicographic range-clustering only on the leading
    one. Per-file parquet footer stats prove it: the trailing column's
    mean per-file range must shrink materially under Z-order."""
    import pyarrow.parquet as pq

    from turbine_maintenance_etl_spark.io.sinks import (
        write_range_clustered,
        write_zordered,
    )

    df = (
        spark.range(20_000)
        .withColumn("x", (F.col("id") * 2654435761 % 1000003) % 1000)
        .withColumn("y", (F.col("id") * 40503 % 999983) % 1000)
        .select("id", "x", "y")
    )
    lex_dir, z_dir = str(tmp_path / "lex"), str(tmp_path / "zord")
    write_range_clustered(df, lex_dir, ("x", "y"), num_files=16)
    write_zordered(df, z_dir, ("x", "y"), num_files=16)

    def mean_range(path, col):
        import os

        ranges = []
        for f in os.listdir(path):
            if not f.endswith(".parquet"):
                continue
            md = pq.read_metadata(os.path.join(path, f))
            lo, hi = None, None
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    c = md.row_group(rg).column(ci)
                    if c.path_in_schema == col and c.statistics is not None:
                        s = c.statistics
                        lo = s.min if lo is None else min(lo, s.min)
                        hi = s.max if hi is None else max(hi, s.max)
            if lo is not None:
                ranges.append(hi - lo)
        assert ranges
        return sum(ranges) / len(ranges)

    # leading column: both layouts cluster it
    assert mean_range(lex_dir, "x") < 400
    assert mean_range(z_dir, "x") < 600
    # trailing column: lexicographic leaves it unclustered (~full range),
    # Z-order clusters it too
    lex_y, z_y = mean_range(lex_dir, "y"), mean_range(z_dir, "y")
    assert lex_y > 900, f"lex y unexpectedly clustered: {lex_y}"
    assert z_y < 0.65 * lex_y, f"zorder y not clustered: {z_y} vs {lex_y}"


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Appends with a widened schema coexist in one table: mergeSchema
    unions the footers, old files surface NULL for new columns — the
    lakehouse schema-evolution contract (no table rewrite)."""
    path = str(tmp_path / "evolving")
    spark.range(10).select(F.col("id"), F.lit("x").alias("tag")).write.parquet(path)
    (
        spark.range(10, 20)
        .select(F.col("id"), F.lit("y").alias("tag"), F.lit(1.5).alias("score"))
        .write.mode("append").parquet(path)
    )
    merged = spark.read.option("mergeSchema", True).parquet(path)
    assert set(merged.columns) == {"id", "tag", "score"}
    assert merged.count() == 20
    assert merged.filter(F.col("score").isNull()).count() == 10
    assert merged.filter(F.col("score") == 1.5).count() == 10


def test_upsert_by_key_writer_level_dynamic_overwrite(spark, tmp_path):
    """The partitioned upsert must keep untouched partitions even when
    the SESSION conf is static — the dynamic mode rides on the writer."""
    from turbine_maintenance_etl_spark.io.sinks import upsert_by_key

    path = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(1, "A", 1.0, 10), (2, "B", 2.0, 10)], "id long, part string, v double, ts long"
    )
    upsert_by_key(spark, base, path, keys=("id",), order_col="ts",
                  partition_cols=("part",))
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    try:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
        upd = spark.createDataFrame(
            [(2, "B", 9.0, 20)], "id long, part string, v double, ts long"
        )
        upsert_by_key(spark, upd, path, keys=("id",), order_col="ts",
                      partition_cols=("part",))
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    got = {r["id"]: r["v"] for r in spark.read.parquet(path).collect()}
    assert got == {1: 1.0, 2: 9.0}  # partition A survived static session conf


def test_compact_parquet_refuses_remote_and_partitioned(spark, tmp_path):
    import pytest

    from turbine_maintenance_etl_spark.io.sinks import (
        compact_parquet,
        write_partitioned_parquet,
    )

    with pytest.raises(ValueError, match="remote URI"):
        compact_parquet(spark, "s3a://bucket/x", 2)
    p = str(tmp_path / "parted")
    write_partitioned_parquet(
        spark.createDataFrame([(1, "a")], "id long, dataset string"), p
    )
    with pytest.raises(ValueError, match="hive-partitioned"):
        compact_parquet(spark, p, 2)


def test_zorder_rejects_bit_overflow(spark):
    import pytest

    from turbine_maintenance_etl_spark.io.sinks import zorder_expr

    df = spark.createDataFrame([(1, 2, 3)], "a int, b int, c int")
    with pytest.raises(ValueError, match="sign bit"):
        zorder_expr(df, ("a", "b", "c") * 3, bits_per_dim=8)  # 9 dims x 8 bits
