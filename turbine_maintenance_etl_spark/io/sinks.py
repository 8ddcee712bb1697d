"""Sinks (SURVEY.md §2.1 S6/S7/S9/S10).

The reference's SQLite tables + (dataset, unit_nr) B-tree indexes map to
partitioned parquet: ``partitionBy("dataset")`` gives partition pruning on
the coarse axis (4 values) and parquet min/max row-group stats serve the
unit_nr axis. The per-dataset replace/append pattern
(scripts/etl_turbofan.py:118-133) becomes dynamic partition overwrite.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


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


def upsert_by_key(
    spark,
    new_rows: DataFrame,
    path: str,
    keys: tuple[str, ...],
    order_col: str,
    partition_cols: tuple[str, ...] = (),
) -> None:
    """Parquet MERGE-by-rewrite: latest row per key wins (``order_col``
    descending breaks the old-vs-new tie, so re-running with the same
    batch is idempotent — the reference's ml_predictions re-score
    pattern, scripts/ml_pipeline.py:646-667, without SQLite's implicit
    PK replace).

    Scale notes: with ``partition_cols`` + dynamic partition overwrite
    (set in get_spark), ONLY partitions present in ``new_rows`` are
    rewritten — cost is proportional to touched partitions, not table
    size. The window dedup shuffles on the key columns once. For true
    row-level merge without rewrite, layer Delta/Iceberg on the same
    call signature.

    CONCURRENCY CAVEAT: plain parquet has no transaction log, so this
    merge is read-modify-write — two writers upserting the same
    partition concurrently can silently lose one writer's rows (the
    reference's SQLite ``INSERT OR REPLACE`` gave real row-level
    transactions here, sql/sqlite_ddl.sql). Serialize upserts per
    table (one writer job / an external lock), or use
    ``io/acid.py:merge_table`` — the manifest-committed transactional
    twin of this call (same latest-wins semantics, atomic
    create-exclusive commits, optimistic re-applying retry) — when
    multiple concurrent writers are a requirement."""
    from pyspark.sql import Window

    # Existence is probed through the Hadoop FileSystem (works on local
    # AND object-store paths), NOT by catching the read's
    # AnalysisException: a table half-destroyed by a mid-write crash
    # also fails the read, and treating it as 'never existed' would
    # commit a rewrite containing only the current batch — silent total
    # data loss on exactly the retry the docstring promises survives.
    if _dataset_has_files(spark, path):
        existing = spark.read.parquet(path)  # unreadable table -> raise
        if partition_cols:
            # touch only affected partitions: semi-join existing rows
            # down to the partitions the new batch writes. CONTRACT: the
            # partition columns must be IMMUTABLE per key — if a key can
            # move between partition values across batches, its old-
            # partition row is never read here and survives as a stale
            # duplicate; use io/acid.py:merge_table (stats-pruned,
            # key-range-closed) for movable keys.
            parts = new_rows.select(*partition_cols).distinct()
            existing = existing.join(F.broadcast(parts), list(partition_cols), "left_semi")
        merged = existing.unionByName(new_rows, allowMissingColumns=True)
    else:
        merged = new_rows
    # full-row-hash tiebreak: rows tied on order_col must resolve to the
    # same winner on every run/retry (same rule as acid.merge_table)
    from turbine_maintenance_etl_spark.io.acid import row_tiebreak_hash

    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(
        F.col(order_col).desc(),
        row_tiebreak_hash(merged).desc(),
    )
    latest = (
        merged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    # materialize BEFORE overwriting: the plan reads the same path it is
    # about to replace, and a lazy scan racing the delete would corrupt
    # the table. Routed through barrier() (r10 review): in reliable
    # mode an executor lost mid-overwrite would otherwise make the
    # localCheckpointed rows unrecomputable AFTER the source files are
    # already deleted — the one place that lineage cut can lose data.
    from turbine_maintenance_etl_spark.ops.materialize import barrier

    latest = barrier(latest, tag="upsert-latest")
    writer = latest.write.mode("overwrite")
    if partition_cols:
        # per-writer dynamic overwrite: relying on the SESSION conf means
        # any caller outside get_spark() (default = static) TRUNCATES the
        # whole base path and deletes every untouched partition
        writer = writer.option("partitionOverwriteMode", "dynamic")
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(path)


def _dataset_has_files(spark, path: str) -> bool:
    """True iff ``path`` exists and contains at least one file — the
    existence probe for read-modify-write sinks. A present-but-EMPTY
    directory counts as 'no table yet'; a present directory whose read
    then fails is corruption and must surface, never be treated as
    empty. Hadoop FileSystem API, so s3a://hdfs:// paths work."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    if not fs.exists(p):
        return False
    it = fs.listFiles(p, True)  # recursive: partition dirs nest files
    return it.hasNext()


def compact_parquet(spark, path: str, target_partitions: int, sort_cols: tuple[str, ...] = ()) -> int:
    """Small-files compaction: rewrite a parquet dataset into
    ``target_partitions`` files (optionally sorted within files to
    restore min/max row-group pruning). Streaming appends and per-batch
    upserts accrete small files; at 100 TB the file count — not the
    byte count — is what kills scan planning. Returns the file count
    written.

    LOCAL-PATH, FLAT-LAYOUT ONLY (enforced): the swap is os-level
    renames, so object-store URIs are refused (use
    ``io/acid.py:compact_table`` — manifest-committed, works anywhere),
    and a ``partitionBy`` layout is refused rather than silently
    rewritten flat (which would destroy the pruning dirs). The swap is
    rename-based (path→__old, tmp→path, drop __old) instead of
    delete-then-move: no crash window in which the dataset is simply
    gone — a leftover __old/__compact_tmp is recoverable by hand."""
    import os
    import shutil

    if "://" in path and not path.startswith("file://"):
        raise ValueError(
            f"compact_parquet swaps via local renames; {path!r} is a "
            "remote URI — use io/acid.py tables + compact_table there"
        )
    local = path[len("file://"):] if path.startswith("file://") else path
    part_dirs = [
        n for n in os.listdir(local)
        if "=" in n and os.path.isdir(os.path.join(local, n))
    ]
    if part_dirs:
        raise ValueError(
            f"dataset at {path} is hive-partitioned ({part_dirs[:3]}...): a "
            "flat rewrite would silently destroy the pruning layout — "
            "compact each partition directory, or use acid compact_table"
        )
    df = spark.read.parquet(path)
    out = df.repartition(target_partitions)
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    tmp = local.rstrip("/") + "__compact_tmp"
    old = local.rstrip("/") + "__old"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    out.write.mode("overwrite").parquet(tmp)
    if os.path.exists(old):
        shutil.rmtree(old)
    shutil.move(local, old)
    shutil.move(tmp, local)
    shutil.rmtree(old)
    return sum(1 for f in os.listdir(local) if f.endswith(".parquet"))


def write_range_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: tuple[str, ...],
    num_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """ZORDER-lite: repartitionByRange + sortWithinPartitions on the
    cluster columns before writing, so each parquet file covers a
    narrow, disjoint key range and point/range predicates prune to a
    few files via footer min/max stats (the B-tree-index replacement
    for high-cardinality columns that partitionBy can't hold)."""
    (
        df.repartitionByRange(num_files, *cluster_cols)
        .sortWithinPartitions(*cluster_cols)
        .write.mode(mode)
        .parquet(path)
    )


def zorder_expr(
    df: DataFrame, cols: tuple[str, ...], bits_per_dim: int = 8
) -> Column:
    """Morton/Z-order value over 2+ numeric columns: each column is
    bucketized onto [0, 2^bits) via approx-quantile cutpoints (one cheap
    sample pass, driver holds only the cutpoints), then the buckets'
    bits are interleaved into one sort key. Sorting by it clusters rows
    so EVERY participating column gets tight per-file min/max ranges —
    unlike lexicographic multi-column sort, where only the leading
    column prunes. This is the ZORDER BY of lakehouse engines, as plain
    expressions."""
    if bits_per_dim * len(cols) > 63:
        raise ValueError(
            f"bits_per_dim={bits_per_dim} x {len(cols)} columns = "
            f"{bits_per_dim * len(cols)} interleaved bits > 63: bit 63 is "
            "the long's sign bit and higher shifts wrap mod 64 (Java "
            "shift semantics), silently corrupting the Morton order — "
            "lower bits_per_dim"
        )
    n_buckets = 1 << bits_per_dim
    probs = [i / n_buckets for i in range(1, n_buckets)]
    # ONE sample pass computes every column's cutpoints (per-column
    # approxQuantile calls would scan df once per dimension)
    all_cuts = df.stat.approxQuantile(list(cols), probs, 0.01)
    bucketized: list[Column] = []
    for c, cuts in zip(cols, all_cuts):
        # strictly increasing cutpoints (duplicate quantiles collapse)
        uniq: list[float] = []
        for v in cuts:
            if not uniq or v > uniq[-1]:
                uniq.append(v)
        # rank of the row's value among the cutpoints, as one compact
        # higher-order aggregate (a 255-deep when-chain would blow the
        # 64KB codegen method limit and fall back to interpreted)
        cuts_arr = F.array(*[F.lit(float(v)) for v in uniq])
        b = F.aggregate(
            cuts_arr,
            F.lit(0).cast("long"),
            lambda acc, v: acc + F.when(F.col(c).cast("double") > v, 1).otherwise(0),
        )
        bucketized.append(b)
    z = F.lit(0).cast("long")
    for bit in range(bits_per_dim):
        for dim, b in enumerate(bucketized):
            pos = bit * len(bucketized) + dim
            z = z.bitwiseOR(F.shiftleft(F.shiftright(b, bit).bitwiseAND(F.lit(1)), pos))
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cluster_cols: tuple[str, ...],
    num_files: int = 8,
    bits_per_dim: int = 8,
    mode: str = "overwrite",
) -> None:
    """Z-order-clustered parquet layout: range-partition + sort on the
    Morton value, so point/range predicates on ANY clustered column
    prune to a subset of files via footer min/max stats. The multi-
    dimensional upgrade of write_range_clustered for the 100 TB case
    where queries filter on several independent high-cardinality
    columns."""
    z = zorder_expr(df, cluster_cols, bits_per_dim)
    (
        df.withColumn("_z", z)
        .repartitionByRange(num_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )
