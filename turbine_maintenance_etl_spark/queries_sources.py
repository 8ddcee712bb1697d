"""Graded oracle entries for the source/sink/catalog operators (SURVEY
§2.1 S1-S10) and the grouped-map UDF surface (§2 UD1) — the operator
families that previously had only pytest coverage because their
semantics live outside a single SELECT.

Each entry is engineered so a DuckDB oracle CAN verify it:

- S1/S2: both engines parse the SAME immutable raw NASA C-MAPSS text
  files shipped with the reference (read-only inputs; reference
  scripts/etl_turbofan.py:10-19 is the behavior spec).
- S3/S4/S5: Spark's catalog API vs DuckDB's information_schema over the
  driver-registered views.
- S6/S7/S9/S10: Spark writes parquet (partitioned, overwrite) + CSV to
  a scratch dir and re-reads them; the oracle computes the same
  aggregates from the source view — equality proves the round-trip was
  lossless and the partition-pruned read selected the right subset.
- UD1: applyInPandas per-group least squares vs SQL REGR_SLOPE.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from turbine_maintenance_etl_spark.io.cmapss import read_cmapss_text, read_rul_truth
from turbine_maintenance_etl_spark.queries import _t, register

# Immutable raw inputs from the reference distribution (read-only).
# Overridable so the graded entry survives environments where the
# reference checkout lives elsewhere.
_RAW_DIR = os.environ.get("SPARK_GRAFT_RAW_DIR", "/root/reference/data/raw")

_CMAPSS_NAMES_SQL = (
    "['unit_nr','time_cycles','setting1','setting2','setting3',"
    + ",".join(f"'sensor{i}'" for i in range(1, 22))
    + "]"
)


@register(
    "s1_s2_text_scan_suite",
    f"""
    SELECT 'train' AS src, COUNT(*) AS n,
           CAST(COUNT(DISTINCT unit_nr) AS BIGINT) AS n_keys,
           ROUND(SUM(sensor9), 2) AS checksum
    FROM read_csv('{_RAW_DIR}/train_FD001.txt', sep=' ', header=false,
                  names={_CMAPSS_NAMES_SQL})
    UNION ALL
    SELECT 'rul' AS src, COUNT(*) AS n,
           CAST(COUNT(DISTINCT rul_true) AS BIGINT) AS n_keys,
           ROUND(SUM(CAST(rul_true AS DOUBLE)), 2) AS checksum
    FROM read_csv('{_RAW_DIR}/RUL_FD001.txt', sep=' ', header=false,
                  names=['rul_true'])
    """,
)
def s1_s2_text_scan_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 (whitespace-text scan → typed positional projection) + S2
    (headerless single-column CSV scan): parse the reference's raw
    FD001 train + RUL files and reduce each to an order-insensitive
    checksum row. Matching the oracle proves the text parser agrees
    with an independent CSV reader on every value it keeps."""
    train = read_cmapss_text(spark, f"{_RAW_DIR}/train_FD001.txt")
    t = train.agg(
        F.count("*").alias("n"),
        F.countDistinct("unit_nr").cast("bigint").alias("n_keys"),
        F.round(F.sum("sensor9"), 2).alias("checksum"),
    ).select(F.lit("train").alias("src"), "n", "n_keys", "checksum")
    rul = read_rul_truth(spark, f"{_RAW_DIR}/RUL_FD001.txt")
    r = rul.agg(
        F.count("*").alias("n"),
        F.countDistinct("rul_true").cast("bigint").alias("n_keys"),
        F.round(F.sum(F.col("rul_true").cast("double")), 2).alias("checksum"),
    ).select(F.lit("rul").alias("src"), "n", "n_keys", "checksum")
    return t.unionByName(r)


@register(
    "s3_s5_catalog_introspection",
    """
    SELECT 'column' AS probe, 'events.' || column_name AS key,
           CAST(ordinal_position AS BIGINT) AS val
    FROM information_schema.columns WHERE table_name = 'events'
    UNION ALL
    SELECT 'exists' AS probe, 'lineitem' AS key,
           CAST((SELECT COUNT(*) FROM information_schema.tables
                 WHERE table_name = 'lineitem') AS BIGINT) AS val
    UNION ALL
    SELECT 'exists' AS probe, 'no_such_table' AS key,
           CAST((SELECT COUNT(*) FROM information_schema.tables
                 WHERE table_name = 'no_such_table') AS BIGINT) AS val
    UNION ALL
    SELECT 'table_rows' AS probe, 'lineitem' AS key, COUNT(*) AS val
    FROM lineitem
    """,
)
def s3_s5_catalog_introspection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3 (catalog table scan via spark.table) + S4 (table-existence
    probe, the reference's idempotent-load guard) + S5 (column
    introspection, the dbt-Jinja column-reflection analog): probes are
    emitted as (probe, key, val) rows so DuckDB's information_schema
    can verify each one."""
    ev = _t(spark, sf_dir, "events")
    rows = [("column", f"events.{c}", i + 1) for i, c in enumerate(ev.columns)]
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("catalog_probe_lineitem")
    rows.append(
        ("exists", "lineitem", int(spark.catalog.tableExists("catalog_probe_lineitem")))
    )
    rows.append(
        (
            "exists",
            "no_such_table",
            int(spark.catalog.tableExists("catalog_probe_no_such_table")),
        )
    )
    static = spark.createDataFrame(rows, "probe string, key string, val long")
    counted = (
        spark.table("catalog_probe_lineitem")
        .agg(F.count("*").alias("val"))
        .select(F.lit("table_rows").alias("probe"), F.lit("lineitem").alias("key"), "val")
    )
    return static.unionByName(counted)


@register(
    "s_sink_roundtrip",
    """
    SELECT 'parquet' AS sink, COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS total
    FROM orders
    UNION ALL
    SELECT 'csv' AS sink, COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS total
    FROM orders
    UNION ALL
    SELECT 'parquet_pruned' AS sink, COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS total
    FROM orders WHERE o_orderstatus = 'O'
    """,
)
def s_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6 (overwrite-mode sink) + S7 (CSV sink) + S9 (parquet sink) +
    S10 (partitioned layout as the index analog): write orders to a
    scratch dir as status-partitioned parquet and headered CSV, re-read
    both, and aggregate. The oracle aggregates the source view directly
    — equality proves both sinks round-trip losslessly, and the
    'parquet_pruned' row proves the partition layout actually prunes
    (only the o_orderstatus=O directory is scanned). Scratch lives in a
    fresh mkdtemp and is REMOVED before returning (r10 review: the old
    pid-keyed /tmp path leaked a full copy of orders per driver
    process, forever); the 3-row summary is collected first, same
    pattern as the acid entries in this file."""
    tmp = tempfile.mkdtemp(prefix="spark_sink_roundtrip_")
    try:
        src = _t(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
        )
        src.write.mode("overwrite").partitionBy("o_orderstatus").parquet(f"{tmp}/pq")
        src.write.mode("overwrite").option("header", True).csv(f"{tmp}/csv")
        pq = spark.read.parquet(f"{tmp}/pq")
        csv = (
            spark.read.option("header", True)
            .schema("o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double")
            .csv(f"{tmp}/csv")
        )

        def summarize(df: DataFrame, sink: str) -> DataFrame:
            return df.agg(
                F.count("*").alias("n"),
                F.round(F.sum("o_totalprice"), 2).alias("total"),
            ).select(F.lit(sink).alias("sink"), "n", "total")

        rows = (
            summarize(pq, "parquet")
            .unionByName(summarize(csv, "csv"))
            .unionByName(
                summarize(pq.filter(F.col("o_orderstatus") == "O"), "parquet_pruned")
            )
        ).collect()
        return spark.createDataFrame(rows, "sink string, n bigint, total double")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


_SLOPE_SCHEMA = "user_id bigint, n bigint, slope double"


@register(
    "ud_grouped_map_slope",
    """
    SELECT user_id, n,
           -- a NaN-poisoned fit surfaces as NULL, not NaN: the engine
           -- returns the slope through the pandas-UDF Arrow boundary,
           -- whose pandas->Arrow conversion folds a float NaN into
           -- Arrow NULL (r10 adversarial sweep, caught only by the
           -- null-mask-aware compare)
           ROUND(CASE WHEN isnan(s) THEN NULL ELSE s END, 4) AS slope
    FROM (
        SELECT user_id, COUNT(*) AS n, REGR_SLOPE(value, rn) AS s
        FROM (
            SELECT user_id, value,
                   ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
            FROM events
        ) GROUP BY user_id
    )
    """,
)
def ud_grouped_map_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UD1 (grouped-map applyInPandas, the reference's
    groupby().apply() surface): per-user least-squares trend of value
    over its (ts, event_id)-ordered sequence index, fitted in Arrow
    batches of whole groups. Oracle is SQL REGR_SLOPE over the same
    ordered index (slope is shift-invariant in x, so 0- vs 1-based
    indexing cannot disagree). Scale: one shuffle on user_id, Arrow
    transfer only of (user_id, event_id, ts, value)."""
    e = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        "value",
        # Arrow->pandas folds SQL NULL and a real NaN reading into the
        # same float NaN, but REGR_SLOPE excludes only the NULL pairs
        # (a NaN pair participates and poisons the slope to NaN) — so
        # the NULL/NaN distinction must be computed JVM-side and
        # shipped as a flag (r10 adversarial sweep)
        F.isnull("value").alias("value_is_null"),
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        n_all = len(pdf)
        # x is the 0-based position over the FULL ordered sequence (the
        # oracle's ROW_NUMBER numbers NULL rows too); NULL-value pairs
        # are then dropped pairwise, keeping their x gaps
        keep = ~pdf["value_is_null"].to_numpy(dtype=bool)
        y = pdf["value"].to_numpy(dtype=float)[keep]
        x = np.arange(n_all, dtype=float)[keep]
        slope = None
        if len(y) >= 2:
            xc = x - x.mean()
            denom = float((xc * xc).sum())
            if denom > 0.0:
                slope = float((xc * (y - y.mean())).sum() / denom)
        return pd.DataFrame(
            {"user_id": [int(pdf["user_id"].iloc[0])], "n": [n_all], "slope": [slope]}
        )

    # round SPARK-side (r10 review): Python's round() is half-to-even,
    # but the repo's pinned convention is Spark HALF_UP == DuckDB
    # half-away-from-zero — an exact dyadic tie at the 4th decimal
    # would round differently inside the UDF than in the oracle
    return (
        e.groupBy("user_id")
        .applyInPandas(fit, _SLOPE_SCHEMA)
        .withColumn("slope", F.round("slope", 4))
    )


@register(
    "s_jsonl_roundtrip",
    """
    SELECT 'jsonl' AS source, COUNT(*) AS n,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum,
           CAST(SUM(length(text)) AS BIGINT) AS char_sum
    FROM documents
    UNION ALL
    SELECT 'jsonl_inferred' AS source, COUNT(*) AS n,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum,
           CAST(SUM(length(text)) AS BIGINT) AS char_sum
    FROM documents
    """,
)
def s_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines source/sink round trip — the interchange format every
    LLM-data pipeline ingests from and exports to. Writes documents as
    JSONL, re-reads them twice: once with an EXPLICIT schema (the scale
    path — schema-on-read inference costs a full extra pass over 100 TB
    and silently widens types), once inferred (the convenience path),
    and proves both land byte-identical aggregates vs the source. JSON
    string escaping round-trips embedded newlines/quotes in text — the
    reason line-based CSV can't serve this role. Scratch is mkdtemp'd
    and removed before returning (r10 review: the pid-keyed /tmp path
    leaked a corpus copy per driver process)."""
    tmp = tempfile.mkdtemp(prefix="spark_jsonl_roundtrip_")
    try:
        src = _t(spark, sf_dir, "documents").select("doc_id", "text")
        src.write.mode("overwrite").json(tmp)
        explicit = spark.read.schema("doc_id long, text string").json(tmp)
        inferred = spark.read.json(tmp).select("doc_id", "text")

        def summarize(df: DataFrame, tag: str) -> DataFrame:
            return df.agg(
                F.count("*").alias("n"),
                F.sum("doc_id").alias("id_sum"),
                F.sum(F.length("text")).alias("char_sum"),
            ).select(F.lit(tag).alias("source"), "n", "id_sum", "char_sum")

        rows = (
            summarize(explicit, "jsonl")
            .unionByName(summarize(inferred, "jsonl_inferred"))
        ).collect()
        return spark.createDataFrame(
            rows, "source string, n bigint, id_sum bigint, char_sum bigint"
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@register(
    "s_orc_roundtrip",
    """
    SELECT 'orc' AS source, COUNT(*) AS n,
           CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM orders
    UNION ALL
    SELECT 'orc_pruned' AS source, COUNT(*) AS n,
           CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM orders WHERE o_orderstatus = 'F'
    """,
)
def s_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC source/sink round trip — the other columnar interchange
    format (Hive/Trino ecosystems). Write orders as status-partitioned
    ORC, re-read, and aggregate; the 'orc_pruned' row proves partition
    pruning works identically to parquet (only the
    o_orderstatus=F directory is scanned). Columnar stats, predicate
    pushdown, and vectorized reads all apply to ORC in Spark the same
    way — format choice is a config concern, not an engine rewrite.
    Scratch is mkdtemp'd and removed before returning (r10 review)."""
    tmp = tempfile.mkdtemp(prefix="spark_orc_roundtrip_")
    try:
        src = _t(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderstatus", "o_totalprice"
        )
        src.write.mode("overwrite").partitionBy("o_orderstatus").orc(tmp)
        back = spark.read.orc(tmp)

        def summarize(df: DataFrame, tag: str) -> DataFrame:
            return df.agg(
                F.count("*").alias("n"),
                F.sum("o_orderkey").alias("key_sum"),
                F.round(F.sum("o_totalprice"), 2).alias("total"),
            ).select(F.lit(tag).alias("source"), "n", "key_sum", "total")

        rows = (
            summarize(back, "orc")
            .unionByName(
                summarize(back.filter(F.col("o_orderstatus") == "F"), "orc_pruned")
            )
        ).collect()
        return spark.createDataFrame(
            rows, "source string, n bigint, key_sum bigint, total double"
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@register(
    "s_acid_table_roundtrip",
    """
    WITH v1 AS (SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 3 = 0),
    v2new AS (SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 3 = 1),
    v2 AS (SELECT * FROM v1 UNION ALL SELECT * FROM v2new),
    upd AS (SELECT o_orderkey, ROUND(o_totalprice * 2, 2) AS o_totalprice
            FROM orders WHERE o_orderkey % 6 = 0),
    latest AS (
        SELECT o_orderkey,
               COALESCE(u.o_totalprice, v.o_totalprice) AS o_totalprice
        FROM v2 v LEFT JOIN upd u USING (o_orderkey))
    SELECT 'v1' AS snap, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(o_totalprice), 2) AS total FROM v1
    UNION ALL
    SELECT 'v2', COUNT(*), ROUND(SUM(o_totalprice), 2) FROM v2
    UNION ALL
    SELECT 'latest', COUNT(*), ROUND(SUM(o_totalprice), 2) FROM latest
    """,
)
def s_acid_table_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The transactional table format (io/acid.py) proven end to end:
    CREATE (orders%3=0) -> APPEND (%3=1) -> MERGE (double the price of
    %6=0 keys, latest version wins) against a manifest-committed table,
    then TIME-TRAVEL reads of v1/v2 plus the latest snapshot, each
    reduced to (count, price checksum) rows the DuckDB oracle recomputes
    relationally from the raw orders table. Exercises atomic
    create-exclusive commits, snapshot manifests, and the merge's
    recompute-under-retry path on real data — the caveat-free
    replacement for sinks.upsert_by_key's read-modify-write."""
    import shutil
    import tempfile

    from turbine_maintenance_etl_spark.io import acid

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice")
    )
    tmp = tempfile.mkdtemp(prefix="spark_graft_acid_")
    path = f"{tmp}/orders_acid"
    try:
        acid.create_table(
            spark,
            o.filter(F.col("o_orderkey") % 3 == 0).withColumn("ver", F.lit(1)),
            path,
            stats_cols=("o_orderkey",),  # exercises the stats-pruned merge path
        )
        acid.append_table(
            spark, o.filter(F.col("o_orderkey") % 3 == 1).withColumn("ver", F.lit(1)), path
        )
        upd = (
            o.filter(F.col("o_orderkey") % 6 == 0)
            .select(
                "o_orderkey",
                F.round(F.col("o_totalprice") * 2, 2).alias("o_totalprice"),
                F.lit(2).alias("ver"),
            )
        )
        acid.merge_table(spark, upd, path, keys=("o_orderkey",), order_col="ver")

        def summarize(tag: str, version: int | None):
            return (
                acid.read_table(spark, path, version)
                .agg(
                    F.lit(tag).alias("snap"),
                    F.count("*").alias("n"),
                    F.round(F.sum("o_totalprice"), 2).alias("total"),
                )
            )

        out = (
            summarize("v1", 1)
            .unionByName(summarize("v2", 2))
            .unionByName(summarize("latest", None))
        )
        return spark.createDataFrame(
            out.collect(), "snap string, n bigint, total double"
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@register(
    "s_acid_table_changes",
    """
    WITH v2new AS (
        SELECT o_orderkey, ROUND(o_totalprice, 2) AS p
        FROM orders WHERE o_orderkey % 3 = 1),
    upd AS (
        SELECT o_orderkey, ROUND(o_totalprice, 2) AS p
        FROM orders WHERE o_orderkey % 6 = 0)
    SELECT 'v1_v2' AS win, 'insert' AS change_type,
           CAST(COUNT(*) AS BIGINT) AS n, ROUND(SUM(p), 2) AS total
    FROM v2new
    UNION ALL
    SELECT 'v2_v3', 'delete', COUNT(*), ROUND(SUM(p), 2) FROM upd
    UNION ALL
    SELECT 'v2_v3', 'insert', COUNT(*), ROUND(SUM(ROUND(p * 2, 2)), 2) FROM upd
    """,
)
def s_acid_table_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change data feed over the transactional table (io/acid.py
    ``table_changes``): CREATE (%3=0) -> APPEND (%3=1) -> MERGE (double
    the price of %6=0 keys), then the row-level diff of each commit
    window, summarized per (window, change_type) so the DuckDB oracle
    recomputes it relationally. Proves (a) a pure append surfaces as
    inserts only — and via the manifest the shared base dir is never
    even read; (b) a merge-update surfaces as delete-of-old +
    insert-of-new for exactly the touched keys, with rewritten-but-
    unchanged rows cancelling in the bag diff (exceptAll), carried or
    not. The streaming/CDC consumer contract, downstream of any
    engine's commit log."""
    import shutil
    import tempfile

    from turbine_maintenance_etl_spark.io import acid

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", F.round("o_totalprice", 2).alias("p")
    )
    tmp = tempfile.mkdtemp(prefix="spark_graft_acid_cdf_")
    path = f"{tmp}/orders_cdf"
    try:
        acid.create_table(
            spark,
            o.filter(F.col("o_orderkey") % 3 == 0).withColumn("ver", F.lit(1)),
            path,
            stats_cols=("o_orderkey",),
        )
        acid.append_table(
            spark,
            o.filter(F.col("o_orderkey") % 3 == 1).withColumn("ver", F.lit(1)),
            path,
        )
        upd = o.filter(F.col("o_orderkey") % 6 == 0).select(
            "o_orderkey",
            F.round(F.col("p") * 2, 2).alias("p"),
            F.lit(2).alias("ver"),
        )
        acid.merge_table(spark, upd, path, keys=("o_orderkey",), order_col="ver")

        def summarize(tag: str, lo: int, hi: int) -> DataFrame:
            return (
                acid.table_changes(spark, path, lo, hi)
                .groupBy("_change_type")
                .agg(F.count("*").alias("n"), F.round(F.sum("p"), 2).alias("total"))
                .select(
                    F.lit(tag).alias("win"),
                    F.col("_change_type").alias("change_type"),
                    "n",
                    "total",
                )
            )

        out = summarize("v1_v2", 1, 2).unionByName(summarize("v2_v3", 2, 3))
        return spark.createDataFrame(
            out.collect(), "win string, change_type string, n bigint, total double"
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@register(
    "s_acid_stream_tail",
    """
    SELECT 1 AS commit_version, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(value), 4) AS total
    FROM events WHERE event_id % 3 = 0
    UNION ALL
    SELECT 2, COUNT(*), ROUND(SUM(value), 4) FROM events WHERE event_id % 3 = 1
    UNION ALL
    SELECT 3, COUNT(*), ROUND(SUM(value), 4) FROM events WHERE event_id % 3 = 2
    """,
)
def s_acid_stream_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The acid streaming source graded end to end: CREATE + two
    APPENDs build a transactional events table, then a REAL Structured
    Streaming query (``readStream.format('acidtable')`` →
    availableNow → parquet sink) tails the commit log; the sunk rows,
    summarized per ``_commit_version``, must equal the oracle's
    relational recompute of each commit's slice — proving the source
    emits every commit's rows exactly once with correct provenance
    (io/acid_stream.py)."""
    import shutil
    import tempfile

    from turbine_maintenance_etl_spark.io import acid
    from turbine_maintenance_etl_spark.io.acid_stream import (
        register_acid_stream_source,
    )

    register_acid_stream_source(spark)
    ev = _t(spark, sf_dir, "events").select(
        "event_id", F.round("value", 4).alias("value")
    )
    tmp = tempfile.mkdtemp(prefix="spark_graft_acid_stream_")
    path, out, ckpt = f"{tmp}/tbl", f"{tmp}/out", f"{tmp}/ckpt"
    try:
        acid.create_table(spark, ev.filter(F.col("event_id") % 3 == 0), path)
        acid.append_table(spark, ev.filter(F.col("event_id") % 3 == 1), path)
        acid.append_table(spark, ev.filter(F.col("event_id") % 3 == 2), path)
        q = (
            spark.readStream.format("acidtable")
            .load(path)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            # a wedged drain must FAIL the entry, not grade a partially
            # written sink — and the finally-rmtree below would delete
            # the table under a still-running query (r10 review)
            q.stop()
            raise TimeoutError("acid stream tail did not drain within 300s")
        sunk = spark.read.parquet(out)
        agg = (
            sunk.groupBy(F.col("_commit_version").cast("int").alias("commit_version"))
            .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total"))
        )
        return spark.createDataFrame(
            agg.collect(), "commit_version int, n bigint, total double"
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@register(
    "s_acid_cdf_incremental_agg",
    """
    WITH base AS (
        SELECT o_orderkey, o_orderstatus,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders),
    v1 AS (SELECT * FROM base WHERE o_orderkey % 3 = 0),
    v2 AS (SELECT * FROM v1
           UNION ALL SELECT * FROM base WHERE o_orderkey % 3 = 1),
    v3 AS (SELECT o_orderkey, o_orderstatus,
                  CASE WHEN o_orderkey % 6 = 0 THEN cents * 2 ELSE cents END AS cents
           FROM v2)
    SELECT 'v1' AS stage, o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(cents) AS BIGINT) AS total_cents
    FROM v1 GROUP BY o_orderstatus
    UNION ALL
    SELECT 'v2', o_orderstatus, CAST(COUNT(*) AS BIGINT),
           CAST(SUM(cents) AS BIGINT)
    FROM v2 GROUP BY o_orderstatus
    UNION ALL
    SELECT 'v3', o_orderstatus, CAST(COUNT(*) AS BIGINT),
           CAST(SUM(cents) AS BIGINT)
    FROM v3 GROUP BY o_orderstatus
    """,
)
def s_acid_cdf_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDF-driven incremental aggregate maintenance — the lakehouse
    last mile (ops/incremental.py ``refresh_agg_from_cdf`` composed
    with io/acid.py ``table_changes``): a per-status (count, cents-sum)
    rollup follows the transactional table through CREATE (%3=0) ->
    APPEND (%3=1) -> MERGE (double the cents of %6=0 keys) reading ONLY
    each commit window's changes — the merge folds as delete+insert
    netting to the update delta; no refresh ever re-scans the table.
    The state after each refresh is emitted as a stage row-set the
    DuckDB oracle recomputes relationally from raw orders. Sums are
    exact integer cents so incremental +/- folding is bit-identical to
    the oracle's direct GROUP BY."""
    import shutil
    import tempfile

    from turbine_maintenance_etl_spark.io import acid
    from turbine_maintenance_etl_spark.ops.incremental import refresh_agg_from_cdf

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    tmp = tempfile.mkdtemp(prefix="spark_graft_cdf_agg_")
    tbl, state = f"{tmp}/orders_acid", f"{tmp}/rollup_state"
    aggs = {"n_orders": ("count", "o_orderkey"), "total_cents": ("sum", "cents")}
    rows = []

    def refresh(stage: str) -> None:
        got = refresh_agg_from_cdf(spark, tbl, state, ["o_orderstatus"], aggs)
        rows.extend(
            (stage, r["o_orderstatus"], r["n_orders"], r["total_cents"])
            for r in got.collect()
        )

    try:
        acid.create_table(
            spark,
            o.filter(F.col("o_orderkey") % 3 == 0).withColumn("ver", F.lit(1)),
            tbl,
            stats_cols=("o_orderkey",),
        )
        refresh("v1")
        acid.append_table(
            spark,
            o.filter(F.col("o_orderkey") % 3 == 1).withColumn("ver", F.lit(1)),
            tbl,
        )
        refresh("v2")
        upd = (
            o.filter(F.col("o_orderkey") % 6 == 0)
            .select(
                "o_orderkey",
                "o_orderstatus",
                (F.col("cents") * 2).alias("cents"),
                F.lit(2).alias("ver"),
            )
        )
        acid.merge_table(spark, upd, tbl, keys=("o_orderkey",), order_col="ver")
        refresh("v3")
        return spark.createDataFrame(
            rows,
            "stage string, o_orderstatus string, n_orders bigint, total_cents bigint",
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@register(
    "s_acid_stream_rollup",
    """
    WITH base AS (
        SELECT o_orderkey, o_orderstatus,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders),
    v3 AS (SELECT o_orderkey, o_orderstatus,
                  CASE WHEN o_orderkey % 6 = 0 THEN cents * 2 ELSE cents END AS cents
           FROM base WHERE o_orderkey % 3 IN (0, 1)),
    v4 AS (SELECT * FROM v3
           UNION ALL
           SELECT o_orderkey, o_orderstatus, cents
           FROM base WHERE o_orderkey % 3 = 2)
    SELECT 'drained' AS stage, o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(cents) AS BIGINT) AS total_cents
    FROM v3 GROUP BY o_orderstatus
    UNION ALL
    SELECT 'resumed', o_orderstatus,
           CAST(COUNT(*) AS BIGINT), CAST(SUM(cents) AS BIGINT)
    FROM v4 GROUP BY o_orderstatus
    """,
)
def s_acid_stream_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONTINUOUSLY maintained rollup, driver-graded end to end
    (streaming/ingest.py ``stream_maintained_rollup``): the acid
    table's commit log drives a CDF-window refresh of a persisted
    per-status (count, cents-sum) state through CREATE (%3=0) ->
    APPEND (%3=1) -> MERGE (double the cents of %6=0 keys) -> drain #1,
    then APPEND (%3=2) -> drain #2 RESUMING the same checkpoint — the
    second drain folds ONLY the new commit's window (the state ledger
    cursor proves it; no refresh re-scans the table). The state after
    each drain is emitted as a stage row-set the DuckDB twin recomputes
    relationally from raw orders; sums are exact integer cents so the
    incremental folding is bit-identical."""
    import shutil
    import tempfile

    from turbine_maintenance_etl_spark.io import acid
    from turbine_maintenance_etl_spark.streaming.ingest import (
        stream_maintained_rollup,
    )

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    tmp = tempfile.mkdtemp(prefix="spark_graft_stream_rollup_")
    tbl, state, ckpt = f"{tmp}/orders_acid", f"{tmp}/rollup_state", f"{tmp}/ckpt"
    aggs = {"n_orders": ("count", "o_orderkey"), "total_cents": ("sum", "cents")}
    rows = []

    def snap(stage: str) -> None:
        rows.extend(
            (stage, r["o_orderstatus"], r["n_orders"], r["total_cents"])
            for r in spark.read.parquet(state).collect()
        )

    try:
        acid.create_table(
            spark,
            o.filter(F.col("o_orderkey") % 3 == 0).withColumn("ver", F.lit(1)),
            tbl,
            stats_cols=("o_orderkey",),
        )
        acid.append_table(
            spark,
            o.filter(F.col("o_orderkey") % 3 == 1).withColumn("ver", F.lit(1)),
            tbl,
        )
        upd = o.filter(F.col("o_orderkey") % 6 == 0).select(
            "o_orderkey",
            "o_orderstatus",
            (F.col("cents") * 2).alias("cents"),
            F.lit(2).alias("ver"),
        )
        acid.merge_table(spark, upd, tbl, keys=("o_orderkey",), order_col="ver")
        stream_maintained_rollup(spark, tbl, state, ckpt, ["o_orderstatus"], aggs)
        snap("drained")
        acid.append_table(
            spark,
            o.filter(F.col("o_orderkey") % 3 == 2).withColumn("ver", F.lit(1)),
            tbl,
        )
        stream_maintained_rollup(spark, tbl, state, ckpt, ["o_orderstatus"], aggs)
        snap("resumed")
        return spark.createDataFrame(
            rows,
            "stage string, o_orderstatus string, n_orders bigint, total_cents bigint",
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@register(
    "s_acid_table_restore",
    """
    WITH base AS (
        SELECT o_orderkey, ROUND(o_totalprice, 2) AS p FROM orders
        WHERE o_orderkey % 3 = 0),
    clobber AS (SELECT * FROM base WHERE o_orderkey % 9 = 0)
    SELECT 'v1' AS snap, CAST(COUNT(*) AS BIGINT) AS n, ROUND(SUM(p), 2) AS total
    FROM base
    UNION ALL
    SELECT 'clobbered', COUNT(*), ROUND(SUM(p), 2) FROM clobber
    UNION ALL
    SELECT 'restored', COUNT(*), ROUND(SUM(p), 2) FROM base
    """,
)
def s_acid_table_restore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RESTORE proven end to end against a relational twin: CREATE
    (orders %3=0) -> OVERWRITE with a subset (%9=0, the bad write) ->
    RESTORE to v1 — the restored snapshot must equal the original
    byte-for-byte (the commit re-references v1's immutable dirs; zero
    data movement, stats inherited). Each stage reduced to
    (count, price checksum) rows DuckDB recomputes from raw orders."""
    import shutil
    import tempfile

    from turbine_maintenance_etl_spark.io import acid

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", F.round("o_totalprice", 2).alias("p")
    ).filter(F.col("o_orderkey") % 3 == 0)
    tmp = tempfile.mkdtemp(prefix="spark_graft_restore_")
    path = f"{tmp}/orders_acid"
    try:
        acid.create_table(spark, o, path, stats_cols=("o_orderkey",))
        acid.overwrite_table(spark, o.filter(F.col("o_orderkey") % 9 == 0), path)
        acid.restore_table(spark, path, 1)

        def summarize(tag: str, version: int | None):
            return acid.read_table(spark, path, version).agg(
                F.lit(tag).alias("snap"),
                F.count("*").alias("n"),
                F.round(F.sum("p"), 2).alias("total"),
            )

        out = (
            summarize("v1", 1)
            .unionByName(summarize("clobbered", 2))
            .unionByName(summarize("restored", None))
        )
        return spark.createDataFrame(
            out.collect(), "snap string, n bigint, total double"
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _s8_oracle_sql() -> str:
    """DuckDB twin of the config-driven multi-dataset ingest: same raw
    files, independent CSV reader, the constant-sensor intersection
    replayed via an unnest melt (count>0 AND min<>max per sensor per
    dataset, set-intersected), rul replayed as per-unit max - cycle."""
    sensors = ", ".join(f"sensor{i}" for i in range(1, 22))
    sensor_names = ",".join(f"'sensor{i}'" for i in range(1, 22))

    def per_ds(tag: str, code: str, path: str) -> str:
        return f"""
    t_{tag} AS (SELECT * FROM read_csv('{path}', sep=' ', header=false,
                                       names={_CMAPSS_NAMES_SQL})),
    v_{tag} AS (
        SELECT name FROM (
            SELECT unnest([{sensor_names}]) AS name,
                   unnest([{sensors}]) AS val
            FROM t_{tag})
        GROUP BY name HAVING COUNT(val) > 0 AND MIN(val) <> MAX(val)),
    scan_{tag} AS (
        SELECT 'scan' AS probe, '{code}' AS key,
               COUNT(*) AS n,
               CAST(COUNT(DISTINCT unit_nr) AS BIGINT) AS n2,
               ROUND(SUM(CAST(time_cycles AS DOUBLE)), 2) AS checksum
        FROM t_{tag}),
    rul_{tag} AS (
        SELECT 'rul' AS probe, '{code}' AS key,
               CAST(SUM(cnt) AS BIGINT) AS n, CAST(0 AS BIGINT) AS n2,
               ROUND(SUM(CAST(cnt AS DOUBLE) * mx - s), 2) AS checksum
        FROM (SELECT unit_nr, COUNT(*) AS cnt, MAX(time_cycles) AS mx,
                     SUM(CAST(time_cycles AS DOUBLE)) AS s
              FROM t_{tag} GROUP BY unit_nr))"""

    return f"""
    WITH {per_ds('a', 'FD001', f'{_RAW_DIR}/train_FD001.txt')},
    {per_ds('b', 'FD003', f'{_RAW_DIR}/test_FD003.txt')},
    kept AS (SELECT name FROM v_a INTERSECT SELECT name FROM v_b),
    units AS (
        SELECT 'units' AS probe, 'ALL' AS key,
               CAST((SELECT COUNT(DISTINCT unit_nr) FROM t_a)
                    + (SELECT COUNT(DISTINCT unit_nr) FROM t_b) AS BIGINT) AS n,
               CAST(0 AS BIGINT) AS n2,
               ROUND(CAST((SELECT COUNT(*) FROM t_a)
                          + (SELECT COUNT(*) FROM t_b) AS DOUBLE), 2) AS checksum
        )
    SELECT * FROM scan_a UNION ALL SELECT * FROM scan_b
    UNION ALL SELECT * FROM rul_a UNION ALL SELECT * FROM rul_b
    UNION ALL SELECT * FROM units
    UNION ALL
    SELECT 'kept' AS probe,
           STRING_AGG(name, ',' ORDER BY CAST(SUBSTRING(name, 7) AS INT)) AS key,
           CAST(COUNT(*) AS BIGINT) AS n, CAST(0 AS BIGINT) AS n2,
           0.0 AS checksum
    FROM kept
    """


@register("s8_config_ingest_suite", _s8_oracle_sql())
def s8_config_ingest_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8 (config-driven multi-file ingest, reference
    scripts/etl_turbofan.py:165-216): a YAML config naming TWO raw
    CMAPSS files runs the REAL ingest path — EtlConfig.from_yaml →
    run_etl (per-dataset whitespace scan, constant-sensor intersection
    pre-pass, dataset-tagged union, feature engine) — and reduces it to
    order-insensitive probe rows: per-dataset counts + cycle checksums
    (the union is lossless), the kept-sensor list itself (the
    intersection logic value-checked name-for-name), the summed RUL of
    the feature table (the W1 window over the config-ingested union),
    and the full-union units_summary mass (the reference's
    replace-per-iteration bug intentionally NOT reproduced —
    SURVEY.md §7.4.5)."""
    import os
    import tempfile

    from turbine_maintenance_etl_spark.pipeline import EtlConfig, run_etl

    yaml_text = (
        "datasets:\n"
        f"  - code: FD001\n    train: {_RAW_DIR}/train_FD001.txt\n"
        f"  - code: FD003\n    train: {_RAW_DIR}/test_FD003.txt\n"
        "windows: [5, 20]\n"
        "output_path: /tmp/s8_unused\n"
    )
    fd, path = tempfile.mkstemp(suffix=".yaml", text=True)
    try:
        with os.fdopen(fd, "w") as f:
            f.write(yaml_text)
        cfg = EtlConfig.from_yaml(path)
    finally:
        os.unlink(path)
    res = run_etl(spark, cfg, write=False)

    schema = "probe string, key string, n bigint, n2 bigint, checksum double"
    scan = res.cycles_raw.groupBy("dataset").agg(
        F.count("*").alias("n"),
        F.countDistinct("unit_nr").cast("bigint").alias("n2"),
        F.round(F.sum(F.col("time_cycles").cast("double")), 2).alias("checksum"),
    ).select(F.lit("scan").alias("probe"), F.col("dataset").alias("key"), "n", "n2", "checksum")
    rul = res.features.groupBy("dataset").agg(
        F.count("*").alias("n"),
        F.lit(0).cast("bigint").alias("n2"),
        F.round(F.sum(F.col("rul").cast("double")), 2).alias("checksum"),
    ).select(F.lit("rul").alias("probe"), F.col("dataset").alias("key"), "n", "n2", "checksum")
    units = res.units.agg(
        F.count("*").alias("n"),
        F.lit(0).cast("bigint").alias("n2"),
        F.round(F.sum(F.col("cycles_count").cast("double")), 2).alias("checksum"),
    ).select(F.lit("units").alias("probe"), F.lit("ALL").alias("key"), "n", "n2", "checksum")
    kept = spark.createDataFrame(
        [("kept", ",".join(res.kept_sensors), len(res.kept_sensors), 0, 0.0)],
        schema,
    )
    return scan.unionByName(rul).unionByName(units).unionByName(kept)
