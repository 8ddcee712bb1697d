"""Grouped-map escape hatch + skew-salting operators, checked for exact
equivalence against the declarative implementations."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR, make_cmapss_pdf
from turbine_maintenance_etl_spark.features.engine import build_features
from turbine_maintenance_etl_spark.ops.grouped_map import grouped_map_zscore
from turbine_maintenance_etl_spark.ops.skew import salted_groupby_agg


@pytest.fixture(scope="module")
def cmapss_sdf(spark):
    return spark.createDataFrame(make_cmapss_pdf(n_units=4, seed=9)).cache()


def test_grouped_map_zscore_matches_window_zscore(spark, cmapss_sdf):
    """UD1 (applyInPandas) and W5 (window exprs) must agree exactly."""
    via_pandas = grouped_map_zscore(cmapss_sdf, ["sensor2", "sensor3"])
    via_window = build_features(cmapss_sdf, sensors=["sensor2", "sensor3"]).select(
        "dataset", "unit_nr", "time_cycles", "z_sensor2", "z_sensor3"
    )
    joined = via_pandas.alias("p").join(
        via_window.alias("w"), ["dataset", "unit_nr", "time_cycles"]
    )
    diffs = joined.filter(
        (F.abs(F.col("p.z_sensor2") - F.col("w.z_sensor2")) > 1e-9)
        | (F.abs(F.col("p.z_sensor3") - F.col("w.z_sensor3")) > 1e-9)
        | (F.col("p.z_sensor2").isNull() != F.col("w.z_sensor2").isNull())
    )
    assert joined.count() == cmapss_sdf.count()
    assert diffs.count() == 0


def test_grouped_map_zscore_constant_sensor_null(spark, cmapss_sdf):
    out = grouped_map_zscore(cmapss_sdf, ["sensor1"])  # constant sensor
    assert out.filter(F.col("z_sensor1").isNotNull()).count() == 0


def test_salted_agg_matches_plain_agg(spark):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    salted = salted_groupby_agg(
        events,
        ["event_type"],
        {
            "n": ("count", "event_id"),
            "total": ("sum", "value"),
            "vmin": ("min", "value"),
            "vmax": ("max", "value"),
        },
        salt_factor=8,
    )
    plain = events.groupBy("event_type").agg(
        F.count("event_id").alias("n"),
        F.sum("value").alias("total"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
    )
    j = salted.alias("s").join(plain.alias("p"), "event_type")
    assert j.count() == plain.count()
    bad = j.filter(
        (F.col("s.n") != F.col("p.n"))
        | (F.abs(F.col("s.total") - F.col("p.total")) > 1e-6)
        | (F.col("s.vmin") != F.col("p.vmin"))
        | (F.col("s.vmax") != F.col("p.vmax"))
    )
    assert bad.count() == 0


def test_salted_agg_key_only_frame_still_spreads(spark):
    """Round-6 advice: a frame whose columns are exactly the group keys
    (count-duplicates shape) made the content salt constant per key —
    the hot key collapsed back into one reducer. Counts must stay exact
    AND the hot key must occupy >1 salt bucket when its rows span
    partitions."""
    df = (
        spark.range(0, 100_000, 1, 16)
        .select((F.col("id") % 3).alias("k"))  # key-only frame, hot keys
    )
    out = {r["k"]: r["n"] for r in
           salted_groupby_agg(df, ["k"], {"n": ("count", "k")}, salt_factor=8).collect()}
    want = {r["k"]: r["n"] for r in
            df.groupBy("k").agg(F.count("k").alias("n")).collect()}
    assert out == want
    # the partition-id salt actually spreads the hot key
    n_buckets = (
        df.withColumn(
            "_salt", F.pmod(F.spark_partition_id().cast("bigint"), F.lit(8))
        )
        .filter(F.col("k") == 0).select("_salt").distinct().count()
    )
    assert n_buckets > 1


def test_salted_agg_rejects_nondecomposable(spark):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    with pytest.raises(ValueError, match="non-decomposable"):
        salted_groupby_agg(events, ["event_type"], {"m": ("median", "value")})


def test_asof_join_semantics(spark):
    """Hand-checked as-of semantics: latest right value at or before each
    left timestamp; NULL when nothing precedes; tie at equal ts matches."""
    import datetime as dt

    from turbine_maintenance_etl_spark.ops.asof import asof_join

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    left = spark.createDataFrame(
        [(1, t(10), "a"), (1, t(20), "b"), (1, t(5), "c"), (2, t(15), "d")],
        "user_id int, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, t(8), 100.0), (1, t(20), 200.0), (3, t(1), 999.0)],
        "user_id int, ts timestamp, price double",
    )
    out = {
        r["tag"]: r["asof_price"]
        for r in asof_join(left, right, on=["user_id"], tie_break="tag").collect()
    }
    assert out == {"a": 100.0, "b": 200.0, "c": None, "d": None}


def test_range_join_semantics(spark):
    """Closed-interval containment; intervals spanning multiple buckets
    still match; left join NULL-fills points with no interval."""
    import datetime as dt

    from turbine_maintenance_etl_spark.ops.range_join import range_join

    t = lambda m: dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m)  # noqa: E731
    points = spark.createDataFrame(
        [(1, t(0), "p0"), (1, t(30), "p30"), (1, t(61), "p61"), (2, t(30), "px")],
        "k int, ts timestamp, ptag string",
    )
    # interval [t0, t60] spans two 30-min buckets; boundaries inclusive
    intervals = spark.createDataFrame(
        [(1, t(0), t(60), "w")], "k int, w_start timestamp, w_end timestamp, wtag string"
    )
    inner = range_join(points, intervals, on=["k"], bucket_seconds=1800)
    assert {r["ptag"] for r in inner.collect()} == {"p0", "p30"}

    left = range_join(points, intervals, on=["k"], bucket_seconds=1800, how="left")
    rows = {r["ptag"]: r["wtag"] for r in left.collect()}
    assert rows == {"p0": "w", "p30": "w", "p61": None, "px": None}

    with pytest.raises(ValueError, match="ambiguous"):
        range_join(points.withColumnRenamed("ptag", "wtag"), intervals, on=["k"])


def test_chunk_documents_coverage_and_overlap(spark):
    """Every token is covered; consecutive chunks share exactly
    `overlap` tokens; empty docs yield no chunks; short docs one chunk."""
    from turbine_maintenance_etl_spark.llm.text import chunk_documents

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(10))),   # < chunk -> 1 chunk
            (2, " ".join(f"t{i}" for i in range(25))),   # multi-chunk
            (3, ""),                                      # empty -> 0 chunks
            (4, " ".join(f"t{i}" for i in range(12))),   # == chunk size
        ],
        "doc_id int, text string",
    )
    out = chunk_documents(docs, chunk_tokens=12, overlap=4).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append((r["chunk_id"], r["chunk_text"].split()))
    assert 3 not in by_doc
    assert len(by_doc[1]) == 1 and len(by_doc[1][0][1]) == 10
    assert len(by_doc[4]) == 1 and len(by_doc[4][0][1]) == 12
    chunks2 = [toks for _, toks in sorted(by_doc[2])]
    assert len(chunks2) == 3  # starts 1, 9, 17 (stride 8)
    covered = set().union(*[set(c) for c in chunks2])
    assert covered == {f"t{i}" for i in range(25)}
    for a, b in zip(chunks2, chunks2[1:]):
        assert a[-4:] == b[:4]  # exact overlap

    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(docs, chunk_tokens=8, overlap=8)


def test_hash_split_deterministic_and_disjoint(spark):
    from turbine_maintenance_etl_spark.ops.sampling import (
        deterministic_downsample,
        hash_split,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    tr1, ev1 = hash_split(docs, "doc_id", 80)
    tr2, ev2 = hash_split(docs, "doc_id", 80)
    assert tr1.count() + ev1.count() == docs.count()
    assert tr1.join(ev1, "doc_id").count() == 0  # disjoint
    assert tr1.count() == tr2.count()  # deterministic
    ids1 = {r["doc_id"] for r in tr1.select("doc_id").collect()}
    ids2 = {r["doc_id"] for r in tr2.select("doc_id").collect()}
    assert ids1 == ids2
    # join-stability: downsampling two derived tables keeps the same keys
    a = deterministic_downsample(docs.select("doc_id", "lang"), "doc_id", 300)
    b = deterministic_downsample(docs.select("doc_id", "source"), "doc_id", 300)
    assert a.join(b, "doc_id").count() == a.count() == b.count()


def test_approx_sketches_error_bounds(spark):
    """HLL distinct within 5% of exact; GK percentiles within 2% of
    exact — the contract that makes sketches usable at 100 TB."""
    import turbine_maintenance_etl_spark.queries_ext  # noqa: F401
    from turbine_maintenance_etl_spark.queries import REGISTRY

    e = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    got = {
        r["event_type"]: r
        for r in REGISTRY["a_approx_sketches"].fn(spark, "/root/testdata/sf0.001").collect()
    }
    exact = {
        r["event_type"]: r
        for r in e.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("users"))
        .collect()
    }
    assert set(got) == set(exact)
    for et, row in got.items():
        assert abs(row["approx_users"] - exact[et]["users"]) <= max(
            2, 0.05 * exact[et]["users"]
        )
        # rank-based percentile contract: the returned value's actual
        # rank must sit within 2% of the requested percentile
        grp = e.filter(F.col("event_type") == et)
        n = grp.count()
        for target, val in zip((0.5, 0.95), row["value_p50_p95"]):
            rank = grp.filter(F.col("value") <= val).count() / n
            assert abs(rank - target) <= 0.02 + 1.0 / n


def test_udtf_parse_json_pairs(spark):
    """UDTF handles arbitrary/nested/invalid JSON, not just the corpus
    shape: nested values re-serialize, invalid/null inputs yield no rows."""
    from turbine_maintenance_etl_spark.ops.udtf import register_udtfs

    register_udtfs(spark)
    spark.createDataFrame(
        [
            (1, '{"a": 1, "b": "x"}'),
            (2, '{"nested": {"c": 2}, "arr": [1, 2]}'),
            (3, "not json"),
            (4, None),
            (5, "{}"),
        ],
        "id int, props string",
    ).createOrReplaceTempView("udtf_in")
    rows = {
        (r["id"], r["key"]): r["value"]
        for r in spark.sql(
            "SELECT i.id, p.key, p.value FROM udtf_in i, "
            "LATERAL parse_json_pairs(i.props) p"
        ).collect()
    }
    assert rows == {
        (1, "a"): "1",
        (1, "b"): "x",
        # compact separators: canonical minified JSON, byte-identical to
        # DuckDB's json_extract rendering (r10 adversarial sweep)
        (2, "nested"): '{"c":2}',
        (2, "arr"): "[1,2]",
    }


def test_weighted_sample_bias_and_plan(spark):
    """High-weight rows are (near-)surely included; selection compiles
    to a true distributed top-k, not a global sort."""
    from turbine_maintenance_etl_spark.ops.sampling import weighted_sample

    rows = [(i, 10000.0 if i < 3 else 1.0) for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id int, w double")
    picked = weighted_sample(df, "w", 50, "doc_id")
    plan = picked._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    ids = {r["doc_id"] for r in picked.collect()}
    assert len(ids) == 50
    assert {0, 1, 2} <= ids  # weight-10000 rows virtually always sampled
    # deterministic
    ids2 = {r["doc_id"] for r in weighted_sample(df, "w", 50, "doc_id").collect()}
    assert ids == ids2
    # zero/negative weights excluded
    withzero = spark.createDataFrame(
        [(1, 0.0), (2, -5.0), (3, 1.0)], "doc_id int, w double"
    )
    assert {r["doc_id"] for r in weighted_sample(withzero, "w", 3, "doc_id").collect()} == {3}


def test_distributed_rank_cut_exact(spark):
    """keep_lowest_k / keep_lowest_frac select EXACTLY the set the
    single-partition row_number cut would — verified against a pandas
    sort on data with heavy ties — while the plan contains no
    SinglePartition exchange (the 100 TB point of the operator)."""
    import pandas as pd

    from turbine_maintenance_etl_spark.ops.rank import (
        keep_lowest_frac,
        keep_lowest_k,
    )

    pdf = pd.DataFrame(
        {
            "id": range(500),
            # heavy ties: only 17 distinct key values across 500 rows
            "v": [float((i * 37) % 17) for i in range(500)],
        }
    )
    df = spark.createDataFrame(pdf)
    expected_order = pdf.sort_values(["v", "id"])["id"].tolist()
    for k in (0, 1, 7, 250, 499, 500, 1000):
        got = {r["id"] for r in keep_lowest_k(df, F.col("v"), k, "id").collect()}
        assert got == set(expected_order[:k]), f"k={k}"
    for frac in (0.0, 0.1, 0.9, 1.0):
        got = {
            r["id"] for r in keep_lowest_frac(df, F.col("v"), frac, "id").collect()
        }
        assert got == set(expected_order[: int(frac * 500)]), f"frac={frac}"

    cut = keep_lowest_frac(df, F.col("v"), 0.9, "id")
    plan = cut._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan

    # NULL keys are excluded from ranking and from the total
    withnull = spark.createDataFrame(
        [(1, None), (2, 5.0), (3, 1.0), (4, None)], "id int, v double"
    )
    got = {r["id"] for r in keep_lowest_frac(withnull, F.col("v"), 0.5, "id").collect()}
    assert got == {3}  # floor(0.5 * 2 non-null) = 1 row


def test_weighted_sample_large_k_path_matches_topk_path(spark):
    """The distributed-rank path (k above the driver-merge threshold)
    selects exactly the same set as the TakeOrderedAndProject path —
    the strategy switch must never change the sample."""
    from turbine_maintenance_etl_spark.ops.sampling import weighted_sample

    rows = [(i, float(1 + (i % 13))) for i in range(3000)]
    df = spark.createDataFrame(rows, "doc_id int, w double")
    via_topk = {
        r["doc_id"] for r in weighted_sample(df, "w", 600, "doc_id").collect()
    }
    via_rank = {
        r["doc_id"]
        for r in weighted_sample(
            df, "w", 600, "doc_id", driver_merge_threshold=100
        ).collect()
    }
    assert via_topk == via_rank and len(via_topk) == 600


def test_distributed_rank_cut_beyond_double_precision(spark):
    """bigint keys past 2^53 whose neighbors collapse to ONE double still
    rank exactly: bucketing may merge them (the cast is monotone, so
    membership stays consistent) but the boundary window orders by the
    ORIGINAL key value, not its lossy double cast."""
    from turbine_maintenance_etl_spark.ops.rank import (
        global_row_number,
        keep_lowest_k,
    )

    base = 1 << 53  # above this, consecutive bigints share a double
    rows = [(i, base + i) for i in range(200)]
    df = spark.createDataFrame(rows, "id int, v bigint")
    got = sorted(
        r["id"] for r in keep_lowest_k(df, F.col("v"), 7, "id", num_buckets=4).collect()
    )
    assert got == list(range(7))
    ordinals = {
        r["id"]: r["row_idx"]
        for r in global_row_number(df, F.col("v"), "id", num_buckets=4).collect()
    }
    assert ordinals == {i: i + 1 for i in range(200)}


def test_distributed_rank_cut_guard_rails(spark):
    """Reserved-column clashes, sub-2 bucket counts, existing out_col,
    and non-castable keys all fail LOUDLY instead of silently corrupting
    or emptying the result."""
    import pytest

    from turbine_maintenance_etl_spark.ops.rank import (
        global_row_number,
        keep_lowest_k,
    )

    clash = spark.createDataFrame([(1, 1.0, 0)], "id int, v double, _rank_bucket int")
    with pytest.raises(ValueError, match="reserved rank column"):
        keep_lowest_k(clash, F.col("v"), 1, "id")

    df = spark.createDataFrame([(1, 1.0)], "id int, v double")
    with pytest.raises(ValueError, match="num_buckets"):
        keep_lowest_k(df, F.col("v"), 1, "id", num_buckets=1)

    with_idx = spark.createDataFrame([(1, 1.0, 9)], "id int, v double, row_idx int")
    with pytest.raises(ValueError, match="already exists"):
        global_row_number(with_idx, F.col("v"), "id")

    text = spark.createDataFrame([(1, "abc"), (2, "def")], "id int, v string")
    with pytest.raises(ValueError, match="does not cast to double"):
        keep_lowest_k(text, F.col("v"), 1, "id")


def test_distributed_rank_cut_degenerate_single_value(spark):
    """All-equal keys collapse every quantile edge: the cut degrades to
    one ranked bucket but stays exact and deterministic via the id
    tie-break."""
    from turbine_maintenance_etl_spark.ops.rank import keep_lowest_k

    df = spark.createDataFrame([(i, 1.0) for i in range(100)], "id int, v double")
    got = sorted(r["id"] for r in keep_lowest_k(df, F.col("v"), 10, "id").collect())
    assert got == list(range(10))


def test_incremental_agg_matches_full_recompute(spark, tmp_path):
    """Two batches folded incrementally == one aggregation over all the
    data; replaying a batch_id is a no-op (ledger-idempotent)."""
    from turbine_maintenance_etl_spark.ops.incremental import merge_incremental_agg

    state = str(tmp_path / "rollup")
    e = spark.read.parquet(f"{SF_DIR}/events.parquet")
    b1 = e.filter(F.col("event_id") % 2 == 0)
    b2 = e.filter(F.col("event_id") % 2 == 1)
    aggs = {
        "n": ("count", "value"),
        "total": ("sum", "value"),
        "vmax": ("max", "value"),
    }
    merge_incremental_agg(spark, state, b1, "batch-1", ["event_type"], aggs)
    merged = merge_incremental_agg(spark, state, b2, "batch-2", ["event_type"], aggs)

    full = e.groupBy("event_type").agg(
        F.count("value").alias("n"),
        F.sum("value").alias("total"),
        F.max("value").alias("vmax"),
    )
    got = {r["event_type"]: r for r in merged.collect()}
    for r in full.collect():
        g = got[r["event_type"]]
        assert g["n"] == r["n"]
        assert abs(g["total"] - r["total"]) < 1e-6
        assert g["vmax"] == r["vmax"]

    # replay batch-2: state must not change (no double counting)
    replayed = merge_incremental_agg(spark, state, b2, "batch-2", ["event_type"], aggs)
    again = {r["event_type"]: r for r in replayed.collect()}
    for k, g in got.items():
        assert again[k]["n"] == g["n"] and abs(again[k]["total"] - g["total"]) < 1e-6


def test_scd2_merge_hand_computed(spark):
    """SCD2: change closes + reopens, no-op passes through, new key
    inserts, and the as-of slice reconstructs any point in time."""
    from turbine_maintenance_etl_spark.ops.scd import (
        scd2_apply,
        scd2_as_of,
        scd2_bootstrap,
    )

    snap = spark.createDataFrame(
        [(1, "bronze", 10), (2, "silver", 10)],
        "cust long, tier string, ts long",
    )
    dim = scd2_bootstrap(snap, ["cust"], ["tier"], "ts")

    updates = spark.createDataFrame(
        [
            (1, "gold", 20),     # real change
            (2, "silver", 20),   # no-op
            (3, "bronze", 20),   # new key
            (1, "silver", 15),   # stale earlier update, superseded in batch
        ],
        "cust long, tier string, ts long",
    )
    out = scd2_apply(dim, updates, ["cust"], ["tier"], "ts")
    rows = {(r["cust"], r["tier"], r["is_current"]): r for r in out.collect()}

    assert len(rows) == 4
    closed = rows[(1, "bronze", False)]
    assert closed["valid_from"] == 10 and closed["valid_to"] == 20
    assert rows[(1, "gold", True)]["valid_from"] == 20
    assert rows[(2, "silver", True)]["valid_from"] == 10  # untouched
    assert rows[(3, "bronze", True)]["valid_from"] == 20

    # point-in-time reconstruction
    at15 = {(r["cust"], r["tier"]) for r in scd2_as_of(out, 15).collect()}
    assert at15 == {(1, "bronze"), (2, "silver")}
    at25 = {(r["cust"], r["tier"]) for r in scd2_as_of(out, 25).collect()}
    assert at25 == {(1, "gold"), (2, "silver"), (3, "bronze")}

    # idempotence: re-applying the same batch changes nothing
    again = scd2_apply(out, updates, ["cust"], ["tier"], "ts")
    assert again.count() == out.count()
    assert again.exceptAll(out).count() == 0


def test_scd2_stale_update_is_ignored(spark):
    """An out-of-order update older than the open row's valid_from must
    be a no-op — applying it would mint a corrupt interval
    (valid_to <= valid_from)."""
    from turbine_maintenance_etl_spark.ops.scd import scd2_apply, scd2_bootstrap

    snap = spark.createDataFrame([(1, "gold", 20)], "cust long, tier string, ts long")
    dim = scd2_bootstrap(snap, ["cust"], ["tier"], "ts")
    stale = spark.createDataFrame(
        [(1, "bronze", 10)], "cust long, tier string, ts long"
    )
    out = scd2_apply(dim, stale, ["cust"], ["tier"], "ts")
    rows = out.collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["tier"] == "gold" and r["is_current"] and r["valid_to"] is None


def test_scd2_null_ts_update_never_closes_null_valid_from_row(spark):
    """Round-6 advice: a NULL-ts update against an open row with NULL
    valid_from must be a no-op. The old guard checked valid_from FIRST,
    so the unorderable update counted as fresh and closed the row with
    valid_to = NULL — which scd2_as_of reads as still-valid, so the key
    then matched TWICE in every as-of slice."""
    from turbine_maintenance_etl_spark.ops.scd import scd2_apply, scd2_as_of

    dim = spark.createDataFrame(
        [(1, "gold", None, None, True)],
        "cust long, tier string, valid_from long, valid_to long, is_current boolean",
    )
    upd = spark.createDataFrame(
        [(1, "bronze", None)], "cust long, tier string, ts long"
    )
    out = scd2_apply(dim, upd, ["cust"], ["tier"], "ts")
    rows = out.collect()
    assert len(rows) == 1  # unchanged: NULL-ts updates are never fresh
    r = rows[0]
    assert r["tier"] == "gold" and r["is_current"] and r["valid_to"] is None
    # and the as-of slice sees the key exactly once
    assert scd2_as_of(out.withColumn(
        "valid_from", F.coalesce(F.col("valid_from"), F.lit(0))
    ), 5).count() == 1


def test_hll_sketch_merge_equals_direct_and_bounds_error(spark):
    """The property that makes partition-sketching sound at 100 TB:
    merging per-shard sketches gives EXACTLY the same estimate as one
    direct sketch over all rows (union-of-sketches == sketch-of-union),
    and the estimate is within HLL error bounds of the exact count."""
    from pyspark.sql import functions as F

    from turbine_maintenance_etl_spark.ops.sketch import merge_estimate, shard_sketches

    e = spark.read.parquet("/root/testdata/sf0.01/events.parquet").select(
        "user_id", "event_type"
    )
    sketches = shard_sketches(e, ["event_type"], "user_id")
    merged = merge_estimate(sketches).collect()[0]

    direct = e.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(12))).alias("est")
    ).collect()[0]["est"]
    assert merged["approx_distinct"] == direct

    exact = e.select("user_id").distinct().count()
    assert abs(merged["approx_distinct"] - exact) / exact < 0.05
    assert merged["n_rows"] == e.count()

    # regrouping stored sketches to a coarser grain matches per-grain exact
    per_type = {
        r["event_type"]: r["approx_distinct"]
        for r in merge_estimate(sketches, ["event_type"]).collect()
    }
    for t, est in per_type.items():
        ex = e.filter(F.col("event_type") == t).select("user_id").distinct().count()
        assert abs(est - ex) / ex < 0.05


def test_observe_metrics_and_quality_gate(spark):
    """Observed metrics equal a direct aggregation (same scan, zero
    extra jobs for the metrics), and the gate raises on violations."""
    import pytest
    from pyspark.sql import functions as F

    from turbine_maintenance_etl_spark.ops.observe import observe_metrics, quality_gate

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    observed, obs = observe_metrics(
        li,
        {
            "n_rows": F.count(F.lit(1)),
            "qty_sum": F.sum("l_quantity"),
            "null_flags": F.sum(F.when(F.col("l_returnflag").isNull(), 1).otherwise(0)),
        },
    )
    n = observed.count()
    got = quality_gate(obs, min_rows=1)
    direct = li.agg(
        F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("s")
    ).first()
    assert got["n_rows"] == n == direct["n"]
    assert got["qty_sum"] == direct["s"]
    assert got["null_flags"] == 0

    # violation path: impossible min_rows
    observed2, obs2 = observe_metrics(li, {"n_rows": F.count(F.lit(1))}, name="g2")
    observed2.count()
    with pytest.raises(ValueError, match="n_rows"):
        quality_gate(obs2, min_rows=10**12)

    # a typo'd / never-observed metric name is an ERROR on the
    # null-fraction path too — not a vacuously-passing 0-default
    with pytest.raises(ValueError, match="not observed"):
        quality_gate(obs2, max_null_fraction=("null_typo", "n_rows", 0.1))
    with pytest.raises(ValueError, match="not observed"):
        quality_gate(obs2, max_null_fraction=("n_rows", "rows_typo", 0.1))


def test_mllib_scoring_survives_prior_observation(spark):
    """Once DataFrame.observe materializes the session's lazy
    ObservationManager (not Serializable), any MLlib model still
    carrying its training summary fails to score: the summary holds the
    SparkSession and rides into the scoring task closure.
    strip_training_summary severs that chain — this pins the
    interaction end to end: observe FIRST, train, then score."""
    from pyspark.sql import functions as F

    from turbine_maintenance_etl_spark.llm.classify import (
        score_quality,
        train_quality_classifier,
        weak_quality_labels,
    )
    from turbine_maintenance_etl_spark.ops.observe import observe_metrics

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    observed, obs = observe_metrics(
        docs, {"n_rows": F.count(F.lit(1))}, name="poison_check"
    )
    observed.count()  # materializes ObservationManager in this session

    model = train_quality_classifier(weak_quality_labels(docs))
    assert not model.stages[-1].hasSummary
    assert score_quality(model, docs).count() == docs.count()


def test_incremental_agg_file_uri_normalized(spark, tmp_path):
    """A file:// state path is stripped to the raw POSIX path, so
    recovery/ledger/replay checks actually see the files — previously
    the URI bypassed every os.path check (replay protection silently
    off) and crashed in the rename publish. Object-store URIs reject."""
    import pytest
    from pyspark.sql import functions as F

    from turbine_maintenance_etl_spark.ops.incremental import merge_incremental_agg

    state = f"file://{tmp_path}/state"
    b = spark.createDataFrame([("a", 1.0)], "event_type string, value double")
    aggs = {"n": ("count", "value")}
    merge_incremental_agg(spark, state, b, "b1", ["event_type"], aggs)
    # replay of the same batch must no-op (ledger visible through the URI)
    merged = merge_incremental_agg(spark, state, b, "b1", ["event_type"], aggs)
    assert merged.agg(F.sum("n")).first()[0] == 1

    with pytest.raises(ValueError, match="transactional"):
        merge_incremental_agg(spark, "s3://bucket/state", b, "b2", ["event_type"], aggs)


def test_psi_drift_detects_shift_and_is_stable_on_same_distribution(spark):
    """PSI ~ 0 when both snapshots draw from the same distribution;
    > 0.25 (the 'investigate' threshold) under a clear shift; per-bin
    contributions localize it. Hand-check one smoothed contribution."""
    import math

    from turbine_maintenance_etl_spark.ops.drift import psi_report

    edges = [0.0, 10.0, 20.0, 30.0]
    base = [float(v) for v in range(0, 30)]             # uniform over 3 bins
    shifted = [float(v) + 15.0 for v in range(0, 30)]   # mass moves up/overflow
    e = spark.createDataFrame([(v,) for v in base], "value double")
    same = psi_report(e, e, "value", edges).toPandas()
    assert abs(same["psi_contribution"].sum()) < 1e-9   # identical snapshots

    a = spark.createDataFrame([(v,) for v in shifted], "value double")
    rep = psi_report(e, a, "value", edges).toPandas().set_index("bin")
    assert rep["psi_contribution"].sum() > 0.25
    # bin 0 ([0,10)): expected 10 of 30, actual 0 -> smoothed props
    n_bins = len(edges) + 1
    pe = (10 + 0.5) / (30 + 0.5 * n_bins)
    pa = (0 + 0.5) / (30 + 0.5 * n_bins)
    want = round((pa - pe) * math.log(pa / pe), 6)
    assert rep.loc[0, "psi_contribution"] == want
    # the overflow bin (values >= 30) gained mass
    assert rep.loc[3, "n_actual"] > rep.loc[3, "n_expected"]


def test_global_row_number_matches_single_partition_window(spark):
    """Distributed exact ordinals == the naive global-window ordinals,
    including ties on the key (id tie-break) and NULL-key exclusion."""
    from pyspark.sql import Window

    from turbine_maintenance_etl_spark.ops.rank import global_row_number

    rows = [(i, float(v)) for i, v in enumerate([5, 3, 3, 8, 1, 3, 8, 0, 9, 2] * 50)]
    rows += [(9999, None)]  # NULL key must be excluded
    df = spark.createDataFrame(rows, "id long, v double").repartition(7)
    got = {
        r["id"]: r["row_idx"]
        for r in global_row_number(df, F.col("v"), "id", num_buckets=4).collect()
    }
    w = Window.orderBy(F.asc("v"), F.asc("id"))
    want = {
        r["id"]: r["rn"]
        for r in df.filter(F.col("v").isNotNull())
        .withColumn("rn", F.row_number().over(w))
        .collect()
    }
    assert got == want
    assert 9999 not in got


def test_global_row_number_no_single_partition_exchange(spark):
    """The plan must hash-partition on the bucket id — never move the
    whole input to one partition (the J2-at-scale guarantee)."""
    from turbine_maintenance_etl_spark.ops.rank import global_row_number

    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 97).cast("double").alias("v")
    )
    plan = (
        global_row_number(df, F.col("v"), "id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SinglePartition" not in plan, plan


def test_cms_shard_sketches_and_merge_estimate(spark):
    """CMS frequency sketches: per-shard build + driver merge. The
    merged estimate must NEVER underestimate any item's true count and
    must overestimate by at most ~eps * N (the CMS guarantee); items
    absent from the data estimate near zero."""
    from turbine_maintenance_etl_spark.ops.sketch import (
        cms_merge_estimate,
        cms_shard_sketches,
    )

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    truth = {
        r["user_id"]: r["n"]
        for r in events.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    n_total = sum(truth.values())
    sketches = cms_shard_sketches(
        events, "user_id", ["event_type"], eps=0.005, confidence=0.99
    )
    assert sketches.count() > 1  # genuinely multiple shards merged
    items = list(truth)[:50] + [10**12]  # + one absent item
    est = cms_merge_estimate(spark, sketches, items)
    for it in items[:-1]:
        assert est[it] >= truth[it], it           # never underestimates
        assert est[it] <= truth[it] + 0.02 * n_total, it
    assert est[10**12] <= 0.02 * n_total          # absent ~ 0 + eps*N

    # differential pin: the executor-side byte-level merge must agree
    # with the JVM's own mergeInPlace on EVERY estimate — this is what
    # licenses parsing the serialized format off-driver
    jvm = spark.sparkContext._jvm
    ref = None
    for r in sketches.select("cms").collect():
        s = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
            bytearray(bytes(r["cms"]))
        )
        ref = s if ref is None else ref.mergeInPlace(s)
    assert est == {it: int(ref.estimateCount(it)) for it in items}

    # incompatible sketches (different seed → different hash rows) refuse
    from turbine_maintenance_etl_spark.ops.sketch import _cms_merge_bytes

    other = cms_shard_sketches(
        events, "user_id", ["event_type"], eps=0.005, confidence=0.99, seed=7
    )
    a = bytes(sketches.select("cms").first()["cms"])
    b = bytes(other.select("cms").first()["cms"])
    with pytest.raises(ValueError, match="incompatible"):
        _cms_merge_bytes(a, b)


def test_barrier_modes_equivalent(spark, tmp_path, monkeypatch):
    """ops.materialize.barrier: 'reliable' (parquet round-trip under
    SPARK_GRAFT_SCRATCH) returns the same rows as 'local'
    (localCheckpoint), and the env knob drives the default."""
    from turbine_maintenance_etl_spark.ops import materialize as M

    df = spark.range(100).withColumn("v", F.col("id") * 2)
    local = M.barrier(df, "t", mode="local")
    monkeypatch.setenv("SPARK_GRAFT_SCRATCH", str(tmp_path / "scratch"))
    reliable = M.barrier(df, "t", mode="reliable")
    assert sorted(r["v"] for r in reliable.collect()) == sorted(
        r["v"] for r in local.collect()
    )
    # reliable frames read from scratch parquet — no lineage to the input
    assert (tmp_path / "scratch").exists()
    monkeypatch.setenv("SPARK_GRAFT_CHECKPOINT_MODE", "reliable")
    assert M.checkpoint_mode() == "reliable"
    monkeypatch.setenv("SPARK_GRAFT_CHECKPOINT_MODE", "bogus")
    with pytest.raises(ValueError):
        M.checkpoint_mode()


def test_refresh_agg_from_cdf(spark, tmp_path):
    """CDF-driven incremental aggregate maintenance: the rollup follows
    the acid table through create/append/merge windows reading ONLY
    each window's changes; a replayed refresh is a ledger no-op; a
    merge's delete+insert pair nets to the update delta for count/sum."""
    from turbine_maintenance_etl_spark.io import acid
    from turbine_maintenance_etl_spark.ops.incremental import refresh_agg_from_cdf

    tbl = str(tmp_path / "tbl")
    state = str(tmp_path / "state")
    aggs = {"n": ("count", "id"), "total": ("sum", "v")}

    def snap():
        return {
            r["k"]: (r["n"], r["total"])
            for r in refresh_agg_from_cdf(spark, tbl, state, ["k"], aggs).collect()
        }

    acid.create_table(
        spark,
        spark.createDataFrame(
            [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 5.0)], "id long, k string, v double"
        ),
        tbl,
    )
    assert snap() == {"a": (2, 30.0), "b": (1, 5.0)}
    # append window
    acid.append_table(
        spark, spark.createDataFrame([(4, "b", 7.0)], "id long, k string, v double"), tbl
    )
    assert snap() == {"a": (2, 30.0), "b": (2, 12.0)}
    # merge window: update id=1 (delete 10.0 + insert 99.0 nets +89)
    acid.merge_table(
        spark,
        spark.createDataFrame([(1, "a", 99.0)], "id long, k string, v double"),
        tbl,
        keys=("id",),
        order_col="v",
    )
    assert snap() == {"a": (2, 119.0), "b": (2, 12.0)}
    # no new commits -> no-op; state unchanged
    assert snap() == {"a": (2, 119.0), "b": (2, 12.0)}


def test_refresh_agg_from_cdf_minmax_rejects_deletes(spark, tmp_path):
    from turbine_maintenance_etl_spark.io import acid
    from turbine_maintenance_etl_spark.ops.incremental import refresh_agg_from_cdf

    tbl = str(tmp_path / "tbl")
    state = str(tmp_path / "state")
    aggs = {"lo": ("min", "v")}
    acid.create_table(
        spark,
        spark.createDataFrame(
            [(1, "a", 10.0, 1)], "id long, k string, v double, ver long"
        ),
        tbl,
    )
    got = refresh_agg_from_cdf(spark, tbl, state, ["k"], aggs)
    assert got.collect()[0]["lo"] == 10.0
    acid.merge_table(
        spark,
        spark.createDataFrame(
            [(1, "a", 3.0, 2)], "id long, k string, v double, ver long"
        ),
        tbl,
        keys=("id",),
        order_col="ver",
    )
    with pytest.raises(ValueError, match="min/max"):
        refresh_agg_from_cdf(spark, tbl, state, ["k"], aggs)


def test_refresh_agg_from_cdf_randomized_differential(spark, tmp_path):
    """Property-style differential: a RANDOM interleaving of appends and
    keyed merges with refreshes at random points must leave the
    incrementally maintained state exactly equal to a direct groupBy of
    the final table — for every prefix where a refresh ran."""
    import random as _random

    from turbine_maintenance_etl_spark.io import acid
    from turbine_maintenance_etl_spark.ops.incremental import refresh_agg_from_cdf

    rng = _random.Random(20260814)
    tbl = str(tmp_path / "tbl")
    state = str(tmp_path / "state")
    aggs = {"n": ("count", "id"), "total": ("sum", "cents")}
    keys = ["k"]

    def row(i):
        return (i, rng.choice("abcd"), rng.randrange(100, 10_000), rng.randrange(1, 5))

    schema = "id long, k string, cents long, ver long"
    next_id = 0

    def fresh_rows(n):
        nonlocal next_id
        out = [row(i) for i in range(next_id, next_id + n)]
        next_id += n
        return out

    acid.create_table(spark, spark.createDataFrame(fresh_rows(20), schema), tbl)
    existing = list(range(20))
    for step in range(6):
        if rng.random() < 0.5:
            acid.append_table(spark, spark.createDataFrame(fresh_rows(10), schema), tbl)
            existing.extend(range(next_id - 10, next_id))
        else:
            # keyed merge: bump ver so the update always wins
            upd = [
                (i, rng.choice("abcd"), rng.randrange(100, 10_000), 99 + step)
                for i in rng.sample(existing, 5)
            ]
            acid.merge_table(
                spark, spark.createDataFrame(upd, schema), tbl,
                keys=("id",), order_col="ver",
            )
        if rng.random() < 0.6 or step == 5:
            got = {
                r["k"]: (r["n"], r["total"])
                for r in refresh_agg_from_cdf(spark, tbl, state, keys, aggs).collect()
                if r["n"] != 0  # fully-drained groups may linger at zero
            }
            want = {
                r["k"]: (r["n"], r["total"])
                for r in acid.read_table(spark, tbl)
                .groupBy("k")
                .agg(F.count("id").alias("n"), F.sum("cents").alias("total"))
                .collect()
            }
            assert got == want, f"divergence after step {step}"


def test_refresh_agg_from_cdf_minmax_recompute_policy(spark, tmp_path):
    """on_delete_minmax='recompute': count/sum fold incrementally while
    min/max are spliced fresh from the snapshot — the state matches a
    direct groupBy after a merge that retracts the previous minimum."""
    from turbine_maintenance_etl_spark.io import acid
    from turbine_maintenance_etl_spark.ops.incremental import refresh_agg_from_cdf

    tbl = str(tmp_path / "tbl")
    state = str(tmp_path / "state")
    aggs = {"n": ("count", "id"), "total": ("sum", "v"), "lo": ("min", "v")}
    schema = "id long, k string, v long, ver long"
    acid.create_table(
        spark,
        spark.createDataFrame([(1, "a", 5, 1), (2, "a", 50, 1), (3, "b", 7, 1)], schema),
        tbl,
    )
    got = refresh_agg_from_cdf(spark, tbl, state, ["k"], aggs)
    assert {r["k"]: (r["n"], r["total"], r["lo"]) for r in got.collect()} == {
        "a": (2, 55, 5), "b": (1, 7, 7),
    }
    # retract the minimum of group a (update id=1: 5 -> 100)
    acid.merge_table(
        spark,
        spark.createDataFrame([(1, "a", 100, 2)], schema),
        tbl, keys=("id",), order_col="ver",
    )
    got = refresh_agg_from_cdf(
        spark, tbl, state, ["k"], aggs, on_delete_minmax="recompute"
    )
    want = {
        r["k"]: (r["n"], r["total"], r["lo"])
        for r in acid.read_table(spark, tbl)
        .groupBy("k")
        .agg(F.count("id").alias("n"), F.sum("v").alias("total"), F.min("v").alias("lo"))
        .collect()
    }
    assert {r["k"]: (r["n"], r["total"], r["lo"]) for r in got.collect()} == want
    assert want["a"] == (2, 150, 50)  # the retracted min is gone
    # replay: ledger no-op regardless of policy
    again = refresh_agg_from_cdf(
        spark, tbl, state, ["k"], aggs, on_delete_minmax="recompute"
    )
    assert {r["k"]: (r["n"], r["total"], r["lo"]) for r in again.collect()} == want


def test_refresh_agg_from_cdf_refuses_foreign_state(spark, tmp_path):
    """A state with batch entries but NO cdf cursor was built by
    merge_incremental_agg — bootstrapping the full snapshot on top of it
    would double-count every overlapping row, so the refresh refuses."""
    from turbine_maintenance_etl_spark.io import acid
    from turbine_maintenance_etl_spark.ops.incremental import (
        merge_incremental_agg,
        refresh_agg_from_cdf,
    )

    tbl = str(tmp_path / "tbl")
    state = str(tmp_path / "state")
    aggs = {"n": ("count", "id"), "total": ("sum", "v")}
    rows = spark.createDataFrame([(1, "a", 10.0)], "id long, k string, v double")
    acid.create_table(spark, rows, tbl)
    # the same rows already folded manually into the shared state path
    merge_incremental_agg(spark, state, rows, "batch-1", ["k"], aggs)
    with pytest.raises(ValueError, match="no cdf-v"):
        refresh_agg_from_cdf(spark, tbl, state, ["k"], aggs)


def test_refresh_agg_from_cdf_rebuilds_after_vacuum(spark, tmp_path):
    """A rollup that lags past vacuum's retention loses its incremental
    window — the refresh must rebuild from the snapshot (ground truth)
    instead of crashing on the reclaimed manifest forever."""
    from turbine_maintenance_etl_spark.io import acid
    from turbine_maintenance_etl_spark.ops.incremental import refresh_agg_from_cdf

    tbl = str(tmp_path / "tbl")
    state = str(tmp_path / "state")
    aggs = {"n": ("count", "id"), "total": ("sum", "v")}
    schema = "id long, k string, v long"
    acid.create_table(spark, spark.createDataFrame([(1, "a", 10)], schema), tbl)
    refresh_agg_from_cdf(spark, tbl, state, ["k"], aggs)  # cursor = v1
    for i in range(2, 6):
        acid.append_table(
            spark, spark.createDataFrame([(i, "a", 10 * i)], schema), tbl
        )
    acid.vacuum(tbl, keep_last=2)  # reclaims the v1 manifest
    got = {
        r["k"]: (r["n"], r["total"])
        for r in refresh_agg_from_cdf(spark, tbl, state, ["k"], aggs).collect()
    }
    assert got == {"a": (5, 10 + 20 + 30 + 40 + 50)}
    # and the rebuilt cursor advances normally afterwards
    acid.append_table(spark, spark.createDataFrame([(9, "b", 7)], schema), tbl)
    got = {
        r["k"]: (r["n"], r["total"])
        for r in refresh_agg_from_cdf(spark, tbl, state, ["k"], aggs).collect()
    }
    assert got == {"a": (5, 150), "b": (1, 7)}


def test_refresh_agg_from_cdf_schema_evolved_table(spark, tmp_path):
    """Aggregating a column added AFTER table creation: the bootstrap
    and the min/max snapshot splice must read the snapshot with merged
    schema (one arbitrary part-file's schema would drop the late column
    nondeterministically)."""
    from turbine_maintenance_etl_spark.io import acid
    from turbine_maintenance_etl_spark.ops.incremental import refresh_agg_from_cdf

    tbl = str(tmp_path / "tbl")
    acid.create_table(
        spark,
        spark.createDataFrame([(1, "a", 1)], "id long, k string, ver long"),
        tbl,
    )
    acid.append_table(  # evolution: adds 'temp'
        spark,
        spark.createDataFrame(
            [(2, "a", 1, 37.5)], "id long, k string, ver long, temp double"
        ),
        tbl,
    )
    aggs = {"n": ("count", "id"), "hi": ("max", "temp")}
    got = refresh_agg_from_cdf(
        spark, tbl, str(tmp_path / "s1"), ["k"], aggs
    ).collect()
    assert [(r["n"], r["hi"]) for r in got] == [(2, 37.5)]
    # delete-window splice path over the evolved column
    acid.merge_table(
        spark,
        spark.createDataFrame(
            [(2, "a", 2, 12.0)], "id long, k string, ver long, temp double"
        ),
        tbl, keys=("id",), order_col="ver",
    )
    got = refresh_agg_from_cdf(
        spark, tbl, str(tmp_path / "s1"), ["k"], aggs, on_delete_minmax="recompute"
    ).collect()
    assert [(r["n"], r["hi"]) for r in got] == [(2, 12.0)]


def test_approx_distinct_salted_and_incremental(spark, tmp_path):
    """approx_distinct decomposes via mergeable HLL sketches: the salted
    two-stage aggregate and the two-batch incremental state must both
    estimate exactly what a direct one-shot sketch estimates (same
    sketch family, same data), and land within 5% of the exact count."""
    from turbine_maintenance_etl_spark.ops.incremental import merge_incremental_agg

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    direct = {
        r["event_type"]: r["est"]
        for r in events.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est"))
        .collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for k, est in direct.items():
        assert abs(est - exact[k]) / exact[k] < 0.05

    salted = salted_groupby_agg(
        events, ["event_type"], {"sk": ("approx_distinct", "user_id")}, salt_factor=8
    )
    got = {
        r["event_type"]: r["est"]
        for r in salted.select(
            "event_type", F.hll_sketch_estimate("sk").alias("est")
        ).collect()
    }
    assert got == direct  # sketch-union of salted partials is lossless

    state = str(tmp_path / "state")
    b1 = events.filter(F.col("event_id") % 2 == 0)
    b2 = events.filter(F.col("event_id") % 2 == 1)
    aggs = {"sk": ("approx_distinct", "user_id")}
    merge_incremental_agg(spark, state, b1, "b1", ["event_type"], aggs)
    merged = merge_incremental_agg(spark, state, b2, "b2", ["event_type"], aggs)
    got = {
        r["event_type"]: r["est"]
        for r in merged.select(
            "event_type", F.hll_sketch_estimate("sk").alias("est")
        ).collect()
    }
    assert got == direct  # incremental union == one-shot sketch


def test_refresh_agg_from_cdf_approx_distinct(spark, tmp_path):
    """approx_distinct follows the commit log: insert windows union
    sketches incrementally; a delete window errors by default and the
    recompute policy splices a fresh snapshot sketch."""
    from turbine_maintenance_etl_spark.io import acid
    from turbine_maintenance_etl_spark.ops.incremental import refresh_agg_from_cdf

    tbl = str(tmp_path / "tbl")
    state = str(tmp_path / "state")
    schema = "id long, k string, u long, ver long"
    aggs = {"n": ("count", "id"), "sk": ("approx_distinct", "u")}

    def estimates(df):
        return {
            r["k"]: (r["n"], r["est"])
            for r in df.select(
                "k", "n", F.round(F.hll_sketch_estimate("sk")).cast("long").alias("est")
            ).collect()
        }

    acid.create_table(
        spark,
        spark.createDataFrame(
            [(i, "ab"[i % 2], i % 7, 1) for i in range(40)], schema
        ),
        tbl,
    )
    got = estimates(refresh_agg_from_cdf(spark, tbl, state, ["k"], aggs))
    assert got == {"a": (20, 7), "b": (20, 7)}
    acid.append_table(
        spark,
        spark.createDataFrame([(100, "a", 99, 1), (101, "a", 98, 1)], schema),
        tbl,
    )
    got = estimates(refresh_agg_from_cdf(spark, tbl, state, ["k"], aggs))
    assert got["a"] == (22, 9) and got["b"] == (20, 7)
    # delete window: default errors, recompute matches a direct sketch
    acid.merge_table(
        spark,
        spark.createDataFrame([(100, "a", 5, 2)], schema),  # u 99 -> 5 (already seen)
        tbl, keys=("id",), order_col="ver",
    )
    with pytest.raises(ValueError, match="recompute"):
        refresh_agg_from_cdf(spark, tbl, state, ["k"], aggs)
    got = estimates(
        refresh_agg_from_cdf(spark, tbl, state, ["k"], aggs, on_delete_minmax="recompute")
    )
    assert got["a"] == (22, 8)  # distinct u for a is now {0..6, 98}


def test_barrier_scratch_sweep(tmp_path, monkeypatch, spark):
    """Reliable-mode frames accumulate under the scratch dir by design;
    sweep_scratch reclaims aged ones and spares fresh (in-flight) ones."""
    import os as _os

    from turbine_maintenance_etl_spark.ops import materialize as M

    monkeypatch.setenv("SPARK_GRAFT_SCRATCH", str(tmp_path / "scratch"))
    M.barrier(spark.range(5), "old", mode="reliable")
    M.barrier(spark.range(5), "fresh", mode="reliable")
    base = str(tmp_path / "scratch")
    old_dir = next(n for n in _os.listdir(base) if n.startswith("old-"))
    aged = _os.path.getmtime(_os.path.join(base, old_dir)) - 172800
    _os.utime(_os.path.join(base, old_dir), (aged, aged))
    removed = M.sweep_scratch(min_age_s=86400)
    assert removed == [old_dir]
    assert any(n.startswith("fresh-") for n in _os.listdir(base))


def test_barrier_scratch_remote_uri(tmp_path, monkeypatch, spark):
    """A scratch path with a URI scheme must NOT be os.makedirs'd as a
    bogus local dir, and sweep must reclaim it through the Hadoop
    FileSystem (exercised here via file:// → LocalFileSystem — the same
    code path hdfs:// and s3a:// take)."""
    import os as _os

    from turbine_maintenance_etl_spark.ops import materialize as M

    # file:// is normalized to the raw local path (single-node usage)
    monkeypatch.setenv("SPARK_GRAFT_SCRATCH", f"file://{tmp_path}/s1")
    assert M._scratch_dir() == f"{tmp_path}/s1"

    # the Hadoop sweep path: write frames, age one, sweep via the JVM FS
    base = str(tmp_path / "s2")
    _os.makedirs(base)
    spark.range(5).write.parquet(f"{base}/old-abc")
    spark.range(5).write.parquet(f"{base}/fresh-def")
    aged = _os.path.getmtime(f"{base}/old-abc") - 172800
    _os.utime(f"{base}/old-abc", (aged, aged))
    removed = M._sweep_remote(f"file://{base}", min_age_s=86400)
    assert removed == ["old-abc"]
    assert _os.path.exists(f"{base}/fresh-def") and not _os.path.exists(
        f"{base}/old-abc"
    )
    # missing remote root is a clean no-op, not a crash
    assert M._sweep_remote(f"file://{tmp_path}/nowhere", 1.0) == []


def test_refresh_agg_validates_args_even_when_noop(spark, tmp_path):
    """Bad policy/agg specs must fail on the steady-state no-op poll,
    not only once a new commit lands."""
    from turbine_maintenance_etl_spark.io import acid
    from turbine_maintenance_etl_spark.ops.incremental import refresh_agg_from_cdf

    tbl = str(tmp_path / "tbl")
    state = str(tmp_path / "state")
    acid.create_table(spark, spark.createDataFrame([(1, "a")], "id long, k string"), tbl)
    refresh_agg_from_cdf(spark, tbl, state, ["k"], {"n": ("count", "id")})
    # no new commits: both bad specs still raise
    with pytest.raises(ValueError, match="on_delete_minmax"):
        refresh_agg_from_cdf(
            spark, tbl, state, ["k"], {"n": ("count", "id")},
            on_delete_minmax="recmpute",
        )
    with pytest.raises(ValueError, match="non-decomposable"):
        refresh_agg_from_cdf(spark, tbl, state, ["k"], {"m": ("median", "id")})


def test_asof_join_null_and_tie_semantics(spark):
    """SQL-ASOF-consistent edges: NULL-ts/NULL-key right rows match
    nothing (un-filtered, a NULL-ts right row sorted FIRST and its value
    forward-filled everything); a genuinely-NULL right value still wins
    as the latest state (struct fill, not per-column ignorenulls); ties
    at one (key, ts) resolve deterministically; keyless joins raise."""
    from turbine_maintenance_etl_spark.ops.asof import asof_join

    left = spark.createDataFrame(
        [("k", 10), ("k", 30), (None, 10), ("k", None)],
        "key string, ts int",
    )
    right = spark.createDataFrame(
        [
            ("k", None, 99.0),   # NULL ts: must match nothing
            (None, 5, 77.0),     # NULL key: must match nothing
            ("k", 8, 5.0),
            ("k", 20, None),     # genuine NULL value: the state AT ts>=20
        ],
        "key string, ts int, v double",
    )
    got = {
        (r["key"], r["ts"]): r["asof_v"]
        for r in asof_join(left, right, on=["key"], tie_break="ts").collect()
    }
    assert got[("k", 10)] == 5.0
    assert got[("k", 30)] is None      # latest state IS null, not stale 5.0
    assert got[(None, 10)] is None     # NULL key matches nothing
    assert got[("k", None)] is None    # NULL left ts matches nothing

    # duplicate right rows at one (key, ts): same winner on every run
    dup_right = spark.createDataFrame(
        [("k", 5, 1.0), ("k", 5, 2.0)], "key string, ts int, v double"
    )
    winners = {
        asof_join(left.filter("ts = 10"), dup_right, on=["key"])
        .collect()[0]["asof_v"]
        for _ in range(3)
    }
    assert len(winners) == 1

    import pytest

    with pytest.raises(ValueError, match="at least one join key"):
        asof_join(left, right, on=[])


def test_asof_join_right_tie_cols_prefer_max(spark):
    """right_tie_cols makes the LARGEST value tuple at a tied (key, ts)
    the as-of winner — the in-window equivalent of pre-collapsing the
    right side with groupBy(key, ts).max, minus its second shuffle (the
    j_asof_join entry relies on this to stay single-exchange). NULL
    values sort first, so any real value beats NULL at the tie."""
    from turbine_maintenance_etl_spark.ops.asof import asof_join

    left = spark.createDataFrame([("k", 10), ("k", 4)], "key string, ts int")
    right = spark.createDataFrame(
        [("k", 5, 1.0), ("k", 5, 9.0), ("k", 5, None), ("k", 2, 3.0)],
        "key string, ts int, v double",
    )
    got = {
        (r["key"], r["ts"]): r["asof_v"]
        for r in asof_join(
            left, right, on=["key"], tie_break="ts", right_tie_cols=["v"]
        ).collect()
    }
    assert got[("k", 10)] == 9.0   # max of the tie at ts=5, not NULL/1.0
    assert got[("k", 4)] == 3.0    # untied rows unaffected


def test_range_join_left_no_row_ids_and_explosion_cap(spark):
    """The left path carries the range predicate inside ONE outer join
    (no synthetic row ids — monotonically_increasing_id is not stable
    across plan-subtree re-evaluations), and a sentinel-ended interval
    fails loudly instead of sequencing millions of bucket rows."""
    import pytest

    from turbine_maintenance_etl_spark.ops.range_join import range_join

    pts = spark.createDataFrame(
        [(1, "2024-01-01 00:30:00"), (2, "2024-01-01 05:00:00"), (2, "2024-01-01 05:00:00")],
        "pid int, ts_s string",
    ).select("pid", F.col("ts_s").cast("timestamp").alias("ts"))
    iv = spark.createDataFrame(
        [("w1", "2024-01-01 00:00:00", "2024-01-01 01:00:00")],
        "w string, s string, e string",
    ).select("w", F.col("s").cast("timestamp").alias("w_start"),
             F.col("e").cast("timestamp").alias("w_end"))
    got = range_join(pts, iv, how="left").collect()
    # matched point once, each unmatched duplicate point once, NULL-padded
    assert len(got) == 3
    by_pid = sorted((r["pid"], r["w"]) for r in got)
    assert by_pid == [(1, "w1"), (2, None), (2, None)]
    # plan: no monotonically_increasing_id anywhere
    plan = range_join(pts, iv, how="left")._jdf.queryExecution().executedPlan().toString()
    assert "monotonically" not in plan

    sentinel = spark.createDataFrame(
        [("w2", "2024-01-01 00:00:00", "9999-12-31 00:00:00")],
        "w string, s string, e string",
    ).select("w", F.col("s").cast("timestamp").alias("w_start"),
             F.col("e").cast("timestamp").alias("w_end"))
    with pytest.raises(Exception, match="max_buckets_per_interval"):
        range_join(pts, sentinel, how="inner").collect()


def test_scd2_survives_null_timestamps(spark):
    """An open row with NULL valid_from must never vanish: no update →
    untouched; a timestamped update → closed+reopened. NULL-ts updates
    are no-ops on existing keys but insert brand-new keys."""
    from turbine_maintenance_etl_spark.ops.scd import scd2_apply, scd2_bootstrap

    snap = spark.createDataFrame(
        [("a", "x", None), ("b", "y", 10)], "k string, v string, ts int"
    )
    dim = scd2_bootstrap(snap, ["k"], ["v"])
    # no updates at all: both rows survive
    empty = spark.createDataFrame([], "k string, v string, ts int")
    kept = scd2_apply(dim, empty, ["k"], ["v"])
    assert sorted(r["k"] for r in kept.collect()) == ["a", "b"]
    # a real update to the NULL-valid_from key closes + reopens it
    upd = spark.createDataFrame([("a", "x2", 20), ("c", "z", None)],
                                "k string, v string, ts int")
    out = scd2_apply(dim, upd, ["k"], ["v"]).collect()
    a_rows = sorted(
        ((r["v"], r["is_current"]) for r in out if r["k"] == "a"),
    )
    assert a_rows == [("x", False), ("x2", True)]
    # NULL-ts insert for a brand-new key still lands (open, NULL start)
    assert [(r["v"], r["is_current"]) for r in out if r["k"] == "c"] == [("z", True)]


def test_hash_split_total_over_null_ids(spark):
    """A split must PARTITION its input: NULL-id rows land
    deterministically in exactly one half instead of vanishing from
    both."""
    from turbine_maintenance_etl_spark.ops.sampling import hash_split

    df = spark.createDataFrame(
        [(i,) for i in range(100)] + [(None,), (None,)], "doc_id int"
    )
    train, eva = hash_split(df, "doc_id")
    n_train, n_eval = train.count(), eva.count()
    assert n_train + n_eval == 102  # nothing vanished
    # deterministic: same assignment on a rerun
    t2, e2 = hash_split(df, "doc_id")
    assert t2.count() == n_train and e2.count() == n_eval


def test_salted_agg_salt_is_content_defined(spark):
    """The salt must be a pure function of the row (retry-safe): the
    plan contains no rand(), and results equal the direct aggregate."""
    from turbine_maintenance_etl_spark.ops.skew import salted_groupby_agg

    e = spark.read.parquet(f"{SF_DIR}/events.parquet")
    aggs = {"n": ("count", "event_id"), "total": ("sum", "value")}
    got = salted_groupby_agg(e, ["event_type"], aggs)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "rand(" not in plan
    want = {
        r["event_type"]: (r["n"], round(r["total"], 6))
        for r in e.groupBy("event_type")
        .agg(F.count("event_id").alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert {
        r["event_type"]: (r["n"], round(r["total"], 6)) for r in got.collect()
    } == want


def test_approx_percentile_policy_bounds(spark):
    """The exact-vs-approx percentile policy (round-7 verdict item 7):
    at accuracy >= N the GK sketch is exactly the discrete quantile
    (the a12_approx_quantiles oracle relies on this); at accuracy << N
    the rank error stays within the documented 1/accuracy bound."""
    import numpy as np
    from pyspark.sql import functions as F

    rng = np.random.default_rng(7)
    vals = rng.normal(100.0, 25.0, 20_000).tolist()
    df = spark.createDataFrame([(float(v),) for v in vals], "v double")
    exact_sorted = sorted(vals)

    # accuracy >= N: exact discrete quantile
    got = df.agg(
        F.percentile_approx("v", F.array(*[F.lit(p) for p in (0.1, 0.5, 0.9)]), F.lit(50_000))
    ).collect()[0][0]
    for p, g in zip((0.1, 0.5, 0.9), got):
        assert g in vals
        rank = exact_sorted.index(g) / (len(vals) - 1)
        assert abs(rank - p) < 1e-3, (p, rank)

    # accuracy << N: rank error bounded by ~1/accuracy
    acc = 100
    got = df.agg(
        F.percentile_approx("v", F.array(*[F.lit(p) for p in (0.1, 0.5, 0.9)]), F.lit(acc))
    ).collect()[0][0]
    for p, g in zip((0.1, 0.5, 0.9), got):
        rank = np.searchsorted(exact_sorted, g) / (len(vals) - 1)
        assert abs(rank - p) <= 2.0 / acc, (p, rank)
