"""Regressions for the round-10 self-review findings on the io /
streaming / ops layer: streaming-vs-batch parser coercion parity,
NULL-key batches through the stats-pruned merge, NULL ``valid_from`` in
point-in-time slices, map-typed value columns through the as-of
tiebreak, NaN exclusion in the PSI monitor, JSON-faithful UDTF scalar
rendering, deployment-aware barriers in the upsert sink, and bounded
drains on every availableNow driver."""

from __future__ import annotations

import glob
import inspect
import json
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


def test_streaming_parser_coerces_bad_tokens_like_batch(spark):
    """The micro-batch line parser must emit NULL (never crash, never
    0/INT_MAX) for NaN/Infinity/overflow tokens in int columns — the
    contract the batch reader (io/cmapss.py) already keeps. A plain
    .cast("int") crashed the micro-batch under ANSI and silently
    emitted sentinel ints without it."""
    from turbine_maintenance_etl_spark.schema.cmapss import CMAPSS_COLS
    from turbine_maintenance_etl_spark.streaming.ingest import _parse_cmapss_lines

    n_extra = len(CMAPSS_COLS) - 2
    tail = " ".join(["1.5"] * n_extra)
    lines = [
        (f"3 7 {tail}",),  # clean row
        (f"NaN 7 {tail}",),  # NaN token in an int column
        (f"Infinity 7 {tail}",),  # infinite token
        (f"99999999999999999999 7 {tail}",),  # int-overflowing token
    ]
    raw = spark.createDataFrame(lines, "value string")
    out = _parse_cmapss_lines(raw).select("unit_nr", "time_cycles").collect()
    assert sorted(r.unit_nr for r in out if r.unit_nr is not None) == [3]
    assert sum(r.unit_nr is None for r in out) == 3
    assert all(r.time_cycles == 7 for r in out)


def test_merge_mixed_null_key_batch_takes_full_rewrite(spark, tmp_path):
    """A batch that MIXES NULL and non-NULL keys must not take the
    stats-pruned path: min/max key bounds say nothing about the NULL
    keys, so a carried directory's stale NULL-key row would survive
    next to the batch's newer one — two rows for one key, and
    latest-wins silently broken for the NULL group."""
    from turbine_maintenance_etl_spark.io import acid

    path = str(tmp_path / "tbl")
    schema = "k int, v int, val string"
    b1 = spark.createDataFrame([(None, 1, "old-null"), (10, 1, "a")], schema)
    acid.upsert_table(spark, b1, path, ("k",), "v")
    # batch 2's non-NULL key range [99, 99] is provably disjoint from
    # the committed dir's [10, 10] — the pruned path would carry the
    # stale NULL-key row; the nk<n guard must force the full rewrite
    b2 = spark.createDataFrame([(None, 2, "new-null"), (99, 2, "b")], schema)
    acid.upsert_table(spark, b2, path, ("k",), "v")
    rows = acid.read_table(spark, path).collect()
    null_rows = [r for r in rows if r.k is None]
    assert len(null_rows) == 1
    assert null_rows[0].val == "new-null"
    assert {r.k for r in rows} == {None, 10, 99}


def test_scd2_as_of_keeps_null_valid_from_rows(spark):
    """scd2_apply deliberately preserves NULL-ts inserts as open rows;
    the point-in-time slice must treat their NULL valid_from as
    valid-from-the-beginning, not silently drop the key."""
    from turbine_maintenance_etl_spark.ops.scd import scd2_as_of

    dim = spark.createDataFrame(
        [
            Row(k="a", tier="gold", valid_from=None, valid_to=None, is_current=True),
            Row(k="b", tier="iron", valid_from=5, valid_to=None, is_current=True),
            Row(k="c", tier="tin", valid_from=50, valid_to=None, is_current=True),
        ],
        "k string, tier string, valid_from int, valid_to int, is_current boolean",
    )
    got = {r.k: r.tier for r in scd2_as_of(dim, 10).collect()}
    assert got == {"a": "gold", "b": "iron"}


def test_asof_join_map_typed_value_column(spark):
    """A map-typed right value column must route through the map-safe
    tiebreak hash — raw xxhash64 raises AnalysisException on MapType,
    so the whole as-of join failed to even analyze."""
    from turbine_maintenance_etl_spark.ops.asof import asof_join

    left = spark.createDataFrame([("u", 10), ("u", 3)], "k string, ts int")
    right = spark.createDataFrame(
        [Row(k="u", ts=5, attrs={"tier": "gold"})],
        "k string, ts int, attrs map<string,string>",
    )
    out = {r.ts: r.asof_attrs for r in asof_join(left, right, on=["k"]).collect()}
    assert out[10] == {"tier": "gold"}
    assert out[3] is None
    # duplicate right rows at one (k, ts): the hash tiebreak must pick
    # ONE deterministically, and the canonicalization must make the two
    # key orders of the SAME map hash identically (run twice, same pick)
    dup = spark.createDataFrame(
        [
            Row(k="u", ts=5, attrs={"a": "1", "b": "2"}),
            Row(k="u", ts=5, attrs={"z": "9"}),
        ],
        "k string, ts int, attrs map<string,string>",
    )
    r1 = asof_join(left, dup, on=["k"]).filter(F.col("ts") == 10).collect()[0].asof_attrs
    r2 = asof_join(left, dup, on=["k"]).filter(F.col("ts") == 10).collect()[0].asof_attrs
    assert r1 == r2


def test_psi_excludes_nan_from_binning(spark):
    """NaN compares false against every bin edge, so an unguarded
    binning silently dropped it into the OVERFLOW bin — a drift monitor
    reporting 'values above the top edge' for a feed that started
    emitting NaN. NaN is excluded alongside NULL."""
    from turbine_maintenance_etl_spark.ops.drift import psi_report

    expected = spark.createDataFrame(
        [(1.0,), (2.0,), (float("nan"),), (None,)], "value double"
    )
    actual = spark.createDataFrame([(1.0,), (2.0,)], "value double")
    rep = psi_report(expected, actual, "value", [0.0, 10.0]).collect()
    by_bin = {r.bin: r for r in rep}
    # overflow bin (index len(edges)-1 == 1) must be UNOCCUPIED: the
    # NaN never lands there, and both-empty bins are omitted
    assert 1 not in by_bin
    assert by_bin[0].n_expected == 2 and by_bin[0].n_actual == 2
    # identical effective distributions -> ~0 PSI everywhere
    assert all(abs(r.psi_contribution) < 1e-9 for r in rep)


def test_udtf_scalar_rendering_is_json_faithful():
    from turbine_maintenance_etl_spark.ops.udtf import _render

    assert _render(True) == "true"
    assert _render(False) == "false"
    assert _render(None) == "null"
    assert _render("plain") == "plain"  # bare, jsonb_each-style
    assert _render(42) == "42"
    assert _render(1.5) == "1.5"
    # containers render COMPACT (minified, DuckDB-json_extract-identical)
    assert _render([1, 2]) == "[1,2]"
    assert _render({"a": 1}) == '{"a":1}'


def test_udtf_json_pairs_end_to_end_bool_null(spark):
    from turbine_maintenance_etl_spark.ops.udtf import register_udtfs

    register_udtfs(spark)
    spark.createDataFrame(
        [('{"flag": true, "gone": null, "name": "x", "n": 3}',)], "props string"
    ).createOrReplaceTempView("udtf_fix_v")
    got = {
        r.key: r.value
        for r in spark.sql(
            "SELECT p.key, p.value FROM udtf_fix_v, LATERAL parse_json_pairs(props) p"
        ).collect()
    }
    assert got == {"flag": "true", "gone": "null", "name": "x", "n": "3"}


def test_upsert_by_key_honors_reliable_checkpoint_mode(spark, tmp_path, monkeypatch):
    """The pre-overwrite materialization must route through barrier():
    in reliable mode the pinned rows go to scratch parquet (and survive
    executor loss AFTER the source files are deleted); a raw
    localCheckpoint silently ignored the deployment mode."""
    from turbine_maintenance_etl_spark.io.sinks import upsert_by_key

    scratch = tmp_path / "scratch"
    monkeypatch.setenv("SPARK_GRAFT_CHECKPOINT_MODE", "reliable")
    monkeypatch.setenv("SPARK_GRAFT_SCRATCH", str(scratch))
    path = str(tmp_path / "tbl")
    b1 = spark.createDataFrame([(1, 1, "a")], "k int, v int, val string")
    upsert_by_key(spark, b1, path, keys=("k",), order_col="v")
    b2 = spark.createDataFrame([(1, 2, "b")], "k int, v int, val string")
    upsert_by_key(spark, b2, path, keys=("k",), order_col="v")
    rows = spark.read.parquet(path).collect()
    assert [(r.k, r.v, r.val) for r in rows] == [(1, 2, "b")]
    assert glob.glob(str(scratch / "upsert-latest-*")), (
        "reliable mode did not route the upsert barrier through scratch"
    )


def test_availablenow_drivers_take_bounded_drain_timeouts():
    """Every availableNow driver must expose timeout_s and drain through
    _await_drained — an untimed awaitTermination hangs the caller
    forever if the drain wedges."""
    from turbine_maintenance_etl_spark.streaming import ingest

    for fn in (
        ingest.stream_cmapss_ingest,
        ingest.stream_upsert_sink,
        ingest.stream_incremental_dedup,
        ingest.stream_acid_upsert_sink,
        ingest.stream_incremental_curation,
        ingest.stream_maintained_rollup,
    ):
        assert "timeout_s" in inspect.signature(fn).parameters, fn.__name__
    src = inspect.getsource(ingest)
    assert "q.awaitTermination()" not in src, "an untimed drain crept back in"


def test_pin_index_config_sidecar_never_torn(spark, tmp_path):
    """The config sidecar must only ever APPEAR fully written (temp +
    fsync + link): after any successful pin the file parses as the full
    JSON config and no temp files are left behind."""
    from turbine_maintenance_etl_spark.streaming.ingest import (
        make_curation_batch_processor,
    )

    cur, idx = str(tmp_path / "cur"), str(tmp_path / "idx")
    batch = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again and again "
                "because the quick brown fox likes the lazy dog", 1)
        ],
        "doc_id int, text string, _commit_version int",
    )
    make_curation_batch_processor(cur, idx, min_tokens=5)(batch, 0)
    sidecar = os.path.join(idx, "_lsh_config.json")
    with open(sidecar) as f:
        cfg = json.load(f)
    assert set(cfg) == {"num_hashes", "bands", "n"}
    assert not glob.glob(os.path.join(idx, "_lsh_config.*.tmp"))
    # a mismatched processor must refuse loudly
    with pytest.raises(ValueError, match="was built with"):
        make_curation_batch_processor(cur, idx, min_tokens=5, bands=4)(batch, 1)
