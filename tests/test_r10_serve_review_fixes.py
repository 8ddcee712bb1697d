"""Regressions for the round-10 self-review findings on the io /
serving / ops-utility layer: map columns through the salted aggregate,
NULL interval bounds through the range join, int32 overflow through the
Python datasource, band parameterization and empty-input robustness in
the dashboard measures, and unique default observation names."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


def test_salted_groupby_agg_with_map_column(spark):
    """The content-defined salt must route through the map-safe row
    hash — raw xxhash64 raises AnalysisException the moment the frame
    carries a MapType column."""
    from turbine_maintenance_etl_spark.ops.skew import salted_groupby_agg

    df = spark.createDataFrame(
        [Row(k="a", id=i, props={"n": str(i)}) for i in range(10)]
        + [Row(k="b", id=i, props={"n": str(i)}) for i in range(3)],
        "k string, id long, props map<string,string>",
    )
    got = {
        r.k: (r.n, r.lo)
        for r in salted_groupby_agg(
            df, ["k"], {"n": ("count", "id"), "lo": ("min", "id")}
        ).collect()
    }
    assert got == {"a": (10, 0), "b": (3, 0)}


def test_range_join_null_interval_bounds_match_nothing(spark):
    """BETWEEN semantics: an interval with a NULL start or end matches
    no points — it must not fall through the NULL span comparison into
    the bucket-explosion error branch and kill the job."""
    from turbine_maintenance_etl_spark.ops.range_join import range_join

    points = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00")], "pid int, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    intervals = spark.createDataFrame(
        [
            ("ok", "2024-01-01 09:00:00", "2024-01-01 11:00:00"),
            ("open", "2024-01-01 09:00:00", None),
            ("unstarted", None, "2024-01-01 11:00:00"),
        ],
        "iname string, w_start string, w_end string",
    ).select(
        "iname",
        F.col("w_start").cast("timestamp").alias("w_start"),
        F.col("w_end").cast("timestamp").alias("w_end"),
    )
    got = range_join(points, intervals).collect()
    assert [r.iname for r in got] == ["ok"]
    # left join still surfaces the point when nothing matches
    left = range_join(
        points, intervals.filter(F.col("iname") != "ok"), how="left"
    ).collect()
    assert len(left) == 1 and left[0].iname is None


def test_datasource_parse_token_int32_overflow():
    from turbine_maintenance_etl_spark.io.datasource import _parse_token

    assert _parse_token("3000000000", True) is None
    assert _parse_token("-3000000000", True) is None
    assert _parse_token("1e30", True) is None
    assert _parse_token("2147483647", True) == 2147483647
    assert _parse_token("3000000000", False) == 3000000000.0


def test_datasource_overflow_parity_with_jvm_path(spark, tmp_path):
    """The same file must yield the same rows through the Python
    datasource and the JVM text path: an int-overflowing token is NULL
    on both routes, not a task crash on one."""
    from tests.conftest import make_cmapss_pdf, write_cmapss_txt
    from turbine_maintenance_etl_spark.io.cmapss import read_cmapss_text
    from turbine_maintenance_etl_spark.io.datasource import CmapssDataSource

    spark.dataSource.register(CmapssDataSource)
    pdf = make_cmapss_pdf(n_units=2, min_len=10, max_len=20)
    p = tmp_path / "train_FD001.txt"
    write_cmapss_txt(pdf.drop(columns=["dataset"]), str(p))
    with open(p, "a") as fh:
        fh.write("3000000000 1 " + " ".join(["1.5"] * 24) + "\n")
    via_jvm = read_cmapss_text(spark, str(p))
    via_py = spark.read.format("cmapss").load(str(p))
    assert via_py.count() == via_jvm.count()
    assert via_py.filter(F.col("unit_nr").isNull()).count() == 1
    assert via_jvm.filter(F.col("unit_nr").isNull()).count() == 1


def test_critical_share_band_parameters(spark):
    from turbine_maintenance_etl_spark.metrics.dashboard import critical_share

    df = spark.createDataFrame([(r,) for r in (10, 70, 100, 200)], "rul int")
    # a threshold that would swallow the hardcoded warning band now
    # refuses loudly instead of silently misclassifying
    with pytest.raises(ValueError, match="must ascend"):
        critical_share(df, threshold=80)
    got = {
        r.band: r.n
        for r in critical_share(df, threshold=80, warning=110, watch=150).collect()
    }
    assert got == {"critical": 2, "warning": 1, "watch": 0, "healthy": 1} or got == {
        "critical": 2,
        "warning": 1,
        "healthy": 1,
    }


def test_sensor_histogram_empty_and_all_null(spark):
    from turbine_maintenance_etl_spark.metrics.dashboard import sensor_histogram

    empty = spark.createDataFrame([], "s1 double")
    assert sensor_histogram(empty, "s1").count() == 0
    nulls = spark.createDataFrame([(None,), (None,)], "s1 double")
    assert sensor_histogram(nulls, "s1").count() == 0


def test_observe_metrics_unique_default_names(spark):
    """Two observation points on one plan with default names must not
    collide at action time."""
    from turbine_maintenance_etl_spark.ops.observe import observe_metrics

    df = spark.range(10)
    d1, o1 = observe_metrics(df, {"n1": F.count(F.lit(1))})
    d2, o2 = observe_metrics(d1.filter(F.col("id") < 5), {"n2": F.count(F.lit(1))})
    assert d2.count() == 5
    assert o1.get["n1"] == 10 and o2.get["n2"] == 5


def test_fleet_overview_schema_unchanged(spark):
    from turbine_maintenance_etl_spark.metrics.dashboard import fleet_overview

    df = spark.createDataFrame(
        [("FD001", 1, 1, 10), ("FD001", 1, 2, 9), ("FD001", 2, 1, 5)],
        "dataset string, unit_nr int, time_cycles int, rul int",
    )
    row = fleet_overview(df).collect()[0]
    assert row.n_engines == 2 and row.max_rul == 10


def test_roundtrip_entries_clean_their_scratch(spark):
    """The sink roundtrip entries must reclaim their scratch dirs
    before returning (r10 review: the old pid-keyed /tmp paths leaked a
    dataset copy per driver process, forever)."""
    import glob
    import tempfile

    import turbine_maintenance_etl_spark.queries_sources  # noqa: F401
    from tests.conftest import SF_DIR
    from turbine_maintenance_etl_spark.queries import REGISTRY

    for name, n_rows in (
        ("s_sink_roundtrip", 3),
        ("s_jsonl_roundtrip", 2),
        ("s_orc_roundtrip", 2),
    ):
        prefix = {
            "s_sink_roundtrip": "spark_sink_roundtrip_",
            "s_jsonl_roundtrip": "spark_jsonl_roundtrip_",
            "s_orc_roundtrip": "spark_orc_roundtrip_",
        }[name]
        pat = f"{tempfile.gettempdir()}/{prefix}*"
        before = set(glob.glob(pat))
        assert REGISTRY[name].fn(spark, SF_DIR).count() == n_rows
        assert set(glob.glob(pat)) == before, f"{name} leaked scratch dirs"


def test_get_spark_preset_sentinel(spark):
    """master='preset' must not try to re-point the session (builder
    skips .master entirely); getOrCreate returns the live session."""
    from turbine_maintenance_etl_spark import get_spark

    s = get_spark(app_name="preset-smoke", master="preset")
    assert s is spark or s.conf.get("spark.master") == spark.conf.get("spark.master")
