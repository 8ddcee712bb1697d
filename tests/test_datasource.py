"""Custom Python DataSource (io/datasource.py) — differential parity
with the JVM text-scan parser on real FD001 plus crafted edge rows."""

from __future__ import annotations

import os

import pytest

from turbine_maintenance_etl_spark.io.cmapss import read_cmapss_text
from turbine_maintenance_etl_spark.io.datasource import CmapssDataSource

RAW = "/root/reference/data/raw"


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(CmapssDataSource)
    return spark


@pytest.mark.skipif(
    not os.path.isfile(f"{RAW}/train_FD001.txt"), reason="reference data absent"
)
def test_datasource_matches_jvm_parser_on_fd001(registered):
    spark = registered
    via_ds = spark.read.format("cmapss").load(f"{RAW}/train_FD001.txt")
    via_jvm = read_cmapss_text(spark, f"{RAW}/train_FD001.txt")
    assert via_ds.schema == via_jvm.schema
    a = sorted(map(tuple, via_ds.collect()))
    b = sorted(map(tuple, via_jvm.collect()))
    assert a == b


def test_datasource_edge_rows(registered, tmp_path):
    """Ragged/garbage/blank lines: same coerce-to-NULL semantics as the
    JVM path (pd.to_numeric(errors='coerce') parity)."""
    spark = registered
    f = tmp_path / "edge.txt"
    f.write_text(
        "1 1 0.1 0.2 0.3 " + " ".join(str(i) for i in range(21)) + "\n"
        "\n"                              # blank line dropped
        "2 oops 0.1 0.2 0.3\n"            # garbage + short row -> NULL fill
        "3.0 4.0 1 2 3\n"                 # float-looking ints truncate
    )
    via_ds = spark.read.format("cmapss").load(str(f))
    via_jvm = read_cmapss_text(spark, str(f))
    assert sorted(map(tuple, via_ds.collect())) == sorted(
        map(tuple, via_jvm.collect())
    )
    rows = {r["unit_nr"]: r for r in via_ds.collect()}
    assert rows[2]["time_cycles"] is None and rows[2]["sensor1"] is None
    assert rows[3]["time_cycles"] == 4


def test_datasource_directory_fanout(registered, tmp_path):
    """A directory input becomes one partition per file."""
    spark = registered
    for i in range(3):
        (tmp_path / f"part{i}.txt").write_text(
            f"{i} 1 0.0 0.0 0.0 " + " ".join("1" for _ in range(21)) + "\n"
        )
    df = spark.read.format("cmapss").load(str(tmp_path))
    assert df.count() == 3
    assert df.rdd.getNumPartitions() == 3
