"""Round-11 (r10 verdict item 7): the ACID commit's zero-job footer
stats must survive remote filesystems. `_footer_stats` historically
listed via os.listdir, so any URI table path (hdfs://, s3a://) raised
OSError and silently fell back to the Spark aggregate — correct but
forfeiting the optimization exactly where commits are most expensive.
The URI branch now lists and reads footers through pyarrow.fs; these
tests drive that branch end-to-end with a file:// URI (same code path
as hdfs/s3 — FileSystem.from_uri + FileSelector + open_input_file) and
pin the local behavior unchanged."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from turbine_maintenance_etl_spark.io.acid import _footer_stats


def _write_dir(tmp_path):
    d = tmp_path / "data-000"
    d.mkdir()
    pq.write_table(
        pa.table({"id": pa.array([1, 2, 3], pa.int64()), "v": pa.array([10, 20, 30], pa.int32())}),
        d / "part-a.parquet",
    )
    pq.write_table(
        pa.table({"id": pa.array([7, None, 5], pa.int64()), "v": pa.array([1, 2, 3], pa.int32())}),
        d / "part-b.parquet",
    )
    # non-data entries every committed dir carries — both branches must skip them
    (d / "_SUCCESS").write_text("")
    (d / ".part-a.parquet.crc").write_bytes(b"\x00")
    return d


def test_footer_stats_uri_matches_local(tmp_path):
    d = _write_dir(tmp_path)
    local = _footer_stats(str(d), ("id", "v", "absent"))
    via_uri = _footer_stats("file://" + str(d), ("id", "v", "absent"))
    assert local is not None
    assert via_uri == local
    assert local["rows"] == 6
    assert local["cols"] == {"id": [1, 7], "v": [1, 30]}


def test_footer_stats_unsupported_scheme_requests_fallback():
    # an unknown scheme (or missing pyarrow binding) must return None —
    # the conservative Spark-aggregate fallback — never raise
    assert _footer_stats("bogus9x://bucket/tbl/d0", ("id",)) is None


def test_footer_stats_empty_uri_dir_requests_fallback(tmp_path):
    d = tmp_path / "empty-000"
    d.mkdir()
    assert _footer_stats("file://" + str(d), ("id",)) is None
