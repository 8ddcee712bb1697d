"""Regressions for the round-10 registry review: Spark-vs-DuckDB
divergences that are latent on the clean fixtures (no NULL text, no
NaN readings, whole-second timestamps, no tied purchases) but concrete
on inputs the codebase itself anticipates. Each test replays the REAL
registry entry against its OWN DuckDB oracle on an adversarial
synthetic table — the same harness the driver uses."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

import turbine_maintenance_etl_spark.queries_ext  # noqa: F401
from tests.oracle_harness import compare
from turbine_maintenance_etl_spark.queries import REGISTRY


def _duck(tmp_path, table: str):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW {table} AS SELECT * FROM '{tmp_path}/{table}.parquet'")
    return con


def _replay(spark, tmp_path, name: str):
    q = REGISTRY[name]
    spark_pdf = q.fn(spark, str(tmp_path)).toPandas()
    table = "documents" if "simhash" in name else "events"
    con = _duck(tmp_path, table)
    try:
        duck_pdf = con.execute(q.oracle).df()
    finally:
        con.close()
    problems = compare(spark_pdf, duck_pdf, name)
    assert not problems, "\n".join(problems)
    return spark_pdf


def _write_events(tmp_path, **overrides):
    n = overrides.pop("n", 60)
    idx = np.arange(n, dtype=np.int64)
    base = {
        "event_id": idx,
        "ts": pd.Timestamp("2024-01-01") + pd.to_timedelta(idx * 60, unit="s"),
        "user_id": idx % 7,
        "event_type": ["view"] * n,
        "value": idx * 0.5,
        "props": ['{"k": 5}'] * n,
    }
    base.update(overrides)
    pd.DataFrame(base).to_parquet(tmp_path / "events.parquet")


def test_simhash_entry_parity_with_tokenless_docs(spark, tmp_path):
    """Token-less docs (empty/whitespace/NULL text) must fingerprint as
    NULL on BOTH engines — the oracle's per-bit COALESCE previously
    packed an all-zero fingerprint (0) for them."""
    pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": ["real words here", "", "   ", None, "more real words"],
            "lang": ["en"] * 5,
            "source": ["s"] * 5,
            "n_chars": [15, 0, 3, 0, 15],
        }
    ).to_parquet(tmp_path / "documents.parquet")
    out = _replay(spark, tmp_path, "dedup_simhash_oracle")
    by_id = out.set_index("doc_id")["simhash"]
    assert pd.isna(by_id[2]) and pd.isna(by_id[3]) and pd.isna(by_id[4])
    assert not pd.isna(by_id[1]) and not pd.isna(by_id[5])


def test_wavg_entry_parity_with_null_and_nan_values(spark, tmp_path):
    """An all-NULL group must yield NULL (pandas' skipna sum returned
    0.0), and a NaN reading must be handled identically on both sides
    (nanvl + ISNAN branch)."""
    n = 60
    idx = np.arange(n, dtype=np.int64)
    etype = np.where(idx % 3 == 0, "deadtype", np.where(idx % 3 == 1, "view", "click"))
    value = idx * 0.5
    value = np.where(etype == "deadtype", np.nan, value)  # all-missing group
    value = np.where(idx % 10 == 2, np.nan, value)  # stray NaN readings
    _write_events(tmp_path, n=n, event_type=list(etype), value=value)
    out = _replay(spark, tmp_path, "ud_grouped_agg_wavg")
    by_type = out.set_index("event_type")["wavg"]
    assert pd.isna(by_type["deadtype"])
    assert not pd.isna(by_type["view"]) and not pd.isna(by_type["click"])


def test_variant_and_json_extract_parity_with_adversarial_props(spark, tmp_path):
    """NULL props, nested keys, malformed JSON, missing keys and
    non-numeric k must extract identically: the old regex oracle
    matched nested '\"k\":' fragments and CRASHED on CAST('' AS BIGINT)
    for a no-match row; is_valid read NULL props as 0 instead of NULL."""
    props = [
        '{"k": 5}',
        '{"a": {"k": 7}}',  # nested: $.k must be NULL, regex said 7
        '{"k": 5',  # malformed
        '{"x": 1}',  # no k: regex oracle crashed here
        '{"k": "abc"}',  # non-numeric
        None,
    ]
    _write_events(tmp_path, n=6, props=props)
    fv = _replay(spark, tmp_path, "f_variant_semistructured")
    fj = _replay(spark, tmp_path, "f_json_extract")
    assert pd.isna(fv.set_index("event_id")["is_valid"][5])
    ks = fj.set_index("event_id")["k"]
    assert ks[0] == 5 and pd.isna(ks[1]) and pd.isna(ks[2]) and pd.isna(ks[3])
    assert pd.isna(ks[4]) and pd.isna(ks[5])


def test_range_frame_parity_with_subsecond_timestamps(spark, tmp_path):
    """Frame membership at the exact 6-hour boundary with sub-second
    timestamps: unix_timestamp's whole-second truncation previously
    admitted rows the oracle's microsecond INTERVAL frame excludes."""
    ts = [
        pd.Timestamp("2024-01-01 04:00:00.200"),
        pd.Timestamp("2024-01-01 04:00:00.500"),  # exactly 6h before C
        pd.Timestamp("2024-01-01 04:00:00.800"),
        pd.Timestamp("2024-01-01 10:00:00.500"),  # current row C
    ]
    _write_events(
        tmp_path, n=4, ts=ts, user_id=np.zeros(4, dtype=np.int64),
        value=np.array([1.0, 10.0, 100.0, 1000.0]),
    )
    out = _replay(spark, tmp_path, "w_range_time_frame")
    # C's frame: [04:00:00.5, 10:00:00.5] -> rows 2,3,4 (the .200 row
    # is OUTSIDE; second-truncation wrongly included it)
    c = out.set_index("event_id")["rolling_6h_value"][3]
    assert c == 1110.0


def test_asof_entry_parity_with_tied_purchases(spark, tmp_path):
    """Duplicate purchases at one (user_id, ts) are collapsed to the
    max value on BOTH engines — DuckDB's ASOF has no tie-break, so
    un-collapsed ties compared an arbitrary oracle pick against
    Spark's deterministic one."""
    ts0 = pd.Timestamp("2024-01-01 01:00:00")
    _write_events(
        tmp_path,
        n=5,
        ts=[ts0, ts0, ts0 + pd.Timedelta("1h"), ts0 + pd.Timedelta("2h"), ts0],
        user_id=np.array([1, 1, 1, 1, 2], dtype=np.int64),
        event_type=["purchase", "purchase", "view", "view", "view"],
        value=np.array([10.0, 99.0, 1.0, 2.0, 3.0]),
    )
    out = _replay(spark, tmp_path, "j_asof_join")
    by_id = out.set_index("event_id")["last_purchase_value"]
    assert by_id[2] == 99.0 and by_id[3] == 99.0  # max of the tie
    assert pd.isna(by_id[4])  # user 2 never purchased
