"""Round-10 optimization regression net.

The r10 optimization round rebuilt the hot expression builders as
single-parse SQL strings (driver py4j construction was the measured
dominant cost — OPTIMIZATION_r10.md). These tests pin the load-bearing
equivalences:

1. every dual-path builder (str input → SQL text; Column input → legacy
   py4j construction) produces IDENTICAL results on adversarial inputs;
2. parquet-footer commit stats equal the Spark-aggregate stats for
   integer columns and fall back (None) for non-integer ones;
3. a lazy barrier frame materializes on its first action and still cuts
   lineage (the CC loop's one-job-per-round contract).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


ADVERSARIAL_TEXTS = [
    ("  leading  and   trailing  ", 1),
    ("", 2),
    (None, 3),
    ("one", 4),
    ("a b c d e f g h", 5),
    ("Tabs\tand\nnewlines\r\nhere", 6),
    ("UPPER lower 123 ... ### périphérie füße", 7),
    ("dup dup dup dup", 8),
    ("x'quote\"double`tick", 9),
]


@pytest.fixture()
def docs(spark):  # noqa: F811
    return spark.createDataFrame(
        [(t, i) for t, i in ADVERSARIAL_TEXTS], "text string, doc_id int"
    )


def _collect(df, col):
    return [r[0] for r in df.select(col).orderBy("doc_id").collect()]


def test_tokens_expr_str_and_column_paths_identical(docs):
    from turbine_maintenance_etl_spark.llm.text import tokens_expr

    a = _collect(docs.withColumn("o", tokens_expr("text")), "o")
    b = _collect(docs.withColumn("o", tokens_expr(F.col("text"))), "o")
    assert a == b


def test_bpe_count_str_and_column_paths_identical(docs):
    from turbine_maintenance_etl_spark.llm.text import bpe_ish_token_count_expr

    a = _collect(docs.withColumn("o", bpe_ish_token_count_expr("text")), "o")
    b = _collect(docs.withColumn("o", bpe_ish_token_count_expr(F.col("text"))), "o")
    assert a == b


def test_normalize_text_str_and_column_paths_identical(docs):
    from turbine_maintenance_etl_spark.llm.text import normalize_text_expr

    a = _collect(docs.withColumn("o", normalize_text_expr("text")), "o")
    b = _collect(docs.withColumn("o", normalize_text_expr(F.col("text"))), "o")
    assert a == b


def test_shingles_str_and_column_paths_identical(docs):
    from turbine_maintenance_etl_spark.llm.dedup import shingles

    for n in (2, 3):
        a = _collect(docs.withColumn("o", shingles("text", n)), "o")
        b = _collect(docs.withColumn("o", shingles(F.col("text"), n)), "o")
        assert a == b, f"n={n}"


def test_vector_helpers_str_and_column_paths_identical(spark):  # noqa: F811
    from turbine_maintenance_etl_spark.llm.similarity import _norm, as_double_array

    vecs = spark.createDataFrame(
        [([1.5, -2.0, 0.25], 1), ([0.0, 0.0, 0.0], 2), (None, 3), ([7.0], 4)],
        "v array<double>, doc_id int",
    )
    for fn in (as_double_array, _norm):
        a = _collect(vecs.withColumn("o", fn("v")), "o")
        b = _collect(vecs.withColumn("o", fn(F.col("v"))), "o")
        assert a == b, fn.__name__


def test_dlit_round_trips_doubles(spark):  # noqa: F811
    """repr()+'D' literals must parse back to the bit-identical double
    (the centroid/weight matrices embed through this path)."""
    from turbine_maintenance_etl_spark.llm.similarity import _dlit, _vec_lit_sql

    vals = [0.1, -0.5, 1e-30, 1.7976931348623157e308, 3.0000000000000004,
            float("inf"), float("-inf")]
    row = spark.range(1).select(F.expr(_vec_lit_sql(vals)).alias("a")).first()
    assert row["a"] == vals
    nan_row = spark.range(1).select(F.expr(_dlit(float("nan"))).alias("x")).first()
    assert nan_row["x"] != nan_row["x"]


def test_footer_stats_match_spark_aggregate(spark, tmp_path):  # noqa: F811
    from pyspark.sql import functions as F  # noqa: F401

    from turbine_maintenance_etl_spark.io import acid

    df = spark.createDataFrame(
        [(5, "a"), (-3, "b"), (None, None), (99, "zz")], "id long, s string"
    )
    path = str(tmp_path / "t")
    d = acid._write_data_dir(df, path, "create")
    # integer column: footer fast path fires and equals the agg path
    fast = acid._footer_stats(f"{path}/{d}", ("id",))
    assert fast is not None
    slow = None
    orig = acid._footer_stats
    try:
        acid._footer_stats = lambda *a, **k: None
        slow = acid._dir_stats(spark, path, d, ("id",))
    finally:
        acid._footer_stats = orig
    assert fast == slow == {"rows": 4, "cols": {"id": [-3, 99]}}
    # string column present -> the fast path declines (truncation risk)
    assert acid._footer_stats(f"{path}/{d}", ("id", "s")) is None
    # missing column behaves like the agg path (ignored)
    assert acid._footer_stats(f"{path}/{d}", ("nope",)) == {
        "rows": 4, "cols": {},
    }


def test_lazy_barrier_materializes_on_first_action(spark):  # noqa: F811
    from turbine_maintenance_etl_spark.ops.materialize import barrier

    df = spark.range(100).withColumn("flag", F.col("id") % 10 == 0)
    lazy = barrier(df, "t", eager=False)
    # lineage is cut immediately at the plan level (the barrier contract):
    # the frame reads an existing RDD, not the upstream Range
    plan = lazy._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" in plan and "Range" not in plan
    # first action (a filter-count, the CC loop's shape) materializes it;
    # the frame stays fully readable afterwards
    assert lazy.filter("flag").count() == 10
    assert lazy.count() == 100


def test_cc_loop_still_converges_with_lazy_rounds(spark):  # noqa: F811
    from turbine_maintenance_etl_spark.llm.dedup import resolve_duplicate_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)],
        "id_a long, id_b long",
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in resolve_duplicate_clusters(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10,
                   20: 20, 21: 20, 22: 20, 23: 20}
