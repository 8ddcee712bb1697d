"""Regressions for the round-10 self-review findings on the features /
ml / sampling / incremental layer: NaN weights through weighted
sampling, the splice-only and count(*) paths of the CDF-driven rollup,
dropna parity in constant-column detection, duplicate-id determinism in
exact sampling, and loud failures for reserved-column collisions and
emptied training inputs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_weighted_sample_excludes_nan_weights(spark):
    """A NaN weight (e.g. a quality score computed as 0/0) must never be
    selected: unguarded, key = log(u)/NaN = NaN sorts FIRST under desc
    in the top-k branch and LAST in the rank-cut branch — garbage sample
    AND a branch-equivalence violation."""
    from turbine_maintenance_etl_spark.ops.sampling import weighted_sample

    rows = [(i, float(i + 1)) for i in range(20)] + [
        (100, float("nan")),
        (101, 0.0),
        (102, -1.0),
    ]
    df = spark.createDataFrame(rows, "doc_id int, w double")
    small = {r.doc_id for r in weighted_sample(df, "w", 5, "doc_id").collect()}
    assert not small & {100, 101, 102}
    # rank-cut branch must select the SAME set (documented equivalence)
    large = {
        r.doc_id
        for r in weighted_sample(
            df, "w", 5, "doc_id", driver_merge_threshold=0
        ).collect()
    }
    assert small == large


def test_weighted_sample_duplicate_ids_deterministic(spark):
    """Duplicate ids share the derived uniform; with equal weights the
    (key, id) order fully ties, and which twin crossed the cut was
    partition-order-dependent before the content-hash tiebreak."""
    from turbine_maintenance_etl_spark.ops.sampling import weighted_sample

    rows = [(i % 4, 1.0, f"payload-{i}") for i in range(16)]
    df = spark.createDataFrame(rows, "doc_id int, w double, payload string")
    picks = [
        sorted(
            (r.doc_id, r.payload)
            for r in weighted_sample(df.repartition(p), "w", 3, "doc_id").collect()
        )
        for p in (1, 7, 32)
    ]
    assert picks[0] == picks[1] == picks[2]


def test_stratified_exact_sample_duplicate_ids_deterministic(spark):
    from turbine_maintenance_etl_spark.ops.sampling import stratified_exact_sample

    rows = [("s", i % 3, f"payload-{i}") for i in range(12)]
    df = spark.createDataFrame(rows, "stratum string, doc_id int, payload string")
    picks = [
        sorted(
            (r.doc_id, r.payload)
            for r in stratified_exact_sample(
                df.repartition(p), ["stratum"], 4, "doc_id"
            ).collect()
        )
        for p in (1, 5, 32)
    ]
    assert picks[0] == picks[1] == picks[2]


def test_refresh_agg_minmax_only_recompute_with_deletes(spark, tmp_path):
    """on_delete_minmax='recompute' with EVERY agg a min/max: the fold
    set is empty and groupBy().agg() used to die in a pyspark assertion
    — the exact configuration the recompute policy exists for."""
    from turbine_maintenance_etl_spark.io import acid
    from turbine_maintenance_etl_spark.ops.incremental import refresh_agg_from_cdf

    tbl = str(tmp_path / "tbl")
    state = str(tmp_path / "state")
    aggs = {"lo": ("min", "v"), "hi": ("max", "v")}
    acid.create_table(
        spark,
        spark.createDataFrame(
            [(1, "a", 10.0, 1), (2, "a", 20.0, 1), (3, "b", 5.0, 1)],
            "id long, k string, v double, ver long",
        ),
        tbl,
    )
    got = {
        r.k: (r.lo, r.hi)
        for r in refresh_agg_from_cdf(
            spark, tbl, state, ["k"], aggs, on_delete_minmax="recompute"
        ).collect()
    }
    assert got == {"a": (10.0, 20.0), "b": (5.0, 5.0)}
    # merge = delete-of-old + insert-of-new: a delete window
    acid.merge_table(
        spark,
        spark.createDataFrame(
            [(1, "a", 3.0, 2)], "id long, k string, v double, ver long"
        ),
        tbl,
        keys=("id",),
        order_col="ver",
    )
    got = {
        r.k: (r.lo, r.hi)
        for r in refresh_agg_from_cdf(
            spark, tbl, state, ["k"], aggs, on_delete_minmax="recompute"
        ).collect()
    }
    assert got == {"a": (3.0, 20.0), "b": (5.0, 5.0)}


def test_refresh_agg_count_star_spec(spark, tmp_path):
    """('count', '*') is valid through partial_agg_exprs and
    merge_incremental_agg; the CDF fold used to rewrite it as
    F.col('*').isNotNull() — an AnalysisException on the first window."""
    from turbine_maintenance_etl_spark.io import acid
    from turbine_maintenance_etl_spark.ops.incremental import refresh_agg_from_cdf

    tbl = str(tmp_path / "tbl")
    state = str(tmp_path / "state")
    aggs = {"n_rows": ("count", "*")}
    acid.create_table(
        spark,
        spark.createDataFrame(
            [(1, "a", None), (2, "a", 5.0), (3, "b", 1.0)],
            "id long, k string, v double",
        ),
        tbl,
    )
    got = {
        r.k: r.n_rows
        for r in refresh_agg_from_cdf(spark, tbl, state, ["k"], aggs).collect()
    }
    # count(*) counts the NULL-v row too
    assert got == {"a": 2, "b": 1}
    # a merge window folds the delete+insert pair to a net zero
    acid.merge_table(
        spark,
        spark.createDataFrame([(2, "a", 9.0)], "id long, k string, v double"),
        tbl,
        keys=("id",),
        order_col="v",
    )
    got = {
        r.k: r.n_rows
        for r in refresh_agg_from_cdf(spark, tbl, state, ["k"], aggs).collect()
    }
    assert got == {"a": 2, "b": 1}


def test_constant_columns_nan_dropna_parity(spark):
    """pandas nunique(dropna=True) drops NaN: {5.0, NaN} is ONE distinct
    value and the reference drops the sensor. Spark's min/max rank NaN
    greatest, so the unguarded check read it as variable — silently
    diverging the feature schema between engines."""
    from turbine_maintenance_etl_spark.features.engine import constant_columns

    df = spark.createDataFrame(
        [(5.0, float("nan"), 1.0, None), (5.0, 5.0, 2.0, float("nan"))],
        "all_const double, one_plus_nan double, variable double, nan_or_null double",
    )
    got = set(
        constant_columns(df, ["all_const", "one_plus_nan", "variable", "nan_or_null"])
    )
    assert got == {"all_const", "one_plus_nan", "nan_or_null"}


def test_frozen_linear_scores_reserved_collision_raises(spark):
    from turbine_maintenance_etl_spark.ml.pipeline import frozen_linear_scores

    df = spark.createDataFrame([(1.0, 2.0)], "s1 double, _imp_s1 double")
    with pytest.raises(ValueError, match="reserved scoring column"):
        frozen_linear_scores(df, ["s1"], [1.0], 0.0)
    df2 = spark.createDataFrame([(1.0, 2.0)], "s1 double, prediction double")
    with pytest.raises(ValueError, match="reserved scoring column"):
        frozen_linear_scores(df2, ["s1"], [1.0], 0.0)


def test_mlp_fit_empty_after_dropna_raises(spark):
    from turbine_maintenance_etl_spark.ml.mlp import NumpyMLPRegressor

    df = spark.createDataFrame(
        [(1.0, None, 10.0), (2.0, None, 20.0)], "s1 double, s2 double, rul double"
    )
    with pytest.raises(ValueError, match="no complete training rows"):
        NumpyMLPRegressor(hidden=(4,), epochs=1).fit(df, ["s1", "s2"], "rul")


def test_mlp_transform_reuses_one_broadcast(spark):
    from turbine_maintenance_etl_spark.ml.mlp import NumpyMLPRegressor

    df = spark.createDataFrame(
        [(float(i), float(i * 2), float(i * 3)) for i in range(30)],
        "s1 double, s2 double, rul double",
    )
    m = NumpyMLPRegressor(hidden=(4,), epochs=2).fit(df, ["s1", "s2"], "rul")
    p1 = m.transform(df)
    bc1 = m._bc
    p2 = m.transform(df)
    assert m._bc is bc1, "transform() re-broadcast the weights per call"
    assert p1.count() == p2.count() == 30
