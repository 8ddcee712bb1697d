"""ML quality bands on the REAL FD001 dataset + model persistence
round-trip (UD4) + canonical predictions-table schema parity.

Published reference metrics (README.md:218-221, mirrored in BASELINE.md)
are validation RMSE 23.45 (LR) / 19.87 (RF-grid) / 18.23 (XGB-grid) on
"all-dataset engineered features" — but the reference repo only ships
train_FD001.txt (train_FD002/3/4 are absent), so the exact published
training corpus is NOT reproducible. What this test pins on FD001-only:

- R² bands at-or-above the published ballpark (R² is scale-invariant so
  it transfers across corpora better than RMSE): published 0.756 /
  0.823 / 0.847; FD001-only MLlib runs land ~0.715 / 0.838 / 0.880.
- RMSE ceilings (loose: FD001-only RMSE runs higher than the multi-
  dataset published numbers): 40 / 32 / 28.
- The published quality ORDERING: gbt < random_forest < linear
  (XGBoost-stand-in best, linear baseline worst).

Measured FD001-only numbers are recorded in README.md §ML parity."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

RAW = "/root/reference/data/raw"

needs_fd001 = pytest.mark.skipif(
    not os.path.isfile(f"{RAW}/train_FD001.txt"), reason="reference data absent"
)


@pytest.fixture(scope="module")
def fd001_features(spark):
    from turbine_maintenance_etl_spark.features.engine import (
        build_features,
        constant_columns,
    )
    from turbine_maintenance_etl_spark.io.cmapss import read_cmapss_text

    raw = read_cmapss_text(spark, f"{RAW}/train_FD001.txt", dataset="FD001")
    sensors = [c for c in raw.columns if c.startswith("sensor")]
    kept = [c for c in sensors if c not in set(constant_columns(raw, sensors))]
    return build_features(raw, sensors=kept).cache()


@needs_fd001
def test_fd001_model_quality_bands(spark, fd001_features):
    from turbine_maintenance_etl_spark.ml.pipeline import train_and_score

    bands = {  # model -> (min r2, max rmse)
        "linear_regression": (0.65, 40.0),
        "random_forest": (0.78, 32.0),
        "gbt": (0.82, 28.0),
    }
    rmse = {}
    for model_name, (min_r2, max_rmse) in bands.items():
        _, _, metrics = train_and_score(fd001_features, model_name=model_name)
        assert metrics["r2"] >= min_r2, f"{model_name} r2 {metrics['r2']:.3f}"
        assert metrics["rmse"] <= max_rmse, f"{model_name} rmse {metrics['rmse']:.2f}"
        rmse[model_name] = metrics["rmse"]
    # published ordering: boosted trees < random forest < linear baseline
    assert rmse["gbt"] < rmse["random_forest"] < rmse["linear_regression"]


@needs_fd001
def test_model_persistence_round_trip(spark, fd001_features, tmp_path):
    """UD4 (reference scripts/ml_pipeline.py:600-630 joblib save/load):
    PipelineModel.save -> load -> transform must reproduce the original
    model's predictions exactly."""
    from pyspark.ml import PipelineModel

    from turbine_maintenance_etl_spark.ml.pipeline import train_and_score

    sample = fd001_features.filter(F.col("unit_nr") <= 20)
    model, _, _ = train_and_score(sample, model_name="linear_regression")
    path = str(tmp_path / "lr_model")
    model.save(path)
    loaded = PipelineModel.load(path)

    probe = sample.limit(200)
    orig = model.transform(probe).select("unit_nr", "time_cycles", "prediction")
    redo = loaded.transform(probe).select("unit_nr", "time_cycles", "prediction")
    diffs = (
        orig.alias("a")
        .join(redo.alias("b"), ["unit_nr", "time_cycles"])
        .filter(F.abs(F.col("a.prediction") - F.col("b.prediction")) > 1e-9)
        .count()
    )
    assert diffs == 0
    assert redo.count() == probe.count()


def test_predictions_table_canonical_schema(spark):
    """Full canonical GPU-writer column set (ml_predictions DDL,
    scripts/ml_pipeline_gpu.py:722-737) incl. features_used as
    array<string> (SURVEY §1.3) and created_at."""
    from turbine_maintenance_etl_spark.ml.pipeline import predictions_table

    scored = spark.createDataFrame(
        [(1, 10, "FD001", 42.0, 40.0)],
        "unit_nr int, time_cycles int, dataset string, prediction double, rul double",
    )
    out = predictions_table(scored, "gbt", [f"f{i}" for i in range(15)])
    expected = [
        "id", "unit_nr", "cycle", "dataset", "model_name", "predicted_rul",
        "actual_rul", "prediction_date", "model_version", "confidence_score",
        "features_used", "created_at",
    ]
    assert out.columns == expected
    schema = {f.name: f.dataType for f in out.schema.fields}
    assert schema["features_used"] == T.ArrayType(T.StringType(), False)
    assert isinstance(schema["prediction_date"], T.TimestampType)
    assert isinstance(schema["created_at"], T.TimestampType)
    assert isinstance(schema["confidence_score"], T.DoubleType)
    row = out.collect()[0]
    # the [:10] truncation mirrors the reference writer (gpu:1017)
    assert row["features_used"] == [f"f{i}" for i in range(10)]
    assert row["predicted_rul"] == 42.0 and row["actual_rul"] == 40.0


@needs_fd001
def test_fd001_mlp_fourth_model_band(spark, fd001_features):
    """4th-model analog (reference PyTorch RULNet,
    scripts/ml_pipeline_gpu.py:509-599, published multi-dataset RMSE
    17.91): the numpy-MLP twin on FD001-only data must land in the same
    FD001-adjusted band as the tree models (published numbers are not
    reproducible — train_FD002/3/4 are absent from the reference repo)
    and beat the linear baseline."""
    from turbine_maintenance_etl_spark.ml.mlp import train_and_score_mlp
    from turbine_maintenance_etl_spark.ml.pipeline import train_and_score

    _, _, mlp_metrics = train_and_score_mlp(fd001_features)
    assert mlp_metrics["r2"] >= 0.75, mlp_metrics
    assert mlp_metrics["rmse"] <= 34.0, mlp_metrics
    _, _, lin_metrics = train_and_score(fd001_features, model_name="linear_regression")
    assert mlp_metrics["rmse"] < lin_metrics["rmse"]


@needs_fd001
def test_mlp_distributed_scoring_matches_driver_forward(spark, fd001_features):
    """transform()'s Arrow-batched scoring must equal the driver-side
    forward pass exactly (same broadcast weights), and refits must be
    deterministic."""
    import numpy as np

    from turbine_maintenance_etl_spark.ml.mlp import NumpyMLPRegressor
    from turbine_maintenance_etl_spark.ml.pipeline import feature_columns

    sample = fd001_features.filter(F.col("unit_nr") <= 10).cache()
    feats = feature_columns(sample)
    m1 = NumpyMLPRegressor(epochs=5).fit(sample, feats)
    m2 = NumpyMLPRegressor(epochs=5).fit(sample, feats)
    for w1, w2 in zip(m1.weights_, m2.weights_):
        assert np.array_equal(w1, w2)  # deterministic refit

    probe = sample.limit(100)
    scored = m1.transform(probe).select(*feats, "prediction").collect()
    X = np.array([[r[c] for c in feats] for r in scored], dtype=np.float64)
    want = m1._forward(X)
    got = np.array([r["prediction"] for r in scored])
    assert np.allclose(got, want, atol=1e-9)
