from turbine_maintenance_etl_spark.ml.pipeline import (  # noqa: F401
    MODEL_BUILDERS,
    evaluate,
    make_pipeline,
    prediction_error_summary,
    predictions_table,
    train_and_score,
)
