from turbine_maintenance_etl_spark.metrics.dashboard import (  # noqa: F401
    critical_share,
    fleet_overview,
    recent_predictions,
    rul_distribution,
    sensor_histogram,
)
