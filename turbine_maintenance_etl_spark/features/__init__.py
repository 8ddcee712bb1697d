from turbine_maintenance_etl_spark.features.engine import (  # noqa: F401
    add_rul,
    build_features,
    constant_columns,
    units_summary,
    variable_sensor_intersection,
)
