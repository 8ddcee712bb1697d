from turbine_maintenance_etl_spark.schema.cmapss import (  # noqa: F401
    BASE_COLS,
    CMAPSS_COLS,
    SENSOR_COLS,
    SENSOR_COUNT,
    SETTING_COLS,
    cmapss_struct,
    feature_columns_for,
    sensor_columns,
)
