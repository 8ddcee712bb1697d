from turbine_maintenance_etl_spark.io.cmapss import (  # noqa: F401
    read_cmapss_text,
    read_rul_truth,
)
from turbine_maintenance_etl_spark.io.sinks import (  # noqa: F401
    write_csv,
    write_partitioned_parquet,
    write_table,
)
