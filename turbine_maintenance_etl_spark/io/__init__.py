from turbine_maintenance_etl_spark.io.cmapss import (  # noqa: F401
    read_cmapss_text,
    read_rul_truth,
)
from turbine_maintenance_etl_spark.io.sinks import (  # noqa: F401
    write_csv,
    write_partitioned_parquet,
    write_table,
)
from turbine_maintenance_etl_spark.io.acid import (  # noqa: F401
    append_table,
    create_table,
    merge_table,
    overwrite_table,
    read_table,
    vacuum,
)
