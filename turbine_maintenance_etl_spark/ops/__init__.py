from turbine_maintenance_etl_spark.ops.grouped_map import (  # noqa: F401
    grouped_map_zscore,
    trajectory_apply,
)
from turbine_maintenance_etl_spark.ops.skew import (  # noqa: F401
    salted_groupby_agg,
)
