from turbine_maintenance_etl_spark.streaming.ingest import (  # noqa: F401
    stream_cmapss_ingest,
    stream_tumbling_event_counts,
)
