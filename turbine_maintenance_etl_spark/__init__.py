"""PySpark-native analytics engine with the query & data-processing
capabilities of the reference predictive-maintenance ETL pipeline
(SW-oasen/turbine-maintenance-etl), rebuilt Spark-first.

Modules
-------
- ``session``   : tuned SparkSession factory (local + cluster friendly).
- ``io``        : sources/sinks (CMAPSS whitespace text, CSV, parquet tables).
- ``schema``    : fixed schemas + dynamic sensor-set reflection.
- ``features``  : the window-function feature engine (RUL, rolling means,
                  lag diffs, per-group z-scores) — single WindowSpec design.
- ``ops``       : generic relational operator library (SURVEY.md §2).
- ``metrics``   : dashboard/DAX-measure serving queries.
- ``ml``        : MLlib RUL regression stage + prediction store.
- ``llm``       : 100 TB-scale LLM-data-pipeline operators (dedup,
                  similarity search, text analysis, multimodal columns).
- ``streaming`` : Structured Streaming incremental ingest.
"""

__version__ = "0.1.0"

from turbine_maintenance_etl_spark.session import get_spark  # noqa: F401
