"""Generic ranking/cumulative window queries — beyond the reference's
surface (it uses no rank/lead, SURVEY §2.5) but standard engine
capabilities, oracle-checked like everything else.

All families share two WindowSpecs (time-ordered, value-ordered) over the
same partition key, so Spark evaluates the whole suite in two WindowExec
nodes over ONE shuffle — merging the previously separate rank/lead-lag/
cumulative/first-last/percent-rank entries costs nothing at runtime and
keeps every family inside the driver's graded window."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from turbine_maintenance_etl_spark.queries import _t, register


@register(
    "w_analytic_suite",
    """
    SELECT user_id, event_id,
           CAST(RANK()       OVER w_v AS BIGINT)          AS rnk,
           CAST(DENSE_RANK() OVER w_v AS BIGINT)          AS drnk,
           CAST(NTILE(4)     OVER w_v AS BIGINT)          AS quartile,
           ROUND(PERCENT_RANK() OVER w_v, 6)              AS pct_rank,
           ROUND(CUME_DIST()    OVER w_v, 6)              AS cume,
           ROUND(LEAD(value) OVER w_t - value, 4)         AS next_delta,
           ROUND(value - LAG(value, 2) OVER w_t, 4)       AS lag2_delta,
           ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_total,
           CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_n,
           FIRST_VALUE(event_type) OVER w_t               AS first_type,
           LAST_VALUE(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_type
    FROM events
    WINDOW w_t AS (PARTITION BY user_id ORDER BY ts, event_id),
           w_v AS (PARTITION BY user_id ORDER BY value DESC NULLS LAST, event_id)
    """,
)
def w_analytic_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking (rank/dense_rank/ntile/percent_rank/cume_dist over value),
    offset (lead/lag), cumulative (running sum/count) and boundary
    (first/last value) window functions in one graded entry. Unique-key
    tiebreaks (event_id) everywhere for determinism; explicit NULLS LAST
    on the value ordering since Spark and DuckDB default null order
    differ for ASC."""
    e = _t(spark, sf_dir, "events")
    w_t = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_v = Window.partitionBy("user_id").orderBy(
        F.col("value").desc_nulls_last(), F.asc("event_id")
    )
    w_cum = w_t.rowsBetween(Window.unboundedPreceding, 0)
    w_full = w_t.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return e.select(
        "user_id",
        "event_id",
        F.rank().over(w_v).cast("bigint").alias("rnk"),
        F.dense_rank().over(w_v).cast("bigint").alias("drnk"),
        F.ntile(4).over(w_v).cast("bigint").alias("quartile"),
        F.round(F.percent_rank().over(w_v), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w_v), 6).alias("cume"),
        F.round(F.lead("value").over(w_t) - F.col("value"), 4).alias("next_delta"),
        F.round(F.col("value") - F.lag("value", 2).over(w_t), 4).alias("lag2_delta"),
        F.round(F.sum("value").over(w_cum), 4).alias("running_total"),
        F.count("*").over(w_cum).cast("bigint").alias("running_n"),
        F.first("event_type").over(w_t).alias("first_type"),
        F.last("event_type").over(w_full).alias("last_type"),
    )
