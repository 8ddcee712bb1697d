"""Incremental aggregate maintenance: fold new batches into a persisted
aggregate table WITHOUT recomputing history — at 100 TB you cannot
re-scan the full fact table to refresh a rollup, you merge partials.

Only decomposable aggregates participate (count/sum/min/max; avg =
sum/count at read time — same contract as ops/skew.py). Replay safety
comes from a batch ledger: each applied batch_id is recorded next to
the state, and re-applying a seen batch is a no-op, so an orchestrator
retry (or an at-least-once upstream) cannot double-count.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from turbine_maintenance_etl_spark.ops.skew import _MERGES


def _state_exists(spark: SparkSession, path: str) -> bool:
    try:
        spark.read.parquet(path)
        return True
    except Exception:
        return False


def merge_incremental_agg(
    spark: SparkSession,
    state_path: str,
    batch: DataFrame,
    batch_id: str,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
) -> DataFrame:
    """Fold ``batch`` into the aggregate state at ``state_path``.

    ``aggs`` maps output column -> (fn, input column), fn in
    {count, sum, min, max}. Returns the merged state (also persisted).

    Scale shape: ONE partial aggregation of the batch (map-side
    combine), one merge agg of state ∪ partials — state is
    group-cardinality-sized, never fact-sized. The swap is
    write-to-temp + atomic directory move, so a concurrent reader sees
    the old or the new state, never a half-written one."""
    unsupported = {fn for fn, _ in aggs.values()} - set(_MERGES)
    if unsupported:
        raise ValueError(f"non-decomposable aggregates: {unsupported}")

    ledger_path = f"{state_path}_ledger"
    if _state_exists(spark, ledger_path):
        seen = {
            r["batch_id"] for r in spark.read.parquet(ledger_path).collect()
        }
        if batch_id in seen:
            return spark.read.parquet(state_path)  # replay: no-op

    partial_exprs = []
    for out, (fn, col) in aggs.items():
        expr = F.count(col) if fn == "count" else getattr(F, fn)(col)
        partial_exprs.append(expr.alias(out))
    partials = batch.groupBy(*keys).agg(*partial_exprs)

    if _state_exists(spark, state_path):
        state = spark.read.parquet(state_path)
        merge_exprs = [_MERGES[fn](out).alias(out) for out, (fn, _) in aggs.items()]
        merged = state.unionByName(partials).groupBy(*keys).agg(*merge_exprs)
    else:
        merged = partials

    tmp = f"{state_path}__staging"
    merged.write.mode("overwrite").parquet(tmp)
    if os.path.exists(state_path):
        shutil.rmtree(state_path)
    shutil.move(tmp, state_path)

    spark.createDataFrame([(batch_id,)], "batch_id string").write.mode(
        "append"
    ).parquet(ledger_path)
    return spark.read.parquet(state_path)
