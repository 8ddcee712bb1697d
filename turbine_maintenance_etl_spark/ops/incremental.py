"""Incremental aggregate maintenance: fold new batches into a persisted
aggregate table WITHOUT recomputing history — at 100 TB you cannot
re-scan the full fact table to refresh a rollup, you merge partials.

Only decomposable aggregates participate (count/sum/min/max; avg =
sum/count at read time — same contract as ops/skew.py, shared via
``partial_agg_exprs``). Replay safety comes from a batch ledger stored
INSIDE the state directory under ``_ledger/`` — Spark's parquet reader
ignores underscore-prefixed paths, and keeping ledger and state in one
directory means the single atomic directory rename publishes BOTH
together: a crash before the swap leaves the old state + old ledger, a
crash after leaves the new state + new ledger. There is no window in
which the state reflects a batch the ledger doesn't record, so a retry
can never double-count. Single-writer is assumed (one maintenance job
per rollup — the normal orchestration contract); concurrent writers
would race the rename.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from turbine_maintenance_etl_spark.ops.skew import _MERGES, partial_agg_exprs

_LEDGER = "_ledger"


def _recover(state_path: str) -> None:
    """Heal interrupted swaps. Crash windows of the publish sequence:
    (a) after current->__old but before staging->current: state is
    missing, __old holds the pre-batch state whose ledger does NOT
    record the in-flight batch — restoring it makes the retry re-apply
    the batch exactly once. (b) after staging->current: the new state
    and its ledger are already live; the leftover __old (and any stale
    __staging) is garbage to drop."""
    old = f"{state_path}__old"
    if os.path.exists(old):
        if os.path.exists(state_path):
            shutil.rmtree(old)
        else:
            shutil.move(old, state_path)
    stale = f"{state_path}__staging"
    if os.path.exists(stale):
        shutil.rmtree(stale)


def _read_or_none(spark: SparkSession, path: str) -> DataFrame | None:
    """Read a parquet dir, returning None ONLY for path-not-found.
    A present-but-unreadable state (corrupt footer, permissions) must
    raise — silently treating it as 'no state' would bootstrap a fresh
    aggregate and discard all accumulated history."""
    if not os.path.exists(path):
        return None
    try:
        df = spark.read.parquet(path)
        df.schema  # force analysis so corruption surfaces here
        return df
    except AnalysisException as exc:
        if "PATH_NOT_FOUND" in str(exc):
            return None
        raise


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
    group-cardinality-sized, never fact-sized.

    Durability contract: the no-double-count guarantee rests on
    ``shutil.move`` being an atomic same-filesystem rename. It holds on
    local/POSIX paths where ``state_path`` and its ``__staging``/
    ``__old`` siblings share a device (they always do — same parent
    dir). It does NOT hold on object stores (s3://, gs://, abfs://),
    where "rename" degrades to copy+delete and reopens the torn-publish
    window; deploy there behind a transactional table format (Delta/
    Iceberg commit protocol) instead of this path-rename publish."""
    # Accept file:// by normalizing to the raw POSIX path — the
    # os.path/shutil recovery+publish machinery below operates on raw
    # paths, so an un-stripped URI would silently skip recovery (the
    # exists() checks never match) and then crash in shutil.move.
    if state_path.startswith("file://"):
        state_path = state_path[len("file://") :]
    if "://" in state_path:
        raise ValueError(
            "merge_incremental_agg requires a local-POSIX state_path "
            "(atomic rename publish); object-store URIs need a "
            f"transactional table format: {state_path!r}"
        )
    _recover(state_path)
    state = _read_or_none(spark, state_path)
    ledger = _read_or_none(spark, f"{state_path}/{_LEDGER}")
    applied = (
        {r["batch_id"] for r in ledger.collect()} if ledger is not None else set()
    )
    if batch_id in applied:
        return state  # replay: no-op

    partials = batch.groupBy(*keys).agg(*partial_agg_exprs(aggs))
    if state is not None:
        merge_exprs = [_MERGES[fn](out).alias(out) for out, (fn, _) in aggs.items()]
        merged = state.unionByName(partials).groupBy(*keys).agg(*merge_exprs)
    else:
        merged = partials

    # stage state + updated ledger together, then publish via renames:
    # current -> __old, staging -> current, drop __old. Every crash
    # window is recoverable (see _recover) and none can double-count.
    tmp = f"{state_path}__staging"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    merged.write.parquet(tmp)
    new_ledger = spark.createDataFrame(
        [(b,) for b in sorted(applied | {batch_id})], "batch_id string"
    )
    new_ledger.coalesce(1).write.parquet(f"{tmp}/{_LEDGER}")
    old = f"{state_path}__old"
    if os.path.exists(state_path):
        shutil.move(state_path, old)
    shutil.move(tmp, state_path)
    if os.path.exists(old):
        shutil.rmtree(old)
    return spark.read.parquet(state_path)
