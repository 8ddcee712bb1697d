"""Incremental aggregate maintenance: fold new batches into a persisted
aggregate table WITHOUT recomputing history — at 100 TB you cannot
re-scan the full fact table to refresh a rollup, you merge partials.

Only decomposable aggregates participate (count/sum/min/max, plus
approx_distinct via mergeable HLL sketches; avg = sum/count at read
time — same contract as ops/skew.py, shared via
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

from turbine_maintenance_etl_spark.ops.skew import _MERGES, _PARTIALS, partial_agg_exprs

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
    {count, sum, min, max, approx_distinct}. approx_distinct state
    columns hold the mergeable binary HLL sketch — read with
    ``F.hll_sketch_estimate``. Returns the merged state (persisted).

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
    merged = _merge_into_state(state, partials, keys, aggs)
    return _publish(spark, state_path, merged, applied | {batch_id})


def _merge_into_state(
    state: DataFrame | None,
    partials: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
) -> DataFrame:
    if state is None:
        return partials
    merge_exprs = [_MERGES[fn](out).alias(out) for out, (fn, _) in aggs.items()]
    if not merge_exprs:
        # splice-only refresh: both sides are bare key frames; the merge
        # is their distinct union (agg() with zero exprs asserts)
        return state.unionByName(partials).distinct()
    return state.unionByName(partials).groupBy(*keys).agg(*merge_exprs)


def _publish(
    spark: SparkSession, state_path: str, merged: DataFrame, batch_ids: set[str]
) -> DataFrame:
    # stage state + updated ledger together, then publish via renames:
    # current -> __old, staging -> current, drop __old. Every crash
    # window is recoverable (see _recover) and none can double-count.
    tmp = f"{state_path}__staging"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    merged.write.parquet(tmp)
    new_ledger = spark.createDataFrame(
        [(b,) for b in sorted(batch_ids)], "batch_id string"
    )
    new_ledger.coalesce(1).write.parquet(f"{tmp}/{_LEDGER}")
    old = f"{state_path}__old"
    if os.path.exists(state_path):
        shutil.move(state_path, old)
    shutil.move(tmp, state_path)
    if os.path.exists(old):
        shutil.rmtree(old)
    return spark.read.parquet(state_path)


def refresh_agg_from_cdf(
    spark: SparkSession,
    table_path: str,
    state_path: str,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    on_delete_minmax: str = "error",
) -> DataFrame:
    """Maintain a grouped aggregate over a TRANSACTIONAL table
    (io/acid.py) directly from its commit log — the lakehouse last
    mile: downstream rollups follow the table without ever re-scanning
    it. Each call reads ``acid.table_changes`` for ONLY the commit
    window since the last refresh (the applied cursor lives in the
    state's batch ledger as ``cdf-v<version>`` entries), folds the
    changes into the state, and publishes through the same
    atomic-rename + ledger protocol as ``merge_incremental_agg`` — so
    a crashed or replayed refresh can never double-apply a window.

    Delete handling: an acid MERGE surfaces an update as
    delete-of-old + insert-of-new, so ``count``/``sum`` fold deletes as
    NEGATIVE contributions and the pair nets to the update delta.
    ``min``/``max``/``approx_distinct`` are not delete-invertible (a
    retracted minimum — or an element folded into an HLL sketch —
    cannot be removed without history); over a CDF window containing
    deletes, ``on_delete_minmax`` picks the policy for all three:

    - ``"error"`` (default): raise — the caller decides when a full
      recompute is affordable.
    - ``"recompute"``: count/sum still fold incrementally from the
      window; ONLY the min/max/sketch columns are recomputed per-group
      from the current snapshot and spliced into the merged state.
      Cost is one column-pruned scan of those input columns — paid
      only on delete windows, never on the append-dominated path.

    ``approx_distinct`` state columns hold the BINARY Datasketches HLL
    sketch (read with ``F.hll_sketch_estimate``): ~1 KB per group
    regardless of cardinality, merged losslessly across insert windows
    — the 100 TB distinct-count primitive.

    Scale shape: the CDF is symmetric-difference-pruned (an append of
    1 GB to a 100 TB table diffs 1 GB), the fold is one partial agg of
    the changed rows, and the merge touches only the
    group-cardinality-sized state.

    Vacuumed cursor: if ``vacuum`` reclaimed the manifest of the last
    applied version while the rollup lagged, the incremental window is
    gone — the refresh then rebuilds the whole rollup from the current
    snapshot (replacing the state, which in CDF-only usage reflects
    exactly the table's contents) instead of crashing unrecoverably; a
    ledger that also holds manual ``merge_incremental_agg`` batches
    cannot be reconciled that way and raises."""
    from turbine_maintenance_etl_spark.io import acid

    if state_path.startswith("file://"):
        state_path = state_path[len("file://") :]
    if "://" in state_path:
        raise ValueError(
            f"refresh_agg_from_cdf requires a local-POSIX state_path: {state_path!r}"
        )
    if on_delete_minmax not in ("error", "recompute"):
        raise ValueError(
            f"on_delete_minmax must be 'error' or 'recompute', got {on_delete_minmax!r}"
        )
    fns = {fn for fn, _ in aggs.values()}
    unsupported = fns - set(_MERGES)
    if unsupported:
        raise ValueError(f"non-decomposable aggregates: {unsupported}")
    _recover(state_path)
    state = _read_or_none(spark, state_path)
    ledger = _read_or_none(spark, f"{state_path}/{_LEDGER}")
    applied = (
        {r["batch_id"] for r in ledger.collect()} if ledger is not None else set()
    )
    done = max(
        (int(b.rsplit("v", 1)[1]) for b in applied if b.startswith("cdf-v")),
        default=0,
    )
    latest = acid.latest_version(table_path)
    if latest is None or latest <= done:
        return state  # nothing committed since the last refresh

    insert_only = False  # statically true for snapshot-as-inserts windows
    if done == 0:
        if state is not None:
            # a state with no cdf cursor was built some other way
            # (merge_incremental_agg batches share this ledger);
            # folding the full snapshot on top would double-count
            # every row the state already reflects
            raise ValueError(
                f"state at {state_path} exists but has no cdf-v* cursor — "
                "it was not built by refresh_agg_from_cdf; use a fresh "
                "state_path (or delete the state to re-bootstrap)"
            )
        # bootstrap: the whole first-seen snapshot is one insert window
        ch = _snapshot_as_inserts(spark, table_path, latest)
        insert_only = True
    else:
        try:
            ch = acid.table_changes(spark, table_path, done, latest)
        except FileNotFoundError:
            # vacuum reclaimed the cursor version's manifest while the
            # rollup lagged — the incremental window is gone. The
            # snapshot is still ground truth: rebuild the rollup from
            # it (REPLACING the state, which in pure-CDF usage only
            # ever reflected table contents) instead of crashing
            # unrecoverably. Mixed ledgers (manual batch-* entries)
            # cannot be reconciled this way — refuse those.
            manual = [b for b in applied if not b.startswith("cdf-v")]
            if manual:
                raise ValueError(
                    f"cursor version v{done} was vacuumed and the ledger "
                    f"holds non-CDF batches {manual} — cannot rebuild from "
                    "the snapshot without dropping their contributions; "
                    "recompute this rollup manually"
                )
            state = None
            ch = _snapshot_as_inserts(spark, table_path, latest)
            insert_only = True

    minmax_aggs = {
        o: s for o, s in aggs.items()
        if s[0] in ("min", "max", "approx_distinct")
    }
    if minmax_aggs and not insert_only:
        # the delete probe AND the partials aggregation both read the
        # change window; un-materialized, the CDF diff (exceptAll over
        # the changed dirs) would execute twice — the multi-consumer
        # case the barrier rule says to materialize. Window-sized, not
        # table-sized. (Snapshot-as-inserts windows skip both the
        # barrier and the probe: a table-sized scan just to find zero
        # deletes we already know aren't there.)
        from turbine_maintenance_etl_spark.ops.materialize import barrier

        ch = barrier(ch, "cdf-window")
    splice_minmax = bool(
        minmax_aggs
        and not insert_only
        and ch.filter(F.col("_change_type") == "delete").take(1)
    )
    if splice_minmax and on_delete_minmax == "error":
        raise ValueError(
            "min/max cannot be incrementally maintained over a CDF window "
            "containing deletes (not delete-invertible); pass "
            "on_delete_minmax='recompute' to splice fresh per-group min/max "
            "from the snapshot, or recompute the whole rollup yourself"
        )
    sign = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(F.lit(-1))
    # on a delete window the min/max/sketch partials would be discarded
    # in favor of the snapshot splice below — don't aggregate them at
    # all (for approx_distinct that's a full HLL sketch pass saved)
    fold_aggs = {
        o: s for o, s in aggs.items()
        if not (splice_minmax and o in minmax_aggs)
    }
    exprs = []
    for out, (fn, col) in fold_aggs.items():
        if fn == "count":
            # ('count', '*') counts ROWS — the spec partial_agg_exprs /
            # merge_incremental_agg already accept; F.col('*').isNotNull()
            # is an AnalysisException, not a row count (r10 review)
            per_row = (
                sign
                if col == "*"
                else F.when(F.col(col).isNotNull(), sign).otherwise(F.lit(0))
            )
            exprs.append(F.sum(per_row).alias(out))
        elif fn == "sum":
            exprs.append(F.sum(F.col(col) * sign).alias(out))
        else:  # min/max/approx_distinct on an insert-only window
            exprs.append(_PARTIALS[fn](col).alias(out))
    if exprs:
        partials = ch.groupBy(*keys).agg(*exprs)
    else:
        # every agg is a spliced min/max (delete window, recompute
        # policy): the fold's only contribution is the GROUP UNIVERSE
        # the window touched — groupBy().agg() with zero exprs is a
        # pyspark assertion error, not an empty aggregate (r10 review)
        partials = ch.select(*keys).distinct()
    state_for_merge = (
        state.drop(*minmax_aggs) if splice_minmax and state is not None else state
    )
    merged = _merge_into_state(state_for_merge, partials, keys, fold_aggs)
    if splice_minmax:
        # count/sum folded incrementally above; the min/max columns are
        # not delete-invertible — splice a fresh per-group aggregate
        # over the CURRENT snapshot (column-pruned scan of just the
        # min/max inputs). A group that vanished from the snapshot
        # keeps its folded count/sum row with NULL min/max (the left
        # join finds no match).
        fresh = (
            acid.read_table(spark, table_path, version=latest, merge_schema=True)
            .groupBy(*keys)
            .agg(*[
                _PARTIALS[fn](col).alias(out)
                for out, (fn, col) in minmax_aggs.items()
            ])
        )
        merged = merged.join(fresh, list(keys), "left")
    return _publish(spark, state_path, merged, applied | {f"cdf-v{latest}"})


def _snapshot_as_inserts(spark, table_path: str, version: int) -> DataFrame:
    """Full snapshot labeled as one insert window — the bootstrap /
    vacuumed-cursor rebuild input. merge_schema=True: evolved tables
    must surface every column, the same contract table_changes and
    merge_table already honor (schema inference from one arbitrary
    part-file would drop late-added columns nondeterministically)."""
    from turbine_maintenance_etl_spark.io import acid

    return acid.read_table(
        spark, table_path, version=version, merge_schema=True
    ).withColumn("_change_type", F.lit("insert"))
