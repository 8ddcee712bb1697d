"""Structured Streaming ingestion (SURVEY.md §2.9 — parity-optional in
the reference, first-class here).

The reference's 'incremental ingestion' is an orchestrated re-run of the
batch ETL per new dataset file (n8n/Prefect DAGs). The Spark-native
equivalent is a file-source stream with an ``availableNow`` trigger:
each micro-batch picks up newly landed files exactly once (checkpointed)
and runs the SAME feature transform via ``foreachBatch`` — identical
code batch and streaming, exactly-once sink semantics.

Scale: file-source listing is incremental (maxFilesPerTrigger bounds a
batch); the feature transform inherits the batch engine's single-shuffle
plan per micro-batch. For unbounded event streams the watermarked
tumbling-window aggregation below bounds state.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from turbine_maintenance_etl_spark.ops.materialize import barrier
from turbine_maintenance_etl_spark.schema.cmapss import CMAPSS_COLS, _INT_COLS


def _parse_cmapss_lines(raw: DataFrame) -> DataFrame:
    """Same whitespace-text parse as the batch source (io.cmapss),
    expressed over a streaming text relation."""
    arr = F.split(F.trim(F.col("value")), r"\s+")
    cols = []
    for i, name in enumerate(CMAPSS_COLS):
        # same coerce-to-NULL recipe as io.cmapss: double try_cast (holds
        # under ANSI-on), then try_cast-truncate for int columns — a
        # plain cast diverged from the batch parser (r10 review): under
        # ANSI a NaN/Infinity/overflow token CRASHED the micro-batch,
        # and without ANSI it silently emitted 0/2147483647 where the
        # batch source yields NULL
        num = F.try_element_at(arr, F.lit(i + 1)).try_cast("double")
        if name in _INT_COLS:
            num = num.try_cast("int")
        cols.append(num.alias(name))
    return raw.where(F.trim(F.col("value")) != "").select(*cols)


def stream_cmapss_ingest(
    spark: SparkSession,
    input_dir: str,
    output_path: str,
    checkpoint_path: str,
    sensors: list[str],
    windows: tuple[int, ...] = (5, 20),
    dataset: str = "STREAM",
    timeout_s: int = 600,
) -> None:
    """Incrementally ingest CMAPSS text files landing in ``input_dir``:
    parse → feature engine → write to partitioned parquet, exactly once
    per file, then return (availableNow drains what exists and stops).

    Exactly-once is real, not just checkpointed-source: foreachBatch is
    at-least-once (a batch that fails between sink write and checkpoint
    commit is REPLAYED), so a blind append would duplicate replayed
    rows. Each batch instead dynamically overwrites its own
    ``(dataset, _epoch=epoch_id)`` partitions — a replay rewrites the
    same partition instead of appending, making the sink idempotent.
    The ``_epoch`` partition column is part of the output layout (and
    doubles as batch provenance); compact_parquet can fold it away."""
    from turbine_maintenance_etl_spark.features.engine import build_features

    raw = spark.readStream.format("text").load(input_dir)
    parsed = _parse_cmapss_lines(raw).withColumn("dataset", F.lit(dataset))

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        feats = build_features(batch_df, sensors=sensors, windows=windows)
        (
            feats.withColumn("_epoch", F.lit(epoch_id))
            .write.mode("overwrite")
            # per-write conf: only the partitions present in this batch
            # are replaced, whatever the session-wide overwrite mode
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("dataset", "_epoch")
            .parquet(output_path)
        )

    q = (
        parsed.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    # bounded drain like every other availableNow driver here: an
    # untimed awaitTermination hangs the caller forever if the drain
    # wedges (r10 review)
    _await_drained(q, timeout_s)


def stream_tumbling_event_counts(
    spark: SparkSession,
    events: DataFrame,
    window_duration: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked tumbling-window aggregation over an event stream —
    the streaming twin of the batch ``events_tumbling_window`` query.
    ``events`` must be a streaming DataFrame with (ts, event_type,
    value). Late rows beyond the watermark are dropped; state is bounded
    by watermark horizon x window count."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_duration).alias("win"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(
            F.unix_micros(F.col("win.start")).alias("win_start_us"),
            "event_type",
            "n",
            "total_value",
        )
    )


def stream_stateful_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful streaming operator via ``applyInPandasWithState``
    (the escape hatch for semantics windowed aggs can't express):
    per-user RUNNING totals maintained across micro-batches — each batch
    emits every touched user's lifetime event count / value sum so far.

    State is one tiny tuple per user key, partitioned by user_id across
    executors (state store is per-shuffle-partition, RocksDB-backed on a
    real cluster), so state size is O(distinct users), independent of
    stream length. ``events`` must be a streaming DataFrame with
    (user_id, value)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdf_iter, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdf_iter:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 4)]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id bigint, n_events bigint, total_value double",
        stateStructType="n bigint, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_dedup_events(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming exact-dedup: drop duplicate events across micro-batches
    using ``dropDuplicatesWithinWatermark`` — state holds one entry per
    key only until the watermark passes it, so state is bounded by the
    event-time horizon (plain dropDuplicates on a stream would grow
    state forever). ``events`` must carry an event-time ``ts`` column."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )


def stream_upsert_sink(
    events: DataFrame,
    path: str,
    checkpoint_path: str,
    keys: tuple[str, ...],
    order_col: str,
    timeout_s: int = 600,
) -> None:
    """Streaming ingest into a keyed parquet table: each micro-batch
    MERGEs via upsert_by_key (latest ``order_col`` wins), so replayed or
    late rows update in place instead of appending duplicates — the
    exactly-once-per-key composition of checkpointed ingest + idempotent
    merge."""
    from turbine_maintenance_etl_spark.io.sinks import upsert_by_key

    def merge_batch(batch_df: DataFrame, epoch_id: int) -> None:
        upsert_by_key(batch_df.sparkSession, batch_df, path, keys, order_col)

    q = (
        events.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    _await_drained(q, timeout_s)


def stream_stream_interval_join(
    purchases: DataFrame,
    views: DataFrame,
    window: str = "2 hours",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream interval join: every view within ``window`` AFTER a
    purchase by the same user (the attribution-window shape). Both sides
    carry watermarks, and the join condition bounds view.ts relative to
    purchase.ts, so each side's state buffer evicts rows once the other
    side's watermark passes the interval — bounded state, the ONLY way a
    stream-stream join is safe on an unbounded stream (an unbounded
    condition would buffer both streams forever).

    Inputs must be STREAMING DataFrames with (user_id, event_id, ts,
    value). Output grain: one row per (purchase, view-in-window) pair.
    The batch twin of this semantics is ops/range_join.py — identical
    results on a drained (availableNow) stream, differential-tested."""
    p = (
        purchases.withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
    )
    v = (
        views.withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("v_user_id"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("v_ts"),
            F.col("value").alias("view_value"),
        )
    )
    return p.join(
        v,
        F.expr(
            f"p_user_id = v_user_id AND v_ts >= p_ts AND v_ts <= p_ts + interval {window}"
        ),
    ).select(
        "purchase_id",
        "view_id",
        F.col("p_user_id").alias("user_id"),
        F.unix_micros("p_ts").alias("p_ts_us"),
        F.unix_micros("v_ts").alias("v_ts_us"),
        "view_value",
    )


def session_window_agg(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Per-user session aggregation via ``F.session_window`` — works on
    BOTH batch and streaming DataFrames (the same plan fragment), which
    is the point: sessionization logic written once, verified in batch
    against the DuckDB oracle, then run on the live stream.

    Semantics (empirically pinned by a boundary-exact crafted fixture):
    events whose gap to the previous event is <= ``gap`` merge into one
    session — Spark extends the session window to last_event + gap and
    an event landing exactly on that boundary still merges; only a
    STRICTLY larger gap starts a new session. Same break rule as the
    batch ``w_sessionization`` island query.

    Scale: one shuffle on user_id; per-key session merging is linear in
    the key's events. In streaming, state per key is bounded by the
    watermark horizon (sessions older than the watermark finalize and
    evict)."""
    return (
        events.groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            "user_id",
            F.unix_micros(F.col("sw.start")).alias("session_start_us"),
            F.unix_micros(F.col("sw.end")).alias("session_end_us"),
            "n_events",
            "total_value",
        )
    )


def stream_session_windows(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """Watermarked streaming session windows: the streaming twin of
    ``session_window_agg``. The watermark bounds state — a session whose
    close (last event + gap) falls behind the watermark can never absorb
    more events, so it finalizes and its state evicts; without it,
    per-user session state would grow with stream length."""
    return session_window_agg(events.withWatermark("ts", watermark), gap)


def stream_incremental_dedup(
    docs_stream: DataFrame,
    index: DataFrame,
    output_path: str,
    checkpoint_path: str,
    num_hashes: int = 32,
    bands: int = 8,
    max_bucket_size: int | None = 1000,
    timeout_s: int = 600,
) -> None:
    """Streaming ingest dedup: each micro-batch of arriving documents is
    MinHash-signed and probed against the STATIC corpus LSH index
    (``llm.dedup.lsh_band_buckets`` output) via foreachBatch +
    ``incremental_lsh_candidates`` — the streaming twin of the batch
    ``dedup_incremental_lsh`` path, and the shape of a production
    "reject near-dups at the door" gate.

    Signature aggregation (groupBy(doc).min per permutation) can't run
    as an open-ended stateful streaming agg (state would be keyed by
    every doc forever); foreachBatch gives each micro-batch BATCH
    semantics — signatures exist only within the batch, state stays
    zero. The index side is a static DataFrame joined per batch
    (broadcast or shuffle as Catalyst chooses).

    Exactly-once: like ``stream_cmapss_ingest``, each batch dynamically
    overwrites its own ``_epoch=epoch_id`` partition, so a replayed
    batch rewrites instead of appending (foreachBatch is
    at-least-once)."""
    from turbine_maintenance_etl_spark.llm.dedup import incremental_lsh_candidates

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        cands = incremental_lsh_candidates(
            batch_df,
            index,
            num_hashes=num_hashes,
            bands=bands,
            max_bucket_size=max_bucket_size,
        )
        (
            cands.withColumn("_epoch", F.lit(epoch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_epoch")
            .parquet(output_path)
        )

    q = (
        docs_stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    _await_drained(q, timeout_s)


def stream_user_totals_v2(events: DataFrame) -> DataFrame:
    """The same running-totals semantics as
    ``stream_stateful_user_totals``, on Spark 4's state API v2
    (``transformWithStateInPandas`` + ``StatefulProcessor``) — the
    successor API: typed named state handles (ValueState/ListState/
    MapState per key, each independently evictable with TTL), timers for
    event-/processing-time callbacks, and schema evolution of state
    between runs, none of which the v1 ``applyInPandasWithState``
    single-tuple state can express. Both versions stay implemented: v1
    is the widest-deployed API, v2 is where stateful pipelines are
    going. Differentially tested against v1 and against the batch
    aggregate (same totals after a drained stream) — the test
    import-gates on ``google.protobuf``, which the v2 state-server
    protocol requires at runtime (absent in this container; the
    operator itself builds and plans without it). Requires the RocksDB
    state store provider
    (``spark.sql.streaming.stateStore.providerClass``)."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", "n long, total double")

        def handleInputRows(self, key, rows, timerValues):
            n, total = self._totals.get() if self._totals.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].fillna(0.0).sum())
            self._totals.update((n, total))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [round(total, 4)],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        RunningTotals(),
        outputStructType="user_id bigint, n_events bigint, total_value double",
        outputMode="Update",
        timeMode="None",
    )


def stream_acid_upsert_sink(
    events: DataFrame,
    path: str,
    checkpoint_path: str,
    keys: tuple[str, ...],
    order_col: str,
    timeout_s: int = 600,
) -> None:
    """Streaming ingest into the TRANSACTIONAL table (io/acid.py):
    each micro-batch MERGEs via ``acid.merge_table`` — the same
    latest-wins semantics as ``stream_upsert_sink`` but with atomic
    manifest commits, so a concurrent batch writer (backfill, compaction
    job) can run against the same table without lost updates, and
    readers always see a complete snapshot. Replayed batches (restart
    from checkpoint) re-merge idempotently: same keys, same order_col →
    same winning rows, with order_col TIES resolved by a deterministic
    full-row hash (``merge_table``'s tiebreak, applied by
    ``acid.upsert_table`` to the first batch too — without it a
    replayed first batch could crown a different tied row than the
    original create committed). The first batch creates the table with
    key stats declared, so every later merge takes the stats-pruned
    path."""
    from turbine_maintenance_etl_spark.io import acid

    def merge_batch(batch_df: DataFrame, epoch_id: int) -> None:
        acid.upsert_table(batch_df.sparkSession, batch_df, path, keys, order_col)

    q = (
        events.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    _await_drained(q, timeout_s)


def make_curation_batch_processor(
    curated_path: str,
    index_path: str,
    min_tokens: int = 20,
    min_stopword_ratio: float = 0.05,
    num_hashes: int = 32,
    bands: int = 8,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket_size: int | None = 1000,
):
    """The per-micro-batch function behind ``stream_incremental_curation``,
    exposed as a factory so tests can exercise true at-least-once replay
    (call the returned function TWICE on the same batch_df and assert
    both tables unchanged) — a drained-stream rerun cannot reach this
    path because the source offset makes it a no-op.

    **Idempotence contract.** The LSH index probe cannot absorb
    replays: ``incremental_lsh_candidates`` drops the
    ``new_id == existing_id`` self-pair by design (a doc is not its own
    near-duplicate), so a replayed survivor sails through the probe. A
    crash after the curated/index commits but before the checkpoint
    commit — the exact window at-least-once delivery exists for —
    would duplicate every replayed survivor under plain appends. Both
    sinks are therefore keyed MERGEs (``acid.upsert_table``): curated
    on ``(id_col,)``, index on ``(id_col, band)``; re-delivering the
    same rows rewrites them in place. Both tables carry
    ``stats_cols=(id_col,)`` from creation so every merge takes the
    stats-pruned path — per-batch merge cost tracks the batch's key
    range, not the table size (new doc ids are typically monotone, so
    the touched-directory closure stays small at 100 TB).

    **Re-ingested ids stay COHERENT.** A corpus may legally re-commit a
    doc_id with changed text. Both merges order on the batch's
    ``_commit_version`` (0 for hand-fed batches), so the later commit's
    version wins in the curated table AND in every one of its index
    band rows together — ordering the index merge per-band (e.g. on the
    band hash) would assemble a chimera signature mixing both versions,
    matching neither. Same-id collisions WITHIN one batch are resolved
    before the merge (max version, then max text-hash — deterministic).

    **Saturated buckets stay closed.** In-batch mega-buckets collapse
    to their min-id representative (LINEAR pairing, not a skip —
    ``saturated_policy="representative"``), and new docs probing an
    over-cap INDEX bucket are treated as duplicates of the bucket
    (``"match_all"``): with the default skip policies a bucket that
    crossed ``max_bucket_size`` would admit one more near-duplicate of
    its template in EVERY subsequent batch, forever."""
    from turbine_maintenance_etl_spark.io import acid
    from turbine_maintenance_etl_spark.llm.dedup import (
        exact_dedup,
        incremental_lsh_candidates,
        lsh_band_buckets,
        minhash_lsh_candidates,
    )
    from turbine_maintenance_etl_spark.llm.text import add_quality_signals

    lsh_kw = dict(
        num_hashes=num_hashes, bands=bands, n=n,
        text_col=text_col, id_col=id_col,
    )
    _VER = "_commit_version"

    def _pin_index_config() -> None:
        """The stored index is only meaningful under ONE
        (num_hashes, bands, n) signature config: the (id, band) merge
        keys can't retract rows a SMALLER `bands` no longer writes
        (stale high-band entries keep matching probes forever), and a
        changed hash family wouldn't match buckets at all (round-6
        advice). Pin the config into a sidecar at creation and refuse
        mismatched processors — rebuild the index instead."""
        import json as _json

        cfg = {"num_hashes": num_hashes, "bands": bands, "n": n}
        p = os.path.join(index_path, "_lsh_config.json")

        def _check(stored: dict) -> None:
            if stored != cfg:
                raise ValueError(
                    f"LSH index at {index_path} was built with {stored}; "
                    f"this processor is configured with {cfg}. Changing the "
                    "signature config requires rebuilding the index table "
                    "(stale band rows from the old config would persist "
                    "under the keyed merge and corrupt future probes)."
                )

        os.makedirs(index_path, exist_ok=True)
        # Atomic claim-WITH-content (r10 review): write the JSON to a
        # unique temp file, fsync, then hard-link it to the sidecar
        # name. link(2) is the same winner-picks-one primitive as
        # O_CREAT|O_EXCL (exactly one of N concurrent processors pins
        # its config; losers land in FileExistsError, re-read, and
        # validate against the winner — a check-then-replace race could
        # let two DIFFERENT configs both pass, round-7 advice), but the
        # sidecar only ever APPEARS fully written: the previous
        # O_EXCL-then-write protocol had a crash window between
        # creating the empty file and dumping the JSON that left an
        # empty sidecar no later processor could heal — the stream was
        # bricked until a human deleted it (same temp+link pattern as
        # the acid commit protocol).
        from uuid import uuid4

        tmp = os.path.join(index_path, f"_lsh_config.{uuid4().hex}.tmp")
        with open(tmp, "w") as f:
            _json.dump(cfg, f)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, p)
        except FileExistsError:
            with open(p) as f:
                _check(_json.load(f))
        finally:
            os.unlink(tmp)

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        from pyspark.sql import Window

        bspark = batch_df.sparkSession
        _pin_index_config()
        if _VER in batch_df.columns:
            docs = batch_df.withColumn(_VER, F.col(_VER).cast("long"))
        else:  # hand-fed batch (tests, backfills): one flat version
            docs = batch_df.withColumn(_VER, F.lit(0).cast("long"))
        if not docs.take(1):
            return
        q = add_quality_signals(docs, text_col)
        kept = q.filter(
            (q.n_tokens >= min_tokens) & (q.stopword_ratio >= min_stopword_ratio)
        ).select(*docs.columns)
        kept = exact_dedup(kept, text_col, id_col)
        # a batch may carry the same id twice with DIFFERENT text (a
        # re-ingest landing in the same window): resolve to one row per
        # id before anything downstream sees it — deterministic winner
        # (max version, then max text hash)
        w_id = Window.partitionBy(id_col).orderBy(
            F.col(_VER).desc(), F.xxhash64(F.col(text_col)).desc()
        )
        kept = (
            kept.withColumn("_rn", F.row_number().over(w_id))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        # batch-local barrier: `kept` feeds the in-batch LSH, the index
        # probe, AND the surviving-row merge — the multi-consumer case
        # the measured materialization rule says to pin. Routed through
        # barrier() (r10 review) so a preemptible fleet's
        # SPARK_GRAFT_CHECKPOINT_MODE=reliable is honored here too — a
        # raw localCheckpoint silently ignored the deployment mode.
        kept = barrier(kept, tag="curation-kept")
        in_pairs = minhash_lsh_candidates(
            kept, max_bucket_size=max_bucket_size,
            saturated_policy="representative", **lsh_kw
        )
        drop_in = in_pairs.select(F.col("id_b").alias(id_col)).distinct()
        kept = kept.join(drop_in, id_col, "left_anti")
        if acid.latest_version(index_path) is not None:
            index = acid.read_table(bspark, index_path)
            hits = incremental_lsh_candidates(
                kept, index, max_bucket_size=max_bucket_size,
                saturated_policy="match_all", **lsh_kw
            )
            kept = kept.join(
                hits.select(F.col("new_id").alias(id_col)).distinct(),
                id_col,
                "left_anti",
            )
        survivors = barrier(kept, tag="curation-survivors")
        if not survivors.take(1):
            return
        # keyed merges, not appends: replay-idempotent (see docstring);
        # ordered on the commit version so re-ingested ids update both
        # tables coherently (replayed rows are identical either way —
        # "latest wins" degenerates to rewrite-in-place on replay)
        acid.upsert_table(bspark, survivors, curated_path, (id_col,), _VER)
        buckets = lsh_band_buckets(survivors, **lsh_kw).join(
            survivors.select(id_col, _VER), id_col
        )
        acid.upsert_table(bspark, buckets, index_path, (id_col, "band"), _VER)

    return process


def stream_incremental_curation(
    spark: SparkSession,
    source_path: str,
    curated_path: str,
    index_path: str,
    checkpoint_path: str,
    min_tokens: int = 20,
    min_stopword_ratio: float = 0.05,
    num_hashes: int = 32,
    bands: int = 8,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket_size: int | None = 1000,
    timeout_s: int = 600,
) -> None:
    """The production 100 TB ingest shape, composed end to end from
    this repo's pieces: a CONTINUOUSLY ARRIVING corpus (acid source
    table) is curated incrementally — each micro-batch (one or more
    commits' new documents, via the ``acidtable`` streaming source) is

    1. quality-gated (heuristic signals — the cheap filter first),
    2. exact-deduped within the batch (md5 digest, min-id survivor),
    3. LSH-deduped within the batch (candidate pairs drop the higher
       id — candidate-level survivorship, same convention as the batch
       near-dup survivors operator),
    4. LSH-probed against the STORED band-bucket index of everything
       curated so far (``incremental_lsh_candidates`` — the batch
       hashes only itself; the corpus is never re-hashed), and
    5. committed transactionally AND idempotently: survivors MERGE into
       the curated acid table keyed on ``id_col``; their band buckets
       MERGE into the index acid table keyed on ``(id_col, band)``.

    Everything downstream of the source is per-batch work: signature
    cost is linear in the batch, the index probe is an equi-join
    against a table that holds ~300 bytes/doc, and both sinks commit
    through the manifest CAS so a concurrent backfill writer or
    compaction job cannot lose updates. Restarts resume from the
    checkpointed source offset; replayed batches re-merge the same rows
    in place, so at-least-once delivery collapses to effectively-once
    (see ``make_curation_batch_processor`` for why the index probe
    alone cannot provide this, and tests/test_acid_table.py for the
    double-invocation replay pin).
    """
    from turbine_maintenance_etl_spark.io.acid_stream import (
        register_acid_stream_source,
    )

    register_acid_stream_source(spark)
    process = make_curation_batch_processor(
        curated_path,
        index_path,
        min_tokens=min_tokens,
        min_stopword_ratio=min_stopword_ratio,
        num_hashes=num_hashes,
        bands=bands,
        n=n,
        text_col=text_col,
        id_col=id_col,
        max_bucket_size=max_bucket_size,
    )

    q = (
        spark.readStream.format("acidtable")
        .load(source_path)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    _await_drained(q, timeout_s)


def stream_maintained_rollup(
    spark: SparkSession,
    table_path: str,
    state_path: str,
    checkpoint_path: str,
    keys: list,
    aggs: dict,
    timeout_s: int = 600,
    on_delete_minmax: str = "error",
) -> None:
    """CONTINUOUSLY maintained rollup: the acid table's commit log
    (``acidtable`` stream source) triggers a CDF-window refresh of the
    aggregate state after every batch of commits — the push-based
    complement of calling ``refresh_agg_from_cdf`` on a schedule.

    The micro-batch ROWS are deliberately ignored: the stream is only
    the commit signal (hence ``ignorechanges`` — a merge commit must
    advance the stream, not fail it), and the refresh re-derives the
    exact change window from ``acid.table_changes`` under its own
    ledger cursor. That split keeps every correctness property in ONE
    place: delete-aware folding, replay-safety, and crash-atomicity
    all come from ``refresh_agg_from_cdf``; a replayed or overlapping
    trigger is a ledger no-op. Per-trigger cost is the commit window's
    changes + the group-cardinality state, never the table."""
    from turbine_maintenance_etl_spark.io.acid_stream import (
        register_acid_stream_source,
    )
    from turbine_maintenance_etl_spark.ops.incremental import refresh_agg_from_cdf

    register_acid_stream_source(spark)

    def refresh(batch_df: DataFrame, epoch_id: int) -> None:
        refresh_agg_from_cdf(
            batch_df.sparkSession, table_path, state_path, keys, aggs,
            on_delete_minmax=on_delete_minmax,
        )

    q = (
        spark.readStream.format("acidtable")
        .option("ignorechanges", "true")
        # the rows are ignored (commit-signal only) and the refresh
        # self-heals a vacuumed cursor from the snapshot, so a
        # checkpoint stranded behind the retention horizon must
        # re-bootstrap, not hard-fail the rollup forever
        .option("onvacuumedgap", "bootstrap")
        .load(table_path)
        .writeStream.foreachBatch(refresh)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    _await_drained(q, timeout_s)


def _await_drained(q, timeout_s: int) -> None:
    """Block until the availableNow query terminates; a drain exceeding
    the timeout must FAIL loudly, not return with the query still
    running and the work silently incomplete (a query exception still
    surfaces through awaitTermination as usual)."""
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(
            f"stream {q.name or q.id} did not drain within {timeout_s}s; "
            "raise timeout_s or investigate the backlog"
        )
