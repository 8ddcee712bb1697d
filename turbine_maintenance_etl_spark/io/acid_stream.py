"""Streaming source over the transactional table's commit log —
``spark.readStream.format("acidtable").load(path)`` tails io/acid.py
manifests the way Delta's streaming source tails its log (Armbrust et
al., VLDB 2020 §4.3 — the shape, not the code):

- **Offsets are manifest versions.** A micro-batch covers the commit
  range (start, end]; each commit's NEW data directories (dirs in v not
  in v-1) become that batch's input partitions, so a batch reads
  exactly the data the commits added — never the table.
- **Append-only contract, loudly enforced.** overwrite / merge /
  compact commits rewrite data; emitting their new dirs as appends
  would re-emit rewritten rows. Without
  ``.option("ignorechanges", "true")`` the stream FAILS on such a
  commit (Delta's documented behavior); with it, new dirs are emitted
  as appends and the re-emission caveat is the caller's to handle —
  same contract, same spelling, as Delta's ``ignoreChanges``.
- **Exactly-once across restarts** comes from Spark's offset log:
  versions are committed to the checkpoint, so a restarted query
  resumes at the last committed version. Data dirs are immutable, so a
  replayed batch re-reads identical bytes.
- ``_commit_version`` is appended to every row (CDC consumers want the
  provenance; drop it if not).

Rows stream out as Arrow record batches straight from the parquet
files (pyarrow), one InputPartition per committed FILE — batch
parallelism is files-per-commit (a big merge commit fans out instead
of funneling through one worker), and the Python-source overhead is
batch-columnar, not per-row.

``startingversion`` (default 0) controls the initial offset: 0 streams
the table from its first commit; N skips commits <= N (clamped into
the offset even when the table has not reached N yet).
``onvacuumedgap`` ('error' default) decides what a checkpoint stranded
behind the vacuum retention horizon does: 'error' preserves the
no-re-emission guarantee; 'bootstrap' re-emits the earliest retained
snapshot and moves on — for row-agnostic consumers (commit-signal
triggers) that tolerate re-delivery.
"""

from __future__ import annotations

import os
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

from turbine_maintenance_etl_spark.io import acid

_VERSION_COL = "_commit_version"


class _CommitFilePartition(InputPartition):
    """One partition per parquet FILE of a committed directory — NOT per
    directory: a single merge/overwrite commit writes its whole rewrite
    into one dir, and a per-dir partition would funnel that entire
    commit through one Python worker. Per-file planning keeps batch
    parallelism at files-per-commit (merge_table writes one file per
    shuffle partition, so a big commit fans out naturally)."""

    def __init__(self, file_path: str, version: int):
        self.file_path = file_path
        self.version = version


def _parquet_files(dir_path: str) -> list[str]:
    files = sorted(
        os.path.join(dir_path, name)
        for name in os.listdir(dir_path)
        if name.endswith(".parquet")
    )
    if not files:
        raise FileNotFoundError(f"no parquet files under {dir_path}")
    return files


def _first_parquet_file(dir_path: str) -> str:
    return _parquet_files(dir_path)[0]


def register_acid_stream_source(spark) -> None:
    """Idempotently register the ``acidtable`` streaming source on a
    session — the one place the register-or-'already-exists' dance
    lives."""
    try:
        spark.dataSource.register(AcidTableStreamSource)
    except Exception as e:
        if "already" not in str(e).lower():
            raise


class AcidTableStreamReader(DataSourceStreamReader):
    def __init__(
        self,
        path: str,
        starting_version: int,
        ignore_changes: bool,
        spark_schema=None,
        on_vacuumed_gap: str = "error",
    ):
        self.path = path
        self.starting_version = starting_version
        self.ignore_changes = ignore_changes
        self.spark_schema = spark_schema
        self.on_vacuumed_gap = on_vacuumed_gap

    def initialOffset(self) -> dict:
        return {"version": self.starting_version}

    def latestOffset(self) -> dict:
        v = acid.latest_version(self.path)
        # clamp to starting_version: a startingversion beyond the
        # table's current head must NOT let the checkpoint commit a
        # smaller offset — the next batch would be (head, newer] and
        # deliver exactly the commits the option promised to skip
        return {"version": max(v, self.starting_version) if v is not None
                else self.starting_version}

    def partitions(self, start: dict, end: dict):
        # Vacuumed history: retention may have dropped manifests below
        # the earliest retained version. Versions missing INSIDE the
        # requested range are skipped (their net effect is subsumed by
        # the next retained snapshot's dir diff); if the range's very
        # first retained version has no parent manifest, the stream
        # BOOTSTRAPS from that snapshot — emits its full dir list once,
        # op-check waived for that version only (it stands for the
        # whole table state, not an incremental change). This matches
        # "stream the table from its earliest available commit"; a
        # checkpointed stream that already consumed the vacuumed range
        # is unaffected (its offsets are past it).
        versions = [
            v
            for v in acid._list_versions(self.path)
            if start["version"] < v <= end["version"]
        ]
        parts: list[_CommitFilePartition] = []
        prev_dirs: set[str] | None = None
        bootstrap = False
        for v in versions:
            snap = acid.snapshot(self.path, v)
            if prev_dirs is None:
                try:
                    prev_dirs = (
                        set(acid.snapshot(self.path, v - 1).dirs) if v > 1 else set()
                    )
                except FileNotFoundError:
                    gap_ok = (
                        start["version"] == self.starting_version
                        and self.starting_version == 0
                    ) or self.on_vacuumed_gap == "bootstrap"
                    if not gap_ok:
                        if start["version"] == self.starting_version:
                            # a fresh stream asked to skip commits <=
                            # startingversion, but the manifests needed
                            # to honor that skip are vacuumed —
                            # bootstrapping would over-deliver the rows
                            # the option promised to exclude.
                            raise ValueError(
                                f"startingversion={self.starting_version} "
                                f"cannot be honored: manifest v{v - 1} was "
                                "vacuumed, so the skipped commits cannot be "
                                "separated from the retained snapshot. Use "
                                "startingversion=0 (full bootstrap) or a "
                                "version within the retention window."
                            )
                        # a CHECKPOINTED stream fell behind the
                        # retention horizon: bootstrapping here would
                        # silently re-emit rows it already delivered —
                        # unless the caller opted in to re-emission
                        # via onvacuumedgap=bootstrap (row-agnostic
                        # consumers like the maintained-rollup trigger).
                        raise ValueError(
                            f"stream checkpoint at version {start['version']} "
                            f"is behind the vacuum retention horizon (manifest "
                            f"v{v - 1} is gone): reset the checkpoint, raise "
                            "vacuum keep_last above the stream's lag, or — if "
                            "re-emitted rows are acceptable — set "
                            ".option('onvacuumedgap', 'bootstrap')"
                        )
                    prev_dirs = set()  # parent vacuumed: full-snapshot bootstrap
                    bootstrap = True
            if (
                snap.operation not in ("create", "append")
                and not self.ignore_changes
                and not bootstrap
            ):
                raise ValueError(
                    f"version {v} is a '{snap.operation}' commit: the stream "
                    "source is append-only. Set "
                    ".option('ignorechanges', 'true') to emit rewritten "
                    "directories as appends (rows may be re-emitted), or "
                    "consume acid.table_changes() in a foreachBatch instead."
                )
            bootstrap = False
            for d in snap.dirs:
                if d not in prev_dirs:
                    for f in _parquet_files(os.path.join(self.path, d)):
                        parts.append(_CommitFilePartition(f, v))
            prev_dirs = set(snap.dirs)
        return parts

    def read(self, partition: _CommitFilePartition) -> Iterator:
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        # Schema-evolution alignment: the table's dirs may predate (or,
        # mid-stream, postdate) the declared schema — MERGE/append with
        # allowMissingColumns writes dirs whose column sets differ.
        # Every batch is projected/padded to the DECLARED schema
        # (missing columns -> nulls, extras dropped, types cast), so
        # rows can never misalign with what downstream operators see.
        target = None
        if self.spark_schema is not None:
            from pyspark.sql.pandas.types import to_arrow_schema

            declared = to_arrow_schema(self.spark_schema)
            target = pa.schema(
                [pa.field(f.name, f.type) for f in declared if f.name != _VERSION_COL]
            )

        def _align(batch: pa.RecordBatch) -> pa.RecordBatch:
            # fast path only on FULL schema equality (names AND types):
            # a dir written before a type widening has matching names
            # but narrower types and must go through the cast branch
            if target is None or batch.schema.equals(target):
                return batch
            arrays = []
            for field in target:
                i = batch.schema.get_field_index(field.name)
                if i >= 0:
                    col = batch.column(i)
                    if col.type != field.type:
                        try:
                            col = pc.cast(col, field.type)
                        except pa.ArrowInvalid as exc:
                            # history holds values WIDER than the latest
                            # schema (a type-narrowing rewrite): a safe
                            # cast cannot represent them — surface what
                            # happened instead of a bare Arrow error
                            # replayed on every restart
                            raise ValueError(
                                f"column {field.name!r} in historical file "
                                f"{partition.file_path} has type "
                                f"{col.type} with values the table's "
                                f"current type {field.type} cannot hold "
                                "(type-narrowing history); stream from a "
                                "later startingversion or widen the "
                                f"table's type: {exc}"
                            ) from exc
                    arrays.append(col)
                else:
                    arrays.append(pa.nulls(batch.num_rows, field.type))
            return pa.RecordBatch.from_arrays(arrays, schema=target)

        ver_scalar = pa.scalar(partition.version, pa.int64())
        for batch in pq.ParquetFile(partition.file_path).iter_batches():
            yield _align(batch).append_column(
                _VERSION_COL, pa.repeat(ver_scalar, batch.num_rows)
            )

    def commit(self, end: dict) -> None:
        pass  # offsets live in Spark's checkpoint; manifests are immutable


class AcidTableStreamSource(DataSource):
    """``spark.dataSource.register(AcidTableStreamSource)`` then
    ``spark.readStream.format("acidtable").load(path)``."""

    @classmethod
    def name(cls) -> str:
        return "acidtable"

    def _table_path(self) -> str:
        path = self.options.get("path")
        if not path:
            raise ValueError("acidtable requires a table path: .load(path)")
        return path

    def schema(self):
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import from_arrow_schema
        from pyspark.sql.types import LongType, StructField

        # Schema-evolved tables hold dirs with differing column sets
        # (MERGE allowMissingColumns / evolving appends); dirs are
        # uuid-named, so "first dir" is arbitrary. Unify footer schemas
        # across ALL dirs of the latest snapshot (footer reads only —
        # no data I/O) so the declared schema is the table's evolved
        # one, exactly like acid.read_table's mergeSchema read.
        snap = acid.snapshot(self._table_path())
        footers = [
            pq.ParquetFile(
                _first_parquet_file(os.path.join(self._table_path(), d))
            ).schema_arrow
            for d in snap.dirs
        ]
        unified = pa.unify_schemas(footers, promote_options="permissive")
        base = from_arrow_schema(unified)
        return base.add(StructField(_VERSION_COL, LongType(), False))

    def streamReader(self, schema) -> AcidTableStreamReader:
        gap = str(self.options.get("onvacuumedgap", "error")).lower()
        if gap not in ("error", "bootstrap"):
            raise ValueError(
                f"onvacuumedgap must be 'error' or 'bootstrap', got {gap!r}"
            )
        return AcidTableStreamReader(
            self._table_path(),
            int(self.options.get("startingversion", 0)),
            str(self.options.get("ignorechanges", "false")).lower() == "true",
            spark_schema=schema,
            on_vacuumed_gap=gap,
        )
