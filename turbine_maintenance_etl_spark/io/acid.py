"""A minimal transactional table format on plain parquet — snapshot
isolation, atomic commits, optimistic concurrency, time travel — built
from two primitives every POSIX filesystem provides: immutable data
files and create-exclusive manifest publication.

Closes the long-standing gap (`io/sinks.py:upsert_by_key`'s CONCURRENCY
CAVEAT): plain-parquet MERGE is read-modify-write, so two concurrent
writers can silently lose rows. Delta/Iceberg solve this with a commit
log; neither is installable in this environment, so this module
implements the same protocol shape from scratch (original code — the
log-structured design follows the published Delta Lake paper, Armbrust
et al., VLDB 2020, not any implementation):

- **Data files are immutable.** Every write lands in a fresh
  uniquely-named subdirectory; nothing is ever modified or deleted by a
  commit (vacuum is separate and retention-gated).
- **A snapshot is a manifest**: ``_manifest/v{N}.json`` lists exactly
  the data subdirectories visible at version N. Readers list manifests,
  pick the highest N (or a requested historic N — time travel), and
  read only those files: a reader can NEVER see a half-written table,
  because data files are fully written before the manifest that
  references them exists.
- **Commit = create-exclusive publication.** A writer prepares
  ``v{N+1}`` content, writes it to a private temp file, then
  ``os.link``s it to the final name — link(2) fails atomically with
  EEXIST if any other writer published N+1 first. The loser re-reads
  the new latest snapshot, re-applies its logical operation (the
  standard optimistic-concurrency retry), and tries N+2. No locks, no
  daemon. On an object store, swap the link(2) CAS for the store's
  conditional-put (S3 If-None-Match, GCS generation-match) — the
  protocol is otherwise unchanged.

At 100 TB: manifests carry directory names, not per-row state, so
commit cost is O(snapshot file-list); MERGE rewrites only the data it
must (the merged output), readers of old snapshots are undisturbed
(their files are immutable), and vacuum bounds storage growth.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

_MANIFEST_DIR = "_manifest"


class CommitConflict(Exception):
    """Another writer published this version first — re-read and retry."""


@dataclass(frozen=True)
class Snapshot:
    version: int
    dirs: list[str]           # data subdirectories, relative to table root
    operation: str
    committed_at: float
    parent: int


def _manifest_path(path: str, version: int) -> str:
    return os.path.join(path, _MANIFEST_DIR, f"v{version:010d}.json")


def _list_versions(path: str) -> list[int]:
    mdir = os.path.join(path, _MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return []
    out = []
    for name in os.listdir(mdir):
        if name.startswith("v") and name.endswith(".json"):
            try:
                out.append(int(name[1:-5]))
            except ValueError:
                continue
    return sorted(out)


def _read_manifest(path: str, version: int) -> Snapshot:
    with open(_manifest_path(path, version)) as f:
        m = json.load(f)
    return Snapshot(
        version=m["version"],
        dirs=list(m["dirs"]),
        operation=m.get("operation", "?"),
        committed_at=m.get("committed_at", 0.0),
        parent=m.get("parent", m["version"] - 1),
    )


def latest_version(path: str) -> int | None:
    versions = _list_versions(path)
    return versions[-1] if versions else None


def snapshot(path: str, version: int | None = None) -> Snapshot:
    """The manifest for ``version`` (default: latest). Raises
    FileNotFoundError for a missing table/version."""
    if version is None:
        v = latest_version(path)
        if v is None:
            raise FileNotFoundError(f"no committed version at {path}")
        version = v
    return _read_manifest(path, version)


def history(path: str) -> list[Snapshot]:
    """All snapshots, oldest first — the table's commit log."""
    return [_read_manifest(path, v) for v in _list_versions(path)]


def read_table(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Snapshot-isolated read: resolves the manifest ONCE, then reads
    exactly its immutable files — concurrent commits (or vacuum of
    other versions) cannot change what this DataFrame sees. Pass
    ``version`` for time travel."""
    snap = snapshot(path, version)
    if not snap.dirs:
        raise ValueError(f"version {snap.version} of {path} is empty")
    return spark.read.parquet(*[os.path.join(path, d) for d in snap.dirs])


def _write_data_dir(df: DataFrame, path: str, op: str) -> str:
    d = f"data-{op}-{uuid.uuid4().hex[:12]}"
    df.write.mode("error").parquet(os.path.join(path, d))
    return d


def _try_commit(path: str, version: int, dirs: list[str], op: str, parent: int) -> None:
    """Publish ``version`` atomically; raise CommitConflict on a lost
    race. link(2)-based CAS: the final manifest name can be created by
    exactly one writer."""
    mdir = os.path.join(path, _MANIFEST_DIR)
    os.makedirs(mdir, exist_ok=True)
    payload = {
        "version": version,
        "dirs": sorted(dirs),
        "operation": op,
        "committed_at": time.time(),
        "parent": parent,
    }
    tmp = os.path.join(mdir, f".tmp-{uuid.uuid4().hex}.json")
    with open(tmp, "w") as f:
        json.dump(payload, f)
        f.flush()
        os.fsync(f.fileno())
    try:
        os.link(tmp, _manifest_path(path, version))
    except FileExistsError as e:
        raise CommitConflict(f"version {version} already committed") from e
    finally:
        os.unlink(tmp)


def create_table(spark: SparkSession, df: DataFrame, path: str) -> int:
    """Create version 1. Fails if the table already has commits."""
    if latest_version(path) is not None:
        raise FileExistsError(f"table already exists at {path}")
    d = _write_data_dir(df, path, "create")
    _try_commit(path, 1, [d], "create", 0)
    return 1


def _retrying_commit(path: str, build, op: str, max_retries: int = 20) -> int:
    """Optimistic-concurrency loop: ``build(base_snapshot) -> dirs`` is
    re-invoked against the NEW latest snapshot after every lost race, so
    the logical operation (append/overwrite/merge) is re-applied, never
    blindly replayed — lost-update-free by construction."""
    for _ in range(max_retries):
        base = snapshot(path)
        dirs = build(base)
        try:
            _try_commit(path, base.version + 1, dirs, op, base.version)
            return base.version + 1
        except CommitConflict:
            continue
    raise CommitConflict(f"{op} on {path} lost {max_retries} races; giving up")


def append_table(spark: SparkSession, df: DataFrame, path: str) -> int:
    """Append atomically. The data directory is written ONCE (immutable
    files are version-independent for a pure append); only the manifest
    race retries."""
    d = _write_data_dir(df, path, "append")
    return _retrying_commit(path, lambda base: [*base.dirs, d], "append")


def overwrite_table(spark: SparkSession, df: DataFrame, path: str) -> int:
    """Replace the table contents atomically. Old versions remain
    readable (time travel) until vacuumed."""
    d = _write_data_dir(df, path, "overwrite")
    return _retrying_commit(path, lambda base: [d], "overwrite")


def merge_table(
    spark: SparkSession,
    new_rows: DataFrame,
    path: str,
    keys: tuple[str, ...],
    order_col: str,
) -> int:
    """Transactional MERGE (upsert-by-key, latest ``order_col`` wins —
    the semantics of ``sinks.upsert_by_key``, minus its lost-update
    caveat): the merged output is recomputed against the CURRENT
    snapshot inside the retry loop, so a concurrent append between our
    read and our commit is never dropped — the conflict loser re-merges
    on top of it. Rows are localCheckpoint-free: the merged output is
    written to NEW files before the commit, and the base snapshot's
    files are immutable, so there is no read-your-own-overwrite race."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    def build(base: Snapshot) -> list[str]:
        existing = spark.read.parquet(*[os.path.join(path, d) for d in base.dirs])
        merged = existing.unionByName(new_rows, allowMissingColumns=True)
        w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(
            F.col(order_col).desc()
        )
        latest = (
            merged.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        return [_write_data_dir(latest, path, "merge")]

    return _retrying_commit(path, build, "merge")


def vacuum(path: str, keep_last: int = 2) -> list[str]:
    """Delete data directories unreferenced by the ``keep_last`` most
    recent versions, and their manifests. Returns removed dirs. Callers
    must choose ``keep_last`` >= the oldest snapshot any reader may
    still hold (same retention contract as Delta's VACUUM)."""
    import shutil

    versions = _list_versions(path)
    if len(versions) <= keep_last:
        return []
    keep, drop = versions[-keep_last:], versions[:-keep_last]
    referenced = set()
    for v in keep:
        referenced.update(_read_manifest(path, v).dirs)
    removed = []
    for v in drop:
        for d in _read_manifest(path, v).dirs:
            if d not in referenced and os.path.isdir(os.path.join(path, d)):
                shutil.rmtree(os.path.join(path, d), ignore_errors=True)
                removed.append(d)
        os.unlink(_manifest_path(path, v))
    return removed
