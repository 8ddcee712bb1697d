"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API)
for the CMAPSS whitespace-text format — the engine-extension surface:
``spark.dataSource.register(CmapssDataSource)`` then
``spark.read.format("cmapss").load(path)``.

The JVM route (``io/cmapss.py:read_cmapss_text``: spark.read.text →
codegen'd split/try_cast) remains the DEFAULT and the fast path — this
source exists to exercise and document the V2 DataSource extension
point (how a format Spark doesn't know becomes a first-class
``.format(...)``) with the SAME parse semantics, differentially tested
against the JVM parser on the real FD001 file.

Scale shape: one InputPartition per file (a directory fans out across
executors; a single huge text file would need byte-range splitting
like Hadoop's LineRecordReader — out of scope for this format, whose
real files are ≤ 50 MB each). Rows stream out of a generator — no
file-sized materialization. Parsing is Python-rate (~10x slower than
the codegen path): acceptable for an extension-point demo, which is
why the default ingest keeps the JVM route.

Reference parity: scripts/etl_turbofan.py:10-19 (pd.read_csv sep=r"\\s+",
header=None, iloc[:, :26], to_numeric(errors="coerce")).
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from turbine_maintenance_etl_spark.schema.cmapss import CMAPSS_COLS, _INT_COLS

_SCHEMA = ", ".join(
    f"{name} {'int' if name in _INT_COLS else 'double'}" for name in CMAPSS_COLS
)


def _parse_token(tok: str, as_int: bool):
    """pd.to_numeric(errors='coerce') + astype(int) semantics: bad
    numerics -> None; int columns truncate float-looking tokens."""
    try:
        v = float(tok)
    except ValueError:
        return None
    if v != v or v in (float("inf"), float("-inf")):  # NaN/inf -> NULL int
        return None if as_int else v
    if as_int:
        i = int(v)
        # int32 range check (r10 review): the JVM path's try_cast('int')
        # NULLs an overflowing token; an unchecked Python int here
        # crashed the read task at IntegerType conversion instead
        return i if -(1 << 31) <= i <= (1 << 31) - 1 else None
    return v


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class CmapssReader(DataSourceReader):
    def __init__(self, paths: list[str]):
        self.paths = paths

    def partitions(self):
        return [_FilePartition(p) for p in self.paths]

    def read(self, partition: _FilePartition):
        flags = [name in _INT_COLS for name in CMAPSS_COLS]
        n = len(CMAPSS_COLS)
        with open(partition.path, encoding="utf-8") as fh:
            for line in fh:
                toks = line.split()
                if not toks:
                    continue
                row = [
                    _parse_token(toks[i], flags[i]) if i < len(toks) else None
                    for i in range(n)
                ]
                yield tuple(row)


class CmapssDataSource(DataSource):
    """``spark.read.format("cmapss").load(path_or_dir)``; option
    ``extension`` (default ``.txt``) filters directory listings."""

    @classmethod
    def name(cls) -> str:
        return "cmapss"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> CmapssReader:
        path = self.options.get("path")
        if not path:
            raise ValueError("cmapss source requires a path: .load(<file-or-dir>)")
        ext = self.options.get("extension", ".txt")
        if os.path.isdir(path):
            paths = sorted(
                os.path.join(path, f)
                for f in os.listdir(path)
                if f.endswith(ext)
            )
        else:
            paths = [path]
        if not paths:
            raise ValueError(f"cmapss source: no {ext} files under {path}")
        return CmapssReader(paths)
