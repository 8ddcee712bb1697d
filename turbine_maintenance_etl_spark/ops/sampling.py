"""Sampling / splitting operators for training-data pipelines.

At 100 TB, `randomSplit` is the wrong tool for dataset membership: it is
nondeterministic under partition changes (it re-derives from partition
seeds, so adding one file reshuffles everyone's split). The durable
pattern is CONTENT-DEFINED membership — hash a stable id and bucket the
hash — which is reproducible across engines, runs, and cluster layouts,
and lets any later job recompute membership without a join against a
stored assignment table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(col: Column, num_buckets: int = 100, salt: str = "") -> Column:
    """Deterministic bucket in [0, num_buckets): md5-prefix of the id
    (portable across engines, unlike murmur3 ``F.hash``) mod buckets."""
    h = F.conv(F.substring(F.md5(F.concat(col.cast("string"), F.lit(salt))), 1, 15), 16, 10)
    return (h.cast("bigint") % num_buckets).cast("int")


def hash_split(
    df: DataFrame,
    id_col: str,
    train_pct: int = 80,
    salt: str = "",
) -> tuple[DataFrame, DataFrame]:
    """Deterministic train/eval split by id hash: bucket < train_pct →
    train. Membership is a pure function of the id — stable under
    repartitioning, appends, and engine changes (the property
    randomSplit lacks)."""
    b = hash_bucket(F.col(id_col), 100, salt)
    return df.filter(b < train_pct), df.filter(b >= train_pct)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum Bernoulli sampling (``sampleBy``): cap over-represented
    sources / languages without a shuffle — each partition filters its own
    rows against the stratum fraction."""
    return df.sampleBy(strata_col, fractions=fractions, seed=seed)


def deterministic_downsample(
    df: DataFrame,
    id_col: str,
    keep_per_mille: int,
    salt: str = "",
) -> DataFrame:
    """Content-defined downsample: keep ids whose hash lands in
    ``keep_per_mille`` of 1000 buckets. Unlike ``sample()`` the kept set
    is reproducible and JOIN-STABLE: two tables downsampled with the
    same id/salt keep the SAME entities, so FK joins still line up — the
    standard trick for building consistent dev slices of a warehouse."""
    return df.filter(hash_bucket(F.col(id_col), 1000, salt) < keep_per_mille)
