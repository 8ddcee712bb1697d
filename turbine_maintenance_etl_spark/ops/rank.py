"""Distributed EXACT global rank cuts — top-k / top-fraction by a key
without a single-partition window.

The naive exact rank (``Window.orderBy(key)`` + ``row_number``) moves
the ENTIRE input to one reducer — the classic 100 TB scale-killer
(Spark warns ``WindowExec: No Partition Defined``). This module keeps
the EXACT same selected set while staying distributed:

1. one pass computes ~``num_buckets`` approximate quantile edges of the
   key (``approxQuantile`` — a bounded driver result of literal
   doubles);
2. every row gets a CONTENT-DEFINED bucket id (# of edges <= key — a
   pure function of the key value, so recomputation of any plan branch
   can never disagree about bucket membership; no checkpoint needed);
3. one tiny aggregation counts rows per bucket (<= ``num_buckets``
   rows collected — a bounded driver fetch);
4. with per-bucket counts, the global cutoff rank k lands in exactly
   one BOUNDARY bucket: every lower bucket is kept by a map-only
   filter, every higher bucket dropped map-only, and only the boundary
   bucket (~ n/num_buckets rows, by quantile construction) is ranked
   with a window PARTITIONED on the bucket id — a one-key hash
   exchange of 1/num_buckets of the data, not a single-partition sort
   of all of it. ``num_buckets`` is the knob: at 100 TB with 10k
   buckets the ranked slice is ~0.01% of the corpus.

Degenerate case: if one key value dominates (quantile edges collapse),
the boundary bucket grows toward the tie mass — exactness over massive
ties inherently requires co-locating the tied rows; the unique-id
tie-break keeps the result deterministic either way.

Cost: three passes over the input (edges, counts, final) instead of
one — each fully parallel. Callers with an expensive upstream (e.g. a
trained-LM scoring chain) should pass ``persist=True`` to materialize
the input once and serve all three passes from storage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_RK = "_rank_key"
_BKT = "_rank_bucket"


def _bucketed(df: DataFrame, key: Column, num_buckets: int, persist: bool) -> DataFrame:
    """Attach the rank key and its content-defined quantile bucket."""
    t = df.withColumn(_RK, key.cast("double")).filter(F.col(_RK).isNotNull())
    if persist:
        from pyspark.storagelevel import StorageLevel

        t = t.persist(StorageLevel.MEMORY_AND_DISK)
    probs = [i / num_buckets for i in range(1, num_buckets)]
    # bounded driver result: <= num_buckets-1 literal doubles
    edges = sorted(set(t.approxQuantile(_RK, probs, 1.0 / (4 * num_buckets))))
    if edges:
        arr = F.array(*[F.lit(float(e)) for e in edges])
        bkt = F.aggregate(
            arr,
            F.lit(0),
            lambda acc, e: acc + F.when(F.col(_RK) >= e, 1).otherwise(0),
        )
    else:
        bkt = F.lit(0)
    return t.withColumn(_BKT, bkt)


def keep_lowest_k(
    df: DataFrame,
    key: Column,
    k: int,
    id_col: str,
    num_buckets: int = 64,
    persist: bool = False,
) -> DataFrame:
    """EXACT bottom-k rows by ``(key asc, id_col asc)`` — the same set
    ``ORDER BY key, id LIMIT k`` selects — without a global sort, a
    driver-side k-row merge, or a single-partition window. Rows with a
    NULL key are excluded (they have no rank). For top-k LARGEST pass
    the negated key.

    Exactly equivalent to the single-partition ``row_number`` cut; see
    the module docstring for the plan shape."""
    out_cols = list(df.columns)
    t = _bucketed(df, key, num_buckets, persist)
    if k <= 0:
        return t.filter(F.lit(False)).select(*out_cols)
    counts = {
        r[_BKT]: r["n"]
        for r in t.groupBy(_BKT).agg(F.count("*").alias("n")).collect()
    }
    return _cut_at(t, k, counts, id_col, out_cols)


def keep_lowest_frac(
    df: DataFrame,
    key: Column,
    frac: float,
    id_col: str,
    num_buckets: int = 64,
    persist: bool = False,
) -> DataFrame:
    """EXACT lowest ``floor(frac * n)`` rows by ``(key asc, id asc)``
    where n counts the non-NULL-key rows — the distributed twin of
    ``row_number() OVER (ORDER BY key, id) <= floor(frac * count(*))``.
    The total comes from the same per-bucket counts the cut already
    needs, so the fraction costs no extra pass."""
    out_cols = list(df.columns)
    t = _bucketed(df, key, num_buckets, persist)
    counts = {
        r[_BKT]: r["n"]
        for r in t.groupBy(_BKT).agg(F.count("*").alias("n")).collect()
    }
    k = int(frac * sum(counts.values()))
    if k <= 0:
        return t.filter(F.lit(False)).select(*out_cols)
    return _cut_at(t, k, counts, id_col, out_cols)


def _cut_at(
    t: DataFrame, k: int, counts: dict, id_col: str, out_cols: list[str]
) -> DataFrame:
    total = sum(counts.values())
    if k >= total:
        return t.select(*out_cols)
    below_n = 0
    boundary = 0
    for b in sorted(counts):
        if below_n + counts[b] >= k:
            boundary = b
            break
        below_n += counts[b]
    kept_below = t.filter(F.col(_BKT) < boundary)
    # the ONLY windowed slice: one bucket (~n/num_buckets rows by
    # quantile construction), with the partition column declared so the
    # exchange is a hash partitioning, never SinglePartition
    w = Window.partitionBy(_BKT).orderBy(F.asc(_RK), F.asc(id_col))
    kept_boundary = (
        t.filter(F.col(_BKT) == boundary)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= F.lit(k - below_n))
    )
    return kept_below.unionByName(kept_boundary.drop("_rn")).select(*out_cols)


def global_row_number(
    df: DataFrame,
    key: Column,
    id_col: str,
    out_col: str = "row_idx",
    num_buckets: int = 64,
    persist: bool = False,
) -> DataFrame:
    """EXACT global 1-based row numbering by ``(key asc, id_col asc)`` —
    the distributed twin of ``row_number() OVER (ORDER BY key, id)``
    (and of the reference's positional key-gen, which is correct with a
    single-partition window only because its input is one small file —
    ``io/cmapss.py`` J2 guard). Rows with a NULL key are excluded.

    Same quantile-bucket machinery as the rank cuts, one step further:
    every bucket (not just a boundary one) gets a window PARTITIONED on
    the bucket id (hash exchange, never SinglePartition), and each
    bucket's rows add the broadcast prefix count of all lower buckets —
    exact contiguous ordinals, max co-located slice ~n/num_buckets.
    This is the production shape for assigning stable ordinal ids to a
    corpus (training-order assignment, stable integer doc ids)."""
    t = _bucketed(df, key, num_buckets, persist)
    counts = sorted(
        (r[_BKT], r["n"])
        for r in t.groupBy(_BKT).agg(F.count("*").alias("n")).collect()
    )
    offsets, acc = [], 0
    for b, n in counts:
        offsets.append((b, acc))
        acc += n
    spark = df.sparkSession
    off = F.broadcast(
        spark.createDataFrame(offsets, f"{_BKT} int, _offset bigint")
    )
    w = Window.partitionBy(_BKT).orderBy(F.asc(_RK), F.asc(id_col))
    return (
        t.join(off, _BKT)
        .withColumn(out_col, (F.row_number().over(w) + F.col("_offset")).cast("bigint"))
        .drop(_RK, _BKT, "_offset")
    )
