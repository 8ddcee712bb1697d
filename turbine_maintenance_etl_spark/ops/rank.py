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

Cost: four input scans unpersisted (edges, counts, and the final job
reads the kept-below and boundary branches separately — deliberately:
folding them into one scan would hash-exchange EVERY kept row for the
window, where the two-branch plan shuffles only the boundary bucket).
Callers with an expensive upstream (e.g. a trained-LM scoring chain)
should pass ``persist=True`` to materialize the keyed frame once via
``ops.materialize.barrier`` and serve every pass from storage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_RK = "_rank_key"    # double-cast key: drives BUCKETING only
_RO = "_rank_orig"   # original key value: drives ORDERING (exactness)
_BKT = "_rank_bucket"
_RESERVED = (_RK, _RO, _BKT, "_rn", "_offset")


def _bucketed(df: DataFrame, key: Column, num_buckets: int, persist: bool) -> DataFrame:
    """Attach the rank key and its content-defined quantile bucket.

    Bucketing uses the DOUBLE cast (approxQuantile needs it; the cast
    is monotone non-decreasing, so bucket order can never contradict
    the true key order), but exact ORDERING inside the boundary window
    uses the ORIGINAL key value — a bigint beyond 2^53 whose neighbors
    collapse to one double still ranks exactly. A key whose cast is
    NULL for non-NULL values (non-numeric column) surfaces as a NULL
    bucket, which the callers reject loudly instead of silently
    returning an empty result."""
    if num_buckets < 2:
        raise ValueError(f"num_buckets must be >= 2, got {num_buckets}")
    clash = [c for c in _RESERVED if c in df.columns]
    if clash:
        raise ValueError(
            f"input already has reserved rank column(s) {clash}; rename them"
        )
    t = (
        df.withColumn(_RO, key)
        .filter(F.col(_RO).isNotNull())
        .withColumn(_RK, F.col(_RO).cast("double"))
    )
    if persist:
        from turbine_maintenance_etl_spark.ops.materialize import barrier

        # barrier (localCheckpoint / scratch parquet) instead of a raw
        # .persist(): the storage is released when the frame is GC'd,
        # not pinned for the session's lifetime, and the deployment's
        # checkpoint-mode knob applies
        t = barrier(t, "rank-keyed")
    probs = [i / num_buckets for i in range(1, num_buckets)]
    # bounded driver result: <= num_buckets-1 literal doubles
    edges = sorted(set(t.approxQuantile(_RK, probs, 1.0 / (4 * num_buckets))))
    if edges:
        # single-parse construction (llm.text.tokens_sql rationale)
        arr = "array(" + ", ".join(repr(float(e)) + "D" for e in edges) + ")"
        bkt = F.expr(
            f"aggregate({arr}, 0, (acc, e) -> "
            f"acc + (CASE WHEN `{_RK}` >= e THEN 1 ELSE 0 END))"
        )
    else:
        bkt = F.lit(0)
    # a non-NULL key whose double cast is NULL (non-numeric column)
    # must NOT silently land in bucket 0 below rows it may outrank —
    # give it a NULL bucket so _bucket_counts rejects the key loudly
    return t.withColumn(_BKT, F.when(F.col(_RK).isNotNull(), bkt))


def _bucket_counts(t: DataFrame) -> dict:
    counts = {
        r[_BKT]: r["n"]
        for r in t.groupBy(_BKT).agg(F.count("*").alias("n")).collect()
    }
    if None in counts:
        raise ValueError(
            "rank key does not cast to double (non-numeric column?) — "
            f"{counts[None]} non-NULL rows have no bucket"
        )
    return counts


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
    if k <= 0:  # statically empty: never scan the input
        return df.filter(F.lit(False)).select(*out_cols)
    t = _bucketed(df, key, num_buckets, persist)
    counts = _bucket_counts(t)
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
    counts = _bucket_counts(t)
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
    w = Window.partitionBy(_BKT).orderBy(F.asc(_RO), F.asc(id_col))
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
    if out_col in df.columns:
        raise ValueError(f"output column {out_col!r} already exists; rename it")
    t = _bucketed(df, key, num_buckets, persist)
    counts = sorted(_bucket_counts(t).items())
    offsets, acc = [], 0
    for b, n in counts:
        offsets.append((b, acc))
        acc += n
    spark = df.sparkSession
    off = F.broadcast(
        spark.createDataFrame(offsets, f"{_BKT} int, _offset bigint")
    )
    w = Window.partitionBy(_BKT).orderBy(F.asc(_RO), F.asc(id_col))
    return (
        t.join(off, _BKT)
        .withColumn(out_col, (F.row_number().over(w) + F.col("_offset")).cast("bigint"))
        .drop(_RK, _RO, _BKT, "_offset")
    )
