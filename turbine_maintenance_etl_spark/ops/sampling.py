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

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_bucket(col: Column, num_buckets: int = 100, salt: str = "") -> Column:
    """Deterministic bucket in [0, num_buckets): md5-prefix of the id
    (portable across engines, unlike murmur3 ``F.hash``) mod buckets.

    TOTAL over NULL ids: a NULL id hashes the sentinel string instead of
    propagating NULL — a NULL bucket fails BOTH halves of a split
    predicate, so NULL-id rows would silently vanish from train AND
    eval (a split must partition its input). All NULL ids share one
    deterministic bucket; callers that consider NULL ids invalid should
    filter or raise upstream."""
    s = F.coalesce(col.cast("string"), F.lit("\x00null"))
    h = F.conv(F.substring(F.md5(F.concat(s, F.lit(salt))), 1, 15), 16, 10)
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


def stratified_exact_sample(
    df: DataFrame,
    strata_cols: list[str],
    n_per_stratum: int,
    id_col: str,
    salt: str = "",
) -> DataFrame:
    """EXACT per-stratum sampling: precisely ``min(n, stratum_size)``
    rows from every stratum, chosen by md5-hash order of the id — the
    quota-sampling complement to ``stratified_sample``'s Bernoulli
    fractions (which only hit quotas in expectation; balancing a
    mixture or building an eval slice needs exact counts per
    language/source cell).

    Deterministic and engine-portable (hash order, not RNG), so the
    SAME rows are selected on any engine/cluster layout — rerunning
    after an append only admits new rows that hash below the incumbent
    cutoff. One shuffle on the strata key; the rank window never sees a
    SinglePartition because strata partition it. Skewed strata are
    bounded by the quota: the window's sort is top-n (rank ≤ n prunes
    via WindowGroupLimit), so a billion-row stratum costs a partial
    top-n per map task, not a full sort."""
    from turbine_maintenance_etl_spark.io.acid import row_tiebreak_hash

    order = F.md5(
        F.concat(
            F.coalesce(F.col(id_col).cast("string"), F.lit("\x00null")), F.lit(salt)
        )
    )
    # content-hash third key (r10 review): duplicate or NULL ids give a
    # FULL (md5, id) tie, and which twin crossed the quota boundary was
    # partition-order-dependent. The hash only engages on those ties
    # (unique-id inputs are byte-identical with or without it, which is
    # what keeps the cross-engine oracle replayable); identical hash =
    # identical rows = interchangeable.
    w = Window.partitionBy(*strata_cols).orderBy(
        order.asc(), F.col(id_col).asc(), row_tiebreak_hash(df).asc()
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_per_stratum)
        .drop("_rn")
    )


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


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str,
    salt: str = "",
    buckets: int = 1 << 20,
    driver_merge_threshold: int = 100_000,
) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis-Spirakis A-ES):
    each row gets key = ln(u) / w with u uniform in (0,1); the k largest
    keys are a weighted sample without replacement.

    The uniform is DERIVED (md5 bucket of the id, not RNG), so the
    sample is deterministic, reproducible across engines/runs, and
    needs no driver-side state. Rows with non-positive weight are
    excluded (ln(u)/w flips sign).

    Selection strategy by k: small k plans a distributed top-k
    (TakeOrderedAndProject — per-partition heads, then a k-row merge
    on the driver); beyond ``driver_merge_threshold`` that final merge
    itself becomes the bottleneck (k rows through one process), so the
    cut switches to the quantile-bucketed distributed exact rank
    (``ops.rank.keep_lowest_k`` on the negated key) — same selected
    set, no k-row funnel. The standard lever for quality-weighted
    corpus mixing at 100 TB."""
    from turbine_maintenance_etl_spark.io.acid import row_tiebreak_hash

    u = (hash_bucket(F.col(id_col), buckets, salt).cast("double") + 0.5) / buckets
    key = F.log(u) / F.col(weight_col)
    # NaN weights must be excluded WITH non-positive ones (r10 review):
    # NaN > 0 is false in SQL so the filter already drops them — but a
    # NaN that sneaks through a changed predicate would sort FIRST under
    # desc and fill the whole sample. Make the exclusion explicit, and
    # NaN-proof for float weight columns where `> 0` semantics differ
    # by engine (Spark's NaN orders greatest; its comparison is false).
    w_d = F.col(weight_col).cast("double")
    keyed = df.filter((w_d > 0) & ~F.isnan(w_d)).withColumn(
        "_es_key", F.round(key, 10)
    )
    # full tie order (r10 review): duplicate ids share u (same hash), so
    # equal weights give a FULL (key, id) tie and which twin survived a
    # boundary cut was partition-order-dependent; the struct appends a
    # content hash so the order is total. Identical struct = identical
    # rows = interchangeable. Same composite feeds BOTH branches, which
    # keeps the documented same-selected-set equivalence exact.
    keyed = keyed.withColumn("_es_tb", F.struct(F.col(id_col), row_tiebreak_hash(df)))
    if k <= driver_merge_threshold:
        return (
            keyed.orderBy(F.desc("_es_key"), F.col("_es_tb"))
            .limit(k)
            .drop("_es_key", "_es_tb")
        )
    from turbine_maintenance_etl_spark.ops.rank import keep_lowest_k

    return keep_lowest_k(keyed, -F.col("_es_key"), k, "_es_tb").drop(
        "_es_key", "_es_tb"
    )
