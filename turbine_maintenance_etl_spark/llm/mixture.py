"""Temperature-weighted corpus mixture sampling and hash-sharded export
— the step that turns per-source statistics (``curation_source_mix``)
into an actual assembled training mix, plus the final shard writer.

Mirrors the standard LLM-corpus recipe (The Pile / Gopher / LLaMA data
mixes): source *s* with token mass ``T_s`` receives sampling weight
``w_s ∝ T_s^alpha`` — ``alpha=1`` reproduces natural proportions,
``alpha=0`` forces a uniform mix, and intermediate temperatures
up-weight small high-quality sources without letting any single crawl
dominate. The per-source token budget is ``w_s / Σw · token_budget``.

Two selection strategies with identical semantics at the budget level:

* ``sample_temperature_mixture`` — EXACT: documents are ordered by a
  deterministic 60-bit md5 priority hash and taken greedily until the
  source budget is exhausted. Tiny aggregates (per-source token mass
  and per-(source, hash-range sub-bucket) prefix offsets, broadcast
  back) + ONE shuffle of the corpus by (source, sub-bucket) for the
  running-sum window — the sub-buckets keep even a single giant
  source distributed. Reproducible across engines, runs, and cluster
  layouts — this is the oracle-checkable path.
* ``sample_temperature_mixture_approx`` — SCALE: keep a document iff
  ``priority_hash < keep_frac · 2^60`` with
  ``keep_frac = budget_s / T_s``. After the same tiny broadcast this
  is a narrow map-only filter — NO corpus shuffle at all, so at
  100 TB it runs at scan speed; kept token mass converges to the
  budget by hash uniformity (law of large numbers). Same priority
  hash, so the approx selection is a superset/subset-stable cousin
  of the exact one (both prefer low-hash docs).

Sharded export: ``shard = priority_hash mod n_shards`` is
embarrassingly parallel (no global sort, no ntile window — a global
ORDER BY is exactly what an export job must avoid at 100 TB); token
balance across shards follows from hash uniformity, verified by the
``export_hash_shards`` oracle entry and a skew test. The writer
repartitions on (shard, intra-shard file bucket) so every shard
directory is written by ``files_per_shard`` parallel tasks — one wide
exchange, bounded file sizes, then partition-pruned reads for
downstream trainers.

Reference analog: the reference ETL materializes one monolithic
training table (scripts/etl_pipeline.py write step); sharded,
mixture-weighted export is the 100 TB-scale generalization.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from turbine_maintenance_etl_spark.llm.text import token_count_expr

#: priority hashes are 60-bit (15 md5 hex chars) — chosen because the
#: fold is portable to engines without a hex→decimal conv (see the
#: DuckDB oracle), and 2^60 fits comfortably in a signed int64.
HASH_SPACE = 1 << 60


def priority_hash(id_col: str | Column, salt: str = "mix") -> Column:
    """Deterministic 60-bit priority in [0, 2^60): md5 of the id plus a
    salt, so independent operators (mixture vs sharding) see
    independent orderings of the same corpus. The hex→bigint fold is
    ``dedup.md5_hash64`` (r10 review: one home for the portable 60-bit
    contract — byte-identical input, so every stored priority and every
    oracle replay is unchanged)."""
    from turbine_maintenance_etl_spark.llm.dedup import md5_hash64

    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return md5_hash64(F.concat(c.cast("string"), F.lit("|" + salt)))


def _budgets_from_mass(
    per: DataFrame,
    token_budget: int,
    alpha: float,
    source_col: str,
) -> DataFrame:
    """(source, src_tokens DOUBLE) -> (source, src_tokens BIGINT,
    token_budget BIGINT) under temperature ``alpha`` — the ONE place
    the alpha-weight ladder and budget rounding live, so the exact
    sampler, the budgets API, and the DuckDB oracle cannot diverge.
    ``alpha=0.5`` uses ``sqrt`` explicitly: IEEE-754 requires sqrt to
    be correctly rounded, so weights are bit-identical across engines,
    which ``pow`` does not guarantee."""
    if alpha == 0.5:
        w = F.sqrt("src_tokens")
    elif alpha == 0.0:
        w = F.lit(1.0)
    elif alpha == 1.0:
        w = F.col("src_tokens")
    else:
        w = F.pow("src_tokens", F.lit(float(alpha)))
    powed = per.select(source_col, F.col("src_tokens"), w.alias("_w"))
    total = powed.agg(F.sum("_w").alias("_tw"))
    return powed.crossJoin(F.broadcast(total)).select(
        source_col,
        F.col("src_tokens").cast("bigint").alias("src_tokens"),
        F.round(F.col("_w") / F.col("_tw") * F.lit(float(token_budget)))
        .cast("bigint")
        .alias("token_budget"),
    )


def source_token_budgets(
    docs: DataFrame,
    token_budget: int,
    alpha: float = 0.5,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-source token budgets under temperature ``alpha``:
    ``budget_s = round(T_s^alpha / Σ T^alpha · token_budget)``.

    Returns a tiny (one row per source) DataFrame — always broadcast
    it back onto the corpus. ``alpha=0.5`` uses ``sqrt`` explicitly:
    IEEE-754 requires sqrt to be correctly rounded, so the weights are
    bit-identical across engines, which ``pow`` does not guarantee."""
    tok = token_count_expr(text_col).cast("double")
    per = docs.groupBy(source_col).agg(F.sum(tok).alias("src_tokens"))
    return _budgets_from_mass(per, token_budget, alpha, source_col)


def sample_temperature_mixture(
    docs: DataFrame,
    token_budget: int,
    alpha: float = 0.5,
    id_col: str = "doc_id",
    source_col: str = "source",
    text_col: str = "text",
    salt: str = "mix",
    num_subbuckets: int = 32,
) -> DataFrame:
    """EXACT mixture sample: per source, take documents in priority-hash
    order while the running token total BEFORE the document is still
    under the source budget (so any source with a positive budget
    contributes at least one document, and the mix overshoots each
    budget by at most one document).

    Output: the selected documents (id, source, n_tokens). Plan shape:
    tiny per-source agg → broadcast join → the per-source running sum
    computed DISTRIBUTED over fixed hash-range sub-buckets. The
    priority hash is uniform in [0, 2^60), so ``num_subbuckets``
    equal-width hash ranges split every source into balanced slices
    with NO quantile pass: a tiny per-(source, sub-bucket) token-sum
    aggregate, prefix-summed over its own (sources × sub-buckets)-row
    frame, gives each slice its running-total offset; the corpus-wide
    window then partitions on (source, sub-bucket) — even a single
    pathologically huge source spreads over ``num_subbuckets``
    reducers instead of serializing one.

    Tokenization dominates the cost, so the corpus is tokenized exactly
    ONCE: the narrow (id, source, n_tokens, _pri, _sub) frame —
    ~30 bytes/doc, no text — is materialized via the barrier, and the
    per-(source, sub-bucket) aggregate (feeding BOTH the source budgets
    and the prefix offsets), plus the final selected-row join, all read
    the materialized frame. (Round 5 shipped three tokenizing passes —
    budgets, offsets, output — regressing the sf0.1 bench 1.7×; this
    restores and beats the round-4 number.)"""
    sub_width = HASH_SPACE // num_subbuckets
    d = _narrow_keyed_frame(docs, id_col, source_col, text_col, salt).withColumn(
        "_sub", (F.col("_pri") / F.lit(sub_width)).cast("int")
    )
    from turbine_maintenance_etl_spark.ops.materialize import barrier

    d = barrier(d, "mixture-docs")
    # per-(source, sub-bucket) token mass: sources x num_subbuckets rows
    per_sub = d.groupBy(source_col, "_sub").agg(F.sum("n_tokens").alias("_subtoks"))
    # budgets from the sub-bucket sums (sum of exact bigints per source
    # == source_token_budgets' double sum for integer token counts);
    # shared ladder/rounding via _budgets_from_mass so the two paths
    # and the DuckDB oracle cannot diverge
    per = per_sub.groupBy(source_col).agg(
        F.sum("_subtoks").cast("double").alias("src_tokens")
    )
    budgets = _budgets_from_mass(per, token_budget, alpha, source_col).drop(
        "src_tokens"
    )
    joined = d.join(F.broadcast(budgets), source_col)
    w_off = (
        Window.partitionBy(source_col)
        .orderBy("_sub")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = per_sub.select(
        source_col,
        "_sub",
        F.coalesce(F.sum("_subtoks").over(w_off), F.lit(0)).alias("_off"),
    )
    # running sum inside each (source, sub-bucket) slice + the slice's
    # offset = the EXACT per-source running total in (_pri, id) order
    # (the sub-bucket is a monotone function of _pri, so slice order and
    # priority order agree)
    w = (
        Window.partitionBy(source_col, "_sub")
        .orderBy("_pri", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w) + F.col("_off")
    return (
        joined.join(F.broadcast(offsets), [source_col, "_sub"])
        .withColumn("_cum", cum)
        .filter(F.col("_cum") - F.col("n_tokens") < F.col("token_budget"))
        .select(id_col, source_col, "n_tokens")
    )


def sample_temperature_mixture_approx(
    docs: DataFrame,
    token_budget: int,
    alpha: float = 0.5,
    id_col: str = "doc_id",
    source_col: str = "source",
    text_col: str = "text",
    salt: str = "mix",
) -> DataFrame:
    """SCALE mixture sample: hash-threshold filter, no corpus shuffle.
    Keeps ``priority_hash < (budget_s / T_s) · 2^60`` (capped at 1),
    so expected kept token mass per source equals the budget.

    The corpus is scanned and TOKENIZED exactly once: the narrow
    (id, source, n_tokens, _pri) frame (~30 bytes/doc, no text) is
    materialized via the barrier, and both the budget aggregate and the
    threshold filter read it — without the barrier the thresholds
    subplan and the selection would each tokenize the full corpus (the
    same double-pass the exact sampler's round-5 regression measured at
    1.7×). No shuffle of the corpus either way — the filter stays a
    narrow map over the materialized frame."""
    from turbine_maintenance_etl_spark.ops.materialize import barrier

    d = barrier(
        _narrow_keyed_frame(docs, id_col, source_col, text_col, salt),
        "mixture-approx-docs",
    )
    per = d.groupBy(source_col).agg(
        F.sum("n_tokens").cast("double").alias("src_tokens")
    )
    budgets = _budgets_from_mass(per, token_budget, alpha, source_col)
    # a ZERO-token source (all-empty/NULL text) must keep NOTHING (r10
    # review): budget/0 is NULL under the ANSI-off session, F.least
    # skips NULLs, and the unguarded frac read 1.0 — every empty doc of
    # the source passed the cut while the exact sampler keeps zero,
    # breaking the documented superset/subset relationship
    frac = F.when(
        F.col("src_tokens") > 0,
        F.least(
            F.col("token_budget").cast("double") / F.col("src_tokens"), F.lit(1.0)
        ),
    ).otherwise(F.lit(0.0))
    thresholds = budgets.select(
        source_col,
        (frac * F.lit(float(HASH_SPACE))).cast("bigint").alias("_cut"),
    )
    return (
        d.join(F.broadcast(thresholds), source_col)
        .filter(F.col("_pri") < F.col("_cut"))
        .select(id_col, source_col, "n_tokens")
    )


def _narrow_keyed_frame(
    docs: DataFrame, id_col: str, source_col: str, text_col: str, salt: str
) -> DataFrame:
    """(id, source, n_tokens, _pri) with NULL-id / NULL-source rows
    EXCLUDED up front: a NULL id has a NULL priority hash and a NULL
    source has no budget row, so such docs can never be selected — but
    left in, their token mass would silently inflate the budgets and
    sub-bucket offsets of every real source (NULLs group and sort; the
    later equi-joins then drop the rows), under-filling every budget."""
    return docs.filter(
        F.col(id_col).isNotNull() & F.col(source_col).isNotNull()
    ).select(
        F.col(id_col),
        F.col(source_col),
        token_count_expr(text_col).cast("bigint").alias("n_tokens"),
        priority_hash(id_col, salt).alias("_pri"),
    )


def assign_hash_shards(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    salt: str = "shard",
    out_col: str = "shard",
) -> DataFrame:
    """Deterministic shard assignment: ``priority_hash mod n_shards``.
    Map-only; shard sizes concentrate around total/n by hash
    uniformity (no sort, no ntile — nothing global)."""
    return df.withColumn(
        out_col, F.pmod(priority_hash(id_col, salt), F.lit(n_shards)).cast("bigint")
    )


def write_hash_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
    salt: str = "shard",
    files_per_shard: int = 4,
) -> None:
    """Sharded training-data export: one exchange partitioned on
    (shard, intra-shard file bucket), then ``partitionBy(shard)`` so
    trainers get partition-pruned reads of ``shard=K/``.

    Why not ``repartition(n_shards, "shard")``: that routes each
    shard's ENTIRE data to one task (and hash collisions idle ~1/e of
    the tasks) — at 100 TB / 1024 shards that is a single task writing
    a ~100 GB file, a multi-hour straggler producing files downstream
    readers must swallow whole. The intra-shard bucket (a second,
    independent hash of the id) splits every shard across
    ``files_per_shard`` writer tasks: parallelism scales as
    n_shards × files_per_shard, each shard directory gets
    ~files_per_shard similar-sized files, and no task ever owns more
    than ~1/(n_shards·files_per_shard) of the corpus. Tune
    files_per_shard so one file ≈ a comfortable parquet size
    (corpus_bytes / n_shards / files_per_shard)."""
    if files_per_shard < 1:
        raise ValueError(f"files_per_shard must be >= 1, got {files_per_shard}")
    sharded = assign_hash_shards(df, n_shards, id_col, salt).withColumn(
        "_filebkt",
        F.pmod(priority_hash(id_col, salt + "|file"), F.lit(files_per_shard)),
    )
    (
        sharded.repartition(n_shards * files_per_shard, "shard", "_filebkt")
        .drop("_filebkt")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
