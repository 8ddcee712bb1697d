"""Temperature-mixture sampling and hash-sharded export (llm/mixture.py).

Verifies: budget allocation math (alpha extremes), determinism, the
exact-vs-approx agreement on kept token mass, shard balance by hash
uniformity, and the sharded writer round-trip."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from turbine_maintenance_etl_spark.llm.mixture import (
    HASH_SPACE,
    assign_hash_shards,
    priority_hash,
    sample_temperature_mixture,
    sample_temperature_mixture_approx,
    source_token_budgets,
    write_hash_shards,
)
from turbine_maintenance_etl_spark.llm.text import token_count_expr

SF001 = SF_DIR.replace("sf0.001", "sf0.01")  # mixture stats need >50 docs


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF001}/documents.parquet").cache()


def test_budgets_sum_to_token_budget(docs):
    b = source_token_budgets(docs, 8000, alpha=0.5).collect()
    total = sum(r.token_budget for r in b)
    # per-source rounding drifts the sum by at most n_sources/2
    assert abs(total - 8000) <= len(b)
    assert all(r.token_budget > 0 for r in b)


def test_alpha_extremes(docs):
    uniform = {r.source: r.token_budget for r in source_token_budgets(docs, 8000, alpha=0.0).collect()}
    natural = {r.source: r.token_budget for r in source_token_budgets(docs, 8000, alpha=1.0).collect()}
    src_tokens = {r.source: r.src_tokens for r in source_token_budgets(docs, 8000, alpha=1.0).collect()}
    # alpha=0: every source gets the same budget
    assert len(set(uniform.values())) == 1
    # alpha=1: budgets proportional to natural token mass (±1 for rounding)
    total = sum(src_tokens.values())
    for s, t in src_tokens.items():
        assert abs(natural[s] - round(t / total * 8000)) <= 1


def test_exact_mixture_respects_budgets(docs):
    sel = sample_temperature_mixture(docs, 8000, alpha=0.5)
    budgets = {r.source: r.token_budget for r in source_token_budgets(docs, 8000, alpha=0.5).collect()}
    per = {
        r.source: (r.n_docs, r.kept)
        for r in sel.groupBy("source")
        .agg(F.count("*").alias("n_docs"), F.sum("n_tokens").alias("kept"))
        .collect()
    }
    max_doc = docs.select(F.max(token_count_expr("text"))).first()[0]
    for s, budget in budgets.items():
        n_docs, kept = per[s]
        assert n_docs >= 1  # positive budget → at least one doc
        # greedy prefix: overshoot bounded by one document
        assert kept < budget + max_doc
        # and the selection is maximal: kept tokens reach the budget
        # unless the source ran out of documents entirely
        src_total = docs.filter(F.col("source") == s).select(
            F.sum(token_count_expr("text"))
        ).first()[0]
        assert kept >= min(budget, src_total)


def test_exact_mixture_deterministic(docs):
    a = sorted(r.doc_id for r in sample_temperature_mixture(docs, 8000).collect())
    b = sorted(r.doc_id for r in sample_temperature_mixture(docs, 8000).collect())
    assert a == b and len(a) > 0


def test_approx_mixture_tracks_budget_map_only(docs):
    sel = sample_temperature_mixture_approx(docs, 8000, alpha=0.5)
    kept = sel.agg(F.sum("n_tokens")).first()[0]
    # hash-threshold keep: expected token mass == budget; at 500 docs the
    # binomial spread is well inside ±35%
    assert 0.65 * 8000 <= kept <= 1.35 * 8000
    # scale property: no corpus shuffle — the plan has no window/sort,
    # the threshold table broadcasts, and the only exchanges belong to
    # the tiny budget aggregate
    plan = sel._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan and "Sort [" not in plan
    assert "BroadcastHashJoin" in plan


def test_approx_budget_overflow_caps_at_one(docs):
    # budget far above the corpus: keep_frac caps at 1 → everything kept
    sel = sample_temperature_mixture_approx(docs, 10_000_000, alpha=0.5)
    assert sel.count() == docs.count()


def test_priority_hash_range(docs):
    stats = docs.select(priority_hash("doc_id").alias("h")).agg(
        F.min("h").alias("lo"), F.max("h").alias("hi")
    ).first()
    assert 0 <= stats.lo and stats.hi < HASH_SPACE


def test_shard_balance_and_coverage(docs):
    sharded = assign_hash_shards(docs.select("doc_id"), 8)
    per = {r.shard: r.n for r in sharded.groupBy("shard").agg(F.count("*").alias("n")).collect()}
    assert set(per) == set(range(8))
    mean = sum(per.values()) / 8
    assert all(0.5 * mean <= n <= 1.5 * mean for n in per.values())
    # disjoint + exhaustive
    assert sum(per.values()) == docs.count()


def test_write_hash_shards_roundtrip(docs, tmp_path):
    out = os.path.join(str(tmp_path), "shards")
    d = docs.select("doc_id", "source")
    write_hash_shards(d, out, n_shards=4)
    dirs = sorted(p for p in os.listdir(out) if p.startswith("shard="))
    assert dirs == [f"shard={i}" for i in range(4)]
    back = d.sparkSession.read.parquet(out)
    assert back.count() == d.count()
    # partition-pruned read of one shard touches only that directory
    one = d.sparkSession.read.parquet(out).filter(F.col("shard") == 2)
    assert 0 < one.count() < d.count()


def test_write_hash_shards_splits_each_shard_across_files(docs, tmp_path):
    """files_per_shard > 1 must yield MULTIPLE parquet files inside each
    shard directory (multiple writer tasks per shard — the 100 TB
    anti-straggler property), without changing the row contents."""
    out = os.path.join(str(tmp_path), "shards_multi")
    d = docs.select("doc_id", "source")
    write_hash_shards(d, out, n_shards=2, files_per_shard=4)
    for shard_dir in ("shard=0", "shard=1"):
        files = [
            f
            for f in os.listdir(os.path.join(out, shard_dir))
            if f.endswith(".parquet")
        ]
        assert len(files) >= 2, f"{shard_dir} written by a single task: {files}"
    back = d.sparkSession.read.parquet(out)
    assert back.count() == d.count()
    assert "_filebkt" not in back.columns
    with pytest.raises(ValueError, match="files_per_shard"):
        write_hash_shards(d, out, n_shards=2, files_per_shard=0)


def test_mixture_excludes_null_id_and_source(docs):
    """Docs with NULL id or NULL source can never be selected (no hash /
    no budget row) — they must also not INFLATE the budgets or offsets:
    selection over a corpus polluted with NULL rows equals selection
    over the clean corpus exactly, for both samplers."""
    clean = docs.select("doc_id", "source", "text")
    polluted = clean.unionByName(
        clean.limit(30).select(
            F.lit(None).cast("long").alias("doc_id"), "source", "text"
        )
    ).unionByName(
        clean.limit(30).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            F.lit(None).cast("string").alias("source"),
            "text",
        )
    )
    for fn in (sample_temperature_mixture, sample_temperature_mixture_approx):
        want = sorted(r.doc_id for r in fn(clean, 8000).collect())
        got = sorted(r.doc_id for r in fn(polluted, 8000).collect())
        assert got == want, fn.__name__
