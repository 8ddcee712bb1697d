"""Round-11 optimization-candidate pins. Two restructures were built,
A/B-measured and REJECTED this round (see OPTIMIZATION_r11.md: the LM
gram-score fold and the exact-dedup payload trim lost at the benched
scale — fixed score-table-build jobs swamped the per-occurrence
savings). These tests keep the invariants that made the candidates
evaluable — fused-vs-generic scorer equivalence and the exact-dedup
corner semantics — so any future re-attempt starts from pinned
behavior instead of re-deriving it."""

from __future__ import annotations


def _corpus(spark):
    # repeated grams (pruned survivors), singleton grams (backoff), a
    # token-less doc (NULL-score preservation), duplicate texts
    rows = [
        (1, "the turbine runs hot and the turbine runs cold"),
        (2, "the turbine runs hot and the turbine runs cold"),
        (3, "a completely different singleton document here"),
        (4, "the turbine runs hot"),
        (5, ""),
        (6, None),
        (7, "zz yy xx ww vv uu"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_sb3_fused_equals_generic_ladder(spark):
    """The fused self-scoring path (scalars ride a broadcast frame) must
    produce identical rows to the explicit train+score API — same
    model, same pruning."""
    from turbine_maintenance_etl_spark.llm.lm import (
        sb3_perplexity_scores,
        score_sb3_perplexity,
        train_sb3_counts,
    )

    df = _corpus(spark)
    fused = {r["doc_id"]: r.asDict() for r in sb3_perplexity_scores(df).collect()}
    generic = {
        r["doc_id"]: r.asDict()
        for r in score_sb3_perplexity(df, *train_sb3_counts(df)).collect()
    }
    assert fused == generic
    assert fused[5]["n_trigrams"] == 0 and fused[5]["perplexity"] is None


def test_bigram_fused_equals_generic(spark):
    from turbine_maintenance_etl_spark.llm.lm import (
        perplexity_scores,
        score_perplexity,
        train_bigram_counts,
        vocab_size,
    )

    df = _corpus(spark)
    fused = {r["doc_id"]: r.asDict() for r in perplexity_scores(df).collect()}
    bigrams, histories = train_bigram_counts(df)
    generic = {
        r["doc_id"]: r.asDict()
        for r in score_perplexity(df, bigrams, histories, vocab_size(bigrams)).collect()
    }
    assert fused == generic


def test_exact_dedup_duplicate_id_across_classes(spark):
    """A min-id row of one content class must not drag along a
    different-content row that shares its id (streaming batches carry
    duplicate ids): survivorship is per (content class, id)."""
    from turbine_maintenance_etl_spark.llm.dedup import exact_dedup

    df = spark.createDataFrame(
        [(3, "B"), (5, "A"), (5, "B")], "doc_id long, text string"
    )
    got = sorted((r["doc_id"], r["text"]) for r in exact_dedup(df).collect())
    assert got == [(3, "B"), (5, "A")]


def test_exact_dedup_null_text_rows_all_survive(spark):
    from turbine_maintenance_etl_spark.llm.dedup import exact_dedup

    df = spark.createDataFrame(
        [(1, None), (2, None), (3, "x"), (4, "x")], "doc_id long, text string"
    )
    got = sorted(r["doc_id"] for r in exact_dedup(df).collect())
    assert got == [1, 2, 3]
