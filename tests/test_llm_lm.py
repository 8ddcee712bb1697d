"""Tests for llm/lm.py — n-gram LM perplexity scoring.

The sf-data self-perplexity path is oracle-checked in test_oracle.py;
these tests pin hand-computed probabilities, the train/score split
(unseen words and histories — the branch self-perplexity can't reach),
and the quality-ordering property the CCNet gate depends on.
"""

from __future__ import annotations

import math

import pytest

from turbine_maintenance_etl_spark.llm.lm import (
    perplexity_scores,
    score_perplexity,
    train_bigram_counts,
    vocab_size,
)


@pytest.fixture(scope="module")
def train_docs(spark):
    rows = [
        (1, "the cat sat"),
        (2, "the cat ran"),
        (3, "the dog sat"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_hand_computed_bigram_probs(spark, train_docs):
    bigrams, histories = train_bigram_counts(train_docs)
    big = {(r["w1"], r["w2"]): r["c12"] for r in bigrams.collect()}
    hist = {r["w1"]: r["c1"] for r in histories.collect()}
    # corpus bigrams: (<s>,the)x3 (the,cat)x2 (the,dog)x1 (cat,sat)x1
    #                 (cat,ran)x1 (dog,sat)x1
    assert big[("<s>", "the")] == 3
    assert big[("the", "cat")] == 2
    assert hist["the"] == 3 and hist["<s>"] == 3
    # predicted vocab = {the, cat, dog, sat, ran}
    assert vocab_size(bigrams) == 5


def test_self_perplexity_exact_value(spark, train_docs):
    """doc 1 'the cat sat': lp = log p(the|<s>) + log p(cat|the)
    + log p(sat|cat), add-k k=0.5, V=5."""
    out = {r["doc_id"]: r.asDict() for r in perplexity_scores(train_docs).collect()}
    p1 = (3 + 0.5) / (3 + 0.5 * 5)
    p2 = (2 + 0.5) / (3 + 0.5 * 5)
    p3 = (1 + 0.5) / (2 + 0.5 * 5)
    avg = (math.log(p1) + math.log(p2) + math.log(p3)) / 3
    assert out[1]["n_bigrams"] == 3
    assert out[1]["avg_logprob"] == round(avg, 4)
    assert out[1]["perplexity"] == round(math.exp(-avg), 4)


def test_unseen_words_and_empty_docs(spark, train_docs):
    bigrams, histories = train_bigram_counts(train_docs)
    v = vocab_size(bigrams)
    score = spark.createDataFrame(
        [
            (10, "the cat sat"),        # fully in-domain
            (11, "zebra quark flux"),   # every history unseen -> uniform 1/V
            (12, ""),                   # no tokens -> NULL scores, row kept
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in score_perplexity(score, bigrams, histories, v).collect()
    }
    # unseen histories (zebra, quark) give exactly uniform 1/V; the
    # (<s>, zebra) bigram has a SEEN history <s> with an unseen word.
    p_bos_unseen = 0.5 / (3 + 0.5 * v)
    avg11 = (math.log(p_bos_unseen) + 2 * math.log(1.0 / v)) / 3
    assert out[11]["avg_logprob"] == round(avg11, 4)
    assert out[12]["n_bigrams"] == 0 and out[12]["perplexity"] is None
    # in-domain text must score strictly better than OOV noise
    assert out[10]["perplexity"] < out[11]["perplexity"]


def test_quality_ordering_on_mixed_corpus(spark):
    """Fluent repeated-domain text scores lower perplexity than random
    character noise under a self-trained LM — the property the CCNet
    quality gate relies on."""
    fluent = [(i, "the quick brown fox jumps over the lazy dog") for i in range(10)]
    noise = [(100 + i, f"zzq{i}x wvu{i}t plm{i}k hgf{i}d") for i in range(3)]
    df = spark.createDataFrame(fluent + noise, "doc_id long, text string")
    out = perplexity_scores(df).collect()
    fl = [r["perplexity"] for r in out if r["doc_id"] < 100]
    nz = [r["perplexity"] for r in out if r["doc_id"] >= 100]
    assert max(fl) < min(nz)


def test_curation_v2_cutoff_variant_is_map_only_and_consistent(spark):
    """The precomputed-cutoff gate (100 TB path) keeps exactly the docs
    at or under the cutoff, and with cutoff = the rank variant's
    boundary perplexity the two paths keep the same documents (modulo
    boundary ties, which the fixture avoids)."""
    from pyspark.sql import functions as F

    from turbine_maintenance_etl_spark.llm.curation import curate_corpus_v2
    from turbine_maintenance_etl_spark.llm.lm import perplexity_scores
    from turbine_maintenance_etl_spark.llm.text import add_quality_signals

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

    q = add_quality_signals(docs)
    kept = q.filter((q.n_tokens >= 20) & (q.stopword_ratio >= 0.05)).select(
        *docs.columns
    )
    ppl = perplexity_scores(kept)
    vals = sorted(r["perplexity"] for r in ppl.collect())
    cutoff = vals[int(0.9 * len(vals)) - 1]

    by_rank = curate_corpus_v2(docs).select("doc_id").distinct()
    by_cut = curate_corpus_v2(docs, ppl_cutoff=cutoff).select("doc_id").distinct()
    assert by_rank.count() == by_cut.count()
    assert by_rank.exceptAll(by_cut).count() == 0
