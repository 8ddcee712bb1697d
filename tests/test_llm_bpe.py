"""Tests for llm/bpe.py — trained byte-pair encoding.

Hand-verified merge learning, a pure-Python differential oracle for the
distributed apply, and the invariants token counts must satisfy.
"""

from __future__ import annotations

import pytest

from turbine_maintenance_etl_spark.llm.bpe import (
    EOW,
    bpe_token_stats,
    encode_word,
    learn_merges,
    train_bpe,
    word_frequencies,
)


def test_learn_merges_hand_computed():
    """Corpus: 'low' x5, 'lower' x2. Symbol stream 'l o w </w>' x5 +
    'l o w e r </w>' x2 -> ('l','o') and ('lo','w') dominate (7 each;
    lexicographic tie-break picks ('l','o') first)."""
    merges = learn_merges([("low", 5), ("lower", 2)], num_merges=3)
    assert merges[0] == ("l", "o")
    assert merges[1] == ("lo", "w")
    # third merge: 'low </w>' x5 beats 'low e' x2
    assert merges[2] == ("low", EOW)


def test_encode_word_rank_priority():
    merges = learn_merges([("low", 5), ("lower", 2)], num_merges=3)
    ranks = {p: i for i, p in enumerate(merges)}
    assert encode_word("low", ranks) == ["low" + EOW]
    assert encode_word("lower", ranks) == ["low", "e", "r", EOW]
    assert encode_word("xyz", ranks) == ["x", "y", "z", EOW]  # no merges apply


def test_distributed_apply_matches_pure_python(spark):
    """bpe_token_stats over the sf corpus == per-doc pure-Python
    encoding with the same merges, regardless of partitioning."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    merges = train_bpe(docs, num_merges=80)
    ranks = {p: i for i, p in enumerate(merges)}

    import re

    ws = re.compile(r"\s+", re.ASCII)  # same ASCII split as train AND apply
    got = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in bpe_token_stats(docs.repartition(7), merges).collect()
    }
    for row in docs.select("doc_id", "text").collect():
        words = [w for w in ws.split((row["text"] or "").lower()) if w]
        want = (len(words), sum(len(encode_word(w, ranks)) for w in words))
        assert got[row["doc_id"]] == want


def test_apply_tokenization_matches_training_side(spark):
    """A non-breaking space is NOT a word boundary for the Java-regex
    training tokenizer — the apply side must agree, or apply-side words
    desync from the trained frequency table."""
    docs = spark.createDataFrame(
        [(1, "foo bar baz")], "doc_id long, text string"
    )
    freqs = dict(word_frequencies(docs))
    assert freqs == {"foo bar": 1, "baz": 1}
    out = bpe_token_stats(docs, []).collect()[0]
    assert out["n_words"] == 2  # foo\xa0bar + baz, matching training


def test_token_stats_preserves_string_doc_ids(spark):
    """The mapInPandas output schema takes the id type from the input
    schema — corpora keyed by string doc ids round-trip unchanged
    instead of failing a hardcoded long coercion."""
    docs = spark.createDataFrame(
        [("doc-a", "hello world"), ("doc-b", "hello hello")],
        "doc_id string, text string",
    )
    out = bpe_token_stats(docs, [])
    assert dict(out.dtypes)["doc_id"] == "string"
    got = {r["doc_id"]: r["n_words"] for r in out.collect()}
    assert got == {"doc-a": 2, "doc-b": 2}


def test_more_merges_never_increase_tokens(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    few = train_bpe(docs, num_merges=10)
    many = train_bpe(docs, num_merges=120)
    t_few = {r["doc_id"]: r["n_bpe_tokens"] for r in bpe_token_stats(docs, few).collect()}
    t_many = {r["doc_id"]: r["n_bpe_tokens"] for r in bpe_token_stats(docs, many).collect()}
    assert all(t_many[k] <= t_few[k] for k in t_few)
    # and with zero merges, every word is chars + EOW
    t_zero = {r["doc_id"]: r.asDict() for r in bpe_token_stats(docs, []).collect()}
    for row in docs.select("doc_id", "text").collect():
        words = [w for w in (row["text"] or "").lower().split() if w]
        want = sum(len(w) + 1 for w in words)
        assert t_zero[row["doc_id"]]["n_bpe_tokens"] == want


def test_word_frequencies_deterministic_order(spark):
    docs = spark.createDataFrame(
        [(1, "b b a a c"), (2, "a b")], "doc_id long, text string"
    )
    freqs = word_frequencies(docs)
    assert freqs == [("a", 3), ("b", 3), ("c", 1)]  # count desc, word asc
