"""Regressions for the round-10 self-review findings on the LLM text /
quality / mixture / embed layer: legacy size(NULL) = -1 leaks, the
data card's NULL-text duplication conflation, geometry-derived chunk
token counts, zero-token sources through the approx mixture sampler,
string doc ids through the encoder, and the priority-hash fold reuse."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_bpe_ish_token_count_null_text_is_zero(spark):
    from turbine_maintenance_etl_spark.llm.text import bpe_ish_token_count_expr

    df = spark.createDataFrame([("a b-c",), (None,), ("",)], "text string")
    got = [r.n for r in df.select(bpe_ish_token_count_expr("text").alias("n")).collect()]
    assert got == [4, 0, 0]  # 'a', 'b', '-', 'c'; NULL/empty -> 0, never -1


def test_segment_repetition_signals_null_text(spark):
    from turbine_maintenance_etl_spark.llm.quality import segment_repetition_signals

    df = spark.createDataFrame(
        [(1, "foo\nbar\nfoo"), (2, None)], "doc_id int, text string"
    )
    got = {r.doc_id: r.n_segments for r in segment_repetition_signals(df).collect()}
    assert got[1] == 3
    assert got[2] == 0, "NULL text must read as zero segments, not size(NULL) = -1"


def test_chunk_tokens_geometry_matches_retokenization(spark):
    """chunk_tokens now comes from slice geometry; it must equal the
    re-tokenized count of the rebuilt chunk text on every chunk,
    including the short tail."""
    from turbine_maintenance_etl_spark.llm.text import chunk_documents, token_count_expr

    texts = [
        (1, " ".join(f"t{i}" for i in range(150))),  # full + tail chunks
        (2, " ".join(f"t{i}" for i in range(64))),   # exactly one window
        (3, "one two three"),                        # shorter than a window
        (4, None),
        (5, ""),
    ]
    df = spark.createDataFrame(texts, "doc_id int, text string")
    out = chunk_documents(df, chunk_tokens=64, overlap=8)
    bad = out.filter(
        F.col("chunk_tokens") != token_count_expr(F.col("chunk_text"))
    ).count()
    assert bad == 0
    assert out.filter(F.col("doc_id").isin(4, 5)).count() == 0
    tail = out.filter(F.col("doc_id") == 1).orderBy(F.desc("chunk_id")).first()
    assert tail.chunk_tokens < 64  # short tail kept, counted by geometry


def test_corpus_report_null_text_not_conflated(spark):
    """NULL-text rows must each count as distinct (dedup's 'absent
    content, not shared content' doctrine): a corpus of unique texts
    plus NULL rows reports zero exact duplication."""
    from turbine_maintenance_etl_spark.llm.text import corpus_report

    rows = [(i, f"unique text number {i} with words", "s", "en") for i in range(5)]
    rows += [(10 + i, None, "s", "en") for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id int, text string, source string, lang string")
    card = {r.metric: r.value for r in corpus_report(df).collect()}
    assert card["n_docs"] == 9.0
    assert card["n_distinct_texts"] == 9.0
    assert card["exact_dup_frac"] == 0.0
    assert card["n_empty_docs"] == 4.0
    # a REAL duplicate still registers
    dup = spark.createDataFrame(
        [(1, "same text here", "s", "en"), (2, "same text here", "s", "en")],
        "doc_id int, text string, source string, lang string",
    )
    card2 = {r.metric: r.value for r in corpus_report(dup).collect()}
    assert card2["exact_dup_frac"] == 0.5


def test_mixture_approx_zero_token_source_keeps_nothing(spark):
    """A source whose every doc is empty/NULL text has src_tokens = 0:
    budget/0 is NULL under ANSI-off and F.least skipped it, so the
    unguarded frac read 1.0 and ALL empty docs passed the cut; the
    exact sampler keeps zero for that source."""
    from turbine_maintenance_etl_spark.llm.mixture import (
        sample_temperature_mixture,
        sample_temperature_mixture_approx,
    )

    rows = [(i, "web", "some real tokens " * 5) for i in range(20)]
    rows += [(100 + i, "deadsrc", "") for i in range(10)]
    rows += [(200 + i, "deadsrc", None) for i in range(5)]
    docs = spark.createDataFrame(rows, "doc_id int, source string, text string")
    approx = sample_temperature_mixture_approx(docs, token_budget=50)
    assert approx.filter(F.col("source") == "deadsrc").count() == 0
    exact = sample_temperature_mixture(docs, token_budget=50)
    assert exact.filter(F.col("source") == "deadsrc").count() == 0
    assert approx.count() > 0  # the live source still fills its budget


def test_embed_text_string_ids(spark):
    from turbine_maintenance_etl_spark.llm.embed import embed_text

    df = spark.createDataFrame(
        [("doc-a", "hello world"), ("doc-b", "other text")], "doc_id string, text string"
    )
    out = embed_text(df, dim=16).collect()
    assert {r.doc_id for r in out} == {"doc-a", "doc-b"}
    assert all(len(r.embedding) == 16 for r in out)


def test_priority_hash_fold_unchanged_after_reuse(spark):
    """priority_hash now routes through dedup.md5_hash64; the produced
    values must be byte-identical to the original inline fold (stored
    priorities and every oracle replay depend on them)."""
    from turbine_maintenance_etl_spark.llm.mixture import priority_hash

    df = spark.createDataFrame([(1,), (42,), (999999,)], "doc_id int")
    legacy = F.conv(
        F.substring(
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("|mix"))), 1, 15
        ),
        16,
        10,
    ).cast("bigint")
    rows = df.select(
        priority_hash("doc_id").alias("new"), legacy.alias("old")
    ).collect()
    assert all(r.new == r.old for r in rows)
