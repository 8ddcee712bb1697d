"""Edge-case tests for llm/quality.py: Gopher-style repetition signals
and benchmark decontamination (the sf-data paths are oracle-checked in
test_oracle.py; these pin hand-computed values and degenerate inputs)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from turbine_maintenance_etl_spark.llm.quality import (
    decontamination_scores,
    repetition_signals,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "a b a b a b"),            # heavy bigram repetition
        (2, "x"),                      # single word: no bigrams
        (3, ""),                       # empty text
        (4, "# 1 ... 2 # ..."),        # symbols, no alphabetic words
        (5, "one two three four"),     # all distinct
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repetition_signals_hand_computed(docs):
    out = {r["doc_id"]: r.asDict() for r in repetition_signals(docs).collect()}

    r1 = out[1]  # tokens: a b a b a b -> bigrams: ab ba ab ba ab
    assert r1["n_words"] == 6 and r1["n_bigrams"] == 5
    assert r1["dup_word_frac"] == round((6 - 2) / 6, 4)
    assert r1["dup_bigram_frac"] == round((5 - 2) / 5, 4)
    assert r1["top_bigram_frac"] == round(3 / 5, 4)  # 'a b' x3
    assert r1["mean_word_len"] == 1.0
    assert r1["alpha_word_frac"] == 1.0

    r2 = out[2]
    assert r2["n_words"] == 1 and r2["n_bigrams"] == 0
    assert r2["dup_word_frac"] == 0.0
    assert r2["dup_bigram_frac"] is None  # 0-denominator -> NULL
    assert r2["top_bigram_frac"] is None

    r3 = out[3]
    assert r3["n_words"] == 0
    assert r3["dup_word_frac"] is None and r3["mean_word_len"] is None

    r4 = out[4]  # '#' x2 + '...' x2 over 6 words
    assert r4["symbol_word_ratio"] == round(4 / 6, 4)
    assert r4["alpha_word_frac"] == 0.0

    r5 = out[5]
    assert r5["dup_word_frac"] == 0.0 and r5["dup_bigram_frac"] == 0.0
    assert r5["top_bigram_frac"] == round(1 / 3, 4)


def test_decontamination_hand_computed(spark):
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta")], "doc_id long, text string"
    )  # trigrams: {alpha beta gamma, beta gamma delta}
    cands = spark.createDataFrame(
        [
            (1, "alpha beta gamma epsilon"),  # 2 trigrams, 1 contaminated
            (2, "zeta eta theta iota"),       # 2 trigrams, 0 contaminated
            (3, "alpha beta gamma delta"),    # exact benchmark doc: 2/2
            (4, "too short"),                 # no trigrams
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in decontamination_scores(cands, bench).collect()
    }
    assert out[1] == {
        "doc_id": 1, "n_shingles": 2, "n_contaminated": 1,
        "contamination": 0.5, "flagged": 0,
    }
    assert out[2]["n_contaminated"] == 0 and out[2]["flagged"] == 0
    assert out[3]["contamination"] == 1.0 and out[3]["flagged"] == 1
    assert out[4] == {
        "doc_id": 4, "n_shingles": 0, "n_contaminated": 0,
        "contamination": None, "flagged": 0,
    }


def test_repetition_signals_zero_shuffle(spark, docs):
    plan = repetition_signals(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_decontamination_broadcasts_benchmark(spark):
    """The benchmark shingle set must join via broadcast hash join —
    never a shuffle of the (huge) candidate side on the shingle key."""
    bench = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    cands = spark.createDataFrame([(2, "a b c x y")], "doc_id long, text string")
    plan = (
        decontamination_scores(cands, bench)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan


def test_repetition_signals_pathological_giant_doc(spark):
    """Scale guard: one 200k-token document must compute in-row without
    blowup (the zero-shuffle design claims O(B log B) per row — a giant
    row is the worst case, not a wide corpus)."""
    words = ["w%d" % (i % 50_000) for i in range(200_000)] + ["hot", "pair"] * 500
    df = spark.createDataFrame([(1, " ".join(words))], "doc_id long, text string")
    r = repetition_signals(df).collect()[0]
    assert r["n_words"] == 201_000
    assert r["n_bigrams"] == 200_999
    # 'hot pair' occurs 500x, 'pair hot' 499x; every other bigram ≤ 4x
    assert r["top_bigram_frac"] == round(500 / 200_999, 4)


def test_redact_pii_hand_computed(spark):
    from turbine_maintenance_etl_spark.llm.quality import redact_pii

    rows = [
        (1, "mail a.b+c@x-y.co.uk and call 555 0142 or 555-9999"),
        (2, "no pii here"),
        (3, "double jane@a.io joe@b.io"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in redact_pii(df).collect()}
    assert got[1]["n_emails"] == 1 and got[1]["n_phones"] == 2
    assert got[1]["redacted"] == "mail <EMAIL> and call <PHONE> or <PHONE>"
    assert got[2]["n_emails"] == 0 and got[2]["redacted"] == "no pii here"
    assert got[3]["n_emails"] == 2 and got[3]["redacted"] == "double <EMAIL> <EMAIL>"


def test_segment_repetition_hand_computed(spark):
    """Gopher duplicate-line metrics on a crafted doc set: repeated
    lines, all-unique lines, empty text, and Gopher's all-copies (not
    extras-only) char-mass rule."""
    from turbine_maintenance_etl_spark.llm.quality import segment_repetition_signals

    rows = [
        # 4 lines: "abc" twice (3 chars each), "x" once, "long line!" once
        (1, "abc\nx\nabc\nlong line!"),
        # all unique
        (2, "alpha\nbeta\ngamma"),
        # triple repeat: "zz" x3 (2 chars) + "q" -> dup mass 6 of 7
        (3, "zz\nzz\nzz\nq"),
        # empty / whitespace-only -> 0 segments, NULL fracs
        (4, "   \n  \n"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in segment_repetition_signals(df).collect()}

    assert got[1]["n_segments"] == 4
    assert got[1]["n_dup_segments"] == 1          # one extra occurrence
    assert got[1]["dup_seg_frac"] == 0.25
    # char mass counts BOTH "abc" copies: 6 / (3+1+3+10) = 6/17
    assert abs(got[1]["dup_seg_char_frac"] - 6 / 17) < 1e-4

    assert got[2]["n_dup_segments"] == 0
    assert got[2]["dup_seg_frac"] == 0.0
    assert got[2]["dup_seg_char_frac"] == 0.0

    assert got[3]["n_segments"] == 4
    assert got[3]["n_dup_segments"] == 2
    assert abs(got[3]["dup_seg_char_frac"] - 6 / 7) < 1e-4

    assert got[4]["n_segments"] == 0
    assert got[4]["dup_seg_frac"] is None
    assert got[4]["dup_seg_char_frac"] is None


def test_segment_repetition_paragraph_boundary(spark):
    """The boundary regex is a real parameter: the same text yields
    different segmentations for line vs paragraph splitting."""
    from turbine_maintenance_etl_spark.llm.quality import segment_repetition_signals

    text = "para one\nsame para\n\npara one\nsame para"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    by_line = segment_repetition_signals(df).collect()[0]
    by_para = segment_repetition_signals(df, sep_regex=r"\n\n+").collect()[0]
    # line grain: 4 lines, each appearing twice -> 2 extras
    assert by_line["n_segments"] == 4 and by_line["n_dup_segments"] == 2
    assert by_line["dup_seg_char_frac"] == 1.0
    # paragraph grain: 2 identical multi-line paragraphs
    assert by_para["n_segments"] == 2 and by_para["n_dup_segments"] == 1
    assert by_para["dup_seg_char_frac"] == 1.0


def test_bloom_decontamination_exact_differential(spark):
    """bloom_decontamination(exact_verify=True) must EQUAL
    decontamination_scores row-for-row (the bloom is a prefilter; the
    verify join removes its false positives), on a corpus large enough
    that false positives actually occur before verification."""
    from turbine_maintenance_etl_spark.llm.quality import bloom_decontamination

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bench = docs.filter(F.col("source") == "src0")
    cands = docs.filter(F.col("source") != "src0")
    exact = {
        r["doc_id"]: r.asDict()
        for r in decontamination_scores(cands, bench).collect()
    }
    bloom = {
        r["doc_id"]: r.asDict()
        # high fpp so the verify join has real false positives to kill
        for r in bloom_decontamination(cands, bench, fpp=0.2).collect()
    }
    assert bloom == exact


def test_bloom_decontamination_upper_bound_and_fpr(spark):
    """exact_verify=False: no false negatives ever (per-doc
    n_contaminated >= exact), and the observed false-positive rate on
    clean shingles stays near the configured fpp."""
    from turbine_maintenance_etl_spark.llm.quality import bloom_decontamination

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bench = docs.filter(F.col("source") == "src0")
    cands = docs.filter(F.col("source") != "src0")
    exact = {
        r["doc_id"]: r.asDict()
        for r in decontamination_scores(cands, bench).collect()
    }
    ub = {
        r["doc_id"]: r.asDict()
        for r in bloom_decontamination(
            cands, bench, fpp=0.01, exact_verify=False
        ).collect()
    }
    assert set(ub) == set(exact)
    extra = clean = 0
    for doc_id, e in exact.items():
        u = ub[doc_id]
        assert u["n_shingles"] == e["n_shingles"]
        assert u["n_contaminated"] >= e["n_contaminated"], doc_id  # no false negs
        extra += u["n_contaminated"] - e["n_contaminated"]
        clean += e["n_shingles"] - e["n_contaminated"]
    assert clean > 1000  # the corpus exercises the filter meaningfully
    assert extra / clean < 0.03  # ~3x slack over fpp=0.01


def test_bloom_decontamination_empty_and_degenerate(spark):
    """Empty benchmark -> nothing contaminated; candidates shorter than
    the shingle width survive with n_shingles=0 / NULL contamination."""
    from turbine_maintenance_etl_spark.llm.quality import bloom_decontamination

    bench = spark.createDataFrame([], "doc_id long, text string")
    cands = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "too short")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r.asDict() for r in bloom_decontamination(cands, bench).collect()}
    assert out[1]["n_shingles"] == 2 and out[1]["n_contaminated"] == 0
    assert out[2] == {
        "doc_id": 2, "n_shingles": 0, "n_contaminated": 0,
        "contamination": None, "flagged": 0,
    }


def test_normalized_dedup_collapses_variants(spark):
    from turbine_maintenance_etl_spark.llm.text import normalized_dedup

    rows = [
        (1, "Hello, World! Item 42"),
        (2, "hello world item 99"),        # same class: case/punct/digits
        (3, "hello   WORLD... item 57!"),  # same class: whitespace/punct
        (4, "hello world item 0"),         # different: digit RUN length
        (5, "totally different text"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r.asDict() for r in normalized_dedup(df).collect()}
    assert out[1]["survivor"] is True
    assert out[2]["survivor"] is False and out[3]["survivor"] is False
    assert out[2]["norm_hash"] == out[1]["norm_hash"] == out[3]["norm_hash"]
    # per-digit zeroing is faithful CCNet: "42" -> "00" != "0"
    assert out[4]["survivor"] is True and out[4]["norm_hash"] != out[1]["norm_hash"]
    assert out[5]["survivor"] is True


def test_fuzzy_decontamination_planted_near_match(spark):
    """A lightly reworded benchmark doc (high 3-gram Jaccard, zero
    exact-doc match) is caught; an unrelated doc is not; decontaminate
    drops exactly the hits."""
    from turbine_maintenance_etl_spark.llm.quality import (
        decontaminate,
        fuzzy_decontamination,
    )

    base = "the quick brown fox jumps over the lazy dog near the quiet river bank today"
    docs = spark.createDataFrame(
        [
            (1, base + " indeed"),                      # near-dup of bench 100
            (2, "completely different text about turbines and maintenance schedules"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(100, base)], "doc_id long, text string")
    hits = fuzzy_decontamination(docs, bench, threshold=0.2)
    got = {(r["doc_id"], r["bench_id"]) for r in hits.collect()}
    assert got == {(1, 100)}
    jac = hits.collect()[0]["jaccard"]
    assert 0.5 < jac < 1.0  # near, not exact
    survivors = decontaminate(docs, bench, threshold=0.2)
    assert [r["doc_id"] for r in survivors.collect()] == [2]


def test_fuzzy_decontamination_broadcasts_benchmark(spark):
    """Both benchmark-side joins (bucket probe + shingle verify) must
    broadcast — the corpus side never shuffles on a benchmark key."""
    from turbine_maintenance_etl_spark.llm.quality import fuzzy_decontamination

    docs = spark.createDataFrame([(1, "a b c d e f g")], "doc_id long, text string")
    bench = spark.createDataFrame([(9, "a b c d e f g")], "doc_id long, text string")
    hits = fuzzy_decontamination(docs, bench)
    hits.collect()  # let AQE finalize (doc-side join is size-converted)
    plan = hits._jdf.queryExecution().executedPlan().toString()
    # bucket probe + shingle verify both build on the benchmark side
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_text_signals_null_caps_and_whitespace_edges(spark):
    """NULL text reads as an EMPTY document (n_tokens 0, 'und' language,
    NULL ratios) — under the ANSI-off session an unguarded size(NULL)
    is -1 and previously classified NULL docs as English with
    stopword_ratio 1.0. Stopwords match case-insensitively, and
    mean_token_len is exact under multi-space text."""
    from pyspark.sql import functions as F

    from turbine_maintenance_etl_spark.llm.text import (
        add_language_scores,
        add_quality_signals,
    )

    df = spark.createDataFrame(
        [
            (1, None),
            (2, "THE REPORT OF THE BOARD WAS READ TO THE MEMBERS"),
            (3, "  hi   there  "),
        ],
        "doc_id long, text string",
    )
    q = {r["doc_id"]: r for r in add_quality_signals(df).collect()}
    assert q[1]["n_tokens"] == 0 and q[1]["stopword_ratio"] is None
    assert q[2]["stopword_ratio"] is not None and q[2]["stopword_ratio"] >= 0.3
    assert abs(q[3]["mean_token_len"] - (2 + 5) / 2) < 1e-9  # hi, there

    lang = {r["doc_id"]: r for r in add_language_scores(df).collect()}
    assert lang[1]["lang_pred"] == "und"
    assert lang[2]["lang_pred"] == "en"


def test_normalized_dedup_preserves_unicode_scripts(spark):
    """Two different non-Latin documents must NOT collapse into one
    dedup class (an ASCII-only normalization regex mapped every
    non-Latin doc to the empty string — mass false-positive dedup),
    and punctuation-only docs each survive as their own class."""
    from turbine_maintenance_etl_spark.llm.text import normalized_dedup

    df = spark.createDataFrame(
        [
            (1, "风力涡轮机需要定期维护"),
            (2, "数据管道每天处理大量文件"),
            (3, "Die Turbine läuft über Nacht"),
            (4, "die turbine lauft uber nacht"),  # NOT the same (umlauts differ)
            (5, "!!! ... ???"),
            (6, "--- ,,, ;;;"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["norm_hash"], r["survivor"]) for r in normalized_dedup(df).collect()}
    assert got[1][0] != got[2][0] and got[1][1] and got[2][1]
    assert got[3][0] != got[4][0]  # accented letters preserved, not stripped
    assert got[5][0] is None and got[6][0] is None  # empty normalization
    assert got[5][1] and got[6][1]  # each its own survivor


def test_corpus_report_without_source_lang_columns(spark):
    """The generic (df, text_col, id_col) signature must work on a
    corpus without 'source'/'lang' — diversity metrics appear only for
    columns the frame carries."""
    from turbine_maintenance_etl_spark.llm.text import corpus_report

    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today")],
        "doc_id long, text string",
    )
    metrics = {r["metric"] for r in corpus_report(df).collect()}
    assert "n_docs" in metrics and "total_tokens" in metrics
    assert "n_sources" not in metrics and "n_langs" not in metrics


def test_lm_broadcast_knob_degrades_to_shuffle_join(spark, monkeypatch):
    """SPARK_GRAFT_LM_BROADCAST=off drops the model-table broadcast
    hints so Catalyst may shuffle-join on the gram key — the graceful
    degradation the module promises for web-scale n-gram tables."""
    from turbine_maintenance_etl_spark.llm.lm import (
        score_perplexity,
        train_bigram_counts,
        vocab_size,
    )

    from tests.conftest import SF_DIR

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(50)
    bigrams, hist = train_bigram_counts(docs)
    v = vocab_size(bigrams)

    on = score_perplexity(docs, bigrams, hist, v)
    plan_on = on._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan_on

    monkeypatch.setenv("SPARK_GRAFT_LM_BROADCAST", "off")
    off = score_perplexity(docs, bigrams, hist, v)
    # values identical either way (the hint is a strategy, not semantics)
    a = sorted(map(tuple, on.collect()))
    b = sorted(map(tuple, off.collect()))
    assert a == b
