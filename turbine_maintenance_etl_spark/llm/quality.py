"""Corpus-quality operators for LLM training-data curation:
Gopher-style repetition signals and benchmark decontamination.

Both are expression-first. Repetition signals are ZERO-shuffle narrow
maps (every statistic — including top-bigram frequency — is computed
inside the row via higher-order array functions, O(B log B) per doc),
so at 100 TB they run at scan speed with full column pruning.
Decontamination is one explode + one broadcast join: benchmark/eval
sets are small by nature, so their distinct-shingle set broadcasts and
the candidate side streams map-only with no candidate-side shuffle
until the per-doc re-aggregation.

Repetition-signal definitions follow the published Gopher data-quality
rules (Rae et al. 2021, "Scaling Language Models", table of repetition
filters), adapted to word/bigram grain because the synthetic corpus has
no newlines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from turbine_maintenance_etl_spark.llm.dedup import shingles
from turbine_maintenance_etl_spark.llm.text import bind_once, tokens_expr


def bigrams_expr(toks: Column) -> Column:
    """Word bigrams (with multiplicity) of a token array:
    zip(tokens[0:n-1], tokens[1:n]) — pure codegen, no explode."""
    n = F.greatest(F.size(toks) - 1, F.lit(0))
    left = F.slice(toks, 1, n)
    right = F.slice(toks, 2, n)
    return F.zip_with(left, right, lambda a, b: F.concat_ws(" ", a, b))


def top_run_count(sorted_arr: Column) -> Column:
    """Highest multiplicity of any element in a SORTED array, via a
    single aggregate pass tracking (prev, current run, best run). This
    is the zero-shuffle alternative to explode→groupBy→max for per-row
    'most frequent element' — linear in the array, no join back."""
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("bigint").alias("run"),
        F.lit(0).cast("bigint").alias("best"),
    )

    def step(acc: Column, x: Column) -> Column:
        run = F.when(x.eqNullSafe(acc["prev"]), acc["run"] + 1).otherwise(
            F.lit(1).cast("bigint")
        )
        return F.struct(
            x.alias("prev"), run.alias("run"), F.greatest(acc["best"], run).alias("best")
        )

    return F.aggregate(sorted_arr, init, step, lambda acc: acc["best"])


def repetition_signals(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document repetition / quality statistics, all rounded to 4dp:

    - n_words, n_bigrams
    - dup_word_frac    = (occurrences - distinct words) / occurrences
    - dup_bigram_frac  = (occurrences - distinct bigrams) / occurrences
    - top_bigram_frac  = multiplicity of the most frequent bigram /
                         total bigrams (Gopher's top-n-gram fraction)
    - mean_word_len
    - alpha_word_frac  = fraction of words containing a letter
    - symbol_word_ratio = ('#' + '...' occurrences) / words (Gopher's
                          symbol-to-word ratio)

    Fractions are NULL when the denominator is 0 (empty text)."""

    def frac(num: Column, den: Column) -> Column:
        return F.round(num / F.when(den > 0, den), 4)

    def stats(toks: Column) -> Column:
        n_words = F.size(toks)
        bgs = bigrams_expr(toks)
        n_bigrams = F.size(bgs)
        sum_len = F.aggregate(
            toks, F.lit(0).cast("bigint"), lambda a, x: a + F.length(x)
        )
        n_alpha = F.size(F.filter(toks, lambda x: x.rlike("[A-Za-z]")))
        text = F.col(text_col)
        n_symbols = (
            F.length(text)
            - F.length(F.regexp_replace(text, r"#", ""))
            + F.floor(
                (F.length(text) - F.length(F.regexp_replace(text, r"\.\.\.", "")))
                / F.lit(3)
            )
        )
        return F.struct(
            n_words.cast("bigint").alias("n_words"),
            n_bigrams.cast("bigint").alias("n_bigrams"),
            frac(n_words - F.size(F.array_distinct(toks)), n_words).alias(
                "dup_word_frac"
            ),
            frac(n_bigrams - F.size(F.array_distinct(bgs)), n_bigrams).alias(
                "dup_bigram_frac"
            ),
            frac(top_run_count(F.array_sort(bgs)), n_bigrams).alias("top_bigram_frac"),
            frac(sum_len, n_words).alias("mean_word_len"),
            frac(n_alpha, n_words).alias("alpha_word_frac"),
            frac(n_symbols, n_words).alias("symbol_word_ratio"),
        )

    s = bind_once(tokens_expr(text_col), stats)
    return df.select(F.col(id_col), s.alias("_s")).select(id_col, "_s.*")


def decontamination_scores(
    candidates: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    flag_threshold: float = 0.5,
) -> DataFrame:
    """Benchmark contamination: for each candidate document, the
    fraction of its DISTINCT word n-gram shingles that also occur
    anywhere in the benchmark corpus (the standard train/eval
    decontamination test used for LLM corpora).

    Scale shape: the benchmark's distinct shingle set is exploded,
    deduped, and BROADCAST (eval sets are tiny relative to the corpus);
    candidates explode their shingles map-side, hash-join against the
    broadcast, and re-aggregate per document — the only candidate-side
    shuffle is the final per-doc groupBy. Documents with no shingles
    (< n words) survive with n_shingles = 0 and NULL contamination."""
    bench_sh = (
        benchmark.select(F.explode(shingles(text_col, n)).alias("sh"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    cand = candidates.select(
        F.col(id_col), F.explode_outer(shingles(text_col, n)).alias("sh")
    )
    scored = (
        cand.join(F.broadcast(bench_sh), "sh", "left")
        .groupBy(id_col)
        .agg(
            F.count("sh").alias("n_shingles"),
            F.coalesce(F.sum("_hit"), F.lit(0)).cast("bigint").alias("n_contaminated"),
        )
    )
    contamination = F.round(
        F.col("n_contaminated") / F.when(F.col("n_shingles") > 0, F.col("n_shingles")),
        4,
    )
    return scored.select(
        id_col,
        "n_shingles",
        "n_contaminated",
        contamination.alias("contamination"),
        F.when(contamination > flag_threshold, F.lit(1))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("flagged"),
    )


# PII patterns: portable between Java regex (Spark) and RE2 (DuckDB) —
# no backrefs, no lookaround, \b and bounded quantifiers only.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}[- ]\d{4}\b"


def redact_pii(
    df: DataFrame, text_col: str = "text", out_col: str = "redacted"
) -> DataFrame:
    """Scrub emails and phone-shaped numbers from a text column —
    the minimal PII pass every training corpus gets before release.
    Pure regexp expressions (codegen, zero shuffle); adds counts so the
    redaction rate is auditable per document."""
    c = F.col(text_col)
    return df.withColumn(
        "n_emails", F.size(F.regexp_extract_all(c, F.lit(EMAIL_RE), F.lit(0)))
    ).withColumn(
        "n_phones", F.size(F.regexp_extract_all(c, F.lit(PHONE_RE), F.lit(0)))
    ).withColumn(
        out_col,
        F.regexp_replace(
            F.regexp_replace(c, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
        ),
    )


def segment_repetition_signals(
    df: DataFrame,
    sep_regex: str = r"\n+",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Segment-level Gopher repetition filters (Rae et al. 2021:
    duplicate line / paragraph fraction and the char-mass variants),
    with the segment boundary as a parameter (``\\n+`` lines by
    default; ``\\n\\n+`` paragraphs; ``\\.\\s+`` sentence-ish).

    Per document, over trimmed non-empty segments:

    - n_segments
    - dup_seg_frac       = (occurrences - distinct segments) / occurrences
    - dup_seg_char_frac  = chars in EVERY occurrence of a repeated
                           segment / total segment chars (Gopher counts
                           all copies of a duplicated line, not just the
                           extras)

    Zero-shuffle like the word/bigram signals: the repeated-segment char
    mass comes from one ``aggregate`` pass over the SORTED segment array
    tracking (prev, run length, duplicated char mass) — when a run
    reaches length 2 the accumulator adds both occurrences, then one per
    further repeat. Linear per row, no explode, no join-back.
    """

    def frac(num: Column, den: Column) -> Column:
        return F.round(num / F.when(den > 0, den), 4)

    def stats(segs: Column) -> Column:
        n_segs = F.size(segs)
        total_chars = F.aggregate(
            segs, F.lit(0).cast("bigint"), lambda a, x: a + F.length(x)
        )
        srt = F.array_sort(segs)
        init = F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).cast("bigint").alias("run"),
            F.lit(0).cast("bigint").alias("dup"),
        )

        def step(acc: Column, x: Column) -> Column:
            is_rep = x.eqNullSafe(acc["prev"])
            run = F.when(is_rep, acc["run"] + 1).otherwise(F.lit(1).cast("bigint"))
            add = F.when(
                is_rep & (acc["run"] == 1), F.length(x).cast("bigint") * 2
            ).when(is_rep, F.length(x).cast("bigint")).otherwise(
                F.lit(0).cast("bigint")
            )
            return F.struct(
                x.alias("prev"), run.alias("run"), (acc["dup"] + add).alias("dup")
            )

        dup_chars = F.aggregate(srt, init, step, lambda acc: acc["dup"])
        n_dup = n_segs - F.size(F.array_distinct(segs))
        return F.struct(
            n_segs.cast("bigint").alias("n_segments"),
            n_dup.cast("bigint").alias("n_dup_segments"),
            frac(n_dup, n_segs).alias("dup_seg_frac"),
            frac(dup_chars, total_chars).alias("dup_seg_char_frac"),
        )

    segs_expr = F.filter(
        F.transform(F.split(F.col(text_col), sep_regex), lambda x: F.trim(x)),
        lambda x: x != F.lit(""),
    )
    s = bind_once(segs_expr, stats)
    return df.select(F.col(id_col), s.alias("_s")).select(id_col, "_s.*")
