"""N-gram language-model perplexity scoring — the CCNet / KenLM-style
quality gate (Wenzek et al., "CCNet: Extracting High Quality Monolingual
Datasets from Web Crawl Data"): train a smoothed bigram LM on a corpus,
score every document by perplexity, and filter / bucket on it. Low
perplexity ≈ fluent in-domain text; high perplexity ≈ boilerplate,
tables, non-language noise.

Spark-first design (100 TB corpus):

- **Training is one aggregation pass.** Documents explode into bigram
  rows (narrow), then ``groupBy(gram).count`` with map-side partial
  aggregation — the shuffle carries one (gram, count) pair per distinct
  gram per map partition, not one row per token occurrence. Unigram
  (history) counts derive from the bigram table with a second small
  aggregation instead of a second pass over the corpus.
- **Scoring is a fact-side lookup join.** Each document's bigrams join
  the model tables on the gram key. The model is vocabulary-sized
  (≪ corpus); Catalyst/AQE broadcasts it when it fits, and the join
  degrades gracefully to a shuffle join keyed on the gram when the
  vocabulary is genuinely huge. Hot grams ("of the") skew the join key,
  but the build side is the *model* (one row per gram), so every
  fact row matches exactly one model row — no pair explosion, and AQE
  skew-split handles oversized partitions.
- **Everything is codegen'd expressions** (split/filter/transform/
  explode + log arithmetic) — no Python in any row path, which keeps
  the whole operator exactly reproducible in DuckDB for the oracle.

Smoothing: add-k (Lidstone) over the observed vocabulary,
``p(w2 | w1) = (c(w1 w2) + k) / (c(w1·) + k * V)``, with unseen
histories scoring the uniform ``1 / V``. Deliberately simpler than
KenLM's modified Kneser-Ney — the *shape* (train = one agg pass, score
= lookup join + per-doc agg) is identical, and add-k keeps the operator
SQL-expressible so the driver's DuckDB oracle can verify it exactly.

Reference parity: the reference has no LM gate; this is part of the
LLM-training-data extension surface (SURVEY.md §6 posture).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from turbine_maintenance_etl_spark.llm.text import tokens_expr
from turbine_maintenance_etl_spark.util import ensure_parallelism

BOS = "<s>"  # beginning-of-sentence pseudo-token: every doc contributes
# one (BOS, first-word) bigram so single-token documents still score.


def doc_bigrams(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, w1, w2) bigram rows per document, lowercase, BOS-prefixed.

    Narrow: tokenize → prepend BOS → transform to bigram structs →
    explode. Documents with no tokens emit no rows (they get NULL
    perplexity downstream, never a divide-by-zero)."""
    toks = F.concat(F.array(F.lit(BOS)), tokens_expr(F.lower(F.col(text_col))))
    # guard: Spark's sequence(1, 0) DESCENDS ([1, 0]) instead of being
    # empty, so a token-less doc would index element_at(toks, 0) -> error
    starts = F.when(
        F.size(toks) > 1, F.sequence(F.lit(1), F.size(toks) - 1)
    ).otherwise(F.array().cast("array<int>"))
    grams = F.transform(
        starts,
        lambda i: F.struct(
            F.element_at(toks, i).alias("w1"), F.element_at(toks, i + 1).alias("w2")
        ),
    )
    return (
        ensure_parallelism(df)
        .select(F.col(id_col), F.explode(grams).alias("g"))
        .select(F.col(id_col), F.col("g.w1").alias("w1"), F.col("g.w2").alias("w2"))
    )


def train_bigram_counts(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> tuple[DataFrame, DataFrame]:
    """Train pass: (bigram counts, history counts).

    Returns ``(bigrams, histories)`` where ``bigrams`` is
    (w1, w2, c12) and ``histories`` is (w1, c1) with c1 = Σ_w2 c12.
    One corpus-wide shuffle (gram groupBy, partial-agg combined); the
    history table is a reaggregation of the already-vocabulary-sized
    bigram table, NOT a second corpus pass."""
    grams = doc_bigrams(df, text_col, id_col)
    bigrams = grams.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    histories = bigrams.groupBy("w1").agg(F.sum("c12").alias("c1"))
    return bigrams, histories


def vocab_size(bigrams: DataFrame) -> int:
    """|V| = distinct predicted tokens (w2 side). One small job over the
    vocabulary-sized bigram table."""
    return bigrams.select("w2").distinct().count()


def _logprob(c12: Column, c1: Column, v: int, k: float) -> Column:
    """Add-k log p(w2|w1); unseen history (c1 NULL) → uniform 1/V."""
    seen = (F.coalesce(c12, F.lit(0)) + F.lit(k)) / (c1 + F.lit(k) * F.lit(float(v)))
    return F.when(c1.isNull(), F.log(F.lit(1.0) / F.lit(float(v)))).otherwise(F.log(seen))


def score_perplexity(
    docs: DataFrame,
    bigrams: DataFrame,
    histories: DataFrame,
    v: int,
    k: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document perplexity under the trained LM.

    Output: (id, n_bigrams, avg_logprob, perplexity), perplexity =
    exp(-avg log p), rounded to 4 dp for cross-engine determinism.
    Documents with zero tokens are preserved with NULLs (dropping them
    would silently shrink the corpus).

    Plan: doc bigrams LEFT JOIN bigram counts on (w1,w2), LEFT JOIN
    history counts on w1, per-doc aggregate. Both model tables get a
    broadcast hint — vocabulary-sized by construction; remove the hint
    only if |V| outgrows executor memory, in which case Catalyst falls
    back to a gram-keyed shuffle join."""
    grams = doc_bigrams(docs, text_col, id_col)
    scored = (
        grams.join(F.broadcast(bigrams), ["w1", "w2"], "left")
        .join(F.broadcast(histories), ["w1"], "left")
        .withColumn("_lp", _logprob(F.col("c12"), F.col("c1"), v, k))
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count("*").alias("n_bigrams"),
        F.sum("_lp").alias("_sum_lp"),
    )
    avg_lp = F.col("_sum_lp") / F.col("n_bigrams")
    return (
        docs.select(F.col(id_col))
        .join(per_doc, [id_col], "left")
        .select(
            F.col(id_col),
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.round(avg_lp, 4).alias("avg_logprob"),
            F.round(F.exp(-avg_lp), 4).alias("perplexity"),
        )
    )


def perplexity_scores(
    df: DataFrame,
    k: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Self-perplexity convenience: train on ``df``, score ``df``.

    The production deployment trains on a held-out high-quality corpus
    (CCNet trains on Wikipedia) and scores the crawl; the train/score
    split is just two calls. Two jobs total: the |V| count and the
    final aggregation (training folds into the scoring plan)."""
    bigrams, histories = train_bigram_counts(df, text_col, id_col)
    v = vocab_size(bigrams)
    return score_perplexity(df, bigrams, histories, v, k, text_col, id_col)
