"""End-to-end corpus curation: the composed pipeline a training-data
run actually executes — quality gate → exact dedup → chunking.

Each stage is one of the §2/LLM operators; composing them stays one
lazy DataFrame plan, so Catalyst pipelines the quality filter into the
scan, the dedup shuffle is the plan's ONLY wide stage, and chunking is
a narrow map on the survivors. At 100 TB: filter early (cheapest),
dedup on the md5 digest (16-byte shuffle key, not raw text), chunk
last (output amplification happens after the data is smallest).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from turbine_maintenance_etl_spark.llm.dedup import exact_dedup
from turbine_maintenance_etl_spark.llm.text import (
    add_quality_signals,
    chunk_documents,
)


def curate_corpus(
    docs: DataFrame,
    min_tokens: int = 20,
    min_stopword_ratio: float = 0.05,
    chunk_tokens: int = 64,
    overlap: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Quality-gate, dedup, and chunk a document corpus; returns the
    chunk table (id, chunk_id, chunk_text, chunk_tokens)."""
    q = add_quality_signals(docs, text_col)
    kept = q.filter(
        (q.n_tokens >= min_tokens) & (q.stopword_ratio >= min_stopword_ratio)
    ).select(*docs.columns)
    survivors = exact_dedup(kept, text_col, id_col)
    return chunk_documents(survivors, chunk_tokens, overlap, text_col, id_col)


def curate_corpus_v2(
    docs: DataFrame,
    min_tokens: int = 20,
    min_stopword_ratio: float = 0.05,
    ppl_keep_frac: float = 0.9,
    chunk_tokens: int = 64,
    overlap: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    ppl_cutoff: float | None = None,
) -> DataFrame:
    """The modern curation chain: heuristic quality gate → LM-perplexity
    gate → exact dedup → chunking (CCNet's ordering: cheap filters
    first, the LM gate only sees survivors of the heuristics).

    The perplexity gate keeps the ``ppl_keep_frac`` least-perplexed
    documents by EXACT rank (perplexity asc, id asc tie-break) — fully
    deterministic and oracle-checkable. The global rank costs a
    single-partition window at this stage; at 100 TB you'd compute an
    approximate perplexity cutoff once (percentile sketch over a
    sample), broadcast it, and gate map-only — the same exact/approx
    dual the temperature-mixture sampler documents. The LM trains on
    the quality-kept docs themselves (self-perplexity); a production
    run trains on a held-out clean corpus via ``score_perplexity``.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from turbine_maintenance_etl_spark.llm.lm import perplexity_scores

    q = add_quality_signals(docs, text_col)
    kept = q.filter(
        (q.n_tokens >= min_tokens) & (q.stopword_ratio >= min_stopword_ratio)
    ).select(*docs.columns)

    ppl = perplexity_scores(kept, text_col=text_col, id_col=id_col)
    scored = kept.join(ppl.select(id_col, "perplexity"), [id_col])
    if ppl_cutoff is not None:
        # the 100 TB path: a precomputed cutoff (percentile sketch over a
        # sample, computed once) gates map-only — no global window
        gated = scored.filter(F.col("perplexity") <= F.lit(ppl_cutoff)).select(
            *docs.columns
        )
    else:
        n_total = F.broadcast(scored.agg(F.count("*").alias("_n")))
        w = Window.orderBy(F.asc("perplexity"), F.asc(id_col))
        gated = (
            scored.crossJoin(n_total)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= F.floor(F.lit(ppl_keep_frac) * F.col("_n")))
            .select(*docs.columns)
        )

    survivors = exact_dedup(gated, text_col, id_col)
    return chunk_documents(survivors, chunk_tokens, overlap, text_col, id_col)
