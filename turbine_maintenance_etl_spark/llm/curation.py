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
