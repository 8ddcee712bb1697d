"""Sequence packing: assemble variable-length chunks into fixed-budget
training sequences — the pretraining-data step between chunking and
batch assembly (wasted pad tokens are wasted compute at 100 TB scale).

Packing is inherently sequential WITHIN a shard (each chunk's sequence
assignment depends on how full the current sequence is), so this is a
textbook ``applyInPandas`` operator: shards pack independently in
parallel across executors, the per-shard loop is a tight pandas pass.
The policy is deterministic contiguous fill — chunks are taken in
(doc order, chunk order); a chunk that would overflow the budget starts
the next sequence; oversized chunks get a sequence of their own (never
dropped — dropping tails silently loses corpus mass). Contiguous fill
keeps each document's chunks adjacent (better for curriculum/locality)
and, unlike first-fit-decreasing, is exactly expressible as a recursive
SQL scan, so the DuckDB oracle can verify it row for row.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


def pack_sequences(
    chunks: DataFrame,
    max_tokens: int = 256,
    shard_col: str = "shard",
    token_col: str = "chunk_tokens",
    order_cols: tuple[str, str] = ("doc_id", "chunk_id"),
) -> DataFrame:
    """(shard, doc_id, chunk_id, chunk_tokens) -> same grain plus
    ``seq_no``: the 1-based training-sequence index within the shard.

    One shuffle on the shard key; each shard packs sequentially inside
    a single Arrow batch. Shard granularity is the parallelism knob —
    at 100 TB shard by (source, hash-bucket) so no single shard
    dominates.

    Output types are DERIVED from the input schema (the column names
    are parameters, so the types must follow — a hardcoded ``doc_id
    long`` would crash the Arrow conversion for every corpus with
    string doc ids, which ``bpe_token_stats`` explicitly supports);
    only the token column is normalized to long."""
    in_schema = {f.name: f for f in chunks.schema.fields}
    missing = [c for c in (shard_col, *order_cols, token_col) if c not in in_schema]
    if missing:
        raise ValueError(f"pack_sequences: input lacks column(s) {missing}")
    typed = ", ".join(
        f"{c} {in_schema[c].dataType.simpleString()}"
        for c in (shard_col, *order_cols)
    )
    schema = f"{typed}, {token_col} long, seq_no long"

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(list(order_cols), kind="mergesort")
        seq_nos = []
        seq_no, filled = 0, 0
        for tok in pdf[token_col]:
            tok = int(tok)
            if seq_no == 0 or filled + tok > max_tokens:
                seq_no += 1
                filled = tok
            else:
                filled += tok
            seq_nos.append(seq_no)
        out = pdf.assign(seq_no=seq_nos)
        return out[[shard_col, *order_cols, token_col, "seq_no"]]

    return chunks.groupBy(shard_col).applyInPandas(pack, schema)
