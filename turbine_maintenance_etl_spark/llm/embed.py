"""Embedding generation over document/chunk text via ``mapInPandas`` —
the Spark plumbing a real encoder needs (Arrow batching, float-array
schema, partition sizing), with a deterministic stand-in model.

No ML encoder ships in this container, so the 'model' is signed feature
hashing (the classic hashing trick): each token hashes to a bucket in
[0, dim) with a ±1 sign from another hash bit, vectors are L2
normalized. It is deterministic across runs/partitions (md5-based, no
RNG state), so results are reproducible and testable; swap `_encode`
for a real model call (sentence-transformers, ONNX, …) and nothing
else changes — batch shape, schema, and partitioning are the
production-ready parts.

Scale: a narrow map — no shuffle; Arrow transfers (id, text) in and
(id, vector) out. ``batch_rows`` bounds per-batch memory exactly like a
GPU encoder's max batch size would.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def _encode(texts: pd.Series, dim: int) -> np.ndarray:
    """Signed feature-hashing encoder: deterministic fake with real
    embedding geometry (shared tokens → higher cosine)."""
    out = np.zeros((len(texts), dim), dtype=np.float32)
    for row, text in enumerate(texts.fillna("")):
        for tok in text.split():
            h = hashlib.md5(tok.encode("utf-8")).digest()
            bucket = int.from_bytes(h[:4], "big") % dim
            sign = 1.0 if h[4] & 1 else -1.0
            out[row, bucket] += sign
    norms = np.linalg.norm(out, axis=1, keepdims=True)
    np.divide(out, norms, out=out, where=norms > 0)
    return out


def embed_text(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 64,
    batch_rows: int = 1024,
) -> DataFrame:
    """(id, text, ...) -> (id, embedding array<float>): the encoder UDF
    surface. Selects only (id, text) BEFORE the Python boundary so Arrow
    never ships unused columns."""
    schema = f"{id_col} long, embedding array<float>"
    src = df.select(id_col, text_col)

    def encode_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for start in range(0, len(pdf), batch_rows):
                part = pdf.iloc[start : start + batch_rows]
                vecs = _encode(part[text_col], dim)
                yield pd.DataFrame(
                    {id_col: part[id_col].to_numpy(), "embedding": list(vecs)}
                )

    return src.mapInPandas(encode_batches, schema)
