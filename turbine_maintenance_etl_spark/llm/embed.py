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
from pyspark.sql import Column, DataFrame


# Per-process token-feature memo: corpora are zipfian, so the distinct
# vocabulary is tiny relative to token occurrences — one md5 per UNIQUE
# (token, dim) per executor process instead of one per occurrence.
# Bounded defensively (adversarial all-unique-token data would otherwise
# grow it with the corpus); a clear-on-full is fine because the cache is
# a pure function memo, never state.
_TOK_FEATURE_CACHE: dict[tuple[str, int], tuple[int, float]] = {}
_TOK_FEATURE_CACHE_MAX = 1 << 20


def _tok_feature(tok: str, dim: int) -> tuple[int, float]:
    key = (tok, dim)
    hit = _TOK_FEATURE_CACHE.get(key)
    if hit is None:
        h = hashlib.md5(tok.encode("utf-8")).digest()
        hit = (int.from_bytes(h[:4], "big") % dim, 1.0 if h[4] & 1 else -1.0)
        if len(_TOK_FEATURE_CACHE) >= _TOK_FEATURE_CACHE_MAX:
            _TOK_FEATURE_CACHE.clear()
        _TOK_FEATURE_CACHE[key] = hit
    return hit


def _encode(texts: pd.Series, dim: int, normalize: bool = True) -> np.ndarray:
    """Signed feature-hashing encoder: deterministic fake with real
    embedding geometry (shared tokens → higher cosine).

    ``normalize=False`` keeps the raw signed counts — every component is
    then a small INTEGER (exactly representable in float32), which makes
    dot products bit-exact across engines and lets the whole encode →
    retrieve chain be value-checked against a SQL replay of the md5
    bucket/sign math (queries_llm.pipeline_chunk_embed_retrieval).

    r11: the accumulation runs FLAT over the whole batch — one token
    stream, one ``np.unique`` for the per-unique feature lookups, one
    ``np.add.at`` scatter — instead of a Python Counter + loop per row
    (interleaved microbench: 1.9x, bit-identical). Reordering the adds
    is exact BY the integer-components property above: every partial
    sum is a small integer, so float32 accumulation cannot depend on
    order."""
    import itertools

    out = np.zeros((len(texts), dim), dtype=np.float32)
    toks = texts.fillna("").str.split()
    flat = list(itertools.chain.from_iterable(toks))
    if flat:
        rows = np.repeat(np.arange(len(texts)), toks.map(len).to_numpy())
        uniq, inv = np.unique(np.array(flat, dtype=object), return_inverse=True)
        feats = np.array([_tok_feature(t, dim) for t in uniq], dtype=np.float64)
        np.add.at(
            out,
            (rows, feats[inv, 0].astype(np.int64)),
            feats[inv, 1].astype(np.float32),
        )
    if normalize:
        norms = np.linalg.norm(out, axis=1, keepdims=True)
        np.divide(out, norms, out=out, where=norms > 0)
    return out


def embed_text(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 64,
    batch_rows: int = 1024,
    normalize: bool = True,
) -> DataFrame:
    """(id, text, ...) -> (id, embedding array<float>): the encoder UDF
    surface. Selects only (id, text) BEFORE the Python boundary so Arrow
    never ships unused columns."""
    # id type DERIVED from the input (r10 review, same contract as
    # pack.pack_sequences): a hardcoded `long` crashed the Arrow
    # conversion for every corpus with string doc ids
    id_type = df.schema[id_col].dataType.simpleString()
    schema = f"{id_col} {id_type}, embedding array<float>"
    src = df.select(id_col, text_col)

    def encode_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for start in range(0, len(pdf), batch_rows):
                part = pdf.iloc[start : start + batch_rows]
                vecs = _encode(part[text_col], dim, normalize)
                yield pd.DataFrame(
                    {id_col: part[id_col].to_numpy(), "embedding": list(vecs)}
                )

    return src.mapInPandas(encode_batches, schema)


# --- Embedding post-processing --------------------------------------------
#
# Production embedding pipelines rarely ship raw encoder output: vectors
# get L2-normalized (so dot == cosine and ANN bucketing behaves), and
# often PCA-reduced/whitened (smaller index, isotropic space — the
# "all-but-the-top" / whitening trick that measurably improves retrieval
# on anisotropic encoder outputs). Both are implemented JVM-side: the
# fitted model (mean vector + component matrix) embeds as ONE nested
# array literal, exactly like the IVF centroid codegen — planning cost
# O(model), execution is codegen'd higher-order functions, no Python in
# the per-row path.


def l2_normalize(df: DataFrame, vec_col: str = "embedding", out_col: str | None = None) -> DataFrame:
    """L2-normalize an array<float|double> column (zero vectors pass
    through unchanged rather than dividing by 0). Pure narrow map.

    Both the cast vector and its norm are lambda-bound (``bind_once``)
    — Spark doesn't CSE inside higher-order functions, so inlining the
    norm aggregate in the per-element division would recompute the
    O(dim) sum once per element (O(dim²)/row)."""
    from pyspark.sql import functions as F

    from turbine_maintenance_etl_spark.llm.text import bind_once

    def with_vec(v: Column) -> Column:
        norm_expr = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
        return bind_once(
            norm_expr,
            lambda norm: F.when(norm > 0, F.transform(v, lambda x: x / norm)).otherwise(
                v
            ),
        )

    cast_vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return df.withColumn(out_col or vec_col, bind_once(cast_vec, with_vec))


def fit_pca(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 16,
    max_train_vectors: int = 100_000,
):
    """Fit a PCA model on a BOUNDED, DETERMINISTIC sample of the vector
    column (``max_train_vectors`` rows in id-HASH order — a
    deterministic pseudo-random sample, so ids that encode ingest order
    don't fit the axes to the oldest shard only; driver memory is capped
    at sample x dim doubles, the same contract as the IVF trainer).
    NULL vectors are excluded; an empty sample raises. Returns
    ``(mean, components, explained_var)`` as plain Python lists: mean is
    dim-long, components is k x dim (rows = principal axes, orthonormal,
    sign-canonicalized so the largest-|coordinate| entry is positive),
    explained_var the per-axis sample variances."""
    import numpy as np
    from pyspark.sql import functions as F

    rows = (
        df.select(id_col, vec_col)
        .filter(F.col(vec_col).isNotNull())
        .orderBy(F.xxhash64(id_col), id_col)
        .limit(max_train_vectors)
        .collect()
    )
    if not rows:
        raise ValueError("fit_pca: no non-NULL vectors to train on")
    X = np.array([r[1] for r in rows], dtype=np.float64)
    mean = X.mean(axis=0)
    Xc = X - mean
    # economy SVD: components = right singular vectors
    _, s, vt = np.linalg.svd(Xc, full_matrices=False)
    comp = vt[:k]
    # canonical sign: make each axis's largest-|coord| positive
    flip = np.sign(comp[np.arange(len(comp)), np.abs(comp).argmax(axis=1)])
    flip[flip == 0] = 1.0
    comp = comp * flip[:, None]
    var = (s[:k] ** 2) / max(1, len(X) - 1)
    return mean.tolist(), comp.tolist(), var.tolist()


def pca_project(
    df: DataFrame,
    mean: list[float],
    components: list[list[float]],
    explained_var: list[float] | None = None,
    vec_col: str = "embedding",
    out_col: str = "pca",
    whiten: bool = False,
    round_to: int | None = 6,
) -> DataFrame:
    """Project vectors onto fitted principal axes, optionally whitening
    (divide each coordinate by sqrt(explained variance) -> unit-variance
    isotropic output). JVM-literal matmul — with the model embedded as
    ONE nested-array literal traversed by an indexed ``transform``
    (the `_centroid_dists` pattern): a per-axis ``F.array(*[F.lit(v)
    ...])`` forest is k*dim separate Literal nodes (~200k at k=256,
    dim=768) and makes Catalyst analysis + codegen dominate every fresh
    query, the exact pathology the SRP/centroid expressions already
    fixed. No UDF, no shuffle, O(k x dim) per row."""
    from pyspark.sql import functions as F

    if whiten and explained_var is None:
        raise ValueError("whiten=True requires explained_var from fit_pca")
    from turbine_maintenance_etl_spark.llm.text import bind_once

    mean_lit = F.lit([float(m) for m in mean])
    centered_expr = F.zip_with(
        F.transform(F.col(vec_col), lambda x: x.cast("double")),
        mean_lit,
        lambda x, m: x - m,
    )
    comp_lit = F.lit([[float(v) for v in row] for row in components])
    if whiten:
        inv_sd = [
            1.0 / (float(v) ** 0.5) if float(v) > 0 else 1.0
            for v in explained_var[: len(components)]
        ]
    else:
        inv_sd = [1.0] * len(components)
    scale_lit = F.lit(inv_sd)

    def project(centered: Column) -> Column:
        def axis(c_row: Column, j: Column) -> Column:
            dot = F.aggregate(
                F.zip_with(centered, c_row, lambda x, w: x * w),
                F.lit(0.0),
                lambda a, x: a + x,
            ) * F.element_at(scale_lit, j + 1)
            return F.round(dot, round_to) if round_to is not None else dot

        return F.transform(comp_lit, axis)

    # centering is lambda-bound so the k axis dot products share ONE
    # evaluation of (v - mean) instead of re-subtracting per axis
    return df.withColumn(out_col, bind_once(centered_expr, project))
