"""Round-8 retrieval/sampling operators: BM25, inverted-index top-k,
exact stratified sampling — pure-Python differentials (the same
pin-the-algorithm strategy the ANN/LM entries use) plus plan shape and
determinism checks."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from turbine_maintenance_etl_spark.llm.embed import _encode, embed_text
from turbine_maintenance_etl_spark.llm.similarity import inverted_index_topk
from turbine_maintenance_etl_spark.llm.text import bm25_topk, chunk_documents
from turbine_maintenance_etl_spark.ops.sampling import stratified_exact_sample


@pytest.fixture(scope="module")
def docs_pdf(spark):
    return (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text", "lang", "source")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


# --- BM25 -------------------------------------------------------------------


def _bm25_reference(docs: pd.DataFrame, queries, k, k1=1.2, b=0.75):
    toks = {r.doc_id: str(r.text).split() for r in docs.itertuples()}
    n = float(len(toks))
    avgdl = sum(len(t) for t in toks.values()) / n
    tf = {d: Counter(t) for d, t in toks.items()}
    out = []
    for qid, qtext in queries:
        terms = sorted(set(qtext.split()))
        scores = {}
        for d, cnt in tf.items():
            s = 0.0
            for t in terms:
                f_td = cnt.get(t, 0)
                if not f_td:
                    continue
                df_t = sum(1 for c in tf.values() if t in c)
                idf = math.log(1.0 + (n - df_t + 0.5) / (df_t + 0.5))
                s += idf * f_td * (k1 + 1) / (f_td + k1 * (1 - b + b * len(toks[d]) / avgdl))
            if s > 0:
                scores[d] = round(s, 6)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        out.extend((qid, d, s, i + 1) for i, (d, s) in enumerate(ranked))
    return sorted(out)


def test_bm25_matches_pure_python(spark, docs_pdf):
    queries = [("qa", "table scan merge"), ("qb", "spark sort window")]
    got = bm25_topk(
        spark.read.parquet(f"{SF_DIR}/documents.parquet"), queries, k=5
    ).collect()
    got = sorted((r.query_id, r.doc_id, r.score, r.rank) for r in got)
    assert got == _bm25_reference(docs_pdf, queries, k=5)


def test_bm25_rejects_empty_queries(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    with pytest.raises(ValueError, match="non-empty"):
        bm25_topk(docs, [("q", "  ")], k=3)


# --- inverted-index top-k ----------------------------------------------------


def _sparse_features(texts):
    feats = {}
    for cid, text in texts.items():
        vec = _encode(pd.Series([text]), 64, normalize=False)[0]
        feats[cid] = {i: int(w) for i, w in enumerate(vec) if w != 0}
    return feats


def test_inverted_index_matches_dense_reference(spark, docs_pdf):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    chunks = chunk_documents(docs, chunk_tokens=32, overlap=4).withColumn(
        "cid", F.col("doc_id") * 10_000 + F.col("chunk_id")
    )
    emb = embed_text(
        chunks, id_col="cid", text_col="chunk_text", dim=64, normalize=False
    ).withColumn("gdoc", F.expr("cid DIV 10000"))
    q = embed_text(
        chunks.filter(F.col("doc_id") < 10),
        id_col="cid",
        text_col="chunk_text",
        dim=64,
        normalize=False,
    ).select(
        F.col("cid").alias("query_id"),
        "embedding",
        F.expr("cid DIV 10000").alias("gdoc"),
    )
    got = inverted_index_topk(
        emb, q, k=3, id_col="cid", vec_col="embedding", group_col="gdoc"
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" not in plan
    got_rows = sorted(
        (r.query_id, r.neighbor_id, r.score, r.rank) for r in got.collect()
    )

    # dense numpy reference over the same chunking
    chunk_pdf = chunks.select("cid", "chunk_text").toPandas()
    feats = _sparse_features(dict(zip(chunk_pdf.cid, chunk_pdf.chunk_text)))
    expected = []
    for qcid, qf in feats.items():
        if qcid // 10_000 >= 10:
            continue
        scores = {}
        for ccid, cf in feats.items():
            if ccid // 10_000 == qcid // 10_000:
                continue
            s = sum(w * cf.get(i, 0) for i, w in qf.items())
            if s > 0:
                scores[ccid] = s
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        expected.extend((qcid, c, s, i + 1) for i, (c, s) in enumerate(ranked))
    assert got_rows == sorted(expected)


def test_encoder_normalize_flag():
    texts = pd.Series(["spark table merge", "a a a", ""])
    raw = _encode(texts, 64, normalize=False)
    assert (raw == raw.round()).all(), "unnormalized encoder must emit integers"
    assert raw[1].sum() in (-3.0, 3.0)  # three copies of one token
    normed = _encode(texts, 64, normalize=True)
    norms = (normed**2).sum(axis=1) ** 0.5
    assert abs(norms[0] - 1.0) < 1e-6 and norms[2] == 0.0


# --- exact stratified sampling ------------------------------------------------


def test_stratified_exact_counts_and_membership(spark, docs_pdf):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "lang", "source"
    )
    n = 7
    got = stratified_exact_sample(docs, ["lang", "source"], n, "doc_id").toPandas()
    sizes = docs_pdf.groupby(["lang", "source"]).size()
    got_sizes = got.groupby(["lang", "source"]).size()
    for key, total in sizes.items():
        assert got_sizes.get(key, 0) == min(n, total)
    # exact membership: md5-hash order per stratum, pandas replica
    docs_pdf2 = docs_pdf.assign(
        _h=[hashlib.md5(str(d).encode()).hexdigest() for d in docs_pdf.doc_id]
    )
    expect = (
        docs_pdf2.sort_values(["_h", "doc_id"])
        .groupby(["lang", "source"])
        .head(n)
    )
    assert sorted(got.doc_id) == sorted(expect.doc_id)


def test_stratified_exact_stable_under_repartition(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "lang", "source"
    )
    a = sorted(
        r.doc_id
        for r in stratified_exact_sample(docs, ["lang"], 5, "doc_id").collect()
    )
    b = sorted(
        r.doc_id
        for r in stratified_exact_sample(
            docs.repartition(13), ["lang"], 5, "doc_id"
        ).collect()
    )
    assert a == b
