"""Tests for the mapInPandas hashing encoder (llm/embed.py) and the
composed chunk -> embed -> ANN pipeline entry."""

from __future__ import annotations

import numpy as np
import pytest

from tests.conftest import SF_DIR
from turbine_maintenance_etl_spark.llm.embed import embed_text


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "spark query engine fast"),
        (2, "spark query engine slow"),   # 3/4 tokens shared with doc 1
        (3, "banana apple cherry kiwi"),  # disjoint vocabulary
        (4, ""),                          # empty text -> zero vector
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_embeddings_deterministic_and_normalized(docs):
    a = {r["doc_id"]: np.array(r["embedding"]) for r in embed_text(docs).collect()}
    b = {
        r["doc_id"]: np.array(r["embedding"])
        for r in embed_text(docs.repartition(3)).collect()
    }
    for k in a:
        assert np.array_equal(a[k], b[k]), "partitioning changed embeddings"
    for k in (1, 2, 3):
        assert abs(np.linalg.norm(a[k]) - 1.0) < 1e-5
    assert np.linalg.norm(a[4]) == 0.0  # empty text


def test_shared_vocabulary_means_higher_cosine(docs):
    v = {r["doc_id"]: np.array(r["embedding"]) for r in embed_text(docs).collect()}
    sim_close = float(v[1] @ v[2])
    sim_far = float(v[1] @ v[3])
    assert sim_close > sim_far


def test_pipeline_chunk_embed_ann_runs_and_is_deterministic(spark):
    from turbine_maintenance_etl_spark.queries_llm import pipeline_chunk_embed_ann

    out1 = pipeline_chunk_embed_ann(spark, SF_DIR).toPandas()
    assert len(out1) > 0
    assert {"query_id", "vec_id", "cosine"} <= set(out1.columns) or len(out1.columns) >= 3
    out2 = pipeline_chunk_embed_ann(spark, SF_DIR).toPandas()
    key = sorted(out1.columns)
    a = out1[key].sort_values(key).reset_index(drop=True)
    b = out2[key].sort_values(key).reset_index(drop=True)
    assert a.equals(b), "pipeline not deterministic across runs"
