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


def test_l2_normalize_unit_norms_and_zero_passthrough(spark):
    from turbine_maintenance_etl_spark.llm.embed import l2_normalize

    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.0, 0.0]), (3, [1.0, -1.0])],
        "id long, embedding array<double>",
    )
    out = {r["id"]: r["embedding"] for r in l2_normalize(df).collect()}
    assert abs(out[1][0] - 0.6) < 1e-12 and abs(out[1][1] - 0.8) < 1e-12
    assert out[2] == [0.0, 0.0]  # zero vector: unchanged, no NaN
    n3 = sum(x * x for x in out[3]) ** 0.5
    assert abs(n3 - 1.0) < 1e-12


def test_pca_project_matches_numpy_and_whitens(spark):
    import numpy as np

    from turbine_maintenance_etl_spark.llm.embed import fit_pca, pca_project

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    mean, comp, var = fit_pca(emb, k=8)
    C = np.array(comp)
    # orthonormal axes
    assert np.allclose(C @ C.T, np.eye(8), atol=1e-8)
    # variances sorted descending
    assert all(var[i] >= var[i + 1] - 1e-12 for i in range(len(var) - 1))

    rows = emb.orderBy("vec_id").limit(200).collect()
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    want = (X - np.array(mean)) @ C.T
    got_rows = (
        pca_project(emb, mean, comp, var, round_to=None)
        .orderBy("vec_id")
        .limit(200)
        .collect()
    )
    got = np.array([r["pca"] for r in got_rows])
    assert np.allclose(got, want, atol=1e-8)

    # whitened training-sample coordinates have ~unit variance per axis
    wh = (
        pca_project(emb, mean, comp, var, whiten=True, round_to=None)
        .select("pca")
        .collect()
    )
    W = np.array([r["pca"] for r in wh])
    v = W.var(axis=0, ddof=1)
    assert np.allclose(v, 1.0, atol=1e-6)


def test_pca_project_is_narrow(spark):
    from turbine_maintenance_etl_spark.llm.embed import fit_pca, pca_project

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    mean, comp, var = fit_pca(emb, k=4)
    plan = (
        pca_project(emb, mean, comp, var)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


def test_fit_pca_rejects_empty_and_skips_nulls(spark):
    """Trainer edge inputs: NULL vectors are excluded from the sample,
    an all-NULL/empty input raises a clear error instead of a numpy
    AxisError deep in the SVD."""
    import pytest

    from turbine_maintenance_etl_spark.llm.embed import fit_pca

    mixed = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, None), (3, [3.0, 4.0])],
        "vec_id long, embedding array<double>",
    )
    mean, comp, var = fit_pca(mixed, k=1)
    assert len(mean) == 2 and len(comp) == 1

    empty = spark.createDataFrame([(1, None)], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="no non-NULL vectors"):
        fit_pca(empty, k=1)
