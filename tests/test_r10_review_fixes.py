"""Regressions for the round-10 self-review findings on the LLM core
(llm/dedup.py, llm/similarity.py): the mega-bucket cap must act BEFORE
collect_list materializes the bucket, prebuilt IVF-PQ indexes must
carry their own geometry, the inverted index's integer contract must be
loud, self-matches must be excluded even with a group column, and PQ
training must survive corpus vectors the scoring side filters."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_lsh_cap_filters_before_collect_list(spark):
    """The (band, bh) window-count filter must sit BELOW the
    collect_list aggregate in the physical plan — filtering on
    F.size(ids) after the agg still built the mega-bucket array in a
    single unspillable aggregation buffer. Semantics unchanged: an
    over-cap bucket contributes no pairs."""
    from turbine_maintenance_etl_spark.llm.dedup import minhash_lsh_candidates

    docs = spark.range(40).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("alpha beta gamma delta epsilon zeta eta theta "),
            (F.col("id") % 3).cast("string"),
        ).alias("text"),
    )
    out = minhash_lsh_candidates(docs, max_bucket_size=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    agg_at = plan.find("collect_list")
    win_at = plan.find("Window")
    assert agg_at != -1 and win_at != -1
    # plan trees print parents first: the Window (cap filter input)
    # must appear BELOW (later than) the aggregate that consumes it
    assert win_at > agg_at, "cap filter is not below the collect_list agg"
    # over-cap buckets contribute nothing: with ~13-14 docs per
    # template and cap 5, every bucket is over cap
    assert out.count() == 0
    # at a permissive cap the same corpus yields pairs
    assert minhash_lsh_candidates(docs, max_bucket_size=1000).count() > 0


def test_num_hashes_bands_divisibility_raises(spark):
    from turbine_maintenance_etl_spark.llm.dedup import lsh_band_buckets

    docs = spark.range(4).select(
        F.col("id").alias("doc_id"), F.lit("a b c d e").alias("text")
    )
    with pytest.raises(ValueError, match="not divisible"):
        lsh_band_buckets(docs, num_hashes=32, bands=5)


def _emb(spark, n=40, dim=16, seed=1):
    rng = np.random.default_rng(seed)
    rows = [
        (int(i), [float(x) for x in rng.standard_normal(dim)]) for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


def test_ivfpq_prebuilt_index_with_different_m(spark):
    """A prebuilt index trained with m=16 scored through a call whose
    default is m=8 must use the INDEX's geometry (it crashed the Arrow
    UDF with a broadcast shape error before)."""
    from turbine_maintenance_etl_spark.llm.similarity import fit_ivfpq, ivfpq_topk

    c = _emb(spark, n=40, dim=16)
    q = _emb(spark, n=3, dim=16, seed=9).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    idx = fit_ivfpq(c, dim=16, n_clusters=4, m=16, nbits=2)
    out = ivfpq_topk(c, q, dim=16, k=3, index=idx).toPandas()  # default m=8
    assert len(out) == 9
    # geometry mismatch between centroids and codebooks is loud
    bad = (idx[0], [[[0.0, 0.0]] * 4] * 4)  # books imply dim 8, centers dim 16
    with pytest.raises(ValueError, match="geometry mismatch"):
        ivfpq_topk(c, q, dim=16, k=3, index=bad)


def test_ivfpq_sampled_prebuilt_index_with_different_m(spark):
    from turbine_maintenance_etl_spark.llm.similarity import (
        fit_ivfpq_sampled,
        ivfpq_sampled_topk,
    )

    c = _emb(spark, n=40, dim=16)
    q = _emb(spark, n=3, dim=16, seed=9).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    idx = fit_ivfpq_sampled(c, dim=16, n_clusters=4, m=16, nbits=2)
    out = ivfpq_sampled_topk(c, q, dim=16, k=3, index=idx).toPandas()
    assert len(out) == 9


def test_inverted_index_rejects_float_weights(spark):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from turbine_maintenance_etl_spark.llm.similarity import inverted_index_topk

    c = spark.createDataFrame(
        [(1, [2.0, 0.0, 1.0]), (2, [0.7, 0.3, 0.0])],
        "vec_id bigint, embedding array<double>",
    )
    q = spark.createDataFrame(
        [(10, [1.0, 1.0, 0.0])], "query_id bigint, embedding array<double>"
    )
    with pytest.raises((SparkRuntimeException, Py4JJavaError), match="integer weights"):
        inverted_index_topk(c, q, k=2).collect()


def test_inverted_index_self_id_excluded_with_group_col(spark):
    """With group_col set, the id self-match filter was skipped — a row
    sharing the query's id but not its group came back as its own
    neighbor."""
    from turbine_maintenance_etl_spark.llm.similarity import inverted_index_topk

    c = spark.createDataFrame(
        [(1, [2.0, 1.0], "gA"), (2, [1.0, 3.0], "gB")],
        "vec_id bigint, embedding array<double>, grp string",
    )
    # query id 1 is in group gQ (not gA): the group filter alone would
    # let candidate id 1 through as its own neighbor
    q = spark.createDataFrame(
        [(1, [1.0, 1.0], "gQ")], "query_id bigint, embedding array<double>, grp string"
    )
    out = inverted_index_topk(c, q, k=5, group_col="grp").toPandas()
    assert set(out.neighbor_id) == {2}


def test_fit_pq_survives_null_element_and_zero_vectors(spark):
    """fit_pq trained on the raw frame crashed in np.array on a vector
    with a NULL ELEMENT (isNotNull passes it) and skewed centroids with
    zero-norm vectors the scoring side never scores."""
    from turbine_maintenance_etl_spark.llm.similarity import fit_pq, pq_topk

    rng = np.random.default_rng(3)
    rows = [(int(i), [float(x) for x in rng.standard_normal(8)]) for i in range(30)]
    c = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    ).unionByName(
        spark.createDataFrame(
            [(100, [1.0, None, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]),
             (101, [0.0] * 8)],
            "vec_id bigint, embedding array<double>",
        )
    )
    books = fit_pq(c, dim=8, m=4, nbits=2)
    assert np.isfinite(np.array(books, dtype=np.float64)).all()
    q = _emb(spark, n=2, dim=8, seed=5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = pq_topk(c, q, dim=8, k=3, codebooks=books).toPandas()
    assert len(out) == 6
