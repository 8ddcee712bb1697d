"""Learned quality-classifier filtering (llm/classify.py): weak-label
bootstrap, holdout generalization, JVM-only scoring path, and the
filter gate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from turbine_maintenance_etl_spark.llm.classify import (
    filter_by_quality,
    score_quality,
    train_quality_classifier,
    weak_quality_labels,
)
from turbine_maintenance_etl_spark.ops.sampling import hash_split

SF001 = SF_DIR.replace("sf0.001", "sf0.01")


@pytest.fixture(scope="module")
def labeled(spark):
    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    return weak_quality_labels(docs).cache()


@pytest.fixture(scope="module")
def model(labeled):
    train, _ = hash_split(labeled, "doc_id", 80, salt="qc")
    return train_quality_classifier(train)


def test_weak_labels_are_deterministic_and_mixed(labeled):
    a = labeled.groupBy("label").count().collect()
    b = labeled.groupBy("label").count().collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    counts = {r.label: r["count"] for r in a}
    # the synthetic corpus must exercise both classes or the test is vacuous
    assert counts.get(0.0, 0) > 10 and counts.get(1.0, 0) > 10


def test_holdout_accuracy_band(labeled, model):
    _, eval_ = hash_split(labeled, "doc_id", 80, salt="qc")
    scored = score_quality(model, eval_)
    hits = scored.select(
        (
            (F.col("quality_prob") > 0.5).cast("double") == F.col("label")
        ).cast("int").alias("hit")
    )
    acc = hits.agg(F.avg("hit")).first()[0]
    # the classifier must generalize the weak rule from word evidence
    # alone (it never sees the signal columns) — well above chance,
    # not necessarily perfect
    assert acc >= 0.75, f"holdout accuracy {acc}"


def test_scoring_is_jvm_only(labeled, model):
    scored = score_quality(model, labeled.limit(50))
    plan = scored._jdf.queryExecution().executedPlan().toString()
    # no Python evaluation in the scoring path: tokenize/hash/predict
    # are JVM expressions
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    row = scored.first()
    assert 0.0 <= row.quality_prob <= 1.0


def test_scoring_deterministic_across_runs(labeled, model):
    a = {r.doc_id: r.quality_prob for r in score_quality(model, labeled).collect()}
    b = {r.doc_id: r.quality_prob for r in score_quality(model, labeled).collect()}
    assert a == b


def test_filter_gate(labeled, model):
    kept = filter_by_quality(model, labeled, threshold=0.5)
    n_all, n_kept = labeled.count(), kept.count()
    assert 0 < n_kept < n_all
    assert "quality_prob" in kept.columns


def test_registry_entry_confusion_matrix(spark):
    from turbine_maintenance_etl_spark.queries_llm import quality_classifier_filter

    cm = quality_classifier_filter(spark, SF001).collect()
    total = sum(r.n_docs for r in cm)
    correct = sum(r.n_docs for r in cm if r.label == r.predicted)
    assert total > 50 and correct / total >= 0.75


def test_hashed_linear_scores_edges_and_plan(spark):
    """The frozen-weights portable scorer: NULL/empty text scores
    sigmoid(bias) (the empty document), bag semantics count token
    multiplicity, and the plan is a narrow map — no shuffle Exchange,
    no Python in the row path."""
    import contextlib
    import io
    import math

    from turbine_maintenance_etl_spark.llm.classify import (
        hashed_linear_scores,
        seeded_linear_weights,
    )

    w = seeded_linear_weights(16, seed=7)
    bias = -0.25
    docs = spark.createDataFrame(
        [(1, None), (2, ""), (3, "hello"), (4, "hello hello")],
        "doc_id long, text string",
    )
    scored = hashed_linear_scores(docs, w, bias=bias)
    got = {r["doc_id"]: r["quality_prob"] for r in scored.collect()}
    base = round(1.0 / (1.0 + math.exp(-bias)), 6)
    assert got[1] == base and got[2] == base
    # bag semantics: doc 4's margin moves twice as far from bias as doc 3's
    import hashlib

    idx = int(hashlib.md5(b"hello").hexdigest()[:15], 16) % 16
    assert got[3] == round(1.0 / (1.0 + math.exp(-(bias + w[idx]))), 6)
    assert got[4] == round(1.0 / (1.0 + math.exp(-(bias + w[idx] + w[idx]))), 6)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        scored.explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
