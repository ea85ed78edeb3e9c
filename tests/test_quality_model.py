"""Hashed linear quality classifier (operators/quality_model.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_db_api_spark.operators.quality_model import (
    fixed_model,
    quality_model_filter,
    score_quality_linear,
    score_quality_linear_join,
)

W = fixed_model(64, seed=5)
BIAS = -0.02


def _docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the the the the the"),
        (2, ""),
        (3, None),
        (4, "completely different vocabulary here tonight"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_join_path_bit_equals_literal_path(spark):
    docs = _docs(spark)
    lit = {r["doc_id"]: r for r in score_quality_linear(docs, W, BIAS).collect()}
    wdf = spark.createDataFrame(
        [(i, float(x)) for i, x in enumerate(W)], "bucket int, weight double"
    )
    join = {
        r["doc_id"]: r
        for r in score_quality_linear_join(docs, wdf, 64, BIAS).collect()
    }
    assert set(lit) == set(join)
    for k in lit:
        assert lit[k]["n_tokens"] == join[k]["n_tokens"]
        assert lit[k]["logit"] == join[k]["logit"]  # bit-exact, not approx
        assert lit[k]["keep"] == join[k]["keep"]


def test_featureless_docs_score_exactly_bias(spark):
    scored = {
        r["doc_id"]: r["logit"]
        for r in score_quality_linear(_docs(spark), W, BIAS).collect()
    }
    assert scored[2] == BIAS and scored[3] == BIAS


def test_sparse_weights_equal_zero_filled_dense(spark):
    """Dropping zero-weight rows from the weights frame must not change a
    single score (missing buckets coalesce to 0.0)."""
    import numpy as np

    w = np.array(W)
    w[::2] = 0.0  # make half the buckets zero → sparse model
    docs = _docs(spark)
    dense = score_quality_linear(docs, w, BIAS).collect()
    sparse_rows = [(i, float(x)) for i, x in enumerate(w) if x != 0.0]
    wdf = spark.createDataFrame(sparse_rows, "bucket int, weight double")
    sparse = score_quality_linear_join(docs, wdf, 64, BIAS).collect()
    assert sorted(map(tuple, dense)) == sorted(map(tuple, sparse))


def test_duplicate_bucket_in_weights_fails_loudly(spark):
    """A duplicate bucket row would fan out the join and silently inflate
    logit and n_tokens — the precondition check must raise instead."""
    import pytest

    wdf = spark.createDataFrame(
        [(0, 0.5), (0, 0.7), (1, 0.1)], "bucket int, weight double"
    )
    with pytest.raises(ValueError, match="duplicate bucket"):
        score_quality_linear_join(_docs(spark), wdf, 64, BIAS)


def test_gate_returns_original_rows_above_threshold(spark):
    docs = _docs(spark)
    kept = quality_model_filter(docs, W, BIAS, min_logit=BIAS)
    scored = score_quality_linear(docs, W, BIAS)
    expect = {r["doc_id"] for r in scored.filter(F.col("logit") > BIAS).collect()}
    got = {r["doc_id"] for r in kept.collect()}
    assert got == expect
    assert kept.columns == docs.columns
