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


def test_train_score_gate_end_to_end(spark):
    """The missing-half closure (VERDICT r4 #6): FIT the hashed linear
    classifier with MLlib, then (a) the fitted model separates a held-out
    split of a linearly separable fixture, (b) scoring through the fitted
    (bucket, weight) frame is bit-identical to the literal path on the
    dense coefficient vector, (c) the gate keeps the good docs."""
    import numpy as np

    from vector_db_api_spark.operators.quality_model import train_quality_model

    rng = np.random.default_rng(17)
    good_vocab = ["research", "method", "evidence", "citation", "theory",
                  "analysis", "結果", "précis"]
    bad_vocab = ["buy", "click", "free", "winner", "casino", "pills",
                 "lottery", "xxx"]
    rows = []
    for i in range(240):
        vocab = good_vocab if i % 2 == 0 else bad_vocab
        words = rng.choice(vocab, size=rng.integers(5, 15))
        rows.append((i, " ".join(words), float(1 - i % 2)))
    df = spark.createDataFrame(rows, "doc_id long, text string, label double")
    train = df.filter(F.col("doc_id") % 5 != 0)
    held = df.filter(F.col("doc_id") % 5 == 0)

    wdf, bias, coef = train_quality_model(train, num_buckets=512, max_iter=30)

    # (a) held-out separation
    scored = score_quality_linear(held, coef, bias).join(
        held.select("doc_id", "label"), "doc_id"
    )
    acc = scored.filter(
        (F.col("logit") > 0) == (F.col("label") == 1.0)
    ).count() / held.count()
    assert acc >= 0.95, f"held-out accuracy {acc}"

    # (b) fitted weights frame scores bit-identically to the literal path
    lit = sorted(map(tuple, score_quality_linear(held, coef, bias).collect()))
    join = sorted(
        map(tuple, score_quality_linear_join(held, wdf, 512, bias).collect())
    )
    assert lit == join

    # (c) the gate keeps exactly the positively scored rows
    kept = {r["doc_id"] for r in quality_model_filter(held, coef, bias).collect()}
    want = {r["doc_id"] for r in scored.filter(F.col("logit") > 0).collect()}
    assert kept == want


def test_duplicate_bucket_in_weights_fails_loudly(spark):
    """A duplicate bucket row would fan out the join and silently inflate
    logit and n_tokens — the lazy in-plan guard must raise at execution
    (the plan itself builds job-free)."""
    import pytest

    wdf = spark.createDataFrame(
        [(0, 0.5), (0, 0.7), (1, 0.1)], "bucket int, weight double"
    )
    scored = score_quality_linear_join(_docs(spark), wdf, 64, BIAS)
    with pytest.raises(Exception, match="duplicate bucket"):
        scored.collect()


def test_gate_returns_original_rows_above_threshold(spark):
    docs = _docs(spark)
    kept = quality_model_filter(docs, W, BIAS, min_logit=BIAS)
    scored = score_quality_linear(docs, W, BIAS)
    expect = {r["doc_id"] for r in scored.filter(F.col("logit") > BIAS).collect()}
    got = {r["doc_id"] for r in kept.collect()}
    assert got == expect
    assert kept.columns == docs.columns
