"""Int8 scalar quantization: error bound, degenerate inputs, and search
quality after dequantization."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_db_api_spark.functions import quant as QT
from vector_db_api_spark.operators.knn import knn
from vector_db_api_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _quantized_emb(spark):
    return load_table(spark, SF_DIR, "embeddings").withColumn(
        "q", QT.quantize_int8("embedding")
    )


def test_codes_within_int8_range(spark):
    df = _quantized_emb(spark)
    out_of_range = df.filter(
        F.exists(F.col("q.codes"), lambda c: (c > 127) | (c < -127))
    )
    assert out_of_range.count() == 0


def test_reconstruction_error_bounded_by_half_scale(spark):
    df = _quantized_emb(spark).select(
        F.col("q.scale").alias("scale"),
        QT.reconstruction_error("embedding", "q").alias("err"),
    )
    # |x/scale + 0.5 - floor(...)| < 1 → err < scale/2 up to fp slack
    bad = df.filter(F.col("err") > F.col("scale") * 0.5 * (1 + 1e-9))
    assert bad.count() == 0


def test_zero_vector_quantizes_to_zero(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0])], "id bigint, embedding array<double>"
    ).withColumn("q", QT.quantize_int8("embedding"))
    row = df.select(
        "q.scale",
        "q.codes",
        QT.reconstruction_error("embedding", "q").alias("err"),
        QT.dequantize_int8("q").alias("deq"),
    ).collect()[0]
    assert row["scale"] == 0.0
    assert list(row["codes"]) == [0, 0, 0]
    assert row["err"] == 0.0
    assert list(row["deq"]) == [0.0, 0.0, 0.0]


def test_dequantized_search_preserves_topk(spark, clustered_df):
    """kNN over the 4×-smaller dequantized column must find (nearly) the
    same neighbors — the property that makes quantized scans usable as the
    first pass of a two-stage search."""
    deq = clustered_df.withColumn(
        "embedding", QT.dequantize_int8(QT.quantize_int8("embedding"))
    )
    q = [float(x) for x in clustered_df.limit(1).collect()[0]["embedding"]]
    exact = [r["id"] for r in knn(clustered_df, q, 10).collect()]
    approx = [r["id"] for r in knn(deq, q, 10).collect()]
    overlap = len(set(exact) & set(approx)) / 10
    assert overlap >= 0.9, (exact, approx)


def test_knn_quantized_two_stage_recall(spark, clustered_df):
    from vector_db_api_spark.operators.knn import knn, knn_quantized

    corpus = clustered_df.withColumn("embedding_q", QT.quantize_int8("embedding"))
    qs = [r["embedding"] for r in clustered_df.limit(3).collect()]
    for qv in qs:
        q = [float(x) for x in qv]
        exact = [r["id"] for r in knn(clustered_df, q, 10).collect()]
        approx = [r["id"] for r in knn_quantized(corpus, q, 10, oversample=4).collect()]
        overlap = len(set(exact) & set(approx)) / 10
        assert overlap >= 0.9, (exact, approx)


def test_knn_quantized_returns_exact_scores(spark, clustered_df):
    """Stage-2 scores come from the FLOAT column — identical to plain kNN
    for any id both return."""
    from vector_db_api_spark.operators.knn import knn, knn_quantized

    corpus = clustered_df.withColumn("embedding_q", QT.quantize_int8("embedding"))
    q = [float(x) for x in clustered_df.limit(1).collect()[0]["embedding"]]
    exact = {r["id"]: r["score"] for r in knn(clustered_df, q, 10).collect()}
    two_stage = {r["id"]: r["score"] for r in knn_quantized(corpus, q, 10).collect()}
    for i, s in two_stage.items():
        if i in exact:
            assert s == exact[i]
