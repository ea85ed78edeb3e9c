"""Bit-exactness of the numpy throughput kernels vs their expression twins.

The expression paths (text.winnow_table, dedup.simhash) are the
oracle-checked definitions; the kernels exist for throughput. These tests
pin row-level equality on the real testdata documents plus the edge shapes
(empty text, short docs, null text, runs of spaces, repeated tokens) so
either implementation can be swapped for the other anywhere.
"""

from __future__ import annotations

import pytest

from vector_db_api_spark.functions.kernels import simhash_np, winnow_table_np
from vector_db_api_spark.functions.text import winnow_table
from vector_db_api_spark.operators.dedup import simhash
from vector_db_api_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    df = load_table(spark, SF_DIR, "documents").select("doc_id", "text").cache()
    yield df
    df.unpersist()


def test_winnow_kernel_matches_expression_on_testdata(spark, docs):
    expr = {
        r["doc_id"]: r["winnow_fps"]
        for r in winnow_table(docs, "doc_id").collect()
    }
    kern = {
        r["doc_id"]: r["winnow_fps"]
        for r in winnow_table_np(docs, "doc_id").collect()
    }
    assert kern == expr


def test_simhash_kernel_matches_expression_on_testdata(spark, docs):
    expr = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    kern = {r["doc_id"]: r["simhash"] for r in simhash_np(docs).collect()}
    assert kern == expr


def test_kernels_match_on_edge_shapes(spark):
    rows = [
        (1, ""),
        (2, "one"),
        (3, "one two"),
        (4, "exactly three word doc"),
        (5, "  leading   and   trailing  spaces   everywhere   "),
        (6, "rep rep rep rep rep rep rep rep"),
        (7, "MiXeD Case TEXT with CASE folding"),
        (8, None),
        (9, "tab\tand\nnewline are not collapsed by normalize"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")

    w_expr = {r["doc_id"]: r["winnow_fps"] for r in winnow_table(df, "doc_id").collect()}
    w_kern = {r["doc_id"]: r["winnow_fps"] for r in winnow_table_np(df, "doc_id").collect()}
    assert w_expr[8] == [None]  # null text → one-element null array (pinned)
    assert w_kern == w_expr

    s_expr = {r["doc_id"]: r["simhash"] for r in simhash(df).collect()}
    s_kern = {r["doc_id"]: r["simhash"] for r in simhash_np(df).collect()}
    # null text: explode drops the doc in both implementations
    assert 8 not in s_expr and 8 not in s_kern
    assert s_kern == s_expr


def test_repetition_kernel_matches_expression(spark):
    from vector_db_api_spark.functions.kernels import repetition_stats_np
    from vector_db_api_spark.operators.repetition import ngram_repetition_stats
    from vector_db_api_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    a = sorted(map(tuple, ngram_repetition_stats(docs).collect()))
    b = sorted(map(tuple, repetition_stats_np(docs).collect()))
    assert a == b  # bit-equal incl. the double divisions

    edge = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "solo"), (3, None), (4, "")],
        "doc_id bigint, text string",
    )
    a = sorted(map(tuple, ngram_repetition_stats(edge).collect()))
    b = sorted(map(tuple, repetition_stats_np(edge).collect()))
    assert a == b
