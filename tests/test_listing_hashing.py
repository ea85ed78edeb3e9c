"""Listing/pagination operators and the portable hashing layer."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from vector_db_api_spark.functions import hashing as H
from vector_db_api_spark.operators import listing as L


@pytest.fixture(scope="module")
def items(spark):
    rows = [(i, f"n{i}", i % 3, 100 + (i * 37) % 50) for i in range(30)]
    return spark.createDataFrame(rows, "id bigint, name string, cat int, size int")


def test_list_page_slice(items):
    out = L.list_page(
        items,
        order_by=[F.desc("size"), F.asc("id")],
        offset=3,
        limit=5,
        filters=[F.col("cat") == 0],
    ).collect()
    all_rows = sorted(
        (r for r in items.collect() if r["cat"] == 0),
        key=lambda r: (-r["size"], r["id"]),
    )
    assert [r["id"] for r in out] == [r["id"] for r in all_rows[3:8]]


def test_page_stats_has_more(items):
    page_len, more = L.page_stats(items, offset=0, limit=10)
    assert (page_len, more) == (10, True)
    page_len, more = L.page_stats(items, offset=25, limit=10)
    assert (page_len, more) == (5, False)
    page_len, more = L.page_stats(items, offset=0, limit=30)
    assert (page_len, more) == (30, False)


def test_h32_h60_ranges(spark):
    df = spark.createDataFrame([(f"s{i}",) for i in range(50)], "s string")
    rows = df.select(H.h32("s").alias("a"), H.h60("s").alias("b")).collect()
    assert all(0 <= r["a"] < 1 << 32 for r in rows)
    assert all(0 <= r["b"] < 1 << 60 for r in rows)
    assert len({r["a"] for r in rows}) == 50  # no collisions on tiny set


def test_minhash_params_deterministic():
    assert H.minhash_params(8, seed=1) == H.minhash_params(8, seed=1)
    assert H.minhash_params(8, seed=1) != H.minhash_params(8, seed=2)
    for a, b in H.minhash_params(16):
        assert 1 <= a < 1 << 31 and 0 <= b < 1 << 31


def test_word_shingles_short_doc(spark):
    df = spark.createDataFrame([("one two",)], "s string")
    out = df.select(H.word_shingles("s", 3).alias("sh")).collect()[0]["sh"]
    assert out == ["one two"]  # shorter than k → whole text as one shingle


def test_word_shingles_normal(spark):
    df = spark.createDataFrame([("a b c d",)], "s string")
    out = df.select(H.word_shingles("s", 2).alias("sh")).collect()[0]["sh"]
    assert out == ["a b", "b c", "c d"]
