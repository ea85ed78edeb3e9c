"""RRF hybrid retrieval: formula check, consensus behavior, DuckDB replay."""

from __future__ import annotations

import pytest

from vector_db_api_spark.operators import hybrid as HY


def _lists(spark):
    a = spark.createDataFrame(
        [(1, 0.9), (2, 0.8), (3, 0.7)], "doc_id bigint, score double"
    )
    b = spark.createDataFrame(
        [(2, 5.0), (4, 4.0), (1, 3.0)], "doc_id bigint, score double"
    )
    return a, b


def test_rrf_formula_and_ranks(spark):
    a, b = _lists(spark)
    rows = {r["doc_id"]: r for r in HY.rrf_fuse(a, b, k=10).collect()}
    # doc 2: rank 2 in a, rank 1 in b
    assert rows[2]["rank_a"] == 2 and rows[2]["rank_b"] == 1
    assert rows[2]["rrf_score"] == pytest.approx(1 / 62 + 1 / 61)
    # doc 3 only in a (rank 3); doc 4 only in b (rank 2)
    assert rows[3]["rank_b"] is None
    assert rows[3]["rrf_score"] == pytest.approx(1 / 63)
    assert rows[4]["rrf_score"] == pytest.approx(1 / 62)


def test_rrf_consensus_beats_single_list_head(spark):
    a, b = _lists(spark)
    top = HY.rrf_fuse(a, b, k=1).collect()[0]
    # docs 1 and 2 appear in both lists; 2 has ranks (2,1), 1 has (1,3)
    assert top["doc_id"] == 2


def test_rrf_k_truncates_deterministically(spark):
    a, b = _lists(spark)
    ids = [r["doc_id"] for r in HY.rrf_fuse(a, b, k=2).collect()]
    assert len(ids) == 2 and ids[0] == 2


def test_hybrid_against_duckdb_oracle(spark):
    import duckdb

    from vector_db_api_spark.suite import q_hybrid_rrf, _sql_hybrid_rrf

    sf = "/root/testdata/sf0.001"
    got = sorted(
        (r["doc_id"], r["rrf_score"], r["rank_a"], r["rank_b"])
        for r in q_hybrid_rrf(spark, sf).collect()
    )
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    want = sorted(tuple(r) for r in con.execute(_sql_hybrid_rrf()).fetchall())
    assert got == want  # bit-exact: rational arithmetic only
