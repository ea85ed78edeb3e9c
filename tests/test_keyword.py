"""BM25 keyword search: hand-computed scores, path equivalence, DuckDB replay."""

from __future__ import annotations

import math

import pytest

from vector_db_api_spark.operators import keyword as KW


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "spark joins shuffle data"),
            (2, "spark spark spark tuning"),
            (3, "completely unrelated words here also longer than the others"),
            (4, "join tuning guide"),
        ],
        "doc_id bigint, text string",
    )


def _bm25(tf, dl, n, df, avgdl, k1=1.2, b=0.75):
    idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    return idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))


def test_bm25_hand_computed(docs):
    got = {r["doc_id"]: r["score"] for r in KW.bm25_scores(docs, "spark").collect()}
    avgdl = (4 + 4 + 9 + 3) / 4.0
    assert set(got) == {1, 2}
    assert got[1] == pytest.approx(_bm25(1, 4, 4, 2, avgdl), rel=1e-12)
    assert got[2] == pytest.approx(_bm25(3, 4, 4, 2, avgdl), rel=1e-12)


def test_bm25_topk_order_and_tiebreak(docs):
    rows = KW.bm25_topk(docs, "spark join", k=3).collect()
    ids = [r["doc_id"] for r in rows]
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert set(ids) <= {1, 2, 4} and len(ids) == 3


def test_bm25_rewards_rarity(docs):
    # 'tuning' (df=2) beats 'spark' (df=2)? no — same df; use 'shuffle' (df=1)
    got = {r["doc_id"]: r["score"] for r in KW.bm25_scores(docs, "shuffle tuning").collect()}
    # doc 1 matches only rare 'shuffle'; doc 4 matches 'tuning' with shorter dl
    assert set(got) == {1, 2, 4}


def test_postings_path_matches_expression_path(docs):
    postings, doclens = KW.build_postings(docs)
    a = {r["doc_id"]: r["score"] for r in KW.bm25_topk(docs, "spark join tuning", k=4).collect()}
    b = {r["doc_id"]: r["score"] for r in
         KW.bm25_topk_postings(postings, doclens, "spark join tuning", k=4).collect()}
    assert set(a) == set(b)
    for d in a:
        assert a[d] == pytest.approx(b[d], rel=1e-9)


def test_bm25_empty_query_raises(docs):
    with pytest.raises(ValueError):
        KW.bm25_scores(docs, "   ")


def test_bm25_against_duckdb_oracle(spark):
    import duckdb

    from vector_db_api_spark.sources.tables import load_table
    from vector_db_api_spark.suite import _sql_doc_bm25, BM25_QUERY

    sf = "/root/testdata/sf0.001"
    got = sorted(
        (r["doc_id"], r["score"])
        for r in KW.bm25_scores(load_table(spark, sf, "documents"), BM25_QUERY).collect()
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    want = sorted(tuple(r) for r in con.execute(_sql_doc_bm25()).fetchall())
    assert len(got) == len(want)
    for (gi, gs), (wi, ws) in zip(got, want):
        assert gi == wi
        assert gs == ws  # bit-exact: fixed-order expression sum on both sides
