"""Decontamination + repetition-filter operators on planted fixtures."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from vector_db_api_spark.operators import decontaminate as X
from vector_db_api_spark.operators import repetition as R

BENCH_Q = "what is the capital of france and when was it founded exactly"
CLEAN = "spark shuffles partition data across executors during wide transformations"


@pytest.fixture(scope="module")
def corpora(spark):
    # train doc 1 embeds the benchmark question verbatim (contaminated);
    # train doc 2 shares no 8-gram; train doc 3 shares a 5-word prefix only.
    train = spark.createDataFrame(
        [
            (1, f"intro text then {BENCH_Q} then trailing commentary"),
            (2, CLEAN),
            (3, "what is the capital of germany which differs beyond five words"),
        ],
        "doc_id bigint, text string",
    )
    bench = spark.createDataFrame(
        [(100, BENCH_Q), (101, "another benchmark prompt entirely unrelated")],
        "bench_id bigint, text string",
    )
    return train, bench


def test_contamination_pairs_planted(corpora):
    train, bench = corpora
    pairs = {
        (r["train_id"], r["bench_id"]): r["n_shared"]
        for r in X.contamination_pairs(train, bench, k=8).collect()
    }
    # BENCH_Q has 12 words -> 5 distinct 8-grams, all inside doc 1's text
    assert pairs == {(1, 100): 5}


def test_contamination_respects_min_shared(corpora):
    train, bench = corpora
    assert X.contamination_pairs(train, bench, k=8, min_shared=6).count() == 0


def test_decontaminate_drops_only_flagged(corpora):
    train, bench = corpora
    kept = sorted(r["doc_id"] for r in X.decontaminate(train, bench, k=8).collect())
    assert kept == [2, 3]


def test_contaminated_ids_aggregates(corpora):
    train, bench = corpora
    rows = X.contaminated_ids(train, bench, k=8).collect()
    assert len(rows) == 1
    assert rows[0]["train_id"] == 1
    assert rows[0]["n_bench_hits"] == 1 and rows[0]["max_shared"] == 5


def test_repetition_stats_hand_computed(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b a b a b"),   # 2-grams: ab,ba,ab,ba,ab -> top 3/5, dup 5/5
            (2, "w x y z"),       # all three 2-grams distinct
            (3, None),            # null text -> zero row survives
        ],
        "doc_id bigint, text string",
    )
    stats = {r["doc_id"]: r for r in R.ngram_repetition_stats(docs, n=2).collect()}
    assert stats[1]["n_ngrams"] == 5
    assert stats[1]["top_ngram_frac"] == pytest.approx(3 / 5)
    assert stats[1]["dup_ngram_frac"] == pytest.approx(1.0)
    assert stats[2]["n_ngrams"] == 3
    assert stats[2]["top_ngram_frac"] == pytest.approx(1 / 3)
    assert stats[2]["dup_ngram_frac"] == 0.0
    assert stats[3]["n_ngrams"] == 0 and stats[3]["top_ngram_frac"] == 0.0


def test_repetition_filter_gates(spark):
    docs = spark.createDataFrame(
        [(1, "buy now buy now buy now buy now"), (2, CLEAN)],
        "doc_id bigint, text string",
    )
    kept = [r["doc_id"] for r in R.repetition_filter(docs).collect()]
    assert kept == [2]


def test_decontaminate_against_duckdb_oracle(spark):
    """Replay contamination_pairs on the real sf0.001 documents in DuckDB."""
    import duckdb

    from vector_db_api_spark.sources.tables import load_table
    from vector_db_api_spark import oracle as O

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents")
    bench = (
        docs.filter(F.col("doc_id") % 7 == 0)
        .withColumnRenamed("doc_id", "bench_id")
    )
    train = docs.filter(F.col("doc_id") % 7 != 0)
    got = sorted(
        (r["train_id"], r["bench_id"], r["n_shared"])
        for r in X.contamination_pairs(train, bench, k=8).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            f"""
WITH sh AS ({O.shingle_hashes_cte('documents', 'doc_id', 'text', 8)}),
b AS (SELECT doc_id AS bench_id, shingle_hash FROM sh WHERE doc_id % 7 = 0),
t AS (SELECT doc_id AS train_id, shingle_hash FROM sh WHERE doc_id % 7 <> 0)
SELECT train_id, bench_id, CAST(COUNT(*) AS BIGINT) AS n_shared
FROM t JOIN b USING (shingle_hash) GROUP BY 1, 2
"""
        ).fetchall()
    )
    assert got == want
