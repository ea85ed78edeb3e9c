"""Unigram-LM quality scoring: hand-computed NLL, OOV handling, filter."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from vector_db_api_spark.operators import lm as LM


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(1, "a a b"), (2, "a b"), (3, None)], "doc_id bigint, text string"
    )


def test_unigram_model_hand_computed(docs):
    model, oov = LM.train_unigram(docs)
    # counts: a=3, b=2, total=5, V=2, denom=8
    assert model["a"] == pytest.approx(math.log(4 / 8))
    assert model["b"] == pytest.approx(math.log(3 / 8))
    assert oov == pytest.approx(math.log(1 / 8))


def test_doc_nll_fold_and_oov(spark, docs):
    model, oov = LM.train_unigram(docs)
    scored = {r["doc_id"]: r for r in LM.doc_nll(docs, model, oov).collect()}
    la, lb = math.log(4 / 8), math.log(3 / 8)
    assert scored[1]["nll"] == pytest.approx(-(la + la + lb))
    assert scored[1]["n_tokens"] == 3
    assert scored[3]["n_tokens"] == 0 and scored[3]["nll"] == 0.0
    # an OOV-heavy doc scores worse per token than in-vocab text
    weird = spark.createDataFrame([(9, "zzz qqq")], "doc_id bigint, text string")
    w = LM.doc_nll(weird, model, oov).collect()[0]
    assert w["nll_per_token"] == pytest.approx(-math.log(1 / 8))
    assert w["nll_per_token"] > scored[1]["nll_per_token"]


def test_train_unigram_df_matches_literal_trainer(spark, docs):
    model, oov = LM.train_unigram(docs)
    model_df, oov_df = LM.train_unigram_df(docs)
    assert oov_df == oov
    dist = {r["token"]: r["logprob"] for r in model_df.collect()}
    assert dist == model  # bit-exact, not approx


def test_doc_nll_join_equals_literal_path(spark, docs):
    model, oov = LM.train_unigram(docs)
    model_df, _ = LM.train_unigram_df(docs)
    lit = {r["doc_id"]: tuple(r) for r in LM.doc_nll(docs, model, oov).collect()}
    jn = {
        r["doc_id"]: tuple(r)
        for r in LM.doc_nll_join(docs, model_df, oov).collect()
    }
    assert jn == lit  # same rows incl. empty doc, bit-exact doubles


def test_doc_nll_join_shuffle_join_variant(spark, docs):
    # broadcast_model=False is the huge-vocab path: same result via a
    # shuffle join on token
    model, oov = LM.train_unigram(docs)
    model_df, _ = LM.train_unigram_df(docs)
    lit = {r["doc_id"]: tuple(r) for r in LM.doc_nll(docs, model, oov).collect()}
    jn = {
        r["doc_id"]: tuple(r)
        for r in LM.doc_nll_join(
            docs, model_df, oov, broadcast_model=False
        ).collect()
    }
    assert jn == lit


def test_doc_nll_join_large_vocab(spark):
    # 50k-type vocabulary: far beyond what a map literal tolerates, routine
    # for the join path. Score a few docs whose NLL is hand-computable.
    n_types = 50_000
    vocab = spark.range(n_types).select(
        F.concat(F.lit("tok"), F.col("id")).alias("w")
    )
    corpus = vocab.agg(F.concat_ws(" ", F.collect_list("w")).alias("text")).select(
        F.lit(0).alias("doc_id"), "text"
    )
    probe = spark.createDataFrame(
        [(1, "tok0 tok1 tok0"), (2, "unseen_xyz tok49999")],
        "doc_id bigint, text string",
    )
    docs = corpus.select("doc_id", "text").union(probe)
    model_df, oov = LM.train_unigram_df(docs)
    assert model_df.count() == n_types + 1  # +1 for unseen_xyz
    scored = {r["doc_id"]: r for r in LM.doc_nll_join(docs, model_df, oov).collect()}
    # counts: tok0=3, tok1=2, tok49999=2, unseen_xyz=1, others=1;
    # total occurrences = n_types (corpus) + 5 (probe docs)
    total = n_types + 5
    denom = total + (n_types + 1) + 1
    assert scored[1]["n_tokens"] == 3
    la, lb = math.log(4 / denom), math.log(3 / denom)
    assert scored[1]["nll"] == -(la + lb + la)
    assert scored[2]["nll"] == -(math.log(2 / denom) + math.log(3 / denom))


def test_lm_quality_filter_drops_high_perplexity(spark):
    rows = [(i, "the common phrasing appears again and again") for i in range(9)]
    rows.append((99, "xqj vvk zzt blorp wug"))  # gibberish vs the corpus
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    model, oov = LM.train_unigram(docs)
    scores = LM.doc_nll(docs, model, oov)
    bar = scores.filter(F.col("doc_id") != 99).agg(
        F.max("nll_per_token")
    ).collect()[0][0]
    kept = sorted(
        r["doc_id"] for r in LM.lm_quality_filter(docs, bar + 1e-9).collect()
    )
    assert kept == list(range(9))


# ---------------------------------------------------------------------------
# CCNet perplexity buckets
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def graded_docs(spark):
    """30 docs with strictly increasing OOV share -> strictly increasing
    per-token NLL under a model trained on common tokens only."""
    rows = []
    for i in range(30):
        common = ["the"] * (30 - i)
        rare = [f"rare{i}_{j}" for j in range(i)]
        rows.append((i, " ".join(common + rare)))
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_perplexity_buckets_exact_tiling(spark, graded_docs):
    model, oov = LM.train_unigram(graded_docs)
    out = LM.perplexity_buckets(graded_docs, model, oov).collect()
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r["bucket"], []).append(r)
    # equal thirds, and the NLL ranges are ordered head < middle < tail
    assert {k: len(v) for k, v in by_bucket.items()} == {
        "head": 10, "middle": 10, "tail": 10
    }
    assert max(r["nll_per_token"] for r in by_bucket["head"]) <= min(
        r["nll_per_token"] for r in by_bucket["middle"]
    )
    assert max(r["nll_per_token"] for r in by_bucket["middle"]) <= min(
        r["nll_per_token"] for r in by_bucket["tail"]
    )


def test_perplexity_buckets_tie_break_is_id(spark):
    # identical docs -> identical NLL; NTILE order falls back to doc_id
    docs = spark.createDataFrame(
        [(i, "same text here") for i in range(1, 7)],
        "doc_id bigint, text string",
    )
    model, oov = LM.train_unigram(docs)
    out = {r["doc_id"]: r["bucket"] for r in
           LM.perplexity_buckets(docs, model, oov).collect()}
    assert out == {1: "head", 2: "head", 3: "middle", 4: "middle",
                   5: "tail", 6: "tail"}


def test_perplexity_buckets_approx_matches_exact_away_from_cuts(
    spark, graded_docs
):
    """The production twin must agree with the exact NTILE everywhere the
    sketch tolerance cannot bite: with 30 well-separated NLL values and
    relative_error 0.001, every assignment is identical."""
    model, oov = LM.train_unigram(graded_docs)
    model_df, oov2 = LM.train_unigram_df(graded_docs)
    assert oov2 == pytest.approx(oov)
    exact = {r["doc_id"]: r["bucket"] for r in
             LM.perplexity_buckets(graded_docs, model, oov).collect()}
    approx = {r["doc_id"]: r["bucket"] for r in
              LM.perplexity_buckets_approx(graded_docs, model_df, oov2).collect()}
    assert approx == exact


def test_perplexity_buckets_approx_has_no_global_sort(spark, graded_docs):
    """Scale pin: the approx twin's PLAN contains no single-partition
    window/sort (the exact twin's documented cost). Assignment must be a
    projection over the scored scan."""
    model_df, oov = LM.train_unigram_df(graded_docs)
    plan = (
        LM.perplexity_buckets_approx(graded_docs, model_df, oov)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan, plan


def test_perplexity_buckets_custom_bucket_count(spark, graded_docs):
    model, oov = LM.train_unigram(graded_docs)
    out = LM.perplexity_buckets(graded_docs, model, oov, num_buckets=5)
    counts = {r["bucket"]: r["c"] for r in
              out.groupBy("bucket").agg(F.count("*").alias("c")).collect()}
    assert counts == {"b1": 6, "b2": 6, "b3": 6, "b4": 6, "b5": 6}
