"""DSIR (operators/dsir.py) — importance-resampling data selection.

The r7 verdict's top item: the operator must carry the same proof surface
as every other (suite entries doc_dsir_select / doc_dsir_sample are the
driver-checkable DuckDB oracles; these tests pin the edge cases the
oracle replay can't reach — empty docs, disjoint corpora, determinism,
monotonicity of the estimator, and the Gumbel sampler's seed contract).
"""

from __future__ import annotations

import math

import pytest

from vector_db_api_spark.operators.dsir import (
    DEFAULT_BUCKETS,
    bucket_counts,
    dsir_gumbel_scores,
    dsir_log_ratios,
    dsir_pipeline,
    dsir_sample,
    dsir_scores,
    dsir_select,
    hashed_ngram_buckets,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_features_count_unigrams_plus_bigrams(spark):
    feats = hashed_ngram_buckets(_docs(spark, [(1, "a b c")]))
    # 3 unigrams + 2 bigrams, one row per occurrence, positions 0..4
    rows = feats.collect()
    assert len(rows) == 5
    assert sorted(r["pos"] for r in rows) == [0, 1, 2, 3, 4]
    assert all(0 <= r["bucket"] < DEFAULT_BUCKETS for r in rows)


def test_features_single_token_and_empty_doc(spark):
    # one token → one unigram, no bigrams (the size>=2 guard); empty/space
    # text → zero features and must not crash the pipeline
    assert hashed_ngram_buckets(_docs(spark, [(1, "hello")])).count() == 1
    assert hashed_ngram_buckets(_docs(spark, [(1, ""), (2, "   ")])).count() == 0


def test_repeated_features_are_counted_not_deduped(spark):
    # DSIR weights repeats: "a a a" = 3 unigram occurrences of 'a' + 2
    # bigram occurrences of 'a a'
    counts = bucket_counts(hashed_ngram_buckets(_docs(spark, [(1, "a a a")])))
    got = {r["bucket"]: r["c"] for r in counts.collect()}
    assert sorted(got.values()) == [2, 3]


def test_empty_pool_doc_scores_zero(spark):
    target = _docs(spark, [(100, "spark engine spark engine")])
    pool = _docs(spark, [(1, "spark engine"), (2, "")])
    out = dsir_pipeline(pool, target, k=10)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {1, 2}
    assert rows[2]["n_feats"] == 0
    assert rows[2]["logratio"] == 0.0
    assert rows[2]["logratio_per_feat"] == 0.0
    assert rows[2]["selected"] is True


def test_no_target_overlap_still_finite_and_negative(spark):
    # disjoint vocabularies: every pool feature has target count 0 →
    # per-feature weight ln(1/t_denom) - ln((rc+1)/r_denom) — finite, and
    # negative whenever the pool realizes the feature more than the
    # add-one floor
    target = _docs(spark, [(100, "alpha beta gamma")])
    pool = _docs(spark, [(1, "delta epsilon delta epsilon delta")])
    rows = dsir_pipeline(pool, target, k=5).collect()
    assert len(rows) == 1
    assert math.isfinite(rows[0]["logratio"])
    assert rows[0]["logratio"] < 0.0


def test_target_like_docs_outrank_unlike_docs(spark):
    # the estimator's point: pool docs sharing the target's n-grams score
    # higher per-feature than docs that don't
    target = _docs(
        spark,
        [(100, "the spark engine shuffles data"), (101, "the spark engine scales")],
    )
    pool = _docs(
        spark,
        [
            (1, "the spark engine shuffles data fast"),
            (2, "bananas oranges apples pears grapes melon"),
        ],
    )
    out = {r["doc_id"]: r for r in dsir_pipeline(pool, target, k=2).collect()}
    assert out[1]["logratio_per_feat"] > out[2]["logratio_per_feat"]


def test_select_topk_tie_breaks_to_smaller_id(spark):
    import pyspark.sql.functions as F

    scores = spark.createDataFrame(
        [(3, 1.0), (1, 1.0), (2, 2.0)], "doc_id bigint, s double"
    )
    got = [r["doc_id"] for r in dsir_select(scores, 2, score_col="s").collect()]
    assert sorted(got) == [1, 2]  # 2 (best), then tie 1 vs 3 → 1


def test_pipeline_deterministic_across_runs(spark, sf_dir="/root/testdata/sf0.001"):
    from vector_db_api_spark.sources.tables import load_table

    import pyspark.sql.functions as F

    docs = load_table(spark, sf_dir, "documents")
    target = docs.filter(F.col("source") == "src0")
    pool = docs.filter(F.col("source") != "src0")
    a = sorted(map(tuple, dsir_pipeline(pool, target, k=20).collect()))
    b = sorted(map(tuple, dsir_pipeline(pool, target, k=20).collect()))
    assert a == b and len(a) == 20


def test_gumbel_noise_seeded_and_seed_sensitive(spark):
    scores = spark.createDataFrame(
        [(i, 0.0) for i in range(50)], "doc_id bigint, logratio_per_feat double"
    )
    g7a = {r["doc_id"]: r["gumbel"] for r in dsir_gumbel_scores(scores, seed=7).collect()}
    g7b = {r["doc_id"]: r["gumbel"] for r in dsir_gumbel_scores(scores, seed=7).collect()}
    g8 = {r["doc_id"]: r["gumbel"] for r in dsir_gumbel_scores(scores, seed=8).collect()}
    assert g7a == g7b  # bit-identical replay
    assert g7a != g8  # the seed matters
    assert all(math.isfinite(v) for v in g7a.values())
    # id-keyed, not positional: every id draws a distinct noise value
    assert len(set(g7a.values())) == 50


def test_gumbel_matches_driver_side_replay(spark):
    """The noise column is a pure function u=(h32('gumbel7:'||id)+1)/(2^32+1),
    g=-log(-log u) — replay it in driver Python byte-for-byte."""
    import hashlib

    scores = spark.createDataFrame(
        [(i, 0.25) for i in (0, 1, 41, 999)],
        "doc_id bigint, logratio_per_feat double",
    )
    got = {r["doc_id"]: r["gumbel"] for r in dsir_gumbel_scores(scores, seed=7).collect()}
    for i, g in got.items():
        h = int(hashlib.md5(f"gumbel7:{i}".encode()).hexdigest()[:8], 16)
        u = (h + 1) / float((1 << 32) + 1)
        assert g == -math.log(-math.log(u)), i


def test_sample_differs_from_argmax_select(spark):
    """Gumbel resampling must actually resample: with many near-tied
    scores the sampled top-k differs from the argmax top-k."""
    target = _docs(spark, [(100, "common words shared by every doc")])
    pool = _docs(
        spark,
        [(i, f"common words shared by every doc variant {i}") for i in range(40)],
    )
    t_counts = bucket_counts(hashed_ngram_buckets(target))
    r_counts = bucket_counts(hashed_ngram_buckets(pool))
    ratios = dsir_log_ratios(t_counts, r_counts)
    scores = dsir_scores(pool, ratios)
    argmax = {r["doc_id"] for r in dsir_select(scores, 10).collect()}
    sampled = {r["doc_id"] for r in dsir_sample(scores, 10).collect()}
    assert len(sampled) == 10
    assert sampled != argmax


def test_select_plan_is_two_phase_topk(spark):
    """Global top-k must plan as TakeOrderedAndProject (per-partition
    heads + driver merge), never a full global Sort."""
    target = _docs(spark, [(100, "spark engine")])
    pool = _docs(spark, [(i, f"doc number {i}") for i in range(20)])
    plan = dsir_pipeline(pool, target, k=5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_fast_scores_match_exact_shape(spark):
    """dsir_scores_fast (plain SUM, r8 verdict #4) vs the ordered-fold
    oracle shape: identical (id, n_feats), scores within float-reassociation
    tolerance, and IDENTICAL top-k selection on real testdata."""
    from pyspark.sql import functions as F

    from vector_db_api_spark.operators.dsir import dsir_scores_fast
    from vector_db_api_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    target = docs.filter(F.col("source") == "src0")
    pool = docs.filter(F.col("source") != "src0")
    t_counts = bucket_counts(hashed_ngram_buckets(target))
    r_counts = bucket_counts(hashed_ngram_buckets(pool))
    ratios = dsir_log_ratios(t_counts, r_counts).localCheckpoint(eager=True)
    exact = {r["doc_id"]: r for r in dsir_scores(pool, ratios).collect()}
    fast = {r["doc_id"]: r for r in dsir_scores_fast(pool, ratios).collect()}
    assert set(exact) == set(fast)
    for did, e in exact.items():
        f = fast[did]
        assert e["n_feats"] == f["n_feats"], did
        assert math.isclose(
            e["logratio"], f["logratio"], rel_tol=1e-9, abs_tol=1e-12
        ), (did, e["logratio"], f["logratio"])
    sel_e = [r["doc_id"] for r in dsir_select(dsir_scores(pool, ratios), 20).collect()]
    sel_f = [r["doc_id"] for r in dsir_select(dsir_scores_fast(pool, ratios), 20).collect()]
    assert sel_e == sel_f


def test_fast_scores_empty_doc_and_plan_shape(spark):
    """Empty docs score (0, 0.0) in the fast shape too, and the fast plan
    must contain NO collect_list/array_sort (that's the whole point) while
    keeping the broadcast weight join."""
    from vector_db_api_spark.operators.dsir import dsir_scores_fast

    pool = _docs(spark, [(1, "a b"), (2, "")])
    target = _docs(spark, [(10, "a")])
    ratios = dsir_log_ratios(
        bucket_counts(hashed_ngram_buckets(target)),
        bucket_counts(hashed_ngram_buckets(pool)),
    )
    scored = dsir_scores_fast(pool, ratios)
    rows = {r["doc_id"]: r for r in scored.collect()}
    assert rows[2]["n_feats"] == 0 and rows[2]["logratio"] == 0.0
    assert rows[2]["logratio_per_feat"] == 0.0
    assert rows[1]["n_feats"] == 3
    plan = scored._jdf.queryExecution().optimizedPlan().toString()
    assert "collect_list" not in plan and "array_sort" not in plan
    assert "ResolvedHint" in plan or "broadcast" in plan.lower()


def test_single_scan_fit_bit_identical_to_two_scan(spark):
    """dsir_fit (one featurization scan, conditional counts) must produce a
    BIT-identical weight table to the two-frame bucket_counts +
    dsir_log_ratios fit — same exact-integer counts, same totals, same
    libm logs. Null predicate rows belong to neither distribution, exactly
    like the two-frame split's two exclusive filters."""
    from pyspark.sql import functions as F

    from vector_db_api_spark.operators.dsir import dsir_fit

    docs = spark.createDataFrame(
        [(1, "a b c", "t"), (2, "a a d", "p"), (3, "b d e f", "p"),
         (4, "c", "t"), (5, "x y", None)],
        "doc_id bigint, text string, side string",
    )
    target = docs.filter(F.col("side") == "t")
    pool = docs.filter(F.col("side") != "t")
    two = {
        r["bucket"]: r["w"]
        for r in dsir_log_ratios(
            bucket_counts(hashed_ngram_buckets(target)),
            bucket_counts(hashed_ngram_buckets(pool)),
        ).collect()
    }
    one = {
        r["bucket"]: r["w"]
        for r in dsir_fit(docs, F.col("side") == "t").collect()
    }
    assert one == two  # bit-exact float equality, same bucket row set


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01"])
def test_fast_selection_boundary_margin(spark, sf):
    """doc_dsir_select_fast's oracle parity holds only while the score gap
    at the k-selection boundary exceeds float-reassociation noise (the fast
    shape's SUM order is engine-chosen run to run). Pin the measured margin
    (6.4e-5 at sf0.001, 2.5e-4 at sf0.01 — ~8 orders above ~1e-13 noise) so
    regenerated testdata that introduces a near-tie fails HERE loudly
    instead of flaking the driver's hash check."""
    from pyspark.sql import functions as F

    from vector_db_api_spark import suite
    from vector_db_api_spark.operators.dsir import dsir_fit, dsir_scores_fast
    from vector_db_api_spark.sources.tables import load_table

    docs = load_table(spark, f"/root/testdata/{sf}", "documents")
    pool = docs.filter(F.col("source") != suite.DSIR_TARGET_SOURCE)
    ratios = dsir_fit(
        docs, F.col("source") == suite.DSIR_TARGET_SOURCE,
        buckets=suite.DSIR_BUCKETS,
    )
    top = (
        dsir_scores_fast(pool, ratios, buckets=suite.DSIR_BUCKETS)
        .orderBy(F.desc("logratio_per_feat"), F.asc("doc_id"))
        .limit(suite.DSIR_K + 1)
        .collect()
    )
    gap = (top[suite.DSIR_K - 1]["logratio_per_feat"]
           - top[suite.DSIR_K]["logratio_per_feat"])
    assert gap > 1e-6, (
        f"selection boundary margin {gap} too small for the sum-order-"
        f"independent parity claim; re-rank the boundary with the exact "
        f"ordered fold or drop the fast entry's oracle"
    )
