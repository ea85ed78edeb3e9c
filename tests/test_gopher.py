"""Gopher/MassiveText structure rules (operators/gopher.py): hand-computed
stats on fixtures that exercise every rule — the synthetic corpus has no
newlines/bullets/ellipses, so these features are pinned here."""

from __future__ import annotations

import pytest

from vector_db_api_spark.operators import gopher as G

GOOD = (
    "the quick brown fox jumps over the lazy dog and then it will have "
    "gone to sleep with all of its friends because that was a long day "
    "for everyone involved in the great big chase through the old forest "
    "where they be running and playing all afternoon long until the sun "
    "went down behind the tall hills"
)  # 58 words, all alphabetic, >=2 stopwords, no bullets/symbols


def _stats(spark, rows):
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = G.gopher_stats(df)
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_good_doc_passes_all_rules(spark):
    s = _stats(spark, [(1, GOOD)])[1]
    assert s["n_words"] == 58
    assert 3.0 <= s["mean_word_len"] <= 10.0
    assert s["hash_word_ratio"] == 0.0
    assert s["ellipsis_word_ratio"] == 0.0
    assert s["bullet_line_frac"] == 0.0 and s["ellipsis_line_frac"] == 0.0
    assert s["alpha_word_frac"] == 1.0
    assert s["n_stopwords_present"] >= 2
    df = spark.createDataFrame([(1, GOOD)], "doc_id bigint, text string")
    assert G.gopher_filter(df).count() == 1


def test_word_count_and_mean_length_hand_computed(spark):
    s = _stats(spark, [(1, "aa bbbb cc")])[1]
    assert s["n_words"] == 3
    assert s["mean_word_len"] == pytest.approx(8 / 3)


def test_symbol_ratios_count_hash_and_ellipsis_separately(spark):
    s = _stats(spark, [(1, "see # and ... plus #tag here now")])[1]
    # 2 '#' and 1 '...' over 8 words — two independent ratios (Rae et al.
    # table A1 thresholds each symbol separately; r12 advice)
    assert s["n_words"] == 8
    assert s["hash_word_ratio"] == pytest.approx(2 / 8)
    assert s["ellipsis_word_ratio"] == pytest.approx(1 / 8)


def test_symbol_gate_is_per_symbol_not_combined(spark):
    """0.06 + 0.06 must PASS (each ratio under 0.1) — the combined-ratio
    formulation this replaces failed it."""
    from vector_db_api_spark.operators.gopher import gopher_keep, gopher_stats

    words = ["the", "be", "to", "of", "and", "that", "have", "with"] * 7
    # 56 alphabetic words + 4 hashes + 4 ellipses attached to the FIRST
    # word (no new words; not line-final, so the ellipsis LINE gate —
    # a different rule — stays quiet)
    text = words[0] + "#" * 4 + "..." * 4 + " " + " ".join(words[1:])
    import vector_db_api_spark.operators.gopher as G
    docs = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    stats = G.gopher_stats(docs)
    row = stats.collect()[0]
    assert 0.05 < row["hash_word_ratio"] <= 0.1
    assert 0.05 < row["ellipsis_word_ratio"] <= 0.1
    kept = stats.filter(gopher_keep(stats)).count()
    assert kept == 1


def test_bullet_and_ellipsis_line_fractions(spark):
    text = "- first bullet\n* second bullet\nplain line\ntrailing dots...\n• third"
    s = _stats(spark, [(1, text)])[1]
    assert s["bullet_line_frac"] == pytest.approx(3 / 5)
    assert s["ellipsis_line_frac"] == pytest.approx(1 / 5)


def test_alpha_word_fraction_and_stopword_presence(spark):
    s = _stats(spark, [(1, "the 123 45 cat 99 of")])[1]
    assert s["alpha_word_frac"] == pytest.approx(3 / 6)
    # 'the' and 'of' present -> 2 DISTINCT stopwords (presence, not count)
    assert s["n_stopwords_present"] == 2
    s2 = _stats(spark, [(1, "the the the the")])[1]
    assert s2["n_stopwords_present"] == 1


def test_empty_and_null_docs_get_zero_stats_and_fail_keep(spark):
    stats = _stats(spark, [(1, ""), (2, None)])
    for s in stats.values():
        assert s["n_words"] == 0 and s["mean_word_len"] == 0.0
        assert s["n_stopwords_present"] == 0
    df = spark.createDataFrame([(1, ""), (2, None)], "doc_id bigint, text string")
    assert G.gopher_filter(df).count() == 0


def test_published_gates_drop_each_violation(spark):
    rows = [
        (1, GOOD),
        (2, "too short to pass the fifty word minimum with these few"),
        (3, " ".join(["the", "of"] + ["a"] * 60)),      # mean word len < 3
        (4, " ".join(["the", "of"] + ["###"] * 60)),    # symbol ratio + alpha
        (5, " ".join(["w%d" % i for i in range(60)])),  # no stopwords
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    kept = {r["doc_id"] for r in G.gopher_filter(df).select("doc_id").collect()}
    assert kept == {1}


def test_threshold_overrides(spark):
    df = spark.createDataFrame(
        [(1, "the cats rest on of mats with furs")], "doc_id bigint, text string"
    )
    assert G.gopher_filter(df).count() == 0  # fails the 50-word minimum
    assert G.gopher_filter(df, min_words=5).count() == 1


def test_stats_plan_is_scan_fused(spark):
    """Scale pin: gopher_stats is pure projection — no Exchange, no
    Generate, no Window in the plan."""
    df = spark.createDataFrame([(1, GOOD)], "doc_id bigint, text string")
    plan = G.gopher_stats(df)._jdf.queryExecution().executedPlan().toString()
    for node in ("Exchange", "Generate", "Window", "Sort"):
        assert node not in plan, plan
