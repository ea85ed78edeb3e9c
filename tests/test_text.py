"""Text-analysis functions: exact token semantics, language-ID, quality
bounds, fingerprint stability."""

from __future__ import annotations

import hashlib

import pytest

from pyspark.sql import functions as F

from vector_db_api_spark.functions import text as T


def _eval(spark, text, expr):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(expr.alias("v")).collect()[0]["v"]


def test_token_count_basic(spark):
    assert _eval(spark, "one two three", T.token_count("text")) == 3
    assert _eval(spark, "  one   two  ", T.token_count("text")) == 2
    assert _eval(spark, "", T.token_count("text")) == 0


def test_token_count_bpe_pieces(spark):
    # letter runs, digit runs, and each punctuation mark are separate pieces
    assert _eval(spark, "Don't stop!", T.token_count_bpe("text")) == 5
    assert _eval(spark, "abc123!?", T.token_count_bpe("text")) == 4
    assert _eval(spark, "one two three", T.token_count_bpe("text")) == 3
    assert _eval(spark, "", T.token_count_bpe("text")) == 0
    assert _eval(spark, "   ", T.token_count_bpe("text")) == 0


def test_token_count_bpe_upper_bounds_whitespace_count(spark):
    texts = ["Don't stop!", "a,b,c", "hello world", "x" * 50, "1.5e-3"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    bad = df.filter(T.token_count_bpe("text") < T.token_count("text").cast("long"))
    assert bad.count() == 0


def test_winnowing_shared_run_guarantee(spark):
    # k=3, window=4: any shared run of window+k-1 = 6 words must yield at
    # least one shared fingerprint (the winnowing coverage guarantee)
    shared = "alpha beta gamma delta epsilon zeta"
    a = _eval(spark, f"one two {shared} three four", T.winnowing_fingerprints("text"))
    b = _eval(spark, f"{shared} nine eight seven six five", T.winnowing_fingerprints("text"))
    assert set(a) & set(b)


def test_winnowing_disjoint_texts_no_overlap(spark):
    a = _eval(spark, "aa bb cc dd ee ff gg hh", T.winnowing_fingerprints("text"))
    b = _eval(spark, "zz yy xx ww vv uu tt ss", T.winnowing_fingerprints("text"))
    assert not (set(a) & set(b))


def test_winnow_table_matches_column_variant(spark):
    texts = [
        (1, "one two alpha beta gamma delta epsilon zeta three four"),
        (2, "hi"),
        (3, "aa bb cc dd ee ff gg hh ii jj kk ll mm nn oo pp"),
    ]
    df = spark.createDataFrame(texts, "doc_id int, text string")
    fast = {r["doc_id"]: list(r["winnow_fps"]) for r in T.winnow_table(df, "doc_id").collect()}
    slow = {
        r["doc_id"]: list(r["fps"])
        for r in df.select("doc_id", T.winnowing_fingerprints("text").alias("fps")).collect()
    }
    assert fast == slow


def test_winnowing_short_and_stable(spark):
    short = _eval(spark, "hi", T.winnowing_fingerprints("text"))
    assert len(short) == 1
    x1 = _eval(spark, "the quick brown fox jumps", T.winnowing_fingerprints("text"))
    x2 = _eval(spark, "the quick brown fox jumps", T.winnowing_fingerprints("text"))
    assert x1 == x2 and list(x1) == sorted(set(x1))


def test_word_occurrences_consecutive_repeats(spark):
    # the ADVICE bug: 'the the the' must count 3, not 2
    assert _eval(spark, "the the the", T.word_occurrences("text", "the")) == 3
    assert _eval(spark, "The THE the.", T.word_occurrences("text", "the")) == 2  # 'the.' ≠ 'the'


def test_lang_id_clear_samples(spark):
    assert _eval(spark, "the cat and the dog is to blame", T.lang_id("text")) == "en"
    assert _eval(spark, "der hund und die katze ist das", T.lang_id("text")) == "de"
    assert _eval(spark, "le chat et la maison est les", T.lang_id("text")) == "fr"
    assert _eval(spark, "xyzzy plugh", T.lang_id("text")) == "und"


def test_punct_ratio(spark):
    assert _eval(spark, "abc def", T.punct_ratio("text")) == 0.0
    assert _eval(spark, "a!b?", T.punct_ratio("text")) == pytest.approx(0.5)
    assert _eval(spark, "", T.punct_ratio("text")) == 0.0


def test_stopword_and_mean_token_len(spark):
    assert _eval(spark, "the cat", T.stopword_ratio("text")) == pytest.approx(0.5)
    assert _eval(spark, "ab abcd", T.mean_token_len("text")) == pytest.approx(3.0)
    assert _eval(spark, "", T.mean_token_len("text")) == 0.0


def test_quality_score_bounds(spark):
    for text in ["", "x", "the " * 100, "!!!???", "a reasonable english sentence about things"]:
        q = _eval(spark, text, T.quality_score("text"))
        assert 0.0 <= q <= 1.0, text
    rich = _eval(spark, "the quick brown fox is of great interest to all of us " * 6, T.quality_score("text"))
    junk = _eval(spark, "?!?!#$%^", T.quality_score("text"))
    assert rich > junk


def test_fingerprints_match_hashlib(spark):
    text = "Some Document  Text"
    norm = "some document text"
    assert _eval(spark, text, T.fingerprint("text")) == hashlib.md5(norm.encode()).hexdigest()
    assert (
        _eval(spark, text, T.sha256_fingerprint("text"))
        == hashlib.sha256(text.encode()).hexdigest()
    )
