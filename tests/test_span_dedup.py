"""Cross-document duplicated-span removal (operators/span_dedup.py).

Hand-computed fixtures pin the semantics the DuckDB oracle replays:
keep-first by (doc_id, start), full-n-gram universe, adjacent-interval
merge, surgical token removal with original order preserved.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from vector_db_api_spark.operators.span_dedup import duplicated_spans, span_dedup

N = 4  # small n so fixtures stay readable


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _by_id(df):
    return {r["doc_id"]: r.asDict() for r in df.collect()}


def test_first_occurrence_survives_duplicate_removed(spark):
    shared = "alpha beta gamma delta"  # one full 4-gram
    docs = _docs(
        spark,
        [
            (1, f"{shared} tail one two three"),
            (2, f"intro words here {shared} closing remark now"),
        ],
    )
    out = _by_id(span_dedup(docs, n=N))
    # doc 1 holds the (doc_id, start)-smallest occurrence -> untouched
    assert out[1]["clean_text"] == f"{shared} tail one two three"
    assert out[1]["n_tokens_removed"] == 0 and out[1]["n_spans"] == 0
    # doc 2 loses exactly the shared 4 tokens, order of the rest preserved
    assert out[2]["clean_text"] == "intro words here closing remark now"
    assert out[2]["n_tokens_removed"] == 4 and out[2]["n_spans"] == 1
    assert out[2]["n_tokens"] == 10


def test_within_doc_repetition_keeps_first_copy(spark):
    docs = _docs(spark, [(7, "a b c d x y z a b c d")])
    out = _by_id(span_dedup(docs, n=N))
    assert out[7]["clean_text"] == "a b c d x y z"
    assert out[7]["n_tokens_removed"] == 4 and out[7]["n_spans"] == 1


def test_overlapping_and_adjacent_intervals_merge(spark):
    # doc 2 repeats a 6-token run of doc 1: its three overlapping duplicated
    # 4-grams must merge into ONE maximal span covering all 6 tokens
    run = "p q r s t u"
    docs = _docs(
        spark,
        [(1, f"{run} filler words here"), (2, f"lead in {run} out words")],
    )
    spans = {
        (r["doc_id"], r["lo"], r["hi"])
        for r in duplicated_spans(docs, n=N).collect()
    }
    assert spans == {(2, 2, 7)}
    out = _by_id(span_dedup(docs, n=N))
    assert out[2]["clean_text"] == "lead in out words"
    assert out[2]["n_spans"] == 1 and out[2]["n_tokens_removed"] == 6


def test_two_separated_spans_stay_separate(spark):
    a, b = "a1 a2 a3 a4", "b1 b2 b3 b4"
    docs = _docs(
        spark,
        [
            (1, f"{a} mid {b}"),
            (2, f"{a} zz yy xx ww {b}"),
        ],
    )
    out = _by_id(span_dedup(docs, n=N))
    assert out[2]["clean_text"] == "zz yy xx ww"
    assert out[2]["n_spans"] == 2 and out[2]["n_tokens_removed"] == 8


def test_short_empty_and_null_docs_pass_through(spark):
    docs = spark.createDataFrame(
        [(1, "too short"), (2, "too short"), (3, ""), (4, None)],
        "doc_id bigint, text string",
    )
    out = _by_id(span_dedup(docs, n=N))
    # sub-n docs produce no grams even when identical (whole-doc dedup's job)
    assert out[1]["clean_text"] == "too short" == out[2]["clean_text"]
    assert out[3] == {
        "doc_id": 3, "n_tokens": 1, "n_tokens_removed": 0, "n_spans": 0,
        "clean_text": "",
    }
    assert out[4]["n_tokens"] == 0 and out[4]["clean_text"] == ""


def test_keep_first_is_partition_invariant(spark):
    shared = "w x y z"
    rows = [(i, f"doc {i} unique words {shared} trailer token{i} pad") for i in range(1, 9)]
    docs = _docs(spark, rows)
    expected = None
    for parts in (1, 7):
        out = _by_id(span_dedup(docs.repartition(parts), n=N))
        keepers = {k for k, v in out.items() if v["n_tokens_removed"] == 0}
        assert keepers == {1}, "only the (doc_id, start)-first copy survives"
        if expected is None:
            expected = out
        else:
            assert out == expected


def test_validates_n(spark):
    docs = _docs(spark, [(1, "a b c")])
    with pytest.raises(ValueError):
        duplicated_spans(docs, n=0)


def test_removal_pass_never_explodes_the_token_table(spark):
    """Plan pin for the scale claim in the module docstring: the ONLY
    Generate (explode) in the whole plan is the gram explosion feeding the
    keep-first aggregation. Token removal is an array expression inside
    the scan projection — if a second explode appears, someone rewrote the
    removal as an exploded-token join and re-introduced a corpus-sized
    shuffle."""
    docs = _docs(spark, [(i, f"tok{i} " * 12) for i in range(1, 5)])
    plan = span_dedup(docs, n=N)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Generate") == 1, plan


# ---------------------------------------------------------------------------
# hot-gram routing (the window's skew guard)
# ---------------------------------------------------------------------------

def _hot_fixture(spark):
    """60 copies of one boilerplate 4-gram (a guaranteed heavy hitter at
    any sample) + a cold duplicated gram + unique docs."""
    boiler = "call now operators waiting"
    rows = [(i, f"doc {i} opens uniquely then {boiler} closes") for i in range(1, 61)]
    rows += [(100, "cold pair x y z w here"), (101, "other cold pair x y z w too")]
    rows += [(200, "totally unique text nothing shared")]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_hot_routing_is_output_invariant(spark):
    docs = _hot_fixture(spark)
    cols = ["doc_id", "n_tokens", "n_tokens_removed", "n_spans", "clean_text"]
    base = sorted(tuple(r[c] for c in cols)
                  for r in span_dedup(docs, n=N).collect())
    for thr in (2, 10, 1000):
        routed = span_dedup(docs, n=N, hot_threshold=thr)
        got = sorted(tuple(r[c] for c in cols) for r in routed.collect())
        assert got == base, f"hot_threshold={thr} changed the OUTPUT"


def test_hot_routing_partition_invariant(spark):
    docs = _hot_fixture(spark)
    outs = []
    for parts in (1, 5):
        df = span_dedup(docs.repartition(parts), n=N, hot_threshold=8)
        outs.append(sorted(map(tuple, df.collect())))
    assert outs[0] == outs[1]


def test_hot_path_really_routes(spark):
    """With full-sample routing and threshold 2, the boilerplate gram's
    occurrences must take the min-aggregate path: the plan gains a
    partial_min aggregate keyed on __gh, and the window still exists for
    the cold tail."""
    from vector_db_api_spark.operators.span_dedup import (
        duplicated_occurrences, gram_occurrences,
    )
    docs = _hot_fixture(spark)
    occ = gram_occurrences(docs, n=N)
    plan = (
        duplicated_occurrences(occ, hot_threshold=2, sample_fraction=1.0)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "partial_min" in plan or "min(" in plan, plan
    assert "row_number" in plan, "cold tail lost its window path"


def test_hot_threshold_validates(spark):
    from vector_db_api_spark.operators.span_dedup import duplicated_occurrences
    docs = _hot_fixture(spark)
    from vector_db_api_spark.operators.span_dedup import gram_occurrences
    with pytest.raises(ValueError):
        duplicated_occurrences(gram_occurrences(docs, n=N), hot_threshold=1)


def test_differential_vs_python_reference(spark):
    """Third-implementation check: the Spark operator vs an independent
    pure-python reference (not the DuckDB oracle — that shares this
    module's SQL formulation; a from-scratch reimplementation guards the
    SEMANTICS) over seeded random corpora with planted shared runs."""
    import random
    import re

    def ref(rows, n):
        toks = {
            i: (re.sub(" +", " ", t.strip().lower()).split(" ") if t is not None else [])
            for i, t in rows
        }
        first, dup = {}, []
        for i in sorted(toks):
            tk = toks[i]
            for s in range(len(tk) - n + 1):
                g = " ".join(tk[s:s + n])
                if g in first:
                    dup.append((i, s))
                else:
                    first[g] = (i, s)
        ivl = {}
        for i, s in dup:
            ivl.setdefault(i, []).append((s, s + n - 1))
        out = {}
        for i in sorted(toks):
            spans = []
            for lo, hi in sorted(ivl.get(i, [])):
                if spans and lo <= spans[-1][1] + 1:
                    spans[-1] = (spans[-1][0], max(spans[-1][1], hi))
                else:
                    spans.append((lo, hi))
            cov = {p for lo, hi in spans for p in range(lo, hi + 1)}
            tk = toks[i]
            out[i] = (
                len(tk),
                sum(hi - lo + 1 for lo, hi in spans),
                len(spans),
                " ".join(t for p, t in enumerate(tk) if p not in cov),
            )
        return out

    rng = random.Random(99)
    vocab = [f"w{k}" for k in range(12)]
    for trial in range(3):
        n = rng.choice([3, 4, 5])
        rows = []
        for i in range(50):
            rows.append((i, " ".join(rng.choice(vocab)
                                     for _ in range(rng.randint(0, 25)))))
        shared = " ".join(rng.choice(vocab) for _ in range(n + 3))
        for i in rng.sample(range(50), 8):
            rows[i] = (i, rows[i][1] + " " + shared)
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        got = {
            r["doc_id"]: (r["n_tokens"], r["n_tokens_removed"],
                          r["n_spans"], r["clean_text"])
            for r in span_dedup(df, n=n).collect()
        }
        assert got == ref(rows, n), f"trial {trial} n={n}"
