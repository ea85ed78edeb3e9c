"""Line-level boilerplate removal (operators/lines.py): hand-computed
multi-line fixtures — the synthetic corpus is single-line, so the
line-universe behaviors (ordering, blanks, normalization variants) are
pinned here."""

from __future__ import annotations

import pytest

from vector_db_api_spark.operators import lines as L

BOILER = "Subscribe to our newsletter"


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    return {r["doc_id"]: r.asDict() for r in L.line_dedup(df, **kw).collect()}


def test_boilerplate_line_removed_from_every_doc(spark):
    out = _run(spark, [
        (1, f"unique opening one\n{BOILER}\nunique closing one"),
        (2, f"{BOILER}\nunique body two"),
        (3, "no boilerplate here at all"),
    ])
    assert out[1]["clean_text"] == "unique opening one\nunique closing one"
    assert out[1]["n_lines"] == 3 and out[1]["n_lines_removed"] == 1
    assert out[2]["clean_text"] == "unique body two"
    assert out[3]["clean_text"] == "no boilerplate here at all"
    assert out[3]["n_lines_removed"] == 0


def test_normalization_variants_dedup_together(spark):
    # case/extra-space variants hash to the same normalized line; the RAW
    # text of surviving lines is untouched
    out = _run(spark, [
        (1, f"keep me\n{BOILER.upper()}"),
        (2, f"{BOILER}   \nother text"),  # wait: trailing spaces inside line
    ])
    assert out[1]["clean_text"] == "keep me"
    assert out[2]["clean_text"] == "other text"


def test_within_doc_repetition_alone_never_flags(spark):
    text = "repeated inside\nrepeated inside\nunique tail"
    out = _run(spark, [(1, text), (2, "totally different")])
    # the repeated line occurs in ONE distinct doc -> kept, both copies
    assert out[1]["clean_text"] == text
    assert out[1]["n_lines_removed"] == 0


def test_blank_lines_are_exempt_and_order_is_preserved(spark):
    out = _run(spark, [
        (1, f"alpha\n\n{BOILER}\n\nomega"),
        (2, f"{BOILER}\n\n"),
    ])
    assert out[1]["clean_text"] == "alpha\n\n\nomega"
    assert out[1]["n_lines"] == 5 and out[1]["n_lines_removed"] == 1
    # doc 2 keeps its two blank lines (blank is formatting, not boilerplate)
    assert out[2]["clean_text"] == "\n"
    assert out[2]["n_lines"] == 3 and out[2]["n_lines_removed"] == 1


def test_null_and_empty_docs(spark):
    out = _run(spark, [(1, None), (2, ""), (3, "x\ny")])
    assert out[1]["n_lines"] == 0 and out[1]["clean_text"] == ""
    # empty text splits to [''] — one blank line, exempt, round-trips
    assert out[2]["n_lines"] == 1 and out[2]["clean_text"] == ""
    assert out[3]["clean_text"] == "x\ny"


def test_min_docs_threshold(spark):
    rows = [(i, f"shared across three\nunique {i}") for i in range(3)]
    strict = _run(spark, rows, min_docs=4)
    assert all(v["n_lines_removed"] == 0 for v in strict.values())
    loose = _run(spark, rows, min_docs=3)
    assert all(v["n_lines_removed"] == 1 for v in loose.values())
    with pytest.raises(ValueError):
        _run(spark, rows, min_docs=1)


def test_plan_one_corpus_shuffle_docs_never_shuffle(spark):
    """Scale pin: the hash-count aggregate is the ONE corpus-scale
    shuffle (map-side partial agg); the removed-positions regroup and the
    doc join are the only other exchanges, and the rebuild is an array
    expression — no Window, no Sort outside the final agg."""
    df = spark.createDataFrame(
        [(1, f"a\n{BOILER}"), (2, f"{BOILER}\nb")],
        "doc_id bigint, text string",
    )
    plan = L.line_dedup(df)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "partial_count(distinct" in plan or "count(distinct" in plan, plan


def test_keep_first_first_doc_keeps_every_later_copy_removed(spark):
    rows = [
        (1, f"{BOILER}\nunique one"),
        (2, f"{BOILER}\nunique two"),
        (3, f"unique three\n{BOILER}"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r["doc_id"]: r.asDict()
           for r in L.line_dedup_keep_first(df).collect()}
    assert out[1]["clean_text"] == f"{BOILER}\nunique one"  # first keeps it
    assert out[2]["clean_text"] == "unique two"
    assert out[3]["clean_text"] == "unique three"
    # within-doc repetition still exempt (strictly smaller id)
    solo = spark.createDataFrame(
        [(9, "twice\ntwice")], "doc_id bigint, text string")
    got = L.line_dedup_keep_first(solo).collect()[0]
    assert got["clean_text"] == "twice\ntwice"


def test_streaming_line_dedup_equals_batch_keep_first(spark, tmp_path):
    """Drained over id-ordered batches, the continuous form equals the
    batch keep-first answer row-for-row — including a boilerplate line
    whose first occurrence is in batch 1 and later copies in batch 2."""
    from vector_db_api_spark.streaming.dedup import incremental_line_dedup_ingest

    rows = [(i, f"{BOILER}\nbody {i}" if i % 3 == 0 else f"solo {i}\nbody {i}")
            for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    want = sorted(map(tuple, L.line_dedup_keep_first(df).collect()))
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    df.filter("doc_id < 10").write.parquet(a)
    df.filter("doc_id >= 10").write.parquet(b)
    st, out = str(tmp_path / "st"), str(tmp_path / "out")
    for i, src in enumerate((a, b)):
        stream = spark.readStream.schema("doc_id bigint, text string").parquet(src)
        q = incremental_line_dedup_ingest(
            stream, st, out, str(tmp_path / f"ck{i}"),
            epoch_offset=i * 1_000_000)
        q.awaitTermination(300)
    got = sorted(
        tuple(r) for r in spark.read.parquet(out)
        .select("doc_id", "n_lines", "n_lines_removed", "clean_text")
        .collect()
    )
    assert got == want
