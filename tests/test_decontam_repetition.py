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


def test_semantic_contamination_catches_paraphrase_leak(spark):
    """The embedding form's reason to exist: a paraphrased benchmark doc
    shares no 8-word shingle with its source (lexical decontamination is
    blind to it) but its embedding sits in the eval doc's cosine ball."""
    import math

    from vector_db_api_spark.operators.decontaminate import (
        contaminated_ids,
        semantic_contamination_pairs,
        semantic_decontaminate,
    )

    # eval doc e1 and its paraphrase t1: near-identical vectors, zero
    # shared text; t2 is orthogonal; t3 has a null embedding (never flags)
    bench = spark.createDataFrame(
        [("e1", "the quick brown fox jumps over the lazy dog today",
          [1.0, 0.02, 0.0, 0.0])],
        "bench_id string, text string, embedding array<double>",
    )
    train = spark.createDataFrame(
        [("t1", "a fast auburn vulpine leaps above a sleepy canine",
          [0.99, 0.0, 0.01, 0.0]),
         ("t2", "completely unrelated document about databases",
          [0.0, 0.0, 1.0, 0.0]),
         ("t3", "no vector here", None)],
        "doc_id string, text string, embedding array<double>",
    )
    # lexical form: blind to the paraphrase
    assert contaminated_ids(train, bench).count() == 0
    pairs = semantic_contamination_pairs(train, bench, 0.9).collect()
    assert [(r["doc_id"], r["bench_id"]) for r in pairs] == [("t1", "e1")]
    assert math.isclose(
        pairs[0]["cosine"],
        (0.99 * 1.0 + 0.02 * 0.0 + 0.01 * 0.0)
        / (math.sqrt(1.0 + 0.02**2) * math.sqrt(0.99**2 + 0.01**2)),
        rel_tol=1e-12,
    )
    kept = {r["doc_id"] for r in
            semantic_decontaminate(train, bench, 0.9).collect()}
    assert kept == {"t2", "t3"}


def test_semantic_contamination_plan_broadcasts_eval_no_corpus_shuffle(spark):
    """Scale pin: the eval side rides a broadcast (BroadcastNestedLoopJoin
    — exact recall needs no join key) and the training corpus reaches it
    without an Exchange."""
    from vector_db_api_spark.operators.decontaminate import (
        semantic_contamination_pairs,
    )

    bench = spark.createDataFrame(
        [("e1", [1.0, 0.0])], "bench_id string, embedding array<double>")
    train = spark.createDataFrame(
        [(f"t{i}", [float(i), 1.0]) for i in range(50)],
        "doc_id string, embedding array<double>")
    plan = (
        semantic_contamination_pairs(train, bench, 0.9)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "Exchange" not in plan.split("BroadcastNestedLoopJoin")[0], plan


def test_semantic_contamination_np_twin_matches_fold(spark):
    """Twin equivalence (the embedding_neardup_np convention): identical
    pair SET, cosines within 1e-9 (matmul vs sequential fold summation
    order)."""
    import numpy as np

    from vector_db_api_spark.operators.decontaminate import (
        semantic_contamination_pairs,
        semantic_contamination_pairs_np,
    )

    rng = np.random.default_rng(11)
    base = rng.standard_normal((40, 16))
    bench_rows = [(f"e{i}", [float(x) for x in base[i]]) for i in range(4)]
    train_rows = [
        (f"t{i}", [float(x) for x in (base[i % 6] + 0.05 * rng.standard_normal(16))])
        for i in range(36)
    ] + [("tz", [0.0] * 16), ("tn", None)]
    bench = spark.createDataFrame(
        bench_rows, "bench_id string, embedding array<double>")
    train = spark.createDataFrame(
        train_rows, "doc_id string, embedding array<double>")
    fold = {(r["doc_id"], r["bench_id"]): r["cosine"]
            for r in semantic_contamination_pairs(train, bench, 0.8).collect()}
    blas = {(r["doc_id"], r["bench_id"]): r["cosine"]
            for r in semantic_contamination_pairs_np(train, bench, 0.8).collect()}
    assert fold, "fixture produced no contaminated pairs — weaken threshold"
    assert set(fold) == set(blas)
    for k in fold:
        assert abs(fold[k] - blas[k]) < 1e-9


def test_semantic_contamination_np_empty_benchmark_keeps_id_types(spark):
    """ADVICE r13: the BLAS twin's empty-benchmark early return must carry
    the INPUT id column types (e.g. bigint ids), not a hardcoded string
    schema, or the empty-edge frame diverges from the fold twin's schema
    and breaks downstream unions."""
    from vector_db_api_spark.operators.decontaminate import (
        semantic_contamination_pairs_np,
    )

    train = spark.createDataFrame(
        [(1, [1.0, 0.0])], "doc_id bigint, embedding array<double>")
    bench = spark.createDataFrame(
        [], "bench_id bigint, embedding array<double>")
    out = semantic_contamination_pairs_np(train, bench, 0.9)
    assert out.count() == 0
    got = {f.name: f.dataType.simpleString() for f in out.schema.fields}
    assert got == {"doc_id": "bigint", "bench_id": "bigint",
                   "cosine": "double"}

def test_semantic_contamination_blocked_full_probe_equals_exact(spark):
    """Soundness anchor for the cell-blocked path (r13 verdict #5): with
    nprobe == K every vector probes every cell, so the candidate set is
    complete and the blocked pair set must equal the exact NLJ's — any
    divergence is a bug in the blocking plumbing, not a recall artifact."""
    import numpy as np

    from vector_db_api_spark.operators.decontaminate import (
        semantic_contamination_pairs,
        semantic_contamination_pairs_blocked,
    )

    rng = np.random.default_rng(7)
    cent = rng.standard_normal((8, 16))
    cent = cent / np.linalg.norm(cent, axis=1, keepdims=True)
    base = rng.standard_normal((30, 16))
    bench = spark.createDataFrame(
        [(f"e{i}", [float(x) for x in base[i]]) for i in range(5)],
        "bench_id string, embedding array<double>")
    train = spark.createDataFrame(
        [(f"t{i}", [float(x) for x in
                    (base[i % 7] + 0.1 * rng.standard_normal(16))])
         for i in range(25)] + [("tz", [0.0] * 16), ("tn", None)],
        "doc_id string, embedding array<double>")
    exact = {(r["doc_id"], r["bench_id"]): r["cosine"]
             for r in semantic_contamination_pairs(train, bench, 0.7).collect()}
    blocked = {(r["doc_id"], r["bench_id"]): r["cosine"]
               for r in semantic_contamination_pairs_blocked(
                   train, bench, 0.7, cent, nprobe=len(cent)).collect()}
    assert exact, "fixture produced no contaminated pairs — weaken threshold"
    assert set(blocked) == set(exact)
    for k in exact:  # same fold kernel on both paths — bit-agreement
        assert blocked[k] == exact[k]


def test_semantic_contamination_blocked_subset_and_recall_floor(spark):
    """The decon-miss risk as a NUMBER (r13 verdict #5): on the driver's
    sf0.001 embeddings with the registry's split/threshold/centroids,
    blocked ⊆ exact always, and recall ≥ 0.9 at nprobe=SEMDECON_NPROBE
    (measured 0.98 at sf0.001, 0.932 at sf0.01 — the
    tools/semdecon_crossover.py sweep keeps the full curve)."""
    from tests.conftest import SF_DIR
    from vector_db_api_spark import suite

    exact = {(r["vec_id"], r["bench_id"]) for r in
             suite.q_doc_semantic_decontaminate(spark, SF_DIR).collect()}
    blocked = {(r["vec_id"], r["bench_id"]) for r in
               suite.q_doc_semantic_decontaminate_blocked(
                   spark, SF_DIR).collect()}
    assert blocked <= exact
    assert exact, "registry threshold produced no exact pairs at sf0.001"
    assert len(blocked & exact) / len(exact) >= 0.9


def test_semantic_contamination_blocked_np_twin_matches_fold(spark):
    """Twin equivalence (the embedding_neardup_mp_np convention): the
    probe-and-score-fused BLAS twin emits the identical pair SET as the
    fold blocked path on continuous embeddings (argmax ulp ties are
    measure-zero), including with zero/null corpus vectors present."""
    import numpy as np

    from vector_db_api_spark.operators.decontaminate import (
        semantic_contamination_pairs_blocked,
        semantic_contamination_pairs_blocked_np,
    )

    rng = np.random.default_rng(23)
    cent = rng.standard_normal((8, 16))
    cent = cent / np.linalg.norm(cent, axis=1, keepdims=True)
    base = rng.standard_normal((40, 16))
    bench = spark.createDataFrame(
        [(f"e{i}", [float(x) for x in base[i]]) for i in range(6)],
        "bench_id string, embedding array<double>")
    train = spark.createDataFrame(
        [(f"t{i}", [float(x) for x in
                    (base[i % 9] + 0.08 * rng.standard_normal(16))])
         for i in range(34)] + [("tz", [0.0] * 16), ("tn", None)],
        "doc_id string, embedding array<double>")
    fold = {(r["doc_id"], r["bench_id"]) for r in
            semantic_contamination_pairs_blocked(
                train, bench, 0.7, cent, nprobe=3).collect()}
    blas = {(r["doc_id"], r["bench_id"]) for r in
            semantic_contamination_pairs_blocked_np(
                train, bench, 0.7, cent, nprobe=3).collect()}
    assert fold, "fixture produced no contaminated pairs — weaken threshold"
    assert blas == fold


def test_semantic_contamination_blocked_np_empty_benchmark_keeps_id_types(spark):
    """Empty-benchmark early return carries the INPUT id types (the
    ADVICE-r13 lesson applied to the new twin from day one)."""
    import numpy as np

    from vector_db_api_spark.operators.decontaminate import (
        semantic_contamination_pairs_blocked_np,
    )

    train = spark.createDataFrame(
        [(1, [1.0, 0.0])], "doc_id bigint, embedding array<double>")
    bench = spark.createDataFrame(
        [], "bench_id bigint, embedding array<double>")
    out = semantic_contamination_pairs_blocked_np(
        train, bench, 0.9, np.eye(2))
    assert out.count() == 0
    got = {f.name: f.dataType.simpleString() for f in out.schema.fields}
    assert got == {"doc_id": "bigint", "bench_id": "bigint"}


def test_blocked_recall_on_planted_paraphrases(spark):
    """r14 verdict #6: the blocked kernel's recall bar on PLANTED
    paraphrase pairs — real doc text, seeded word-replacement
    perturbations spanning near-dup down to near-threshold, the lexical
    hashed-ngram embedder, k-means centroids (production config, K=32) —
    not just synthetic geometry. The bar mirrors LSH/IVF's pinned recall
    floors: >= 0.9 at the registry nprobe (6), measured 0.989 at sf0.01
    and 1.000 at nprobe 8 (BENCH_SCALE.md planted-pair section)."""
    import sys

    sys.path.insert(0, "tools")
    from semdecon_planted import measure

    m = measure(spark, "/root/testdata/sf0.001", 200, nprobes=(6, 8))
    # the planted set must be substantive for the bar to mean anything:
    # most planted pairs clear the threshold under the exact kernel
    assert m["planted_in_exact"] >= 0.6 * m["planted_total"]
    by_nprobe = {p: rp for p, rp, _, _ in m["rows"]}
    assert by_nprobe[6] >= 0.9, f"planted recall at nprobe=6: {by_nprobe[6]}"
    assert by_nprobe[8] >= by_nprobe[6]
