"""Differential parity: run the ACTUAL reference implementation (read-only
import from /root/reference/src) next to this engine on identical data and
compare results row-for-row.

This is behavior-study, not code reuse: the reference executes its own
pure-Python FlatIndex; we execute the Spark plans. Where the reference's
arithmetic is a sequential left-to-right fold (indexing/utils.py), our SQL
folds evaluate in the same order, so scores must agree to float precision
and the ranked id order must match exactly.

LSH/IVF are deliberately NOT differential-tested id-for-id: their candidate
sets depend on each implementation's private RNG stream (reference seeds its
own hyperplanes/centroids), so the contract there is recall-vs-exact, pinned
in test_lsh_ivf.py. Flat/exact search has no such freedom — it must match.
"""

from __future__ import annotations

import sys
import uuid

import pytest

from vector_db_api_spark.operators.knn import knn
from vector_db_api_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"
REF_SRC = "/root/reference/src"

sys.path.insert(0, REF_SRC)
ref = pytest.importorskip(
    "vector_db_api.indexing.flat", reason="reference repo not available"
)
FlatIndex = ref.FlatIndex


def _uuid(i: int) -> uuid.UUID:
    return uuid.UUID(int=i)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", "embedding"
    ).collect()
    return [(int(r["vec_id"]), [float(x) for x in r["embedding"]]) for r in rows]


@pytest.fixture(scope="module")
def ref_index(corpus):
    idx = FlatIndex()
    for vid, vec in corpus:
        idx.add(_uuid(vid), vec)
    return idx


@pytest.fixture(scope="module")
def spark_corpus(spark):
    return load_table(spark, SF_DIR, "embeddings").cache()


@pytest.mark.parametrize("metric", ["cosine", "euclidean", "dot_product"])
def test_flat_search_matches_reference(spark, corpus, ref_index, spark_corpus, metric):
    qv = corpus[7][1]  # corpus-drawn query: meaningful neighbors
    want = ref_index.search(qv, k=10, metric=metric)
    got = knn(spark_corpus, qv, 10, metric=metric, id_col="vec_id").collect()
    assert [int(_uuid(r["vec_id"]).int) for r in got] == [
        int(u.int) for u, _ in want
    ]
    for (u, ref_score), r in zip(want, got):
        assert r["score"] == pytest.approx(ref_score, abs=1e-12), (metric, u)


def test_flat_zero_query_matches_reference(corpus, ref_index, spark_corpus):
    dim = len(corpus[0][1])
    want = ref_index.search([0.0] * dim, k=5, metric="cosine")
    got = knn(spark_corpus, [0.0] * dim, 5, id_col="vec_id").collect()
    # both sides: zero query scores every row 0.0 (the reference's guard)
    assert all(s == 0.0 for _, s in want)
    assert all(r["score"] == 0.0 for r in got)
    assert len(got) == len(want) == 5


def test_flat_k_exceeds_corpus_matches_reference(spark, corpus, ref_index):
    sub = corpus[:8]
    idx = FlatIndex()
    for vid, vec in sub:
        idx.add(_uuid(vid), vec)
    spark_sub = spark.createDataFrame(
        [(vid, vec) for vid, vec in sub], "vec_id bigint, embedding array<double>"
    )
    qv = sub[0][1]
    want = idx.search(qv, k=50)
    got = knn(spark_sub, qv, 50, id_col="vec_id").collect()
    assert len(want) == len(got) == 8
    assert [int(_uuid(r["vec_id"]).int) for r in got] == [int(u.int) for u, _ in want]


def test_euclidean_similarity_formula_matches_reference(corpus, ref_index, spark_corpus):
    """The reference scores euclidean searches as 1/(1+distance)
    (indexing/utils.py) — pin our kernel to the same transform."""
    qv = corpus[3][1]
    want = dict(ref_index.search(qv, k=10, metric="euclidean"))
    got = knn(spark_corpus, qv, 10, metric="euclidean", id_col="vec_id").collect()
    for r in got:
        assert r["score"] == pytest.approx(want[_uuid(r["vec_id"])], abs=1e-12)
        assert 0.0 < r["score"] <= 1.0
