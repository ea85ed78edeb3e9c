"""Product quantization: encode/ADC bit-exactness vs a driver-side numpy
replay, compression contract, and recall on clustered corpora."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from vector_db_api_spark.operators.knn import knn
from vector_db_api_spark.operators.pq import PQIndex
from vector_db_api_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    # unpersist on teardown — a lingering cached full-table plan leaks
    # InMemoryTableScan into other modules' plan-shape tests
    df = load_table(spark, SF_DIR, "embeddings").cache()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def pq(emb):
    return PQIndex.train(emb, m=8, k=64, seed=42, train_sample_rows=4096)


def test_train_shapes_and_determinism(emb, pq):
    assert pq.codebooks.shape == (8, 64, 8)
    again = PQIndex.train(emb, m=8, k=64, seed=42, train_sample_rows=4096)
    assert np.array_equal(pq.codebooks, again.codebooks)


def test_codebook_frame_round_trip(spark, tmp_path, emb, pq):
    """A trained quantizer must survive the session: to_frame → parquet →
    from_frame rebuilds bit-identical codebooks, so stored codes keep
    decoding to the same centroids."""
    path = str(tmp_path / "codebooks")
    pq.to_frame(spark).write.parquet(path)
    back = PQIndex.from_frame(spark.read.parquet(path))
    assert np.array_equal(back.codebooks, pq.codebooks)
    # codes computed by the reloaded model match the original encoder
    sample = emb.limit(50)
    a = {r["vec_id"]: list(r["codes"]) for r in pq.encode(sample, id_col="vec_id").collect()}
    b = {r["vec_id"]: list(r["codes"]) for r in back.encode(sample, id_col="vec_id").collect()}
    assert a == b
    with pytest.raises(ValueError, match="divisible"):
        PQIndex.train(emb, m=7)


def test_encode_matches_numpy_replay(spark, emb, pq):
    rows = emb.limit(100).collect()
    mat = np.asarray([r["embedding"] for r in rows], dtype=np.float64)
    want = pq._encode_np(mat)
    got = {
        r["vec_id"]: r["codes"]
        for r in pq.encode(emb.limit(100), id_col="vec_id").collect()
    }
    for r, w in zip(rows, want):
        assert got[r["vec_id"]] == list(w)
    # codes are m int16s — the 32x-smaller scan target
    assert all(len(c) == 8 for c in got.values())


def test_adc_scores_match_lut_replay(spark, emb, pq):
    rows = emb.limit(200).collect()
    q = [float(x) for x in rows[0]["embedding"]]
    codes = pq.encode(emb.limit(200), id_col="vec_id")
    got = {
        r["vec_id"]: r["adc_score"]
        for r in pq.adc_scores(codes, q, id_col="vec_id").collect()
    }
    lut = pq._lut(q)
    mat = np.asarray([r["embedding"] for r in rows], dtype=np.float64)
    codes_np = pq._encode_np(mat)
    for r, c in zip(rows, codes_np):
        want = lut[np.arange(8), c].sum()
        assert got[r["vec_id"]] == pytest.approx(want, abs=0.0)  # bit-exact


def test_pq_zero_query_raises(emb, pq):
    codes = pq.encode(emb.limit(10), id_col="vec_id")
    with pytest.raises(ValueError, match="zero"):
        pq.adc_scores(codes, [0.0] * 64, id_col="vec_id")


def test_pq_search_recall_clustered(spark):
    """In the clustered regime with exact re-rank of 4k ADC candidates,
    recall@10 ≥ 0.9 — while the candidate scan reads codes (8 × int16)
    instead of 64 × float32."""
    from vector_db_api_spark.sources.synthetic_vectors import clustered_corpus

    n = 2000
    corpus = clustered_corpus(spark, n, dim=64, n_clusters=32, spread=0.15).cache()
    try:
        pq = PQIndex.train(corpus, m=8, k=64, seed=1, train_sample_rows=4096)
        codes = pq.encode(corpus).cache()
        codes.count()
        mat = np.asarray(
            [r["embedding"] for r in corpus.orderBy("id").limit(1200).collect()]
        )
        recalls = []
        for qi in (3, 511, 1024, 77, 900):
            q = [float(x) for x in mat[qi]]
            exact = {r["id"] for r in knn(corpus, q, 10).collect()}
            got = {r["id"] for r in pq.search(corpus, codes, q, 10).collect()}
            recalls.append(len(got & exact) / 10)
        assert sum(recalls) / len(recalls) >= 0.9, recalls
    finally:
        corpus.unpersist()


def test_pq_search_scores_are_exact_cosines(spark, emb, pq):
    """Re-rank means PQ error never reaches the reported score: every hit's
    score equals the exact cosine of that pair."""
    rows = emb.limit(1).collect()
    q = [float(x) for x in rows[0]["embedding"]]
    codes = pq.encode(emb, id_col="vec_id")
    hits = pq.search(emb, codes, q, 5, id_col="vec_id").collect()
    exact = {r["vec_id"]: r["score"] for r in knn(emb, q, 500, id_col="vec_id").collect()}
    for h in hits:
        assert h["score"] == pytest.approx(exact[h["vec_id"]], abs=0.0)


def test_ivfpq_search_cells(spark):
    """The composed IVF-PQ plan: probed-cell filter prunes the codes scan,
    recall holds in the clustered regime, and a hit outside the probed
    cells never appears."""
    from vector_db_api_spark.operators.ivf import IVFIndex
    from vector_db_api_spark.sources.synthetic_vectors import clustered_corpus

    n = 2000
    corpus = clustered_corpus(spark, n, dim=64, n_clusters=32, spread=0.15).cache()
    try:
        ivf = IVFIndex.train(corpus, num_centroids=32, nprobe=4, seed=1)
        asg = ivf.assign(corpus)
        pq = PQIndex.train(corpus, m=8, k=64, seed=1, train_sample_rows=4096)
        cell_codes = pq.encode_with_cells(corpus, asg).cache()
        cell_codes.count()

        mat = np.asarray(
            [r["embedding"] for r in corpus.orderBy("id").limit(1100).collect()]
        )
        recalls = []
        for qi in (5, 700, 1024):
            q = [float(x) for x in mat[qi]]
            exact = {r["id"] for r in knn(corpus, q, 10).collect()}
            hits = pq.search_cells(corpus, cell_codes, ivf, q, 10).collect()
            got = {r["id"] for r in hits}
            recalls.append(len(got & exact) / 10)
            # every hit must come from a probed cell
            probed = set(int(c) for c in ivf.probe_centroids(q))
            cells = {
                r["centroid_id"]
                for r in cell_codes.join(
                    spark.createDataFrame([(i,) for i in got], "id bigint"),
                    "id",
                ).collect()
            }
            assert cells <= probed
        assert sum(recalls) / len(recalls) >= 0.85, recalls
    finally:
        corpus.unpersist()


def test_pq_search_batch_matches_per_query(spark, clustered_df, clustered_vectors):
    """search_batch must return EXACTLY each query's single-query search
    result (same ADC candidate set under the shared (score desc, id asc)
    tie-break, same exact re-rank); zero-vector and NULL queries yield no
    rows (r9 advice: a NULL query_vec used to crash driver-side)."""
    from pyspark.sql import functions as F

    from vector_db_api_spark.operators.pq import PQIndex

    _, mat, _ = clustered_vectors
    pq = PQIndex.train(clustered_df, m=8, k=16, seed=7)
    codes = pq.encode(clustered_df).cache()
    try:
        qdf = spark.createDataFrame(
            [("q10", [float(x) for x in mat[10]]),
             ("q260", [float(x) for x in mat[260]]),
             ("qzero", [0.0] * mat.shape[1]),
             ("qnull", None)],
            "query_id string, query_vec array<double>",
        )
        got = {}
        for r in pq.search_batch(clustered_df, codes, qdf, 5).collect():
            got.setdefault(r["query_id"], []).append((r["id"], r["score"]))
        assert "qzero" not in got
        assert "qnull" not in got
        for qid, qi in (("q10", 10), ("q260", 260)):
            single = [
                (r["id"], r["score"])
                for r in pq.search(
                    clustered_df, codes, [float(x) for x in mat[qi]], 5
                ).collect()
            ]
            batch = sorted(got[qid], key=lambda t: (-t[1], t[0]))
            assert batch == single, qid
        # an all-zero batch returns an empty, correctly-typed frame
        zdf = spark.createDataFrame(
            [("z", [0.0] * mat.shape[1])],
            "query_id string, query_vec array<double>",
        )
        z = pq.search_batch(clustered_df, codes, zdf, 5)
        assert z.count() == 0
        # bounded-batch guard
        import pytest as _pytest

        with _pytest.raises(ValueError, match="bounded-batch"):
            pq.search_batch(clustered_df, codes, qdf, 5, max_queries=2)
    finally:
        codes.unpersist()


def test_pq_search_keeps_adc_ties_at_the_boundary(spark):
    """r11 (found by the sf1 bench: pq recall_clustered collapsed 1.0 →
    0.25 as cluster size outgrew the fixed rerank pool): quantization maps
    near-identical vectors to IDENTICAL codes, so inside a tight cluster
    every member ties on ADC score — a hard LIMIT rerank kept an arbitrary
    id-ordered subset and the true neighbors never reached the exact
    re-rank. The fix keeps the whole tie class at the cutoff. This corpus
    makes the old behavior fail deterministically: 200 copies of one
    vector, jitter shrinking as id GROWS (so the true top-10 are the
    HIGHEST ids — exactly the rows a lowest-id-first LIMIT 40 drops)."""
    rng = np.random.default_rng(3)
    base = rng.standard_normal(16)
    books = rng.standard_normal((8, 4, 2))  # m=8, k=4, dsub=2
    pq = PQIndex(books)
    rows = []
    for i in range(200):
        # jitter ~1e-9 · (200 - i): closest to base at the LARGEST ids;
        # far too small to move any per-subspace argmin codeword
        v = base + rng.standard_normal(16) * 1e-9 * (200 - i)
        rows.append((i, [float(x) for x in v]))
    corpus = spark.createDataFrame(rows, "id bigint, embedding array<double>")
    codes = pq.encode(corpus)
    # precondition: one tie class — every row quantizes to the same codes
    assert codes.select("codes").distinct().count() == 1
    qv = [float(x) for x in base]
    exact = [r["id"] for r in knn(corpus, qv, 10).collect()]
    got = [r["id"] for r in pq.search(corpus, codes, qv, 10).collect()]
    assert got == exact, (got, exact)
    # batch path: same ties semantics per query
    qdf = spark.createDataFrame(
        [("q0", qv)], "query_id string, query_vec array<double>"
    )
    batch = [r["id"] for r in pq.search_batch(
        corpus, codes, qdf, 10).orderBy(F.desc("score"), "id").collect()]
    assert batch == exact, (batch, exact)
