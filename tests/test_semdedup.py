"""SemDeDup (operators/semdedup.py): cluster-then-prune semantic dedup.

The reference has the ingredients (IVF k-means coarse quantizer,
src/vector_db_api/indexing/ivf.py; cosine kernel, indexing/utils.py:10-15)
but not the composed corpus-pruning operator; these tests pin the
composition's semantics: partition into kept/dropped, paper keep-priority
(farthest-from-centroid survives), and expression/BLAS twin agreement.
"""

from __future__ import annotations

import numpy as np
import pytest

from vector_db_api_spark.operators.semdedup import (
    assign_diversity,
    semdedup_dropped,
    semdedup_dropped_numpy,
    semdedup_kept,
)


@pytest.fixture(scope="module")
def centroids():
    rng = np.random.default_rng(5)
    c = rng.standard_normal((4, 8))
    return c / np.linalg.norm(c, axis=1, keepdims=True)


@pytest.fixture(scope="module")
def corpus(spark):
    """Three planted near-dup pairs inside tight clusters + singletons."""
    rng = np.random.default_rng(3)
    rows = []
    base = rng.standard_normal((6, 8)) * 4.0
    vid = 0
    for b in base:
        rows.append((vid, [float(x) for x in b]))
        vid += 1
        # a near-duplicate of the previous vector (cosine ≈ 1)
        rows.append((vid, [float(x) for x in b + rng.standard_normal(8) * 1e-3]))
        vid += 1
    # singletons far from everything
    for s in rng.standard_normal((5, 8)) * 4.0:
        rows.append((vid, [float(x) for x in s]))
        vid += 1
    # degenerate rows: null + zero vector must be ignored, not crash
    rows.append((vid, None))
    rows.append((vid + 1, [0.0] * 8))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_dropped_and_kept_partition_the_embeddable_corpus(spark, corpus, centroids):
    dropped = semdedup_dropped(corpus, centroids, 0.999, id_col="vec_id")
    kept = semdedup_kept(corpus, centroids, 0.999, id_col="vec_id")
    d_ids = {r["vec_id"] for r in dropped.collect()}
    k_ids = {r["vec_id"] for r in kept.collect()}
    all_ids = {r["vec_id"] for r in corpus.collect()}
    assert d_ids | k_ids == all_ids
    assert d_ids & k_ids == set()
    # exactly one member of each planted pair is pruned
    assert len(d_ids) == 6
    # degenerate rows (null / zero vector) always survive
    assert {17, 18} <= k_ids


def test_keep_priority_is_farthest_from_centroid(spark, corpus, centroids):
    """Within a near-dup pair, the member with the LOWER cosine to its
    centroid must be the survivor (paper's diversity rule)."""
    a = {
        r["vec_id"]: (r["cell"], r["csim"])
        for r in assign_diversity(corpus, centroids, id_col="vec_id").collect()
    }
    dropped = {
        r["vec_id"] for r in semdedup_dropped(corpus, centroids, 0.999).collect()
    }
    for left in range(0, 12, 2):
        pair = (left, left + 1)
        if a[pair[0]][0] != a[pair[1]][0]:
            continue  # straddles a cell boundary — no prune expected
        gone = [p for p in pair if p in dropped]
        assert len(gone) == 1
        survivor = pair[0] if gone == [pair[1]] else pair[1]
        assert (a[survivor][1], survivor) <= (a[gone[0]][1], gone[0])


def test_numpy_twin_matches_expression_drop_set(spark, corpus, centroids):
    exp = {
        (r["vec_id"], r["cell"])
        for r in semdedup_dropped(corpus, centroids, 0.999).collect()
    }
    blas = {
        (r["vec_id"], r["cell"])
        for r in semdedup_dropped_numpy(corpus, centroids, 0.999).collect()
    }
    assert exp == blas


def test_numpy_twin_matches_expression_at_nonpositive_threshold(spark, corpus, centroids):
    """Regression: tril's zero fill used to make any threshold <= 0 drop
    EVERY row (0 >= thr on the padded upper triangle) in the BLAS twin,
    including each cell's highest-priority keeper. The strict-lower-triangle
    mask must keep the twins identical at thr = 0 and thr = -1."""
    for thr in (0.0, -1.0):
        exp = {
            (r["vec_id"], r["cell"])
            for r in semdedup_dropped(corpus, centroids, thr).collect()
        }
        blas = {
            (r["vec_id"], r["cell"])
            for r in semdedup_dropped_numpy(corpus, centroids, thr).collect()
        }
        assert exp == blas, f"twin divergence at threshold {thr}"


def test_threshold_one_epsilon_ball_prunes_nothing_distinct(spark, corpus, centroids):
    """With threshold > max pair cosine nothing drops; with threshold -1
    every cluster collapses to its single highest-priority member."""
    none = semdedup_dropped(corpus, centroids, 1.0000001).count()
    assert none == 0
    all_but_one = semdedup_dropped(corpus, centroids, -1.0)
    kept = semdedup_kept(corpus, centroids, -1.0, id_col="vec_id")
    cells = assign_diversity(corpus, centroids, id_col="vec_id")
    n_cells = cells.select("cell").distinct().count()
    n_emb = cells.count()
    assert all_but_one.count() == n_emb - n_cells
    # survivors: one per cell + the two degenerate rows
    assert kept.count() == n_cells + 2


def test_blocked_gram_flags_equal_bruteforce():
    """The hot-cell panel tiling is exact: for random units and thresholds
    (including <= 0), blocked flags == full-gram brute force at every block
    size, including blocks that don't divide n."""
    from vector_db_api_spark.operators.semdedup import _blocked_drop_flags

    rng = np.random.default_rng(23)
    mat = rng.standard_normal((97, 8))
    unit = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    for thr in (0.9, 0.3, 0.0, -0.5):
        gram = unit @ unit.T
        mask = np.tril(np.ones(gram.shape, dtype=bool), k=-1)
        want = ((gram >= thr) & mask).any(axis=1)
        for block in (1, 7, 32, 97, 200):
            got = _blocked_drop_flags(unit, thr, block)
            assert (got == want).all(), (thr, block)


def test_blocked_gram_spark_path_matches_default(spark, corpus, centroids):
    """Tiny gram_block_rows through the real operator: identical drop set
    to the unblocked run and to the expression twin."""
    base = {
        (r["vec_id"], r["cell"])
        for r in semdedup_dropped_numpy(corpus, centroids, 0.999).collect()
    }
    blocked = {
        (r["vec_id"], r["cell"])
        for r in semdedup_dropped_numpy(
            corpus, centroids, 0.999, gram_block_rows=4
        ).collect()
    }
    assert blocked == base


def test_hot_cell_recluster_collapses_duplicate_storm(spark):
    """Adversarial single-cell corpus (ONE centroid → every row in cell 0):
    three tight, well-separated duplicate storms of 60 rows each. With
    max_cell_size=40 the 180-row cell must be locally re-clustered; each
    storm still collapses to exactly one keeper (storm members land in one
    subcell), so the drop-set matches the brute-force oracle's 177."""
    rng = np.random.default_rng(31)
    dirs = np.eye(3, 8) * 5.0  # three orthogonal storm centers
    rows = []
    vid = 0
    for d in dirs:
        for _ in range(60):
            rows.append((vid, [float(x) for x in d + rng.standard_normal(8) * 1e-4]))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    one_cent = np.ones((1, 8)) / np.sqrt(8.0)
    dropped = semdedup_dropped_numpy(
        df, one_cent, 0.999, max_cell_size=40, gram_block_rows=16
    )
    d_ids = {r["vec_id"] for r in dropped.collect()}
    assert len(d_ids) == 177  # 180 rows - one keeper per storm
    survivors = set(range(180)) - d_ids
    assert {s // 60 for s in survivors} == {0, 1, 2}  # one per storm


def test_semdedup_with_trained_centroids_finds_planted_dups(spark, clustered_vectors):
    """Production path: centroids from IVFIndex.train (spherical k-means)
    instead of fixed constants. Tight clusters with near-identical members
    must lose most members to pruning at a high threshold, and the drop
    set must agree between the expression and BLAS paths."""
    from vector_db_api_spark.operators.ivf import IVFIndex

    ids, mat, _ = clustered_vectors
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in zip(ids, mat)],
        "vec_id long, embedding array<float>",
    )
    ivf = IVFIndex.train(df, num_centroids=20, seed=3)
    dropped = semdedup_dropped(df, ivf.centroids, 0.999, id_col="vec_id")
    blas = semdedup_dropped_numpy(df, ivf.centroids, 0.999, id_col="vec_id")
    d_ids = {r["vec_id"] for r in dropped.collect()}
    # 20 clusters x 25 near-identical members: at cosine>=0.999 nearly every
    # cluster collapses toward its keeper — at least half the corpus prunes
    assert len(d_ids) >= len(ids) // 2
    assert d_ids == {r["vec_id"] for r in blas.collect()}
