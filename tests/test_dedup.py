"""Dedup suite on constructed fixtures: planted exact/near/far duplicates."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from vector_db_api_spark.operators import dedup as D


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = "the quick brown fox jumps over the lazy dog again and again tonight"
    far = "completely different words about spark shuffles and parquet scans"
    rows = [
        (1, base),
        (2, base),          # exact dup of 1
        (3, "  THE  quick brown fox jumps over the lazy dog again and again today "),  # dup after normalize
        (4, near),          # near dup
        (5, far),
        (6, "unique short text"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_exact_duplicates_groups(docs):
    groups = {r["keeper_id"]: r["dup_count"] for r in D.exact_duplicates(docs).collect()}
    assert groups[1] == 3  # 1, 2, 3 normalize to identical content
    assert groups[4] == 1 and groups[5] == 1 and groups[6] == 1


def test_dedup_exact_keeps_min_id(docs):
    kept = sorted(r["doc_id"] for r in D.dedup_exact(docs).collect())
    assert kept == [1, 4, 5, 6]


def test_minhash_identical_docs_identical_signatures(docs):
    sigs = {r["doc_id"]: tuple(r[f"mh{i}"] for i in range(16))
            for r in D.minhash_signatures(docs, num_hashes=16).collect()}
    assert sigs[1] == sigs[2] == sigs[3]
    assert sigs[1] != sigs[5]


def test_ngram_jaccard_planted_pair(docs):
    pairs = {(r["left_id"], r["right_id"]): r["jaccard"]
             for r in D.ngram_jaccard_pairs(docs, threshold=0.5).collect()}
    assert pairs[(1, 2)] == pytest.approx(1.0)
    assert pairs[(1, 3)] == pytest.approx(1.0)
    # near-dup shares most shingles
    assert 0.5 <= pairs[(1, 4)] < 1.0
    # far doc pairs with nothing
    assert not any(5 in p for p in pairs)


def test_ngram_jaccard_df_cap_drops_hot_shingle(spark):
    # every doc shares one boilerplate phrase; cap df=2 → phrase shingles
    # (df=4) are dropped, so docs that ONLY share boilerplate never pair
    boiler = "copyright acme corp all rights reserved"
    rows = [(i, f"{boiler} unique{i} tail{i} words{i} here{i}") for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    pairs = D.ngram_jaccard_pairs(df, threshold=0.01, k=3, max_shingle_df=2).collect()
    assert pairs == []
    # without the cap the boilerplate shingles pair everything
    pairs_nocap = D.ngram_jaccard_pairs(df, threshold=0.01, k=3, max_shingle_df=None).collect()
    assert len(pairs_nocap) == 6


def test_simhash_exact_collision(docs):
    sh = {r["doc_id"]: r["simhash"] for r in D.simhash(docs).collect()}
    assert sh[1] == sh[2] == sh[3]
    dup_groups = D.simhash_duplicates(docs).collect()
    assert any(r["keeper_id"] == 1 and r["dup_count"] == 3 for r in dup_groups)


def test_simhash_near_docs_small_hamming(docs):
    sh = {r["doc_id"]: r["simhash"] for r in D.simhash(docs).collect()}
    ham_near = bin(sh[1] ^ sh[4]).count("1")
    ham_far = bin(sh[1] ^ sh[5]).count("1")
    assert ham_near < ham_far


def test_embedding_neardup_requires_block(spark):
    df = spark.createDataFrame([(1, [1.0, 0.0])], "vec_id bigint, embedding array<float>")
    with pytest.raises(ValueError, match="block_col"):
        D.embedding_neardup_pairs(df)


def test_embedding_neardup_blocked(spark):
    rows = [
        (1, [1.0, 0.0, 0.0], 0),
        (2, [0.999, 0.01, 0.0], 0),   # near dup of 1, same block
        (3, [0.0, 1.0, 0.0], 0),
        (4, [1.0, 0.0, 0.0], 1),      # identical to 1 but different block → unseen
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>, blk int")
    pairs = [
        (r["left_id"], r["right_id"])
        for r in D.embedding_neardup_pairs(df, threshold=0.99, block_col="blk").collect()
    ]
    assert pairs == [(1, 2)]


def test_multiprobe_blocking_catches_boundary_pair(spark):
    """A near-dup pair whose members fall on OPPOSITE sides of a Voronoi
    boundary is invisible to single-cell blocking but must be caught by
    top-2 multi-probe blocking (both members share the {c0, c1} probe
    set). Plus: multi-probe pairs are always a superset of top-1 pairs."""
    import numpy as np

    c0 = np.array([1.0, 0.0, 0.0, 0.0])
    c1 = np.array([0.0, 1.0, 0.0, 0.0])
    c2 = np.array([0.0, 0.0, 1.0, 0.0])
    cent = np.stack([c0, c1, c2])
    mid = (c0 + c1) / np.linalg.norm(c0 + c1)
    # straddle the c0/c1 bisector: cosine(a, b) ≈ 1, top-1 cells differ
    a = mid + 1e-3 * (c0 - c1)
    b = mid - 1e-3 * (c0 - c1)
    rows = [
        (1, [float(x) for x in a]),
        (2, [float(x) for x in b]),
        (3, [float(x) for x in c2 * 2.0]),  # far away, its own cell
        (4, None),
        (5, [0.0] * 4),
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    top1 = D.multiprobe_cells(df, cent, nprobe=1)
    cells = {r["vec_id"]: r["cell"] for r in top1.collect()}
    assert cells[1] != cells[2]  # the boundary split that loses the pair
    assert set(cells) == {1, 2, 3}  # null/zero rows dropped
    mp_pairs = {
        (r["left_id"], r["right_id"])
        for r in D.embedding_neardup_pairs_multiprobe(
            df, cent, threshold=0.99, nprobe=2
        ).collect()
    }
    assert mp_pairs == {(1, 2)}
    # exactly one output row per pair even though (1,2) co-blocks twice
    n_rows = D.embedding_neardup_pairs_multiprobe(
        df, cent, threshold=0.99, nprobe=2
    ).count()
    assert n_rows == 1


def test_multiprobe_pairs_superset_of_top1(spark):
    from vector_db_api_spark.sources.tables import load_table

    import numpy as np

    rng = np.random.default_rng(19)
    cent = rng.standard_normal((8, 64))
    cent /= np.linalg.norm(cent, axis=1, keepdims=True)
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    p1 = {
        (r["left_id"], r["right_id"])
        for r in D.embedding_neardup_pairs_multiprobe(
            emb, cent, threshold=0.3, nprobe=1
        ).collect()
    }
    p2 = {
        (r["left_id"], r["right_id"])
        for r in D.embedding_neardup_pairs_multiprobe(
            emb, cent, threshold=0.3, nprobe=2
        ).collect()
    }
    assert p1 <= p2
    # BLAS twin: identical pair set through the per-cell gram path
    p2_np = {
        (r["left_id"], r["right_id"])
        for r in D.embedding_neardup_pairs_multiprobe_numpy(
            emb, cent, threshold=0.3, nprobe=2
        ).collect()
    }
    assert p2_np == p2


def test_embedding_neardup_numpy_matches_fold(spark):
    from vector_db_api_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    fold = {
        (r["left_id"], r["right_id"]): r["cosine"]
        for r in D.embedding_neardup_pairs(
            emb, threshold=0.3, id_col="vec_id", block_col="label"
        ).collect()
    }
    fast = {
        (r["left_id"], r["right_id"]): r["cosine"]
        for r in D.embedding_neardup_pairs_numpy(
            emb, threshold=0.3, id_col="vec_id", block_col="label"
        ).collect()
    }
    assert set(fold) == set(fast)
    for pair, cos in fold.items():
        assert abs(cos - fast[pair]) < 1e-9


def test_embedding_neardup_numpy_zero_and_tiny_blocks(spark):
    rows = [
        (1, [1.0, 0.0], 0),
        (2, [0.0, 0.0], 0),   # zero vector → dropped inside the block
        (3, [1.0, 0.0], 1),   # singleton block → no pairs
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>, blk int")
    assert D.embedding_neardup_pairs_numpy(
        df, threshold=0.5, id_col="vec_id", block_col="blk"
    ).count() == 0


def test_connected_components_topologies(spark):
    from vector_db_api_spark.operators.dedup import connected_components

    # chain 1-2-3-4 (diameter > 1), triangle 10-11-12, isolated pair 20-21
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        "id_a bigint, id_b bigint",
    )
    got = {r["id"]: r["component"] for r in connected_components(pairs).collect()}
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1,
        10: 10, 11: 10, 12: 10,
        20: 20, 21: 20,
    }


def test_connected_components_long_chain_converges(spark):
    from vector_db_api_spark.operators.dedup import connected_components

    n = 12  # diameter 11: propagation needs several rounds, not one
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "id_a bigint, id_b bigint"
    )
    got = {r["id"]: r["component"] for r in connected_components(pairs).collect()}
    assert set(got.values()) == {0}
    assert len(got) == n + 1


def test_connected_components_warns_when_budget_exhausted(spark):
    import warnings

    from vector_db_api_spark.operators.dedup import connected_components

    n = 12
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "id_a bigint, id_b bigint"
    )
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        connected_components(pairs, max_iterations=1).collect()
    assert any("did not converge" in str(w.message) for w in caught)


def test_alternating_cc_equals_propagation(spark):
    """Large-star/small-star (Kiveris et al.) must produce the identical
    (id, component) labeling as min-label propagation on every topology —
    chain, triangle, self-pair, reversed duplicate edges, random graph."""
    import random

    from vector_db_api_spark.operators.dedup import (
        connected_components,
        connected_components_alternating,
    )

    rng = random.Random(7)
    cases = {
        "mixed": [
            ("a", "a"), ("b", "c"), ("c", "b"), ("d", "e"),
            ("e", "f"), ("d", "f"), ("g", "h"),
        ],
        "chain": [(f"n{i:03d}", f"n{i+1:03d}") for i in range(40)],
        "random": [
            (f"x{rng.randrange(60):02d}", f"x{rng.randrange(60):02d}")
            for _ in range(70)
        ],
    }
    for name, edges in cases.items():
        df = spark.createDataFrame(edges, "id_a string, id_b string")
        want = {
            (r["id"], r["component"])
            for r in connected_components(df, max_iterations=60).collect()
        }
        got = {
            (r["id"], r["component"])
            for r in connected_components_alternating(df).collect()
        }
        assert got == want, name


def test_alternating_cc_beats_propagation_round_count(spark):
    """The reason it exists: a 64-link chain needs > 30 propagation rounds
    (it WARNS at max_iterations=30 and returns split components) while
    alternating converges inside ~log² rounds without warning."""
    import warnings

    from vector_db_api_spark.operators.dedup import (
        connected_components,
        connected_components_alternating,
    )

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(64)], "id_a bigint, id_b bigint"
    )
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        alt = connected_components_alternating(pairs, max_iterations=10)
        got = {r["id"]: r["component"] for r in alt.collect()}
    assert not any("did not converge" in str(w.message) for w in caught)
    assert set(got.values()) == {0} and len(got) == 65
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        connected_components(pairs, max_iterations=10).collect()
    assert any("did not converge" in str(w.message) for w in caught)


def test_alternating_cc_default_budget_covers_200_link_chain(spark):
    """r8: alternating is the PRODUCTION component path (dedup_near,
    leakage_split, suite queries) — its DEFAULT iteration budget must
    absorb a 200-link chain without warning, the exact shape that breaks
    propagation's default budget."""
    import warnings

    from vector_db_api_spark.operators.dedup import (
        connected_components_alternating,
    )

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(200)], "id_a bigint, id_b bigint"
    )
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        got = {
            r["id"]: r["component"]
            for r in connected_components_alternating(pairs).collect()
        }
    assert not any("did not converge" in str(w.message) for w in caught)
    assert set(got.values()) == {0} and len(got) == 201


def test_alternating_cc_nonconverged_still_one_row_per_id(spark):
    """r7 advice: mid-contraction a node can hold several outgoing edges;
    the non-converged exit must still honor the one-row-per-id contract
    (warn + provisional single label), never emit duplicate ids."""
    import warnings

    from vector_db_api_spark.operators.dedup import (
        connected_components_alternating,
    )

    # node 5 has two outgoing edges in the raw edge list
    pairs = spark.createDataFrame(
        [(5, 1), (5, 2), (2, 3)], "id_a bigint, id_b bigint"
    )
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        rows = connected_components_alternating(
            pairs, max_iterations=0
        ).collect()
    assert any("did not converge" in str(w.message) for w in caught)
    ids = [r["id"] for r in rows]
    assert sorted(ids) == [1, 2, 3, 5]  # exactly one row per node
    assert all(r["component"] is not None for r in rows)


def test_dedup_near_keeps_one_per_group(spark):
    from vector_db_api_spark.operators.dedup import dedup_near

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "the quick brown fox jumps over the lazy dog today"),  # dup of 1
            (3, "a completely different sentence about spark engines"),
            (4, "unrelated text mentioning winnowing and minhash ops"),
        ],
        "doc_id bigint, text string",
    )
    kept = {r["doc_id"] for r in dedup_near(docs).collect()}
    assert kept == {1, 3, 4}


def test_span_overlap_detects_partial_copy(spark):
    span = "the winnowing guarantee covers every run of six or more words exactly"
    rows = [
        (1, f"first document opens differently then quotes: {span} and closes with its own words"),
        (2, f"second document starts another way but embeds {span} inside unrelated commentary"),
        (3, "third document shares absolutely nothing with the quoted passage at all"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    pairs = {(r["left_id"], r["right_id"]): r["n_shared_fps"]
             for r in D.span_overlap_pairs(docs).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] >= 2
    assert not any(3 in p for p in pairs)


def test_span_overlap_fp_df_cap_drops_boilerplate(spark):
    boiler = "standard footer text repeated across every page of the site verbatim"
    docs = spark.createDataFrame(
        [(i, f"unique opener number {i} then {boiler}") for i in range(6)],
        "doc_id bigint, text string",
    )
    # uncapped: the shared footer links all 15 pairs; a cap below the
    # footer fingerprints' df drops those blocks (a handful of window
    # minima near each unique prefix legitimately have small df, so the
    # capped count shrinks rather than vanishing)
    uncapped = D.span_overlap_pairs(docs, max_fp_df=None).count()
    capped = D.span_overlap_pairs(docs, max_fp_df=3).count()
    assert uncapped == 15
    assert capped < uncapped


def test_select_canonical_best_quality_then_min_id(spark):
    from vector_db_api_spark.operators.dedup import select_canonical

    comp = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (7, 7), (8, 7)], "id long, component long"
    )
    qual = spark.createDataFrame(
        # group 1: id 2 wins on quality; group 7: tie → min id 7 wins
        [(1, 0.1), (2, 0.9), (3, 0.5), (7, 0.4), (8, 0.4)],
        "id long, q double",
    )
    got = {
        r["component"]: (r["canonical_id"], r["n_members"], r["best_quality"])
        for r in select_canonical(comp, qual, "q").collect()
    }
    assert got == {1: (2, 3, 0.9), 7: (7, 2, 0.4)}


def test_alternating_cc_on_nonconverged_raise(spark):
    """r8 advice: keep-one-per-group consumers pass on_nonconverged='raise'
    — a provisional (split) labeling silently breaks their contract, so
    the guard exit must error loudly instead of warning."""
    import pytest

    from vector_db_api_spark.operators.dedup import (
        connected_components_alternating,
    )

    pairs = spark.createDataFrame(
        [(5, 1), (5, 2), (2, 3)], "id_a bigint, id_b bigint"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components_alternating(
            pairs, max_iterations=0, on_nonconverged="raise"
        ).collect()
    # a converged run is unaffected by the mode
    rows = connected_components_alternating(
        pairs, on_nonconverged="raise"
    ).collect()
    assert {(r["id"], r["component"]) for r in rows} == {
        (1, 1), (2, 1), (3, 1), (5, 1)
    }
