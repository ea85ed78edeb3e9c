"""Per-partition id bloom sidecars (sources/bloom.py) and the driver-side
cross-library chunk-id 409 check they enable (r6 advice: the old check
listed/opened every partition of the chunks table on each one-row upsert)."""

from __future__ import annotations

import os

import pytest

from vector_db_api_spark.api.errors import ConflictError
from vector_db_api_spark.api.service import Engine
from vector_db_api_spark.sources import bloom as B
from vector_db_api_spark.sources.store import EntityStore

from tests.test_store_service import _chunk_rows


def test_bloom_membership_roundtrip(spark):
    ids = spark.createDataFrame([(f"id-{i}",) for i in range(500)], "id string")
    bloom = B.build_bloom(ids, "id", 500)
    # decoded shape identical to a JSON round-trip through the sidecar file
    assert bloom["m_bits"] % 8 == 0 and bloom["k"] == B.NUM_HASHES
    decoded = dict(bloom, bitmap=__import__("base64").b64decode(bloom["bitmap"]))
    for i in range(500):  # no false negatives, ever
        assert B.might_contain(decoded, f"id-{i}")
    # false-positive rate at the designed sizing is well under 5%
    fp = sum(B.might_contain(decoded, f"other-{i}") for i in range(2000))
    assert fp < 100


def test_bloom_sizing_monotone():
    assert B.size_bits(0) == B.MIN_BITS
    assert B.size_bits(10**9) == B.MAX_BITS
    assert B.size_bits(10_000) >= 10_000 * B.BITS_PER_ELEMENT


def test_store_writes_and_carries_forward_sidecars(spark, tmp_path):
    """Every touched partition gets an exact sidecar; untouched partitions
    keep theirs via the copy-on-write manifest (same immutable dir)."""
    root = str(tmp_path / "sidecar")
    eng = Engine(spark, root)
    for lib in ("A", "B"):
        eng.create_library(lib, 4, library_id=lib)
        eng.create_document(lib, document_id=f"d{lib}")
        eng.upsert_chunks(
            lib,
            _chunk_rows(
                spark, [(f"c{lib}", lib, f"d{lib}", 0, "x", [1.0, 0.0, 0.0, 0.0])]
            ),
        )
    store = eng.store
    blooms = store.partition_blooms("chunks")
    assert set(blooms) == {"A", "B"} and all(b is not None for b in blooms.values())
    assert B.might_contain(blooms["A"], "cA")
    assert not B.might_contain(blooms["A"], "cB")
    # mutate only A: B's sidecar must be the SAME file (carried forward)
    v1 = store.current_version("chunks")
    rel_b_before = store.load_manifest("chunks", v1)["B"]
    eng.upsert_chunks(
        "A", _chunk_rows(spark, [("cA2", "A", "dA", 1, "y", [0.0, 1.0, 0.0, 0.0])])
    )
    v2 = store.current_version("chunks")
    man2 = store.load_manifest("chunks", v2)
    assert man2["B"] == rel_b_before  # untouched partition re-referenced
    blooms2 = store.partition_blooms("chunks")
    assert B.might_contain(blooms2["A"], "cA2") and B.might_contain(blooms2["A"], "cA")
    # delete rebuilds the touched partition's bloom EXACTLY — no stale bits
    eng.delete_chunk("A", "cA")
    blooms3 = store.partition_blooms("chunks")
    assert not B.might_contain(blooms3["A"], "cA")
    assert B.might_contain(blooms3["A"], "cA2")


def test_global_id_check_is_driver_side_in_steady_state(spark, tmp_path):
    """A clean upsert must not scan (or even list) other libraries'
    partitions: the bloom walk excludes them driver-side. A true duplicate
    still 409s through the verify scan of exactly the hit partition."""
    root = str(tmp_path / "fastcheck")
    eng = Engine(spark, root)
    for lib in ("A", "B"):
        eng.create_library(lib, 4, library_id=lib)
        eng.create_document(lib, document_id=f"d{lib}")
    eng.upsert_chunks(
        "A", _chunk_rows(spark, [("cA", "A", "dA", 0, "x", [1.0, 0.0, 0.0, 0.0])])
    )

    reads = []
    orig_read = EntityStore.read

    def spy_read(self, table, partitions=None):
        reads.append((table, tuple(partitions) if partitions else None))
        return orig_read(self, table, partitions=partitions)

    EntityStore.read = spy_read
    try:
        # clean upsert into B: no read of chunks may touch partition A
        eng.upsert_chunks(
            "B", _chunk_rows(spark, [("cB", "B", "dB", 0, "y", [1.0, 0.0, 0.0, 0.0])])
        )
        touched_a = [
            r for r in reads if r[0] == "chunks" and (r[1] is None or "A" in r[1])
        ]
        assert not touched_a, f"steady-state upsert scanned foreign partitions: {reads}"

        # true duplicate: bloom hit → pruned verify scan → 409
        reads.clear()
        with pytest.raises(ConflictError, match="another library"):
            eng.upsert_chunks(
                "B",
                _chunk_rows(spark, [("cA", "B", "dB", 1, "z", [1.0, 0.0, 0.0, 0.0])]),
            )
        verify = [r for r in reads if r[0] == "chunks" and r[1] == ("A",)]
        assert verify, f"duplicate id must verify-scan the hit partition: {reads}"
    finally:
        EntityStore.read = orig_read

    # exact rebuild after delete: the id becomes reusable with NO foreign scan
    eng.delete_chunk("A", "cA")
    EntityStore.read = spy_read
    reads.clear()
    try:
        eng.upsert_chunks(
            "B", _chunk_rows(spark, [("cA", "B", "dB", 1, "z", [1.0, 0.0, 0.0, 0.0])])
        )
        touched_a = [
            r for r in reads if r[0] == "chunks" and (r[1] is None or "A" in r[1])
        ]
        assert not touched_a, "deleted id left stale bloom bits"
    finally:
        EntityStore.read = orig_read
    assert eng.store.read("chunks").filter("id = 'cA'").collect()[0]["library_id"] == "B"
