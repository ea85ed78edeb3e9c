"""Pure mutation rewrites: upsert/CAS/delete-cascade/move semantics."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from vector_db_api_spark.operators import mutations as M


@pytest.fixture()
def chunks(spark):
    rows = [
        ("c1", "L1", "d1", 0, "alpha", 1),
        ("c2", "L1", "d1", 1, "beta", 2),
        ("c3", "L1", "d2", 0, "gamma", 1),
        ("c4", "L2", "d3", 0, "delta", 1),
    ]
    return spark.createDataFrame(
        rows, "id string, library_id string, document_id string, position int, text string, version int"
    ).withColumn("created_at", F.lit("2020-01-01").cast("timestamp")) \
     .withColumn("updated_at", F.lit("2020-01-01").cast("timestamp"))


def test_upsert_insert_and_replace(spark, chunks):
    incoming = spark.createDataFrame(
        [("c1", "L1", "d1", 0, "alpha-v2"), ("c9", "L1", "d1", 5, "new")],
        "id string, library_id string, document_id string, position int, text string",
    )
    out = {r["id"]: r for r in M.upsert(chunks, incoming).collect()}
    assert len(out) == 5
    assert out["c1"]["version"] == 2 and out["c1"]["text"] == "alpha-v2"
    assert out["c9"]["version"] == 1 and out["c9"]["text"] == "new"
    assert out["c2"]["version"] == 2  # untouched rows unchanged
    # created_at preserved on replace, stamped fresh on insert
    assert out["c1"]["created_at"] == out["c2"]["created_at"]
    assert out["c9"]["created_at"] != out["c2"]["created_at"]


def test_cas_partial_update_and_conflicts(spark, chunks):
    updates = spark.createDataFrame(
        [("c1", "cas-text", 1), ("c2", "stale", 1), ("cX", "ghost", 1)],
        "id string, text string, expected_version int",
    )
    new_table, conflicts = M.cas_apply(chunks, updates)
    out = {r["id"]: r for r in new_table.collect()}
    # applied: version bumps, other columns carried over
    assert out["c1"]["version"] == 2
    assert out["c1"]["text"] == "cas-text"
    assert out["c1"]["document_id"] == "d1" and out["c1"]["position"] == 0
    # conflicted target keeps its stored row
    assert out["c2"]["version"] == 2 and out["c2"]["text"] == "beta"
    reasons = {r["id"]: r["reason"] for r in conflicts.collect()}
    assert reasons == {"c2": "version_mismatch", "cX": "not_found"}


def test_delete_documents_cascade(spark, chunks):
    docs = spark.createDataFrame(
        [("d1", "L1", 1), ("d2", "L1", 1), ("d3", "L2", 1)],
        "id string, library_id string, version int",
    )
    docs2, chunks2 = M.delete_documents(docs, chunks, ["d1"])
    assert sorted(r["id"] for r in docs2.collect()) == ["d2", "d3"]
    assert sorted(r["id"] for r in chunks2.collect()) == ["c3", "c4"]


def test_delete_libraries_cascade(spark, chunks):
    libs = spark.createDataFrame([("L1", 1), ("L2", 1)], "id string, version int")
    docs = spark.createDataFrame(
        [("d1", "L1", 1), ("d3", "L2", 1)], "id string, library_id string, version int"
    )
    libs2, docs2, chunks2 = M.delete_libraries(libs, docs, chunks, ["L1"])
    assert [r["id"] for r in libs2.collect()] == ["L2"]
    assert [r["id"] for r in docs2.collect()] == ["d3"]
    assert sorted(r["id"] for r in chunks2.collect()) == ["c4"]


def test_move_document(spark, chunks):
    docs = spark.createDataFrame(
        [("d1", "L1", 3), ("d2", "L1", 1)], "id string, library_id string, version int"
    )
    docs2, chunks2 = M.move_document(docs, chunks, "d1", "L2")
    d = {r["id"]: r for r in docs2.collect()}
    assert d["d1"]["library_id"] == "L2" and d["d1"]["version"] == 4
    assert d["d2"]["library_id"] == "L1" and d["d2"]["version"] == 1
    c = {r["id"]: r["library_id"] for r in chunks2.collect()}
    assert c["c1"] == "L2" and c["c2"] == "L2" and c["c3"] == "L1"


def test_delete_chunks(chunks):
    out = M.delete_chunks(chunks, ["c1", "c4"])
    assert sorted(r["id"] for r in out.collect()) == ["c2", "c3"]
