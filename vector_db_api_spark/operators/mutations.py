"""Mutation operators: upsert / CAS / cascading delete / move — the
reference's write surface (services/chunk.py:23-139, repos/chunks.py:38-83,
services/document.py:140-212, services/library.py:95-119) re-expressed as
PURE DataFrame → DataFrame rewrites.

Spark has no in-place row mutation; every mutation computes the table's next
version as a new DataFrame (MERGE-style: anti-join + union, conditional
projection). Persistence and atomic publish live in ``sources.store`` — the
functions here are side-effect-free so they compose, unit-test, and
oracle-check cleanly, and at 100 TB they compile to one partition-pruned
anti-join + append each (no full-table shuffle: the join key is the id the
table is bucketed/partitioned by).

Reference quirks deliberately fixed (SURVEY.md §2.10): our upsert versions
rows that previously had no embedding, and our CAS reports conflicts instead
of silently dropping them.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def upsert(
    existing: DataFrame,
    incoming: DataFrame,
    key: str = "id",
    version_col: str = "version",
    created_col: str | None = "created_at",
    updated_col: str | None = "updated_at",
) -> DataFrame:
    """MERGE: replace-by-key with version bump, insert-with-version-1.

    Reference semantics (services/chunk.py:23-74 + repos/chunks.py:38-60):
    an id already present is replaced — ``version`` becomes old+1 and
    ``created_at`` is preserved; a new id is inserted with ``version`` 1.
    ``updated_at``/``created_at`` stamping uses ``current_timestamp()`` and
    only applies when the columns are declared.

    ``incoming`` carries the payload columns (everything except version and
    timestamps, which this function owns).
    """
    payload_cols = [
        c for c in incoming.columns
        if c not in (version_col, created_col, updated_col)
    ]
    inc = incoming.select(*payload_cols).alias("inc")
    old_keep = [F.col(f"old.{version_col}").alias("__old_version")]
    if created_col:
        old_keep.append(F.col(f"old.{created_col}").alias("__old_created"))
    old = existing.alias("old")

    untouched = existing.join(inc, key, "left_anti")

    merged = inc.join(
        old.select(F.col(f"old.{key}").alias(key), *old_keep), key, "left"
    )
    out_cols = [F.col(c) for c in payload_cols]
    out_cols.append(
        F.when(F.col("__old_version").isNull(), F.lit(1))
        .otherwise(F.col("__old_version") + 1)
        .alias(version_col)
    )
    if created_col:
        out_cols.append(
            F.coalesce(F.col("__old_created"), F.current_timestamp()).alias(created_col)
        )
    if updated_col:
        out_cols.append(F.current_timestamp().alias(updated_col))
    replaced_or_new = merged.select(*out_cols)
    return untouched.unionByName(replaced_or_new.select(*existing.columns))


def cas_apply(
    existing: DataFrame,
    updates: DataFrame,
    key: str = "id",
    version_col: str = "version",
    expected_col: str = "expected_version",
    created_col: str | None = "created_at",
    updated_col: str | None = "updated_at",
) -> tuple[DataFrame, DataFrame]:
    """Optimistic CAS ``update_on_version`` (repos/chunks.py:38-60):
    each update row carries ``expected_version``; it applies only when the
    stored row exists AND its version matches, bumping version by 1.

    Returns ``(new_table, conflicts)`` — conflicts are update rows that
    missed (absent id or version mismatch), with a ``reason`` column
    ('not_found' | 'version_mismatch'); the caller surfaces them as 404/409
    (reference raises on first conflict; we report them all).
    """
    payload_cols = [
        c for c in updates.columns
        if c not in (key, expected_col, version_col, created_col, updated_col)
    ]
    upd = updates.select(
        F.col(key).alias("__k"),
        F.col(expected_col).alias("__expected"),
        *[F.col(c).alias(f"__new_{c}") for c in payload_cols],
    )
    joined = upd.join(existing, F.col("__k") == F.col(key), "left")
    ok = joined.filter(F.col(version_col) == F.col("__expected"))
    conflicts = joined.filter(
        F.col(version_col).isNull() | (F.col(version_col) != F.col("__expected"))
    ).select(
        F.col("__k").alias(key),
        *[F.col(f"__new_{c}").alias(c) for c in payload_cols],
        F.col("__expected").alias(expected_col),
        F.when(F.col(version_col).isNull(), F.lit("not_found"))
        .otherwise(F.lit("version_mismatch"))
        .alias("reason"),
    )

    # partial update: payload columns take the new value, everything else is
    # carried from the stored row; version bumps, created_at is preserved
    out_cols = []
    for c in existing.columns:
        if c == version_col:
            out_cols.append((F.col(version_col) + 1).alias(version_col))
        elif updated_col and c == updated_col:
            out_cols.append(F.current_timestamp().alias(updated_col))
        elif c in payload_cols:
            out_cols.append(F.col(f"__new_{c}").alias(c))
        else:
            out_cols.append(F.col(c))
    applied = ok.select(*out_cols)

    # conflicted targets keep their STORED row — only applied keys are
    # replaced (the reference raises and leaves the row untouched too)
    untouched = existing.join(ok.select(F.col("__k").alias(key)), key, "left_anti")
    return untouched.unionByName(applied), conflicts


def _ids_filter(df: DataFrame, col: str, ids: Sequence) -> DataFrame:
    return df.filter(F.col(col).isin(list(ids)))


def delete_chunks(chunks: DataFrame, chunk_ids: Sequence) -> DataFrame:
    """Remove chunks by id (repos/chunks.py:62-75)."""
    return chunks.filter(~F.col("id").isin(list(chunk_ids)))


def delete_documents(
    documents: DataFrame, chunks: DataFrame, doc_ids: Sequence
) -> tuple[DataFrame, DataFrame]:
    """Cascade: drop documents and every chunk they own
    (services/document.py:140-158, repos/chunks.py:77-83) — one anti-join
    per child table, no full shuffle."""
    doc_ids = list(doc_ids)
    return (
        documents.filter(~F.col("id").isin(doc_ids)),
        chunks.filter(~F.col("document_id").isin(doc_ids)),
    )


def delete_libraries(
    libraries: DataFrame,
    documents: DataFrame,
    chunks: DataFrame,
    library_ids: Sequence,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Cascade: library → documents → chunks (services/library.py:95-119)."""
    lib_ids = list(library_ids)
    return (
        libraries.filter(~F.col("id").isin(lib_ids)),
        documents.filter(~F.col("library_id").isin(lib_ids)),
        chunks.filter(~F.col("library_id").isin(lib_ids)),
    )


def move_document(
    documents: DataFrame,
    chunks: DataFrame,
    doc_id,
    dst_library_id,
    version_col: str = "version",
) -> tuple[DataFrame, DataFrame]:
    """Re-home a document and all its chunks to another library
    (services/document.py:160-212). The reference's sorted dual write-lock
    (:170-175) is unnecessary under snapshot isolation — the rewrite is one
    conditional projection per table, published atomically by the store."""
    moved_docs = documents.withColumn(
        "library_id",
        F.when(F.col("id") == F.lit(doc_id), F.lit(dst_library_id)).otherwise(
            F.col("library_id")
        ),
    ).withColumn(
        version_col,
        F.when(F.col("id") == F.lit(doc_id), F.col(version_col) + 1).otherwise(
            F.col(version_col)
        ),
    )
    moved_chunks = chunks.withColumn(
        "library_id",
        F.when(F.col("document_id") == F.lit(doc_id), F.lit(dst_library_id)).otherwise(
            F.col("library_id")
        ),
    )
    return moved_docs, moved_chunks
