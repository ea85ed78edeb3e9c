"""Parquet-backed entity store with versioned tables and atomic publish.

The reference keeps entities in in-memory dicts behind RW locks
(repos/libraries.py:8, repos/documents.py:8-9, repos/chunks.py:8-10). On
Spark the equivalent durable design is:

- one directory per table, containing immutable versioned snapshots
  ``<root>/<table>/v=<N>/`` written by normal parquet jobs;
- a tiny JSON pointer file ``<root>/<table>/_CURRENT`` naming the live
  version, rewritten atomically (write temp + ``os.replace``) AFTER the
  snapshot commit — the reference's ``registry.swap`` (registry.py:33-35)
  generalized to data;
- readers resolve the pointer once per query → snapshot isolation for free
  (the reference needs locks for this; immutable snapshots don't).

Crash-safety: a failure mid-write leaves a dangling ``v=N+1`` directory and
an untouched pointer — the live table is never corrupt. ``vacuum`` removes
unreferenced versions.

Schema DDL follows SURVEY.md §1.3 (models/entities.py:12-60,
models/metadata.py:7-26). ``chunks`` is partitioned by ``library_id`` — the
reference's ``_by_library`` secondary index (repos/chunks.py:9-10) becomes
partition pruning.
"""

from __future__ import annotations

import json
import os
import tempfile
import time

from pyspark.sql import DataFrame, SparkSession

BASE_METADATA = (
    "source_uri string, author string, lang string, mime_type string, "
    "tags array<string>"
)

LIBRARIES_DDL = (
    "id string, name string, embedding_dim int, "
    "index_config struct<type:string, lsh_num_tables:int, "
    "lsh_hyperplanes_per_table:int, ivf_num_centroids:int, ivf_nprobe:int, "
    "ivf_max_kmeans_iters:int>, "
    f"metadata struct<{BASE_METADATA}, description:string>, "
    "created_at timestamp, updated_at timestamp, version int"
)

DOCUMENTS_DDL = (
    "id string, library_id string, "
    f"metadata struct<{BASE_METADATA}, title:string, summary:string, sha256:string>, "
    "created_at timestamp, updated_at timestamp, version int"
)

CHUNKS_DDL = (
    "id string, library_id string, document_id string, position int, "
    "text string, embedding array<float>, "
    f"metadata struct<{BASE_METADATA}, page_number:int, token_count:int, sha256:string>, "
    "created_at timestamp, updated_at timestamp, version int"
)

TABLE_DDL = {"libraries": LIBRARIES_DDL, "documents": DOCUMENTS_DDL, "chunks": CHUNKS_DDL}
PARTITION_COLS = {"chunks": ["library_id"], "documents": ["library_id"]}


class EntityStore:
    """Versioned parquet tables with atomic pointer-flip publish."""

    def __init__(self, spark: SparkSession, root: str) -> None:
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- pointer management -------------------------------------------------

    def _table_dir(self, table: str) -> str:
        return os.path.join(self.root, table)

    def _pointer_path(self, table: str) -> str:
        return os.path.join(self._table_dir(table), "_CURRENT")

    def current_version(self, table: str) -> int | None:
        try:
            with open(self._pointer_path(table)) as f:
                return json.load(f)["version"]
        except (FileNotFoundError, json.JSONDecodeError, KeyError):
            return None

    def _flip(self, table: str, version: int) -> None:
        """Atomic publish: temp file + os.replace (POSIX-atomic)."""
        tdir = self._table_dir(table)
        os.makedirs(tdir, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=tdir, prefix="_CURRENT.")
        with os.fdopen(fd, "w") as f:
            json.dump({"version": version, "published_at": time.time()}, f)
        os.replace(tmp, self._pointer_path(table))

    # -- read / write -------------------------------------------------------

    def read(self, table: str) -> DataFrame:
        v = self.current_version(table)
        if v is None:
            return self.spark.createDataFrame([], TABLE_DDL[table])
        # Explicit schema: an emptied table writes a snapshot with no part
        # files (Spark writes nothing for empty partitioned frames), which
        # would otherwise fail schema inference on read-back.
        return (
            self.spark.read.schema(TABLE_DDL[table])
            .parquet(os.path.join(self._table_dir(table), f"v={v}"))
        )

    def write(self, table: str, df: DataFrame) -> int:
        """Write the table's next snapshot, then atomically flip the pointer.

        Readers resolving the old pointer keep a consistent snapshot; new
        readers see the new version — the reference's atomic registry swap
        (indexing/registry.py:33-35) applied to data tables.
        """
        cur = self.current_version(table)
        nxt = 1 if cur is None else cur + 1
        path = os.path.join(self._table_dir(table), f"v={nxt}")
        writer = df.write.mode("errorifexists")
        parts = PARTITION_COLS.get(table)
        if parts and all(p in df.columns for p in parts):
            writer = writer.partitionBy(*parts)
        writer.parquet(path)
        self._flip(table, nxt)
        return nxt

    def vacuum(self, table: str, keep: int = 2) -> list[int]:
        """Drop snapshot dirs older than the newest ``keep`` (never the
        live one). Returns removed versions."""
        import shutil

        tdir = self._table_dir(table)
        if not os.path.isdir(tdir):
            return []
        versions = sorted(
            int(d.split("=", 1)[1])
            for d in os.listdir(tdir)
            if d.startswith("v=") and d.split("=", 1)[1].isdigit()
        )
        live = self.current_version(table)
        removable = [v for v in versions[:-keep] if v != live] if keep else [
            v for v in versions if v != live
        ]
        for v in removable:
            shutil.rmtree(os.path.join(tdir, f"v={v}"), ignore_errors=True)
        return removable
