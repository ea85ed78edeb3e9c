"""vector_db_api_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference `vector-db-api` project
(a single-process in-memory FastAPI vector database), re-expressed as
idiomatic Spark DataFrame/SQL programs over Parquet, designed for
1000-executor / 100 TB scale.

Layout
------
- ``session``    — tuned SparkSession builder (AQE, Arrow, shuffle sizing)
- ``functions``  — vector kernel, int8 quantization, text analysis
  (tokens/lang-ID/quality/winnowing), portable hashing
- ``operators``  — kNN search (single/batch/numpy/quantized two-stage),
  sign-LSH + IVF with batch search, top-k, dedup suite, skew salting,
  listing, mutations (upsert/CAS/delete/move), multimodal binary columns
- ``sources``    — table loaders, bucketed-table writer, the versioned
  parquet entity store (atomic pointer-flip publish), synthetic entities
- ``streaming``  — Structured Streaming ingest: watermarked event rollup,
  session_window sessionization, foreachBatch incremental index
  maintenance, bounded-state + first-seen dedup
- ``lifecycle``  — per-library index catalog: versioned rebuild, atomic
  swap, startup bootstrap
- ``api``        — service facade (validation + 404/409/422 error taxonomy,
  composed search) over the store
- ``oracle`` / ``suite`` — bit-exact DuckDB oracle generators and the
  driver-facing query registry
"""

__version__ = "0.1.0"
