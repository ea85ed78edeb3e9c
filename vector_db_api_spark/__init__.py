"""vector_db_api_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference `vector-db-api` project
(a single-process in-memory FastAPI vector database), re-expressed as
idiomatic Spark DataFrame/SQL programs over Parquet, designed for
1000-executor / 100 TB scale.

Layout
------
- ``session``    — tuned SparkSession builder (AQE, Arrow, shuffle sizing)
- ``functions``  — vector kernel, text analysis, portable hashing
- ``operators``  — kNN search, sign-LSH, IVF, top-k, dedup suite
- ``sources``    — table loaders and the parquet-backed entity store
- ``streaming``  — Structured Streaming ingest of the events stream
- ``api``        — reference-parity facade (libraries/documents/chunks CRUD + search)
"""

__version__ = "0.1.0"
