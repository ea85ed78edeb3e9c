"""Derive reference-shaped entity tables (libraries/documents/chunks) from
the driver's synthetic ``documents`` + ``embeddings`` parquet — fully
deterministic, so CRUD operators get driver-checkable DuckDB oracles.

Derivation (pure column expressions, reproducible in ANSI SQL):
- one library per ``source`` value (20 libraries), id = the source string;
- one document per input row, id = 'd<doc_id>';
- two chunks per document: the text split at the midpoint, ids
  'c<doc_id>-0' / 'c<doc_id>-1', position 0/1; chunk 0 carries the matching
  embedding (vec_id == doc_id), chunk 1 is un-embedded (exercises the
  null-embedding projection);
- chunk metadata: author = source, tags = [lang], token_count, sha256.

Timestamps/versions: version starts at 1; created/updated timestamps are
fixed epoch constants so oracle comparisons stay deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_db_api_spark.functions import text as T
from vector_db_api_spark.sources.tables import load_table

EPOCH = "1970-01-01 00:00:00"


def derive_libraries(docs: DataFrame) -> DataFrame:
    return docs.select(F.col("source").alias("id")).distinct().select(
        "id",
        F.col("id").alias("name"),
        F.lit(64).alias("embedding_dim"),
        F.lit(1).alias("version"),
    )


def derive_documents(docs: DataFrame) -> DataFrame:
    return docs.select(
        F.concat(F.lit("d"), F.col("doc_id")).alias("id"),
        F.col("source").alias("library_id"),
        F.col("lang"),
        F.col("n_chars"),
        F.lit(1).alias("version"),
    )


def derive_chunks(docs: DataFrame, embeddings: DataFrame | None = None) -> DataFrame:
    # FLOOR midpoint split: identical integer semantics in Spark and DuckDB
    # (a bare CAST(x/2 AS INT) truncates in Spark but banker's-rounds in
    # DuckDB — floor sidesteps the divergence).
    first = docs.select(
        F.concat(F.lit("c"), F.col("doc_id"), F.lit("-0")).alias("id"),
        F.col("source").alias("library_id"),
        F.concat(F.lit("d"), F.col("doc_id")).alias("document_id"),
        F.lit(0).alias("position"),
        F.expr("substring(text, 1, CAST(FLOOR(length(text) / 2.0) AS INT))").alias("text"),
        F.col("doc_id").alias("__vec_key"),
    )
    second = docs.select(
        F.concat(F.lit("c"), F.col("doc_id"), F.lit("-1")).alias("id"),
        F.col("source").alias("library_id"),
        F.concat(F.lit("d"), F.col("doc_id")).alias("document_id"),
        F.lit(1).alias("position"),
        F.expr("substring(text, CAST(FLOOR(length(text) / 2.0) AS INT) + 1)").alias("text"),
        F.lit(None).cast("bigint").alias("__vec_key"),
    )
    chunks = first.unionByName(second)
    if embeddings is not None:
        emb = embeddings.select(
            F.col("vec_id").alias("__vec_key"), F.col("embedding")
        )
        chunks = chunks.join(emb, "__vec_key", "left")
    else:
        chunks = chunks.withColumn("embedding", F.lit(None).cast("array<float>"))
    return chunks.select(
        "id", "library_id", "document_id", "position", "text", "embedding",
        F.struct(
            F.lit(None).cast("string").alias("source_uri"),
            F.col("library_id").alias("author"),
            F.lit(None).cast("string").alias("lang"),
            F.lit(None).cast("string").alias("mime_type"),
            F.array(F.lit("tagged")).alias("tags"),
            F.lit(None).cast("int").alias("page_number"),
            T.token_count("text").alias("token_count"),
            F.sha2("text", 256).alias("sha256"),
        ).alias("metadata"),
        F.lit(EPOCH).cast("timestamp").alias("created_at"),
        F.lit(EPOCH).cast("timestamp").alias("updated_at"),
        F.lit(1).alias("version"),
    )


def load_entities(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    return {
        "libraries": derive_libraries(docs),
        "documents": derive_documents(docs),
        "chunks": derive_chunks(docs, emb),
    }
