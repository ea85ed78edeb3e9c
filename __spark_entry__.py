"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The real registry lives in ``vector_db_api_spark.suite`` — one entry per
implemented operator from SURVEY.md §2 plus the LLM-pipeline extensions,
each with a bit-exact DuckDB oracle where SQL-expressible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from vector_db_api_spark import suite


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: exact cosine kNN top-10 over sf0.001 embeddings,
    hydrated with the documents table and post-filtered — the reference's
    end-to-end search path (services/search.py:18-75) on Spark."""
    from pyspark.sql import functions as F

    from vector_db_api_spark.operators.knn import knn
    from vector_db_api_spark.sources.tables import load_table

    sf_dir = "/root/testdata/sf0.001"
    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    hits = knn(emb, suite.Q0, 10, metric="cosine", id_col="vec_id", extra_cols=("label",))
    # broadcast the ≤k HITS into the documents scan (the documents side is
    # corpus-sized — the k-row hit set is the only always-small frame here)
    return docs.join(
        F.broadcast(hits), hits.vec_id == docs.doc_id, "inner"
    ).select("vec_id", "label", "score", "lang", "source", "n_chars")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return suite.queries()


def oracle_sql() -> dict[str, str]:
    return suite.oracle_sql()
