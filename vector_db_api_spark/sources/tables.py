"""Parquet table loaders for the driver's synthetic star schema.

Tables (TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings — one parquet file per table under an sf dir.

At deployment scale these would be directories of many parquet files
(optionally partitioned); ``spark.read.parquet`` handles both identically,
and Catalyst pushes filters/projections into the scan either way.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Columns stored as parquet TIMESTAMP(NANOS): Spark (with
# spark.sql.legacy.parquet.nanosAsLong=true) reads them as long nanoseconds;
# we floor-divide to micros, matching how micro-resolution engines (DuckDB)
# read the same files.
TS_NANO_COLS: dict[str, tuple[str, ...]] = {
    "events": ("ts",),
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Self-contained: the testdata parquet stores TIMESTAMP(NANOS), which
    # Spark rejects unless this legacy conf is on. It is runtime-settable,
    # so set it here rather than relying on whoever built the session
    # (external harnesses build their own sessions without it).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for c in TS_NANO_COLS.get(name, ()):
        if c in df.columns and dict(df.dtypes)[c] == "bigint":
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` works on them."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)


def write_bucketed(
    df: DataFrame,
    name: str,
    path: str,
    bucket_col: str,
    num_buckets: int = 32,
    sort_col: str | None = None,
) -> None:
    """Persist a table bucketed (and optionally sorted) by its join key.

    Two tables bucketed the same way on their join key co-locate: the join's
    EnsureRequirements sees matching HashPartitioning and inserts NO
    Exchange — at 100 TB that deletes the single largest cost of every
    fact-to-fact join (chunks⋈embeddings, postings⋈corpus). Bucket counts
    must match across join sides; pick a count ≳ cluster cores.
    (Plan pinned by tests/test_plan_shapes.py::test_bucketed_join_is_shuffle_free.)
    """
    writer = df.write.mode("overwrite").bucketBy(num_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.option("path", path).format("parquet").saveAsTable(name)


def compact_parquet(
    spark: SparkSession,
    path: str,
    partition_by: tuple[str, ...] = (),
    target_files_per_partition: int = 1,
) -> tuple[int, int]:
    """Rewrite an append-heavy parquet directory into few large files.

    Streaming jobs (foreachBatch appends) leave one file per micro-batch;
    at 100 TB the small-files overhead (task per file, footer per file)
    dominates scan cost long before data volume does. This reads the
    directory, repartitions to ``target_files_per_partition`` (per partition
    value when ``partition_by`` is set), writes a sibling directory, and
    swaps via two renames. The swap window is not atomic (unlike
    EntityStore's pointer flip — use the store for tables needing readers
    during maintenance); run it when the table is quiescent.

    Returns (rows, files_after).
    """
    import glob
    import shutil

    df = spark.read.parquet(path)
    rows = df.count()
    if partition_by:
        out = df.repartition(target_files_per_partition, *partition_by)
    else:
        out = df.repartition(target_files_per_partition)
    tmp = f"{path}__compact_tmp"
    writer = out.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(tmp)
    old = f"{path}__compact_old"
    shutil.move(path, old)
    shutil.move(tmp, path)
    shutil.rmtree(old)
    files_after = len(glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))
    return rows, files_after
