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

# Scan-spread ceiling (r15, guide §2.5 "input skew: one huge unsplittable
# file — repartition immediately after the read"): a single parquet file
# smaller than this is ONE scan split (parquet cannot split inside a row
# group), so every downstream per-row-expensive stage runs on ONE core
# while the rest of the machine idles — measured 2-30× of the fold-twin
# queries' wall at sf0.1 (OPTIMIZATION_r15.md). Files above the ceiling
# (and directory tables — any real deployment) split naturally and are
# never touched, so the spread exchange exists exactly where its cost is
# a few thousand rows and buys the whole machine. Env-tunable so a
# cluster profile can disable it (0) without a code change.
SPREAD_MAX_BYTES = int(
    os.environ.get("SPARK_GRAFT_SPREAD_MAX_BYTES", str(64 << 20))
)
# ...and a floor: dimension tables of a few KB (region/nation/supplier) are
# pure broadcast fodder — spreading 25 rows over 32 tasks only adds an
# exchange inside every broadcast build. Below this, scans pass through.
SPREAD_MIN_BYTES = int(
    os.environ.get("SPARK_GRAFT_SPREAD_MIN_BYTES", str(32 << 10))
)
# Only the unstructured-payload tables spread. Their operators (shingling,
# winnowing, repetition stats, vector fold scoring, probe assignment) burn
# CPU per row INSIDE the scan stage, so one unsplittable split serializes
# the whole query — measured 2-5× wall. The relational/events fact tables
# are the opposite regime: scan-light and shuffle-bound, where a
# round-robin exchange of the raw rows is pure added cost (measured
# 2-3× WORSE on rel_pricing_summary / events_hourly / rel_top_customers,
# OPTIMIZATION_r15.md) — their aggregates and joins redistribute on their
# own keys anyway.
# whitespace-tolerant: 'documents, embeddings' must not silently disable
# the spread for ' embeddings' (r15 advice — membership is exact)
SPREAD_TABLES = frozenset(
    t.strip() for t in os.environ.get(
        "SPARK_GRAFT_SPREAD_TABLES", "documents,embeddings"
    ).split(",") if t.strip()
)

# Columns stored as parquet TIMESTAMP(NANOS): Spark (with
# spark.sql.legacy.parquet.nanosAsLong=true) reads them as long nanoseconds;
# we floor-divide to micros, matching how micro-resolution engines (DuckDB)
# read the same files.
TS_NANO_COLS: dict[str, tuple[str, ...]] = {
    "events": ("ts",),
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
}


def _spread_small_scan(
    spark: SparkSession, df: DataFrame, path: str, name: str
) -> DataFrame:
    """Round-robin a tiny single-file scan across the default parallelism.

    A parquet file below one row group is ONE split no matter what
    ``maxPartitionBytes``/``minPartitionNum`` say, so a scan-fused
    expression pipeline (the fold twins, probe assignment, pair scoring
    before the first exchange) runs single-core. The repartition moves a
    few hundred KB once and unlocks every core for the compute-bound
    stage. Scale-adaptive: a file above ``SPREAD_MAX_BYTES``, a directory
    table, or a session already at parallelism 1 all pass through
    untouched — at deployment scale this function is a no-op by
    construction, which is why the plan-shape pins treat the
    RoundRobinPartitioning exchange as input conditioning, not operator
    cost (tests/test_plan_shapes.py::_plan)."""
    if SPREAD_MAX_BYTES <= 0 or name not in SPREAD_TABLES:
        return df
    if not os.path.isfile(path):
        return df
    par = spark.sparkContext.defaultParallelism
    if par > 1 and SPREAD_MIN_BYTES <= os.path.getsize(path) <= SPREAD_MAX_BYTES:
        return df.repartition(par)
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Self-contained: the testdata parquet stores TIMESTAMP(NANOS), which
    # Spark rejects unless this legacy conf is on. It is runtime-settable,
    # so set it here rather than relying on whoever built the session
    # (external harnesses build their own sessions without it).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    for c in TS_NANO_COLS.get(name, ()):
        if c in df.columns and dict(df.dtypes)[c] == "bigint":
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return _spread_small_scan(spark, df, path, name)


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
