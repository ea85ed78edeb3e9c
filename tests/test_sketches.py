"""Sketch operators vs their exact counterparts.

At 100 TB, `count_distinct` keeps per-group hash sets through the shuffle and
exact `percentile` sorts every group — the sketches (`approx_count_distinct`
HLL++, `approx_percentile` KLL-style) replace them with small mergeable
map-side state. These tests pin the accuracy contract that makes the swap
safe."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_db_api_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _events(spark):
    return load_table(spark, SF_DIR, "events").withColumn(
        "value_cents", F.floor(F.col("value") * 100).cast("long")
    )


def test_hll_distinct_within_rsd(spark):
    ev = _events(spark)
    rsd = 0.05
    both = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id", rsd).alias("approx"),
    )
    for r in both.collect():
        # HLL++ guarantees ~rsd relative standard deviation; allow 3 sigma
        assert abs(r["approx"] - r["exact"]) <= max(3 * rsd * r["exact"], 2), r


def test_approx_percentile_brackets_exact(spark):
    ev = _events(spark)
    both = ev.groupBy("event_type").agg(
        F.percentile("value_cents", 0.5).alias("exact_p50"),
        F.percentile_approx("value_cents", 0.5, 1000).alias("approx_p50"),
        F.min("value_cents").alias("lo"),
        F.max("value_cents").alias("hi"),
    )
    for r in both.collect():
        spread = r["hi"] - r["lo"]
        assert abs(r["approx_p50"] - r["exact_p50"]) <= 0.05 * spread, r


def test_sketches_are_mergeable_across_partitions(spark):
    """The property that makes sketches the scale path: computing on shards
    and merging must agree with one global computation (HLL state is
    mergeable; Spark does the merge in the partial-agg plan). Repartitioning
    must therefore never change the estimate."""
    ev = _events(spark)
    a = ev.repartition(1).agg(F.approx_count_distinct("user_id").alias("d")).collect()[0]["d"]
    b = ev.repartition(16).agg(F.approx_count_distinct("user_id").alias("d")).collect()[0]["d"]
    assert a == b
