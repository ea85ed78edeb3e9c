"""Skew operators: salting must be invisible to results.

The contract under test is semantics-preservation — ``salted_agg`` /
``salted_join`` are physical rewrites, so every test compares against the
direct (unsalted) plan on the same data.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_db_api_spark.operators import skew
from vector_db_api_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _events(spark):
    return load_table(spark, SF_DIR, "events").withColumn(
        "value_cents", F.floor(F.col("value") * 100).cast("long")
    )


def _rows(df, *order_cols):
    return [tuple(r) for r in df.orderBy(*order_cols).collect()]


def test_salted_agg_matches_direct_groupby(spark):
    ev = _events(spark)
    salted = skew.salted_agg(
        ev,
        ["event_type"],
        {
            "n": ("event_id", "count"),
            "cents_sum": ("value_cents", "sum"),
            "cents_min": ("value_cents", "min"),
            "cents_max": ("value_cents", "max"),
        },
        num_salts=8,
    )
    direct = ev.groupBy("event_type").agg(
        F.count("event_id").alias("n"),
        F.sum("value_cents").alias("cents_sum"),
        F.min("value_cents").alias("cents_min"),
        F.max("value_cents").alias("cents_max"),
    )
    assert _rows(salted, "event_type") == _rows(direct, "event_type")
    assert "__salt" not in salted.columns


def test_salted_agg_avg_decomposes_exactly(spark):
    ev = _events(spark)
    salted = skew.salted_agg(
        ev, ["event_type"], {"cents_avg": ("value_cents", "avg")}, num_salts=8
    )
    direct = ev.groupBy("event_type").agg(
        (F.sum("value_cents") / F.count("value_cents").cast("double")).alias(
            "cents_avg"
        )
    )
    got = dict(_rows(salted, "event_type"))
    want = dict(_rows(direct, "event_type"))
    assert got.keys() == want.keys()
    for k in want:
        # sum and count partials merge exactly; only the final single division
        # differs in op order from the direct plan — allow 1-ulp slack
        assert got[k] == pytest.approx(want[k], rel=1e-15)


def test_salted_agg_rejects_non_algebraic(spark):
    ev = _events(spark)
    with pytest.raises(ValueError, match="non-algebraic"):
        skew.salted_agg(ev, ["event_type"], {"x": ("value", "collect_set")})


def test_salted_join_inner_matches_plain(spark):
    ev = _events(spark).select("event_id", "user_id", "event_type")
    cust = load_table(spark, SF_DIR, "customer").select("c_custkey", "c_mktsegment")
    salted = skew.salted_join(ev, cust, ev.user_id == cust.c_custkey, num_salts=4)
    plain = ev.join(cust, ev.user_id == cust.c_custkey, "inner")
    assert sorted(_rows(salted, "event_id")) == sorted(_rows(plain, "event_id"))
    assert "__salt" not in salted.columns


def test_salted_join_left_preserves_unmatched_once(spark):
    spark_ev = _events(spark).select("event_id", "user_id")
    # shift keys so some events have no customer match
    cust = (
        load_table(spark, SF_DIR, "customer")
        .select((F.col("c_custkey") + 100000).alias("c_custkey"), "c_mktsegment")
        .limit(10)
    )
    salted = skew.salted_join(
        spark_ev, cust, spark_ev.user_id == cust.c_custkey, num_salts=4, how="left"
    )
    assert salted.count() == spark_ev.count()


def test_salted_join_rejects_right_joins(spark):
    ev = _events(spark)
    cust = load_table(spark, SF_DIR, "customer")
    with pytest.raises(ValueError, match="inner/left"):
        skew.salted_join(ev, cust, ev.user_id == cust.c_custkey, how="right")
