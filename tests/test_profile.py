"""Deterministic table profiler (operators/profile.py)."""

from __future__ import annotations

from vector_db_api_spark.operators.profile import table_profile


def _rows(df):
    return {
        (r["column"], r["metric"]): (r["value_num"], r["value_str"])
        for r in df.collect()
    }


def test_profile_metrics_route_by_type(spark):
    df = spark.createDataFrame(
        [
            (1, 2.5, "b", None),
            (2, None, "a", None),
            (None, 7.25, None, None),
        ],
        "i bigint, x double, s string, t timestamp",
    )
    p = _rows(table_profile(df, kmv_k=8))
    assert p[("i", "n_nonnull")][0] == 2.0 and p[("i", "n_null")][0] == 1.0
    assert p[("i", "min")][0] == 1.0 and p[("i", "max")][0] == 2.0
    assert p[("x", "min")][0] == 2.5 and p[("x", "max")][0] == 7.25
    # strings profile into value_str, numerics into value_num
    assert p[("s", "min")] == (None, "a") and p[("s", "max")] == (None, "b")
    # all-null timestamp column: exact stats exist, min/max are null
    assert p[("t", "n_null")][0] == 3.0 and p[("t", "min")][1] is None
    # distinct_est only for hashable types (int/string): no entry for x/t
    assert ("i", "distinct_est") in p and ("s", "distinct_est") in p
    assert ("x", "distinct_est") not in p and ("t", "distinct_est") not in p
    assert p[("i", "distinct_est")][0] == 2.0  # below k → exact


def test_profile_distinct_est_tracks_cardinality(spark):
    from pyspark.sql import functions as F

    df = spark.range(5000).select(
        (F.col("id") % 1000).alias("m"), F.col("id").alias("u")
    )
    p = _rows(table_profile(df, kmv_k=128))
    n_m = p[("m", "distinct_est")][0]
    n_u = p[("u", "distinct_est")][0]
    assert abs(n_m - 1000) / 1000 < 0.5
    assert abs(n_u - 5000) / 5000 < 0.5
