"""KMV sketch (operators/sketches.py): mergeability + accuracy contracts.

The reference engine keeps exact in-memory catalogs (services/*.py) and has
no sketch surface; KMV is the scale extension that must behave like a
CRDT: state(A ∪ B) == merge(state(A), state(B)) exactly, estimates within
the ~1/sqrt(k) bound, and every number deterministic (portable h32)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from vector_db_api_spark.operators.sketches import (
    kmv_distinct,
    kmv_estimate,
    kmv_merge_states,
    kmv_state,
    value_histogram,
)


def _ids(spark, n, offset=0, group="g"):
    return (
        spark.range(offset, offset + n)
        .select(F.lit(group).alias("g"), F.col("id").alias("v"))
    )


def test_merge_of_disjoint_slices_equals_whole(spark):
    k = 32
    a, b = _ids(spark, 400), _ids(spark, 400, offset=400)
    whole = kmv_state(a.union(b), ["g"], "v", k=k).collect()[0]["kmin"]
    parts = kmv_state(a, ["g"], "v", k=k).union(kmv_state(b, ["g"], "v", k=k))
    merged = kmv_merge_states(parts, ["g"], k=k).collect()[0]["kmin"]
    assert merged == whole


def test_merge_is_idempotent_under_overlap(spark):
    """KMV sketches distinct values: merging overlapping slices must not
    double-count (the property HLL shares and linear counters lack)."""
    k = 32
    a, b = _ids(spark, 500), _ids(spark, 500, offset=250)  # 250..499 overlap
    whole = kmv_state(a.union(b), ["g"], "v", k=k).collect()[0]["kmin"]
    parts = kmv_state(a, ["g"], "v", k=k).union(kmv_state(b, ["g"], "v", k=k))
    merged = kmv_merge_states(parts, ["g"], k=k).collect()[0]["kmin"]
    assert merged == whole


def test_estimate_exact_below_k_and_bounded_above(spark):
    k = 64
    small = kmv_distinct(_ids(spark, 40), ["g"], "v", k=k).collect()[0]
    assert small["est_distinct"] == 40.0
    n = 20_000
    big_state = kmv_state(_ids(spark, n), ["g"], "v", k=k)
    est = big_state.select(kmv_estimate("kmin", k=k).alias("e")).collect()[0]["e"]
    # 5/sqrt(k) ≈ 62% is a generous deterministic bound; typical error ~12%
    assert abs(est - n) / n < 5.0 / math.sqrt(k)


def test_estimate_matches_state_path(spark):
    """kmv_distinct (one-query path) and kmv_estimate(kmv_state) (mergeable
    path) are the same estimator over the same synopsis."""
    k = 48
    df = _ids(spark, 3000)
    direct = kmv_distinct(df, ["g"], "v", k=k).collect()[0]["est_distinct"]
    via_state = (
        kmv_state(df, ["g"], "v", k=k)
        .select(kmv_estimate("kmin", k=k).alias("e"))
        .collect()[0]["e"]
    )
    assert direct == via_state


def test_histogram_partitions_rows_and_orders_edges(spark):
    df = spark.range(1000).select((F.col("id") % 100).cast("double").alias("x"))
    h = value_histogram(df, "x", bins=10).orderBy("bin").collect()
    assert [r["bin"] for r in h] == list(range(10))
    assert sum(r["n"] for r in h) == 1000
    # right-closed top bin: the max value folds into bin 9
    assert h[-1]["hi_val"] == 99.0
    for prev, cur in zip(h, h[1:]):
        assert prev["hi_val"] < cur["lo_val"]


def test_histogram_ignores_nan_values(spark):
    """Spark's max orders NaN above every double, so one NaN used to poison
    __hi (width=NaN, all rows → null bin). NaN rows are excluded like nulls
    and the finite rows bin exactly as if the NaNs were absent."""
    clean = spark.range(100).select((F.col("id") % 10).cast("double").alias("x"))
    dirty = clean.unionAll(
        spark.range(3).select(F.lit(float("nan")).alias("x"))
    ).unionAll(spark.range(2).select(F.lit(None).cast("double").alias("x")))
    want = sorted(map(tuple, value_histogram(clean, "x", bins=5).collect()))
    got = sorted(map(tuple, value_histogram(dirty, "x", bins=5).collect()))
    assert got == want
    assert sum(r[1] for r in got) == 100


def test_histogram_constant_column_single_bin(spark):
    df = spark.range(50).select(F.lit(7.5).alias("x"))
    h = value_histogram(df, "x", bins=10).collect()
    assert len(h) == 1 and h[0]["bin"] == 0 and h[0]["n"] == 50


def test_incremental_kmv_reingest_is_idempotent(spark, tmp_path):
    """Epoch-appended sketch states never lie: re-ingesting the SAME rows
    in a later epoch leaves the merged estimate untouched (the property
    that lets this sink skip latest_rows-style max-epoch dedup)."""
    from vector_db_api_spark.streaming.ingest import (
        incremental_kmv_ingest,
        served_kmv_estimates,
    )

    src, sp, ck = str(tmp_path / "src"), str(tmp_path / "state"), str(tmp_path / "ck")
    df = _ids(spark, 500).withColumnRenamed("g", "grp")
    df.repartition(2).write.mode("overwrite").parquet(src)
    q = incremental_kmv_ingest(
        spark, src, "grp string, v bigint", sp, ck, ["grp"], "v",
        k=32, max_files_per_trigger=1,
    )
    q.awaitTermination(300)
    first = served_kmv_estimates(spark, sp, ["grp"], k=32).collect()

    # re-ingest the same rows as new files → new epochs, same value sets
    df.repartition(1).write.mode("append").parquet(src)
    q2 = incremental_kmv_ingest(
        spark, src, "grp string, v bigint", sp, ck, ["grp"], "v",
        k=32, max_files_per_trigger=1,
    )
    q2.awaitTermination(300)
    assert len(spark.read.parquet(sp).select("epoch").distinct().collect()) >= 2
    again = served_kmv_estimates(spark, sp, ["grp"], k=32).collect()
    assert again == first


def _vals(spark, n, offset=0):
    return spark.range(offset, offset + n).select(
        F.lit("g").alias("g"),
        F.col("id").alias("rid"),
        (F.col("id") % 1000).cast("double").alias("x"),
    )


def test_quantile_sketch_merge_equals_whole(spark):
    from vector_db_api_spark.operators.sketches import (
        quantile_merge_states,
        quantile_sketch_state,
    )

    k = 64
    a, b = _vals(spark, 800), _vals(spark, 800, offset=500)  # overlapping
    whole = quantile_sketch_state(a.union(b).distinct(), ["g"], "x", "rid", k=k)
    parts = quantile_sketch_state(a, ["g"], "x", "rid", k=k).union(
        quantile_sketch_state(b, ["g"], "x", "rid", k=k)
    )
    merged = quantile_merge_states(parts, ["g"], k=k)
    assert merged.collect()[0]["qsample"] == whole.collect()[0]["qsample"]


def test_quantile_estimate_within_sampling_error(spark):
    from vector_db_api_spark.operators.sketches import (
        quantile_estimate,
        quantile_sketch_state,
    )

    k = 256
    df = _vals(spark, 20_000)  # x uniform over 0..999
    st = quantile_sketch_state(df, ["g"], "x", "rid", k=k)
    row = st.select(
        quantile_estimate("qsample", 0.5).alias("p50"),
        quantile_estimate("qsample", 0.9).alias("p90"),
    ).collect()[0]
    # uniform[0,1000): p50≈500, p90≈900; sampling error ~ 3/sqrt(k) quantile
    assert abs(row["p50"] - 500) < 1000 * 3 / (k ** 0.5)
    assert abs(row["p90"] - 900) < 1000 * 3 / (k ** 0.5)
