"""The loader's small-input scan spread (r15 optimization).

A single parquet file below one row group is ONE scan split, so every
scan-fused expression pipeline ran single-core at the test scales while
31 cores idled. ``load_table`` now round-robins tiny single-file scans
across ``defaultParallelism`` (guide §2.5's "one unsplittable file —
repartition immediately after the read"), with a byte ceiling (inputs big
enough to split naturally are untouched — i.e. the spread is a no-op at
any real deployment scale) and a floor (KB-sized dimension tables stay
broadcast fodder). These tests pin that contract; the OPERATOR plan pins
in test_plan_shapes.py run with the spread disabled so they keep reading
each operator's own exchanges.
"""

from __future__ import annotations

import pytest

from vector_db_api_spark.sources import tables as T

SF_DIR = "/root/testdata/sf0.001"


def _n_parts(df) -> int:
    return df.rdd.getNumPartitions()


def test_small_file_scan_spreads_to_parallelism(spark):
    emb = T.load_table(spark, SF_DIR, "embeddings")  # ~190 KB, 1 row group
    assert _n_parts(emb) == spark.sparkContext.defaultParallelism


def test_dimension_tables_below_floor_stay_single_split(spark):
    region = T.load_table(spark, SF_DIR, "region")  # ~2 KB, broadcast side
    assert _n_parts(region) == 1


def test_fact_tables_are_not_spread(spark):
    # the relational/events tables are shuffle-bound: their operators
    # redistribute on their own group/join keys, so a round-robin exchange
    # of the raw rows is pure overhead (measured 2-3× worse) — only the
    # unstructured payload tables (documents/embeddings) spread
    for name in ("lineitem", "events", "orders", "customer"):
        assert _n_parts(T.load_table(spark, SF_DIR, name)) == 1, name
    docs = T.load_table(spark, SF_DIR, "documents")
    assert _n_parts(docs) == spark.sparkContext.defaultParallelism


def test_large_inputs_pass_through(spark, monkeypatch):
    # with the ceiling below the file size the spread must be a no-op —
    # the deployment-scale behavior (real inputs split naturally)
    monkeypatch.setattr(T, "SPREAD_MAX_BYTES", 1024)
    emb = T.load_table(spark, SF_DIR, "embeddings")
    assert _n_parts(emb) == 1


def test_spread_disabled_by_env_knob(spark, monkeypatch):
    monkeypatch.setattr(T, "SPREAD_MAX_BYTES", 0)
    emb = T.load_table(spark, SF_DIR, "embeddings")
    assert _n_parts(emb) == 1


def test_spread_preserves_pushdown_and_pruning(spark):
    # filters and column pruning must still reach the parquet scan THROUGH
    # the repartition (guide §6: check PushedFilters / ReadSchema)
    from pyspark.sql import functions as F

    docs = T.load_table(spark, SF_DIR, "documents").filter(
        F.col("lang") == "en"
    ).select("doc_id")
    plan = docs._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]" in plan
    assert "ReadSchema: struct<doc_id:bigint,lang:string>" in plan


def test_spread_changes_no_results(spark, monkeypatch):
    from pyspark.sql import functions as F

    spread = T.load_table(spark, SF_DIR, "documents")
    monkeypatch.setattr(T, "SPREAD_MAX_BYTES", 0)
    plain = T.load_table(spark, SF_DIR, "documents")
    assert spread.exceptAll(plain).count() == 0
    assert plain.exceptAll(spread).count() == 0
    # per-group aggregates identical (integer sums — partition-order-proof)
    a = spread.groupBy("lang").agg(F.sum("n_chars").alias("s")).collect()
    b = plain.groupBy("lang").agg(F.sum("n_chars").alias("s")).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
