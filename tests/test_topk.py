"""Top-k helpers: global heap semantics, per-group determinism, and the
partial-reduction superset property that makes knn_batch shuffle-light."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from vector_db_api_spark.operators.topk import (
    partial_topk_per_group,
    topk,
    topk_per_group,
)


def _mk(spark, n=200, groups=4, seed=5):
    rng = random.Random(seed)
    rows = [(i, f"g{i % groups}", rng.random()) for i in range(n)]
    return rows, spark.createDataFrame(rows, "id bigint, grp string, score double")


def test_global_topk(spark):
    rows, df = _mk(spark)
    got = [r["id"] for r in topk(df, [F.desc("score"), F.asc("id")], 10).collect()]
    want = [i for i, _, _ in sorted(rows, key=lambda r: (-r[2], r[0]))[:10]]
    assert got == want


def test_topk_per_group_exact(spark):
    rows, df = _mk(spark)
    got = topk_per_group(df, ["grp"], [F.desc("score"), F.asc("id")], 3).collect()
    by_grp: dict = {}
    for r in got:
        by_grp.setdefault(r["grp"], []).append(r["id"])
    for g in {f"g{i}" for i in range(4)}:
        want = [
            i for i, grp, _ in sorted(
                (r for r in rows if r[1] == g), key=lambda r: (-r[2], r[0])
            )[:3]
        ]
        assert sorted(by_grp[g]) == sorted(want)


def test_partial_topk_is_superset_and_exact_after_final(spark):
    rows, df = _mk(spark, n=500, groups=5)
    df = df.repartition(8)  # force multiple batches → multiple partial winners
    partial = partial_topk_per_group(df, ["grp"], [("score", False), ("id", True)], 4)
    final = topk_per_group(partial, ["grp"], [F.desc("score"), F.asc("id")], 4)
    got: dict = {}
    for r in final.collect():
        got.setdefault(r["grp"], []).append(r["id"])
    for g in {f"g{i}" for i in range(5)}:
        want = [
            i for i, grp, _ in sorted(
                (r for r in rows if r[1] == g), key=lambda r: (-r[2], r[0])
            )[:4]
        ]
        assert sorted(got[g]) == sorted(want), f"group {g}"


def test_topk_union_merge_property(spark):
    """top-k(A ∪ B) == top-k(top-k(A) ∪ top-k(B)) — the property that makes
    distributed partial top-k correct."""
    rows, df = _mk(spark, n=300, groups=1)
    a, b = df.randomSplit([0.5, 0.5], seed=9)
    k = 7
    order = [F.desc("score"), F.asc("id")]
    direct = [r["id"] for r in topk(a.union(b), order, k).collect()]
    merged = [r["id"] for r in topk(topk(a, order, k).union(topk(b, order, k)), order, k).collect()]
    assert direct == merged
