"""Partition-layout invariance: results must be a pure function of the
DATA, never of how it happens to be partitioned.

On a 1000-executor cluster the physical layout differs run to run (AQE
coalescing, skew splits, input splits); any operator whose output shifts
with layout is nondeterministic at scale even if it looks stable on a
laptop. This caught the quantile sketch's hash-tie sensitivity in review;
these tests pin the invariance for the operators where layout could leak
in (rank ties, priority orders, map-side limits, fold grouping)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def skewed(spark):
    rows = [
        (i, f"g{i % 3}", float((i * 37) % 1000), i)
        for i in range(4000)
    ]
    return spark.createDataFrame(rows, "rid long, g string, x double, v long")


def _layouts(df, key=None):
    mid = df.repartition(7, key) if key else df.repartition(7)
    return [df.repartition(1), mid, df.repartition(13)]


def test_kmv_estimates_are_layout_invariant(spark, skewed):
    from vector_db_api_spark.operators.sketches import kmv_distinct

    outs = [
        sorted(map(tuple, kmv_distinct(d, ["g"], "v", k=32).collect()))
        for d in _layouts(skewed, "g")
    ]
    assert outs[0] == outs[1] == outs[2]


def test_quantile_sketch_is_layout_invariant(spark, skewed):
    from vector_db_api_spark.operators.sketches import quantile_sketch_state

    outs = [
        sorted(
            (r["g"], tuple(map(tuple, r["qsample"])))
            for r in quantile_sketch_state(d, ["g"], "x", "rid", k=64).collect()
        )
        for d in _layouts(skewed, "g")
    ]
    assert outs[0] == outs[1] == outs[2]


def test_semdedup_drop_set_is_layout_invariant(spark):
    from vector_db_api_spark.operators.semdedup import semdedup_dropped

    rng = np.random.default_rng(9)
    c = rng.standard_normal((4, 8))
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    base = rng.standard_normal((50, 8))
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(base)]
    rows += [  # planted near-dups
        (100 + i, [float(x) for x in base[i] + rng.standard_normal(8) * 1e-4])
        for i in range(10)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    outs = [
        sorted(map(tuple, semdedup_dropped(d, c, 0.98).collect()))
        for d in _layouts(df)
    ]
    assert outs[0] == outs[1] == outs[2]
    assert outs[0]  # the planted dups actually dropped


def test_classifier_logits_are_layout_invariant(spark):
    from vector_db_api_spark.operators.quality_model import (
        fixed_model,
        score_quality_linear_join,
    )

    w = fixed_model(64, 5)
    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta token{i % 17} epsilon") for i in range(500)],
        "doc_id long, text string",
    )
    wdf = spark.createDataFrame(
        [(i, float(x)) for i, x in enumerate(w)], "bucket int, weight double"
    )
    outs = [
        sorted(map(tuple, score_quality_linear_join(d, wdf, 64, -0.1).collect()))
        for d in _layouts(docs)
    ]
    assert outs[0] == outs[1] == outs[2]


def test_topk_is_layout_invariant(spark, skewed):
    from vector_db_api_spark.operators.topk import topk_per_group

    outs = [
        sorted(
            map(
                tuple,
                topk_per_group(
                    d, ["g"], [F.desc("x"), F.asc("rid")], 5
                ).collect(),
            )
        )
        for d in _layouts(skewed, "g")
    ]
    assert outs[0] == outs[1] == outs[2]
