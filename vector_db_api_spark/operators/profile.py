"""Deterministic table profiling: the first query a 100 TB dataset gets.

``df.summary()`` exists, but its approximate quantiles ride on engine-
internal sketches and its output isn't replayable; this profiler composes
the repo's deterministic primitives into one long-format frame
(column, metric, value_num, value_str):

  * ``n_nonnull`` / ``n_null`` — exact, one aggregate pass over the scan
    (all columns in a single job, map-side combined);
  * ``min`` / ``max`` — exact; numerics land in ``value_num``, strings in
    ``value_str``, timestamps in ``value_str`` via an explicit
    ``yyyy-MM-dd HH:mm:ss`` format (never engine-default rendering);
  * ``distinct_est`` — the KMV sketch (operators/sketches.py) over the
    portable h32, for INTEGER and STRING columns. Doubles and timestamps
    get no estimate: their cast-to-string renderings are engine-specific
    (scientific-notation thresholds, sub-second digits), so a portable
    hash key would be a lie — quantize upstream (cents, epoch seconds) if
    a continuous column needs a cardinality estimate.

Cost shape: one full-scan aggregate for the exact stats + one
explode-to-(column, value) pass feeding the per-column sketches (the same
single-shuffle, map-side-rank-limited plan as kmv_distinct). No reference
counterpart (its catalogs are in-memory dicts); extension per the brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_INT_TYPES = {"tinyint", "smallint", "int", "bigint"}
_NUM_TYPES = _INT_TYPES | {"float", "double"}
_TS_FMT = "yyyy-MM-dd HH:mm:ss"


def _is_ts(dtype: str) -> bool:
    return dtype.startswith("timestamp")


def table_profile(df: DataFrame, kmv_k: int = 64) -> DataFrame:
    """(column, metric, value_num, value_str) — see module docstring."""
    from vector_db_api_spark.operators.sketches import kmv_distinct

    dtypes = dict(df.dtypes)
    total = F.count(F.lit(1)).alias("__total")
    aggs = [total]
    for c, t in dtypes.items():
        aggs.append(F.count(c).alias(f"{c}__n"))
        if t in _NUM_TYPES:
            aggs.append(F.min(c).cast("double").alias(f"{c}__min"))
            aggs.append(F.max(c).cast("double").alias(f"{c}__max"))
        elif _is_ts(t):
            aggs.append(F.date_format(F.min(c), _TS_FMT).alias(f"{c}__min"))
            aggs.append(F.date_format(F.max(c), _TS_FMT).alias(f"{c}__max"))
        else:
            aggs.append(F.min(c).cast("string").alias(f"{c}__min"))
            aggs.append(F.max(c).cast("string").alias(f"{c}__max"))
    base = df.agg(*aggs)

    def entry(c: str, metric: str, num, s) -> F.Column:
        return F.struct(
            F.lit(c).alias("column"),
            F.lit(metric).alias("metric"),
            num.cast("double").alias("value_num"),
            s.cast("string").alias("value_str"),
        )

    null_n = F.lit(None).cast("double")
    null_s = F.lit(None).cast("string")
    entries = []
    for c, t in dtypes.items():
        entries.append(entry(c, "n_nonnull", F.col(f"{c}__n"), null_s))
        entries.append(
            entry(c, "n_null", F.col("__total") - F.col(f"{c}__n"), null_s)
        )
        if t in _NUM_TYPES:
            entries.append(entry(c, "min", F.col(f"{c}__min"), null_s))
            entries.append(entry(c, "max", F.col(f"{c}__max"), null_s))
        else:
            entries.append(entry(c, "min", null_n, F.col(f"{c}__min")))
            entries.append(entry(c, "max", null_n, F.col(f"{c}__max")))
    exact = base.select(F.explode(F.array(*entries)).alias("e")).select("e.*")

    sketchable = [c for c, t in dtypes.items() if t in _INT_TYPES or t == "string"]
    if not sketchable:
        return exact
    pairs = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(c).cast("string").alias("v"),
                    )
                    for c in sketchable
                ]
            )
        ).alias("s")
    ).select("s.*")
    est = kmv_distinct(pairs, ["column"], "v", k=kmv_k).select(
        "column",
        F.lit("distinct_est").alias("metric"),
        F.col("est_distinct").alias("value_num"),
        F.lit(None).cast("string").alias("value_str"),
    )
    return exact.unionByName(est)
