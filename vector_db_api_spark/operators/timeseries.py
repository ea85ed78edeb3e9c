"""Time-series densification: gap-filled rollups (the hypertable
`time_bucket_gapfill` shape re-expressed on DataFrames).

A windowed rollup emits rows only for buckets that HAVE events; consumers
of regular series (dashboards, forecasting features, joins against other
series) need every bucket present. ``time_gapfill`` densifies a bucketed
rollup: per group, a time grid materializes from the group's own
[min, max] bucket range via ``sequence`` + ``explode`` (grid rows are
generated, never shuffled in from a side table), actual rows left-join
onto the grid, and each value column fills by policy — ``"zero"``
(additive metrics: counts, sums), ``"locf"`` (state metrics: last
observation carried forward), or ``"null"`` (leave gaps visible).

Scale shape: one shuffle joins actuals to the grid; locf adds a per-group
running window, bounded by the group's bucket count (time-range/step —
thousands, not corpus-sized). Grid size is (range/step) per group: at 100 TB
of events the rollup feeding this is already small (buckets × groups), so
gapfill costs what the rollup cost, not what the events cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

FILL_POLICIES = ("zero", "locf", "null")


def time_gapfill(
    rollup: DataFrame,
    ts_col: str,
    step: str | int,
    group_cols: tuple[str, ...] = (),
    fills: dict[str, str] | None = None,
) -> DataFrame:
    """Densify a bucketed rollup to a regular grid.

    ``rollup``: one row per (group, bucket) — the output of a windowed agg.
    ``step``: interval string matching the bucket width (e.g. "1 hour") for
    timestamp buckets, or an integer step for numeric buckets (e.g. epoch
    seconds — 3600 for hourly). The numeric form is timezone-proof: the grid
    is plain integer arithmetic, with no calendar interpretation anywhere.
    ``fills``: value column → policy ("zero" | "locf" | "null"); value
    columns absent from ``fills`` default to "null".
    """
    fills = fills or {}
    for col, policy in fills.items():
        if policy not in FILL_POLICIES:
            raise ValueError(f"unknown fill policy {policy!r} for {col!r}")
    gcols = list(group_cols)
    vcols = [c for c in rollup.columns if c != ts_col and c not in gcols]

    bounds = rollup.groupBy(*gcols).agg(
        F.min(ts_col).alias("__lo"), F.max(ts_col).alias("__hi")
    )
    step_expr = (
        F.lit(step) if isinstance(step, int) else F.expr(f"INTERVAL {step}")
    )
    grid = bounds.select(
        *gcols,
        F.explode(F.sequence("__lo", "__hi", step_expr)).alias(ts_col),
    )
    dense = grid.join(rollup, gcols + [ts_col], "left")

    out_cols = [F.col(c) for c in gcols] + [F.col(ts_col)]
    for c in vcols:
        policy = fills.get(c, "null")
        if policy == "zero":
            out_cols.append(
                F.coalesce(F.col(c), F.lit(0).cast(dict(rollup.dtypes)[c])).alias(c)
            )
        elif policy == "locf":
            w = (
                Window.partitionBy(*gcols)
                .orderBy(F.col(ts_col).asc())
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            out_cols.append(F.last(c, ignorenulls=True).over(w).alias(c))
        else:
            out_cols.append(F.col(c))
    return dense.select(*out_cols)


def mad_anomalies(
    series: DataFrame,
    value_col: str,
    group_cols: tuple[str, ...] = (),
    k: float = 3.0,
) -> DataFrame:
    """Flag outliers per group by the median/MAD rule: a point is anomalous
    when |value - median| > k * MAD (MAD = median absolute deviation).

    The robust twin of z-scoring — immune to the outliers it hunts, and,
    unlike mean/stddev, built entirely from exact percentiles (no float
    summation), so an external engine replays the flags bit-for-bit. Two
    grouped aggregates (median, then MAD of the deviations) broadcast back
    onto the series; at 100 TB swap ``percentile`` for the mergeable
    ``approx_percentile`` sketch and keep the same shape.

    Returns the input plus (group_median, mad, is_anomaly).
    """
    gcols = list(group_cols)
    med = series.groupBy(*gcols).agg(
        F.percentile(value_col, 0.5).alias("group_median")
    )
    j1 = series.join(F.broadcast(med), gcols) if gcols else series.crossJoin(
        F.broadcast(med)
    )
    dev = j1.withColumn("__absdev", F.abs(F.col(value_col) - F.col("group_median")))
    mad = dev.groupBy(*gcols).agg(F.percentile("__absdev", 0.5).alias("mad"))
    j2 = dev.join(F.broadcast(mad), gcols) if gcols else dev.crossJoin(
        F.broadcast(mad)
    )
    return j2.withColumn(
        "is_anomaly", F.col("__absdev") > F.lit(k) * F.col("mad")
    ).drop("__absdev")
