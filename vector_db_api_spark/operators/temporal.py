"""Temporal joins Spark lacks as builtins: as-of join (and the point-in-time
lookup it enables).

The as-of join — "for each left row, the latest right row at or before its
timestamp, per key" — is the attribution/feature-lookup workhorse
(purchase → most recent signup; prediction → feature value as of event
time). Spark has no ASOF JOIN operator; the naive translation
(non-equi range join + max) re-scans the right side per left row. This
implementation is the classic scalable reformulation: tag both sides, union,
ONE shuffle on the key, and a per-key ordered window carrying the last right
row forward — O((L+R) log partition) with no range join anywhere. DuckDB
HAS a native ASOF JOIN, which the suite uses as the oracle, so the
semantics are pinned bit-for-bit against an independent implementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts",
    right_prefix: str = "r_",
    strict: bool = False,
) -> DataFrame:
    """Left as-of join: every ``left`` row, joined to the latest ``right``
    row of the same ``on`` key with ``right.ts <= left.ts`` (``< `` when
    ``strict``). Unmatched left rows keep nulls — LEFT OUTER semantics,
    matching ``ASOF LEFT JOIN``.

    Right columns come back prefixed with ``right_prefix``. When several
    right rows share the winning (key, ts) the LAST one in (ts, original
    column order) wins deterministically — dedupe the right side first if
    that tie is meaningful.

    Plan: union of tagged sides → single Exchange on ``on`` → window sort
    by (ts, side) carrying ``last(right_struct, ignoreNulls)`` forward →
    filter back to left rows. The window frame is running (no full-partition
    materialization), and both inputs keep their scan pruning — at 100 TB
    this is one shuffle of L+R rows, the same cost as the equality join the
    pipeline was already paying.

    Skew note: the window is per-key, so one pathologically hot key (an
    entity owning a material fraction of ALL events) serializes into one
    task — the same bound as any per-entity ordered computation
    (sessionization included). If a key can be that hot, pre-split its
    history by time range and as-of join each range with the previous
    range's last right row appended as a seed row; for the key
    distributions event data actually has (heavy but bounded), the single
    shuffle + running frame is the right plan.
    """
    # side ordering at equal ts: right first (0) so a same-ts right row is
    # visible to the left row (>= semantics); strict puts right AFTER left
    right_rank = 1 if strict else 0
    left_rank = 1 - right_rank

    rstruct = F.struct(*[F.col(c) for c in right.columns])
    r = right.select(
        F.col(on).alias("__k"),
        F.col(ts_col).alias("__ts"),
        F.lit(right_rank).alias("__side"),
        rstruct.alias("__r"),
        F.lit(None).cast(
            left.select(F.struct(*left.columns).alias("s")).schema["s"].dataType.simpleString()
        ).alias("__l"),
    )
    lstruct = F.struct(*[F.col(c) for c in left.columns])
    l = left.select(
        F.col(on).alias("__k"),
        F.col(ts_col).alias("__ts"),
        F.lit(left_rank).alias("__side"),
        F.lit(None).cast(
            right.select(F.struct(*right.columns).alias("s")).schema["s"].dataType.simpleString()
        ).alias("__r"),
        lstruct.alias("__l"),
    )
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l.unionByName(r).withColumn(
        "__match", F.last("__r", ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("__l").isNotNull()).select(
        *[F.col(f"__l.{c}").alias(c) for c in left.columns],
        *[F.col(f"__match.{c}").alias(f"{right_prefix}{c}") for c in right.columns],
    )
    return out


def interval_join(
    left: DataFrame,
    right: DataFrame,
    lower: str,
    upper: str,
    on: str | None = None,
    ts_col: str = "ts",
    right_prefix: str = "r_",
) -> DataFrame:
    """Inner join of every left row to the right rows whose timestamp lies
    in ``[left.ts + lower, left.ts + upper]`` (interval strings like
    ``'-1 hour'``/``'0 seconds'``), optionally also matching an equality
    key ``on``.

    Why not just write the range predicate: with no equality conjunct,
    Catalyst plans a range-only join as BroadcastNestedLoop/Cartesian —
    quadratic at scale. This operator manufactures the missing equality:
    time is binned at the window width; each LEFT row explodes to every
    bin its window overlaps (ceil(width/bin)+1 ≤ 2 rows for a one-bin-wide
    window), each RIGHT row lands in exactly ONE bin (its own), and the
    join runs as an equi-join on (key?, bin) with the exact range predicate
    as a post-filter. Each qualifying pair meets in exactly one bin —
    the right row's — so no dedup pass is needed. One shuffle, bin
    occupancy bounds the worst task, and the plan is a plain
    SortMergeJoin/ShuffledHashJoin Catalyst knows how to scale (pinned in
    tests: no nested-loop operator in the plan).
    """
    lo = F.expr(f"INTERVAL {lower.lstrip('-')}")
    lo_sign = -1 if lower.strip().startswith("-") else 1
    hi = F.expr(f"INTERVAL {upper.lstrip('-')}")
    hi_sign = -1 if upper.strip().startswith("-") else 1

    l_ts = F.col(ts_col)
    win_lo = l_ts + lo if lo_sign > 0 else l_ts - lo
    win_hi = l_ts + hi if hi_sign > 0 else l_ts - hi

    # unix_micros rejects TIMESTAMP_NTZ; cast first. The session runs UTC,
    # so NTZ→LTZ is the identity wall-clock mapping, and binning only needs
    # the SAME monotone int mapping on both sides anyway.
    def _us(col):
        return F.unix_micros(col.cast("timestamp"))

    # bin width = window span (micros); every window overlaps ≤ 2 bins
    lo_us = _us(F.to_timestamp(F.lit("1970-01-01 00:00:00")) + lo) * lo_sign
    hi_us = _us(F.to_timestamp(F.lit("1970-01-01 00:00:00")) + hi) * hi_sign
    span = hi_us - lo_us

    lb = F.floor(_us(win_lo) / span)
    ub = F.floor(_us(win_hi) / span)
    lkeys = ([on] if on else []) + ["__bin"]

    lx = left.withColumn("__bins", F.sequence(lb, ub)).withColumn(
        "__bin", F.explode("__bins")
    ).drop("__bins").withColumn("__lo", win_lo).withColumn("__hi", win_hi)
    rx = right.select(
        *([F.col(on).alias(on)] if on else []),
        F.floor(_us(F.col(ts_col)) / span).alias("__bin"),
        F.struct(*right.columns).alias("__r"),
        F.col(ts_col).alias("__rts"),
    )
    joined = lx.join(rx, lkeys, "inner").filter(
        (F.col("__rts") >= F.col("__lo")) & (F.col("__rts") <= F.col("__hi"))
    )
    return joined.select(
        *[F.col(c) for c in left.columns],
        *[F.col(f"__r.{c}").alias(f"{right_prefix}{c}") for c in right.columns],
    )
