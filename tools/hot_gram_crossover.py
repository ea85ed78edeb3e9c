"""Measure the hot-gram guard at its own flip criterion (r12 verdict #5).

DEPLOYMENT.md documented "route hot classes above ~1e8 occurrences" from
a 150k-occurrence measurement where the guard LOSES — the claim's regime
(single-task window sort big enough to spill) was never measured. This
harness synthesizes occurrence tables directly (the guard acts on the
occ table; gram explosion is identical on both paths) with ONE hot gram
class of size H over a 2-per-class cold tail, and times the plain window
path vs the sampled-routing path at H values spanning the flip.

Shapes measured (both end in a count() force, fresh plans, no caching):

- window: ``duplicated_occurrences(occ)`` — row_number over __gh; the
  hot class sorts in ONE window task (WindowExec buffers each partition
  key group, spilling past spark.sql.windowExecBufferSpillThreshold).
- routed: ``duplicated_occurrences(occ, hot_threshold=...)`` — sampled
  heavy-hitter flagging, hot class through a map-side-combining
  min-aggregate + equi-join, cold tail stays on the window.

Usage: ``python tools/hot_gram_crossover.py [H ...]`` (defaults
150_000 2_000_000 10_000_000 40_000_000). Prints one markdown table row
per H; paste into BENCH_SCALE.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from vector_db_api_spark.operators.span_dedup import duplicated_occurrences
from vector_db_api_spark.session import get_spark

TAIL_CLASSES = 500_000  # cold classes of exactly 2 occurrences each


def build_occ(spark, hot: int):
    """Occurrence table: `hot` rows of one gram class (__gh=42), plus a
    2-per-class cold tail — the keep-first shapes both paths must agree
    on. doc_id unique per row keeps (doc_id, start) keys distinct."""
    hot_df = spark.range(hot).select(
        F.col("id").alias("doc_id"),
        F.lit(0).alias("start"),
        F.lit(42).cast("long").alias("__gh"),
    )
    tail = spark.range(2 * TAIL_CLASSES).select(
        (F.col("id") + hot).alias("doc_id"),
        F.lit(0).alias("start"),
        (F.floor(F.col("id") / 2) + 1000).cast("long").alias("__gh"),
    )
    return hot_df.unionByName(tail)


def main() -> None:
    sizes = [int(s) for s in sys.argv[1:]] or [
        150_000, 2_000_000, 10_000_000, 40_000_000,
    ]
    spark = get_spark("hot_gram_crossover")
    spark.range(1000).selectExpr("sum(id)").collect()  # JVM warm
    print("| hot_class_occ | tail_occ | window_sec | routed_sec | winner |")
    print("|---|---|---|---|---|")
    for hot in sizes:
        occ = build_occ(spark, hot)
        t0 = time.time()
        n_win = duplicated_occurrences(occ, id_col="doc_id").count()
        t_win = time.time() - t0
        t0 = time.time()
        n_rt = duplicated_occurrences(
            occ, id_col="doc_id", hot_threshold=100_000,
            sample_fraction=0.01,
        ).count()
        t_rt = time.time() - t0
        assert n_win == n_rt, (hot, n_win, n_rt)  # output-invariance
        winner = "window" if t_win < t_rt else "routed"
        print(
            f"| {hot:,} | {2 * TAIL_CLASSES:,} | {t_win:.2f} | "
            f"{t_rt:.2f} | {winner} |", flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
