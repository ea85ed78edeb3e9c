"""Top-k helpers.

Global top-k uses ``orderBy().limit(k)`` — Spark executes this as
TakeOrderedAndProject (per-partition heap + driver merge), which is the
correct distributed plan at any scale: no full sort, no single-node shuffle.

Per-group top-k uses a ``row_number`` window. The window shuffles once on the
partition keys; with AQE on, skewed groups are split at runtime.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk(df: DataFrame, order_by: Sequence[Column], k: int) -> DataFrame:
    """Global top-k → TakeOrderedAndProject (heap-based, no global sort)."""
    return df.orderBy(*order_by).limit(k)


def topk_per_group(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "rank",
    keep_rank: bool = False,
) -> DataFrame:
    """Top-k rows per group via row_number (deterministic given a total order
    in ``order_by`` — always include a unique tiebreak column)."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    out = df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= k
    )
    return out if keep_rank else out.drop(rank_col)
