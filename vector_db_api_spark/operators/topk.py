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


def partial_topk_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    sort_cols: Sequence[tuple[str, bool]],
    k: int,
) -> DataFrame:
    """Map-side partial top-k: inside each Arrow batch keep only the best k
    rows per group, BEFORE any shuffle. Rows surviving are a superset of the
    global per-group top-k (any globally-top row is top within its own batch),
    so following with :func:`topk_per_group` is exact — but the shuffle input
    shrinks from N rows to ~(num_batches × groups × k).

    ``sort_cols`` is [(col, ascending)]. Values pass through untouched (no
    float re-computation), so bit-exactness of upstream scores is preserved.
    """
    import pandas as pd  # noqa: F401 — mapInPandas contract

    gcols = list(group_cols)
    by = [c for c, _ in sort_cols]
    asc = [a for _, a in sort_cols]
    schema = df.schema

    def reduce_batches(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            yield (
                pdf.sort_values(by, ascending=asc, kind="mergesort")
                .groupby(gcols, sort=False)
                .head(k)
            )

    return df.mapInPandas(reduce_batches, schema=schema)
