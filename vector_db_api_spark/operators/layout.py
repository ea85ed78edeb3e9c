"""Data-layout operators: Z-order (Morton) clustering for multi-dimensional
scan pruning.

Parquet prunes with per-row-group min/max statistics, which only bites when
rows are CLUSTERED on the filtered column. Sorting can cluster one column;
Z-ordering interleaves the bits of several normalized columns so rows close
in ANY of them land close on disk — the standard lakehouse technique
(Delta/Iceberg `OPTIMIZE ZORDER BY`) for tables filtered on more than one
dimension (e.g. chunks by (library_id, created_at), events by (user_id, ts)).

Everything is integer Column arithmetic (rank-normalize via ntile, then
bit-interleave with shifts), so the DuckDB oracle replays z-values exactly
and the write path is an ordinary ``orderBy`` — Spark's range partitioner
gives contiguous z-ranges per output file, which is precisely what the
min/max stats need.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

ZBITS = 16  # bits per dimension; 2 dims -> 32-bit z-value, 4 dims -> 64


def interleave_bits(cols: list[Column], bits: int = ZBITS) -> Column:
    """Morton-interleave already-normalized integer columns (each in
    [0, 2^bits)): bit j of column i lands at position j*len(cols)+i."""
    n = len(cols)
    out: Column = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        for j in range(bits):
            out = out + (
                F.shiftleft(
                    F.shiftright(c.cast("long"), j).bitwiseAND(F.lit(1)),
                    j * n + i,
                )
            )
    return out


def zorder_value(
    df: DataFrame,
    cols: list[str],
    bits: int = ZBITS,
    out_col: str = "zvalue",
    tiebreak: str | None = None,
) -> DataFrame:
    """Append a Morton code over ``cols`` (any orderable types).

    Columns are rank-normalized with ``ntile(2^bits)`` so skewed/
    arbitrary-typed dimensions map uniformly onto the grid; pass a unique
    ``tiebreak`` column to make tile assignment among equal values
    deterministic (required for oracle replay; irrelevant for layout
    quality). One window pass per column; the window is un-partitioned, so
    at deployment scale compute tiles from an equi-depth histogram
    (``approxQuantile``) instead — the interleave is identical either way.
    """
    out = df
    tiles = []
    for c in cols:
        t = f"__tile_{c}"
        order = [F.col(c)] + ([F.col(tiebreak)] if tiebreak else [])
        out = out.withColumn(
            t,
            (F.ntile(1 << bits).over(Window.orderBy(*order)) - 1).cast("long"),
        )
        tiles.append(t)
    out = out.withColumn(out_col, interleave_bits([F.col(t) for t in tiles], bits))
    return out.drop(*tiles)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = ZBITS,
    num_files: int = 32,
) -> None:
    """Cluster by z-value and write: repartitionByRange gives each file a
    contiguous z-range, so row-group min/max stats prune on EVERY z-ordered
    dimension."""
    z = zorder_value(df, cols, bits)
    (
        z.repartitionByRange(num_files, F.col("zvalue"))
        .sortWithinPartitions("zvalue")
        .drop("zvalue")
        .write.mode("overwrite")
        .parquet(path)
    )
