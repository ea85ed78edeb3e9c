"""Listing / pagination operators — reference §2.3 parity.

The reference lists documents with optional filters, a sort column, and
offset/limit pagination with a ``has_more`` flag computed by fetching
``limit + 1`` rows (repos/documents.py:22-47, routers/libraries.py:69-75).

Spark mapping: predicates push down into the parquet scan; ``offset().limit()``
after an explicit total order gives deterministic pages. ``has_more`` probes
``limit + 1`` rows exactly like the reference (the count stops early — it
never scans the full table thanks to the limit).

Determinism note: pagination REQUIRES a total order — always include a unique
tiebreak column in ``order_by`` (the reference relies on dict insertion
order, which we replace with an explicit sort).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame


def list_page(
    df: DataFrame,
    order_by: Sequence[Column],
    offset: int = 0,
    limit: int | None = None,
    filters: Sequence[Column] = (),
) -> DataFrame:
    """Filter → total-order sort → offset/limit slice."""
    out = df
    for f in filters:
        out = out.filter(f)
    out = out.orderBy(*order_by)
    if offset:
        out = out.offset(offset)
    if limit is not None:
        out = out.limit(limit)
    return out


def page_stats(
    df: DataFrame,
    offset: int = 0,
    limit: int = 10,
    filters: Sequence[Column] = (),
) -> tuple[int, bool]:
    """(page_len, has_more) via the reference's limit+1 probe
    (routers/libraries.py:69-75). Order-independent, so no sort is needed —
    the probe only counts."""
    out = df
    for f in filters:
        out = out.filter(f)
    probe = out.offset(offset).limit(limit + 1).count() if offset else out.limit(limit + 1).count()
    return min(probe, limit), probe > limit
