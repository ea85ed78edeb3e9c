"""Skew-mitigation operators: salted aggregation and salted joins.

At 100 TB a handful of hot keys (a viral document, a bot user, an empty-string
tag) concentrate one shuffle partition onto one executor while the rest of the
cluster idles. AQE's skew-join splitting (enabled in ``session.py``) handles
the *sort-merge join* case at runtime; these operators cover the two cases AQE
does not re-plan:

* ``salted_agg`` — high-cardinality aggregation states under a hot group key
  (e.g. ``collect_set``/``count_distinct``-shaped work where map-side partial
  aggregation cannot shrink the hot group). Two-phase: group by
  ``(keys, salt)`` first, then merge partials by ``keys``. For algebraic
  aggregates the result is bit-identical to a direct ``groupBy`` — the salt
  only changes the physical partitioning, never the values.
* ``salted_join`` — broadcast-ineligible join with a skewed key distribution:
  the big side gets a deterministic per-row salt in ``[0, n)``, the small side
  is replicated once per salt value, and the equi-join runs on
  ``(key, salt)`` so a hot key spreads over ``n`` partitions.

Both are semantics-preserving rewrites, so their DuckDB oracles are the plain
``GROUP BY`` / ``JOIN`` — the driver's correctness gate proves salting is
invisible to results.

Salt derivation is ``xxhash64(row columns) mod n``: deterministic under task
retry (no ``rand()``), uniform enough to split hot keys, and needs no extra
state. Reference scope note: the reference is single-process and has no skew
concept; this module is part of the 100-TB extension surface (builder brief).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"

# (phase-1 partial, phase-2 merge) expression builders per aggregate kind.
# Only algebraic aggregates belong here: each must decompose into a partial
# state that merges associatively, or the two-phase rewrite changes results.
_ALGEBRAIC = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    num_salts: int = 32,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output column name -> (input column, kind) with kind in
    ``sum | count | min | max | avg``. ``avg`` is decomposed into sum+count
    partials and divided after the merge (the naive avg-of-avgs is wrong for
    unequal salt-bucket sizes, so it is never computed that way here).

    Scale shape: shuffle #1 keys on ``(keys, salt)`` — a hot key spreads over
    ``num_salts`` reducers; shuffle #2 merges at most
    ``num_salts × |distinct keys|`` pre-aggregated rows, which is tiny.
    """
    for name, (_, kind) in aggs.items():
        if kind not in _ALGEBRAIC and kind != "avg":
            raise ValueError(
                f"salted_agg: non-algebraic aggregate {kind!r} for {name!r}; "
                "supported: sum, count, min, max, avg"
            )

    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(num_salts))
    salted = df.withColumn(_SALT, salt)

    partials: list[Column] = []
    merges: list[Column] = []
    avg_sums: dict[str, tuple[str, str]] = {}
    for name, (col, kind) in aggs.items():
        if kind == "avg":
            s, c = f"{name}__psum", f"{name}__pcnt"
            partials.append(F.sum(col).alias(s))
            partials.append(F.count(col).alias(c))
            merges.append(F.sum(s).alias(s))
            merges.append(F.sum(c).alias(c))
            avg_sums[name] = (s, c)
        else:
            partial, merge = _ALGEBRAIC[kind]
            partials.append(partial(col).alias(name))
            merges.append(merge(name).alias(name))

    merged = (
        salted.groupBy(*keys, _SALT)
        .agg(*partials)
        .groupBy(*keys)
        .agg(*merges)
    )
    if avg_sums:
        final_cols = [F.col(k) for k in keys]
        for name, (col, kind) in aggs.items():
            if kind == "avg":
                s, c = avg_sums[name]
                final_cols.append(
                    (F.col(s) / F.col(c).cast("double")).alias(name)
                )
            else:
                final_cols.append(F.col(name))
        merged = merged.select(*final_cols)
    return merged


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Column,
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the big side, replicate the small side.

    ``on`` must be an equality predicate between ``big`` and ``small``
    columns; the physical join key becomes ``(on, salt)``. The small side is
    exploded ``num_salts``× (cost: ``num_salts × |small|`` rows — keep it for
    sides too big to broadcast but far smaller than ``big``). ``how`` supports
    the outer-preserving-big variants (``inner``, ``left``) — a ``right``/
    ``full`` join would duplicate small-side unmatched rows per salt.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(num_salts))
    big_s = big.withColumn(_SALT, salt)
    small_s = small.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(num_salts)]))
    )
    joined = big_s.join(small_s, on & (big_s[_SALT] == small_s[_SALT]), how)
    return joined.drop(_SALT)
