"""Portable deterministic hashing for dedup operators.

Spark's builtin ``hash()``/``xxhash64()`` are engine-specific, so every hash
used by a dedup operator that must be verifiable by an external SQL oracle is
built from md5 hex — identical in any engine:

- ``h32``: first 8 md5 hex chars → BIGINT in [0, 2^32)
- ``h60``: first 15 md5 hex chars → BIGINT in [0, 2^60) (simhash bit source)

MinHash uses the classic universal-hash family ``(a*x + b) mod p`` over h32
values with constants derived from a seeded PRNG — the same constants are
embedded into the generated oracle SQL, so signatures match bit-for-bit.
"""

from __future__ import annotations

import random

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = Column | str

# Mersenne prime 2^61 - 1: (a*x + b) stays well inside the 64-bit signed
# range for x < 2^32 and a, b < 2^31, so the modular hash never overflows.
MERSENNE_P = (1 << 61) - 1
MINHASH_SEED = 42


def _c(col: ColumnOrName) -> Column:
    return F.col(col) if isinstance(col, str) else col


def h32(col: ColumnOrName) -> Column:
    """Portable 32-bit hash of a string column (as BIGINT)."""
    return F.conv(F.substring(F.md5(_c(col)), 1, 8), 16, 10).cast("long")


def h60(col: ColumnOrName) -> Column:
    """Portable 60-bit hash of a string column (as BIGINT)."""
    return F.conv(F.substring(F.md5(_c(col)), 1, 15), 16, 10).cast("long")


def minhash_params(num_hashes: int, seed: int = MINHASH_SEED) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for the universal hash family."""
    rng = random.Random(seed)
    return [
        (rng.randrange(1, 1 << 31), rng.randrange(0, 1 << 31))
        for _ in range(num_hashes)
    ]

def minhash_sql_exprs(num_hashes: int, hash_col: str, seed: int = MINHASH_SEED) -> list[str]:
    """ANSI-SQL snippets ``MIN((a * {hash_col} + b) % p)`` matching
    :func:`minhash_signature` — used to generate the DuckDB oracle."""
    return [
        f"MIN(({a} * {hash_col} + {b}) % {MERSENNE_P})"
        for a, b in minhash_params(num_hashes, seed)
    ]


def minhash_agg_exprs(num_hashes: int, hash_col: ColumnOrName, seed: int = MINHASH_SEED) -> list[Column]:
    """Spark aggregate Columns ``min((a*h + b) % p) AS mh{i}`` over a column
    of h32 shingle hashes (use after explode → groupBy(doc))."""
    h = _c(hash_col)
    return [
        F.min((F.lit(a) * h + F.lit(b)) % F.lit(MERSENNE_P)).alias(f"mh{i}")
        for i, (a, b) in enumerate(minhash_params(num_hashes, seed))
    ]


def word_shingles(col: ColumnOrName, k: int = 3) -> Column:
    """k-word shingles of a pre-normalized, space-separated text column.

    Pure higher-order-function implementation: split → transform over start
    positions → join k consecutive words. Empty/short docs yield the full
    token string as a single shingle.
    """
    toks = F.split(_c(col), " ")
    n = F.size(toks)
    starts = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.transform(
        starts,
        lambda i: F.array_join(F.slice(toks, i + 1, k), " "),
    )


def band_id(sig_cols: list[Column | str], band: int, rows_per_band: int) -> Column:
    """LSH band bucket key: md5 over the band's signature rows."""
    cols = [_c(c) for c in sig_cols]
    rows = cols[band * rows_per_band : (band + 1) * rows_per_band]
    return F.md5(F.concat_ws(",", *[r.cast("string") for r in rows]))
