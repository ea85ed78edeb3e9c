"""Int8 scalar quantization for embedding columns.

At 100 TB the embedding column IS the table: a 1024-dim float32 vector is
4 KiB/row, and scan cost is dominated by reading it. Symmetric int8 scalar
quantization stores ``(scale: double, codes: array<tinyint>)`` instead —
~4× smaller scans and shuffles — with reconstruction error bounded by
``scale/2`` per component. Search pipelines re-rank quantized candidates
against the float column (kept in cold storage / a narrower projection), so
the quality knob is the re-rank depth, not the codes.

All pure Column expressions (deterministic IEEE arithmetic, no summation
re-ordering), so DuckDB computes bit-identical codes for the correctness
oracle:

* ``scale  = max(|x_i|) / 127``       (max-compare, no accumulation)
* ``code_i = floor(x_i / scale + 0.5)``  (single div, single add, floor —
  round-half-up toward +inf on both engines; |code_i| ≤ 127 by construction)
* zero vector → scale 0, all-zero codes (guarded division).

Reference scope: the reference stores raw float lists only
(models/entities.py:12-24); quantization is 100-TB extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from vector_db_api_spark.functions.vector import ColumnOrName, as_double_array

SCALE_FIELD = "scale"
CODES_FIELD = "codes"


def int8_scale(vec: ColumnOrName) -> Column:
    """Symmetric quantization scale: max(|x|)/127 (0.0 for the zero/empty
    vector)."""
    v = as_double_array(vec)
    mx = F.array_max(F.transform(v, lambda x: F.abs(x)))
    return F.coalesce(mx / F.lit(127.0), F.lit(0.0))


def quantize_int8(vec: ColumnOrName) -> Column:
    """array<float> → struct(scale double, codes array<tinyint>)."""
    v = as_double_array(vec)
    scale = int8_scale(vec)
    codes = F.transform(
        v,
        lambda x: F.when(scale == 0.0, F.lit(0))
        .otherwise(F.floor(x / scale + F.lit(0.5)))
        .cast("tinyint"),
    )
    return F.struct(scale.alias(SCALE_FIELD), codes.alias(CODES_FIELD))


def dequantize_int8(q: ColumnOrName) -> Column:
    """struct(scale, codes) → array<double> reconstruction."""
    qc = F.col(q) if isinstance(q, str) else q
    scale = qc.getField(SCALE_FIELD)
    return F.transform(qc.getField(CODES_FIELD), lambda c: c.cast("double") * scale)


def reconstruction_error(vec: ColumnOrName, q: ColumnOrName) -> Column:
    """max_i |dequantized_i - x_i| — bounded by scale/2 for non-degenerate
    vectors (pinned by test and by the roundtrip oracle query)."""
    v = as_double_array(vec)
    d = dequantize_int8(q)
    return F.coalesce(
        F.array_max(F.zip_with(d, v, lambda a, b: F.abs(a - b))), F.lit(0.0)
    )
