"""Shared libm float kernels for cross-engine bit-exactness.

Every model-fitting path that must replay bit-for-bit in the DuckDB oracle
(DSIR log-ratios, unigram-LM log-probs) computes its logs with the
platform ``math.log`` inside an Arrow pandas_udf over a KB-scale model
table — NOT ``F.log`` (JVM StrictMath/fdlibm can differ from C libm in the
last ulp) and NOT numpy's SIMD log (measured ulp disagreement vs libm; see
lm.train_unigram_df). This module is the single definition of that kernel:
the discipline is a correctness invariant shared by several operators, so
a future change (e.g. zero/NaN handling) lands in exactly one place.
"""

from __future__ import annotations

import math


def libm_log_udf():
    """Element-wise ``math.log`` as an Arrow pandas_udf (double → double).

    Returns a fresh udf object per call — pandas_udf registration is
    session-independent, but constructing lazily keeps module import free
    of any Spark-side work."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    return pandas_udf(
        lambda p: pd.Series([math.log(x) for x in p], dtype="float64"),
        "double",
    )
