"""Mergeable cardinality sketches + distribution summaries.

At 100 TB, "how many distinct users / URLs / shingles" cannot afford an
exact ``COUNT(DISTINCT)`` re-shuffle per question, and monitoring wants a
small *mergeable state* per partition/day that rolls up associatively. The
classic answer is the KMV (k-minimum-values) sketch (Bar-Yossef et al. 2002;
Beyer et al., "On synopses for distinct-value estimation under multiset
operations", SIGMOD 2007): keep the k smallest distinct hash values; the
k-th smallest, scaled to the hash range, estimates the cardinality as
``(k-1) / (h_k / 2^32)`` with relative error ~ 1/sqrt(k).

Spark ships HLL-based ``approx_count_distinct``, but its binary sketch is
engine-internal and non-replayable; this KMV is built on the repo's portable
md5-derived ``h32`` (functions/hashing.py), so every estimate is a
deterministic double that an external SQL oracle reproduces bit-for-bit —
the same verifiability-first design as the dedup family. The reference
engine has no sketching surface at all (its catalogs are exact in-memory
dicts, src/vector_db_api/services/*.py); this is a scale extension.

Two surfaces:

- :func:`kmv_distinct` — per-group estimate in one query (distinct-hash
  shuffle + per-group k-smallest; the group-by reuses the window's
  partitioning, so ONE exchange past the distinct).
- :func:`kmv_state` / :func:`kmv_merge_states` / :func:`kmv_estimate` —
  the mergeable form: states from disjoint slices (days, partitions,
  clusters) union losslessly; ``merge(state(A), state(B)) == state(A ∪ B)``
  exactly, pinned by tests/test_sketches_kmv.py.

Plus :func:`value_histogram`: an exact equi-width histogram in two scans
(min/max agg broadcast back into the binning scan) — fully parallel, no
global sort, the scalable first look at a numeric column's shape.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from vector_db_api_spark.functions import hashing as H

HASH_RANGE = float(1 << 32)  # h32 values are uniform in [0, 2^32)


def _hash_col(value_col: str) -> Column:
    # cast through string so any input type keys identically in any engine
    return H.h32(F.col(value_col).cast("string"))


def kmv_distinct(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Per-group KMV distinct-count estimate: (group_cols..., est_distinct).

    When a group holds fewer than k distinct hashes the sketch is exact
    (est = the count itself). Hash collisions under-count by the birthday
    bound on 2^32 — negligible until ~10^8 distinct per group, the point
    where you'd raise the hash width anyway.
    """
    h = _hash_col(value_col)
    d = (
        df.filter(F.col(value_col).isNotNull())
        .select(*group_cols, h.alias("__h"))
        .distinct()
    )
    w = Window.partitionBy(*group_cols).orderBy("__h")
    topk = d.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= k)
    est = F.when(
        F.col("__m") < k, F.col("__m").cast("double")
    ).otherwise(F.lit(float(k - 1)) * F.lit(HASH_RANGE) / F.col("__hk").cast("double"))
    return (
        topk.groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("__m"),
            F.max(F.when(F.col("__rn") == k, F.col("__h"))).alias("__hk"),
        )
        .select(*group_cols, est.alias("est_distinct"))
    )


def kmv_state(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Per-group mergeable sketch state: (group_cols..., kmin array<long>).

    ``kmin`` is the sorted list of the ≤k smallest distinct h32 values —
    the complete KMV synopsis. States over disjoint (or overlapping — KMV
    is a *distinct* sketch, double-counting is impossible) slices merge
    with :func:`kmv_merge_states`.
    """
    h = _hash_col(value_col)
    d = (
        df.filter(F.col(value_col).isNotNull())
        .select(*group_cols, h.alias("__h"))
        .distinct()
    )
    w = Window.partitionBy(*group_cols).orderBy("__h")
    return (
        d.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .groupBy(*group_cols)
        .agg(F.array_sort(F.collect_list("__h")).alias("kmin"))
    )


def kmv_merge_states(
    states: DataFrame,
    group_cols: Sequence[str],
    k: int = 64,
    state_col: str = "kmin",
) -> DataFrame:
    """Merge sketch states group-wise: union the value sets, keep the k
    smallest — exactly the state a single pass over the union would build
    (associative + commutative + idempotent, so any merge tree works)."""
    merged = F.slice(
        F.array_sort(F.array_distinct(F.flatten(F.collect_list(state_col)))), 1, k
    )
    return states.groupBy(*group_cols).agg(merged.alias(state_col))


def kmv_estimate(state_col: Column | str, k: int = 64) -> Column:
    """Estimate column from a sketch state: exact below k, else the KMV
    estimator off the k-th smallest hash."""
    s = F.col(state_col) if isinstance(state_col, str) else state_col
    m = F.size(s)
    return F.when(m < k, m.cast("double")).otherwise(
        F.lit(float(k - 1)) * F.lit(HASH_RANGE) / F.element_at(s, k).cast("double")
    )


def value_histogram(
    df: DataFrame,
    value_col: str,
    bins: int = 10,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Exact equi-width histogram: (group_cols..., bin, n, lo_val, hi_val).

    Two fully-parallel scans: a global (or per-group) min/max aggregate,
    broadcast back into the binning pass — no global sort, no collect; the
    pattern survives any scale the scans do. Values equal to the max fold
    into the last bin (standard right-closed top bin). A constant column
    (width 0) lands entirely in bin 0. Null AND NaN values are excluded:
    Spark's max orders NaN above every double, so one NaN would poison
    __hi/width and collapse every row into a null bin (and NaN ordering
    differs between engines anyway).
    """
    v = F.col(value_col).cast("double")
    src = df.filter(v.isNotNull() & ~F.isnan(v)).withColumn("__v", v)
    if group_cols:
        bounds = src.groupBy(*group_cols).agg(
            F.min("__v").alias("__lo"), F.max("__v").alias("__hi")
        )
        joined = src.join(F.broadcast(bounds), list(group_cols))
    else:
        bounds = src.agg(F.min("__v").alias("__lo"), F.max("__v").alias("__hi"))
        joined = src.crossJoin(F.broadcast(bounds))
    width = (F.col("__hi") - F.col("__lo")) / F.lit(float(bins))
    bin_no = F.when(width == 0.0, F.lit(0)).otherwise(
        F.least(
            F.floor((F.col("__v") - F.col("__lo")) / width), F.lit(bins - 1)
        )
    ).cast("int")
    return (
        joined.withColumn("bin", bin_no)
        .groupBy(*group_cols, "bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("__v").alias("lo_val"),
            F.max("__v").alias("hi_val"),
        )
    )


def quantile_sketch_state(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    id_col: str,
    k: int = 256,
) -> DataFrame:
    """Per-group mergeable quantile synopsis by hash-rank sampling:
    (group_cols..., qsample array<struct<h:long, v:double>>).

    Hashing each row's UNIQUE id gives a deterministic uniform random
    permutation; the k smallest-hash rows per group are therefore a
    uniform-without-replacement sample — but one that is reproducible,
    engine-portable, and mergeable exactly like KMV (union the pairs,
    re-take the k smallest hashes; overlapping slices dedup on the hash).
    Quantiles read off the sample with the usual ~1/sqrt(k) error.

    ``id_col`` must be a unique row key (event_id, doc_id…): hashing the
    VALUE would collapse duplicates and bias the sample; hashing a
    nondeterministic surrogate (monotonically_increasing_id) would break
    reproducibility. The same map-side WindowGroupLimit bound applies as in
    :func:`kmv_state` — each task forwards ≤k rows per group.

    The rank order is (hash, value) over DISTINCT pairs: ids colliding on
    h32 would otherwise make row_number's tie-break nondeterministic
    exactly when the tie straddles rank k (colliding ids with the same
    value are one sample point — losing such a twin is the same
    ~n²/2³³-probability, ±1-point perturbation any hash sketch carries).
    """
    h = H.h32(F.col(id_col).cast("string"))
    d = (
        df.filter(F.col(value_col).isNotNull() & F.col(id_col).isNotNull())
        .select(
            *group_cols, h.alias("__h"), F.col(value_col).cast("double").alias("__v")
        )
        .distinct()
    )
    w = Window.partitionBy(*group_cols).orderBy("__h", "__v")
    return (
        d.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .groupBy(*group_cols)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("__h").alias("h"), F.col("__v").alias("v")))
            ).alias("qsample")
        )
    )


def quantile_merge_states(
    states: DataFrame,
    group_cols: Sequence[str],
    k: int = 256,
    state_col: str = "qsample",
) -> DataFrame:
    """Merge quantile-sketch states group-wise (flatten → dedup on the
    hash pair → k smallest) — same CRDT contract as kmv_merge_states."""
    merged = F.slice(
        F.array_sort(F.array_distinct(F.flatten(F.collect_list(state_col)))), 1, k
    )
    return states.groupBy(*group_cols).agg(merged.alias(state_col))


def quantile_estimate(state_col: Column | str, p: float) -> Column:
    """The p-quantile (discrete, ceil-index convention) read off a sketch
    state's sampled values — deterministic in any engine."""
    s = F.col(state_col) if isinstance(state_col, str) else state_col
    vs = F.array_sort(F.transform(s, lambda x: x["v"]))
    m = F.size(vs)
    idx = F.greatest(F.ceil(F.lit(float(p)) * m).cast("int"), F.lit(1))
    return F.element_at(vs, idx)
