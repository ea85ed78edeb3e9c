"""Training-data curation operators: deterministic sampling, data mixing,
and sequence packing.

A 100 TB curation pass needs three properties that `df.sample()` doesn't
give: determinism under retries (a recomputed partition must keep the same
rows), external verifiability (an independent engine must be able to replay
the selection bit-for-bit), and exact per-source quotas (mixture weights are
a contract, not a hint). Everything here derives selection from the portable
md5 hash family (functions/hashing.h32), so DuckDB replays every operator
exactly — the driver's correctness gate covers curation like any other
query.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vector_db_api_spark.functions import hashing as H

# h32 yields 32-bit values; selection compares against rate * 2^32
_H32_SPACE = float(1 << 32)


def _sample_hash(key_col: str, seed: int) -> Column:
    """Deterministic per-row uniform: h32 of "key:seed". Seed participates
    in the hash (not an offset) so different seeds give independent
    samples."""
    return H.h32(F.concat_ws(":", F.col(key_col).cast("string"), F.lit(str(seed))))


def sample_hash_sql(key_col: str, seed: int) -> str:
    """The DuckDB expression replaying :func:`_sample_hash` bit-for-bit."""
    return (
        f"CAST(('0x' || substring(md5({key_col} || ':{seed}'), 1, 8)) "
        f"AS BIGINT)"
    )


def hash_sample(
    df: DataFrame, rate: float, key_col: str, seed: int = 42
) -> DataFrame:
    """Keep each row iff h32(key:seed) < rate·2³². Deterministic (same rows
    every run, every retry, every engine), independent across seeds, and a
    pure scan predicate — no shuffle, no RNG state, pushes down next to the
    other filters. The sampling unit is ``key_col``: sampling on a document
    id keeps or drops ALL rows of that document together (the property
    train/eval splits need — hash-split never leaks a document across
    splits on rerun).
    """
    if not (0.0 <= rate <= 1.0):
        raise ValueError("rate must be in [0, 1]")
    return df.filter(_sample_hash(key_col, seed) < int(rate * _H32_SPACE))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    quotas: dict[str, int],
    key_col: str,
    seed: int = 42,
    prefilter: bool = True,
) -> DataFrame:
    """EXACT per-stratum quotas — the data-mixing primitive: rank each
    stratum's rows by the deterministic hash (ties broken by key) and keep
    the first ``quotas[stratum]``. Strata absent from ``quotas`` are
    dropped; a quota larger than the stratum keeps the whole stratum.

    The hash ranking makes the selection a uniform sample of the stratum
    AND reproducible anywhere; re-running with a larger quota extends the
    previous sample instead of reshuffling it (hash order is stable), which
    is exactly how you grow a training mix without churning shards.

    Scale shape: a ranking window partitioned by stratum would put a
    60%-of-corpus stratum into ONE task — the kind of plan that works at
    sf0.1 and dies at 100 TB. With ``prefilter`` (default), a first cheap
    aggregate counts each stratum, and rows enter the window only when
    their hash is below a Chernoff-padded threshold ≈ (quota + 4√quota +
    64) / count — the survivor set is O(quota) per stratum regardless of
    corpus size, so the window ranks thousands of rows, not billions, and
    the scan-side filter does the heavy lifting. The selection is
    IDENTICAL to the unfiltered ranking (the kept rows are exactly the
    quota lowest hashes, all of which clear the threshold with
    overwhelming margin); a short stratum is detected by comparing the
    kept count against min(quota, stratum count) and falls back to the
    exact unfiltered window for that stratum — determinism is never
    probabilistic, only the fast path is.
    """
    from pyspark.sql.window import Window

    quota_col = F.create_map(
        *[x for kv in quotas.items() for x in (F.lit(kv[0]), F.lit(int(kv[1])))]
    )[F.col(strata_col)]
    w = (
        Window.partitionBy(strata_col)
        .orderBy(_sample_hash(key_col, seed).asc(), F.col(key_col).asc())
    )

    def ranked(src: DataFrame) -> DataFrame:
        return (
            src.withColumn("__rank", F.row_number().over(w))
            .filter(F.col("__rank") <= quota_col)
            .drop("__rank")
        )

    base = df.filter(F.col(strata_col).isin(list(quotas)))
    if not prefilter:
        return ranked(base)

    counts = {
        r[strata_col]: r["n"]
        for r in base.groupBy(strata_col).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    thresholds: dict[str, int] = {}
    exact_strata: list[str] = []
    for s, q in quotas.items():
        n = counts.get(s, 0)
        if n == 0:
            continue
        padded = q + 4 * int(q ** 0.5) + 64  # Chernoff-padded target
        if padded >= n:
            exact_strata.append(s)  # quota ≈ stratum — no filtering wins
        else:
            thresholds[s] = min(1 << 32, int(padded / n * _H32_SPACE))
    parts = []
    if thresholds:
        tmap = F.create_map(
            *[x for kv in thresholds.items() for x in (F.lit(kv[0]), F.lit(kv[1]))]
        )[F.col(strata_col)]
        fast = ranked(
            base.filter(F.col(strata_col).isin(list(thresholds))).filter(
                _sample_hash(key_col, seed) < tmap
            )
        )
        # verify the band held every quota; fall back per short stratum
        got = {
            r[strata_col]: r["n"]
            for r in fast.groupBy(strata_col).agg(F.count(F.lit(1)).alias("n")).collect()
        }
        short = [
            s for s in thresholds
            if got.get(s, 0) < min(quotas[s], counts.get(s, 0))
        ]
        if short:
            fast = fast.filter(~F.col(strata_col).isin(short))
            exact_strata.extend(short)
        parts.append(fast)
    if exact_strata:
        parts.append(ranked(base.filter(F.col(strata_col).isin(exact_strata))))
    if not parts:
        return base.limit(0)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def pack_documents(
    docs: DataFrame,
    budget_tokens: int,
    token_col: str,
    id_col: str = "doc_id",
    num_shards: int = 256,
) -> DataFrame:
    """Sequence packing: assign documents to training bins of ≈
    ``budget_tokens`` tokens. Returns the input plus
    (shard, bin_no, bin_offset, oversize).

    Packing rule (deterministic, SQL-expressible): within a shard, order
    docs by (hash, id) and run a token cumulative sum; a doc's bin is
    ``floor(cum_before / budget)`` — the bin its first token lands in. A bin
    can overflow by at most one document's tail (the standard streaming
    approximation of first-fit; exact bin-packing is NP-hard and
    prefix-sequential). Docs longer than the budget are flagged
    ``oversize`` for upstream split/truncate rather than silently packed.

    Scale shape: ``num_shards`` hash-shards bound every window partition —
    packing 100 TB is ``num_shards`` independent cumulative sums, not one
    global sort. Shards are also what the training job wants (one output
    file per shard, bins contiguous within it). The hash order inside a
    shard doubles as shuffling the corpus for training.
    """
    from pyspark.sql.window import Window

    if budget_tokens < 1:
        raise ValueError("budget_tokens must be >= 1")
    shard = F.pmod(H.h32(F.col(id_col).cast("string")), F.lit(num_shards))
    order_hash = _sample_hash(id_col, seed=0)
    w = (
        Window.partitionBy("shard")
        .orderBy(order_hash.asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    toks = F.col(token_col).cast("long")
    before = F.sum(toks).over(w) - toks  # tokens packed ahead of this doc
    return (
        docs.withColumn("shard", shard.cast("int"))
        .withColumn("__before", before)
        .withColumn("bin_no", F.floor(F.col("__before") / budget_tokens).cast("int"))
        .withColumn(
            "bin_offset",
            (F.col("__before") - F.col("bin_no").cast("long") * budget_tokens).cast("int"),
        )
        .withColumn("oversize", toks > budget_tokens)
        .drop("__before")
    )


def temperature_quotas(
    counts: dict[str, int],
    total: int,
    weight_fn: Callable[[int], int] | None = None,
) -> dict[str, int]:
    """Largest-remainder apportionment of ``total`` across strata by
    ``weight_fn(count)`` — the temperature-sampling schedule multilingual /
    multi-source training mixes use (weight n^alpha, alpha<1 upsamples the
    tail relative to its natural share).

    Default weight is the integer square root (alpha=0.5) because it is
    EXACT integer arithmetic — every engine apportions identically, so the
    DuckDB oracle replays the quotas from the same counts. All-integer
    largest-remainder: base = total*w // W, then +1 to the strata with the
    largest (total*w) % W (ties by stratum name), finally capped at the
    stratum count (so `total` is an upper bound when strata run short).
    """
    import math

    wfn = weight_fn or math.isqrt
    weights = {s: int(wfn(n)) for s, n in counts.items() if n > 0}
    W = sum(weights.values())
    if W <= 0:
        return {}
    base = {s: total * w // W for s, w in weights.items()}
    leftover = total - sum(base.values())
    order = sorted(
        weights, key=lambda s: (-(total * weights[s] % W), s)
    )
    for s in order[:leftover]:
        base[s] += 1
    return {s: min(counts[s], q) for s, q in base.items()}


def temperature_sample(
    df: DataFrame,
    strata_col: str,
    total: int,
    key_col: str,
    seed: int = 42,
    weight_fn: Callable[[int], int] | None = None,
) -> DataFrame:
    """Temperature-weighted mixture sample: derive per-stratum quotas from
    the observed counts (one cheap aggregate) and delegate the exact,
    reproducible selection to :func:`stratified_sample` — inheriting its
    Chernoff-prefiltered window (no stratum ever ranks corpus-sized
    input)."""
    counts = {
        r[strata_col]: r["n"]
        for r in df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    quotas = temperature_quotas(counts, total, weight_fn)
    return stratified_sample(df, strata_col, quotas, key_col, seed)


def leakage_free_split(
    docs: DataFrame,
    eval_rate: float,
    key_col: str,
    pairs: DataFrame | None = None,
    seed: int = 42,
    text_col: str = "text",
) -> DataFrame:
    """Train/eval split where near-duplicates NEVER straddle the boundary.

    A plain hash split leaks: two near-duplicate documents can land one in
    train, one in eval, and the eval metric silently measures
    memorization. Here the split key is the document's near-dup COMPONENT
    (connected components over minhash-LSH pairs, or any ``pairs`` frame
    you supply — span-overlap, embedding near-dup, ...), so an entire
    duplicate cluster moves as one unit; singleton docs hash on their own
    id. Same deterministic h32(key:seed) rule as :func:`hash_sample`, so
    the assignment is retry-stable and replayable by any engine.

    Scale: one minhash pipeline + alternating-star connected components
    (both already bounded — see operators/dedup.py; the star variant
    converges in O(log²) rounds even on long dup chains, where label
    propagation would exhaust its round budget and split clusters across
    the train/eval boundary), one join of the component labels,
    then a scan-side hash comparison. The label join is NOT hinted: pairs
    cover only docs with a duplicate, but web-scale corpora run 30-50%
    duplicate-cluster membership, so the label frame can be far too big to
    broadcast — AQE picks broadcast when the actual size fits and a keyed
    shuffle join when it doesn't (pinned by
    tests/test_curation_temporal.py::test_leakage_split_high_dup_fraction).
    """
    from .dedup import connected_components_alternating, minhash_lsh_pairs

    if pairs is None:
        pairs = minhash_lsh_pairs(docs, id_col=key_col, text_col=text_col)
    # on_nonconverged="raise": a provisional (split) labeling would let one
    # dup cluster straddle train/eval — exactly the leakage this split
    # exists to prevent — so fail loudly rather than return a leaky split
    comp = connected_components_alternating(
        pairs, "left_id", "right_id", on_nonconverged="raise"
    ).select(F.col("id").alias(key_col), F.col("component"))
    threshold = int(eval_rate * (1 << 32))
    keyed = docs.join(comp, key_col, "left").withColumn(
        "__group",
        F.coalesce(F.col("component").cast("string"), F.col(key_col).cast("string")),
    )
    return keyed.withColumn(
        "split",
        F.when(_sample_hash("__group", seed) < threshold, F.lit("eval")).otherwise(
            F.lit("train")
        ),
    ).drop("component", "__group")


def export_training_shards(
    docs: DataFrame,
    path: str,
    budget_tokens: int,
    token_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_shards: int = 256,
) -> tuple[int, int]:
    """The pipeline's terminal step: materialize packed training shards.

    Composes :func:`pack_documents`, drops ``oversize`` docs (upstream
    should split them — silently truncating data is how token budgets
    lie), and writes one partition directory per shard with rows ordered
    (bin_no, bin_offset) inside it — the exact layout a sequential
    training reader consumes: scan shard=K in file order and the bins
    stream out packed. Returns (rows_written, n_shards_written).

    Scale: partitionBy('shard') + repartition on shard keeps the write a
    single shuffle; each shard's sortWithinPartitions is bounded by the
    shard's share of the corpus (num_shards controls that).
    """
    packed = pack_documents(docs, budget_tokens, token_col, id_col, num_shards)
    good = packed.filter(~F.col("oversize"))
    (
        good.repartition(num_shards, "shard")
        .sortWithinPartitions("shard", "bin_no", "bin_offset")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
    import glob
    import os

    n_rows = good.sparkSession.read.parquet(path).count()
    n_shards = len(glob.glob(os.path.join(path, "shard=*")))
    return n_rows, n_shards
