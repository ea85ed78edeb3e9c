"""Benchmark decontamination: find (and drop) training documents that
overlap an evaluation/benchmark set.

Standard practice for LLM training corpora (GPT-3 App. C, PaLM, Llama):
a training doc is *contaminated* if it shares at least ``min_shared``
k-word shingles with any benchmark doc. k is conventionally 8-13 words —
long enough that a shared shingle means copied text, not chance.

Scale shape: the benchmark side is small (eval sets are thousands of docs,
the training side is the 100 TB one), so its shingle table broadcasts —
the training corpus is scanned ONCE, shingled in place, hash-joined
against the broadcast with no shuffle of the corpus, and only the
(train, bench) matches — a vanishingly small row set — hit the counting
shuffle. ``decontaminate`` then removes flagged docs with a broadcast
anti-join, again shuffle-free on the corpus.

No reference counterpart (extension per the builder's brief); shingling
reuses operators/dedup.shingle_hashes so Spark and the DuckDB oracle agree
bit-for-bit on the shingle universe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import shingle_hashes

DEFAULT_K = 8


def contamination_pairs(
    train: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    bench_id_col: str = "bench_id",
    text_col: str = "text",
    k: int = DEFAULT_K,
    min_shared: int = 1,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """(train_id, bench_id, n_shared): distinct k-word shingles shared
    between each contaminated training doc and each benchmark doc it hits.

    ``broadcast_benchmark=True`` (the 100 TB default) requires the
    benchmark's shingle table to fit the broadcast limit — at k=8 a
    10k-doc eval set is a few MB. Pass False for benchmark-vs-benchmark
    audits where both sides are large; the join then shuffles on
    shingle_hash like the dedup self-join.
    """
    tsh = shingle_hashes(train, id_col, text_col, k).withColumnRenamed(
        id_col, "train_id"
    )
    bsh = shingle_hashes(benchmark, bench_id_col, text_col, k).withColumnRenamed(
        bench_id_col, "bench_id"
    )
    if broadcast_benchmark:
        bsh = F.broadcast(bsh)
    return (
        tsh.join(bsh, "shingle_hash")
        .groupBy("train_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def contaminated_ids(
    train: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    bench_id_col: str = "bench_id",
    text_col: str = "text",
    k: int = DEFAULT_K,
    min_shared: int = 1,
) -> DataFrame:
    """(train_id, n_bench_hits, max_shared): one row per contaminated doc."""
    return (
        contamination_pairs(
            train, benchmark, id_col, bench_id_col, text_col, k, min_shared
        )
        .groupBy("train_id")
        .agg(
            F.count(F.lit(1)).alias("n_bench_hits"),
            F.max("n_shared").alias("max_shared"),
        )
    )


def decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    bench_id_col: str = "bench_id",
    text_col: str = "text",
    k: int = DEFAULT_K,
    min_shared: int = 1,
) -> DataFrame:
    """Training corpus minus contaminated docs (left-anti join). The
    flagged-id set is usually tiny (docs overlapping benchmark n-grams),
    but its size is data-dependent, so the join is unhinted — AQE
    broadcasts when the measured size fits and shuffles otherwise."""
    flagged = contaminated_ids(
        train, benchmark, id_col, bench_id_col, text_col, k, min_shared
    ).select(F.col("train_id").alias(id_col))
    return train.join(flagged, id_col, "left_anti")
