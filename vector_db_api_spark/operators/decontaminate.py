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


def semantic_contamination_pairs(
    train: DataFrame,
    benchmark: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    bench_id_col: str = "bench_id",
    vec_col: str = "embedding",
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """(train id, bench id, cosine) for every pair with cosine >=
    ``threshold`` — the EMBEDDING form of contamination (r13): paraphrased
    or lightly-rewritten benchmark text shares no 8-word shingle with its
    source, but its embedding still sits in the eval doc's cosine ball
    (the SemDeDup observation applied to decontamination).

    Scale shape mirrors the lexical form: eval sets are small, so the
    UNIT-NORMALIZED benchmark side broadcasts and the training corpus is
    scanned once through a BroadcastNestedLoopJoin — linear in |train| ×
    |bench|, with NO shuffle of the corpus and no join key needed. That
    is the right plan while |bench| stays benchmark-sized (10^3-10^5
    rows); past that, block both sides with
    ``operators/dedup.block_by_ivf`` and use the cell-keyed
    ``embedding_neardup`` machinery instead — this function intentionally
    has no blocking so its recall is EXACT (a decontamination miss is a
    benchmark leak, the one error class the pipeline must not make).

    Zero/null vectors on either side never match (cosine undefined —
    same rule as the kNN kernels)."""
    from vector_db_api_spark.functions import vector as V

    t = train.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col),
        V.normalize(F.col(vec_col).cast("array<double>")).alias("__tu"),
    ).filter(F.col("__tu").isNotNull())
    b = benchmark.filter(F.col(vec_col).isNotNull()).select(
        F.col(bench_id_col),
        V.normalize(F.col(vec_col).cast("array<double>")).alias("__bu"),
    ).filter(F.col("__bu").isNotNull())
    if broadcast_benchmark:
        b = F.broadcast(b)
    cos = V.dot("__tu", "__bu")
    return (
        t.crossJoin(b)
        .filter(cos >= F.lit(float(threshold)))
        .select(id_col, bench_id_col, cos.alias("cosine"))
    )


def semantic_decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    bench_id_col: str = "bench_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Training rows minus the semantically contaminated ids — broadcast
    anti-join on the (small) flagged-id set, shuffle-free on the corpus."""
    flagged = (
        semantic_contamination_pairs(
            train, benchmark, threshold, id_col, bench_id_col, vec_col
        )
        .select(id_col)
        .distinct()
    )
    return train.join(F.broadcast(flagged), id_col, "left_anti")


def semantic_contamination_pairs_np(
    train: DataFrame,
    benchmark: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    bench_id_col: str = "bench_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Arrow/BLAS production twin of :func:`semantic_contamination_pairs`:
    the eval matrix ships once per executor (broadcast), each Arrow batch
    of the corpus runs ONE numpy matmul against it, and only the
    >= threshold pairs are emitted. Same pair SET as the fold twin by
    construction; cosines differ only in summation order (matmul vs
    sequential fold) — the knn_batch_numpy / embedding_neardup_np
    convention, so oracle checks project to ids and pytest pins 1e-9
    cosine agreement. Memory contract: every executor holds the
    |bench| × dim eval matrix and a (batch_rows × |bench|) score block —
    benchmark-sized by assumption (see the fold twin's docstring)."""
    import numpy as np
    import pandas as pd

    from vector_db_api_spark.functions.ship import ship_model

    rows = benchmark.filter(F.col(vec_col).isNotNull()).select(
        bench_id_col, vec_col
    ).collect()
    bids = [r[bench_id_col] for r in rows]
    bmat = np.asarray([list(map(float, r[vec_col])) for r in rows],
                      dtype=np.float64)
    if len(bids) == 0:
        # derive the id column types from the inputs (same derivation as
        # the non-empty path) so an empty benchmark yields the exact
        # schema the fold twin would — not a hardcoded string frame
        id_type = train.schema[id_col].dataType.simpleString()
        bid_type = benchmark.schema[bench_id_col].dataType.simpleString()
        return train.sparkSession.createDataFrame(
            [], f"{id_col} {id_type}, {bench_id_col} {bid_type}, cosine double")
    bnorm = np.linalg.norm(bmat, axis=1)
    keep = bnorm > 0
    bids = [b for b, k in zip(bids, keep) if k]
    bunit = bmat[keep] / bnorm[keep][:, None]
    shipped = ship_model(train, bunit)
    id_type = train.schema[id_col].dataType.simpleString()
    bid_type = benchmark.schema[bench_id_col].dataType.simpleString()
    out_schema = f"{id_col} {id_type}, {bench_id_col} {bid_type}, cosine double"

    def score(batches):
        bu = shipped.get()
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            norms = np.linalg.norm(mat, axis=1)
            ok = norms > 0
            if not ok.any():
                continue
            unit = mat[ok] / norms[ok][:, None]
            scores = unit @ bu.T
            ti, bi = np.nonzero(scores >= threshold)
            if len(ti) == 0:
                continue
            ids = pdf[id_col].to_numpy()[ok]
            yield pd.DataFrame({
                id_col: ids[ti],
                bench_id_col: [bids[j] for j in bi],
                "cosine": scores[ti, bi],
            })

    return train.filter(F.col(vec_col).isNotNull()).mapInPandas(
        score, schema=out_schema
    )
