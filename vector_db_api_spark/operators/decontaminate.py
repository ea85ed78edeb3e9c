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


def semantic_contamination_pairs_blocked(
    train: DataFrame,
    benchmark: DataFrame,
    threshold: float,
    centroids,
    nprobe: int = 2,
    id_col: str = "doc_id",
    bench_id_col: str = "bench_id",
    vec_col: str = "embedding",
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Cell-blocked production path of :func:`semantic_contamination_pairs`
    for LARGE eval sides (r13 verdict #5): both sides are assigned to their
    top-``nprobe`` centroid cells (``dedup.multiprobe_cells`` — the same
    iterated mask-and-argmax the near-dup multiprobe entries replay in the
    oracle), and a (train, bench) pair is scored only when the two vectors
    share a cell. The exact BroadcastNestedLoopJoin compares every train
    row against ALL |bench| rows; this compares it against the bench rows
    of its probed cells (~nprobe² · |bench| / K in expectation), so the
    per-row cost stops growing with |bench| once |bench|/K exceeds the
    K-dot probe overhead — the measured crossover lives in
    BENCH_SCALE.md (tools/semdecon_crossover.py).

    The price is RECALL < 1: a pair whose two vectors share no top-nprobe
    cell is never scored — a decontamination MISS, i.e. a benchmark leak.
    That risk is a measured number, not a vibe: the suite pins blocked ⊆
    exact and the sweep records recall per |bench| the same way LSH/IVF
    are measured against flat. Keep the exact NLJ while |bench| is
    benchmark-sized (10³–10⁴); switch here only when the sweep's wall
    crossover justifies the measured recall.

    Join shape: the bench side's (cell, unit) rows broadcast
    (``broadcast_benchmark=True``, the default — eval sets fit executor
    memory by assumption), so the corpus is scanned once through a
    BroadcastHashJoin keyed on cell and NEVER shuffles. A pair co-blocked
    in both probed cells scores once (the fold cosine is deterministic,
    so DISTINCT collapses exact duplicates — the
    embedding_neardup_pairs_multiprobe convention)."""
    from vector_db_api_spark.functions import vector as V

    from .dedup import multiprobe_cells

    t = multiprobe_cells(
        train, centroids, nprobe=nprobe, id_col=id_col, vec_col=vec_col
    ).select("cell", F.col(id_col), F.col("__u").alias("__tu"))
    b = multiprobe_cells(
        benchmark, centroids, nprobe=nprobe, id_col=bench_id_col,
        vec_col=vec_col,
    ).select("cell", F.col(bench_id_col), F.col("__u").alias("__bu"))
    if broadcast_benchmark:
        b = F.broadcast(b)
    cos = V.dot("__tu", "__bu")
    return (
        t.join(b, "cell")
        .filter(cos >= F.lit(float(threshold)))
        .select(id_col, bench_id_col, cos.alias("cosine"))
        .distinct()
    )


class PreparedSemanticBench:
    """The STATIC eval side of semantic decontamination — collected,
    zero-filtered, unit-normalized, (optionally) cell-probed, and shipped
    to executors ONCE — for reuse across many kernel calls. ADVICE r14 #4:
    a long-lived stream was re-collecting the benchmark and re-shipping
    the centroid/bench matrices on every micro-batch; build this once
    outside ``foreachBatch`` and pass it to the ``*_np`` kernels'
    ``prepared=``. ``release()`` drops any broadcast blobs (resident
    services; batch jobs can let context teardown reclaim them)."""

    __slots__ = (
        "bids", "shipped_bunit", "shipped_cent", "cell_rows", "np_probe",
        "bid_type", "n_bench",
    )

    def __init__(self, bids, shipped_bunit, shipped_cent, cell_rows,
                 np_probe, bid_type, n_bench):
        self.bids = bids
        self.shipped_bunit = shipped_bunit
        self.shipped_cent = shipped_cent
        self.cell_rows = cell_rows
        self.np_probe = np_probe
        self.bid_type = bid_type
        self.n_bench = n_bench

    def release(self) -> None:
        for shipped in (self.shipped_bunit, self.shipped_cent):
            if shipped is not None:
                shipped.release()


def prepare_semantic_benchmark(
    benchmark: DataFrame,
    centroids=None,
    nprobe: int = 2,
    bench_id_col: str = "bench_id",
    vec_col: str = "embedding",
) -> PreparedSemanticBench:
    """Collect + probe + ship the eval side once. With ``centroids`` the
    bench rows are also assigned their top-``min(nprobe, K)`` cells (the
    blocked kernel's per-cell submatrix map); without, only the unit
    matrix ships (the exact fused-matmul kernel's input). Probe ties break
    by ascending cell index (stable argsort == the fold twin's iterated
    first-max argmax)."""
    import numpy as np

    from vector_db_api_spark.functions.ship import ship_model

    bid_type = benchmark.schema[bench_id_col].dataType.simpleString()
    rows = benchmark.filter(F.col(vec_col).isNotNull()).select(
        bench_id_col, vec_col
    ).collect()
    bids = np.asarray([r[bench_id_col] for r in rows])
    if len(bids):
        bmat = np.asarray([list(map(float, r[vec_col])) for r in rows],
                          dtype=np.float64)
        bnorm = np.linalg.norm(bmat, axis=1)
        keep = bnorm > 0
        bids, bmat = bids[keep], bmat[keep]
    if len(bids) == 0:
        return PreparedSemanticBench(bids, None, None, None, 0, bid_type, 0)
    bunit = bmat / np.linalg.norm(bmat, axis=1)[:, None]
    shipped_bunit = ship_model(benchmark, bunit)
    shipped_cent, cell_rows, np_probe = None, None, 0
    if centroids is not None:
        cent = np.asarray(centroids, dtype=np.float64)
        np_probe = min(nprobe, len(cent))
        bdots = bunit @ cent.T  # argmax is scale-invariant; unit side is fine
        if np_probe < bdots.shape[1]:
            # stable sort == the fold twin's iterated first-max argmax:
            # equal dots probe in ascending cell order, so exact ties
            # (duplicate / quantized embeddings) yield the identical
            # pair SET (ADVICE r14 #3)
            btop = np.argsort(-bdots, axis=1, kind="stable")[:, :np_probe]
        else:
            btop = np.broadcast_to(
                np.arange(bdots.shape[1]), (len(bunit), bdots.shape[1])
            )
        # per-cell row-index map: tiny (≤ |bench|·nprobe ints), rides the
        # closure; the dense matrices ship via ship_model
        cell_rows = {
            int(c): np.nonzero((btop == c).any(axis=1))[0]
            for c in np.unique(btop)
        }
        shipped_cent = ship_model(benchmark, cent)
    return PreparedSemanticBench(
        bids, shipped_bunit, shipped_cent, cell_rows, np_probe, bid_type,
        len(bids),
    )


def semantic_contamination_pairs_blocked_np(
    train: DataFrame,
    benchmark: DataFrame,
    threshold: float,
    centroids,
    nprobe: int = 2,
    id_col: str = "doc_id",
    bench_id_col: str = "bench_id",
    vec_col: str = "embedding",
    prepared: PreparedSemanticBench | None = None,
) -> DataFrame:
    """BLAS twin of :func:`semantic_contamination_pairs_blocked`: the bench
    side is probed ONCE on the driver (eval sets are small by assumption)
    into per-cell unit submatrices, the whole cell map ships via
    ``ship_model``, and each Arrow batch of the corpus probes its own
    top-``nprobe`` cells with one matmul and then matmuls only against the
    bench submatrices of those cells — so per-row work is
    O(K + nprobe²·|bench|/K) instead of the exact twin's O(|bench|),
    with NO corpus shuffle or join at all (probe + score fused in one
    ``mapInPandas`` pass over the scan).

    Pair SET equals the fold blocked twin: probe ties break by ascending
    cell index on BOTH paths (the fold's iterated first-max argmax == the
    stable argsort here), so exact dot ties — duplicate vectors, quantized
    or padded embeddings — probe the same cells (ADVICE r14 #3). Cosines
    are projected away (matmul vs expression-fold ulps are not
    oracle-stable). Returns (id, bench_id) DISTINCT (a pair co-blocked in
    several cells scores once)."""
    import numpy as np
    import pandas as pd

    if prepared is None:
        prepared = prepare_semantic_benchmark(
            benchmark, centroids=centroids, nprobe=nprobe,
            bench_id_col=bench_id_col, vec_col=vec_col,
        )
    elif prepared.cell_rows is None and prepared.n_bench > 0:
        raise ValueError(
            "prepared bench was built without centroids — rebuild with "
            "prepare_semantic_benchmark(benchmark, centroids=...)"
        )
    id_type = train.schema[id_col].dataType.simpleString()
    out_schema = f"{id_col} {id_type}, {bench_id_col} {prepared.bid_type}"
    if prepared.n_bench == 0:
        return train.sparkSession.createDataFrame([], out_schema)
    bids = prepared.bids
    cell_rows = prepared.cell_rows
    np_probe = prepared.np_probe
    shipped_cent = prepared.shipped_cent
    shipped_bunit = prepared.shipped_bunit
    thr = float(threshold)

    def score(batches):
        cent_m = shipped_cent.get()
        bunit_m = shipped_bunit.get()
        cells = {c: (bids[ix], bunit_m[ix]) for c, ix in cell_rows.items()}
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            norms = np.linalg.norm(mat, axis=1)
            ok = norms > 0
            if not ok.any():
                continue
            unit = mat[ok] / norms[ok][:, None]
            ids = pdf[id_col].to_numpy()[ok]
            dots = unit @ cent_m.T
            if np_probe < dots.shape[1]:
                top = np.argsort(-dots, axis=1, kind="stable")[:, :np_probe]
            else:
                top = np.broadcast_to(
                    np.arange(dots.shape[1]), (len(unit), dots.shape[1])
                )
            out_t, out_b = [], []
            for c in np.unique(top):
                hit = cells.get(int(c))
                if hit is None:
                    continue
                ridx = np.nonzero((top == c).any(axis=1))[0]
                cbids, cbunit = hit
                scores = unit[ridx] @ cbunit.T
                ti, bj = np.nonzero(scores >= thr)
                if len(ti):
                    out_t.append(ids[ridx][ti])
                    out_b.append(cbids[bj])
            if out_t:
                yield pd.DataFrame({
                    id_col: np.concatenate(out_t),
                    bench_id_col: np.concatenate(out_b),
                }).drop_duplicates()

    return (
        train.filter(F.col(vec_col).isNotNull())
        .mapInPandas(score, schema=out_schema)
        .distinct()
    )


def semantic_contamination_pairs_np(
    train: DataFrame,
    benchmark: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    bench_id_col: str = "bench_id",
    vec_col: str = "embedding",
    prepared: PreparedSemanticBench | None = None,
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

    if prepared is None:
        prepared = prepare_semantic_benchmark(
            benchmark, bench_id_col=bench_id_col, vec_col=vec_col,
        )
    id_type = train.schema[id_col].dataType.simpleString()
    out_schema = (
        f"{id_col} {id_type}, {bench_id_col} {prepared.bid_type}, "
        f"cosine double"
    )
    if prepared.n_bench == 0:
        # the id column types are derived from the inputs (same derivation
        # as the non-empty path) so an empty benchmark yields the exact
        # schema the fold twin would — not a hardcoded string frame
        return train.sparkSession.createDataFrame([], out_schema)
    bids = prepared.bids
    shipped = prepared.shipped_bunit

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
                bench_id_col: bids[bi],
                "cosine": scores[ti, bi],
            })

    return train.filter(F.col(vec_col).isNotNull()).mapInPandas(
        score, schema=out_schema
    )
