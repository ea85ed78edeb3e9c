"""Product quantization — the memory-compression half of a 100 TB ANN stack.

The reference's indexes (flat/LSH/IVF — indexing/registry.py:14-56) prune
WHICH vectors a query scores; PQ shrinks WHAT a scan reads. A 64-dim
float32 embedding is 256 bytes; its PQ code (m=8 subspaces, one codeword
id each) is 16 bytes as stored here (``array<smallint>`` — Spark's
signed ``tinyint`` can't hold k=256 ids; nibble/byte packing would reach
the classic 8 B/32×). 16× means 100 TB of embeddings ADC-scan as ~6 TB of
codes — the difference between a scan that fits the page cache and one
that doesn't. This is the FAISS IVF-PQ shape re-expressed on DataFrames:

- ``train``: driver-side k-means per subspace over a reservoir sample
  (bounded like IVFIndex.train — one distributed pass, no full-corpus
  iteration);
- ``encode``: one Arrow ``mapInPandas`` pass, a (batch × k) distance matmul
  per subspace → ``array<smallint>`` codes column;
- ``search``: asymmetric distance computation (ADC) — per query, an (m × k)
  lookup table of query-subvector · codeword dot products; a code's
  approximate score is the sum of m table entries (numpy gather inside
  ``mapInPandas``, reading ONLY the codes column); top ``rerank`` ADC
  candidates are re-scored exactly against the corpus through the shared
  ``knn.rerank_pairs`` tail, so reported scores are true cosines.

Composes with IVF for the full IVF-PQ plan: restrict the codes scan to the
probed cells (``ivf.assign``'s ``centroid_id`` partitioning) and ADC only
those partitions.

Exactness contract (tests/test_pq.py): encode/ADC bit-match a driver-side
numpy replay; recall@10 ≥ 0.9 on clustered corpora with rerank=4k.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _unit(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    return mat / norms


def _encode_codes(mat: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, m) codes: per subspace, argmin L2 to that subspace's codewords.
    Module-level so executor kernels can run it on a broadcast-fetched
    codebook tensor without closing over the model object."""
    m, _, dsub = books.shape
    mat = _unit(np.asarray(mat, dtype=np.float64))
    out = np.empty((mat.shape[0], m), dtype=np.int64)
    for j in range(m):
        sub = mat[:, j * dsub : (j + 1) * dsub]
        cb = books[j]
        d2 = (
            (sub * sub).sum(axis=1, keepdims=True)
            - 2.0 * sub @ cb.T
            + (cb * cb).sum(axis=1)
        )
        out[:, j] = d2.argmin(axis=1)
    return out


def _kmeans_l2(sample: np.ndarray, k: int, seed: int, iters: int) -> np.ndarray:
    """Plain seeded Lloyd's in a subspace (L2 — subvectors are not unit).
    Deterministic: seeded init by sampling distinct rows, empty clusters
    reseeded from the farthest points."""
    rng = np.random.default_rng(seed)
    n = sample.shape[0]
    k = min(k, n)
    cent = sample[rng.choice(n, size=k, replace=False)].copy()
    for _ in range(iters):
        # (n, k) squared distances via the expansion trick
        d2 = (
            (sample * sample).sum(axis=1, keepdims=True)
            - 2.0 * sample @ cent.T
            + (cent * cent).sum(axis=1)
        )
        assign = d2.argmin(axis=1)
        for j in range(k):
            members = sample[assign == j]
            if len(members):
                cent[j] = members.mean(axis=0)
            else:
                cent[j] = sample[d2.min(axis=1).argmax()]
    return cent


class PQIndex:
    """Codebooks: (m, k, dsub) float64; vectors are unit-normalized before
    splitting so ADC approximates cosine as a sum of subspace dots."""

    def __init__(self, codebooks: np.ndarray) -> None:
        self.codebooks = np.asarray(codebooks, dtype=np.float64)
        self.m, self.k, self.dsub = self.codebooks.shape
        self.dim = self.m * self.dsub

    @classmethod
    def train(
        cls,
        corpus: DataFrame,
        m: int = 8,
        k: int = 256,
        vec_col: str = "embedding",
        seed: int = 42,
        iters: int = 10,
        train_sample_rows: int = 65_536,
    ) -> "PQIndex":
        from vector_db_api_spark.operators.ivf import IVFIndex

        sample = IVFIndex._sample_vectors(corpus, vec_col, train_sample_rows, seed)
        dim = sample.shape[1]
        if dim % m:
            raise ValueError(f"dim {dim} not divisible by m={m}")
        sample = _unit(sample)
        dsub = dim // m
        books = np.stack(
            [
                _kmeans_l2(
                    sample[:, j * dsub : (j + 1) * dsub], k, seed + j, iters
                )
                for j in range(m)
            ]
        )
        return cls(books)

    # -- persistence ------------------------------------------------------

    def to_frame(self, spark) -> DataFrame:
        """(subspace int, codeword int, vec array<double>) — the codebook
        tensor flattened into a tiny DataFrame so a TRAINED quantizer
        outlives the session beside its codes table (k·m rows; the codes
        are meaningless without exactly these codebooks)."""
        rows = [
            (j, c, [float(x) for x in self.codebooks[j, c]])
            for j in range(self.m)
            for c in range(self.k)
        ]
        return spark.createDataFrame(
            rows, "subspace int, codeword int, vec array<double>"
        )

    @classmethod
    def from_frame(cls, frame: DataFrame) -> "PQIndex":
        """Rehydrate from :meth:`to_frame`'s layout (model-sized collect;
        (subspace, codeword) fixes positions so stored codes keep decoding
        to the same centroids)."""
        rows = frame.collect()
        m = 1 + max(r["subspace"] for r in rows)
        k = 1 + max(r["codeword"] for r in rows)
        if len(rows) != m * k:
            raise ValueError(
                f"codebook frame has {len(rows)} rows; expected m*k = {m * k}"
            )
        dsub = len(rows[0]["vec"])
        books = np.empty((m, k, dsub), dtype=np.float64)
        # a duplicated (subspace, codeword) pair + a missing one passes the
        # row-count check but would leave np.empty garbage in the gap,
        # silently corrupting decode/ADC — track fills and refuse (ADVICE r5)
        seen: set[tuple[int, int]] = set()
        for r in rows:
            pos = (r["subspace"], r["codeword"])
            if pos[0] < 0 or pos[1] < 0:  # would wrap under numpy indexing
                raise ValueError(f"negative codebook position {pos}")
            if pos in seen:
                raise ValueError(f"duplicate codebook entry {pos}")
            seen.add(pos)
            books[pos] = r["vec"]
        return cls(books)

    # -- encode ----------------------------------------------------------

    def _encode_np(self, mat: np.ndarray) -> np.ndarray:
        """(n, m) codes (driver-side; executor kernels call
        :func:`_encode_codes` on a shipped codebook matrix)."""
        return _encode_codes(mat, self.codebooks)

    def encode(
        self, corpus: DataFrame, id_col: str = "id", vec_col: str = "embedding"
    ) -> DataFrame:
        """(id, codes array<smallint>) — the 32×-smaller scan target. Null
        embeddings drop (parity with the null-embedding projection)."""
        from vector_db_api_spark.functions.ship import ship_model

        # ship only the codebook tensor (broadcast when large: m=64, k=2^12
        # style books are real at corpus scale), never self through the task
        shipped = ship_model(corpus, self.codebooks)
        id_type = corpus.schema[id_col].dataType.simpleString()
        schema = f"{id_col} {id_type}, codes array<smallint>"

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            books = shipped.get()
            for pdf in batches:
                if pdf.empty:
                    continue
                keep = pdf[vec_col].notna()
                sub = pdf[keep]
                if sub.empty:
                    continue
                mat = np.asarray([np.asarray(v) for v in sub[vec_col]])
                codes = _encode_codes(mat, books).astype(np.int16)
                yield pd.DataFrame(
                    {id_col: sub[id_col], "codes": list(codes)}
                )

        return corpus.select(id_col, vec_col).filter(
            F.col(vec_col).isNotNull()
        ).mapInPandas(run, schema=schema)

    # -- search ----------------------------------------------------------

    def _lut(self, qvec: list[float]) -> np.ndarray:
        """(m, k) dot-product lookup table of the unit query against every
        codeword — ADC score of a code is lut[j, code[j]] summed over j."""
        q = np.asarray(qvec, dtype=np.float64)
        nrm = np.linalg.norm(q)
        if nrm == 0.0:
            raise ValueError("zero query vector")
        q = q / nrm
        return np.stack(
            [
                self.codebooks[j] @ q[j * self.dsub : (j + 1) * self.dsub]
                for j in range(self.m)
            ]
        )

    def adc_scores(self, codes: DataFrame, qvec: list[float], id_col: str = "id") -> DataFrame:
        """(id, adc_score) over the codes table — the compressed scan."""
        from vector_db_api_spark.functions.ship import ship_model

        shipped = ship_model(codes, self._lut(qvec))
        id_type = codes.schema[id_col].dataType.simpleString()
        schema = f"{id_col} {id_type}, adc_score double"

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            lut = shipped.get()
            for pdf in batches:
                if pdf.empty:
                    continue
                mat = np.asarray([np.asarray(c) for c in pdf["codes"]], dtype=np.int64)
                scores = lut[np.arange(lut.shape[0]), mat].sum(axis=1)
                yield pd.DataFrame({id_col: pdf[id_col], "adc_score": scores})

        return codes.mapInPandas(run, schema=schema)

    def search(
        self,
        corpus: DataFrame,
        codes: DataFrame,
        qvec: list[float],
        n: int,
        rerank: int | None = None,
        id_col: str = "id",
        vec_col: str = "embedding",
        metric: str = "cosine",
        cache_scores: bool = True,
        broadcast_tie_rows: int = 100_000,
    ) -> DataFrame:
        """ADC top-``rerank`` candidates (default 4n) from the codes scan
        — WITH ties at the boundary — then exact re-rank against the full
        vectors; reported scores are true similarities, PQ error only
        affects WHICH candidates surface (the recall test bounds that).

        Ties-at-boundary (r11, found by the sf1 bench): quantization maps
        near-identical vectors to IDENTICAL codes, so inside a tight
        cluster every member shares one ADC score and a hard
        ``LIMIT rerank`` would keep an arbitrary id-ordered subset —
        recall_clustered collapsed 1.0 → 0.25 between n=2k and n=20k as
        cluster size outgrew the fixed pool. Keeping the full tie class at
        the cutoff (every row scoring >= the rerank-th ADC score) restores
        recall at the cost of exactly the rows the quantizer cannot
        distinguish anyway.

        NOT a pure lazy plan builder: the cutoff is a distributed
        TakeOrdered probe that collects ONE scalar at call time, and the
        tie filter re-reads the same scores. ``cache_scores`` (default on,
        r11 advice) localCheckpoints the (id, adc_score) frame once so the
        codes scan + ADC gather run once per call instead of per pass —
        the blocks are executor-resident (MEMORY_AND_DISK, freed by the
        ContextCleaner when the plan is dropped); pass ``False`` to trade
        repeated codes scans for zero block residency.

        Degenerate-tie guard (r11 verdict #3): the tie class is expected
        ~``rerank`` rows, but an all-identical-codes corpus makes the
        candidate set CORPUS-sized (re-ranking everything is then the
        correct answer, not a pruning bug) — and a forced broadcast of a
        corpus-sized frame is a driver-OOM cliff (the r10 ngram
        precedent, dedup.py). The candidate count is known for free off
        the checkpointed scores, so the broadcast hint applies only under
        ``broadcast_tie_rows``; above it (or when ``cache_scores=False``
        skips the count) the semi-join goes unhinted and AQE picks the
        strategy that fits the actual size."""
        from vector_db_api_spark.operators.knn import knn

        rerank = max(n, rerank if rerank is not None else 4 * n)
        scored = self.adc_scores(codes, qvec, id_col=id_col)
        if cache_scores:
            scored = scored.localCheckpoint(eager=True)
        # distributed TakeOrdered of one scalar: the rerank-th ADC score
        row = (
            scored.orderBy(F.col("adc_score").desc(), F.col(id_col).asc())
            .limit(rerank)
            .agg(F.min("adc_score"))
            .collect()
        )
        cutoff = row[0][0]
        if cutoff is None:
            return knn(corpus.limit(0), qvec, n, metric=metric,
                       id_col=id_col, vec_col=vec_col)
        cand = scored.filter(F.col("adc_score") >= cutoff).select(id_col)
        if cache_scores and cand.count() <= broadcast_tie_rows:
            cand = F.broadcast(cand)
        pruned = corpus.join(cand, id_col, "left_semi")
        return knn(pruned, qvec, n, metric=metric, id_col=id_col, vec_col=vec_col)

    def search_batch(
        self,
        corpus: DataFrame,
        codes: DataFrame,
        queries: DataFrame,
        k: int,
        rerank: int | None = None,
        id_col: str = "id",
        vec_col: str = "embedding",
        query_id_col: str = "query_id",
        query_vec_col: str = "query_vec",
        metric: str = "cosine",
        max_queries: int = 4096,
    ) -> DataFrame:
        """Batch ADC search: ONE pass over the codes table answers every
        query in ``queries``.

        Plan: the query batch collects to the driver (bounded —
        ``max_queries`` guards the contract; the reference's batch search
        is equally a bounded request) and becomes a (Q, m, k) LUT tensor
        shipped once; each Arrow code batch emits only its PER-QUERY
        TOP-``rerank`` rows (map-side partial top-k under the same
        (score desc, id asc) total order as the global step, so the
        composition is exactly the global ADC top-``rerank``); a
        per-query window top-k narrows to candidates and
        :func:`rerank_pairs` re-ranks them exactly. The full Q × N score
        matrix never leaves the tasks — per batch the output is
        ≤ Q × rerank rows. Zero-vector and NULL queries return no rows
        (same contract as :meth:`IVFIndex.assign_queries`)."""
        from vector_db_api_spark.functions.ship import ship_model
        from vector_db_api_spark.operators.knn import rerank_pairs

        qrows = queries.select(query_id_col, query_vec_col).take(max_queries + 1)
        if len(qrows) > max_queries:
            raise ValueError(
                f"search_batch is a bounded-batch API: got more than "
                f"{max_queries} queries; split the batch or raise max_queries"
            )
        kept = []
        for r in qrows:
            if r[query_vec_col] is None:
                # NULL query vectors carry no direction to score against —
                # same contract as zero-vector queries: no rows (r9 advice;
                # previously an opaque driver-side TypeError)
                continue
            v = [float(x) for x in r[query_vec_col]]
            if any(x != 0.0 for x in v):
                kept.append((r[query_id_col], v))
        qid_type = queries.schema[query_id_col].dataType.simpleString()
        out_schema = (
            f"{query_id_col} {qid_type}, "
            f"{id_col} {codes.schema[id_col].dataType.simpleString()}, "
            f"adc_score double"
        )
        if not kept:
            return corpus.sparkSession.createDataFrame(
                [], f"{query_id_col} {qid_type}, "
                    f"{id_col} {codes.schema[id_col].dataType.simpleString()}, "
                    f"score double"
            )
        rerank = max(k, rerank if rerank is not None else 4 * k)
        luts = np.stack([self._lut(v) for _, v in kept])  # (Q, m, k)
        qids = [q for q, _ in kept]
        shipped = ship_model(codes, luts)
        m = self.m

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            tensor = shipped.get()
            rows = np.arange(m)
            for pdf in batches:
                if pdf.empty:
                    continue
                mat = np.asarray(
                    [np.asarray(c) for c in pdf["codes"]], dtype=np.int64
                )
                ids = pdf[id_col].to_numpy()
                out = []
                for qi in range(tensor.shape[0]):
                    s = tensor[qi][rows, mat].sum(axis=1)
                    # partial top-k WITH batch-boundary ties: identical
                    # codes score identically, so a hard [:rerank] cut
                    # could drop a tied row the global cutoff keeps —
                    # emitting every row scoring >= the batch's rerank-th
                    # score preserves the superset property (r11
                    # ties-at-boundary fix, see search())
                    if len(s) > rerank:
                        cut = np.partition(-s, rerank - 1)[rerank - 1]
                        keep = np.flatnonzero(-s <= cut)
                    else:
                        keep = np.arange(len(s))
                    out.append(pd.DataFrame({
                        query_id_col: qids[qi],
                        id_col: ids[keep],
                        "adc_score": s[keep],
                    }))
                yield pd.concat(out)

        partial = codes.mapInPandas(run, schema=out_schema)
        # global top-rerank WITH ties: rank() (not row_number) keeps the
        # whole tie class at the cutoff — matches search()'s score-cutoff
        # semantics and the oracle's rank()-based replay
        w = Window.partitionBy(query_id_col).orderBy(F.desc("adc_score"))
        cand = (
            partial.withColumn("__rk", F.rank().over(w))
            .filter(F.col("__rk") <= rerank)
            .select(query_id_col, id_col)
        )
        # zero-vector queries have no candidate pairs, so they vanish at
        # the rerank join without an explicit filter
        return rerank_pairs(
            corpus, queries, cand, k, metric=metric, id_col=id_col,
            vec_col=vec_col, query_id_col=query_id_col,
            query_vec_col=query_vec_col,
        )

    # -- IVF-PQ composition ----------------------------------------------

    def encode_with_cells(
        self,
        corpus: DataFrame,
        assignments: DataFrame,
        id_col: str = "id",
        vec_col: str = "embedding",
    ) -> DataFrame:
        """(id, centroid_id, codes) — the IVF-PQ storage layout. Persist it
        ``partitionBy("centroid_id")`` (exactly like ``lifecycle.rebuild``
        persists ivf_assignments) and :meth:`search_cells`'s centroid filter
        becomes partition PRUNING: a query touches nprobe directories of
        16-byte codes, never the corpus."""
        codes = self.encode(corpus, id_col=id_col, vec_col=vec_col)
        return codes.join(
            assignments.select(id_col, "centroid_id"), id_col, "inner"
        )

    def search_cells(
        self,
        corpus: DataFrame,
        cell_codes: DataFrame,
        ivf,
        qvec: list[float],
        n: int,
        rerank: int | None = None,
        nprobe: int | None = None,
        id_col: str = "id",
        vec_col: str = "embedding",
        metric: str = "cosine",
    ) -> DataFrame:
        """Full IVF-PQ search: probe nprobe cells (centroid dots on the
        driver, same as ``IVFIndex.search``) → ADC over ONLY the probed
        cells' codes (a partition-prunable filter, no join) → exact re-rank
        of the ADC top-``rerank``. The two prunings multiply: cells cut
        rows to nprobe/k_cells of the corpus, PQ cuts bytes/row 16× —
        that product is the FAISS IVF-PQ economics on DataFrames."""
        probed = [int(c) for c in ivf.probe_centroids(qvec, nprobe=nprobe)]
        pruned_codes = cell_codes.filter(F.col("centroid_id").isin(probed))
        return self.search(
            corpus,
            pruned_codes.select(id_col, "codes"),
            qvec,
            n,
            rerank=rerank,
            id_col=id_col,
            vec_col=vec_col,
            metric=metric,
        )
