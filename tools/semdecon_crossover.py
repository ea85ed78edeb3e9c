"""Semantic-decontamination NLJ/blocked crossover sweep (r13 verdict #5).

The exact path (``semantic_contamination_pairs`` / ``_np``) scores every
train row against ALL |bench| rows — the right plan while eval sets are
benchmark-sized (10³–10⁴). The blocked path
(``semantic_contamination_pairs_blocked`` / ``_np``) probes both sides to
top-nprobe centroid cells and scores only cell-sharing pairs, trading
recall for per-row work that stops growing with |bench|. This harness
makes that tradeoff a TABLE: for each eval-side size B it measures

- ``exact_fold_sec``: the expression NLJ (the oracle-twin plan) — only at
  B ≤ FOLD_CAP, where it is still sane to run;
- ``exact_np_sec``: one Arrow matmul per corpus batch vs the full eval
  matrix (the exact production plan);
- ``blocked_np_sec``: probe + per-cell matmul fused in one mapInPandas
  pass (K=256 cells, nprobe=4);
- ``recall``: |blocked pairs| / |exact pairs| — blocked candidates are a
  subset of exact candidates under the same threshold, so the count ratio
  IS the recall (no pair collection needed).

Corpus: N_TRAIN 64-dim vectors in C seeded Gaussian clusters (members =
center + 0.05·noise, unit-normalized scoring); the eval side samples B
vectors around the SAME centers, so true near-threshold pairs exist at
every B. Deterministic (seed 101).

Usage: ``python tools/semdecon_crossover.py [B ...]`` (defaults
256 1024 4096 16384). Prints one markdown row per B; paste into
BENCH_SCALE.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from vector_db_api_spark.operators.decontaminate import (
    semantic_contamination_pairs,
    semantic_contamination_pairs_blocked_np,
    semantic_contamination_pairs_np,
)
from vector_db_api_spark.session import get_spark

N_TRAIN = 50_000
DIM = 64
CLUSTERS = 500
THRESHOLD = 0.8
K_CELLS = 256
NPROBE = 4
FOLD_CAP = 1024  # largest B the expression NLJ is still run at
SEED = 101


def build(spark, b: int):
    rng = np.random.default_rng(SEED)
    centers = rng.standard_normal((CLUSTERS, DIM)) * 4.0
    t_noise = rng.standard_normal((N_TRAIN, DIM)) * 0.05
    tmat = centers[np.arange(N_TRAIN) % CLUSTERS] + t_noise
    b_noise = rng.standard_normal((b, DIM)) * 0.05
    bmat = centers[np.arange(b) % CLUSTERS] + b_noise
    cent = rng.standard_normal((K_CELLS, DIM))
    cent /= np.linalg.norm(cent, axis=1, keepdims=True)
    train = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(tmat)],
        "doc_id bigint, embedding array<double>",
    ).repartition(32).cache()
    bench = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(bmat)],
        "bench_id bigint, embedding array<double>",
    ).cache()
    train.count(), bench.count()
    return train, bench, cent


def main() -> None:
    sizes = [int(s) for s in sys.argv[1:]] or [256, 1024, 4096, 16384]
    spark = get_spark("semdecon_crossover")
    spark.range(1000).selectExpr("sum(id)").collect()  # JVM warm
    print(
        "| bench_rows | exact_fold_sec | exact_np_sec | blocked_np_sec "
        "| exact_pairs | recall |"
    )
    print("|---|---|---|---|---|---|")
    for b in sizes:
        train, bench, cent = build(spark, b)
        if b <= FOLD_CAP:
            t0 = time.time()
            semantic_contamination_pairs(train, bench, THRESHOLD).count()
            fold_s = f"{time.time() - t0:.2f}"
        else:
            fold_s = "—"
        t0 = time.time()
        n_exact = semantic_contamination_pairs_np(
            train, bench, THRESHOLD
        ).count()
        np_s = time.time() - t0
        t0 = time.time()
        n_blocked = semantic_contamination_pairs_blocked_np(
            train, bench, THRESHOLD, cent, nprobe=NPROBE
        ).count()
        blk_s = time.time() - t0
        print(
            f"| {b:,} | {fold_s} | {np_s:.2f} | {blk_s:.2f} "
            f"| {n_exact:,} | {n_blocked / max(1, n_exact):.3f} |",
            flush=True,
        )
        train.unpersist()
        bench.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
