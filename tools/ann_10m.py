"""n=10M ANN scale row (r14 verdict #5): push the BENCH_SCALE crossover
sweep one decade past 1M and either confirm the curves or name the next
cliff while it is cheap to fix.

Reuses `bench_scale.ann_sweep` unchanged (same clustered geometry —
~1k members/cluster, spread 0.05, the recall >= 0.9 regime; same
build / single-query / batch-32 / recall / candidate-fraction columns)
at n = 10,000,000, then adds the self-join AUTO-ROUTING measurement the
verdict asks for: `IVFIndex.route_self_join`'s decision record and wall
at 10M (the two O(n) routing passes), plus the implied candidate-pair
count of the routed plan — the quantity that decides whether the full
self-join is a local job or a cluster job.

Run with SPARK_DRIVER_MEMORY=64g (the corpus + bucket + posting caches
are ~15 GB at 10M x 64 dims); prints a BENCH_SCALE.md-ready block and
writes /tmp/ann_10m_section.md.

Usage: SPARK_DRIVER_MEMORY=64g python tools/ann_10m.py [n]
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.join(HERE, "tools"))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    from bench_scale import ann_sweep

    from vector_db_api_spark.operators.ivf import IVFIndex
    from vector_db_api_spark.session import get_spark
    from vector_db_api_spark.sources.synthetic_vectors import clustered_corpus

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    spark = get_spark("ann-10m")
    rows = ann_sweep(spark, [n])
    rec = rows[0]

    # self-join auto-routing at n (decision + wall; the dispatch itself is
    # sized below, not executed — see the printed note)
    corpus = clustered_corpus(
        spark, n, dim=64, n_clusters=max(16, n // 1000), spread=0.05,
        seed=7, num_partitions=max(8, min(64, n // 25_000)),
    ).cache()
    corpus.count()
    ivf = IVFIndex.auto_train(corpus, n_rows=n, seed=42)
    t0 = time.time()
    decision = ivf.route_self_join(corpus, 3, id_col="id")
    rec["route_sec"] = round(time.time() - t0, 3)
    rec["route_plan"] = decision["plan"]
    rec["route_nprobe_sym"] = decision["nprobe_sym"]
    rec["route_sampled_recall"] = decision["sampled_recall"]
    rec["route_candidate_fraction"] = decision["candidate_fraction"]
    # directed candidate pairs the routed plan would re-rank: frac * n^2
    p = decision["nprobe_sym"]
    frac = (decision["candidate_fraction"].get(p)
            if p is not None else None)
    rec["route_pairs"] = int(frac * n * n) if frac is not None else None
    corpus.unpersist()
    print(json.dumps(rec))

    lines = [
        "\n### n=10M row (r15 — VERDICT r14 #5, tools/ann_10m.py, "
        "SPARK_DRIVER_MEMORY=64g)\n",
        "| n | flat_sec | lsh_sec | ivf_sec | lsh_recall | ivf_recall | "
        "lsh_cand_frac | ivf_cand_frac |",
        "|---|---|---|---|---|---|---|---|",
        f"| {n} | {rec['flat_sec']} | {rec['lsh_sec']} | {rec['ivf_sec']} "
        f"| {rec['lsh_recall_at_10']} | {rec['ivf_recall_at_10']} "
        f"| {rec['lsh_candidate_fraction']} | {rec['ivf_candidate_fraction']} |",
        "",
        "| n | flat_batch32_sec | lsh_batch32_sec | ivf_batch32_sec | "
        "lsh_build_sec (H) | ivf_build_sec (K) |",
        "|---|---|---|---|---|---|",
        f"| {n} | {rec['flat_batch32_sec']} | {rec['lsh_batch32_sec']} "
        f"| {rec['ivf_batch32_sec']} | {rec['lsh_build_sec']} "
        f"({rec['lsh_H']}) | {rec['ivf_build_sec']} "
        f"({rec['ivf_centroids']}) |",
        "",
        f"Self-join auto-routing at 10M: decision `{rec['route_plan']}` "
        f"(nprobe_sym={rec['route_nprobe_sym']}) in {rec['route_sec']}s "
        f"(the two O(n) routing passes); sampled recall "
        f"{rec['route_sampled_recall']}, candidate fraction "
        f"{rec['route_candidate_fraction']}; the routed plan re-ranks "
        f"~{rec['route_pairs']:,} directed pairs"
        if rec["route_pairs"] is not None else
        f"Self-join auto-routing at 10M: decision `{rec['route_plan']}` "
        f"in {rec['route_sec']}s.",
    ]
    print("\n".join(lines))
    with open("/tmp/ann_10m_section.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\nwritten: /tmp/ann_10m_section.md")
    spark.stop()


if __name__ == "__main__":
    main()
