"""Measured recall / candidate-fraction curve for the IVF kNN SELF-join
(r10 verdict #3): `knn_self_join_ivf` recalled 0.245@top3 on the sf0.1
RANDOM corpus (clustered regime 1.0) — a self-join used for dedup at scale
meets semi-random data, so the user needs either a knob that fixes it or a
measured curve proving the regime is inherently scan-bound.

This sweep runs BOTH plans over the same corpora:

- ``asym``  — the existing batch plan (corpus as queries through
  ``search_batch``): each query probes p cells, candidates are vectors
  HOMED in a probed cell;
- ``sym p`` — the symmetric multi-probe self-join (``IVFIndex.self_join``):
  both sides probe p cells, a pair is a candidate when the probe sets
  intersect (superset of asym at equal p).

For each (regime, plan, p): recall@top3 vs the exact kNN self-join, the
candidate fraction (directed non-self candidate pairs / n(n-1) — the share
of the naive n² work actually scored), and wall seconds. Appends a
markdown section to BENCH_SCALE.md with a stated bar.

Usage: python tools/selfjoin_curve.py [sf_dir]   (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from pyspark.sql import functions as F  # noqa: E402

from vector_db_api_spark.operators.ivf import IVFIndex  # noqa: E402
from vector_db_api_spark.operators.knn import knn_batch  # noqa: E402
from vector_db_api_spark.session import get_spark  # noqa: E402
from vector_db_api_spark.sources.synthetic_vectors import (  # noqa: E402
    clustered_corpus,
)
from vector_db_api_spark.sources.tables import load_table  # noqa: E402

TOPK = 3
PROBES = (1, 2, 3, 4, 6, 8)
BAR = (
    "bar: a regime is SERVED by the cell-pruned self-join when some p "
    "reaches recall>=0.8 at candidate_fraction<=0.1; otherwise it is "
    "scan-bound and the exact numpy self-join (knn_self_join_np) is the "
    "honest plan"
)


def _grouped(df, id_col="id", topk=TOPK):
    # keys/values stringified (the symmetric plan's query_id keeps the
    # corpus id type, the batch plans use string query ids); rows re-sorted
    # per query (collect() order is not rank order) and cut to topk
    out = {}
    for r in df.collect():
        out.setdefault(str(r["query_id"]), []).append(
            (-r["score"], str(r[id_col]))
        )
    return {
        q: [i for _, i in sorted(rows)[:topk]] for q, rows in out.items()
    }


def _recall(approx: dict, exact: dict) -> float:
    hit = tot = 0
    for qid, ids in exact.items():
        want = set(ids)
        hit += len(want & set(approx.get(qid, [])))
        tot += len(want)
    return hit / max(tot, 1)


def sweep(spark, corpus, regime: str, id_col: str = "id"):
    n = corpus.count()
    queries = corpus.select(
        F.col(id_col).cast("string").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("query_vec"),
    ).cache()
    queries.count()
    exact = _grouped(
        knn_batch(corpus, queries, TOPK + 1, id_col=id_col).filter(
            F.col("query_id") != F.col(id_col).cast("string")
        ),
        id_col,
    )
    ivf = IVFIndex.auto_train(corpus, n_rows=n, seed=42)
    assignments = ivf.assign(corpus, id_col=id_col).cache()
    assignments.count()
    rows = []
    for p in PROBES:
        if p > len(ivf.centroids):
            break
        # symmetric plan — measure the candidate pairs once (non-self,
        # directed) for the fraction, then the full re-rank for recall
        t0 = time.time()
        sym = _grouped(
            ivf.self_join(corpus, TOPK + 1, id_col=id_col, nprobe_sym=p)
            .filter(
                F.col("query_id").cast("string")
                != F.col(id_col).cast("string")
            ),
            id_col,
        )
        sym_wall = time.time() - t0
        cand = ivf.self_join_pairs(corpus, id_col=id_col, nprobe_sym=p)
        n_cand = cand.filter(
            F.col("query_id") != F.col(id_col)
        ).count()
        # asymmetric plan at the same p
        t0 = time.time()
        asym = _grouped(
            ivf.search_batch(
                corpus, assignments, queries, TOPK + 1, id_col=id_col,
                nprobe=p,
            ).filter(F.col("query_id") != F.col(id_col).cast("string")),
            id_col,
        )
        asym_wall = time.time() - t0
        probes = ivf.assign_queries(queries, nprobe=p)
        n_acand = (
            probes.join(assignments, "centroid_id")
            .filter(F.col("query_id") != F.col(id_col).cast("string"))
            .select("query_id", id_col).distinct().count()
        )
        denom = n * (n - 1)
        rows.append({
            "regime": regime, "p": p,
            "sym_recall": round(_recall(sym, exact), 3),
            "sym_cf": round(n_cand / denom, 4),
            "sym_sec": round(sym_wall, 2),
            "asym_recall": round(_recall(asym, exact), 3),
            "asym_cf": round(n_acand / denom, 4),
            "asym_sec": round(asym_wall, 2),
        })
        print(rows[-1], flush=True)
    return n, len(ivf.centroids), ivf.nprobe, rows


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("selfjoin-curve")
    sections = []
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("id"), "embedding"
    ).cache()
    n, k, np_, rows = sweep(spark, emb, f"random ({sf_dir})")
    sections.append((f"random ({sf_dir}, n={n}, centroids={k})", rows))
    cdf = clustered_corpus(spark, n, dim=64, n_clusters=64, spread=0.05).cache()
    cn, ck, _, crows = sweep(spark, cdf, "clustered")
    sections.append((f"clustered (n={cn}, centroids={ck})", crows))

    lines = [
        "\n## IVF self-join: symmetric multi-probe recall/candidate-fraction "
        "curve (r11, tools/selfjoin_curve.py)\n",
        "`sym` = both sides probe p cells, pair candidates on probe-set "
        "intersection (`IVFIndex.self_join`); `asym` = the previous batch "
        "plan (corpus queries probe p cells against single-home postings). "
        f"recall@top{TOPK} vs the exact self-join; candidate fraction = "
        "directed non-self candidate pairs / n(n-1).\n",
        f"**{BAR}**\n",
    ]
    for title, rows in sections:
        lines.append(f"### {title}\n")
        lines.append("| p | sym recall | sym cand.frac | sym sec "
                     "| asym recall | asym cand.frac | asym sec |")
        lines.append("|---|---|---|---|---|---|---|")
        for r in rows:
            lines.append(
                f"| {r['p']} | {r['sym_recall']} | {r['sym_cf']} "
                f"| {r['sym_sec']} | {r['asym_recall']} | {r['asym_cf']} "
                f"| {r['asym_sec']} |"
            )
        served = [r for r in rows
                  if r["sym_recall"] >= 0.8 and r["sym_cf"] <= 0.1]
        lines.append(
            "\n" + (
                f"Served: smallest passing p = {served[0]['p']} "
                f"(recall {served[0]['sym_recall']} at candidate fraction "
                f"{served[0]['sym_cf']})."
                if served else
                "SCAN-BOUND under the bar: no p reaches recall 0.8 within "
                "candidate fraction 0.1 — use the exact numpy self-join in "
                "this regime."
            ) + "\n"
        )
    with open(os.path.join(HERE, "BENCH_SCALE.md"), "a") as f:
        f.write("\n".join(lines))
    print("appended to BENCH_SCALE.md")
    spark.stop()


if __name__ == "__main__":
    main()
