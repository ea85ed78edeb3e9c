"""Benchmark harness: runs the engine's headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "suite_wall_sec", "value": N, "unit": "sec",
     "queries": {name: sec, ...}, "sf": 0.1}

Execution is forced with the ``noop`` sink so every column is actually
computed (a bare ``count()`` would let Catalyst prune the scored columns).

Measurement protocol: one COLD pass over the whole suite (pays plan/codegen
compilation, reported in aggregate as ``cold_first_run_sec``), then two
timed passes; each query reports the MIN of its two warm runs. Full passes
rather than back-to-back repeats so a transient load/GC spike can't hit
both measurements of the same query; min rather than mean because pauses
are harness noise, not query cost. The warm number is the steady state a
resident engine delivers — the apples-to-apples comparison against the
reference's resident in-memory service.

Index-backed searches (lsh/ivf) time the SEARCH path; their build cost is
reported separately as ``lsh_build``/``ivf_build`` — at deployment scale
builds are periodic batch jobs, searches are the hot path. The ANN query
vector is drawn FROM the corpus (find-similar-to-this-item), so
``recall_at_10`` is measured where recall is meaningful — a random
Gaussian query has no true neighbors in the data.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from vector_db_api_spark import suite
from vector_db_api_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

HEADLINE = [
    # search paths
    "knn_cosine_top10",
    "knn_batch_top5",
    "knn_batch_numpy_top5",
    "search_e2e",
    # dedup / text pipeline
    "minhash_signatures",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "simhash",
    "exact_duplicates",
    "embedding_neardup",
    "embedding_neardup_np",
    "doc_quality",
    "doc_winnowing",
    "emb_quantize_int8",
    "corpus_clean",
    # relational / events
    "events_hourly",
    "rel_top_customers",
    "rel_pricing_summary",
    "rel_revenue_by_nation",
    "rel_ship_priority",
    "rel_customer_running_total",
    # skew + streaming-dedup batch paths
    "skew_salted_join",
    "events_first_seen",
    "events_sessions",
    "events_type_stats",
    "knn_quantized_top10",
    # mutations
    "crud_upsert",
]


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = get_spark("bench")
    qs = suite.queries()

    # warm the JVM/codegen once on a trivial job so query 1 isn't charged
    # for session startup
    spark.range(1000).selectExpr("sum(id)").collect()

    # -- build the full thunk list (headline + ANN search paths) ----------
    from vector_db_api_spark.operators.ivf import IVFIndex
    from vector_db_api_spark.operators.knn import knn
    from vector_db_api_spark.operators.lsh import SignLSH, build_bucket_table
    from vector_db_api_spark.sources.tables import load_table

    emb = load_table(spark, SF_DIR, "embeddings").cache()
    emb.count()
    # corpus-drawn ANN query: "find items similar to this one"
    qrows = emb.limit(32).collect()
    qv = [float(x) for x in qrows[0]["embedding"]]
    qdf = spark.createDataFrame(
        [(f"q{r['vec_id']}", [float(x) for x in r["embedding"]]) for r in qrows],
        "query_id string, query_vec array<double>",
    ).cache()
    qdf.count()

    build: dict[str, float] = {}

    t0 = time.time()
    model = SignLSH(dim=64, num_tables=8, hyperplanes_per_table=8, seed=42)
    buckets = build_bucket_table(model, emb, id_col="vec_id").cache()
    buckets.count()
    build["lsh_build"] = round(time.time() - t0, 3)

    t0 = time.time()
    ivf = IVFIndex.train(emb, num_centroids=32, nprobe=4, seed=42)
    assignments = ivf.assign(emb, id_col="vec_id").cache()
    assignments.count()
    build["ivf_build"] = round(time.time() - t0, 3)

    thunks = {
        name: (lambda n=name: _force(qs[n](spark, SF_DIR))) for name in HEADLINE
    }
    thunks["lsh_search"] = lambda: _force(
        model.search(emb, buckets, qv, 10, id_col="vec_id", pad_to_k=False)
    )
    thunks["lsh_search_mp1"] = lambda: _force(
        model.search(emb, buckets, qv, 10, id_col="vec_id", pad_to_k=False,
                     multiprobe=1)
    )
    thunks["ivf_search"] = lambda: _force(
        ivf.search(emb, assignments, qv, 10, id_col="vec_id")
    )
    thunks["ivf_search_np8"] = lambda: _force(
        ivf.search(emb, assignments, qv, 10, id_col="vec_id", nprobe=8)
    )
    # 32-query batches through the index paths: ONE job per batch (the
    # per-query driver loop would launch 32)
    thunks["lsh_search_batch32"] = lambda: _force(
        model.search_batch(emb, buckets, qdf, 10, id_col="vec_id", multiprobe=1)
    )
    thunks["ivf_search_batch32"] = lambda: _force(
        ivf.search_batch(emb, assignments, qdf, 10, id_col="vec_id")
    )
    # full exact kNN self-join (every vector × every vector, top-3) via the
    # Arrow/numpy matmul path — the throughput variant of the oracle-exact
    # knn_self_join_top3 correctness query (fold path: exact but ~15× the
    # flops-per-second cost; correctness runs it at sf0.01)
    from vector_db_api_spark.operators.knn import knn_batch_numpy

    all_queries = [
        (str(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.collect()
    ]
    thunks["knn_self_join_np"] = lambda: _force(
        knn_batch_numpy(emb, all_queries, 4, id_col="vec_id")
    )

    # -- cold pass + two timed passes -------------------------------------
    cold: dict[str, float] = {}
    for name, thunk in thunks.items():
        t0 = time.time()
        thunk()
        cold[name] = round(time.time() - t0, 3)

    timings: dict[str, float] = dict(build)
    best: dict[str, float] = {}
    for _ in range(2):
        for name, thunk in thunks.items():
            t0 = time.time()
            thunk()
            dt = time.time() - t0
            if name not in best or dt < best[name]:
                best[name] = dt
    for name, dt in best.items():
        timings[name] = round(dt, 3)

    # recall@10 of the ANN paths vs the exact scan — the bar is speedup AT
    # BOUNDED RECALL, so the bench reports both sides of the tradeoff
    # NOTE: the synthetic embeddings are isotropic (nearest-neighbor cosine
    # ≈ 0.35, no cluster structure), the hardest possible regime for ANN —
    # sub-linear search at recall ~1.0 is information-theoretically
    # unavailable there. Selectivity (fraction of the corpus scanned) is
    # reported so the recall number can be read against its cost; the
    # pytest recall suite pins ≥0.9 on clustered data where ANN applies.
    n_corpus = emb.count()
    exact_ids = {r["vec_id"] for r in knn(emb, qv, 10, id_col="vec_id").collect()}

    def ann_recall(ids):
        return round(len(ids & exact_ids) / len(exact_ids), 3)

    lsh_ids = {r["vec_id"] for r in model.search(
        emb, buckets, qv, 10, id_col="vec_id", pad_to_k=False).collect()}
    lsh_mp1_ids = {r["vec_id"] for r in model.search(
        emb, buckets, qv, 10, id_col="vec_id", pad_to_k=False,
        multiprobe=1).collect()}
    ivf_ids = {r["vec_id"] for r in ivf.search(
        emb, assignments, qv, 10, id_col="vec_id").collect()}
    ivf_np8_ids = {r["vec_id"] for r in ivf.search(
        emb, assignments, qv, 10, id_col="vec_id", nprobe=8).collect()}
    recall = {
        "lsh_search": ann_recall(lsh_ids),
        "lsh_search_mp1": ann_recall(lsh_mp1_ids),
        "ivf_search": ann_recall(ivf_ids),
        "ivf_search_np8": ann_recall(ivf_np8_ids),
    }
    selectivity = {
        "lsh_search": round(
            model.candidates(buckets, qv, id_col="vec_id").count() / n_corpus, 3),
        "lsh_search_mp1": round(
            model.candidates(buckets, qv, id_col="vec_id", multiprobe=1).count()
            / n_corpus, 3),
        "ivf_search": round(
            assignments.filter(
                F.col("centroid_id").isin(ivf.probe_centroids(qv))
            ).count() / n_corpus, 3),
        "ivf_search_np8": round(
            assignments.filter(
                F.col("centroid_id").isin(ivf.probe_centroids(qv, nprobe=8))
            ).count() / n_corpus, 3),
    }

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "suite_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "recall_at_10": recall,
        "candidate_fraction": selectivity,
        "cold_first_run_sec": round(sum(cold.values()), 3),
        "sf": sf_val,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
