"""Benchmark harness: runs the engine's headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "suite_wall_sec", "value": N, "unit": "sec",
     "queries": {name: sec, ...}, "sf": 0.1}

Execution is forced with the ``noop`` sink so every column is actually
computed (a bare ``count()`` would let Catalyst prune the scored columns).
Index-backed searches (lsh/ivf) time the SEARCH path; their build cost is
reported separately as ``lsh_build``/``ivf_build`` — at deployment scale
builds are periodic batch jobs, searches are the hot path.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

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
    "doc_quality",
    # relational / events
    "events_hourly",
    "rel_top_customers",
    "rel_pricing_summary",
    # mutations
    "crud_upsert",
]


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = get_spark("bench")
    qs = suite.queries()
    timings: dict[str, float] = {}
    cold: dict[str, float] = {}

    # warm the JVM/codegen once on a trivial job so query 1 isn't charged
    # for session startup
    spark.range(1000).selectExpr("sum(id)").collect()

    # Each query runs three times: run 1 pays one-time plan/codegen
    # compilation (recorded as cold); the min of the two warm runs is the
    # steady-state execution a resident engine delivers — the
    # apples-to-apples number against the reference's resident in-memory
    # service (min, not mean: GC pauses and Python-worker restarts are
    # harness noise, not query cost).
    def bench_query(name: str, thunk) -> None:
        t0 = time.time()
        thunk()
        cold[name] = round(time.time() - t0, 3)
        warm = []
        for _ in range(2):
            t0 = time.time()
            thunk()
            warm.append(time.time() - t0)
        timings[name] = round(min(warm), 3)

    for name in HEADLINE:
        bench_query(name, lambda n=name: _force(qs[n](spark, SF_DIR)))

    # ANN paths: separate build vs search timing
    from vector_db_api_spark.operators.ivf import IVFIndex
    from vector_db_api_spark.operators.lsh import SignLSH, build_bucket_table
    from vector_db_api_spark.sources.tables import load_table

    emb = load_table(spark, SF_DIR, "embeddings").cache()
    emb.count()

    t0 = time.time()
    model = SignLSH(dim=64, num_tables=8, hyperplanes_per_table=8, seed=42)
    buckets = build_bucket_table(model, emb, id_col="vec_id").cache()
    buckets.count()
    timings["lsh_build"] = round(time.time() - t0, 3)
    bench_query("lsh_search", lambda: _force(
        model.search(emb, buckets, suite.Q0, 10, id_col="vec_id", pad_to_k=False)
    ))

    t0 = time.time()
    ivf = IVFIndex.train(emb, num_centroids=32, nprobe=4, seed=42)
    assignments = ivf.assign(emb, id_col="vec_id").cache()
    assignments.count()
    timings["ivf_build"] = round(time.time() - t0, 3)
    bench_query("ivf_search", lambda: _force(
        ivf.search(emb, assignments, suite.Q0, 10, id_col="vec_id")
    ))

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
        "cold_first_run_sec": round(sum(cold.values()), 3),
        "sf": sf_val,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
