"""Generate PLANS.md: formatted physical plans of the headline operators with
the audited scale properties stated next to each.

The properties themselves are enforced by tests/test_plan_shapes.py; this
artifact makes them reviewable without running Spark.

Usage: python tools/gen_plans.py  (writes /root/repo/PLANS.md)
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as _np

from pyspark.sql import functions as F

from vector_db_api_spark import suite
from vector_db_api_spark.session import get_spark
from vector_db_api_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"
MAX_LINES = 60


def formatted(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    lines = buf.getvalue().rstrip().splitlines()
    if len(lines) > MAX_LINES:
        lines = lines[:MAX_LINES] + [f"... ({len(lines) - MAX_LINES} more lines)"]
    return "\n".join(lines)


def main() -> None:
    spark = get_spark("gen-plans", master="local[8]", shuffle_partitions=8)
    emb = load_table(spark, SF_DIR, "embeddings")
    docs = load_table(spark, SF_DIR, "documents")

    from vector_db_api_spark.operators import knn as KNN
    from vector_db_api_spark.operators.dedup import exact_duplicates
    from vector_db_api_spark.operators.ivf import IVFIndex
    from vector_db_api_spark.operators.lsh import SignLSH, build_bucket_table

    queries = spark.createDataFrame(
        suite.QUERY_BATCH, "query_id string, query_vec array<double>"
    )
    ivf = IVFIndex.train(emb, num_centroids=8, nprobe=2, seed=42)
    assignments = ivf.assign(emb, id_col="vec_id")
    model = SignLSH(dim=64, num_tables=4, hyperplanes_per_table=8, seed=42)
    buckets = build_bucket_table(model, emb, id_col="vec_id")

    sections = [
        (
            "Single-query exact kNN",
            "Scan → scored projection → `TakeOrderedAndProject`. No Exchange "
            "at any corpus size: each partition keeps a k-heap, the driver "
            "merges. `PushedFilters: [IsNotNull(embedding)]` reaches the "
            "parquet reader.",
            KNN.knn(emb, suite.Q0, 10, id_col="vec_id"),
        ),
        (
            "Batch exact kNN (broadcast queries × corpus)",
            "Query side broadcast; `WindowGroupLimit(Partial)` caps every map "
            "task at its own top-k per query BEFORE the single query_id "
            "shuffle — the N·Q scored rows never cross the wire.",
            KNN.knn_batch(emb, queries, 5, id_col="vec_id"),
        ),
        (
            "Batch IVF search (one job per query batch)",
            "Probe pairs (Q × nprobe) broadcast into the posting join; "
            "candidates join the corpus; per-query window top-k with partial "
            "limit. No CartesianProduct anywhere.",
            ivf.search_batch(emb, assignments, queries, 5, id_col="vec_id"),
        ),
        (
            "LSH single-query search (literal probe, broadcast semi-join)",
            "The L-probe is a literal disjunction pushed into the bucket "
            "scan (partition-prunable when persisted by table_id); candidate "
            "ids broadcast into a LeftSemi re-rank join; top-k via "
            "TakeOrderedAndProject.",
            model.search(emb, buckets, suite.Q0, 5, id_col="vec_id", pad_to_k=False),
        ),
        (
            "LSH single-query search — SELF-CONTAINED layout (r9, in-place re-rank)",
            "Bucket rows carry their vectors (`include_vectors=True`, the "
            "L× space/time trade): the probed rows re-rank IN PLACE — the "
            "plan contains NO join operator at all; one dedup aggregate "
            "(per-id first(vec)) feeds TakeOrderedAndProject. Immutable-"
            "snapshot layout only (see the mutability contract in lsh.py).",
            model.search(
                emb,
                build_bucket_table(model, emb, id_col="vec_id",
                                   include_vectors=True),
                suite.Q0, 5, id_col="vec_id", pad_to_k=False,
            ),
        ),
        (
            "IVF-Flat single-query search (r9, in-place re-rank)",
            "Postings carry their vectors (one copy per id — the classic "
            "IVF-Flat layout): nprobe probe filters the posting table "
            "(partition-prunable when persisted by centroid_id) and scores "
            "in place — NO corpus hydration join, straight to "
            "TakeOrderedAndProject.",
            ivf.search(
                emb,
                ivf.assign(emb, id_col="vec_id", include_vectors=True),
                suite.Q0, 5, id_col="vec_id",
            ),
        ),
        (
            "Exact dedup (hash groupBy)",
            "Two HashAggregates around ONE Exchange: map-side partial "
            "aggregation shrinks every fingerprint group before the shuffle.",
            exact_duplicates(docs),
        ),
        (
            "Batch embedding generation (embed_texts)",
            "One ArrowEvalPython/mapInPandas stage fused onto the scan — no "
            "Exchange: embedding is embarrassingly parallel, concurrency is "
            "partition count, worker memory is bounded by the Arrow batch "
            "size.",
            __import__(
                "vector_db_api_spark.operators.embed", fromlist=["embed_texts"]
            ).embed_texts(docs, dim=8),
        ),
        (
            "SimHash numpy kernel (shuffle-free)",
            "The expression-path simhash explodes tokens and aggregates 60 "
            "votes through a groupBy (one Exchange keyed on the doc id); the "
            "kernel keeps every token of a row inside the row's Arrow batch, "
            "so the whole vote is map-side — scan → mapInPandas, zero "
            "Exchange.",
            __import__(
                "vector_db_api_spark.functions.kernels", fromlist=["simhash_np"]
            ).simhash_np(docs),
        ),
        (
            "Q5-shape relational join (rel_revenue_by_nation)",
            "nation/region broadcast; customer⋈orders and lineitem⋈orders "
            "shuffle on their join keys (AQE coalesces/skew-splits at "
            "runtime); aggregation is partial before the final group "
            "exchange.",
            suite.q_rel_revenue_by_nation(spark, SF_DIR),
        ),
        (
            "BM25 scoring scan (doc_bm25)",
            "Per-term tf and dl are plain expressions over ONE scan; idf is "
            "folded into literals from the collected stats row — the scoring "
            "plan has no join, no aggregate, no Exchange at any corpus size.",
            __import__(
                "vector_db_api_spark.operators.keyword", fromlist=["bm25_scores"]
            ).bm25_scores(docs, suite.BM25_QUERY),
        ),
        (
            "Document chunking (chunk_documents)",
            "Token array materialized once per row, window starts via "
            "sequence, slice+join per window, explode — all fused onto the "
            "scan: no Exchange, output linear in corpus tokens.",
            __import__(
                "vector_db_api_spark.operators.chunking",
                fromlist=["chunk_documents"],
            ).chunk_documents(docs, chunk_tokens=16, stride=12),
        ),
        (
            "LM quality scoring (doc_nll)",
            "The unigram model ships as literals (map + fold expressions); "
            "the scoring pass is scan + project only — no join, no "
            "aggregate, no Exchange, no transcendental in the plan.",
            (lambda _lm=__import__(
                "vector_db_api_spark.operators.lm",
                fromlist=["train_unigram", "doc_nll"],
            ): _lm.doc_nll(docs, *_lm.train_unigram(docs)))(),
        ),
        (
            "Benchmark decontamination (contamination_pairs)",
            "The eval-set shingles broadcast; the training corpus shingles "
            "in place and hash-joins the broadcast — the 100 TB side never "
            "shuffles before the join; only matching (train, bench) rows hit "
            "the counting Exchange.",
            __import__(
                "vector_db_api_spark.operators.decontaminate",
                fromlist=["contamination_pairs"],
            ).contamination_pairs(
                docs.filter((docs.doc_id % 7) != 0),
                docs.filter((docs.doc_id % 7) == 0).withColumnRenamed(
                    "doc_id", "bench_id"
                ),
                k=8,
            ),
        ),
        (
            "SemDeDup prune (expression path)",
            "Centroid assignment is scan-fused Column arithmetic; the ε-ball "
            "pair test is an equi-join on the cluster cell (Σ|cell|² pair "
            "work, broadcast at fixture scale / SMJ at corpus scale) with "
            "the cosine threshold INSIDE the join condition; the drop "
            "aggregate reuses the pair stream. No CartesianProduct at any "
            "scale.",
            (lambda: __import__(
                "vector_db_api_spark.operators.semdedup",
                fromlist=["semdedup_dropped"],
            ).semdedup_dropped(
                emb,
                __import__("numpy").random.default_rng(11).standard_normal((8, 64)),
                0.3,
                id_col="vec_id",
            ))(),
        ),
        (
            "KMV distinct sketch (kmv_distinct)",
            "Distinct-hash Exchange, then the rank-≤k runs as "
            "WindowGroupLimit(Partial) BEFORE the group Exchange — every map "
            "task forwards at most k hashes per group; the estimate "
            "aggregate reuses the window's partitioning.",
            (lambda ev=load_table(spark, SF_DIR, "events"): __import__(
                "vector_db_api_spark.operators.sketches",
                fromlist=["kmv_distinct"],
            ).kmv_distinct(ev, ["event_type"], "user_id", k=64))(),
        ),
        (
            "Quality-classifier scoring (broadcast-join path)",
            "posexplode → BroadcastHashJoin on the weight bucket (the model "
            "never shuffles the corpus) → one groupBy(id) Exchange whose "
            "positional re-sort fold makes the sum bit-equal to the literal "
            "path.",
            (lambda: __import__(
                "vector_db_api_spark.operators.quality_model",
                fromlist=["score_quality_linear_join", "fixed_model"],
            ).score_quality_linear_join(
                docs,
                spark.createDataFrame(
                    [
                        (i, float(x))
                        for i, x in enumerate(
                            __import__(
                                "vector_db_api_spark.operators.quality_model",
                                fromlist=["fixed_model"],
                            ).fixed_model(256, 13)
                        )
                    ],
                    "bucket int, weight double",
                ),
                256,
            ))(),
        ),
        (
            "Multi-probe near-dup blocking (embedding_neardup_pairs_multiprobe)",
            "Top-nprobe probe assignment is scan-fused Column arithmetic "
            "(each rank's argmax materialized in its own projection); the "
            "pair test is an equi-join on the probe cell with the cosine "
            "threshold INSIDE the join condition, then one distinct "
            "Exchange dedups pairs co-blocked in several cells. Candidate "
            "work = Σ|cell multiset|², never a CartesianProduct.",
            (lambda: __import__(
                "vector_db_api_spark.operators.dedup",
                fromlist=["embedding_neardup_pairs_multiprobe"],
            ).embedding_neardup_pairs_multiprobe(
                emb,
                __import__("numpy").random.default_rng(19).standard_normal((8, 64)),
                threshold=0.3,
                nprobe=2,
                id_col="vec_id",
            ))(),
        ),
        (
            "Cross-document span dedup (span_dedup, r12)",
            "ONE Generate (the gram explosion) feeding ONE corpus-scale "
            "Exchange (the keep-first window on the gram hash); the "
            "interval merge windows over duplicated intervals only; token "
            "removal is a filter-with-index array expression inside the "
            "final projection — the token table is never exploded or "
            "shuffled (pinned: exactly one Generate in the plan).",
            (lambda: __import__(
                "vector_db_api_spark.operators.span_dedup",
                fromlist=["span_dedup"],
            ).span_dedup(docs, n=8))(),
        ),
        (
            "Gopher structure rules (gopher_stats, r12)",
            "All seven rule inputs are Column expressions over ONE scan — "
            "no Exchange, no Generate, no Window, no Sort (pinned by "
            "test_gopher): the gates cost a read and prune everything "
            "downstream of a curation pipeline.",
            (lambda: __import__(
                "vector_db_api_spark.operators.gopher",
                fromlist=["gopher_stats"],
            ).gopher_stats(docs))(),
        ),
        (
            "CCNet perplexity buckets — production twin "
            "(perplexity_buckets_approx, r12)",
            "Thresholds come from approxQuantile (one distributed pass, "
            "driver gets two scalars); assignment is a projection over the "
            "broadcast-join scoring scan — NO Window anywhere (pinned), "
            "unlike the exact-NTILE oracle twin whose global sort is the "
            "documented fixture-scale shape.",
            (lambda _lm=__import__(
                "vector_db_api_spark.operators.lm",
                fromlist=["train_unigram_df", "perplexity_buckets_approx"],
            ): _lm.perplexity_buckets_approx(
                docs, *_lm.train_unigram_df(docs)
            ))(),
        ),
        (
            "Line-level boilerplate removal (line_dedup, r13)",
            "ONE Generate (posexplode of the line array), ONE corpus-scale "
            "Exchange (the per-hash distinct-doc count, map-side partial "
            "agg), an equi-join against the flagged hashes, and a regroup "
            "of REMOVED positions only — the document table never "
            "shuffles; the rebuild is a codegen filter-by-index + "
            "array_join. No Window anywhere (pinned by test_lines).",
            (lambda: __import__(
                "vector_db_api_spark.operators.lines",
                fromlist=["line_dedup"],
            ).line_dedup(docs))(),
        ),
        (
            "Semantic decontamination — BLAS twin "
            "(semantic_contamination_pairs_np, r13)",
            "The eval matrix ships once (broadcast); the corpus scans "
            "straight into mapInPandas (one Arrow matmul per batch, "
            "threshold filter inside) — NO Exchange on the corpus side at "
            "all. The fold twin replaces mapInPandas with a "
            "BroadcastNestedLoopJoin of pure expressions (oracle-exact, "
            "same no-corpus-shuffle property, pinned by "
            "test_decontam_repetition).",
            (lambda _d=__import__(
                "vector_db_api_spark.operators.decontaminate",
                fromlist=["semantic_contamination_pairs_np"],
            ): _d.semantic_contamination_pairs_np(
                emb, emb.limit(8).selectExpr(
                    "vec_id AS bench_id", "embedding"),
                0.9, id_col="vec_id",
            ))(),
        ),
        (
            "Semantic decontamination — cell-blocked path "
            "(semantic_contamination_pairs_blocked, r14)",
            "Both sides probe their top-nprobe centroid cells "
            "(multiprobe_cells — iterated mask-and-argmax over the "
            "centroid literals, scan-fused); the bench side's (cell, "
            "unit) rows BROADCAST, so the corpus rides a "
            "BroadcastHashJoin keyed on cell with NO corpus Exchange — "
            "per-row work O(K + nprobe²·|bench|/K) instead of the exact "
            "twin's O(|bench|). The only shuffle is the final DISTINCT "
            "over the (tiny) pair rows. Recall < 1 by design — measured "
            "in BENCH_SCALE.md (tools/semdecon_crossover.py), pinned "
            "≥ 0.9 at the registry setting. The BLAS twin fuses probe + "
            "per-cell matmul into ONE mapInPandas with no join at all "
            "(pinned by test_plan_shapes).",
            (lambda _d=__import__(
                "vector_db_api_spark.operators.decontaminate",
                fromlist=["semantic_contamination_pairs_blocked"],
            ): _d.semantic_contamination_pairs_blocked(
                emb, emb.limit(8).selectExpr(
                    "vec_id AS bench_id", "embedding"),
                0.9, _np.random.default_rng(3).standard_normal((8, 64)),
                nprobe=2, id_col="vec_id",
            ))(),
        ),
    ]

    out = [
        "# PLANS — physical plans of the headline operators",
        "",
        "Generated by `tools/gen_plans.py` at sf0.001 (plan SHAPE is scale-",
        "invariant; sizes are not). Every property called out below is",
        "enforced by `tests/test_plan_shapes.py` — this file is the review",
        "copy.",
        "",
    ]
    for title, note, df in sections:
        out += [f"## {title}", "", note, "", "```", formatted(df), "```", ""]

    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"), "w") as fh:
        fh.write("\n".join(out))
    print("wrote PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()
