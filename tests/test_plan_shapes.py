"""Physical-plan shape assertions — the 100-TB design contract.

These tests pin the properties that make each operator survive scale-up:
filters reach the parquet scan, small sides broadcast, top-k never global-
sorts, per-group top-k partial-limits BEFORE the shuffle, and ANN probes
stay selective. A refactor that silently regresses any of these fails here,
not in a cluster.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from vector_db_api_spark import suite
from vector_db_api_spark.operators import knn as KNN
from vector_db_api_spark.sources import tables as tables_mod
from vector_db_api_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(autouse=True)
def _no_scan_spread(monkeypatch):
    """Pin OPERATOR plan shapes only: the loader's small-input scan spread
    (tables._spread_small_scan, r15) would add one RoundRobinPartitioning
    exchange above every tiny single-file scan — input conditioning, not
    operator cost, and a no-op at any real deployment scale. Disable it
    here so every 'no Exchange' / exchange-count pin below keeps reading
    the operator's own shuffles; the spread itself is pinned in
    tests/test_tables_spread.py."""
    monkeypatch.setattr(tables_mod, "SPREAD_MAX_BYTES", 0)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


@pytest.fixture(scope="module")
def emb(spark):
    # module-scoped: instantiates BEFORE the function-scoped autouse
    # monkeypatch above, so it must disable the spread itself
    old = tables_mod.SPREAD_MAX_BYTES
    tables_mod.SPREAD_MAX_BYTES = 0
    try:
        return load_table(spark, SF_DIR, "embeddings")
    finally:
        tables_mod.SPREAD_MAX_BYTES = old


def test_knn_single_is_take_ordered_no_shuffle(spark, emb):
    plan = _plan(KNN.knn(emb, suite.Q0, 10, id_col="vec_id"))
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan  # no shuffle at any corpus size
    assert "PushedFilters: [IsNotNull(embedding)]" in plan


def test_knn_batch_partial_limit_before_shuffle(spark, emb):
    queries = spark.createDataFrame(
        suite.QUERY_BATCH, "query_id string, query_vec array<double>"
    )
    plan = _plan(KNN.knn_batch(emb, queries, 5, id_col="vec_id"))
    # query side broadcasts; corpus side never shuffles pre-limit
    assert "Broadcast" in plan
    # Catalyst's WindowGroupLimit(Partial) bounds each map task's output to
    # its own top-k per query — the N·Q scored rows never hit the exchange
    assert "WindowGroupLimit" in plan and "Partial" in plan


def test_listing_filter_pushdown(spark):
    docs = load_table(spark, SF_DIR, "documents")
    from vector_db_api_spark.operators.listing import list_page

    plan = _plan(
        list_page(
            docs,
            order_by=[F.desc("n_chars"), F.asc("doc_id")],
            limit=10,
            filters=[F.col("lang") == "en", F.col("n_chars") >= 200],
        )
    )
    assert "PushedFilters" in plan
    assert "EqualTo(lang,en)" in plan and "GreaterThanOrEqual(n_chars,200)" in plan
    assert "TakeOrderedAndProject" in plan  # limit+sort never global-sorts


def test_hydration_join_broadcasts(spark, emb):
    docs = load_table(spark, SF_DIR, "documents")
    hits = KNN.knn(emb, suite.Q0, 10, id_col="vec_id")
    plan = _plan(hits.join(F.broadcast(docs), hits.vec_id == docs.doc_id))
    assert "BroadcastHashJoin" in plan


def test_text_ops_stay_in_codegen(spark):
    docs = load_table(spark, SF_DIR, "documents")
    from vector_db_api_spark.functions import text as T

    df = docs.select(T.token_count("text"), T.quality_score("text"))
    plan = _plan(df)
    # the contract: pure JVM expressions, zero Python evaluation nodes
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "MapInPandas" not in plan


def test_ivf_probe_filter_reaches_assignments_scan(spark, emb, tmp_path):
    from vector_db_api_spark.operators.ivf import IVFIndex

    ivf = IVFIndex.train(emb, num_centroids=8, nprobe=2, seed=42)
    path = str(tmp_path / "assign")
    ivf.assign(emb, id_col="vec_id").write.partitionBy("centroid_id").parquet(path)
    assignments = spark.read.parquet(path)
    plan = _plan(ivf.search(emb, assignments, suite.Q0, 5, id_col="vec_id"))
    # nprobe centroid filter becomes PARTITION pruning on the posting table:
    # at 100 TB only nprobe/k of the postings bytes are read
    assert "PartitionFilters" in plan
    probe = ivf.probe_centroids(suite.Q0)
    assert f"centroid_id#" in plan and "IN (" in plan or "isin" in plan.lower() or str(probe[0]) in plan


def test_exact_dedup_partial_aggregates(spark):
    docs = load_table(spark, SF_DIR, "documents")
    from vector_db_api_spark.operators.dedup import exact_duplicates

    plan = _plan(exact_duplicates(docs))
    # map-side partial agg before the single hash shuffle
    assert plan.count("HashAggregate") >= 2
    assert plan.count("Exchange") == 1


def test_lsh_probe_pushes_into_bucket_scan(spark, emb, tmp_path):
    from vector_db_api_spark.operators.lsh import SignLSH, build_bucket_table

    model = SignLSH(dim=64, num_tables=4, hyperplanes_per_table=8, seed=42)
    path = str(tmp_path / "buckets")
    build_bucket_table(model, emb, id_col="vec_id").write.partitionBy(
        "table_id"
    ).parquet(path)
    buckets = spark.read.parquet(path)
    plan = _plan(
        model.search(emb, buckets, suite.Q0, 5, id_col="vec_id", pad_to_k=False)
    )
    # the L-probe literal disjunction must (a) partition-prune table_id on
    # the persisted bucket table and (b) push the signature predicate to the
    # parquet reader — at 100 TB only the L probed buckets are read
    assert "PartitionFilters" in plan and "table_id" in plan
    assert "PushedFilters" in plan and "signature" in plan
    # candidate re-rank joins via broadcast, never a corpus shuffle
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "SortMergeJoin" not in plan


def test_lsh_search_has_no_distinct_shuffle(spark, emb):
    from vector_db_api_spark.operators.lsh import SignLSH, build_bucket_table

    model = SignLSH(dim=64, num_tables=4, hyperplanes_per_table=8, seed=42)
    buckets = build_bucket_table(model, emb, id_col="vec_id")
    plan = _plan(
        model.search(emb, buckets, suite.Q0, 5, id_col="vec_id", pad_to_k=False)
    )
    # semi-join dedups candidates; an explicit distinct would show up as an
    # extra HashAggregate pair around an Exchange
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_batch_ann_plans_broadcast_probes_and_partial_limit(spark, emb):
    from vector_db_api_spark.operators.ivf import IVFIndex
    from vector_db_api_spark.operators.lsh import SignLSH, build_bucket_table

    queries = spark.createDataFrame(
        suite.QUERY_BATCH, "query_id string, query_vec array<double>"
    )
    ivf = IVFIndex.train(emb, num_centroids=8, nprobe=2, seed=42)
    assignments = ivf.assign(emb, id_col="vec_id")
    plan = _plan(ivf.search_batch(emb, assignments, queries, 5, id_col="vec_id"))
    # probe pairs and the query side broadcast; the posting/corpus sides are
    # never shuffled into a crossJoin; per-query top-k partial-limits
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "WindowGroupLimit" in plan and "Partial" in plan

    model = SignLSH(dim=64, num_tables=4, hyperplanes_per_table=8, seed=42)
    buckets = build_bucket_table(model, emb, id_col="vec_id")
    plan = _plan(model.search_batch(emb, buckets, queries, 5, id_col="vec_id"))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "WindowGroupLimit" in plan and "Partial" in plan


def test_ivf_self_join_plan_is_equi_join_no_cartesian(spark, emb):
    """r10 verdict #3: the symmetric multi-probe self-join must stay
    bucket-local — an equi-self-join of the probe table on centroid_id
    plus equi-joins for hydration/scoring; never a cartesian or
    nested-loop product, and never a corpus-sized broadcast (the query
    side is the WHOLE corpus — rerank_pairs runs with
    broadcast_queries=False, r10's ngram OOM lesson)."""
    from vector_db_api_spark.operators.ivf import IVFIndex

    ivf = IVFIndex.train(emb, num_centroids=8, nprobe=2, seed=42)
    plan = _plan(ivf.self_join(emb, 4, id_col="vec_id", nprobe_sym=2))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "WindowGroupLimit" in plan and "Partial" in plan
    # the candidate dedup is a real distinct (rerank_pairs contract)
    assert "HashAggregate" in plan
    # r16 pins:
    # (a) each unordered pair is generated once — the pair self-join
    #     carries the undirected orientation filter as its condition;
    #     the mirror back to directed rows is the explode Generate
    assert "query_id#" in plan and "<= vec_id#" in plan.replace("L", "")
    assert "Generate explode" in plan
    # (b) one dot fold per scored pair: the corpus-side/query-side norms
    #     materialize once per ROW below the joins, so the plan carries
    #     exactly two SQRT(aggregate( folds total — the r15 inline
    #     similarity carried FOUR in the score projection alone (norms
    #     re-evaluated in the zero-guard AND the denominator)
    assert plan.count("SQRT(aggregate(") == 2


def test_rerank_pairs_cosine_single_dot_per_pair(spark, emb):
    """r16 (guide §1.2): every batch-ANN re-rank (LSH/IVF/PQ search_batch)
    scores a pair with ONE dot fold — row/query norms are hoisted out of
    the per-pair expression. Four SQRT folds per pair would reappear here
    if someone inlines V.similarity again."""
    queries = spark.createDataFrame(
        suite.QUERY_BATCH, "query_id string, query_vec array<double>"
    )
    pairs = emb.select(
        F.col("vec_id"), F.lit(str(suite.QUERY_BATCH[0][0])).alias("query_id")
    ).limit(8)
    plan = _plan(KNN.rerank_pairs(emb, queries, pairs, 3, id_col="vec_id"))
    assert plan.count("SQRT(aggregate(") == 2  # one per side, once per row


def test_bucketed_join_is_shuffle_free(spark, emb, tmp_path):
    from vector_db_api_spark.sources.tables import write_bucketed

    docs = load_table(spark, SF_DIR, "documents")
    write_bucketed(
        emb.select("vec_id", "label"), "b_emb", str(tmp_path / "b_emb"),
        "vec_id", num_buckets=8, sort_col="vec_id",
    )
    write_bucketed(
        docs.select("doc_id", "lang"), "b_docs", str(tmp_path / "b_docs"),
        "doc_id", num_buckets=8, sort_col="doc_id",
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("b_emb").join(
            spark.table("b_docs"), F.col("vec_id") == F.col("doc_id")
        )
        plan = _plan(j)
        # co-located buckets: the join runs with ZERO Exchange nodes —
        # the property that deletes the shuffle from fact⋈fact joins
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS b_emb")
        spark.sql("DROP TABLE IF EXISTS b_docs")


def test_simhash_kernel_is_shuffle_free(spark):
    """The expression simhash pays one Exchange (explode→groupBy votes);
    the numpy kernel keeps the whole vote inside the row's Arrow batch —
    its plan must contain NO Exchange beyond the small-input repartition
    _parallelize may add, and on a pre-partitioned input, none at all."""
    from vector_db_api_spark.functions.kernels import simhash_np

    docs = load_table(spark, SF_DIR, "documents").repartition(8)
    plan = _plan(simhash_np(docs))
    # the explicit repartition(8) above is the only Exchange in the plan
    assert plan.count("Exchange") == 1
    assert "HashAggregate" not in plan


def test_embed_texts_fuses_with_scan_no_shuffle(spark):
    from vector_db_api_spark.operators.embed import embed_texts

    docs = load_table(spark, SF_DIR, "documents")
    plan = _plan(embed_texts(docs, dim=8))
    assert "Exchange" not in plan  # embarrassingly parallel, scan-fused


def test_pq_search_candidate_selection_is_take_ordered(spark, emb):
    """PQ search's two phases both avoid a global Sort (r11 shape): the
    cutoff probe is a distributed TakeOrderedAndProject (per-partition
    heaps) run as an eager side job, and the RETURNED plan is the tie
    filter (adc_score >= literal cutoff, over the checkpointed scores —
    r12: the ADC scan runs ONCE per call, not once per phase) ->
    semi-join -> knn's TakeOrderedAndProject tail — never a full-corpus
    Sort of ADC scores anywhere."""
    from vector_db_api_spark.operators.pq import PQIndex

    pq = PQIndex.train(emb, m=8, k=16, seed=42, train_sample_rows=1024)
    codes = pq.encode(emb, id_col="vec_id")
    q = [float(x) for x in emb.limit(1).collect()[0]["embedding"]]
    # the cutoff probe plan: TakeOrdered, no global sort
    scored = pq.adc_scores(codes, q, id_col="vec_id")
    probe_plan = _plan(
        scored.orderBy(F.col("adc_score").desc(), F.col("vec_id").asc())
        .limit(40).agg(F.min("adc_score"))
    )
    assert "TakeOrderedAndProject" in probe_plan
    assert "Sort " not in probe_plan or "SortMergeJoin" in probe_plan
    # the returned plan: tie filter + semi-join + knn top-k, no global sort
    plan = _plan(pq.search(emb, codes, q, 5, id_col="vec_id"))
    assert "TakeOrderedAndProject" in plan
    assert "adc_score" in plan  # the tie-filter scan is in-plan
    assert "Sort " not in plan or "SortMergeJoin" in plan  # no global sort stage
    # cache_scores=True checkpoints the scores: the returned plan re-reads
    # the materialized RDD, not a second MapInPandas ADC pass over codes
    assert "MapInPandas" not in plan


def test_pq_tie_class_broadcast_is_gated(spark, emb):
    """Both branches of the degenerate-tie guard (r11 verdict #3):

    - normal codebooks → tie class ~rerank rows → the candidate semi-join
      carries the explicit broadcast hint (BroadcastHashJoin pre-AQE);
    - a degenerate all-identical-codes corpus (every row ties at the
      cutoff) with the bound forced below the corpus size → NO hint: the
      join is left to AQE instead of force-broadcasting a corpus-sized
      frame (the r10 ngram driver-OOM precedent).
    """
    from vector_db_api_spark.operators.pq import PQIndex

    pq = PQIndex.train(emb, m=8, k=16, seed=42, train_sample_rows=1024)
    codes = pq.encode(emb, id_col="vec_id")
    q = [float(x) for x in emb.limit(1).collect()[0]["embedding"]]
    hinted = pq.search(emb, codes, q, 5, id_col="vec_id")
    assert "strategy=broadcast" in _optimized(hinted)
    assert "BroadcastHashJoin" in _plan(hinted)
    # degenerate regime: every code row identical -> one corpus-wide tie
    # class; gate at 1 row so the guard must refuse the hint
    one = codes.limit(1).collect()[0]["codes"]
    degenerate = codes.select("vec_id", F.lit(one).cast("array<smallint>").alias("codes"))
    ungated = pq.search(emb, degenerate, q, 5, id_col="vec_id",
                        broadcast_tie_rows=1)
    # no forced broadcast: the optimized plan carries NO join hint — the
    # physical strategy is Catalyst/AQE's choice from actual sizes (it may
    # still PICK broadcast at this test's scale; the point is the plan no
    # longer mandates it on a corpus-sized frame)
    assert "strategy=broadcast" not in _optimized(ungated)
    # and the result is still the exact top-k (re-ranking everything is the
    # correct degenerate answer)
    rows = ungated.collect()
    exact = KNN.knn(emb, q, 5, id_col="vec_id").collect()
    assert [r["vec_id"] for r in rows] == [r["vec_id"] for r in exact]


def test_decontaminate_broadcasts_benchmark(spark):
    from vector_db_api_spark.operators import decontaminate as X

    docs = load_table(spark, SF_DIR, "documents")
    bench = docs.filter(F.col("doc_id") % 7 == 0).withColumnRenamed(
        "doc_id", "bench_id"
    )
    train = docs.filter(F.col("doc_id") % 7 != 0)
    plan = _plan(X.contamination_pairs(train, bench, k=8))
    # the training corpus hash-joins the broadcast benchmark shingles —
    # no shuffle of the corpus-side shingle table before the join
    assert "BroadcastHashJoin" in plan
    kept = _plan(X.decontaminate(train, bench, k=8))
    assert "BroadcastHashJoin" in kept and "LeftAnti" in kept


def test_bm25_scores_single_scan_no_join(spark):
    from vector_db_api_spark.operators import keyword as KW

    docs = load_table(spark, SF_DIR, "documents")
    plan = _plan(KW.bm25_scores(docs, suite.BM25_QUERY))
    # scoring pass is scan + project/filter only: idf folded to literals,
    # so no join, no aggregate, no shuffle anywhere in the scoring plan
    assert "Join" not in plan
    assert "Exchange" not in plan


def test_repetition_stats_two_stacked_aggs_one_wide_shuffle(spark):
    from vector_db_api_spark.operators import repetition as R

    docs = load_table(spark, SF_DIR, "documents")
    plan = _plan(R.ngram_repetition_stats(docs, n=2))
    # (id, gram) agg -> id agg -> left join back to ids: every Exchange
    # must be keyed by doc_id or (doc_id, gram) — no all-to-all repartition
    assert plan.count("HashAggregate") >= 4  # two partial+final pairs
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan


def test_span_overlap_explodes_materialized_fps_not_expression(spark):
    from vector_db_api_spark.operators import dedup as D

    docs = load_table(spark, SF_DIR, "documents")
    plan = _plan(D.span_overlap_pairs(docs))
    # the fingerprint array must be PHYSICALLY materialized (Arrow stage)
    # before the explode — exploding the expression re-evaluates the
    # O(S*w) hash pipeline per output row (measured 224s vs 5.5s at sf0.1)
    assert "MapInPandas" in plan
    gen = plan.index("Generate")
    mip = plan.index("MapInPandas")
    assert mip > gen  # physical plans print top-down: the source is below


def test_repetition_kernel_is_shuffle_free(spark):
    from vector_db_api_spark.functions.kernels import repetition_stats_np

    docs = load_table(spark, SF_DIR, "documents")
    plan = _plan(repetition_stats_np(docs))
    assert "Exchange" not in plan
    assert "MapInPandas" in plan


def test_doc_nll_join_broadcasts_model_one_group_shuffle(spark):
    from vector_db_api_spark.operators.lm import doc_nll_join, train_unigram_df

    docs = load_table(spark, SF_DIR, "documents")
    model_df, oov = train_unigram_df(docs)
    plan = _plan(doc_nll_join(docs, model_df, oov))
    # model ships as a broadcast build side; the corpus never re-shuffles
    # for the join — only the per-doc groupBy pays an Exchange
    assert "BroadcastHashJoin" in plan
    import re
    corpus_exchanges = len(re.findall(r"Exchange hashpartitioning", plan))
    assert corpus_exchanges <= 2  # model-count agg + doc groupBy, nothing more


def test_gapfill_numeric_grid_two_shuffles(spark):
    # epoch-bigint gapfill: bounds agg + grid-join — linear shuffles on the
    # ROLLUP (buckets x groups), never on the raw events
    df = suite.q_events_gapfill(spark, SF_DIR)
    plan = _plan(df)
    assert "sequence" in plan.lower()  # generated grid, not a side table


def test_leakage_split_label_join_is_unhinted(spark):
    # the component-label join must carry NO forced broadcast hint: AQE
    # decides from measured size (high-dup corpora make labels corpus-sized)
    from vector_db_api_spark.operators.curation import leakage_free_split

    docs = load_table(spark, SF_DIR, "documents").limit(50)
    opt = _optimized(leakage_free_split(docs, 0.5, "doc_id"))
    import re
    # ResolvedHint/broadcast markers on the comp join side would show here
    assert "ResolvedHint" not in opt


def test_semdedup_pair_join_is_equi_keyed_on_cell(spark, emb):
    """The SemDeDup ε-ball test must run as an equi-join on the cluster cell
    (pair work = Σ|cell|²) with the threshold predicate evaluated inside the
    join — a CartesianProduct here would be the N² plan the operator exists
    to avoid."""
    import re

    import numpy as np

    from vector_db_api_spark.operators.semdedup import semdedup_dropped

    rng = np.random.default_rng(11)
    c = rng.standard_normal((8, 64))
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    plan = _plan(semdedup_dropped(emb, c, 0.3, id_col="vec_id"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert re.search(r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin) \[cell", plan)
    # the ε-threshold is part of the join condition, not a post-materialize
    # filter over all intra-cell pairs
    join_line = next(l for l in plan.splitlines() if "HashJoin [cell" in l or "MergeJoin [cell" in l)
    assert ">= 0.3" in join_line


def test_multiprobe_neardup_join_is_equi_keyed_on_cell(spark, emb):
    """Multi-probe blocking must stay an equi-join on the probe cell
    (candidate work = Σ|cell multiset|², nprobe× rows, never a cross
    product), with the cosine threshold inside the join."""
    import re

    import numpy as np

    from vector_db_api_spark.operators.dedup import (
        embedding_neardup_pairs_multiprobe,
    )

    rng = np.random.default_rng(13)
    c = rng.standard_normal((8, 64))
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    plan = _plan(
        embedding_neardup_pairs_multiprobe(emb, c, threshold=0.3, nprobe=2)
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert re.search(
        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin) \[cell", plan
    )
    join_line = next(
        l for l in plan.splitlines()
        if "HashJoin [cell" in l or "MergeJoin [cell" in l
    )
    assert ">= 0.3" in join_line


def test_kmv_limits_per_partition_before_shuffle(spark):
    """The KMV rank-≤k must apply map-side (WindowGroupLimit Partial): each
    task forwards at most k hashes per group into the exchange — the
    property that keeps sketch build cost flat as partitions multiply."""
    from vector_db_api_spark.operators.sketches import kmv_distinct

    ev = load_table(spark, SF_DIR, "events")
    plan = _plan(kmv_distinct(ev, ["event_type"], "user_id", k=64))
    assert "WindowGroupLimit" in plan and "Partial" in plan
    assert "PushedFilters: [IsNotNull(user_id)]" in plan


def test_histogram_two_scans_no_sort(spark):
    """value_histogram: 1-row bounds aggregate broadcast into the binning
    scan; one hash shuffle on the bin key; never a global sort."""
    import re

    from vector_db_api_spark.operators.sketches import value_histogram

    ev = load_table(spark, SF_DIR, "events")
    plan = _plan(value_histogram(ev, "value", bins=10))
    assert "BroadcastNestedLoopJoin" in plan  # 1-row bounds side broadcasts
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
    assert not re.search(r"\bSort \[", plan)


def test_filtered_ivf_search_pushes_predicate_to_scan(spark, emb):
    """Filtered vector search must PRE-filter: the metadata predicate
    reaches the corpus parquet scan (PushedFilters), so non-matching rows
    never enter the candidate semi-join — the opposite of the reference's
    post-filter-after-top-k."""
    import numpy as np

    from vector_db_api_spark.operators.ivf import IVFIndex

    rng = np.random.default_rng(7)
    model = IVFIndex(rng.standard_normal((8, 64)), nprobe=3)
    assignments = model.assign(emb, id_col="vec_id")
    plan = _plan(
        model.search(
            emb, assignments, suite.Q0, 10, id_col="vec_id",
            prefilter=(F.col("label") < 5),
        )
    )
    assert "LessThan(label,5)" in plan  # pushed, not a post-scan Filter only
    assert "TakeOrderedAndProject" in plan


def test_dsir_scoring_broadcasts_model_and_takes_ordered_topk(spark):
    """DSIR's 100 TB contract: the fitted ratio model (≤ buckets rows by
    construction) BROADCASTS into the pool scan — the corpus-sized side
    never shuffles for the join — and the final selection is a two-phase
    TakeOrderedAndProject, never a global Sort."""
    import re

    from vector_db_api_spark.operators.dsir import dsir_pipeline

    docs = load_table(spark, SF_DIR, "documents")
    target = docs.filter(F.col("source") == "src0")
    pool = docs.filter(F.col("source") != "src0")
    plan = _plan(dsir_pipeline(pool, target, k=50))
    assert "BroadcastHashJoin" in plan          # weights ship, pool stays put
    assert "TakeOrderedAndProject" in plan      # two-phase global top-k
    assert not re.search(r"Sort \[logratio", plan)  # no full sort on scores


def test_lsh_selfcontained_probe_has_no_corpus_join(spark, emb, tmp_path):
    """Self-contained bucket table (r9): the probe must (a) keep the
    partition/pushdown pruning of the id-only layout on a persisted copy
    and (b) contain NO join at all — the re-rank happens in place on the
    probed rows (one dedup aggregate, no corpus hydration)."""
    from vector_db_api_spark.operators.lsh import SignLSH, build_bucket_table

    model = SignLSH(dim=64, num_tables=4, hyperplanes_per_table=8, seed=42)
    path = str(tmp_path / "buckets_v")
    build_bucket_table(
        model, emb, id_col="vec_id", include_vectors=True
    ).write.partitionBy("table_id").parquet(path)
    buckets = spark.read.parquet(path)
    plan = _plan(
        model.search(emb, buckets, suite.Q0, 5, id_col="vec_id", pad_to_k=False)
    )
    assert "PartitionFilters" in plan and "table_id" in plan
    assert "PushedFilters" in plan and "signature" in plan
    for join in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
                 "CartesianProduct", "BroadcastNestedLoopJoin"):
        assert join not in plan, join
    # a dedup aggregate (per-id first(vec)) feeds the top-k — array-typed
    # aggregation buffers plan as SortAggregate on some Spark versions
    assert ("HashAggregate" in plan or "ObjectHashAggregate" in plan
            or "SortAggregate" in plan)
    assert "TakeOrderedAndProject" in plan


def test_ivf_flat_probe_has_no_corpus_join(spark, emb, tmp_path):
    """IVF-Flat posting table (r9): nprobe probe = partition pruning on a
    persisted copy, re-rank in place — no join, no dedup aggregate (each id
    lives in exactly one posting row)."""
    from vector_db_api_spark.operators.ivf import IVFIndex

    ivf = IVFIndex.train(emb, num_centroids=8, nprobe=2, seed=42)
    path = str(tmp_path / "postings_v")
    ivf.assign(emb, id_col="vec_id", include_vectors=True).write.partitionBy(
        "centroid_id"
    ).parquet(path)
    assignments = spark.read.parquet(path)
    plan = _plan(ivf.search(emb, assignments, suite.Q0, 5, id_col="vec_id"))
    assert "PartitionFilters" in plan and "centroid_id" in plan
    for join in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
                 "CartesianProduct", "BroadcastNestedLoopJoin"):
        assert join not in plan, join
    assert "TakeOrderedAndProject" in plan
    # batch path on the same table: exactly TWO broadcast joins — the
    # probe-pairs join and the tiny query-vector join for scoring — and
    # NO corpus hydration join (the id-only layout plans three)
    queries = spark.createDataFrame(
        suite.QUERY_BATCH, "query_id string, query_vec array<double>"
    )
    bplan = _plan(ivf.search_batch(emb, assignments, queries, 5, id_col="vec_id"))
    assert bplan.count("BroadcastHashJoin") == 2
    id_only = ivf.assign(emb, id_col="vec_id")
    old = _plan(ivf.search_batch(emb, id_only, queries, 5, id_col="vec_id"))
    assert old.count("BroadcastHashJoin") + old.count("SortMergeJoin") == 3
    assert "SortMergeJoin" not in bplan
    assert "WindowGroupLimit" in bplan and "Partial" in bplan


def test_lifecycle_selfcontained_serving_plan_is_join_free(spark, tmp_path):
    """The lifecycle's selfcontained serving mode (r10) must produce the
    operators' in-place plan — ONE parquet scan (the posting/bucket table),
    no chunks hydration join — and the mutation-downgraded mode must fall
    back to the hydrating plan (posting scan + chunks scan)."""
    from vector_db_api_spark.lifecycle import IndexConfig, IndexLifecycle

    chunks = spark.createDataFrame(
        [(f"c{i}", [float(i), 1.0, 0.0, 0.0]) for i in range(16)],
        "id string, embedding array<double>",
    )
    lc = IndexLifecycle(spark, str(tmp_path / "idx"))
    lc.rebuild("L", chunks, IndexConfig("ivf", {"num_centroids": 2,
                                                "nprobe": 2}),
               4, layout="selfcontained")
    q = [1.0, 1.0, 0.0, 0.0]
    plan = _plan(lc.search("L", chunks, q, 3))
    assert plan.count("Scan parquet") == 1, plan   # postings only, in place
    assert "Join" not in plan, plan                # re-rank happens in place
    # the nprobe filter partition-prunes the posting scan
    assert "PartitionFilters" in plan and "centroid_id" in plan
    # mutation downgrades serving: now the probe hydrates from the live
    # chunks frame (posting scan + the in-memory chunks relation join)
    lc.remove("L", ["c0"])
    assert lc.current("L")["layout_serving"] == "idonly"
    plan2 = _plan(lc.search("L", chunks, q, 3))
    assert plan2.count("Scan parquet") == 1 and "Join" in plan2, plan2


def test_ngram_jaccard_sizes_join_is_shuffled_hash(spark):
    """r10 sf1 finding: `inter` is a multi-stage aggregate whose planner
    size estimate is unreliable — on a shingle-dense corpus the static
    planner broadcast IT (collecting ~10^8 pair rows to the driver, OOM).
    The sizes joins are pinned to shuffled-hash with the per-doc side as
    build: no driver collect at any corpus size."""
    from vector_db_api_spark.operators.dedup import ngram_jaccard_pairs

    docs = load_table(spark, SF_DIR, "documents")
    plan = _plan(ngram_jaccard_pairs(docs))
    assert "ShuffledHashJoin" in plan, plan
    assert "BroadcastHashJoin" not in plan, plan


# -- r12 pins for the r11 driver-run NEEDS-HUMAN flags ----------------------
# (VERDICT r11 #1): every flag class gets a frozen plan so a future bench
# regeneration auto-classifies machine drift as pinned-residual instead of
# re-asking a human. Each test pins the EXACT plan its bench thunk runs.


def test_ivfpq_search_cells_prunes_codes_and_keeps_take_ordered_tail(spark, emb):
    """`ivfpq_search` pin: the nprobe centroid filter lands on the
    cell-codes side BEFORE the ADC scan (partition-prunable at scale), and
    the returned plan is pq.search's two-phase shape — checkpointed scores
    (the ADC MapInPandas pass ran ONCE, into the checkpoint; r12), tie
    filter, candidate semi-join, knn TakeOrdered tail — never a global
    sort of ADC scores."""
    from vector_db_api_spark.operators.ivf import IVFIndex
    from vector_db_api_spark.operators.pq import PQIndex

    ivf = IVFIndex.train(emb, num_centroids=8, nprobe=2, seed=42)
    pq = PQIndex.train(emb, m=8, k=16, seed=42, train_sample_rows=1024)
    cell_codes = pq.encode_with_cells(
        emb, ivf.assign(emb, id_col="vec_id"), id_col="vec_id"
    )
    q = [float(x) for x in emb.limit(1).collect()[0]["embedding"]]
    # the ADC scan side: MapInPandas fused over the centroid-filtered codes
    probed = [int(c) for c in ivf.probe_centroids(q)]
    scan = _plan(pq.adc_scores(
        cell_codes.filter(F.col("centroid_id").isin(probed))
        .select("vec_id", "codes"), q, id_col="vec_id"))
    assert "MapInPandas" in scan and "centroid_id" in scan
    # the returned plan: checkpoint-fed two-phase tail, no second ADC pass
    plan = _plan(pq.search_cells(emb, cell_codes, ivf, q, 5, id_col="vec_id"))
    assert "TakeOrderedAndProject" in plan
    assert "MapInPandas" not in plan
    assert "Sort " not in plan or "SortMergeJoin" in plan


def test_knn_batch_numpy_partial_topk_single_exchange(spark, emb):
    """`knn_self_join_np` pin: one Arrow MapInPandas scoring pass fused
    with the corpus scan (the query matrix rides a broadcast, not task
    closures), per-batch argpartition partial top-k, then the global
    per-query top-k behind a SINGLE exchange with a WindowGroupLimit
    partial limit — only ~k rows per (batch, query) ever shuffle; no
    cartesian, no global sort."""
    queries = [
        (str(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.limit(8).collect()
    ]
    plan = _plan(KNN.knn_batch_numpy(emb, queries, 3, id_col="vec_id"))
    assert "MapInPandas" in plan
    assert "WindowGroupLimit" in plan and "Partial" in plan
    assert plan.count("Exchange") == 1
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_doc_nll_literal_scoring_is_zero_shuffle_pure_expressions(spark):
    """`doc_lm_nll` pin: the literal-path scoring plan is scan + project
    ONLY — the model ships as a map literal, so the corpus-sized pass has
    no join, no exchange, and no Python eval node anywhere (training is a
    separate bounded count-collect job)."""
    from vector_db_api_spark import suite as S

    plan = _plan(S.queries()["doc_lm_nll"](spark, SF_DIR))
    assert "Exchange" not in plan and "Join" not in plan
    assert "EvalPython" not in plan and "MapInPandas" not in plan


def test_temperature_sample_is_windowed_no_join(spark):
    """`doc_temperature_sample` pin: quotas fold to literals (one bounded
    count-collect at call time), so the selection plan carries NO join —
    a per-stratum window behind exactly two exchanges (Chernoff prefilter
    + stratum window), pure JVM end to end."""
    from vector_db_api_spark import suite as S

    plan = _plan(S.queries()["doc_temperature_sample"](spark, SF_DIR))
    assert "Join" not in plan
    assert plan.count("Exchange") == 2
    assert "EvalPython" not in plan and "MapInPandas" not in plan


def test_upsert_is_equi_joins_and_union_no_cartesian(spark):
    """`crud_upsert` pin: MERGE = anti-join (rows the batch doesn't touch)
    + left-outer join (version bump / created_at carry) + union — every
    join equi-keyed on id (never cartesian / nested-loop), pure JVM."""
    from vector_db_api_spark import suite as S

    plan = _plan(S.queries()["crud_upsert"](spark, SF_DIR))
    assert "LeftAnti" in plan and "Union" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "EvalPython" not in plan and "MapInPandas" not in plan


def test_embedding_neardup_blocked_join_is_equi_keyed_no_cartesian(spark, emb):
    """`embedding_neardup` pin (r13 verdict #4): the label-blocked cosine
    self-join must stay an equi-join on the block key (pair work =
    Σ|block|², never N²), with the unit vectors precomputed BEFORE the join
    and the threshold predicate evaluated inside it."""
    import re

    from vector_db_api_spark.operators.dedup import embedding_neardup_pairs

    plan = _plan(
        embedding_neardup_pairs(
            emb, threshold=0.3, id_col="vec_id", block_col="label"
        )
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert re.search(
        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin) \[__blk", plan
    )
    join_line = next(
        l for l in plan.splitlines()
        if "HashJoin [__blk" in l or "MergeJoin [__blk" in l
    )
    assert ">= 0.3" in join_line


def test_interval_join_is_binned_equi_join_no_nested_loop(spark):
    """`events_interval_join` pin (r13 verdict #4): the manufactured time
    bin turns the range join into an equi-join on (key, bin) — a
    BroadcastNestedLoopJoin here is exactly the quadratic plan the
    operator exists to replace. The left side explodes to ≤2 bins per row
    (Generate), the exact range predicate rides inside the join."""
    import re

    from vector_db_api_spark import suite as S

    plan = _plan(S.queries()["events_interval_join"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert re.search(
        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin) \[user_id\S*, __bin",
        plan,
    )
    assert "Generate explode" in plan
    join_line = next(
        l for l in plan.splitlines()
        if re.search(r"(Hash|Merge)Join \[user_id", l)
    )
    assert "__rts" in join_line and ">=" in join_line and "<=" in join_line


def test_knn_quantized_two_stage_scan_then_semi_rerank(spark):
    """`knn_quantized_top10` pin (r13 verdict #4): stage 1 is a partial
    top-(oversample·k) over the quantized codes (TakeOrderedAndProject —
    never a global sort), stage 2 re-ranks ONLY the broadcast survivors
    via a left-semi join; no shuffle exchange anywhere (both stages are
    scan → fold → partial top-k)."""
    from vector_db_api_spark import suite as S

    plan = _plan(S.queries()["knn_quantized_top10"](spark, SF_DIR))
    assert plan.count("TakeOrderedAndProject") == 2  # limit=40 then limit=10
    assert "LeftSemi" in plan
    assert "Sort " not in plan  # top-k never global-sorts
    # the only exchange is the ≤40-row survivor broadcast — the corpus
    # never shuffles in either stage
    import re
    non_broadcast_exchanges = [
        l for l in plan.splitlines()
        if re.search(r"\bExchange\b", l) and "BroadcastExchange" not in l
    ]
    assert non_broadcast_exchanges == []


def test_ivf_build_assign_is_single_scan_no_shuffle(spark, emb):
    """`ivf_build` pin (r13 verdict #4): the corpus-scale piece of an IVF
    build is assign() — it must be ONE Arrow-batched pass directly over
    the scan (MapInPandas; centroid matrix rides a broadcast variable, not
    a plan-side exchange), with the null-embedding filter pushed to
    parquet. No Exchange: the posting table partitioning is decided by the
    WRITER (partitionBy(centroid_id)), never by a build-side shuffle."""
    from vector_db_api_spark.operators.ivf import IVFIndex

    ivf = IVFIndex.train(emb, num_centroids=8, nprobe=2, seed=42)
    plan = _plan(ivf.assign(emb, id_col="vec_id", include_vectors=True))
    assert "MapInPandas" in plan
    assert "Exchange" not in plan
    assert "PushedFilters: [IsNotNull(embedding)]" in plan


def test_semantic_contamination_blocked_plan_broadcast_hash_no_corpus_shuffle(spark):
    """Scale pin: the blocked path joins on cell through a
    BroadcastHashJoin (bench side broadcasts) and the corpus reaches the
    join without an Exchange — the whole point of blocking is that the
    corpus neither shuffles nor NLJ-scans the full eval side."""
    import numpy as np

    from vector_db_api_spark.operators.decontaminate import (
        semantic_contamination_pairs_blocked,
    )

    rng = np.random.default_rng(3)
    cent = rng.standard_normal((4, 8))
    bench = spark.createDataFrame(
        [("e1", [1.0] * 8)], "bench_id string, embedding array<double>")
    train = spark.createDataFrame(
        [(f"t{i}", [float(i + j) for j in range(8)]) for i in range(40)],
        "doc_id string, embedding array<double>")
    plan = (
        semantic_contamination_pairs_blocked(train, bench, 0.9, cent)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    # the only SHUFFLE in the whole plan is the final DISTINCT over the
    # (tiny) pair rows — it prints above the join; below the join sit the
    # corpus scan (shuffle-free) and the bench side's BroadcastExchange
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Exchange hashpartitioning" not in plan.split(
        "BroadcastHashJoin")[-1], plan

def test_semantic_contamination_blocked_np_plan_is_fused_single_pass(spark):
    """Scale pin for the BLAS blocked twin: probe + per-cell scoring fuse
    into ONE MapInPandas directly over the corpus scan — no join operator
    anywhere, and the only shuffle is the final DISTINCT over the (tiny)
    pair rows."""
    import numpy as np

    from vector_db_api_spark.operators.decontaminate import (
        semantic_contamination_pairs_blocked_np,
    )

    rng = np.random.default_rng(4)
    cent = rng.standard_normal((4, 8))
    bench = spark.createDataFrame(
        [("e1", [1.0] * 8)], "bench_id string, embedding array<double>")
    train = spark.createDataFrame(
        [(f"t{i}", [float(i + j) for j in range(8)]) for i in range(40)],
        "doc_id string, embedding array<double>")
    plan = (
        semantic_contamination_pairs_blocked_np(train, bench, 0.9, cent)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("MapInPandas") == 1, plan
    assert "Join" not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan



def test_doc_packing_sharded_window_no_global_sort(spark):
    """Sequence packing is num_shards INDEPENDENT cumulative sums: one
    hash-partition exchange on the shard key feeds the window; a global
    range sort (Exchange rangepartitioning — the thing that cannot scale
    to 100 TB of docs) must never appear."""
    plan = _plan(suite.q_doc_packing(spark, SF_DIR))
    assert "Exchange rangepartitioning" not in plan
    import re
    assert len(re.findall(r"Exchange hashpartitioning", plan)) <= 1
    assert "Window" in plan


def test_embedding_neardup_np_groups_blocks_no_cross_join(spark, emb):
    """The BLAS near-dup kernel is a per-block gram matrix inside
    applyInPandas: ONE hash exchange on the block key, no cartesian /
    broadcast-nested-loop pair join at any corpus size."""
    from vector_db_api_spark.operators import dedup as D

    df = D.embedding_neardup_pairs_numpy(
        emb, threshold=suite.NEARDUP_THRESHOLD, id_col="vec_id",
        block_col="label",
    ).select("left_id", "right_id")
    plan = _plan(df)
    assert "FlatMapGroupsInPandas" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    import re
    assert len(re.findall(r"Exchange hashpartitioning", plan)) <= 1


def test_pq_encode_fuses_with_scan_no_shuffle(spark, emb):
    """The PQ build's distributed half — encoding the corpus to codes —
    is one mapInPandas fused with the scan: no exchange at any corpus
    size (training is a driver-side k-means on a bounded sample by
    construction; encode is the part that scales)."""
    from vector_db_api_spark.operators.pq import PQIndex

    pqm = PQIndex.train(emb, m=8, k=64, seed=42)
    plan = _plan(pqm.encode(emb, id_col="vec_id"))
    assert "MapInPandas" in plan
    assert "Exchange" not in plan


def test_rel_pricing_summary_partial_agg_single_exchange(spark):
    """TPC-H Q1 shape: map-side partial aggregate, ONE hash exchange on
    the two grouping keys, final aggregate — and the scan reads only the
    six referenced columns (column pruning reaches parquet)."""
    import re

    df = suite.q_rel_pricing_summary(spark, SF_DIR)
    plan = _plan(df)
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
    assert plan.count("HashAggregate") >= 2  # partial + final
    # pruning proof: the scan lists only referenced columns (the plan
    # string truncates long schemas, so assert on presence/absence)
    assert "ReadSchema: struct<l_quantity" in plan
    for unread in ("l_orderkey", "l_comment", "l_shipdate"):
        assert unread not in plan, f"scan reads unreferenced {unread}"


def test_events_first_seen_partial_group_limit_before_shuffle(spark):
    """First-seen dedup is a per-fingerprint top-1: the WindowGroupLimit
    must run map-side (Partial) BEFORE the single hash exchange — at
    100 TB the shuffle carries one candidate row per (fingerprint,
    partition), not the raw event stream. No global range sort."""
    import re

    plan = _plan(suite.q_events_first_seen(spark, SF_DIR))
    partial = re.search(r"WindowGroupLimit .*Partial", plan)
    exch = re.search(r"Exchange hashpartitioning", plan)
    assert partial and exch and partial.start() > exch.start(), \
        "partial group-limit must sit below (after in plan text) the exchange"
    assert len(re.findall(r"Exchange", plan)) == 1
    assert "rangepartitioning" not in plan


def test_events_asof_is_union_window_no_join(spark):
    """The as-of join is the union-then-window plan: both sides union,
    ONE hash exchange on the key, last() over the ordered window — no
    join operator of any kind (a time-travel sort-merge or nested-loop
    would be the non-scalable alternative), and the build side's literal
    filter reaches the parquet scan."""
    import re

    plan = _plan(suite.q_events_asof(spark, SF_DIR))
    assert "Union" in plan and "Window" in plan
    for op in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
               "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert op not in plan, f"as-of plan grew a {op}"
    # one exchange for the union-window key; the suite entry's output
    # ordering may add at most one more — never a per-side join shuffle
    assert len(re.findall(r"Exchange hashpartitioning", plan)) <= 2
    assert "PushedFilters: [IsNotNull(event_type), EqualTo(event_type," in plan


def test_doc_sample_hash_single_stage_no_shuffle(spark):
    """Hash-mod sampling is one whole-stage-codegen filter fused with the
    scan: zero exchanges at any corpus size, and the scan reads only the
    projected columns."""
    plan = _plan(suite.q_doc_sample_hash(spark, SF_DIR))
    assert "Exchange" not in plan
    assert "WholeStageCodegen" in _plan(
        suite.q_doc_sample_hash(spark, SF_DIR)) or "*(1)" in plan
    assert "ReadSchema: struct<doc_id:bigint,lang:string>" in plan
