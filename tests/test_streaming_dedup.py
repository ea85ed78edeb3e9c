"""Streaming dedup: the stream must produce the batch answer on the same
files (first_seen_dedup), and bounded-state dedup must keep exactly one row
per fingerprint."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_db_api_spark.sources.tables import load_table
from vector_db_api_spark.streaming.dedup import (
    content_fingerprint,
    exact_dedup,
    first_seen_dedup,
)

SF_DIR = "/root/testdata/sf0.001"

STREAM_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string, fp string"
)


def _fingerprinted_events(spark):
    return load_table(spark, SF_DIR, "events").withColumn(
        "fp", content_fingerprint("event_type", "props")
    )


def test_content_fingerprint_null_safety(spark):
    df = spark.createDataFrame(
        [("a", None), ("a", ""), (None, "b")], "x string, y string"
    ).select(content_fingerprint("x", "y").alias("fp"))
    fps = [r.fp for r in df.collect()]
    # null and empty string hash identically (documented coalesce), but
    # ('a', None) must never collide with (None, 'b')
    assert fps[0] == fps[1]
    assert fps[0] != fps[2]


def test_first_seen_batch_keeps_min_order_row(spark):
    ev = _fingerprinted_events(spark)
    got = first_seen_dedup(ev, "fp", "event_id")
    want = ev.groupBy("fp").agg(F.min("event_id").alias("event_id"))
    assert got.count() == ev.select("fp").distinct().count()
    assert got.join(want, ["fp", "event_id"]).count() == want.count()


def test_first_seen_stream_matches_batch(spark, tmp_path):
    ev = _fingerprinted_events(spark)
    src = str(tmp_path / "in")
    ev.write.parquet(src)

    stream = spark.readStream.schema(STREAM_SCHEMA).parquet(src)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        first_seen_dedup(stream, "fp", "event_id")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = spark.read.parquet(out).select("fp", "event_id")
    want = first_seen_dedup(ev, "fp", "event_id").select("fp", "event_id")
    assert got.count() == want.count()
    assert got.join(want, ["fp", "event_id"]).count() == want.count()


def test_first_seen_stream_tombstones_across_batches(spark, tmp_path):
    ev = _fingerprinted_events(spark)
    src = str(tmp_path / "in")
    ev.filter(F.col("event_id") < 100).write.parquet(src)

    stream = spark.readStream.schema(STREAM_SCHEMA).parquet(src)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def drain():
        q = (
            first_seen_dedup(stream, "fp", "event_id")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    n1 = spark.read.parquet(out).count()

    # second batch re-sends the SAME fingerprints (plus nothing new):
    # every group is tombstoned, so the stream must emit zero new rows
    ev.filter(F.col("event_id") < 100).withColumn(
        "event_id", F.col("event_id") + 1000000
    ).write.mode("append").parquet(src)
    drain()
    n2 = spark.read.parquet(out).count()
    assert n1 == n2


def test_exact_dedup_stream_bounded_state(spark, tmp_path):
    ev = _fingerprinted_events(spark)
    src = str(tmp_path / "in")
    ev.write.parquet(src)

    stream = spark.readStream.schema(STREAM_SCHEMA).parquet(src)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        exact_dedup(stream, "fp", ts_col="ts", watermark="2 hours")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = spark.read.parquet(out)
    # dropDuplicatesWithinWatermark guarantees: no fingerprint duplicated
    # within the horizon; every fingerprint represented at least once
    assert got.groupBy("fp").count().filter("count > 1").count() == 0
    assert got.select("fp").distinct().count() == ev.select("fp").distinct().count()


def test_exact_dedup_batch_one_row_per_fp(spark):
    ev = _fingerprinted_events(spark)
    got = exact_dedup(ev, "fp")
    assert got.count() == ev.select("fp").distinct().count()


def test_incremental_neardup_flags_cross_batch(spark, tmp_path):
    from vector_db_api_spark.streaming.dedup import incremental_neardup_ingest

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    src = str(tmp_path / "nd_in")
    first = docs.filter(F.col("doc_id") < 50)
    first.write.parquet(src)

    buckets = str(tmp_path / "nd_buckets")
    flags = str(tmp_path / "nd_flags")
    ckpt = str(tmp_path / "nd_ckpt")
    stream = spark.readStream.schema("doc_id bigint, text string").parquet(src)

    def drain():
        q = incremental_neardup_ingest(stream, buckets, flags, ckpt)
        q.awaitTermination(180)

    drain()
    n_buckets_1 = spark.read.parquet(buckets).count()
    assert n_buckets_1 == 50 * 4  # 50 docs × 4 bands

    # batch 2: exact copies of docs 0-4 under new ids → must flag against
    # the PERSISTED state from batch 1, not a rescan
    dup = (
        docs.filter(F.col("doc_id") < 5)
        .withColumn("doc_id", F.col("doc_id") + 900000)
    )
    dup.write.mode("append").parquet(src)
    drain()

    got = spark.read.parquet(flags)
    cross = {(r["new_id"], r["dup_of"]) for r in got.collect()}
    for i in range(5):
        assert (str(900000 + i), str(i)) in cross, cross
    # bucket state grew by the delta only
    assert spark.read.parquet(buckets).count() == n_buckets_1 + 5 * 4


def test_trending_stream_matches_batch(spark, tmp_path):
    """Rollup in the stream, rank on the sink: the per-window top-k read
    off the streaming sink equals trending over the batch rollup (for the
    windows the watermark has closed — append mode holds the rest back)."""
    from pyspark.sql import functions as F

    from vector_db_api_spark.sources.tables import load_table
    from vector_db_api_spark.streaming.ingest import (
        hourly_event_rollup,
        trending_event_types,
        windowed_event_counts,
    )

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    src = str(tmp_path / "in")
    events.write.parquet(src)
    out, ck = str(tmp_path / "rollup"), str(tmp_path / "ck")
    q = hourly_event_rollup(spark, src, out, ck)
    q.awaitTermination(120)

    max_ts = events.agg(F.max("ts")).collect()[0][0]
    closed = F.col("window_start") < F.expr(
        f"timestamp'{max_ts}' - interval 3 hours"
    )
    streamed = sorted(map(tuple, trending_event_types(
        spark.read.parquet(out).filter(closed)).collect()))
    batch = sorted(map(tuple, trending_event_types(
        windowed_event_counts(events).filter(closed)).collect()))
    assert streamed == batch
    assert len(batch) > 0


def test_streaming_decontaminate_matches_batch(spark, tmp_path):
    """Flags produced by the stream equal the batch operator's pairs;
    a drained re-run adds nothing."""
    from vector_db_api_spark.operators.decontaminate import contamination_pairs
    from vector_db_api_spark.streaming.dedup import streaming_decontaminate

    bench_q = "which moon of jupiter has the largest subsurface ocean volume"
    train = spark.createDataFrame(
        [
            (1, f"article quoting the benchmark: {bench_q} verbatim inside"),
            (2, "entirely unrelated training document about spark shuffles"),
            (3, f"another copy embedding {bench_q} with extra words"),
        ],
        "doc_id bigint, text string",
    )
    bench = spark.createDataFrame(
        [(100, bench_q)], "bench_id bigint, text string"
    )
    src = str(tmp_path / "docs")
    train.write.parquet(src)
    flags_path, ck = str(tmp_path / "flags"), str(tmp_path / "ck")

    q = streaming_decontaminate(
        spark, src, "doc_id bigint, text string", bench, flags_path, ck
    )
    q.awaitTermination(120)

    got = sorted(
        (r["train_id"], r["bench_id"], r["n_shared"])
        for r in spark.read.parquet(flags_path).collect()
    )
    want = sorted(
        (r["train_id"], r["bench_id"], r["n_shared"])
        for r in contamination_pairs(train, bench).collect()
    )
    assert got == want and {g[0] for g in got} == {1, 3}

    q2 = streaming_decontaminate(
        spark, src, "doc_id bigint, text string", bench, flags_path, ck
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(flags_path).count() == len(want)


def test_incremental_semdedup_reingest_is_noop(spark, tmp_path):
    """Re-ingesting already-admitted vectors in a later run admits no
    second copy: each is within ε of itself in the state, so history
    self-heals without any max-epoch dedup."""
    import numpy as np

    from vector_db_api_spark.streaming.dedup import incremental_semdedup_ingest

    rng = np.random.default_rng(4)
    c = rng.standard_normal((4, 8))
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    rows = [
        (i, [float(x) for x in v])
        for i, v in enumerate(rng.standard_normal((40, 8)) * 3.0)
    ]
    # degenerate rows must be admitted once and stay single across re-ingest
    rows += [(100, None), (101, [0.0] * 8)]
    df = spark.createDataFrame(rows, "doc_id long, embedding array<float>")
    src, sp = str(tmp_path / "src"), str(tmp_path / "state")
    df.write.mode("overwrite").parquet(src)

    def run(i):
        stream = spark.readStream.schema(
            "doc_id long, embedding array<float>"
        ).parquet(src)
        q = incremental_semdedup_ingest(
            stream, sp, str(tmp_path / f"ck{i}"), c, 0.4,
            id_col="doc_id", epoch_offset=i * 1_000_000,
        )
        q.awaitTermination(300)

    run(0)
    first = sorted(r["doc_id"] for r in spark.read.parquet(sp).collect())
    run(1)  # same rows arrive again as a fresh run
    again = sorted(r["doc_id"] for r in spark.read.parquet(sp).collect())
    assert again == first


def test_incremental_semdedup_dedups_ids_within_batch(spark, tmp_path):
    """Two rows with the SAME id in one micro-batch tie on (csim, id) in the
    stage-1 priority (neither outranks the other), so without the in-batch
    id dedup BOTH would be admitted. Exactly one state row per id must
    survive."""
    import numpy as np

    from vector_db_api_spark.streaming.dedup import incremental_semdedup_ingest

    rng = np.random.default_rng(9)
    c = rng.standard_normal((3, 6))
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    vecs = rng.standard_normal((5, 6)) * 3.0
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    rows += rows[:3]  # exact duplicate ids within the same batch
    rows.append((50, None))
    rows.append((50, None))  # duplicate embedding-less id too
    df = spark.createDataFrame(rows, "doc_id long, embedding array<float>")
    src, sp = str(tmp_path / "src"), str(tmp_path / "state")
    df.coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema("doc_id long, embedding array<float>").parquet(src)
    q = incremental_semdedup_ingest(
        stream, sp, str(tmp_path / "ck"), c, 0.999, id_col="doc_id"
    )
    q.awaitTermination(300)
    state = spark.read.parquet(sp)
    ids = [r["doc_id"] for r in state.collect()]
    assert len(ids) == len(set(ids)), f"duplicate state rows: {sorted(ids)}"
    assert set(ids) == {0, 1, 2, 3, 4, 50}


# ---------------------------------------------------------------------------
# continuous span dedup (incremental_span_dedup_ingest)
# ---------------------------------------------------------------------------

def _span_docs(spark):
    shared = "alpha beta gamma delta"
    rows = [
        (1, f"{shared} first copy stays intact here"),
        (2, f"early prefix {shared} later words follow"),
        (3, "completely unrelated text in this one"),
        # second half (streams in the later batch)
        (10, f"batch two opens with {shared} inside"),
        (11, "batch two unique sentence with fresh words"),
        (12, f"{shared} again at the very start"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _run_span_stream(spark, tmp_path, docs, split_id, n=4, runs=(0, 1)):
    from vector_db_api_spark.streaming.dedup import incremental_span_dedup_ingest

    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    docs.filter(F.col("doc_id") <= split_id).write.mode("overwrite").parquet(a)
    docs.filter(F.col("doc_id") > split_id).write.mode("overwrite").parquet(b)
    for i, src in zip(runs, (a, b)):
        stream = spark.readStream.schema("doc_id bigint, text string").parquet(src)
        q = incremental_span_dedup_ingest(
            stream, str(tmp_path / "state"), str(tmp_path / "out"),
            str(tmp_path / f"ck{i}"), n=n, epoch_offset=i * 1_000_000,
        )
        assert q.awaitTermination(300)
    return str(tmp_path / "out")


def test_span_stream_matches_batch(spark, tmp_path):
    from vector_db_api_spark.operators.span_dedup import span_dedup

    docs = _span_docs(spark)
    out = _run_span_stream(spark, tmp_path, docs, split_id=3)
    cols = ["doc_id", "n_tokens", "n_tokens_removed", "n_spans", "clean_text"]
    got = sorted(
        tuple(r[c] for c in cols)
        for r in spark.read.parquet(out).select(*cols).collect()
    )
    want = sorted(
        tuple(r[c] for c in cols) for r in span_dedup(docs, n=4).collect()
    )
    assert got == want
    # and the state hit actually fired: doc 10/12 lost the shared span
    by_id = {t[0]: t for t in got}
    assert by_id[1][2] == 0            # first copy intact
    assert by_id[10][2] == 4 and by_id[12][2] == 4


def test_span_stream_second_run_overwrites_its_epoch(spark, tmp_path):
    """Replaying batch B as a fresh run with the SAME epoch ids must leave
    the out/state tables unchanged (dynamic epoch overwrite + current-epoch
    exclusion on the state read): at-least-once delivery cannot
    double-remove or double-admit."""
    docs = _span_docs(spark)
    out = _run_span_stream(spark, tmp_path, docs, split_id=3)
    first_out = sorted(map(tuple, spark.read.parquet(out).collect()))
    first_state = sorted(
        map(tuple, spark.read.parquet(str(tmp_path / "state")).collect())
    )
    # re-run batch B against the same state dir with the same epoch_offset
    from vector_db_api_spark.streaming.dedup import incremental_span_dedup_ingest

    stream = spark.readStream.schema("doc_id bigint, text string").parquet(
        str(tmp_path / "b")
    )
    q = incremental_span_dedup_ingest(
        stream, str(tmp_path / "state"), out, str(tmp_path / "ck_retry"),
        n=4, epoch_offset=1 * 1_000_000,
    )
    assert q.awaitTermination(300)
    assert sorted(map(tuple, spark.read.parquet(out).collect())) == first_out
    assert sorted(
        map(tuple, spark.read.parquet(str(tmp_path / "state")).collect())
    ) == first_state


def test_span_stream_state_holds_one_row_per_admitted_gram(spark, tmp_path):
    docs = _span_docs(spark)
    _run_span_stream(spark, tmp_path, docs, split_id=3)
    state = spark.read.parquet(str(tmp_path / "state"))
    ghs = [r["__gh"] for r in state.select("__gh").collect()]
    assert len(ghs) == len(set(ghs)), "a gram was admitted twice"
    # the shared 4-gram's first occurrence is doc 1 start 0
    firsts = {(r["first_id"], r["first_start"]) for r in state.collect()}
    assert (1, 0) in firsts


def test_streaming_semantic_decontaminate_matches_batch(spark, tmp_path):
    """r14: the embedding gate's per-batch flags union to the batch
    operator's exact pair set (stateless — the benchmark is static), for
    BOTH kernels: exact fused-matmul default and the cell-blocked opt-in
    at full probing (where blocked == exact by the soundness anchor)."""
    import numpy as np

    from vector_db_api_spark.operators.decontaminate import (
        semantic_contamination_pairs,
    )
    from vector_db_api_spark.streaming.dedup import (
        streaming_semantic_decontaminate,
    )

    rng = np.random.default_rng(31)
    base = rng.standard_normal((20, 8))
    train = spark.createDataFrame(
        [(i, [float(x) for x in (base[i % 5] + 0.05 * rng.standard_normal(8))])
         for i in range(16)] + [(90, [0.0] * 8), (91, None)],
        "doc_id bigint, embedding array<double>")
    bench = spark.createDataFrame(
        [(100 + i, [float(x) for x in base[i]]) for i in range(3)],
        "bench_id bigint, embedding array<double>")
    src = str(tmp_path / "vecs")
    train.write.parquet(src)
    want = sorted(
        (r["doc_id"], r["bench_id"])
        for r in semantic_contamination_pairs(train, bench, 0.8).collect()
    )
    assert want, "fixture produced no contaminated pairs"

    q = streaming_semantic_decontaminate(
        spark, src, "doc_id bigint, embedding array<double>", bench, 0.8,
        str(tmp_path / "flags"), str(tmp_path / "ck"),
    )
    q.awaitTermination(120)
    got = sorted(
        (r["doc_id"], r["bench_id"])
        for r in spark.read.parquet(str(tmp_path / "flags")).collect()
    )
    assert got == want

    cent = rng.standard_normal((4, 8))
    q2 = streaming_semantic_decontaminate(
        spark, src, "doc_id bigint, embedding array<double>", bench, 0.8,
        str(tmp_path / "flags_blk"), str(tmp_path / "ck_blk"),
        centroids=cent, nprobe=len(cent),
    )
    q2.awaitTermination(120)
    got_blk = sorted(
        (r["doc_id"], r["bench_id"])
        for r in spark.read.parquet(str(tmp_path / "flags_blk")).collect()
    )
    assert got_blk == want


def test_streaming_semantic_decontaminate_zero_flags_reads_empty(
    spark, tmp_path
):
    """A drain that flags NOTHING writes no partition at all (dynamic
    overwrite of an empty frame creates no files), so the flags path may
    not exist — found by the r15 generated-corpus sweep, where no
    cross-split cosine clears the threshold. read_flags must serve the
    typed empty set instead of PATH_NOT_FOUND."""
    import numpy as np

    from vector_db_api_spark.streaming.dedup import (
        read_flags,
        streaming_semantic_decontaminate,
    )

    rng = np.random.default_rng(5)
    # orthogonal one-hot train vs bench rows: max cosine 0.0 < threshold
    train = [(i, [0.0] * i + [1.0] + [0.0] * (7 - i)) for i in range(4)]
    bench_rows = [(100 + i, [0.0] * (4 + i) + [1.0] + [0.0] * (3 - i))
                  for i in range(4)]
    bench = spark.createDataFrame(
        bench_rows, "bench_id bigint, embedding array<double>")
    src = str(tmp_path / "src")
    spark.createDataFrame(
        train, "doc_id bigint, embedding array<double>"
    ).write.parquet(src)
    q = streaming_semantic_decontaminate(
        spark, src, "doc_id bigint, embedding array<double>", bench, 0.5,
        str(tmp_path / "flags"), str(tmp_path / "ck"),
    )
    q.awaitTermination(120)
    served = read_flags(
        spark, str(tmp_path / "flags"), "doc_id bigint, bench_id bigint")
    assert served.count() == 0
    assert [f.name for f in served.schema.fields] == ["doc_id", "bench_id"]
