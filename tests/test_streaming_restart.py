"""Restart-under-fire for the custom stateful streaming operators
(r9 verdict #8).

The existing streaming tests drain ``availableNow`` twice (state continuity
across RUNS); these kill a stream at the worst moment INSIDE a run and
resume from the checkpoint. The crash point simulated is the real one:
``foreachBatch`` has fully written epoch N's state, but the engine dies
before committing ``commits/N`` in the checkpoint — Structured Streaming's
at-least-once window. On restart the engine REPLAYS epoch N (same offsets,
same epoch id) against state that already contains N's writes, then
continues with the remaining batches. Every stateful sink here must make
that replay idempotent:

- epoch-stamped dynamic partition overwrite (bm25 postings / KMV): the
  replayed epoch overwrites exactly its own partition;
- SemDeDup: the state read EXCLUDES the epoch being written, so the replay
  recomputes the identical partition (streaming/dedup.py docstring,
  'Epoch retries');
- applyInPandasWithState (first_seen): the state store rolls back to the
  version at the replayed batch's start, and the parquet file sink's own
  commit log makes its output exactly-once.

Each test: run an UNINTERRUPTED 3-batch reference, then an interrupted run
(batch 1 → crash between state write and checkpoint commit → restart
drains the replay + batches 2..3), and asserts the served state is
identical. Trending/hourly rollups ride Spark's managed aggregation state
(exactly-once by the engine) and are covered by the stream-vs-batch
oracles."""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import functions as F


def _crash_after_state_write(ckpt: str) -> int:
    """Simulate the mid-batch crash: the newest epoch's state landed but
    its checkpoint commit did not. Returns the epoch that will replay."""
    cdir = os.path.join(ckpt, "commits")
    ids = sorted(int(n) for n in os.listdir(cdir) if n.lstrip("-").isdigit())
    os.remove(os.path.join(cdir, str(ids[-1])))
    # the checksummed local FS writes a '.N.crc' sidecar per commit file;
    # a leftover sidecar makes the engine's re-commit rename fail
    crc = os.path.join(cdir, f".{ids[-1]}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    return ids[-1]


def _three_files(df, src: str, splits) -> None:
    """Write ``df`` as three single-file batches in a deterministic order
    (FileStreamSource picks up files by modification time, so sequential
    writes fix the batch order for both runs)."""
    for cond in splits:
        df.filter(cond).coalesce(1).write.mode("append").parquet(src)


def test_bm25_postings_restart_replays_epoch_idempotently(spark, tmp_path):
    from vector_db_api_spark.operators.keyword import bm25_scores_postings
    from vector_db_api_spark.streaming.ingest import (
        incremental_postings_ingest,
        latest_rows,
    )

    docs = spark.createDataFrame(
        [(i, f"tok{i % 7} tok{i % 3} common word{i}") for i in range(60)],
        "doc_id bigint, text string",
    )
    splits = [F.col("doc_id") < 20,
              (F.col("doc_id") >= 20) & (F.col("doc_id") < 40),
              F.col("doc_id") >= 40]
    schema = "doc_id bigint, text string"

    def serve(pp, dp):
        postings = latest_rows(spark.read.parquet(pp))
        doclens = latest_rows(spark.read.parquet(dp))
        return {
            tuple(r) for r in bm25_scores_postings(
                postings, doclens, "tok1 common"
            ).collect()
        }

    # uninterrupted reference: all 3 files, 3 epochs
    ref_src = str(tmp_path / "ref_src")
    _three_files(docs, ref_src, splits)
    q = incremental_postings_ingest(
        spark, ref_src, schema, str(tmp_path / "ref_pp"),
        str(tmp_path / "ref_dp"), str(tmp_path / "ref_ck"),
        max_files_per_trigger=1,
    )
    q.awaitTermination(300)
    want = serve(str(tmp_path / "ref_pp"), str(tmp_path / "ref_dp"))

    # interrupted run: batch 1, crash after its state write, restart
    src, pp, dp, ck = (str(tmp_path / d) for d in ("src", "pp", "dp", "ck"))
    _three_files(docs, src, splits[:1])
    q = incremental_postings_ingest(
        spark, src, schema, pp, dp, ck, max_files_per_trigger=1)
    q.awaitTermination(300)
    assert _crash_after_state_write(ck) == 0
    _three_files(docs, src, splits[1:])
    q = incremental_postings_ingest(
        spark, src, schema, pp, dp, ck, max_files_per_trigger=1)
    q.awaitTermination(300)
    assert serve(pp, dp) == want


def test_kmv_restart_replays_epoch_idempotently(spark, tmp_path):
    from vector_db_api_spark.streaming.ingest import (
        incremental_kmv_ingest,
        served_kmv_estimates,
    )

    ev = spark.createDataFrame(
        [(f"t{i % 4}", f"u{i % 23}", i) for i in range(200)],
        "event_type string, user_id string, rk int",
    )
    splits = [F.col("rk") < 70, (F.col("rk") >= 70) & (F.col("rk") < 140),
              F.col("rk") >= 140]
    schema = "event_type string, user_id string, rk int"

    def serve(sp):
        return {
            (r["event_type"], r["est_distinct"])
            for r in served_kmv_estimates(spark, sp, ["event_type"]).collect()
        }

    ref_src, ref_sp = str(tmp_path / "rsrc"), str(tmp_path / "rsp")
    _three_files(ev, ref_src, splits)
    q = incremental_kmv_ingest(
        spark, ref_src, schema, ref_sp, str(tmp_path / "rck"),
        ["event_type"], "user_id", max_files_per_trigger=1)
    q.awaitTermination(300)
    want = serve(ref_sp)

    src, sp, ck = (str(tmp_path / d) for d in ("src", "sp", "ck"))
    _three_files(ev, src, splits[:1])
    q = incremental_kmv_ingest(
        spark, src, schema, sp, ck, ["event_type"], "user_id",
        max_files_per_trigger=1)
    q.awaitTermination(300)
    assert _crash_after_state_write(ck) == 0
    _three_files(ev, src, splits[1:])
    q = incremental_kmv_ingest(
        spark, src, schema, sp, ck, ["event_type"], "user_id",
        max_files_per_trigger=1)
    q.awaitTermination(300)
    assert serve(sp) == want


def test_semdedup_restart_replays_epoch_idempotently(spark, tmp_path):
    from vector_db_api_spark.streaming.dedup import incremental_semdedup_ingest

    rng = np.random.default_rng(7)
    c = rng.standard_normal((4, 8))
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    base = rng.standard_normal((30, 8)) * 3.0
    # near-dups across the batch boundary: rows 30..39 are jittered copies
    # of rows 0..9, so the replayed epoch's admissions must suppress them
    # identically in both runs
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(base)]
    rows += [
        (30 + j, [float(x) for x in base[j] + 1e-4 * rng.standard_normal(8)])
        for j in range(10)
    ]
    df = spark.createDataFrame(rows, "doc_id long, embedding array<float>")
    splits = [F.col("doc_id") < 15, (F.col("doc_id") >= 15) & (F.col("doc_id") < 30),
              F.col("doc_id") >= 30]
    schema = "doc_id long, embedding array<float>"

    def run(src, sp, ck):
        stream = spark.readStream.schema(schema).option(
            "maxFilesPerTrigger", 1).parquet(src)
        q = incremental_semdedup_ingest(stream, sp, ck, c, 0.9,
                                        id_col="doc_id")
        q.awaitTermination(300)

    ref_src, ref_sp = str(tmp_path / "rsrc"), str(tmp_path / "rsp")
    _three_files(df, ref_src, splits)
    run(ref_src, ref_sp, str(tmp_path / "rck"))
    want = sorted(r["doc_id"] for r in spark.read.parquet(ref_sp).collect())
    assert want, "reference run admitted nothing — test data broken"

    src, sp, ck = (str(tmp_path / d) for d in ("src", "sp", "ck"))
    _three_files(df, src, splits[:1])
    run(src, sp, ck)
    assert _crash_after_state_write(ck) == 0
    _three_files(df, src, splits[1:])
    run(src, sp, ck)
    got = sorted(r["doc_id"] for r in spark.read.parquet(sp).collect())
    assert got == want


def test_first_seen_restart_replays_batch_exactly_once(spark, tmp_path):
    """applyInPandasWithState: on replay the state store rolls back to the
    replayed batch's starting version and the parquet sink's commit log
    drops the duplicate output, so the interrupted run's sink equals the
    uninterrupted run's."""
    from vector_db_api_spark.streaming.dedup import (
        content_fingerprint,
        first_seen_dedup,
    )

    ev = spark.createDataFrame(
        [(i, f"payload{i % 25}") for i in range(100)],
        "event_id bigint, payload string",
    ).withColumn("fp", content_fingerprint("payload"))
    splits = [F.col("event_id") < 25, (F.col("event_id") >= 25) & (F.col("event_id") < 50),
              F.col("event_id") >= 50]
    schema = "event_id bigint, payload string, fp string"

    def run(src, out, ck):
        stream = spark.readStream.schema(schema).option(
            "maxFilesPerTrigger", 1).parquet(src)
        q = (
            first_seen_dedup(stream, "fp", "event_id")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    ref_src, ref_out = str(tmp_path / "rsrc"), str(tmp_path / "rout")
    _three_files(ev, ref_src, splits)
    run(ref_src, ref_out, str(tmp_path / "rck"))
    want = {(r["fp"], r["event_id"])
            for r in spark.read.parquet(ref_out).collect()}
    assert len(want) == 25  # one winner per distinct payload

    src, out, ck = (str(tmp_path / d) for d in ("src", "out", "ck"))
    _three_files(ev, src, splits[:1])
    run(src, out, ck)
    assert _crash_after_state_write(ck) == 0
    _three_files(ev, src, splits[1:])
    run(src, out, ck)
    got = {(r["fp"], r["event_id"])
           for r in spark.read.parquet(out).collect()}
    assert got == want


def test_composed_curate_restart_replays_epoch_idempotently(spark, tmp_path):
    """r12 verdict #8: the COMPOSED curation stream (Gopher gate → span
    dedup → near-dup admission, streaming/curate.py) under the same
    mid-batch crash: epoch 0's gram state, bucket state AND admitted
    output all landed, the checkpoint commit did not. The replay must
    reproduce all three sinks bit-for-bit and the final admitted set must
    equal the uninterrupted run's."""
    from vector_db_api_spark.streaming.curate import incremental_curate_ingest

    boiler = "the shared boilerplate span that repeats across documents verbatim"
    rows = []
    for i in range(36):
        body = " ".join(f"the unique{i} w{i}x{j}" for j in range(8))
        # docs 24..35 carry the boilerplate (span dedup work across the
        # crash boundary); docs 30..35 duplicate 24..29's cleaned text
        # closely enough to share minhash buckets (near-dup admissions)
        if i >= 24:
            body = f"{boiler} {body if i < 30 else rows[i - 6][1].split(boiler)[1].strip()}"
        rows.append((i, body))
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    splits = [F.col("doc_id") < 12,
              (F.col("doc_id") >= 12) & (F.col("doc_id") < 24),
              F.col("doc_id") >= 24]
    schema = "doc_id bigint, text string"
    gates = {"min_words": 5, "min_stopwords": 1}

    def run(src, st, out, ck):
        stream = spark.readStream.schema(schema).option(
            "maxFilesPerTrigger", 1).parquet(src)
        q = incremental_curate_ingest(
            stream, st, out, ck, n=4, gopher_thresholds=gates)
        q.awaitTermination(300)

    def admitted(out):
        return sorted(
            (r["doc_id"], r["text"])
            for r in spark.read.parquet(out).collect()
        )

    ref = {d: str(tmp_path / f"r{d}") for d in ("src", "st", "out", "ck")}
    _three_files(df, ref["src"], splits)
    run(ref["src"], ref["st"], ref["out"], ref["ck"])
    want = admitted(ref["out"])
    assert want, "reference run admitted nothing — fixture broken"
    assert len(want) < 36, "nothing was ever gated/deduped — fixture weak"

    live = {d: str(tmp_path / d) for d in ("src", "st", "out", "ck")}
    _three_files(df, live["src"], splits[:1])
    run(live["src"], live["st"], live["out"], live["ck"])
    assert _crash_after_state_write(live["ck"]) == 0
    _three_files(df, live["src"], splits[1:])
    run(live["src"], live["st"], live["out"], live["ck"])
    assert admitted(live["out"]) == want
