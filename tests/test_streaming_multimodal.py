"""Structured Streaming ingest (rollup == batch; incremental index delta)
and multimodal binary-column plumbing."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from vector_db_api_spark.operators import dedup as D
from vector_db_api_spark.operators.lsh import SignLSH
from vector_db_api_spark.operators.multimodal import (
    derive_media,
    extract_features,
    media_stats,
)
from vector_db_api_spark.sources.tables import load_table
from vector_db_api_spark.streaming.ingest import (
    hourly_event_rollup,
    incremental_index_ingest,
    windowed_event_counts,
)

SF_DIR = "/root/testdata/sf0.001"


def test_stream_rollup_matches_batch(spark, tmp_path):
    events = load_table(spark, SF_DIR, "events")
    src = str(tmp_path / "in")
    events.write.parquet(src)

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = hourly_event_rollup(spark, src, out, ckpt, available_now=True)
    q.awaitTermination(120)

    got = spark.read.parquet(out)
    want = windowed_event_counts(events)
    # append mode holds back windows still inside the watermark horizon
    # (window_end > max_ts - 2h) — every CLOSED window must be emitted
    max_ts = events.agg(F.max("ts")).collect()[0][0]
    closed = want.filter(
        F.col("window_start") + F.expr("INTERVAL 3 HOURS") <= F.lit(max_ts)
    )
    key = ["window_start", "event_type"]
    assert got.join(closed, key, "left_semi").count() == closed.count()
    assert (
        got.join(want, key)
        .filter(
            (got["n_events"] != want["n_events"])
            | (got["value_cents"] != want["value_cents"])
        )
        .count()
        == 0
    )
    # nothing emitted that the batch plan doesn't have
    assert got.join(want, key, "left_anti").count() == 0


def test_incremental_index_ingest_appends_delta(spark, tmp_path, clustered_df):
    model = SignLSH(dim=32, num_tables=2, hyperplanes_per_table=8, seed=3)
    src = str(tmp_path / "chunks")
    first = clustered_df.filter(F.col("id") < 100)
    first.write.parquet(src)

    buckets, ckpt = str(tmp_path / "buckets"), str(tmp_path / "ckpt")
    stream = spark.readStream.schema(
        "id bigint, embedding array<float>, label int"
    ).parquet(src)
    q = incremental_index_ingest(stream, model, buckets, ckpt, available_now=True)
    q.awaitTermination(120)
    n1 = spark.read.parquet(buckets).count()
    assert n1 == 100 * 2  # rows × tables

    # new files arriving later are hashed as a DELTA, not a rebuild
    clustered_df.filter((F.col("id") >= 100) & (F.col("id") < 150)).write.mode(
        "append"
    ).parquet(src)
    q2 = incremental_index_ingest(stream, model, buckets, ckpt, available_now=True)
    q2.awaitTermination(120)
    assert spark.read.parquet(buckets).count() == n1 + 50 * 2
    # delta signatures identical to batch-computed ones
    batch_sigs = model.signatures(clustered_df.filter(F.col("id") < 150))
    streamed = spark.read.parquet(buckets)
    assert (
        streamed.join(batch_sigs, ["id", "table_id"])
        .filter(streamed["signature"] != batch_sigs["signature"])
        .count()
        == 0
    )


def test_incremental_index_ingest_replay_is_idempotent(spark, tmp_path, clustered_df):
    """foreachBatch is at-least-once: replaying a micro-batch (fresh
    checkpoint over the same files ⇒ same epoch ids) must overwrite its own
    epoch partitions, not double-append index rows (ADVICE r2)."""
    model = SignLSH(dim=32, num_tables=2, hyperplanes_per_table=8, seed=3)
    src = str(tmp_path / "chunks")
    clustered_df.filter(F.col("id") < 60).write.parquet(src)
    buckets = str(tmp_path / "buckets")
    stream = spark.readStream.schema(
        "id bigint, embedding array<float>, label int"
    ).parquet(src)
    q = incremental_index_ingest(
        stream, model, buckets, str(tmp_path / "ckpt1"), available_now=True
    )
    q.awaitTermination(120)
    n1 = spark.read.parquet(buckets).count()
    assert n1 == 60 * 2
    # replay epoch 0 (new checkpoint, same input) — simulates a retried batch
    q2 = incremental_index_ingest(
        stream, model, buckets, str(tmp_path / "ckpt2"), available_now=True
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(buckets).count() == n1  # overwrote, not doubled


def test_incremental_ivf_delta(spark, tmp_path, clustered_df):
    from vector_db_api_spark.operators.ivf import IVFIndex

    ivf = IVFIndex.train(clustered_df, num_centroids=8, seed=5)
    src = str(tmp_path / "chunks")
    clustered_df.filter(F.col("id") < 80).write.parquet(src)
    posting, ckpt = str(tmp_path / "postings"), str(tmp_path / "ckpt")
    stream = spark.readStream.schema(
        "id bigint, embedding array<float>, label int"
    ).parquet(src)
    q = incremental_index_ingest(
        stream, ivf, posting, ckpt, available_now=True,
        partition_by=("centroid_id",),
    )
    q.awaitTermination(120)
    streamed = spark.read.parquet(posting)
    assert streamed.count() == 80
    batch = ivf.assign(clustered_df.filter(F.col("id") < 80))
    assert (
        streamed.join(batch, "id")
        .filter(streamed["centroid_id"] != batch["centroid_id"]).count() == 0
    )


def test_simhash_hamming_pairs_planted(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta gamma delta epsilon zeta eta iota"),   # 1-token change
        (3, "totally different content about spark and parquet files"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    pairs = {
        (r["left_id"], r["right_id"]): r["hamming"]
        for r in D.simhash_hamming_pairs(docs, max_distance=10).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] <= 10
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_media_stats_and_features(spark):
    docs = load_table(spark, SF_DIR, "documents").limit(30)
    media = derive_media(docs)
    stats = media_stats(media).collect()
    assert len(stats) == 30
    assert all(r["byte_len"] > 0 and len(r["content_sha"]) == 64 for r in stats)
    assert {r["modality"] for r in stats} <= {"image", "audio", "video"}

    feats = extract_features(media, n_frames=3).collect()
    assert len(feats) == 90  # one row per (media, frame)
    assert all(len(r["features"]) == 8 for r in feats)
    assert all(0.0 <= v <= 1.0 for r in feats for v in r["features"])
    # deterministic across runs
    feats2 = extract_features(media, n_frames=3).collect()
    assert sorted(map(str, feats)) == sorted(map(str, feats2))


def test_extract_features_error_stub(spark):
    docs = load_table(spark, SF_DIR, "documents").limit(2)
    with pytest.raises(Exception, match="NotImplementedError|decode"):
        extract_features(derive_media(docs), decode_stub="error").collect()


def test_media_embeddings_pool_and_search(spark):
    """binary → frames → mean-pooled embedding → exact kNN: the multimodal
    column feeds the engine's vector operators end-to-end."""
    from vector_db_api_spark.operators.knn import knn
    from vector_db_api_spark.operators.multimodal import media_embeddings

    # ordered limit: the loader's r15 scan spread makes a bare limit pick
    # rows from arbitrary partitions — this test needs doc 0 ("m0") in the
    # set, so pin the subset deterministically
    docs = load_table(spark, SF_DIR, "documents").orderBy("doc_id").limit(60)
    # plant an exact duplicate payload of doc 0 under a fresh id
    dup = docs.orderBy("doc_id").limit(1).withColumn("doc_id", F.lit(999999))
    media = derive_media(docs.union(dup))
    emb = media_embeddings(media, n_frames=4).cache()

    row0 = emb.filter(F.col("media_id") == "m0").collect()[0]
    dup_row = emb.filter(F.col("media_id") == "m999999").collect()[0]
    # identical payloads pool to identical embeddings
    assert list(row0["embedding"]) == list(dup_row["embedding"])
    assert len(row0["embedding"]) == 8

    # similarity search over media embeddings finds the planted duplicate
    # at cosine 1.0
    q = [float(x) for x in row0["embedding"]]
    hits = knn(emb, q, 2, id_col="media_id").collect()
    ids = {r["media_id"] for r in hits}
    assert ids == {"m0", "m999999"}
    assert all(abs(r["score"] - 1.0) < 1e-12 for r in hits)
    emb.unpersist()


def test_media_embeddings_frame_count_bounds_pool(spark):
    from vector_db_api_spark.operators.multimodal import media_embeddings

    docs = load_table(spark, SF_DIR, "documents").limit(10)
    emb = media_embeddings(derive_media(docs), n_frames=7)
    assert emb.count() == 10
    assert all(len(r["embedding"]) == 8 for r in emb.collect())


def test_stream_sessions_match_batch(spark, tmp_path):
    from vector_db_api_spark.streaming.ingest import sessionized_event_counts

    events = load_table(spark, SF_DIR, "events")
    src = str(tmp_path / "sess_in")
    events.write.parquet(src)

    stream = spark.readStream.schema(
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string"
    ).parquet(src)
    out, ckpt = str(tmp_path / "sess_out"), str(tmp_path / "sess_ckpt")
    q = (
        sessionized_event_counts(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = spark.read.parquet(out)
    want = sessionized_event_counts(events)
    # append mode emits a session once the watermark passes its close
    # (last_ts + gap); everything safely closed must match the batch plan
    max_ts = events.agg(F.max("ts")).collect()[0][0]
    closed = want.filter(
        F.col("last_ts") + F.expr("INTERVAL 3 HOURS") <= F.lit(max_ts)
    )
    key = ["user_id", "session_start"]
    assert got.join(closed, key, "left_semi").count() == closed.count()
    mismatched = (
        got.alias("g")
        .join(want.alias("w"), key)
        .filter(
            (F.col("g.n_events") != F.col("w.n_events"))
            | (F.col("g.value_cents") != F.col("w.value_cents"))
            | (F.col("g.last_ts") != F.col("w.last_ts"))
        )
    )
    assert mismatched.count() == 0
    # nothing emitted that batch doesn't have
    assert got.join(want, key, "left_anti").count() == 0


def test_sample_frames_stride_and_cap(spark):
    from vector_db_api_spark.operators.multimodal import sample_frames

    docs = load_table(spark, SF_DIR, "documents").limit(10)
    feats = extract_features(derive_media(docs), n_frames=8)
    every2 = sample_frames(feats, stride=2)
    assert every2.count() == 10 * 4
    assert {r["frame_no"] for r in every2.select("frame_no").distinct().collect()} == {0, 2, 4, 6}
    capped = sample_frames(feats, stride=2, max_frames=2)
    assert capped.count() == 10 * 2  # frames 0 and 2 only
    # the sample is a pure filter — it adds no shuffle beyond what the
    # input plan already has (here: the limit(10) fixture's single-partition
    # exchange)
    base_plan = feats._jdf.queryExecution().executedPlan().toString()
    plan = every2._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == base_plan.count("Exchange")
    with pytest.raises(ValueError, match="stride"):
        sample_frames(feats, stride=0)


def test_resize_features_adaptive_pool(spark):
    """Downscale = adaptive average pooling, upscale = element repetition —
    verified against a driver-side recomputation of the same rule."""
    import numpy as np

    from vector_db_api_spark.operators.multimodal import resize_features

    docs = load_table(spark, SF_DIR, "documents").limit(12)
    feats = extract_features(derive_media(docs), n_frames=2)
    src = {(r["media_id"], r["frame_no"]): r["features"] for r in feats.collect()}

    for out_dim in (4, 3, 16):
        got = {
            (r["media_id"], r["frame_no"]): r["features"]
            for r in resize_features(feats, out_dim).collect()
        }
        for key, x in src.items():
            d = len(x)
            want = []
            for j in range(out_dim):
                lo, hi = j * d // out_dim, max((j + 1) * d // out_dim, j * d // out_dim + 1)
                want.append(np.float32(np.mean([np.float64(v) for v in x[lo:hi]])))
            assert np.allclose(got[key], want, atol=0), (key, out_dim)
            assert len(got[key]) == out_dim


def test_embed_texts_streams_and_matches_batch(spark, tmp_path):
    """embed_texts is a plain mapInPandas stage, so the SAME function body
    runs under Structured Streaming — embed-on-ingest without a second
    implementation. Stream output must bit-match the batch embedding."""
    from vector_db_api_spark.operators.embed import embed_texts

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text").limit(40)
    src = str(tmp_path / "docs_in")
    docs.write.parquet(src)

    stream = spark.readStream.schema("doc_id bigint, text string").parquet(src)
    q = (
        embed_texts(stream, dim=16)
        .writeStream.format("memory")
        .queryName("emb_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        r["doc_id"]: r["embedding"]
        for r in spark.sql("SELECT * FROM emb_stream").collect()
    }
    want = {r["doc_id"]: r["embedding"] for r in embed_texts(docs, dim=16).collect()}
    assert got == want


def test_streaming_text_ingest_matches_batch_and_is_idempotent(spark, tmp_path):
    """Docs stream -> chunk -> embed -> sink == the batch composition;
    re-running the drained stream (same checkpoint) adds nothing."""
    from vector_db_api_spark.operators.chunking import chunk_documents
    from vector_db_api_spark.operators.embed import embed_texts, fake_md5_embedder
    from vector_db_api_spark.streaming.ingest import streaming_text_ingest

    docs = spark.createDataFrame(
        [(f"d{i}", " ".join(f"w{i}_{j}" for j in range(50))) for i in range(10)],
        "document_id string, text string",
    )
    src = str(tmp_path / "docs")
    docs.write.parquet(src)
    out, ck = str(tmp_path / "chunks"), str(tmp_path / "ck")

    q = streaming_text_ingest(spark, src, out, ck, dim=8, chunk_tokens=16, stride=12)
    q.awaitTermination(120)

    got = sorted(
        (r["id"], r["chunk_text"], tuple(r["embedding"]))
        for r in spark.read.parquet(out).collect()
    )
    chunks = chunk_documents(docs, 16, 12, id_col="document_id").withColumn(
        "id", F.concat("document_id", F.lit(":"), "position")
    )
    emb = embed_texts(chunks, dim=8, id_col="id", text_col="chunk_text",
                      model_fn=fake_md5_embedder(8))
    want = sorted(
        (r["id"], r["chunk_text"], tuple(r["embedding"]))
        for r in chunks.join(emb, "id").collect()
    )
    assert got == want and len(got) == 40  # ceil((50-16)/12)+1 = 4 per doc

    # drained re-run: checkpoint says nothing new -> sink unchanged
    q2 = streaming_text_ingest(spark, src, out, ck, dim=8, chunk_tokens=16, stride=12)
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == 40


def test_media_phash_neardup_finds_duplicate_payloads(spark):
    """Identical payloads -> hamming 0; near-identical payloads (one byte
    perturbed) -> small distance; unrelated payloads stay apart."""
    from vector_db_api_spark.operators.multimodal import (
        derive_media,
        media_neardup_pairs,
        media_phash,
    )
    from vector_db_api_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents").limit(40)
    media = derive_media(docs)
    # plant an exact duplicate payload under a new id
    import pyspark.sql.functions as F

    dup = media.limit(1).withColumn("media_id", F.lit("dup-of-first"))
    withdup = media.unionByName(dup)
    pairs = media_neardup_pairs(withdup, max_distance=0).collect()
    flat = {(r["left_id"], r["right_id"]): r["hamming"] for r in pairs}
    first_id = media.limit(1).collect()[0]["media_id"]
    key = tuple(sorted([first_id, "dup-of-first"]))
    assert flat.get(key) == 0

    # phash is deterministic and 60-bit bounded
    ph = {r["media_id"]: r["phash"] for r in media_phash(media).collect()}
    ph2 = {r["media_id"]: r["phash"] for r in media_phash(media).collect()}
    assert ph == ph2
    assert all(0 <= v < (1 << 60) for v in ph.values())


def test_incremental_postings_serve_same_bm25(spark, tmp_path):
    """Postings built incrementally by the stream answer BM25 identically
    to the batch expression path."""
    from vector_db_api_spark.operators.keyword import bm25_topk, bm25_topk_postings
    from vector_db_api_spark.streaming.ingest import incremental_postings_ingest

    docs = spark.createDataFrame(
        [
            (1, "spark joins shuffle data across executors"),
            (2, "spark spark tuning guide"),
            (3, "completely unrelated words about gardens"),
            (4, "join tuning for shuffle heavy jobs"),
        ],
        "doc_id bigint, text string",
    )
    src = str(tmp_path / "docs")
    docs.write.parquet(src)
    pp, dp, ck = (str(tmp_path / p) for p in ("postings", "doclens", "ck"))
    q = incremental_postings_ingest(
        spark, src, "doc_id bigint, text string", pp, dp, ck
    )
    q.awaitTermination(120)

    postings = spark.read.parquet(pp).drop("epoch")
    doclens = spark.read.parquet(dp).drop("epoch")
    a = {(r["doc_id"], round(r["score"], 9)) for r in
         bm25_topk(docs, "spark shuffle", k=4).collect()}
    b = {(r["doc_id"], round(r["score"], 9)) for r in
         bm25_topk_postings(postings, doclens, "spark shuffle", k=4).collect()}
    assert a == b


# -- real PPM/WAV decode ------------------------------------------------------

def test_decode_ppm_is_a_real_parser():
    from vector_db_api_spark.operators.multimodal import decode_ppm

    # spec-conforming header with comments and arbitrary whitespace
    pix = bytes(range(2 * 3 * 3))  # 3x2 RGB
    payload = b"P6 # comment\n# another\n 3\t2 \n255\n" + pix
    w, h, got = decode_ppm(payload)
    assert (w, h, got) == (3, 2, pix)
    with pytest.raises(ValueError):
        decode_ppm(b"P5\n1 1\n255\n\x00")          # wrong magic
    with pytest.raises(ValueError):
        decode_ppm(b"P6\n2 2\n255\n\x00\x00")      # truncated pixels
    with pytest.raises(ValueError):
        decode_ppm(b"P6\n1 1\n65535\n\x00\x00")    # unsupported maxval


def test_decode_wav_is_a_real_parser():
    import struct

    from vector_db_api_spark.operators.multimodal import decode_wav

    samples = [0, 1, -1, 32767, -32768, 123]
    data = struct.pack("<6h", *samples)
    fmt = struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
    # an extra LIST chunk before data: the parser must walk past it
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    body = b"WAVEfmt " + fmt + extra + b"data" + struct.pack("<I", len(data)) + data
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    assert decode_wav(payload) == samples
    with pytest.raises(ValueError):
        decode_wav(b"RIFX" + payload[4:])           # wrong magic
    with pytest.raises(ValueError):
        decode_wav(payload.replace(b"data", b"datx"))  # missing data chunk


def test_derive_media_files_are_valid_and_real_decode_runs(spark):
    from vector_db_api_spark.operators.multimodal import (
        decode_ppm,
        decode_wav,
        derive_media_files,
        extract_features,
        media_embeddings,
    )

    docs = load_table(spark, SF_DIR, "documents").limit(12)
    media = derive_media_files(docs).collect()
    assert len(media) == 12
    for r in media:
        payload = bytes(r["content"])
        if r["modality"] in ("image", "video"):
            w, h, pix = decode_ppm(payload)
            assert w == 8 and h == (8 if r["modality"] == "image" else 16)
            assert len(pix) == 3 * w * h
        else:
            assert len(decode_wav(payload)) == 64
    mdf = derive_media_files(load_table(spark, SF_DIR, "documents").limit(12))
    feats = extract_features(mdf, n_frames=4, decode_stub="real").collect()
    assert len(feats) == 48 and all(len(r["features"]) == 8 for r in feats)
    emb = media_embeddings(mdf, n_frames=4, decode_stub="real").collect()
    assert len(emb) == 12 and all(len(r["embedding"]) == 8 for r in emb)
    # identical payload -> identical embedding; the audio range is [-1, 1)
    assert all(-1.0 <= v <= 1.0 for r in emb for v in r["embedding"])


def test_real_decode_matches_hand_math(spark):
    import hashlib

    from vector_db_api_spark.operators.multimodal import (
        derive_media_files,
        extract_features,
    )

    docs = spark.createDataFrame(
        [(0, "hello image"), (1, "hello audio")], "doc_id bigint, text string"
    )
    feats = {
        (r["media_id"], r["frame_no"]): r["features"]
        for r in extract_features(
            derive_media_files(docs), n_frames=2, decode_stub="real"
        ).collect()
    }
    d0 = hashlib.sha256(b"hello image").digest()
    # image doc 0, frame 1 reads pixel row (1*8)//2 = 4; comp j = pixel (4, j)
    for j in range(8):
        o = 3 * (4 * 8 + j)
        want = (d0[o % 32] + d0[(o + 1) % 32] + d0[(o + 2) % 32]) / 765.0
        assert abs(feats[("m0", 1)][j] - want) < 1e-6  # float32 storage
    d1 = hashlib.sha256(b"hello audio").digest()
    # audio doc 1, frame 0 reads samples 0..7 (int16 LE of digest bytes)
    for j in range(8):
        lo, hi = d1[(2 * j) % 32], d1[(2 * j + 1) % 32]
        v = lo + 256 * hi
        if v >= 32768:
            v -= 65536
        assert abs(feats[("m1", 0)][j] - v / 32768.0) < 1e-6


def test_media_phash_band_bits_vary_by_projection(spark):
    from vector_db_api_spark.operators.multimodal import derive_media_files, media_phash

    docs = load_table(spark, SF_DIR, "documents").limit(9)
    ph = media_phash(derive_media_files(docs), nbits=60, decode_stub="real").collect()
    assert len(ph) == 9
    # with varied per-band projections the upper bands must NOT be a
    # verbatim copy of band 0 for every row (the old repeat-shifted bug)
    def band(v, b):
        return (v >> (b * 8)) & 0xFF
    assert any(band(r["phash"], 1) != band(r["phash"], 0) for r in ph)


def test_latest_rows_serves_updated_doc_only(spark, tmp_path):
    """A doc re-ingested in a later epoch must count once, with its NEW
    content — max-epoch dedup at query time (the append-only sink keeps
    the stale rows)."""
    from vector_db_api_spark.operators.keyword import bm25_scores, bm25_scores_postings
    from vector_db_api_spark.streaming.ingest import (
        incremental_postings_ingest,
        latest_rows,
    )

    v1 = spark.createDataFrame(
        [(1, "spark joins shuffle data"), (2, "gardening words only")],
        "doc_id bigint, text string",
    )
    v2 = spark.createDataFrame(
        [(1, "spark spark spark tuning")],  # doc 1 UPDATED
        "doc_id bigint, text string",
    )
    src = str(tmp_path / "docs")
    v1.write.parquet(src)
    pp, dp, ck = (str(tmp_path / p) for p in ("postings", "doclens", "ck"))
    q = incremental_postings_ingest(
        spark, src, "doc_id bigint, text string", pp, dp, ck
    )
    q.awaitTermination(120)
    v2.write.mode("append").parquet(src)  # new file -> new micro-batch
    q = incremental_postings_ingest(
        spark, src, "doc_id bigint, text string", pp, dp, ck
    )
    q.awaitTermination(120)

    postings_raw = spark.read.parquet(pp)
    assert postings_raw.select("epoch").distinct().count() == 2
    # raw epochs double-count doc 1; latest_rows must not
    postings = latest_rows(postings_raw)
    doclens = latest_rows(spark.read.parquet(dp))
    assert doclens.filter(F.col("doc_id") == 1).count() == 1
    current = spark.createDataFrame(
        [(1, "spark spark spark tuning"), (2, "gardening words only")],
        "doc_id bigint, text string",
    )
    want = {(r["doc_id"], r["score"]) for r in bm25_scores(current, "spark").collect()}
    got = {(r["doc_id"], r["score"]) for r in
           bm25_scores_postings(postings, doclens, "spark").collect()}
    assert got == want  # bit-exact, stale v1 rows invisible


def test_bm25_scores_postings_matches_expression_path(spark):
    from vector_db_api_spark.operators.keyword import (
        bm25_scores,
        bm25_scores_postings,
        build_postings,
    )

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    postings, doclens = build_postings(docs)
    a = {(r["doc_id"], r["score"]) for r in
         bm25_scores(docs, "vector hash join").collect()}
    b = {(r["doc_id"], r["score"]) for r in
         bm25_scores_postings(postings, doclens, "vector hash join").collect()}
    assert a == b  # bit-exact twin
