"""Structured Streaming ingest — the engine's streaming extension
(SURVEY.md §2.11: the reference is request-driven and has no streams; the
driver's ``events`` table is the stand-in stream source).

Two streaming jobs:

1. ``hourly_event_rollup`` — watermarked tumbling-window aggregation of the
   events stream. The aggregation body is shared with the batch query
   (suite ``events_hourly``), so the batch oracle IS the streaming oracle:
   run the stream with ``availableNow`` over the same files and the results
   must match the batch plan.

2. ``incremental_index_ingest`` — ``foreachBatch`` maintenance of a
   library's ANN index: each micro-batch of chunk upserts appends its LSH
   signature delta (or IVF assignment delta) to the index tables — the
   reference's ``index.add`` semantics (lsh.py:58-75, ivf.py:40-49) as a
   streaming job. Only the DELTA is hashed/assigned; the existing index is
   never rebuilt.

At 100 TB both are shuffle-light: the rollup's state is bounded by the
watermark; the index delta is embarrassingly parallel (mapInPandas matmul)
and appends partition-locally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

# ts is TIMESTAMP_NTZ: the batch loader reads the naive parquet micros as
# NTZ, and the stream must live in the SAME domain — declaring plain
# `timestamp` here makes the watermark/window math session-timezone-
# dependent (stream==batch then breaks under any non-UTC host TZ; caught
# by the stream_trending_state oracle under TZ=Australia/Eucla).
EVENT_SCHEMA = (
    "event_id bigint, ts timestamp_ntz, user_id bigint, event_type string, "
    "value double, props string"
)


def _ntz_as_utc_instant(src: DataFrame, ts_col: str = "ts") -> DataFrame:
    """TIMESTAMP_NTZ → TIMESTAMP with instant micros EQUAL to the naive
    micros (i.e., the naive value read as a UTC instant), regardless of
    session timezone. Watermarks/windows require TIMESTAMP; a plain cast
    would interpret the naive value in the session zone and shift every
    window under a non-UTC host (caught by the stream_trending_state
    oracle under TZ=Australia/Eucla). timestampdiff between two NTZ values
    is pure integer arithmetic — no zone anywhere."""
    if dict(src.dtypes).get(ts_col) == "timestamp_ntz":
        src = src.withColumn(
            ts_col,
            F.timestamp_micros(
                F.expr(
                    f"timestampdiff(MICROSECOND, "
                    f"TIMESTAMP_NTZ '1970-01-01 00:00:00', `{ts_col}`)"
                )
            ),
        )
    return src


def windowed_event_counts(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1-hour rollup per event_type; identical logic for batch and
    stream (withWatermark is a no-op on batch frames)."""
    src = events
    if src.isStreaming:
        # batch frames stay NTZ (their outputs join the NTZ oracles);
        # only the watermarked path needs the TIMESTAMP conversion
        src = _ntz_as_utc_instant(src).withWatermark("ts", watermark)
    return (
        src.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.floor(F.col("value") * 100).cast("long")).alias("value_cents"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "value_cents",
        )
    )


def sessionized_event_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Gap-based sessionization per user: events closer than ``gap`` merge
    into one session (``session_window`` — dynamic-width state, the windowed
    shape tumbling windows can't express). Identical logic batch/stream; in
    batch mode Catalyst computes the same merge without a state store.

    Session-boundary contract (pinned by the DuckDB oracle, which rebuilds
    sessions with lag + cumulative flags): a new session starts when
    ``ts >= prev_ts + gap`` — strictly-less merges.
    """
    src = events
    if src.isStreaming:
        src = _ntz_as_utc_instant(src).withWatermark("ts", watermark)
    return (
        src.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.floor(F.col("value") * 100).cast("long")).alias("value_cents"),
            F.max("ts").alias("last_ts"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
            "value_cents",
            "last_ts",
        )
    )


def read_event_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream over parquet event files (new files = new data)."""
    return spark.readStream.schema(EVENT_SCHEMA).parquet(path)


def hourly_event_rollup(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Stream → watermarked window agg → parquet sink. ``available_now``
    drains everything currently present and stops (batch-equivalent runs,
    used by tests and backfills); leave False for a continuous run."""
    agg = windowed_event_counts(read_event_stream(spark, input_path))
    writer = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def incremental_index_ingest(
    chunk_stream: DataFrame,
    model,
    index_path: str,
    checkpoint: str,
    id_col: str = "id",
    vec_col: str = "embedding",
    available_now: bool = True,
    partition_by: tuple[str, ...] = (),
) -> StreamingQuery:
    """foreachBatch index-delta maintenance: transform each micro-batch of
    chunk upserts through the index model and APPEND to the index table —
    the reference's ``index.add`` (lsh.py:58-75, ivf.py:40-49) as a
    streaming job.

    ``model`` is duck-typed: a ``SignLSH`` appends signature rows to the
    bucket table; a trained ``IVFIndex`` appends assignment rows to the
    posting table (pass ``partition_by=("centroid_id",)`` so the appended
    postings stay partition-prunable).
    """
    from vector_db_api_spark.operators.ivf import IVFIndex

    def delta(batch_df: DataFrame) -> DataFrame:
        if isinstance(model, IVFIndex):
            return model.assign(batch_df, id_col=id_col, vec_col=vec_col)
        return model.signatures(batch_df, id_col=id_col, vec_col=vec_col)

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        # foreachBatch is at-least-once: stamp the epoch into a partition
        # column and overwrite only this epoch's partitions, so a retried
        # micro-batch replaces its own earlier output instead of
        # double-appending index rows.
        if batch_df.isEmpty():
            return
        writer = (
            delta(batch_df)
            .withColumn("epoch", F.lit(epoch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(*partition_by, "epoch")
        )
        # resolved per batch — pointer-mode-safe, like every other sink here
        writer.parquet(resolve_state_dir(index_path))

    writer = chunk_stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def trending_event_types(counts: DataFrame, k: int = 3) -> DataFrame:
    """Per-window top-k event types by count — "what's trending each hour".

    Input is the ``windowed_event_counts`` rollup (batch frame or streamed
    SINK — ranking is not a streaming-supported window function, and it
    shouldn't be: a window's ranking is only final when the watermark
    closes the window, which is exactly when the append-mode rollup emits
    it. So the composition is rollup-in-stream, rank-on-sink, and the
    stream==batch equivalence of the rollup carries over to the trending
    output verbatim. Ties break by event_type for determinism.
    """
    from vector_db_api_spark.operators.topk import topk_per_group

    return topk_per_group(
        counts,
        ["window_start"],
        [F.desc("n_events"), F.col("event_type").asc()],
        k,
        keep_rank=True,
    )


def streaming_text_ingest(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint: str,
    dim: int = 64,
    chunk_tokens: int = 64,
    stride: int = 48,
    model_fn=None,
    available_now: bool = True,
) -> StreamingQuery:
    """Raw documents stream → chunk → embed → chunk-row sink: the write
    half of a RAG pipeline as one continuous job (new document files land,
    searchable chunk rows come out).

    Chunking and embedding are stateless per-document transforms, so they
    run inside ``foreachBatch`` on each micro-batch (which also lets the
    chunk↔embedding join stay a plain batch join — no stream-stream join
    state). The sink is epoch-stamped + dynamic-partition-overwrite, so an
    at-least-once retry of a micro-batch overwrites its own epoch
    partition instead of duplicating chunks — same idempotency discipline
    as the other foreachBatch sinks here.
    """
    from vector_db_api_spark.operators.chunking import chunk_documents
    from vector_db_api_spark.operators.embed import embed_texts, fake_md5_embedder

    fn = model_fn or fake_md5_embedder(dim)
    docs = spark.readStream.schema("document_id string, text string").parquet(
        input_path
    )

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        chunks = chunk_documents(
            batch_df, chunk_tokens, stride, id_col="document_id"
        ).withColumn(
            "id",
            F.concat(F.col("document_id"), F.lit(":"), F.col("position")),
        )
        embedded = embed_texts(
            chunks, dim=dim, id_col="id", text_col="chunk_text", model_fn=fn
        )
        (
            chunks.join(embedded, "id")
            .withColumn("epoch", F.lit(epoch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch")
            # resolved per batch — pointer-mode-safe
            .parquet(resolve_state_dir(output_path))
        )

    writer = docs.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def latest_rows(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Query-time dedup for epoch-appended tables: keep only each id's
    MAX-epoch rows and drop the epoch column.

    The epoch-stamped sinks here are append-only per epoch; a document
    RE-ingested (updated) in a later epoch leaves its stale postings/
    doclens rows in earlier epochs, which would double-count that doc's
    N/df/tf/dl at query time. Serving paths must read through this filter
    (one max-aggregate + a semi-join-shaped equi-join on the id — AQE
    broadcasts the small max table; no window over the full table).
    """
    mx = df.groupBy(id_col).agg(F.max("epoch").alias("__mx"))
    return (
        df.join(mx, id_col)
        .filter(F.col("epoch") == F.col("__mx"))
        .drop("__mx", "epoch")
    )


def incremental_postings_ingest(
    spark: SparkSession,
    input_path: str,
    input_schema: str,
    postings_path: str,
    doclens_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Keep the BM25 inverted index fresh as documents arrive — the
    lexical counterpart of ``incremental_index_ingest``: each micro-batch
    contributes ONLY its own (term, id, tf) postings and (id, dl) doc
    lengths, appended epoch-stamped (idempotent overwrite per epoch, like
    every foreachBatch sink here). Corpus stats (N, total_dl, df) are
    derived at query time from the doclens/postings tables, so no global
    state is rebuilt in the stream — identical to the reference's
    index.add discipline applied to keyword search.

    Updates: re-ingesting a document stamps its fresh rows into a NEW
    epoch; earlier epochs keep the stale rows. Readers therefore go
    through :func:`latest_rows`, which serves only each doc's max-epoch
    rows (pinned by tests and the stream_bm25_state oracle query).
    """
    from vector_db_api_spark.operators.keyword import build_postings

    reader = spark.readStream.schema(input_schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_path)

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        postings, doclens = build_postings(batch_df, id_col, text_col)
        for frame, path in ((postings, postings_path), (doclens, doclens_path)):
            (
                frame.withColumn("epoch", F.lit(epoch_id))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("epoch")
                # resolved per batch: after a pointer-mode compaction the
                # live state is <path>/v=N, and an epoch appended to the
                # flat root would be invisible to pointer-aware readers
                # (and would poison the root with mixed partition trees)
                .parquet(resolve_state_dir(path))
            )

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


COMPACT_EPOCH = -1  # foreachBatch epochs are >= 0, so -1 can never collide
                    # with (or be overwritten by) a live ingest epoch


def _fs_exists(spark: SparkSession, path: str) -> bool:
    """Quiet existence probe via the Hadoop FileSystem API (any scheme) —
    avoids the FileNotFoundException stack trace RawLocalFileSystem logs at
    WARN when a parquet read probes a not-yet-created state dir."""
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return bool(fs.exists(hpath))


def state_read_or_none(spark: SparkSession, path: str):
    """The live state rows as a DataFrame, or None when no state exists yet.

    Pointer-aware (resolves :func:`resolve_state_dir`), quiet on the
    common first-batch miss (FS existence probe), and tolerant of a dir
    that exists but holds no readable parquet — an empty first write or a
    crashed attempt leaves ``_SUCCESS``/``_temporary`` only, which must
    read as "no state yet", not crash-loop the stream (the pre-r6
    ``except AnalysisException`` behavior, kept on top of the probe)."""
    from pyspark.errors.exceptions.base import AnalysisException

    live = resolve_state_dir(path)
    if not _fs_exists(spark, live):
        return None
    try:
        return spark.read.parquet(live)
    except AnalysisException:
        return None


def _state_pointer_version(path: str) -> int | None:
    """Version named by ``<path>/_CURRENT``, or None for a flat layout.
    Scheme-dispatched (fsio): works on local roots AND hdfs://=/s3a://
    state paths — remote reads resolve through the active SparkSession's
    Hadoop client, the same one the parquet scan itself uses."""
    import os

    from vector_db_api_spark.sources import fsio

    raw = fsio.read_json(fsio.fs_for(path), os.path.join(path, "_CURRENT"))
    return raw.get("version") if raw is not None else None


def resolve_state_dir(path: str) -> str:
    """The directory holding the LIVE state rows: ``<path>/v=<n>`` when a
    pointer-mode compaction has run, else ``path`` itself (flat layout).
    Pointer-aware readers go through this; the two layouts coexist because
    the pointer file appears only after the first pointer-mode publish."""
    import os

    v = _state_pointer_version(path)
    return path if v is None else os.path.join(path, f"v={v}")


def read_state(spark: SparkSession, path: str) -> DataFrame:
    """Pointer-aware state read (resolves :func:`resolve_state_dir` once —
    snapshot isolation: a later compaction publishes a NEW ``v=`` dir and
    flips the pointer without touching the files this reader listed)."""
    return spark.read.parquet(resolve_state_dir(path))


def vacuum_state(path: str, keep: int = 1) -> list[int]:
    """Reclaim pointer-mode state versions older than the newest ``keep``
    (never the live one). Flat-layout leftovers from before the first
    pointer publish are left alone (they may back an in-flight reader that
    resolved the path pre-pointer; remove them manually after a drain)."""
    import os

    from vector_db_api_spark.sources import fsio

    live = _state_pointer_version(path)
    if live is None:
        return []
    fs = fsio.fs_for(path)
    versions = sorted(
        int(d[2:]) for d in fs.listdir(path)
        if d.startswith("v=") and d[2:].isdigit()
    )
    removable = [v for v in versions[:-keep] if v != live] if keep else [
        v for v in versions if v != live
    ]
    for v in removable:
        fs.rmtree(os.path.join(path, f"v={v}"))
    return removable


def _swap_in(out: DataFrame, path: str, partition_by, mode: str = "rename") -> None:
    """Materialize ``out`` and publish it as the live state at ``path``.

    ``mode="rename"`` (default — LOCAL filesystems only): Spark cannot
    overwrite a path it is reading, so compaction writes to a sibling tmp
    dir, renames the live dir aside, renames the tmp in, and only THEN
    deletes the old data — a crash at any point leaves either the old
    state live or recoverable at ``path + '__compact_old'`` (never both
    gone). Non-local schemes (hdfs://, s3a://…) are rejected BEFORE the
    expensive tmp materialization: the two-rename window is only safe when
    directory renames are cheap and atomic, which object stores don't
    give — use pointer mode there.

    ``mode="pointer"`` (object-store-safe, any scheme Spark can reach):
    each compaction writes a NEW versioned prefix ``<path>/v=<n+1>`` and
    atomically flips ``<path>/_CURRENT`` (fsio: local os IO for plain
    paths, Hadoop FileSystem for file://, hdfs://, s3a://) — the
    EntityStore publish pattern. Compaction
    never renames or deletes the data a reader resolved, so a reader
    holding the old version keeps a consistent snapshot for as long as it
    needs; superseded versions are reclaimed later by
    :func:`vacuum_state`. The LIVE version dir is append-friendly: the
    foreachBatch sinks resolve :func:`resolve_state_dir` per micro-batch,
    so post-compaction epochs land inside ``v=<n>`` and the next
    compaction folds them in (like a memtable under immutable sstables).
    Readers must resolve through :func:`resolve_state_dir` /
    :func:`read_state`; compaction still belongs in the ingest job's
    off-window (an epoch written between the compaction's read and its
    flip would be dropped from the new version).
    """
    import os
    import shutil
    import time
    from urllib.parse import urlparse

    from vector_db_api_spark.sources import fsio

    if mode == "pointer":
        cur = _state_pointer_version(path)
        nxt = 1 if cur is None else cur + 1
        dest = os.path.join(path, f"v={nxt}")
        writer = out.write.mode("errorifexists")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(dest)
        fsio.write_json_atomic(
            fsio.fs_for(path, out.sparkSession),
            os.path.join(path, "_CURRENT"),
            {"version": nxt, "published_at": time.time()},
        )
        return
    if mode != "rename":
        raise ValueError(f"unknown publish mode {mode!r}")
    if urlparse(path).scheme not in ("", "file"):
        raise ValueError(
            f"rename-mode compaction needs a local path, got {path!r}; "
            "use mode='pointer' for remote roots (versioned prefix + "
            "atomic pointer flip — no directory renames)"
        )
    if urlparse(path).scheme == "file":
        path = urlparse(path).path  # os.rename below needs the bare path

    tmp = path.rstrip("/") + "__compact_tmp"
    old = path.rstrip("/") + "__compact_old"
    writer = out.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(tmp)
    if os.path.exists(old):
        shutil.rmtree(old)  # leftover from a crashed earlier compaction
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)


def uncommitted_epoch(checkpoint: str, epoch_offset: int = 0) -> int | None:
    """The epoch stamp a restarted drain will REPLAY, or ``None`` when the
    checkpoint is cleanly committed.

    foreachBatch runs batch N only after batch N-1's commit lands, so at
    most ONE batch per checkpoint lineage sits inside the at-least-once
    window at any moment: its ``offsets/N`` entry exists but ``commits/N``
    does not (the crash the restart drills and
    tests/test_streaming_restart.py simulate). Pass the lineage's
    ``epoch_offset`` to translate the batch id into the STATE epoch stamp.

    Why this exists: a compaction run during crash RECOVERY (after the
    engine died, before the restarted drain) must pass this epoch to the
    compactors' ``preserve_epochs`` — folding an uncommitted epoch's rows
    into :data:`COMPACT_EPOCH` defeats the current-epoch exclusion that
    replay idempotence rests on. The replayed batch would read its own
    admissions as PRIOR state: over-removal for the set-semantics dedup
    states (seen-gram/line/bucket), self-rejection for the SemDeDup
    admitted state. ``tests/test_compaction.py`` pins both the hazard and
    the preserve fix."""
    import os

    def _ids(sub: str) -> set[int]:
        d = os.path.join(checkpoint, sub)
        if not os.path.isdir(d):
            return set()
        return {int(n) for n in os.listdir(d) if n.lstrip("-").isdigit()}

    pending = _ids("offsets") - _ids("commits")
    return max(pending) + epoch_offset if pending else None


def _split_preserved(df: DataFrame, preserve_epochs):
    """(folded, kept) split for the compactors: rows in ``preserve_epochs``
    keep their own epoch partitions verbatim; everything else collapses.
    Reads are epoch-agnostic unions/max-per-id, so the split is invisible
    to them — its point is that a preserved epoch stays EXCLUDABLE by the
    replay's ``epoch != current`` filter."""
    preserve = sorted({int(e) for e in preserve_epochs or ()})
    if not preserve:
        return df, None
    cond = F.col("epoch").isin(preserve)
    return df.filter(~cond), df.filter(cond)


def compact_epoch_state(
    spark: SparkSession,
    path: str,
    id_col: str,
    partition_by: tuple[str, ...] = (),
    mode: str = "rename",
    preserve_epochs=(),
) -> None:
    """Collapse an epoch-appended state table to its served rows, in place.

    The epoch-stamped sinks in this module are append-only per epoch:
    correct (readers go through :func:`latest_rows` / the id anti-join),
    but every epoch adds partitions and the query-time max-epoch dedup cost
    grows with history forever. This job rewrites the table as ONE epoch
    (:data:`COMPACT_EPOCH`) holding exactly the rows :func:`latest_rows`
    would serve — so a read before and after compaction is identical (the
    post-compaction oracle re-check in tests), while partition count and
    the dedup join's input drop to O(live rows).

    ``partition_by`` preserves secondary partition columns through the
    rewrite (e.g. ``("cell_bucket",)`` for the SemDeDup admitted state,
    ``("centroid_id",)`` for IVF postings) — a legacy state missing such
    a column must be migrated first (``migrate_semdedup_state``); this
    fails loudly instead of writing a broken layout. Run it from a
    maintenance window, not inside a foreachBatch — it swaps the
    directory the live stream appends to. Cadence guidance in
    DEPLOYMENT.md.

    ``preserve_epochs``: epochs kept AS THEIR OWN partitions instead of
    folding (read-identical — those are the newest epochs, so the per-id
    max is unchanged). Required when compacting during crash RECOVERY:
    pass :func:`uncommitted_epoch`'s answer so the restarted drain's
    ``epoch != current`` state read still excludes the batch it replays
    (the SemDeDup admitted state would otherwise self-reject — each
    replayed vector finds ITSELF within ε in the folded prior).
    """
    df = spark.read.parquet(resolve_state_dir(path))
    missing = [c for c in partition_by if c not in df.columns]
    if missing:
        raise ValueError(
            f"state at {path} lacks partition column(s) {missing}; migrate "
            "the layout first (e.g. streaming.dedup.migrate_semdedup_state)"
        )
    folded, kept = _split_preserved(df, preserve_epochs)
    collapsed = latest_rows(folded, id_col).withColumn(
        "epoch", F.lit(COMPACT_EPOCH)
    )
    if kept is not None:
        collapsed = collapsed.unionByName(kept.select(*collapsed.columns))
    _swap_in(collapsed, path, ("epoch", *partition_by), mode=mode)


def compact_set_state(
    spark: SparkSession,
    path: str,
    partition_by: tuple[str, ...] = (),
    mode: str = "rename",
    preserve_epochs=(),
) -> None:
    """Compaction for the SET-semantics dedup states: the seen-gram table
    (``incremental_span_dedup_ingest`` / the curate gram stage), the
    seen-line table (``incremental_line_dedup_ingest``) and the curate
    seen-bucket table. These states only ever GROW — a gram/line/bucket
    admitted once stays admitted, nothing is superseded — and every read
    side DISTINCTs the key columns over ALL epochs. So the collapse is a
    row-level DISTINCT of the epoch-stripped table rewritten as the single
    :data:`COMPACT_EPOCH`, NOT :func:`latest_rows`' max-epoch-per-id dedup
    (which would silently DROP a re-ingested doc's earlier bucket rows
    that the seen-reads still honor — seen ≠ latest). A read before and
    after compaction is identical, while epoch-partition count and the
    per-batch state-scan input drop to O(distinct keys).

    At 100 TB the seen-gram table IS the big table (r13 verdict #6): it
    grows monotonically with the corpus' distinct grams, and without
    compaction every micro-batch's semi-join rescans one partition per
    historical epoch forever.

    ``partition_by`` preserves the secondary layout through the rewrite
    (``("band_no",)`` for the curate bucket state — the rewrite keeps the
    append layout's column order, epoch LAST, so post-compaction epochs
    land in the same directory shape). Same operational contract as
    :func:`compact_epoch_state`: run from a maintenance window, never
    inside the foreachBatch appending to this path — the replay-safety of
    the CURRENT-epoch exclusion assumes no in-flight epoch spans the swap.

    Compacting during crash RECOVERY (engine dead, restart pending) is the
    one legal in-between, and it MUST pass ``preserve_epochs`` =
    [:func:`uncommitted_epoch`]: those epochs keep their own partitions
    (read-identical — set reads DISTINCT over all epochs) so the restarted
    drain's ``epoch != current`` exclusion still hides the replayed
    batch's own admissions. Folding them instead makes the replay read its
    own grams/lines as prior-seen and OVER-REMOVE — the hazard
    tests/test_compaction.py pins alongside the fix.
    """
    df = spark.read.parquet(resolve_state_dir(path))
    missing = [c for c in partition_by if c not in df.columns]
    if missing:
        raise ValueError(
            f"state at {path} lacks partition column(s) {missing}"
        )
    folded, kept = _split_preserved(df, preserve_epochs)
    collapsed = (
        folded.drop("epoch").distinct()
        .withColumn("epoch", F.lit(COMPACT_EPOCH))
    )
    if kept is not None:
        collapsed = collapsed.unionByName(kept.select(*collapsed.columns))
    _swap_in(collapsed, path, (*partition_by, "epoch"), mode=mode)


def compact_kmv_state(
    spark: SparkSession,
    path: str,
    group_cols: list[str],
    k: int = 64,
    mode: str = "rename",
) -> None:
    """Compaction for :func:`incremental_kmv_ingest` state: merge every
    epoch's sketches into one row per group (the KMV merge theorem makes
    this exact, not just equivalent-at-read-time) and rewrite as the single
    :data:`COMPACT_EPOCH`. ``served_kmv_estimates`` before == after."""
    from vector_db_api_spark.operators.sketches import kmv_merge_states

    states = spark.read.parquet(resolve_state_dir(path)).drop("epoch")
    merged = kmv_merge_states(states, group_cols, k=k).withColumn(
        "epoch", F.lit(COMPACT_EPOCH)
    )
    _swap_in(merged, path, ("epoch",), mode=mode)


def incremental_kmv_ingest(
    spark: SparkSession,
    input_path: str,
    input_schema: str,
    state_path: str,
    checkpoint: str,
    group_cols: list[str],
    value_col: str,
    k: int = 64,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
    epoch_offset: int = 0,
) -> StreamingQuery:
    """Keep per-group distinct-count sketches fresh as data arrives: each
    micro-batch contributes ONLY its own KMV state (the batch's ≤k smallest
    distinct hashes per group), appended epoch-stamped like every
    foreachBatch sink here. Serving reads merge all epochs with
    ``kmv_merge_states`` — and because KMV is a *distinct* sketch the merge
    is idempotent, so re-ingested (updated) rows need NO max-epoch dedup:
    stale epochs can only re-contribute hashes already in the union. This
    is the one incremental sink in this module whose history never lies
    (contrast incremental_postings_ingest + latest_rows).

    ``epoch_offset`` namespaces the state partitions when SEPARATE runs
    (fresh checkpoints — e.g. a daily availableNow job) append to one
    state dir: each run's epoch ids restart at 0, and without an offset
    run N's dynamic partition overwrite would silently wipe run N-1's
    ``epoch=0`` sketch. A single long-lived checkpointed stream needs no
    offset.
    """
    from vector_db_api_spark.operators.sketches import kmv_state

    reader = spark.readStream.schema(input_schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_path)

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        state = kmv_state(batch_df, group_cols, value_col, k=k)
        (
            state.withColumn("epoch", F.lit(epoch_id + epoch_offset))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch")
            # resolved per batch — see incremental_postings_ingest
            .parquet(resolve_state_dir(state_path))
        )

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def served_kmv_estimates(
    spark: SparkSession, state_path: str, group_cols: list[str], k: int = 64
) -> DataFrame:
    """Merge every epoch's sketch state and estimate per group — the
    serving-side read for :func:`incremental_kmv_ingest`. By the KMV merge
    theorem the result equals the single-pass sketch over the union of all
    ingested batches, exactly (pinned by the stream_kmv_state oracle)."""
    from vector_db_api_spark.operators.sketches import (
        kmv_estimate,
        kmv_merge_states,
    )

    states = read_state(spark, state_path).drop("epoch")
    merged = kmv_merge_states(states, group_cols, k=k)
    return merged.select(
        *group_cols, kmv_estimate("kmin", k=k).alias("est_distinct")
    )
