"""Streaming deduplication — bounded-state and custom-stateful variants.

The batch dedup suite (``operators/dedup.py``) answers "which documents are
duplicates"; a streaming ingest pipeline needs the online form: "drop rows
whose content fingerprint was already seen". Two operators, two state models:

1. ``exact_dedup`` — the built-in scale path:
   ``dropDuplicatesWithinWatermark`` keeps one row per fingerprint and ages
   state out with the watermark, so state is bounded by (dup horizon ×
   arrival rate), not by corpus size. This is the right default at 100 TB —
   state lives in the state store (RocksDB on a real cluster), partitioned by
   fingerprint, and never grows past the watermark horizon.

2. ``first_seen_dedup`` — custom stateful operator via
   ``applyInPandasWithState`` (the builder brief's extension point): per
   fingerprint group, emit the row with the smallest ``order_col`` the first
   time the group appears, then tombstone the group forever (unbounded state;
   use when the dedup horizon really is "all history" and fingerprint
   cardinality is the bounded thing). Batch frames take the equivalent
   window-top-1 path, so the same function is the driver-oracle query AND the
   streaming operator — pytest proves stream == batch on the same files.

Semantics note: "first seen" is defined as min(order_col) *within each
micro-batch*, then first-batch-wins across batches. With one availableNow
drain over static files this equals the global batch answer, which is what
the stream-vs-batch test pins.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from vector_db_api_spark.operators.topk import topk_per_group


def _read_state_or_none(spark, path: str):
    """Pointer-aware, first-batch-quiet, crash-tolerant state read — see
    :func:`vector_db_api_spark.streaming.ingest.state_read_or_none` (the
    FS existence probe replaces the old noisy try/except parquet-read
    pattern; the AnalysisException guard stays for a dir that exists but
    holds no readable footers, e.g. a crashed first write)."""
    from vector_db_api_spark.streaming.ingest import state_read_or_none

    return state_read_or_none(spark, path)


def content_fingerprint(*cols: str, sep: str = "|") -> Column:
    """md5 over the ``sep``-joined content columns (null-safe: nulls become
    empty strings so a null never collides with the literal 'None')."""
    parts: list[Column] = []
    for i, c in enumerate(cols):
        if i:
            parts.append(F.lit(sep))
        parts.append(F.coalesce(F.col(c).cast("string"), F.lit("")))
    return F.md5(F.concat(*parts))


def exact_dedup(
    df: DataFrame,
    fingerprint_col: str,
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """One surviving row per fingerprint. Streaming: bounded state via
    ``dropDuplicatesWithinWatermark``. Batch: plain ``dropDuplicates``.

    Which duplicate survives is arbitrary in both modes (matches Spark's
    contract); use ``first_seen_dedup`` when the survivor must be
    deterministic."""
    if df.isStreaming:
        return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            [fingerprint_col]
        )
    return df.dropDuplicates([fingerprint_col])


def first_seen_dedup(
    df: DataFrame,
    fingerprint_col: str,
    order_col: str,
) -> DataFrame:
    """Deterministic dedup: per fingerprint, keep the min-``order_col`` row.

    Batch: window top-1 (one shuffle on the fingerprint, partial top-k
    map-side). Streaming: ``applyInPandasWithState`` with a single boolean
    tombstone per fingerprint — the minimal custom-stateful shape (state is
    one flag per distinct fingerprint, independent of row volume)."""
    if not df.isStreaming:
        return topk_per_group(
            df, [fingerprint_col], [F.col(order_col).asc()], 1
        )

    out_schema = df.schema
    fields = [f.name for f in out_schema.fields]

    def emit_first(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        best: pd.DataFrame | None = None
        for pdf in pdfs:
            if pdf.empty:
                continue
            cand = pdf.loc[[pdf[order_col].idxmin()]]
            if best is None or cand[order_col].iloc[0] < best[order_col].iloc[0]:
                best = cand
        if state.exists or best is None:
            return  # tombstoned in an earlier batch — drop everything
        state.update((True,))
        yield best[fields]

    return df.groupBy(fingerprint_col).applyInPandasWithState(
        emit_first,
        outputStructType=out_schema,
        stateStructType="seen boolean",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def incremental_neardup_ingest(
    doc_stream: DataFrame,
    bucket_path: str,
    flags_path: str,
    checkpoint: str,
    num_hashes: int = 16,
    bands: int = 4,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    available_now: bool = True,
):
    """Online near-dup detection: each micro-batch of documents is minhashed
    and banded (operators/dedup.minhash_band_table), matched against the
    PERSISTED bucket table (docs seen in earlier batches), and appended to
    it. Two flag kinds land in ``flags_path``:

    * cross-batch: (new_id, dup_of) — new doc shares a band bucket with an
      already-ingested doc;
    * intra-batch: both ids from this batch (via the batch-mode pair op).

    State is the bucket table itself — parquet, partitioned by band_no, and
    exactly what the batch pipeline would have built; a later full batch
    job can take over seamlessly. Per batch: one signature pass over the
    delta + one join delta×buckets on (band_no, bucket) — never a rescan of
    history's text.
    """
    from pyspark.sql.streaming import StreamingQuery  # noqa: F401

    from vector_db_api_spark.operators import dedup as D

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        # foreachBatch is at-least-once: a retried/replayed micro-batch runs
        # this again with the SAME epoch_id. Every output row is stamped with
        # the epoch and written via dynamic partition overwrite, so a retry
        # overwrites its own epoch's partitions instead of appending dupes.
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        new_buckets = D.minhash_band_table(
            batch_df, num_hashes=num_hashes, bands=bands,
            id_col=id_col, text_col=text_col, k=k,
        ).persist()
        try:
            existing = _read_state_or_none(spark, bucket_path)
            # cross-batch flags: exclude this epoch's own bucket rows so a
            # RETRY (whose first attempt already appended buckets) doesn't
            # see the batch's docs as "already ingested"
            flags = None
            if existing is not None:
                cross = (
                    new_buckets.alias("n")
                    .join(
                        existing.filter(F.col("epoch") != epoch_id).alias("e"),
                        ["band_no", "bucket"],
                    )
                    .select(
                        F.col(f"n.{id_col}").cast("string").alias("new_id"),
                        F.col(f"e.{id_col}").cast("string").alias("dup_of"),
                    )
                    .filter(F.col("new_id") != F.col("dup_of"))
                    .distinct()
                )
                flags = cross
            intra = D.minhash_lsh_pairs(
                batch_df, num_hashes=num_hashes, bands=bands,
                id_col=id_col, text_col=text_col, k=k,
            ).select(
                F.col("left_id").cast("string").alias("new_id"),
                F.col("right_id").cast("string").alias("dup_of"),
            )
            flags = intra if flags is None else flags.unionByName(intra)
            (
                flags.withColumn("epoch", F.lit(epoch_id))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("epoch")
                .parquet(flags_path)
            )
            from vector_db_api_spark.streaming.ingest import resolve_state_dir

            (
                new_buckets.withColumn("epoch", F.lit(epoch_id))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("band_no", "epoch")
                # resolved per batch: pointer-mode compaction moves the
                # live state under <path>/v=N
                .parquet(resolve_state_dir(bucket_path))
            )
        finally:
            new_buckets.unpersist()

    writer = doc_stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_decontaminate(
    spark,
    input_path: str,
    input_schema: str,
    benchmark: DataFrame,
    flags_path: str,
    checkpoint: str,
    k: int = 8,
    min_shared: int = 1,
    id_col: str = "doc_id",
    bench_id_col: str = "bench_id",
    text_col: str = "text",
    available_now: bool = True,
):
    """Benchmark decontamination as a continuous job: flag training docs
    against the eval set AS THEY ARRIVE, not in a nightly sweep.

    The benchmark side is static for the life of the stream — its shingle
    table is computed once, cached, and broadcast into every micro-batch's
    hash join (same plan as the batch operator: the arriving corpus never
    shuffles). Flags land epoch-stamped with dynamic partition overwrite,
    so an at-least-once retry of a micro-batch replaces its own epoch
    instead of duplicating flags (the discipline every foreachBatch sink
    in this module follows).
    """
    from pyspark.sql import functions as F

    from vector_db_api_spark.operators.decontaminate import contamination_pairs

    bench_cached = benchmark.cache()
    bench_cached.count()  # materialize once; every batch reuses it

    stream = spark.readStream.schema(input_schema).parquet(input_path)

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        flags = contamination_pairs(
            batch_df, bench_cached, id_col, bench_id_col, text_col, k, min_shared
        )
        (
            flags.withColumn("epoch", F.lit(epoch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch")
            .parquet(flags_path)
        )

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_semantic_decontaminate(
    spark,
    input_path: str,
    input_schema: str,
    benchmark: DataFrame,
    threshold: float,
    flags_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    bench_id_col: str = "bench_id",
    vec_col: str = "embedding",
    centroids=None,
    nprobe: int = 2,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """The EMBEDDING form of :func:`streaming_decontaminate` (r14): flag
    arriving training docs whose embedding sits in an eval doc's cosine
    ball — the paraphrase leak the lexical shingle gate can't see — as
    they arrive. Stateless like the lexical gate (the benchmark is static
    for the life of the stream), so per-batch flags union to exactly the
    batch operator's answer and the at-least-once replay discipline is
    the usual epoch-stamped dynamic overwrite.

    Kernel: with ``centroids=None`` (default), the exact fused-matmul
    twin (``semantic_contamination_pairs_np`` — exact recall, one Arrow
    matmul per batch, no corpus shuffle; the right gate while eval sets
    are benchmark-sized). Pass ``centroids`` (+ ``nprobe``) to switch to
    the cell-blocked kernel for eval sides past the measured ~10³-10⁴
    crossover (BENCH_SCALE.md) — recall then < 1 by design; size nprobe
    to a MEASURED recall first. Flags carry ids only (the matmul twins'
    convention — summation-order cosines are not oracle-stable)."""
    from vector_db_api_spark.operators.decontaminate import (
        prepare_semantic_benchmark,
        semantic_contamination_pairs_blocked_np,
        semantic_contamination_pairs_np,
    )

    # the benchmark is static for the stream's life: collect + probe +
    # ship it ONCE here, not per micro-batch (ADVICE r14 #4 — the prior
    # form re-collected the bench and re-broadcast the matrices every
    # epoch on a long-lived stream)
    prepared = prepare_semantic_benchmark(
        benchmark, centroids=centroids, nprobe=nprobe,
        bench_id_col=bench_id_col, vec_col=vec_col,
    )

    reader = spark.readStream.schema(input_schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_path)

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():  # ADVICE r14 #5: match the module's sinks
            return
        if centroids is None:
            flags = semantic_contamination_pairs_np(
                batch_df, benchmark, threshold,
                id_col=id_col, bench_id_col=bench_id_col, vec_col=vec_col,
                prepared=prepared,
            ).select(id_col, bench_id_col)
        else:
            flags = semantic_contamination_pairs_blocked_np(
                batch_df, benchmark, threshold, centroids, nprobe=nprobe,
                id_col=id_col, bench_id_col=bench_id_col, vec_col=vec_col,
                prepared=prepared,
            )
        (
            flags.withColumn("epoch", F.lit(epoch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch")
            .parquet(flags_path)
        )

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_flags(spark, flags_path: str, schema: str) -> DataFrame:
    """Typed read of a decontamination-gate flags table that tolerates the
    zero-flag case: a drain whose every micro-batch flags NOTHING writes no
    partition (dynamic-partition overwrite of an empty frame creates no
    files, not even the root dir), so a bare ``spark.read.parquet`` raises
    PATH_NOT_FOUND — found by the r15 generated-corpus off-axis sweep,
    where the eval split genuinely has no cosine neighbor above the
    threshold. Returns an empty frame of ``schema`` (caller-declared id
    columns, e.g. ``"vec_id bigint, bench_id bigint"``) when no flag has
    ever been written; drops the ``epoch`` bookkeeping column otherwise."""
    from vector_db_api_spark.streaming.ingest import state_read_or_none

    df = state_read_or_none(spark, flags_path)
    if df is None:
        return spark.createDataFrame([], schema)
    return df.drop("epoch")


def semdedup_cell_bucket(cell, num_cell_buckets: int) -> Column:
    """Partition bucket for an admitted-state row: ``pmod(cell, B)``, with
    embedding-less rows (null cell) in the dedicated ``-1`` bucket. A
    BOUNDED directory fan-out (B × epochs) that still lets a micro-batch's
    ε-check prune to the buckets its delta touches."""
    c = F.col(cell) if isinstance(cell, str) else cell
    return F.coalesce(F.pmod(c, F.lit(num_cell_buckets)).cast("int"), F.lit(-1))


def semdedup_prior_for_cells(
    state: DataFrame, cells, num_cell_buckets: int
) -> DataFrame:
    """The slice of the admitted state a delta touching ``cells`` must be
    ε-checked against: a LITERAL ``cell_bucket IN (...)`` filter — a static
    partition-pruning predicate, so Spark lists/reads only the touched
    buckets' files (the wide ``__u`` vectors in untouched buckets are never
    scanned). Per-batch cost is O(delta's cells / B of history), not
    O(history) — the r4 full-state-scan fix."""
    buckets = sorted({int(c) % num_cell_buckets for c in cells})
    return state.filter(
        F.col("cell_bucket").isin(buckets) & F.col("cell").isNotNull()
    )


def migrate_semdedup_state(
    spark, state_path: str, num_cell_buckets: int = 16
) -> None:
    """One-time rewrite of a legacy (epoch-only) admitted-state dir into
    the ``(epoch, cell_bucket)`` layout, via the crash-safe two-rename
    swap. No-op when the state is already bucketed.

    This must happen BEFORE any bucketed write lands in a legacy dir:
    parquet refuses to read a directory whose partition trees disagree
    (``CONFLICTING_PARTITION_COLUMN_NAMES``), so appending the new layout
    beside old epoch-only partitions would poison the whole table. The
    ingest calls this automatically on first contact with legacy state."""
    from vector_db_api_spark.streaming.ingest import _swap_in, resolve_state_dir

    live = resolve_state_dir(state_path)  # migrate the LIVE dir under pointer mode
    df = spark.read.parquet(live)
    if "cell_bucket" in df.columns:
        return
    _swap_in(
        df.withColumn(
            "cell_bucket", semdedup_cell_bucket("cell", num_cell_buckets)
        ),
        live,
        ("epoch", "cell_bucket"),
    )


def incremental_semdedup_ingest(
    doc_stream: DataFrame,
    state_path: str,
    checkpoint: str,
    centroids,
    threshold: float,
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    available_now: bool = True,
    epoch_offset: int = 0,
    num_cell_buckets: int = 16,
):
    """Continuous SemDeDup: admit a vector only if no already-admitted
    vector sits within ``cosine ≥ threshold`` in the same centroid cell.

    ``epoch_offset`` namespaces the state partitions when SEPARATE
    streaming runs (fresh checkpoints, e.g. a daily availableNow job)
    append to the same state: each run's epochs restart at 0, and without
    an offset run N's dynamic partition overwrite would wipe run N-1's
    ``epoch=0`` partition. One long-lived checkpointed stream needs no
    offset — its epoch ids already never repeat.

    Two-stage rule per micro-batch, both stages the real batch operators
    (operators/semdedup.py):

    1. batch-internal prune with the paper's diversity priority
       (``semdedup_kept``);
    2. survivors are checked against the PERSISTED admitted corpus —
       first-seen-wins across epochs (arrival order IS the cross-batch
       priority, the streaming analogue of the batch diversity rule).

    State is the admitted corpus annotated for reuse — original columns
    plus ``cell`` and the unit vector ``__u`` (null for rows with no
    embedding), parquet partitioned by ``(epoch, cell_bucket)`` where
    ``cell_bucket = pmod(cell, num_cell_buckets)`` (null cell → -1) — so
    each batch compares its delta against history WITHOUT re-deriving
    history's assignments AND without reading it all: the ε-check reads
    only the buckets the delta's cells map to (static partition pruning;
    see :func:`semdedup_prior_for_cells`), while the admitted-id anti-join
    reads the skinny id column across buckets. A batch job (or an indexer)
    can take over the corpus seamlessly.

    Idempotence, precisely:

    * Epoch retries: the state read EXCLUDES the epoch being written
      (partition-pruned filter), so a replayed foreachBatch sees exactly
      the pre-crash history and recomputes the identical partition — a
      survivor can never be re-judged against its own half-committed
      write.
    * Re-ingest: a document id already admitted in an earlier epoch is
      final (id anti-join — covers null-embedding rows too), and a new id
      whose vector sits within ε of an admitted one is rejected by the
      ε-check — history self-heals with no latest_rows-style dedup.
    """
    from vector_db_api_spark.functions import vector as V
    from vector_db_api_spark.operators.semdedup import (
        assign_diversity,
        semdedup_kept,
    )

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        from vector_db_api_spark.streaming.ingest import resolve_state_dir

        spark = batch_df.sparkSession
        this_epoch = epoch_id + epoch_offset
        # one row per id within the batch: duplicate ids tie on (csim, id)
        # in the stage-1 priority, so neither would outrank the other and
        # both would survive — mirror the cross-epoch "admitted id is
        # final" rule inside the batch before any ε-work. The survivor must
        # be DETERMINISTIC (min content fingerprint, not dropDuplicates'
        # arbitrary pick): a replayed epoch rewrites only the cell_bucket
        # partitions its output touches, so a retry that chose a different
        # row could land a different bucket and leave the first attempt's
        # stale bucket row alive.
        from pyspark.sql import Window

        # whole-row fingerprint: ties after it can only be bit-identical rows
        fp = F.md5(F.to_json(F.struct(*[F.col(c) for c in batch_df.columns])))
        w = Window.partitionBy(id_col).orderBy(fp)
        batch_df = (
            batch_df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        kept = semdedup_kept(
            batch_df, centroids, threshold, id_col=id_col, vec_col=vec_col
        )
        # annotate survivors once; degenerate rows keep null (cell, __u)
        ann = assign_diversity(
            kept, centroids, id_col=id_col, vec_col=vec_col
        ).select(id_col, "cell", "__u")
        annotated = kept.join(ann, id_col, "left").persist()
        kept = annotated
        try:
            state = _read_state_or_none(spark, state_path)
            if state is not None:
                state = state.filter(F.col("epoch") != this_epoch)
            if state is not None and "cell_bucket" not in state.columns:
                # legacy (epoch-only) layout: MIGRATE the directory before
                # this epoch's bucketed write lands beside it — mixed
                # partition trees make the dir unreadable
                # (CONFLICTING_PARTITION_COLUMN_NAMES on the next read)
                migrate_semdedup_state(spark, state_path, num_cell_buckets)
                state = _read_state_or_none(spark, state_path).filter(
                    F.col("epoch") != this_epoch
                )
            if state is not None:
                # an already-admitted id is final (incl. embedding-less
                # docs) — a skinny one-column read across all buckets
                kept = kept.join(state.select(id_col), id_col, "left_anti")
                # ε-check only against the buckets this delta touches:
                # cells-per-batch is bounded by the centroid count, so the
                # collect is model-sized, and the literal IN prunes the
                # wide (__u) state read to |touched buckets| / B of history
                touched = [
                    r["cell"]
                    for r in kept.filter(F.col("cell").isNotNull())
                    .select("cell")
                    .distinct()
                    .collect()
                ]
                if touched:
                    prior = semdedup_prior_for_cells(
                        state, touched, num_cell_buckets
                    ).select(
                        F.col("cell").alias("__pcell"), F.col("__u").alias("__pu")
                    )
                    conflict = (
                        kept.filter(F.col("cell").isNotNull())
                        .join(prior, F.col("cell") == F.col("__pcell"))
                        .filter(V.dot("__u", "__pu") >= threshold)
                        .select(id_col)
                        .distinct()
                    )
                    kept = kept.join(conflict, id_col, "left_anti")
            (
                kept.withColumn("epoch", F.lit(this_epoch))
                .withColumn(
                    "cell_bucket", semdedup_cell_bucket("cell", num_cell_buckets)
                )
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("epoch", "cell_bucket")
                # resolved per batch — pointer-mode-safe (see ingest.py)
                .parquet(resolve_state_dir(state_path))
            )
        finally:
            annotated.unpersist()

    writer = doc_stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def incremental_span_dedup_ingest(
    doc_stream: DataFrame,
    state_path: str,
    out_path: str,
    checkpoint: str,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    available_now: bool = True,
    epoch_offset: int = 0,
):
    """Continuous cross-document duplicated-span removal: the streaming
    form of ``operators/span_dedup.span_dedup`` (same building blocks,
    same semantics when documents arrive in id order).

    Per micro-batch:

    * gram the batch (``gram_occurrences`` — map-side);
    * an occurrence is DUPLICATED if its gram was admitted by an earlier
      epoch (state hit) OR it is not the batch's (id, start)-first of its
      gram class (the batch-internal window);
    * merge intervals, surgically clean the batch's docs, land them in
      ``out_path`` (epoch-partitioned);
    * admit the batch-first occurrences of UNSEEN grams into the seen-gram
      state (epoch-partitioned parquet at ``state_path``).

    Equivalence contract (pinned by the suite oracle): when batches
    partition the corpus in non-decreasing id order, the drained stream's
    out_path equals the batch ``span_dedup`` output row-for-row — the
    cross-epoch "state hit" rule and the batch window compose to the same
    global keep-first.

    Idempotence: foreachBatch is at-least-once; both sinks stamp ``epoch``
    and write dynamic-partition overwrite, and the state read excludes the
    CURRENT epoch, so a replayed batch overwrites its own output instead
    of double-removing or double-admitting (the incremental_neardup_ingest
    pattern). ``epoch_offset`` keeps epochs distinct across multiple runs
    sharing one state dir.

    Scale: state is one 8-byte hash row per distinct admitted gram — the
    same asymptotics as the batch window's shuffle, queryable as a plain
    parquet table, partitioned by epoch for cheap compaction. The seen-gram
    state has SET semantics (later epochs re-record grams the gate already
    honors), so compact with streaming/ingest.py compact_set_state —
    row-level DISTINCT into one COMPACT_EPOCH partition; compact_epoch_state
    (max-epoch-per-id) would drop earlier gram rows the seen-reads rely on.
    """
    def process(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        epoch = epoch_id + epoch_offset
        cleaned = span_dedup_epoch(
            batch_df, state_path, epoch, n=n, id_col=id_col,
            text_col=text_col,
        )
        (
            cleaned.withColumn("epoch", F.lit(epoch))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch")
            .parquet(out_path)
        )

    writer = doc_stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def span_dedup_epoch(
    batch_df: DataFrame,
    state_path: str,
    epoch: int,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One micro-batch of continuous span dedup, factored out so composed
    pipelines (streaming/curate.py, r12 verdict #8) run the identical
    stage: clean ``batch_df`` against the seen-gram state (excluding the
    CURRENT epoch — replay-safe), ADMIT the batch-first occurrences of
    unseen grams into the state (epoch-partitioned dynamic overwrite),
    and return the cleaned frame MATERIALIZED (localCheckpoint — the
    caller owns the output sink; returning a lazy plan after unpersisting
    the flagged table would recompute the whole stage per downstream
    action)."""
    from pyspark.sql import Window

    from vector_db_api_spark.operators.span_dedup import (
        gram_occurrences,
        merge_intervals,
        remove_spans,
    )
    from vector_db_api_spark.streaming.ingest import resolve_state_dir

    spark = batch_df.sparkSession
    occ = gram_occurrences(batch_df, n, id_col, text_col)
    w = Window.partitionBy("__gh").orderBy(id_col, "start")
    ranked = occ.withColumn("__rn", F.row_number().over(w))
    existing = _read_state_or_none(spark, state_path)
    if existing is not None:
        prior = (
            existing.filter(F.col("epoch") != epoch)
            .select("__gh").distinct()
            .withColumn("__seen", F.lit(True))
        )
        flagged = ranked.join(prior, "__gh", "left").persist()
    else:
        flagged = ranked.withColumn(
            "__seen", F.lit(None).cast("boolean")
        ).persist()
    try:
        dup = flagged.filter(
            (F.col("__rn") > 1) | F.col("__seen").isNotNull()
        ).select(
            F.col(id_col),
            F.col("start").alias("lo"),
            (F.col("start") + F.lit(n - 1)).alias("hi"),
        )
        cleaned = remove_spans(
            batch_df, merge_intervals(dup, id_col), id_col, text_col
        ).localCheckpoint(eager=True)
        admitted = flagged.filter(
            (F.col("__rn") == 1) & F.col("__seen").isNull()
        ).select("__gh", F.col(id_col).alias("first_id"),
                 F.col("start").alias("first_start"))
        (
            admitted.withColumn("epoch", F.lit(epoch))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch")
            .parquet(resolve_state_dir(state_path))
        )
        return cleaned
    finally:
        flagged.unpersist()


def incremental_line_dedup_ingest(
    doc_stream: DataFrame,
    state_path: str,
    out_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    available_now: bool = True,
    epoch_offset: int = 0,
):
    """Continuous keep-first line dedup: the streaming form of
    ``operators/lines.line_dedup_keep_first`` (r13). A batch's line
    occurrence is removed iff its normalized-line hash was admitted by an
    EARLIER epoch (state hit) or a smaller-id doc of the same batch
    carries it; the first-seen doc keeps its copy, and the batch-first
    occurrences of unseen hashes are admitted into the seen-line state.
    (The batch ``line_dedup`` CCNet rule — remove from EVERY doc — cannot
    stream: an ingest pipeline cannot retro-remove the first occurrence
    it already emitted.)

    Equivalence contract (the suite oracle): with batches arriving in
    non-decreasing id order, the drained out_path equals the BATCH
    ``line_dedup_keep_first`` answer row-for-row.

    Idempotence: epoch-stamped dynamic overwrite on both sinks; the state
    read excludes the CURRENT epoch (the span/semdedup pattern), so an
    at-least-once replay reproduces its own partitions. State is one
    8-byte hash row (+ first-doc provenance) per distinct admitted line —
    SET semantics like the seen-gram state, so compact with
    streaming/ingest.py ``compact_set_state`` (row-level DISTINCT into one
    COMPACT_EPOCH partition); ``compact_epoch_state``'s max-epoch-per-id
    dedup would be wrong for any state where the same key may recur across
    epochs."""
    from vector_db_api_spark.operators.lines import (
        _lines,
        line_occurrences,
    )
    from vector_db_api_spark.streaming.ingest import resolve_state_dir

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        epoch = epoch_id + epoch_offset
        spark = batch_df.sparkSession
        occ = line_occurrences(batch_df, id_col, text_col)
        first = occ.groupBy("__lh").agg(
            F.min(F.col(id_col)).alias("__first_id")
        )
        flagged = occ.join(first, "__lh")
        existing = _read_state_or_none(spark, state_path)
        if existing is not None:
            prior = (
                existing.filter(F.col("epoch") != epoch)
                .select("__lh").distinct()
                .withColumn("__seen", F.lit(True))
            )
            flagged = flagged.join(prior, "__lh", "left")
        else:
            flagged = flagged.withColumn(
                "__seen", F.lit(None).cast("boolean")
            )
        flagged = flagged.persist()
        try:
            removed = (
                flagged.filter(
                    (F.col(id_col) > F.col("__first_id"))
                    | F.col("__seen").isNotNull()
                )
                .groupBy(id_col)
                .agg(F.collect_set("pos").alias("__rm"))
            )
            lines = _lines(text_col)
            cleaned = batch_df.join(removed, id_col, "left").select(
                F.col(id_col),
                F.size(lines).cast("bigint").alias("n_lines"),
                F.coalesce(F.size("__rm"), F.lit(0)).cast("bigint").alias(
                    "n_lines_removed"
                ),
                F.array_join(
                    F.filter(
                        lines,
                        lambda ln, i: F.when(
                            F.col("__rm").isNull(), F.lit(True)
                        ).otherwise(~F.array_contains(F.col("__rm"), i)),
                    ),
                    "\n",
                ).alias("clean_text"),
            )
            (
                cleaned.withColumn("epoch", F.lit(epoch))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("epoch")
                .parquet(out_path)
            )
            admitted = (
                flagged.filter(
                    (F.col(id_col) == F.col("__first_id"))
                    & F.col("__seen").isNull()
                )
                .select("__lh", F.col(id_col).alias("first_id"))
                .distinct()
            )
            (
                admitted.withColumn("epoch", F.lit(epoch))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("epoch")
                .parquet(resolve_state_dir(state_path))
            )
        finally:
            flagged.unpersist()

    writer = doc_stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
