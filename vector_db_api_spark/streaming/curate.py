"""Composed streaming curation: Gopher gate → continuous span dedup →
near-dup admission, in ONE foreachBatch pipeline (r12 verdict #8).

``suite.corpus_curate_full`` proves the batch curation stages COMPOSE;
each streaming counterpart was verified alone. This module composes the
streaming forms so an ingest pipeline curates documents as they arrive:

1. **Gopher structure gate** (``operators/gopher.gopher_filter``) —
   stateless Column predicate, applied per micro-batch. No state, no
   cross-batch coupling.
2. **Continuous span dedup** (``streaming/dedup.span_dedup_epoch`` — the
   SAME stage ``incremental_span_dedup_ingest`` runs) — the batch's
   duplicated spans are removed against (and its first-seen grams
   admitted into) the persisted seen-gram state at
   ``<state_root>/grams``.
3. **Near-dup admission** over the CLEANED text — the batch's minhash
   band-bucket rows (``operators/dedup.minhash_band_table``) are matched
   against the persisted bucket state at ``<state_root>/buckets``; a doc
   is ADMITTED iff it shares no (band_no, bucket) with any
   earlier-epoch doc NOR with a smaller-id doc of its own batch. ALL of
   the batch's bucket rows join the state (seen ≠ admitted — a rejected
   near-dup still poisons its buckets, exactly like the batch pipeline
   where a dropped doc still anchors its component).

Equivalence contract (the suite oracle): when batches partition the
corpus in non-decreasing id order, "earlier epoch" implies "smaller id",
so the drained admitted set equals the ONE-SHOT rule "kept iff no band
bucket is shared with any smaller-id doc of the gated+cleaned corpus" —
plain SQL over the same CTE chain as the batch curation oracle (no
recursion needed: the admission rule is direct-edge, not
connected-components; that is the deliberate semantic difference from
batch ``dedup_near``, which keeps one representative per TRANSITIVE
component — an online pipeline cannot know future members of a
component, so it admits on direct evidence only; with id-ordered arrival
the admitted set is a SUPERSET of the batch representatives).

Idempotence: foreachBatch is at-least-once; all three sinks (gram state,
bucket state, admitted output) stamp ``epoch`` and write dynamic
partition overwrite, and every state read excludes the CURRENT epoch, so
a replayed batch reproduces its own partitions bit-for-bit instead of
double-admitting. ``epoch_offset`` namespaces epochs across separate
runs sharing one state root (the incremental_semdedup_ingest contract).

Scale: stage 1 is scan-fused (no shuffle); stage 2 shuffles the BATCH's
grams once plus a semi-join against gram state (8-byte hash rows);
stage 3 shuffles the batch's band rows once plus an equi-join against
the bucket state partitioned by band_no. State grows with the corpus'
distinct grams/buckets, never rescanning history's text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vector_db_api_spark.streaming.dedup import (
    _read_state_or_none,
    span_dedup_epoch,
)


def incremental_curate_ingest(
    doc_stream: DataFrame,
    state_root: str,
    out_path: str,
    checkpoint: str,
    n: int = 8,
    num_hashes: int = 16,
    bands: int = 4,
    k: int = 3,
    gopher_thresholds: dict | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    available_now: bool = True,
    epoch_offset: int = 0,
):
    """Start the composed curation stream. Admitted documents land in
    ``out_path`` (epoch-partitioned) with their span-cleaned text and the
    span stats; state lives under ``<state_root>/grams`` and
    ``<state_root>/buckets``."""
    from vector_db_api_spark.operators import dedup as D
    from vector_db_api_spark.operators import gopher as G
    from vector_db_api_spark.streaming.ingest import resolve_state_dir

    gram_state = f"{state_root}/grams"
    bucket_state = f"{state_root}/buckets"
    thresholds = gopher_thresholds or {}

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        epoch = epoch_id + epoch_offset
        spark = batch_df.sparkSession
        # stage 1: stateless structure gate
        gated = G.gopher_filter(batch_df, id_col, text_col, **thresholds)
        if gated.isEmpty():
            return
        # stage 2: span dedup against (and admitting into) the gram state;
        # returns the cleaned frame materialized
        cleaned = span_dedup_epoch(
            gated, gram_state, epoch, n=n, id_col=id_col, text_col=text_col
        )
        cdocs = cleaned.select(
            F.col(id_col), F.col("clean_text").alias(text_col),
            "n_tokens", "n_tokens_removed", "n_spans",
        )
        # stage 3: near-dup admission on the cleaned text
        bb = D.minhash_band_table(
            cdocs, num_hashes=num_hashes, bands=bands,
            id_col=id_col, text_col=text_col, k=k,
        ).persist()
        try:
            # intra-batch: flagged iff a SMALLER id shares the bucket —
            # min-per-bucket instead of a pair explosion
            w = Window.partitionBy("band_no", "bucket")
            intra_flagged = (
                bb.withColumn("__min_id", F.min(id_col).over(w))
                .filter(F.col(id_col) != F.col("__min_id"))
                .select(id_col)
            )
            flagged = intra_flagged
            existing = _read_state_or_none(spark, bucket_state)
            if existing is not None:
                cross = (
                    bb.join(
                        existing.filter(F.col("epoch") != epoch)
                        .select("band_no", "bucket").distinct(),
                        ["band_no", "bucket"],
                    ).select(id_col)
                )
                flagged = flagged.unionByName(cross)
            admitted = cdocs.join(
                flagged.distinct(), id_col, "left_anti"
            )
            (
                admitted.withColumn("epoch", F.lit(epoch))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("epoch")
                .parquet(out_path)
            )
            # seen-state append: ALL batch docs' buckets, admitted or not
            (
                bb.withColumn("epoch", F.lit(epoch))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("band_no", "epoch")
                .parquet(resolve_state_dir(bucket_state))
            )
        finally:
            bb.unpersist()

    writer = doc_stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
