"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, with Arrow-batched decode/feature plumbing.

The container has no image/audio codecs, so the DECODE step is stubbed two
ways (clearly marked):

- ``decode_stub="fake"`` — a deterministic fake decoder (bytes → pseudo
  pixels/frames) so the Spark-side plumbing (schema, batch shape, UDF
  signature, partitioning) is fully real and testable;
- ``decode_stub="error"`` — raises ``NotImplementedError`` at the decode
  call site, the hook where a real ``PIL.Image.open`` / ``av.open`` drops
  in unchanged.

Everything around the stub is production-shaped: binary columns flow
through Arrow ``mapInPandas`` in columnar batches (never row-at-a-time
Python), byte-level ops (length, hash) stay JVM-side, and per-modality
metadata is a typed struct, mirroring how the reference types chunk
metadata (models/metadata.py:15-18).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id string, modality string, content binary, "
    "meta struct<mime_type:string, byte_len:long, sha256:string>"
)


def derive_media(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Stand-in media table: UTF-8 bytes of the text as the opaque payload,
    modality assigned round-robin. Deterministic → oracle-able byte math."""
    content = F.encode(F.col(text_col), "UTF-8")
    modality = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col(id_col) % 3 + 1).cast("int"),
    )
    return docs.select(
        F.concat(F.lit("m"), F.col(id_col)).alias("media_id"),
        modality.alias("modality"),
        content.alias("content"),
        F.struct(
            F.concat(F.lit("application/x-fake-"), modality).alias("mime_type"),
            F.length(content).cast("long").alias("byte_len"),
            F.sha2(content, 256).alias("sha256"),
        ).alias("meta"),
    )


def media_stats(media: DataFrame) -> DataFrame:
    """JVM-side byte stats — no decode needed, no Python in the path."""
    return media.select(
        "media_id",
        "modality",
        F.length("content").cast("long").alias("byte_len"),
        F.sha2("content", 256).alias("content_sha"),
    )


def _fake_decode(payload: bytes, modality: str, n_frames: int) -> list[list[float]]:
    """Deterministic fake decoder: n_frames 'frames', each an 8-dim feature
    from evenly-spaced payload bytes (/255). Replace with a real codec here."""
    if not payload:
        return [[0.0] * 8 for _ in range(n_frames)]
    out = []
    step = max(1, len(payload) // n_frames)
    for f in range(n_frames):
        base = (f * step) % len(payload)
        frame = [(payload[(base + j) % len(payload)]) / 255.0 for j in range(8)]
        out.append(frame)
    return out


def extract_features(
    media: DataFrame,
    n_frames: int = 4,
    decode_stub: str = "fake",
) -> DataFrame:
    """binary → per-frame feature vectors via Arrow-batched mapInPandas.

    Output: (media_id, modality, frame_no, features array<float>) — one row
    per sampled frame; the real decode would slot into ``_fake_decode``.
    """
    import pandas as pd

    if decode_stub not in ("fake", "error"):
        raise ValueError("decode_stub must be 'fake' or 'error'")
    out_schema = "media_id string, modality string, frame_no int, features array<float>"

    def decode_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            if pdf.empty:
                continue
            ids, mods, frames, feats = [], [], [], []
            for mid, mod, content in zip(
                pdf["media_id"], pdf["modality"], pdf["content"]
            ):
                if decode_stub == "error":
                    raise NotImplementedError(
                        "real image/audio/video decode is not available in "
                        "this environment — swap _fake_decode for a codec"
                    )
                payload = bytes(content) if content is not None else b""
                for fno, fv in enumerate(_fake_decode(payload, mod, n_frames)):
                    ids.append(mid)
                    mods.append(mod)
                    frames.append(fno)
                    feats.append(fv)
            yield pd.DataFrame(
                {"media_id": ids, "modality": mods, "frame_no": frames, "features": feats}
            )

    return media.select("media_id", "modality", "content").mapInPandas(
        decode_batches, schema=out_schema
    )


def sample_frames(
    feats: DataFrame, stride: int = 2, max_frames: int | None = None
) -> DataFrame:
    """Frame sampling over the per-frame feature table: keep every
    ``stride``-th frame (and at most ``max_frames`` of those). Pure
    filters on ``frame_no`` — no shuffle, no Python; at 100 TB this is a
    predicate the scan evaluates, and when the feature table is persisted
    partitioned/sorted by frame_no it prunes instead of scanning.

    This is the cheap half of video sampling: run it BEFORE expensive
    per-frame work (embedding, OCR) so the downstream operator sees
    1/stride of the rows.
    """
    if stride < 1:
        raise ValueError("stride must be >= 1")
    out = feats.filter(F.col("frame_no") % stride == 0)
    if max_frames is not None:
        out = out.filter(F.col("frame_no") < max_frames * stride)
    return out


def resize_features(
    feats: DataFrame, out_dim: int, features_col: str = "features"
) -> DataFrame:
    """Adaptive average-pool a feature vector to ``out_dim`` — the
    feature-space analogue of image resize, on the real plumbing (the fake
    decoder stands in for pixels). Output component j averages the input
    segment [floor(j·d/m), floor((j+1)·d/m)) — exactly how 1-D adaptive
    pooling downscales, and upscale (m > d) repeats source elements.

    Pure Column expressions (sequence → transform → slice → aggregate
    fold): JVM-side, scan-parallel, no shuffle, deterministic — so it
    composes with the oracle-checked operators downstream.
    """
    if out_dim < 1:
        raise ValueError("out_dim must be >= 1")
    src = F.col(features_col)
    d = F.size(src)
    m = F.lit(out_dim)

    def pool(j):
        start = F.floor(j * d / m).cast("int")
        end = F.greatest(
            F.floor((j + 1) * d / m).cast("int"), start + 1
        )  # at least one source element per output slot
        seg = F.slice(src, start + 1, end - start)
        total = F.aggregate(
            seg, F.lit(0.0), lambda a, x: a + x.cast("double")
        )
        return (total / F.size(seg)).cast("float")

    resized = F.transform(F.sequence(F.lit(0), m - 1), pool)
    return feats.withColumn(features_col, resized)


def media_embeddings(
    media: DataFrame, n_frames: int = 4, decode_stub: str = "fake"
) -> DataFrame:
    """(media_id, modality, embedding) — mean-pooled frame features, the
    bridge from opaque binary columns into every vector operator (kNN, IVF,
    LSH, embedding near-dup) in this engine.

    The pooling is JVM-side: frames collect per media row (bounded by
    ``n_frames``, not corpus size), element-wise summed with
    ``aggregate``/``zip_with`` folds, divided by the frame count. One
    shuffle, keyed on media_id. Identical payloads pool to identical
    embeddings (the fake decoder is deterministic), so exact/near dedup
    composes downstream.
    """
    feats = extract_features(media, n_frames=n_frames, decode_stub=decode_stub)
    frames = feats.groupBy("media_id", "modality").agg(
        F.collect_list("features").alias("__frames")
    )
    dim = F.size(F.element_at("__frames", 1))
    zero = F.transform(
        F.sequence(F.lit(1), dim), lambda _: F.lit(0.0)
    )
    summed = F.aggregate(
        "__frames",
        zero,
        lambda acc, fr: F.zip_with(
            acc, fr, lambda a, b: a + b.cast("double")
        ),
    )
    n = F.size("__frames")
    return frames.select(
        "media_id",
        "modality",
        F.transform(summed, lambda s: s / n).alias("embedding"),
    )


def media_phash(
    media: DataFrame, n_frames: int = 4, nbits: int = 60, decode_stub: str = "fake"
) -> DataFrame:
    """(media_id, modality, phash): perceptual hash of a media payload —
    sign bits of the mean-pooled frame features against their own mean
    (the aHash/pHash recipe: threshold each component at the global mean,
    pack the bits). Bit i is set iff component (i mod dim) of the pooled
    embedding exceeds the embedding's mean; for nbits > dim the pattern
    repeats shifted so the fingerprint fills the band width downstream
    banding expects.

    Pure Column expressions over the pooled embedding (JVM folds); near-
    identical payloads decode to near-identical features, so their phashes
    differ in few bits — feed :func:`dedup.hamming_pairs`.
    """
    emb = media_embeddings(media, n_frames=n_frames, decode_stub=decode_stub)
    dim = F.size("embedding")
    mean = F.aggregate(
        "embedding", F.lit(0.0), lambda a, x: a + x
    ) / dim.cast("double")
    bit = lambda i: F.when(
        F.element_at("embedding", (F.lit(i) % dim) + 1) > mean, F.lit(1).cast("long")
    ).otherwise(F.lit(0).cast("long"))
    packed = None
    for i in range(nbits):
        term = F.shiftleft(bit(i), i)
        packed = term if packed is None else packed + term
    return emb.select("media_id", "modality", packed.alias("phash"))


def media_neardup_pairs(
    media: DataFrame,
    max_distance: int = 3,
    n_frames: int = 4,
    nbits: int = 60,
    decode_stub: str = "fake",
) -> DataFrame:
    """(left_id, right_id, hamming): near-duplicate media payloads via
    perceptual-hash banding — the image/audio analogue of text simhash
    dedup, reusing the same pigeonhole-banded pair generator."""
    from .dedup import hamming_pairs

    ph = media_phash(media, n_frames, nbits, decode_stub)
    return hamming_pairs(ph, "media_id", "phash", max_distance, nbits)
