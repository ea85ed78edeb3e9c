"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, with Arrow-batched decode/feature plumbing.

Three decode modes (``decode_stub``):

- ``"real"`` — REAL pure-Python parsers for two uncompressed public
  formats: binary PPM (P6) images and RIFF/WAVE 16-bit PCM audio. No
  codec libraries needed; :func:`decode_ppm` / :func:`decode_wav` handle
  any spec-conforming file (whitespace/comment-tolerant PPM header, chunked
  RIFF walking). Pair with :func:`derive_media_files`, which synthesizes
  deterministic VALID files whose pixel/sample bytes derive from
  ``sha256(text)`` — so a SQL engine can replay decode → features →
  pooled embedding → phash from the hex digest alone, making every
  downstream operator value-oracle-checkable.
- ``"fake"`` — a deterministic fake decoder (bytes → pseudo frames) for
  plumbing tests on arbitrary payloads.
- ``"error"`` — raises ``NotImplementedError`` at the decode call site,
  the hook where a compressed-format codec (``PIL.Image.open`` /
  ``av.open``) would drop in unchanged.

Everything around decode is production-shaped: binary columns flow
through Arrow ``mapInPandas`` in columnar batches (never row-at-a-time
Python), byte-level ops (length, hash) stay JVM-side, and per-modality
metadata is a typed struct, mirroring how the reference types chunk
metadata (models/metadata.py:15-18).
"""

from __future__ import annotations

import struct as _struct

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


# -- real formats: binary PPM (P6) and RIFF/WAVE 16-bit PCM -----------------

_WAV_N_SAMPLES = 64
_WAV_HEADER = (
    b"RIFF"
    + _struct.pack("<I", 36 + 2 * _WAV_N_SAMPLES)
    + b"WAVEfmt "
    + _struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
    + b"data"
    + _struct.pack("<I", 2 * _WAV_N_SAMPLES)
)


def derive_media_files(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Media table of VALID uncompressed files: P6 PPM images (8×8), P6
    PPM "video" (8×16 — two stacked frames), and RIFF/WAVE 16-bit PCM
    audio (64 samples), one per doc, modality round-robin on the id.

    The pixel/sample payload repeats the 32 bytes of ``sha256(text)``, so
    the files are deterministic AND an external SQL engine can recompute
    every decoded value from the hex digest — that is what lets the
    decode → feature → embed → phash chain carry a value-bearing oracle.
    The files themselves are spec-conforming: any PPM/WAV reader decodes
    them."""
    digest = F.unhex(F.sha2(F.coalesce(F.col(text_col), F.lit("")), 256))
    image = F.concat(F.lit(b"P6\n8 8\n255\n"), *([digest] * 6))      # 192 B RGB
    video = F.concat(F.lit(b"P6\n8 16\n255\n"), *([digest] * 12))    # 384 B RGB
    audio = F.concat(F.lit(_WAV_HEADER), *([digest] * 4))            # 128 B PCM
    m = F.col(id_col) % 3
    content = (
        F.when(m == 0, image).when(m == 1, audio).otherwise(video)
    )
    modality = (
        F.when(m == 0, F.lit("image"))
        .when(m == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
    )
    mime = (
        F.when(m == 0, F.lit("image/x-portable-pixmap"))
        .when(m == 1, F.lit("audio/wav"))
        .otherwise(F.lit("video/x-ppm-stack"))
    )
    return docs.select(
        F.concat(F.lit("m"), F.col(id_col)).alias("media_id"),
        modality.alias("modality"),
        content.alias("content"),
        F.struct(
            mime.alias("mime_type"),
            F.length(content).cast("long").alias("byte_len"),
            F.sha2(content, 256).alias("sha256"),
        ).alias("meta"),
    )


def decode_ppm(payload: bytes) -> tuple[int, int, bytes]:
    """Parse a binary PPM (P6): returns (width, height, rgb_bytes).

    A real parser, not a stub: tolerates arbitrary whitespace and ``#``
    comments in the header (per the netpbm spec), validates the magic,
    maxval and payload length. Raises ValueError on malformed input."""
    if payload[:2] != b"P6":
        raise ValueError("not a binary PPM (P6) payload")
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"only maxval 255 supported, got {maxval}")
    pixels = payload[pos : pos + 3 * w * h]
    if len(pixels) != 3 * w * h:
        raise ValueError("truncated PPM pixel data")
    return w, h, pixels


def decode_wav(payload: bytes) -> list[int]:
    """Parse a RIFF/WAVE file: returns the int16 PCM samples (mono, or
    channel-interleaved as stored). A real chunk-walking parser: finds
    ``fmt `` and ``data`` wherever they sit, validates PCM/16-bit."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt_ok, data = 12, False, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = _struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, _ch, _rate = _struct.unpack("<HHI", body[:8])
            bits = _struct.unpack("<H", body[14:16])[0]
            if audio_fmt != 1 or bits != 16:
                raise ValueError("only 16-bit PCM supported")
            fmt_ok = True
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if not fmt_ok or data is None:
        raise ValueError("missing fmt/data chunk")
    return list(_struct.unpack(f"<{len(data) // 2}h", data))


def _real_decode(payload: bytes, modality: str, n_frames: int) -> list[list[float]]:
    """Decode a real PPM/WAV payload into ``n_frames`` 8-dim feature
    frames — the arithmetic is deliberately simple (integer byte math, one
    double division per component) so an external engine replays it:

    - PPM: frame f reads pixel row ``(f*h)//n_frames``; component j is
      ``(R+G+B)/765`` of the pixel in column ``(j*w)//8``.
    - WAV: frame f reads 8 consecutive samples from offset
      ``(f*n)//n_frames``; component j is ``sample/32768``.
    """
    if payload[:2] == b"P6":
        w, h, pix = decode_ppm(payload)
        out = []
        for f in range(n_frames):
            row = (f * h) // n_frames
            frame = []
            for j in range(8):
                col = (j * w) // 8
                o = 3 * (row * w + col)
                frame.append((pix[o] + pix[o + 1] + pix[o + 2]) / 765.0)
            out.append(frame)
        return out
    if payload[:4] == b"RIFF":
        samples = decode_wav(payload)
        n = len(samples)
        if n == 0:
            return [[0.0] * 8 for _ in range(n_frames)]
        return [
            [samples[((f * n) // n_frames + j) % n] / 32768.0 for j in range(8)]
            for f in range(n_frames)
        ]
    raise ValueError(f"unrecognized media payload for modality {modality!r}")


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

    if decode_stub not in ("real", "fake", "error"):
        raise ValueError("decode_stub must be 'real', 'fake' or 'error'")
    out_schema = "media_id string, modality string, frame_no int, features array<float>"
    decoder = _real_decode if decode_stub == "real" else _fake_decode

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
                        "no codec for compressed formats in this environment "
                        "— decode_stub='real' handles PPM/WAV; swap in "
                        "PIL/av here for JPEG/MP4/..."
                    )
                payload = bytes(content) if content is not None else b""
                for fno, fv in enumerate(decoder(payload, mod, n_frames)):
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
    shuffle, keyed on media_id. The collected frames are SORTED by
    frame_no before folding — collect_list order is nondeterministic, and
    a fixed fold order is what makes the pooled doubles reproducible (and
    oracle-checkable) run to run.
    """
    feats = extract_features(media, n_frames=n_frames, decode_stub=decode_stub)
    frames = feats.groupBy("media_id", "modality").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("frame_no", "features"))),
            lambda s: s["features"],
        ).alias("__frames")
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
    the aHash recipe plus varied pairwise projections. The first ``dim``
    bits threshold each pooled-embedding component at the embedding's
    mean; each FURTHER band of ``dim`` bits compares component
    ``i mod dim`` against the component ``i // dim`` positions ahead
    (cyclically) — a different projection per band, so a single component
    difference flips ~one bit per band it genuinely participates in,
    instead of the same bit repeated verbatim (which would multiply its
    weight in hamming distance by nbits/dim).

    Pure Column expressions over the pooled embedding (JVM folds); near-
    identical payloads decode to near-identical features, so their phashes
    differ in few bits — feed :func:`dedup.hamming_pairs`.
    """
    emb = media_embeddings(media, n_frames=n_frames, decode_stub=decode_stub)
    dim = F.size("embedding")
    mean = F.aggregate(
        "embedding", F.lit(0.0), lambda a, x: a + x
    ) / dim.cast("double")

    def bit(i):
        base = F.element_at("embedding", (F.lit(i) % dim) + 1)
        off = F.floor(F.lit(i) / dim).cast("int")  # band number
        ref = F.when(off == 0, mean).otherwise(
            F.element_at("embedding", ((F.lit(i) % dim + off) % dim) + 1)
        )
        return F.when(base > ref, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )

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
