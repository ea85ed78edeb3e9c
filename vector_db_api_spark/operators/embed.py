"""Batch embedding generation — the engine's hook for turning text into
vectors inside a Spark job.

The reference generates embeddings through an opt-in external API client
(tests/integration/test_cohere_embeddings.py; embeddings arrive via the DTO
layer otherwise). The Spark-native shape of that integration is a
``mapInPandas`` stage: Arrow hands each worker a batch of texts, a pluggable
``model_fn`` embeds the whole batch at once (exactly how a local
sentence-transformer or a batched HTTP client wants to be called), and the
vectors land as a column — embed → index → search without leaving the plan.

No embedding model ships in this container, so the default ``model_fn`` is
:func:`fake_md5_embedder`: a deterministic, dependency-free stand-in whose
components are md5-derived uniforms. It is NOT a semantic embedding — it is
the plumbing proof (schema, batching, determinism), chosen so an external
SQL engine can recompute it bit-for-bit and the driver's DuckDB oracle can
check the whole embed→search path end to end (suite ``embed_knn_top10``).
A real model drops in as ``model_fn=lambda texts: model.encode(texts)``.

Scale notes: embedding is embarrassingly parallel (no shuffle — the stage
fuses with the scan); Arrow batch size bounds worker memory; a GPU worker
would raise ``spark.sql.execution.arrow.maxRecordsPerBatch`` to feed the
device. Partition count, not driver fan-out, sets the concurrency.
"""

from __future__ import annotations

import hashlib
import re
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

_TOKEN_RE = re.compile(r"[a-z0-9]+")


def fake_md5_embedder(dim: int = 64) -> Callable[[list[str]], np.ndarray]:
    """Deterministic stand-in model: component j of text t is
    ``(int(md5(f"{t}|{j}")[:8], 16) % 1_000_000) / 1_000_000 * 2 - 1``.

    Every operation is exact in float64 and expressible in ANSI SQL
    (md5 → hex-prefix → int → modulo → affine), so DuckDB reproduces the
    vectors bit-for-bit — the property that lets the driver oracle-check
    an embed→search pipeline. Components are unnormalized; downstream
    cosine kernels normalize identically on both engines.
    """

    def embed(texts: list[str]) -> np.ndarray:
        out = np.empty((len(texts), dim), dtype=np.float64)
        for i, t in enumerate(texts):
            for j in range(dim):
                h = int(hashlib.md5(f"{t}|{j}".encode()).hexdigest()[:8], 16)
                out[i, j] = (h % 1_000_000) / 1_000_000.0 * 2.0 - 1.0
        return out

    return embed


def hashed_ngram_embedder(
    dim: int = 64,
    char_ngrams: tuple[int, ...] = (3, 4, 5),
    max_words: int | None = None,
) -> Callable[[list[str]], np.ndarray]:
    """Local deterministic text→vector model: a hashed bag-of-features
    random projection (the fastText hashing trick without training).

    Unlike :func:`fake_md5_embedder` (which embeds the WHOLE string, so two
    texts sharing every word but one are orthogonal), this is a real — if
    purely lexical/subword — embedding: texts sharing vocabulary get high
    cosine, morphological variants overlap through their character n-grams
    (``learning``/``learn`` share ``lea/ear/arn…``). It closes the
    reference's external-embedding test family
    (tests/integration/test_cohere_embeddings.py:47-373, incl. the
    semantic-ranking assertion at :233) with a no-network model the sandbox
    can run end-to-end: embed → index → search → ranking sanity.

    Recipe (every step exact in float64 and, with ``char_ngrams=()``,
    replayable in ANSI SQL so the driver's DuckDB oracle can hash-check the
    pipeline):

    - tokens: lowercase ``[a-z0-9]+`` runs, first ``max_words`` kept;
    - features, in order of appearance (duplicates kept → tf weighting):
      ``w|{word}`` per token, then ``g|{gram}`` for each character n-gram
      of that token, n in ``char_ngrams``, positions left to right;
    - component j of feature f: the :func:`fake_md5_embedder` uniform,
      ``(int(md5(f"{f}|{j}")[:8], 16) % 1_000_000) / 1_000_000 * 2 - 1``;
    - text vector: SEQUENTIAL left-fold sum over the feature sequence
      (matches the oracle's ``list_reduce`` fold bit-for-bit — numpy
      pairwise summation would not). Unnormalized; cosine normalizes
      identically downstream. No tokens → the zero vector (search paths
      already define zero-vector behavior).
    """

    def embed(texts: list[str]) -> np.ndarray:
        cache: dict[str, np.ndarray] = {}

        def feat_vec(f: str) -> np.ndarray:
            v = cache.get(f)
            if v is None:
                v = np.empty(dim, dtype=np.float64)
                for j in range(dim):
                    h = int(
                        hashlib.md5(f"{f}|{j}".encode()).hexdigest()[:8], 16
                    )
                    v[j] = (h % 1_000_000) / 1_000_000.0 * 2.0 - 1.0
                cache[f] = v
            return v

        out = np.zeros((len(texts), dim), dtype=np.float64)
        for i, t in enumerate(texts):
            words = _TOKEN_RE.findall(t.lower())
            if max_words is not None:
                words = words[:max_words]
            for w in words:
                out[i] += feat_vec("w|" + w)
                for n in char_ngrams:
                    for p in range(len(w) - n + 1):
                        out[i] += feat_vec("g|" + w[p:p + n])
        return out

    return embed


def embed_texts(
    docs: DataFrame,
    model_fn: Callable[[list[str]], np.ndarray] | None = None,
    dim: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "embedding",
) -> DataFrame:
    """(id, embedding array<double>) — batch-embed ``text_col`` via
    ``model_fn`` (defaults to the deterministic fake). Null texts embed as
    null. ``model_fn`` receives the batch's texts as ``list[str]`` and must
    return a ``(len(texts), dim)`` array."""
    fn = model_fn or fake_md5_embedder(dim)
    id_type = docs.schema[id_col].dataType.simpleString()
    out_schema = f"{id_col} {id_type}, {out_col} array<double>"

    def embed_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            mask = pdf[text_col].notna()
            vecs: list[list[float] | None] = [None] * len(pdf)
            texts = pdf.loc[mask, text_col].tolist()
            if texts:
                mat = np.asarray(fn(texts), dtype=np.float64)
                if mat.shape != (len(texts), dim):
                    raise ValueError(
                        f"model_fn returned shape {mat.shape}, "
                        f"expected ({len(texts)}, {dim})"
                    )
                it = iter(mat)
                for pos, ok in enumerate(mask.to_numpy()):
                    if ok:
                        vecs[pos] = next(it).tolist()
            yield pd.DataFrame({id_col: pdf[id_col], out_col: vecs})

    return docs.select(id_col, text_col).mapInPandas(embed_batches, schema=out_schema)
