"""Arrow-batched numpy kernels for the two heaviest text fingerprints.

``winnow_table`` and ``simhash`` are deliberately implemented as pure Column
expressions (functions/text.py, operators/dedup.py) so an external SQL
engine can replay them bit-for-bit — that is what the correctness gate
checks. But expression-form md5 arithmetic has a constant factor Spark can't
codegen away: winnowing evaluates O(S·window) array comparisons per row and
simhash 60 conditional sums per token row. These kernels compute the SAME
bytes (md5 via hashlib, identical normalize/shingle/vote semantics —
equality is pinned per row in tests/test_kernels.py) inside one
``mapInPandas`` pass: Arrow hands each worker a columnar batch, hashlib +
numpy do the hashing/bit math at C speed, and a per-batch memo dedups md5
calls across repeated tokens (natural text repeats most tokens, the
expression path re-hashes every occurrence).

Scale shape: both kernels are scan-parallel (no shuffle — simhash_np even
DELETES the expression path's explode→groupBy shuffle, since the whole
vote loop happens inside the row's batch), stay in whole-stage pipelines on
either side of the Python stage, and bound worker memory by the Arrow batch
size. Use the expression twins when the consumer is an external SQL engine;
use these when the consumer is throughput.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame


def _normalize(text: str) -> str:
    """Bit-exact twin of text.normalize_text: lower → trim spaces → collapse
    runs of 0x20. (Spark's trim/regexp ' +' touch ASCII spaces only, so no
    ``str.split()``-style whitespace generalization here.)"""
    out = []
    prev_space = False
    for ch in text.lower().strip(" "):
        if ch == " ":
            if not prev_space:
                out.append(ch)
            prev_space = True
        else:
            out.append(ch)
            prev_space = False
    return "".join(out)


def _shingles(tokens: list[str], k: int) -> list[str]:
    """k-word shingles, twin of hashing.word_shingles: start positions
    0..max(n-k, 0); a short doc yields its full token string once."""
    n = len(tokens)
    return [" ".join(tokens[i : i + k]) for i in range(max(n - k, 0) + 1)]


def winnow_row(text: str, k: int = 3, window: int = 4) -> list[int]:
    """Winnowing fingerprints of one document — the kernel's scalar core,
    exposed for tests and driver-side spot checks."""
    toks = _normalize(text).split(" ")
    memo: dict[str, int] = {}
    hashes = np.empty(max(len(toks) - k, 0) + 1, dtype=np.int64)
    for i, s in enumerate(_shingles(toks, k)):
        h = memo.get(s)
        if h is None:
            h = int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16)
            memo[s] = h
        hashes[i] = h
    n = len(hashes)
    if n <= window:
        mins = hashes.min(keepdims=True)
    else:
        # vectorized sliding-window minima over the n-window+1 positions
        view = np.lib.stride_tricks.sliding_window_view(hashes, window)
        mins = view.min(axis=1)
    return np.unique(mins).tolist()  # sorted distinct


def winnow_table_np(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    k: int = 3,
    window: int = 4,
    out_col: str = "winnow_fps",
) -> DataFrame:
    """Throughput twin of text.winnow_table (same output, numpy kernel)."""
    from vector_db_api_spark.operators.dedup import _parallelize

    id_type = df.schema[id_col].dataType.simpleString()
    schema = f"{id_col} {id_type}, {out_col} array<bigint>"
    df = _parallelize(df)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            # null text → [null]: the expression twin's null propagates
            # through shingle→hash→min into a one-element null array, and
            # the kernel pins that exact shape
            fps = [
                [None] if t is None else winnow_row(t, k, window)
                for t in pdf[text_col]
            ]
            yield pd.DataFrame({id_col: pdf[id_col], out_col: fps})

    return df.select(id_col, text_col).mapInPandas(run, schema=schema)


_H60_DIV = np.uint64(1)


def simhash_row(
    text: str, nbits: int = 60, memo: dict[str, int] | None = None
) -> int:
    """Simhash of one document — twin of dedup.simhash's vote semantics:
    per-token h60, per-bit sum of ±1 over ALL token occurrences (duplicates
    vote again), bit set iff the vote is strictly positive."""
    if memo is None:
        memo = {}
    counts: dict[str, int] = {}
    for tok in _normalize(text).split(" "):
        counts[tok] = counts.get(tok, 0) + 1
    hs = np.empty(len(counts), dtype=np.uint64)
    ws = np.empty(len(counts), dtype=np.int64)
    for j, (tok, c) in enumerate(counts.items()):
        h = memo.get(tok)
        if h is None:
            h = int(hashlib.md5(tok.encode("utf-8")).hexdigest()[:15], 16)
            memo[tok] = h
        hs[j] = h
        ws[j] = c
    bits = (hs[:, None] >> np.arange(nbits, dtype=np.uint64)) & _H60_DIV
    votes = ((2 * bits.astype(np.int64) - 1) * ws[:, None]).sum(axis=0)
    packed = np.where(votes > 0, np.uint64(1) << np.arange(nbits, dtype=np.uint64), np.uint64(0)).sum(dtype=np.uint64)
    return int(packed)


def simhash_np(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    nbits: int = 60,
) -> DataFrame:
    """Throughput twin of dedup.simhash. Beyond the md5 memoization, this
    variant is shuffle-FREE: the expression path explodes tokens and
    aggregates votes through a groupBy (one shuffle keyed on the doc id);
    here every token of a row is already in the row, so the whole vote
    happens map-side and the output partitioning equals the scan's. Null
    texts drop out (parity with explode-of-null producing no rows)."""
    from vector_db_api_spark.operators.dedup import _parallelize

    id_type = docs.schema[id_col].dataType.simpleString()
    schema = f"{id_col} {id_type}, simhash bigint"
    docs = _parallelize(docs)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, int] = {}
        for pdf in batches:
            if pdf.empty:
                continue
            keep = pdf[text_col].notna()
            sub = pdf[keep]
            vals = [simhash_row(t, nbits, memo) for t in sub[text_col]]
            yield pd.DataFrame({id_col: sub[id_col], "simhash": vals})

    return docs.select(id_col, text_col).mapInPandas(run, schema=schema)


def repetition_row(text: str | None, n: int = 2) -> tuple[int, float, float]:
    """Twin of operators.repetition.ngram_repetition_stats for one doc:
    (n_ngrams, top_ngram_frac, dup_ngram_frac). Null text -> zeros."""
    if text is None:
        return 0, 0.0, 0.0
    from collections import Counter

    grams = _shingles(_normalize(text).split(" "), n)
    counts = Counter(grams)
    total = len(grams)
    if total == 0:
        return 0, 0.0, 0.0
    top = max(counts.values())
    dup = sum(c for c in counts.values() if c > 1)
    return total, top / total, dup / total


def repetition_stats_np(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
) -> DataFrame:
    """Throughput twin of repetition.ngram_repetition_stats — and a plan
    UPGRADE, not just a constant-factor win: the expression path explodes
    n-grams and aggregates twice (one wide shuffle of every gram string);
    here each doc's whole count map lives inside its Arrow batch, so the
    stats come off the scan with ZERO shuffle. Row equality vs the
    expression path is pinned in tests/test_kernels.py."""
    out_schema = (
        f"{df.schema[id_col].dataType.simpleString()}"
    )
    schema = (
        f"{id_col} {out_schema}, n_ngrams bigint, "
        "top_ngram_frac double, dup_ngram_frac double"
    )

    def run(batches):
        import pandas as pd

        for b in batches:
            stats = [repetition_row(t, n) for t in b[text_col]]
            yield pd.DataFrame(
                {
                    id_col: b[id_col],
                    "n_ngrams": [s[0] for s in stats],
                    "top_ngram_frac": [s[1] for s in stats],
                    "dup_ngram_frac": [s[2] for s in stats],
                }
            )

    return df.select(id_col, text_col).mapInPandas(run, schema)
