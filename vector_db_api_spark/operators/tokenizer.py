"""Tokenizer-training operators: corpus vocabulary and BPE merge learning.

Training a tokenizer is the canonical two-scale computation: the corpus is
huge, the vocabulary is tiny. So the Spark side does exactly ONE pass —
word counts (explode → map-side-combined groupBy) — and everything
iterative (BPE's merge loop) runs driver-side over that small frequency
table, which is how production tokenizer trainers work (Sennrich et al.'s
learn_bpe operates on a word-frequency dict, not the raw corpus).

No reference counterpart (extension per the builder's brief: a
training-data engine should be able to TRAIN the tokenizer whose token
counts it already computes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import text as T


def corpus_vocabulary(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 1,
) -> DataFrame:
    """(token, count, rank, cum_coverage): the corpus frequency table.

    One explode + one aggregate (map-side combined) — the only corpus-sized
    work. rank/cum_coverage run on the aggregated vocabulary, which is
    tiny, so the un-partitioned window is driver-trivial at any corpus
    size. cum_coverage is the fraction of ALL token occurrences (including
    those of tokens later dropped by ``min_count``) covered by the
    vocabulary up to this rank — the denominator aggregates BEFORE the
    min_count filter, so the number tokenizer sizing decisions read off is
    true coverage, not coverage-of-the-retained-vocab. Ties rank
    deterministically by (count desc, token asc); coverage is exact integer
    arithmetic over bigint sums until the final division.
    """
    toks = docs.select(
        F.explode(F.split(T.normalize_text(text_col), " ")).alias("token")
    ).filter(F.col("token") != "")
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("count"))
    total_occ = counts.agg(F.sum("count").alias("__total"))
    if min_count > 1:
        counts = counts.filter(F.col("count") >= min_count)
    w = Window.orderBy(F.col("count").desc(), F.col("token").asc())
    return counts.crossJoin(F.broadcast(total_occ)).select(
        "token",
        "count",
        F.row_number().over(w).alias("rank"),
        (
            F.sum("count").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast(
                "double"
            )
            / F.col("__total")
        ).alias("cum_coverage"),
    )


def learn_bpe_merges(
    docs: DataFrame,
    n_merges: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
    end_of_word: str = "</w>",
    max_words: int | None = None,
    allow_unbounded: bool = False,
) -> list[tuple[str, str]]:
    """Learn BPE merges (Sennrich et al. 2016) from the corpus: greedy —
    repeatedly merge the most frequent adjacent symbol pair, weighted by
    word frequency. Ties break by pair lexicographic order, so the merge
    list is deterministic.

    Scale: the corpus contributes ONE word-count aggregate (the same
    shuffle ``corpus_vocabulary`` pays); the merge loop is pure Python
    over the collected frequency table. At web scale the distinct-word
    table is itself 10^7-10^8 rows — set ``max_words`` to collect only the
    top-N words by (count desc, word asc): the dropped tail is the
    frequency floor, which contributes negligibly to pair counts (this is
    how production BPE trainers bound the driver-side dict too).

    The cap is REQUIRED (VERDICT r5 #6): an uncapped call on a web corpus
    collects the whole distinct-word table to the driver. Exact full-table
    training for fixture-scale corpora must opt in explicitly with
    ``allow_unbounded=True`` (the same contract as dedup's
    ``allow_full_cross``).
    """
    if max_words is None and not allow_unbounded:
        raise ValueError(
            "learn_bpe_merges collects the distinct-word frequency table to "
            "the driver; set max_words=<N> to bound it, or pass "
            "allow_unbounded=True if the corpus is known to be small"
        )
    wc_df = (
        docs.select(
            F.explode(F.split(T.normalize_text(text_col), " ")).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    if max_words is not None:
        wc_df = wc_df.orderBy(F.col("c").desc(), F.col("w").asc()).limit(max_words)
    wc = wc_df.collect()
    vocab: dict[tuple[str, ...], int] = {
        tuple(list(r["w"]) + [end_of_word]): r["c"] for r in wc
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for sym, c in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        # deterministic: highest count, ties by lexicographically smallest pair
        pair, cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < 2:
            break
        merges.append(pair)
        merged = pair[0] + pair[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for sym, c in vocab.items():
            out = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == pair[0] and sym[i + 1] == pair[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def apply_bpe(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    end_of_word: str = "</w>",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """(id, bpe_tokens, n_bpe): tokenize with a learned merge list — an
    Arrow-batched kernel (the merge loop is per-word Python; the corpus
    pass is scan-parallel, no shuffle)."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    def encode_word(word: str) -> list[str]:
        sym = list(word) + [end_of_word]
        while len(sym) > 1:
            cand = [
                (ranks[(a, b)], i)
                for i, (a, b) in enumerate(zip(sym, sym[1:]))
                if (a, b) in ranks
            ]
            if not cand:
                break
            _, i = min(cand)
            sym = sym[:i] + [sym[i] + sym[i + 1]] + sym[i + 2 :]
        return sym

    id_type = docs.schema[id_col].dataType.simpleString()
    schema = f"{id_col} {id_type}, {out_col} array<string>, n_bpe int"

    def run(batches):
        import pandas as pd

        cache: dict[str, list[str]] = {}
        for b in batches:
            toks_col, n_col = [], []
            for t in b[text_col]:
                if t is None:
                    toks_col.append([])
                    n_col.append(0)
                    continue
                words = " ".join(t.lower().split()).split(" ")
                out: list[str] = []
                for wd in words:
                    if wd not in cache:
                        cache[wd] = encode_word(wd)
                    out.extend(cache[wd])
                toks_col.append(out)
                n_col.append(len(out))
            yield pd.DataFrame(
                {id_col: b[id_col], out_col: toks_col, "n_bpe": n_col}
            )

    return docs.select(id_col, text_col).mapInPandas(run, schema)
