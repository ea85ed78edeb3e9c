"""Repetition-based quality filtering (Gopher/MassiveText-style rules).

Degenerate web text — keyword stuffing, boilerplate loops, templated spam —
is dominated by a few repeated n-grams. The MassiveText filters quantify
that with two per-document fractions over word n-grams:

  * ``top_ngram_frac``  — occurrences claimed by the single most frequent
    n-gram / total n-gram occurrences (Gopher drops docs > 0.2 for 2-grams).
  * ``dup_ngram_frac``  — occurrences of n-grams appearing more than once /
    total occurrences.

Plan shape: explode n-grams → two stacked aggregations, both hash-keyed by
doc id (the second reuses the first's partitioning, so ONE real shuffle of
the gram table) with map-side partial aggregation. Per-doc cost is linear
in document length; nothing is corpus-global, so the operator scales with
the scan. Docs too short to have an n-gram keep a row with zero fractions
(a one-word doc isn't "repetitive", it's just short — gate length with
quality_score, not here).

No reference counterpart (extension per the builder's brief). N-grams come
from functions.hashing.word_shingles so the DuckDB oracle replays the same
universe bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import hashing as H
from ..functions import text as T


def ngram_repetition_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
) -> DataFrame:
    """One row per doc: (id, n_ngrams, top_ngram_frac, dup_ngram_frac)."""
    grams = docs.select(
        F.col(id_col),
        F.explode(H.word_shingles(T.normalize_text(text_col), n)).alias("gram"),
    ).filter(F.col("gram").isNotNull())  # null text -> [null] array, drop it
    counts = grams.groupBy(id_col, "gram").agg(F.count(F.lit(1)).alias("c"))
    # word_shingles gives docs shorter than n words ONE truncated gram
    # (same universe the dedup operators and the DuckDB oracle use), so
    # every non-null doc has n_ngrams >= 1; the left join below still
    # guards null text.
    stats = counts.groupBy(id_col).agg(
        F.sum("c").alias("n_ngrams"),
        (F.max("c") / F.sum("c")).alias("top_ngram_frac"),
        (
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(F.lit(0)))
            / F.sum("c")
        ).alias("dup_ngram_frac"),
    )
    # keep every doc: null-text docs get 0 grams and 0.0 fractions
    return (
        docs.select(id_col)
        .join(stats, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_ngrams", F.lit(0)).cast("bigint").alias("n_ngrams"),
            F.coalesce("top_ngram_frac", F.lit(0.0)).alias("top_ngram_frac"),
            F.coalesce("dup_ngram_frac", F.lit(0.0)).alias("dup_ngram_frac"),
        )
    )


def repetition_filter(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    max_top_ngram_frac: float = 0.2,
    max_dup_ngram_frac: float = 0.6,
) -> DataFrame:
    """Docs passing the Gopher repetition gates (thresholds per the
    MassiveText 2-gram rule; tune per n)."""
    stats = ngram_repetition_stats(docs, id_col, text_col, n)
    keep = stats.filter(
        (F.col("top_ngram_frac") <= max_top_ngram_frac)
        & (F.col("dup_ngram_frac") <= max_dup_ngram_frac)
    ).select(id_col)
    return docs.join(keep, id_col, "left_semi")
