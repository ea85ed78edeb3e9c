"""Gopher/MassiveText document-quality rules (Rae et al. 2021, table A1).

The published rule set every LLM data pipeline quotes: seven cheap
structural gates that remove machine-generated and degenerate web text
before any model-based scoring runs. The n-gram REPETITION rules from the
same table live in operators/repetition.py; this module is the word/line
STRUCTURE half:

  1. word count inside [min_words, max_words]        (50 .. 100 000)
  2. mean word length inside [3, 10]
  3. symbol-to-word ratio <= 0.1 for EACH of '#' and '...' separately
     (Rae et al. table A1 thresholds the hash ratio and the ellipsis
     ratio independently — r12 advice: the first cut of this module
     summed the two counts into one ratio, which was STRICTER than the
     published rule, e.g. 0.06 + 0.06 passes Gopher but failed here)
  4. <= 90% of lines start with a bullet character
  5. <= 30% of lines end with an ellipsis
  6. >= 80% of words contain at least one alphabetic character
  7. >= 2 distinct Gopher stop words present
     (the, be, to, of, and, that, have, with)

Plan shape: every metric is a Column expression over the scan — split,
regexp, filter/exists over the token array. No shuffle, no UDF, no state;
the filter composes with the scan's predicate pushdown and the whole
operator scales exactly like the read. The stats frame keeps one row per
doc so thresholds can be re-tuned without re-scanning.

Word universe: the repo-canonical ``scoring_tokens`` (normalized, empty
tokens dropped) — the same universe the LM/quality oracles replay. Line
universe: the RAW text split on newline (bullets/ellipses are surface
features; normalization would erase them).

No reference counterpart (extension per the builder's brief). The DuckDB
oracle in suite.py replays every expression; ratios are single divisions
of exactly-representable integer counts, so doubles match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import text as T

GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
BULLETS = ("-", "*", "•")  # dash, asterisk, bullet point


def _ratio(num: Column, den: Column) -> Column:
    return F.when(den == 0, F.lit(0.0)).otherwise(
        num.cast("double") / den.cast("double")
    )


def gopher_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One row per doc with the seven rule inputs:
    (id, n_words, mean_word_len, hash_word_ratio, ellipsis_word_ratio,
    bullet_line_frac, ellipsis_line_frac, alpha_word_frac,
    n_stopwords_present)."""
    words = T.scoring_tokens(text_col)
    n_words = F.coalesce(F.size(words), F.lit(0))
    word_chars = F.aggregate(
        words, F.lit(0), lambda acc, w: acc + F.length(w)
    )
    # lines of the RAW text; null text -> no lines
    lines = F.coalesce(
        F.split(F.col(text_col), "\n"), F.array().cast("array<string>")
    )
    n_lines = F.size(lines)
    bullet_lines = F.size(
        F.filter(
            lines,
            lambda ln: F.trim(ln).rlike("^[-*•]"),
        )
    )
    ellipsis_lines = F.size(
        F.filter(lines, lambda ln: F.rtrim(ln).rlike("(\\.\\.\\.|…)$"))
    )
    hash_symbols = T.substring_occurrences(text_col, "#")
    ellipsis_symbols = T.substring_occurrences(text_col, "...")
    alpha_words = F.size(F.filter(words, lambda w: w.rlike("[a-z]")))
    stop_hits: Column = F.lit(0)
    for sw in GOPHER_STOPWORDS:
        stop_hits = stop_hits + F.when(
            F.array_contains(words, sw), F.lit(1)
        ).otherwise(F.lit(0))
    return docs.select(
        F.col(id_col),
        n_words.cast("bigint").alias("n_words"),
        _ratio(word_chars, n_words).alias("mean_word_len"),
        _ratio(hash_symbols, n_words).alias("hash_word_ratio"),
        _ratio(ellipsis_symbols, n_words).alias("ellipsis_word_ratio"),
        _ratio(bullet_lines, n_lines).alias("bullet_line_frac"),
        _ratio(ellipsis_lines, n_lines).alias("ellipsis_line_frac"),
        _ratio(alpha_words, n_words).alias("alpha_word_frac"),
        stop_hits.cast("bigint").alias("n_stopwords_present"),
    )


def gopher_keep(
    stats: DataFrame,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stopwords: int = 2,
) -> Column:
    """The Gopher keep predicate over a :func:`gopher_stats` frame —
    exposed separately so pipelines can flag instead of drop.
    ``max_symbol_word_ratio`` gates the hash ratio AND the ellipsis ratio
    independently (the published rule's shape)."""
    del stats  # signature documents the expected frame; predicate is pure
    return (
        F.col("n_words").between(min_words, max_words)
        & F.col("mean_word_len").between(min_mean_word_len, max_mean_word_len)
        & (F.col("hash_word_ratio") <= max_symbol_word_ratio)
        & (F.col("ellipsis_word_ratio") <= max_symbol_word_ratio)
        & (F.col("bullet_line_frac") <= max_bullet_line_frac)
        & (F.col("ellipsis_line_frac") <= max_ellipsis_line_frac)
        & (F.col("alpha_word_frac") >= min_alpha_word_frac)
        & (F.col("n_stopwords_present") >= min_stopwords)
    )


def gopher_filter(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    **thresholds,
) -> DataFrame:
    """Docs passing all seven Gopher structure rules (published defaults;
    override any threshold by keyword). Left-semi join keeps the original
    doc columns untouched."""
    stats = gopher_stats(docs, id_col, text_col)
    keep = stats.filter(gopher_keep(stats, **thresholds)).select(id_col)
    return docs.join(keep, id_col, "left_semi")
