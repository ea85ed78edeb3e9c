"""Line-level deduplication — CCNet-style boilerplate removal.

Wenzek et al. 2019 (CCNet) deduplicate web text at the PARAGRAPH/LINE
level before any model-based filtering: a line whose normalized hash
appears across enough distinct documents is boilerplate (navigation,
cookie banners, footers) and is removed from every document that carries
it. This is a different axis from the repo's other dedup operators:

- ``operators/span_dedup``  removes duplicated word n-gram SPANS
  (keep-first — one copy survives);
- ``operators/dedup``       drops whole near-duplicate DOCUMENTS;
- THIS module removes duplicated LINES: :func:`line_dedup` from every
  document (no survivor — boilerplate is noise, not content; CCNet's
  rule), :func:`line_dedup_keep_first` from every document AFTER the
  first (the streamable sibling — see its docstring).

Semantics (deterministic, partition-invariant):

* Line universe: the RAW text split on newline — the same line universe
  the Gopher rules use (surface features live on raw lines).
* A line's identity is the 60-bit hash of its NORMALIZED form
  (``functions.text.normalize_text`` — lowercase, collapsed whitespace),
  so trim/case variants of one boilerplate line dedup together.
* A line is BOILERPLATE iff its hash occurs in >= ``min_docs`` DISTINCT
  documents. Within-doc repetition alone never flags a line (that is
  ``doc_repetition``'s business), and lines that normalize to the empty
  string are exempt (blank lines are formatting, not boilerplate —
  removing them everywhere would churn every document).
* Every occurrence of a boilerplate line is removed; remaining lines
  keep their original relative order and raw text.

Plan shape (scales like span dedup): one Generate (posexplode of the
line array), ONE corpus-scale shuffle (the per-hash distinct-doc count —
map-side partial aggregation), an equi-join of the line table against
the flagged hashes, and a per-doc regroup of REMOVED positions only
(the affected-doc table, usually a small fraction of the corpus). The
document table itself never shuffles: removal positions ride back as one
array per affected doc and the rebuild is a whole-stage-codegen
``filter``-by-index + ``array_join``.

No reference counterpart (extension per the builder's brief, like the
other curation operators). The DuckDB oracle in suite.py replays the
universe, hash, threshold and rebuild bit-for-bit (integer counts and
string outputs — no float drift possible).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import hashing as H
from ..functions import text as T


def _lines(text_col: str):
    """Raw line array; null text -> empty array (not null)."""
    return F.coalesce(
        F.split(F.col(text_col), "\n"), F.array().cast("array<string>")
    )


def line_occurrences(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, pos, __lh): one row per non-blank line occurrence, keyed by
    the 60-bit hash of the normalized line. Map-side only — no shuffle."""
    base = docs.select(
        F.col(id_col),
        F.posexplode_outer(_lines(text_col)).alias("pos", "__line"),
    ).filter(F.col("__line").isNotNull())
    return base.select(
        id_col,
        "pos",
        H.h60(T.normalize_text("__line")).alias("__lh"),
        T.normalize_text("__line").alias("__norm"),
    ).filter(F.col("__norm") != "").drop("__norm")


def boilerplate_hashes(
    occ: DataFrame,
    min_docs: int = 2,
    id_col: str = "doc_id",
) -> DataFrame:
    """(__lh, n_docs) for hashes seen in >= ``min_docs`` distinct docs —
    one shuffle with map-side partial aggregation."""
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")
    return (
        occ.groupBy("__lh")
        .agg(F.countDistinct(id_col).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )


def line_dedup(
    docs: DataFrame,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Remove cross-document boilerplate lines; returns
    (id, n_lines, n_lines_removed, clean_text) for EVERY input doc
    (clean_text = '' for null/empty text — the span_dedup convention)."""
    occ = line_occurrences(docs, id_col, text_col)
    hot = boilerplate_hashes(occ, min_docs, id_col)
    removed = (
        occ.join(hot.select("__lh"), "__lh")
        .groupBy(id_col)
        .agg(F.collect_set("pos").alias("__rm"))
    )
    lines = _lines(text_col)
    out = docs.join(removed, id_col, "left").select(
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
    # size() of the coalesced empty array is 0, but size(NULL split) via
    # the raw column would be -1 — the coalesce in _lines already guards
    return out


def line_dedup_keep_first(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Keep-first line dedup — the STREAMABLE sibling of :func:`line_dedup`:
    a line occurrence is removed iff some SMALLER-id document carries the
    same normalized line, so the first document to carry a line keeps it
    and every later copy is removed. ``line_dedup`` (CCNet rule, no
    survivor) cannot stream — an ingest pipeline cannot retro-remove the
    first occurrence it already emitted — so the continuous form
    (``streaming/dedup.incremental_line_dedup_ingest``) implements THIS
    rule, and this batch twin is its equivalence oracle under id-ordered
    arrival. Within-doc repetition is still exempt (strictly smaller id),
    as are blank lines. Same output shape as :func:`line_dedup`.

    Plan: one shuffle for the per-hash MIN(doc id) (map-side combining
    min — no distinct-count state), equi-join, per-doc regroup of removed
    positions; the document table never shuffles."""
    occ = line_occurrences(docs, id_col, text_col)
    first = occ.groupBy("__lh").agg(F.min(id_col).alias("__first_id"))
    removed = (
        occ.join(first, "__lh")
        .filter(F.col(id_col) > F.col("__first_id"))
        .groupBy(id_col)
        .agg(F.collect_set("pos").alias("__rm"))
    )
    lines = _lines(text_col)
    return docs.join(removed, id_col, "left").select(
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
