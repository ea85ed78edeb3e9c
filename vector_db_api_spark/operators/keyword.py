"""BM25 keyword search over the documents table.

The lexical complement to the engine's vector search: rank docs for a bag
of query terms with Okapi BM25 (Lucene's idf variant,
``ln(1 + (N - df + 0.5)/(df + 0.5))``, so scores stay positive).

Spark-first shape: a user query has a FIXED handful of terms, so nothing
needs an inverted index to be a good plan — per-term tf becomes one
``word_occurrences`` Column expression per term (whole corpus scored in a
single scan, all JVM expressions, whole-stage codegen), the corpus stats
(N, total_dl, per-term df) collapse to one collected row whose idf folds
into driver-side literals, and the score is a fixed-order sum so DuckDB
replays it bit-for-bit as the correctness oracle. Top-k is TakeOrdered —
no shuffle anywhere except the single-row stats agg.

For high-QPS serving over a static corpus, ``build_postings`` materializes
the classic (term, doc_id, tf) table; ``bm25_topk_postings`` then prunes
the scan to the query's terms (predicate pushdown on the partitioned/
sorted term column) instead of rescoring every doc — the right trade once
queries outnumber corpus rewrites. Both paths are pinned equal in tests.

No reference counterpart (extension per the builder's brief: the engine's
search surface should cover what a training-data/RAG pipeline needs, and
lexical retrieval is half of hybrid search).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import text as T

K1 = 1.2
B = 0.75


def _terms(query: str) -> list[str]:
    """Normalized, order-preserving distinct query terms."""
    seen: dict[str, None] = {}
    for t in query.strip().lower().split():
        if t and t not in seen:
            seen[t] = None
    return list(seen)


def bm25_scores(
    docs: DataFrame,
    query: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """(id, score): BM25 of every doc containing at least one query term.

    One corpus scan computes per-term tfs + doc length as expressions; the
    stats row (N, avgdl, df per term) broadcasts back; the score is the
    fixed-order per-term sum. Deterministic to the bit for a given corpus.
    """
    terms = _terms(query)
    if not terms:
        raise ValueError("query has no terms after normalization")

    tf_cols = [
        T.word_occurrences(text_col, t).alias(f"__tf{i}") for i, t in enumerate(terms)
    ]
    scored = docs.select(F.col(id_col), T.token_count(text_col).alias("__dl"), *tf_cols)

    # Corpus stats collapse to ONE tiny row (n, total_dl, df per term) —
    # collect it and fold the per-term idf into driver-side literals.
    # Two reasons: (a) the scoring scan then carries no transcendental —
    # the JVM's ln intrinsic disagrees with libm by 1 ulp, which would
    # break bit-exact oracle replay; (b) n and total_dl stay exact bigints,
    # so dl/avgdl becomes dl*n/total_dl, one correctly-rounded division
    # (an AVG() differs from the oracle's by 1 ulp and smears through
    # half the scores). The stats job is a map-side-combined aggregate —
    # the same single extra pass the crossJoin-a-stats-row plan costs.
    stats = scored.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__dl").alias("tdl"),
        *[
            F.sum((F.col(f"__tf{i}") > 0).cast("long")).alias(f"df{i}")
            for i in range(len(terms))
        ],
    ).collect()[0]
    n, tdl = stats["n"], stats["tdl"]

    score: Column = F.lit(0.0)
    for i in range(len(terms)):
        df = stats[f"df{i}"]
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        tf = F.col(f"__tf{i}").cast("double")
        denom = tf + F.lit(k1) * (
            F.lit(1.0)
            - F.lit(b)
            + F.lit(b) * F.col("__dl") * F.lit(n) / F.lit(tdl)
        )
        score = score + F.lit(idf) * (tf * F.lit(k1 + 1.0)) / denom
    return (
        scored.withColumn("score", score)
        .filter(sum((F.col(f"__tf{i}") for i in range(len(terms))), F.lit(0)) > 0)
        .select(id_col, "score")
    )


def bm25_topk(
    docs: DataFrame,
    query: str,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """Top-k by (score desc, id asc) — the id tiebreak keeps results
    deterministic under equal scores (duplicate docs score identically)."""
    return (
        bm25_scores(docs, query, id_col, text_col, k1, b)
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


# -- postings-table path (static corpus, many queries) -----------------------


def build_postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """(postings, doclens): the classic inverted structure as tables.

    postings(term, id, tf) — one shuffle to aggregate; write partitioned/
    bucketed by term so per-query reads prune to the query's terms.
    doclens(id, dl) — scan-side lengths for the BM25 denominator.
    """
    toks = docs.select(
        F.col(id_col),
        F.explode(F.split(T.normalize_text(text_col), " ")).alias("term"),
    ).filter(F.col("term") != "")
    postings = toks.groupBy("term", id_col).agg(F.count(F.lit(1)).alias("tf"))
    doclens = docs.select(F.col(id_col), T.token_count(text_col).alias("dl"))
    return postings, doclens


def bm25_scores_postings(
    postings: DataFrame,
    doclens: DataFrame,
    query: str,
    id_col: str = "doc_id",
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """Bit-exact twin of :func:`bm25_scores`, served from the inverted
    structure: per-term tfs pivot out of the pruned postings as columns,
    the stats (n, tdl from doclens; df = pruned posting count per term)
    fold into the SAME fixed-order score expression — so a postings table
    built any way (batch, or epoch-appended by the streaming ingest)
    answers with the exact doubles the expression path produces, and the
    one DuckDB oracle checks both.

    (``bm25_topk_postings`` remains the low-latency serving shape — avgdl
    division, per-term contributions summed by groupBy — equal to ~1e-9;
    this function is the replay-exact shape.)
    """
    terms = _terms(query)
    if not terms:
        raise ValueError("query has no terms after normalization")
    stats = doclens.agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").alias("tdl")
    ).collect()[0]
    n, tdl = stats["n"], stats["tdl"]
    pruned = postings.filter(F.col("term").isin(terms))
    dfs = {
        r["term"]: r["df"]
        for r in pruned.groupBy("term").agg(F.count(F.lit(1)).alias("df")).collect()
    }
    tf_cols = pruned.groupBy(id_col).agg(
        *[
            F.sum(F.when(F.col("term") == t, F.col("tf")).otherwise(0)).alias(
                f"__tf{i}"
            )
            for i, t in enumerate(terms)
        ]
    )
    with_dl = tf_cols.join(doclens, id_col)
    score: Column = F.lit(0.0)
    for i, t in enumerate(terms):
        df = dfs.get(t, 0)
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        tf = F.col(f"__tf{i}").cast("double")
        denom = tf + F.lit(k1) * (
            F.lit(1.0)
            - F.lit(b)
            + F.lit(b) * F.col("dl") * F.lit(n) / F.lit(tdl)
        )
        score = score + F.lit(idf) * (tf * F.lit(k1 + 1.0)) / denom
    return with_dl.withColumn("score", score).select(id_col, "score")


def bm25_topk_postings(
    postings: DataFrame,
    doclens: DataFrame,
    query: str,
    k: int = 10,
    id_col: str = "doc_id",
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """Top-k from a prebuilt postings table: scan ONLY the query's terms.

    Per-term idf comes from a driver-side count over the pruned postings
    (m tiny aggregates for m query terms — each a partition-pruned read
    when postings is partitioned by term); scoring touches just the
    matching docs, then one groupBy(id) sums the per-term contributions.
    """
    terms = _terms(query)
    if not terms:
        raise ValueError("query has no terms after normalization")
    n = doclens.count()
    avgdl = doclens.agg(F.avg("dl")).collect()[0][0]

    pruned = postings.filter(F.col("term").isin(terms))
    dfs = {
        r["term"]: r["df"]
        for r in pruned.groupBy("term").agg(F.count(F.lit(1)).alias("df")).collect()
    }
    idf = F.create_map(
        *[
            x
            for t in terms
            for x in (
                F.lit(t),
                F.lit(math.log(1.0 + (n - dfs.get(t, 0) + 0.5) / (dfs.get(t, 0) + 0.5))),
            )
        ]
    )
    contrib = pruned.join(doclens, id_col).select(
        F.col(id_col),
        (
            idf[F.col("term")]
            * (F.col("tf").cast("double") * F.lit(k1 + 1.0))
            / (
                F.col("tf").cast("double")
                + F.lit(k1)
                * (F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.lit(float(avgdl)))
            )
        ).alias("c"),
    )
    return (
        contrib.groupBy(id_col)
        .agg(F.sum("c").alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )
