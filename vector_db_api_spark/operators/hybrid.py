"""Hybrid retrieval: reciprocal-rank fusion (RRF) of lexical and vector
search results.

RRF (Cormack et al., SIGIR'09) is the standard scoreless fusion: each
candidate list contributes ``1/(c + rank)`` and lists need no score
calibration against each other — exactly right for fusing BM25 (unbounded
sums) with cosine similarity ([-1, 1]). ``c`` (conventionally 60) damps
the head so one list's #1 can't steamroll consensus picks.

Scale shape: fusion operates on top-``pool`` RESULT lists, which are small
by construction (hundreds of rows), so the global rank window and the
full-outer join here are driver-trivial no matter the corpus size; the
heavy lifting stays inside the underlying searches (single-scan BM25,
index-backed kNN). Fused scores are rational arithmetic only — no
transcendentals — so the DuckDB oracle replays them bit-for-bit.

No reference counterpart (extension per the builder's brief: hybrid
lexical+vector ranking is the default retrieval stack the engine's users
would otherwise leave for).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

RRF_C = 60


def rrf_fuse(
    a: DataFrame,
    b: DataFrame,
    id_col: str = "doc_id",
    k: int = 10,
    c: int = RRF_C,
) -> DataFrame:
    """Fuse two (id, score) result lists: (id, rrf_score, rank_a, rank_b).

    Ranks are 1-based by (score desc, id asc) within each list; an id
    missing from one list contributes 0 from it (the pure-RRF convention).
    Top-k by (rrf_score desc, id asc). Inputs are top-N lists — the
    single-partition rank window is bounded by the pool size, not the
    corpus.
    """
    w = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
    ra = a.select(id_col, F.row_number().over(w).alias("rank_a"))
    rb = b.select(id_col, F.row_number().over(w).alias("rank_b"))
    fused = (
        ra.join(rb, id_col, "full_outer")
        .withColumn(
            "rrf_score",
            F.coalesce(F.lit(1.0) / (F.lit(c) + F.col("rank_a")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.lit(c) + F.col("rank_b")), F.lit(0.0)),
        )
        .select(id_col, "rrf_score", "rank_a", "rank_b")
    )
    return fused.orderBy(F.col("rrf_score").desc(), F.col(id_col).asc()).limit(k)


def hybrid_topk(
    docs: DataFrame,
    embeddings: DataFrame,
    query_text: str,
    query_vec: Sequence[float],
    k: int = 10,
    pool: int = 50,
    c: int = RRF_C,
    id_col: str = "doc_id",
    text_col: str = "text",
    emb_id_col: str = "vec_id",
    vec_col: str = "embedding",
    metric: str = "cosine",
) -> DataFrame:
    """Top-k hybrid results: BM25 top-``pool`` over ``docs`` fused with
    exact-kNN top-``pool`` over ``embeddings`` (ids must share a key
    space; swap the kNN for an index-backed search at serving scale)."""
    from . import keyword as KW
    from . import knn as KNN

    lex = KW.bm25_topk(docs, query_text, pool, id_col, text_col)
    vec = KNN.knn(embeddings, list(query_vec), pool, metric, id_col=emb_id_col)
    return rrf_fuse(
        lex, vec.withColumnRenamed(emb_id_col, id_col), id_col, k, c
    )
