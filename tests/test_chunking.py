"""Document chunking: hand-computed windows, coverage/overlap properties,
and the chunk -> embed -> search composition."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from vector_db_api_spark.operators.chunking import chunk_documents


def test_chunking_hand_computed(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "x y"), (3, "   "), (4, None)],
        "doc_id bigint, text string",
    )
    rows = sorted(
        (r["doc_id"], r["position"], r["chunk_text"], r["n_tokens"])
        for r in chunk_documents(docs, chunk_tokens=3, stride=2).collect()
    )
    assert rows == [
        (1, 0, "a b c", 3),
        (1, 1, "c d e", 3),
        (2, 0, "x y", 2),
    ]


def test_chunking_covers_every_token_with_overlap(spark):
    text = " ".join(f"t{i}" for i in range(100))
    docs = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    chunks = chunk_documents(docs, chunk_tokens=16, stride=12).collect()
    seen = set()
    for r in chunks:
        toks = r["chunk_text"].split(" ")
        assert len(toks) == r["n_tokens"]
        seen.update(toks)
        if r["position"] > 0:
            # stride < chunk_tokens: first chunk_tokens-stride tokens of
            # this chunk repeat the previous chunk's tail
            start = r["position"] * 12
            assert toks[0] == f"t{start}"
    assert seen == {f"t{i}" for i in range(100)}
    assert len(chunks) == 8  # ceil((100-16)/12)+1


def test_chunking_rejects_bad_params(spark):
    docs = spark.createDataFrame([(1, "a")], "doc_id bigint, text string")
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=0)
    with pytest.raises(ValueError):
        chunk_documents(docs, stride=0)


def test_chunk_embed_search_composition(spark):
    """The lifecycle the engine exists for: chunk docs, embed chunks,
    search for a chunk's own text and find that chunk first."""
    from vector_db_api_spark.operators.embed import embed_texts, fake_md5_embedder
    from vector_db_api_spark.operators import knn as KNN

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{i}_{j}" for j in range(40))) for i in range(5)],
        "doc_id bigint, text string",
    )
    chunks = chunk_documents(docs, chunk_tokens=16, stride=12).withColumn(
        "chunk_id",
        F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.col("position")),
    )
    embedded = embed_texts(
        chunks, text_col="chunk_text", dim=16, id_col="chunk_id",
        model_fn=fake_md5_embedder(16),
    )
    target = embedded.filter(F.col("chunk_id") == "3:1").collect()[0]
    hits = KNN.knn(
        embedded, [float(x) for x in target["embedding"]], 3, id_col="chunk_id"
    ).collect()
    assert hits[0]["chunk_id"] == "3:1"
    assert hits[0]["score"] == pytest.approx(1.0)


def test_chunking_coverage_property_random(spark):
    """Hypothesis-style sweep over sizes: every token covered, window
    count matches the closed form, overlap equals chunk-stride."""
    import math

    for n_tok, chunk, stride in [(1, 4, 2), (4, 4, 2), (5, 4, 2),
                                 (17, 8, 8), (23, 7, 3), (100, 16, 12)]:
        text = " ".join(f"t{i}" for i in range(n_tok))
        docs = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
        rows = chunk_documents(docs, chunk, stride).collect()
        want_windows = math.ceil(max(n_tok - chunk, 0) / stride) + 1
        assert len(rows) == want_windows, (n_tok, chunk, stride)
        seen = set()
        for r in rows:
            toks = r["chunk_text"].split(" ")
            assert toks == [f"t{i}" for i in
                            range(r["position"] * stride,
                                  min(r["position"] * stride + chunk, n_tok))]
            seen.update(toks)
        assert len(seen) == n_tok
