"""Document chunking: split documents into (overlapping) token-window
chunks — the operator that PRODUCES the reference's central fact table.

The reference stores chunks as given (text + position,
src/vector_db_api/models/entities.py:12-25) and leaves chunking to the
caller; a pipeline at scale needs the splitter itself as an engine
operator: documents → fixed-size token windows with stride overlap →
chunk rows keyed (doc_id, position), ready for embed_texts → index build
→ search.

Plan shape: tokenize (split), window via ``sequence`` over start offsets,
``slice`` + ``array_join`` per window, ``explode`` — all JVM expressions
fused onto the scan, no shuffle, no UDF. Output grows rows by
ceil(dl/stride): linear in corpus tokens, embarrassingly parallel,
which is what a 100 TB chunking pass must be.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as T


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 64,
    stride: int = 48,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, position, chunk_text, n_tokens): token windows of
    ``chunk_tokens`` words starting every ``stride`` words (stride <
    chunk_tokens ⇒ overlap, the RAG default). The last window keeps the
    tail (may be shorter); empty/whitespace docs produce no chunks;
    ``position`` is the 0-based window index (the reference's chunk
    ``position`` field).
    """
    if chunk_tokens <= 0 or stride <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    # materialize the token array + length ONCE per row (winnow_table's
    # trick) so the window lambdas read attributes instead of re-running
    # the normalize/split pipeline per window
    step1 = docs.select(
        F.col(id_col),
        F.split(T.normalize_text(text_col), " ").alias("__t"),
        T.token_count(text_col).alias("__dl"),
    )
    toks, dl = F.col("__t"), F.col("__dl")
    # window starts: 0, stride, 2*stride, ...; at least one window for any
    # non-empty doc, none for empty docs
    n_windows = F.when(
        dl > 0,
        F.ceil(F.greatest(dl - F.lit(chunk_tokens), F.lit(0)) / F.lit(stride)) + 1,
    ).otherwise(F.lit(0))
    starts = F.sequence(F.lit(0), (n_windows - 1) * stride, F.lit(stride))
    chunks = F.when(
        dl > 0,
        F.transform(
            starts,
            lambda s: F.struct(
                (s / stride).cast("int").alias("position"),
                F.array_join(F.slice(toks, s + 1, chunk_tokens), " ").alias(
                    "chunk_text"
                ),
                F.least(dl - s, F.lit(chunk_tokens)).cast("int").alias("n_tokens"),
            ),
        ),
    ).otherwise(F.array())
    return step1.select(F.col(id_col), F.explode(chunks).alias("__c")).select(
        id_col,
        F.col("__c.position").alias("position"),
        F.col("__c.chunk_text").alias("chunk_text"),
        F.col("__c.n_tokens").alias("n_tokens"),
    )
