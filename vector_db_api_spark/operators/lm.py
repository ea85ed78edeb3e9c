"""Language-model quality scoring (CCNet-style): train a unigram LM on the
corpus, score each document by negative log-likelihood per token.

The production pattern (CCNet, Gopher, Llama data pipelines) scores docs
with a KenLM n-gram model and drops the high-perplexity tail; the unigram
version keeps the exact same pipeline shape — ONE corpus pass for token
counts, a tiny model artifact, a scan-parallel scoring pass — with the
model simple enough that an external SQL engine replays the score
bit-for-bit (sequential fold over the token array; add-one smoothing with
a single OOV bucket).

Two-scale split, like operators/tokenizer.py: counts aggregate is the only
corpus-sized work. The model then ships one of two ways:

- literal path (``train_unigram`` + ``doc_nll``): the vocab collects to the
  driver and folds as a map literal — bit-exact, zero-shuffle scoring, but
  the expression tree grows with the vocabulary, so it is the ORACLE TWIN,
  viable only at fixture vocab sizes;
- join path (``train_unigram_df`` + ``doc_nll_join``): the model stays a
  DataFrame (token, logprob), scoring posexplodes tokens, joins the model
  (broadcast by default — right up to millions of types; pass
  ``broadcast_model=False`` beyond that and the join shuffles on token),
  and re-folds per doc in positional order. Same semantics, same sequential
  double arithmetic, corpus-linear at any vocabulary size.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as T


def train_unigram(
    docs: DataFrame, text_col: str = "text"
) -> tuple[dict[str, float], float]:
    """({token: logprob}, oov_logprob) with add-one smoothing: p(t) =
    (count+1)/(total+V+1), OOV bucket p = 1/(total+V+1). Deterministic —
    logprobs computed with driver-side math.log from exact integer
    counts."""
    counts = (
        docs.select(F.explode(F.split(T.normalize_text(text_col), " ")).alias("t"))
        .filter(F.col("t") != "")
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    total = sum(r["c"] for r in counts)
    v = len(counts)
    denom = total + v + 1
    model = {r["t"]: math.log((r["c"] + 1) / denom) for r in counts}
    return model, math.log(1 / denom)


def train_unigram_df(
    docs: DataFrame, text_col: str = "text"
) -> tuple[DataFrame, float]:
    """Distributed twin of ``train_unigram``: the model stays a DataFrame
    (token string, logprob double) — nothing vocab-sized ever reaches the
    driver (only the two scalars total/V collect). The division uses the
    same (count+1)/denom add-one smoothing (IEEE division is correctly
    rounded everywhere); the LOG runs as an Arrow pandas_udf calling
    ``math.log`` per element — i.e. the platform libm, the exact library
    behind the literal trainer's driver-side logs and DuckDB's ``ln``.
    NOT ``F.log`` (java.lang.Math.log is only guaranteed within 1 ulp and
    its intrinsic varies by arch/JIT — keyword.py folds idf to driver
    literals for the same reason) and NOT ``numpy.log`` (numpy ships its
    own SIMD log that measurably disagrees with libm on this container:
    62/286 probe values off by an ulp). The per-element Python loop runs
    over VOCAB-sized batches once per training, not over the corpus."""
    from ..functions.libm import libm_log_udf

    _libm_log = libm_log_udf()

    counts = (
        docs.select(F.explode(F.split(T.normalize_text(text_col), " ")).alias("t"))
        .filter(F.col("t") != "")
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("c"))
        # vocab-sized, but its lineage is the full corpus tokenization —
        # without materialization the scalar collect below AND every
        # downstream read of model_df each re-tokenize the corpus (the
        # dsir_log_ratios discipline; one corpus scan saved per training,
        # r16)
        .localCheckpoint(eager=True)
    )
    stats = counts.agg(
        F.sum("c").alias("total"), F.count(F.lit(1)).alias("v")
    ).collect()[0]
    denom = int(stats["total"] or 0) + int(stats["v"]) + 1
    model_df = counts.select(
        F.col("t").alias("token"),
        _libm_log((F.col("c") + F.lit(1)) / F.lit(float(denom))).alias("logprob"),
    )
    return model_df, math.log(1 / denom)


def doc_nll_join(
    docs: DataFrame,
    model_df: DataFrame,
    oov_logprob: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_model: bool = True,
) -> DataFrame:
    """Scale twin of ``doc_nll``: same (id, n_tokens, nll, nll_per_token)
    output, model shipped as a join instead of a map literal.

    posexplode_outer keeps empty/null-text docs (they score 0 with 0
    tokens); each token left-joins the model (miss → OOV bucket); the
    per-doc fold re-sorts terms by position before summing, so the double
    accumulation order is IDENTICAL to the literal path's sequential fold —
    join-path == literal-path bit-for-bit, not just approximately.

    Cost shape: one explode (|tokens| rows), one model join (broadcast
    by default; set ``broadcast_model=False`` for vocabularies too big to
    broadcast and it becomes a shuffle join on token), one groupBy(id)
    shuffle. Corpus-linear; no driver-sized anything."""
    model = F.broadcast(model_df) if broadcast_model else model_df
    toks = T.scoring_tokens(text_col)
    exploded = docs.select(
        F.col(id_col), F.posexplode_outer(toks).alias("__pos", "__tok")
    )
    joined = exploded.join(
        model, exploded["__tok"] == model["token"], "left"
    ).select(
        id_col,
        "__pos",
        F.when(
            F.col("__tok").isNotNull(),
            -F.coalesce(F.col("logprob"), F.lit(oov_logprob)),
        ).alias("__term"),
    )
    per_doc = joined.groupBy(id_col).agg(
        F.count("__term").alias("n_tokens"),
        F.aggregate(
            F.transform(
                F.array_sort(
                    F.filter(
                        F.collect_list(F.struct("__pos", "__term")),
                        lambda s: s["__term"].isNotNull(),
                    )
                ),
                lambda s: s["__term"],
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("nll"),
    )
    return per_doc.select(
        F.col(id_col),
        F.col("n_tokens").cast("int").alias("n_tokens"),
        F.col("nll"),
        F.when(
            F.col("n_tokens") > 0, F.col("nll") / F.col("n_tokens")
        ).otherwise(F.lit(0.0)).alias("nll_per_token"),
    )


def doc_nll(
    docs: DataFrame,
    model: dict[str, float],
    oov_logprob: float,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_tokens, nll, nll_per_token): sequential positional fold of
    -logprob over each doc's tokens — the scoring scan is pure expressions
    (map literal + aggregate fold), no shuffle, no UDF. Empty docs score
    nll 0 with n_tokens 0 (filter them with a length gate, not here)."""
    kv = [x for t, lp in sorted(model.items()) for x in (F.lit(t), F.lit(lp))]
    lp_map = F.create_map(*kv) if kv else F.create_map()
    toks = T.scoring_tokens(text_col)
    terms = F.transform(
        toks, lambda t: -F.coalesce(lp_map[t], F.lit(oov_logprob))
    )
    nll = F.aggregate(terms, F.lit(0.0), lambda acc, x: acc + x)
    out = docs.select(
        F.col(id_col),
        F.coalesce(F.size(toks), F.lit(0)).alias("n_tokens"),  # null text -> 0
        F.coalesce(nll, F.lit(0.0)).alias("nll"),
    )
    return out.withColumn(
        "nll_per_token",
        F.when(F.col("n_tokens") > 0, F.col("nll") / F.col("n_tokens")).otherwise(
            F.lit(0.0)
        ),
    )


def lm_quality_filter(
    docs: DataFrame,
    max_nll_per_token: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    model: dict[str, float] | None = None,
    oov_logprob: float | None = None,
) -> DataFrame:
    """Docs whose per-token NLL clears the bar (train on the corpus itself
    when no model is given — self-perplexity, the CCNet bootstrap)."""
    if model is None:
        model, oov_logprob = train_unigram(docs, text_col)
    scored = doc_nll(docs, model, oov_logprob, id_col, text_col)
    keep = scored.filter(
        (F.col("n_tokens") > 0) & (F.col("nll_per_token") <= max_nll_per_token)
    ).select(id_col)
    return docs.join(keep, id_col, "left_semi")


def perplexity_buckets(
    docs: DataFrame,
    model: dict[str, float],
    oov_logprob: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 3,
) -> DataFrame:
    """CCNet head/middle/tail bucketing: rank every doc by per-token NLL
    (most fluent first) and NTILE into equal-size buckets — the artifact
    CCNet publishes per language and downstream pipelines sample from.

    ORACLE TWIN: the ranking is a GLOBAL NTILE (ties broken by id, so the
    assignment is a pure function of the data), which Spark executes as a
    single-partition window sort — exact, deterministic, replayable in SQL,
    and NOT the 100 TB plan. At scale use :func:`perplexity_buckets_approx`:
    same output schema, thresholds from approxQuantile, corpus-linear.
    Bucket names: 3 buckets get CCNet's head/middle/tail; other counts get
    b1..bN."""
    from pyspark.sql import Window

    scored = doc_nll(docs, model, oov_logprob, id_col, text_col)
    w = Window.orderBy(F.col("nll_per_token").asc(), F.col(id_col).asc())
    tiled = scored.withColumn("__tile", F.ntile(num_buckets).over(w))
    return tiled.select(
        F.col(id_col),
        F.col("n_tokens"),
        F.col("nll_per_token"),
        _bucket_name("__tile", num_buckets).alias("bucket"),
    )


def _bucket_name(tile_col: str, num_buckets: int):
    if num_buckets == 3:
        return (
            F.when(F.col(tile_col) == 1, F.lit("head"))
            .when(F.col(tile_col) == 2, F.lit("middle"))
            .otherwise(F.lit("tail"))
        )
    return F.concat(F.lit("b"), F.col(tile_col).cast("string"))


def perplexity_buckets_approx(
    docs: DataFrame,
    model_df: DataFrame,
    oov_logprob: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 3,
    relative_error: float = 0.001,
) -> DataFrame:
    """Production twin of :func:`perplexity_buckets`: bucket thresholds come
    from ``approxQuantile`` (Greenwald-Khanna sketch, one distributed pass,
    ±relative_error rank accuracy) and assignment is a map-side comparison —
    no global sort anywhere, corpus-linear at any size. Near a threshold the
    assignment can differ from the exact NTILE by the sketch tolerance
    (bucket POPULATIONS are equal only to ±ε·n); that is the documented,
    industry-standard trade (CCNet itself buckets on sampled thresholds).

    The model ships as a DataFrame via the join path (any vocabulary size).
    Returns the same (id, n_tokens, nll_per_token, bucket) schema."""
    scored = doc_nll_join(docs, model_df, oov_logprob, id_col, text_col)
    probs = [i / num_buckets for i in range(1, num_buckets)]
    cuts = scored.approxQuantile("nll_per_token", probs, relative_error)
    expr = F.lit(num_buckets)  # above every cut -> last bucket
    for i in range(num_buckets - 1, 0, -1):
        expr = F.when(
            F.col("nll_per_token") <= F.lit(cuts[i - 1]), F.lit(i)
        ).otherwise(expr)
    tiled = scored.withColumn("__tile", expr)
    return tiled.select(
        F.col(id_col),
        F.col("n_tokens"),
        F.col("nll_per_token"),
        _bucket_name("__tile", num_buckets).alias("bucket"),
    )
