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
corpus-sized work; the model (vocab-sized) collects to the driver and
ships as literals. At real vocab sizes ship it as a broadcast-join table
instead — the fold becomes a sorted collect_list per doc; same semantics.
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
    toks = F.filter(
        F.split(T.normalize_text(text_col), " "), lambda t: t != F.lit("")
    )
    terms = F.transform(
        toks, lambda t: -F.coalesce(lp_map.getItem(t), F.lit(oov_logprob))
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
