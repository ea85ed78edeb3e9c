"""Cross-document duplicated-span removal (exact substring dedup).

Web-scale corpora repeat long verbatim substrings ACROSS documents —
boilerplate, licenses, syndicated articles — that whole-document dedup
(operators/dedup.py) never sees (the documents differ) and repetition
stats (operators/repetition.py) only measure within one doc. Lee et al.
2022 ("Deduplicating Training Data Makes Language Models Better") remove
every duplicated substring above a length threshold, keeping one copy
corpus-wide; this module is that operator re-expressed for Spark.

Semantics (deterministic, total-order keep-first):

  * Token universe: ``normalize_text`` + split-on-space, KEEPING empty
    tokens — split of an empty string is [''], so an empty/whitespace doc
    reports ``n_tokens=1`` (r12 advice: this deviates from the
    repo-canonical ``scoring_tokens``, which drops empties; kept as-is
    because token POSITIONS must index into the removal array exactly as
    split produces them, the oracle and the independent python reference
    both pin this universe, and an empty doc can never form an n>=2 gram
    anyway — the quirk is visible only in the n_tokens stat).
  * A *duplicated occurrence* is any word n-gram occurrence that is NOT
    the globally first occurrence of that n-gram, "first" meaning the
    lexicographically smallest ``(doc_id, start_pos)`` — so exactly one
    copy of every duplicated n-gram survives, and the survivor is the
    same no matter how the data is partitioned.
  * Duplicated occurrences cover token interval ``[start, start+n-1]``;
    overlapping or ADJACENT intervals within a doc merge into maximal
    removal spans (adjacent merge: a reader sees one contiguous hole).
  * Output keeps every input doc: original token count, tokens removed,
    span count, and the cleaned text (covered tokens dropped, survivors
    rejoined in original order).

Plan shape / 100 TB honesty:

  * Gram explosion is map-side (|tokens| rows, no shuffle), and happens
    ONCE (plan-pinned — the rejected groupBy+join formulation recomputed
    the scan+explode on the join's probe side).
  * ONE corpus-scale shuffle: a keep-first window over the gram hash —
    the same key class as minhash banding. Hot-gram skew (one boilerplate
    gram duplicated ~10^9 times sorts in one task) has a built-in guard:
    ``hot_threshold`` routes sampled heavy-hitter gram classes through a
    map-side-combining min-aggregate (no sort anywhere) — output
    invariant, plan-only (:func:`duplicated_occurrences`).
  * The interval-merge window partitions by doc_id over the DUPLICATED
    intervals only (a small fraction of the corpus), never the tokens.
  * Token removal never shuffles the token table: merged spans collect
    to ONE array row per affected doc, join back to the docs scan on
    doc_id (broadcast-eligible when few docs are affected), and the
    covered-position filter runs as a whole-stage-codegen array
    expression (filter-with-index + exists) inside the scan.
  * Gram keys are 60-bit md5 prefixes (functions.hashing.h60): fixed
    8-byte shuffle keys instead of full n-gram strings. At extreme gram
    cardinality (~2^30+) collisions would conflate unrelated grams and
    remove a false span; production at that scale should widen the key
    (full md5) — the hash seam is a single expression.

The building blocks (:func:`gram_occurrences`, :func:`merge_intervals`,
:func:`remove_spans`) are exposed so the CONTINUOUS variant
(streaming/dedup.py ``incremental_span_dedup_ingest``) composes the same
code against a persisted seen-gram state instead of a same-frame window.

Reference has no counterpart (extension per the builder's brief); the
DuckDB oracle in suite.py replays the same universe, hash, keep-first
rule, and merge rule bit-for-bit (all-integer/string outputs — no float
drift possible).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import hashing as H
from ..functions import text as T

DEFAULT_SPAN_NGRAM = 8


def _tokens(text_col: str):
    """Normalized word array; null text -> empty array (not null). Empty
    tokens are KEPT (split('') == ['']) — positions must index the split
    output verbatim for removal; see the module docstring's universe
    note."""
    return F.coalesce(
        F.split(T.normalize_text(text_col), " "), F.array().cast("array<string>")
    )


def gram_occurrences(
    docs: DataFrame,
    n: int = DEFAULT_SPAN_NGRAM,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, start, __gh): one row per full word n-gram occurrence, keyed by
    the portable 60-bit gram hash. Map-side only — no shuffle. Docs shorter
    than ``n`` tokens contribute no grams (a short doc equal to another
    short doc is whole-doc dedup's business, not span surgery)."""
    if n < 1:
        raise ValueError(f"span n-gram length must be >= 1, got {n}")
    toks = _tokens(text_col).alias("__toks")
    base = docs.select(F.col(id_col), toks)
    # full n-grams only: start positions 0 .. len-n (empty when len < n);
    # posexplode of the empty array drops the doc from the gram table
    grams = base.select(
        F.col(id_col),
        F.posexplode(
            F.when(
                F.size("__toks") >= n,
                F.transform(
                    F.sequence(F.lit(0), F.size("__toks") - n),
                    lambda i: F.array_join(F.slice("__toks", i + 1, n), " "),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("start", "__gram"),
    )
    return grams.select(id_col, "start", H.h60("__gram").alias("__gh"))


def merge_intervals(intervals: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Gaps-and-islands merge of (id, lo, hi) token intervals: overlapping
    or ADJACENT intervals collapse to maximal spans. Partitions by doc id —
    scales with the duplicated-interval table, never the corpus."""
    w = Window.partitionBy(id_col).orderBy("lo", "hi")
    prev_max_hi = F.max("hi").over(w.rowsBetween(Window.unboundedPreceding, -1))
    flagged = intervals.withColumn(
        "__new",
        F.when(F.col("lo") > F.coalesce(prev_max_hi, F.lit(-1)) + 1, 1).otherwise(0),
    ).withColumn(
        "__island",
        F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        flagged.groupBy(id_col, "__island")
        .agg(F.min("lo").alias("lo"), F.max("hi").alias("hi"))
        .select(id_col, "lo", "hi")
    )


def duplicated_occurrences(
    occ: DataFrame,
    id_col: str = "doc_id",
    hot_threshold: int | None = None,
    sample_fraction: float = 0.01,
    seed: int = 7,
) -> DataFrame:
    """(id, start, __gh) rows that are NOT the (id, start)-first of their
    gram class — the keep-first core, factored over an occurrence table.

    Default plan: ONE corpus-scale shuffle — a row_number window over the
    gram hash (same key class as minhash banding). The rejected
    groupBy(min)+join formulation shuffles occ TWICE and recomputes the
    scan+explode on the probe side (verified on the physical plan).

    ``hot_threshold`` closes the window's one scale cliff: a boilerplate
    gram duplicated ~10^9 times sorts all its occurrences in ONE window
    task. When set, a sampled pass (fraction ``sample_fraction``) flags
    gram classes whose estimated count reaches the threshold; their
    occurrences route through a map-side-combining min-aggregate (skew
    IMMUNE — each map partition collapses a hot gram to one partial row,
    no sort anywhere) + an equi-join that AQE broadcasts while the hot
    set is small. The long tail stays on the window. Routing is
    plan-only: both paths apply the identical keep-first rule, so the
    OUTPUT is invariant to the threshold, the sample, and partitioning —
    pinned by tests. False positives from the generous sampling gate just
    take the min-aggregate path harmlessly."""
    if hot_threshold is None:
        keep_first = Window.partitionBy("__gh").orderBy(id_col, "start")
        return (
            occ.withColumn("__rn", F.row_number().over(keep_first))
            .filter(F.col("__rn") > 1)
            .drop("__rn")
        )
    if hot_threshold < 2:
        raise ValueError(f"hot_threshold must be >= 2, got {hot_threshold}")
    # a gram with true count c appears ~Binomial(c, f) times in the sample;
    # flagging at a quarter of the expected sampled count keeps false
    # NEGATIVES (a real heavy hitter missing the gate) vanishingly rare.
    # Floor at 2 (ADVICE r12 #3): a floor of 1 degenerates whenever
    # hot_threshold * sample_fraction < 4 — EVERY gram seen once in the
    # sample would route down the hot path, bloating the join side the
    # guard assumes is small. Size hot_threshold * sample_fraction >> 1
    # so true heavy hitters expect multiple sampled hits; output is
    # invariant either way, the floor is plan protection only.
    min_sampled = max(2, int(hot_threshold * sample_fraction / 4))
    hot = (
        occ.sample(fraction=sample_fraction, seed=seed)
        .groupBy("__gh")
        .agg(F.count(F.lit(1)).alias("__c"))
        .filter(F.col("__c") >= min_sampled)
        .select("__gh", F.lit(True).alias("__hot"))
    )
    tagged = occ.join(hot, "__gh", "left")
    cold = tagged.filter(F.col("__hot").isNull()).drop("__hot")
    hot_occ = tagged.filter(F.col("__hot").isNotNull()).drop("__hot")
    cold_dup = duplicated_occurrences(cold, id_col)
    first_hot = hot_occ.groupBy("__gh").agg(
        F.min(F.struct(F.col(id_col), F.col("start"))).alias("__first")
    )
    hot_dup = (
        hot_occ.join(first_hot, "__gh")
        .filter(
            ~(
                (F.col(id_col) == F.col(f"__first.{id_col}"))
                & (F.col("start") == F.col("__first.start"))
            )
        )
        .select(id_col, "start", "__gh")
    )
    return cold_dup.unionByName(hot_dup)


def duplicated_spans(
    docs: DataFrame,
    n: int = DEFAULT_SPAN_NGRAM,
    id_col: str = "doc_id",
    text_col: str = "text",
    hot_threshold: int | None = None,
) -> DataFrame:
    """Maximal removal spans: one row per ``(id, lo, hi)`` token interval
    covered by non-first duplicated n-gram occurrences. See
    :func:`duplicated_occurrences` for the ``hot_threshold`` skew guard."""
    occ = gram_occurrences(docs, n, id_col, text_col)
    dup = duplicated_occurrences(occ, id_col, hot_threshold).select(
        F.col(id_col),
        F.col("start").alias("lo"),
        (F.col("start") + F.lit(n - 1)).alias("hi"),
    )
    return merge_intervals(dup, id_col)


def remove_spans(
    docs: DataFrame,
    spans: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply (id, lo, hi) removal spans to the docs: one row per input doc,
    ``(id, n_tokens, n_tokens_removed, n_spans, clean_text)``. The token
    table itself never shuffles: spans ride back to the scan as one array
    per affected doc and the removal is a pure array expression."""
    per_doc = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("lo", "hi")).alias("__spans"),
        F.count(F.lit(1)).alias("__n_spans"),
        F.sum(F.col("hi") - F.col("lo") + 1).alias("__n_removed"),
    )
    base = docs.select(F.col(id_col), _tokens(text_col).alias("__toks"))
    joined = base.join(per_doc, id_col, "left")
    covered = lambda i: F.exists(  # noqa: E731 — reads better inline
        "__spans", lambda s: (i >= s["lo"]) & (i <= s["hi"])
    )
    clean = F.when(
        F.col("__spans").isNull(), F.array_join("__toks", " ")
    ).otherwise(
        F.array_join(F.filter("__toks", lambda t, i: ~covered(i)), " ")
    )
    return joined.select(
        F.col(id_col),
        F.size("__toks").cast("bigint").alias("n_tokens"),
        F.coalesce(F.col("__n_removed"), F.lit(0)).cast("bigint").alias(
            "n_tokens_removed"
        ),
        F.coalesce(F.col("__n_spans"), F.lit(0)).cast("bigint").alias("n_spans"),
        clean.alias("clean_text"),
    )


def span_dedup(
    docs: DataFrame,
    n: int = DEFAULT_SPAN_NGRAM,
    id_col: str = "doc_id",
    text_col: str = "text",
    hot_threshold: int | None = None,
) -> DataFrame:
    """One row per input doc: duplicated spans surgically removed, first
    occurrence kept verbatim. Composition of the three building blocks;
    ``hot_threshold`` routes boilerplate-grade gram classes around the
    window sort (output-invariant — see :func:`duplicated_occurrences`)."""
    return remove_spans(
        docs,
        duplicated_spans(docs, n, id_col, text_col, hot_threshold),
        id_col,
        text_col,
    )
