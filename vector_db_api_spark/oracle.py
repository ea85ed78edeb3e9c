"""DuckDB oracle-SQL generators, mirroring the engine's Column expressions.

Every generator here produces ANSI-ish SQL (DuckDB dialect) whose arithmetic
is BIT-IDENTICAL to the corresponding Spark expression in ``functions/``:

- Vector folds use ``list_reduce(list_prepend(0.0, list_transform(...)))`` —
  an explicitly sequential left fold over doubles, the same operation order
  as Spark's ``aggregate(zip_with(...))`` (verified bit-exact on the test
  corpus; a naive unrolled ``a+b+c`` chain is NOT bit-exact because DuckDB
  reassociates it).
- Hashes are md5-derived (``functions/hashing.py``) so both engines compute
  the identical hex string; hex→BIGINT is ``conv(...,16,10)`` in Spark and
  ``CAST('0x'||... AS BIGINT)`` in DuckDB.
- Text ops replicate ``functions/text.py`` exactly, including the nested
  CASE order of the language-ID tie-break.

These exist so every operator can ship a driver-checkable correctness oracle
(the round-1 gap). They are test scaffolding, not a second engine: only the
Spark side runs at scale.
"""

from __future__ import annotations

from vector_db_api_spark.functions.hashing import MINHASH_SEED, minhash_sql_exprs
from vector_db_api_spark.functions.text import LANG_MARKERS

# -- vector kernel ----------------------------------------------------------


def vec_literal(vals: list[float]) -> str:
    """DOUBLE[] literal that round-trips to the identical IEEE doubles.

    Each element is a ``'…'::DOUBLE`` STRING cast: DuckDB types a bare
    17-digit numeric literal as DECIMAL(18,17) and its decimal→double
    conversion is NOT the correctly-rounded strtod, so plain literals drift
    by an ulp. The result is parenthesized so ``{literal}[i]`` parses.
    """
    elems = ", ".join(f"'{float(v)!r}'::DOUBLE" for v in vals)
    return f"([{elems}]::DOUBLE[])"


def fold(terms_list: str) -> str:
    """Sequential left fold (+) over a DOUBLE list, starting at 0.0."""
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), {terms_list}), "
        f"(acc, x) -> acc + x)"
    )


def dot(a: str, b: str) -> str:
    terms = (
        f"list_transform(range(1, len({a})+1), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))"
    )
    return fold(terms)


def norm(a: str) -> str:
    terms = (
        f"list_transform(range(1, len({a})+1), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE))"
    )
    return f"sqrt({fold(terms)})"


def cosine(a: str, b: str) -> str:
    return (
        f"CASE WHEN {norm(a)} = 0.0 OR {norm(b)} = 0.0 THEN 0.0 "
        f"ELSE {dot(a, b)} / ({norm(a)} * {norm(b)}) END"
    )


def euclidean_distance(a: str, b: str) -> str:
    terms = (
        f"list_transform(range(1, len({a})+1), "
        f"i -> (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE)) * "
        f"(CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE)))"
    )
    return f"sqrt({fold(terms)})"


def euclidean_similarity(a: str, b: str) -> str:
    return f"CAST(1.0 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + {euclidean_distance(a, b)})"


def similarity(metric: str, a: str, b: str) -> str:
    if metric == "cosine":
        return cosine(a, b)
    if metric == "euclidean":
        return euclidean_similarity(a, b)
    if metric == "dot_product":
        return dot(a, b)
    raise ValueError(f"Unknown metric: {metric!r}")


def cosine_const(a: str, qvec: list[float]) -> str:
    """Mirror of ``vector.cosine_similarity_const`` / the kNN cosine path:
    the query norm is a plan-time Python fold (bit-identical to the engine
    fold), so per row only norm(a) and the dot evaluate."""
    from vector_db_api_spark.functions.vector import const_norm

    qn = const_norm(qvec)
    if qn == 0.0:
        return "CAST(0.0 AS DOUBLE)"
    return (
        f"CASE WHEN {norm(a)} = 0.0 THEN 0.0 "
        f"ELSE {dot(a, vec_literal(qvec))} / ({norm(a)} * '{qn!r}'::DOUBLE) END"
    )


def similarity_const(metric: str, a: str, qvec: list[float]) -> str:
    """Mirror of ``vector.similarity_const``."""
    if metric == "cosine":
        return cosine_const(a, qvec)
    return similarity(metric, a, vec_literal(qvec))


def dots_const_list(v: str, mat) -> str:
    """DOUBLE[] of sequential-fold dots of ``v`` with each row of a constant
    matrix — one explicit fold expression per row (no nested-lambda capture
    needed), used to replay ANN signature/assignment math."""
    elems = ", ".join(dot(v, vec_literal([float(x) for x in row])) for row in mat)
    return f"[{elems}]"


def lsh_packed_signature(v: str, planes) -> str:
    """Packed little-endian sign-bit signature of ``v`` against an (H, d)
    constant hyperplane matrix — mirror of SignLSH._signatures_np for one
    table (bit i set iff dot(v, plane_i) >= 0)."""
    bits = " + ".join(
        f"(CASE WHEN {dot(v, vec_literal([float(x) for x in p]))} >= 0.0 "
        f"THEN CAST({1 << i} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for i, p in enumerate(planes)
    )
    return f"({bits})"


def argmax_idx(a: str) -> str:
    """0-based index of the FIRST maximum of a list (numpy argmax / Spark
    array_position semantics) — the ONE argmax the kernel oracle and every
    ANN assignment replay share; two names for this expression previously
    invited divergent tie-semantics edits."""
    return f"CAST(list_position({a}, list_max({a})) - 1 AS INTEGER)"


# -- text ------------------------------------------------------------------


def normalize_text(c: str) -> str:
    return f"regexp_replace(trim(lower({c})), ' +', ' ', 'g')"


def token_count(c: str) -> str:
    n = normalize_text(c)
    return (
        f"CAST(CASE WHEN length({n}) = 0 THEN 0 "
        f"ELSE len(string_split({n}, ' ')) END AS INTEGER)"
    )


def token_count_bpe(c: str) -> str:
    # mirror of functions/text.py BPE_TOKEN_PATTERN — plain character
    # classes, identical semantics in RE2 and Java regex
    return (
        f"CAST(len(regexp_extract_all(lower({c}), "
        r"'[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT)"
    )


def int8_quant_exprs(v: str) -> tuple[str, str]:
    """(scale_sql, codes_sql) mirroring functions/quant.py: scale =
    list_max(|x|)/127, code = floor(x/scale + 0.5)::TINYINT, zero-safe."""
    scale = f"COALESCE(list_max(list_transform({v}, x -> abs(CAST(x AS DOUBLE)))) / 127.0, 0.0)"
    codes = (
        f"list_transform({v}, x -> CAST(CASE WHEN {scale} = 0.0 THEN 0 "
        f"ELSE floor(CAST(x AS DOUBLE) / ({scale}) + 0.5) END AS TINYINT))"
    )
    return scale, codes


def word_occurrences(c: str, word: str) -> str:
    n = normalize_text(c)
    return f"CAST(len(list_filter(string_split({n}, ' '), t -> t = '{word}')) AS BIGINT)"


def lang_scores(c: str) -> dict[str, str]:
    return {
        lang: "(" + " + ".join(word_occurrences(c, w) for w in words) + ")"
        for lang, words in LANG_MARKERS.items()
    }


def lang_id(c: str) -> str:
    """Replicates functions.text.lang_id's nested-when construction exactly:
    highest-priority language outermost, > for earlier langs, >= for later."""
    scores = lang_scores(c)
    langs = list(LANG_MARKERS)
    expr = "'und'"
    for lang in reversed(langs):
        conds = [f"{scores[lang]} > 0"]
        for other in langs[: langs.index(lang)]:
            conds.append(f"{scores[lang]} > {scores[other]}")
        for other in langs[langs.index(lang) + 1 :]:
            conds.append(f"{scores[lang]} >= {scores[other]}")
        expr = f"CASE WHEN {' AND '.join(conds)} THEN '{lang}' ELSE {expr} END"
    return expr


def punct_ratio(c: str) -> str:
    n = normalize_text(c)
    stripped = f"regexp_replace({n}, '[a-z0-9 ]', '', 'g')"
    return (
        f"CASE WHEN length({n}) = 0 THEN 0.0 "
        f"ELSE CAST(length({stripped}) AS DOUBLE) / CAST(length({n}) AS DOUBLE) END"
    )


def stopword_ratio(
    c: str, stopwords: tuple[str, ...] = ("the", "a", "of", "and", "is", "to", "in")
) -> str:
    hits = " + ".join(word_occurrences(c, w) for w in stopwords)
    return (
        f"CASE WHEN {token_count(c)} = 0 THEN 0.0 "
        f"ELSE CAST({hits} AS DOUBLE) / CAST({token_count(c)} AS DOUBLE) END"
    )


def mean_token_len(c: str) -> str:
    n = normalize_text(c)
    return (
        f"CASE WHEN {token_count(c)} = 0 THEN 0.0 "
        f"ELSE CAST(length(replace({n}, ' ', '')) AS DOUBLE) / "
        f"CAST({token_count(c)} AS DOUBLE) END"
    )


def quality_score(c: str) -> str:
    n = normalize_text(c)
    length_factor = f"least(CAST(length({n}) AS DOUBLE) / 256.0, CAST(1.0 AS DOUBLE))"
    sw_factor = f"least({stopword_ratio(c)} / 0.15, CAST(1.0 AS DOUBLE))"
    return (
        f"{length_factor} * 0.4 + (CAST(1.0 AS DOUBLE) - {punct_ratio(c)}) * 0.3 "
        f"+ {sw_factor} * 0.3"
    )


# -- hashing / dedup --------------------------------------------------------


def h32(c: str) -> str:
    return f"CAST(('0x' || substring(md5({c}), 1, 8)) AS BIGINT)"


def h60(c: str) -> str:
    return f"CAST(('0x' || substring(md5({c}), 1, 15)) AS BIGINT)"


def word_shingles(n: str, k: int = 3) -> str:
    """List of k-word shingles of pre-normalized text ``n`` (mirror of
    functions.hashing.word_shingles: sequence of start offsets, slice, join)."""
    toks = f"string_split({n}, ' ')"
    starts = f"range(0, greatest(len({toks}) - {k}, 0) + 1)"
    return (
        f"list_transform({starts}, "
        f"i -> array_to_string(list_slice({toks}, i + 1, i + {k}), ' '))"
    )


def winnowing_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    window: int = 4,
) -> str:
    """Mirror of functions.text.winnow_table: positional shingle hashes →
    per-window minima → sorted distinct. The hash list is materialized in a
    CTE so the per-window lambdas don't recompute the md5 pipeline (same
    O(S²)→O(S·w) fix as the Spark side). DuckDB ``list_slice`` is 1-based
    with inclusive end, matching Spark's ``slice(arr, i+1, w)``."""
    hashes = f"list_transform({word_shingles(normalize_text(text_col), k)}, s -> {h32('s')})"
    return (
        f"WITH __wh AS (SELECT {id_col}, {hashes} AS hashes FROM {table}) "
        f"SELECT {id_col}, list_sort(list_distinct(list_transform("
        f"range(0, greatest(len(hashes) - {window}, 0) + 1), "
        f"i -> list_min(list_slice(hashes, i + 1, i + {window}))))) AS winnow_fps "
        f"FROM __wh"
    )


def shingle_hashes_cte(
    table: str = "documents", id_col: str = "doc_id", text_col: str = "text", k: int = 3
) -> str:
    """CTE body producing DISTINCT (id, shingle_hash) — mirror of
    operators.dedup.shingle_hashes."""
    n = normalize_text(text_col)
    return (
        f"SELECT DISTINCT {id_col}, {h32('s')} AS shingle_hash FROM ("
        f"SELECT {id_col}, unnest({word_shingles(n, k)}) AS s FROM {table})"
    )


def minhash_select(num_hashes: int, seed: int = MINHASH_SEED) -> str:
    """Aggregate list ``MIN(...) AS mh{i}`` over a shingle-hash CTE."""
    return ", ".join(
        f"{e} AS mh{i}"
        for i, e in enumerate(minhash_sql_exprs(num_hashes, "shingle_hash", seed))
    )


def simhash_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    nbits: int = 60,
) -> str:
    """Full simhash query — mirror of operators.dedup.simhash."""
    n = normalize_text(text_col)
    votes = ", ".join(
        f"SUM(CASE WHEN (th >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS b{i}"
        for i in range(nbits)
    )
    packed = " + ".join(
        f"(CASE WHEN b{i} > 0 THEN CAST({1 << i} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for i in range(nbits)
    )
    return (
        f"SELECT {id_col}, {packed} AS simhash FROM ("
        f"SELECT {id_col}, {votes} FROM ("
        f"SELECT {id_col}, {h60('tok')} AS th FROM ("
        f"SELECT {id_col}, unnest(string_split({n}, ' ')) AS tok FROM {table}))"
        f" GROUP BY {id_col})"
    )
