"""Vectorized engine functions: Arrow pandas UDFs + JVM Column expressions.

Rule (BASELINE.json input_hint): no per-row Python UDFs. Everything Python
is an Arrow-batched ``pandas_udf``; everything expressible with builtin
``pyspark.sql.functions`` is a Column expression so it stays inside
whole-stage codegen.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

from .parsers_ref import (
    LABEL_CASE_BRANCHES,
    _LINK_RE,
    _PARA_RE,
    _TITLE_RE,
    canonicalize_url,
)

# ---------------------------------------------------------------------------
# URL canonicalization + host (engine analog of function.sql:17-50)
# ---------------------------------------------------------------------------


#: already-canonical detector: lowercase, no query/fragment, no port, no
#: trailing slash, non-empty path. Such urls pass through untouched — on a
#: web corpus ~80% of urls take this vectorized path and never reach the
#: per-element parser.
_FAST_CANON = (
    r"^[a-z][a-z0-9+.\-]*://[a-z0-9.\-]+/(?:[^?#A-Z:]*[^/?#A-Z:])?$"
)


@pandas_udf(StringType())
def canonicalize_url_udf(urls: pd.Series) -> pd.Series:
    """Arrow-batched canonicalize_url (twin of parsers_ref.canonicalize_url).

    Vectorized fast path: urls that regex-verify as already canonical are
    passed through (pure pandas); only the noisy minority (query to sort,
    port/fragment/case to strip) runs the per-element urllib parser.
    Fast-path ≡ fallback equivalence is pinned in tests/test_parsers.py.
    """
    s = urls.astype("string")
    fast = s.str.match(_FAST_CANON, na=False) & ~s.str.contains(
        r"[?#A-Z]|//.*:", regex=True, na=True
    )
    out = s.copy()
    slow = ~fast
    if slow.any():
        out[slow] = s[slow].map(canonicalize_url, na_action="ignore")
    return out.astype(object)


@pandas_udf(StringType())
def url_host_udf(urls: pd.Series) -> pd.Series:
    """Arrow-batched host extraction (lowercased, port-stripped)."""
    return (
        urls.str.extract(r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]+)", expand=False)
        .str.replace(r":\d+$", "", regex=True)
        .str.lower()
        .fillna("")
    )


def host_col(url: Column) -> Column:
    """JVM-side host extraction for *canonical* urls (already lowercase,
    no default port): stays in whole-stage codegen — preferred in the
    frontier hot path."""
    return F.regexp_replace(
        F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]+)", 1),
        r":\d+$",
        "",
    )


# ---------------------------------------------------------------------------
# HTML extraction (engine analog of scraper.py:100-116 cell walk)
# ---------------------------------------------------------------------------


def _extract_text_one(html: bytes) -> str:
    parts = []
    m = _TITLE_RE.search(html)
    if m:
        parts.append(m.group(1))
    parts.extend(_PARA_RE.findall(html))
    return b"\n".join(parts).decode("utf-8", errors="replace")


@pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """Byte-identical golden extraction: title + <p> blocks joined by \\n.

    Pinned against parsers_ref.extract_text and the pages.text column by
    tests/test_parsers.py goldens.
    """
    return html.map(_extract_text_one, na_action="ignore")


@pandas_udf(ArrayType(StringType()))
def extract_links_udf(html: pd.Series) -> pd.Series:
    """All <a href> targets per page, document order, raw."""
    return html.map(
        lambda b: [m.decode("utf-8", errors="replace") for m in _LINK_RE.findall(b)],
        na_action="ignore",
    )


# explicit StructType: a DDL return-type string would be parsed at import
# time and require an active SparkContext (Spark 4.1 gotcha)
_PAGE_STRUCT = StructType(
    [
        StructField("text", StringType()),
        StructField("links", ArrayType(StringType())),
    ]
)


@pandas_udf(_PAGE_STRUCT)
def extract_page_udf(html: pd.Series) -> pd.DataFrame:
    """Fused text + link extraction in ONE Arrow pass.

    The html blob is ~99% of a page row's bytes; calling
    ``extract_text_udf`` and ``extract_links_udf`` separately ships it
    across the JVM↔Python Arrow channel twice. This struct-returning UDF
    pays the transfer once and runs both regex walks on the bytes while
    they're hot. Field outputs are byte-identical to the single-purpose
    UDFs (pinned in tests/test_parsers.py), which remain for callers that
    need only one side.
    """
    texts, links = [], []
    for b in html:
        if b is None:
            texts.append(None)
            links.append(None)
            continue
        texts.append(_extract_text_one(b))
        links.append(
            [m.decode("utf-8", errors="replace") for m in _LINK_RE.findall(b)]
        )
    return pd.DataFrame({"text": texts, "links": links})


# ---------------------------------------------------------------------------
# Numeric parsers (scraper.py:64-78) — fully vectorized pandas string ops
# ---------------------------------------------------------------------------


@pandas_udf(DoubleType())
def parse_xrp_amount_udf(text: pd.Series) -> pd.Series:
    """Vectorized twin of parse_xrp_amount (scraper.py:64-72):
    strip 'XRP'/','/whitespace; ''/'-'/garbage → 0.0."""
    cleaned = (
        text.astype("string")
        .str.replace("XRP", "", regex=False)
        .str.replace(",", "", regex=False)
        .str.strip()
    )
    out = pd.to_numeric(cleaned, errors="coerce").astype("float64")
    return out.fillna(0.0)


@pandas_udf(DoubleType())
def parse_percentage_udf(text: pd.Series) -> pd.Series:
    """Vectorized twin of parse_percentage (scraper.py:74-78)."""
    cleaned = text.astype("string").str.replace("%", "", regex=False).str.strip()
    return pd.to_numeric(cleaned, errors="coerce").astype("float64").fillna(0.0)


# ---------------------------------------------------------------------------
# Label functions — JVM Column expressions (no Python at all)
# ---------------------------------------------------------------------------


def canonical_label_col(label: Column) -> Column:
    """The 29-branch CASE of function.sql:17-50 as a codegen'd when-chain."""
    expr = None
    for pat, contains, grouped in LABEL_CASE_BRANCHES:
        cond = label.contains(pat) if contains else label.startswith(pat)
        expr = F.when(cond, grouped) if expr is None else expr.when(cond, grouped)
    fallback = F.regexp_replace(
        F.regexp_replace(label, "^~", ""), r"\s*\([^)]*\)$", ""
    )
    return expr.otherwise(fallback)


def format_label_col(name: Column, desc: Column) -> Column:
    """loader.py:86-93 as a Column expression."""
    return (
        F.when(name.isNull() | (name == "") | (name == "Unknown"), F.lit("Unknown"))
        .when(
            desc.isNotNull() & (desc != ""),
            F.concat(name, F.lit(" ("), desc, F.lit(")")),
        )
        .otherwise(name)
    )


def safe_ratio_col(cur: Column, prev: Column) -> Column:
    """Div-by-zero-guarded percent change — function.sql:127-129 (F8):
    CASE WHEN prev = 0 THEN 0 ELSE (cur - prev) / prev * 100 END."""
    return F.when(prev == 0, F.lit(0.0)).otherwise((cur - prev) / prev * 100)
