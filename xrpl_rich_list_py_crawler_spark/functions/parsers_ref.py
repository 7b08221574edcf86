"""Pure-Python reference implementations of every scalar parser.

These are the *semantic twins* used to pin the vectorized Arrow UDFs with
byte-identical goldens (SURVEY.md §5.1, BASELINE.json input_hint:
"byte-identical extracted text per url"). They are intentionally simple,
single-row, dependency-free Python — the same role the reference's
``parse_xrp_amount`` / ``parse_percentage`` play at ``scraper.py:64-78``.

Nothing here runs in a Spark hot path; the engine uses the vectorized
equivalents in :mod:`.udfs`, and pytest asserts equality against these.
"""

from __future__ import annotations

import re
from urllib.parse import parse_qsl, urlencode, urlsplit, urlunsplit

# ---------------------------------------------------------------------------
# URL canonicalization — the engine analog of the reference's 29-branch label
# canonicalization (function.sql:17-50): many surface forms → one group key.
# ---------------------------------------------------------------------------

_DEFAULT_PORTS = {"http": "80", "https": "443"}


def canonicalize_url(url: str) -> str:
    """Canonical form: lowercase scheme+host, drop default port, drop
    fragment, sort query params, strip trailing slash (non-root paths),
    empty path → '/'.

    Derived from the reference's canonicalization idiom (strip leading
    ``~``, strip trailing parenthetical — ``function.sql:46-49``): collapse
    cosmetic variants into one key before dedup/grouping.
    """
    if url is None:
        return None
    parts = urlsplit(url.strip())
    scheme = parts.scheme.lower()
    host = parts.hostname.lower() if parts.hostname else ""
    port = parts.port
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORTS.get(scheme, ""):
        netloc = f"{host}:{port}"
    path = parts.path or "/"
    if len(path) > 1 and path.endswith("/"):
        path = path.rstrip("/") or "/"
    query = ""
    if parts.query:
        pairs = sorted(parse_qsl(parts.query, keep_blank_values=True))
        query = urlencode(pairs)
    return urlunsplit((scheme, netloc, path, query, ""))


def host_of(url: str) -> str:
    """Lowercased hostname of a URL ('' when unparseable)."""
    if not url:
        return ""
    h = urlsplit(url).hostname
    return h.lower() if h else ""


# ---------------------------------------------------------------------------
# HTML extraction — the engine analog of the Selenium cell walk
# (scraper.py:100-116). The pages corpus templates pages as
# <title>…</title> + <p>…</p> blocks + <a href="…"> links, so a
# deterministic regex extractor is the specification.
# ---------------------------------------------------------------------------

_TITLE_RE = re.compile(rb"<title>(.*?)</title>", re.DOTALL)
_PARA_RE = re.compile(rb"<p>(.*?)</p>", re.DOTALL)
_LINK_RE = re.compile(rb'<a\s+href="([^"]*)"', re.DOTALL)


def extract_text(html: bytes) -> str:
    """Golden extraction: title + paragraph texts joined by ``\\n``.

    Must be byte-identical to the ``pages.text`` column for every url
    (FIXTURES.md §1; input_hint invariant).
    """
    if html is None:
        return None
    parts = []
    m = _TITLE_RE.search(html)
    if m:
        parts.append(m.group(1))
    parts.extend(_PARA_RE.findall(html))
    # errors="replace": malformed bytes must not kill a crawl task
    # (scraper.py:230-233 keep-going policy); valid utf-8 — the golden
    # invariant's domain — is unaffected byte-for-byte.
    return b"\n".join(parts).decode("utf-8", errors="replace")


def extract_links(html: bytes) -> list[str]:
    """All ``<a href>`` targets, document order, raw (pre-canonicalization)."""
    if html is None:
        return []
    return [m.decode("utf-8", errors="replace") for m in _LINK_RE.findall(html)]


# ---------------------------------------------------------------------------
# Numeric parsers — line-faithful semantics of scraper.py:64-78.
# ---------------------------------------------------------------------------


def parse_xrp_amount(text: str) -> float:
    """Strip 'XRP', ',', whitespace; ''/'-' → 0.0; parse errors → 0.0.

    Semantics of ``parse_xrp_amount`` at ``scraper.py:64-72`` (dup
    ``xrpl_rich_list_loader.py:67-75``).
    """
    try:
        cleaned = text.replace("XRP", "").replace(",", "").strip()
        if cleaned in ("", "-"):
            return 0.0
        return float(cleaned)
    except (ValueError, AttributeError):
        return 0.0


def parse_percentage(text: str) -> float:
    """Strip '%', float, error → 0.0 — ``scraper.py:74-78``."""
    try:
        return float(text.replace("%", "").strip())
    except (ValueError, AttributeError):
        return 0.0


# ---------------------------------------------------------------------------
# Label helpers — loader.py:86-93 and function.sql:17-50.
# ---------------------------------------------------------------------------


def format_label(name: str, desc: str) -> str:
    """'Unknown' if empty/Unknown; '{name} ({desc})' if desc else name —
    ``loader.py:86-93`` (dups ``loader-rlusd.py:55-62``,
    ``enricher-rlusd.py:25-32``)."""
    if not name or name == "Unknown":
        return "Unknown"
    if desc:
        return f"{name} ({desc})"
    return name


#: (prefix-pattern, is_contains, grouped) in CASE order — function.sql:17-45.
LABEL_CASE_BRANCHES: list[tuple[str, bool, str]] = [
    ("Ripple", False, "Ripple"),
    ("Coinbase", False, "Coinbase"),
    ("Bitrue", False, "Bitrue"),
    ("bithomp", False, "Bithomp"),
    ("Bithomp", False, "Bithomp"),
    ("Bithumb", False, "Bithumb"),
    ("Binance", False, "Binance"),
    ("WhiteBIT", False, "WhiteBIT"),
    ("CoinCola", False, "CoinCola"),
    ("CoinSwitch", False, "CoinSwitch"),
    ("gatehub", True, "gatehub"),
    ("GateHub", False, "gatehub"),
    ("Crypto.com", False, "Crypto.com"),
    ("CROSSMARK", False, "CROSSMARK"),
    ("digifin", False, "Digifin"),
    ("eolas", False, "eolas"),
    ("eToro", False, "eToro"),
    ("Evernode Labs", False, "Evernode Labs Ltd"),
    ("Evernode", False, "Evernode"),
    ("FTX ", False, "FTX"),
    ("Hotbit", False, "Hotbit"),
    ("Huobi", False, "Huobi"),
    ("Northern VoIP", False, "Northern VoIP"),
    ("SBI VC", False, "SBI VC Trade"),
    ("Sonar Muse", False, "Sonar Muse"),
    ("tequ", False, "tequ"),
    ("Vagabond", False, "Vagabond"),
    ("XUMM", False, "XUMM"),
]

_TILDE_RE = re.compile(r"^~")
_PAREN_RE = re.compile(r"\s*\([^)]*\)$")


def canonical_label(label: str) -> str:
    """The 29-branch CASE of ``function.sql:17-50``: known prefixes map to a
    canonical group; otherwise strip leading '~' and trailing '(…)'."""
    if label is None:
        return None
    for pat, contains, grouped in LABEL_CASE_BRANCHES:
        if (pat in label) if contains else label.startswith(pat):
            return grouped
    return _PAREN_RE.sub("", _TILDE_RE.sub("", label))


def canonical_label_sql(col: str = "label") -> str:
    """ANSI-SQL CASE expression equivalent (for DuckDB oracles)."""
    whens = []
    for pat, contains, grouped in LABEL_CASE_BRANCHES:
        like = f"'%{pat}%'" if contains else f"'{pat}%'"
        whens.append(f"WHEN {col} LIKE {like} THEN '{grouped}'")
    tail = (
        f"ELSE REGEXP_REPLACE(REGEXP_REPLACE({col}, '^~', ''), "
        r"'\s*\([^)]*\)$', '')"
    )
    return "CASE " + " ".join(whens) + " " + tail + " END"
