"""Deterministic synthetic fixtures (FIXTURES.md; seed=42, no wall-clock).

Generates, with pandas/pyarrow only (no JVM needed):

* ``pages``      — synthetic Common-Crawl corpus (url, warc_ts, html, text,
                   lang) where ``text`` is the golden extraction the Arrow
                   parser must reproduce byte-identically (input_hint).
* ``seeds``      — initial frontier (first 100 even-i canonical urls).
* ``robots``     — per-host politeness dimension (disallow prefixes, crawl
                   delay, per-round budget — mirrors batch_size=16 at
                   ``validator.py:123`` — and Zipf host_rank).
* ``richlist``   — reference-shaped snapshot table mirroring
                   ``xrpl_rich_list`` (``table.sql:1-17``): 48 hourly
                   snapshots with k=13 missing and k=14 shifted +7 min to
                   exercise the 45-70 min banded as-of join
                   (``function.sql:160-165``).
* ``categories`` — companion dimension (``table.sql:72-98``).

All randomness flows from ``numpy.random.RandomState(42)`` draws in a fixed
order, so every run produces identical tables. Host popularity is
Zipf(a=1.3) over 1,000 hosts — hot-host skew is deliberate (exercises
salting, SURVEY.md §4.2-3).
"""

from __future__ import annotations

import math
import os
from datetime import datetime, timedelta, timezone

import numpy as np
import pandas as pd

from ..functions.parsers_ref import canonical_label, canonicalize_url

EPOCH = datetime(2026, 1, 1, 0, 0, 0, tzinfo=timezone.utc)
N_HOSTS = 1000
ZIPF_A = 1.3
SEED = 42

PAGE_COUNTS = {"sf0.001": 1_000, "sf0.01": 10_000, "sf0.1": 100_000}

_LOREM = (
    "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod "
    "tempor incididunt ut labore et dolore magna aliqua enim ad minim veniam "
    "quis nostrud exercitation ullamco laboris nisi aliquip ex ea commodo "
    "consequat duis aute irure in reprehenderit voluptate velit esse cillum "
    "fugiat nulla pariatur excepteur sint occaecat cupidatat non proident"
).split()

#: 40-value label pool covering every CASE branch of function.sql:17-45
#: plus '~user' / 'Name (note)' / 'Unknown' fallback shapes.
LABEL_POOL = [
    "Ripple (1)", "Ripple (2)", "Coinbase", "Coinbase 2", "Bitrue cold",
    "bithomp activation", "Bithomp", "Bithumb", "Binance", "Binance cold",
    "WhiteBIT", "CoinCola", "CoinSwitch Kuber", "old gatehub wallet",
    "GateHub Fifth", "Crypto.com", "CROSSMARK dev", "digifin ops", "eolas",
    "eToro (custody)", "Evernode Labs Ltd", "Evernode burn", "FTX cold",
    "Hotbit", "Huobi 2", "Northern VoIP", "SBI VC Trade", "Sonar Muse",
    "tequ dev", "Vagabond (fund)", "XUMM backers", "~mrhat75", "~wietse",
    "Arthur Britto (co-founder)", "Jed McCaleb (tacostand)", "Unknown",
    "Unknown", "Gatehub Hot", "Kraken", "Uphold (cold)",
]

COUNTRY_POOL = ["US", "JP", "KR", "CN", "GB", "DE", "SG", "MT", "Unknown"]

from ..schemas import CATEGORY_ENUM  # noqa: E402


def _host(g: int) -> str:
    return f"h{g}.example{g % 97}.com"


def _host_rank(g: int) -> float:
    """Zipf weight of host g normalized to (0, 1]."""
    return float((g + 1) ** (-ZIPF_A))


def _zipf_cdf() -> np.ndarray:
    w = np.arange(1, N_HOSTS + 1, dtype="float64") ** (-ZIPF_A)
    return np.cumsum(w) / w.sum()


def _noisify(url: str, kind: int) -> str:
    """Apply one canonicalization-noise variant (FIXTURES.md §1)."""
    scheme, rest = url.split("://", 1)
    host, path = rest.split("/", 1)
    path = "/" + path
    if kind == 0:
        return f"{scheme}://{host}{path}/"
    if kind == 1:
        return f"{scheme}://{host}{path}#frag"
    if kind == 2:
        port = "443" if scheme == "https" else "80"
        return f"{scheme}://{host}:{port}{path}"
    if kind == 3:
        return f"{scheme}://{host.upper()}{path}"
    return f"{scheme}://{host}{path}?b=2&a=1"


def generate_pages(n: int, seed: int = SEED) -> pd.DataFrame:
    """The synthetic web. Returns columns url/warc_ts/html/text/lang plus
    helper columns (canonical url, host, host_g) used by seeds/simulator."""
    rng = np.random.RandomState(seed)
    cdf = _zipf_cdf()
    g = np.searchsorted(cdf, rng.rand(n)).clip(0, N_HOSTS - 1)
    scheme_https = rng.rand(n) < 0.9
    noisy = rng.rand(n) < 0.2
    noise_kind = rng.randint(0, 5, size=n)
    private = rng.rand(n) < 0.05
    n_para = rng.randint(1, 6, size=n)
    n_links = rng.randint(0, 9, size=n)
    para_words = rng.randint(8, 17, size=(n, 5))
    word_idx = rng.randint(0, len(_LOREM), size=(n, 5, 16))
    same_host = rng.rand(n, 8) < 0.8

    # group row indices by host for same-host link targets
    host_rows: dict[int, list[int]] = {}
    for i, gi in enumerate(g):
        host_rows.setdefault(int(gi), []).append(i)

    base_urls = []
    for i in range(n):
        scheme = "https" if scheme_https[i] else "http"
        seg = "private" if private[i] else "p"
        base_urls.append(f"{scheme}://{_host(int(g[i]))}/{seg}/{i}")

    stored_urls = [
        _noisify(base_urls[i], int(noise_kind[i])) if noisy[i] else base_urls[i]
        for i in range(n)
    ]

    urls, tss, htmls, texts, langs = [], [], [], [], []
    canon_urls = []
    for i in range(n):
        title = f"T{i}"
        paras = []
        for p in range(int(n_para[i])):
            w = [_LOREM[word_idx[i, p, q]] for q in range(int(para_words[i, p]))]
            paras.append(" ".join(w))
        links = []
        gi = int(g[i])
        rows_here = host_rows[gi]
        for k in range(int(n_links[i])):
            j = (i * 2654435761 + k * 40503 + 7) % n
            if same_host[i, k]:
                j = rows_here[j % len(rows_here)]
            links.append(stored_urls[j])
        body = "".join(f"<p>{p}</p>" for p in paras) + "".join(
            f'<a href="{u}">L{k}</a>' for k, u in enumerate(links)
        )
        html = f"<html><head><title>{title}</title></head><body>{body}</body></html>"
        text = "\n".join([title] + paras)
        bucket = i % 20
        lang = "en" if bucket < 17 else ("ja" if bucket < 19 else "de")
        urls.append(stored_urls[i])
        canon_urls.append(canonicalize_url(stored_urls[i]))
        tss.append(EPOCH.replace(tzinfo=None) + timedelta(seconds=i))
        htmls.append(html.encode("utf-8"))
        texts.append(text)
        langs.append(lang)

    return pd.DataFrame(
        {
            "url": urls,
            "warc_ts": pd.Series(tss, dtype="datetime64[us]"),
            "html": htmls,
            "text": texts,
            "lang": langs,
            "canon_url": canon_urls,
            "host": [_host(int(x)) for x in g],
            "host_g": g.astype("int32"),
        }
    )


def generate_seeds(pages: pd.DataFrame, n_seeds: int = 100) -> pd.DataFrame:
    """First ``n_seeds`` even-row canonical urls, depth 0, epoch discovery."""
    idx = [i for i in range(0, len(pages), 2)][:n_seeds]
    sub = pages.iloc[idx]
    return pd.DataFrame(
        {
            "url": sub["canon_url"].values,
            "depth": np.zeros(len(idx), dtype="int32"),
            "host_rank": [_host_rank(int(x)) for x in sub["host_g"]],
            "discovery_ts": pd.Series(
                [EPOCH.replace(tzinfo=None)] * len(idx), dtype="datetime64[us]"
            ),
        }
    )


def generate_robots(seed: int = SEED) -> pd.DataFrame:
    """Per-host rules: '/private' blocked for g%10==0; g%20==7 fully
    disallowed (5%); crawl_delay 1+g%5; budget 16 (validator.py:123)."""
    rows = []
    for gg in range(N_HOSTS):
        if gg % 20 == 7:
            dis = ["/"]
        elif gg % 10 == 0:
            dis = ["/private"]
        else:
            dis = []
        rows.append(
            {
                "host": _host(gg),
                "disallow_prefixes": dis,
                "crawl_delay_s": 1.0 + (gg % 5),
                "max_fetches_per_round": 16,
                "host_rank": _host_rank(gg),
            }
        )
    return pd.DataFrame(rows)


def generate_richlist(
    n_addresses: int = 1000, n_snapshots: int = 48, seed: int = SEED
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """48 hourly snapshots of a rank-ordered rich list (FIXTURES.md §5).

    Snapshot k=13 missing; k=14 shifted +7 min (banded as-of edge case,
    function.sql:160-165). Returns (richlist, categories).
    """
    rng = np.random.RandomState(seed)
    b58 = np.array(list("123456789ABCDEFGHJKLMNPQRSTUVWXYZ"
                        "abcdefghijkmnopqrstuvwxyz"))
    addresses = [
        "r" + "".join(rng.choice(b58, size=33)) for _ in range(n_addresses)
    ]
    labels = [LABEL_POOL[int(x)] for x in rng.randint(0, len(LABEL_POOL),
                                                      size=n_addresses)]
    domains = [
        "" if rng.rand() < 0.5 else f"d{gg}.com"
        for gg in rng.randint(0, 400, size=n_addresses)
    ]
    recs = []
    for k in range(n_snapshots):
        if k == 13:
            continue
        snap = EPOCH.replace(tzinfo=None) + timedelta(hours=k)
        if k == 14:
            snap += timedelta(minutes=7)
        bal = np.array(
            [
                1e6 / (r + 1) * (1 + 0.01 * math.sin((r + 1) * 31 + k))
                for r in range(n_addresses)
            ]
        )
        total = bal.sum()
        for r in range(n_addresses):
            rank = r + 1
            recs.append(
                {
                    "rank": rank,
                    "address": addresses[r],
                    "label": labels[r],
                    "balance_xrp": round(float(bal[r]), 6),
                    "escrow_xrp": round(float(bal[r]) * 0.1, 6)
                    if rank % 5 == 0
                    else 0.0,
                    "percentage": round(float(bal[r] / total * 100), 3),
                    "exists": rank % 100 != 0,
                    "domain": domains[r],
                    "snapshot_date": snap,
                }
            )
    richlist = pd.DataFrame(recs)
    richlist["rank"] = richlist["rank"].astype("int32")
    richlist["snapshot_date"] = richlist["snapshot_date"].astype("datetime64[us]")

    grouped = sorted({canonical_label(lbl) for lbl in LABEL_POOL})
    crng = np.random.RandomState(seed + 1)
    categories = pd.DataFrame(
        {
            "grouped_label": grouped,
            "category": [
                CATEGORY_ENUM[int(x)]
                for x in crng.randint(0, len(CATEGORY_ENUM), size=len(grouped))
            ],
            "country": [
                COUNTRY_POOL[int(x)]
                for x in crng.randint(0, len(COUNTRY_POOL), size=len(grouped))
            ],
        }
    )
    return richlist, categories


# ---------------------------------------------------------------------------
# On-disk materialization
# ---------------------------------------------------------------------------

FIXTURE_ROOT = os.environ.get(
    "SPARK_GRAFT_FIXTURES", os.path.join(os.path.dirname(__file__), "..", "..", "data")
)


def crawl_fixture_dir(sf: str) -> str:
    return os.path.abspath(os.path.join(FIXTURE_ROOT, f"crawl_{sf}"))


def generate_crawl_fixtures(sf: str, out_dir: str | None = None) -> str:
    """Write pages/seeds/robots/richlist/categories parquet for scale ``sf``."""
    out = out_dir or crawl_fixture_dir(sf)
    os.makedirs(out, exist_ok=True)
    n = PAGE_COUNTS[sf]
    pages = generate_pages(n)
    seeds = generate_seeds(pages)
    robots = generate_robots()
    pages_out = pages[["url", "warc_ts", "html", "text", "lang"]]
    pages_out.to_parquet(os.path.join(out, "pages.parquet"), index=False)
    seeds.to_parquet(os.path.join(out, "seeds.parquet"), index=False)
    robots.to_parquet(os.path.join(out, "robots.parquet"), index=False)
    richlist, categories = generate_richlist()
    richlist.to_parquet(os.path.join(out, "richlist.parquet"), index=False)
    categories.to_parquet(os.path.join(out, "categories.parquet"), index=False)
    generate_amounts().to_parquet(os.path.join(out, "amounts.parquet"), index=False)
    generate_trustlines().to_parquet(
        os.path.join(out, "trustlines.parquet"), index=False
    )
    return out


def generate_amounts(n: int = 500, seed: int = SEED) -> pd.DataFrame:
    """Stringly-typed scraped cells for the F1/F2 parser goldens
    (``scraper.py:64-78`` input shapes): amounts with 'XRP' suffix and
    thousands separators, percentages with '%', plus every edge case the
    reference's error handling covers."""
    rng = np.random.RandomState(seed + 7)
    rows = []
    edge = [
        ("", ""), ("-", "-"), ("garbage", "x%"), ("1e3", " 0.001 %"),
        ("XRP 42", "42%"), ("  7 ", "7 %"), ("-55,000", "-5%"),
        ("1,234.56 XRP", "12.5%"),
    ]
    for a, p in edge:
        rows.append({"cell_id": len(rows), "amount_text": a, "pct_text": p})
    for _ in range(n - len(rows)):
        v = float(rng.rand() * 10**rng.randint(0, 8))
        amt = f"{v:,.6f} XRP" if rng.rand() < 0.8 else f"{v:,.2f}"
        pct = f"{rng.rand() * 100:.4f}%"
        rows.append({"cell_id": len(rows), "amount_text": amt, "pct_text": pct})
    return pd.DataFrame(rows)


#: RLUSD currency code as the ledger hex string (scanner-rlusd.py:44)
RLUSD_HEX = "524C555344000000000000000000000000000000"


def generate_trustlines(n: int = 400, seed: int = SEED) -> pd.DataFrame:
    """Trustline API payloads for the RLUSD scanner chain
    (``scanner-rlusd.py:24-96``): nested JSON with specification/state/
    counterparty subobjects, mixed currencies, issuer-perspective negative
    balances, zero-balance lines, string limits, ripplingDisabled flags."""
    import json as _json

    rng = np.random.RandomState(seed + 11)
    currencies = [RLUSD_HEX, "USD", "EUR", "5553444300000000000000000000000000000000"]
    rows = []
    for i in range(n):
        cur = currencies[0] if rng.rand() < 0.7 else currencies[1 + rng.randint(3)]
        mag = float(rng.rand() * 10 ** rng.randint(0, 7))
        # issuer-perspective balances are negative; some lines are empty
        bal = 0.0 if rng.rand() < 0.1 else -mag if rng.rand() < 0.8 else mag
        payload = {
            "specification": {
                "currency": cur,
                "counterparty": f"r{'%033x' % rng.randint(0, 2**62)}",
            },
            "state": {"balance": f"{bal:.6f}"},
            "counterparty": {
                "limit": f"{float(rng.randint(1, 10) * 10**8):.1f}",
                "ripplingDisabled": bool(rng.rand() < 0.5),
            },
        }
        # ~5% of lines omit the optional counterparty flags (API reality)
        if rng.rand() < 0.05:
            del payload["counterparty"]["ripplingDisabled"]
        rows.append(
            {"line_id": i, "payload": _json.dumps(payload, sort_keys=True)}
        )
    return pd.DataFrame(rows)


def ensure_crawl_fixtures(sf: str) -> str:
    """Generate fixtures for ``sf`` if not already on disk; return dir."""
    out = crawl_fixture_dir(sf)
    expected = [
        "pages", "seeds", "robots", "richlist", "categories", "amounts",
        "trustlines",
    ]
    if all(os.path.exists(os.path.join(out, f"{t}.parquet")) for t in expected):
        return out
    return generate_crawl_fixtures(sf, out)
