"""Live-HTTP fetch variant of the crawl's fetch stage (S2/S3 scale path).

The default fetch in :class:`~..plans.rounds.CrawlRun` is an equi join
against the keyed pages corpus — the right shape when the corpus IS the
source (BASELINE.json ``input_hint``: Common-Crawl-style pages table).
The reference crawler instead fetches over the network
(``loader.py:28-54``, ``validator.py:80-121``, requests/selenium with
retries). This module is that variant as a Spark operator:

* **host-partitioned**: frontier rows are repartitioned by ``host`` so one
  host's URLs land on one executor partition — politeness (inter-request
  delay) is enforceable locally, with no cross-executor coordination, and
  DNS/TLS/keep-alive state is reused per host.
* **``mapInPandas``**: Arrow-batched, no per-row Python UDF; each batch is
  fetched in discovery order with per-host delay bookkeeping.
* **injectable transport**: ``transport(url) -> (status, body|None,
  page_ts|None)``. The default :func:`urllib_transport` does real HTTP
  (stdlib only); tests inject :func:`corpus_transport` — a dict backed by
  the fixture corpus — which makes the operator's output byte-identical
  to the join fetch (pinned in tests/test_http_fetch.py). No network
  exists in this sandbox, so ``urllib_transport`` itself is only
  smoke-tested against the error path.

At 10^10-URL scale the join fetch stays the benchmarkable default; the
HTTP fetcher is the deployment path when the engine IS the crawler. Both
produce the same schema, so every downstream stage (extraction, ranking,
seen-increment, link discovery) is fetcher-agnostic.
"""

from __future__ import annotations

import time
from typing import Callable, Iterator, Optional, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: transport contract: url -> (http_status, body_bytes_or_None,
#: page_timestamp_or_None). status >= 400 or body None => fetch failed.
Transport = Callable[[str], Tuple[int, Optional[bytes], Optional[object]]]

#: HTTP statuses worth retrying within a round (reference loader.py:30-54
#: retries any failure; we narrow to transient classes — a 404 will not
#: become a 200 five seconds later, but a 503/599 might).
_RETRYABLE = frozenset({429, 500, 502, 503, 504, 599})


def with_retries(
    transport: Transport,
    max_retries: int = 3,
    backoff_s: float = 5.0,
    sleep: Callable[[float], None] = time.sleep,
) -> Transport:
    """Wrap a transport with the reference's within-round retry ladder.

    ``loader.py:30-54`` attempts each URL up to 3 times with a linear
    ``5s * attempt`` backoff before giving up; this wrapper reproduces
    that contract for any transport. Non-retryable failures (4xx other
    than 429) return immediately. ``sleep`` is injectable so tests can
    assert the ladder without wall-clock waits.
    """

    def _fetch(url: str) -> Tuple[int, Optional[bytes], Optional[object]]:
        status, body, page_ts = transport(url)
        attempt = 1
        while (status >= 400 or body is None) and status in _RETRYABLE and attempt < max_retries:
            sleep(backoff_s * attempt)  # linear ladder, loader.py:52
            status, body, page_ts = transport(url)
            attempt += 1
        return status, body, page_ts

    return _fetch


def urllib_transport(timeout_s: float = 10.0, user_agent: str = "spark-crawler") -> Transport:
    """Real-network transport over the stdlib (no extra deps).

    Returns page_ts=None: a live fetch has no archival timestamp, so the
    fetch stage falls back to the URL's own ``discovery_ts`` as the parent
    timestamp for link discovery (keeps F12 determinism — no wall clock
    enters the data). Wrap with :func:`with_retries` for the reference's
    3-attempt linear-backoff ladder (loader.py:30-54).
    """
    import urllib.error
    import urllib.request

    def _fetch(url: str) -> Tuple[int, Optional[bytes], Optional[object]]:
        req = urllib.request.Request(url, headers={"User-Agent": user_agent})
        try:
            with urllib.request.urlopen(req, timeout=timeout_s) as resp:
                return resp.status, resp.read(), None
        except urllib.error.HTTPError as e:
            return e.code, None, None
        except Exception:
            return 599, None, None  # connect/timeout/DNS — nonstandard code

    return _fetch


def corpus_transport(corpus: dict) -> Transport:
    """Deterministic fake transport over an in-memory url -> (html,
    warc_ts) dict (built from the pages fixture). Mirrors the join fetch
    exactly: hit = 200 + archived bytes + archival ts, miss = 404."""

    def _fetch(url: str) -> Tuple[int, Optional[bytes], Optional[object]]:
        hit = corpus.get(url)
        if hit is None:
            return 404, None, None
        html, ts = hit
        return 200, html, ts

    return _fetch


def http_fetch(
    selected: DataFrame,
    transport: Transport,
    url_col: str = "url",
    host_col: str = "host",
    delay_col: str = "crawl_delay_s",
    ts_col: str = "discovery_ts",
    respect_delay: bool = False,
) -> DataFrame:
    """Fetch ``selected`` frontier rows through ``transport``.

    Output = input columns + ``_page_ts`` (transport page_ts, else the
    row's ``discovery_ts``) + ``html`` (binary|null) + ``fetch_ok`` —
    the exact schema of CrawlRun's join fetch, so the two are drop-in
    interchangeable.

    ``respect_delay=True`` sleeps ``delay_col`` seconds between successive
    requests to the SAME host (real-crawl politeness). CrawlRun leaves it
    False: its politeness scheduler already spaces requests via the
    assigned ``fetch_delay_s`` send schedule, and wall-clock sleeps would
    make tests minutes-long with no semantic difference.
    """
    from pyspark.sql.types import BinaryType, BooleanType, StructType, TimestampType

    for col in (url_col, host_col, ts_col):
        if col not in selected.columns:
            raise ValueError(f"http_fetch: input is missing required column {col!r}")

    # StructType.add mutates in place and PySpark caches df.schema, so build
    # the output schema on a fresh StructType — never on the caller's.
    out_schema = (
        StructType(list(selected.schema.fields))
        .add("_page_ts", TimestampType())
        .add("html", BinaryType())
        .add("fetch_ok", BooleanType())
    )

    def _fetch_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        last_hit: dict = {}  # host -> monotonic ts of its last request
        for pdf in batches:
            htmls, tss, oks = [], [], []
            for row in pdf.itertuples(index=False):
                url = getattr(row, url_col)
                if respect_delay:
                    host = getattr(row, host_col)
                    delay = float(getattr(row, delay_col, 0.0) or 0.0)
                    prev = last_hit.get(host)
                    now = time.monotonic()
                    if prev is not None and now - prev < delay:
                        time.sleep(delay - (now - prev))
                    last_hit[host] = time.monotonic()
                status, body, page_ts = transport(url)
                ok = status < 400 and body is not None
                htmls.append(bytes(body) if ok else None)
                tss.append(page_ts if page_ts is not None else getattr(row, ts_col))
                oks.append(ok)
            out = pdf.copy()
            out["_page_ts"] = pd.Series(tss, index=pdf.index, dtype="object")
            out["html"] = pd.Series(htmls, index=pdf.index, dtype="object")
            out["fetch_ok"] = oks
            yield out

    # one-shuffle host partitioning; within a partition keep the politeness
    # send order so same-host requests hit in schedule order
    order = [host_col]
    if "fetch_delay_s" in selected.columns:
        order.append("fetch_delay_s")
    order.append(url_col)
    arranged = selected.repartition(host_col).sortWithinPartitions(*order)
    return arranged.mapInPandas(_fetch_partition, out_schema)
