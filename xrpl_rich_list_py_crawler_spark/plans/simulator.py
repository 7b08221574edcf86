"""Single-process reference crawl simulator (no Spark).

A faithful pandas/pure-Python re-implementation of the round semantics in
:mod:`.rounds` — the same role the reference's single-host loop plays
(``loader.py:138-163`` merge → sort → rank → append). Used to produce the
crawl-order and seen-set goldens that the Spark engine must reproduce at any
parallelism (FIXTURES.md §6-7, north_rule "exact crawl ordering and final
URL-seen set").

Deliberately shares NO Spark code: hashing is the pure-Python XXH64 twin,
parsing the pure-Python parsers. Agreement between two independent
implementations is the correctness evidence.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime

import pandas as pd

from ..functions.hashing import spark_xxhash64_str
from ..functions.parsers_ref import canonicalize_url, extract_links, host_of


@dataclass(order=True)
class FrontierEntry:
    depth: int
    neg_host_rank: float
    discovery_ts: datetime
    url_hash: int
    url: str = field(compare=False)
    host: str = field(compare=False)
    host_rank: float = field(compare=False)


@dataclass
class RoundLog:
    round_n: int
    fetched_urls: list[str]          # rank order (attempted fetches)
    fetch_ok: list[bool]
    robots_denied: list[str]
    deferred: int
    new_frontier: int
    texts: dict[str, str]
    hosts: list[str] = field(default_factory=list)      # aligned w/ fetched_urls
    depths: list[int] = field(default_factory=list)
    n_links: list[int] = field(default_factory=list)


class ReferenceSimulator:
    def __init__(self, pages: pd.DataFrame, robots: pd.DataFrame):
        # corpus keyed by canonical-url hash
        self.page_by_hash: dict[int, tuple[datetime, bytes]] = {}
        for r in pages.itertuples(index=False):
            canon = canonicalize_url(r.url)
            h = spark_xxhash64_str(canon)
            self.page_by_hash[h] = (r.warc_ts.to_pydatetime(), bytes(r.html))
        self.robots: dict[str, tuple[list, float, int, float]] = {
            r.host: (
                list(r.disallow_prefixes),
                float(r.crawl_delay_s),
                int(r.max_fetches_per_round),
                float(r.host_rank),
            )
            for r in robots.itertuples(index=False)
        }
        self.seen: set[int] = set()
        self.seen_urls: set[str] = set()
        self.frontier: dict[int, FrontierEntry] = {}

    def bootstrap(self, seeds: pd.DataFrame) -> None:
        for r in seeds.itertuples(index=False):
            h = spark_xxhash64_str(r.url)
            self.frontier[h] = FrontierEntry(
                depth=int(r.depth),
                neg_host_rank=-float(r.host_rank),
                discovery_ts=r.discovery_ts.to_pydatetime(),
                url_hash=h,
                url=r.url,
                host=host_of(r.url),
                host_rank=float(r.host_rank),
            )

    def _robots_denied(self, e: FrontierEntry) -> bool:
        rules = self.robots.get(e.host)
        if rules is None:
            return False
        path = e.url.split("://", 1)[1]
        path = "/" + path.split("/", 1)[1] if "/" in path else "/"
        return any(path.startswith(p) for p in rules[0])

    def run_round(self, round_n: int) -> RoundLog:
        # 1. anti-join seen
        candidates = [e for e in self.frontier.values() if e.url_hash not in self.seen]
        # 2. robots gate
        denied = [e for e in candidates if self._robots_denied(e)]
        allowed = [e for e in candidates if not self._robots_denied(e)]
        # 3. per-host token bucket: priority (depth, discovery_ts, url_hash)
        by_host: dict[str, list[FrontierEntry]] = {}
        for e in allowed:
            by_host.setdefault(e.host, []).append(e)
        selected: list[FrontierEntry] = []
        deferred: list[FrontierEntry] = []
        for host, entries in by_host.items():
            entries.sort(key=lambda e: (e.depth, e.discovery_ts, e.url_hash))
            budget = self.robots.get(host, ([], 1.0, 16, 0.0))[2]
            selected.extend(entries[:budget])
            deferred.extend(entries[budget:])
        # 4. global rank order (depth, host_rank desc, discovery_ts, url_hash)
        selected.sort()
        # 5. fetch + parse
        fetched_urls, fetch_ok, texts = [], [], {}
        hosts, depths, n_links_l = [], [], []
        new_links: dict[int, FrontierEntry] = {}
        for e in selected:
            fetched_urls.append(e.url)
            hosts.append(e.host)
            depths.append(e.depth)
            page = self.page_by_hash.get(e.url_hash)
            fetch_ok.append(page is not None)
            self.seen.add(e.url_hash)
            self.seen_urls.add(e.url)
            if page is None:
                n_links_l.append(0)
                continue
            warc_ts, html = page
            from ..functions.parsers_ref import extract_text

            texts[e.url] = extract_text(html)
            page_links = extract_links(html)
            n_links_l.append(len(page_links))
            for raw in page_links:
                curl = canonicalize_url(raw)
                h = spark_xxhash64_str(curl)
                host = host_of(curl)
                hr = self.robots.get(host, ([], 1.0, 16, 0.0))[3]
                cand = FrontierEntry(
                    depth=e.depth + 1,
                    neg_host_rank=-hr,
                    discovery_ts=warc_ts,
                    url_hash=h,
                    url=curl,
                    host=host,
                    host_rank=hr,
                )
                prev = new_links.get(h)
                if prev is None:
                    new_links[h] = cand
                else:
                    # collapse to min(depth), min(discovery_ts) independently
                    prev.depth = min(prev.depth, cand.depth)
                    prev.discovery_ts = min(prev.discovery_ts, cand.discovery_ts)
        for e in denied:
            self.seen.add(e.url_hash)
            self.seen_urls.add(e.url)
        # 6. next frontier = deferred ∪ new links (min-collapse), minus seen
        nxt: dict[int, FrontierEntry] = {e.url_hash: e for e in deferred}
        for h, e in new_links.items():
            if h in nxt:
                nxt[h].depth = min(nxt[h].depth, e.depth)
                nxt[h].discovery_ts = min(nxt[h].discovery_ts, e.discovery_ts)
            else:
                nxt[h] = e
        self.frontier = {h: e for h, e in nxt.items() if h not in self.seen}
        return RoundLog(
            round_n=round_n,
            fetched_urls=fetched_urls,
            fetch_ok=fetch_ok,
            robots_denied=sorted(e.url for e in denied),
            deferred=len(deferred),
            new_frontier=len(self.frontier),
            texts=texts,
            hosts=hosts,
            depths=depths,
            n_links=n_links_l,
        )

    def run(self, n_rounds: int, seeds: pd.DataFrame) -> list[RoundLog]:
        self.bootstrap(seeds)
        logs = []
        for r in range(1, n_rounds + 1):
            if not self.frontier:
                break
            logs.append(self.run_round(r))
        return logs
