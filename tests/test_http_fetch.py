"""Live-HTTP fetch variant (sources/http_fetch.py).

No network exists in this sandbox, so equivalence is pinned through the
deterministic corpus transport: CrawlRun fetching through host-partitioned
mapInPandas must commit byte-identical results to the corpus-join fetch
(which the crawl-order goldens already pin). urllib_transport is
smoke-tested on its error path only.
"""

import json
import os

import pytest

from xrpl_rich_list_py_crawler_spark.functions.parsers_ref import canonicalize_url
from xrpl_rich_list_py_crawler_spark.plans.rounds import CrawlRun
from xrpl_rich_list_py_crawler_spark.sources.catalog import SnapshotCatalog
from xrpl_rich_list_py_crawler_spark.sources.http_fetch import (
    corpus_transport,
    http_fetch,
    urllib_transport,
    with_retries,
)

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens")


def _corpus_dict(crawl_dir):
    import pandas as pd

    pages = pd.read_parquet(os.path.join(crawl_dir, "pages.parquet"))
    # key by CANONICAL url: the join fetch matches on xxhash64(canon_url),
    # so the transport must resolve the same keys
    return {
        canonicalize_url(r.url): (bytes(r.html), r.warc_ts)
        for r in pages.itertuples(index=False)
    }


def test_crawl_via_http_transport_matches_goldens(spark, crawl_sf0001, tmp_path):
    """The mapInPandas fetcher is drop-in for the corpus join: same crawl
    order, same byte-identical text, same seen set."""
    robots = spark.read.parquet(os.path.join(crawl_sf0001, "robots.parquet"))
    seeds = spark.read.parquet(os.path.join(crawl_sf0001, "seeds.parquet"))
    pages = spark.read.parquet(os.path.join(crawl_sf0001, "pages.parquet"))
    cat = SnapshotCatalog(str(tmp_path))
    run = CrawlRun(
        spark, cat, pages, robots,
        transport=corpus_transport(_corpus_dict(crawl_sf0001)),
    )
    run.run(3, seeds)
    res = cat.read_appended(spark, "results")
    for rnd in (1, 2, 3):
        got = [
            r["url"]
            for r in res.filter(f"round = {rnd}").orderBy("rank").collect()
        ]
        gold = [
            json.loads(l)["url"]
            for l in open(os.path.join(GOLDENS, f"crawl_order_round{rnd}.jsonl"))
        ]
        assert got == gold, f"round {rnd} order diverged under http fetch"
    # text byte-equality against the corpus itself
    corpus = _corpus_dict(crawl_sf0001)
    from xrpl_rich_list_py_crawler_spark.functions.parsers_ref import extract_text

    for r in res.filter("round = 1 AND fetch_ok").collect():
        assert r["text"] == extract_text(corpus[r["url"]][0])


def test_http_fetch_schema_and_failures(spark):
    """Misses (404) and server errors (5xx) surface as fetch_ok=False with
    null html; page_ts falls back to the row's discovery_ts."""
    import datetime as dt

    rows = [
        ("https://a.example/ok", 1, "a.example", 0,
         dt.datetime(2026, 1, 1), 0.0),
        ("https://a.example/missing", 2, "a.example", 0,
         dt.datetime(2026, 1, 2), 1.0),
        ("https://b.example/error", 3, "b.example", 0,
         dt.datetime(2026, 1, 3), 0.0),
    ]
    df = spark.createDataFrame(
        rows,
        "url string, url_hash long, host string, depth int, "
        "discovery_ts timestamp, fetch_delay_s double",
    )

    def fake(url):
        if url.endswith("ok"):
            return 200, b"<html><p>hi</p></html>", None
        if url.endswith("missing"):
            return 404, None, None
        return 500, b"oops", None

    out = {r["url"]: r for r in http_fetch(df, fake).collect()}
    assert out["https://a.example/ok"]["fetch_ok"]
    assert bytes(out["https://a.example/ok"]["html"]) == b"<html><p>hi</p></html>"
    assert not out["https://a.example/missing"]["fetch_ok"]
    assert out["https://a.example/missing"]["html"] is None
    assert not out["https://b.example/error"]["fetch_ok"]
    # ts fallback: transport returned None -> row's own discovery_ts
    assert out["https://a.example/ok"]["_page_ts"] == dt.datetime(2026, 1, 1)


def test_urllib_transport_error_path():
    """No network here: a connection-refused fetch must return the
    nonstandard 599 failure code, never raise."""
    t = urllib_transport(timeout_s=1.0)
    status, body, ts = t("http://127.0.0.1:1/")
    assert status == 599 and body is None and ts is None


def test_http_fetch_does_not_mutate_input_schema(spark):
    """PySpark caches df.schema and StructType.add appends IN PLACE — the
    output schema must be built on a copy, or the caller's frame falsely
    grows _page_ts/html/fetch_ok columns (ADVICE r03)."""
    import datetime as dt

    df = spark.createDataFrame(
        [("https://a.example/x", "a.example", dt.datetime(2026, 1, 1))],
        "url string, host string, discovery_ts timestamp",
    )
    cols_before = list(df.columns)
    http_fetch(df, lambda url: (200, b"ok", None)).collect()
    assert list(df.columns) == cols_before
    assert [f.name for f in df.schema.fields] == cols_before


def test_http_fetch_custom_ts_col_and_missing_col_error(spark):
    """ts_col is parameterized (no hardcoded discovery_ts), and a missing
    required column fails fast with a clear error, not an executor-side
    AttributeError."""
    import datetime as dt

    df = spark.createDataFrame(
        [("https://a.example/x", "a.example", dt.datetime(2026, 2, 2))],
        "url string, host string, seen_at timestamp",
    )
    out = http_fetch(df, lambda url: (200, b"ok", None), ts_col="seen_at").collect()
    assert out[0]["_page_ts"] == dt.datetime(2026, 2, 2)
    with pytest.raises(ValueError, match="discovery_ts"):
        http_fetch(df, lambda url: (200, b"ok", None))


def test_with_retries_ladder():
    """≅ loader.py:30-54: up to 3 attempts, linear 5s·attempt backoff.
    Transient-then-success recovers; non-retryable 404 returns at once;
    a persistent failure stops after max_retries attempts."""
    calls, sleeps = [], []

    def flaky(url):
        calls.append(url)
        return (503, None, None) if len(calls) < 3 else (200, b"ok", None)

    t = with_retries(flaky, max_retries=3, backoff_s=5.0, sleep=sleeps.append)
    assert t("u") == (200, b"ok", None)
    assert len(calls) == 3
    assert sleeps == [5.0, 10.0]  # linear ladder: 5s*1, 5s*2

    calls.clear()
    t404 = with_retries(
        lambda u: (calls.append(u), (404, None, None))[1],
        max_retries=3, sleep=sleeps.append,
    )
    assert t404("u")[0] == 404 and len(calls) == 1  # no retry on hard 404

    calls.clear()
    tdead = with_retries(
        lambda u: (calls.append(u), (599, None, None))[1],
        max_retries=3, sleep=lambda s: None,
    )
    assert tdead("u")[0] == 599 and len(calls) == 3  # gives up after ladder
