"""CDXJ index source/sink: SURT transform, line framing, JVM-only plan."""

import contextlib
import gzip
import io
import os

from pyspark.sql import functions as F

from xrpl_rich_list_py_crawler_spark.sources.cdx import (
    parse_cdx_lines,
    read_cdx,
    surt_col,
    to_cdx_lines,
)

LINES = [
    'org,example)/ 20240101000000 {"url": "https://example.org/", '
    '"mime": "text/html", "status": "200", "digest": "AAA", '
    '"length": "120", "offset": "0", "filename": "a.warc.gz"}',
    # JSON blob containing spaces — the 2-split must not break it
    'org,example)/p 20240101000001 {"url": "https://example.org/p", '
    '"mime": "text/html; charset=utf-8", "status": "301", '
    '"digest": "BBB", "length": "5", "offset": "120", '
    '"filename": "a.warc.gz"}',
]


def test_surt_transform(spark):
    cases = {
        "https://Sub.Example.org/A/b?q=1": "org,example,sub)/a/b?q=1",
        "http://example.org": "org,example)/",
        "https://example.org/x#frag": "org,example)/x",
        "example.org/no-scheme": "org,example)/no-scheme",
    }
    df = spark.createDataFrame([(u,) for u in cases], "url string")
    got = {
        r.url: r.surt
        for r in df.select("url", surt_col(F.col("url")).alias("surt"))
        .collect()
    }
    assert got == cases


def test_parse_and_roundtrip(spark):
    df = spark.createDataFrame([(line,) for line in LINES], "value string")
    parsed = parse_cdx_lines(df).orderBy("capture_ts")
    rows = parsed.collect()
    assert rows[0].surt == "org,example)/"
    assert rows[0].http_status == 200 and rows[0].length == 120
    assert rows[1].mime == "text/html; charset=utf-8"
    assert rows[1].offset == 120
    # parse -> serialize -> parse is a fixed point
    again = parse_cdx_lines(to_cdx_lines(parsed)).orderBy("capture_ts")
    assert again.collect() == rows


def test_malformed_lines_yield_nulls_not_failures(spark):
    bad = ["not-a-cdx-line", "key 20240101000000 {broken json"]
    df = spark.createDataFrame([(line,) for line in bad], "value string")
    rows = parse_cdx_lines(df).collect()
    assert len(rows) == 2
    assert all(r.url is None for r in rows)


def test_read_cdx_gz_shard(spark, tmp_path):
    d = str(tmp_path / "cdx")
    os.makedirs(d)
    with open(os.path.join(d, "cdx-00000.gz"), "wb") as f:
        f.write(gzip.compress(("\n".join(LINES) + "\n").encode()))
    got = read_cdx(spark, d).orderBy("capture_ts").collect()
    assert [r.http_status for r in got] == [200, 301]


def test_cdx_paths_are_pure_jvm(spark):
    """Both directions stay in codegen: no Python eval, no shuffle."""
    df = spark.createDataFrame([(line,) for line in LINES], "value string")
    for frame in (parse_cdx_lines(df), to_cdx_lines(parse_cdx_lines(df))):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            frame.explain(mode="formatted")
        plan = buf.getvalue()
        assert "Exchange" not in plan
        assert "EvalPython" not in plan


def test_garbage_timestamp_token_is_null_not_error(spark):
    df = spark.createDataFrame(
        [("key NOTATIME {\"url\": \"https://x.org/\"}",)], "value string"
    )
    (row,) = parse_cdx_lines(df).collect()
    assert row.capture_ts is None and row.url == "https://x.org/"
