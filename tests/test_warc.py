"""WARC source/sink: ISO 28500 framing, gzip members, Spark dataflow."""

import gzip
import os

from xrpl_rich_list_py_crawler_spark.sources.warc import (
    build_warc,
    iter_warc_records,
    parse_warc_df,
    read_warc,
    to_warc_files,
)

RECS = [
    {"url": "https://a.com/1", "date": "2024-01-01T00:00:00Z",
     "status": 200, "mime": "text/html",
     "payload": "hello\r\nwörld ünïcode".encode(), "request": True},
    {"url": "https://a.com/2", "date": "2024-01-01T00:00:01Z",
     "status": 404, "mime": "text/plain", "payload": b""},
    {"url": "https://b.com/3", "date": "2024-01-02T00:00:00Z",
     "status": 301, "mime": "application/json",
     "payload": b'{"k": "v\r\n\r\nstill payload"}'},
]


def test_roundtrip_plain():
    buf = build_warc(RECS, warcinfo="software: test")
    out = list(iter_warc_records(buf, "f"))
    # warcinfo + 1 request + 3 responses
    assert [r["warc_type"] for r in out] == [
        "warcinfo", "request", "response", "response", "response"]
    resp = [r for r in out if r["warc_type"] == "response"]
    for want, got in zip(RECS, resp):
        assert got["url"] == want["url"]
        assert got["http_status"] == want["status"]
        assert got["mime"] == want["mime"]
        assert got["payload"] == want["payload"]
        assert got["warc_date"] == want["date"]


def test_roundtrip_gzip_members():
    """Concatenated per-record gzip members (the Common Crawl layout)."""
    buf = build_warc(RECS)
    # split at arbitrary boundaries — members need not align to records
    gz = b"".join(
        gzip.compress(buf[i:i + 97]) for i in range(0, len(buf), 97)
    )
    assert [r["url"] for r in iter_warc_records(gz)] == [
        r["url"] for r in iter_warc_records(buf)]


def test_truncated_tail_yields_prefix():
    buf = build_warc(RECS)
    out = list(iter_warc_records(buf[:-10]))
    full = list(iter_warc_records(buf))
    assert len(out) == len(full) - 1
    assert [r["url"] for r in out] == [r["url"] for r in full[:-1]]


def test_payload_with_embedded_separators():
    """A payload containing CRLFCRLF must not break framing (the walk is
    Content-Length-driven, never delimiter-driven)."""
    tricky = b"WARC/1.0\r\n\r\nHTTP/1.1 200 OK\r\n\r\nfake"
    buf = build_warc([{**RECS[1], "payload": tricky}])
    (rec,) = iter_warc_records(buf)
    assert rec["payload"] == tricky


def test_read_warc_files(spark, tmp_path):
    d = str(tmp_path / "warcs")
    os.makedirs(d)
    with open(os.path.join(d, "a.warc"), "wb") as f:
        f.write(build_warc(RECS[:2], warcinfo="x: 1"))
    with open(os.path.join(d, "b.warc.gz"), "wb") as f:
        f.write(gzip.compress(build_warc(RECS[2:])))
    got = read_warc(spark, d).orderBy("url").collect()
    assert [r.url for r in got] == [
        "https://a.com/1", "https://a.com/2", "https://b.com/3"]
    assert [r.http_status for r in got] == [200, 404, 301]
    assert bytes(got[0].payload).decode() == "hello\r\nwörld ünïcode"
    non_resp = read_warc(spark, d, response_only=False)
    assert non_resp.count() == 5


def test_to_warc_files_roundtrip_df(spark):
    rows = [
        ("w0.warc", r["url"], r["date"], r["status"], r["mime"],
         r["payload"])
        for r in RECS
    ]
    df = spark.createDataFrame(
        rows,
        "warc_file string, url string, warc_date string, "
        "http_status int, mime string, payload binary",
    )
    files = to_warc_files(df, emit_requests=True)
    back = parse_warc_df(
        files, file_col="warc_file", content_col="content"
    ).orderBy("url")
    got = back.collect()
    assert [r.url for r in got] == sorted(r["url"] for r in RECS)
    assert all(r.warc_type == "response" for r in got)
    by_url = {r["url"]: r for r in RECS}
    for r in got:
        assert bytes(r.payload) == by_url[r.url]["payload"]


def test_parse_plan_has_no_exchange(spark, tmp_path):
    """Source parse is scan → mapInPandas: file-per-task, no shuffle."""
    import contextlib
    import io

    d = str(tmp_path / "w2")
    os.makedirs(d)
    with open(os.path.join(d, "a.warc"), "wb") as f:
        f.write(build_warc(RECS))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        read_warc(spark, d).explain(mode="formatted")
    assert "Exchange" not in buf.getvalue()


def test_warc_ingest_stream_exactly_once(spark, tmp_path):
    """availableNow micro-batches parse each landed WARC file exactly
    once: a second trigger with the same checkpoint emits only the newly
    landed file's records."""
    from xrpl_rich_list_py_crawler_spark.streaming.jobs import (
        warc_ingest_stream,
    )

    wdir = str(tmp_path / "landing")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(wdir)
    with open(os.path.join(wdir, "a.warc"), "wb") as f:
        f.write(build_warc(RECS[:2], warcinfo="x: 1"))

    q = warc_ingest_stream(spark, wdir, out, ckpt)
    q.awaitTermination(120)
    first = spark.read.parquet(out)
    assert {r.url for r in first.collect()} == {
        "https://a.com/1", "https://a.com/2"}

    with open(os.path.join(wdir, "b.warc.gz"), "wb") as f:
        f.write(gzip.compress(build_warc(RECS[2:])))
    q2 = warc_ingest_stream(spark, wdir, out, ckpt)
    q2.awaitTermination(120)
    allrecs = spark.read.parquet(out).collect()
    assert len(allrecs) == 3                       # no re-emission of a.warc
    assert {r.url for r in allrecs} == {r["url"] for r in RECS}


def test_warc_to_wet_pipeline(spark):
    """The CC WARC→WET product: response HTML → JVM text extraction →
    conversion-record WET files; text-less captures dropped; the WET
    buffer re-parses and its payloads equal the direct extraction."""
    from pyspark.sql import functions as F

    from xrpl_rich_list_py_crawler_spark.functions.udfs import (
        extract_text_col,
    )
    from xrpl_rich_list_py_crawler_spark.sources.warc import warc_to_wet

    html = (
        "<html><head><title>T</title></head>"
        "<body><p>one para</p><p>two ünïcode</p></body></html>"
    ).encode()
    recs = [
        {"url": "https://a.com/h", "date": "2024-01-01T00:00:00Z",
         "status": 200, "mime": "text/html", "payload": html},
        {"url": "https://a.com/empty", "date": "2024-01-01T00:00:01Z",
         "status": 200, "mime": "text/html", "payload": b"<html></html>"},
    ]
    rows = [
        ("f.warc.gz", r["url"], r["date"], r["status"], r["mime"],
         r["payload"])
        for r in recs
    ]
    df = spark.createDataFrame(
        rows,
        "warc_file string, url string, warc_date string, "
        "http_status int, mime string, payload binary",
    )
    files = to_warc_files(df)
    wet = warc_to_wet(
        parse_warc_df(files, file_col="warc_file", content_col="content")
    ).collect()
    assert [r.warc_file for r in wet] == ["f.wet"]
    parsed = list(iter_warc_records(bytes(wet[0].content), "f.wet"))
    conv = [r for r in parsed if r["warc_type"] == "conversion"]
    assert [r["url"] for r in conv] == ["https://a.com/h"]  # empty dropped
    assert conv[0]["mime"] == "text/plain"
    expected = (
        df.filter("url = 'https://a.com/h'")
        .select(extract_text_col(F.col("payload")).alias("t"))
        .collect()[0].t
    )
    assert conv[0]["payload"].decode() == expected


# ---------------------------------------------------------------------------
# WebDataset tar shards
# ---------------------------------------------------------------------------


def _members(spark, rows):
    return spark.createDataFrame(
        [(s, k, m, bytearray(p)) for s, k, m, p in rows],
        "shard string, key string, member string, payload binary",
    )


def test_tar_shards_bytes_deterministic_and_wellformed(spark):
    import io
    import tarfile

    from xrpl_rich_list_py_crawler_spark.sources.webdataset import (
        to_tar_shards,
    )

    rows = [
        ("s0.tar", f"d{i}", f"d{i}.{ext}", f"p{i}{ext}".encode())
        for i in range(6)
        for ext in ("txt", "json")
    ]
    df = _members(spark, rows)
    a = {r.shard: bytes(r.content) for r in to_tar_shards(df.repartition(1)).collect()}
    b = {
        r.shard: bytes(r.content)
        for r in to_tar_shards(df.repartition(7, "member")).collect()
    }
    assert a == b  # byte-identical at any partitioning
    tf = tarfile.open(fileobj=io.BytesIO(a["s0.tar"]))
    names = [m.name for m in tf.getmembers()]
    assert names == sorted(names)  # (key, member) total order
    info = tf.getmembers()[0]
    assert (info.mtime, info.uid, info.gid, info.mode) == (0, 0, 0, 0o644)
    assert info.uname == "" and info.gname == ""


def test_tar_shards_roundtrip_via_disk(spark, tmp_path):
    import os

    from xrpl_rich_list_py_crawler_spark.sources.webdataset import (
        read_tar_shards, to_tar_shards,
    )

    rows = [
        ("s0.tar", "a", "a.txt", b"hello"),
        ("s0.tar", "a", "a.json", b'{"k": 1}'),
        ("s1.tar", "b.long", "b.long.seg.json", b"[]"),  # first-dot key
        ("s1.tar", "c", "c.txt", b""),  # empty payload survives
    ]
    for r in to_tar_shards(_members(spark, rows)).collect():
        with open(os.path.join(tmp_path, r.shard), "wb") as f:
            f.write(bytes(r.content))
    got = {
        (r.shard, r.member): (r.key, bytes(r.payload))
        for r in read_tar_shards(spark, str(tmp_path)).collect()
    }
    assert got[("s0.tar", "a.txt")] == ("a", b"hello")
    assert got[("s1.tar", "b.long.seg.json")] == ("b", b"[]")
    assert got[("s1.tar", "c.txt")] == ("c", b"")
    assert len(got) == 4


def test_tar_parse_strict_and_lenient(spark):
    import pytest as _pytest

    from xrpl_rich_list_py_crawler_spark.sources.webdataset import (
        parse_tar_df, to_tar_shards,
    )

    good = to_tar_shards(
        _members(spark, [("g.tar", "x", "x.txt", b"ok")])
    ).select("shard", "content")
    junk = spark.createDataFrame(
        [("junk.tar", bytearray(b"not a tar at all" * 40))],
        "shard string, content binary",
    )
    both = good.unionByName(junk)
    lenient = parse_tar_df(both, strict=False).collect()
    assert [(r.shard, r.member) for r in lenient] == [("g.tar", "x.txt")]
    with _pytest.raises(Exception):
        parse_tar_df(both, strict=True).collect()
