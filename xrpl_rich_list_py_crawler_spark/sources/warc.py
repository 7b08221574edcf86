"""WARC source/sink: the container format web-scale text actually ships in.

Common Crawl — the canonical 100 TB webtext input — publishes each crawl
as ~90k WARC files of ~1 GB (gzip, one member per record). The reference
engine never needs this (it scrapes a closed site list live), but a user
pointing this engine at real web data starts from WARC, so the engine
treats it as a first-class source: a pure-Python record parser (ISO
28500 framing: ``WARC/1.0`` + headers + ``Content-Length`` block +
``\\r\\n\\r\\n``) fanned out with ``mapInPandas`` over a ``binaryFile``
scan, and a matching builder for the sink/round-trip direction.

Scale shape: gzip members are not splittable, so the unit of parallelism
is the FILE — exactly how every public WARC pipeline (Common Crawl's own
examples, Sparkling/Archives Unleashed) schedules it. 90k files ≫ any
executor count, and ``binaryFile`` keeps one file per task; record
parsing is a single linear pass per file with no shuffle anywhere.
Payload bytes stay opaque ``binary`` (the multimodal-column contract)
until a downstream operator decodes them.
"""

from __future__ import annotations

import gzip
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: parsed-record schema (one row per WARC record)
WARC_SCHEMA = (
    "warc_file string, rec_offset long, warc_type string, url string, "
    "warc_date string, http_status int, mime string, payload binary"
)

_CRLF = b"\r\n"
_SEP = b"\r\n\r\n"


def build_warc(records: list[dict], warcinfo: str | None = None) -> bytes:
    """Serialize records into one WARC buffer (the sink direction).

    Each record dict: ``url``, ``date`` (ISO-8601 ``...Z``), ``status``,
    ``mime``, ``payload`` (bytes), optional ``request`` (bool) to also
    emit the paired ``request`` record crawlers write before each
    response. Deterministic byte-for-byte: fixed header order, CRLF
    framing per ISO 28500.
    """
    out = bytearray()

    def _record(wtype: str, headers: list[tuple[str, str]], block: bytes):
        head = b"WARC/1.0\r\n"
        head += b"WARC-Type: " + wtype.encode() + _CRLF
        for k, v in headers:
            head += k.encode() + b": " + v.encode() + _CRLF
        head += b"Content-Length: " + str(len(block)).encode() + _CRLF
        out.extend(head + _CRLF + block + _SEP)

    if warcinfo is not None:
        block = warcinfo.encode("utf-8")
        _record(
            "warcinfo",
            [("Content-Type", "application/warc-fields")],
            block,
        )
    for r in records:
        if r.get("request"):
            req = (
                b"GET / HTTP/1.1\r\nHost: x\r\nUser-Agent: engine\r\n\r\n"
            )
            _record(
                "request",
                [
                    ("WARC-Target-URI", r["url"]),
                    ("WARC-Date", r["date"]),
                    ("Content-Type", "application/http; msgtype=request"),
                ],
                req,
            )
        payload = r["payload"]
        http = (
            b"HTTP/1.1 "
            + str(int(r["status"])).encode()
            + b" OK\r\nContent-Type: "
            + r["mime"].encode()
            + b"\r\nContent-Length: "
            + str(len(payload)).encode()
            + _SEP
            + payload
        )
        _record(
            "response",
            [
                ("WARC-Target-URI", r["url"]),
                ("WARC-Date", r["date"]),
                ("Content-Type", "application/http; msgtype=response"),
            ],
            http,
        )
    return bytes(out)


def _headers(raw: bytes) -> dict[str, str]:
    """Parse a CRLF header block into a lower-cased dict (first wins)."""
    h: dict[str, str] = {}
    for line in raw.split(_CRLF):
        if b":" in line:
            k, _, v = line.partition(b":")
            key = k.strip().lower().decode("latin-1")
            if key not in h:
                h[key] = v.strip().decode("latin-1")
    return h


def iter_warc_records(
    data: bytes, warc_file: str = ""
) -> Iterator[dict]:
    """Linear single-pass parse of one WARC buffer (gzip or plain).

    Yields one dict per record (all WARC-Types — callers filter).
    Response records get ``http_status``/``mime``/``payload`` from the
    embedded HTTP message; other types carry the raw block as payload.
    Framing errors stop the scan at the last well-formed record rather
    than raising mid-task (a truncated tail file yields its good
    prefix — the Common Crawl reality).
    """
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)  # handles concatenated members
    pos = 0
    n = len(data)
    while pos < n:
        if not data.startswith(b"WARC/", pos):
            break
        head_end = data.find(_SEP, pos)
        if head_end < 0:
            break
        h = _headers(data[pos:head_end])
        try:
            clen = int(h.get("content-length", ""))
        except ValueError:
            break
        block_start = head_end + len(_SEP)
        block_end = block_start + clen
        if block_end + len(_SEP) > n:
            break
        block = data[block_start:block_end]
        wtype = h.get("warc-type", "")
        rec = {
            "warc_file": warc_file,
            "rec_offset": pos,
            "warc_type": wtype,
            "url": h.get("warc-target-uri"),
            "warc_date": h.get("warc-date"),
            "http_status": None,
            "mime": h.get("content-type"),
            "payload": block,
        }
        if wtype == "response" and block[:5] == b"HTTP/":
            he = block.find(_SEP)
            if he >= 0:
                status_line = block[: block.find(_CRLF)]
                parts = status_line.split(b" ")
                try:
                    rec["http_status"] = int(parts[1])
                except (IndexError, ValueError):
                    rec["http_status"] = None
                hh = _headers(block[:he])
                rec["mime"] = hh.get("content-type")
                rec["payload"] = block[he + len(_SEP):]
        yield rec
        pos = block_end + len(_SEP)


def parse_warc_df(
    files: DataFrame,
    file_col: str = "path",
    content_col: str = "content",
    response_only: bool = True,
) -> DataFrame:
    """Parse a (file, bytes) DataFrame into WARC records.

    ``files`` is any frame with a name column and a binary content
    column — ``spark.read.format("binaryFile")`` output, or an
    engine-built frame (the oracle fixture path). One ``mapInPandas``
    pass, no shuffle: the plan is scan → project → Python batch →
    project, and the blob never crosses an Exchange.
    """

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for fname, blob in zip(pdf[file_col], pdf[content_col]):
                for rec in iter_warc_records(bytes(blob), str(fname)):
                    if response_only and rec["warc_type"] != "response":
                        continue
                    rows.append(rec)
            yield pd.DataFrame(
                rows,
                columns=[
                    "warc_file", "rec_offset", "warc_type", "url",
                    "warc_date", "http_status", "mime", "payload",
                ],
            )

    return files.select(file_col, content_col).mapInPandas(
        _run, schema=WARC_SCHEMA
    )


def read_warc(
    spark: SparkSession, path: str, response_only: bool = True
) -> DataFrame:
    """WARC source: directory/glob of ``.warc`` / ``.warc.gz`` files →
    one row per record. File-per-task parallelism (see module note)."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc*")
        .load(path)
    )
    return parse_warc_df(
        files, file_col="path", content_col="content",
        response_only=response_only,
    )


def to_warc_files(
    df: DataFrame,
    group_col: str = "warc_file",
    warcinfo: str | None = "engine: xrpl_rich_list_py_crawler_spark",
    emit_requests: bool = False,
) -> DataFrame:
    """WARC sink direction: fold response rows (url, warc_date,
    http_status, mime, payload) into one serialized WARC buffer per
    ``group_col`` value — (file, bytes) rows the caller writes out (or
    feeds back through :func:`parse_warc_df`; the round trip is
    byte-stable). One shuffle on the file key; record order inside a
    file is (url, rec id) sorted for determinism."""

    def _fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["url", "rec_offset"]) if (
            "rec_offset" in pdf.columns
        ) else pdf.sort_values(["url"])
        recs = [
            {
                "url": r.url,
                "date": r.warc_date,
                "status": int(r.http_status),
                "mime": r.mime,
                "payload": bytes(r.payload),
                "request": emit_requests,
            }
            for r in pdf.itertuples()
        ]
        name = pdf[group_col].iloc[0]
        return pd.DataFrame(
            {"warc_file": [name],
             "content": [build_warc(recs, warcinfo=warcinfo)]}
        )

    return df.groupBy(group_col).applyInPandas(
        _fold, schema="warc_file string, content binary"
    )


def to_wet_files(
    df: DataFrame,
    group_col: str = "warc_file",
    warcinfo: str | None = "format: WET",
) -> DataFrame:
    """WET sink: fold (url, warc_date, payload=extracted-text) rows into
    ``conversion``-record WARC buffers — the WARC→WET product Common
    Crawl publishes next to every crawl. Same shuffle shape as
    :func:`to_warc_files` (one key-partitioned fold), plain-payload
    framing (``Content-Type: text/plain``, no embedded HTTP message)."""

    def _fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["url"])
        out = bytearray()
        if warcinfo is not None:
            out.extend(build_warc([], warcinfo=warcinfo))
        for r in pdf.itertuples():
            block = bytes(r.payload)
            head = (
                b"WARC/1.0\r\nWARC-Type: conversion\r\n"
                b"WARC-Target-URI: " + str(r.url).encode() + _CRLF
                + b"WARC-Date: " + str(r.warc_date).encode() + _CRLF
                + b"Content-Type: text/plain\r\n"
                + b"Content-Length: " + str(len(block)).encode() + _CRLF
            )
            out.extend(head + _CRLF + block + _SEP)
        name = pdf[group_col].iloc[0]
        return pd.DataFrame(
            {"warc_file": [name], "content": [bytes(out)]}
        )

    return df.groupBy(group_col).applyInPandas(
        _fold, schema="warc_file string, content binary"
    )


def warc_to_wet(records: DataFrame) -> DataFrame:
    """The Common Crawl WARC→WET pipeline as one engine pass: response
    records (from :func:`parse_warc_df`/:func:`read_warc`) → JVM text
    extraction (``extract_text_col`` — zero Python on the hot path) →
    ``conversion``-record WET files named after their source WARC
    (``.warc``→``.wet``). Rows with empty extracted text are dropped,
    matching the published WET behavior of skipping text-less captures.
    """
    from ..functions.udfs import extract_text_col

    wet_rows = (
        records.filter(F.col("warc_type") == "response")
        .withColumn("_text", extract_text_col(F.col("payload")))
        .filter(F.col("_text") != "")
        .select(
            F.regexp_replace(
                F.col("warc_file"), r"\.warc(\.gz)?$", ".wet"
            ).alias("warc_file"),
            "url",
            "warc_date",
            F.col("_text").cast("binary").alias("payload"),
        )
    )
    return to_wet_files(wet_rows)
