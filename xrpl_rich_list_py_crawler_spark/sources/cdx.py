"""CDXJ index source/sink: Common Crawl's WARC lookup index.

Every Common Crawl release ships, alongside the WARC files, a CDXJ index
(~300 gz shards/crawl): one text line per capture —

    ``<SURT key> <14-digit ts> <JSON: url mime status digest length
    offset filename>``

— which is how real pipelines decide WHAT to read before touching a
single WARC byte (filter by mime/status/url-pattern in the index, then
range-read only the matching records). The engine parses it fully
JVM-side: ``spark.read.text`` → a 2-split projection → ``from_json``;
no Python anywhere, so the index scan runs at whole-stage-codegen speed
and predicate pushdown applies to the line scan. The sink direction
(``to_cdx_lines``) is the exact inverse (``to_json`` over a fixed-order
struct), so index construction for engine-written WARC is the same
scan-speed pass.

SURT (Sort-friendly URI Reordering Transform) keys are the index's sort
order — :func:`surt_col` implements the canonical transform (lowercase,
scheme dropped, host comma-reversed, ``)`` + path) as pure Column ops.
Simplifications vs pywb's canonicalizer are documented on the function.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: JSON blob schema of one CDXJ capture line
CDX_JSON_SCHEMA = (
    "url string, mime string, status string, digest string, "
    "length string, offset string, filename string"
)


def surt_col(url: Column) -> Column:
    """SURT key for a URL as pure Column ops: lowercase, scheme and
    fragment dropped, host components reversed and comma-joined, ``)``
    then path+query — e.g. ``https://Sub.Example.org/A/b?q=1`` →
    ``org,example,sub)/a/b?q=1``.

    Documented simplifications vs pywb: no ``www.``-stripping, no query
    param sorting, no port handling — deterministic and invertible for
    engine-written indexes; swap in a stricter canonicalizer before the
    SURT step when matching third-party indexes byte-for-byte.
    """
    u = F.lower(url)
    rest = F.regexp_replace(u, r"^[a-z][a-z0-9+.\-]*://", "")
    rest = F.regexp_replace(rest, r"#.*$", "")
    host = F.regexp_extract(rest, r"^([^/]*)", 1)
    path = F.regexp_replace(rest, r"^[^/]*", "")
    path = F.when(path == "", "/").otherwise(path)
    rev_host = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    return F.concat(rev_host, F.lit(")"), path)


def parse_cdx_lines(
    lines: DataFrame, value_col: str = "value"
) -> DataFrame:
    """(line string) → typed capture rows. One codegen projection:
    split off the two space-delimited header fields (SURT keys never
    contain spaces; the JSON blob may), ``from_json`` the rest.
    Malformed JSON → null fields, never a task failure."""
    v = F.col(value_col)
    parts = F.split(v, " ", 3)
    # F.get, not element_at: under ANSI mode element_at raises
    # INVALID_ARRAY_INDEX on malformed (short) lines; get returns null
    j = F.from_json(F.get(parts, 2), CDX_JSON_SCHEMA)
    return lines.select(
        F.get(parts, 0).alias("surt"),
        F.try_to_timestamp(
            F.get(parts, 1), F.lit("yyyyMMddHHmmss")
        ).alias("capture_ts"),
        j.url.alias("url"),
        j.mime.alias("mime"),
        j.status.cast("int").alias("http_status"),
        j.digest.alias("digest"),
        j.length.cast("bigint").alias("length"),
        j.offset.cast("bigint").alias("offset"),
        j.filename.alias("warc_filename"),
    )


def read_cdx(spark: SparkSession, path: str) -> DataFrame:
    """CDXJ source: text/gz shards → capture rows. Text-source
    parallelism (gz shard per task; plain shards split by line blocks);
    ~300 shards/crawl ≫ executor count."""
    return parse_cdx_lines(spark.read.text(path))


def to_cdx_lines(df: DataFrame) -> DataFrame:
    """Sink direction: capture rows → CDXJ lines (single ``value``
    column, ready for ``df.write.text``). Exact inverse of
    :func:`parse_cdx_lines`: fixed JSON field order, 14-digit ts,
    SURT derived from the url when absent. Fully JVM."""
    surt = (
        F.col("surt") if "surt" in df.columns else surt_col(F.col("url"))
    )
    blob = F.to_json(
        F.struct(
            F.col("url"),
            F.col("mime"),
            F.col("http_status").cast("string").alias("status"),
            F.col("digest"),
            F.col("length").cast("string").alias("length"),
            F.col("offset").cast("string").alias("offset"),
            F.col("warc_filename").alias("filename"),
        )
    )
    return df.select(
        F.concat_ws(
            " ",
            surt,
            F.date_format("capture_ts", "yyyyMMddHHmmss"),
            blob,
        ).alias("value")
    )
