"""Sitemap ingestion: raw sitemap.xml bodies → crawl seed rows.

The discovery-source counterpart of the robots.txt cache builder
(operators/politeness.py:parse_robots_txt): a crawl bootstraps its
frontier from seed lists, and on the real web those come from sitemaps.
The reference bootstraps from a hardcoded URL list (``loader.py:16-24``);
this operator generalizes that into parsing the de-facto sitemap protocol
(<urlset><url><loc>/<lastmod>) plus sitemap INDEX files
(<sitemapindex><sitemap><loc>) — entirely JVM-side: block extraction via
``regexp_extract_all`` with inline ``(?s)`` + lazy quantifiers (both
supported by Java regex and RE2, so the DuckDB oracle parses identical
bytes), per-block field extraction inside ``transform`` lambdas.

Scale shape: one codegen pass over a (host, xml) table, one explode —
no shuffle at all until the caller unions seeds into the frontier.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: RE2/Java-portable block + field grammar. ``(?s)`` makes ``.`` span
#: newlines; ``.*?`` is lazy so adjacent blocks never merge; fields use
#: ``[^<]*`` so a missing close-tag cannot overrun into the next entry.
SITEMAP_URL_BLOCK = r"(?s)<url>(.*?)</url>"
SITEMAP_CHILD_BLOCK = r"(?s)<sitemap>(.*?)</sitemap>"
SITEMAP_LOC = r"<loc>[ \t\r\n]*([^< \t\r\n]*)[ \t\r\n]*</loc>"
SITEMAP_LASTMOD = r"<lastmod>[ \t\r\n]*([^< \t\r\n]*)[ \t\r\n]*</lastmod>"


def _blocks(xml: Column, pattern: str) -> Column:
    return F.regexp_extract_all(xml, F.lit(pattern), 1)


def parse_sitemap(
    raw: DataFrame,
    xml_col: str = "sitemap_xml",
    host_col: str = "host",
) -> DataFrame:
    """Explode sitemap bodies into one row per ``<url>`` entry.

    Output: (host, url, lastmod_ts timestamp|null, n_children int) —
    ``n_children`` is the count of nested ``<sitemap>`` index entries in
    the same document (an index file typically has n_children > 0 and no
    ``<url>`` entries; those child sitemap urls are surfaced by
    :func:`child_sitemaps` for the caller's fetch-next loop). Entries
    with an empty ``<loc>`` are dropped; ``lastmod`` parses RFC-3339
    date / datetime prefixes via ``try_to_timestamp`` (malformed → null,
    never a failed job — ANSI-safe).
    """
    xml = F.col(xml_col)
    entries = F.transform(
        _blocks(xml, SITEMAP_URL_BLOCK),
        lambda b: F.struct(
            F.regexp_extract(b, SITEMAP_LOC, 1).alias("url"),
            F.regexp_extract(b, SITEMAP_LASTMOD, 1).alias("lastmod_raw"),
        ),
    )
    n_children = F.size(_blocks(xml, SITEMAP_CHILD_BLOCK)).alias("n_children")
    exploded = raw.select(
        F.col(host_col).alias("host"), n_children, F.explode(entries).alias("e")
    )
    return (
        exploded.filter(F.col("e.url") != "")
        .select(
            "host",
            F.col("e.url").alias("url"),
            F.when(
                # the empty-lastmod guard matters: Spark's
                # try_to_timestamp(' 00:00:00') resolves a bare time
                # against TODAY — a wall-clock leak (F12 determinism ban)
                # and a divergence from DuckDB's NULL
                F.col("e.lastmod_raw") == "", F.lit(None).cast("timestamp")
            )
            .otherwise(
                F.try_to_timestamp(
                    # lastmod may be a bare date or a full datetime;
                    # normalize the 'T' separator and truncate the zone
                    # suffix so one format covers both ('2026-01-02'
                    # pads midnight)
                    F.substring(
                        F.concat(
                            F.replace(
                                F.col("e.lastmod_raw"), F.lit("T"), F.lit(" ")
                            ),
                            F.lit(" 00:00:00"),
                        ),
                        1,
                        19,
                    )
                )
            )
            .alias("lastmod_ts"),
            "n_children",
        )
    )


def child_sitemaps(
    raw: DataFrame, xml_col: str = "sitemap_xml", host_col: str = "host"
) -> DataFrame:
    """Nested sitemap urls from index files: (host, sitemap_url) — the
    fetch-next frontier of the sitemap crawl itself."""
    xml = F.col(xml_col)
    locs = F.transform(
        _blocks(xml, SITEMAP_CHILD_BLOCK),
        lambda b: F.regexp_extract(b, SITEMAP_LOC, 1),
    )
    return (
        raw.select(F.col(host_col).alias("host"), F.explode(locs).alias("sitemap_url"))
        .filter(F.col("sitemap_url") != "")
    )


def sitemap_seeds(
    parsed: DataFrame,
    robots: DataFrame | None = None,
    default_ts: str = "2026-01-01 00:00:00",
) -> DataFrame:
    """Shape parse_sitemap output into the seed schema
    ``seeds_to_frontier`` consumes: (url, depth=0, host_rank,
    discovery_ts). ``lastmod`` becomes the discovery timestamp (data-
    derived recency priority — F12: no wall clock), missing lastmod gets
    the injected default; host_rank joins from the robots dim when given.

    ``robots`` accepts BOTH host-dimension shapes the engine produces: the
    run-level robots dim (which carries ``host_rank``) and
    :func:`..politeness.parse_robots_txt` output (which does not — robots
    .txt has no rank concept). A missing ``host_rank`` column coalesces to
    0.0 instead of raising AnalysisException (ADVICE r04).
    """
    seeds = parsed.select(
        "url",
        F.lit(0).alias("depth"),
        F.coalesce(
            F.col("lastmod_ts"), F.lit(default_ts).cast("timestamp")
        ).alias("discovery_ts"),
        F.col("host"),
    )
    if robots is not None:
        rank = (
            F.col("host_rank").cast("double")
            if "host_rank" in robots.columns
            else F.lit(None).cast("double")
        )
        seeds = seeds.join(
            F.broadcast(robots.select("host", rank.alias("host_rank"))),
            "host",
            "left",
        )
    else:
        seeds = seeds.withColumn("host_rank", F.lit(None).cast("double"))
    return seeds.select(
        "url",
        "depth",
        F.coalesce("host_rank", F.lit(0.0)).alias("host_rank"),
        "discovery_ts",
    )
