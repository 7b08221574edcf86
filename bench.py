"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "crawl_urls_per_sec": ..., ...}

The headline crawl metric follows BASELINE.json: URLs fetched+deduped per
second over a 3-round frontier crawl (fetch attempts + dedup/robots drops,
excluding budget-deferred URLs, divided by wall time). Run
scripts/bench_scaling.py for the N-vs-4N-cores scaling-efficiency report.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _sf_name(sf_dir: str) -> str:
    base = os.path.basename(os.path.normpath(sf_dir))
    return base if base.startswith("sf") else "sf0.1"


def build_spark():
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("bench")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )


def _materialize(df) -> int:
    """Force full execution; returns row count (cheap — count reuses the
    computed plan stages)."""
    return df.count()


def bench_crawl(spark, sf_dir: str) -> dict:
    """3 frontier rounds on the matching pages corpus; throughput =
    (candidates processed − deferred) / wall."""
    from pyspark.sql import functions as F

    from xrpl_rich_list_py_crawler_spark.plans.rounds import CrawlRun
    from xrpl_rich_list_py_crawler_spark.sources.catalog import SnapshotCatalog
    from xrpl_rich_list_py_crawler_spark.sources.fixtures import (
        ensure_crawl_fixtures,
    )

    d = ensure_crawl_fixtures(_sf_name(sf_dir))
    pages = spark.read.parquet(os.path.join(d, "pages.parquet"))
    robots = spark.read.parquet(os.path.join(d, "robots.parquet"))
    seeds = spark.read.parquet(os.path.join(d, "seeds.parquet"))
    tmp = tempfile.mkdtemp(prefix="bench_cat_")
    try:
        cat = SnapshotCatalog(tmp)
        t0 = time.time()
        run = CrawlRun(spark, cat, pages, robots)
        last = run.run(3, seeds)
        wall = time.time() - t0
        m = cat.read_appended(spark, "metrics", up_to_round=last)
        agg = m.agg(
            F.sum("candidates").alias("cand"),
            F.sum("budget_deferred").alias("deferred"),
            F.sum("fetched").alias("fetched"),
            F.sum("fetch_missing").alias("missing"),
            F.sum("robots_denied").alias("denied"),
            F.sum("seen_dups").alias("dups"),
        ).collect()[0]
        processed = agg["cand"] - agg["deferred"]
        return {
            "sec": wall,
            "rounds": last,
            "urls_processed": int(processed),
            "urls_fetched": int(agg["fetched"]),
            "urls_per_sec": processed / wall if wall > 0 else 0.0,
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


HEADLINE = [
    "a2_lineitem_agg",
    "j4_region_rollup",
    "w1_order_rank",
    "j5_asof_user_value",
    "j7_pivot",
    "f10_hourly_tumbling",
    "t5_lag_change",
    "summary_series",
    "balance_changes",
    "url_canonicalization",
    "dedup_exact",
    "minhash_neardups",
    "ann_bruteforce",
]


def main() -> None:
    spark = build_spark()
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    times: dict[str, float] = {}

    crawl = bench_crawl(spark, SF_DIR)
    times["crawl_3rounds"] = round(crawl["sec"], 3)

    for name in HEADLINE:
        fn = qs[name]
        t0 = time.time()
        _materialize(fn(spark, SF_DIR))
        times[name] = round(time.time() - t0, 3)

    total = round(sum(times.values()), 3)
    out = {
        "metric": "headline suite wall time (crawl 3 rounds + operator queries)",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": _sf_name(SF_DIR),
        "cpus": CPUS,
        "crawl_urls_per_sec": round(crawl["urls_per_sec"], 1),
        "crawl_urls_processed": crawl["urls_processed"],
        "crawl_urls_fetched": crawl["urls_fetched"],
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
