"""FIXTURES.md §7.2: crawl order and seen set identical at any parallelism.

The in-session suite runs at local[8]; this test re-runs round 1-3 at
local[3] (different thread count, different shuffle partitioning) in a
fresh subprocess JVM and asserts byte-identical crawl order + seen set
against the committed simulator goldens — order must be a pure function of
data, never of partitioning (SURVEY.md §7.4).
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPT = r"""
import json, sys, shutil
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[3]")
         .config("spark.sql.shuffle.partitions", "5")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false")
         .config("spark.ui.showConsoleProgress", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from xrpl_rich_list_py_crawler_spark.sources import ensure_crawl_fixtures, SnapshotCatalog
from xrpl_rich_list_py_crawler_spark.plans import CrawlRun
d = ensure_crawl_fixtures("sf0.001")
pages = spark.read.parquet(f"{{d}}/pages.parquet")
robots = spark.read.parquet(f"{{d}}/robots.parquet")
seeds = spark.read.parquet(f"{{d}}/seeds.parquet")
shutil.rmtree({cat!r}, ignore_errors=True)
cat = SnapshotCatalog({cat!r})
CrawlRun(spark, cat, pages, robots).run(3, seeds)
out = {{}}
for r in (1, 2, 3):
    rows = cat.read_round(spark, "results", r).orderBy("rank").select("url").collect()
    out[str(r)] = [x["url"] for x in rows]
out["seen"] = sorted(x["url_hash"] for x in cat.read_appended(spark, "seen").collect())
spark.stop()
print("RESULT " + json.dumps(out))
"""


@pytest.mark.slow
def test_crawl_identical_at_other_parallelism(tmp_path):
    env = dict(os.environ, PYTHONPATH=REPO)
    out = subprocess.run(
        [sys.executable, "-c",
         SCRIPT.format(repo=REPO, cat=str(tmp_path / "cat"))],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=600,
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("RESULT ")]
    assert lines, out.stderr[-2000:]
    got = json.loads(lines[0][7:])

    gdir = os.path.join(REPO, "tests", "goldens")
    for r in (1, 2, 3):
        want = [json.loads(l)["url"]
                for l in open(os.path.join(gdir, f"crawl_order_round{r}.jsonl"))]
        assert got[str(r)] == want, f"round {r} order differs at local[3]"
    want_seen = [int(l) for l in open(os.path.join(gdir, "seen_set_final.txt"))]
    assert got["seen"] == want_seen
