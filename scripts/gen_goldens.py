"""Generate committed goldens from the single-process reference simulator.

Run from the repo root: ``python scripts/gen_goldens.py``. Spark never
touches these — they are produced by the independent pure-Python twin
(plans/simulator.py) and pin crawl order / seen set / extracted text
(FIXTURES.md §6).
"""

from __future__ import annotations

import json
import os
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xrpl_rich_list_py_crawler_spark.functions.hashing import spark_xxhash64_str
from xrpl_rich_list_py_crawler_spark.plans.simulator import ReferenceSimulator
from xrpl_rich_list_py_crawler_spark.sources.fixtures import ensure_crawl_fixtures

N_ROUNDS = 3


def main() -> None:
    d = ensure_crawl_fixtures("sf0.001")
    pages = pd.read_parquet(os.path.join(d, "pages.parquet"))
    robots = pd.read_parquet(os.path.join(d, "robots.parquet"))
    seeds = pd.read_parquet(os.path.join(d, "seeds.parquet"))
    sim = ReferenceSimulator(pages, robots)
    logs = sim.run(N_ROUNDS, seeds)

    gdir = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")
    os.makedirs(gdir, exist_ok=True)

    for log in logs:
        with open(os.path.join(gdir, f"crawl_order_round{log.round_n}.jsonl"), "w") as f:
            for rank, (url, ok) in enumerate(zip(log.fetched_urls, log.fetch_ok), 1):
                f.write(json.dumps({"rank": rank, "url": url, "fetch_ok": ok}) + "\n")

    with open(os.path.join(gdir, "seen_set_final.txt"), "w") as f:
        for h in sorted(sim.seen):
            f.write(f"{h}\n")

    # 50 sampled extracted-text goldens (byte-identical parser invariant)
    os.makedirs(os.path.join(gdir, "extracted_text"), exist_ok=True)
    sample = sorted(logs[0].texts.items())[:50]
    for url, text in sample:
        h = spark_xxhash64_str(url)
        with open(
            os.path.join(gdir, "extracted_text", f"{h}.txt"), "w", encoding="utf-8"
        ) as f:
            f.write(text)
    print(f"goldens written to {os.path.abspath(gdir)}: "
          f"{sum(len(l.fetched_urls) for l in logs)} fetches, "
          f"{len(sim.seen)} seen, {len(sample)} text samples")


if __name__ == "__main__":
    main()
