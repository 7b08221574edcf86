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

    # sf0.01 golden parquets — used as DuckDB oracles by __spark_entry__
    d01 = ensure_crawl_fixtures("sf0.01")
    pages = pd.read_parquet(os.path.join(d01, "pages.parquet"))
    robots = pd.read_parquet(os.path.join(d01, "robots.parquet"))
    seeds = pd.read_parquet(os.path.join(d01, "seeds.parquet"))
    sim = ReferenceSimulator(pages, robots)
    logs = sim.run(N_ROUNDS, seeds)
    r1 = logs[0]
    round1 = pd.DataFrame(
        {
            "rank": range(1, len(r1.fetched_urls) + 1),
            "url": r1.fetched_urls,
            "host": r1.hosts,
            "depth": r1.depths,
            "fetch_ok": r1.fetch_ok,
            "n_links": r1.n_links,
            "text": [r1.texts.get(u) for u in r1.fetched_urls],
        }
    )
    round1["rank"] = round1["rank"].astype("int32")
    round1["depth"] = round1["depth"].astype("int32")
    round1["n_links"] = round1["n_links"].astype("int32")
    round1.to_parquet(os.path.join(gdir, "crawl_round1_sf0.01.parquet"), index=False)
    pd.DataFrame({"url": sorted(sim.seen_urls)}).to_parquet(
        os.path.join(gdir, "seen_urls_after3_sf0.01.parquet"), index=False
    )
    print(f"sf0.01 goldens: round1={len(round1)} rows, "
          f"seen_after3={len(sim.seen_urls)} urls")


if __name__ == "__main__":
    main()
