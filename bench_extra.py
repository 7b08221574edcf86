"""Round-6 measurement harness (guide §1): per-query isolation, plan capture.

NOT the driver bench — bench.py is frozen for measurement. This tool exists
so optimization work can (a) time ONE query without paying the whole suite,
(b) time it through the exact same materialization the driver uses
(xxhash64-all-columns + bit_xor fold), (c) isolate computation with the
noop sink (guide §1.4), and (d) dump .explain("formatted") to
plans/r06/<query>_{before,after}.txt for the judge.

Usage:
    python bench_extra.py time q1 q2 ...        # median-of-3 per query
    python bench_extra.py time --repeat 5 q1
    python bench_extra.py noop q1 q2 ...        # noop-sink isolation
    python bench_extra.py explain before q1 ... # plans/r06/q1_before.txt
    python bench_extra.py explain after q1 ...
    python bench_extra.py crawl [n]             # n timed crawl trials (sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def build_spark():
    import bench

    return bench.build_spark()


def _materialize(df):
    import bench

    return bench._materialize(df)


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def cmd_time(names: list[str], repeat: int, sink) -> None:
    spark = build_spark()
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    out: dict[str, dict] = {}
    for name in names:
        fn = qs[name]
        trials = []
        for i in range(repeat):
            spark.sparkContext.setJobDescription(f"{name} trial {i}")
            t0 = time.time()
            sink(fn(spark, SF_DIR))
            trials.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        med = sorted(trials)[len(trials) // 2]
        out[name] = {"median": med, "trials": trials}
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"summary": {k: v["median"] for k, v in out.items()}}))
    spark.stop()


def cmd_explain(tag: str, names: list[str]) -> None:
    spark = build_spark()
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    os.makedirs(os.path.join(REPO, "plans", "r06"), exist_ok=True)
    for name in names:
        df = qs[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        p = os.path.join(REPO, "plans", "r06", f"{name}_{tag}.txt")
        with open(p, "w") as f:
            f.write(plan)
        print(f"wrote {p} ({plan.count('Exchange')} Exchange refs)")
    spark.stop()


def cmd_crawl(n: int) -> None:
    import bench

    spark = build_spark()
    spark.sparkContext.setLogLevel("ERROR")
    # same warmup protocol as bench.py main()
    bench.bench_crawl(spark, os.path.join(os.path.dirname(SF_DIR), "sf0.01"))
    from xrpl_rich_list_py_crawler_spark.sources.fixtures import (
        ensure_crawl_fixtures,
    )

    d = ensure_crawl_fixtures(bench._sf_name(SF_DIR))
    spark.read.parquet(os.path.join(d, "pages.parquet")).count()
    trials = []
    for i in range(n):
        r = bench.bench_crawl(spark, SF_DIR)
        trials.append(round(r["sec"], 3))
        print(json.dumps({"trial": i, **{k: r[k] for k in ("sec", "urls_per_sec")}}), flush=True)
    print(json.dumps({"crawl_trials": trials,
                      "median": sorted(trials)[len(trials) // 2]}))
    spark.stop()


def main() -> None:
    args = sys.argv[1:]
    cmd = args[0] if args else "time"
    if cmd == "time" or cmd == "noop":
        rest = args[1:]
        repeat = 3
        if rest and rest[0] == "--repeat":
            repeat = int(rest[1])
            rest = rest[2:]
        cmd_time(rest, repeat, _noop if cmd == "noop" else _materialize)
    elif cmd == "explain":
        cmd_explain(args[1], args[2:])
    elif cmd == "crawl":
        cmd_crawl(int(args[1]) if len(args) > 1 else 3)
    else:
        raise SystemExit(f"unknown command {cmd}")


if __name__ == "__main__":
    main()
