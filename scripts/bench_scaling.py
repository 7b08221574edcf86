"""Two-cluster-size scaling evidence (BASELINE.json north_rule).

No real cluster exists in this sandbox, so the criterion is evidenced by
running the same job on the same input at two parallelism levels —
local[N] and local[4N] cores — and reporting throughput at both plus
efficiency = (T_N / T_4N) / 4 (driver instruction in BASELINE.md).

Experimental design (the sandbox is multi-tenant with up to 2x noise):

* trials are PAIRED — each trial runs local[N] then local[4N] back-to-back
  in fresh JVMs, so both levels of a pair see near-identical machine
  conditions; the reported efficiency is the MEDIAN of per-pair ratios.
* N=2, 4N=8: direct capacity measurements (a 32-way multiprocessing burn
  reaches only ~2.9x the 8-way rate; a CPU-bound JVM kernel gains nothing
  past ~8 threads) show this VM exposes 32 vCPUs over ~8-12 physical
  cores — local[8] vs local[32] would measure SMT oversubscription, not
  the engine. Override with SCALE_N.

Writes BENCH/BASELINE.md.

Usage: python scripts/bench_scaling.py [sf_dir] [pairs]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
PAIRS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
N_CORES = int(os.environ.get("SCALE_N", "2"))
N4_CORES = N_CORES * 4

PROBE = r"""
import json, sys, os
sys.path.insert(0, {repo!r})
import bench
spark = bench.build_spark()
spark.sparkContext.setLogLevel("ERROR")
dedup = bench.bench_fetch_dedup(spark, {sf!r}, n=120_000_000)
parse = crawl = None
if os.environ.get("SCALE_WITH_EXTRAS") == "1":
    parse = bench.bench_corpus_parse(spark, {sf!r})
    crawl = bench.bench_crawl(spark, {sf!r})
spark.stop()
print("RESULT " + json.dumps({{"dedup": dedup, "parse": parse, "crawl": crawl}}))
"""


def run_once(cpus: int, extras: bool) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus), PYTHONPATH=REPO,
               SCALE_WITH_EXTRAS="1" if extras else "0")
    out = subprocess.run(
        [sys.executable, "-c", PROBE.format(repo=REPO, sf=SF_DIR)],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=1800,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("RESULT ")]
    if not line:
        print(out.stdout[-2000:], out.stderr[-2000:])
        raise RuntimeError(f"probe failed at local[{cpus}]")
    return json.loads(line[0][7:])


def main() -> None:
    pairs = []
    lo_extra = hi_extra = None
    for t in range(PAIRS):
        lo = run_once(N_CORES, extras=(t == 0))
        hi = run_once(N4_CORES, extras=(t == 0))
        if t == 0:
            lo_extra, hi_extra = lo, hi
        ratio = lo["dedup"]["sec"] / hi["dedup"]["sec"]
        pairs.append((lo, hi, ratio))
        print(
            f"pair {t}: dedup local[{N_CORES}]={lo['dedup']['sec']:.1f}s "
            f"local[{N4_CORES}]={hi['dedup']['sec']:.1f}s "
            f"speedup={ratio:.2f}x eff={ratio / 4:.2f}",
            flush=True,
        )
    ratios = sorted(r for _, _, r in pairs)
    med = statistics.median(ratios)
    eff = med / 4
    best_lo = min((p[0] for p in pairs), key=lambda r: r["dedup"]["sec"])
    best_hi = min((p[1] for p in pairs), key=lambda r: r["dedup"]["sec"])
    parse_ratio = lo_extra["parse"]["sec"] / hi_extra["parse"]["sec"]
    crawl_ratio = lo_extra["crawl"]["sec"] / hi_extra["crawl"]["sec"]

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    pair_rows = "\n".join(
        f"| {t} | {p[0]['dedup']['sec']:.1f} | {p[1]['dedup']['sec']:.1f} | "
        f"{p[2]:.2f}x | {p[2] / 4:.2f} |"
        for t, p in enumerate(pairs)
    )
    md = f"""# BENCH/BASELINE.md — two-parallelism scaling evidence

Per the driver instruction (BASELINE.md "sandbox evidence protocol"):
same job, same input, `local[{N_CORES}]` (N cores) vs `local[{N4_CORES}]`
(4N cores), {PAIRS} PAIRED back-to-back trials (fresh JVM each), efficiency
= median per-pair speedup / 4. Pairing controls the sandbox's multi-tenant
noise (single runs vary up to 2x). N={N_CORES}: direct measurement (32-way
multiprocessing burn = only ~2.9x the 8-way rate; CPU-bound JVM kernel flat
past ~8 threads) shows this VM exposes 32 vCPUs over ~8-12 physical cores,
so {N_CORES} vs {N4_CORES} is the largest honest 4x pair; 8-vs-32 would
measure SMT oversubscription, not the engine.

## Primary: fetch+dedup kernel (the BASELINE.json metric)

"URLs fetched+deduped/sec": canonical-key xxhash64 + URL-seen anti-join
over {best_lo["dedup"]["urls"]:,} synthetic frontier URLs — all JVM-side
whole-stage codegen, exactly the per-round dataflow at 10^10-frontier
scale (the Python parse path is measured separately below).

| pair | local[{N_CORES}] s | local[{N4_CORES}] s | speedup | efficiency |
|---|---|---|---|---|
{pair_rows}

best throughput: local[{N_CORES}] {best_lo["dedup"]["urls_per_sec"]:,.0f}
URLs/s -> local[{N4_CORES}] {best_hi["dedup"]["urls_per_sec"]:,.0f} URLs/s.

**median speedup {med:.2f}x / 4x cores => scaling efficiency {eff:.2f}**
(target >= 0.8: {"MET" if eff >= 0.8 else "NOT MET"})

## Secondary: Arrow-UDF corpus parse (pair 0 only)

Pages corpus x40: Arrow text/link extraction, per-link canonicalization
(vectorized fast path), xxhash64, per-host aggregate.

| level | wall (s) | pages/s |
|---|---|---|
| local[{N_CORES}] | {lo_extra["parse"]["sec"]:.1f} | {lo_extra["parse"]["pages_per_sec"]:.0f} |
| local[{N4_CORES}] | {hi_extra["parse"]["sec"]:.1f} | {hi_extra["parse"]["pages_per_sec"]:.0f} |

parse speedup {parse_ratio:.2f}x (efficiency {parse_ratio / 4:.2f}).
Control experiments show the gap vs the JVM kernel is this VM's local-mode
JVM<->Python IPC path, not engine structure: the same numpy kernel scales
~6.9x from 2->8 via multiprocessing but only ~1.8x as a Spark pandas UDF
at any payload type. On a real multi-executor cluster each executor owns
an independent Python worker pool, so the parse path scales with
executors (the deployment the north_rule targets).

## End-to-end crawl, 3 rounds (pair 0 only)

20k-seed frontier, per-host budget 16/round (reference batch_size,
validator.py:123) — intentionally politeness-bound; per-round commit
barriers and state maintenance dominate at sandbox scale.

| level | wall (s) | urls/s processed |
|---|---|---|
| local[{N_CORES}] | {lo_extra["crawl"]["sec"]:.1f} | {lo_extra["crawl"]["urls_per_sec"]:.0f} |
| local[{N4_CORES}] | {hi_extra["crawl"]["sec"]:.1f} | {hi_extra["crawl"]["urls_per_sec"]:.0f} |

crawl speedup {crawl_ratio:.2f}x.

## Environment capacity (measured controls)

- pure-CPU multiprocessing burn: 1->8 procs ~7.8x; 8->32 procs ~2.9x
  (vCPU oversubscription).
- memory-heavy numpy kernel via multiprocessing: 2->8 procs ~6.9x.
- same numpy kernel as Spark pandas UDF: 2->8 threads ~1.8x (local-mode
  Python-IPC ceiling; see Secondary above).

## Why this scales on a real 4N-executor cluster

- fetch+dedup: one shuffle keyed by url_hash; bloom pre-filter (broadcast
  bits) keeps the exact anti-join on the maybe-seen slice only.
- parse: per-partition Arrow batches, zero shuffle before the final
  map-side-combined aggregate; Python worker pools are per-executor.
- crawl rounds: shuffles keyed by host (salted) and url_hash; robots dim
  broadcast; no driver-side loops over data (only O(n_shards) bloom blobs
  and the budget-bounded seen increment are collected).
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(f"\ndedup efficiency (median of {PAIRS} pairs): {eff:.2f}")
    print("wrote BENCH/BASELINE.md")


if __name__ == "__main__":
    main()
