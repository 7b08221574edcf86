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

    # shuffle spill to tmpfs: this VM's disk is shared (a non-scaling term
    # that pollutes parallelism measurements); a real cluster has per-node
    # local disks. Falls back to the default tmp dir if /dev/shm is absent.
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir is None and os.path.isdir("/dev/shm"):
        local_dir = "/dev/shm/spark-local"
    builder = SparkSession.builder.master(f"local[{CPUS}]")
    if local_dir:
        os.makedirs(local_dir, exist_ok=True)
        builder = builder.config("spark.local.dir", local_dir)
    return (
        builder.appName("bench")
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
    """Force FULL execution of every output column.

    A bare ``count()`` is dishonest here: Catalyst prunes columns and even
    eliminates cardinality-preserving joins (e.g. a left join on distinct
    keys that only produces flag columns), so flag-heavy queries would
    bench their scan, not their work. Hashing all columns into one
    aggregate defeats pruning; XOR-fold never overflows under ANSI."""
    from pyspark.sql import functions as F

    try:
        h = df.select(
            F.xxhash64(*[F.col(c) for c in df.columns]).alias("_h")
        )
        return h.agg(F.expr("bit_xor(_h)")).collect()[0][0] or 0
    except Exception:
        return df.count()


def bench_crawl(spark, sf_dir: str, bucketize: bool = False) -> dict:
    """3 frontier rounds on the matching pages corpus; throughput =
    (candidates processed − deferred) / wall.

    ``bucketize=True`` runs the 100 TB fetch-join path instead: the corpus
    is first written as a url_hash-bucketed table (one-time prep, excluded
    from the timed window like fixture generation is) and every round's
    fetch join reads it with NO pages-side exchange (plan pinned in
    tests/test_plan_quality.py::test_bucketed_pages_fetch_join_no_pages_
    exchange). The default path measures the in-memory ``pages_idx`` cache
    the small-corpus deployment uses."""
    from pyspark.sql import functions as F

    from xrpl_rich_list_py_crawler_spark.plans.rounds import CrawlRun
    from xrpl_rich_list_py_crawler_spark.sources.catalog import SnapshotCatalog
    from xrpl_rich_list_py_crawler_spark.sources.fixtures import (
        ensure_crawl_fixtures,
    )

    d = ensure_crawl_fixtures(_sf_name(sf_dir))
    pages = spark.read.parquet(os.path.join(d, "pages.parquet"))
    robots = spark.read.parquet(os.path.join(d, "robots.parquet"))
    # throughput-scale seed frontier: 20% of the corpus (cap 50k), not the
    # 100-url correctness seed list — the bench measures fetch+dedup volume
    from xrpl_rich_list_py_crawler_spark.functions.udfs import (
        canonicalize_url_udf,
        host_col,
    )
    from pyspark.sql import functions as F  # noqa: F811

    n_pages = pages.count()
    n_seeds = min(max(n_pages // 5, 100), 50_000)
    seeds = (
        pages.limit(n_seeds)
        .select(canonicalize_url_udf("url").alias("url"))
        .withColumn("host", host_col(F.col("url")))
        .join(
            F.broadcast(robots.select("host", "host_rank")), "host", "left"
        )
        .select(
            "url",
            F.lit(0).alias("depth"),
            F.coalesce("host_rank", F.lit(0.0)).alias("host_rank"),
            F.lit("2026-01-01 00:00:00").cast("timestamp").alias("discovery_ts"),
        )
    )
    tmp = tempfile.mkdtemp(prefix="bench_cat_")
    try:
        crawl_input = pages
        if bucketize:
            from xrpl_rich_list_py_crawler_spark.plans.rounds import (
                bucketize_pages,
            )

            crawl_input = bucketize_pages(
                spark, pages, table="bench_pages_bucketed",
                path=os.path.join(tmp, "_pages_bucketed"),
            )
        cat = SnapshotCatalog(tmp)
        t0 = time.time()
        run = CrawlRun(spark, cat, crawl_input, robots)
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
        if bucketize:
            spark.sql("DROP TABLE IF EXISTS bench_pages_bucketed")
        shutil.rmtree(tmp, ignore_errors=True)


def bench_corpus_parse(spark, sf_dir: str, repeat: int = 40) -> dict:
    """Compute-bound scaling probe: the crawl's parse kernel over the whole
    corpus ×repeat — text AND link extraction fully JVM-side (r04: the
    blob never crosses to Python; byte-identity vs the Python twin pinned
    in tests/test_parsers.py), canonicalize every link, hash, aggregate.
    Embarrassingly parallel; used by scripts/bench_scaling.py for the
    N-vs-4N-cores efficiency evidence.

    Canonicalization here is the Arrow UDF (whose pandas fast path
    passes the canonical majority through): the split-union JVM fast path
    run_round uses is a tie on this VM only when the upstream frame is
    persisted for other consumers (as in run_round); in this single-pass
    kernel it would force a 40M-row materialization and measured 2×
    slower (r04 A/B)."""
    from pyspark.sql import functions as F

    from xrpl_rich_list_py_crawler_spark.functions.udfs import (
        canonicalize_url_udf,
        extract_links_col,
        extract_text_col,
        host_col,
    )
    from xrpl_rich_list_py_crawler_spark.sources.fixtures import (
        ensure_crawl_fixtures,
    )

    d = ensure_crawl_fixtures(_sf_name(sf_dir))
    one = spark.read.parquet(os.path.join(d, "pages.parquet"))
    # spread FIRST, replicate AFTER: repartition before the broadcast
    # crossJoin shuffles the corpus once (27 MB), and each partition then
    # replicates ×repeat locally with no further shuffle. The r03 shape
    # (crossJoin then repartition) pushed repeat× the blob bytes through
    # a 2-task scan stage — a serial term that capped the kernel's
    # measured scaling at ~0.40 efficiency regardless of the parse code
    # (r04 finding; the fixed shape measures 0.70). On a real corpus
    # maxPartitionBytes spreads the scan for free.
    par = spark.sparkContext.defaultParallelism
    pages = one.repartition(par * 3).crossJoin(
        F.broadcast(spark.range(repeat).select(F.col("id").alias("_rep")))
    )
    t0 = time.time()
    parsed = (
        pages.select(
            F.length(extract_text_col(F.col("html"))).alias("text_len"),
            F.explode_outer(extract_links_col(F.col("html"))).alias("raw"),
        )
        .withColumn("canon", canonicalize_url_udf("raw"))
        .select("text_len", F.xxhash64("canon").alias("h"),
                host_col(F.col("canon")).alias("host"))
    )
    agg = parsed.groupBy("host").agg(
        F.count("*").alias("n"),
        F.sum("text_len").alias("chars"),
        F.approx_count_distinct("h").alias("uniq"),
    )
    n_hosts = agg.count()
    wall = time.time() - t0
    n_pages = one.count() * repeat
    return {
        "sec": wall,
        "pages": n_pages,
        "hosts": n_hosts,
        "pages_per_sec": n_pages / wall if wall else 0.0,
    }


def bench_fetch_dedup(spark, sf_dir: str, n: int = 60_000_000) -> dict:
    """The metric kernel (BASELINE.json: "URLs fetched+deduped/sec"):
    canonical-key hashing + seen-set anti-join + fetch-side equi join —
    entirely JVM-side (whole-stage codegen), the shape that runs per round
    at 10^10-frontier scale. ``n`` synthetic URLs (frontier realism proxy),
    every 3rd already seen."""
    from pyspark.sql import functions as F

    par = spark.sparkContext.defaultParallelism

    def _hashes(step: int):
        # URL synthesis + canonicalization (lower) + xxhash64, all map-side
        # codegen; only the 8-byte keys reach the shuffle — the bloom
        # pre-filter exists precisely so candidate payloads never ride the
        # dedup shuffle (operators/seen.py), so this is the engine's real
        # per-round shuffle volume.
        return spark.range(0, n, step, par * 4).select(
            F.xxhash64(
                F.lower(
                    F.concat(
                        F.lit("HTTPS://H"),
                        (F.col("id") % 1000).cast("string"),
                        F.lit(".Example.com/p/"),
                        F.col("id").cast("string"),
                    )
                )
            ).alias("url_hash")
        )

    cand = _hashes(1)
    seen = _hashes(3)
    t0 = time.time()
    unseen = cand.join(seen, "url_hash", "left_anti").count()
    wall = time.time() - t0
    return {
        "sec": wall,
        "urls": n,
        "unseen": int(unseen),
        "urls_per_sec": n / wall if wall else 0.0,
    }


def _canon_url_hash_col(spark, n: int, step: int, slices: int = 32):
    """Synthetic frontier URL → JVM canonicalization (fragment strip,
    scheme/host lowering, query-param sort) → xxhash64 — the engine's real
    per-URL dedup-key work (functions/udfs.py canonicalize_url semantics,
    expressed as codegen Column ops for the kernel)."""
    from pyspark.sql import functions as F

    url = F.concat(
        F.lit("HTTPS://H"), (F.col("id") % 1000).cast("string"),
        F.lit(".Example.COM/p/"), F.col("id").cast("string"),
        F.lit("?z="), (F.col("id") % 89).cast("string"),
        F.lit("&a="), (F.col("id") % 97).cast("string"), F.lit("#f"),
    )
    nofrag = F.substring_index(url, "#", 1)
    scheme = F.lower(F.substring_index(nofrag, "://", 1))
    rest = F.substring_index(nofrag, "://", -1)
    host = F.lower(F.substring_index(rest, "/", 1))
    pathq = rest.substr(F.length(host) + 1, F.length(rest))
    path = F.substring_index(pathq, "?", 1)
    q = F.substring_index(pathq, "?", -1)
    qsorted = F.array_join(F.array_sort(F.split(q, "&")), "&")
    canon = F.concat(scheme, F.lit("://"), host, path, F.lit("?"), qsorted)
    return spark.range(0, n, step, slices).select(
        F.xxhash64(canon).alias("url_hash")
    )


def bench_canon_dedup(spark, sf_dir: str, n: int = 24_000_000) -> dict:
    """The full per-URL dedup path: canonicalize (JVM string ops) + hash +
    seen anti-join. CPU-dominated (unlike the hash-only kernel, whose
    anti-join is memory-bandwidth-bound) — this is the per-round work
    profile of a crawl that canonicalizes every discovered link, and the
    primary kernel for the N-vs-4N scaling evidence."""
    import time as _t

    cand = _canon_url_hash_col(spark, n, 1)
    seen = _canon_url_hash_col(spark, n, 3)
    t0 = _t.time()
    unseen = cand.join(seen, "url_hash", "left_anti").count()
    wall = _t.time() - t0
    return {
        "sec": wall,
        "urls": n,
        "unseen": int(unseen),
        "urls_per_sec": n / wall if wall else 0.0,
    }


def bench_warc(spark, sf_dir: str, files: int = 64) -> dict:
    """WARC ingestion kernel (late r05): parse throughput of the Common
    Crawl front door (sources/warc.py). Prep (untimed): fold the sf
    documents table into ``files`` real .warc files on local disk — one
    response + one request record per doc plus a warcinfo head per file,
    so the parser does the full skip/extract work. Timed: ``read_warc``
    end to end (binaryFile scan → mapInPandas Content-Length walk) +
    a count/size aggregate. File-per-task parallelism, exactly the
    production shape."""
    import shutil
    import tempfile
    import time as _t

    from pyspark.sql import functions as F

    from xrpl_rich_list_py_crawler_spark.sources.warc import (
        read_warc, to_warc_files,
    )

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    did = F.col("doc_id")
    responses = docs.select(
        F.concat(
            F.lit("w"), (did % files).cast("string"), F.lit(".warc")
        ).alias("warc_file"),
        F.concat(
            F.lit("https://d"), did.cast("string"), F.lit(".example.org/p")
        ).alias("url"),
        F.lit("2024-01-01T00:00:00Z").alias("warc_date"),
        F.lit(200).alias("http_status"),
        F.lit("text/html").alias("mime"),
        F.col("text").cast("binary").alias("payload"),
    )
    tmp = tempfile.mkdtemp(prefix="bench_warc_")
    try:
        total_bytes = 0
        for row in to_warc_files(responses, emit_requests=True).collect():
            blob = bytes(row.content)
            total_bytes += len(blob)
            with open(os.path.join(tmp, row.warc_file), "wb") as f:
                f.write(blob)
        t0 = _t.time()
        agg = (
            read_warc(spark, tmp)
            .agg(
                F.count("*").alias("n"),
                F.sum(F.length("payload")).alias("pb"),
            )
            .collect()[0]
        )
        wall = _t.time() - t0
        return {
            "sec": wall,
            "records": int(agg.n),
            "warc_bytes": total_bytes,
            "records_per_sec": agg.n / wall if wall else 0.0,
            "mb_per_sec": total_bytes / 1e6 / wall if wall else 0.0,
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
    "ann_ivf",
    "corpus_curation",
    "trustline_rich_list",
    "category_summary_wide",
    # r04 additions: discovery sources + training-data hygiene
    "robots_txt_parse",
    "sitemap_parse",
    "pii_redaction",
    "domain_cap",
    # r05 additions: corpus-frequency + repetition quality, web-scale
    # decontamination, real container decode
    "unigram_quality",
    "repetition_stats",
    "ngram_contamination_hashed",
    "media_decode",
    "training_mix",
    # r05 late additions: cross-doc boilerplate strike + deterministic
    # stratified sampling
    "line_dedup",
    "hash_sample",
    "substring_dedup",
    "classifier_score",
    # r05 LM family: bigram transition model + DSIR importance weights
    "bigram_quality",
    "dsir_weights",
    # r05 dataloader prep: two-phase prefix-sum packing + BPE merge count
    "seq_packing",
    "bpe_merge_pairs",
    # r05 clickstream windowing (host_pagerank and host_hits are NOT
    # benched: their fixture graph is a fixed 60 hosts at every sf, so
    # the line would measure only per-iteration scheduler overhead)
    "sessionization",
    # late-r05 additions: semantic dedup over embedding cells, crawl-trap
    # frontier gate, feasibility-derived training-mixture sampling
    "semdedup",
    "url_traps",
    "mixture_sample",
    # C4 page cleaning: pure-codegen scan over the full documents table
    "c4_line_clean",
    # final-session additions: Gopher gate, SoftDeDup, component-keyed
    # splits, trained-BPE application, JVM mime routing
    "gopher_quality",
    "soft_dedup",
    "leakage_safe_split",
    "bpe_encode_counts",
    "mime_sniff",
    "text_normalize",
    "shard_assignment",
    "media_resize",
    "audio_resample",
    "epoch_expand",
    "kneser_ney_lm",
    "winnow_fingerprints",
    "seq_assembly",
    "corpus_report",
    "minhash_incremental",
    "kn_doc_quality",
    "script_profile",
    # verification-session additions: integer-exact distributed Lloyd's
    # k-means (3 iterations over the 5k×64 sf0.1 embeddings) and the
    # CCNet equal-mass corpus split over the KN-LM scores
    "kmeans_embeddings",
    "ccnet_buckets",
    "lang_segments",
    "temperature_sample",
    "epoch_shuffle",
    "webdataset_roundtrip",
    "pmi_phrases",
    "canonical_by_quality",
    "badwords_filter",
    "unigram_lm_train",
    "unigram_encode",
    "chunk_documents",
    "chunk_retrieval",
    "phrase_blocklist",
    # post-run-M additions: MG-prefiltered heavy hitters, exact-quota
    # stratified sampling, one-pass threshold sweep, postings compaction
    "heavy_hitters",
    "stratified_sample",
    "threshold_sweep",
    "postings_compact",
    "weighted_sample",
    "snm_pairs",
    "template_fingerprint",
    "margin_pairs",
    "phrase_search",
    "dsir_select",
    "proximity_search",
    "containment_pairs",
    "url_templates",
    "winnow_clones",
    "host_quality_rank",
    "multi_block_dedup",
    "mirror_hosts",
    # trust_rank: fixed-60-host graph — not benched, same rationale as
    # host_pagerank/host_hits (iteration cost is checkpoint-dominated
    # at fixture scale and says nothing about corpus throughput)
]


def main() -> None:
    spark = build_spark()
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    times: dict[str, float] = {}

    # crawl: 3 trials, report the MEDIAN (r04 verdict #1: the single-shot
    # crawl number swung 34.5s ↔ 105.1s across same-code sessions on this
    # co-tenant VM — the same adjudication the kernels already get). The
    # bucketed variant (the stated 100 TB fetch-join path) gets its own
    # line so BENCH finally measures it, not just the cached-pages path.
    #
    # Cold-start control (r05): an UNTIMED warm-up first — one crawl on
    # the sf0.01 fixture (JVM JIT + Arrow worker spin-up + codegen cache)
    # and one scan of the target corpus (OS page cache). Without it the
    # first trial measures cold-start, not the engine: same-code first
    # trials read 157-216s vs 33s warmed in r05 sessions. Steady-state is
    # the honest target — a production crawler amortizes startup over
    # thousands of rounds.
    from xrpl_rich_list_py_crawler_spark.sources.fixtures import (
        ensure_crawl_fixtures,
    )

    bench_crawl(spark, os.path.join(os.path.dirname(SF_DIR), "sf0.01"))
    _d_warm = ensure_crawl_fixtures(_sf_name(SF_DIR))
    spark.read.parquet(os.path.join(_d_warm, "pages.parquet")).count()
    crawl_trials = [bench_crawl(spark, SF_DIR) for _ in range(3)]
    crawl = sorted(crawl_trials, key=lambda t: t["sec"])[1]
    times["crawl_3rounds"] = round(crawl["sec"], 3)
    crawl_bkt = bench_crawl(spark, SF_DIR, bucketize=True)
    times["crawl_3rounds_bucketed"] = round(crawl_bkt["sec"], 3)

    # headline kernels + parse: 3 interleaved repeats each, report the
    # MEDIAN (r03/r04 verdicts: single runs on this co-tenant VM swing up
    # to ~3x — both recorded "regressions" were one-shot numbers). Trial
    # lists are emitted alongside so the noise envelope is visible.
    parse_trials: list[dict] = []
    dedup_trials: list[dict] = []
    canon_trials: list[dict] = []
    for _ in range(3):
        parse_trials.append(bench_corpus_parse(spark, SF_DIR))
        dedup_trials.append(bench_fetch_dedup(spark, SF_DIR))
        canon_trials.append(bench_canon_dedup(spark, SF_DIR))
    parse = sorted(parse_trials, key=lambda t: t["sec"])[1]
    dedup = sorted(dedup_trials, key=lambda t: t["sec"])[1]
    canon = sorted(canon_trials, key=lambda t: t["sec"])[1]
    times["corpus_parse"] = round(parse["sec"], 3)
    times["fetch_dedup_kernel"] = round(dedup["sec"], 3)
    times["canon_dedup_kernel"] = round(canon["sec"], 3)

    # WARC ingestion kernel (late r05): 3 trials, median, same protocol
    warc_trials = [bench_warc(spark, SF_DIR) for _ in range(3)]
    warc = sorted(warc_trials, key=lambda t: t["sec"])[1]
    times["warc_parse_kernel"] = round(warc["sec"], 3)

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
        "crawl_trials_sec": [round(t["sec"], 3) for t in crawl_trials],
        "crawl_bucketed_urls_per_sec": round(crawl_bkt["urls_per_sec"], 1),
        "parse_pages_per_sec": round(parse["pages_per_sec"], 1),
        "dedup_urls_per_sec": round(dedup["urls_per_sec"], 1),
        "canon_dedup_urls_per_sec": round(canon["urls_per_sec"], 1),
        "parse_trials_sec": [round(t["sec"], 3) for t in parse_trials],
        "dedup_trials_sec": [round(t["sec"], 3) for t in dedup_trials],
        "canon_dedup_trials_sec": [round(t["sec"], 3) for t in canon_trials],
        "warc_mb_per_sec": round(warc["mb_per_sec"], 1),
        "warc_records_per_sec": round(warc["records_per_sec"], 1),
        "warc_trials_sec": [round(t["sec"], 3) for t in warc_trials],
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
