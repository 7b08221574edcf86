"""spark-submit entry point for the training-data curation pipeline.

The curation-side sibling of scripts/run_crawl.py: one command takes a
raw document corpus to per-document training verdicts (and optionally
the selected text itself), composing the engine's oracle-checked stages:

    training_mix  (curate_corpus ∘ repetition gates ∘ 13-gram
                   decontamination ∘ per-source quota)
    + optional Gopher-rules gate          (--gopher)
    + optional SoftDeDup 1/n reweighting  (--soft-dedup)
    + optional leakage-safe splits        (--splits, component-keyed)
    + optional alpha=1/2 mixture balance  (--temperature-sample)

Cluster:

    spark-submit --py-files "$(python -c 'from \
xrpl_rich_list_py_crawler_spark.deploy import build_pyfiles_zip as b; \
print(b())')" scripts/run_curation.py \
        --documents s3://bucket/docs --benchmark s3://bucket/eval \
        --out s3://bucket/verdicts

Local smoke (no cluster needed):

    PYTHONPATH=. python scripts/run_curation.py \
        --documents /root/testdata/sf0.001/documents.parquet \
        --out /tmp/verdicts --gopher --soft-dedup --splits
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--documents", required=True,
                    help="document corpus parquet (doc_id, text, source, "
                         "n_chars)")
    ap.add_argument("--benchmark", default=None,
                    help="held-out benchmark parquet for 13-gram "
                         "decontamination (doc_id, text); default: a "
                         "deterministic 2%% slice of the corpus (doc_id "
                         "%% 50 == 0), which demonstrates the stage "
                         "without external data")
    ap.add_argument("--out", required=True,
                    help="output parquet path for the verdict table")
    ap.add_argument("--per-source-cap", type=int, default=50)
    ap.add_argument("--max-bucket-size", type=int, default=None,
                    help="LSH bucket cap (star-collapse + salt-split); "
                         "set at web scale")
    ap.add_argument("--gopher", action="store_true",
                    help="add the Gopher-rules gate columns and fold its "
                         "keep into quality_ok")
    ap.add_argument("--gopher-min-words", type=int, default=50)
    ap.add_argument("--soft-dedup", action="store_true",
                    help="add SoftDeDup 1/n duplicate weights "
                         "(n_dups, weight, soft_keep)")
    ap.add_argument("--splits", action="store_true",
                    help="add a leakage-safe train/val/test split keyed "
                         "on near-dup components")
    ap.add_argument("--temperature-sample", action="store_true",
                    help="add XLM-R-style alpha=1/2 mixture-balancing "
                         "columns (temp_w, temp_rate, temp_sampled): "
                         "per-source keep rates proportional to "
                         "sqrt(token mass)")
    ap.add_argument("--split-weights", default="0.9,0.05,0.05")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--master", default=None)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    b = SparkSession.builder.appName("curation").config(
        "spark.sql.adaptive.enabled", "true"
    )
    if args.master:
        b = b.master(args.master)
    if args.shuffle_partitions:
        b = b.config("spark.sql.shuffle.partitions",
                     str(args.shuffle_partitions))
    spark = b.getOrCreate()

    from xrpl_rich_list_py_crawler_spark.operators import dedup as dd
    from xrpl_rich_list_py_crawler_spark.operators import textstats as ts
    from xrpl_rich_list_py_crawler_spark.operators.curation import (
        leakage_safe_split,
        soft_dedup,
        training_mix,
    )

    docs = spark.read.parquet(args.documents)
    if args.benchmark:
        bench = spark.read.parquet(args.benchmark).select("doc_id", "text")
    else:
        bench = docs.filter(F.col("doc_id") % 50 == 0).select(
            "doc_id", "text"
        )

    verdict = training_mix(
        docs, bench,
        per_source_cap=args.per_source_cap,
        max_bucket_size=args.max_bucket_size,
    )

    if args.gopher:
        g = ts.gopher_quality(
            docs, min_words=args.gopher_min_words
        ).select("doc_id", F.col("keep").alias("gopher_ok"))
        verdict = (
            verdict.join(g, "doc_id")
            .withColumn("quality_ok", F.col("quality_ok") & F.col("gopher_ok"))
            .withColumn(
                "selected", F.col("selected") & F.col("gopher_ok")
            )
        )

    if args.soft_dedup:
        sd = soft_dedup(docs, seed=args.seed).select(
            "doc_id", "n_dups", "weight",
            F.col("keep").alias("soft_keep"),
        )
        verdict = verdict.join(sd, "doc_id")

    if args.splits:
        pairs = (
            dd.chargram_jaccard_pairs(
                docs, dd.minhash_lsh_candidates(
                    docs, bands=16, n_hashes=64,
                    max_bucket_size=args.max_bucket_size,
                ),
                n=9, stride=3,
            )
            .filter(F.col("jaccard") >= 0.5)
            .select("id_a", "id_b")
        )
        comps = dd.connected_components(
            docs.select("doc_id"), pairs
        ).select("doc_id", F.col("comp").alias("component"))
        names_weights = tuple(
            (n, float(w))
            for n, w in zip(
                ("train", "val", "test"),
                args.split_weights.split(","),
            )
        )
        sp = leakage_safe_split(comps, weights=names_weights, seed=args.seed)
        verdict = verdict.join(sp.select("doc_id", "split"), "doc_id")

    if args.temperature_sample:
        from xrpl_rich_list_py_crawler_spark.operators.curation import (
            temperature_sample,
        )

        toks = docs.select(
            "doc_id", "source",
            ts.token_count_col(F.col("text")).alias("n_tokens"),
        )
        tsamp = temperature_sample(toks, seed=args.seed).select(
            "doc_id",
            F.col("w").alias("temp_w"),
            F.col("rate").alias("temp_rate"),
            F.col("sampled").alias("temp_sampled"),
        )
        verdict = verdict.join(tsamp, "doc_id")

    verdict.write.mode("overwrite").parquet(args.out)
    back = spark.read.parquet(args.out)
    stats = {
        "rows": back.count(),
        "selected": back.filter("selected").count(),
        "quality_ok": back.filter("quality_ok").count(),
    }
    if args.splits:
        stats["splits"] = {
            r["split"]: r["count"]
            for r in back.groupBy("split").count().collect()
        }
    if args.temperature_sample:
        stats["temp_sampled"] = back.filter("temp_sampled").count()
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
