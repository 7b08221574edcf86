"""Physical-plan audit: dump `.explain("formatted")` for the headline
queries into PLANS.md so plan shape is reviewable without a Spark session.

What to look for (the audit criteria the engine is built to):
* parquet scans show `PushedFilters` / a pruned `ReadSchema` — predicates
  and projections reach the source;
* `WholeStageCodegen` spans cover the scalar work — Python appears only
  as the single text-extraction ArrowEvalPython in the crawl parse stage;
* joins against small dims are `BroadcastHashJoin`; no
  `CartesianProduct`, and `BroadcastNestedLoopJoin` only in its benign
  scalar form — a 1-row ungrouped-aggregate broadcast
  (`IdentityBroadcastMode`, the A1 "grand total via agg + broadcast"
  pattern: linear, never quadratic). A BNLJ whose build side is NOT such
  a scalar is a violation;
* rankings use `rangepartitioning` (two-phase), never a SinglePartition
  global window.

Usage: python scripts/plan_audit.py [sf_dir] — writes PLANS.md.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

#: queries whose plans are the engine's load-bearing shapes
AUDITED = [
    "a2_lineitem_agg",        # map-side partial agg
    "j4_region_rollup",       # broadcast dim chain
    "w1_order_rank",          # two-phase global rank
    "j5_asof_user_value",     # as-of via window rank
    "url_canonicalization",   # Arrow UDF + fast path
    "dedup_exact",            # hash-groupBy + semi join
    "minhash_neardups",       # banded LSH bucket join
    "ann_lsh",                # JVM hyperplane buckets
    "lang_id",                # pure-Column text op
    "robots_txt_parse",       # JVM robots grammar
    "sitemap_parse",          # JVM sitemap grammar
    "pii_redaction",          # chained regexp passes
    "domain_cap",             # per-key window quota
    "corpus_curation",        # composed curation pass
    "unigram_quality",        # r05: TakeOrderedAndProject vocab cut
    "repetition_stats",       # r05: two-level (doc,term)→(doc) groupBy
    "ngram_contamination_hashed",  # r05: hashed grams + bloom prefilter
    "media_decode",           # r05: mapInPandas container decode
    "seq_packing",            # r05: two-phase prefix sum + span explode
    "bpe_merge_pairs",        # r05: distinct-unit pair top-k
    "host_pagerank",          # r05: per-iteration keyed join (int PageRank)
    "sessionization",         # r05: per-user gaps-and-islands windows
    # final session (bpe_train/bpe_encode_counts and leakage_safe_split
    # are excluded: their CONSTRUCTION executes jobs — argmax collects /
    # iterative components — so an explain-only audit cannot hold them)
    "gopher_quality",         # 7-rule gate, shuffle-free codegen
    "soft_dedup",             # md5-keyed agg + join back
    "nofollow_links",         # REP tag grammar, regexp/array codegen
    "mime_sniff",             # hex-prefix when-chain router
    "text_normalize",         # replace-chain hygiene pass
    "shard_assignment",       # two-phase prefix-sum sharding
    "minhash_incremental",    # final session: stream-shape band equi-join
    "kn_doc_quality",         # final session: LM dim join + count/min agg
    # construction executes the 3 Lloyd iterations (driver centroid
    # collects, like bpe_train) — but unlike bpe_train the RETURNED
    # plan is exactly the per-iteration assignment shape (centroid
    # literals in codegen: no join, no exchange), so the audit holds it
    "kmeans_embeddings",
    "ccnet_buckets",          # two-phase prefix-sum corpus split
    "host_hits",              # per-half-step keyed join (integer HITS)
    "lang_segments",          # shuffle-free per-paragraph langid
    "temperature_sample",     # sqrt-mass dim + broadcast verdicts
    "epoch_shuffle",          # two-phase permutation rank
    "webdataset_roundtrip",   # shard groupBy + file-per-task parse
    "pmi_phrases",            # dual-count dim joins + top-k
    "canonical_by_quality",   # comp-partitioned quality window
    "badwords_filter",        # distinct-token × broadcast word dim
    "chunk_documents",        # shuffle-free windowed explode
    "chunk_retrieval",        # broadcast Q·N exact-integer ranking
    "phrase_blocklist",       # codegen sentinel-stream position checks
    "heavy_hitters",          # MG candidate prefilter + broadcast verify
    "stratified_sample",      # stratum-partitioned quota window
    "threshold_sweep",        # two-phase rank deciles + k-row cum window
    "postings_compact",       # one-groupBy LSM fold of a delta stack
    "weighted_sample",        # A-ES stratum-partitioned quota window
    "snm_pairs",              # two-phase rank + skew-free block equi join
    "template_fingerprint",   # codegen tag grammar + one md5-key groupBy
    "margin_pairs",           # query-keyed rank/cum windows over candidates
    "phrase_search",          # broadcast phrase dim + (doc,anchor) groupBy
    "dsir_select",            # dsir dim joins + A-ES TakeOrderedAndProject
    "proximity_search",       # bitmask bit_or RANGE window, doc-keyed
    "containment_pairs",      # SNM block join + candidate-only gram sets
    "url_templates",          # codegen path grammar + one (host,tmpl) groupBy
    "winnow_clones",          # fp-keyed self join + (id_a,id_b) groupBy
    "host_quality_rank",      # codegen gates + host groupBy + two-phase rank
    "multi_block_dedup",      # 3-geometry candidate union + gram verify
    "mirror_hosts",           # content-hash self-join, too-common capped
    # trust_rank excluded like kmeans/bpe_train: construction executes
    # the seed count + per-iteration localCheckpoints, so an explain-only
    # audit cannot hold it; its plan shape is host_pagerank's (audited
    # via the same per-iteration keyed-join kernel)
]

BAD_NODES = ("CartesianProduct",)


def _bnlj_violations(plan: str) -> bool:
    """True iff a BroadcastNestedLoopJoin appears whose build side is not
    the benign 1-row scalar-aggregate broadcast (IdentityBroadcastMode)."""
    n_bnlj = plan.count("BroadcastNestedLoopJoin (")
    n_scalar = plan.count("IdentityBroadcastMode")
    return n_bnlj > n_scalar


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry

    qs = entry.queries()
    sections = []
    violations = []
    for name in AUDITED:
        df = qs[name](spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue().rstrip()
        for bad in BAD_NODES:
            if bad in plan:
                violations.append((name, bad))
        if _bnlj_violations(plan):
            violations.append((name, "non-scalar BroadcastNestedLoopJoin"))
        n_python = (
            plan.count("ArrowEvalPython")
            + plan.count("BatchEvalPython")
            + plan.count("MapInPandas")
            + plan.count("FlatMapGroupsInPandas")
        )
        sections.append(
            f"## {name}\n\n"
            f"Python-eval nodes: {n_python}\n\n"
            f"```\n{plan}\n```\n"
        )
    header = (
        "# PLANS.md — formatted physical plans of the audited queries\n\n"
        f"Generated by scripts/plan_audit.py at {os.path.basename(SF_DIR)}; "
        "regenerate after any plan-shaping change. Audit criteria are in "
        "the script docstring; tests/test_plan_quality.py pins the "
        "load-bearing assertions so regressions fail CI, this file is the "
        "human-readable evidence.\n\n"
    )
    if violations:
        header += "**VIOLATIONS FOUND:** " + ", ".join(
            f"{n}: {b}" for n, b in violations
        ) + "\n\n"
    with open(os.path.join(REPO, "PLANS.md"), "w") as f:
        f.write(header + "\n".join(sections))
    spark.stop()
    print(f"wrote PLANS.md ({len(AUDITED)} plans, {len(violations)} violations)")
    if violations:
        sys.exit(1)


if __name__ == "__main__":
    main()
