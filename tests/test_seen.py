"""Bloom-sharded seen set: pre-filter + exact repair ≡ naive anti-join."""

import numpy as np
from pyspark.sql import functions as F

from xrpl_rich_list_py_crawler_spark.operators.seen import (
    anti_join_seen,
    anti_join_seen_bloom,
    build_bloom_shards,
)


def _dfs(spark, n_seen=5000, n_cand=3000, overlap=1000):
    rng = np.random.RandomState(7)
    seen_hashes = rng.randint(-(2**62), 2**62, size=n_seen, dtype=np.int64)
    fresh = rng.randint(-(2**62), 2**62, size=n_cand - overlap, dtype=np.int64)
    cand_hashes = np.concatenate([seen_hashes[:overlap], fresh])
    seen = spark.createDataFrame(
        [(int(h), 1) for h in seen_hashes], "url_hash long, round int"
    )
    cand = spark.createDataFrame(
        [(int(h), f"u{i}") for i, h in enumerate(cand_hashes)],
        "url_hash long, url string",
    )
    return seen, cand, set(map(int, fresh))


def test_bloom_no_false_negatives(spark):
    seen, cand, _ = _dfs(spark)
    shards = build_bloom_shards(seen, n_shards=8)
    seen_np = np.array([r["url_hash"] for r in seen.collect()], dtype=np.int64)
    assert shards.maybe_contains(seen_np).all()  # every member flagged


def test_bloom_plus_repair_equals_exact(spark):
    seen, cand, fresh = _dfs(spark)
    exact = {r["url_hash"] for r in anti_join_seen(cand, seen).collect()}
    bloom = {
        r["url_hash"]
        for r in anti_join_seen_bloom(spark, cand, seen, n_shards=8).collect()
    }
    assert bloom == exact == fresh


def test_bloom_prefilter_is_selective(spark):
    """The point of the bloom: most unseen rows skip the anti-join."""
    seen, cand, fresh = _dfs(spark)
    shards = build_bloom_shards(seen, n_shards=8)
    cand_np = np.array(
        [r["url_hash"] for r in cand.select("url_hash").collect()], dtype=np.int64
    )
    maybe = shards.maybe_contains(cand_np)
    n_fresh_flagged = sum(
        1 for h, m in zip(cand_np, maybe) if m and int(h) in fresh
    )
    # false-positive rate on genuinely-unseen candidates well under 5%
    assert n_fresh_flagged / len(fresh) < 0.05


def test_empty_seen_passthrough(spark):
    _, cand, _ = _dfs(spark, n_seen=1, n_cand=100, overlap=0)
    assert anti_join_seen(cand, None).count() == 100
    assert anti_join_seen_bloom(spark, cand, None).count() == 100


def test_or_merge_executor_side_increment(spark):
    """Incremental path: base shards OR-merged with increment shards built
    at the SAME geometry ≡ shards built from the full ledger (no row data
    ever collected — only n_shards blobs)."""
    seen, cand, _ = _dfs(spark, n_seen=4000, n_cand=1, overlap=0)
    inc, _, _ = _dfs(spark, n_seen=1500, n_cand=1, overlap=0)
    base = build_bloom_shards(seen, n_shards=8, expected_keys=8000)
    inc_shards = build_bloom_shards(
        inc, n_shards=8, n_bits_override=base.n_bits
    )
    merged = base.or_merge(inc_shards)
    full = seen.unionByName(inc)
    # every key of the full ledger must be (maybe-)contained after the merge
    all_hashes = np.array(
        [r["url_hash"] for r in full.select("url_hash").collect()],
        dtype=np.int64,
    )
    assert merged.maybe_contains(all_hashes).all()
    assert merged.n_keys == 5500
    # geometry mismatch is an error, not silent corruption
    other = build_bloom_shards(inc, n_shards=8, n_bits_override=base.n_bits * 2)
    try:
        base.or_merge(other)
        raise AssertionError("expected ValueError on geometry mismatch")
    except ValueError:
        pass
