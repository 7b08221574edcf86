"""Cuckoo-filter seen-set fallback: membership, deletion, Spark parity."""

import numpy as np

from xrpl_rich_list_py_crawler_spark.operators.cuckoo import (
    CuckooFilter,
    anti_join_seen_cuckoo,
    build_cuckoo_shards,
)
from xrpl_rich_list_py_crawler_spark.operators.seen import anti_join_seen


def test_cuckoo_no_false_negatives_and_delete():
    filt = CuckooFilter(capacity=10_000)
    rng = np.random.RandomState(5)
    keys = rng.randint(-(2**62), 2**62, size=5_000, dtype=np.int64).tolist()
    for k in keys:
        filt.add(k)
    assert all(filt.contains(k) for k in keys)
    # delete half; deleted keys (mostly) gone, kept keys all present
    for k in keys[:2500]:
        assert filt.delete(k)
    assert all(filt.contains(k) for k in keys[2500:])
    still = sum(filt.contains(k) for k in keys[:2500])
    assert still < 2500 * 0.05  # only fp-collision remnants


def test_cuckoo_low_false_positive_rate():
    filt = CuckooFilter(capacity=10_000)
    rng = np.random.RandomState(6)
    keys = rng.randint(-(2**62), 2**62, size=5_000, dtype=np.int64)
    for k in keys.tolist():
        filt.add(k)
    probe = rng.randint(-(2**62), 2**62, size=5_000, dtype=np.int64)
    fresh = np.setdiff1d(probe, keys)
    fp = filt.maybe_contains(fresh).sum()
    assert fp / len(fresh) < 0.01


def test_cuckoo_anti_join_equals_exact(spark):
    rng = np.random.RandomState(7)
    seen_h = rng.randint(-(2**62), 2**62, size=4000, dtype=np.int64)
    cand_h = np.concatenate(
        [seen_h[:500], rng.randint(-(2**62), 2**62, size=1500, dtype=np.int64)]
    )
    seen = spark.createDataFrame(
        [(int(h), 1) for h in seen_h], "url_hash long, round int"
    )
    cand = spark.createDataFrame(
        [(int(h), f"u{i}") for i, h in enumerate(cand_h)],
        "url_hash long, url string",
    )
    exact = {r["url_hash"] for r in anti_join_seen(cand, seen).collect()}
    cuckoo = {
        r["url_hash"]
        for r in anti_join_seen_cuckoo(spark, cand, seen, n_shards=8).collect()
    }
    assert cuckoo == exact


def test_cuckoo_shards_recrawl_deletion(spark):
    rng = np.random.RandomState(8)
    seen_h = rng.randint(-(2**62), 2**62, size=2000, dtype=np.int64)
    seen = spark.createDataFrame(
        [(int(h), 1) for h in seen_h], "url_hash long, round int"
    )
    shards = build_cuckoo_shards(seen, n_shards=8)
    assert shards.maybe_contains(seen_h).all()
    # force re-crawl of 100 urls: delete from the pre-filter
    recrawl = seen_h[:100]
    n = shards.delete_hashes(recrawl)
    assert n == 100
    remaining = shards.maybe_contains(recrawl).sum()
    assert remaining < 10  # fp remnants only — deleted keys now pass the gate
    assert shards.maybe_contains(seen_h[100:]).all()
