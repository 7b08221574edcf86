"""Deterministic HLL: accuracy, merge law, exact-integer state."""

import pytest
from pyspark.sql import functions as F

from xrpl_rich_list_py_crawler_spark.operators.sketches import (
    hll_distinct,
    hll_estimate,
    hll_merge,
    hll_registers,
)


@pytest.fixture(scope="module")
def ledger(spark):
    # 3 keys with very different cardinalities; values overlap across
    # keys (the sketch must not care)
    rows = [(k, v % n) for k, n in [(0, 5), (1, 800), (2, 3000)]
            for v in range(6000)]
    return spark.createDataFrame(rows, "key int, value long")


def test_hll_accuracy(spark, ledger):
    exact = {
        r.key: r.n
        for r in ledger.groupBy("key")
        .agg(F.countDistinct("value").alias("n"))
        .collect()
    }
    est = {r.key: r.est_distinct for r in hll_distinct(
        ledger, "key", "value").collect()}
    for k, n in exact.items():
        rel = abs(est[k] - n) / n
        # p=12 -> sigma ~ 1.04/sqrt(4096) ~ 1.6%; allow 4 sigma
        assert rel < 0.07, (k, n, est[k])
    # tiny key rides the linear-counting branch and lands very close
    assert abs(est[0] - 5) < 1


def test_hll_merge_equals_union(spark, ledger):
    """Sketch-of-union == merge-of-sketches (the HLL distributivity
    law that makes registers persistable and cross-run mergeable)."""
    a = ledger.filter("value % 2 = 0")
    b = ledger.filter("value % 2 = 1")
    merged = hll_estimate(
        hll_merge(
            hll_registers(a, "key", "value"),
            hll_registers(b, "key", "value"),
        )
    )
    whole = hll_distinct(ledger, "key", "value")
    assert sorted(merged.collect()) == sorted(whole.collect())


def test_hll_insensitive_to_duplication_and_partitioning(spark, ledger):
    """Estimates are a pure function of the value SET: duplicating
    every row and changing partitioning must not move a single bit
    (the exact-integer harmonic sum is reduction-order-free)."""
    doubled = ledger.unionByName(ledger).repartition(13)
    assert sorted(hll_distinct(doubled, "key", "value").collect()) == \
        sorted(hll_distinct(ledger, "key", "value").collect())
