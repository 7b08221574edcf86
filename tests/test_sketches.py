"""Deterministic sketches: HLL accuracy/merge law/exact-integer state,
count-min upper-bound guarantee/linearity/bounded size, HDR-histogram
quantile accuracy/merge law/bounded bins."""

import pytest
from pyspark.sql import functions as F

from xrpl_rich_list_py_crawler_spark.operators.sketches import (
    cm_counters,
    cm_estimate,
    cm_merge,
    hdr_bins,
    hdr_merge,
    hdr_quantiles,
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


@pytest.fixture(scope="module")
def stream(spark):
    # zipf-ish: item i appears (200 - i) times for i in 0..199
    rows = [(f"item{i}",) for i in range(200) for _ in range(200 - i)]
    return spark.createDataFrame(rows, "v string")


def test_cm_never_undercounts_and_is_tight_for_heavy_items(spark, stream):
    """The count-min guarantee: est >= true for EVERY item; with
    depth=4 × width=2048 and ~20k increments the collision mass is
    small, so heavy items are near-exact."""
    counters = cm_counters(stream, "v", depth=4, width=2048)
    probes = stream.select("v").distinct()
    est = {
        r.value: r.est_count
        for r in cm_estimate(counters, probes, "v", depth=4, width=2048)
        .collect()
    }
    for i in range(200):
        true = 200 - i
        assert est[f"item{i}"] >= true, (i, true, est[f"item{i}"])
    # heaviest item: overcount bounded by e*N/width expectation; assert
    # a generous 2x margin over the deterministic fixture
    assert est["item0"] <= 200 + 2 * (20100 // 2048 + 1)


def test_cm_absent_item_bounded_by_collision_mass(spark, stream):
    counters = cm_counters(stream, "v", depth=4, width=2048)
    probes = spark.createDataFrame([("never-seen",)], "v string")
    (row,) = cm_estimate(counters, probes, "v", depth=4, width=2048).collect()
    # min over 4 independent rows of expected load ~10: tiny, never huge
    assert 0 <= row.est_count < 100


def test_cm_merge_equals_whole(spark, stream):
    """Count-min linearity: counters built on disjoint halves and merged
    by (depth, bucket) sum equal counters built on the whole stream."""
    a = stream.filter(F.crc32(F.col("v")) % 2 == 0)
    b = stream.filter(F.crc32(F.col("v")) % 2 == 1)
    merged = cm_merge(cm_counters(a, "v"), cm_counters(b, "v"))
    whole = cm_counters(stream, "v")
    assert sorted(merged.collect()) == sorted(whole.collect())


def test_cm_counter_table_is_bounded(spark, stream):
    """The scale contract: the counter table never exceeds depth×width
    rows no matter the stream size."""
    assert cm_counters(stream, "v", depth=4, width=64).count() <= 4 * 64


@pytest.fixture(scope="module")
def latencies(spark):
    # two keys with very different shapes: uniform 1..1000 ms and a
    # heavy-tailed (quadratic) spread over the same range
    rows = [("uni", 0.001 * i) for i in range(1, 1001)]
    rows += [("tail", 0.001 * (i * i // 1000 + 1)) for i in range(1, 1001)]
    return spark.createDataFrame(rows, "key string, v double")


def test_hdr_quantiles_within_relative_bin_width(spark, latencies):
    """Each reported quantile must sit within one bin (relative
    2^-sub_bits, plus the fixed-point epsilon) BELOW the exact
    per-key sorted quantile — the HDR under-estimate contract."""
    import math

    got = {r.key: r for r in hdr_quantiles(
        hdr_bins(latencies, "key", "v")).collect()}
    data = {
        k: sorted(
            r.v for r in latencies.filter(F.col("key") == k).collect()
        )
        for k in ("uni", "tail")
    }
    for k, arr in data.items():
        for q in (50, 95, 99):
            exact = arr[math.ceil(q / 100 * len(arr)) - 1]
            est = getattr(got[k], f"q{q}")
            assert est <= exact + 1e-9, (k, q, est, exact)
            assert est >= exact * (1 - 2 ** -7) - 2e-6, (k, q, est, exact)


def test_hdr_merge_equals_whole(spark, latencies):
    a = latencies.filter(F.crc32(F.col("v").cast("string")) % 2 == 0)
    b = latencies.filter(F.crc32(F.col("v").cast("string")) % 2 == 1)
    merged = hdr_merge(hdr_bins(a, "key", "v"), hdr_bins(b, "key", "v"))
    assert sorted(merged.collect()) == \
        sorted(hdr_bins(latencies, "key", "v").collect())


def test_hdr_bins_bounded_and_partition_invariant(spark, latencies):
    bins = hdr_bins(latencies, "key", "v")
    # log-scaled: 1000 distinct values in 1..1000 compress to a bounded
    # bin table (64 msb positions x 2^7 sub-buckets is the hard ceiling;
    # this fixture lands far below it)
    assert bins.count() < 800
    redistributed = hdr_bins(latencies.repartition(17), "key", "v")
    assert sorted(bins.collect()) == sorted(redistributed.collect())


# ---------------------------------------------------------------------------
# heavy hitters (Misra-Gries candidates + exact verify)
# ---------------------------------------------------------------------------

from xrpl_rich_list_py_crawler_spark.operators.sketches import (  # noqa: E402
    heavy_hitters,
    misra_gries_candidates,
)


@pytest.fixture(scope="module")
def hh_corpus(spark):
    # zipf-ish stream: token t_i appears ~600/i times, plus a long tail
    # of singletons; total ~ 600*H(8) + 500
    rows = []
    for i in range(1, 9):
        rows += [(f"t{i} " * (600 // i)).strip() for _ in range(1)]
    rows += [f"tail{j}" for j in range(500)]
    # spread across many partitions to stress per-partition MG
    return spark.createDataFrame(
        [(r,) for r in rows], "text string"
    ).repartition(16)


def _py_heavy_hitters(docs, k):
    from collections import Counter

    c = Counter()
    for (t,) in docs:
        for tok in t.strip().lower().split():
            if tok:
                c[tok] += 1
    total = sum(c.values())
    return {t: n for t, n in c.items() if n * k > total}


def test_heavy_hitters_exact_vs_python(spark, hh_corpus):
    docs = [(r.text,) for r in hh_corpus.collect()]
    for k in (3, 10, 50):
        want = _py_heavy_hitters(docs, k)
        got = {r.token: r.cnt for r in heavy_hitters(
            hh_corpus, k, prefilter=False).collect()}
        assert got == want, k


def test_heavy_hitters_prefilter_is_lossless(spark, hh_corpus):
    """The MG candidate pass may only REMOVE work, never answers:
    prefilter=True == prefilter=False for every k (the no-false-negative
    guarantee, value-checked under 16-way partitioning)."""
    for k in (3, 10, 50):
        naive = sorted(heavy_hitters(
            hh_corpus, k, prefilter=False).collect())
        fast = sorted(heavy_hitters(
            hh_corpus, k, prefilter=True).collect())
        assert fast == naive, k


def test_misra_gries_candidate_bound_and_coverage(spark, hh_corpus):
    """<= k-1 candidates per partition, and every true heavy hitter is
    in the union (the pigeonhole guarantee the verify pass relies on)."""
    k = 10
    cand = misra_gries_candidates(hh_corpus, k)
    per_part = (
        cand.withColumn("pid", F.spark_partition_id())
        .groupBy("pid").count().collect()
    )
    assert all(r["count"] <= k - 1 for r in per_part)
    docs = [(r.text,) for r in hh_corpus.collect()]
    want = set(_py_heavy_hitters(docs, k))
    got = {r.token for r in cand.collect()}
    assert want <= got


def test_heavy_hitters_k2_and_bad_k(spark):
    one = spark.createDataFrame(
        [("a a a b",)], "text string"
    )
    # 'a' has 3 of 4 tokens: 3*2 > 4 -> heavy at k=2
    assert [(r.token, r.cnt) for r in heavy_hitters(one, 2).collect()] \
        == [("a", 3)]
    with pytest.raises(ValueError):
        misra_gries_candidates(one, 1)
