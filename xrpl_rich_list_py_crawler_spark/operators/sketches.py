"""Deterministic, engine-portable sketches: HyperLogLog cardinality
(Flajolet et al. 2007) and count-min frequency (Cormode & Muthukrishnan
2005).

``approx_count_distinct`` exists, but its HLL++ registers are engine-
private: no oracle can check them and no other system can merge them.
This module builds the sketch from ENGINE-PORTABLE primitives — the
md5-hex uniform hash every sampling operator here already uses, register
math in exact integers — so (a) the DuckDB twin reproduces the estimate
bit-for-bit, (b) register tables can be persisted/merged across runs and
engines (the union of two sketches is a groupBy-max — see
:func:`hll_merge`), and (c) the only float ops are a literal-constant
formula and one ``ln``, both IEEE-deterministic.

Why a sketch at all: "distinct URLs per host" over a 10^10-row fetch
ledger as an exact ``countDistinct`` is a full shuffle of every distinct
(host, url) pair; the sketch shuffles at most ``m`` = 2^p register rows
per host (map-side combined), a constant, whatever the corpus size.

Exactness note: the 2^-rho harmonic sum is computed as
``sum(2^(S-rho))`` in BIGINT with ``S = 61 - p`` — every term is an
exact power of two and integer addition is order-free, so the estimate
does not depend on partitioning or reduction order (float summation
would). ``S`` is the unique exact choice: it must be ≥ max rho
(``61-p``, so 2^(S-rho) stays integral) while ``2^p · 2^S < 2^63``
(so a sketch of all-empty registers cannot overflow the signed sum).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: md5-hex prefix bits used as the uniform hash (15 hex chars = 60 bits
#: keeps the value positive in a signed BIGINT in both engines)
HASH_BITS = 60


def _hash60(value):
    return F.conv(
        F.substring(F.md5(value.cast("string")), 1, 15), 16, 10
    ).cast("bigint")


def hll_registers(
    df: DataFrame,
    key_col: str,
    value_col: str,
    p: int = 12,
) -> DataFrame:
    """Per-key HLL register table: (key, bucket, rho) with
    ``rho = max`` over the key's values landing in that bucket.

    bucket = low ``p`` hash bits; rho = 1 + leading-zero count of the
    remaining ``60-p`` bits (bit_length via base-2 digit count — no
    float log, so register values are exact in both engines). One
    map-side-combined shuffle keyed by (key, bucket): ≤ 2^p rows per key
    survive regardless of input size.
    """
    m = 1 << p
    width = HASH_BITS - p
    h = _hash60(F.col(value_col))
    # integer shift, NOT h/m: a double division would round 60-bit
    # hashes (> 2^53) before the cast
    w = F.shiftright(h, p)
    rho = F.when(w == 0, F.lit(width + 1)).otherwise(
        F.lit(width) - F.length(F.conv(w, 10, 2)) + F.lit(1)
    )
    return (
        df.select(
            F.col(key_col).alias("key"),
            (h % m).alias("bucket"),
            rho.cast("int").alias("rho"),
        )
        .groupBy("key", "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(*register_tables: DataFrame) -> DataFrame:
    """Sketch union: registers from different runs/partitions/engines
    merge by per-(key, bucket) max — the HLL property that makes the
    sketch distributable and incrementally maintainable."""
    out = register_tables[0]
    for t in register_tables[1:]:
        out = out.unionByName(t)
    return out.groupBy("key", "bucket").agg(F.max("rho").alias("rho"))


def hll_estimate(registers: DataFrame, p: int = 12) -> DataFrame:
    """Registers → per-key cardinality estimate.

    Standard HLL with the linear-counting small-range correction:
    ``raw = alpha_m * m^2 / sum_j 2^-rho_j`` (empty buckets contribute
    2^0), switched to ``m * ln(m/V)`` when ``raw <= 2.5m`` and V (empty
    buckets) > 0. The harmonic sum is exact-integer (module note);
    ``ln`` is the single transcendental. Output: key, used_buckets,
    int_sum (the exact state, the real oracle surface), est_distinct
    (rounded to 4 decimals).
    """
    m = 1 << p
    s = HASH_BITS + 1 - p  # see module docstring: exact AND overflow-safe
    alpha = 0.7213 / (1.0 + 1.079 / m)
    agg = registers.groupBy("key").agg(
        F.count(F.lit(1)).alias("used_buckets"),
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {s} - rho)")
        ).alias("_nz_sum"),
    )
    int_sum = (
        F.col("_nz_sum")
        + (F.lit(m) - F.col("used_buckets"))
        * F.lit(1 << s).cast("bigint")
    )
    raw = (
        F.lit(alpha)
        * F.lit(float(m))
        * F.lit(float(m))
        * F.lit(float(1 << s))
        / int_sum.cast("double")
    )
    v = (F.lit(m) - F.col("used_buckets")).cast("double")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v),
    ).otherwise(raw)
    return agg.select(
        "key",
        F.col("used_buckets").cast("int").alias("used_buckets"),
        int_sum.alias("int_sum"),
        F.round(est, 4).alias("est_distinct"),
    )


def hll_distinct(
    df: DataFrame, key_col: str, value_col: str, p: int = 12
) -> DataFrame:
    """Distinct ``value_col`` per ``key_col``, sketched: registers →
    estimate. Two same-key shuffles, both map-side combined; ≤ 2^p rows
    per key ever cross the wire."""
    return hll_estimate(hll_registers(df, key_col, value_col, p), p)


# ---------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan 2005): frequency estimation
# over an unbounded stream in depth × width integer counters
# ---------------------------------------------------------------------------
#
# Same portability stance as the HLL above: the d row hashes are
# md5-hex of ``'<j>:' || value`` (j = 0..depth-1 stands in for the d
# independent hash functions), counters are exact BIGINT sums, so the
# counter table is reproducible in DuckDB, order-free, and mergeable
# across runs/engines by (depth, bucket) sum. The sketch never exceeds
# ``depth × width`` rows no matter how many items stream through —
# frequency tracking over a 10^12-token corpus shuffles a constant.


def _cm_bucket(value, j: int, width: int):
    return (_hash60(F.concat(F.lit(f"{j}:"), value.cast("string"))) % width).cast(
        "int"
    )


def cm_counters(
    df: DataFrame, value_col: str, depth: int = 4, width: int = 2048
) -> DataFrame:
    """Count-min counter table (depth, bucket, cnt) over ``value_col``.

    Each input row increments one bucket per depth row; the explode is
    ``depth`` structs per row (a constant), then ONE map-side-combined
    groupBy — at most ``depth × width`` rows survive the shuffle
    regardless of input size. Missing (never-hit) buckets are implicit
    zeros; :func:`cm_estimate` coalesces them."""
    v = F.col(value_col)
    cells = F.array(
        *[
            F.struct(
                F.lit(j).alias("depth"), _cm_bucket(v, j, width).alias("bucket")
            )
            for j in range(depth)
        ]
    )
    return (
        df.select(F.explode(cells).alias("c"))
        .select("c.depth", "c.bucket")
        .groupBy("depth", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cm_merge(*counter_tables: DataFrame) -> DataFrame:
    """Sketch union: counter tables from different runs/partitions/
    engines merge by per-(depth, bucket) SUM (count-min linearity)."""
    out = counter_tables[0]
    for t in counter_tables[1:]:
        out = out.unionByName(t)
    return out.groupBy("depth", "bucket").agg(F.sum("cnt").alias("cnt"))


def cm_estimate(
    counters: DataFrame,
    items: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 2048,
) -> DataFrame:
    """Point-query the sketch: estimated count per ``items`` row
    (min over the item's ``depth`` counters — the count-min upper-bound
    estimator; never under-counts, over-counts by collision mass).

    ``depth`` and ``width`` MUST match the :func:`cm_counters` call.
    The probe explodes ``depth`` rows per item and joins the counter
    table on (depth, bucket); the counter side is ≤ depth × width rows
    → broadcast, so the lookup is shuffle-free on the probe side."""
    v = F.col(value_col)
    cells = F.array(
        *[
            F.struct(
                F.lit(j).alias("depth"), _cm_bucket(v, j, width).alias("bucket")
            )
            for j in range(depth)
        ]
    )
    probes = items.select(
        v.alias("value"), F.explode(cells).alias("c")
    ).select("value", "c.depth", "c.bucket")
    joined = probes.join(
        F.broadcast(counters), ["depth", "bucket"], "left"
    ).select("value", F.coalesce("cnt", F.lit(0)).alias("cnt"))
    return joined.groupBy("value").agg(F.min("cnt").alias("est_count"))


# ---------------------------------------------------------------------------
# Quantile histogram (HdrHistogram-style log-scaled integer binning):
# per-key latency/size percentiles without sorting the data
# ---------------------------------------------------------------------------
#
# An exact per-key quantile is a per-key SORT of every observation — a
# 10^10-row fetch-latency ledger cannot afford it, and Spark's own
# percentile_approx (like approx_count_distinct) keeps its state
# engine-private. This sketch is pure integer math end to end:
#
#   1. fixed-point the value to micro-units  m = round(v * 2^20)
#   2. keep the top SUB_BITS significant bits: with msb = bit_length(m),
#      shift = max(0, msb - SUB_BITS), the bin is (m >> shift) << shift
#      — the LOWER BOUND of a log-scaled bucket whose relative width is
#      2^-SUB_BITS (~0.8% at the default 7 bits)
#
# bit_length comes from the base-2 digit count (the HLL rho trick), so
# there is NO float log anywhere — bins are bit-identical across
# engines, partitionings, and merge orders. Bins per key are bounded by
# SUB_BITS-ish buckets × 64 possible msb positions (a few thousand),
# whatever the observation count, so the per-key cumulative-sum window
# in :func:`hdr_quantiles` runs on a tiny key-partitioned frame — never
# a global window. Merge across runs/shards/engines = (key, bin) SUM.

#: fixed-point scale: 2^20 micro-ish units — exact to ~1e-6 of the raw
#: value, and round() is half-up for positives in both engines
HDR_SCALE = 1 << 20

#: significant bits kept per bucket: relative bin width 2^-7 ≈ 0.8%
HDR_SUB_BITS = 7


def _hdr_bin(value, sub_bits: int):
    m = F.greatest(
        F.round(value.cast("double") * F.lit(float(HDR_SCALE))).cast("bigint"),
        F.lit(0).cast("bigint"),
    )
    msb = F.length(F.conv(m, 10, 2))  # bit_length; '0' has length 1
    shift = F.greatest(msb - F.lit(sub_bits), F.lit(0))
    # (m >> shift) << shift, spelled m - m % 2^shift: Spark's shiftleft/
    # shiftright builtins take a PYTHON-int bit count, not a Column.
    # pow(2, shift) is a power of two ≤ 2^57 — exact as a double, exact
    # through the bigint cast
    twopow = F.pow(F.lit(2.0), shift.cast("double")).cast("bigint")
    return m - m % twopow


def hdr_bins(
    df: DataFrame,
    key_col: str,
    value_col: str,
    sub_bits: int = HDR_SUB_BITS,
) -> DataFrame:
    """Per-key histogram table (key, bin, cnt); ``bin`` is the bucket's
    inclusive lower bound in fixed-point units. One map-side-combined
    groupBy; a few thousand rows per key survive at any input size."""
    return (
        df.select(
            F.col(key_col).alias("key"),
            _hdr_bin(F.col(value_col), sub_bits).alias("bin"),
        )
        .groupBy("key", "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hdr_merge(*bin_tables: DataFrame) -> DataFrame:
    """Histogram union: per-(key, bin) SUM (linear, order-free)."""
    out = bin_tables[0]
    for t in bin_tables[1:]:
        out = out.unionByName(t)
    return out.groupBy("key", "bin").agg(F.sum("cnt").alias("cnt"))


def hdr_quantiles(
    bins: DataFrame, quantiles: Sequence[float] = (0.5, 0.95, 0.99)
) -> DataFrame:
    """Histogram → per-key quantile estimates: one output column per
    requested quantile (``q50``, ``q95``, … — the ``int(q*100)`` name),
    each the lower bound (in raw value units) of the first bin whose
    cumulative count reaches ``ceil(q * n)``. Underestimates by at most
    one bin width (relative 2^-sub_bits).

    The cumulative sum runs per key over the bounded bin table —
    key-partitioned window, never global."""
    w = (
        Window.partitionBy("key")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = bins.select(
        "key",
        "bin",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(Window.partitionBy("key")).alias("total"),
    )
    aggs = [F.count(F.lit(1)).alias("n_bins")]
    for q in quantiles:
        hit = F.when(
            F.col("cum") >= F.ceil(F.lit(q) * F.col("total")), F.col("bin")
        )
        aggs.append(
            (F.min(hit) / F.lit(float(HDR_SCALE))).alias(f"q{int(q * 100)}")
        )
    return cum.groupBy("key").agg(*aggs)


# ---------------------------------------------------------------------------
# Deterministic heavy hitters (Misra & Gries 1982 candidate prefilter)
# ---------------------------------------------------------------------------

def misra_gries_candidates(
    df: DataFrame, k: int, text_col: str = "text"
) -> DataFrame:
    """Per-partition Misra–Gries frequent-item summaries over the token
    stream: at most ``k - 1`` candidate tokens PER PARTITION, with the
    classic guarantee that every token whose partition frequency exceeds
    ``n_p / k`` survives the decrement process. Since a GLOBAL heavy
    hitter (count·k > total) must exceed ``n_p / k`` in at least one
    partition (pigeonhole over the partition sum), the union of the
    per-partition candidate sets contains every global heavy hitter —
    no false negatives, ever; false positives are removed by the exact
    verify pass in :func:`heavy_hitters`.

    This is the module's one Python-side operator, and deliberately so:
    bounded-state stream summaries are not expressible in DataFrame ops
    (an aggregate may not drop state), while ``mapInPandas`` gives each
    partition exactly the sequential access MG needs. The Python cost is
    bounded: a dict of < k counters per task, Arrow-batched input, and
    the output is ≤ (k-1)·P tiny rows — the corpus itself never leaves
    the JVM for the verify pass.

    Tokenization matches the engine's portable whitespace class
    (textstats.WS — the explicit ``[ \\t\\n\\r\\f\\x0b]+`` set, NOT
    ``\\s``) so the candidate guarantee holds for the exact same token
    stream the JVM verify pass counts.
    """
    import re

    if k < 2:
        raise ValueError("heavy-hitter k must be >= 2")
    pat = re.compile("[ \t\n\r\f\x0b]+")

    def mg(batches):
        import pandas as pd

        counters: dict[str, int] = {}
        for pdf in batches:
            for text in pdf[text_col]:
                if text is None:
                    continue
                for tok in pat.split(str(text).strip().lower()):
                    if not tok:
                        continue
                    if tok in counters:
                        counters[tok] += 1
                    elif len(counters) < k - 1:
                        counters[tok] = 1
                    else:
                        for t in list(counters):
                            counters[t] -= 1
                            if counters[t] == 0:
                                del counters[t]
        yield pd.DataFrame({"token": list(counters.keys())})

    return df.select(F.col(text_col).alias(text_col)).mapInPandas(
        mg, "token string"
    )


def heavy_hitters(
    docs: DataFrame,
    k: int,
    text_col: str = "text",
    prefilter: bool = True,
) -> DataFrame:
    """Exact heavy hitters over the corpus token stream: every token
    whose count satisfies ``count * k > total_tokens`` (the classic
    strict ``> n/k`` definition), with exact counts — integer-only
    comparisons, so the result is engine-portable with no float margin.

    Scale shape: the naive plan shuffles the FULL token vocabulary
    (billions of distinct tokens on a web corpus — typo/boilerplate long
    tail) just to keep < k of them. With ``prefilter=True`` the
    Misra–Gries pass (:func:`misra_gries_candidates`) first reduces the
    candidate set to ≤ (k-1)·P tokens with zero false negatives; the
    JVM verify pass then broadcast-semi-joins the exploded token stream
    against that candidate set BEFORE the groupBy, so the only wide
    shuffle carries candidate tokens only. Total-token count is a 1-row
    aggregate → broadcast crossJoin (the engine's A1 pattern). Two
    corpus scans, both linear; no full-vocabulary shuffle anywhere.

    ``prefilter=False`` runs the naive single-scan plan (fine at test
    scale; the oracle-checked query runs prefilter=True so the
    no-false-negative guarantee is value-checked, not just asserted).
    """
    from .textstats import WS

    toks = docs.select(
        F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), WS)
        ).alias("token")
    ).filter(F.col("token") != "")
    total = toks.agg(F.count(F.lit(1)).alias("total_tokens"))
    counted = toks
    if prefilter:
        cand = misra_gries_candidates(docs, k, text_col).distinct()
        counted = toks.join(F.broadcast(cand), "token", "left_semi")
    counts = counted.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * F.lit(int(k)) > F.col("total_tokens"))
        .select("token", "cnt")
    )
