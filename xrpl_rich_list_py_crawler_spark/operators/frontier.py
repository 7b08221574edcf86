"""Frontier priority ordering, skew-defeating repartition, scalable rank.

Generalizes the reference's sort-then-enumerate ranking
(``loader.py:163,189``: ``sorted(..., reverse=True)`` + ``enumerate(_, 1)``)
to 10^10-row frontiers: never a single-partition window, never a driver
collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

def order_cols() -> list:
    """Global frontier priority (north_rule): (depth, host_rank desc,
    discovery_ts, url_hash) — url_hash makes the order total, so crawl order
    is identical at any parallelism (local[8] == local[32] invariant).

    Built lazily (not a module constant): Column construction needs an
    active SparkContext, and this module is also imported by Python workers
    deserializing operator closures.
    """
    return [
        F.col("depth").asc(),
        F.col("host_rank").desc(),
        F.col("discovery_ts").asc(),
        F.col("url_hash").asc(),
    ]


def priority_order(df: DataFrame) -> DataFrame:
    """Globally ordered frontier view (for presentation / small outputs)."""
    return df.orderBy(*order_cols())


def salted_repartition(df: DataFrame, n_partitions: int, salt_buckets: int = 16) -> DataFrame:
    """Skew-defeating physical layout for per-host work.

    A Zipf-hot host (the 'Unknown'-label skew analog — the 29-branch
    grouping at ``function.sql:17-50`` exists because labels are heavily
    skewed) would pin one task if we partitioned by host alone. Salting by
    ``pmod(url_hash, salt_buckets)`` splits a hot host across up to
    ``salt_buckets`` tasks while keeping co-location *within* each salt
    bucket. Salt derives from data (url_hash), never from randomness —
    determinism ban, SURVEY.md §7.4.
    """
    return df.repartition(
        n_partitions, F.col("host"), F.pmod("url_hash", F.lit(salt_buckets))
    ).sortWithinPartitions(*order_cols())


def global_rank(
    df: DataFrame,
    rank_col: str = "rank",
    n_partitions: int | None = None,
    cache_registry: list | None = None,
    order_by: list | None = None,
) -> DataFrame:
    """Distributed global dense rank 1..N in the frontier ORDER.

    The naive ``row_number() OVER (ORDER BY …)`` collapses to ONE partition —
    unusable at 10^10 rows. Instead (the classic two-phase pattern):

      1. range-repartition by the order keys (sampled range boundaries keep
         partitions balanced), sort within partitions;
      2. count rows per partition (tiny aggregate), prefix-sum the counts on
         the driver side of a broadcast join;
      3. rank = partition offset + intra-partition row_number.

    Equivalent result, but the big data is touched by exactly one shuffle
    (the range partitioning) and the only global object is the P-row offset
    table. Equality with the single-window version is pinned in
    tests/test_frontier.py.
    """
    ob = order_by if order_by is not None else order_cols()
    n = n_partitions or df.sparkSession.sparkContext.defaultParallelism
    parted = df.repartitionByRange(n, *ob).sortWithinPartitions(*ob)
    # Materialize ONCE: ``spark_partition_id()`` is physical-plan-dependent
    # (AQE may coalesce differently per action), so the offset branch and the
    # rank branch must read the same materialized pids, not recompute them.
    with_pid = parted.withColumn("_pid", F.spark_partition_id()).persist()
    if cache_registry is not None:
        # caller unpersists after consuming the result (per-round hygiene)
        cache_registry.append(with_pid)
    counts = with_pid.groupBy("_pid").count()
    w = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "_offset", F.coalesce(F.sum("count").over(w), F.lit(0))
    ).select("_pid", "_offset")
    # offsets has ≤ n rows → broadcast; the window above runs on that tiny df.
    intra = Window.partitionBy("_pid").orderBy(*ob)
    return (
        with_pid.join(F.broadcast(offsets), "_pid")
        .withColumn(rank_col, (F.col("_offset") + F.row_number().over(intra)).cast("int"))
        .drop("_pid", "_offset")
    )
