"""Frontier ordering: distributed two-phase rank ≡ single-window rank."""

from datetime import datetime, timedelta

import numpy as np
from pyspark.sql import Window
from pyspark.sql import functions as F

from xrpl_rich_list_py_crawler_spark.operators.frontier import (
    global_rank,
    order_cols,
    salted_repartition,
)


def _frontier_df(spark, n=4000):
    rng = np.random.RandomState(11)
    epoch = datetime(2026, 1, 1)
    rows = [
        (
            f"https://h{int(g)}.example.com/p/{i}",
            int(rng.randint(-(2**62), 2**62)),
            f"h{int(g)}.example.com",
            int(rng.randint(0, 5)),
            float((g + 1) ** -1.3),
            epoch + timedelta(seconds=int(rng.randint(0, 10000))),
        )
        for i, g in enumerate(rng.zipf(1.5, size=n) % 50)
    ]
    return spark.createDataFrame(
        rows,
        "url string, url_hash long, host string, depth int, "
        "host_rank double, discovery_ts timestamp",
    )


def test_global_rank_equals_window_rank(spark):
    df = _frontier_df(spark)
    got = {
        r["url_hash"]: r["rank"]
        for r in global_rank(df, n_partitions=8).collect()
    }
    w = Window.orderBy(*order_cols())
    want = {
        r["url_hash"]: r["rank"]
        for r in df.withColumn("rank", F.row_number().over(w)).collect()
    }
    assert got == want


def test_global_rank_is_permutation(spark):
    df = _frontier_df(spark, n=1500)
    ranks = sorted(r["rank"] for r in global_rank(df).collect())
    assert ranks == list(range(1, 1501))


def test_global_rank_parallelism_invariant(spark):
    df = _frontier_df(spark)
    a = {r["url_hash"]: r["rank"] for r in global_rank(df, n_partitions=2).collect()}
    b = {r["url_hash"]: r["rank"] for r in global_rank(df, n_partitions=17).collect()}
    assert a == b


def test_salted_repartition_preserves_rows_and_splits_hot_host(spark):
    df = _frontier_df(spark)
    out = salted_repartition(df, 16, salt_buckets=8)
    assert out.count() == df.count()
    # the hottest host must span >1 partition (skew defeat)
    hot = (
        df.groupBy("host").count().orderBy(F.desc("count")).first()["host"]
    )
    nparts = (
        out.withColumn("pid", F.spark_partition_id())
        .filter(F.col("host") == hot)
        .select("pid")
        .distinct()
        .count()
    )
    assert nparts > 1
