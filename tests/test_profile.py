"""Table profiler: counts/nulls exact, sketch columns wired correctly,
constant-shuffle composition."""

import pytest
from pyspark.sql import functions as F

from xrpl_rich_list_py_crawler_spark.operators.profile import profile_table


@pytest.fixture(scope="module")
def table(spark):
    rows = [
        (i,
         None if i % 10 == 0 else f"s{i % 7}",
         None if i % 25 == 0 else float(i % 100) + 0.5,
         i % 2 == 0)
        for i in range(1000)
    ]
    return spark.createDataFrame(
        rows, "id long, s string, v double, b boolean"
    )


def test_profile_counts_and_nulls_exact(spark, table):
    got = {r.column: r for r in profile_table(table).collect()}
    assert set(got) == {"id", "s", "v", "b"}
    assert all(r.n_rows == 1000 for r in got.values())
    assert got["id"].n_null == 0
    assert got["s"].n_null == 100
    assert got["v"].n_null == 40
    assert got["b"].n_null == 0


def test_profile_distinct_and_quantiles_sane(spark, table):
    got = {r.column: r for r in profile_table(table).collect()}
    # tiny cardinalities ride the HLL linear-counting branch: near-exact
    assert abs(got["s"].est_distinct - 7) < 1
    assert abs(got["b"].est_distinct - 2) < 1
    assert abs(got["id"].est_distinct - 1000) / 1000 < 0.07
    # numerics get quantiles, non-numerics get nulls
    assert got["id"].is_numeric and got["v"].is_numeric
    assert not got["s"].is_numeric and not got["b"].is_numeric
    assert got["s"].q50 is None and got["b"].q95 is None
    # v in [0.5, 99.5]: p50 within one log-bin of 49.5
    assert 45 < got["v"].q50 <= 50
    assert 90 < got["v"].q95 <= 95.5
    # id uniform 0..999
    assert 480 < got["id"].q50 <= 500


def test_profile_subset_and_unknown_column(spark, table):
    assert {r.column for r in profile_table(table, ["id"]).collect()} == \
        {"id"}
    with pytest.raises(ValueError):
        profile_table(table, ["nope"])


def test_profile_skips_complex_types(spark):
    df = spark.createDataFrame(
        [(1, [1, 2])], "id long, arr array<long>"
    )
    assert {r.column for r in profile_table(df).collect()} == {"id"}
