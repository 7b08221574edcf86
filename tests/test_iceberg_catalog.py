"""Iceberg-backend catalog scaffold (jar-gated).

This sandbox ships no Iceberg runtime jar (SURVEY.md §7.4), so every test
here SKIPS locally; on a cluster session configured per the
iceberg_catalog module docstring they run against the real backend and
pin the same contract the Parquet-manifest emulation pins in
tests/test_catalog.py: snapshot-visible commits, resume, retention.
The always-on tests at the bottom pin the jar-absent error path and the
interface parity, which do run in-sandbox.
"""

import pytest
from pyspark.sql import functions as F

from xrpl_rich_list_py_crawler_spark.sources.catalog import SnapshotCatalog
from xrpl_rich_list_py_crawler_spark.sources.iceberg_catalog import (
    IcebergSnapshotCatalog,
    IcebergUnavailable,
    iceberg_available,
)


def _have_iceberg(spark) -> bool:
    return iceberg_available(spark)


@pytest.fixture()
def ice(spark, request):
    if not _have_iceberg(spark):
        pytest.skip("no Iceberg runtime jar / catalog configured")
    ns = f"t_{request.node.name[:40]}"
    cat = IcebergSnapshotCatalog(spark, ns)
    yield cat
    spark.sql(f"DROP NAMESPACE IF EXISTS ice.{ns} CASCADE")


def test_commit_round_marker_is_the_commit_point(spark, ice):
    df = spark.createDataFrame([(1, 1)], "url_hash long, round int")
    ice.commit_round(1, {"seen": df})
    assert ice.committed_rounds() == [1]
    assert ice.read_appended(spark, "seen").count() == 1
    # orphan append without a marker must stay invisible
    df2 = spark.createDataFrame([(2, 2)], "url_hash long, round int")
    df2.withColumn("_round", F.lit(2)).writeTo(ice._qual("seen")).append()
    assert ice.read_appended(spark, "seen").count() == 1


def test_read_appended_up_to_round(spark, ice):
    for r in (1, 2, 3):
        ice.commit_round(
            r, {"seen": spark.createDataFrame([(r,)], "url_hash long")}
        )
    assert ice.read_appended(spark, "seen", up_to_round=2).count() == 2
    assert ice.last_round() == 3


def test_expire_rounds_drops_history_keeps_markers_consistent(spark, ice):
    for r in (1, 2, 3, 4):
        ice.commit_round(
            r, {"metrics": spark.createDataFrame([(r,)], "n long")}
        )
    dropped = ice.expire_rounds(keep_last=2)
    assert dropped == [1, 2]
    assert ice.committed_rounds() == [3, 4]
    assert ice.read_appended(spark, "metrics").count() == 2


# -- always-on (no jar needed) ----------------------------------------------


def test_unavailable_raises_clear_error(spark):
    if _have_iceberg(spark):
        pytest.skip("Iceberg configured — the unavailable path can't trip")
    with pytest.raises(IcebergUnavailable, match="Iceberg"):
        IcebergSnapshotCatalog(spark, "ns")


def test_interface_parity_with_emulation():
    """Both backends expose the same catalog surface, so CrawlRun and the
    retention/compaction jobs can take either."""
    surface = [
        "commit_round", "read_round", "read_appended", "read_state",
        "row_count", "last_round", "expire_rounds", "compact_rounds",
        "RETAIN_TABLES",
    ]
    for name in surface:
        assert hasattr(SnapshotCatalog, name), name
        assert hasattr(IcebergSnapshotCatalog, name), name


def test_commit_round_retry_is_idempotent(spark, ice):
    """Crash-retry of a round (orphan appends, then a full re-commit) must
    not double the round: table partitions overwrite and the marker
    dedups."""
    ice.commit_round(0, {"seen": spark.createDataFrame(
        [(9, 0)], "url_hash long, round int")})
    df = spark.createDataFrame([(1, 1), (2, 1)], "url_hash long, round int")
    # simulate a half-committed first attempt: data landed, no marker
    df.withColumn("_round", F.lit(1)).writeTo(ice._qual("seen")).append()
    assert ice.read_appended(spark, "seen").count() == 1  # orphans invisible
    # the retry commits the same round in full
    ice.commit_round(1, {"seen": df})
    assert ice.read_appended(spark, "seen").count() == 3
    # a second full re-commit (e.g. replayed orchestration) stays exact
    ice.commit_round(1, {"seen": df})
    assert ice.read_appended(spark, "seen").count() == 3
    assert ice.committed_rounds() == [0, 1]
