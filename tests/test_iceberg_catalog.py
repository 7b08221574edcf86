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
    # markers keep the full history (reads semi-join them — truncating
    # would hide RETAIN_TABLES' retained rows, r04 fix); the data rows of
    # expired rounds are physically gone
    assert ice.committed_rounds() == [1, 2, 3, 4]
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


# -- cross-backend contract matrix (r04) -------------------------------------
#
# One scenario body per contract clause, parametrized over BOTH backends
# through the shared SnapshotCatalog surface. The parquet emulation runs
# in-sandbox; the iceberg param skips while no jar exists but executes the
# IDENTICAL body the day one does — so the twin inherits every pinned
# semantic without new test code (r03 verdict item 7).


@pytest.fixture(params=["parquet", "iceberg"])
def anycat(request, spark, tmp_path):
    if request.param == "iceberg":
        if not _have_iceberg(spark):
            pytest.skip("no Iceberg runtime jar / catalog configured")
        ns = f"m_{request.node.name[:38]}".replace("[", "_").replace("]", "")
        yield IcebergSnapshotCatalog(spark, ns)
        spark.sql(f"DROP NAMESPACE IF EXISTS ice.{ns} CASCADE")
    else:
        yield SnapshotCatalog(str(tmp_path))


def _rows(df):
    return sorted(tuple(r) for r in df.collect()) if df is not None else []


def test_contract_commit_visibility_and_resume(spark, anycat):
    """Committed rounds are exactly the visible rounds; up_to filters;
    state reads resume from the last committed snapshot."""
    for r in (1, 2, 3):
        anycat.commit_round(r, {
            "seen": spark.createDataFrame([(r * 10,)], "url_hash long"),
            "frontier": spark.createDataFrame([(r, "u")], "round int, url string"),
        })
    assert anycat.last_round() == 3
    assert anycat.read_appended(spark, "seen").count() == 3
    assert anycat.read_appended(spark, "seen", up_to_round=2).count() == 2
    st = anycat.read_state(spark, "frontier")
    assert _rows(st) == [(3, "u")]
    assert _rows(anycat.read_state(spark, "frontier", 1)) == [(1, "u")]
    assert anycat.read_appended(spark, "nonexistent") is None
    assert anycat.row_count("seen", 2) == 1


def test_contract_recommit_replaces_never_doubles(spark, anycat):
    """Conflict/retry: re-committing a round (same handle or a SECOND
    handle on the same root — the concurrent-committer analog) REPLACES
    that round's content; nothing doubles, later rounds unaffected."""
    df_a = spark.createDataFrame([(1,), (2,)], "url_hash long")
    df_b = spark.createDataFrame([(7,), (8,), (9,)], "url_hash long")
    anycat.commit_round(1, {"seen": df_a})
    anycat.commit_round(2, {"seen": df_a})
    # retry round 1 with different content, via a fresh handle when the
    # backend is filesystem-rooted (manifest reload path)
    retry_cat = (
        SnapshotCatalog(anycat.root)
        if isinstance(anycat, SnapshotCatalog)
        else anycat
    )
    retry_cat.commit_round(1, {"seen": df_b})
    got = anycat.read_appended(spark, "seen", up_to_round=1)
    assert _rows(got) == [(7,), (8,), (9,)]
    assert anycat.read_appended(spark, "seen").count() == 5  # 3 + round 2's 2
    assert anycat.last_round() == 2


def test_contract_compact_preserves_reads(spark, anycat):
    """compact_rounds is invisible to the read surface the engine uses:
    identical row multiset, identical up-to-latest as-of reads, round
    bookkeeping still consistent — and compaction composes (second call
    after more commits)."""
    for r in (1, 2, 3):
        anycat.commit_round(r, {"seen": spark.createDataFrame(
            [(r, i) for i in range(5)], "round_src int, i long")})
    before = _rows(anycat.read_appended(spark, "seen"))
    anycat.compact_rounds(spark, "seen")
    assert _rows(anycat.read_appended(spark, "seen")) == before
    assert _rows(anycat.read_appended(spark, "seen", up_to_round=3)) == before
    # keep committing + compacting: multiset still exact
    anycat.commit_round(4, {"seen": spark.createDataFrame(
        [(4, i) for i in range(5)], "round_src int, i long")})
    anycat.compact_rounds(spark, "seen")
    assert len(_rows(anycat.read_appended(spark, "seen"))) == 20
    assert anycat.last_round() == 4


def test_contract_expire_keeps_dedup_keys(spark, anycat):
    """Retention drops old rounds of DATA tables only: RETAIN_TABLES
    (seen/frontier — the dedup key and resume state) keep every round."""
    for r in (1, 2, 3, 4):
        anycat.commit_round(r, {
            "metrics": spark.createDataFrame([(r,)], "n long"),
            "seen": spark.createDataFrame([(r,)], "url_hash long"),
        })
    dropped = anycat.expire_rounds(keep_last=2)
    assert dropped == [1, 2]
    assert anycat.read_appended(spark, "metrics").count() == 2
    assert anycat.read_appended(spark, "seen").count() == 4  # retained
    # expiring again below the floor is a no-op
    assert anycat.expire_rounds(keep_last=2) == []


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
