"""Real-Iceberg backend for the snapshot catalog (config-activated).

:class:`~.catalog.SnapshotCatalog` documents itself as the sandbox
emulation of Iceberg (no runtime jar here, SURVEY.md §7.4). This module is
the production twin behind the SAME method surface, expressed entirely in
public Iceberg-Spark SQL (`USING iceberg`, ``writeTo().append()``,
``CALL <catalog>.system.*`` procedures). Activation is by Spark config —
the standard Iceberg session setup::

    spark.sql.catalog.<name> = org.apache.iceberg.spark.SparkCatalog
    spark.sql.catalog.<name>.type = hadoop          # or hive/rest
    spark.sql.catalog.<name>.warehouse = <path>
    spark.sql.extensions = org.apache.iceberg.spark.extensions\
.IcebergSparkSessionExtensions

Every method degrades to a clear ``IcebergUnavailable`` error when the jar
is absent, and the test scaffold (tests/test_iceberg_catalog.py) is
``skipif``-gated on :func:`iceberg_available`, so the module imports and
type-checks in-sandbox while the real paths run only on a cluster with the
runtime jar.

Commit protocol vs the Parquet emulation: Iceberg appends are atomic
single-table snapshots but there is no cross-table transaction, so the
round marker table (``<ns>.rounds``) is appended LAST and is the commit
point — readers intersect data rounds with marker rounds, which restores
multi-table snapshot isolation (a crash between table appends leaves
orphan rows that no reader can see and that the next successful commit of
the same round supersedes; ``expire_rounds`` clears them).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: column stamped onto every appended row; partition key of every table
ROUND_COL = "_round"


class IcebergUnavailable(RuntimeError):
    """Raised when the Iceberg runtime jar / catalog is not configured."""


def iceberg_available(spark: SparkSession, catalog: str = "ice") -> bool:
    """True iff the named Spark catalog resolves to a usable Iceberg
    catalog (jar on the classpath + catalog configured)."""
    impl = spark.conf.get(f"spark.sql.catalog.{catalog}", None)
    if not impl or "iceberg" not in impl.lower():
        return False
    try:
        spark.sql(f"SHOW NAMESPACES IN {catalog}").collect()
        return True
    except Exception:
        return False


class IcebergSnapshotCatalog:
    """Iceberg-backed twin of :class:`~.catalog.SnapshotCatalog`.

    ``root`` maps to an Iceberg namespace (one namespace per crawl run)
    instead of a filesystem directory.
    """

    RETAIN_TABLES = ("seen", "frontier")
    _ROUNDS_TABLE = "rounds"

    def __init__(self, spark: SparkSession, namespace: str, catalog: str = "ice"):
        if not iceberg_available(spark, catalog):
            raise IcebergUnavailable(
                f"Spark catalog '{catalog}' is not an Iceberg catalog — "
                "configure spark.sql.catalog.* and the Iceberg runtime jar "
                "(see module docstring), or use the Parquet-manifest "
                "SnapshotCatalog"
            )
        self.spark = spark
        self.catalog = catalog
        self.namespace = namespace
        spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {catalog}.{namespace}")
        # marker carries only the round id — no wall-clock column, per the
        # engine's F12 injected-timestamp determinism rule
        spark.sql(
            f"CREATE TABLE IF NOT EXISTS {self._qual(self._ROUNDS_TABLE)} "
            f"(round INT) USING iceberg"
        )

    # -- naming ------------------------------------------------------------

    def _qual(self, table: str) -> str:
        return f"{self.catalog}.{self.namespace}.{table}"

    # -- manifest analog ---------------------------------------------------

    def committed_rounds(self) -> list[int]:
        return sorted(
            r["round"]
            for r in self.spark.table(self._qual(self._ROUNDS_TABLE))
            .select("round")
            .distinct()
            .collect()
        )

    def last_round(self) -> int | None:
        rounds = self.committed_rounds()
        return rounds[-1] if rounds else None

    # -- commit ------------------------------------------------------------

    def commit_round(self, round_n: int, tables: dict[str, DataFrame]) -> None:
        """Write every table's round increment, then append the round
        marker LAST (the commit point — see module docstring).

        Idempotent under crash-retry like the Parquet twin: each table's
        round PARTITION is overwritten, not appended, so a retry of a
        round whose earlier attempt died mid-way (orphan rows, no marker)
        replaces the orphans instead of doubling the round once the
        marker finally lands. ``overwritePartitions`` on a
        ``_round``-partitioned table rewrites exactly this round's
        partition under snapshot isolation.
        """
        for name, df in tables.items():
            stamped = df.withColumn(ROUND_COL, F.lit(round_n))
            qual = self._qual(name)
            if not self.spark.catalog.tableExists(qual):
                # partitioned by round: per-round reads prune to one
                # partition; expiry drops whole partitions
                stamped.writeTo(qual).partitionedBy(ROUND_COL).create()
            else:
                stamped.writeTo(qual).overwritePartitions()
        marker = self.spark.createDataFrame([(round_n,)], "round int")
        # marker dedup on retry: a prior successful commit of this round
        # (marker present) must not double it either
        self.spark.sql(
            f"DELETE FROM {self._qual(self._ROUNDS_TABLE)} "
            f"WHERE round = {round_n}"
        )
        marker.writeTo(self._qual(self._ROUNDS_TABLE)).append()

    # -- read --------------------------------------------------------------

    def _committed_filter(self, df: DataFrame, up_to_round: int | None) -> DataFrame:
        markers = self.spark.table(self._qual(self._ROUNDS_TABLE)).select(
            F.col("round").alias(ROUND_COL)
        )
        if up_to_round is not None:
            markers = markers.filter(F.col(ROUND_COL) <= up_to_round)
        # broadcast semi join against the tiny marker table: uncommitted
        # (orphan) rows stay invisible — snapshot isolation
        return df.join(F.broadcast(markers), ROUND_COL, "left_semi")

    def read_round(self, spark: SparkSession, table: str, round_n: int) -> DataFrame:
        return (
            spark.table(self._qual(table))
            .filter(F.col(ROUND_COL) == round_n)
            .drop(ROUND_COL)
        )

    def read_appended(
        self, spark: SparkSession, table: str, up_to_round: int | None = None
    ) -> DataFrame | None:
        if not spark.catalog.tableExists(self._qual(table)):
            return None
        df = self._committed_filter(spark.table(self._qual(table)), up_to_round)
        return df.drop(ROUND_COL)

    def read_state(
        self, spark: SparkSession, table: str, round_n: int | None = None
    ) -> DataFrame | None:
        if not spark.catalog.tableExists(self._qual(table)):
            return None
        r = round_n if round_n is not None else self.last_round()
        if r is None or r not in self.committed_rounds():
            return None
        return self.read_round(spark, table, r)

    def row_count(self, table: str, round_n: int) -> int | None:
        if not self.spark.catalog.tableExists(self._qual(table)):
            return None
        return (
            self.spark.table(self._qual(table))
            .filter(F.col(ROUND_COL) == round_n)
            .count()
        )

    # -- maintenance -------------------------------------------------------

    def expire_rounds(
        self, keep_last: int, retain: tuple[str, ...] | None = None
    ) -> list[int]:
        """Retention ≅ the emulation's expire_rounds: DELETE whole round
        partitions of DATA tables below the horizon (Iceberg turns the
        round-equality predicate into metadata-only partition drops), then
        expire the superseded snapshots so data files are physically
        reclaimed.

        The round MARKER table is never truncated: every read semi-joins
        against it (``_committed_filter``), so deleting old markers would
        also hide the RETAIN_TABLES' retained history — the ``seen``
        ledger rows from expired rounds would vanish and the crawl would
        re-fetch expired URLs (caught by the r04 cross-backend contract
        matrix). Markers are single INTs; keeping the full history costs
        nothing and keeps ``read_state`` of retained snapshots resumable,
        matching the emulation's read surface exactly."""
        retain = self.RETAIN_TABLES if retain is None else retain
        rounds = self.committed_rounds()
        if len(rounds) <= keep_last:
            return []
        drop = rounds[:-keep_last]
        horizon = rounds[-keep_last]
        data_tables = [
            r["tableName"]
            for r in self.spark.sql(
                f"SHOW TABLES IN {self.catalog}.{self.namespace}"
            ).collect()
            if r["tableName"] not in retain + (self._ROUNDS_TABLE,)
        ]
        for t in data_tables:
            self.spark.sql(
                f"DELETE FROM {self._qual(t)} WHERE {ROUND_COL} < {horizon}"
            )
            self.spark.sql(
                f"CALL {self.catalog}.system.expire_snapshots("
                f"table => '{self.namespace}.{t}', retain_last => 1)"
            )
        return drop

    def compact_rounds(
        self,
        spark: SparkSession,
        table: str,
        up_to_round: int | None = None,
        target_files: int = 1,
    ) -> list[int]:
        """Small-files maintenance: the real ``rewrite_data_files`` the
        emulation documents itself against. Iceberg rewrites data files
        under snapshot isolation, so no round bookkeeping (or
        compacted-through floor) is needed — rows keep their ``_round``
        and as-of reads stay valid at every round."""
        del up_to_round, target_files  # Iceberg sizes output files itself
        if not spark.catalog.tableExists(self._qual(table)):
            return []
        spark.sql(
            f"CALL {self.catalog}.system.rewrite_data_files("
            f"table => '{self.namespace}.{table}')"
        )
        return []
