"""Sessionization: split each user's event stream into sessions at
inactivity gaps — the classic gaps-and-islands windowing every
clickstream/telemetry pipeline runs (and the per-user analog of the
crawl's per-host politeness windows).

Algorithm (all inside one user-partitioned window pass):

1. order each user's events by (ts, event_id) — the id tiebreak makes
   the order total, so output is identical at any parallelism;
2. an event opens a new session iff it is the user's first or the gap
   from the previous event exceeds ``gap``; the comparison runs on
   **integer microsecond differences** (``timestamp_diff(MICROSECOND)``,
   never float seconds — exactness discipline, and timezone-independent:
   it works identically on TIMESTAMP and TIMESTAMP_NTZ, with DuckDB's
   ``date_diff('microseconds', …)`` as the exact twin);
3. session_id = running sum of the new-session flags (1-based);
4. per-session stats are one further groupBy with map-side partial
   aggregation: event count, start/end timestamps, integer duration.

Scale shape: every window is ``partitionBy(user)`` — never a
SinglePartition window (the engine's W1 discipline); a 10^9-user stream
shuffles once by user, sessions within a user are computed locally, and
the stats groupBy re-uses the same (user, session) key co-location.
Per-user event counts are bounded in practice (a user's history fits a
task); a pathological single-key firehose would be salted by session
windows the same way ``salted_repartition`` handles hot hosts.

Determinism: no float aggregates in outputs (``value`` sums are
intentionally excluded — cross-engine double summation is
order-dependent); counts, timestamps, and microsecond durations only.

Reference parity: generalizes the reference's per-host batch windows
(validator.py batching) to per-entity time windows; SURVEY.md §2.8 T-family.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap: dt.timedelta = dt.timedelta(minutes=30),
) -> DataFrame:
    """Per-event session assignment: input columns plus ``session_id``
    (1-based, per user, in time order)."""
    gap_us = int(gap.total_seconds() * 1_000_000)
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    prev = F.lag(F.col(ts_col)).over(w)
    diff_us = F.timestamp_diff("MICROSECOND", prev, F.col(ts_col))
    # two projections: a window expression (lag) can't nest inside the
    # running-sum window aggregate in one select
    flagged = events.withColumn(
        "_new",
        F.when(prev.isNull() | (diff_us > gap_us), 1).otherwise(0),
    )
    run = Window.partitionBy(user_col).orderBy(ts_col, id_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return flagged.withColumn(
        "session_id", F.sum("_new").over(run).cast("long")
    ).drop("_new")


def session_stats(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap: dt.timedelta = dt.timedelta(minutes=30),
) -> DataFrame:
    """One row per (user, session): ``n_events``, ``start_ts``,
    ``end_ts``, ``duration_us`` (integer microseconds)."""
    s = sessionize(events, user_col, ts_col, id_col, gap)
    return (
        s.groupBy(user_col, "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("start_ts"),
            F.max(ts_col).alias("end_ts"),
            F.timestamp_diff(
                "MICROSECOND", F.min(ts_col), F.max(ts_col)
            ).alias("duration_us"),
        )
    )
