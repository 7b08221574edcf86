"""Sessionization (operators/sessions.py): gap semantics (strictly
greater than the gap opens a session; an exact-gap event does not),
timestamp-tie handling, session stats arithmetic, parallelism
invariance, and the per-user (never global) window plan."""

import contextlib
import datetime as dt
import io

from xrpl_rich_list_py_crawler_spark.operators.sessions import (
    session_stats,
    sessionize,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ev(spark, rows):
    return spark.createDataFrame(rows, ["event_id", "user_id", "ts"])


def _mk(minutes, eid, user=1):
    return (eid, user, T0 + dt.timedelta(minutes=minutes))


def test_gap_semantics(spark):
    # gaps: 10m (same), exactly 30m (same — strictly greater opens),
    # 30m + 1µs (new), 40m (new)
    rows = [
        _mk(0, 0),
        _mk(10, 1),
        _mk(40, 2),  # 30m after event 1 → SAME session
        (3, 1, T0 + dt.timedelta(minutes=70, microseconds=1)),  # new
        _mk(120, 4),  # 49m59s later → new
    ]
    got = {
        r["event_id"]: r["session_id"]
        for r in sessionize(_ev(spark, rows)).collect()
    }
    assert got == {0: 1, 1: 1, 2: 1, 3: 2, 4: 3}


def test_tied_timestamps_share_session(spark):
    rows = [_mk(0, 0), _mk(0, 1), _mk(0, 2), _mk(45, 3)]
    got = {
        r["event_id"]: r["session_id"]
        for r in sessionize(_ev(spark, rows)).collect()
    }
    assert got == {0: 1, 1: 1, 2: 1, 3: 2}


def test_session_stats_exact(spark):
    rows = [_mk(0, 0), _mk(10, 1), _mk(120, 2), _mk(125, 3), _mk(0, 9, user=2)]
    got = {
        (r["user_id"], r["session_id"]): (
            r["n_events"],
            r["start_ts"],
            r["end_ts"],
            r["duration_us"],
        )
        for r in session_stats(_ev(spark, rows)).collect()
    }
    assert got[(1, 1)] == (2, T0, T0 + dt.timedelta(minutes=10), 600_000_000)
    assert got[(1, 2)] == (
        2,
        T0 + dt.timedelta(minutes=120),
        T0 + dt.timedelta(minutes=125),
        300_000_000,
    )
    assert got[(2, 1)] == (1, T0, T0, 0)


def test_parallelism_invariance(spark):
    rows = [
        _mk(i * 17 % 300, i, user=i % 7) for i in range(200)
    ]
    e = _ev(spark, rows)
    a = sorted(map(tuple, session_stats(e.repartition(1)).collect()))
    b = sorted(map(tuple, session_stats(e.repartition(11, "ts")).collect()))
    assert a == b


def test_window_is_per_user_never_global(spark):
    df = sessionize(_ev(spark, [_mk(0, 0)]))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    plan = buf.getvalue()
    assert "SinglePartition" not in plan
    assert "partitionBy=[user_id" in plan.replace(" ", "").replace('"', "") or "user_id" in plan
