"""Structured Streaming jobs: streaming summary == batch summary; stateful
politeness budget holds across micro-batches."""

import os
from datetime import datetime, timedelta

import pandas as pd
import pytest
from pyspark.sql import functions as F

from xrpl_rich_list_py_crawler_spark.plans import jobs
from xrpl_rich_list_py_crawler_spark.streaming import (
    hourly_summary_stream,
    politeness_stream,
)


def test_streaming_summary_matches_batch(spark, crawl_sf0001, tmp_path):
    rich = spark.read.parquet(os.path.join(crawl_sf0001, "richlist.parquet"))
    # deliver the snapshot stream as multiple files (the hourly cron analog)
    src = str(tmp_path / "snapshots")
    rich.repartition(6).write.mode("overwrite").parquet(src)
    out = str(tmp_path / "summary_out")
    q = hourly_summary_stream(
        spark, src, out, str(tmp_path / "ckpt"), watermark="200 hours",
        max_files_per_trigger=2,
    )
    q.awaitTermination(300)
    got = spark.read.parquet(out)
    want = jobs.summary_series(rich).withColumn(
        "window_start", F.date_trunc("hour", "created_at")
    )
    # fixture snapshots are hourly (k=14 shifted +7min still lands in its
    # own hour bucket) → streaming hourly windows == batch per-snapshot rows
    g = {(r["grouped_label"], r["window_start"]): (r["count"], r["total_xrp"])
         for r in got.collect()}
    w = {(r["grouped_label"], r["window_start"]): (r["count"], r["total_xrp"])
         for r in want.collect()}
    assert g == w


def test_streaming_summary_upsert_idempotent(spark, crawl_sf0001, tmp_path):
    """Re-running the stream over the same source (fresh checkpoint) must
    not duplicate keys — T2 upsert semantics."""
    rich = spark.read.parquet(os.path.join(crawl_sf0001, "richlist.parquet"))
    src = str(tmp_path / "snapshots")
    rich.repartition(3).write.mode("overwrite").parquet(src)
    out = str(tmp_path / "out")
    for i in range(2):
        q = hourly_summary_stream(
            spark, src, out, str(tmp_path / f"ckpt{i}"), watermark="200 hours"
        )
        q.awaitTermination(300)
    got = spark.read.parquet(out)
    assert got.count() == got.select("grouped_label", "window_start").distinct().count()


def test_streaming_upsert_overwrites_only_affected_windows(spark, tmp_path):
    """The MERGE-INTO emulation must be a keyed partition overwrite: a
    batch touching window W2 must not rewrite window W1's files (round 1
    rewrote the whole output per micro-batch)."""
    import glob

    epoch = datetime(2026, 1, 1)
    src = str(tmp_path / "snapshots")
    os.makedirs(src)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def snap(hour, path):
        pdf = pd.DataFrame(
            {
                "address": ["rA", "rB"],
                "label": ["Ripple", "Binance"],
                "balance_xrp": [10.0, 20.0],
                "escrow_xrp": [1.0, 2.0],
                "snapshot_date": [epoch + timedelta(hours=hour)] * 2,
            }
        )
        pdf["snapshot_date"] = pdf["snapshot_date"].astype("datetime64[us]")
        pdf.to_parquet(path)

    # run 1: only window W1 exists
    snap(0, os.path.join(src, "s0.parquet"))
    hourly_summary_stream(spark, src, out, ckpt).awaitTermination(300)
    w1_files = {
        f: os.path.getmtime(f)
        for f in glob.glob(os.path.join(out, "window_start=*", "*.parquet"))
    }
    assert w1_files, "window-1 partition written"
    # run 2 (same checkpoint): a new file lands in window W2 only
    snap(1, os.path.join(src, "s1.parquet"))
    hourly_summary_stream(spark, src, out, ckpt).awaitTermination(300)
    for f, mtime in w1_files.items():
        assert os.path.exists(f) and os.path.getmtime(f) == mtime, (
            f"untouched window rewritten: {f}"
        )
    # both windows readable, keys unique
    got = spark.read.parquet(out)
    assert got.select("window_start").distinct().count() == 2
    assert got.count() == got.select("grouped_label", "window_start").distinct().count()


def test_streaming_upsert_keeps_groups_not_updated_later(spark, tmp_path):
    """Regression (round-2 flake root cause): a group whose rows ALL arrive
    in an early batch must survive later batches that rewrite its window —
    i.e. the sink must actually read back previously-written rows (dynamic
    partition overwrite writes no _SUCCESS marker, which silently disabled
    the merge path and dropped such groups)."""
    epoch = datetime(2026, 1, 1)
    src = str(tmp_path / "snapshots")
    os.makedirs(src)

    def snap(name, label):
        pdf = pd.DataFrame(
            {
                "address": ["rX"],
                "label": [label],
                "balance_xrp": [10.0],
                "escrow_xrp": [0.0],
                "snapshot_date": [epoch],  # SAME window for both batches
            }
        )
        pdf["snapshot_date"] = pdf["snapshot_date"].astype("datetime64[us]")
        pdf.to_parquet(os.path.join(src, f"{name}.parquet"))

    snap("b0", "OnlyEarly")
    snap("b1", "LaterLabel")
    out = str(tmp_path / "out")
    q = hourly_summary_stream(
        spark, src, out, str(tmp_path / "ckpt"), max_files_per_trigger=1
    )
    q.awaitTermination(300)
    labels = sorted(
        r["grouped_label"] for r in spark.read.parquet(out).collect()
    )
    assert labels == ["LaterLabel", "OnlyEarly"]


def test_politeness_stream_budget_across_batches(spark, tmp_path):
    """Two micro-batches of 10 urls each for one host: only 16 total may be
    selected (budget persists in state across batches)."""
    epoch = datetime(2026, 1, 1)
    rows = []
    for batch in range(2):
        for i in range(10):
            rows.append(
                {
                    "url": f"https://a.com/p/{batch}_{i}",
                    "url_hash": batch * 100 + i,
                    "host": "a.com",
                    "depth": 0,
                    "discovery_ts": epoch + timedelta(seconds=batch * 100 + i),
                    "crawl_delay_s": 2.0,
                }
            )
    src = str(tmp_path / "frontier")
    os.makedirs(src)
    # one file per micro-batch (maxFilesPerTrigger=1); pin int32/precision
    # so the stream's declared schema matches the files
    for name, chunk in (("b0", rows[:10]), ("b1", rows[10:])):
        pdf = pd.DataFrame(chunk)
        pdf["depth"] = pdf["depth"].astype("int32")
        pdf["discovery_ts"] = pdf["discovery_ts"].astype("datetime64[us]")
        pdf.to_parquet(os.path.join(src, f"{name}.parquet"))
    out = str(tmp_path / "assigned")
    q = politeness_stream(spark, src, out, str(tmp_path / "ckpt"))
    q.awaitTermination(300)
    got = spark.read.parquet(out).collect()
    assert len(got) == 20
    assert sum(r["selected"] for r in got) == 16
    slots = sorted(r["slot"] for r in got)
    assert slots == list(range(1, 21))  # continuous numbering across batches
    by_slot = {r["slot"]: r for r in got}
    assert by_slot[1]["fetch_delay_s"] == 0.0
    assert by_slot[3]["fetch_delay_s"] == 4.0  # (3-1) * 2.0s crawl delay
    assert not by_slot[17]["selected"]


def test_frontier_dedup_stream_first_sighting_wins(spark, tmp_path):
    """J2 as a stream: keyed dedup state spans micro-batches AND restarts
    (checkpointed), so a url_hash is emitted exactly once."""
    from xrpl_rich_list_py_crawler_spark.streaming import frontier_dedup_stream

    epoch = datetime(2026, 1, 1)
    src = str(tmp_path / "frontier")
    os.makedirs(src)

    def deliver(name, hashes, hour):
        pdf = pd.DataFrame(
            {
                "url": [f"https://a.com/p/{h}" for h in hashes],
                "url_hash": hashes,
                "host": "a.com",
                "depth": 0,
                "discovery_ts": [epoch + timedelta(hours=hour)] * len(hashes),
            }
        )
        pdf["depth"] = pdf["depth"].astype("int32")
        pdf["discovery_ts"] = pdf["discovery_ts"].astype("datetime64[us]")
        pdf.to_parquet(os.path.join(src, f"{name}.parquet"))

    out = str(tmp_path / "deduped")
    ckpt = str(tmp_path / "ckpt")
    deliver("b0", [1, 2, 3], 0)
    deliver("b1", [2, 3, 4, 5], 1)  # 2,3 are re-sightings
    q = frontier_dedup_stream(spark, src, out, ckpt)
    q.awaitTermination(300)
    got = sorted(r["url_hash"] for r in spark.read.parquet(out).collect())
    assert got == [1, 2, 3, 4, 5]
    # restart with new deliveries: state survives the checkpoint
    deliver("b2", [5, 6], 2)
    q = frontier_dedup_stream(spark, src, out, ckpt)
    q.awaitTermination(300)
    got = sorted(r["url_hash"] for r in spark.read.parquet(out).collect())
    assert got == [1, 2, 3, 4, 5, 6]


def test_corpus_dedup_stream_matches_batch_dedup(spark, tmp_path):
    """Streaming exact corpus dedup == batch dedup_exact semantics on the
    same deliveries (first sighting of each content hash wins), with state
    surviving a checkpointed restart."""
    from xrpl_rich_list_py_crawler_spark.streaming import corpus_dedup_stream

    epoch = datetime(2026, 3, 1)
    src = str(tmp_path / "docs")
    os.makedirs(src)

    def deliver(name, rows, hour):
        pdf = pd.DataFrame(
            {
                "doc_id": [i for i, _ in rows],
                "url": [f"https://d.com/{i}" for i, _ in rows],
                "text": [t for _, t in rows],
                "ingest_ts": [epoch + timedelta(hours=hour)] * len(rows),
            }
        )
        pdf["ingest_ts"] = pdf["ingest_ts"].astype("datetime64[us]")
        pdf.to_parquet(os.path.join(src, f"{name}.parquet"))

    out = str(tmp_path / "kept")
    ckpt = str(tmp_path / "ckpt")
    deliver("b0", [(1, "alpha"), (2, "beta")], 0)
    deliver("b1", [(3, "alpha"), (4, "gamma")], 1)   # 3 is a content dup of 1
    q = corpus_dedup_stream(spark, src, out, ckpt)
    q.awaitTermination(300)
    kept = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert kept == [1, 2, 4]
    # restart: dup of "beta" still suppressed, new content admitted
    deliver("b2", [(5, "beta"), (6, "delta")], 2)
    q = corpus_dedup_stream(spark, src, out, ckpt)
    q.awaitTermination(300)
    kept = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert kept == [1, 2, 4, 6]
    # schema passes through (no leaked helper column)
    assert sorted(spark.read.parquet(out).columns) == [
        "doc_id", "ingest_ts", "text", "url"
    ]


def test_hll_register_stream_equals_batch_sketch(spark, tmp_path):
    """Streaming register maintenance == batch hll_registers over
    everything delivered so far (the HLL merge law, end to end), with
    exactly-once-per-file across a checkpointed restart."""
    from xrpl_rich_list_py_crawler_spark.operators.sketches import (
        hll_distinct, hll_registers,
    )
    from xrpl_rich_list_py_crawler_spark.streaming import (
        hll_register_stream,
    )

    src = str(tmp_path / "ledger")
    os.makedirs(src)

    def deliver(name, pairs):
        pd.DataFrame(
            {"host": [h for h, _ in pairs], "url": [u for _, u in pairs]}
        ).to_parquet(os.path.join(src, f"{name}.parquet"))

    out = str(tmp_path / "regs")
    ckpt = str(tmp_path / "ckpt")
    deliver("b0", [("a", f"u{i}") for i in range(500)])
    deliver("b1", [("a", f"u{i}") for i in range(250, 750)]
            + [("b", "only")])
    q = hll_register_stream(
        spark, src, out, ckpt, "host string, url string", "host", "url"
    )
    q.awaitTermination(300)

    def batch_regs(n_files):
        import pyarrow.parquet as pq  # noqa: F401
        whole = spark.createDataFrame(
            pd.concat([
                pd.read_parquet(os.path.join(src, f))
                for f in sorted(os.listdir(src))[:n_files]
            ])
        )
        return hll_registers(whole, "host", "url")

    got = spark.read.parquet(out)
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, batch_regs(2).collect()))

    # restart with one more delivery: prior files are NOT re-sketched
    # (exactly-once ledger), and the merged table still equals batch
    deliver("b2", [("b", f"v{i}") for i in range(100)])
    q = hll_register_stream(
        spark, src, out, ckpt, "host string, url string", "host", "url"
    )
    q.awaitTermination(300)
    got2 = spark.read.parquet(out)
    assert sorted(map(tuple, got2.collect())) == \
        sorted(map(tuple, batch_regs(3).collect()))
    # and the estimate built FROM the streamed registers matches the
    # batch estimate exactly (bit-for-bit exact-integer state)
    from xrpl_rich_list_py_crawler_spark.operators.sketches import (
        hll_estimate,
    )
    stream_est = sorted(map(tuple, hll_estimate(got2).collect()))
    whole = spark.createDataFrame(pd.concat([
        pd.read_parquet(os.path.join(src, f))
        for f in sorted(os.listdir(src))
    ]))
    assert stream_est == sorted(
        map(tuple, hll_distinct(whole, "host", "url").collect())
    )


def test_gopher_gate_composes_with_streaming(spark, tmp_path):
    """The per-row quality gates are stateless codegen projections, so
    they apply unchanged to a readStream source: the streaming verdicts
    equal the batch verdicts on the same deliveries."""
    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType,
    )

    from xrpl_rich_list_py_crawler_spark.operators.textstats import (
        gopher_quality,
    )

    src = str(tmp_path / "docs")
    os.makedirs(src)
    good = (
        "the quick brown fox jumps over the lazy dog and that is fine "
        "to be sure of it all with some more plain words here today"
    )
    rows = [(0, good), (1, "too short"), (2, good + " " + "# " * 40)]
    pd.DataFrame({"doc_id": [i for i, _ in rows],
                  "text": [t for _, t in rows]}).to_parquet(
        os.path.join(src, "b0.parquet"))
    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
    ])
    stream = spark.readStream.schema(schema).parquet(src)
    out = str(tmp_path / "gated")
    ckpt = str(tmp_path / "ckpt")
    q = (
        gopher_quality(stream, min_words=20)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(300)
    got = {
        r.doc_id: r.keep for r in spark.read.parquet(out).collect()
    }
    batch = spark.read.parquet(src)
    want = {
        r.doc_id: r.keep
        for r in gopher_quality(batch, min_words=20).collect()
    }
    assert got == want == {0: True, 1: False, 2: False}


def test_neardup_vs_reference_stream_matches_batch(spark, tmp_path):
    """Streaming incremental near-dup candidates == batch
    minhash_vs_reference over the same deliveries: a near-dup of a
    reference doc is flagged against it, an unrelated doc is not, the
    pair set is exact across micro-batches, and a checkpointed restart
    does not re-emit pairs already seen."""
    from xrpl_rich_list_py_crawler_spark.operators import dedup as dd
    from xrpl_rich_list_py_crawler_spark.streaming import (
        neardup_vs_reference_stream,
    )

    base = "the quick brown fox jumps over the lazy dog " * 8
    other = "completely different reference text " * 10
    ref = spark.createDataFrame(
        [(1, base), (2, base + "tail-a"), (3, other)],
        ["doc_id", "text"],
    )
    ref_index = dd.reference_band_index(ref).persist()

    epoch = datetime(2026, 3, 1)
    src = str(tmp_path / "newdocs")
    os.makedirs(src)

    def deliver(name, rows, hour):
        pdf = pd.DataFrame(
            {
                "doc_id": [i for i, _ in rows],
                "url": [f"https://d.com/{i}" for i, _ in rows],
                "text": [t for _, t in rows],
                "ingest_ts": [epoch + timedelta(hours=hour)] * len(rows),
            }
        )
        pdf["ingest_ts"] = pdf["ingest_ts"].astype("datetime64[us]")
        pdf.to_parquet(os.path.join(src, f"{name}.parquet"))

    out = str(tmp_path / "cand")
    ckpt = str(tmp_path / "ckpt")
    deliver("b0", [(10, base + "tail-b"), (11, "unrelated new text " * 9)], 0)
    deliver("b1", [(12, other + " extra")], 1)
    q = neardup_vs_reference_stream(spark, src, ref_index, out, ckpt)
    q.awaitTermination(300)
    got = {
        (r.new_id, r.ref_id) for r in spark.read.parquet(out).collect()
    }
    new_batch = spark.createDataFrame(
        [(10, base + "tail-b"), (11, "unrelated new text " * 9),
         (12, other + " extra")],
        ["doc_id", "text"],
    )
    want = {
        (r.new_id, r.ref_id)
        for r in dd.minhash_vs_reference(new_batch, ref).collect()
    }
    assert got == want
    assert {(10, 1), (10, 2), (12, 3)} <= got
    assert all(n != 11 for n, _ in got)
    # restart: a re-delivered near-dup pair inside the watermark is
    # suppressed by state; a genuinely new doc is flagged
    deliver("b2", [(13, base + "tail-c")], 2)
    q = neardup_vs_reference_stream(spark, src, ref_index, out, ckpt)
    q.awaitTermination(300)
    got2 = [
        (r.new_id, r.ref_id) for r in spark.read.parquet(out).collect()
    ]
    assert len(got2) == len(set(got2))          # no duplicate pair rows
    assert {(13, 1), (13, 2)} <= set(got2)


def test_sessionize_stream_matches_batch_closed_sessions(spark, tmp_path):
    """Gap-closed sessions emit with exact batch-equal stats; a user's
    dangling session emits only after the watermark passes its horizon
    (user A times out via user B's later events); the final open
    session (B's last) stays in state — the documented streaming tail."""
    import datetime as dt

    from xrpl_rich_list_py_crawler_spark.operators.sessions import (
        session_stats,
    )
    from xrpl_rich_list_py_crawler_spark.streaming.jobs import (
        sessionize_stream,
    )

    epoch = datetime(2026, 1, 1)

    def ev(user, eid, secs):
        return {
            "user_id": user,
            "event_id": eid,
            "ts": epoch + timedelta(seconds=secs),
        }

    batches = [
        # A: two events 60s apart; B: one event
        [ev("A", 1, 0), ev("A", 2, 60), ev("B", 10, 0)],
        # B again 2h later: closes B's first session by gap; watermark
        # advances to 2h
        [ev("B", 11, 7200)],
        # B at 4h: closes B's second session by gap AND the watermark
        # from batch 2 (2h) has passed A's last(60s)+30min → A times out
        [ev("B", 12, 14400)],
    ]
    src = str(tmp_path / "events")
    os.makedirs(src)
    for i, rows in enumerate(batches):
        pdf = pd.DataFrame(rows)
        pdf["event_id"] = pdf["event_id"].astype("int64")
        pdf["ts"] = pdf["ts"].astype("datetime64[us]")
        pdf.to_parquet(os.path.join(src, f"b{i}.parquet"))
    out = str(tmp_path / "sessions")
    q = sessionize_stream(spark, src, out, str(tmp_path / "ckpt"))
    q.awaitTermination(300)
    got = {
        (r.user_id, r.start_ts): r for r in spark.read.parquet(out).collect()
    }

    # batch truth over the SAME events
    all_events = spark.createDataFrame(pd.concat(
        [pd.DataFrame(b) for b in batches], ignore_index=True
    ))
    truth = {
        (r.user_id, r.start_ts): r
        for r in session_stats(all_events).collect()
    }
    # stream emits every batch session except B's final open one
    assert set(got) == set(truth) - {("B", epoch + timedelta(seconds=14400))}
    for k, r in got.items():
        t = truth[k]
        assert (r.n_events, r.end_ts, r.duration_us) == (
            t.n_events, t.end_ts, t.duration_us
        ), k
    # A's dangling session closed by TIMEOUT, B's by in-stream gaps
    assert got[("A", epoch)].timed_out
    assert not got[("B", epoch)].timed_out
    # timeout evicted A's state; B's open session is the only state left
    # (observable: re-running the stream over the same checkpoint emits
    # nothing new)
    q2 = sessionize_stream(spark, src, out, str(tmp_path / "ckpt"))
    q2.awaitTermination(300)
    assert len(spark.read.parquet(out).collect()) == len(got)
