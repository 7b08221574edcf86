"""Structured Streaming jobs.

The reference is a cron-driven micro-batch streaming system (SURVEY.md
§2.8): hourly appends, windowed incremental aggregation, idempotent
upserts, late-data tolerance, client-side rate limiting. These are its
native Structured Streaming re-expressions:

* :func:`hourly_summary_stream` — T1 tumbling window + T2 idempotent upsert
  + T4 late-data watermark over a stream of richlist snapshot rows
  (≅ ``update_rich_list_summary`` + hourly stats, ``function.sql:2-94,
  858-948``) — file-source micro-batches stand in for the hourly cron.
* :func:`politeness_stream` — T8 rate limiting as a *custom stateful
  operator*: ``applyInPandasWithState`` keeps a per-host fetched-so-far
  counter across micro-batches, so the per-host budget holds over the
  whole stream, not just within one batch (``validator.py:123,181-182``).
* :func:`sessionize_stream` — the batch gaps-and-islands sessionization
  as a stateful stream: ``applyInPandasWithState`` with an EVENT-TIME
  TIMEOUT that closes a session exactly when the watermark passes
  ``last_event + gap`` and evicts the user's state (state tracks active
  users, never the user universe).
"""

from __future__ import annotations

import os
from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..functions.udfs import canonical_label_col
from ..schemas import RICHLIST

SUMMARY_KEYS = ["grouped_label", "window_start"]


def hourly_summary_stream(
    spark: SparkSession,
    snapshots_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    watermark: str = "2 hours",
    max_files_per_trigger: int | None = None,
):
    """Streaming hourly summary: per (canonical label, 1h window) totals.

    * watermark bounds state like the reference's banded late tolerance
      (``function.sql:160-165``) — snapshots later than ``watermark`` are
      dropped from open windows;
    * ``foreachBatch`` performs the idempotent keyed upsert the reference
      does with ON CONFLICT (``function.sql:892-897``): recompute replaces
      rows for the affected keys (MERGE INTO on Iceberg).

    Returns the StreamingQuery (caller awaits / stops).
    """
    stream = (
        spark.readStream.schema(RICHLIST)
        .option("maxFilesPerTrigger", max_files_per_trigger or 1000)
        .parquet(snapshots_dir)
    )
    agg = (
        stream.withWatermark("snapshot_date", watermark)
        .groupBy(
            F.window("snapshot_date", "1 hour").alias("w"),
            canonical_label_col(F.col("label")).alias("grouped_label"),
        )
        .agg(
            F.count("*").alias("count"),
            F.sum(F.col("balance_xrp").cast("decimal(20,6)")).alias("total_balance"),
            F.sum(F.col("escrow_xrp").cast("decimal(20,6)")).alias("total_escrow"),
            F.sum(
                F.col("balance_xrp").cast("decimal(20,6)")
                + F.col("escrow_xrp").cast("decimal(20,6)")
            ).alias("total_xrp"),
        )
        .select(
            "grouped_label",
            F.col("w.start").alias("window_start"),
            "count", "total_balance", "total_escrow", "total_xrp",
        )
    )

    def _upsert(batch: DataFrame, batch_id: int) -> None:
        # keyed upsert emulation (Iceberg: MERGE INTO ... WHEN MATCHED
        # UPDATE) via DYNAMIC PARTITION OVERWRITE on window_start: only the
        # batch's affected windows are read back, merged, and rewritten —
        # untouched windows' files are never touched. Round 1 rewrote the
        # ENTIRE accumulated output per micro-batch (O(total state), plus a
        # non-atomic double rewrite); cost is now O(batch's windows).
        sp = batch.sparkSession
        new = batch.withColumn("_b", F.lit(batch_id)).persist()
        # the batch's distinct windows: bounded by the watermark horizon —
        # a justified scalar collect, never row data
        wins = [r["window_start"] for r in new.select("window_start").distinct().collect()]
        if not wins:
            new.unpersist()
            return
        # NOTE: dynamic partition overwrite does NOT write a _SUCCESS marker
        # at the output root (verified empirically) — probing it left the
        # merge path dead and update-mode re-emissions masked the data loss
        # until a group's rows all landed in one early batch. Probe for
        # partition directories instead.
        import glob

        if glob.glob(os.path.join(out_dir, "window_start=*")):
            old = (
                sp.read.parquet(out_dir)
                # partition pruning: only affected windows are scanned
                .filter(F.col("window_start").isin(wins))
                .select(*new.columns)
            )
            merged = old.unionByName(new)
        else:
            merged = new
        from pyspark.sql import Window

        w = Window.partitionBy(*SUMMARY_KEYS).orderBy(F.col("_b").desc())
        final = (
            merged.withColumn("_rn", F.row_number().over(w))
            .filter("_rn = 1")
            .drop("_rn")
        )
        # stage the merged slice first: `final` lazily READS out_dir, so
        # writing it straight back is a self-read-overwrite (a task retry
        # after partition replacement could read deleted files). The stage
        # holds only the batch's windows — still O(batch), never O(total).
        import shutil

        staging = f"{out_dir}.stage-{batch_id}"
        final.write.mode("overwrite").parquet(staging)
        (
            sp.read.parquet(staging)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("window_start")
            .parquet(out_dir)
        )
        shutil.rmtree(staging, ignore_errors=True)
        new.unpersist()

    return (
        agg.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(_upsert)
        .trigger(availableNow=True)
        .start()
    )


# ---------------------------------------------------------------------------
# stateful politeness (applyInPandasWithState)
# ---------------------------------------------------------------------------

_POLITE_OUT = (
    "host string, url string, url_hash long, slot int, selected boolean, "
    "fetch_delay_s double"
)
_POLITE_STATE = "fetched long"


def _polite_fn(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
):
    """Per-host budget across ALL micro-batches: state carries the running
    fetched count; rows past the budget are emitted unselected (deferred)."""
    (host,) = key
    fetched = state.get[0] if state.exists else 0
    budget = 16  # reference batch_size, validator.py:123
    out = []
    for pdf in pdfs:
        pdf = pdf.sort_values(["depth", "discovery_ts", "url_hash"])
        n = len(pdf)
        slots = range(fetched + 1, fetched + n + 1)
        rows = pd.DataFrame(
            {
                "host": host,
                "url": pdf["url"].values,
                "url_hash": pdf["url_hash"].values,
                "slot": list(slots),
                "selected": [s <= budget for s in slots],
                "fetch_delay_s": [
                    float(max(s - 1, 0)) * float(pdf["crawl_delay_s"].iloc[0])
                    for s in slots
                ],
            }
        )
        fetched += int(rows["selected"].sum())
        out.append(rows)
    state.update((fetched,))
    for rows in out:
        yield rows


def frontier_dedup_stream(
    spark: SparkSession,
    frontier_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    watermark: str = "24 hours",
    max_files_per_trigger: int = 1,
):
    """Streaming URL-seen dedup: first sighting of each ``url_hash`` wins
    across ALL micro-batches (J2 as a stream).

    Uses Structured Streaming's native keyed dedup state via
    ``dropDuplicatesWithinWatermark`` — the engine-managed analog of the
    batch bloom+ledger path. Plain ``dropDuplicates(['url_hash'])`` would
    NEVER evict state (the watermark only bounds dedup state when the
    event-time column is part of the dedup key), so a long-running stream
    would grow without bound (ADVICE r02). The within-watermark variant
    evicts keys once the watermark passes them: a URL re-discovered later
    than the horizon may re-emit, which is the deliberate state/recall
    trade-off every streaming dedup makes (the batch ledger remains the
    exact truth).
    """
    schema = (
        "url string, url_hash long, host string, depth int, "
        "discovery_ts timestamp"
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(frontier_dir)
    )
    deduped = stream.withWatermark(
        "discovery_ts", watermark
    ).dropDuplicatesWithinWatermark(["url_hash"])
    return (
        deduped.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def politeness_stream(
    spark: SparkSession,
    frontier_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
):
    """Custom stateful streaming operator: token-bucket politeness whose
    per-host budget persists across micro-batches via
    ``applyInPandasWithState`` (north_rule politeness ledger as stream
    state). File micro-batches model successive frontier deliveries."""
    schema = (
        "url string, url_hash long, host string, depth int, "
        "discovery_ts timestamp, crawl_delay_s double"
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(frontier_dir)
    )
    assigned = stream.groupBy("host").applyInPandasWithState(
        _polite_fn,
        outputStructType=_POLITE_OUT,
        stateStructType=_POLITE_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return (
        assigned.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def corpus_dedup_stream(
    spark: SparkSession,
    docs_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    watermark: str = "24 hours",
    max_files_per_trigger: int = 1,
):
    """Streaming exact corpus dedup: the training-data twin of
    :func:`frontier_dedup_stream` — first sighting of each content hash
    wins across micro-batches of arriving documents.

    Dedup key = md5(text) computed JVM-side on the stream; state is
    engine-managed via ``dropDuplicatesWithinWatermark`` (evicted past
    the ingest-time watermark — the same state/recall trade as the URL
    stream; the batch ``dedup_exact`` over the full corpus remains the
    exact truth). The per-batch output appends only first-seen docs, so a
    continuously-arriving crawl feed is curated incrementally instead of
    re-scanning the corpus.
    """
    schema = "doc_id long, url string, text string, ingest_ts timestamp"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(docs_dir)
    )
    deduped = (
        stream.withColumn("_content_key", F.md5(F.col("text")))
        .withWatermark("ingest_ts", watermark)
        .dropDuplicatesWithinWatermark(["_content_key"])
        .drop("_content_key")
    )
    return (
        deduped.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def neardup_vs_reference_stream(
    spark: SparkSession,
    docs_dir: str,
    ref_index,
    out_dir: str,
    checkpoint_dir: str,
    watermark: str = "24 hours",
    n_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 9,
    max_files_per_trigger: int = 1,
):
    """Streaming incremental near-dup: micro-batches of arriving docs
    LSH-banded and STREAM-STATIC joined against the reference corpus's
    precomputed (id, band, bucket) index
    (:func:`..operators.dedup.reference_band_index`) — the continuous
    deployment of ``minhash_vs_reference``. Emits (new_id, ref_id,
    ingest_ts) candidate rows; exact verification stays a batch
    follow-up over candidates (linear, tiny).

    State: the ONLY streaming state is the pair-dedup
    (``dropDuplicatesWithinWatermark`` on (new_id, ref_id) — a doc
    bucketing with the same reference row in several bands would
    otherwise emit the pair once per band), evicted past the ingest
    watermark. The reference index carries no state at all: it is a
    static frame re-joined each micro-batch — persist it (done here) at
    sandbox scale; at 100 TB it is a ``bucketBy(band, bucket)`` table so
    each micro-batch's join shuffles only that batch's bands.
    """
    from ..operators.dedup import band_buckets, minhash_signatures_udf

    schema = "doc_id long, url string, text string, ingest_ts timestamp"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(docs_dir)
    )
    r = n_hashes // bands
    sig = minhash_signatures_udf(n_hashes, shingle_k)
    nb = band_buckets(
        stream.select(
            "doc_id", "ingest_ts", sig(F.col("text")).alias("sig")
        ),
        "doc_id", bands, r,
    ).select(
        F.col("doc_id").alias("new_id"), F.col("ingest_ts"),
        "band", "bucket",
    )
    ref = ref_index.select(
        F.col(ref_index.columns[0]).alias("ref_id"), "band", "bucket"
    ).persist()
    pairs = (
        nb.join(ref, ["band", "bucket"])
        .select("new_id", "ref_id", "ingest_ts")
        .withWatermark("ingest_ts", watermark)
        .dropDuplicatesWithinWatermark(["new_id", "ref_id"])
    )
    return (
        pairs.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def warc_ingest_stream(
    spark: SparkSession,
    warc_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 4,
):
    """Continuous WARC ingestion (late r05): new ``.warc``/``.warc.gz``
    files landing in ``warc_dir`` are parsed incrementally into response
    records — the streaming front door for a live crawler's output or a
    Common Crawl sync, feeding the same downstream operators as the
    batch :func:`..sources.warc.read_warc`.

    Exactly-once per FILE: the file-source ledger + checkpoint guarantee
    each WARC file is parsed in exactly one micro-batch (a restart never
    re-emits records — test-pinned), and the parse itself is the same
    stateless mapInPandas as batch, so no streaming state exists at all:
    state cost is zero regardless of corpus size, and per-trigger work is
    bounded by ``max_files_per_trigger`` × file size. Records append as
    parquet; payloads stay opaque binary (multimodal-column contract).
    """
    from ..sources.warc import parse_warc_df

    stream = (
        spark.readStream.format("binaryFile")
        # the binaryFile source's fixed schema, spelled out because
        # streaming sources cannot infer one
        .schema(
            "path string, modificationTime timestamp, "
            "length long, content binary"
        )
        .option("pathGlobFilter", "*.warc*")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(warc_dir)
    )
    recs = parse_warc_df(stream, file_col="path", content_col="content")
    return (
        recs.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def hll_register_stream(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema: str,
    key_col: str,
    value_col: str,
    p: int = 12,
    max_files_per_trigger: int | None = None,
):
    """Incremental cardinality maintenance (late r05): keep the per-key
    deterministic-HLL register table (operators/sketches.py) up to date
    as ledger files arrive — "distinct URLs per host, so far" over an
    unbounded fetch stream, without ever re-scanning history.

    Why this shape: Spark's own streaming ``approx_count_distinct``
    state is engine-private and unreadable; these registers are an
    ordinary parquet table any engine can read, merge, or estimate
    from. Each micro-batch sketches ONLY its own rows (bounded: ≤ 2^p
    register rows per key touched) and folds them into the persisted
    table by the HLL merge law (per-(key,bucket) MAX) — so after any
    prefix of batches the table is EXACTLY what a batch build over all
    rows seen so far would produce (test-pinned), and restarts are
    exactly-once per file via the source ledger + checkpoint.

    State cost: zero in the streaming engine (stateless transform +
    foreachBatch merge); the merge rewrite is O(register-table size) —
    the sketch, never the ledger. Returns the StreamingQuery.
    """
    import shutil

    from ..operators.sketches import hll_merge, hll_registers

    stream = spark.readStream.schema(schema)
    if max_files_per_trigger:
        stream = stream.option("maxFilesPerTrigger", max_files_per_trigger)
    src = stream.parquet(in_dir)

    def _merge(batch: DataFrame, batch_id: int) -> None:
        sp = batch.sparkSession
        regs = hll_registers(batch, key_col, value_col, p)
        if os.path.exists(os.path.join(out_dir, "_SUCCESS")):
            regs = hll_merge(sp.read.parquet(out_dir), regs)
        # stage-then-replace: the merged frame lazily READS out_dir, so
        # writing straight back would be a self-read-overwrite (same
        # hazard as hourly_summary_stream's upsert)
        staging = f"{out_dir}.stage-{batch_id}"
        regs.write.mode("overwrite").parquet(staging)
        sp.read.parquet(staging).write.mode("overwrite").parquet(out_dir)
        shutil.rmtree(staging, ignore_errors=True)

    return (
        src.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(_merge)
        .trigger(availableNow=True)
        .start()
    )


# ---------------------------------------------------------------------------
# streaming sessionization (applyInPandasWithState + event-time timeout)
# ---------------------------------------------------------------------------

_SESS_OUT = (
    "user_id string, n_events long, start_ts timestamp, "
    "end_ts timestamp, duration_us long, timed_out boolean"
)
_SESS_STATE = "start_us long, last_us long, n long"


def _make_sess_fn(gap_us: int):
    """Per-user session state machine (closure carries the gap).

    State = the user's OPEN session (start/last/event-count in integer
    microseconds — the batch ``sessions.sessionize`` exactness rule).
    A session is emitted when CLOSED, two ways:

    * a new event arrives with gap strictly greater than ``gap_us``
      (mirrors the batch ``>`` rule, ties stay in-session);
    * the event-time TIMEOUT fires — the watermark passed
      ``last + gap``, so no in-order event can extend the session;
      state is removed, which is what bounds state size to ACTIVE
      users (the politeness stream's NoTimeout counter is the
      contrast: tiny fixed state, never evicted).

    Sessions are identified by (user_id, start_ts) — stable across
    restarts; a numbering column would reset when timeout evicts state,
    so it is deliberately not part of the streaming contract (the batch
    job owns global session_ids).
    """

    def fn(key, pdfs, state: GroupState):
        (user,) = key
        if state.hasTimedOut:
            start_us, last_us, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user],
                    "n_events": [int(n)],
                    "start_ts": [pd.to_datetime(start_us, unit="us")],
                    "end_ts": [pd.to_datetime(last_us, unit="us")],
                    "duration_us": [int(last_us - start_us)],
                    "timed_out": [True],
                }
            )
            return
        if state.exists:
            start_us, last_us, n = state.get
        else:
            start_us = last_us = None
            n = 0
        closed = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for t in (pdf["ts"].astype("int64") // 1000).tolist():
                t = int(t)
                if start_us is None:
                    start_us, last_us, n = t, t, 1
                elif t - last_us > gap_us:
                    closed.append((start_us, last_us, n))
                    start_us, last_us, n = t, t, 1
                else:
                    last_us, n = t, n + 1
        state.update((start_us, last_us, n))
        # fire once the watermark proves no in-order extension can come
        state.setTimeoutTimestamp(last_us // 1000 + gap_us // 1000 + 1)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user] * len(closed),
                    "n_events": [int(n_) for _, _, n_ in closed],
                    "start_ts": [
                        pd.to_datetime(s, unit="us") for s, _, _ in closed
                    ],
                    "end_ts": [
                        pd.to_datetime(e, unit="us") for _, e, _ in closed
                    ],
                    "duration_us": [int(e - s) for s, e, _ in closed],
                    "timed_out": [False] * len(closed),
                }
            )

    return fn


def sessionize_stream(
    spark: SparkSession,
    events_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    gap_minutes: int = 30,
    watermark: str = "0 seconds",
    max_files_per_trigger: int = 1,
):
    """Streaming sessionization: the batch gaps-and-islands job
    (operators/sessions.py) as a custom stateful operator —
    ``applyInPandasWithState`` with an EVENT-TIME TIMEOUT, the session
    pattern ``dropDuplicatesWithinWatermark`` can't express (state is a
    running window, not a key set).

    Closed sessions stream out in append mode; the timeout closes a
    session exactly when the watermark passes ``last_event + gap`` (no
    in-order event can extend it) and EVICTS the user's state, so state
    size tracks currently-ACTIVE users, never the user universe. Each
    user's final session therefore emits only after a later batch
    advances the watermark past its horizon — the standard
    streaming-vs-batch tail difference, pinned in test_streaming.

    Scale shape: one shuffle by user per micro-batch (the stateful
    exchange); per-user per-batch event counts are bounded (the batch
    job's same argument); Arrow moves the batches, state is 3 longs per
    active user.
    """
    gap_us = int(gap_minutes) * 60 * 1_000_000
    schema = "user_id string, event_id long, ts timestamp"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(events_dir)
    )
    sess = (
        stream.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_sess_fn(gap_us),
            outputStructType=_SESS_OUT,
            stateStructType=_SESS_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
    return (
        sess.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
