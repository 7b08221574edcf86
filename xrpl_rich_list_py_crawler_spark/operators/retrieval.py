"""Inverted index + BM25 ranked retrieval over the crawled corpus.

The reference crawls pages and serves ranked lists (scraper.py builds
the rich list; validator.py re-ranks it per round); a web-scale corpus
engine additionally needs the classic search-side pair: build a postings
table from the fetched text, score queries against it. Both stay fully
JVM-side.

Scale shape (the part that must survive 100 TB):

* The postings table is posting ROWS ``(token, doc_id, tf)``, never
  per-token arrays — stopword postings lists are billions of entries on
  a web corpus and an ``collect_list`` per token would OOM a single
  task. Rows bucket/partition cleanly by token.
* Index build is ONE explode + map-side-combined groupBy keyed by
  (token, doc_id) — linear in corpus token count, no skew beyond the
  token distribution itself (and a hot token's postings spread over
  partitions because doc_id is in the grouping key).
* Query-time: the ``isin(query_tokens)`` filter prunes the scan (a
  handful of tokens against a token-bucketed/sorted table is a
  partition-pruned read); the per-term document frequencies are ≤
  |query| rows → broadcast; corpus constants (N, avgdl) are a 1-row
  aggregate → broadcast crossJoin (the engine's A1 pattern, never an
  empty-frame window). The only wide exchange is the final per-doc
  score sum keyed by doc_id, followed by ``orderBy().limit(k)`` →
  TakeOrderedAndProject (parallel partial top-k).

BM25 uses the Lucene/Robertson formulation::

    idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
    s(d, t) = idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))

All inputs to the formula are exact integers (tf, df, N, dl) or exact
integer ratios, so each PER-TERM double is bit-identical across engines
(one ``ln`` — same stance as the HLL estimate in sketches.py). The
per-document SUM of term scores is where engines would diverge (double
summation is order-dependent — the house rule, plans/jobs.py:34), so
term scores are fixed-pointed to integer micro-units first and summed
as BIGINT: integer addition is order-free, making the ranking exactly
reproducible under any partitioning and in the DuckDB twin.
"""

from __future__ import annotations

import re
from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textstats import WS


def build_postings(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Posting rows (token, doc_id, tf) — lower-cased, split on the
    portable whitespace class (the cross-engine ``\\s`` margin lesson,
    textstats.WS)."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), WS)).alias("token"),
    ).filter(F.col("token") != "")
    return toks.groupBy("token", "doc_id").agg(
        F.count(F.lit(1)).alias("tf")
    )


def doc_lengths(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, dl): per-document token count, same tokenization as
    :func:`build_postings` (per-row array ops, no shuffle)."""
    arr = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), WS), lambda t: t != ""
    )
    return df.select(
        F.col(id_col).alias("doc_id"), F.size(arr).cast("long").alias("dl")
    )


def bm25_topk(
    postings: DataFrame,
    lengths: DataFrame,
    query_tokens: Sequence[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` documents for a bag-of-words query: (doc_id, score,
    n_matched). Deterministic: ties break by doc_id ascending."""
    toks = sorted(set(query_tokens))
    matched = postings.filter(F.col("token").isin(toks))
    # per-term document frequency: (token, doc_id) is unique in the
    # postings table, so df is a plain count — ≤ |query| result rows
    dfreq = matched.groupBy("token").agg(F.count(F.lit(1)).alias("dft"))
    # corpus constants: one 1-row aggregate, broadcast to every score row
    stats = lengths.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    scored = (
        matched.join(F.broadcast(dfreq), "token")
        .join(lengths, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("dft") + F.lit(0.5))
        / (F.col("dft") + F.lit(0.5))
    )
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / avgdl
    )
    term_score = idf * F.col("tf") * F.lit(k1 + 1.0) / denom
    # fixed-point BEFORE the sum: micro-unit BIGINTs add order-free
    term_micro = F.round(term_score * F.lit(1_000_000.0)).cast("bigint")
    per_doc = (
        scored.select("doc_id", term_micro.alias("s_micro"))
        .groupBy("doc_id")
        .agg(
            F.sum("s_micro").alias("score_micro"),
            F.count(F.lit(1)).alias("n_matched"),
        )
    )
    out = per_doc.select(
        "doc_id",
        "score_micro",
        (F.col("score_micro") / F.lit(1_000_000.0)).alias("score"),
        "n_matched",
    )
    return out.orderBy(F.col("score_micro").desc(), F.col("doc_id")).limit(k)


def postings_delta(
    prev_docs: DataFrame,
    cur_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Incremental index maintenance: the posting-row edits that take
    the PREVIOUS snapshot's index to the CURRENT one — ``del`` rows for
    documents that disappeared or changed, ``add`` rows for documents
    that appeared or changed. Unchanged documents emit NOTHING, which is
    the whole point: after the first build, a 100 TB re-crawl touches
    the index only in proportion to the delta (typically a few percent),
    not the corpus.

    Shape: per-row md5 digests (codegen) → one id-keyed full-outer diff
    (:func:`..frontier.snapshot_diff`) → two id-keyed semi joins that
    restrict tokenization to delta documents → postings built on those
    slices only. Output: (op, token, doc_id, tf).
    """
    from .frontier import snapshot_diff

    t = F.col(text_col)
    diff = snapshot_diff(
        prev_docs.select(
            F.col(id_col), F.md5(t).alias("content_hash")
        ),
        cur_docs.select(
            F.col(id_col), F.md5(t).alias("content_hash")
        ),
        key_col=id_col,
    )
    del_ids = diff.filter(
        F.col("change").isin("removed", "changed")
    ).select(id_col)
    add_ids = diff.filter(
        F.col("change").isin("added", "changed")
    ).select(id_col)
    dels = build_postings(
        prev_docs.join(del_ids, id_col, "left_semi"), text_col, id_col
    ).select(F.lit("del").alias("op"), "token", "doc_id", "tf")
    adds = build_postings(
        cur_docs.join(add_ids, id_col, "left_semi"), text_col, id_col
    ).select(F.lit("add").alias("op"), "token", "doc_id", "tf")
    return dels.unionByName(adds)


def apply_postings_delta(
    postings: DataFrame, delta: DataFrame
) -> DataFrame:
    """Apply a :func:`postings_delta` edit stream to an existing
    postings table: drop every (token, doc_id) with a ``del`` row, then
    append the ``add`` rows. Both steps key on (token, doc_id) — the
    postings table's natural bucketing — so application is two
    co-partitioned joins, no full rebuild. Law (pinned in tests):
    ``apply(build(prev), delta(prev, cur)) == build(cur)``."""
    dels = delta.filter(F.col("op") == "del").select("token", "doc_id")
    adds = delta.filter(F.col("op") == "add").select(
        "token", "doc_id", "tf"
    )
    survived = postings.join(dels, ["token", "doc_id"], "left_anti")
    return survived.unionByName(adds)


def compact_postings_deltas(
    base: DataFrame, deltas: Sequence[DataFrame]
) -> DataFrame:
    """LSM-style compaction: fold a whole STACK of
    :func:`postings_delta` generations into the base index with ONE
    shuffle, instead of the N anti-join+union rounds that iterating
    :func:`apply_postings_delta` would cost.

    Every row is tagged with its generation (base = 0, deltas 1..N in
    application order) and the winner per (token, doc_id) is selected by
    ``max_by`` over the priority ``gen·2 + (op = 'add')`` — within one
    generation an ``add`` outranks the ``del`` for the same posting,
    exactly reproducing apply's del-then-append order for a changed
    document. Rows whose final op is ``del`` drop out. Law (pinned in
    tests, and value-checked by the oracle against a from-scratch index
    of the FINAL snapshot): ``compact(build(s0), [delta(s0,s1), ...,
    delta(s_{n-1}, s_n)]) == build(s_n)``.

    Scale shape: one union (no shuffle) + one map-side-combined groupBy
    keyed by (token, doc_id) — the postings table's natural bucketing,
    so on a bucketed index store the exchange disappears entirely.
    Compaction cost is proportional to base + delta mass, independent of
    the number of generations; the iterative alternative re-shuffles the
    whole surviving index once PER generation.
    """
    tagged = [
        base.select(
            "token",
            "doc_id",
            "tf",
            F.lit("add").alias("op"),
            F.lit(0).alias("gen"),
        )
    ]
    for i, d in enumerate(deltas, start=1):
        tagged.append(
            d.select("token", "doc_id", "tf", "op", F.lit(i).alias("gen"))
        )
    allrows = tagged[0]
    for t in tagged[1:]:
        allrows = allrows.unionByName(t)
    prio = F.col("gen") * 2 + F.when(F.col("op") == "add", 1).otherwise(0)
    latest = allrows.groupBy("token", "doc_id").agg(
        F.max_by(F.struct("op", "tf"), prio).alias("last")
    )
    return latest.filter(F.col("last.op") == "add").select(
        "token", "doc_id", F.col("last.tf").alias("tf")
    )


def build_positional_postings(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Positional posting rows (token, doc_id, pos) — the index layout
    phrase and proximity queries need, which the tf-only
    :func:`build_postings` cannot answer. Same portable tokenization
    (lower, trim, textstats.WS split, empties dropped BEFORE
    positions so offsets are over the real token sequence); ``pos`` is
    0-based. Storage is one row per token occurrence — the classic
    positional-index ~2-3× size premium over tf postings, paid only
    when phrase search is part of the product.

    Scale shape: shuffle-free posexplode (one codegen pass per doc);
    persist/bucket by ``token`` downstream exactly like tf postings.
    """
    arr = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), WS),
        lambda t: t != "",
    )
    return df.select(
        F.col(id_col).alias("doc_id"), F.posexplode(arr).alias("pos", "token")
    ).select("token", "doc_id", F.col("pos").cast("long").alias("pos"))


def phrase_search(
    positional: DataFrame, phrase: str
) -> DataFrame:
    """Exact phrase retrieval over a positional index: docs where the
    phrase's tokens occur CONSECUTIVELY, with the match count — the
    query-time complement of the scan-time
    :func:`..curation.phrase_blocklist_filter` gate (index once, then
    answer many phrase queries without touching the corpus).

    The classic anchor trick: occurrence of phrase token #o at position
    p can only belong to a match starting at ``anchor = p − o``; group
    by (doc, anchor) and demand ALL m offsets present
    (count(DISTINCT offset) = m — exact even when the phrase repeats a
    token, where a plain count would double-credit one offset).

    Scale shape: the m-row phrase dim broadcasts; the semi-ish join
    keeps only postings of the phrase's tokens (predicate-pushable on a
    token-bucketed index — the scan never reads other tokens' rows),
    then ONE groupBy on (doc_id, anchor). Linear in matching postings;
    never touches documents.

    Output: (doc_id, n_hits), n_hits = number of distinct start
    positions of the full phrase.
    """
    toks = [
        t
        for t in re.split("[ \t\n\r\f\x0b]+", phrase.lower().strip())
        if t
    ]
    if not toks:
        raise ValueError("phrase_search: empty phrase")
    m = len(toks)
    spark = positional.sparkSession
    dim = spark.createDataFrame(
        [(t, i) for i, t in enumerate(toks)], "token: string, off: long"
    )
    anchored = positional.join(F.broadcast(dim), "token").select(
        "doc_id", (F.col("pos") - F.col("off")).alias("anchor"), "off"
    ).filter(F.col("anchor") >= 0)
    return (
        anchored.groupBy("doc_id", "anchor")
        .agg(F.countDistinct("off").alias("_k"))
        .filter(F.col("_k") == m)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )


def proximity_search(
    positional: DataFrame, terms: Sequence[str], window: int = 8
) -> DataFrame:
    """Unordered proximity retrieval: docs where ALL ``terms`` co-occur
    inside a ``window``-token span — the relevance signal between bag-
    of-words BM25 (any distance) and :func:`phrase_search` (distance
    exactly 1). An anchor is a term occurrence whose forward window
    ``[pos, pos+window-1]`` contains every query term; the doc's
    ``n_anchors`` counts them (deterministic, engine-portable — no
    "minimal cover" ambiguity).

    The trick is a BITMASK range frame: term #i maps to bit ``1<<i``
    (broadcast dim, ≤ 62 terms), and one ``bit_or`` window aggregate
    over ``RANGE [0, window-1]`` ordered by position tells whether the
    span covers the full mask — integer-exact, identical in Spark and
    DuckDB, and repeats of a term inside the span are absorbed by the
    OR instead of miscounting (the count-distinct pitfall).

    Scale shape: same as :func:`phrase_search` — only the query terms'
    postings survive the broadcast join (partition-pruned on a
    token-bucketed index); the range window is keyed BY doc over those
    few rows, never global.
    """
    toks = [t.lower() for t in terms]
    if not toks or len(set(toks)) != len(toks):
        raise ValueError("proximity_search: terms must be non-empty and unique")
    if len(toks) > 62:
        raise ValueError("proximity_search: more than 62 terms")
    m = len(toks)
    spark = positional.sparkSession
    dim = spark.createDataFrame(
        [(t, 1 << i) for i, t in enumerate(toks)], "token: string, bit: long"
    )
    joined = positional.join(F.broadcast(dim), "token").select(
        "doc_id", "pos", "bit"
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rangeBetween(0, int(window) - 1)
    )
    full = (1 << m) - 1
    anchors = joined.withColumn("_m", F.bit_or("bit").over(w)).filter(
        F.col("_m") == full
    )
    return anchors.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_anchors")
    )
