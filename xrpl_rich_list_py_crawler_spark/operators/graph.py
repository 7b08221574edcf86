"""Host-graph PageRank: derive the crawl's ``host_rank`` priority input
from the link graph itself.

The reference pipeline consumes a per-host rank as a given (the frontier
order key ``host_rank``, see ``frontier.order_cols``); a real crawler
computes it from the hyperlink graph it has already fetched. This module
is the iterative-graph-algorithm sibling of
:func:`dedup.connected_components` — same loop discipline
(``localCheckpoint`` per round so the lineage/analyzer never blows up),
same determinism ban on floats in accumulators.

**Exact integer PageRank.** Float PageRank sums are
addition-order-dependent, which breaks both the cross-engine oracle and
the parallelism-invariance contract. Ranks here are integers scaled by
``scale`` (default 10^12):

* initial rank   = ``scale div n_hosts``
* edge contribution = ``rank div out_degree``   (integral ``div``)
* dangling share = ``sum(dangling ranks) div n_hosts``
* update         = ``((100-d)·base + d·(insum + dangling)) div 100``
  with ``d = damping_pct`` (default 85 ≙ the classic 0.85)

Every operation is integral, so Spark and DuckDB produce bit-identical
ranks, and results are independent of partitioning. Total mass decays by
a few units per iteration to truncation — irrelevant for a ranking
score, disclosed here.

Scale shape: the (edges ⋈ out-degree) join and the dangling-host set
are loop-invariant — computed once and persisted — so each iteration is
ONE keyed equi join (pre-degreed edges ⋈ ranks on src) and one
groupBy(dst) with map-side partial integer sums, linear in |edges|: the
standard distributed-PageRank plan. At 10^8 hosts, bucket/pre-partition
``edges_deg`` by src once and every iteration's join reuses the layout
with no edge-side exchange (the ``bucketize_pages`` pattern). Hub skew on popular dst hosts is absorbed by
partial aggregation (integer sum is associative); the dangling mass is a
1-row aggregate joined back via broadcast crossJoin (never an empty
window — the engine's A1 discipline). Nothing row-sized ever reaches the
driver; the only driver scalar is ``n_hosts`` (one count).

Composition with the crawl: feed ``edges_from_pages`` (host pairs from
the already-fetched corpus via the JVM link extractor) and pass the
result straight into ``seeds_to_frontier``'s ``host_rank`` column —
pinned in tests/test_graph.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def edges_from_pages(pages: DataFrame, url_col: str = "url", html_col: str = "html") -> DataFrame:
    """Distinct host→host edges from a fetched pages corpus, using the
    engine's JVM link extractor + canonicalizer (no Python). Self-loops
    (intra-host links) dropped — PageRank on the HOST graph measures
    cross-site endorsement."""
    from ..functions.udfs import (
        canonicalize_urls_split,
        extract_links_col,
        host_col,
    )

    links = pages.select(
        # pages.url is the fetched canonical url (catalog invariant), so
        # the JVM host extractor applies directly
        host_col(F.col(url_col)).alias("src"),
        F.explode(extract_links_col(F.col(html_col))).alias("_raw"),
    )
    canon = canonicalize_urls_split(links, "_raw", "_dst_url")
    return (
        canon.select("src", host_col(F.col("_dst_url")).alias("dst"))
        .filter(
            F.col("src").isNotNull()
            & F.col("dst").isNotNull()
            & (F.col("src") != "")
            & (F.col("dst") != "")
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def host_pagerank(
    edges: DataFrame,
    n_iter: int = 5,
    scale: int = 10**12,
    damping_pct: int = 85,
) -> DataFrame:
    """Integer-exact PageRank over a distinct (src, dst) edge list.

    Returns (host, rank) with ``rank`` the scaled integer score;
    ``orderBy(rank desc)`` is the crawl-priority order. See module
    docstring for the exact update rule and why it is bit-identical
    across engines and partitionings.
    """
    if not 0 < damping_pct < 100:
        raise ValueError(f"damping_pct must be in (0,100), got {damping_pct}")
    hosts = (
        edges.select(F.col("src").alias("host"))
        .union(edges.select(F.col("dst").alias("host")))
        .distinct()
    )
    n = hosts.count()  # the one driver scalar (bounded: #hosts)
    if n == 0:
        return hosts.withColumn("rank", F.lit(0).cast("long"))
    base = scale // n
    keep = 100 - damping_pct
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("odeg"))
    # loop-invariant hoists: the (edge, out-degree) join and the dangling
    # host set never change across iterations — join/compute them ONCE and
    # persist, so each iteration is exactly one keyed join + one groupBy
    # over the edge list (plus two 1-row aggregates)
    edges_deg = edges.join(outdeg, "src").persist()
    dangling_hosts = hosts.join(
        outdeg.withColumnRenamed("src", "host"), "host", "left_anti"
    ).persist()
    ranks = hosts.select("host", F.lit(base).cast("long").alias("rank"))
    for _ in range(n_iter):
        contribs = (
            edges_deg.join(ranks.withColumnRenamed("host", "src"), "src")
            .select(
                F.col("dst").alias("host"),
                F.expr("rank div odeg").alias("_c"),
            )
            .groupBy("host")
            .agg(F.sum("_c").alias("insum"))
        )
        dangling = (
            ranks.join(dangling_hosts, "host", "leftsemi")
            .agg(F.coalesce(F.sum("rank"), F.lit(0)).alias("_dsum"))
            .select(F.expr(f"_dsum div {n}").alias("dshare"))
        )
        ranks = (
            ranks.select("host")
            .join(contribs, "host", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "host",
                F.expr(
                    f"CAST(({keep} * {base} + {damping_pct} * "
                    f"(coalesce(insum, CAST(0 AS LONG)) + dshare)) div 100 AS LONG)"
                ).alias("rank"),
            )
        )
        # bound the lineage per iteration (the connected_components
        # discipline, dedup.py) — without this the analyzer re-expands
        # the whole loop every round
        ranks = ranks.localCheckpoint(eager=True)
    edges_deg.unpersist()
    dangling_hosts.unpersist()
    return ranks


def resolve_redirects(
    redirects: DataFrame,
    url_col: str = "url",
    target_col: str = "redirect_to",
    max_hops_log2: int = 3,
) -> DataFrame:
    """Resolve 3xx redirect chains to their final destination by POINTER
    DOUBLING: ``k`` self-join rounds chase ``2^k`` hops, so an 8-hop cap
    costs 3 joins, a 1024-hop cap 10 — never a hop-at-a-time loop over a
    10^9-edge redirect ledger (a crawler must resolve chains before
    dedup/canonicalization or every hop inflates the frontier).

    Input: one row per redirecting url (``url_col`` → ``target_col``;
    at most one outgoing target per url — crawl ledgers satisfy this by
    latest-per-key). Output, one row per redirecting url:

    * ``final_url`` / ``n_hops`` / ``terminal=true`` — the chain reaches
      a non-redirecting url within ``2^max_hops_log2`` hops (``n_hops``
      = exact edges traversed);
    * ``final_url = NULL`` / ``n_hops = NULL`` / ``terminal=false`` —
      unresolved within the cap (longer chain, or a redirect CYCLE —
      cycles can never terminate, so the cap is also the loop guard).

    Invariant each round: a ``done`` row's (cur, hops) is final; a live
    row's hops == 2^round exactly. Lineage is localCheckpoint-bounded
    per round (the connected_components/pagerank loop discipline).
    """
    state = redirects.select(
        F.col(url_col).alias("src"),
        F.col(target_col).alias("cur"),
        F.lit(1).cast("long").alias("hops"),
    )
    # done = cur does not redirect further (terminal destination)
    targets = redirects.select(F.col(url_col).alias("cur"))
    state = state.join(targets, "cur", "left_anti").withColumn(
        "done", F.lit(True)
    ).unionByName(
        state.join(targets, "cur", "left_semi").withColumn(
            "done", F.lit(False)
        )
    )
    for _ in range(int(max_hops_log2)):
        # s_{k+1}(u) = s_k(s_k(u)): live rows follow their cur's state;
        # the probe side is renamed (never a raw self-join — attribute
        # ambiguity)
        b = state.select(
            F.col("src").alias("bsrc"),
            F.col("cur").alias("bcur"),
            F.col("hops").alias("bhops"),
            F.col("done").alias("bdone"),
        )
        step = state.join(b, state["cur"] == b["bsrc"], "left")
        keep = F.col("done") | F.col("bsrc").isNull()
        state = step.select(
            "src",
            F.when(keep, F.col("cur")).otherwise(F.col("bcur"))
            .alias("cur"),
            F.when(keep, F.col("hops"))
            .otherwise(F.col("hops") + F.col("bhops")).alias("hops"),
            (keep | F.col("bdone")).alias("done"),
        )
        state = state.localCheckpoint(eager=True)
    return state.select(
        F.col("src").alias(url_col),
        F.when(F.col("done"), F.col("cur")).alias("final_url"),
        F.when(F.col("done"), F.col("hops")).alias("n_hops"),
        F.col("done").alias("terminal"),
    )


def host_hits(
    edges: DataFrame,
    n_iter: int = 4,
    scale: int = 10**12,
) -> DataFrame:
    """Integer-exact HITS (Kleinberg) over a distinct (src, dst) host
    edge list: returns (host, auth, hub) — the hub/authority pair is
    the classic crawl-priority complement to :func:`host_pagerank`
    (directory-ish hub pages are where frontiers find fresh links;
    authorities are what the corpus should keep).

    Same determinism stance as ``host_pagerank``: float HITS normalizes
    by an L2 norm (order-dependent float sums — breaks the oracle and
    the parallelism-invariance contract), so this keeps every step
    integral. Per iteration:

    * ``auth_raw(p) = Σ hub(q)`` over in-edges q→p (exact long sums);
    * normalize by the UNIT-DIVIDE rule: ``unit = greatest(1,
      total div scale)``; ``auth = auth_raw div unit`` — one integral
      division per node, values re-bounded near ``scale`` every
      iteration so no product ever overflows (the naive
      ``v·scale div total`` multiply overflows long at indegree ≥ ~10);
    * then the mirrored hub update from the fresh auth scores.

    L1-style unit normalization preserves HITS's ranking fixpoint
    direction (scores are scale-invariant in HITS; only relative size
    matters) while making every engine/partitioning bit-identical.
    Hosts with no in-links keep auth 0; no out-links, hub 0 (the
    classic convention), both pinned via the host-spine left join.

    Scale shape: identical to PageRank's — each half-iteration is ONE
    keyed equi join (edges ⋈ scores) + one groupBy with map-side
    partial integer sums, linear in |edges|; the normalization total is
    a 1-row aggregate joined back via broadcast crossJoin (A1
    discipline, never an empty window); edges and the host spine are
    loop-invariant (persisted once); lineage is localCheckpoint-bounded
    per iteration (the connected_components/pagerank loop discipline).
    At 10^8 hosts, bucket the edge table by src once and both
    half-iterations reuse the layout.
    """
    hosts = (
        edges.select(F.col("src").alias("host"))
        .union(edges.select(F.col("dst").alias("host")))
        .distinct()
    )
    n = hosts.count()  # the one driver scalar (bounded: #hosts)
    if n == 0:
        return hosts.select(
            "host",
            F.lit(0).cast("long").alias("auth"),
            F.lit(0).cast("long").alias("hub"),
        )
    e = edges.persist()
    spine = hosts.persist()
    hub = spine.select("host", F.lit(scale // n).cast("long").alias("s"))

    def _half(scores: DataFrame, join_on: str, group_to: str) -> DataFrame:
        raw = (
            e.join(scores.withColumnRenamed("host", join_on), join_on)
            .groupBy(F.col(group_to).alias("host"))
            .agg(F.sum("s").alias("raw"))
        )
        total = raw.agg(
            F.greatest(
                F.lit(1).cast("long"),
                F.expr(f"coalesce(sum(raw), CAST(0 AS LONG)) div {scale}"),
            ).alias("unit")
        )
        return (
            spine.join(raw, "host", "left")
            .crossJoin(F.broadcast(total))
            .select(
                "host",
                F.expr("coalesce(raw, CAST(0 AS LONG)) div unit")
                .cast("long")
                .alias("s"),
            )
        )

    auth = None
    for _ in range(int(n_iter)):
        auth = _half(hub, "src", "dst").localCheckpoint(eager=True)
        hub = _half(auth, "dst", "src").localCheckpoint(eager=True)
    out = (
        auth.withColumnRenamed("s", "auth")
        .join(hub.withColumnRenamed("s", "hub"), "host")
        .select("host", "auth", "hub")
    )
    # auth/hub are already checkpointed (lineage cut), so the loop
    # invariants can be freed before the caller acts
    e.unpersist()
    spine.unpersist()
    return out


def trust_rank(
    edges: DataFrame,
    seeds: DataFrame,
    n_iter: int = 5,
    scale: int = 10**12,
    damping_pct: int = 85,
) -> DataFrame:
    """Integer-exact TrustRank (Gyöngyi et al.): PageRank whose teleport
    mass goes ONLY to a trusted seed whitelist — the spam-resistant host
    score. Plain PageRank is gameable (a link farm manufactures rank
    from nothing because every host receives teleport mass); TrustRank
    starts all mass on hand-verified seeds and lets it flow along links,
    so a farm unreachable from any seed scores EXACTLY zero (integral
    arithmetic, not epsilon) and the frontier never prioritizes it.
    Drop-in for :func:`host_pagerank` as the crawl's ``host_rank``
    input; the standard deployment combines both (spam gap = pagerank
    high, trustrank low).

    Update rule, all integral (same bit-identical-across-engines
    contract as :func:`host_pagerank` — see module docstring):
    ``base = scale div n_seeds``; rank0 = base on seeds else 0;
    ``rank' = (keep·base·[seed] + damping·(insum + dshare·[seed]))
    div 100`` with dangling mass ``dshare = dangling_sum div n_seeds``
    re-teleported to seeds only. With seeds = ALL hosts this is
    exactly :func:`host_pagerank` (pinned in tests/test_graph.py).

    Scale shape: identical to host_pagerank — the (edge, out-degree)
    join and dangling set are hoisted once; each iteration is one keyed
    join + one groupBy over the edge list plus two 1-row aggregates;
    lineage bounded per iteration with localCheckpoint. ``seeds`` is a
    whitelist (10^2-10^4 hosts): the flag join broadcasts.
    """
    if not 0 < damping_pct < 100:
        raise ValueError(f"damping_pct must be in (0,100), got {damping_pct}")
    hosts = (
        edges.select(F.col("src").alias("host"))
        .union(edges.select(F.col("dst").alias("host")))
        .distinct()
    )
    seed_flag = F.broadcast(
        seeds.select(F.col("host")).distinct().withColumn("_seed", F.lit(True))
    )
    flagged = hosts.join(seed_flag, "host", "left").select(
        "host", F.coalesce("_seed", F.lit(False)).alias("is_seed")
    ).persist()
    n_s = flagged.filter("is_seed").count()  # bounded driver scalar
    if n_s == 0:
        raise ValueError("trust_rank: no seed host appears in the graph")
    base = scale // n_s
    keep = 100 - damping_pct
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("odeg"))
    edges_deg = edges.join(outdeg, "src").persist()
    dangling_hosts = flagged.select("host").join(
        outdeg.withColumnRenamed("src", "host"), "host", "left_anti"
    ).persist()
    ranks = flagged.select(
        "host",
        "is_seed",
        F.when(F.col("is_seed"), F.lit(base)).otherwise(F.lit(0))
        .cast("long").alias("rank"),
    )
    for _ in range(n_iter):
        contribs = (
            edges_deg.join(
                ranks.select(F.col("host").alias("src"), "rank"), "src"
            )
            .select(
                F.col("dst").alias("host"),
                F.expr("rank div odeg").alias("_c"),
            )
            .groupBy("host")
            .agg(F.sum("_c").alias("insum"))
        )
        dangling = (
            ranks.join(dangling_hosts, "host", "leftsemi")
            .agg(F.coalesce(F.sum("rank"), F.lit(0)).alias("_dsum"))
            .select(F.expr(f"_dsum div {n_s}").alias("dshare"))
        )
        ranks = (
            flagged.join(contribs, "host", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "host",
                "is_seed",
                F.expr(
                    f"CAST(((CASE WHEN is_seed THEN {keep} * {base} "
                    f"ELSE 0 END) + {damping_pct} * "
                    f"(coalesce(insum, CAST(0 AS LONG)) + "
                    f"(CASE WHEN is_seed THEN dshare ELSE 0 END))) "
                    f"div 100 AS LONG)"
                ).alias("rank"),
            )
        )
        ranks = ranks.localCheckpoint(eager=True)
    edges_deg.unpersist()
    dangling_hosts.unpersist()
    flagged.unpersist()
    return ranks.select("host", "is_seed", "rank")


def mirror_hosts(
    pages: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    min_shared: int = 3,
    max_hash_freq: int | None = 20,
) -> DataFrame:
    """Mirror-site detection: host pairs serving many IDENTICAL page
    bodies — the web-corpus reality (mirrors, CDNs, parked duplicates)
    that doc-level dedup pays for one page at a time but a crawler
    should solve once at the HOST level: detect the mirror, crawl one
    side, map the other. Page identity is ``md5(text)``; a pair's
    ``n_shared`` counts distinct shared bodies, with coverage ratios
    per side (a strict-subset mirror has share ≈ 1 on the smaller
    host). ``max_hash_freq`` drops bodies served by more than that
    many hosts first — empty pages and boilerplate error bodies are
    the web's most-mirrored content and carry no mirror signal (the
    same too-common rule as winnow clone blocking).

    Scale shape: one (host, md5) distinct; the self-join is keyed by
    content hash with bucket sizes ≤ ``max_hash_freq``; one
    (host_a, host_b) groupBy. All counts integral; ratios divided once
    and rounded — engine-portable.
    """
    from ..functions.udfs import host_col

    hp = (
        pages.select(
            host_col(F.col(url_col)).alias("host"),
            F.md5(F.col(text_col)).alias("h"),
        )
        .distinct()
        .persist()
    )
    if max_hash_freq is not None:
        freq = hp.groupBy("h").agg(F.count(F.lit(1)).alias("_n"))
        hp = hp.join(
            freq.filter(F.col("_n") <= int(max_hash_freq)).select("h"),
            "h",
            "left_semi",
        )
    sizes = hp.groupBy("host").agg(F.count(F.lit(1)).alias("_nh"))
    a = hp.select(F.col("host").alias("host_a"), "h")
    b = hp.select(F.col("host").alias("host_b"), "h")
    shared = (
        a.join(b, "h")
        .filter(F.col("host_a") < F.col("host_b"))
        .groupBy("host_a", "host_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= int(min_shared))
    )
    sa = sizes.withColumnRenamed("host", "host_a").withColumnRenamed(
        "_nh", "_na"
    )
    sb = sizes.withColumnRenamed("host", "host_b").withColumnRenamed(
        "_nh", "_nb"
    )
    return (
        shared.join(sa, "host_a")
        .join(sb, "host_b")
        .select(
            "host_a",
            "host_b",
            F.col("n_shared").cast("bigint").alias("n_shared"),
            F.round(F.col("n_shared") / F.col("_na"), 6).alias("share_a"),
            F.round(F.col("n_shared") / F.col("_nb"), 6).alias("share_b"),
        )
    )
