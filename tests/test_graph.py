"""Host PageRank (operators/graph.py): exact-integer semantics on hand
graphs, mass conservation, dangling redistribution, partitioning
invariance, composition with the real crawl fixture link graph, and the
at-scale plan shape."""

import contextlib
import io
import os

from pyspark.sql import functions as F

from xrpl_rich_list_py_crawler_spark.operators.graph import (
    edges_from_pages,
    host_pagerank,
)

SCALE = 10**12


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, ["src", "dst"])


def _ranks(df) -> dict:
    return {r["host"]: r["rank"] for r in df.collect()}


def test_two_node_cycle_is_symmetric(spark):
    r = _ranks(host_pagerank(_edges(spark, [("a", "b"), ("b", "a")])))
    assert r["a"] == r["b"]
    # no dangling, 2 hosts: mass decays only by div-by-100 truncation
    assert abs(sum(r.values()) - SCALE) <= 10 * 5  # ≤ a few units/iter


def test_star_hub_outranks_leaves(spark):
    leaves = [f"l{i}" for i in range(5)]
    r = _ranks(host_pagerank(_edges(spark, [(l, "hub") for l in leaves])))
    assert all(r["hub"] > r[l] for l in leaves)
    assert len(set(r[l] for l in leaves)) == 1  # symmetric leaves tie


def test_dangling_mass_redistributes(spark):
    # c has in-links but no out-links: its rank must flow back to all
    # hosts (not vanish) — with redistribution a pure sink still ends up
    # ABOVE the (1-d)*base floor it would bottom out at otherwise
    r = _ranks(host_pagerank(_edges(spark, [("a", "c"), ("b", "c"), ("a", "b")])))
    n = 3
    base = SCALE // n
    floor_no_redistribution = (15 * base) // 100
    assert r["c"] > base  # the sink accumulates
    assert r["a"] > floor_no_redistribution
    # total mass conserved up to integer truncation
    assert abs(sum(r.values()) - SCALE) <= 100


def test_partitioning_invariance(spark):
    pairs = [(f"h{i}", f"h{(i * 7 + 3) % 20}") for i in range(60) if i % 20 != (i * 7 + 3) % 20]
    e = _edges(spark, pairs)
    a = _ranks(host_pagerank(e.repartition(1)))
    b = _ranks(host_pagerank(e.repartition(13, "dst")))
    assert a == b


def test_composes_with_crawl_fixture_graph(spark, crawl_sf0001):
    pages = spark.read.parquet(os.path.join(crawl_sf0001, "pages.parquet"))
    edges = edges_from_pages(pages)
    rows = edges.collect()
    assert rows, "fixture link graph must be non-empty"
    assert all(r["src"] != r["dst"] for r in rows)
    ranks = host_pagerank(edges, n_iter=3)
    got = ranks.orderBy(F.desc("rank"), "host").limit(3).collect()
    assert got and got[0]["rank"] >= got[-1]["rank"]
    # the output column pair IS the frontier's host_rank dim shape
    assert set(ranks.columns) == {"host", "rank"}


def test_plan_no_cartesian(spark):
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "a")])
    df = host_pagerank(e, n_iter=1)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    plan = buf.getvalue()
    # the only nested-loop allowed is the broadcast 1-row dangling dim
    # (the engine's A1 grand-total discipline); never a CartesianProduct
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# resolve_redirects (pointer doubling, late r05)
# ---------------------------------------------------------------------------


def test_resolve_redirects_chain_cycle_and_cap(spark):
    from xrpl_rich_list_py_crawler_spark.operators.graph import (
        resolve_redirects,
    )

    edges = [("a", "b"), ("b", "c"), ("c", "d")]      # chain to terminal d
    edges += [("x", "y"), ("y", "x")]                  # 2-cycle
    edges += [(f"l{i}", f"l{i+1}") for i in range(12)]  # 12-hop chain
    df = spark.createDataFrame(edges, "url string, redirect_to string")
    got = {
        r.url: (r.final_url, r.n_hops, r.terminal)
        for r in resolve_redirects(df).collect()
    }
    assert len(got) == len(edges)
    assert got["a"] == ("d", 3, True)
    assert got["b"] == ("d", 2, True)
    assert got["c"] == ("d", 1, True)
    # cycle: unresolved within the 8-hop cap
    assert got["x"] == (None, None, False)
    assert got["y"] == (None, None, False)
    # 12-edge chain l0->...->l12: heads needing >8 hops unresolved,
    # the rest resolve (l4 sits EXACTLY at the 2^3 cap)
    assert got["l0"] == (None, None, False)   # 12 hops: over cap
    assert got["l3"] == (None, None, False)   # 9 hops: over cap
    assert got["l4"] == ("l12", 8, True)      # exactly at the cap
    assert got["l11"] == ("l12", 1, True)


def test_resolve_redirects_partition_invariant(spark):
    from xrpl_rich_list_py_crawler_spark.operators.graph import (
        resolve_redirects,
    )

    edges = [(f"u{i}", f"u{i+1}") for i in range(40) if i % 5 != 4]
    df = spark.createDataFrame(edges, "url string, redirect_to string")
    a = sorted(map(tuple, resolve_redirects(df).collect()))
    b = sorted(map(tuple, resolve_redirects(df.repartition(11)).collect()))
    assert a == b


# ---------------------------------------------------------------------------
# HITS hubs/authorities
# ---------------------------------------------------------------------------


def _hits(spark, pairs, **kw):
    from xrpl_rich_list_py_crawler_spark.operators.graph import host_hits

    return {
        r.host: (r.auth, r.hub)
        for r in host_hits(_edges(spark, pairs), **kw).collect()
    }


def test_hits_hub_and_authority_split(spark):
    # h links to a1..a3 (pure hub); a1..a3 link nowhere
    pairs = [("h", f"a{i}") for i in range(3)]
    r = _hits(spark, pairs, n_iter=2)
    assert r["h"][0] == 0                    # no in-links: auth 0
    assert r["h"][1] > 0                     # the hub
    for i in range(3):
        assert r[f"a{i}"][0] > 0             # authorities
        assert r[f"a{i}"][1] == 0            # no out-links: hub 0
    # symmetric authorities tie exactly (integer arithmetic)
    assert len({r[f"a{i}"][0] for i in range(3)}) == 1


def test_hits_better_hub_scores_higher(spark):
    # hub2 points at BOTH authorities, hub1 at one: hub2 must outrank
    pairs = [("hub1", "x"), ("hub2", "x"), ("hub2", "y"), ("z", "hub2")]
    r = _hits(spark, pairs, n_iter=3)
    assert r["hub2"][1] > r["hub1"][1]
    # x has two hub in-links, y one: x is the stronger authority
    assert r["x"][0] > r["y"][0]


def test_hits_partitioning_invariance(spark):
    pairs = [
        (f"h{i}", f"h{(i * 7 + 3) % 20}")
        for i in range(60)
        if i % 20 != (i * 7 + 3) % 20
    ]
    e = _edges(spark, pairs)
    from xrpl_rich_list_py_crawler_spark.operators.graph import host_hits

    a = {
        r.host: (r.auth, r.hub)
        for r in host_hits(e.repartition(1), n_iter=3).collect()
    }
    b = {
        r.host: (r.auth, r.hub)
        for r in host_hits(e.repartition(13, "dst"), n_iter=3).collect()
    }
    assert a == b


def test_hits_mass_renormalizes_near_scale(spark):
    # unit-divide keeps each score vector's total within one unit-per-
    # node of the scale after every iteration (no drift, no overflow)
    pairs = [(f"s{i}", f"d{(i * 3 + 1) % 7}") for i in range(12)]
    r = _hits(spark, pairs, n_iter=4)
    total_auth = sum(a for a, _ in r.values())
    scale = 10**12
    assert total_auth <= scale * 2          # bounded near scale
    assert total_auth > 0


def test_hits_empty_graph(spark):
    from xrpl_rich_list_py_crawler_spark.operators.graph import host_hits

    out = host_hits(_edges(spark, [("a", "b")]).filter("1=0"), n_iter=2)
    assert out.count() == 0


# ---------------------------------------------------------------------------
# trust_rank
# ---------------------------------------------------------------------------


def test_trust_rank_all_seeds_equals_pagerank(spark):
    """With every host seeded, TrustRank IS PageRank — the reduction law
    the docstring promises, exact to the integer."""
    from xrpl_rich_list_py_crawler_spark.operators.graph import (
        host_pagerank,
        trust_rank,
    )

    pairs = [(f"h{i}", f"h{(i * 3 + 1) % 8}") for i in range(20)]
    e = _edges(spark, pairs)
    hosts = e.select(F.col("src").alias("host")).union(
        e.select(F.col("dst").alias("host"))
    ).distinct()
    tr = {r.host: r.rank
          for r in trust_rank(e, hosts, n_iter=4).collect()}
    pr = {r.host: r.rank
          for r in host_pagerank(e, n_iter=4).collect()}
    assert tr == pr


def test_trust_rank_unreachable_farm_scores_zero(spark):
    """A link farm with no path from any seed gets EXACTLY zero rank —
    integral arithmetic, not epsilon — while seed-reachable hosts score
    positive. Farm linking INTO the trusted region gains nothing."""
    from xrpl_rich_list_py_crawler_spark.operators.graph import trust_rank

    pairs = [
        ("seed", "good"), ("good", "seed"),
        # spam farm: dense internal links + a link INTO the good region
        ("spam1", "spam2"), ("spam2", "spam3"), ("spam3", "spam1"),
        ("spam1", "good"),
    ]
    e = _edges(spark, pairs)
    seeds = spark.createDataFrame([("seed",)], "host: string")
    got = {r.host: (r.is_seed, r.rank)
           for r in trust_rank(e, seeds, n_iter=5).collect()}
    assert got["spam1"][1] == 0
    assert got["spam2"][1] == 0
    assert got["spam3"][1] == 0
    assert got["seed"][0] is True and got["seed"][1] > 0
    assert got["good"][0] is False and got["good"][1] > 0


def test_trust_rank_partitioning_invariance(spark):
    from xrpl_rich_list_py_crawler_spark.operators.graph import trust_rank

    pairs = [(f"h{i % 9}", f"h{(i * 5 + 2) % 11}") for i in range(30)]
    e = _edges(spark, pairs)
    seeds = spark.createDataFrame([("h0",), ("h3",)], "host: string")
    a = {r.host: r.rank
         for r in trust_rank(e.repartition(1), seeds, n_iter=3).collect()}
    b = {r.host: r.rank
         for r in trust_rank(
             e.repartition(13, "dst"), seeds, n_iter=3
         ).collect()}
    assert a == b


def test_trust_rank_requires_a_seed_in_graph(spark):
    import pytest

    from xrpl_rich_list_py_crawler_spark.operators.graph import trust_rank

    e = _edges(spark, [("a", "b")])
    seeds = spark.createDataFrame([("zzz",)], "host: string")
    with pytest.raises(ValueError, match="no seed host"):
        trust_rank(e, seeds, n_iter=2)


def test_mirror_hosts_full_and_partial(spark):
    """A full mirror scores share 1.0 both sides; a strict-subset
    mirror scores 1.0 on the subset side and the fraction on the
    original; the too-common rule erases pairs built ONLY from bodies
    served everywhere (error boilerplate)."""
    from pyspark.sql import functions as F

    from xrpl_rich_list_py_crawler_spark.operators.graph import mirror_hosts

    err = "404 not found"
    rows = []
    for i in range(10):
        rows.append((f"https://a.com/p/{i}", f"unique body {i}"))
        rows.append((f"https://amir.com/p/{i}", f"unique body {i}"))
    for i in range(8):
        rows.append((f"https://b.com/p/{i}", f"b body {i}"))
        if i < 4:
            rows.append((f"https://bsub.com/p/{i}", f"b body {i}"))
    for h in ("a.com", "amir.com", "b.com", "bsub.com", "c.com", "d.com"):
        rows.append((f"https://{h}/404", err))
    df = spark.createDataFrame(rows, "url: string, text: string")
    got = {(r["host_a"], r["host_b"]): (r["n_shared"], r["share_a"],
                                        r["share_b"])
           for r in mirror_hosts(df, min_shared=3,
                                 max_hash_freq=5).collect()}
    assert got[("a.com", "amir.com")] == (10, 1.0, 1.0)
    n, sa, sb = got[("b.com", "bsub.com")]
    assert n == 4 and sa == 0.5 and sb == 1.0
    # the 404 body is on 6 hosts > max_hash_freq=5: no pair from it
    assert len(got) == 2, got
