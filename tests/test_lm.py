"""Bigram transition-LM quality + DSIR importance weights (operators/lm.py)."""

import pytest
from pyspark.sql import functions as F

from xrpl_rich_list_py_crawler_spark.operators import lm


@pytest.fixture(scope="module")
def corpus(spark):
    natural = "the cat sat on the mat and the cat sat on the rug"
    # same token multiset as `natural`, adjacency destroyed (fixed
    # permutation, NOT random — determinism)
    salad = "mat the on cat rug sat the and on the sat cat the"
    rows = [
        (0, natural),
        (1, natural),
        (2, natural),
        (3, salad),
        (4, "one"),          # single token: no bigrams
        (5, ""),             # empty
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bigram_col_semantics(spark):
    df = spark.createDataFrame(
        [("a b c",), ("  x ",), ("",), ("A  B",)], "text string"
    )
    got = [r[0] for r in df.select(lm.bigram_col(F.col("text"))).collect()]
    assert got == [["a b", "b c"], [], [], ["a b"]]


def test_bigram_vocab_counts_and_prefix_counts(spark):
    df = spark.createDataFrame([(0, "a b a b c")], "doc_id long, text string")
    # bigrams: "a b", "b a", "a b", "b c"
    v = {r["bigram"]: (r["cnt"], r["w1_cnt"], r["rank"])
         for r in lm.bigram_vocab(df, k=10).collect()}
    assert v["a b"] == (2, 2, 1)   # c(a·)=2
    assert v["b a"] == (1, 2, 2)   # c(b·)=2 ("b a" and "b c")
    assert v["b c"] == (1, 2, 3)
    # k cut keeps the top by (cnt desc, bigram)
    top1 = lm.bigram_vocab(df, k=1).collect()
    assert [(r["bigram"], r["rank"]) for r in top1] == [("a b", 1)]


def test_bigram_quality_flags_word_salad(corpus):
    # k=8 keeps exactly the 8 natural-prose bigrams (corpus counts >= 3,
    # boosted by the 3 natural copies); the salad's own bigrams are
    # singletons and fall below the cut, so they register as OOV. k=100
    # would admit every bigram and make oov_ratio 0 for all docs.
    v = lm.bigram_vocab(corpus, k=8)
    q = {r["doc_id"]: r.asDict()
         for r in lm.bigram_quality(corpus, v).collect()}
    # same tokens, same unigram stats — but the salad's transitions are
    # rare, so it scores lower on the transition metric and higher OOV
    assert q[0]["trans_score"] > q[3]["trans_score"]
    assert q[0]["oov_ratio"] < q[3]["oov_ratio"]
    # edge docs: no bigrams → zeros, never null / divide-by-zero
    for d in (4, 5):
        assert q[d]["n_bigrams"] == 0
        assert q[d]["trans_score"] == 0.0
        assert q[d]["oov_ratio"] == 0.0
    # every doc appears exactly once
    assert sorted(q) == [0, 1, 2, 3, 4, 5]


def test_bigram_quality_exact_arithmetic(spark):
    df = spark.createDataFrame([(0, "a b a b c")], "doc_id long, text string")
    v = lm.bigram_vocab(df, k=2)  # keeps "a b"(cnt 2) and "b a"(cnt 1)
    row = lm.bigram_quality(df, v).collect()[0]
    # doc bigrams: a b, b a, a b, b c → 3 hits (2×"a b" + "b a"), 1 OOV
    assert row["n_bigrams"] == 4
    assert row["in_vocab"] == 3
    assert row["trans_mass"] == 2 + 1 + 2          # Σ cnt over hits
    # ctx mass: c(a·)=2 twice + c(b·)=2 once = 6; coverage 3/4
    assert row["trans_score"] == round((5 / 6) * (3 / 4), 9)
    assert row["oov_ratio"] == 0.25


def test_bigram_vocab_topk_is_take_ordered(spark):
    df = spark.createDataFrame([(0, "a b c d e")], "doc_id long, text string")
    plan = lm.bigram_vocab(df, k=5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    # the only window runs AFTER the k-row cut — no global sort of the
    # full bigram frame
    assert plan.index("TakeOrderedAndProject") > plan.index("Window")


def test_dsir_weights_separate_target_from_source(spark):
    # target docs talk about wikis, source docs about spam; the probe
    # docs (one of each flavor, marked source) must rank correctly
    rows = [
        (0, "wiki article history science wiki article", True),
        (1, "science history wiki citation article needed", True),
        (2, "buy cheap pills now buy cheap pills", False),
        (3, "click here win prize click here now", False),
        (4, "wiki science citation history article", False),   # target-like
        (5, "cheap prize pills click buy", False),             # source-like
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, is_target boolean")
    w = {r["doc_id"]: r["importance"] for r in lm.dsir_weights(df).collect()}
    assert w[4] > 1.0 > w[5]
    assert w[0] > w[2]


def test_dsir_weights_exact_arithmetic(spark):
    rows = [(0, "x x y", True), (1, "y z z", False)]
    df = spark.createDataFrame(rows, "doc_id long, text string, is_target boolean")
    w = {r["doc_id"]: r.asDict() for r in lm.dsir_weights(df).collect()}
    # bucket counts: x→(t=2,s=0), y→(t=1,s=1), z→(t=0,s=2); totals t=3,s=3
    # (md5 buckets of distinct 1-char tokens collide with prob ~3/4096 —
    # the arithmetic below assumes no collision, which holds for x,y,z)
    assert w[0]["t_mass"] == 2 + 2 + 1 and w[0]["s_mass"] == 0 + 0 + 1
    assert w[1]["t_mass"] == 1 + 0 + 0 and w[1]["s_mass"] == 1 + 2 + 2
    assert w[0]["importance"] == round((6 / 2) * (4 / 4), 6)
    assert w[1]["importance"] == round((2 / 6) * (4 / 4), 6)


def test_dsir_empty_doc_is_neutral(spark):
    rows = [(0, "a b", True), (1, "c d", False), (2, "", False)]
    df = spark.createDataFrame(rows, "doc_id long, text string, is_target boolean")
    w = {r["doc_id"]: r.asDict() for r in lm.dsir_weights(df).collect()}
    assert w[2]["n_tokens"] == 0 and w[2]["t_mass"] == 0 and w[2]["s_mass"] == 0
    # (0+1)/(0+1) · norm — the doc contributes no evidence either way
    assert w[2]["importance"] == round((1 / 1) * (3 / 3), 6)


def test_lm_model_joins_are_broadcast(spark):
    df = spark.createDataFrame(
        [(0, "a b c", True), (1, "d e f", False)],
        "doc_id long, text string, is_target boolean",
    )
    v = lm.bigram_vocab(df, k=10)
    p1 = lm.bigram_quality(df, v)._jdf.queryExecution().executedPlan().toString()
    p2 = lm.dsir_weights(df)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in p1
    assert "BroadcastHashJoin" in p2
    for plan in (p1, p2):
        assert "CartesianProduct" not in plan


def test_kneser_ney_matches_hand_model(spark):
    """KN probabilities on a tiny corpus match a hand-rolled reference;
    per-context probabilities sum to 1 (the KN normalization law when
    every continuation is in-model)."""
    import collections

    from xrpl_rich_list_py_crawler_spark.operators.lm import (
        kneser_ney_bigram,
    )

    texts = ["a b a b c", "b a b b", "c a b"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    got = {
        (r.w1, r.w2): (r.cnt, r.prob)
        for r in kneser_ney_bigram(df).collect()
    }
    pairs = collections.Counter()
    for t in texts:
        toks = t.split()
        for i in range(len(toks) - 1):
            pairs[(toks[i], toks[i + 1])] += 1
    c_w1 = collections.Counter()
    n1_fwd = collections.Counter()
    n1_bwd = collections.Counter()
    for (w1, w2), c in pairs.items():
        c_w1[w1] += c
        n1_fwd[w1] += 1
        n1_bwd[w2] += 1
    n_types = len(pairs)
    d = 0.75
    for (w1, w2), c in pairs.items():
        want = (
            max(c - d, 0.0) / c_w1[w1]
            + (d * n1_fwd[w1] / c_w1[w1]) * (n1_bwd[w2] / n_types)
        )
        cnt, prob = got[(w1, w2)]
        assert cnt == c
        assert abs(prob - want) < 1e-9, ((w1, w2), prob, want)
    # normalization: sum over observed continuations of w1='a' plus the
    # backoff mass assigned to unobserved ones equals 1; with this corpus
    # every (a, w2) continuation observed covers pcont mass n1_bwd/n_types
    # for those w2 only — check the discounted direct mass instead:
    direct = sum(
        max(c - d, 0.0) / c_w1["a"]
        for (w1, c) in ((p, c) for p, c in pairs.items() if p[0] == "a")
        for c in [c]
    )
    backoff = d * n1_fwd["a"] / c_w1["a"]
    assert abs(direct + backoff * 1.0 - 1.0) < 1e-9  # pcont sums to 1


def test_kn_doc_scores_laws(spark):
    """Applying the KN LM per doc: counts reconcile with a manual join
    of the doc's bigrams to the model; a fully-modeled doc has
    coverage 1.0; a doc carrying a below-min_count bigram has
    coverage < 1; a bigram-less doc gets the zero row with kn_ok
    false; min_prob equals the true min over modeled transitions; and
    kn_ok re-derives from each row's own counts. Plan: no Python eval,
    no cartesian."""
    common = "the cat sat on the mat"
    rows = [
        (0, common), (1, common), (2, common),        # trains the LM
        (3, common + " zzz qqq"),                      # unique bigrams → OOV
        (4, "one"),                                    # no bigrams
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    model = lm.kneser_ney_bigram(df, min_count=2)
    got = {
        r.doc_id: r
        for r in lm.kn_doc_scores(
            df, model, rare_tau=0.5, min_coverage=0.95, max_rare_ratio=1.0
        ).collect()
    }
    assert set(got) == {0, 1, 2, 3, 4}
    probs = {(r.w1, r.w2): r.prob for r in model.collect()}
    toks = common.split()
    doc0 = [(a, b) for a, b in zip(toks, toks[1:])]
    assert got[0].n_bigrams == len(doc0)
    assert got[0].n_modeled == sum((p in probs) for p in doc0) == len(doc0)
    assert got[0].coverage == 1.0
    assert got[0].min_prob == min(probs[p] for p in doc0)
    assert got[0].n_rare == sum(probs[p] < 0.5 for p in doc0)
    assert got[0].kn_ok
    # doc 3: " mat zzz", "zzz qqq" appear once → below min_count → OOV
    assert got[3].n_modeled == got[3].n_bigrams - 2
    assert 0.0 < got[3].coverage < 1.0
    assert not got[3].kn_ok            # coverage 5/7 < 0.95
    # doc 4: no bigrams at all
    r4 = got[4]
    assert (r4.n_bigrams, r4.n_modeled, r4.n_rare) == (0, 0, 0)
    assert r4.min_prob is None and r4.coverage == 0.0 and not r4.kn_ok
    # kn_ok law from each row's own counts
    for r in got.values():
        want = bool(
            r.n_bigrams > 0
            and r.n_modeled / r.n_bigrams >= 0.95
            and (r.n_rare / r.n_modeled if r.n_modeled else 0.0) <= 1.0
        )
        assert r.kn_ok == want, r
    plan = (
        lm.kn_doc_scores(df, model)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan and "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# CCNet head/middle/tail buckets
# ---------------------------------------------------------------------------


def _bucketed(spark, rows, order=("q", "doc_id")):
    df = spark.createDataFrame(rows, ["doc_id", "q", "n_chars"])
    out = lm.ccnet_buckets(
        df, [F.asc(c) for c in order], "n_chars"
    )
    return {r.doc_id: (r.cum_before, r.bucket) for r in out.collect()}


def test_ccnet_equal_mass_thirds(spark):
    # 9 docs of equal size in quality order 0..8: exact thirds
    rows = [(i, i, 10) for i in range(9)]
    got = _bucketed(spark, rows)
    assert [got[i][1] for i in range(9)] == (
        ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3
    )
    assert [got[i][0] for i in range(9)] == [10 * i for i in range(9)]


def test_ccnet_mass_not_count(spark):
    # one huge best doc swallows the whole head budget: head is 1 doc,
    # not n/3 docs — the reason CCNet splits by mass
    rows = [(0, 0, 100)] + [(i, i, 10) for i in range(1, 7)]
    got = _bucketed(spark, rows)
    assert got[0][1] == "head"
    assert all(got[i][1] != "head" for i in range(1, 7))


def test_ccnet_boundary_rule_exact(spark):
    # total 30: head while 3*cum < 30 (cum<10), middle while 3*cum < 60
    # (cum<20), else tail — doc landing exactly ON a boundary goes DOWN
    rows = [(0, 0, 10), (1, 1, 10), (2, 2, 10)]
    got = _bucketed(spark, rows)
    assert [got[i][1] for i in range(3)] == ["head", "middle", "tail"]


def test_ccnet_parallelism_invariance(spark):
    rows = [(i, (i * 7) % 13, 1 + (i * 3) % 9) for i in range(50)]
    df = spark.createDataFrame(rows, ["doc_id", "q", "n_chars"])
    order = [F.asc("q"), F.asc("doc_id")]
    a = lm.ccnet_buckets(df.repartition(1), order, "n_chars")
    b = lm.ccnet_buckets(df.repartition(11, "doc_id"), order, "n_chars")
    assert {tuple(r) for r in a.collect()} == {tuple(r) for r in b.collect()}


def test_ccnet_all_zero_sizes_land_in_tail(spark):
    got = _bucketed(spark, [(i, i, 0) for i in range(4)])
    assert all(b == "tail" for _, b in got.values())


def test_ccnet_no_single_partition_window(spark):
    rows = [(i, i, 5) for i in range(20)]
    df = spark.createDataFrame(rows, ["doc_id", "q", "n_chars"])
    out = lm.ccnet_buckets(df, [F.asc("q"), F.asc("doc_id")], "n_chars")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the corpus-side sort must be range-partitioned (two-phase plan);
    # the only SinglePartition window allowed is the P-row offset dim
    assert "rangepartitioning" in plan.lower()
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# PMI phrase mining (word2phrase)
# ---------------------------------------------------------------------------


def test_pmi_phrases_hand_counts(spark):
    # corpus: "new york" always together (3x); "the cat"/"the dog" mix
    docs = [
        (1, "new york is big the cat runs"),
        (2, "new york has the dog"),
        (3, "new york wins the cat naps"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        (r.w1, r.w2): r
        for r in lm.pmi_phrases(df, min_count=2, k=10, delta=0).collect()
    }
    # counts: c(new)=c(york)=3, c(new york)=3, N=7+5+6=18
    r = got[("new", "york")]
    assert (r.pair_cnt, r.c1, r.c2) == (3, 3, 3)
    assert r.score == round((3.0 * 18.0) / (3.0 * 3.0), 9)
    # "the cat": 2·18/(3·2) = 6.0 — an exact score tie with "new york";
    # the (w1, w2) tiebreak puts "new york" first deterministically
    assert got[("the", "cat")].score == r.score
    assert got[("new", "york")].rank == 1
    assert got[("the", "cat")].rank == 2
    # "york is" occurs once: filtered by min_count=2
    assert ("york", "is") not in got


def test_pmi_phrases_delta_discounts_rare_pairs(spark):
    docs = [(1, "a b " * 3 + "c d")]  # c(ab)=3, c(cd)=1
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        (r.w1, r.w2): r.score
        for r in lm.pmi_phrases(df, min_count=1, k=10, delta=1).collect()
    }
    assert got[("c", "d")] == 0.0  # (1-1) kills singleton pairs
    assert got[("a", "b")] > 0.0


def test_pmi_phrases_partitioning_invariance_and_plan(spark):
    docs = [(i, f"tok{i % 7} tok{(i + 1) % 7} tok{i % 3}") for i in range(40)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    a = lm.pmi_phrases(df.repartition(1), min_count=2, k=20).collect()
    b = lm.pmi_phrases(df.repartition(9, "doc_id"), min_count=2, k=20).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    plan = (
        lm.pmi_phrases(df, min_count=2, k=20)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
