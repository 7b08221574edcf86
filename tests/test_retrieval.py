"""Inverted index + BM25: semantics against a hand-computed oracle,
determinism under repartitioning, and the plan-shape contracts."""

import math

import pytest
from pyspark.sql import functions as F

from xrpl_rich_list_py_crawler_spark.operators.retrieval import (
    bm25_topk,
    build_postings,
    doc_lengths,
)

DOCS = [
    (0, "spark shuffles rows fast"),
    (1, "spark spark spark everywhere"),
    (2, "rows and columns and rows"),
    (3, "a window over ordered rows"),
    (4, "nothing relevant here"),
    (5, "   "),  # whitespace-only: dl must be 0, no postings
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _py_bm25(query, k1=1.2, b=0.75):
    """Independent row-at-a-time reimplementation."""
    toks = {d: [t for t in txt.lower().strip().split() if t] for d, txt in DOCS}
    n = len(DOCS)
    avgdl = sum(len(v) for v in toks.values()) / n
    dft = {
        q: sum(1 for v in toks.values() if q in v) for q in set(query)
    }
    scores = {}
    for d, v in toks.items():
        micro = 0
        matched = 0
        for q in sorted(set(query)):
            tf = v.count(q)
            if not tf:
                continue
            matched += 1
            idf = math.log(1.0 + (n - dft[q] + 0.5) / (dft[q] + 0.5))
            s = idf * tf * (k1 + 1.0) / (
                tf + k1 * (1 - b + b * len(v) / avgdl)
            )
            micro += round(s * 1_000_000.0)
        if matched:
            scores[d] = (micro, matched)
    return scores


def test_postings_and_lengths(spark, corpus):
    post = {
        (r.token, r.doc_id): r.tf for r in build_postings(corpus).collect()
    }
    assert post[("spark", 1)] == 3
    assert post[("rows", 2)] == 2
    assert ("", 5) not in post and not any(d == 5 for _, d in post)
    dl = {r.doc_id: r.dl for r in doc_lengths(corpus).collect()}
    assert dl == {0: 4, 1: 4, 2: 5, 3: 5, 4: 3, 5: 0}


def test_bm25_matches_independent_python(spark, corpus):
    query = ["spark", "rows"]
    got = bm25_topk(
        build_postings(corpus), doc_lengths(corpus), query, k=10
    ).collect()
    want = _py_bm25(query)
    assert {r.doc_id: (r.score_micro, r.n_matched) for r in got} == want
    # ranking: micro desc, doc_id asc
    order = [r.doc_id for r in got]
    assert order == sorted(
        want, key=lambda d: (-want[d][0], d)
    )
    # derived double column is exactly micro / 1e6
    for r in got:
        assert r.score == r.score_micro / 1_000_000.0


def test_bm25_deterministic_under_partitioning(spark, corpus):
    """Fixed-point integer sums make the scores partition-order-free."""
    a = bm25_topk(
        build_postings(corpus), doc_lengths(corpus), ["spark", "rows"], k=10
    ).collect()
    shuffled = corpus.repartition(7)
    b = bm25_topk(
        build_postings(shuffled), doc_lengths(shuffled), ["rows", "spark"],
        k=10,
    ).collect()
    assert a == b


def test_postings_delta_touches_only_changed_docs(spark, corpus):
    from xrpl_rich_list_py_crawler_spark.operators.retrieval import (
        apply_postings_delta, postings_delta,
    )

    cur_rows = [
        (0, "spark shuffles rows fast"),        # unchanged
        (1, "totally rewritten content now"),   # changed
        # doc 2 removed
        (3, "a window over ordered rows"),      # unchanged
        (4, "nothing relevant here"),           # unchanged
        (5, "   "),                             # unchanged (empty)
        (6, "brand new page"),                  # added
    ]
    cur = spark.createDataFrame(cur_rows, "doc_id long, text string")
    delta = postings_delta(corpus, cur).collect()
    touched = {r.doc_id for r in delta}
    assert touched == {1, 2, 6}
    assert {(r.op, r.doc_id) for r in delta} == {
        ("del", 1), ("del", 2), ("add", 1), ("add", 6)
    }
    # the law: apply(build(prev), delta) == build(cur)
    applied = apply_postings_delta(
        build_postings(corpus), postings_delta(corpus, cur)
    )
    assert sorted(map(tuple, applied.collect())) == \
        sorted(map(tuple, build_postings(cur).collect()))


def test_postings_delta_empty_when_nothing_changed(spark, corpus):
    from xrpl_rich_list_py_crawler_spark.operators.retrieval import (
        postings_delta,
    )

    assert postings_delta(corpus, corpus).count() == 0


def test_bm25_topk_plan_is_parallel(spark, corpus):
    """The final cut must compile to TakeOrderedAndProject (partial
    per-partition top-k — no global single-partition sort) and the
    ≤|query|-row dfreq side must broadcast."""
    plan = (
        bm25_topk(build_postings(corpus), doc_lengths(corpus), ["spark"], k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan


# ---------------------------------------------------------------------------
# LSM compaction of delta stacks
# ---------------------------------------------------------------------------

from xrpl_rich_list_py_crawler_spark.operators.retrieval import (  # noqa: E402
    apply_postings_delta,
    compact_postings_deltas,
    postings_delta,
)


def _snapshots(spark):
    """Three snapshots with adds, drops, and in-place edits between each
    pair — every delta op class is exercised."""
    s0 = spark.createDataFrame(
        [(0, "spark rows fast"), (1, "rows and columns"),
         (2, "window rows"), (3, "drop me soon")],
        "doc_id long, text string",
    )
    s1 = spark.createDataFrame(
        [(0, "spark rows fast"),            # unchanged
         (1, "rows and columns edited"),    # edited
         (4, "a brand new doc")],           # added; 2,3 dropped
        "doc_id long, text string",
    )
    s2 = spark.createDataFrame(
        [(0, "spark rows fast rewritten"),  # edited again
         (4, "a brand new doc"),            # unchanged
         (5, "late arrival")],              # added; 1 dropped
        "doc_id long, text string",
    )
    return s0, s1, s2


def test_compact_equals_iterated_apply_and_rebuild(spark):
    s0, s1, s2 = _snapshots(spark)
    base = build_postings(s0)
    d1, d2 = postings_delta(s0, s1), postings_delta(s1, s2)
    compacted = sorted(compact_postings_deltas(base, [d1, d2]).collect())
    iterated = sorted(
        apply_postings_delta(apply_postings_delta(base, d1), d2).collect()
    )
    rebuilt = sorted(build_postings(s2).collect())
    assert compacted == iterated == rebuilt


def test_compact_empty_stack_is_identity(spark):
    s0, _, _ = _snapshots(spark)
    base = build_postings(s0)
    assert sorted(compact_postings_deltas(base, []).collect()) \
        == sorted(base.collect())


def test_compact_add_outranks_del_within_generation(spark):
    """A changed doc emits del+add for shared tokens in ONE generation;
    the add must win (apply's del-then-append order)."""
    s0, s1, _ = _snapshots(spark)
    base = build_postings(s0)
    out = compact_postings_deltas(base, [postings_delta(s0, s1)])
    # doc 1 kept 'rows'/'and'/'columns' across the edit: del+add same gen
    row = out.filter("doc_id = 1 AND token = 'rows'").collect()
    assert [(r.token, r.doc_id, r.tf) for r in row] == [("rows", 1, 1)]


def test_compact_single_shuffle_plan(spark):
    """Compaction cost must be independent of generation count: exactly
    one exchange (the (token, doc_id) groupBy), however many deltas are
    folded — vs one exchange PER generation for iterated apply. The
    inputs are materialized first so the measured plan is compaction
    alone, not index construction."""
    s0, s1, s2 = _snapshots(spark)

    def materialize(df):
        return spark.createDataFrame(df.collect(), df.schema)

    base = materialize(build_postings(s0))
    deltas = [
        materialize(postings_delta(s0, s1)),
        materialize(postings_delta(s1, s2)),
    ]
    plan = compact_postings_deltas(base, deltas)._jdf.queryExecution() \
        .executedPlan().toString()
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, plan


# ---------------------------------------------------------------------------
# positional postings + phrase search
# ---------------------------------------------------------------------------


def test_phrase_search_counts_and_edges(spark):
    """Exact consecutive matches only; overlapping occurrences counted;
    repeated-token phrases need BOTH offsets (no double-credit); phrase
    absent -> no row; m=3 works; case/whitespace normalized."""
    from xrpl_rich_list_py_crawler_spark.operators.retrieval import (
        build_positional_postings,
        phrase_search,
    )

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the cat mat"),
            (2, "cat the, sat"),            # 'the cat' absent (order)
            (3, "THE  CAT\tsat the cat"),   # 2 hits, case+ws normalized
            (4, "the the the"),             # repeated-token phrase test
            (5, "a b a b a"),               # overlapping 'a b a' x2
        ],
        "doc_id: long, text: string",
    )
    idx = build_positional_postings(docs)
    got = {r["doc_id"]: r["n_hits"]
           for r in phrase_search(idx, "the cat").collect()}
    assert got == {1: 2, 3: 2}
    # repeated token: 'the the' occurs at anchors 0 and 1 in doc 4
    got2 = {r["doc_id"]: r["n_hits"]
            for r in phrase_search(idx, "the the").collect()}
    assert got2 == {4: 2}
    got3 = {r["doc_id"]: r["n_hits"]
            for r in phrase_search(idx, "a b a").collect()}
    assert got3 == {5: 2}
    assert phrase_search(idx, "cat sat on the").count() == 1
    assert phrase_search(idx, "dog house").count() == 0
    import pytest

    with pytest.raises(ValueError, match="empty phrase"):
        phrase_search(idx, "   ")


def test_positional_postings_positions_skip_empties(spark):
    """Offsets are over the FILTERED token sequence (leading/multiple
    whitespace never shifts positions) and match the tf postings'
    token set exactly."""
    from pyspark.sql import functions as F

    from xrpl_rich_list_py_crawler_spark.operators.retrieval import (
        build_positional_postings,
        build_postings,
    )

    docs = spark.createDataFrame(
        [(1, "  alpha   beta\n\ngamma ")], "doc_id: long, text: string"
    )
    pos = build_positional_postings(docs)
    assert {(r["token"], r["pos"]) for r in pos.collect()} == {
        ("alpha", 0), ("beta", 1), ("gamma", 2),
    }
    # tf view == positional view collapsed
    tf = build_postings(docs)
    agg = pos.groupBy("token", "doc_id").agg(
        F.count(F.lit(1)).alias("tf")
    )
    assert sorted(map(tuple, tf.collect())) == sorted(map(tuple, agg.collect()))


def test_proximity_search_window_semantics(spark):
    """All terms inside the forward window from some term occurrence;
    repeats absorbed by the OR; window too small -> no hit; term order
    inside the span irrelevant; >62 terms and dup terms rejected."""
    import pytest

    from xrpl_rich_list_py_crawler_spark.operators.retrieval import (
        build_positional_postings,
        proximity_search,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha x x beta"),          # span 4: hit at w=4, not w=3
            (2, "beta junk alpha"),         # unordered hit at w=3
            (3, "alpha alpha x beta"),      # repeat absorbed; 2 anchors@w=4
            (4, "alpha x x x x beta"),      # gap 5: no hit at w=4
        ],
        "doc_id: long, text: string",
    )
    idx = build_positional_postings(docs)
    got = {r["doc_id"]: r["n_anchors"]
           for r in proximity_search(idx, ["alpha", "beta"], window=4)
           .collect()}
    # doc1: anchor@alpha(0). doc2: anchor@beta(0). doc3: anchors@both
    # alphas (pos 0 covers beta@3? window [0,3] yes; pos 1 [1,4] yes).
    assert got == {1: 1, 2: 1, 3: 2}
    got3 = {r["doc_id"]: r["n_anchors"]
            for r in proximity_search(idx, ["alpha", "beta"], window=3)
            .collect()}
    assert got3 == {2: 1, 3: 1}
    with pytest.raises(ValueError, match="unique"):
        proximity_search(idx, ["a", "a"])
    with pytest.raises(ValueError, match="62"):
        proximity_search(idx, [f"t{i}" for i in range(63)])
