"""Distributed k-means (operators/kmeans.py): exact-integer semantics
vs a pure-Python Lloyd twin, partitioning invariance, empty-cell and
degenerate inputs, the Spark-div/Python-tdiv contract, and composition
with the IVF index."""

from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType, LongType, StructField, StructType

from xrpl_rich_list_py_crawler_spark.operators.kmeans import (
    DEFAULT_SCALE,
    _tdiv,
    kmeans_train,
    quantize_col,
)

_SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
    ]
)


def _vecs(spark, rows):
    return spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in rows], _SCHEMA
    )


def _py_kmeans(rows, k, n_iter, scale=DEFAULT_SCALE):
    """Independent pure-Python integral Lloyd twin (same contract:
    floor(x*scale+0.5) quantization, argmin with lowest-cell tiebreak,
    sum-div-count update, empty cell keeps centroid)."""
    import math

    q = {i: [math.floor(x * scale + 0.5) for x in v] for i, v in rows}
    cents = [q[i] for i in sorted(q)[:k]]

    def assign():
        out = {}
        for i, v in q.items():
            best = min(
                (sum((a - b) * (a - b) for a, b in zip(v, c)), j)
                for j, c in enumerate(cents)
            )
            out[i] = best[1]
        return out

    for _ in range(n_iter):
        a = assign()
        for j in range(k):
            members = [q[i] for i in q if a[i] == j]
            if members:
                cents[j] = [
                    _tdiv(sum(col), len(members)) for col in zip(*members)
                ]
    a = assign()
    return {
        i: (
            a[i],
            sum((x - c) * (x - c) for x, c in zip(q[i], cents[a[i]])),
        )
        for i in q
    }


def _spark_kmeans(spark, rows, k, n_iter):
    out, cents = kmeans_train(_vecs(spark, rows), k=k, n_iter=n_iter)
    return {r.vec_id: (r.cell, r.dist2) for r in out.collect()}, cents


def test_matches_python_twin(spark):
    # deterministic scattered points, 3 clusters' worth of structure
    rows = [
        (i, [((i * 7 + d * 13) % 101) / 101.0 - 0.5 for d in range(6)])
        for i in range(40)
    ]
    got, _ = _spark_kmeans(spark, rows, k=3, n_iter=3)
    assert got == _py_kmeans(rows, k=3, n_iter=3)


def test_partitioning_invariance(spark):
    rows = [
        (i, [((i * 11 + d * 5) % 89) / 89.0 - 0.5 for d in range(4)])
        for i in range(30)
    ]
    df = _vecs(spark, rows)
    a, ca = kmeans_train(df.repartition(1), k=4, n_iter=2)
    b, cb = kmeans_train(df.repartition(7, "vec_id"), k=4, n_iter=2)
    assert ca == cb
    assert {tuple(r) for r in a.collect()} == {tuple(r) for r in b.collect()}


def test_empty_cell_keeps_centroid(spark):
    # two tight far-apart blobs but k=3: one initial centroid is
    # stranded with zero members after iteration 1 and must survive
    # unchanged (not NaN/crash), leaving exactly 2 populated cells
    rows = [(i, [0.0, 0.0]) for i in range(3)] + [
        (i, [0.9, 0.9]) for i in range(3, 6)
    ]
    got, cents = _spark_kmeans(spark, rows, k=3, n_iter=2)
    assert got == _py_kmeans(rows, k=3, n_iter=2)
    assert len(cents) == 3
    assert len({c for c, _ in got.values()}) == 2


def test_identical_points_single_cluster(spark):
    rows = [(i, [0.25, -0.75]) for i in range(5)]
    got, _ = _spark_kmeans(spark, rows, k=2, n_iter=2)
    # all points identical: all land in cell 0 (lowest-index tiebreak)
    # at distance 0
    assert got == {i: (0, 0) for i in range(5)}


def test_k_exceeds_rows(spark):
    rows = [(0, [0.1, 0.1]), (1, [0.8, 0.8])]
    got, cents = _spark_kmeans(spark, rows, k=5, n_iter=2)
    assert len(cents) == 2  # init truncates to available rows
    assert got[0][0] != got[1][0]
    assert got[0][1] == 0 and got[1][1] == 0


def test_empty_input(spark):
    out, cents = kmeans_train(_vecs(spark, []), k=4, n_iter=2)
    assert out.count() == 0
    assert cents == []


def test_tdiv_matches_spark_div(spark):
    cases = [(7, 2), (-7, 2), (7, -2), (-7, -2), (0, 3), (5, 5), (-1, 4)]
    df = spark.createDataFrame(cases, ["a", "b"]).select(
        "a", "b", F.expr("a div b").alias("d")
    )
    for r in df.collect():
        assert _tdiv(r.a, r.b) == r.d, (r.a, r.b)


def test_quantize_is_floor_half_up(spark):
    import math

    import numpy as np

    vals = [0.0000005, -0.0000005, 0.0000014, -0.0000016, 0.123456789]
    df = spark.createDataFrame([(0, vals)], _SCHEMA).select(
        quantize_col(F.col("embedding")).alias("q")
    )
    # expected path mirrors the engine exactly: float32 storage, widen
    # to double, floor(x*scale + 0.5)
    exp = [
        math.floor(float(np.float32(v)) * DEFAULT_SCALE + 0.5) for v in vals
    ]
    assert list(df.collect()[0].q) == exp


def test_trained_centroids_feed_ivf(spark):
    from xrpl_rich_list_py_crawler_spark.operators.kmeans import kmeans_train
    from xrpl_rich_list_py_crawler_spark.operators.similarity import ivf_topk

    rows = [
        (i, [((i * 7 + d * 13) % 101) / 101.0 - 0.5 for d in range(8)])
        for i in range(40)
    ]
    emb = _vecs(spark, rows)
    _, cents = kmeans_train(emb, k=4, n_iter=2)
    dq = [[c / DEFAULT_SCALE for c in row] for row in cents]
    queries = emb.limit(2).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    got = ivf_topk(
        emb, queries, dim=8, k=3, nprobe=4, centroids=dq
    ).collect()
    # nprobe == n_cells probes everything: trained-centroid IVF top-3
    # must equal brute force
    from xrpl_rich_list_py_crawler_spark.operators.similarity import (
        brute_force_topk,
    )

    bf = brute_force_topk(emb, queries, k=3).collect()
    key = lambda r: (r.q_id, r.rank)  # noqa: E731
    assert sorted([(r.q_id, r.vec_id, r.rank) for r in got]) == sorted(
        [(r.q_id, r.vec_id, r.rank) for r in bf]
    )


def test_assignment_plan_has_no_join_and_partial_agg(spark):
    """The at-scale contract: the per-iteration update is scan →
    partial_count/sum → exchange → final agg; assignment is literal
    expressions (no join anywhere in the trained-assignment plan)."""
    import contextlib
    import io

    rows = [(i, [float(i % 7) / 7, float(i % 5) / 5]) for i in range(20)]
    out, _ = kmeans_train(_vecs(spark, rows), k=2, n_iter=1)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "Join" not in plan
    assert "Exchange" not in plan  # pure map-side: scan + project only
