"""Similarity search over embedding columns (array<float/double>).

Baseline: brute-force cosine top-k, fully JVM-side (``zip_with`` dot
product inside whole-stage codegen — no Python in the hot path).
Scale path: LSH bucketing (random hyperplanes) so each query only scans
its bucket — the shuffle is (bucket, vector), never the full cross join.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v
        )
    )


def cosine_col(a, b):
    """Cosine similarity of two array columns, JVM-side."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """Exact top-k neighbors per query by cosine.

    queries is small (broadcast); corpus side streams through codegen.
    Per-query top-k via window rank — with Q queries and N vectors the
    shuffle carries Q·N scored rows; use the LSH variant when Q is large.

    Norms are precomputed per ROW on each side before the pair fan-out
    (r06): cosine = dot/(‖a‖·‖b‖) evaluates the identical IEEE
    expression tree, but the two norm folds run N+Q times instead of
    N·Q times.
    """
    emb_n = embeddings.select(
        id_col, vec_col, _norm(F.col(vec_col)).alias("_na")
    )
    q_n = queries.select(
        q_id_col, q_vec_col, _norm(F.col(q_vec_col)).alias("_nb")
    )
    scored = emb_n.crossJoin(F.broadcast(q_n)).select(
        F.col(q_id_col),
        F.col(id_col),
        (
            _dot(F.col(vec_col), F.col(q_vec_col))
            / (F.col("_na") * F.col("_nb"))
        ).alias("cosine"),
    ).filter(F.col(id_col) != F.col(q_id_col))
    w = Window.partitionBy(q_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id_col, id_col, "cosine", "rank")
    )


def hyperplanes(dim: int, n_planes: int = 12, seed: int = 42) -> np.ndarray:
    """Deterministic random hyperplanes, rounded to 6 decimals so the SAME
    numeric literals parse to identical doubles in Spark and in SQL oracles."""
    rng = np.random.RandomState(seed)
    return np.round(rng.randn(n_planes, dim), 6)


def bucket_col(vec, planes: np.ndarray):
    """LSH bucket id (sign pattern over ``planes``) as a pure JVM Column.

    The dot product is a sequential left fold (``aggregate`` starting at
    0.0), which matches the left-associative explicit sum ``bucket_sql``
    emits — identical summation order ⇒ identical signs on both engines."""
    b = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = _plane_expr(p)
        dot = _dot(vec, plane)
        b = b + F.when(dot > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return b


def _plane_expr(p):
    """A double-array literal as ONE parsed SQL expression — dim F.lit
    Column calls cost a py4j round-trip each, which at plane/centroid
    tables of 16×64 doubles dominated plan-construction time (r06).
    ``CAST(repr AS DOUBLE)`` parses the exact decimal then converts
    correctly-rounded — the identical IEEE double ``F.lit(float(x))``
    produced."""
    return F.expr(
        "array(" + ",".join(f"CAST({float(x)!r} AS DOUBLE)" for x in p) + ")"
    )


def bucket_sql(vec_expr: str, planes: np.ndarray) -> str:
    """SQL twin of ``bucket_col`` (1-based array indexing, left-assoc sum)."""
    terms = []
    for i, p in enumerate(planes):
        dot = " + ".join(
            f"{vec_expr}[{j + 1}]*({float(x)!r})" for j, x in enumerate(p)
        )
        terms.append(f"(CASE WHEN ({dot}) > 0 THEN {1 << i} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """Approximate top-k: score only within the query's hyperplane bucket.

    At 10^9 vectors: corpus is hash-partitioned by bucket (a one-time
    repartition, reusable across queries); each query joins one bucket.
    Recall is tunable via n_planes (fewer planes → bigger buckets).
    Bucketing is pure JVM (``bucket_col``) — no Python in the hot path.
    """
    planes = hyperplanes(dim, n_planes)
    emb_b = embeddings.withColumn(
        "_bkt", bucket_col(F.col(vec_col), planes)
    ).withColumn("_na", _norm(F.col(vec_col)))
    q_b = queries.withColumn(
        "_bkt", bucket_col(F.col(q_vec_col), planes)
    ).withColumn("_nb", _norm(F.col(q_vec_col)))
    # per-row norms precomputed before the pair fan-out (r06, same IEEE
    # expression tree as cosine_col — identical doubles)
    scored = emb_b.join(F.broadcast(q_b), "_bkt").select(
        F.col(q_id_col),
        F.col(id_col),
        (
            _dot(F.col(vec_col), F.col(q_vec_col))
            / (F.col("_na") * F.col("_nb"))
        ).alias("cosine"),
    ).filter(F.col(id_col) != F.col(q_id_col))
    w = Window.partitionBy(q_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id_col, id_col, "cosine", "rank")
    )


def ivf_centroids(dim: int, n_cells: int = 16, seed: int = 7) -> np.ndarray:
    """Deterministic unit-norm coarse-quantizer centroids, rounded to 6
    decimals (same literal-portability contract as :func:`hyperplanes`).

    Real IVF trains centroids offline (k-means over a sample) and ships
    them to the engine as parameters; this fixed quantizer stands in for
    that parameter — the ENGINE-side dataflow (assign → probe → rank) is
    identical either way."""
    rng = np.random.RandomState(seed)
    c = rng.randn(n_cells, dim)
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    return np.round(c, 6)


def centroid_scores_col(vec, centroids: np.ndarray):
    """Array of <vec, centroid_i> dot products, pure JVM sequential folds
    (left-assoc — matches :func:`centroid_scores_sql` exactly)."""
    dots = []
    for c in centroids:
        dots.append(_dot(vec, _plane_expr(c)))
    return F.array(*dots)


def centroid_scores_sql(vec_expr: str, centroids: np.ndarray) -> str:
    """SQL twin of ``centroid_scores_col``: a list literal of explicit
    left-associative sums (1-based array indexing)."""
    terms = []
    for c in centroids:
        dot = " + ".join(
            f"{vec_expr}[{j + 1}]*({float(x)!r})" for j, x in enumerate(c)
        )
        terms.append(f"({dot})")
    return "[" + ", ".join(terms) + "]"


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF approximate top-k: assign every vector to its nearest coarse
    cell (argmax centroid dot), probe each query's top-``nprobe`` cells.

    At 10^9 vectors: the corpus is hash-partitioned (or bucketed) by
    ``_cell`` once; each query scans nprobe/n_cells of the data. The
    scatter is a broadcast of (query × nprobe) rows; scoring stays in
    whole-stage codegen. Recall tunes with nprobe — the standard IVF
    trade-off.

    ``centroids`` (optional, shape (n_cells, dim)) plugs in TRAINED
    coarse centroids — e.g. ``operators.kmeans.kmeans_train`` output
    de-quantized by its scale — instead of the deterministic stand-ins;
    ``n_cells`` is then taken from the array."""
    from .textstats import bind_once

    if centroids is not None:
        cents = np.asarray(centroids, dtype=float)
    else:
        cents = ivf_centroids(dim, n_cells)
    scores = centroid_scores_col(F.col(vec_col), cents)
    # bind the n_cells-fold score array once: argmax references it twice
    # and would otherwise inline the whole dot-product fan twice (r06)
    emb_cell = embeddings.withColumn(
        "_cell",
        bind_once(
            scores, lambda s: F.array_position(s, F.array_max(s))
        ).cast("int"),
    )
    q_scores = queries.withColumn(
        "_s", centroid_scores_col(F.col(q_vec_col), cents)
    )
    exploded = q_scores.select(
        q_id_col, q_vec_col, F.posexplode("_s").alias("_pos0", "_score")
    ).withColumn("_cell", (F.col("_pos0") + 1).cast("int"))
    w = Window.partitionBy(q_id_col).orderBy(
        F.col("_score").desc(), F.col("_cell").asc()
    )
    q_cells = (
        exploded.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= nprobe)
        .select(q_id_col, q_vec_col, "_cell")
    )
    # per-row norms precomputed before the pair fan-out (r06, same IEEE
    # expression tree as cosine_col — identical doubles)
    scored = (
        emb_cell.withColumn("_na", _norm(F.col(vec_col)))
        .join(F.broadcast(q_cells.withColumn("_nb", _norm(F.col(q_vec_col)))), "_cell")
        .select(
            F.col(q_id_col),
            F.col(id_col),
            (
                _dot(F.col(vec_col), F.col(q_vec_col))
                / (F.col("_na") * F.col("_nb"))
            ).alias("cosine"),
        )
        .filter(F.col(id_col) != F.col(q_id_col))
    )
    rw = Window.partitionBy(q_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(rw))
        .filter(F.col("rank") <= k)
        .select(q_id_col, id_col, "cosine", "rank")
    )


def cosine_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = None,
    max_block_size: int | None = None,
) -> DataFrame:
    """Embedding near-dup pairs (cosine ≥ threshold), id_a < id_b.

    With ``block_col`` (e.g. an LSH bucket or a label) the self-join is
    per-block — the scalable shape. Without it, a full self-join (test
    scale only).

    ``max_block_size`` (blocked mode only) mirrors the text-dedup bucket
    cap (operators/dedup.py): a block larger than the cap is salt-split
    into ⌈n/cap⌉ deterministic groups before pairing, bounding the
    per-block pair blowup a cluster of near-identical embeddings would
    cause. Split mass is logged; default None = exact blocked behavior
    (oracle-identical). Unlike minhash, embedding blocks have a single
    blocking key, so split recall loss is not cushioned by other bands —
    size the cap well above the expected true-duplicate cluster size.
    """
    blk = [F.col(block_col).alias("_blk")] if block_col else []
    base = embeddings.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"), *blk
    )
    on = ["_blk"] if block_col else []
    if block_col and max_block_size is not None:
        from .dedup import salt_split_oversize

        # persist: the size agg + both join sides reference this frame —
        # same replay-avoidance as the dedup bucket frames
        base = base.persist()
        base, on = salt_split_oversize(
            base, ["_blk"],
            lambda n: F.pmod(F.xxhash64(F.col("_id")), n),
            max_block_size, "cosine near-dup",
        )
    # per-row norms precomputed before the pair fan-out (r06): cosine =
    # dot/(‖a‖·‖b‖) evaluates the identical IEEE expression tree, but the
    # two norm folds run N times each instead of once per PAIR
    left = base.select(
        F.col("_id").alias("id_a"), F.col("_v").alias("va"),
        _norm(F.col("_v")).alias("_na"), *on,
    )
    right = base.select(
        F.col("_id").alias("id_b"), F.col("_v").alias("vb"),
        _norm(F.col("_v")).alias("_nb"), *on,
    )
    cond = F.col("id_a") < F.col("id_b")
    joined = left.join(right, on=on) if on else left.crossJoin(right)
    return (
        joined.filter(cond)
        .withColumn(
            "cosine",
            _dot(F.col("va"), F.col("vb")) / (F.col("_na") * F.col("_nb")),
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def semdedup(
    embeddings: DataFrame,
    dim: int,
    n_cells: int = 16,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cell_size: int | None = None,
) -> DataFrame:
    """SemDedup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup —
    cluster embeddings with a coarse quantizer, then flag any vector
    whose cosine to a LOWER-id vector in the SAME cell reaches
    ``threshold``. Returns one row per input vector:
    ``(id_col, cell, is_semantic_dup)``.

    Documented deviation from the paper: SemDedup drops the member
    closest to the centroid (or a random one); this engine keeps the
    LOWEST id — deterministic, rerun-stable, and the same keep-one
    convention every other dedup operator here uses (exact hash,
    MinHash components, SimHash).

    100 TB shape: cell assignment is a pure-JVM projection (argmax over
    ``n_cells`` codegen dot products — zero shuffle); the only shuffles
    are the per-cell self-join keyed by ``cell`` and the final flag
    join keyed by ``id_col``. A real deployment sizes cells via
    ``n_cells`` (the paper uses ~100k clusters over 1B vectors, i.e.
    cells of ~corpus/100k) so no cell's pair count explodes;
    ``max_cell_size`` additionally applies the same deterministic
    salt-split cap as every other blocked dedup here (split mass
    logged; recall trade-off documented in cosine_near_dup_pairs).
    Centroids are fixed literals (:func:`ivf_centroids`) standing in
    for the offline-trained k-means parameter — engine dataflow is
    identical either way, and the literals make the operator exactly
    DuckDB-oracle-checkable.
    """
    from .textstats import bind_once

    cents = ivf_centroids(dim, n_cells)
    scores = centroid_scores_col(F.col(vec_col), cents)
    # bind the n_cells-fold score array once: argmax references it twice
    # and would otherwise inline the whole dot-product fan twice (r06)
    celled = embeddings.select(id_col, vec_col).withColumn(
        "cell",
        bind_once(
            scores, lambda s: F.array_position(s, F.array_max(s))
        ).cast("int"),
    )
    pairs = cosine_near_dup_pairs(
        celled,
        threshold=threshold,
        id_col=id_col,
        vec_col=vec_col,
        block_col="cell",
        max_block_size=max_cell_size,
    )
    dups = (
        pairs.select(F.col("id_b").alias(id_col))
        .distinct()
        .withColumn("_dup", F.lit(True))
    )
    return celled.join(dups, id_col, "left").select(
        id_col,
        "cell",
        F.coalesce(F.col("_dup"), F.lit(False)).alias("is_semantic_dup"),
    )


def hashed_bow_vector_col(text, dim: int = 32):
    """Deterministic hashed bag-of-words COUNT vector (``array<long>``)
    — the embedding stand-in for retrieval pipelines that have no model
    in reach (and the exactness workhorse: integer counts make every
    downstream dot product and norm EXACT, so ranking can never diverge
    between engines the way float embeddings can).

    Token bucket = md5-derived (the ``hashed_bow_score`` hash, DuckDB-
    portable). Each token hashes ONCE into a bucket array; the
    per-bucket counts are then O(tokens·dim) integer comparisons —
    cheap next to the hash (the naive transform-inside-transform form
    re-hashed every token dim×: a measured ~30%-of-line cost at
    dim=32). The big-dim path is the transpose — explode tokens,
    groupBy (id, bucket), pivot — same math, one shuffle.
    """
    from .textstats import WS

    toks = F.filter(
        F.split(F.lower(F.trim(text)), WS), lambda x: x != ""
    )
    buckets = F.transform(
        toks,
        lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10)
        .cast("bigint")
        % F.lit(int(dim)),
    )
    # Bind ``buckets`` ONCE as a lambda variable before fanning out over
    # the dim counts: referencing the raw expression inside the per-bucket
    # lambda duplicates the whole md5 subtree dim× (no CSE across
    # interpreted higher-order lambdas — measured 9s vs 0.6s on the sf0.1
    # chunk table, r06). A lambda variable cannot be re-inlined by the
    # optimizer, so each token hashes exactly once.
    counts = F.transform(
        F.array(buckets),
        lambda bks: F.transform(
            F.sequence(F.lit(0), F.lit(int(dim) - 1)),
            lambda b: F.size(
                F.filter(bks, lambda x: x == b.cast("bigint"))
            ).cast("long"),
        ),
    )
    return counts.getItem(0)


def bow_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "cid",
    vec_col: str = "vec",
    q_id_col: str = "qid",
    q_vec_col: str = "qvec",
) -> DataFrame:
    """Exact-integer cosine top-k over hashed-BOW count vectors.

    Dot products and squared norms are LONG sums (order-free, exact);
    the only float step is the final ``dot / sqrt(m1·m2)`` — one IEEE
    division per pair, identical on any engine — so the (cosine desc,
    id) ranking is fully deterministic. Zero-vector rows score 0.

    Same Q·N shape as :func:`brute_force_topk` (queries broadcast,
    corpus streams through codegen); the LSH/IVF variants remain the
    large-Q scale path — this is the RETRIEVAL-exactness sibling.
    """
    def _sq(v):
        return F.aggregate(
            F.transform(v, lambda x: x * x),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        )

    c = corpus.select(id_col, vec_col, _sq(F.col(vec_col)).alias("_m"))
    q = queries.select(
        q_id_col, q_vec_col, _sq(F.col(q_vec_col)).alias("_qm")
    )
    dot = F.aggregate(
        F.zip_with(F.col(vec_col), F.col(q_vec_col), lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col(q_id_col))
        .select(
            q_id_col,
            id_col,
            dot.alias("dot"),
            F.when(
                (F.col("_m") > 0) & (F.col("_qm") > 0),
                dot.cast("double")
                / F.sqrt((F.col("_m") * F.col("_qm")).cast("double")),
            )
            .otherwise(F.lit(0.0))
            .alias("_cos"),
        )
    )
    w = Window.partitionBy(q_id_col).orderBy(
        F.col("_cos").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= int(k))
        .select(
            q_id_col, id_col, "dot",
            F.round("_cos", 6).alias("cosine"), "rank",
        )
    )


def margin_topk(
    embeddings: DataFrame,
    k: int = 4,
    threshold: float = 1.0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    side_col: Column | None = None,
) -> DataFrame:
    """Margin-based pair mining (the CCMatrix/LASER bitext criterion):
    raw cosine is a bad alignment score because some vectors are "hubs"
    — close to everything — so production parallel-data mining ranks a
    candidate pair by its cosine RELATIVE to each side's neighborhood
    density: ``margin(x,y) = cos(x,y) / ((avgtop_k(x) + avgtop_k(y))/2)``
    and keeps each query's best counterpart when the margin clears the
    threshold. Same trick filters embedding near-dup FALSE POSITIVES in
    dense regions of a monolingual corpus.

    ``side_col`` (boolean; default ``id % 2 = 0``) splits the corpus
    into query/counterpart sides. Determinism: the top-k mean is a
    RUNNING sum over the (cos desc, id) ordered window read off at rank
    ``min(k, n)`` — both engines add the same doubles in the same
    order, so margins are bit-identical, not merely close; emitted
    cosine/margin are rounded to 6 (the embedding-family precedent) and
    the threshold compares the unrounded value.

    Scale shape: candidates here are the exhaustive A×B join — the
    test-scale baseline, exactly like :func:`brute_force_topk`. At
    corpus scale feed the SAME windows/joins from LSH- or IVF-blocked
    candidates (:func:`lsh_topk` buckets / :func:`ivf_topk` probes):
    margins only need each side's top-k list, which blocked retrieval
    already produces. The rank/sum windows are keyed BY the query id —
    per-key state is the candidate list, never a global window.

    Output: one row per query-side vector — ``id_a``, its best
    counterpart ``id_b``, ``cosine``, ``margin``, ``is_aligned``.
    """
    side = side_col if side_col is not None else (F.col(id_col) % 2 == 0)
    base = embeddings.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"),
        side.alias("_qside"),
    )
    a = base.filter("_qside").select(
        F.col("_id").alias("id_a"), F.col("_v").alias("va"),
        _norm(F.col("_v")).alias("_na"),
    )
    b = base.filter(~F.col("_qside")).select(
        F.col("_id").alias("id_b"), F.col("_v").alias("vb"),
        _norm(F.col("_v")).alias("_nb"),
    )
    # round the cosine ONCE, up front: every downstream double (running
    # sums, margins, the threshold compare) is then derived from inputs
    # that are bit-identical across engines — an unrounded cosine differs
    # in the last ulp between kernels and a margin landing on a 6-dp
    # rounding boundary would flip (observed once at sf0.01). Norms are
    # precomputed per row before the pair fan-out (r06) — the identical
    # IEEE expression tree, evaluated N+M times instead of N·M.
    pairs = a.crossJoin(b).select(
        "id_a",
        "id_b",
        F.round(
            _dot(F.col("va"), F.col("vb")) / (F.col("_na") * F.col("_nb")),
            6,
        ).alias("_cos"),
    )

    def _den(key_id: str, other_id: str, out: str) -> DataFrame:
        w = Window.partitionBy(key_id).orderBy(
            F.col("_cos").desc(), F.col(other_id).asc()
        )
        ranked = pairs.select(key_id, other_id, "_cos").withColumn(
            "_rk", F.row_number().over(w)
        ).withColumn(
            "_cum",
            F.sum("_cos").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        ).withColumn("_n", F.count(F.lit(1)).over(Window.partitionBy(key_id)))
        return ranked.filter(
            F.col("_rk") == F.least(F.lit(int(k)), F.col("_n"))
        ).select(F.col(key_id), (F.col("_cum") / F.col("_rk")).alias(out))

    best_w = Window.partitionBy("id_a").orderBy(
        F.col("_cos").desc(), F.col("id_b").asc()
    )
    best = pairs.withColumn("_rk", F.row_number().over(best_w)).filter(
        F.col("_rk") == 1
    ).select("id_a", "id_b", "_cos")
    margin = F.lit(2.0) * F.col("_cos") / (F.col("avg_a") + F.col("avg_b"))
    return (
        best.join(_den("id_a", "id_b", "avg_a"), "id_a")
        .join(_den("id_b", "id_a", "avg_b"), "id_b")
        .select(
            "id_a",
            "id_b",
            F.col("_cos").alias("cosine"),
            F.round(margin, 6).alias("margin"),
            (margin >= float(threshold)).alias("is_aligned"),
        )
    )
