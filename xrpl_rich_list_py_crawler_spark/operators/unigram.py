"""Unigram-LM tokenizer training (SentencePiece's second algorithm,
Kudo 2018) — the subword family's other half next to
:func:`..operators.textstats.train_bpe`.

Where BPE GROWS a vocabulary by greedy merges, unigram-LM SHRINKS one:
seed with frequent substrings, then alternate (E) segment every word
with the current piece probabilities and (M) re-estimate piece
probabilities from the segmentations, pruning pieces that stop earning
their keep. This implementation is the deterministic hard-EM (Viterbi)
variant:

* **E-step**: per word, the minimum-cost segmentation under
  ``cost(piece) = −log p(piece)``, ties broken by (fewer pieces, then
  lexicographic piece sequence) — a total order, so training is
  reproducible at any parallelism;
* **M-step**: integer piece counts from the Viterbi paths, weighted by
  word frequency; add-1 smoothing when converting to probabilities so
  an unused-but-kept piece never hits log(0);
* **prune**: keep the top ``vocab_size`` pieces by (count desc, piece)
  — single characters are ALWAYS kept (coverage guarantee: every word
  stays segmentable).

Spark-first shape (the ``train_bpe`` discipline): the corpus collapses
ONCE to the distinct pre-token vocabulary with corpus counts
(``BPE_UNIT`` extraction) — all per-character work runs on the
VOCABULARY, weighted by ``wcnt``, never on the token stream. The
substring seed is one explode + map-side-combined groupBy +
TakeOrderedAndProject. Each EM round is one ``mapInPandas`` over the
unit frame (the per-word DP is genuinely sequential — the
Python-is-acceptable case, and it touches vocab-sized data only) and
one piece-keyed groupBy; the piece table (≤ ``seed_size`` rows) is the
only driver traffic per round — bounded like ``train_bpe``'s argmax
rows and ``kmeans_train``'s centroids.

NOT SQL-expressible: each round's piece table parametrizes the next
round's DP, so there is no DuckDB twin — pinned by pytest against a
pure-Python reference (:func:`py_unigram_train`), the
``bpe_train``/``bpe_encode_counts`` stance.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import BPE_UNIT


def _viterbi(unit: str, probs: dict, max_len: int) -> tuple:
    """Min-cost segmentation of ``unit`` under −log piece probs.

    Tie order: (cost, n_pieces, piece sequence) — total, deterministic.
    ``probs`` must cover all single chars of ``unit`` (the trainer's
    coverage guarantee); unknown longer substrings are simply skipped.
    """
    n = len(unit)
    inf = float("inf")
    best: list[tuple] = [(inf, 0, ())] * (n + 1)
    best[0] = (0.0, 0, ())
    for i in range(1, n + 1):
        for j in range(max(0, i - max_len), i):
            if best[j][0] == inf:
                continue
            piece = unit[j:i]
            p = probs.get(piece)
            if p is None:
                continue
            cand = (
                best[j][0] - math.log(p),
                best[j][1] + 1,
                best[j][2] + (piece,),
            )
            if cand < best[i]:
                best[i] = cand
    return best[n][2]


def _unit_frame(df: DataFrame, text_col: str) -> DataFrame:
    units = df.select(
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(BPE_UNIT), F.lit(0))
        ).alias("unit")
    )
    return units.groupBy("unit").agg(F.count(F.lit(1)).alias("wcnt"))


def _seed_vocab(
    units: DataFrame, max_piece_len: int, seed_size: int
) -> DataFrame:
    """Frequent substrings (len ≤ max_piece_len) weighted by word
    frequency; single chars are force-included by the caller's pruning
    rule, so the top-k cut here may drop them freely."""
    u = F.col("unit")
    subs = units.select(
        "wcnt",
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(1), F.length(u)),
                    lambda i: F.transform(
                        F.sequence(
                            F.lit(1),
                            F.least(
                                F.lit(int(max_piece_len)),
                                F.length(u) - i + 1,
                            ),
                        ),
                        lambda l: u.substr(i, l),
                    ),
                )
            )
        ).alias("piece"),
    )
    counts = subs.groupBy("piece").agg(F.sum("wcnt").alias("cnt"))
    return counts.orderBy(F.col("cnt").desc(), "piece").limit(int(seed_size))


def _prune(pieces: dict, vocab_size: int) -> dict:
    singles = {p: c for p, c in pieces.items() if len(p) == 1}
    multi = sorted(
        ((c, p) for p, c in pieces.items() if len(p) > 1),
        key=lambda t: (-t[0], t[1]),
    )
    keep = dict(singles)
    for c, p in multi:
        if len(keep) >= vocab_size:
            break
        keep[p] = c
    return keep


def _probs(pieces: dict) -> dict:
    total = sum(pieces.values()) + len(pieces)  # add-1 smoothing
    return {p: (c + 1) / total for p, c in pieces.items()}


def unigram_lm_train(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 400,
    n_iter: int = 2,
    max_piece_len: int = 6,
    seed_size: int = 2000,
) -> DataFrame:
    """Train the unigram-LM piece vocabulary; returns
    (piece, cnt, rank) — counts from the FINAL Viterbi pass, rank by
    (cnt desc, piece). See module docstring for algorithm and shape.
    """
    spark = df.sparkSession
    units = _unit_frame(df, text_col).localCheckpoint()
    seed = {r.piece: int(r.cnt) for r in _seed_vocab(
        units, max_piece_len, seed_size
    ).collect()}
    # coverage guarantee: every single char of every unit
    chars = units.select(
        "wcnt",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("unit")),
                lambda i: F.col("unit").substr(i, F.lit(1)),
            )
        ).alias("ch"),
    ).groupBy("ch").agg(F.sum("wcnt").alias("c"))
    for r in chars.collect():
        seed.setdefault(r.ch, int(r.c))
    pieces = _prune(seed, vocab_size)

    def em_round(probs: dict):
        sc = spark.sparkContext
        bc = sc.broadcast(probs)
        mp = int(max_piece_len)

        def seg(batches):
            pr = bc.value
            for pdf in batches:
                out: dict[str, int] = {}
                for unit, wcnt in zip(pdf["unit"], pdf["wcnt"]):
                    for piece in _viterbi(str(unit), pr, mp):
                        out[piece] = out.get(piece, 0) + int(wcnt)
                yield pd.DataFrame(
                    {"piece": list(out), "cnt": list(out.values())}
                )

        partial = units.mapInPandas(seg, schema="piece string, cnt long")
        return {
            r.piece: int(r.cnt)
            for r in partial.groupBy("piece")
            .agg(F.sum("cnt").alias("cnt"))
            .collect()  # ≤ vocab_size rows — bounded driver traffic
        }

    for _ in range(int(n_iter)):
        observed = em_round(_probs(pieces))
        # unused single chars stay at count 0 (coverage floor);
        # unused multi-char pieces drop out via the prune cut
        merged = {p: observed.get(p, 0) for p in pieces}
        pieces = _prune(merged, vocab_size)
    rows = sorted(pieces.items(), key=lambda t: (-t[1], t[0]))
    return spark.createDataFrame(
        [(p, c, i + 1) for i, (p, c) in enumerate(rows)],
        "piece string, cnt bigint, rank int",
    )


def unigram_encode_counts(
    df: DataFrame,
    pieces: DataFrame | dict,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_piece_len: int = 6,
) -> DataFrame:
    """Apply a trained vocabulary at corpus scale: per-doc piece counts
    under the Viterbi segmentation. Distinct units are segmented ONCE
    (vocabulary-scale Python), then joined back to the per-(doc, unit)
    stream — the ``bpe_encode`` distinct-unit discipline. Output:
    (id, n_units, n_pieces, pieces_per_unit)."""
    spark = df.sparkSession
    if isinstance(pieces, DataFrame):
        pieces = {r.piece: int(r.cnt) for r in pieces.collect()}
    probs = _probs(pieces)
    bc = spark.sparkContext.broadcast(probs)
    mp = int(max_piece_len)

    def seg(batches):
        pr = bc.value
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "unit": pdf["unit"],
                    "n_pieces": [
                        len(_viterbi(str(u), pr, mp)) for u in pdf["unit"]
                    ],
                }
            )

    units = _unit_frame(df, text_col).select("unit")
    seg_dim = units.mapInPandas(
        seg, schema="unit string, n_pieces int"
    )
    doc_units = df.select(
        id_col,
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(BPE_UNIT), F.lit(0))
        ).alias("unit"),
    )
    per_doc = (
        doc_units.join(seg_dim, "unit")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_units"),
            F.sum("n_pieces").cast("long").alias("n_pieces"),
        )
    )
    spine = df.select(id_col)
    return spine.join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce("n_units", F.lit(0).cast("long")).alias("n_units"),
        F.coalesce("n_pieces", F.lit(0).cast("long")).alias("n_pieces"),
        F.round(
            F.when(
                F.coalesce("n_units", F.lit(0)) > 0,
                F.col("n_pieces").cast("double") / F.col("n_units"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("pieces_per_unit"),
    )


# ---------------------------------------------------------------------------
# pure-Python reference twin (the pytest oracle, train_bpe stance)
# ---------------------------------------------------------------------------


def py_unigram_train(
    texts: list[str],
    vocab_size: int = 400,
    n_iter: int = 2,
    max_piece_len: int = 6,
    seed_size: int = 2000,
) -> list[tuple]:
    """Row-at-a-time reference implementation of
    :func:`unigram_lm_train` — same seed, same EM, same tie rules —
    used only by tests."""
    import re

    units: dict[str, int] = {}
    for t in texts:
        for u in re.findall(BPE_UNIT, t):
            units[u] = units.get(u, 0) + 1
    seed: dict[str, int] = {}
    for u, w in units.items():
        for i in range(len(u)):
            for l in range(1, min(max_piece_len, len(u) - i) + 1):
                p = u[i : i + l]
                seed[p] = seed.get(p, 0) + w
    top = sorted(seed.items(), key=lambda t: (-t[1], t[0]))[:seed_size]
    seedv = dict(top)
    # coverage floor: char counts, occurrences weighted by unit count
    chars: dict[str, int] = {}
    for u, w in units.items():
        for ch in u:
            chars[ch] = chars.get(ch, 0) + w
    for ch, c in chars.items():
        seedv.setdefault(ch, c)
    pieces = _prune(seedv, vocab_size)
    for _ in range(n_iter):
        probs = _probs(pieces)
        observed: dict[str, int] = {}
        for u, w in units.items():
            for piece in _viterbi(u, probs, max_piece_len):
                observed[piece] = observed.get(piece, 0) + w
        pieces = _prune({p: observed.get(p, 0) for p in pieces}, vocab_size)
    return sorted(pieces.items(), key=lambda t: (-t[1], t[0]))
