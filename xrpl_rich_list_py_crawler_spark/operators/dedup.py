"""Deduplication operators for web-text corpora.

The reference's dedup is the exact seen-set (``loader.py:140``,
``table.sql:13``); a 100 TB training-data pipeline also needs *near*-dup
removal. All variants below are DataFrame-native; Python appears only in
Arrow-batched UDFs (shingling/minhash over numpy).

Scale design:
* exact: hash-groupBy on a 64/128-bit content key — one shuffle on the key,
  map-side partial agg, no driver state.
* MinHash+LSH: per-doc signature (one Arrow pass) → explode to (band,
  bucket) keys → groupBy bucket → candidate pairs only within buckets
  (the classic band trick keeps the shuffle linear in docs, never O(n²)).
* SimHash: 64-bit signature, near-dups = identical signature or small
  Hamming distance within blocks.
* embedding cosine: see operators/similarity.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

# ---------------------------------------------------------------------------
# exact dedup (hash-groupBy)
# ---------------------------------------------------------------------------


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id representative per exact content hash.

    ≅ UNIQUE(address, snapshot_date) dedup (``table.sql:13``) applied to
    content: groupBy(md5) → min(id) → semi join back. Two narrow shuffles
    on the hash key; at 100 TB partial aggregation collapses duplicates
    map-side before the shuffle.
    """
    key = F.md5(F.col(text_col))
    reps = (
        df.withColumn("_k", key)
        .groupBy("_k")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    return df.join(reps, id_col, "left_semi")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _shingles(text: str, k: int) -> np.ndarray:
    b = text.encode("utf-8")
    if len(b) < k:
        return np.array([hash(b) & 0x7FFFFFFFFFFFFFFF], dtype=np.uint64)
    # rolling byte k-grams hashed via numpy view tricks
    arr = np.frombuffer(b, dtype=np.uint8)
    n = len(arr) - k + 1
    idx = np.arange(k)[None, :] + np.arange(n)[:, None]
    grams = arr[idx]
    weights = (np.uint64(257) ** np.arange(k, dtype=np.uint64))[::-1]
    return (grams.astype(np.uint64) * weights[None, :]).sum(axis=1)


def minhash_signatures_udf(n_hashes: int = 64, shingle_k: int = 9):
    """Arrow UDF: text → minhash signature (array<long>).

    Universal hashing h_i(x) = (a_i·x + b_i) mod p over byte-k-gram
    shingles; a/b are fixed (seed 42) so signatures are deterministic.
    """
    rng = np.random.RandomState(42)
    A = rng.randint(1, _MERSENNE, size=n_hashes, dtype=np.int64).astype(np.uint64)
    B = rng.randint(0, _MERSENNE, size=n_hashes, dtype=np.int64).astype(np.uint64)

    @F.pandas_udf(ArrayType(LongType()))
    def _sig(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            if t is None:
                out.append(None)
                continue
            sh = _shingles(t, shingle_k) % np.uint64(_MERSENNE)
            # (n_hashes, n_shingles) — vectorized over both axes
            hv = (A[:, None] * sh[None, :] + B[:, None]) % np.uint64(_MERSENNE)
            out.append(hv.min(axis=1).astype(np.int64).tolist())
        return pd.Series(out)

    return _sig


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 9,
) -> DataFrame:
    """Candidate near-dup pairs via banded LSH (id_a < id_b, distinct).

    signature → slice into ``bands`` bands of r rows → hash each band →
    explode to (band, bucket) → self-pair within buckets. The only wide
    operation is the groupBy on band-buckets; candidate generation never
    compares across buckets.
    """
    r = n_hashes // bands
    sig = minhash_signatures_udf(n_hashes, shingle_k)
    with_sig = df.select(id_col, sig(F.col(text_col)).alias("sig"))
    band_cols = [
        F.xxhash64(
            F.lit(b), F.slice("sig", b * r + 1, r).cast("array<string>").cast("string")
        ).alias(f"b{b}")
        for b in range(bands)
    ]
    banded = with_sig.select(id_col, "sig", F.posexplode(F.array(*band_cols)))
    # (pos, col) = (band index, bucket hash)
    buckets = banded.select(
        id_col, F.col("pos").alias("band"), F.col("col").alias("bucket")
    )
    a = buckets.alias("a")
    b = buckets.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )
    return pairs


def minhash_jaccard_estimate(
    df: DataFrame, pairs: DataFrame, text_col: str = "text",
    id_col: str = "doc_id", n_hashes: int = 64, shingle_k: int = 9,
) -> DataFrame:
    """Verify candidates: estimated Jaccard = fraction of matching minhash
    components (zip_with, JVM-side)."""
    sig = minhash_signatures_udf(n_hashes, shingle_k)
    sigs = df.select(id_col, sig(F.col(text_col)).alias("sig"))
    return (
        pairs.join(sigs.withColumnRenamed(id_col, "id_a").withColumnRenamed("sig", "sig_a"), "id_a")
        .join(sigs.withColumnRenamed(id_col, "id_b").withColumnRenamed("sig", "sig_b"), "id_b")
        .withColumn(
            "jaccard_est",
            F.aggregate(
                F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
                F.lit(0),
                lambda acc, v: acc + v,
            ).cast("double")
            / F.lit(n_hashes),
        )
        .select("id_a", "id_b", "jaccard_est")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_udf(n_bits: int = 64, shingle_k: int = 6):
    """Arrow UDF: text → 64-bit simhash (long). Token hashes vote per bit,
    weighted by term frequency."""

    @F.pandas_udf(LongType())
    def _sim(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            if t is None:
                out.append(None)
                continue
            sh = np.unique(_shingles(t, shingle_k), return_counts=True)
            hashes, counts = sh
            bits = ((hashes[:, None] >> np.arange(n_bits, dtype=np.uint64)[None, :])
                    & np.uint64(1)).astype(np.int64)
            votes = ((bits * 2 - 1) * counts[:, None].astype(np.int64)).sum(axis=0)
            v = np.uint64(0)
            for i in range(n_bits):
                if votes[i] > 0:
                    v |= np.uint64(1) << np.uint64(i)
            out.append(int(v.astype(np.int64)))
        return pd.Series(out, dtype="Int64")

    return _sim


def simhash_near_dups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by simhash Hamming distance ≤ k.

    Block on 4 16-bit chunks (pigeonhole: distance ≤ 3 ⇒ at least one
    chunk identical), pair within blocks, verify with bit_count — the
    standard scalable simhash join (shuffle on chunk keys, no O(n²))."""
    sim = simhash_udf()
    sigs = df.select(id_col, sim(F.col(text_col)).alias("sim"))
    chunks = sigs.select(
        id_col,
        "sim",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned("sim", i * 16).bitwiseAND(F.lit(0xFFFF))
                    for i in range(4)
                ]
            )
        ),
    ).select(id_col, "sim", F.col("pos").alias("chunk"), F.col("col").alias("key"))
    a, b = chunks.alias("a"), chunks.alias("b")
    return (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.bit_count(
                F.col("a.sim").bitwiseXOR(F.col("b.sim"))
            ).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact, for verification at modest scale)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame, pairs: DataFrame, text_col: str = "text",
    id_col: str = "doc_id", n: int = 3,
) -> DataFrame:
    """Exact word-n-gram Jaccard for given candidate pairs (JVM-side set
    ops over arrays — no Python)."""
    grams = df.select(
        id_col,
        F.array_distinct(
            F.transform(
                F.slice(
                    F.split(F.col(text_col), r"\s+"),
                    1,
                    F.greatest(
                        F.size(F.split(F.col(text_col), r"\s+")) - (n - 1), F.lit(0)
                    ),
                ),
                lambda _, i: F.concat_ws(
                    " ", F.slice(F.split(F.col(text_col), r"\s+"), i + 1, n)
                ),
            )
        ).alias("grams"),
    )
    return (
        pairs.join(grams.withColumnRenamed(id_col, "id_a").withColumnRenamed("grams", "ga"), "id_a")
        .join(grams.withColumnRenamed(id_col, "id_b").withColumnRenamed("grams", "gb"), "id_b")
        .withColumn("inter", F.size(F.array_intersect("ga", "gb")))
        .withColumn("uni", F.size(F.array_union("ga", "gb")))
        .select(
            "id_a",
            "id_b",
            F.when(F.col("uni") == 0, 0.0)
            .otherwise(F.col("inter") / F.col("uni"))
            .alias("jaccard"),
        )
    )
