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

Cache policy: operators persist() small internally-reused frames
(signatures, band/chunk buckets, candidate pairs, gram sets) so
multi-reference plans don't replay the Arrow passes. These handles are
intentionally NOT unpersisted before return — the returned DataFrame
still reads them lazily. They are candidate-set-sized (KBs-MBs per call
at fixture scale, ≪ corpus), MEMORY_AND_DISK, and LRU-evicted under
pressure; a long-lived session running many dedup calls can reclaim
eagerly with ``spark.catalog.clearCache()`` between batches.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

_log = logging.getLogger(__name__)

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


#: shingle positions per chunk — bounds the (chunk × k) gram matrix here
#: and the (n_hashes × chunk) hash matrix in the minhash UDF to a few MB
#: each, regardless of document length. Without this, a 10 MB page at k=9
#: allocated ~90 MB of uint64 gram intermediates and ~5 GB of minhash
#: intermediates per doc (r03 verdict finding) — an executor OOM on real
#: web pages. Chunking is windowed evaluation of the same expression, so
#: signatures are byte-identical to the unchunked math.
_SHINGLE_CHUNK = 1 << 16


def _shingle_chunks(text: str, k: int):
    """Yield the doc's byte-k-gram hashes in bounded-size uint64 chunks."""
    b = text.encode("utf-8")
    if len(b) < k:
        # deterministic short-text hash: builtin hash() is PYTHONHASHSEED-
        # salted and would make signatures vary across workers/runs
        yield np.array(
            [int.from_bytes(b.ljust(8, b"\0")[:8], "little")], dtype=np.uint64
        )
        return
    # rolling byte k-grams hashed via numpy view tricks (mod-2^64 poly)
    arr = np.frombuffer(b, dtype=np.uint8)
    n = len(arr) - k + 1
    weights = (np.uint64(257) ** np.arange(k, dtype=np.uint64))[::-1]
    for start in range(0, n, _SHINGLE_CHUNK):
        stop = min(start + _SHINGLE_CHUNK, n)
        idx = np.arange(k)[None, :] + np.arange(start, stop)[:, None]
        yield (arr[idx].astype(np.uint64) * weights[None, :]).sum(axis=1)


def _shingles(text: str, k: int) -> np.ndarray:
    return np.concatenate(list(_shingle_chunks(text, k)))


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
        P = np.uint64(_MERSENNE)
        for t in texts:
            if t is None:
                out.append(None)
                continue
            # streaming min over bounded shingle chunks: the (n_hashes ×
            # chunk) matrix stays a few MB however long the doc is, and
            # min-of-chunk-mins == min over all shingles (same op order,
            # byte-identical signatures)
            mins = None
            for chunk in _shingle_chunks(t, shingle_k):
                sh = chunk % P
                hv = (A[:, None] * sh[None, :] + B[:, None]) % P
                cm = hv.min(axis=1)
                mins = cm if mins is None else np.minimum(mins, cm)
            out.append(mins.astype(np.int64).tolist())
        return pd.Series(out)

    return _sig


def salt_split_oversize(
    df: DataFrame,
    group_keys: list[str],
    salt_of,
    cap: int,
    label: str,
) -> tuple[DataFrame, list[str]]:
    """Shared bucket-cap mechanic: split groups of ``df`` larger than
    ``cap`` into ⌈n/cap⌉ deterministic salt sub-groups.

    ``salt_of`` maps the _nsplit Column to the salt Column (callers choose
    the hash inputs, e.g. ``xxhash64(band, id) % nsplit``). Returns the
    salted frame plus the join-key list (``group_keys`` + ``_salt`` when
    any split happened is always appended — a no-split run still carries
    ``_salt = 0`` so plans stay uniform). The affected mass is logged,
    never silently dropped. One definition for all three capped operators
    (minhash / simhash / embedding blocks) so the cap math cannot drift.
    """
    sizes = df.groupBy(*group_keys).agg(F.count("*").alias("_n"))
    split = sizes.withColumn(
        "_nsplit",
        F.when(
            F.col("_n") > cap, F.ceil(F.col("_n") / cap).cast("int")
        ).otherwise(F.lit(1)),
    )
    over = split.filter(F.col("_nsplit") > 1).agg(
        F.count("*").alias("groups"), F.sum("_n").alias("rows")
    ).collect()[0]
    if over["groups"]:
        _log.info(
            "%s cap: salt-split %d oversize groups (%d rows) at cap=%d",
            label, over["groups"], over["rows"], cap,
        )
    salted = df.join(
        split.select(*group_keys, "_nsplit"), group_keys
    ).withColumn("_salt", salt_of(F.col("_nsplit"))).drop("_nsplit")
    return salted, [*group_keys, "_salt"]


def band_buckets(
    with_sig: DataFrame, id_col: str, bands: int, r: int
) -> DataFrame:
    """(id, band, bucket) rows from a (id, sig) frame: slice the minhash
    signature into ``bands`` bands of ``r`` rows, hash each band
    (``xxhash64(band_index, rendered slice)``), posexplode. Shared by the
    self-join candidate path, the incremental vs-reference path, and the
    streaming vs-reference job, so every side of any candidate join
    buckets IDENTICALLY by construction. Columns other than ``sig`` are
    passed through (the streaming caller carries ``ingest_ts``).
    """
    band_cols = [
        F.xxhash64(
            F.lit(b), F.slice("sig", b * r + 1, r).cast("array<string>").cast("string")
        ).alias(f"b{b}")
        for b in range(bands)
    ]
    banded = with_sig.select("*", F.posexplode(F.array(*band_cols)))
    # (pos, col) = (band index, bucket hash)
    keep = [c for c in with_sig.columns if c != "sig"]
    return banded.select(
        *keep, F.col("pos").alias("band"), F.col("col").alias("bucket")
    )


def reference_band_index(
    ref_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 9,
) -> DataFrame:
    """The reference corpus's (id, band, bucket) LSH index — the static
    side of incremental dedup (:func:`minhash_vs_reference` and the
    streaming ``neardup_vs_reference_stream``). In production this is
    computed ONCE per corpus version and written with
    ``bucketBy(n, "band", "bucket")`` so every later increment's
    candidate join is exchange-free on the reference side."""
    r = n_hashes // bands
    sig = minhash_signatures_udf(n_hashes, shingle_k)
    return band_buckets(
        ref_df.select(id_col, sig(F.col(text_col)).alias("sig")),
        id_col, bands, r,
    )


def minhash_vs_reference(
    new_df: DataFrame,
    ref_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 9,
) -> DataFrame:
    """Incremental near-dup candidates: NEW docs against an existing
    REFERENCE corpus — the continuous-ingest shape of web-crawl dedup
    (each day's fetch is deduped against the accumulated 100 TB corpus;
    re-running the self-join over old∪new every increment would redo
    O(corpus) work per day and re-emit every historical pair).

    Same banded LSH as :func:`minhash_lsh_candidates`, but the band
    buckets of the two sides are built separately and EQUI-JOINED
    (new ⋈ ref on (band, bucket)): the reference side never pairs with
    itself, the new side never pairs with itself, and candidate
    generation touches the reference only through its (id, band, bucket)
    index — which production writes once as a table bucketed by
    (band, bucket) (``DataFrameWriter.bucketBy``), so each increment's
    join shuffles ONLY the new side. Output: distinct (new_id, ref_id).

    Generalizes the reference crawler's seen-URL anti-join
    (validator.py:94-110 re-fetch skip) from exact URL identity to
    near-duplicate content identity, per SURVEY.md §2's
    training-data-pipeline mandate.

    Skew note: a boilerplate bucket with n_new × n_ref members emits
    that many candidates — inherent to candidate generation, but unlike
    the self-join path the join here is a plain equi-join, so AQE's
    skew-join split handles oversized buckets without the salt
    machinery (no within-bucket pair enumeration happens engine-side).
    Verification downstream (:func:`chargram_jaccard_pairs`) is linear
    in candidates.
    """
    nb = reference_band_index(
        new_df, text_col, id_col, n_hashes, bands, shingle_k
    )
    rb = reference_band_index(
        ref_df, text_col, id_col, n_hashes, bands, shingle_k
    )
    return (
        nb.select(
            F.col(id_col).alias("new_id"), "band", "bucket"
        )
        .join(
            rb.select(F.col(id_col).alias("ref_id"), "band", "bucket"),
            ["band", "bucket"],
        )
        .select("new_id", "ref_id")
        .distinct()
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 9,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Candidate near-dup pairs via banded LSH (id_a < id_b, distinct).

    signature → slice into ``bands`` bands of r rows → hash each band →
    explode to (band, bucket) → self-pair within buckets. The only wide
    operation is the groupBy on band-buckets; candidate generation never
    compares across buckets.

    ``max_bucket_size`` bounds per-bucket pair generation — the 100 TB
    scale guard against boilerplate clusters (k near-identical docs in one
    bucket would otherwise emit k²/2 candidates). Two recall-aware stages:

    1. **Identical-signature collapse (lossless for dedup):** docs sharing
       the FULL minhash signature are emitted as star pairs
       ``(min_id, other)`` — est. Jaccard 1.0 by construction — and only
       the min-id representative enters banding. A k-identical cluster
       costs k−1 pairs, and star edges preserve the connected component
       exactly, so keep-one-per-component dedup downstream is unchanged.
    2. **Salt-split of residual oversize buckets (bounded recall trade):**
       any remaining (band, bucket) group larger than the cap is split
       into ⌈n/cap⌉ deterministic salt groups; pairs generate within salt
       groups only. A true near-dup pair is dropped only if EVERY band
       that buckets it together is oversize AND every such band's salt
       separates it — each band salts independently
       (``xxhash64(band, id)``), so survival chance compounds across
       bands. The split mass (buckets and rows affected) is computed and
       logged — never silently dropped.

    With ``max_bucket_size=None`` (default) behavior is exactly the
    uncapped classic band trick — byte-identical to the SQL-twin oracle.
    """
    r = n_hashes // bands
    sig = minhash_signatures_udf(n_hashes, shingle_k)
    with_sig = df.select(id_col, sig(F.col(text_col)).alias("sig"))

    star_pairs = None
    if max_bucket_size is not None:
        # stage 1: collapse identical full signatures → star pairs + reps.
        # persisted: referenced three times (reps agg, star pairs, rep
        # filter) — one signature pass instead of three. Key = the FULL
        # signature rendered to string (collision-free: distinct sig
        # arrays render distinctly), NOT a 64-bit hash of it — at 10^9+
        # docs birthday collisions on 64 bits would silently merge
        # unrelated docs and drop their non-reps from banding.
        keyed = with_sig.withColumn(
            "_sigkey", F.col("sig").cast("array<string>").cast("string")
        ).persist()
        reps = keyed.groupBy("_sigkey").agg(F.min(id_col).alias("_rep"))
        star_pairs = (
            keyed.join(reps, "_sigkey")
            .filter(F.col(id_col) != F.col("_rep"))
            .select(F.col("_rep").alias("id_a"), F.col(id_col).alias("id_b"))
        )
        with_sig = (
            keyed.join(reps, "_sigkey")
            .filter(F.col(id_col) == F.col("_rep"))
            .select(id_col, "sig")
        )

    # persisted: the self-join references this frame TWICE — without a
    # materialization barrier each side recomputes the Arrow signature
    # UDF over the whole corpus (plan-audit finding, round 3). Storage is
    # (id, band, bucket) only — tiny; LRU-evicted with the session.
    buckets = band_buckets(with_sig, id_col, bands, r).persist()

    keys = ["band", "bucket"]
    if max_bucket_size is not None:
        # stage 2: salt-split residual oversize buckets (per-band salts:
        # a pair split apart in one band can still survive via another)
        buckets, keys = salt_split_oversize(
            buckets, keys,
            lambda n: F.pmod(F.xxhash64(F.col("band"), F.col(id_col)), n),
            max_bucket_size, "minhash LSH",
        )

    a = buckets.alias("a")
    b = buckets.alias("b")
    cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    for k in keys:
        cond = cond & (F.col(f"a.{k}") == F.col(f"b.{k}"))
    pairs = (
        a.join(b, cond)
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )
    if star_pairs is not None:
        pairs = pairs.unionByName(star_pairs).distinct()
    return pairs


def minhash_jaccard_estimate(
    df: DataFrame, pairs: DataFrame, text_col: str = "text",
    id_col: str = "doc_id", n_hashes: int = 64, shingle_k: int = 9,
) -> DataFrame:
    """Verify candidates: estimated Jaccard = fraction of matching minhash
    components (zip_with, JVM-side). Signatures persist — both pair sides
    reference them."""
    sig = minhash_signatures_udf(n_hashes, shingle_k)
    sigs = df.select(id_col, sig(F.col(text_col)).alias("sig")).persist()
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
        shift = np.arange(n_bits, dtype=np.uint64)[None, :]
        for t in texts:
            if t is None:
                out.append(None)
                continue
            # TF-weighted bit votes accumulate per chunk: Σ over shingle
            # INSTANCES of (2·bit − 1) is chunk-decomposable, so chunked
            # unique+counts gives votes identical to a global unique while
            # the (unique × 64) bit matrix stays bounded on huge docs
            votes = np.zeros(n_bits, dtype=np.int64)
            for chunk in _shingle_chunks(t, shingle_k):
                hashes, counts = np.unique(chunk, return_counts=True)
                bits = ((hashes[:, None] >> shift) & np.uint64(1)).astype(np.int64)
                votes += ((bits * 2 - 1) * counts[:, None].astype(np.int64)).sum(axis=0)
            v = np.uint64(0)
            for i in range(n_bits):
                if votes[i] > 0:
                    v |= np.uint64(1) << np.uint64(i)
            out.append(int(v.astype(np.int64)))
        return pd.Series(out, dtype="Int64")

    return _sim


def _simhash_chunk_bounds(max_hamming: int) -> list[tuple[int, int]]:
    """Partition the 64 signature bits into exactly ``max_hamming + 1``
    chunks of ≥ 1 bit each, as (lo, bits) pairs.

    The naive ``width = ceil(64 / n_chunks)`` layout produces ZERO-width
    trailing chunks for max_hamming ≥ 16 (lo ≥ 64 ⇒ mask 0 ⇒ every row
    keys to 0 ⇒ candidate generation degenerates to the full cross
    product). Distributing the remainder instead keeps all n_chunks
    non-empty, so the pigeonhole recall guarantee (distance ≤ k over k+1
    disjoint chunks ⇒ some chunk identical) holds exactly for any
    max_hamming ≤ 63 (ADVICE r02, dedup.py:215)."""
    n_chunks = max_hamming + 1
    if not 1 <= n_chunks <= 64:
        raise ValueError(f"max_hamming must be in [0, 63], got {max_hamming}")
    base, extra = divmod(64, n_chunks)
    bounds, lo = [], 0
    for i in range(n_chunks):
        bits = base + (1 if i < extra else 0)
        bounds.append((lo, bits))
        lo += bits
    return bounds


def simhash_near_dups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    max_hamming: int = 3,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Near-dup pairs by simhash Hamming distance ≤ k.

    Block on ``max_hamming + 1`` bit-chunks (pigeonhole: distance ≤ k over
    k+1 chunks ⇒ at least one chunk identical), pair within blocks, verify
    with bit_count — the standard scalable simhash join (shuffle on chunk
    keys, no O(n²)).

    ``max_bucket_size`` bounds per-block pair generation against
    boilerplate clusters, mirroring :func:`minhash_lsh_candidates`:
    identical full signatures collapse to a min-id representative with
    star pairs (hamming 0, lossless for component connectivity), then any
    residual oversize (chunk, key) block is salt-split with its mass
    logged. Default ``None`` = exact classic behavior (oracle-identical).
    """
    sim = simhash_udf()
    sigs = df.select(id_col, sim(F.col(text_col)).alias("sim"))

    star_pairs = None
    if max_bucket_size is not None:
        sigs = sigs.persist()  # reps agg + join sides: one simhash pass
        reps = sigs.groupBy("sim").agg(F.min(id_col).alias("_rep"))
        joined = sigs.join(reps, "sim")
        star_pairs = (
            joined.filter(F.col(id_col) != F.col("_rep"))
            .select(
                F.col("_rep").alias("id_a"),
                F.col(id_col).alias("id_b"),
                F.lit(0).alias("hamming"),
            )
        )
        sigs = joined.filter(F.col(id_col) == F.col("_rep")).select(id_col, "sim")

    chunk_cols = []
    for lo, bits in _simhash_chunk_bounds(max_hamming):
        mask = (1 << bits) - 1
        chunk_cols.append(
            F.shiftrightunsigned("sim", lo).bitwiseAND(F.lit(mask))
        )
    # persisted for the same reason as the minhash buckets frame: the
    # self-join's two sides must not each recompute the simhash UDF
    chunks = sigs.select(
        id_col,
        "sim",
        F.posexplode(F.array(*chunk_cols)),
    ).select(
        id_col, "sim", F.col("pos").alias("chunk"), F.col("col").alias("key")
    ).persist()

    keys = ["chunk", "key"]
    if max_bucket_size is not None:
        chunks, keys = salt_split_oversize(
            chunks, keys,
            lambda n: F.pmod(F.xxhash64(F.col("chunk"), F.col(id_col)), n),
            max_bucket_size, "simhash",
        )

    a, b = chunks.alias("a"), chunks.alias("b")
    cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    for k in keys:
        cond = cond & (F.col(f"a.{k}") == F.col(f"b.{k}"))
    pairs = (
        a.join(b, cond)
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
    if star_pairs is not None:
        pairs = pairs.unionByName(star_pairs).distinct()
    return pairs


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact, for verification at modest scale)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame, pairs: DataFrame, text_col: str = "text",
    id_col: str = "doc_id", n: int = 3,
) -> DataFrame:
    """Exact word-n-gram Jaccard for given candidate pairs (JVM-side set
    ops over arrays — no Python). Gram sets persist: both join sides
    reference them."""
    from .textstats import WS  # portable whitespace class (no bare \s)

    from .textstats import bind_once

    # bind_once: the gram lambda slices back into the token array —
    # without the binding the split re-ran once per gram position (r06)
    grams = df.select(
        id_col,
        bind_once(
            F.split(F.col(text_col), WS),
            lambda tk: F.array_distinct(
                F.transform(
                    F.slice(
                        tk, 1, F.greatest(F.size(tk) - (n - 1), F.lit(0))
                    ),
                    lambda _, i: F.concat_ws(" ", F.slice(tk, i + 1, n)),
                )
            ),
        ).alias("grams"),
    ).persist()
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


def char_ngrams_col(text, n: int = 9, stride: int = 1):
    """Distinct character n-grams of a string column, pure JVM.

    Portable across engines: DuckDB's
    ``list_distinct(list_transform(range(...), i -> substr(text, i, n)))``
    computes the identical set, so exact char-gram Jaccard is oracle-able.
    ``stride > 1`` samples every stride-th position — same bimodal
    discrimination for near-dup detection at 1/stride the set size (set-op
    cost per pair drops quadratically)."""
    t = text if not isinstance(text, str) else F.col(text)
    start = F.sequence(
        F.lit(1), F.greatest(F.length(t) - (n - 1), F.lit(1)), F.lit(stride)
    )
    return F.array_distinct(F.transform(start, lambda i: t.substr(i, F.lit(n))))


def chargram_jaccard_pairs(
    df: DataFrame, pairs: DataFrame, text_col: str = "text",
    id_col: str = "doc_id", n: int = 9, stride: int = 1,
) -> DataFrame:
    """Exact character-n-gram Jaccard for candidate pairs (the verification
    stage behind MinHash/SimHash blocking). Integer set sizes divided in
    double — bit-identical across engines.

    Grams are built only for docs that appear in ``pairs`` (semi-join
    first): n-gram extraction at char offsets is O(len²) per doc, so
    restricting it to the candidate set — a tiny fraction of the corpus —
    is the difference between seconds and minutes even at fixture scale.

    ``pairs`` and the gram sets are persisted internally: this function
    references ``pairs`` three times and the grams twice, and ``pairs``
    is typically an expensive LSH plan — without a barrier every
    reference replays candidate generation (incl. its Arrow signature
    passes) from scratch. Both frames are candidate-set-sized, tiny
    relative to the corpus."""
    pairs = pairs.persist()
    ids = (
        pairs.select(F.col("id_a").alias(id_col))
        .unionByName(pairs.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    # no forced broadcast: at corpus scale the candidate-id set can be
    # large — let AQE pick broadcast vs shuffle semi join from actual size
    grams = df.join(ids, id_col, "left_semi").select(
        id_col, char_ngrams_col(F.col(text_col), n, stride).alias("g")
    ).persist()
    ga = grams.withColumnRenamed(id_col, "id_a").withColumnRenamed("g", "ga")
    gb = grams.withColumnRenamed(id_col, "id_b").withColumnRenamed("g", "gb")
    return (
        pairs.join(ga, "id_a")
        .join(gb, "id_b")
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


def chargram_containment_pairs(
    df: DataFrame, pairs: DataFrame, text_col: str = "text",
    id_col: str = "doc_id", n: int = 9, stride: int = 1,
) -> DataFrame:
    """Exact char-n-gram CONTAINMENT for candidate pairs — the
    asymmetric complement of :func:`chargram_jaccard_pairs`:
    ``containment_a = |A∩B| / |A|`` says "doc a is an excerpt of b"
    even when Jaccard is tiny because b is much longer (a quoted
    paragraph inside a full article scores J ≈ |A|/|B| ≈ 0 but
    c_a ≈ 1). Production dedup keeps the superset and drops the
    excerpt; Jaccard alone cannot see the direction.

    Candidate sourcing matters for recall: LSH bands are Jaccard-biased
    and MISS low-J/high-containment pairs, so feed this from
    :func:`sorted_neighborhood_pairs` (prefix-truncation locality) or a
    one-sided blocking, optionally unioned with LSH candidates — the
    multi-pass ER recipe. Same candidate-only gram economics and
    persist discipline as the Jaccard scorer; integer set sizes divided
    once in double (bit-identical across engines).

    Output: (id_a, id_b, jaccard, containment_a, containment_b).
    """
    pairs = pairs.persist()
    ids = (
        pairs.select(F.col("id_a").alias(id_col))
        .unionByName(pairs.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    grams = df.join(ids, id_col, "left_semi").select(
        id_col, char_ngrams_col(F.col(text_col), n, stride).alias("g")
    ).persist()
    ga = grams.withColumnRenamed(id_col, "id_a").withColumnRenamed("g", "ga")
    gb = grams.withColumnRenamed(id_col, "id_b").withColumnRenamed("g", "gb")
    inter = F.size(F.array_intersect("ga", "gb"))
    na, nb = F.size("ga"), F.size("gb")
    uni = F.size(F.array_union("ga", "gb"))
    return (
        pairs.join(ga, "id_a")
        .join(gb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.when(uni == 0, 0.0).otherwise(inter / uni).alias("jaccard"),
            F.when(na == 0, 0.0).otherwise(inter / na)
            .alias("containment_a"),
            F.when(nb == 0, 0.0).otherwise(inter / nb)
            .alias("containment_b"),
        )
    )


def jaccard_similarity_join(
    df: DataFrame,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """EXACT token-set Jaccard self-join via prefix filtering (SSJoin /
    PPJoin family) — never all-pairs, with a mathematical (not statistical)
    recall guarantee.

    Sort each doc's distinct tokens by ascending global frequency; any pair
    with J ≥ θ must share a token within each side's first
    ``|d| − ⌈θ·|d|⌉ + 1`` tokens (prefix-filter theorem). Candidates are
    generated by exploding only those prefixes — which are the RAREST
    tokens, so bucket sizes stay small even on a vocabulary-skewed corpus —
    then verified with the exact Jaccard. Shuffles: one token-frequency agg,
    one prefix-bucket join, one verify join; all linear-ish in corpus size.
    """
    from .textstats import WS  # portable whitespace class (no bare \s)

    toks = df.select(
        id_col,
        F.array_distinct(F.split(F.lower(F.col(text_col)), WS)).alias("t"),
    )
    freq = (
        toks.select(F.explode("t").alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("freq"))
    )
    # order each doc's tokens by (freq asc, tok asc) — a global canonical
    # order shared by every doc, required by the prefix-filter theorem
    ordered = (
        toks.select(id_col, F.explode("t").alias("tok"))
        .join(freq, "tok")
        .groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct("freq", "tok"))
            ).alias("ft"),
        )
        .select(
            id_col,
            F.transform("ft", lambda s: s["tok"]).alias("sorted_toks"),
        )
        # referenced three times below (prefixes + both verify sides):
        # persist so the freq-join + sort runs once
        .persist()
    )
    prefix_len = (
        F.size("sorted_toks")
        - F.ceil(F.size("sorted_toks") * F.lit(threshold)).cast("int")
        + F.lit(1)
    )
    prefixes = ordered.select(
        id_col, F.explode(F.slice("sorted_toks", 1, prefix_len)).alias("tok")
    )
    a = prefixes.withColumnRenamed(id_col, "id_a")
    b = prefixes.withColumnRenamed(id_col, "id_b")
    cands = (
        a.join(b, "tok")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    sa = ordered.select(
        F.col(id_col).alias("id_a"), F.col("sorted_toks").alias("ta")
    )
    sb = ordered.select(
        F.col(id_col).alias("id_b"), F.col("sorted_toks").alias("tb")
    )
    return (
        cands.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("inter", F.size(F.array_intersect("ta", "tb")))
        .withColumn("uni", F.size(F.array_union("ta", "tb")))
        .select(
            "id_a",
            "id_b",
            F.when(F.col("uni") == 0, 0.0)
            .otherwise(F.col("inter") / F.col("uni"))
            .alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# connected components (keep-one-per-component dedup verdicts)
# ---------------------------------------------------------------------------


def connected_components(
    ids: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iters: int = 50,
) -> DataFrame:
    """Component id (= min member id) per doc over near-dup ``pairs``.

    The terminal step of dedup: pair emitters (exact / minhash / simhash /
    embedding) produce edges, and keep-one dedup keeps exactly the doc
    whose id IS its component id. Star-collapsed capped pairs (see
    :func:`minhash_lsh_candidates`) yield identical components by
    construction.

    Algorithm: iterative min-label propagation — each round every node
    takes the min of its own label and its neighbors' labels (one
    groupBy-min over the undirected edge list per round), until a round
    changes nothing. Converges in O(graph diameter) rounds; near-dup
    graphs are unions of small cliques/stars (diameter ≤ ~3), so 2-3
    shuffle rounds in practice. Each round's labels are eagerly
    ``localCheckpoint``-ed: iterative self-referencing plans OTHERWISE
    double the logical tree per round (persist caches data but not
    lineage) and OOM the driver's analyzer past ~25 rounds. Convergence
    is checked with a 1-row count — no driver-side graph.

    100 TB shape: each iteration is one shuffle keyed by ``id``, linear in
    edges; this is the standard Spark large-graph CC pattern (the
    alternating-star optimization only matters for high-diameter graphs,
    which dedup graphs are not).

    Returns (id_col, component, is_canonical).
    """
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionByName(
            pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
        )
        .distinct()
        .localCheckpoint()
    )
    labels = ids.select(
        F.col(id_col).alias("src"), F.col(id_col).alias("comp")
    ).localCheckpoint()
    converged = False
    for _ in range(max_iters):
        # neighbor-min: for each node, the min label among neighbors
        neigh = (
            edges.join(labels, "src")
            .groupBy(F.col("dst").alias("src"))
            .agg(F.min("comp").alias("ncomp"))
        )
        new_labels = (
            labels.join(neigh, "src", "left")
            .select(
                "src",
                F.least(
                    F.col("comp"), F.coalesce("ncomp", F.col("comp"))
                ).alias("comp"),
            )
            .localCheckpoint()  # eager: truncates lineage each round
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "src")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    if not converged:
        # silent non-convergence would emit WRONG labels (multiple comp
        # ids inside one true component ⇒ keep-one dedup keeps dups) —
        # fail loudly instead; long near-dup drift chains need a larger
        # max_iters (propagation advances one hop per round)
        raise RuntimeError(
            f"connected_components did not converge within {max_iters} "
            f"iterations — the pair graph has diameter > {max_iters}; "
            "raise max_iters"
        )
    return labels.select(
        F.col("src").alias(id_col),
        "comp",
        (F.col("src") == F.col("comp")).alias("is_canonical"),
    )


# ---------------------------------------------------------------------------
# exact-substring span dedup (Lee et al. 2021 style)
# ---------------------------------------------------------------------------


def substring_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_run_tokens: int = 50,
    hashed: bool = False,
) -> DataFrame:
    """Exact-substring span deduplication (r05): remove every token run
    of ``min_run_tokens`` (or longer) that occurs MORE THAN ONCE in the
    corpus — the "Deduplicating Training Data Makes Language Models
    Better" (Lee et al. 2021) operation, which strikes repeated licence
    blocks, quoted boilerplate, and templated passages that doc-level
    dedup (:func:`dedup_exact`, MinHash) cannot touch because the
    surrounding document is unique.

    Semantics, all deterministic: tokens are the portable-whitespace
    split of the raw text (original case — reassembly is byte-faithful);
    every length-``n`` token window is a gram; a gram whose TOTAL
    occurrence count (within-doc repeats included, matching Lee et al.)
    exceeds 1 is duplicated; the positions covered by any duplicated
    window are struck; survivors are rejoined with single spaces.
    Reported ``n_spans`` counts maximal OVERLAPPING runs of struck
    windows (adjacent-but-disjoint windows stay separate spans).

    The reference engine re-validates full rows per round
    (validator.py:137-158); this is the corpus-scale sub-document
    analog a pretraining pipeline adds on top.

    Shape: window explode is linear (n× corpus tokens — the streaming
    substitute for Lee et al.'s suffix array, which is not
    cluster-partitionable); occurrence counting is groupBy(gram) with
    map-side partial agg; the strike is a semi join keyed by the gram
    followed by a size-n ``sequence`` explode + DISTINCT — key-
    partitioned shuffles only, never all-pairs. ``hashed=True`` keys
    the count and semi join on ``xxhash64(gram)`` instead of the
    ~n-word string (8-byte shuffle keys — the
    :func:`~.curation.ngram_contamination` ``hashed=True`` trade; a
    64-bit collision can only over-strike, and is vanishing at any
    real gram count).

    Output per doc: ``id_col``, ``n_tokens``, ``n_removed``,
    ``n_spans``, ``text_clean``.
    """
    from pyspark.sql import Window

    from .textstats import WS

    n = int(min_run_tokens)
    toks = F.filter(F.split(F.col(text_col), WS), lambda x: x != "")
    base = df.select(
        F.col(id_col),
        F.size(toks).cast("int").alias("n_tokens"),
        toks.alias("toks"),
    )
    starts = F.when(
        F.col("n_tokens") >= n,
        F.sequence(F.lit(1), F.col("n_tokens") - (n - 1)),
    ).otherwise(F.array().cast("array<int>"))
    grams = base.select(
        F.col(id_col), F.explode(starts).alias("start"), "toks"
    ).select(
        id_col,
        "start",
        F.concat_ws(
            " ", F.slice("toks", F.col("start"), F.lit(n))
        ).alias("gram"),
    )
    key = F.xxhash64("gram") if hashed else F.col("gram")
    grams = grams.select(id_col, "start", key.alias("g"))
    dup = (
        grams.groupBy("g")
        .agg(F.count(F.lit(1)).alias("occ"))
        .filter(F.col("occ") > 1)
        .select("g")
    )
    hits = grams.join(dup, "g", "left_semi").select(id_col, "start")
    covered = hits.select(
        F.col(id_col),
        F.explode(
            F.sequence(F.col("start"), F.col("start") + F.lit(n - 1))
        ).alias("pos"),
    ).distinct()
    removed = covered.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("int").alias("n_removed")
    )
    w = Window.partitionBy(id_col).orderBy("start")
    prev_end = F.max(F.col("start") + F.lit(n - 1)).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    spans = (
        hits.withColumn(
            "new_span",
            (prev_end.isNull() | (F.col("start") > prev_end)).cast("int"),
        )
        .groupBy(id_col)
        .agg(F.sum("new_span").cast("int").alias("n_spans"))
    )
    tokens = base.select(
        F.col(id_col), F.posexplode("toks").alias("pos0", "tok")
    ).select(id_col, (F.col("pos0") + 1).alias("pos"), "tok")
    kept = tokens.join(covered, [id_col, "pos"], "left_anti")
    clean = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda x: x["tok"],
            ),
            " ",
        ).alias("text_clean")
    )
    return (
        base.select(id_col, "n_tokens")
        .join(removed, id_col, "left")
        .join(spans, id_col, "left")
        .join(clean, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            F.coalesce("n_removed", F.lit(0)).cast("int").alias("n_removed"),
            F.coalesce("n_spans", F.lit(0)).cast("int").alias("n_spans"),
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
        )
    )


def keep_best_per_component(
    components: DataFrame,
    quality: DataFrame,
    id_col: str = "doc_id",
    comp_col: str = "comp",
    order_by: list | None = None,
) -> DataFrame:
    """Quality-keyed canonical selection within near-dup components —
    the RefinedWeb refinement of keep-one: min-id keep-one (the
    :func:`connected_components` default) throws away the most useful
    copy whenever a dup cluster mixes a full page with truncated or
    boilerplate-wrapped mirrors; production pipelines keep the LONGEST
    (or highest-scoring) member instead.

    ``order_by`` ranks members best-first (e.g. ``[F.desc("n_chars")]``);
    the ascending id is always appended so the choice is total and
    engine-identical. Output: (id, comp, quality columns…, is_best).

    Scale shape: one id-keyed equi join (components ⋈ quality — both
    corpus-keyed, co-partitionable) and one ``partitionBy(comp)``
    window — component sizes are dup-cluster sizes, bounded by the
    upstream bucket caps, never a global window.
    """
    ob = list(order_by or []) + [F.asc(id_col)]
    j = components.select(id_col, comp_col).join(quality, id_col)
    w = Window.partitionBy(comp_col).orderBy(*ob)
    return j.withColumn("is_best", F.row_number().over(w) == F.lit(1))


def sorted_neighborhood_pairs(
    df: DataFrame,
    sort_key,
    window: int = 5,
    id_col: str = "doc_id",
) -> DataFrame:
    """Sorted-neighborhood blocking (Hernández–Stolfo SNM): sort the
    corpus by a fuzzy key and emit every pair within ``window``
    positions — the classic entity-resolution candidate generator for
    near-dups that hashing CAN'T block (truncated mirrors, prefix edits:
    a doc cut mid-sentence shares no LSH bucket with its source but
    sorts adjacent to it on a text-prefix key). Complements the
    MinHash/SimHash family: SNM recall comes from sort locality, theirs
    from signature collision; production ER runs both and unions the
    candidate sets.

    ``sort_key`` is any deterministic Column (e.g.
    ``F.lower(F.substring("text", 1, 40))``); the ascending id is
    appended so the order is total and engine-identical. Output:
    ``(id_a, id_b, rank_a, rank_b)`` with ``rank_a < rank_b <=
    rank_a + window`` — all integers, exact on any engine.

    Scale shape: positions come from the engine's two-phase
    :func:`..frontier.global_rank` (range repartition + broadcast
    offsets — never a single-partition window), then neighbors meet
    through an equi join on the rank BLOCK ``floor((rank-1)/window)``:
    each row probes its own block and its predecessor block, so every
    within-``window`` pair shares a join key, the join fan-in per key is
    <= 2·window rows, and — because ranks are a permutation — the block
    key is perfectly uniform: the one shuffle in the plan is skew-free
    by construction (the rare blocking key whose duplicates would
    hot-spot a sort-merge join never becomes a join key here). Output
    size is <= window·N rows, linear in the corpus.
    """
    from .frontier import global_rank

    w = int(window)
    ranked = global_rank(
        df.select(sort_key.alias("_snm_key"), F.col(id_col)),
        rank_col="_rank",
        order_by=[F.col("_snm_key").asc(), F.col(id_col).asc()],
    ).select(
        F.col(id_col),
        F.col("_rank"),
        F.floor((F.col("_rank") - 1) / F.lit(w)).alias("_blk"),
    )
    probe = ranked.select(
        F.col(id_col).alias("id_b"),
        F.col("_rank").alias("rank_b"),
        F.explode(
            F.array(F.col("_blk"), F.col("_blk") - 1)
        ).alias("_blk"),
    )
    return (
        ranked.select(
            F.col(id_col).alias("id_a"),
            F.col("_rank").alias("rank_a"),
            "_blk",
        )
        .join(probe, "_blk")
        .filter(
            (F.col("rank_b") > F.col("rank_a"))
            & (F.col("rank_b") <= F.col("rank_a") + w)
        )
        .select(
            "id_a",
            "id_b",
            F.col("rank_a").cast("bigint").alias("rank_a"),
            F.col("rank_b").cast("bigint").alias("rank_b"),
        )
    )


def winnow_clone_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 9,
    window: int = 4,
    min_shared: int = 2,
    max_fp_freq: int | None = None,
) -> DataFrame:
    """MOSS-style clone detection ACROSS the corpus: block on shared
    winnowing fingerprints (:func:`..textstats.winnow_fingerprints`) —
    the third blocking geometry next to MinHash (set overlap) and SNM
    (sort locality). Winnowing GUARANTEES any common substring of
    length ≥ k + window − 1 shares a selected fingerprint, so clone
    pairs with one long verbatim run are caught even when the rest of
    both docs differs completely (low Jaccard, different prefixes —
    both other blockings miss it).

    Per pair: ``n_shared`` distinct shared fingerprints and the
    coverage ratios ``share_a = n_shared/|fp(a)|`` (directional, like
    containment). ``min_shared ≥ 2`` suppresses single-hash
    coincidences; ``max_fp_freq`` drops fingerprints present in more
    than that many docs BEFORE pairing — the MOSS "too common to be
    interesting" rule: boilerplate fingerprints otherwise create
    quadratic hot buckets, and dropping them is a documented recall
    tradeoff on boilerplate-only overlap, not on real clone runs.

    Scale shape: fingerprint rows are corpus-linear (~2/(window+1) of
    k-gram count); the self-join is keyed BY fingerprint (bounded
    buckets under ``max_fp_freq``), then one (id_a, id_b) groupBy.
    Verify survivors with :func:`chargram_containment_pairs` — the
    standard two-stage block-then-verify recipe.
    """
    from .textstats import winnow_fingerprints

    fps = (
        winnow_fingerprints(df, text_col, id_col, k=k, window=window)
        .select(id_col, "fp")
        .distinct()
        .persist()
    )
    if max_fp_freq is not None:
        freq = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("_df"))
        kept = freq.filter(F.col("_df") <= int(max_fp_freq)).select("fp")
        fps = fps.join(kept, "fp", "left_semi")
    sizes = fps.groupBy(id_col).agg(F.count(F.lit(1)).alias("_nfp"))
    a = fps.select(F.col(id_col).alias("id_a"), "fp")
    b = fps.select(F.col(id_col).alias("id_b"), "fp")
    shared = (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= int(min_shared))
    )
    sa = sizes.withColumnRenamed(id_col, "id_a").withColumnRenamed(
        "_nfp", "_na"
    )
    sb = sizes.withColumnRenamed(id_col, "id_b").withColumnRenamed(
        "_nfp", "_nb"
    )
    return (
        shared.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.col("n_shared").cast("bigint").alias("n_shared"),
            F.round(F.col("n_shared") / F.col("_na"), 6).alias("share_a"),
            F.round(F.col("n_shared") / F.col("_nb"), 6).alias("share_b"),
        )
    )


def multi_block_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    snm_window: int = 5,
    winnow_min_shared: int = 3,
    winnow_max_fp_freq: int = 5,
    jaccard_min: float = 0.5,
    containment_min: float = 0.8,
) -> DataFrame:
    """The multi-pass ER recipe as ONE operator: union three blocking
    geometries with DISJOINT blind spots — exact content hash (md5
    identity), sorted-neighborhood locality (prefix edits/truncations),
    and winnowing fingerprints (one long verbatim run inside otherwise
    different docs) — then verify every candidate with exact char-gram
    similarity and issue the final duplicate verdict:

        ``is_dup = exact OR jaccard ≥ jaccard_min OR
                   max(containment) ≥ containment_min``

    Each source column survives to the output (``src_exact``,
    ``src_snm``, ``src_winnow``), so the corpus report can answer
    "which geometry found what" — the measurement that justifies
    running all three at 100 TB.

    Scale shape: a union of the three generators' own audited shapes
    (md5-key groupBy; rank-block equi join; capped fp self-join), one
    distinct on the union (pair-keyed), then the candidate-only gram
    verify. No stage is new; the composition adds one pair-keyed
    shuffle for the union-distinct.
    """
    t = F.col(text_col)
    # exact: same md5 → pair each doc with the group's min id (star,
    # not quadratic — the curate_corpus exact-dup convention)
    w = Window.partitionBy(F.md5(t))
    exact = (
        df.select(
            F.min(F.col(id_col)).over(w).alias("id_a"),
            F.col(id_col).alias("id_b"),
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("_src", F.lit("exact"))
    )
    snm = (
        sorted_neighborhood_pairs(
            df,
            sort_key=F.lower(F.substring(text_col, 1, 40)),
            window=snm_window,
            id_col=id_col,
        )
        .select("id_a", "id_b")
        .withColumn("_src", F.lit("snm"))
    )
    winnow = (
        winnow_clone_pairs(
            df,
            text_col=text_col,
            id_col=id_col,
            min_shared=winnow_min_shared,
            max_fp_freq=winnow_max_fp_freq,
        )
        .select("id_a", "id_b")
        .withColumn("_src", F.lit("winnow"))
    )
    cands = (
        exact.unionByName(snm)
        .unionByName(winnow)
        .groupBy("id_a", "id_b")
        .agg(
            F.max(F.col("_src") == "exact").alias("src_exact"),
            F.max(F.col("_src") == "snm").alias("src_snm"),
            F.max(F.col("_src") == "winnow").alias("src_winnow"),
        )
        .persist()
    )
    scored = chargram_containment_pairs(
        df, cands.select("id_a", "id_b"), text_col=text_col,
        id_col=id_col, n=9, stride=3,
    )
    return (
        cands.join(scored, ["id_a", "id_b"])
        .select(
            "id_a",
            "id_b",
            "src_exact",
            "src_snm",
            "src_winnow",
            F.round("jaccard", 6).alias("jaccard"),
            F.round("containment_a", 6).alias("containment_a"),
            F.round("containment_b", 6).alias("containment_b"),
            (
                F.col("src_exact")
                | (F.col("jaccard") >= float(jaccard_min))
                | (F.col("containment_a") >= float(containment_min))
                | (F.col("containment_b") >= float(containment_min))
            ).alias("is_dup"),
        )
    )
