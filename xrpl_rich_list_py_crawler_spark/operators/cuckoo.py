"""Cuckoo-filter fallback for the URL-seen set (supports deletion).

The bloom shards (operators/seen.py) cannot delete — but forced re-crawl
("fetch this URL again next round") needs to remove keys from the seen
pre-filter. A cuckoo filter stores short fingerprints in two candidate
buckets and supports delete with the same one-sided error as bloom:
``contains`` may false-positive (repaired by the exact ledger anti-join),
never false-negative while the key is present.

Pure-numpy bitset per shard, same shard alignment (``pmod(url_hash, N)``)
and the same broadcast-probe pattern as BloomShards, so CrawlRun can swap
it in via ``anti_join_seen_cuckoo``. Public algorithm (Fan et al., CoNEXT
2014 — partial-key cuckoo hashing).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_FP_BITS = 16
_BUCKET_SLOTS = 4
_MAX_KICKS = 500
_MIX = np.uint64(0x9E3779B97F4A7C15)


def _fingerprint(h: np.ndarray) -> np.ndarray:
    """16-bit nonzero fingerprint from the high bits."""
    fp = ((h.astype(np.uint64) >> np.uint64(48)) & np.uint64(0xFFFF)).astype(
        np.uint16
    )
    fp[fp == 0] = 1
    return fp


def _index1(h: np.ndarray, n_buckets: int) -> np.ndarray:
    return (h.astype(np.uint64) % np.uint64(n_buckets)).astype(np.int64)


def _alt_index(i: np.ndarray, fp: np.ndarray, n_buckets: int) -> np.ndarray:
    """i2 = i1 XOR hash(fp) — the partial-key cuckoo displacement."""
    fph = (fp.astype(np.uint64) * _MIX) & np.uint64(0xFFFFFFFFFFFFFFFF)
    return ((i.astype(np.uint64) ^ fph) % np.uint64(n_buckets)).astype(np.int64)


class CuckooFilter:
    """Single-shard cuckoo filter over int64 keys."""

    def __init__(self, capacity: int):
        n_buckets = max(16, int(capacity / _BUCKET_SLOTS / 0.9))
        self.n_buckets = 1 << int(np.ceil(np.log2(n_buckets)))
        self.table = np.zeros((self.n_buckets, _BUCKET_SLOTS), dtype=np.uint16)
        self.n_keys = 0
        self._rng = np.random.RandomState(42)  # kick choice; determinism ban

    # -- single-key ops (driver/test side) ----------------------------------

    def _slots(self, h: int) -> tuple[int, int, int]:
        arr = np.array([h], dtype=np.int64)
        fp = int(_fingerprint(arr)[0])
        i1 = int(_index1(arr, self.n_buckets)[0])
        i2 = int(_alt_index(np.array([i1]), np.array([fp], dtype=np.uint16),
                            self.n_buckets)[0])
        return fp, i1, i2

    def add(self, h: int) -> bool:
        fp, i1, i2 = self._slots(h)
        for i in (i1, i2):
            empty = np.where(self.table[i] == 0)[0]
            if len(empty):
                self.table[i, empty[0]] = fp
                self.n_keys += 1
                return True
        # displace: deterministic kick sequence (seeded)
        i = i1
        cur = np.uint16(fp)
        for _ in range(_MAX_KICKS):
            slot = int(self._rng.randint(_BUCKET_SLOTS))
            cur, self.table[i, slot] = self.table[i, slot], cur
            i = int(
                _alt_index(np.array([i]), np.array([cur], dtype=np.uint16),
                           self.n_buckets)[0]
            )
            empty = np.where(self.table[i] == 0)[0]
            if len(empty):
                self.table[i, empty[0]] = cur
                self.n_keys += 1
                return True
        raise RuntimeError("cuckoo filter full — resize and rebuild")

    def delete(self, h: int) -> bool:
        fp, i1, i2 = self._slots(h)
        for i in (i1, i2):
            hit = np.where(self.table[i] == fp)[0]
            if len(hit):
                self.table[i, hit[0]] = 0
                self.n_keys -= 1
                return True
        return False

    def contains(self, h: int) -> bool:
        fp, i1, i2 = self._slots(h)
        return bool((self.table[i1] == fp).any() or (self.table[i2] == fp).any())

    # -- vectorized probe (executor side) ------------------------------------

    def maybe_contains(self, hashes: np.ndarray) -> np.ndarray:
        h = hashes.astype(np.int64)
        fp = _fingerprint(h)
        i1 = _index1(h, self.n_buckets)
        i2 = _alt_index(i1, fp, self.n_buckets)
        in1 = (self.table[i1] == fp[:, None]).any(axis=1)
        in2 = (self.table[i2] == fp[:, None]).any(axis=1)
        return in1 | in2


@dataclass
class CuckooShards:
    """Broadcastable bundle: shard id → CuckooFilter (same alignment as
    BloomShards)."""

    n_shards: int
    shards: dict[int, CuckooFilter] = field(default_factory=dict)

    def maybe_contains(self, hashes: np.ndarray) -> np.ndarray:
        out = np.zeros(len(hashes), dtype=bool)
        if not len(hashes):
            return out
        h = hashes.astype(np.int64)
        sids = np.mod(h, self.n_shards)
        for sid in np.unique(sids):
            filt = self.shards.get(int(sid))
            if filt is None:
                continue
            mask = sids == sid
            out[mask] = filt.maybe_contains(h[mask])
        return out

    def add_hashes(self, hashes: np.ndarray) -> None:
        h = hashes.astype(np.int64)
        sids = np.mod(h, self.n_shards)
        for hh, sid in zip(h.tolist(), sids.tolist()):
            self.shards.setdefault(
                int(sid), CuckooFilter(capacity=1 << 14)
            ).add(int(hh))

    def delete_hashes(self, hashes: np.ndarray) -> int:
        h = hashes.astype(np.int64)
        sids = np.mod(h, self.n_shards)
        n = 0
        for hh, sid in zip(h.tolist(), sids.tolist()):
            filt = self.shards.get(int(sid))
            if filt is not None and filt.delete(int(hh)):
                n += 1
        return n


def build_cuckoo_shards(
    seen: DataFrame, n_shards: int = 32, capacity_per_shard: int = 1 << 16
) -> CuckooShards:
    """Executor-side build via applyInPandas (one shard per Arrow group),
    collecting only the fingerprint tables — same pattern as
    build_bloom_shards."""

    def _build(pdf: pd.DataFrame) -> pd.DataFrame:
        filt = CuckooFilter(capacity=max(capacity_per_shard, len(pdf) * 2))
        for hh in pdf["url_hash"].to_numpy():
            filt.add(int(hh))
        return pd.DataFrame(
            {
                "shard": [int(pdf["shard"].iloc[0])],
                "n_buckets": [filt.n_buckets],
                "table": [filt.table.tobytes()],
            }
        )

    built = (
        seen.select("url_hash", F.pmod("url_hash", F.lit(n_shards)).alias("shard"))
        .groupBy("shard")
        .applyInPandas(_build, "shard int, n_buckets long, table binary")
        .collect()
    )
    out = CuckooShards(n_shards=n_shards)
    for r in built:
        filt = CuckooFilter.__new__(CuckooFilter)
        filt.n_buckets = r["n_buckets"]
        filt.table = np.frombuffer(bytes(r["table"]), dtype=np.uint16).reshape(
            r["n_buckets"], _BUCKET_SLOTS
        ).copy()
        filt.n_keys = int((filt.table != 0).sum())
        filt._rng = np.random.RandomState(42)
        out.shards[r["shard"]] = filt
    return out


def anti_join_seen_cuckoo(
    spark: SparkSession,
    candidates: DataFrame,
    seen: DataFrame | None,
    shards: CuckooShards | None = None,
    n_shards: int = 32,
) -> DataFrame:
    """Cuckoo pre-filter + exact repair — ≡ anti_join_seen, like the bloom
    variant, but the filter supports key deletion for forced re-crawl."""
    from .seen import anti_join_seen

    if seen is None:
        return candidates
    if shards is None:
        shards = build_cuckoo_shards(seen, n_shards=n_shards)
    bc = spark.sparkContext.broadcast(shards)

    @F.pandas_udf("boolean")
    def _maybe_seen(h: pd.Series) -> pd.Series:
        return pd.Series(bc.value.maybe_contains(h.to_numpy()))

    flagged = candidates.withColumn("_maybe", _maybe_seen("url_hash"))
    clean = flagged.filter(~F.col("_maybe")).drop("_maybe")
    suspect = flagged.filter(F.col("_maybe")).drop("_maybe")
    return clean.unionByName(anti_join_seen(suspect, seen))
