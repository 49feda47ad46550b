"""Vectorized Bloom filter for larger-than-broadcast referential indexes.

The orphan check (north_rule referential resolution) broadcasts the
conversations-index key set; at 10^12-turn scale that set is ~10^9 ids and a
sorted-array broadcast stops fitting comfortably. A Bloom filter keeps the
broadcast payload ~1.2 GB/10^9 keys at 1% FPP, with one-sided error in the
SAFE direction: a flagged orphan is definitely absent from the index (no
false accusations); a false positive merely lets an orphan through with
probability fpp (tunable). Same ``ray.put`` + vectorized-probe seam as the
sorted array (stages/keyspace.py).
"""

from __future__ import annotations

import math

import numpy as np

from .hashing import hash_strings, splitmix64

_U64 = np.uint64


class BloomFilter:
    __slots__ = ("m_bits", "k", "bits")

    def __init__(self, n_items: int, fpp: float = 0.01):
        n_items = max(n_items, 1)
        m = int(-n_items * math.log(fpp) / (math.log(2) ** 2))
        self.m_bits = max(64, m)
        self.k = max(1, round(self.m_bits / n_items * math.log(2)))
        self.bits = np.zeros((self.m_bits + 7) // 8, dtype=np.uint8)

    def _positions(self, base: np.ndarray, i: int) -> np.ndarray:
        with np.errstate(over="ignore"):
            return (splitmix64(base ^ _U64(0x9E37 + i * 0x85EB)) % _U64(self.m_bits)).astype(np.int64)

    def add_hashes(self, base: np.ndarray) -> None:
        for i in range(self.k):
            idx = self._positions(base, i)
            np.bitwise_or.at(self.bits, idx >> 3, (1 << (idx & 7)).astype(np.uint8))

    def contains_hashes(self, base: np.ndarray) -> np.ndarray:
        out = np.ones(len(base), dtype=bool)
        for i in range(self.k):
            idx = self._positions(base, i)
            out &= (self.bits[idx >> 3] >> (idx & 7) & 1).astype(bool)
        return out

    @classmethod
    def from_strings(cls, values, fpp: float = 0.01) -> "BloomFilter":
        arr = np.asarray(list(values), dtype=object)
        bf = cls(len(arr), fpp)
        if len(arr):
            bf.add_hashes(hash_strings(arr))
        return bf

    def contains_strings(self, values) -> np.ndarray:
        arr = np.asarray(values, dtype=object)
        if not len(arr):
            return np.zeros(0, dtype=bool)
        return self.contains_hashes(hash_strings(arr))


class ShardedBloom:
    """Bloom filter split into hash-routed shards — the build shape for
    10^9+-id indexes. A monolithic distributed build must size EVERY
    per-block partial to the total id count (OR-merge requires identical
    params), so worker memory and driver ingress scale as
    n_blocks × full-filter-size. Sharding routes each id to
    ``hash % n_shards`` first (one 8-byte/row shuffle), each shard's
    filter is sized for ~n/S items (megabytes, not gigabytes, per task),
    and the driver receives each shard's bits exactly once — total
    transfer = one filter, independent of block count.

    Probe cost is identical (same k bit tests, inside the routed shard);
    the FPP math is unchanged because ids distribute uniformly over shards
    by the same 64-bit hash used for membership."""

    __slots__ = ("n_shards", "shards")

    def __init__(self, shards: list):
        self.n_shards = len(shards)
        self.shards = shards

    def contains_hashes(self, base: np.ndarray) -> np.ndarray:
        out = np.zeros(len(base), dtype=bool)
        sid = (base % _U64(self.n_shards)).astype(np.int64)
        for s, bf in enumerate(self.shards):
            m = sid == s
            if m.any():
                out[m] = bf.contains_hashes(base[m])
        return out

    def contains_strings(self, values) -> np.ndarray:
        arr = np.asarray(values, dtype=object)
        if not len(arr):
            return np.zeros(0, dtype=bool)
        return self.contains_hashes(hash_strings(arr))
