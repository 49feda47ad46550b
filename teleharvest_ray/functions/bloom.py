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


def build_bloom_from_hashes(
    hashed,
    n_total: int,
    fpp: float = 0.01,
    shard_threshold: int = 5_000_000,
):
    """Distributed Bloom build over a Dataset with one column ``h`` — 64-bit
    key hashes stored as int64. The shared core of the orphan-index build
    (stages/keyspace.py) and the Bloom-prefiltered join (stages/joins.py).

    Up to ``shard_threshold`` keys: each BLOCK builds a partial filter with
    identical ``(n_total, fpp)`` params (bit arrays OR-merge associatively —
    the sketch-merge shape) and the driver folds the streamed partials; peak
    driver memory = two bit arrays. Above it: hashes are routed to shards
    (ONE 8-byte/row groupby shuffle), each shard's filter is sized for
    ~n/S items, and the driver receives each shard's bits exactly once —
    per-task memory and total driver ingress stay shard-sized instead of
    n_blocks x full-filter-size. Returns :class:`BloomFilter` or
    :class:`ShardedBloom` (same ``contains_hashes`` probe)."""
    import pandas as pd
    import pyarrow as pa

    if n_total == 0:
        return BloomFilter(n_total, fpp)

    if n_total > shard_threshold:
        n_shards = int(min(256, n_total // shard_threshold + 1))
        per_shard = n_total // n_shards + 1

        def add_shard(tbl: pa.Table) -> pa.Table:
            h = tbl["h"].to_numpy(zero_copy_only=False).view(_U64)
            return pa.table(
                {"shard": pa.array((h % _U64(n_shards)).astype(np.int64)), "h": tbl["h"]}
            )

        def build_shard(g: pd.DataFrame) -> pd.DataFrame:
            bf = BloomFilter(per_shard, fpp)
            bf.add_hashes(g["h"].to_numpy().astype(np.int64).view(_U64))
            return pd.DataFrame(
                {"shard": [int(g["shard"].iloc[0])], "bits": [bf.bits.tobytes()]}
            )

        rows = (
            hashed.map_batches(add_shard, batch_format="pyarrow")
            .groupby("shard")
            .map_groups(build_shard, batch_format="pandas")
            .to_pandas()  # n_shards rows, one blob each
        )
        shards = [BloomFilter(per_shard, fpp) for _ in range(n_shards)]
        for sid, blob in zip(rows["shard"], rows["bits"]):
            shards[int(sid)].bits = np.frombuffer(blob, dtype=np.uint8).copy()
        return ShardedBloom(shards)

    final = BloomFilter(n_total, fpp)

    def partial(tbl: pa.Table) -> pa.Table:
        bf = BloomFilter(n_total, fpp)  # identical params in every task
        bf.add_hashes(tbl["h"].to_numpy(zero_copy_only=False).view(_U64))
        return pa.table({"bits": pa.array([bf.bits.tobytes()], pa.binary())})

    parts = hashed.map_batches(partial, batch_format="pyarrow", batch_size=None)
    for b in parts.iter_batches(batch_size=1, batch_format="pyarrow"):
        for blob in b["bits"].to_pylist():
            np.bitwise_or(final.bits, np.frombuffer(blob, dtype=np.uint8), out=final.bits)
    return final
