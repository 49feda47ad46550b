"""Join strategies: broadcast, bucketed hash join, anti/semi join.

The reference's only joins are a broadcast nested-loop max-cosine (J1,
``processor.py:140-143``) and PK point lookups (J2, ``models/message.py:
143-159``); at scale these become the three strategies here (SURVEY.md §2.4,
ray_guide joins section):

- **broadcast_join**: small side shipped once via ``ray.put``, pandas merge
  per batch — no shuffle. The right choice for dimension tables.
- **bucketed_hash_join**: both sides large — tag each side, add
  ``bucket = hash(key) % B``, union, ONE groupby(bucket) shuffle, join the
  two sides inside each bucket. Salt hot keys by raising B.
- **anti_join_keys**: broadcast sorted key array; vectorized searchsorted
  membership filter per batch (semi = keep matches, anti = keep misses).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset

from ..functions.arrays import member_mask
from ..functions.hashing import hash_strings, splitmix64


def _key_hash(values: np.ndarray) -> np.ndarray:
    if values.dtype.kind in ("i", "u"):
        return splitmix64(values.astype(np.int64).view(np.uint64))
    return hash_strings(values.astype(object))


def broadcast_join(
    big: Dataset, small: pd.DataFrame, on: str, how: str = "inner", suffix: str = "_r"
) -> Dataset:
    """Broadcast the small side once; pandas merge per batch."""
    small_ref = ray.put(small)

    def per_batch(batch: pd.DataFrame) -> pd.DataFrame:
        sm = ray.get(small_ref)
        return batch.merge(sm, on=on, how=how, suffixes=("", suffix))

    return big.map_batches(per_batch, batch_format="pandas")


def bucketed_hash_join(
    left: Dataset,
    right: Dataset,
    on: str,
    n_buckets: int = 64,
    how: str = "inner",
) -> Dataset:
    """Partitioned hash join via union + one groupby(bucket) shuffle.

    The two sides have different schemas, so each batch is reindexed to the
    union column set (missing side's columns = NA) before the union — Ray
    blocks must share one schema across the unioned stream."""
    lcols = list(left.schema().names)
    rcols = list(right.schema().names)
    all_cols = lcols + [c for c in rcols if c not in lcols]

    def tag(side: str):
        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            batch = batch.reindex(columns=all_cols)
            batch["__side"] = side
            batch["__bucket"] = (_key_hash(batch[on].to_numpy()) % np.uint64(n_buckets)).astype(np.int32)
            return batch

        return fn

    lt = left.map_batches(tag("l"), batch_format="pandas")
    rt = right.map_batches(tag("r"), batch_format="pandas")
    both = lt.union(rt)

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["__side"] == "l"][lcols]
        r = g[g["__side"] == "r"][rcols]
        return l.merge(r, on=on, how=how, suffixes=("", "_r"))

    return both.groupby("__bucket").map_groups(join_bucket, batch_format="pandas")


def anti_join_keys(big: Dataset, keys: np.ndarray, on: str, anti: bool = True) -> Dataset:
    """Anti (or semi) join against a broadcast key set — referential
    orphan detection (north_rule; the orphan_conv seam)."""
    ks = np.sort(np.asarray(keys))
    ref = ray.put(ks)

    def per_batch(tbl: pa.Table) -> pa.Table:
        k = ray.get(ref)
        vals = tbl[on].to_numpy(zero_copy_only=False)
        member = member_mask(k, vals)
        keep = ~member if anti else member
        return tbl.filter(pa.array(keep))

    return big.map_batches(per_batch, batch_format="pyarrow")
