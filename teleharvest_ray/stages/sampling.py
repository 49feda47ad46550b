"""Deterministic sampling and dataset splitting.

A training-data pipeline needs reproducible corpus subsetting: train/val/test
splits that are STABLE under re-runs, repartitioning and appends (a doc's
split must depend only on its key, never on row order or worker count), plus
bounded uniform samples for eval sets. Three operators, all streaming:

- :func:`hash_split` — key-hash split assignment (the industry-standard
  deterministic split: hash(key) mod 10^6 against cumulative fraction
  boundaries). Order/partitioning-independent by construction.
- :func:`bernoulli_sample` — per-row keep decision from the same keyed hash
  (p fraction), one pruned streaming pass, no shuffle.
- :func:`reservoir_sample` — exact-size uniform sample without replacement:
  per-block reservoirs with block weights merged in one driver step over
  block-level candidates (k × n_blocks rows — candidate-sized, never data).

The reference has no sampling surface (it processes every fetched row,
``processor.py:76``); these extend SURVEY §2 the same way the dedup toolkit
does — capabilities the 100 TB target needs that the reference's scale never
did.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from ..functions.hashing import hash_strings, splitmix64

_RES = np.uint64(1_000_000)  # split-boundary resolution


_NULL_KEY_MIX = np.uint64(0x9E3779B97F4A7C15)


def _key_hash_u64(col: pa.ChunkedArray | pa.Array, seed: int) -> np.ndarray:
    """Keyed 64-bit hash of a key column, STABLE under block layout: the
    int-vs-string dispatch reads the ARROW type, never the materialized
    numpy dtype — an int column with one null in a block must not reroute
    the whole block through float64 stringification (which would make a
    key's hash depend on which rows share its block). Null keys map to one
    deterministic seeded constant."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    import pyarrow.compute as pc

    nulls = pc.is_null(col).to_numpy(zero_copy_only=False)
    if pa.types.is_integer(col.type):
        filled = pc.fill_null(col.cast(pa.int64()), 0).to_numpy(zero_copy_only=False)
        with np.errstate(over="ignore"):
            h = splitmix64(filled.astype(np.int64).view(np.uint64) ^ np.uint64(seed))
    else:
        vals = np.asarray(col.to_pandas(), dtype=object)
        vals = np.where(nulls, "", vals)
        with np.errstate(over="ignore"):
            h = splitmix64(hash_strings(vals) ^ np.uint64(seed))
    if nulls.any():
        with np.errstate(over="ignore"):
            h[nulls] = splitmix64(np.uint64(seed) ^ _NULL_KEY_MIX)
    return h


def hash_split(
    ds: Dataset,
    key_col: str,
    fractions: dict[str, float],
    seed: int = 97,
) -> Dataset:
    """Append a ``split`` column: deterministic assignment by keyed hash.

    ``fractions`` maps split name → fraction (must sum to ~1). Every row with
    the same key lands in the same split, on any cluster size, in any order —
    and an appended row joins its split without reshuffling anything."""
    names = list(fractions)
    bounds = np.cumsum([fractions[n] for n in names])
    if not np.isclose(bounds[-1], 1.0):
        raise ValueError(f"fractions must sum to 1, got {bounds[-1]}")
    # rint, not truncation — every sampling cut in this module (and the SQL
    # oracle generators) derives as round(fraction * RES) so the same
    # fraction always maps to the same integer cut everywhere
    edges = np.rint(bounds * float(_RES)).astype(np.uint64)
    edges[-1] = _RES  # close the last bucket against float rounding
    names_arr = np.asarray(names, dtype=object)

    def assign(tbl: pa.Table) -> pa.Table:
        h = _key_hash_u64(tbl[key_col], seed) % _RES
        idx = np.searchsorted(edges, h, side="right")
        return tbl.append_column("split", pa.array(names_arr[idx], pa.string()))

    return ds.map_batches(assign, batch_format="pyarrow")


def bernoulli_sample(ds: Dataset, key_col: str, p: float, seed: int = 131) -> Dataset:
    """Keep each row iff its keyed hash falls under ``p`` — a deterministic,
    shuffle-free streaming sample (same row always makes the same decision).
    The cut rounds (like every other sampling site) so the same ``p`` maps to
    the same integer cut as stratified_sample and the SQL oracles."""
    cut = np.uint64(round(p * float(_RES)))

    def keep(tbl: pa.Table) -> pa.Table:
        h = _key_hash_u64(tbl[key_col], seed) % _RES
        return tbl.filter(pa.array(h < cut))

    return ds.map_batches(keep, batch_format="pyarrow")


def stratified_sample(
    ds: Dataset,
    stratum_col: str,
    key_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    seed: int = 131,
) -> Dataset:
    """Per-stratum deterministic Bernoulli sample: a row is kept iff its
    keyed hash falls under its stratum's rate. Shuffle-free and
    order/partitioning-independent (the decision depends only on the row's
    key and stratum), so rebalancing a skewed corpus — downsample the
    dominant class, keep the rare one whole — is a single streaming map that
    stays stable under appends and re-runs.

    Strata resolve through the batch's dictionary encoding: one small
    value→cut LUT per batch (built over the handful of distinct strata, not
    the rows) and a vectorized gather — no per-row dict lookups. Unknown or
    null strata fall back to ``default_rate``.
    """
    import pyarrow.compute as pc

    # round (not truncate) so a rate expressed as cut/1e6 round-trips to the
    # same integer cut — callers that derive cuts externally (temperature
    # sampling's floor(sqrt(...)*1e6) and the SQL oracles) stay bit-exact
    cuts = {k: np.uint64(min(round(r * float(_RES)), int(_RES))) for k, r in rates.items()}
    dflt = np.uint64(min(round(default_rate * float(_RES)), int(_RES)))

    def keep(tbl: pa.Table) -> pa.Table:
        h = _key_hash_u64(tbl[key_col], seed) % _RES
        col = tbl[stratum_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        enc = col if pa.types.is_dictionary(col.type) else pc.dictionary_encode(col)
        vals = enc.dictionary.to_pylist()
        lut = np.array([cuts.get(v, dflt) for v in vals] + [dflt], dtype=np.uint64)
        idx = (
            pc.fill_null(enc.indices, len(vals))
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        return tbl.filter(pa.array(h < lut[idx]))

    return ds.map_batches(keep, batch_format="pyarrow")


def reservoir_sample(ds: Dataset, key_col: str, k: int, seed: int = 211) -> pd.DataFrame:
    """Exact uniform k-sample of distinct keys, deterministic given seed.

    Keyed priority sampling (bottom-k equivalence): each row's priority is
    its keyed hash, so the global bottom-k is a uniform sample of keys AND
    the selection is independent of row order, block layout, and worker
    count — no per-block RNG state to collide. Each block emits only its
    local bottom-k; the driver merge sees ≤ k × n_blocks candidate rows.
    Keys must be unique (a duplicated key would enter together with all its
    copies — run key dedup first)."""

    def local_bottomk(tbl: pa.Table) -> pa.Table:
        n = tbl.num_rows
        if n == 0:
            return tbl.append_column("__prio", pa.array([], pa.uint64()))
        prio = _key_hash_u64(tbl[key_col], seed)
        kk = min(k, n)
        keep = np.sort(np.argpartition(prio, kk - 1)[:kk])
        out = tbl.take(pa.array(keep))
        return out.append_column("__prio", pa.array(prio[keep]))

    cands = ds.map_batches(local_bottomk, batch_format="pyarrow").to_pandas()
    cands = cands.sort_values("__prio").head(k)
    return cands.drop(columns="__prio").reset_index(drop=True)


def pack_sequences(
    ds: Dataset,
    id_col: str,
    tokens_col: str,
    budget: int,
    shard_col: str = "shard_id",
) -> Dataset:
    """Pack rows into token-budget shards (training-batch packing),
    partition-local: each block packs its own rows with next-fit-decreasing
    and emits globally-unique shard ids ``<block_tag>-<local_shard>``.

    Packing is a prefix-dependent recurrence, so the per-block assignment is
    a scalar O(n) loop — deliberate: it runs INSIDE the distributed map (a
    few million rows/s per core, never on the driver), and blocks pack
    independently so the operator scales with partitions. Rows larger than
    the budget get a singleton shard (flagged downstream by their size).
    ``id_col`` must be a key: the 64-bit block tag folds the hashes of ALL
    the block's keys (never just the first row), so distinct blocks cannot
    collide short of a 2^-64 accident."""

    def pack(tbl: pa.Table) -> pa.Table:
        n = tbl.num_rows
        if n == 0:
            return tbl.append_column(shard_col, pa.array([], pa.string()))
        toks = tbl[tokens_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(-toks, kind="stable")  # next-fit-DECREASING
        shard_local = np.empty(n, dtype=np.int64)
        cur, used = 0, 0
        for i in order:
            t = int(toks[i])
            if used and used + t > budget:
                cur += 1
                used = 0
            shard_local[i] = cur
            used += t
        key_hashes = _key_hash_u64(tbl[id_col], seed=5)
        with np.errstate(over="ignore"):
            folded = np.array([np.bitwise_xor.reduce(key_hashes) ^ np.uint64(n)], dtype=np.uint64)
            block_tag = int(splitmix64(folded)[0])
        ids = np.array([f"{block_tag:016x}-{s}" for s in shard_local], dtype=object)
        return tbl.append_column(shard_col, pa.array(ids, pa.string()))

    return ds.map_batches(pack, batch_format="pyarrow")


def export_splits(ds: Dataset, key_col: str, fractions: dict[str, float], out_dir: str, seed: int = 97) -> dict:
    """Materialize a hash split as one hive-partitioned parquet directory per
    split (``out_dir/split=<name>/``) in ONE pass: the assigned stream writes
    with ``partition_cols``, so the corpus is read and hashed exactly once —
    a per-split filter loop would re-execute the upstream read per split."""
    assigned = hash_split(ds, key_col, fractions, seed)
    assigned.write_parquet(out_dir, partition_cols=["split"])
    return {"out_dir": out_dir, "splits": list(fractions)}


def weighted_sample(
    ds: Dataset,
    key_col: str,
    weight_col: str,
    k: int,
    seed: int = 11,
    keep: list[str] | None = None,
) -> pd.DataFrame:
    """Deterministic weighted sampling without replacement (the A-ES /
    Efraimidis-Spirakis scheme): each row's priority is ``u**(1/w)`` with
    ``u = splitmix64(key XOR seed) / 2**64``, and the global top-``k`` by
    priority IS the weighted sample — inclusion probability proportional to
    weight, reproducible across runs and partition layouts (pure function of
    key + seed, like the other keyed-hash samplers here).

    Distributed shape: each block reduces to its LOCAL top-k (argpartition,
    no sort of the block), so the driver sees at most n_blocks x k candidate
    rows — no shuffle, no data-sized collection. Power-of-two weights
    (1/2/4/8...) compute the fractional power as a chain of correctly-rounded
    ``sqrt`` calls, so priorities are BIT-IDENTICAL to SQL; other weights go
    through ``np.power`` (1-ulp platform variance possible — fine for
    sampling, not for a hash-exact oracle)."""
    keep = keep if keep is not None else [key_col, weight_col]

    def _priority(u: np.ndarray, w: np.ndarray) -> np.ndarray:
        out = np.empty_like(u)
        done = np.zeros(len(u), dtype=bool)
        for pow2 in (1, 2, 4, 8, 16):
            m = (w == pow2) & ~done
            if m.any():
                v = u[m]
                for _ in range(int(np.log2(pow2))):
                    v = np.sqrt(v)
                out[m] = v
                done |= m
        rest = ~done
        if rest.any():
            out[rest] = np.power(u[rest], 1.0 / w[rest])
        return out

    def local_topk(batch: pd.DataFrame) -> pd.DataFrame:
        h = _key_hash_u64(pa.Array.from_pandas(batch[key_col]), seed=seed)
        u = h.astype(np.float64) / 18446744073709551616.0  # / 2^64, exact scale
        w = batch[weight_col].to_numpy().astype(np.float64)
        pri = _priority(u, w)
        if len(batch) > k:
            idx = np.argpartition(-pri, k)[:k]
        else:
            idx = np.arange(len(batch))
        out = batch.iloc[idx][keep].copy()
        out["priority"] = pri[idx]
        return out

    cands = ds.map_batches(local_topk, batch_format="pandas", batch_size=None).to_pandas()
    cands = cands.sort_values(["priority", key_col], ascending=[False, True], kind="stable")
    return cands.head(k).reset_index(drop=True)
