"""Distributed global ordering: sample-based range partitioning, global rank
assignment, and sorted range-partitioned export.

Ray Data's ``Dataset.sort`` performs an opaque sample+shuffle; pipelines here
need the two things it doesn't expose: the GLOBAL RANK of each row (for
rank-sampled audits and percentile-exact checks) and a RESUMABLE sorted
export (one parquet file per key range, skip finished ranges on re-run — the
brief's partitioned-output contract). Both come from the same explicit
decomposition:

1. ``sample_boundaries`` — a small per-block evenly-spaced key sample is
   collected (sample-sized, never data-sized) and interior quantile cuts are
   taken from it.
2. ``range_tag`` — one streaming pass tags rows with ``searchsorted`` range
   ids. Equal keys always land in the SAME range (cut comparison is on the
   key alone), so tie-broken ordering is range-local.
3. Per-range kernels — ONE groupby shuffle co-locates each range; within a
   range a vectorized lexsort orders rows, and global ranks are the range's
   count-prefix offset plus the local position. Range counts are a tiny
   aggregate; their cumsum is the only driver-side state.

Partitioning assumption (documented per the brief): a single range fits in
one task's memory — raise ``n_ranges`` for bigger inputs. Boundary quality
affects only balance, never correctness: ranks are exact for ANY cut
placement.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset
from ray.data.aggregate import Count

from ..state.checkpoint import atomic_write_parquet


def sample_boundaries(ds: Dataset, key: str, n_ranges: int, per_block: int = 64) -> np.ndarray:
    """Interior cut points for ``n_ranges`` ranges from an evenly-spaced
    per-block key sample. Returns a sorted, deduplicated array of at most
    ``n_ranges - 1`` cuts (fewer when the key space is narrow)."""

    def pick(tbl: pa.Table) -> pa.Table:
        k = tbl[key].to_numpy(zero_copy_only=False)
        if not len(k):
            return pa.table({key: pa.array([], tbl.schema.field(key).type)})
        idx = np.linspace(0, len(k) - 1, min(per_block, len(k))).astype(np.int64)
        return pa.table({key: pa.array(k[idx])})

    s = np.sort(ds.map_batches(pick, batch_format="pyarrow").to_pandas()[key].to_numpy())
    if not len(s):
        return s[:0]
    cuts = s[np.linspace(0, len(s) - 1, n_ranges + 1).astype(np.int64)][1:-1]
    return np.unique(cuts)


def range_tag(ds: Dataset, key: str, bounds: np.ndarray) -> Dataset:
    """Append an ``__range`` id per row: ``searchsorted(bounds, key)``.
    Equal keys get equal range ids on every worker and every run."""

    def tag(tbl: pa.Table) -> pa.Table:
        k = tbl[key].to_numpy(zero_copy_only=False)
        r = np.searchsorted(bounds, k, side="right").astype(np.int32)
        return tbl.append_column("__range", pa.array(r))

    return ds.map_batches(tag, batch_format="pyarrow")


def _range_offsets(tagged: Dataset) -> dict[int, int]:
    """Global rank offset per range id from a tiny count aggregate."""
    counts = tagged.groupby("__range").aggregate(Count(alias_name="n")).to_pandas()
    counts = counts.sort_values("__range")
    offs = np.concatenate([[0], np.cumsum(counts.n.to_numpy())[:-1]])
    return dict(zip(counts["__range"].astype(int), offs.astype(int)))


def global_ranks(
    ds: Dataset,
    key: str,
    tiebreak: list[str],
    n_ranges: int = 64,
    keep: list[str] | None = None,
    every: int = 1,
) -> Dataset:
    """Exact global rank (1-based) of every row under
    ``ORDER BY key, *tiebreak``, distributed: range partition + per-range
    lexsort + count-prefix offsets. ``every`` > 1 emits only ranks with
    ``rank % every == 1`` (rank-sampled audit of a sorted order — the output
    stays driver-safe at any input size)."""
    keep = keep if keep is not None else [key, *tiebreak]
    bounds = sample_boundaries(ds, key, n_ranges)
    tagged = range_tag(ds, key, bounds).materialize()
    offsets = _range_offsets(tagged)
    off_ref = ray.put(offsets)
    cols = [key, *tiebreak]

    def per_range(g: pd.DataFrame) -> pd.DataFrame:
        offs = ray.get(off_ref)
        g = g.sort_values(cols, kind="stable").reset_index(drop=True)
        rank = np.arange(1, len(g) + 1, dtype=np.int64) + offs[int(g["__range"].iat[0])]
        g = g.assign(rk=rank)
        if every > 1:
            g = g[g.rk % every == 1]
        return g[["rk", *keep]]

    return tagged.groupby("__range").map_groups(per_range, batch_format="pandas")


def export_sorted_ranges(
    ds: Dataset,
    key: str,
    out_dir: str,
    n_ranges: int = 64,
    tiebreak: list[str] | None = None,
) -> pd.DataFrame:
    """Write ``ds`` as a globally sorted, range-partitioned parquet layout:
    one atomic file per key range (``range=NNNNN.parquet``), rows sorted
    within each file, file N's keys all <= file N+1's. A range whose file
    already exists is SKIPPED, so a killed export resumes with only
    unfinished ranges (resume assumes the INPUT is unchanged — the boundary
    sample is deterministic for identical input blocks, so range ids line
    up across runs; a changed input needs a fresh out_dir). Returns the
    manifest (range id, path, rows, key min/max)."""
    tiebreak = tiebreak or []
    os.makedirs(out_dir, exist_ok=True)
    bounds = sample_boundaries(ds, key, n_ranges)
    tagged = range_tag(ds, key, bounds)
    cols = [key, *tiebreak]

    def write_range(g: pd.DataFrame) -> pd.DataFrame:
        rid = int(g["__range"].iat[0])
        path = os.path.join(out_dir, f"range={rid:05d}.parquet")
        skipped = os.path.exists(path)
        g = g.sort_values(cols, kind="stable").drop(columns="__range")
        if not skipped:
            atomic_write_parquet(pa.Table.from_pandas(g, preserve_index=False), path)
        return pd.DataFrame(
            [
                {
                    "range_id": rid,
                    "path": path,
                    "rows": len(g),
                    "kmin": g[key].iloc[0],
                    "kmax": g[key].iloc[-1],
                    "skipped": skipped,
                }
            ]
        )

    man = tagged.groupby("__range").map_groups(write_range, batch_format="pandas").to_pandas()
    return man.sort_values("range_id").reset_index(drop=True)


def epoch_shuffle_ranks(
    ds: Dataset,
    key: str,
    seed: int,
    n_ranges: int = 64,
    every: int = 1,
) -> Dataset:
    """Deterministic seeded global permutation (the training-epoch shuffle):
    each row's position is its exact global rank under
    ``ORDER BY splitmix64(key XOR seed)``. Unlike ``ds.random_shuffle`` the
    permutation is a pure function of (key, seed) — reproducible across
    runs, cluster sizes, and partition layouts, and a different permutation
    per epoch by bumping ``seed``. Distributed with the same range-partition
    machinery as :func:`global_ranks` (one groupby shuffle, sample-sized
    driver state); ``every`` rank-samples the output for driver-safe audits
    of an arbitrarily large permutation."""
    from ..functions.hashing import splitmix64

    def h(tbl: pa.Table) -> pa.Table:
        k = tbl[key].to_numpy()
        if k.dtype.kind not in ("i", "u"):
            raise TypeError(f"epoch_shuffle_ranks needs an integer key, got {k.dtype}")
        x = splitmix64(k.astype(np.int64).view(np.uint64) ^ np.uint64(seed))
        return tbl.append_column("__h", pa.array(x, pa.uint64()))

    hashed = ds.map_batches(h, batch_format="pyarrow", batch_size=None)
    return global_ranks(
        hashed, "__h", tiebreak=[key], n_ranges=n_ranges, keep=[key], every=every
    )


def ntile_buckets(
    ds: Dataset,
    key: str,
    tiebreak: list[str],
    n_buckets: int,
    n_ranges: int = 32,
) -> Dataset:
    """Equi-depth discretization: every row tagged with its SQL-NTILE bucket
    under ``ORDER BY key, *tiebreak`` (first ``n % B`` buckets get
    ``ceil(n/B)`` rows, the rest ``floor(n/B)`` — exactly NTILE semantics).
    Built on :func:`global_ranks` (one range-partition shuffle); the rank
    stream is materialized once (narrow: rank + key) so the row count and
    the bucket tagging don't re-execute the sort. The usual consumer is a
    per-bucket aggregate (quantile-binned curriculum stats), which is
    n_buckets-sized."""
    ds = ds.materialize()
    if ds.count() == 0:
        # typed empty (global_ranks' boundary sampler needs at least one row)
        import ray.data as _rd

        sch = ds.schema()
        try:
            ktype = dict(zip(sch.names, sch.types))[key]
            kdtype = ktype.to_pandas_dtype() if isinstance(ktype, pa.DataType) else ktype
        except Exception:
            kdtype = "float64"
        # from_pandas, not from_arrow: a zero-row arrow block loses its
        # schema through this Ray version's to_pandas
        return _rd.from_pandas(
            pd.DataFrame(
                {
                    "rk": pd.Series(dtype="int64"),
                    key: pd.Series(dtype=kdtype),
                    "bucket": pd.Series(dtype="int64"),
                }
            )
        )
    ranks = global_ranks(ds, key, tiebreak, n_ranges=n_ranges, keep=[key]).materialize()
    n = ranks.count()
    q, r = divmod(n, n_buckets)

    def tag(tbl: pa.Table) -> pa.Table:
        rk = tbl["rk"].to_numpy()
        if q == 0:  # fewer rows than buckets: NTILE gives bucket = rank
            b = rk
        else:
            head = r * (q + 1)  # rows covered by the ceil-sized buckets
            b = np.where(rk <= head, (rk - 1) // (q + 1) + 1, r + (rk - head - 1) // q + 1)
        return tbl.append_column("bucket", pa.array(b.astype(np.int64), pa.int64()))

    return ranks.map_batches(tag, batch_format="pyarrow")


def _spread_bits2(x: np.ndarray) -> np.ndarray:
    """Insert a zero bit between each of the low 32 bits (uint64 in/out)."""
    m = np.uint64
    x = x & m(0xFFFFFFFF)
    x = (x | (x << m(16))) & m(0x0000FFFF0000FFFF)
    x = (x | (x << m(8))) & m(0x00FF00FF00FF00FF)
    x = (x | (x << m(4))) & m(0x0F0F0F0F0F0F0F0F)
    x = (x | (x << m(2))) & m(0x3333333333333333)
    x = (x | (x << m(1))) & m(0x5555555555555555)
    return x


def morton_interleave(ds: Dataset, cols: list[str], out_col: str = "zorder", bits: int = 21) -> Dataset:
    """Z-order (Morton) clustering key over two non-negative integer
    columns: bit-interleaved so rows close in BOTH dimensions sort near each
    other — the standard multi-column data-layout key (sort + range export
    on it gives locality-preserving files whose min/max footer stats prune
    scans on EITHER column). Pure per-batch bit arithmetic, no shuffle; feed
    the result to :func:`global_ranks` / :func:`export_sorted_ranges`.
    Inputs must fit ``bits`` bits (the interleaved key must fit int64);
    out-of-range values raise rather than silently aliasing. ``bits`` is
    capped at 31: the spread kernel reads 32 bits per input and the
    interleaved key must stay a non-negative int64, so bits > 31 would
    alias or sign-wrap silently — the contract this function refuses."""
    if len(cols) != 2:
        raise ValueError("morton_interleave takes exactly two columns")
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    lim = 1 << bits

    def add_z(tbl: pa.Table) -> pa.Table:
        a = tbl[cols[0]].to_numpy(zero_copy_only=False).astype(np.int64)
        b = tbl[cols[1]].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(a) and (a.min() < 0 or b.min() < 0 or a.max() >= lim or b.max() >= lim):
            raise ValueError(f"morton inputs must be in [0, 2^{bits})")
        z = _spread_bits2(a.view(np.uint64)) | (_spread_bits2(b.view(np.uint64)) << np.uint64(1))
        return tbl.append_column(out_col, pa.array(z.astype(np.int64), pa.int64()))

    return ds.map_batches(add_z, batch_format="pyarrow", batch_size=None)


def skyline_mask_2d(score: np.ndarray, cost: np.ndarray) -> np.ndarray:
    """Boolean mask of 2-D Pareto-optimal rows: maximize ``score``, minimize
    ``cost``. Row a is dominated iff some b has (score >= a.score AND
    cost <= a.cost) with at least one strict; ties on BOTH axes keep both
    rows. One lexsort + two vectorized prefix passes — no pairwise matrix.

    Distributed usage (q_pareto_front): a partition-local skyline is a sound
    prefilter (a globally undominated point is undominated in its
    partition), so map_batches(local mask) -> global mask over the
    candidate union gives the exact skyline with candidate-sized driver
    state — the standard two-phase distributed skyline."""
    n = len(score)
    if not n:
        return np.zeros(0, dtype=bool)
    order = np.lexsort((cost, -score))  # score desc, cost asc within
    s, c = score[order], cost[order]
    new_grp = np.r_[True, s[1:] != s[:-1]]
    grp_start = np.maximum.accumulate(np.where(new_grp, np.arange(n), 0))
    # min cost over all STRICTLY higher scores = running min up to the
    # previous group's end (exclusive prefix over group starts)
    run_min = np.minimum.accumulate(c)
    prev_end = grp_start - 1  # -1 for the first group
    min_higher = np.where(prev_end >= 0, run_min[np.maximum(prev_end, 0)], np.iinfo(np.int64).max)
    keep_sorted = (min_higher > c) & (c == c[grp_start])
    mask = np.zeros(n, dtype=bool)
    mask[order] = keep_sorted
    return mask
