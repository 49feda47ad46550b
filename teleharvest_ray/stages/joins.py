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


def _pandas_dtypes(ds: Dataset) -> dict:
    """Per-column pandas dtypes a dataset's Arrow schema converts to (via an
    empty table, so no data moves)."""
    sch = ds.schema()
    try:
        empty = pa.schema(zip(sch.names, sch.types)).empty_table().to_pandas()
        return {c: empty[c].dtype for c in empty.columns}
    except Exception:  # pandas-block schema (no Arrow types): no restore map
        return {}


#: target rows per join bucket when deriving n_buckets — small enough that a
#: bucket (both sides) fits comfortably in a worker's heap, large enough that
#: per-group overhead stays negligible
_ROWS_PER_BUCKET = 250_000


def _sentinel_fill(batch: pd.DataFrame, all_cols: list, dtypes: dict) -> pd.DataFrame:
    """Reindex ``batch`` to the union column set, filling the OTHER side's
    columns with dtype-true zeros rather than NaN. The filled cells are
    discarded after the per-bucket split (each side re-selects only its own
    columns), but a NaN fill would float64-promote int64 columns through the
    shuffle's concat and silently corrupt values above 2**53 when the astype
    restore rounds them back (doc/snowflake ids routinely exceed 2**53)."""
    n = len(batch)
    data = {}
    for c in all_cols:
        if c in batch.columns:
            data[c] = batch[c]
        else:
            dt = dtypes.get(c, np.dtype("O"))
            if dt == np.dtype("O"):
                data[c] = pd.Series([None] * n, dtype=object, index=batch.index)
            else:
                data[c] = pd.Series(np.zeros(n, dtype=dt), index=batch.index)
    return pd.DataFrame(data)


def _join_output_spec(left: Dataset, right: Dataset, on: str, how: str):
    """Shared column/dtype contract for the partitioned joins: column lists,
    per-side pandas dtypes, output column order (left cols + right cols with
    ``_r`` collision suffix) and the deterministic output dtype map. Non-inner
    joins NA-fill the unmatched side, so that side's int/bool output columns
    are promoted to float64 UP FRONT — every task then emits the same schema
    whether or not its slice had misses (a fully-matched slice would
    otherwise keep int64 while one with misses promotes)."""
    lcols = list(left.schema().names)
    rcols = list(right.schema().names)
    all_cols = lcols + [c for c in rcols if c not in lcols]
    ldtypes = _pandas_dtypes(left)
    rdtypes = _pandas_dtypes(right)
    out_cols = lcols + [(c if c not in lcols else c + "_r") for c in rcols if c != on]
    out_dtypes = dict(ldtypes)
    rnames = {}
    for c in rcols:
        if c == on:
            continue
        rnames[c] = c if c not in lcols else c + "_r"
        out_dtypes[rnames[c]] = rdtypes.get(c, np.dtype("O"))
    if how != "inner":
        na_cols = set()
        if how in ("left", "outer"):
            na_cols |= set(rnames.values())
        if how in ("right", "outer"):
            na_cols |= {c for c in lcols if c != on}
        for c in na_cols:
            dt = out_dtypes.get(c)
            if dt is not None and (np.issubdtype(dt, np.integer) or dt == np.dtype(bool)):
                out_dtypes[c] = np.dtype("float64")
    return lcols, rcols, all_cols, ldtypes, rdtypes, out_cols, out_dtypes


def bucketed_hash_join(
    left: Dataset,
    right: Dataset,
    on: str,
    n_buckets: int | None = None,
    how: str = "inner",
) -> Dataset:
    """Partitioned hash join via union + one groupby(bucket) shuffle.

    The two sides have different schemas, so each batch is filled to the
    union column set before the union — Ray blocks must share one schema
    across the unioned stream. The fill is :func:`_sentinel_fill` (dtype-true
    zeros, never NaN), so int64 columns keep exact values through the
    shuffle; ``join_bucket`` still restores each side's original dtypes after
    splitting as a guard against cross-side same-name dtype drift.

    ``n_buckets=None`` derives the bucket count from the input sizes
    (~250k rows/bucket, capped at 4096) — skewed keys dilute as buckets
    grow. Derivation materializes both sides first so an expensive upstream
    pipeline executes ONCE (count() would re-execute it, and the tag stage
    would execute it a second time); the join consumes every input block
    anyway, so this adds residency, not work."""
    if n_buckets is None:
        left, right = left.materialize(), right.materialize()
        total = left.count() + right.count()
        n_buckets = int(min(4096, max(16, total // _ROWS_PER_BUCKET + 1)))
    lcols, rcols, all_cols, ldtypes, rdtypes, out_cols, out_dtypes = _join_output_spec(
        left, right, on, how
    )

    fill_dtypes = {**rdtypes, **ldtypes}

    def tag(side: str):
        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            batch = _sentinel_fill(batch, all_cols, fill_dtypes)
            batch["__side"] = side
            batch["__bucket"] = (_key_hash(batch[on].to_numpy()) % np.uint64(n_buckets)).astype(np.int32)
            return batch

        return fn

    lt = left.map_batches(tag("l"), batch_format="pandas")
    rt = right.map_batches(tag("r"), batch_format="pandas")
    both = lt.union(rt)

    def _restore(df: pd.DataFrame, dtypes: dict) -> pd.DataFrame:
        for c, dt in dtypes.items():
            if c in df.columns and df[c].dtype != dt:
                try:
                    df[c] = df[c].astype(dt)
                except (ValueError, TypeError):
                    pass  # genuine NA in a non-nullable dtype: keep promoted
        return df

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):  # schema-complete empty (never a zero-column frame)
            return pd.DataFrame({c: pd.Series(dtype=out_dtypes.get(c, "O")) for c in out_cols})
        l = _restore(g[g["__side"] == "l"][lcols].copy(), ldtypes)
        r = _restore(g[g["__side"] == "r"][rcols].copy(), rdtypes)
        out = l.merge(r, on=on, how=how, suffixes=("", "_r"))
        if not len(out):
            return pd.DataFrame({c: pd.Series(dtype=out_dtypes.get(c, "O")) for c in out_cols})
        # apply the deterministic output dtype map (promoted for non-inner)
        # so every bucket's block carries the identical schema
        return _restore(out, out_dtypes)

    return both.groupby("__bucket").map_groups(join_bucket, batch_format="pandas")


def bloom_prefiltered_join(
    left: Dataset,
    right: Dataset,
    on: str,
    fpp: float = 0.001,
    n_buckets: int | None = None,
) -> Dataset:
    """INNER bucketed join where ``right`` is selective but past broadcast
    budget: a Bloom filter over right's join keys is built distributed
    (functions/bloom.build_bloom_from_hashes — per-block partial OR-merge
    under 5M keys, hash-routed ShardedBloom above), broadcast ONCE via ``ray.put``
    (~1.8 MB per million keys at 0.1% FPP, vs shipping the keys), and left
    rows whose key CANNOT match are dropped before the join's all-to-all
    shuffle — exchange volume becomes ~|matching left| + fpp·|left| instead
    of |left|. False positives only re-admit rows the exact in-bucket merge
    discards, so the result equals ``bucketed_hash_join(left, right,
    how='inner')`` exactly (equivalence is test-asserted at fpp=0.5). Inner
    only by construction: outer joins need the unmatched rows this filter
    exists to drop.
    """
    from ..functions.bloom import build_bloom_from_hashes

    right = right.materialize()
    n_keys = max(right.count(), 1)

    def to_hashes(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"h": _key_hash(batch[on].to_numpy()).astype(np.int64)})

    # key values never leave the tasks; the shared builder emits one partial
    # per BLOCK under 5M keys and switches to the hash-routed ShardedBloom
    # build above it (per-task memory and driver ingress stay shard-sized)
    hashed = right.map_batches(to_hashes, batch_format="pandas", batch_size=None)
    merged = build_bloom_from_hashes(hashed, n_keys, fpp)
    bf_ref = ray.put(merged)

    def prefilter(batch: pd.DataFrame) -> pd.DataFrame:
        bf = ray.get(bf_ref)  # zero-copy per-worker cached bits
        return batch[bf.contains_hashes(_key_hash(batch[on].to_numpy()))]

    filtered = left.map_batches(prefilter, batch_format="pandas")
    return bucketed_hash_join(filtered, right, on, n_buckets=n_buckets, how="inner")


def asof_match(
    lkey: np.ndarray, lts: np.ndarray, rkey: np.ndarray, rts: np.ndarray
) -> np.ndarray:
    """For each left row, the index of the LATEST right row with the same key
    and ``rts <= lts`` (DuckDB ``ASOF JOIN ... ON l.ts >= r.ts`` semantics),
    or -1. Fully vectorized: merge both sides, lexsort by (key, ts, side)
    with right-before-left on ties, then one ``maximum.accumulate`` carries
    the most recent right row past every left row. The carry crosses key
    boundaries, so a carried candidate is validated by key equality — a
    candidate from the previous key fails the check and yields -1.
    O((nl+nr) log(nl+nr)), no Python loop."""
    nl, nr = len(lkey), len(rkey)
    key = np.concatenate([rkey, lkey])
    ts = np.concatenate([rts, lts])
    side = np.concatenate([np.zeros(nr, np.int8), np.ones(nl, np.int8)])
    order = np.lexsort((side, ts, key))
    so = side[order]
    pos_val = np.where(so == 0, np.arange(nl + nr), -1)
    carry = np.maximum.accumulate(pos_val)  # sorted-pos of last right row seen
    is_left = so == 1
    cand = carry[is_left]
    left_orig = order[is_left] - nr
    match = np.full(nl, -1, np.int64)
    ok = cand >= 0
    cand_right = order[cand[ok]]  # original right index (side==0 ⇒ < nr)
    valid = rkey[cand_right] == lkey[left_orig[ok]]
    match[left_orig[ok]] = np.where(valid, cand_right, -1)
    return match


#: below this many total rows the as-of/range joins run driver-local — the
#: bucketed shuffle's ~1.4 s fixed overhead dominates toy inputs (same dispatch
#: pattern as dedup._LOCAL_PAIRING_ROWS / validate's conv-partials threshold)
_LOCAL_MATCH_ROWS = 2_000_000


def _sized_buckets(
    left: Dataset, right: Dataset, n_buckets: int | None
) -> tuple[Dataset, Dataset, int, int]:
    """(left, right, total rows, bucket count) for a two-sided keyed join.

    When deriving the bucket count, both sides are materialized FIRST so an
    expensive upstream pipeline executes once — the count() probe and the
    downstream tag/to_pandas then reuse the same blocks (the join consumes
    every input block regardless, so materializing adds residency, not
    work). An explicit ``n_buckets`` skips the count entirely (total=0 →
    the caller's local dispatch is bypassed and the distributed path runs).
    """
    if n_buckets is not None:
        return left, right, 0, n_buckets
    left, right = left.materialize(), right.materialize()
    total = left.count() + right.count()
    n_buckets = int(min(4096, max(16, total // _ROWS_PER_BUCKET + 1)))
    return left, right, total, n_buckets


def _matched_two_sided(
    left: Dataset,
    right: Dataset,
    on: str,
    lcols: list,
    rcols: list,
    match_frames,
    empty,
    n_buckets: int,
    total: int,
    fill_dtypes: dict,
):
    """Shared scaffold for the as-of and range joins: driver-local dispatch
    under :data:`_LOCAL_MATCH_ROWS`, else tag both sides with ``hash(on) % B``,
    union, ONE groupby(bucket) shuffle, and run ``match_frames(l, r)`` per
    bucket (the same one-shuffle shape as :func:`bucketed_hash_join`). The
    union-schema fill is :func:`_sentinel_fill` so int64 keys/payloads keep
    exact values (no NaN→float64 promotion) through the shuffle."""
    if 0 < total <= _LOCAL_MATCH_ROWS:
        import ray.data as _rd

        return _rd.from_pandas(match_frames(left.to_pandas(), right.to_pandas()))

    all_cols = lcols + [c for c in rcols if c not in lcols]

    def tag(side: str):
        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            batch = _sentinel_fill(batch, all_cols, fill_dtypes)
            batch["__side"] = side
            batch["__bucket"] = (
                _key_hash(batch[on].to_numpy()) % np.uint64(n_buckets)
            ).astype(np.int32)
            return batch

        return fn

    lt = left.map_batches(tag("l"), batch_format="pandas")
    rt = right.map_batches(tag("r"), batch_format="pandas")
    both = lt.union(rt)

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return empty()
        l = g[g["__side"] == "l"][lcols].reset_index(drop=True)
        r = g[g["__side"] == "r"][rcols].reset_index(drop=True)
        return match_frames(l, r)

    return both.groupby("__bucket").map_groups(join_bucket, batch_format="pandas")


def asof_join(
    left: Dataset,
    right: Dataset,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: dict[str, str],
    n_buckets: int | None = None,
    direction: str = "backward",
) -> Dataset:
    """Distributed as-of join — a custom operator Ray Data lacks (SURVEY.md
    §2 extras; the brief's canonical example). Each left row is matched to
    the latest right row with the same ``on`` key and ``right_ts <=
    left_ts``; unmatched left rows are dropped (inner, DuckDB ASOF JOIN
    default).

    Partitioning assumption (documented per the brief): co-location by key —
    every row of one key lands in one bucket via ``hash(on) % B``, the same
    ONE-shuffle union+groupby shape as :func:`bucketed_hash_join`; the
    within-bucket match is the vectorized :func:`asof_match` kernel. Skewed
    keys dilute as ``n_buckets`` grows; time-range bucketing would be the
    alternative when one key dominates an entire bucket.

    ``right_cols`` maps right-side column -> output name (rename avoids
    collisions; the right ts column may be included to emit the match time).

    Determinism contract (same as DuckDB ASOF JOIN): the right side should be
    unique on ``(on, right_ts)`` — among exact duplicates the selected row is
    arbitrary (and here depends on block order, which the shuffle permutes).

    ``direction="forward"`` matches the EARLIEST right row with
    ``right_ts >= left_ts`` instead (DuckDB ``ASOF JOIN ... ON l.ts <=
    r.ts``) — implemented as the backward kernel on NEGATED integer
    timestamps, so both directions share one verified match path.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    rneeded = [on, right_ts] + [c for c in right_cols if c not in (on, right_ts)]
    right = right.select_columns(rneeded)
    left, right, total, n_buckets = _sized_buckets(left, right, n_buckets)
    lcols = list(left.schema().names)
    rcols = list(right.schema().names)
    ldtypes = _pandas_dtypes(left)
    rdtypes = _pandas_dtypes(right)
    out_cols = lcols + [right_cols[c] for c in right_cols]
    out_dtypes = dict(ldtypes)
    for c, name in right_cols.items():
        out_dtypes[name] = rdtypes.get(c, np.dtype("O"))

    def _empty() -> pd.DataFrame:
        return pd.DataFrame({c: pd.Series(dtype=out_dtypes.get(c, "O")) for c in out_cols})

    def _ts_arr(s: pd.Series) -> np.ndarray:
        a = s.to_numpy()
        if np.issubdtype(a.dtype, np.datetime64):
            a = a.astype("datetime64[us]").astype(np.int64)
        return -a if direction == "forward" else a

    def _match_frames(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if not len(l) or not len(r):
            return _empty()
        m = asof_match(
            l[on].to_numpy(), _ts_arr(l[left_ts]), r[on].to_numpy(), _ts_arr(r[right_ts])
        )
        hit = m >= 0
        if not hit.any():
            return _empty()
        out = l[hit].reset_index(drop=True)
        rs = r.iloc[m[hit]].reset_index(drop=True)
        for c, name in right_cols.items():
            out[name] = rs[c]
        for c, dt in out_dtypes.items():  # restore dtypes the union promoted
            if c in out.columns and out[c].dtype != dt:
                try:
                    out[c] = out[c].astype(dt)
                except (ValueError, TypeError):
                    pass
        return out[out_cols]

    return _matched_two_sided(
        left, right, on, lcols, rcols, _match_frames, _empty, n_buckets, total,
        {**rdtypes, **ldtypes},
    )


def range_match(
    lkey: np.ndarray,
    lts: np.ndarray,
    rkey: np.ndarray,
    rts: np.ndarray,
    before,
    after,
) -> tuple[np.ndarray, np.ndarray]:
    """Pair indices ``(li, ri)`` for every (left, right) pair with equal key
    and ``rts in [lts - before, lts + after]`` (inclusive both ends).

    Fully vectorized, no structured dtypes: keys are dense-ranked over both
    sides, right timestamps dense-ranked over their unique values, and each
    right row gets the composite ``group * NT + ts_rank`` (int64; both factors
    are bounded by the batch's row count, so no overflow at any realistic
    bucket size). Each left row's window becomes two rank bounds via
    searchsorted on the unique-ts array — ``t >= a  ⟺  rank(t) >=
    searchsorted(uts, a, 'left')`` and ``t <= b ⟺ rank(t) <
    searchsorted(uts, b, 'right')`` — so two global searchsorteds on the
    sorted composite give each left row's contiguous match run. Pair emission
    is the O(output) grouped-arange expansion. Total cost
    O((nl+nr) log(nl+nr) + output)."""
    nl, nr = len(lkey), len(rkey)
    none = (np.empty(0, np.int64), np.empty(0, np.int64))
    if not nl or not nr:
        return none
    _, inv = np.unique(np.concatenate([lkey, rkey]), return_inverse=True)
    lg, rg = inv[:nl].astype(np.int64), inv[nl:].astype(np.int64)
    uts = np.unique(rts)
    nt = np.int64(len(uts) + 1)
    comp_r = rg * nt + np.searchsorted(uts, rts)
    order = np.argsort(comp_r, kind="stable")
    comp_s = comp_r[order]
    ra = np.searchsorted(uts, lts - before, "left")
    rb = np.searchsorted(uts, lts + after, "right")
    lo = np.searchsorted(comp_s, lg * nt + ra, "left")
    hi = np.searchsorted(comp_s, lg * nt + rb, "left")
    counts = hi - lo
    total = int(counts.sum())
    if not total:
        return none
    li = np.repeat(np.arange(nl, dtype=np.int64), counts)
    starts = np.cumsum(counts) - counts
    offs = np.arange(total, dtype=np.int64) - np.repeat(starts, counts)
    ri = order[np.repeat(lo, counts) + offs]
    return li, ri


def range_join(
    left: Dataset,
    right: Dataset,
    on: str,
    left_ts: str,
    right_ts: str,
    before,
    after,
    right_cols: dict[str, str],
    n_buckets: int | None = None,
) -> Dataset:
    """Distributed range (band / interval) join — with :func:`asof_join` one
    of the two canonical custom operators Ray Data lacks (SURVEY.md §2
    extras). Each left row is paired with EVERY right row sharing its ``on``
    key whose ``right_ts`` falls in ``[left_ts - before, left_ts + after]``,
    both ends inclusive (SQL ``BETWEEN``). Inner semantics: left rows with an
    empty window are dropped. ``before`` / ``after`` must be addable to the
    ts columns (``np.timedelta64`` for datetimes, plain numbers for numeric
    axes); pass 0 for a one-sided band.

    Partitioning assumption (documented per the brief): co-location by key —
    ``hash(on) % B`` bucketing, one union+groupby shuffle, vectorized
    :func:`range_match` per bucket. Output size is sum over keys of
    (left rows × right rows inside the band); size ``before``/``after`` so a
    hot key's band stays bounded, and raise ``n_buckets`` to dilute skew.

    ``right_cols`` maps right-side column -> output name (rename avoids
    collisions; include the right ts column to emit the matched time).
    Reference analog: the bounded historical re-scan window
    (``processor.py:65-71``) — a per-channel id-band lookup recast as a join.
    """
    rneeded = [on, right_ts] + [c for c in right_cols if c not in (on, right_ts)]
    right = right.select_columns(rneeded)
    left, right, total, n_buckets = _sized_buckets(left, right, n_buckets)
    lcols = list(left.schema().names)
    rcols = list(right.schema().names)
    ldtypes = _pandas_dtypes(left)
    rdtypes = _pandas_dtypes(right)
    out_cols = lcols + [right_cols[c] for c in right_cols]
    out_dtypes = dict(ldtypes)
    for c, name in right_cols.items():
        out_dtypes[name] = rdtypes.get(c, np.dtype("O"))

    def _empty() -> pd.DataFrame:
        return pd.DataFrame({c: pd.Series(dtype=out_dtypes.get(c, "O")) for c in out_cols})

    def _match_frames(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if not len(l) or not len(r):
            return _empty()
        li, ri = range_match(
            l[on].to_numpy(), l[left_ts].to_numpy(),
            r[on].to_numpy(), r[right_ts].to_numpy(), before, after,
        )
        if not len(li):
            return _empty()
        out = l.iloc[li].reset_index(drop=True)
        rs = r.iloc[ri].reset_index(drop=True)
        for c, name in right_cols.items():
            out[name] = rs[c]
        for c, dt in out_dtypes.items():  # restore dtypes the union promoted
            if c in out.columns and out[c].dtype != dt:
                try:
                    out[c] = out[c].astype(dt)
                except (ValueError, TypeError):
                    pass
        return out[out_cols]

    return _matched_two_sided(
        left, right, on, lcols, rcols, _match_frames, _empty, n_buckets, total,
        {**rdtypes, **ldtypes},
    )


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


def distinct_keys(ds: Dataset, on: str) -> np.ndarray:
    """Distinct values of one column, pre-deduplicated distributed: each
    batch emits ``np.unique`` of its own keys, so the driver receives the
    union of per-batch DISTINCT sets (distinct-sized transfer), never the raw
    row-sized column. Nulls are dropped (non-members, matching
    :func:`member_mask`)."""

    def per_batch(tbl: pa.Table) -> pa.Table:
        vals = tbl[on].to_numpy(zero_copy_only=False)
        if vals.dtype == object or vals.dtype.kind == "f":
            vals = vals[pd.notna(vals)]
        return pa.table({on: np.unique(vals)})

    parts = ds.select_columns([on]).map_batches(per_batch, batch_format="pyarrow").to_pandas()
    return np.unique(parts[on].to_numpy())


#: above this many right-side rows the anti/semi join switches from a
#: broadcast distinct-key set to the bucketed one-shuffle path — 5M int64
#: keys ≈ 40 MB broadcast, the comfortable ceiling for per-task ray.get
_BROADCAST_KEY_ROWS = 5_000_000


def anti_join(
    big: Dataset, right: Dataset, on: str, anti: bool = True, n_buckets: int | None = None
) -> Dataset:
    """Size-dispatched anti (or semi) join of ``big`` against the keys in
    ``right[on]``. Under :data:`_BROADCAST_KEY_ROWS` right-side rows the key
    set is deduplicated distributed (:func:`distinct_keys`) and broadcast
    once; above it, the same ONE-shuffle union+groupby(bucket) shape as
    :func:`bucketed_hash_join` — neither path ever collects a row-sized
    column on the driver. The scale path for referential checks whose
    right side is itself fact-sized (10^9+ keys)."""
    # the key column is all the right side contributes — prune it up front so
    # the count/materialize below touch 8 B/row, not the full right schema
    right = right.select_columns([on]).materialize()
    nr = right.count()
    if 0 < nr <= _BROADCAST_KEY_ROWS:
        return anti_join_keys(big, distinct_keys(right, on), on, anti=anti)

    big, right, _total, n_buckets = _sized_buckets(big, right, n_buckets)
    bcols = list(big.schema().names)
    bdtypes = _pandas_dtypes(big)

    def _empty() -> pd.DataFrame:
        return pd.DataFrame({c: pd.Series(dtype=bdtypes.get(c, "O")) for c in bcols})

    def tag(side: str):
        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            batch = _sentinel_fill(batch, bcols, bdtypes)
            batch["__side"] = side
            batch["__bucket"] = (
                _key_hash(batch[on].to_numpy()) % np.uint64(n_buckets)
            ).astype(np.int32)
            return batch

        return fn

    bt = big.map_batches(tag("b"), batch_format="pandas")
    rt = right.map_batches(tag("r"), batch_format="pandas")

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return _empty()
        is_b = (g["__side"] == "b").to_numpy()
        kraw = g.loc[~is_b, on].to_numpy()
        if kraw.dtype == object or kraw.dtype.kind == "f":
            kraw = kraw[pd.notna(kraw)]
        keys = np.unique(kraw)
        rows = g[is_b][bcols]
        member = member_mask(keys, rows[on].to_numpy())
        out = rows[~member if anti else member].reset_index(drop=True)
        if not len(out):
            return _empty()
        for c, dt in bdtypes.items():  # restore dtypes the union promoted
            if out[c].dtype != dt:
                try:
                    out[c] = out[c].astype(dt)
                except (ValueError, TypeError):
                    pass
        return out

    return bt.union(rt).groupby("__bucket").map_groups(per_bucket, batch_format="pandas")


def skew_join(
    left: Dataset,
    right: Dataset,
    on: str,
    how: str = "inner",
    hot_frac: float = 0.01,
    sample_rows: int = 100_000,
    n_buckets: int | None = None,
) -> Dataset:
    """Skew-aware hash join: hot keys broadcast, the long tail buckets.

    A plain bucketed join pins every row of a hot key into ONE bucket task —
    at 10^12 rows a hot-conversation-style key (the planted 10%-of-turns
    conversation in this repo's own testdata) makes one straggler carry 10%
    of the data. Here hot keys are detected from a BOUNDED left-side sample
    (``limit(sample_rows)`` — a streaming take), their right-side rows are
    broadcast once (contract: the right side is dimension-bounded per key),
    and hot left rows join batch-locally with NO shuffle; only the long tail
    pays the bucketed exchange. With no hot keys this degrades to exactly
    :func:`bucketed_hash_join`.

    Supports ``inner``, ``left`` and ``outer``. The decomposition is exact by
    key partition (every key is hot xor cold), and every hot key appears in
    the left side by construction (it was sampled from it), so no right-hot
    row can be unmatched — the hot branch's ``left`` merge covers ``outer``
    too. NA dtype promotion is coordinated with the bucketed branch through
    the shared :func:`_join_output_spec` map, so fully-matched hot batches
    emit the same (promoted) schema as cold buckets with misses.
    """
    if how not in ("inner", "left", "outer"):
        raise NotImplementedError("skew_join supports inner/left/outer")
    # materialize: the sample, the hot/cold splits and the bucketed join all
    # re-consume these inputs; an expensive upstream should execute once
    left = left.materialize()
    sample = left.limit(sample_rows).to_pandas()
    vc = sample[on].value_counts()
    hot = vc[vc >= max(2.0, hot_frac * len(sample))].index.to_numpy()
    if len(hot) == 0:
        return bucketed_hash_join(left, right, on=on, how=how, n_buckets=n_buckets)
    hot_sorted = np.sort(hot)
    right = right.materialize()
    _, rcols, _, _, rdtypes, out_cols, out_dtypes = _join_output_spec(left, right, on, how)

    def keep(batch: pd.DataFrame, want_hot: bool) -> pd.DataFrame:
        m = member_mask(hot_sorted, batch[on].to_numpy())
        return batch[m if want_hot else ~m]

    # hot right rows: key-count-bounded by the dimension contract
    right_hot = right.map_batches(lambda b: keep(b, True), batch_format="pandas").to_pandas()
    if list(right_hot.columns) != rcols:  # all-hot-keys-missed: schema-complete empty
        right_hot = pd.DataFrame(
            {c: pd.Series(right_hot.get(c, []), dtype=rdtypes.get(c, "O")) for c in rcols}
        )
    rh_ref = ray.put(right_hot)
    hot_how = "inner" if how == "inner" else "left"

    def _conform(out: pd.DataFrame) -> pd.DataFrame:
        if not len(out):
            return pd.DataFrame({c: pd.Series(dtype=out_dtypes.get(c, "O")) for c in out_cols})
        for c, dt in out_dtypes.items():
            if c in out.columns and out[c].dtype != dt:
                try:
                    out[c] = out[c].astype(dt)
                except (ValueError, TypeError):
                    pass
        return out[out_cols]

    def hot_join(batch: pd.DataFrame) -> pd.DataFrame:
        b = keep(batch, True)
        return _conform(b.merge(ray.get(rh_ref), on=on, how=hot_how, suffixes=("", "_r")))

    hot_joined = left.map_batches(hot_join, batch_format="pandas")
    cold_joined = bucketed_hash_join(
        left.map_batches(lambda b: keep(b, False), batch_format="pandas"),
        right.map_batches(lambda b: keep(b, False), batch_format="pandas"),
        on=on,
        how=how,
        n_buckets=n_buckets,
    )
    return hot_joined.union(cold_joined)
