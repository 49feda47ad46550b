"""Partitioned window functions (windowed aggregates over a keyed, ordered
stream) — with the as-of and range joins one of the custom-operator classes
the brief names that Ray Data lacks.

Semantics are SQL's ``fn(...) OVER (PARTITION BY key ORDER BY order)`` for
the running/offset functions below. Reference analog: the per-channel
watermark loop is a keyed ordered stream with running state
(``processor.py:59-63``); sessionization (queries.q_sessionize) is the
special case ``gap > threshold -> cumsum``.

Scale design: the naive shape — ``groupby(key).map_groups(per_group_fn)`` —
pays per-group Python/pandas overhead, which is ruinous when keys are many
and groups are small (10^9 users x ~10 events). Here instead:

1. ONE hash-bucket shuffle co-locates each key's rows
   (``hash(key) % B``, same shape as joins.bucketed_hash_join), then
2. each bucket is sorted ONCE by (key, *order) and every window function is
   computed by a SEGMENTED numpy kernel over the whole bucket — group
   boundaries are a boolean diff, running aggregates are global prefix ops
   re-based at each segment start. No per-group loop anywhere.

Running aggregates use pandas' grouped cumulative kernels (Cython, one pass
over the label array), so float accumulation order matches a per-group scan
exactly — same left-to-right order SQL's ordered window frame implies.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ray.data import Dataset

from .joins import _key_hash

#: below this many rows the window pass runs driver-local (same dispatch
#: pattern as joins._LOCAL_MATCH_ROWS — the shuffle's fixed overhead
#: dominates toy inputs)
_LOCAL_WINDOW_ROWS = 2_000_000

#: supported window functions: name -> needs a source column.
#: ``rolling_sum`` takes a 4th spec element: the frame length k, SQL's
#: ``ROWS BETWEEN k-1 PRECEDING AND CURRENT ROW``.
WINDOW_FNS = {
    "row_number": False,
    "running_count": False,
    "running_sum": True,
    "running_mean": True,
    "running_min": True,
    "running_max": True,
    "rolling_sum": True,
    "lag": True,
    "lead": True,
}


def segmented_windows(
    df: pd.DataFrame,
    key: str,
    order: list[str],
    specs: list[tuple],
) -> pd.DataFrame:
    """Apply window ``specs`` — ``(fn, src_col or None, out_name)`` tuples
    (``rolling_sum`` adds a 4th element, the frame length), fn in
    :data:`WINDOW_FNS` — to one frame. Sorts by ``[key, *order]`` and
    runs each function as a segmented vectorized kernel; returns the sorted
    frame with the output columns appended. Offset functions (lag/lead) emit
    NaN/NaT at segment edges (SQL NULL)."""
    df = df.sort_values([key, *order], kind="stable").reset_index(drop=True)
    n = len(df)
    if not n:
        for fn, _src, name, *_ in specs:
            df[name] = pd.Series(
                dtype="int64" if fn in ("row_number", "running_count") else "float64"
            )
        return df
    # factorize collapses every NULL flavor (NaN, pd.NA, None) to one -1
    # code, so NULL keys form ONE partition (SQL PARTITION BY semantics) and
    # the boundary test is a plain int comparison — raw value comparison
    # would split NaN rows (NaN != NaN) and chokes on extension-dtype pd.NA
    codes = pd.factorize(df[key], use_na_sentinel=True)[0]
    new = np.empty(n, dtype=bool)
    new[0] = True
    new[1:] = codes[1:] != codes[:-1]
    gstart = np.flatnonzero(new)  # segment start positions
    seg = np.cumsum(new) - 1  # segment id per row
    start_of = gstart[seg]  # each row's segment start position
    idx = np.arange(n)
    rn = idx - start_of  # 0-based rank within segment

    for fn, src, name, *extra in specs:
        if WINDOW_FNS.get(fn) is None:
            raise ValueError(f"unknown window fn {fn!r}")
        if WINDOW_FNS[fn] and src is None:
            raise ValueError(f"{fn} needs a source column")
        if fn == "rolling_sum":
            # bounded ROWS frame: pandas' grouped rolling kernel (Cython,
            # segment-local by the label array) — a window with only NULLs
            # yields NaN (SQL NULL), matching SUM OVER's empty-frame rule
            k = int(extra[0]) if extra else 2
            df[name] = (
                df.groupby(seg, sort=False)[src]
                .rolling(window=k, min_periods=1)
                .sum()
                .reset_index(level=0, drop=True)
                .sort_index()
            )
        elif fn in ("row_number", "running_count"):
            df[name] = rn + 1
        elif fn in ("running_sum", "running_mean", "running_min", "running_max"):
            # pandas' grouped cumulatives are single-pass Cython kernels over
            # the label array — per-segment exact (no global-prefix re-basing,
            # no reduceat, which is slow on this numpy build), no per-group
            # Python.
            v = df[src]
            if fn in ("running_sum", "running_mean"):
                # SQL SUM/AVG OVER aggregate the NON-NULL prefix: a NULL row
                # still emits the running value (pandas cumsum would emit NaN
                # there), AVG divides by the non-null count (not the row
                # rank), and the result is NULL only before the segment's
                # first non-null value.
                cs = v.fillna(0).groupby(seg, sort=False).cumsum()
                cnt = v.notna().groupby(seg, sort=False).cumsum()
                if fn == "running_sum":
                    df[name] = cs.mask(cnt == 0)
                else:
                    df[name] = cs / cnt.mask(cnt == 0)
            else:
                g = df.groupby(seg, sort=False)[src]
                r = g.cummin() if fn == "running_min" else g.cummax()
                # pandas emits NaN at NULL rows; SQL repeats the running
                # value there (leading NULLs stay NULL — ffill is segment-
                # local, so nothing crosses a key boundary)
                df[name] = r.groupby(seg, sort=False).ffill()
        elif fn in ("lag", "lead"):
            v = df[src]
            shifted = v.shift(1 if fn == "lag" else -1)
            edge = new if fn == "lag" else np.r_[new[1:], True]
            df[name] = shifted.mask(edge)
        else:  # pragma: no cover
            raise AssertionError(fn)
    return df


def window_over(
    ds: Dataset,
    key: str,
    order: list[str],
    specs: list[tuple[str, str | None, str]],
    n_buckets: int | None = None,
) -> Dataset:
    """Distributed partitioned window functions: ONE ``hash(key) % B``
    shuffle co-locates keys, then :func:`segmented_windows` runs vectorized
    over each whole bucket (never per group).

    Partitioning assumption (documented per the brief): all rows of a key
    fit in one bucket's memory — raise ``n_buckets`` for wide inputs; a
    single key hotter than a bucket needs a two-pass carry (not needed for
    the transcript/event shapes, where a key is a conversation/user).
    """
    if n_buckets is None:
        # materialize before counting so an expensive upstream pipeline runs
        # ONCE (count() re-executes pending transforms; the tag stage below —
        # or the local to_pandas — then reuses the same blocks). An explicit
        # n_buckets skips the count entirely and always takes the
        # distributed path.
        ds = ds.materialize()
        total = ds.count()
        if 0 < total <= _LOCAL_WINDOW_ROWS:
            import ray.data as _rd

            return _rd.from_pandas(segmented_windows(ds.to_pandas(), key, order, specs))
        n_buckets = int(min(4096, max(16, total // 250_000 + 1)))

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        batch["__bucket"] = (
            _key_hash(batch[key].to_numpy()) % np.uint64(n_buckets)
        ).astype(np.int32)
        return batch

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = segmented_windows(
            g.drop(columns="__bucket").reset_index(drop=True), key, order, specs
        )
        return out

    return (
        ds.map_batches(tag, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


def funnel_stages(
    ds: Dataset,
    key_col: str,
    ts_col: str,
    type_col: str,
    stages: list[str],
    n_buckets: int = 64,
) -> Dataset:
    """Strict-sequential funnel (ordered event-pattern matching): per key,
    stage ``k`` is reached iff an event of type ``stages[k]`` exists
    STRICTLY AFTER the first time stage ``k-1`` was reached
    (``t_k = min ts of stages[k] with ts > t_{k-1}``) — the sequential
    dependency that makes this a custom operator rather than a plain
    aggregate. Returns one row per key: ``(key_col, stage_reached)`` with
    ``stage_reached in 0..len(stages)`` over keys having >=1 stage-type
    event.

    Scale shape: non-stage event types are dropped BEFORE the shuffle
    (projection + predicate at the map), then ONE hash-bucket shuffle
    co-locates each key's stage events; inside a bucket all keys are
    resolved together with vectorized masked-min rounds (len(stages)
    passes, no per-key loop). Reference analog: the per-channel
    watermark-then-process ordering of processor.py:59-75, generalized to
    k ordered stages.
    """
    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch[batch[type_col].isin(stages)]
        if not len(b):
            return pd.DataFrame(
                {
                    key_col: pd.Series([], dtype=batch[key_col].dtype),
                    ts_col: pd.Series([], dtype=batch[ts_col].dtype),
                    type_col: pd.Series([], dtype=batch[type_col].dtype),
                    "__b": pd.Series([], dtype=np.int32),
                }
            )
        b = b[[key_col, ts_col, type_col]].copy()
        b["__b"] = (_key_hash(b[key_col].to_numpy()) % n_buckets).astype(np.int32)
        return b

    def bucket(g: pd.DataFrame) -> pd.DataFrame:
        users = pd.Index(g[key_col].unique())
        reached = pd.Series(np.int64(0), index=users)
        cur = None
        for k, st in enumerate(stages):
            rows = g[g[type_col] == st]
            if k == 0:
                cur = rows.groupby(key_col)[ts_col].min()
            else:
                prev_t = rows[key_col].map(cur).to_numpy()
                # NaT/NaN comparisons are False -> keys not at stage k-1 drop
                mask = rows[ts_col].to_numpy() > prev_t
                cur = rows[mask].groupby(key_col)[ts_col].min()
            if not len(cur):
                break
            reached.loc[cur.index] = np.int64(k + 1)
        out = reached.rename("stage_reached").rename_axis(key_col).reset_index()
        return out.sort_values(key_col).reset_index(drop=True)

    return (
        ds.map_batches(add_bucket, batch_format="pandas", batch_size=None)
        .groupby("__b")
        .map_groups(lambda g: bucket(g.drop(columns="__b")), batch_format="pandas")
    )


def trailing_range_sum(
    df: pd.DataFrame,
    key: str,
    ts_col: str,
    val_col: str,
    window_us: int,
    out_col: str = "trail_sum",
) -> pd.DataFrame:
    """SQL RANGE-frame trailing sum (RANGE BETWEEN <window> PRECEDING AND
    CURRENT ROW) over one frame, fully vectorized: rows sort (key, ts), each
    key's timestamps embed into a composite int64 key (key_code * span + ts)
    so ONE global searchsorted pair finds every row's frame bounds — the
    'right' bound includes equal-ts peers exactly as the SQL frame does —
    and the sum is two prefix-array gathers. Use inside a hash-bucket
    map_groups for the distributed form (q_trailing_hour)."""
    d = df.sort_values([key, ts_col], kind="stable").reset_index(drop=True)
    if not len(d):
        d[out_col] = pd.Series(dtype="int64")
        return d
    kc = pd.factorize(d[key], use_na_sentinel=True)[0].astype(np.int64)
    # NULL keys factorize to -1 but sort_values puts NaN last — re-order by
    # the codes (stable, so within-key ts order survives) so the composite
    # key array below is globally sorted even with a null-key partition
    if (kc < 0).any():
        order = np.argsort(kc, kind="stable")
        d = d.iloc[order].reset_index(drop=True)
        kc = kc[order] + 1
    us = d[ts_col].to_numpy(np.int64)
    base = us.min()
    span = us.max() - base + np.int64(window_us) + 2
    # composite-key packing budget: (max code + 1) * span must fit int64 or
    # every frame bound silently corrupts (q_log_compaction's assert pattern)
    n_codes = int(kc.max()) + 1
    if n_codes * int(span) > np.iinfo(np.int64).max:
        raise ValueError(
            f"trailing_range_sum composite key overflows int64: "
            f"{n_codes} keys x span {int(span)}us — split the bucket or "
            f"shrink the time domain"
        )
    k = kc * span + (us - base)
    v = d[val_col].to_numpy(np.int64)
    pre = np.r_[0, np.cumsum(v)]
    lo = np.searchsorted(k, kc * span + (us - base) - np.int64(window_us), side="left")
    hi = np.searchsorted(k, k, side="right")
    d[out_col] = (pre[hi] - pre[lo]).astype(np.int64)
    return d


def bucketed_map_groups(ds, key: str, fn, n_buckets: int = 64):
    """The shared per-bucket scaffold: ONE hash(key) % n_buckets shuffle,
    then ``fn`` over each whole bucket frame (tag column already dropped).
    Same partitioning assumption as :func:`window_over`: a key's rows fit
    one bucket. Used by the bucket-vectorized operators (audience overlap,
    ordered collect, FD audit, longest run, RANGE frames) so the bucket
    count and hash live in one place."""
    from .joins import _key_hash

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df["__b"] = (_key_hash(df[key].to_numpy()) % np.uint64(n_buckets)).astype(np.int32)
        return df

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return fn(g.drop(columns="__b"))

    return (
        ds.map_batches(tag, batch_format="pandas")
        .groupby("__b")
        .map_groups(per_bucket, batch_format="pandas")
    )
