"""Partitioned window functions: segmented kernels vs a per-group pandas
brute force, distributed-path equivalence, and SQL NULL edge semantics."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

import teleharvest_ray.stages.windows as w

SPECS = [
    ("row_number", None, "rn"),
    ("running_sum", "v", "rsum"),
    ("running_mean", "v", "rmean"),
    ("running_min", "v", "rmin"),
    ("running_max", "v", "rmax"),
    ("lag", "v", "prev_v"),
    ("lead", "v", "next_v"),
]


def _mk(n=500, keys=17, seed=9):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "k": rng.integers(0, keys, n),
            "o": rng.permutation(n),  # unique order column
            "v": rng.normal(size=n).round(3),
        }
    )


def _brute(df):
    df = df.sort_values(["k", "o"], kind="stable").reset_index(drop=True)
    g = df.groupby("k", sort=False)["v"]
    df["rn"] = g.cumcount() + 1
    df["rsum"] = g.apply(lambda s: s.cumsum()).reset_index(drop=True)
    df["rmean"] = g.apply(lambda s: s.expanding().mean()).reset_index(drop=True)
    df["rmin"] = g.apply(lambda s: s.cummin()).reset_index(drop=True)
    df["rmax"] = g.apply(lambda s: s.cummax()).reset_index(drop=True)
    df["prev_v"] = g.shift(1)
    df["next_v"] = g.shift(-1)
    return df


def test_segmented_windows_vs_brute():
    df = _mk()
    got = w.segmented_windows(df.copy(), "k", ["o"], SPECS)
    exp = _brute(df.copy())
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_segmented_windows_single_row_groups():
    df = pd.DataFrame({"k": [1, 2, 3], "o": [0, 1, 2], "v": [5.0, 6.0, 7.0]})
    got = w.segmented_windows(df, "k", ["o"], SPECS)
    assert (got["rn"] == 1).all()
    assert got["prev_v"].isna().all() and got["next_v"].isna().all()
    assert (got["rsum"] == got["v"]).all()


def test_segmented_windows_empty():
    df = pd.DataFrame({"k": pd.Series(dtype="int64"), "o": pd.Series(dtype="int64"), "v": pd.Series(dtype="float64")})
    got = w.segmented_windows(df, "k", ["o"], SPECS)
    assert len(got) == 0 and "rsum" in got.columns


def test_unknown_fn_raises():
    with pytest.raises(ValueError):
        w.segmented_windows(_mk(20), "k", ["o"], [("median", "v", "x")])
    with pytest.raises(ValueError):
        w.segmented_windows(_mk(20), "k", ["o"], [("lag", None, "x")])


def _run(df, **kw):
    out = w.window_over(rd.from_pandas(df), "k", ["o"], SPECS, **kw).to_pandas()
    return out.sort_values(["k", "o"]).reset_index(drop=True)


def test_window_over_distributed_matches_local(ray_session, monkeypatch):
    df = _mk(800, keys=40, seed=4)
    local = _run(df)
    monkeypatch.setattr(w, "_LOCAL_WINDOW_ROWS", 0)
    dist = _run(df, n_buckets=8)
    pd.testing.assert_frame_equal(local, dist, check_dtype=False)
    assert len(local) == len(df)


def test_segmented_windows_sql_null_semantics():
    """SQL OVER semantics with NULLs, checked against DuckDB directly:
    SUM/MIN/MAX at a NULL row emit the running value (pandas cumulatives
    would emit NaN), AVG divides by the NON-NULL prefix count (not the row
    rank), leading NULLs stay NULL, and NULL partition keys form ONE
    partition (not one segment per NaN row)."""
    import duckdb

    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 5, 200).astype("float64"),
            "o": np.arange(200, dtype=np.int64),
            "v": rng.normal(size=200).round(3),
        }
    )
    df.loc[rng.choice(200, 60, replace=False), "v"] = np.nan
    df.loc[rng.choice(200, 30, replace=False), "k"] = np.nan
    got = w.segmented_windows(df.copy(), "k", ["o"], SPECS).reset_index(drop=True)
    exp = duckdb.sql(
        """
        SELECT k, o, v,
               CAST(ROW_NUMBER() OVER win AS BIGINT) AS rn,
               SUM(v) OVER win AS rsum,
               AVG(v) OVER win AS rmean,
               MIN(v) OVER win AS rmin,
               MAX(v) OVER win AS rmax,
               LAG(v) OVER win AS prev_v,
               LEAD(v) OVER win AS next_v
        FROM df
        WINDOW win AS (PARTITION BY k ORDER BY o ROWS UNBOUNDED PRECEDING)
        ORDER BY k NULLS LAST, o
        """
    ).df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def _ev(rows):
    df = pd.DataFrame(rows, columns=["user_id", "ts", "event_type"])
    df["ts"] = pd.to_datetime(df["ts"])
    df["user_id"] = df["user_id"].astype("int64")
    return df


def test_funnel_strictly_after_semantics(ray_session):
    stages = ["view", "click", "purchase"]
    df = _ev(
        [
            # u1: full funnel in order -> 3
            (1, "2024-01-01 00:00", "view"),
            (1, "2024-01-01 00:01", "click"),
            (1, "2024-01-01 00:02", "purchase"),
            # u2: click BEFORE first view, none after -> stalls at 1
            (2, "2024-01-01 00:00", "click"),
            (2, "2024-01-01 00:01", "view"),
            (2, "2024-01-01 00:02", "purchase"),  # purchase needs a click after view
            # u3: click at the SAME ts as view (not strictly after) -> 1
            (3, "2024-01-01 00:00", "view"),
            (3, "2024-01-01 00:00", "click"),
            # u4: only non-stage types dropped pre-shuffle -> absent
            (4, "2024-01-01 00:00", "signup"),
            # u5: second click after view rescues the funnel -> 3
            (5, "2024-01-01 00:00", "click"),
            (5, "2024-01-01 00:01", "view"),
            (5, "2024-01-01 00:02", "click"),
            (5, "2024-01-01 00:03", "purchase"),
        ]
        + [(4, "2024-01-01 00:05", "view")]  # u4 gets a lone view -> 1
    )
    out = (
        w.funnel_stages(rd.from_pandas(df).repartition(3), "user_id", "ts", "event_type", stages)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert dict(zip(out.user_id, out.stage_reached)) == {1: 3, 2: 1, 3: 1, 4: 1, 5: 3}


def test_funnel_partition_invariant(ray_session):
    rng = np.random.default_rng(5)
    n = 3000
    df = pd.DataFrame(
        {
            "user_id": rng.integers(0, 80, n).astype("int64"),
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 10**6, n), unit="s"),
            "event_type": rng.choice(["view", "click", "purchase", "error"], n),
        }
    )
    outs = []
    for parts in (1, 11):
        o = (
            w.funnel_stages(
                rd.from_pandas(df).repartition(parts),
                "user_id",
                "ts",
                "event_type",
                ["view", "click", "purchase"],
                n_buckets=7,
            )
            .to_pandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        outs.append(o)
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_funnel_matches_bruteforce_random(ray_session):
    rng = np.random.default_rng(17)
    n = 2000
    df = pd.DataFrame(
        {
            "user_id": rng.integers(0, 60, n).astype("int64"),
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 10**5, n), unit="s"),
            "event_type": rng.choice(["view", "click", "purchase", "signup", "error"], n),
        }
    )
    stages = ["view", "click", "purchase"]
    got = (
        w.funnel_stages(rd.from_pandas(df).repartition(5), "user_id", "ts", "event_type", stages)
        .to_pandas()
        .set_index("user_id")["stage_reached"]
        .to_dict()
    )

    # brute force: literal per-user scan
    exp = {}
    rel = df[df.event_type.isin(stages)]
    for u, g in rel.groupby("user_id"):
        reached, t_prev = 0, None
        for k, st in enumerate(stages):
            cand = g[g.event_type == st]
            if k > 0:
                cand = cand[cand.ts > t_prev]
            if not len(cand):
                break
            t_prev = cand.ts.min()
            reached = k + 1
        exp[u] = reached
    assert got == exp


def test_trailing_range_sum_null_keys():
    """NULL keys factorize to -1 while sort_values puts NaN last — the
    kernel must re-order so the composite key stays globally sorted, or
    every frame bound is garbage (review finding)."""
    import numpy as np
    import pandas as pd
    from teleharvest_ray.stages.windows import trailing_range_sum

    df = pd.DataFrame(
        {
            "k": [1.0, np.nan, 1.0, np.nan, 2.0],
            "us": np.array([0, 10, 30, 50, 20], dtype=np.int64),
            "v": np.array([1, 2, 4, 8, 16], dtype=np.int64),
        }
    )
    out = trailing_range_sum(df, key="k", ts_col="us", val_col="v", window_us=40)
    got = {(None if pd.isna(r.k) else r.k, r.us): r.trail_sum for r in out.itertuples()}
    # brute force: frame = same-key rows with ts in [ts-40, ts]
    for _, r in df.iterrows():
        same = df[(df["k"] == r["k"]) | (df["k"].isna() & pd.isna(r["k"]))]
        frame = same[(same["us"] >= r["us"] - 40) & (same["us"] <= r["us"])]
        key = (None if pd.isna(r["k"]) else r["k"], r["us"])
        assert got[key] == frame["v"].sum(), key


def test_trailing_range_sum_overflow_guard():
    """(max code + 1) * span past int64 must raise, not silently corrupt."""
    from teleharvest_ray.stages.windows import trailing_range_sum

    n = 40_000
    df = pd.DataFrame(
        {
            "k": np.arange(n, dtype=np.int64),
            "us": np.array([0] * (n - 1) + [2**50], dtype=np.int64),
            "v": np.ones(n, dtype=np.int64),
        }
    )
    # span ~ 2^51, 40k keys -> composite max ~ 9e19 > int64 max
    with pytest.raises(ValueError, match="overflows int64"):
        trailing_range_sum(df, key="k", ts_col="us", val_col="v", window_us=2**50)
