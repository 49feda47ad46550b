"""As-of join: kernel correctness vs brute force, distributed-path
equivalence (threshold forced to 0, same pattern as the dedup pairing
equivalence test), and >=-tie semantics."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

import teleharvest_ray.stages.joins as jn


def _brute(lkey, lts, rkey, rts):
    out = np.full(len(lkey), -1, np.int64)
    for i in range(len(lkey)):
        best = (-1, -1)
        for j in range(len(rkey)):
            if rkey[j] == lkey[i] and rts[j] <= lts[i] and (rts[j], j) > best:
                best = (rts[j], j)
        out[i] = best[1]
    return out


def test_asof_match_vs_brute_force():
    rng = np.random.default_rng(7)
    for _ in range(100):
        nl, nr = rng.integers(0, 50, 2)
        lkey = rng.integers(0, 8, nl)
        rkey = rng.integers(0, 8, nr)
        lts = rng.integers(0, 60, nl)
        rts = rng.integers(0, 60, nr)
        got = jn.asof_match(lkey, lts, rkey, rts)
        assert (got == _brute(lkey, lts, rkey, rts)).all()


def test_asof_match_equal_ts_is_matched():
    # >= semantics: a right row AT the left timestamp is eligible
    m = jn.asof_match(np.array([1]), np.array([10]), np.array([1, 1]), np.array([10, 5]))
    assert m[0] == 0


def _mk_sides(n_left=400, n_right=600, seed=3):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 40, n_left),
            "t": rng.integers(0, 10_000, n_left).astype("datetime64[us]"),
            "lv": rng.normal(size=n_left),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.integers(0, 40, n_right),
            "t": rng.integers(0, 10_000, n_right).astype("datetime64[us]"),
            "rv": rng.normal(size=n_right),
        }
    )
    # determinism contract: right side unique on (k, t) — among exact
    # duplicates the selected row is arbitrary (same as DuckDB ASOF)
    right = right.drop_duplicates(["k", "t"]).reset_index(drop=True)
    return left, right


def _run(left, right, **kw):
    out = jn.asof_join(
        rd.from_pandas(left),
        rd.from_pandas(right),
        on="k",
        left_ts="t",
        right_ts="t",
        right_cols={"t": "rt", "rv": "rv"},
        **kw,
    ).to_pandas()
    return out.sort_values(["k", "t", "lv"]).reset_index(drop=True)


def test_asof_join_distributed_matches_local(ray_session, monkeypatch):
    left, right = _mk_sides()
    local = _run(left, right)
    monkeypatch.setattr(jn, "_LOCAL_MATCH_ROWS", 0)
    dist = _run(left, right, n_buckets=8)
    pd.testing.assert_frame_equal(local, dist, check_dtype=False)
    assert len(local) > 0
    # inner semantics: only matched left rows, and every match is at-or-before
    assert (local["rt"] <= local["t"]).all()
    # spot-check a row against brute force over the raw frames
    row = local.iloc[0]
    cand = right[(right.k == row.k) & (right.t <= row.t)]
    assert len(cand) and cand.t.max() == row.rt


# ---------------------------------------------------------------------------
# range (band) join
# ---------------------------------------------------------------------------


def _brute_range(lkey, lts, rkey, rts, before, after):
    pairs = set()
    for i in range(len(lkey)):
        for j in range(len(rkey)):
            if rkey[j] == lkey[i] and lts[i] - before <= rts[j] <= lts[i] + after:
                pairs.add((i, j))
    return pairs


def test_range_match_vs_brute_force():
    rng = np.random.default_rng(11)
    for _ in range(100):
        nl, nr = rng.integers(0, 40, 2)
        lkey = rng.integers(0, 6, nl)
        rkey = rng.integers(0, 6, nr)
        lts = rng.integers(0, 50, nl)
        rts = rng.integers(0, 50, nr)
        before, after = rng.integers(0, 12, 2)
        li, ri = jn.range_match(lkey, lts, rkey, rts, before, after)
        assert set(zip(li.tolist(), ri.tolist())) == _brute_range(
            lkey, lts, rkey, rts, before, after
        )


def test_range_match_inclusive_endpoints():
    # BETWEEN semantics: both window edges match
    li, ri = jn.range_match(
        np.array([1]), np.array([10]), np.array([1, 1, 1, 1]),
        np.array([5, 7, 12, 13]), 5, 2,
    )
    assert set(zip(li.tolist(), ri.tolist())) == {(0, 0), (0, 1), (0, 2)}


def _run_range(left, right, **kw):
    out = jn.range_join(
        rd.from_pandas(left),
        rd.from_pandas(right),
        on="k",
        left_ts="t",
        right_ts="t",
        before=np.timedelta64(500, "us"),
        after=np.timedelta64(0, "us"),
        right_cols={"t": "rt", "rv": "rv"},
        **kw,
    ).to_pandas()
    return out.sort_values(["k", "t", "lv", "rt", "rv"]).reset_index(drop=True)


def test_range_join_distributed_matches_local(ray_session, monkeypatch):
    left, right = _mk_sides(seed=5)
    local = _run_range(left, right)
    monkeypatch.setattr(jn, "_LOCAL_MATCH_ROWS", 0)
    dist = _run_range(left, right, n_buckets=8)
    pd.testing.assert_frame_equal(local, dist, check_dtype=False)
    assert len(local) > 0
    # band semantics on the real frames
    assert ((local["rt"] <= local["t"]) & (local["rt"] >= local["t"] - np.timedelta64(500, "us"))).all()
    # pair count for one left row matches a brute filter
    row = local.iloc[0]
    cand = right[(right.k == row.k) & (right.t <= row.t) & (right.t >= row.t - np.timedelta64(500, "us"))]
    assert len(cand) == (
        (local.k == row.k) & (local.t == row.t) & (local.lv == row.lv)
    ).sum()


# ---------------------------------------------------------------------------
# size-dispatched anti/semi join
# ---------------------------------------------------------------------------


def _mk_anti(seed=9, n_big=500, n_right=300):
    rng = np.random.default_rng(seed)
    big = pd.DataFrame(
        {
            "id": rng.integers(0, 200, n_big),
            "v": rng.normal(size=n_big),
            "name": [f"n{i}" for i in rng.integers(0, 50, n_big)],
        }
    )
    right = pd.DataFrame({"id": rng.integers(100, 300, n_right)})
    return big, right


def _run_anti(big, right, anti=True, **kw):
    out = jn.anti_join(
        rd.from_pandas(big), rd.from_pandas(right), on="id", anti=anti, **kw
    ).to_pandas()
    return out.sort_values(["id", "v"]).reset_index(drop=True)


def test_anti_join_broadcast_path_matches_pandas(ray_session):
    big, right = _mk_anti()
    got = _run_anti(big, right)
    want = (
        big[~big.id.isin(right.id)].sort_values(["id", "v"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert len(want) > 0


def test_anti_join_bucketed_path_matches_broadcast(ray_session, monkeypatch):
    big, right = _mk_anti(seed=13)
    bc = _run_anti(big, right)
    monkeypatch.setattr(jn, "_BROADCAST_KEY_ROWS", 0)
    sh = _run_anti(big, right, n_buckets=8)
    pd.testing.assert_frame_equal(bc, sh, check_dtype=False)
    # dtype restoration through the union+groupby path
    assert sh["id"].dtype == big["id"].dtype
    assert sh["v"].dtype == big["v"].dtype


def test_semi_join_both_paths(ray_session, monkeypatch):
    big, right = _mk_anti(seed=21)
    want = big[big.id.isin(right.id)].sort_values(["id", "v"]).reset_index(drop=True)
    bc = _run_anti(big, right, anti=False)
    pd.testing.assert_frame_equal(bc, want, check_dtype=False)
    monkeypatch.setattr(jn, "_BROADCAST_KEY_ROWS", 0)
    sh = _run_anti(big, right, anti=False, n_buckets=8)
    pd.testing.assert_frame_equal(sh, want, check_dtype=False)
    assert len(want) > 0


def test_distinct_keys_drops_nulls(ray_session):
    df = pd.DataFrame({"k": [3.0, 1.0, np.nan, 3.0, 2.0]})
    got = jn.distinct_keys(rd.from_pandas(df), "k")
    assert got.tolist() == [1.0, 2.0, 3.0]


# ---------------------------------------------------------------------------
# int64 exactness above 2**53 through the union-shuffle fill
# ---------------------------------------------------------------------------

_BIG = 2**53  # float64 integer-exactness ceiling


def test_bucketed_join_int64_above_2p53_exact(ray_session):
    """Snowflake-style ids exceed 2**53; a NaN union fill would float64-
    promote them through the shuffle and round the low bits away. The
    sentinel fill must keep every payload bit-exact on both sides."""
    rng = np.random.default_rng(17)
    n = 300
    keys = rng.integers(0, 60, n)
    left = pd.DataFrame(
        {"k": keys, "lid": _BIG + np.arange(n, dtype=np.int64) * 3 + 1}
    )
    right = pd.DataFrame(
        {"k": np.arange(60), "rid": _BIG + np.arange(60, dtype=np.int64) * 7 + 5}
    )
    out = jn.bucketed_hash_join(
        rd.from_pandas(left), rd.from_pandas(right), on="k", n_buckets=8
    ).to_pandas()
    want = left.merge(right, on="k")
    assert out["lid"].dtype == np.int64 and out["rid"].dtype == np.int64
    got = out.sort_values(["k", "lid"]).reset_index(drop=True)
    want = want.sort_values(["k", "lid"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["k", "lid", "rid"]], want[["k", "lid", "rid"]], check_dtype=False)
    # the exactness claim itself: odd offsets survive (any float64 round trip
    # of 2**53+odd lands on an even value)
    assert ((got["lid"] - _BIG) % 3 == 1).all()
    assert ((got["rid"] - _BIG) % 7 == 5).all()


def test_asof_join_int64_above_2p53_exact(ray_session, monkeypatch):
    rng = np.random.default_rng(23)
    n = 200
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 10, n),
            "t": rng.integers(0, 1000, n).astype(np.int64),
            "lid": _BIG + np.arange(n, dtype=np.int64) * 3 + 1,
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.integers(0, 10, n),
            "t": rng.integers(0, 1000, n).astype(np.int64),
            "rid": _BIG + np.arange(n, dtype=np.int64) * 7 + 5,
        }
    ).drop_duplicates(["k", "t"])
    monkeypatch.setattr(jn, "_LOCAL_MATCH_ROWS", 0)  # force the shuffle path
    out = jn.asof_join(
        rd.from_pandas(left),
        rd.from_pandas(right),
        on="k",
        left_ts="t",
        right_ts="t",
        right_cols={"rid": "rid"},
        n_buckets=8,
    ).to_pandas()
    assert len(out) > 0
    assert out["lid"].dtype == np.int64 and out["rid"].dtype == np.int64
    assert ((out["lid"] - _BIG) % 3 == 1).all()
    assert ((out["rid"] - _BIG) % 7 == 5).all()


def test_anti_join_int64_above_2p53_exact(ray_session, monkeypatch):
    rng = np.random.default_rng(29)
    big = pd.DataFrame(
        {
            "id": rng.integers(0, 200, 400),
            "pay": _BIG + np.arange(400, dtype=np.int64) * 3 + 1,
        }
    )
    right = pd.DataFrame({"id": rng.integers(100, 300, 250)})
    monkeypatch.setattr(jn, "_BROADCAST_KEY_ROWS", 0)  # force the shuffle path
    out = jn.anti_join(
        rd.from_pandas(big), rd.from_pandas(right), on="id", n_buckets=8
    ).to_pandas()
    want = big[~big.id.isin(right.id)]
    assert out["pay"].dtype == np.int64
    assert sorted(out["pay"]) == sorted(want["pay"])


def test_bloom_prefiltered_join_matches_bucketed(ray_session):
    """Exact-equivalence at fpp=0.5: half the non-matching left rows pass the
    filter and must die in the in-bucket merge — the result must still equal
    the plain inner bucketed join."""
    rng = np.random.default_rng(7)
    left = pd.DataFrame({"k": rng.integers(0, 2000, 5000), "v": rng.normal(size=5000)})
    right = pd.DataFrame({"k": np.arange(0, 2000, 37), "w": np.arange(0, 2000, 37) * 0.5})
    got = (
        jn.bloom_prefiltered_join(rd.from_pandas(left), rd.from_pandas(right), on="k", fpp=0.5)
        .to_pandas()
        .sort_values(["k", "v"])
        .reset_index(drop=True)
    )
    exp = (
        jn.bucketed_hash_join(rd.from_pandas(left), rd.from_pandas(right), on="k")
        .to_pandas()
        .sort_values(["k", "v"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[sorted(got.columns)], exp[sorted(exp.columns)])


def test_bloom_prefilter_actually_drops(ray_session):
    """At fpp=1e-3 with a tiny key set, nearly all non-matching rows are
    dropped before the shuffle (the operator's reason to exist)."""
    rng = np.random.default_rng(8)
    left = pd.DataFrame({"k": rng.integers(0, 100_000, 20_000), "v": 1.0})
    right = pd.DataFrame({"k": np.array([3, 14, 159]), "w": [1.0, 2.0, 3.0]})
    from teleharvest_ray.functions.bloom import BloomFilter

    bf = BloomFilter(3, 0.001)
    bf.add_hashes(jn._key_hash(right["k"].to_numpy()))
    passed = int(bf.contains_hashes(jn._key_hash(left["k"].to_numpy())).sum())
    true_matches = int(left["k"].isin(right["k"]).sum())
    assert passed - true_matches < 200  # ~0.1% of 20k, generous margin
    got = jn.bloom_prefiltered_join(rd.from_pandas(left), rd.from_pandas(right), on="k").to_pandas()
    assert len(got) == true_matches


def test_asof_forward_matches_brute_force(ray_session):
    rng = np.random.default_rng(23)
    n_l, n_r = 400, 300
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 12, n_l).astype("int64"),
            "lts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 10**5, n_l), unit="s"),
            "lid": np.arange(n_l, dtype=np.int64),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.integers(0, 12, n_r).astype("int64"),
            "rts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 10**5, n_r) * 7919 % (10**5), unit="s"),
            "rid": np.arange(n_r, dtype=np.int64),
        }
    ).drop_duplicates(["k", "rts"])  # determinism contract
    got = (
        jn.asof_join(
            rd.from_pandas(left).repartition(4),
            rd.from_pandas(right).repartition(3),
            on="k",
            left_ts="lts",
            right_ts="rts",
            right_cols={"rid": "rid", "rts": "match_ts"},
            direction="forward",
        )
        .to_pandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    exp_rows = []
    for _, row in left.iterrows():
        cand = right[(right.k == row.k) & (right.rts >= row.lts)]
        if len(cand):
            best = cand.sort_values("rts").iloc[0]
            exp_rows.append((row.lid, best.rid, best.rts))
    exp = pd.DataFrame(exp_rows, columns=["lid", "rid", "match_ts"])
    assert len(got) == len(exp)
    merged = got.merge(exp, on="lid", suffixes=("", "_exp"))
    assert (merged.rid == merged.rid_exp).all()
    assert (merged.match_ts == merged.match_ts_exp).all()


def test_asof_direction_validation(ray_session):
    import pytest as _pytest

    df = pd.DataFrame({"k": [1], "t": [1], "x": [1]})
    with _pytest.raises(ValueError, match="backward|forward"):
        jn.asof_join(
            rd.from_pandas(df), rd.from_pandas(df), on="k", left_ts="t", right_ts="t",
            right_cols={"x": "x2"}, direction="nearest",
        )
