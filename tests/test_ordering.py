"""Range-partitioned global ordering: exact ranks, sorted resumable export."""

from __future__ import annotations

import glob
import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

import ray.data as rd

from teleharvest_ray.stages import ordering as od


@pytest.fixture(scope="module")
def skewed_df():
    rng = np.random.default_rng(7)
    n = 25_000
    return pd.DataFrame(
        {
            "k": np.concatenate([rng.exponential(10.0, n - 500), np.full(500, 3.5)]),
            "id": np.arange(n),
        }
    )


def test_global_ranks_exact_with_ties(ray_session, skewed_df):
    ds = rd.from_pandas(skewed_df).repartition(13)
    out = od.global_ranks(ds, "k", ["id"], n_ranges=16).to_pandas()
    exp = skewed_df.sort_values(["k", "id"], kind="stable").reset_index(drop=True)
    got = out.sort_values("rk").reset_index(drop=True)
    assert (got.rk.to_numpy() == np.arange(1, len(exp) + 1)).all()
    assert (got.id.to_numpy() == exp.id.to_numpy()).all()  # full order matches


def test_global_ranks_every_sampling(ray_session, skewed_df):
    ds = rd.from_pandas(skewed_df)
    out = od.global_ranks(ds, "k", ["id"], n_ranges=8, every=100).to_pandas()
    assert (out.rk % 100 == 1).all()
    assert len(out) == int(np.ceil(len(skewed_df) / 100))


def test_export_sorted_ranges_order_and_resume(ray_session, skewed_df, tmp_path):
    ds = rd.from_pandas(skewed_df).repartition(7)
    out_dir = str(tmp_path / "sorted")
    man = od.export_sorted_ranges(ds, "k", out_dir, n_ranges=10, tiebreak=["id"])
    assert not man.skipped.any()
    assert man.rows.sum() == len(skewed_df)
    # cross-range ordering: every range's max <= next range's min
    assert (man.kmax.to_numpy()[:-1] <= man.kmin.to_numpy()[1:]).all()
    # within-range ordering + coverage
    seen = []
    for p in sorted(glob.glob(os.path.join(out_dir, "range=*.parquet"))):
        t = pq.read_table(p).to_pandas()
        assert (np.diff(t.k.to_numpy()) >= 0).all()
        seen.append(t)
    allrows = pd.concat(seen, ignore_index=True)
    assert set(allrows.id) == set(skewed_df.id)
    # resume: delete one range, rerun — only it is rewritten
    victim = man.path.iloc[3]
    os.remove(victim)
    mtimes = {p: os.path.getmtime(p) for p in man.path if p != victim}
    man2 = od.export_sorted_ranges(ds, "k", out_dir, n_ranges=10, tiebreak=["id"])
    assert man2.skipped.sum() == len(man2) - 1
    assert os.path.exists(victim)
    for p, m in mtimes.items():
        assert os.path.getmtime(p) == m


def test_segmented_rank_kernel_properties(ray_session):
    """Randomized inputs (duplicates, skew, negative keys): the distributed
    rank assignment must equal a single-node stable lexsort for every seed."""
    for seed in (0, 1, 2):
        rng = np.random.default_rng(seed)
        n = int(rng.integers(50, 5_000))
        df = pd.DataFrame(
            {
                # heavy duplication: keys drawn from a tiny alphabet
                "k": rng.choice(np.array([-2.5, 0.0, 1e-9, 7.25]), n),
                "id": rng.permutation(n),
            }
        )
        got = (
            od.global_ranks(
                rd.from_pandas(df).repartition(int(rng.integers(1, 9))),
                "k",
                ["id"],
                n_ranges=int(rng.integers(2, 12)),
            )
            .to_pandas()
            .sort_values("rk")
            .reset_index(drop=True)
        )
        exp = df.sort_values(["k", "id"], kind="stable").reset_index(drop=True)
        assert (got.id.to_numpy() == exp.id.to_numpy()).all(), f"seed={seed}"
        assert (got.rk.to_numpy() == np.arange(1, n + 1)).all(), f"seed={seed}"


def test_epoch_shuffle_is_seeded_permutation(ray_session):
    """every=1 yields a bijection onto 1..n that matches the brute-force
    argsort of splitmix64(key ^ seed); different seeds permute differently;
    the same seed reproduces bit-identically across partition layouts."""
    import ray.data as rd
    from teleharvest_ray.functions.hashing import splitmix64
    from teleharvest_ray.stages.ordering import epoch_shuffle_ranks

    keys = np.arange(1000, dtype=np.int64)
    df = pd.DataFrame({"k": keys})

    def run(seed, parts):
        ds = rd.from_pandas(df).repartition(parts)
        out = epoch_shuffle_ranks(ds, "k", seed, n_ranges=8).to_pandas()
        return out.sort_values("rk").reset_index(drop=True)

    got = run(7, 5)
    assert sorted(got["rk"]) == list(range(1, 1001))  # bijection
    h = splitmix64(keys.view(np.uint64) ^ np.uint64(7))
    exp_order = keys[np.argsort(h, kind="stable")]
    assert list(got["k"]) == list(exp_order)
    # layout-independent: same seed, different partitioning -> same result
    pd.testing.assert_frame_equal(got, run(7, 2))
    # epoch-dependent: a different seed is a different permutation
    assert list(run(8, 5)["k"]) != list(got["k"])


def test_ntile_matches_semantics(ray_session):
    """NTILE semantics: first n%B buckets get ceil(n/B) rows; total order
    preserved across bucket boundaries; degenerate n<B gives bucket=rank."""
    import ray.data as rd
    from teleharvest_ray.stages.ordering import ntile_buckets

    rng = np.random.default_rng(3)
    df = pd.DataFrame({"k": rng.permutation(103), "t": np.arange(103)})
    out = (
        ntile_buckets(rd.from_pandas(df).repartition(4), "k", ["t"], n_buckets=5, n_ranges=4)
        .to_pandas()
        .sort_values("rk")
        .reset_index(drop=True)
    )
    sizes = out.groupby("bucket").size()
    assert list(sizes) == [21, 21, 21, 20, 20]  # 103 = 3*21 + 2*20
    assert (out["k"].to_numpy() == np.sort(df["k"].to_numpy())).all()
    assert out.groupby("bucket")["k"].max().is_monotonic_increasing
    small = ntile_buckets(rd.from_pandas(df.head(3)), "k", ["t"], n_buckets=5).to_pandas()
    assert sorted(small["bucket"]) == [1, 2, 3]


def test_morton_interleave_properties(ray_session):
    """Bit-exact vs per-bit reference; locality: the z-curve of a 2x2 block
    is contiguous; out-of-range input raises."""
    import ray.data as rd
    from teleharvest_ray.stages.ordering import morton_interleave

    rng = np.random.default_rng(4)
    a = rng.integers(0, 1 << 21, 200).astype(np.int64)
    b = rng.integers(0, 1 << 21, 200).astype(np.int64)
    ds = rd.from_pandas(pd.DataFrame({"x": a, "y": b}))
    got = morton_interleave(ds, ["x", "y"], out_col="z").to_pandas()

    def ref(x, y):
        return sum(((int(x) >> i & 1) << (2 * i)) | ((int(y) >> i & 1) << (2 * i + 1)) for i in range(21))

    assert all(ref(x, y) == z for x, y, z in zip(got.x, got.y, got.z))
    # locality: (0,0),(1,0),(0,1),(1,1) are ranks 0..3 of the curve
    quad = morton_interleave(
        rd.from_pandas(pd.DataFrame({"x": [0, 1, 0, 1], "y": [0, 0, 1, 1]})), ["x", "y"], "z"
    ).to_pandas()
    assert list(quad.z) == [0, 1, 2, 3]
    bad = rd.from_pandas(pd.DataFrame({"x": [1 << 21], "y": [0]}))
    with pytest.raises(Exception, match="morton"):
        morton_interleave(bad, ["x", "y"]).materialize()


def test_grouped_hll_matches_exact_within_bounds(ray_session):
    import ray.data as rd
    from teleharvest_ray.stages.stats import grouped_hll_distinct

    rng = np.random.default_rng(12)
    df = pd.DataFrame(
        {"g": rng.choice(["a", "b", "c"], 30_000), "k": rng.integers(0, 5_000, 30_000)}
    )
    est = grouped_hll_distinct(rd.from_pandas(df).repartition(8), "g", "k").to_pandas()
    exact = df.groupby("g").k.nunique()
    for _, r in est.iterrows():
        assert abs(r["estimate"] - exact[r["g"]]) / exact[r["g"]] <= 3 * 1.04 / np.sqrt(2**14)


def test_ntile_empty_input_returns_typed_empty(ray_session):
    import ray.data as rd
    from teleharvest_ray.stages.ordering import ntile_buckets

    empty = rd.from_pandas(pd.DataFrame({"k": pd.Series(dtype="int64"), "t": pd.Series(dtype="int64")}))
    out = ntile_buckets(empty, "k", ["t"], n_buckets=4)
    # NB: Dataset.to_pandas() drops the schema of any 0-row dataset in this
    # Ray version — assert through the Dataset API instead
    assert out.count() == 0
    assert list(out.schema().names) == ["rk", "k", "bucket"]


def test_morton_rejects_unsafe_bits(ray_session):
    import ray.data as rd
    from teleharvest_ray.stages.ordering import morton_interleave

    ds = rd.from_pandas(pd.DataFrame({"x": [1], "y": [2]}))
    with pytest.raises(ValueError, match="bits"):
        morton_interleave(ds, ["x", "y"], bits=32)


def test_grouped_moments_partition_invariant_and_match_pandas(ray_session):
    import ray.data as rd
    from teleharvest_ray.stages.stats import corr_from_moments, grouped_moments

    rng = np.random.default_rng(7)
    df = pd.DataFrame(
        {
            "g": rng.integers(0, 3, 5000).astype(str),
            "x": rng.integers(1, 51, 5000).astype(float),
            "y": rng.integers(0, 11, 5000).astype(float),
        }
    )
    outs = []
    for parts in (1, 7):
        m = grouped_moments(rd.from_pandas(df).repartition(parts), "g", "x", "y")
        m["corr_ppm"] = corr_from_moments(m)
        outs.append(m.sort_values("g").reset_index(drop=True))
    # int64 moments are exact and order-independent -> bit-identical
    pd.testing.assert_frame_equal(outs[0], outs[1])
    for g, sub in df.groupby("g"):
        row = outs[0][outs[0].g == g].iloc[0]
        assert row["n"] == len(sub)
        assert abs(row["corr_ppm"] / 1e6 - sub.x.corr(sub.y)) < 2e-6


def test_skyline_mask_matches_bruteforce():
    import numpy as np
    from teleharvest_ray.stages.ordering import skyline_mask_2d

    rng = np.random.default_rng(3)
    for _ in range(200):
        n = int(rng.integers(0, 60))
        s = rng.integers(0, 12, n).astype(np.int64)  # small domain -> heavy ties
        c = rng.integers(0, 12, n).astype(np.int64)
        got = skyline_mask_2d(s, c)
        exp = np.ones(n, dtype=bool)
        for i in range(n):
            for j in range(n):
                if (s[j] >= s[i] and c[j] <= c[i]) and (s[j] > s[i] or c[j] < c[i]):
                    exp[i] = False
                    break
        assert (got == exp).all()
