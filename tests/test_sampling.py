"""Deterministic sampling / split operators: invariants that matter for
training-data pipelines — stability, disjointness, order-independence."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from teleharvest_ray.stages import sampling as sp


@pytest.fixture(scope="module")
def ids_df():
    return pd.DataFrame({"doc_id": np.arange(20_000), "v": np.arange(20_000) * 3})


def test_hash_split_disjoint_complete_and_sized(ray_session, ids_df):
    ds = rd.from_pandas(ids_df)
    out = sp.hash_split(ds, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}).to_pandas()
    assert len(out) == len(ids_df)  # complete: every row assigned exactly once
    frac = out.split.value_counts(normalize=True)
    assert abs(frac["train"] - 0.8) < 0.02
    assert abs(frac["val"] - 0.1) < 0.01
    assert abs(frac["test"] - 0.1) < 0.01


def test_hash_split_stable_under_order_and_partitioning(ray_session, ids_df):
    """A key's split must not depend on row order or block layout."""
    base = sp.hash_split(rd.from_pandas(ids_df), "doc_id", {"a": 0.5, "b": 0.5}).to_pandas()
    shuffled = ids_df.sample(frac=1.0, random_state=3).reset_index(drop=True)
    relaid = sp.hash_split(
        rd.from_pandas(shuffled).repartition(13), "doc_id", {"a": 0.5, "b": 0.5}
    ).to_pandas()
    m1 = dict(zip(base.doc_id, base.split))
    m2 = dict(zip(relaid.doc_id, relaid.split))
    assert m1 == m2


def test_hash_split_bad_fractions_raise(ray_session, ids_df):
    with pytest.raises(ValueError):
        sp.hash_split(rd.from_pandas(ids_df), "doc_id", {"a": 0.5, "b": 0.3})


def test_bernoulli_sample_deterministic_and_sized(ray_session, ids_df):
    ds = rd.from_pandas(ids_df)
    s1 = sp.bernoulli_sample(ds, "doc_id", 0.1).to_pandas()
    s2 = sp.bernoulli_sample(rd.from_pandas(ids_df).repartition(7), "doc_id", 0.1).to_pandas()
    assert set(s1.doc_id) == set(s2.doc_id)  # decision is per-key, not per-run
    assert abs(len(s1) / len(ids_df) - 0.1) < 0.01
    # different seed -> different (but still deterministic) subset
    s3 = sp.bernoulli_sample(ds, "doc_id", 0.1, seed=999).to_pandas()
    assert set(s3.doc_id) != set(s1.doc_id)


def test_reservoir_sample_exact_k_and_deterministic(ray_session, ids_df):
    ds = rd.from_pandas(ids_df).repartition(11)
    s1 = sp.reservoir_sample(ds, "doc_id", 500)
    # keyed priority sampling: the sample is layout-INDEPENDENT, so even a
    # different block count yields the identical key set
    s2 = sp.reservoir_sample(rd.from_pandas(ids_df).repartition(3), "doc_id", 500)
    assert len(s1) == 500 and s1.doc_id.is_unique
    assert set(s1.doc_id) == set(s2.doc_id)
    # roughly uniform: mean of sampled ids near population mean
    assert abs(s1.doc_id.mean() - ids_df.doc_id.mean()) < ids_df.doc_id.mean() * 0.15
    # different seed -> different subset; k >= n returns everything
    s3 = sp.reservoir_sample(ds, "doc_id", 500, seed=1234)
    assert set(s3.doc_id) != set(s1.doc_id)
    small = rd.from_pandas(ids_df.head(100))
    assert len(sp.reservoir_sample(small, "doc_id", 500)) == 100


def test_key_hash_stable_with_nulls_in_block(ray_session):
    """An int key's hash must not change because some OTHER row in its block
    holds a null (type dispatch reads the Arrow type, not the numpy dtype)."""
    import pyarrow as pa

    clean = sp._key_hash_u64(pa.array([1, 3], pa.int64()), 97)
    dirty = sp._key_hash_u64(pa.array([1, None, 3], pa.int64()), 97)
    assert clean[0] == dirty[0] and clean[1] == dirty[2]
    # null keys get one deterministic bucket, not a crash
    assert dirty[1] == sp._key_hash_u64(pa.array([None], pa.int64()), 97)[0]


def test_pack_block_tags_distinct_for_blocks_sharing_first_row(ray_session):
    """Two blocks that happen to START with the same row must still pack
    into distinct shards (tag folds ALL keys, not the first row)."""
    import pyarrow as pa

    import ray.data as rd2

    b1 = pd.DataFrame({"doc_id": [0, 1, 2, 3, 4], "tokens": [100, 200, 300, 400, 500]})
    b2 = pd.DataFrame({"doc_id": [0, 11, 12, 13, 14], "tokens": [100, 200, 300, 400, 500]})
    ds = rd2.from_arrow([pa.Table.from_pandas(b1), pa.Table.from_pandas(b2)])
    out = sp.pack_sequences(ds, "doc_id", "tokens", budget=1000).to_pandas()
    per_shard = out.groupby("shard_id").tokens.agg(["sum", "count"])
    over = per_shard[per_shard["sum"] > 1000]
    assert (over["count"] == 1).all(), per_shard.to_dict()


def test_pack_sequences_budget_and_coverage(ray_session):
    rng = np.random.default_rng(23)
    df = pd.DataFrame({"doc_id": np.arange(5000), "tokens": rng.integers(10, 900, 5000)})
    df.loc[0, "tokens"] = 5000  # oversize row -> singleton shard
    ds = rd.from_pandas(df).repartition(6)
    out = sp.pack_sequences(ds, "doc_id", "tokens", budget=4096).to_pandas()
    assert len(out) == 5000 and out.shard_id.notna().all()  # every row assigned
    per_shard = out.groupby("shard_id").tokens.agg(["sum", "count"])
    over = per_shard[per_shard["sum"] > 4096]
    # only shards holding a single oversize row may exceed the budget
    assert (over["count"] == 1).all()
    # packing is efficient: average shard fill well above half the budget
    multi = per_shard[per_shard["count"] > 1]
    assert multi["sum"].mean() > 4096 * 0.6
    # deterministic across runs
    out2 = sp.pack_sequences(rd.from_pandas(df).repartition(6), "doc_id", "tokens", budget=4096).to_pandas()
    assert dict(zip(out.doc_id, out.shard_id)) == dict(zip(out2.doc_id, out2.shard_id))


def test_export_splits_layout(ray_session, tmp_path):
    import glob
    import os

    import pyarrow.parquet as pq

    df = pd.DataFrame({"doc_id": np.arange(3000), "text": ["x"] * 3000})
    out = str(tmp_path / "corpus")
    sp.export_splits(rd.from_pandas(df), "doc_id", {"train": 0.9, "val": 0.1}, out)
    train_ids = set()
    val_ids = set()
    for f in glob.glob(os.path.join(out, "split=train", "*.parquet")):
        train_ids |= set(pq.read_table(f)["doc_id"].to_pylist())
    for f in glob.glob(os.path.join(out, "split=val", "*.parquet")):
        val_ids |= set(pq.read_table(f)["doc_id"].to_pylist())
    assert train_ids | val_ids == set(range(3000))
    assert not (train_ids & val_ids)
    assert abs(len(train_ids) / 3000 - 0.9) < 0.03


def test_stratified_sample_rates_and_partition_invariance(ray_session):
    n = 30_000
    df = pd.DataFrame(
        {
            "id": np.arange(n),
            "cls": np.where(np.arange(n) % 10 < 8, "common", "rare"),
        }
    )
    rates = {"common": 0.1, "rare": 1.0}
    s1 = sp.stratified_sample(rd.from_pandas(df), "cls", "id", rates).to_pandas()
    # per-stratum rates respected
    kept = s1.cls.value_counts()
    assert kept["rare"] == (df.cls == "rare").sum()  # rate 1.0 keeps everything
    assert abs(kept["common"] / (df.cls == "common").sum() - 0.1) < 0.02
    # decision is per-(key, stratum): invariant under order + block layout
    relaid = df.sample(frac=1.0, random_state=5).reset_index(drop=True)
    s2 = sp.stratified_sample(
        rd.from_pandas(relaid).repartition(9), "cls", "id", rates
    ).to_pandas()
    assert set(s1.id) == set(s2.id)


def test_stratified_sample_default_rate_and_nulls(ray_session):
    df = pd.DataFrame(
        {"id": np.arange(4_000), "cls": ["known", None] * 2_000}
    )
    out = sp.stratified_sample(
        rd.from_pandas(df), "cls", "id", {"known": 1.0}, default_rate=0.25
    ).to_pandas()
    assert (out.cls == "known").sum() == 2_000  # listed stratum keeps its rate
    null_kept = out.cls.isna().sum()
    assert abs(null_kept / 2_000 - 0.25) < 0.05  # unknown/null -> default_rate
    # default_rate=0 drops unlisted strata entirely
    out0 = sp.stratified_sample(
        rd.from_pandas(df), "cls", "id", {"known": 0.5}
    ).to_pandas()
    assert out0.cls.notna().all()


def test_stratified_sample_matches_bernoulli_when_uniform(ray_session, ids_df):
    """With every stratum at rate p and the same seed, stratified == bernoulli
    (same keyed hash, same threshold) — pins the two kernels together."""
    df = ids_df.assign(cls=np.where(ids_df.doc_id % 2 == 0, "a", "b"))
    strat = sp.stratified_sample(
        rd.from_pandas(df), "cls", "doc_id", {"a": 0.2, "b": 0.2}, seed=131
    ).to_pandas()
    bern = sp.bernoulli_sample(rd.from_pandas(df), "doc_id", 0.2, seed=131).to_pandas()
    assert set(strat.doc_id) == set(bern.doc_id)


def test_cut_rounding_consistent_for_inexact_rates(ray_session, ids_df):
    """A rate like 1/6 (fractional r*1e6) must map to the SAME integer cut in
    stratified and bernoulli sampling — the latent truncation-vs-round
    divergence the review flagged."""
    df = ids_df.assign(cls="only")
    p = 1 / 6
    strat = sp.stratified_sample(rd.from_pandas(df), "cls", "doc_id", {"only": p}, seed=131).to_pandas()
    bern = sp.bernoulli_sample(rd.from_pandas(df), "doc_id", p, seed=131).to_pandas()
    assert set(strat.doc_id) == set(bern.doc_id)


def test_weighted_sample_proportional_and_layout_stable(ray_session):
    """Weighted inclusion scales with weight (chi-square-loose check on a
    2x-weight class) and the selected set is identical across partition
    layouts (pure function of key + seed)."""
    import ray.data as rd

    from teleharvest_ray.stages.sampling import weighted_sample

    n = 20_000
    df = pd.DataFrame({"k": np.arange(n), "w": np.where(np.arange(n) % 2 == 0, 4.0, 1.0)})

    def run(parts):
        return weighted_sample(rd.from_pandas(df).repartition(parts), "k", "w", k=2000, seed=3)

    a, b = run(4), run(13)
    pd.testing.assert_frame_equal(a, b)  # layout-independent
    heavy = (a["k"] % 2 == 0).mean()
    # threshold t solves (1-t^4)+(1-t)=0.2 -> t~0.959, heavy share
    # (1-t^4)/0.2 ~ 0.79; allow sampling noise around it
    assert 0.72 <= heavy <= 0.86
    # priorities for w=4 use the sqrt chain: all in [0, 1]
    assert a["priority"].between(0, 1).all()
    assert len(a) == 2000 and a["k"].is_unique
