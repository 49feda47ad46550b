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
    s1 = sp.reservoir_sample(ds, 500)
    s2 = sp.reservoir_sample(rd.from_pandas(ids_df).repartition(11), 500)
    assert len(s1) == 500 and s1.doc_id.is_unique
    assert set(s1.doc_id) == set(s2.doc_id)  # same seed, same layout -> same sample
    # roughly uniform: mean of sampled ids near population mean
    assert abs(s1.doc_id.mean() - ids_df.doc_id.mean()) < ids_df.doc_id.mean() * 0.15
    # k >= n returns everything
    small = rd.from_pandas(ids_df.head(100))
    assert len(sp.reservoir_sample(small, 500)) == 100
