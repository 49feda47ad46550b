"""Unit tests for stages/olap.py: rollup levels, pivot combiner, set ops."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest

import ray.data as rd

from teleharvest_ray.stages import olap


@pytest.fixture()
def sales(ray_session):
    df = pd.DataFrame(
        {
            "region": ["e", "e", "e", "w", "w", "n"],
            "cat": ["a", "a", "b", "a", "b", "b"],
            "amount": [1.0, 2.0, 4.0, 8.0, 16.0, 32.0],
        }
    )
    return df, rd.from_pandas(df).repartition(3)


def test_rollup_levels_match_pandas(sales):
    df, ds = sales
    out = olap.rollup_sums(ds, ["region", "cat"], ["amount"]).to_pandas()
    out = out.sort_values(["region", "cat"]).reset_index(drop=True)
    # finest
    finest = df.groupby(["region", "cat"]).amount.agg(["count", "sum"]).reset_index()
    for _, r in finest.iterrows():
        row = out[(out.region == r["region"]) & (out.cat == r["cat"])]
        assert len(row) == 1
        assert int(row.n_rows.iloc[0]) == r["count"]
        assert row.sum_amount.iloc[0] == pytest.approx(r["sum"])
    # subtotal per region (cat rolled to ALL)
    for reg, grp in df.groupby("region"):
        row = out[(out.region == reg) & (out.cat == "ALL")]
        assert int(row.n_rows.iloc[0]) == len(grp)
        assert row.sum_amount.iloc[0] == pytest.approx(grp.amount.sum())
    # grand total
    row = out[(out.region == "ALL") & (out.cat == "ALL")]
    assert int(row.n_rows.iloc[0]) == len(df)
    assert row.sum_amount.iloc[0] == pytest.approx(df.amount.sum())
    # row count: finest + regions + 1
    assert len(out) == len(finest) + df.region.nunique() + 1


def test_pivot_counts_matches_crosstab(sales):
    df, ds = sales

    def ind(tbl: pa.Table) -> dict:
        return {
            "n_a": pc.cast(pc.equal(tbl["cat"], "a"), pa.int64()),
            "n_b": pc.cast(pc.equal(tbl["cat"], "b"), pa.int64()),
            "sum_amount": tbl["amount"],
        }

    out = olap.pivot_counts(ds, "region", ind).to_pandas().set_index("region")
    ct = pd.crosstab(df.region, df.cat)
    for reg in df.region.unique():
        assert out.loc[reg, "n_a"] == ct.loc[reg].get("a", 0)
        assert out.loc[reg, "n_b"] == ct.loc[reg].get("b", 0)
        assert out.loc[reg, "sum_amount"] == pytest.approx(
            df[df.region == reg].amount.sum()
        )


@pytest.mark.parametrize(
    "op,expected",
    [
        ("except", {1, 2}),
        ("intersect", {3, 4}),
        ("union", {1, 2, 3, 4, 5, 6}),
    ],
)
def test_distinct_set_op(ray_session, op, expected):
    a = rd.from_pandas(pd.DataFrame({"k": [1, 2, 3, 4, 3, None]})).repartition(2)
    b = rd.from_pandas(pd.DataFrame({"k": [3, 4, 5, 6, None, 6]})).repartition(2)
    got = set(olap.distinct_set_op(a, b, "k", op).to_pandas().k.astype("int64"))
    assert got == expected


def test_set_op_rejects_unknown(ray_session):
    a = rd.from_items([{"k": 1}])
    with pytest.raises(ValueError):
        olap.distinct_set_op(a, a, "k", "minus")


def test_skew_join_matches_plain_join(ray_session):
    """Half the left rows share ONE hot key; skew_join's hot-broadcast +
    cold-bucketed union must reproduce the plain inner join exactly, and the
    no-hot-keys fallback must too."""
    from teleharvest_ray.stages.joins import skew_join

    n = 8_000
    left = pd.DataFrame(
        {"k": np.r_[np.full(n // 2, 7), np.arange(n // 2)], "v": np.arange(n)}
    )
    right = pd.DataFrame({"k": np.arange(n // 2), "w": np.arange(n // 2) * 10})
    exp = left.merge(right, on="k").sort_values(["k", "v"]).reset_index(drop=True)
    lds = rd.from_pandas(left).repartition(4)
    rds = rd.from_pandas(right).repartition(2)
    for frac in (0.05, 0.99):  # hot path active / fallback to pure bucketed
        got = (
            skew_join(lds, rds, on="k", hot_frac=frac)
            .to_pandas()
            .sort_values(["k", "v"])
            .reset_index(drop=True)[exp.columns.tolist()]
            .astype(exp.dtypes.to_dict())
        )
        pd.testing.assert_frame_equal(got, exp)


def test_cube_levels_match_pandas(sales):
    df, ds = sales
    out = olap.cube_sums(ds, ["region", "cat"], ["amount"]).to_pandas()
    # the cube adds the cat-only slice on top of the rollup's sets
    for cat, grp in df.groupby("cat"):
        row = out[(out.region == "ALL") & (out.cat == cat)]
        assert int(row.n_rows.iloc[0]) == len(grp)
        assert row.sum_amount.iloc[0] == pytest.approx(grp.amount.sum())
    finest = df.groupby(["region", "cat"]).size()
    assert len(out) == len(finest) + df.region.nunique() + df.cat.nunique() + 1


def test_grouping_sets_rejects_bad_set(sales):
    _, ds = sales
    with pytest.raises(ValueError, match="not a subset"):
        olap.grouping_sets_sums(ds, ["region"], [["bogus"]], ["amount"])


def test_skew_join_left_outer_na_semantics(ray_session):
    """LEFT/OUTER skew joins: the hot key (present in left only at half the
    rows, ABSENT from right) must surface with NA right columns, dtypes
    matching the bucketed branch's promoted map, across both branches."""
    from teleharvest_ray.stages.joins import skew_join

    n = 6_000
    left = pd.DataFrame(
        {"k": np.r_[np.full(n // 2, 7_000_000), np.arange(n // 2)], "v": np.arange(n)}
    )
    # right misses the hot key AND every 3rd cold key
    cold = np.arange(n // 2)
    cold = cold[cold % 3 != 0]
    right = pd.DataFrame({"k": cold, "w": cold * 10})
    lds = rd.from_pandas(left).repartition(4)
    rds = rd.from_pandas(right).repartition(2)
    for how in ("left", "outer"):
        exp = left.merge(right, on="k", how=how).sort_values(["k", "v"]).reset_index(drop=True)
        got = (
            skew_join(lds, rds, on="k", how=how, hot_frac=0.05)
            .to_pandas()
            .sort_values(["k", "v"])
            .reset_index(drop=True)[exp.columns.tolist()]
        )
        # hot rows are unmatched -> w must be NaN there, float64 everywhere
        assert got["w"].dtype == np.dtype("float64")
        pd.testing.assert_frame_equal(got.astype(exp.dtypes.to_dict()), exp)
