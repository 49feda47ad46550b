"""Wide-aggregate (OLAP-style) operators: rollup levels, pivoted indicator
aggregation, and distinct set operations.

All three follow the same scale discipline: exactly ONE shuffle over
data-sized input (the finest groupby / the tagged union), after which every
derived level re-aggregates the already-aggregated — group-count-sized —
result. No reference analog (SURVEY.md §2.10); these are the standard wide
steps of a corpus-reporting pipeline (per-slice totals with subtotals,
crosstab counts, audience overlap/difference).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset
from ray.data.aggregate import Count, Max, Min, Sum


def grouping_sets_sums(
    ds: Dataset,
    keys: list[str],
    sets: list[list[str]],
    sum_cols: list[str],
    all_marker: str = "ALL",
) -> Dataset:
    """GROUP BY GROUPING SETS over additive aggregates: the finest level
    (all of ``keys``) is ONE hash-shuffle groupby over the data; every other
    requested set re-aggregates the finest RESULT — additive aggregates
    (count, sum) compose, so the data is scanned and shuffled exactly once.
    Absent key columns carry ``all_marker`` (the SQL oracle mirrors with
    COALESCE); the empty set is the grand total. The finest level is
    materialized before fan-out: it is group-count-sized by construction,
    and each derived set would otherwise re-execute the full scan.
    """
    keyset = set(keys)
    norm: list[tuple[str, ...]] = []
    for s in sets:
        if not set(s) <= keyset:
            raise ValueError(f"grouping set {s} not a subset of keys {keys}")
        t = tuple(k for k in keys if k in set(s))  # canonical key order
        if t not in norm:
            norm.append(t)
    scols = [f"sum_{c}" for c in sum_cols]

    def partial(batch: "pd.DataFrame") -> pa.Table:
        # combiner: one row per (block, key) leaves the scan, not the data
        g = batch.groupby(keys, sort=False, dropna=False).agg(
            n_rows=(keys[0], "size"), **{f"sum_{c}": (c, "sum") for c in sum_cols}
        )
        return pa.Table.from_pandas(g.reset_index(), preserve_index=False)

    # coalesce key-x-block-sized partials before the groupby: aggregate
    # output partition count follows input block count, and a handful of
    # keys over many blocks yields empty schema-less output blocks. The
    # coalesce width is sized from the MEASURED partial count (materialize
    # is fine — partials shuffle next anyway) so a high-cardinality rollup
    # is not funneled through two giant blocks.
    partials = ds.map_batches(partial, batch_format="pandas", batch_size=None).materialize()
    n_partials = partials.count()
    width = int(min(512, max(2, n_partials // 500_000 + 1)))
    re_aggs = [Sum("n_rows", alias_name="n_rows")] + [Sum(s, alias_name=s) for s in scols]
    finest = partials.repartition(width).groupby(keys).aggregate(*re_aggs).materialize()
    lvl_width = int(min(512, max(1, finest.count() // 500_000 + 1)))

    def fill(tbl: pa.Table, present: list[str]) -> pa.Table:
        cols = {}
        for k in keys:
            if k in present:
                cols[k] = pc.cast(tbl[k], pa.string())
            else:
                cols[k] = pa.array([all_marker] * tbl.num_rows, pa.string())
        cols["n_rows"] = tbl["n_rows"]
        for s in scols:
            cols[s] = tbl[s]
        return pa.table(cols)

    import ray.data as rd

    levels = []
    for grp in norm:
        if len(grp) == len(keys):
            levels.append(finest.map_batches(lambda t: fill(t, keys), batch_format="pyarrow"))
        elif grp:
            lvl = finest.repartition(lvl_width).groupby(list(grp)).aggregate(*re_aggs)
            levels.append(
                lvl.map_batches(lambda t, p=list(grp): fill(t, p), batch_format="pyarrow")
            )
        else:
            total = finest.aggregate(
                Sum("n_rows", alias_name="n_rows"), *[Sum(s, alias_name=s) for s in scols]
            )
            total_tbl = pa.table(
                {
                    **{k: pa.array([all_marker], pa.string()) for k in keys},
                    "n_rows": pa.array([total["n_rows"]], pa.int64()),
                    **{s: pa.array([total[s]]) for s in scols},
                }
            )
            levels.append(rd.from_arrow(total_tbl))
    out = levels[0]
    for lvl in levels[1:]:
        out = out.union(lvl)
    return out


def rollup_sums(
    ds: Dataset,
    keys: list[str],
    sum_cols: list[str],
    all_marker: str = "ALL",
) -> Dataset:
    """GROUP BY ROLLUP(keys): the grouping sets are the prefixes of ``keys``
    down to the grand total (one data shuffle total — see
    :func:`grouping_sets_sums`)."""
    sets = [keys[:d] for d in range(len(keys), -1, -1)]
    return grouping_sets_sums(ds, keys, sets, sum_cols, all_marker)


def cube_sums(
    ds: Dataset,
    keys: list[str],
    sum_cols: list[str],
    all_marker: str = "ALL",
) -> Dataset:
    """GROUP BY CUBE(keys): every subset of ``keys`` (2^k sets), all derived
    from the single finest shuffle — re-aggregation input is group-count-
    sized, so the 2^k fan-out never rescans the data."""
    from itertools import combinations

    sets: list[list[str]] = []
    for r in range(len(keys), -1, -1):
        for combo in combinations(keys, r):
            sets.append(list(combo))
    return grouping_sets_sums(ds, keys, sets, sum_cols, all_marker)


def pivot_counts(
    ds: Dataset,
    row_key: str,
    indicator_fn,
) -> Dataset:
    """Crosstab: one pass emits indicator/measure columns per pivot bucket
    (``indicator_fn(tbl) -> dict[name, pa.Array]``), then ONE groupby-sum
    over ``row_key`` — partial per-block combines mean only
    (n_groups × n_buckets) cells ever shuffle."""

    def widen(tbl: pa.Table) -> pa.Table:
        cols = {row_key: tbl[row_key]}
        cols.update(indicator_fn(tbl))
        t = pa.table(cols)
        # combiner: collapse to one row per (block, row_key) before the
        # shuffle; only (n_groups x n_buckets) cells move per block
        names = [c for c in t.column_names if c != row_key]
        g = t.group_by(row_key).aggregate([(c, "sum") for c in names])
        return pa.table({row_key: g[row_key], **{c: g[f"{c}_sum"] for c in names}})

    wide = ds.map_batches(widen, batch_format="pyarrow", batch_size=None).repartition(2)
    names = [c for c in wide.schema().names if c != row_key]
    return wide.groupby(row_key).aggregate(*[Sum(c, alias_name=c) for c in names])


def distinct_set_op(
    ds_a: Dataset,
    ds_b: Dataset,
    key: str,
    op: str,
) -> Dataset:
    """Distinct-key set operation (``except`` / ``intersect`` / ``union``):
    tag each side, union the tagged key streams, and decide membership per
    key from ONE groupby's (min_side, max_side) — the same single-shuffle
    shape whatever the op. Keys are deduplicated per block before the
    shuffle, so at most one row per (block, key) moves."""
    if op not in ("except", "intersect", "union"):
        raise ValueError(op)

    def tag(side: int):
        def fn(tbl: pa.Table) -> pa.Table:
            col = tbl[key]
            valid = col.drop_null().unique()
            return pa.table({key: valid, "side": pa.array([side] * len(valid), pa.int64())})

        return fn

    tagged = (
        ds_a.map_batches(tag(0), batch_format="pyarrow")
        .union(ds_b.map_batches(tag(1), batch_format="pyarrow"))
        .materialize()  # key-stream-sized; shuffled next anyway
    )
    # coalesce before the groupby: aggregate output partition count follows
    # input block count, and few keys over many tagged blocks yields empty
    # schema-less blocks (the rollup_sums pattern, width from measured rows)
    width = int(min(512, max(2, tagged.count() // 500_000 + 1)))
    grouped = tagged.repartition(width).groupby(key).aggregate(
        Min("side", alias_name="lo"), Max("side", alias_name="hi")
    )

    def pick(tbl: pa.Table) -> pa.Table:
        lo, hi = tbl["lo"], tbl["hi"]
        if op == "except":
            keep = pc.equal(hi, 0)
        elif op == "intersect":
            keep = pc.and_(pc.equal(lo, 0), pc.equal(hi, 1))
        else:
            keep = pc.greater_equal(hi, 0)
        return tbl.filter(keep).select([key])

    return grouped.map_batches(pick, batch_format="pyarrow")
