"""Key-space checks: uniqueness, gap-free sequences, referential orphans.

Recasts the reference's composite-PK discipline — ``(id, channel)`` uniqueness
enforced by the database (``models/message.py:34-36``) and the id-monotone
watermark assumption (``models/message.py:75-89``) — as dataset-wide shuffle
checks per the north_rule:

- **dup_key**: duplicate ``(conv_id, turn_idx)`` pairs,
- **seq_gap**: ``turn_idx`` not a gap-free ``0..n`` sequence per conversation,
- **orphan_conv**: a ``conv_id`` present in turns but absent from the
  conversations index (referential resolution).

Scale design (SURVEY.md §4): ONE salted hash-shuffle over only
``(conv_id, turn_idx)`` (columns pruned at the read) serves all three checks.
The salt is ``hash(conv_id, turn_idx) % S`` — the FULL composite key, so a
hot conversation's turns spread uniformly over the S buckets (dup detection is
salt-compatible because identical keys land in the same bucket). Per-conv
sequence statistics are additive across buckets (distinct keys partition by
hash), so gap detection needs only a tiny second groupby over per-bucket
per-conv partials: a conversation is gap-free iff ``min == 0`` and
``max == n_distinct - 1``. Only conversations that FAIL that predicate (a tiny
set) are re-scanned exactly to locate the first missing index — full-data work
stays vectorized; per-group Python touches violators only.

Rows with missing ``conv_id`` are excluded here: they are already flagged
``conv_id_missing`` by the row chain (processor.py:102-104 analog).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset
from ray.data.aggregate import Max, Min, Sum

from ..config import ValidationConfig
from ..functions.hashing import hash_key


def _prep_batch(salt_buckets: int):
    def prep(tbl: pa.Table) -> pa.Table:
        """Per-batch pre-aggregation: (conv_id, turn_idx) → count within the
        batch, plus the salted bucket id. Shrinks the shuffle to three small
        columns regardless of row width."""
        df = pd.DataFrame(
            {
                "conv_id": np.asarray(tbl["conv_id"].to_pandas(), dtype=object),
                "turn_idx": tbl["turn_idx"].to_numpy(zero_copy_only=False),
            }
        )
        df = df[df["conv_id"].notna() & (df["conv_id"] != "")]
        if not len(df):
            return pa.table(
                {
                    "conv_id": pa.nulls(0, pa.string()),
                    "turn_idx": pa.nulls(0, pa.int32()),
                    "cnt": pa.nulls(0, pa.int64()),
                    "salt": pa.nulls(0, pa.int32()),
                }
            )
        g = df.groupby(["conv_id", "turn_idx"], sort=False).size().reset_index(name="cnt")
        salt = (hash_key(g["conv_id"].to_numpy(object), g["turn_idx"].to_numpy()) % np.uint64(salt_buckets)).astype(
            np.int32
        )
        return pa.table(
            {
                "conv_id": pa.array(g["conv_id"].to_numpy(object), pa.string()),
                "turn_idx": pa.array(g["turn_idx"].to_numpy(), pa.int32()),
                "cnt": pa.array(g["cnt"].to_numpy(), pa.int64()),
                "salt": pa.array(salt, pa.int32()),
            }
        )

    return prep


def _bucket_reduce(g: pd.DataFrame) -> pd.DataFrame:
    """Per-salt-bucket reduction: total count per key → dup violations; plus
    per-conversation partial sequence stats (additive across buckets)."""
    per_key = g.groupby(["conv_id", "turn_idx"], sort=False)["cnt"].sum().reset_index()
    dups = per_key[per_key["cnt"] > 1]
    out_dup = pd.DataFrame(
        {
            "kind": "dup",
            "conv_id": dups["conv_id"],
            "turn_idx": dups["turn_idx"].astype("int32"),
            "detail": "count=" + dups["cnt"].astype(str),
            "n_distinct": np.int64(0),
            "min_t": np.int32(0),
            "max_t": np.int32(0),
            "n_rows": np.int64(0),
        }
    )
    conv = per_key.groupby("conv_id", sort=False).agg(
        n_distinct=("turn_idx", "size"),
        min_t=("turn_idx", "min"),
        max_t=("turn_idx", "max"),
        n_rows=("cnt", "sum"),
    ).reset_index()
    out_conv = pd.DataFrame(
        {
            "kind": "conv",
            "conv_id": conv["conv_id"],
            "turn_idx": np.int32(-1),
            "detail": "",
            "n_distinct": conv["n_distinct"].astype("int64"),
            "min_t": conv["min_t"].astype("int32"),
            "max_t": conv["max_t"].astype("int32"),
            "n_rows": conv["n_rows"].astype("int64"),
        }
    )
    return pd.concat([out_dup, out_conv], ignore_index=True)


def keyspace_checks(
    turns: Dataset,
    known_conv_ids,
    cfg: ValidationConfig | None = None,
) -> pa.Table:
    """Run all three key-space checks; returns the violations as a pyarrow
    Table (violations are assumed collectable — they are the anomaly set, not
    the data; at 10^12 rows a pathological input could make this large, in
    which case swap the final ``.to_arrow_refs`` collection for a
    ``write_parquet``).

    ``known_conv_ids``: the conversations-index id collection (the referential
    side). Broadcast via ``ray.put`` as a sorted numpy array; the membership
    probe is a vectorized ``searchsorted`` per batch. At larger-than-memory
    index scale, substitute a Bloom filter here (same seam).
    """
    cfg = cfg or ValidationConfig()
    prep = turns.map_batches(_prep_batch(cfg.salt_buckets), batch_format="pyarrow")
    mixed = prep.groupby("salt").map_groups(_bucket_reduce, batch_format="pandas")

    # dup violations (small) — collect
    dup_tbl = mixed.filter(expr="kind == 'dup'").drop_columns(
        ["kind", "n_distinct", "min_t", "max_t", "n_rows"]
    ).to_arrow_refs()
    dup_parts = [ray.get(r) for r in dup_tbl]

    # per-conv summary: merge bucket partials (vectorized native aggregate)
    conv_sum = (
        mixed.filter(expr="kind == 'conv'")
        .groupby("conv_id")
        .aggregate(
            Sum("n_distinct", alias_name="n_distinct"),
            Min("min_t", alias_name="min_t"),
            Max("max_t", alias_name="max_t"),
            Sum("n_rows", alias_name="n_rows"),
        )
    )

    index_sorted = np.sort(np.asarray(list(known_conv_ids), dtype=object))
    index_ref = ray.put(index_sorted)

    def flag_convs(tbl: pa.Table) -> pa.Table:
        idx = ray.get(index_ref)
        conv = np.asarray(tbl["conv_id"].to_pandas(), dtype=object)
        nd = tbl["n_distinct"].to_numpy(zero_copy_only=False)
        mn = tbl["min_t"].to_numpy(zero_copy_only=False)
        mx = tbl["max_t"].to_numpy(zero_copy_only=False)
        gap = (mn != 0) | (mx != nd - 1)
        if len(idx):
            pos = np.searchsorted(idx, conv)
            pos = np.clip(pos, 0, len(idx) - 1)
            orphan = idx[pos] != conv
        else:
            orphan = np.ones(len(conv), dtype=bool)
        keep = gap | orphan
        return pa.table(
            {
                "conv_id": pa.array(conv[keep], pa.string()),
                "gap": pa.array(gap[keep]),
                "orphan": pa.array(orphan[keep]),
            }
        )

    flagged = conv_sum.map_batches(flag_convs, batch_format="pyarrow").to_pandas()

    out = [t for t in dup_parts if t.num_rows]
    if len(flagged):
        orphans = flagged[flagged["orphan"]]
        if len(orphans):
            out.append(
                pa.table(
                    {
                        "conv_id": pa.array(orphans["conv_id"].to_numpy(object), pa.string()),
                        "turn_idx": pa.array(np.full(len(orphans), -1, np.int32)),
                        "check_id": pa.array(["orphan_conv"] * len(orphans)),
                        "detail": pa.array([""] * len(orphans)),
                    }
                )
            )
        gap_convs = flagged[flagged["gap"]]["conv_id"].to_numpy(object)
        if len(gap_convs):
            out.append(_exact_gap_pass(turns, gap_convs))

    if out:
        out = [
            t.select(["conv_id", "turn_idx", "check_id", "detail"])
            if t.column_names != ["conv_id", "turn_idx", "check_id", "detail"]
            else t
            for t in _norm_dup(out)
        ]
        return pa.concat_tables(out)
    return pa.table(
        {
            "conv_id": pa.nulls(0, pa.string()),
            "turn_idx": pa.nulls(0, pa.int32()),
            "check_id": pa.nulls(0, pa.string()),
            "detail": pa.nulls(0, pa.string()),
        }
    )


def _norm_dup(tables: list[pa.Table]) -> list[pa.Table]:
    """Give dup partials their check_id column."""
    fixed = []
    for t in tables:
        if "check_id" not in t.column_names:
            t = t.append_column("check_id", pa.array(["dup_key"] * t.num_rows))
        fixed.append(t)
    return fixed


def _exact_gap_pass(turns: Dataset, gap_convs: np.ndarray) -> pa.Table:
    """Exact first-missing-index location for the (tiny) violating set:
    broadcast semi-join filter, then per-conv exact scan."""
    bad_sorted = np.sort(gap_convs)
    bad_ref = ray.put(bad_sorted)

    def only_bad(tbl: pa.Table) -> pa.Table:
        bad = ray.get(bad_ref)
        conv = np.asarray(tbl["conv_id"].to_pandas(), dtype=object)
        pos = np.clip(np.searchsorted(bad, conv), 0, len(bad) - 1)
        keep = bad[pos] == conv
        return tbl.filter(pa.array(keep)).select(["conv_id", "turn_idx"])

    small = turns.map_batches(only_bad, batch_format="pyarrow").to_pandas()
    rows = []
    for conv, g in small.groupby("conv_id"):
        u = np.unique(g["turn_idx"].to_numpy())
        expect = np.arange(u.max() + 1)
        missing = np.setdiff1d(expect, u, assume_unique=True)
        first = int(missing[0]) if len(missing) else 0
        n_miss = len(missing) if len(missing) else int(u.min())  # min>0 case
        rows.append((conv, first, "seq_gap", f"missing={n_miss}"))
    return pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "check_id": pa.array([r[2] for r in rows]),
            "detail": pa.array([r[3] for r in rows]),
        }
    )
