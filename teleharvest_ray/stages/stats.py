"""Per-partition column statistics with mergeable sketches, plus drift checks.

G6/G7 of the operator inventory (SURVEY.md §2.5): null rate, min/max, length
histograms, approx-distinct (HyperLogLog) and token-length quantile sketches,
computed per partition inside the partition validator and merged across
partitions by sketch union (associative ⇒ any reduce tree works). The drift
check (north_rule; analog of the published-set similarity gate,
processor.py:138-143) compares a partition's role/tool frequencies
(chi-square), text-length ECDF (KS) and token-count quantiles (relative
delta) against the broadcast :class:`ReferenceProfile`.
"""

from __future__ import annotations

import pickle
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..config import ValidationConfig
from ..functions.hashing import hash_strings
from ..functions.sketches import HistogramSketch, HyperLogLog, KLLSketch
from ..functions.textfuncs import token_count
from ..state.profile import ReferenceProfile

_METRIC_COLS = ("views", "reactions", "forwards")


def partition_stats(tbl: pa.Table, cfg: ValidationConfig) -> dict:
    """Column stats for one partition; all members are mergeable."""
    out: dict = {"n_rows": tbl.num_rows, "null_counts": {}, "numeric": {}}
    for name in tbl.column_names:
        if name.startswith("_"):
            continue
        col = tbl[name]
        out["null_counts"][name] = int(pc.sum(pc.is_null(col).cast(pa.int64())).as_py() or 0)
    # approx-distinct conversations (HLL)
    hll = HyperLogLog(p=cfg.hll_p)
    conv = tbl["conv_id"].to_pandas()
    hll.update_strings(conv[conv.notna()].to_numpy(dtype=object))
    out["conv_hll"] = hll
    # text length histogram (exact, mergeable; powers the KS drift statistic)
    len_hist = HistogramSketch(cfg.len_hist_bin, cfg.len_hist_max)
    lens = pc.utf8_length(tbl["text"]).to_numpy(zero_copy_only=False).astype(np.float64)
    len_hist.update(lens[~np.isnan(lens)])
    out["len_hist"] = len_hist
    # token-count histogram (embedding-proxy quantile sketch)
    token_hist = HistogramSketch(1, 1024)
    toks = token_count(tbl["text"]).astype(np.float64)
    token_hist.update(toks[~np.isnan(toks)])
    out["token_hist"] = token_hist
    # engagement-rate quantile sketch: ER is an UNBOUNDED float (reactions +
    # forwards can exceed views), so the fixed-bin HistogramSketch doesn't
    # apply — KLL handles arbitrary ranges at fixed memory. Consumed by
    # stats_summary and the cross-run drift comparison (compare_run_stats).
    er_kll = KLLSketch(k=cfg.kll_k)
    if all(c in tbl.column_names for c in _METRIC_COLS):
        views = tbl["views"].to_numpy(zero_copy_only=False).astype(np.float64)
        reac = tbl["reactions"].to_numpy(zero_copy_only=False).astype(np.float64)
        fwd = tbl["forwards"].to_numpy(zero_copy_only=False).astype(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            er = np.where(views > 0, (reac + fwd) / np.maximum(views, 1), 0.0)
        er_kll.update(er[~(np.isnan(views) | np.isnan(reac) | np.isnan(fwd))])
    out["er_kll"] = er_kll
    # categorical frequencies
    out["role_freq"] = _freq(tbl, "role")
    out["tool_freq"] = _freq(tbl, "tool")
    # numeric/timestamp min-max
    for name in ("turn_idx", "views", "reactions", "forwards"):
        if name in tbl.column_names:
            mm = pc.min_max(tbl[name]).as_py()
            out["numeric"][name] = {"min": mm["min"], "max": mm["max"]}
    if "ts" in tbl.column_names:
        mm = pc.min_max(tbl["ts"]).as_py()
        out["numeric"]["ts"] = {"min": str(mm["min"]), "max": str(mm["max"])}
    return out


def _freq(tbl: pa.Table, name: str) -> dict:
    s = pd.Series(tbl[name].to_pandas())
    vc = s.value_counts(dropna=False)
    return {("<null>" if pd.isna(k) else str(k)): int(v) for k, v in vc.items()}


def merge_stats(a: dict, b: dict) -> dict:
    """Associative merge of two partition-stat dicts."""
    out = {
        "n_rows": a["n_rows"] + b["n_rows"],
        "null_counts": {
            k: a["null_counts"].get(k, 0) + b["null_counts"].get(k, 0)
            for k in set(a["null_counts"]) | set(b["null_counts"])
        },
        "conv_hll": a["conv_hll"].merge(b["conv_hll"]),
        "len_hist": a["len_hist"].merge(b["len_hist"]),
        "token_hist": a["token_hist"].merge(b["token_hist"]),
        # .get: checkpoint sketch states from pre-ER-KLL runs merge cleanly
        "er_kll": _merge_kll(a.get("er_kll"), b.get("er_kll")),
        "role_freq": _merge_freq(a["role_freq"], b["role_freq"]),
        "tool_freq": _merge_freq(a["tool_freq"], b["tool_freq"]),
        "numeric": {},
    }
    for k in set(a["numeric"]) | set(b["numeric"]):
        av, bv = a["numeric"].get(k), b["numeric"].get(k)
        if av is None or bv is None:
            out["numeric"][k] = av or bv
        else:
            mn = min(x for x in (av["min"], bv["min"]) if x is not None) if (av["min"] is not None or bv["min"] is not None) else None
            mx = max(x for x in (av["max"], bv["max"]) if x is not None) if (av["max"] is not None or bv["max"] is not None) else None
            out["numeric"][k] = {"min": mn, "max": mx}
    return out


def _merge_freq(a: dict, b: dict) -> dict:
    return {k: a.get(k, 0) + b.get(k, 0) for k in set(a) | set(b)}


def _merge_kll(a, b):
    if a is None:
        return b if b is not None else KLLSketch()
    if b is None:
        return a
    return a.merge(b)


def stats_to_bytes(stats: dict) -> bytes:
    return zlib.compress(pickle.dumps(stats, protocol=4), 3)


def stats_from_bytes(b: bytes) -> dict:
    return pickle.loads(zlib.decompress(b))


def _kll_summary(kll) -> dict | None:
    if kll is None or kll.n == 0:
        return None
    return {
        "n": kll.n,
        "p50": round(float(kll.quantile(0.5)), 6),
        "p95": round(float(kll.quantile(0.95)), 6),
        "p99": round(float(kll.quantile(0.99)), 6),
    }


def stats_summary(stats: dict) -> dict:
    """JSON-safe summary of merged stats (for reports / checkpoint records)."""
    return {
        "n_rows": stats["n_rows"],
        "null_counts": stats["null_counts"],
        "approx_distinct_convs": round(stats["conv_hll"].estimate(), 1),
        "text_len": {
            "mean": None if stats["len_hist"].total == 0 else round(stats["len_hist"].mean(), 2),
            "p50": stats["len_hist"].quantile(0.5),
            "p95": stats["len_hist"].quantile(0.95),
            "min": stats["len_hist"].vmin,
            "max": stats["len_hist"].vmax,
        },
        "token_count": {
            "p50": stats["token_hist"].quantile(0.5),
            "p95": stats["token_hist"].quantile(0.95),
        },
        "engagement_rate": _kll_summary(stats.get("er_kll")),
        "role_freq": stats["role_freq"],
        "tool_freq": stats["tool_freq"],
        "numeric": stats["numeric"],
    }


# ---------------------------------------------------------------------------
# drift
# ---------------------------------------------------------------------------


def chi_square_frac(obs: dict, exp: dict) -> float:
    """Chi-square statistic over FREQUENCY FRACTIONS (size-independent):
    sum((o_i - e_i)^2 / e_i) over the union of categories, with a small
    epsilon on expected fractions for unseen categories."""
    keys = set(obs) | set(exp)
    n_o = sum(obs.values()) or 1
    n_e = sum(exp.values()) or 1
    stat = 0.0
    for k in keys:
        o = obs.get(k, 0) / n_o
        e = max(exp.get(k, 0) / n_e, 1e-6)
        stat += (o - e) ** 2 / e
    return stat


def drift_check(stats: dict, profile: ReferenceProfile, cfg: ValidationConfig) -> list[str]:
    """Returns a list of human-readable drift findings (empty = no drift)."""
    findings = []
    chi_role = chi_square_frac(stats["role_freq"], profile.role_freq)
    if chi_role > cfg.drift_chi2_threshold:
        findings.append(f"role_chi2={chi_role:.3f}>{cfg.drift_chi2_threshold}")
    chi_tool = chi_square_frac(stats["tool_freq"], profile.tool_freq)
    if chi_tool > cfg.drift_chi2_threshold:
        findings.append(f"tool_chi2={chi_tool:.3f}>{cfg.drift_chi2_threshold}")
    ks = stats["len_hist"].ks_distance(profile.len_hist)
    if ks > cfg.drift_ks_threshold:
        findings.append(f"text_len_ks={ks:.3f}>{cfg.drift_ks_threshold}")
    # token-length quantile drift (embedding-proxy quantile sketch delta)
    for q in (0.5, 0.95):
        pq_ = profile.token_hist.quantile(q)
        sq = stats["token_hist"].quantile(q)
        if pq_ and not np.isnan(pq_) and pq_ > 0 and not np.isnan(sq):
            rel = abs(sq - pq_) / pq_
            if rel > cfg.drift_quantile_rel_threshold:
                findings.append(f"token_q{int(q*100)}_rel_delta={rel:.3f}>{cfg.drift_quantile_rel_threshold}")
    return findings


def compare_run_stats(a: dict, b: dict) -> dict:
    """Cross-RUN drift: the same statistics the per-partition drift check
    uses, computed between two runs' MERGED sketch states (dataset-vs-dataset
    instead of partition-vs-profile) — the regression-detection tool for
    successive corpus versions. Symmetric, cheap (sketch-sized inputs only)."""
    return {
        "rows_a": a["n_rows"],
        "rows_b": b["n_rows"],
        "role_chi2": round(chi_square_frac(a["role_freq"], b["role_freq"]), 6),
        "tool_chi2": round(chi_square_frac(a["tool_freq"], b["tool_freq"]), 6),
        "text_len_ks": round(a["len_hist"].ks_distance(b["len_hist"]), 6),
        "token_p50_rel_delta": _rel_delta(a["token_hist"].quantile(0.5), b["token_hist"].quantile(0.5)),
        "token_p95_rel_delta": _rel_delta(a["token_hist"].quantile(0.95), b["token_hist"].quantile(0.95)),
        # ER-distribution drift from the KLL quantile sketch (unbounded float
        # — outside HistogramSketch's fixed-bin domain)
        "er_p50_rel_delta": _kll_rel_delta(a.get("er_kll"), b.get("er_kll"), 0.5),
        "er_p95_rel_delta": _kll_rel_delta(a.get("er_kll"), b.get("er_kll"), 0.95),
        "approx_distinct_convs_a": int(a["conv_hll"].estimate()),
        "approx_distinct_convs_b": int(b["conv_hll"].estimate()),
    }


def _rel_delta(x: float, y: float) -> float:
    if np.isnan(x) or np.isnan(y) or y == 0:
        return float("nan")
    return round(abs(x - y) / abs(y), 6)


def _kll_rel_delta(a, b, q: float) -> float:
    if a is None or b is None or a.n == 0 or b.n == 0:
        return float("nan")
    return _rel_delta(float(a.quantile(q)), float(b.quantile(q)))


def grouped_hll_distinct(ds, group_col: str, key_col: str, p: int = 14):
    """Per-group approximate distinct count: each batch emits one HLL blob
    per (block, group) — the shuffle carries 2^p-byte sketches, never the
    keys — and ONE groupby(group) merges them associatively. The scale path
    for per-group COUNT(DISTINCT) when the distinct key set is itself
    fact-sized (contrast the exact two-level groupby, which shuffles every
    distinct (group, key) pair). Relative error 1.04/sqrt(2^p)."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for gval, sub in batch.groupby(group_col, sort=False, dropna=True):
            h = HyperLogLog(p=p)
            vals = sub[key_col].dropna().to_numpy()
            if len(vals):
                if np.issubdtype(vals.dtype, np.number):
                    h.update_ints(vals.astype(np.int64))
                else:
                    h.update_strings(vals.astype(object))
            rows.append({group_col: gval, "blob": h.to_bytes()})
        return pd.DataFrame(rows)

    # coalesce width sized from the MEASURED partial count (the olap.py
    # pattern): one (block x group) blob is 2^p bytes, so many groups over
    # many blocks must not funnel through two giant partitions, while a few
    # groups over many blocks must not emit empty schema-less blocks
    parts = ds.map_batches(partial, batch_format="pandas", batch_size=None).materialize()
    width = int(min(512, max(2, parts.count() // 50_000 + 1)))
    parts = parts.repartition(width)
    n_buckets = 64

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        batch["__b"] = (hash_strings(batch[group_col].to_numpy(object)) % np.uint64(n_buckets)).astype(
            np.int32
        )
        return batch

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # one task merges ALL of its bucket's groups: blobs decode to an
        # (n_blobs, 2^p) register matrix, segment-max merges each group in a
        # single reduceat (max is associative/commutative, so this equals
        # any sequential merge order) — no per-group Python task fan-out,
        # which matters when group_col is high-cardinality
        g = g.reset_index(drop=True)
        regs = np.stack([HyperLogLog.from_bytes(b).registers for b in g["blob"]])
        codes, uniques = pd.factorize(g[group_col], sort=True)
        order = np.argsort(codes, kind="stable")
        sc = codes[order]
        starts = np.flatnonzero(np.r_[True, sc[1:] != sc[:-1]])
        merged = np.maximum.reduceat(regs[order], starts, axis=0)
        ests = []
        for row in merged:
            h = HyperLogLog(p=p)
            h.registers = row.copy()
            ests.append(h.estimate())
        return pd.DataFrame({group_col: np.asarray(uniques, dtype=object)[sc[starts]], "estimate": ests})

    return (
        parts.map_batches(tag, batch_format="pandas", batch_size=None)
        .groupby("__b")
        .map_groups(lambda g: merge_bucket(g.drop(columns="__b")), batch_format="pandas")
    )


def grouped_moments(
    ds,
    group_col: str,
    x_col: str,
    y_col: str,
    to_int=None,
):
    """Per-group second-order moments (n, Σx, Σy, Σx², Σy², Σxy) as EXACT
    int64 sufficient statistics — the algebraic-aggregate scale shape for
    covariance / correlation / variance: each batch pre-aggregates one
    6-tuple per (block, group), the shuffle carries those tiny partials, and
    int64 sums are exact and order-independent, so the result is
    bit-deterministic under any blocking / reduce tree (float partial sums
    would not be). The caller derives corr/cov from the moments with a fixed
    float expression, keeping the distributed part integer-exact.

    ``to_int`` maps each raw column to int64 (default: ``np.rint``); inputs
    must be integer-valued after mapping and small enough that every moment
    stays under 2^53 (so the final float math is exact-input) — true for
    bounded domains like quantities/percentages at any row count up to ~10^9
    per group per unit², and checked nowhere cheaper than by the oracle.

    Reference analog: the per-channel metric averaging in
    /root/reference/services/processor.py:98-117, widened to exact
    distributed moments.
    """
    from ray.data.aggregate import Sum

    conv = to_int or (lambda a: np.rint(a).astype(np.int64))

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        x = conv(batch[x_col].to_numpy())
        y = conv(batch[y_col].to_numpy())
        f = pd.DataFrame({group_col: batch[group_col], "x": x, "y": y})
        f["xx"] = f.x * f.x
        f["yy"] = f.y * f.y
        f["xy"] = f.x * f.y
        f["n"] = np.int64(1)
        return (
            f.groupby(group_col, sort=False, dropna=True)[["n", "x", "y", "xx", "yy", "xy"]]
            .sum()
            .reset_index()
        )

    parts = ds.map_batches(partial, batch_format="pandas", batch_size=None).repartition(2)
    return (
        parts.groupby(group_col)
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("x", alias_name="sum_x"),
            Sum("y", alias_name="sum_y"),
            Sum("xx", alias_name="sum_xx"),
            Sum("yy", alias_name="sum_yy"),
            Sum("xy", alias_name="sum_xy"),
        )
        .to_pandas()
    )


def corr_from_moments(m: pd.DataFrame) -> np.ndarray:
    """Pearson r in ppm (floored) from exact integer moments. Every input to
    the float expression is an exactly-representable integer (< 2^53) and
    every op (cast, subtract, multiply, sqrt, divide, floor) is a single
    correctly-rounded IEEE step, so the result is bit-identical to the same
    expression evaluated by any IEEE-754 engine (the DuckDB oracle mirrors
    this exact expression shape)."""
    n = m["n"].to_numpy().astype(np.float64)
    sx = m["sum_x"].to_numpy().astype(np.float64)
    sy = m["sum_y"].to_numpy().astype(np.float64)
    num = (m["n"] * m["sum_xy"] - m["sum_x"] * m["sum_y"]).to_numpy().astype(np.float64)
    vx = (m["n"] * m["sum_xx"] - m["sum_x"] * m["sum_x"]).to_numpy().astype(np.float64)
    vy = (m["n"] * m["sum_yy"] - m["sum_y"] * m["sum_y"]).to_numpy().astype(np.float64)
    r = num / np.sqrt(vx * vy)
    return np.floor(r * 1e6).astype(np.int64)
