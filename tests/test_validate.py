"""End-to-end validation pipeline: full manifest match + checkpoint/resume."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

from teleharvest_ray.config import ValidationConfig
from teleharvest_ray.pipelines.validate import read_violations, run_validation
from teleharvest_ray.sources.datagen import GenSpec, generate


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    d = tmp_path_factory.mktemp("e2e_data")
    generate(str(d), GenSpec(n_convs=120, n_files=6, seed=5, hot_conv=True))
    return str(d)


def _vio_set(df: pd.DataFrame) -> set:
    return set(map(tuple, df[["conv_id", "turn_idx", "check_id"]].drop_duplicates().itertuples(index=False)))


def test_full_run_matches_manifest(ray_session, dataset, tmp_path):
    out = str(tmp_path / "out")
    summary = run_validation(dataset, out, ValidationConfig(salt_buckets=8))
    exp = pq.read_table(dataset + "/expected_violations.parquet").to_pandas()
    got = read_violations(out)
    missing = _vio_set(exp) - _vio_set(got)
    spurious = _vio_set(got) - _vio_set(exp)
    assert not missing, f"missed {len(missing)}: {sorted(missing)[:6]}"
    assert not spurious, f"spurious {len(spurious)}: {sorted(spurious)[:6]}"
    # summary sanity
    assert summary["n_partitions"] == 6
    assert summary["rows_scanned"] > 2000
    cs = summary["column_stats"]
    assert cs["n_rows"] == summary["rows_scanned"]
    # HLL approx-distinct of conversations within 5%
    true_convs = pd.concat(
        [pq.read_table(f).to_pandas() for f in sorted(__import__("glob").glob(dataset + "/part-*.parquet"))]
    )["conv_id"].nunique()
    assert abs(cs["approx_distinct_convs"] - true_convs) / true_convs < 0.05
    # drift partition flagged, and only it
    assert [p for p in summary["partitions_failed"] if p == "part-00005"]
    drift_rows = got[got.check_id == "drift"]
    assert set(drift_rows.conv_id) == {"partition:part-00005"}


def test_resume_revalidates_only_missing(ray_session, dataset, tmp_path):
    out = str(tmp_path / "out_resume")
    s1 = run_validation(dataset, out, ValidationConfig(salt_buckets=8))
    v1 = read_violations(out)
    # simulate a kill after 3 of 6 partitions: drop 3 checkpoint records and
    # their outputs
    killed = ["part-00001", "part-00003", "part-00004"]
    for pid in killed:
        os.unlink(os.path.join(out, "checkpoints", f"{pid}.json"))
        os.unlink(os.path.join(out, "violations", f"{pid}.parquet"))
        os.unlink(os.path.join(out, "annotated", f"{pid}.parquet"))
    s2 = run_validation(dataset, out, ValidationConfig(salt_buckets=8))
    assert s2["n_validated_now"] == 3
    assert s2["n_resumed"] == 3
    v2 = read_violations(out)
    assert _vio_set(v1) == _vio_set(v2)
    assert s1["rows_scanned"] == s2["rows_scanned"]
    assert s1["column_stats"]["approx_distinct_convs"] == s2["column_stats"]["approx_distinct_convs"]


def test_fresh_rerun_is_deterministic(ray_session, dataset, tmp_path):
    out1, out2 = str(tmp_path / "d1"), str(tmp_path / "d2")
    run_validation(dataset, out1, ValidationConfig(salt_buckets=8))
    run_validation(dataset, out2, ValidationConfig(salt_buckets=8))
    assert _vio_set(read_violations(out1)) == _vio_set(read_violations(out2))


def test_incremental_append_revalidates_only_delta(ray_session, tmp_path):
    """Row-level incremental ingest (the reference's watermark semantics):
    after rows are appended to a validated partition, a resume revalidates
    ONLY the delta, merges sketch/keyspace state, and the final violation
    set equals a from-scratch run over the grown data."""
    import glob as _glob

    import numpy as np
    import pyarrow as pa

    d = str(tmp_path / "inc")
    generate(d, GenSpec(n_convs=80, n_files=4, seed=21))
    out = str(tmp_path / "inc_out")
    s1 = run_validation(d, out, ValidationConfig())
    v1 = read_violations(out)

    p = os.path.join(d, "part-00002.parquet")
    old = pq.read_table(p)
    # pick an existing (conv, turn 0) of this partition to duplicate — the
    # dup spans prefix↔delta, so catching it REQUIRES the merged key state
    dup_conv = old["conv_id"][0].as_py()
    longtext = "ok " * 100
    ap = pd.DataFrame(
        {
            "conv_id": ["conv-newinc"] * 3 + [dup_conv],
            "turn_idx": np.array([0, 1, 3, 0], dtype="int32"),  # gap at 2
            "role": ["user", "assistant", "user", "user"],
            "text": ["hi", longtext, longtext, longtext],  # one short text
            "tool": [None] * 4,
            "ts": pd.to_datetime(["2024-02-01T00:00:00"] * 4),
            "views": [1000] * 4,
            "reactions": [100] * 4,
            "forwards": [1] * 4,
        }
    )
    delta = pa.Table.from_pandas(ap, schema=old.schema, preserve_index=False)
    pq.write_table(pa.concat_tables([old, delta]), p)

    s2 = run_validation(d, out, ValidationConfig())
    assert s2["n_resumed"] == 3 and s2["n_validated_now"] == 1
    assert s2["rows_scanned"] == s1["rows_scanned"] + 4
    v2 = read_violations(out)
    # prior violations retained; cross-prefix dup + delta plants caught
    assert _vio_set(v1) - {t for t in _vio_set(v1) if t[2] == "drift"} <= _vio_set(v2)
    assert (dup_conv, 0, "dup_key") in _vio_set(v2)
    assert ("conv-newinc", 0, "text_too_short") in _vio_set(v2)
    assert any(t[0] == "conv-newinc" and t[2] == "seq_gap" for t in _vio_set(v2))
    assert ("conv-newinc", -1, "orphan_conv") in _vio_set(v2)
    # equivalence with a from-scratch run over the grown data
    out_ctl = str(tmp_path / "inc_ctl")
    run_validation(d, out_ctl, ValidationConfig())
    assert _vio_set(v2) == _vio_set(read_violations(out_ctl))
    # exactly one sidecar blob per partition survives (superseded one pruned)
    blobs = _glob.glob(os.path.join(out, "keyspace", "part-00002-*.bin"))
    assert len(blobs) == 1


def test_capability_probe_disables_scoring(ray_session, tmp_path):
    """A failing runtime capability probe must disable the scoring sub-chain
    for the whole run — identical behavior to scoring_enabled=False."""
    from dataclasses import replace

    d = str(tmp_path / "probe_data")
    generate(d, GenSpec(n_convs=60, n_files=3, seed=31))

    def boom():
        raise RuntimeError("no credits")

    out_probe = str(tmp_path / "probe_out")
    run_validation(d, out_probe, ValidationConfig(), write_annotated=False, capability_probe=boom)
    out_flag = str(tmp_path / "flag_out")
    run_validation(d, out_flag, replace(ValidationConfig(), scoring_enabled=False), write_annotated=False)
    vp, vf = read_violations(out_probe), read_violations(out_flag)
    assert _vio_set(vp) == _vio_set(vf)
    assert not (vp.check_id.isin(["low_score", "low_score_alt"])).any()
    # a passing probe keeps scoring on
    out_ok = str(tmp_path / "ok_out")
    run_validation(d, out_ok, ValidationConfig(), write_annotated=False, capability_probe=lambda: True)
    out_ctl = str(tmp_path / "ctl_out")
    run_validation(d, out_ctl, ValidationConfig(), write_annotated=False)
    assert _vio_set(read_violations(out_ok)) == _vio_set(read_violations(out_ctl))


def test_grown_partition_without_sidecars_full_rescans(ray_session, tmp_path):
    """A record lacking usable sidecar state (older format / files removed)
    must trigger a FULL rescan of a grown partition, never a lossy delta."""
    import glob as _glob

    import pyarrow as pa

    d = str(tmp_path / "oldfmt")
    generate(d, GenSpec(n_convs=40, n_files=2, seed=33))
    out = str(tmp_path / "oldfmt_out")
    run_validation(d, out, ValidationConfig(), write_annotated=False)
    # simulate an older-release record: drop the sidecar files
    for f in _glob.glob(os.path.join(out, "keyspace", "part-00001-*")):
        os.unlink(f)
    # grow the partition with a duplicate of an existing key — only a full
    # rescan (or prefix state) can catch a dup spanning prefix and delta
    p = os.path.join(d, "part-00001.parquet")
    old = pq.read_table(p)
    dup_conv = old["conv_id"][0].as_py()
    ap = pd.DataFrame(
        {
            "conv_id": [dup_conv],
            "turn_idx": pd.array([0], dtype="int32"),
            "role": ["user"],
            "text": ["x " * 150],
            "tool": [None],
            "ts": pd.to_datetime(["2024-02-01T00:00:00"]),
            "views": [1000],
            "reactions": [100],
            "forwards": [1],
        }
    )
    pq.write_table(pa.concat_tables([old, pa.Table.from_pandas(ap, schema=old.schema, preserve_index=False)]), p)
    run_validation(d, out, ValidationConfig(), write_annotated=False)
    got = read_violations(out)
    assert (dup_conv, 0, "dup_key") in _vio_set(got)


def test_incremental_two_successive_appends(ray_session, tmp_path):
    """Watermark semantics must compose: two successive appends each
    revalidate only their delta, and the final state equals a from-scratch
    run over the twice-grown data."""
    import pyarrow as pa

    d = str(tmp_path / "inc2")
    generate(d, GenSpec(n_convs=50, n_files=2, seed=41))
    out = str(tmp_path / "inc2_out")
    run_validation(d, out, ValidationConfig(), write_annotated=False)
    p = os.path.join(d, "part-00000.parquet")
    longtext = "ok " * 100
    for wave, convs in enumerate((["conv-w1"], ["conv-w1", "conv-w2"])):
        old = pq.read_table(p)
        n_new = len(convs)
        # each wave appends the NEXT turn of conv-w1 (and starts conv-w2 in
        # wave 2), so gap-freeness depends on state merged across waves
        turn = [wave] * 1 if n_new == 1 else [wave, 0]
        ap = pd.DataFrame(
            {
                "conv_id": convs,
                "turn_idx": pd.array(turn, dtype="int32"),
                "role": ["user"] * n_new,
                "text": [longtext] * n_new,
                "tool": [None] * n_new,
                "ts": pd.to_datetime(["2024-02-01T00:00:00"] * n_new),
                "views": [1000] * n_new,
                "reactions": [100] * n_new,
                "forwards": [1] * n_new,
            }
        )
        pq.write_table(
            pa.concat_tables([old, pa.Table.from_pandas(ap, schema=old.schema, preserve_index=False)]), p
        )
        s = run_validation(d, out, ValidationConfig(), write_annotated=False)
        assert s["n_validated_now"] == 1 and s["n_resumed"] == 1
    ctl = str(tmp_path / "inc2_ctl")
    run_validation(d, ctl, ValidationConfig(), write_annotated=False)
    assert _vio_set(read_violations(out)) == _vio_set(read_violations(ctl))


def test_compare_runs_detects_distribution_shift(ray_session, tmp_path):
    """Cross-run drift from checkpoint sketches only: identical corpora
    compare clean; a drift-skewed corpus lights up the statistics."""
    from teleharvest_ray.pipelines.validate import compare_runs

    d1 = str(tmp_path / "v1")
    generate(d1, GenSpec(n_convs=60, n_files=3, seed=61, drift_files=0))
    d2 = str(tmp_path / "v2")
    generate(d2, GenSpec(n_convs=60, n_files=3, seed=61, drift_files=1))  # one drifted file shifts the merged stats
    o1, o1b, o2 = (str(tmp_path / n) for n in ("o1", "o1b", "o2"))
    run_validation(d1, o1, ValidationConfig(), write_annotated=False)
    run_validation(d1, o1b, ValidationConfig(), write_annotated=False)
    run_validation(d2, o2, ValidationConfig(), write_annotated=False)
    same = compare_runs(o1, o1b)
    assert same["role_chi2"] == 0.0 and same["text_len_ks"] == 0.0
    shifted = compare_runs(o1, o2)
    assert shifted["role_chi2"] > same["role_chi2"] or shifted["text_len_ks"] > same["text_len_ks"]
    assert shifted["rows_a"] == same["rows_a"]
