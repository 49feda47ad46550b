"""Compaction pipeline: plan determinism, content preservation, resume,
atomicity, schema-contract enforcement."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from teleharvest_ray.pipelines.compact import compact_parquet, plan_compaction


@pytest.fixture()
def small_files(tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    for i in range(10):
        df = pd.DataFrame({"k": range(i * 100, (i + 1) * 100), "v": [f"x{i}"] * 100})
        pq.write_table(pa.Table.from_pandas(df), src / f"part-{i:03d}.parquet")
    return src


def test_plan_first_fit_deterministic():
    sized = [(f"f{i}", 10) for i in range(7)]
    groups = plan_compaction(sized, 25)
    assert groups == [["f0", "f1", "f2"], ["f3", "f4", "f5"], ["f6"]]
    # oversized file closes its own group
    assert plan_compaction([("big", 100), ("s", 1)], 25) == [["big"], ["s"]]


def test_compact_preserves_content_and_reduces_files(ray_session, small_files, tmp_path):
    out = tmp_path / "out"
    # each input file is ~1-2 KB; 4 KB target groups several per output
    summary = compact_parquet(str(small_files), str(out), target_mb=1, resume=True)
    outs = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert summary["n_input_files"] == 10
    assert summary["rows_written"] == 1000
    assert len(outs) == summary["n_groups"] < 10
    assert not any(f.endswith(".tmp") for f in os.listdir(out))
    got = pq.read_table(out).to_pandas().sort_values("k").reset_index(drop=True)
    exp = pq.read_table(small_files).to_pandas().sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)


def test_compact_resume_skips_finished(ray_session, small_files, tmp_path):
    out = tmp_path / "out"
    s1 = compact_parquet(str(small_files), str(out), target_mb=1)
    s2 = compact_parquet(str(small_files), str(out), target_mb=1)
    assert s2["n_skipped_resume"] == s1["n_groups"]
    assert s2["n_written"] == 0


def test_compact_schema_mismatch_fails_loudly(ray_session, small_files, tmp_path):
    pq.write_table(
        pa.Table.from_pandas(pd.DataFrame({"k": [1], "other": [2.0]})),
        small_files / "part-zzz.parquet",
    )
    with pytest.raises(Exception, match="schema mismatch"):
        compact_parquet(str(small_files), str(tmp_path / "out2"), target_mb=1)


def test_compact_reports_stray_outputs(ray_session, small_files, tmp_path):
    """An output produced by an earlier plan over a different input set is
    surfaced (never deleted) once the plan no longer names it."""
    out = tmp_path / "out"
    compact_parquet(str(small_files), str(out), target_mb=1)
    extra = pd.DataFrame({"k": [1], "v": ["x"]})
    pq.write_table(pa.Table.from_pandas(extra), small_files / "part-new.parquet")
    s = compact_parquet(str(small_files), str(out), target_mb=1)
    assert s["stray_outputs"], s  # old group names shifted -> stale file reported
    assert all((out / f).exists() for f in s["stray_outputs"])
