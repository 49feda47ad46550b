"""EP2/EP3 refresh pipelines, declarative check disabling, and the CLI."""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from teleharvest_ray.config import ValidationConfig
from teleharvest_ray.pipelines.refresh import refresh_metrics, refresh_similarity
from teleharvest_ray.pipelines.validate import read_violations, run_validation
from teleharvest_ray.sources.datagen import GenSpec, generate
from teleharvest_ray.state.profile import build_profile


@pytest.fixture(scope="module")
def validated(tmp_path_factory, ray_session):
    d = tmp_path_factory.mktemp("refresh_data")
    o = tmp_path_factory.mktemp("refresh_out")
    generate(str(d), GenSpec(n_convs=80, n_files=4, seed=31))
    run_validation(str(d), str(o), ValidationConfig(salt_buckets=8))
    return str(d), str(o)


def test_refresh_similarity_updates_eligible_rows(validated, ray_session):
    data, out = validated
    ann_before = pd.concat(
        [pq.read_table(f).to_pandas() for f in sorted(glob.glob(out + "/annotated/*.parquet"))]
    )
    # EP2: rebuild the profile from a DIFFERENT partition (published set
    # evolved) and refresh
    files = sorted(glob.glob(data + "/part-*.parquet"))
    prof2 = build_profile(pq.read_table(files[1], columns=["text", "role", "tool"]))
    res = refresh_similarity(out, prof2)
    ann_after = pd.concat(
        [pq.read_table(f).to_pandas() for f in sorted(glob.glob(out + "/annotated/*.parquet"))]
    )
    eligible = ann_before.token_count.notna()
    assert res["rows_refreshed"] == int(eligible.sum()) > 0
    # null-state machine preserved: ineligible rows stay null
    assert ann_after.similarity_score[~eligible.to_numpy()].isna().all()
    assert ann_after.similarity_score[eligible.to_numpy()].notna().all()
    # idempotent: refreshing again with the same profile changes nothing
    res2 = refresh_similarity(out, prof2)
    ann_again = pd.concat(
        [pq.read_table(f).to_pandas() for f in sorted(glob.glob(out + "/annotated/*.parquet"))]
    )
    assert res2["rows_refreshed"] == res["rows_refreshed"]
    pd.testing.assert_series_equal(ann_after.similarity_score, ann_again.similarity_score)


def test_refresh_metrics_window(validated, ray_session, tmp_path):
    data, out = validated
    before = read_violations(out)
    # idempotent on unchanged data (window covers everything at this size)
    res = refresh_metrics(data, out, ValidationConfig(), window=10_000)
    after = read_violations(out)
    key = lambda df: set(
        map(tuple, df[["conv_id", "turn_idx", "check_id"]].drop_duplicates().itertuples(index=False))
    )
    assert key(before) == key(after)
    assert res["metrics_violations"] > 0
    # late data arrives: copy one partition, null out reactions of one clean
    # in-window row -> refresh flags exactly it
    data2 = str(tmp_path / "late")
    os.makedirs(data2)
    import shutil

    for f in glob.glob(data + "/part-*.parquet"):
        shutil.copy(f, data2)
    t = pq.read_table(os.path.join(data2, "part-00000.parquet"))
    df = t.to_pandas()
    vset = key(before)
    victim = None
    for i in range(len(df)):
        r = df.iloc[i]
        if pd.notna(r.reactions) and not any(v[0] == r.conv_id and v[1] == r.turn_idx for v in vset):
            victim = i
            break
    df.loc[victim, "reactions"] = pd.NA
    t2 = pa.Table.from_pandas(df, preserve_index=False).cast(t.schema)
    pq.write_table(t2, os.path.join(data2, "part-00000.parquet"))
    refresh_metrics(data2, out, ValidationConfig(), window=10_000)
    after2 = read_violations(out)
    new = key(after2) - key(after)
    assert new == {(df.loc[victim, "conv_id"], int(df.loc[victim, "turn_idx"]), "metrics_missing")}


def test_disabled_checks(validated, ray_session, tmp_path):
    data, _ = validated
    out = str(tmp_path / "disabled_out")
    cfg = ValidationConfig(salt_buckets=8, disabled_checks=("drift", "low_engagement", "dup_key"))
    run_validation(data, out, cfg, write_annotated=False)
    vio = read_violations(out)
    assert not set(vio.check_id) & {"drift", "low_engagement", "dup_key"}
    assert {"text_missing", "seq_gap"} <= set(vio.check_id)


def test_cli_gen_and_validate(tmp_path):
    d, o = str(tmp_path / "cli_data"), str(tmp_path / "cli_out")
    env = dict(os.environ, RAY_ADDRESS="local")
    r = subprocess.run(
        [sys.executable, "-m", "teleharvest_ray", "gen", "--out", d, "--rows", "3000", "--files", "4"],
        capture_output=True, text=True, cwd="/root/repo", env=env,
    )
    assert r.returncode == 0, r.stderr[-800:]
    m = json.loads(r.stdout.strip().splitlines()[-1])
    assert m["n_rows"] > 2000
    r2 = subprocess.run(
        [sys.executable, "-m", "teleharvest_ray", "validate", "--data", d, "--out", o, "--no-annotated"],
        capture_output=True, text=True, cwd="/root/repo", env=env, timeout=300,
    )
    assert r2.returncode == 0, r2.stderr[-800:]
    s = json.loads(r2.stdout.strip().splitlines()[-1])
    assert s["rows_scanned"] == m["n_rows"]
    assert os.path.exists(os.path.join(o, "checkpoints", "_global.json"))


def test_refresh_metrics_after_incremental_append(ray_session, tmp_path):
    """Composition: append rows with missing metrics to a validated
    partition, resume incrementally, then run the bounded-window metrics
    refresh — the refreshed violations must flag the appended rows."""
    import pyarrow as pa

    from teleharvest_ray.config import ValidationConfig
    from teleharvest_ray.pipelines.refresh import refresh_metrics
    from teleharvest_ray.pipelines.validate import read_violations, run_validation
    from teleharvest_ray.sources.datagen import GenSpec, generate

    d = str(tmp_path / "rmdata")
    generate(d, GenSpec(n_convs=40, n_files=2, seed=51))
    out = str(tmp_path / "rmout")
    run_validation(d, out, ValidationConfig(), write_annotated=False)
    p = os.path.join(d, "part-00000.parquet")
    old = pq.read_table(p)
    ap = pd.DataFrame(
        {
            "conv_id": ["conv-rm-1"] * 2,
            "turn_idx": pd.array([0, 1], dtype="int32"),
            "role": ["user", "assistant"],
            "text": ["ok " * 100] * 2,
            "tool": [None, None],
            "ts": pd.to_datetime(["2024-02-01T00:00:00"] * 2),
            "views": [0, 1000],  # turn 0 has zero views -> metrics_missing
            "reactions": [0, 100],
            "forwards": [0, 1],
        }
    )
    pq.write_table(pa.concat_tables([old, pa.Table.from_pandas(ap, schema=old.schema, preserve_index=False)]), p)
    s = run_validation(d, out, ValidationConfig(), write_annotated=False)
    assert s["n_validated_now"] == 1
    refresh_metrics(d, out, ValidationConfig(), window=1000)
    got = read_violations(out)
    k = set(map(tuple, got[["conv_id", "turn_idx", "check_id"]].drop_duplicates().itertuples(index=False)))
    assert ("conv-rm-1", 0, "metrics_missing") in k
    assert ("conv-rm-1", 1, "metrics_missing") not in k


def test_cli_query_list_and_run():
    r = subprocess.run(
        [sys.executable, "-m", "teleharvest_ray", "query", "list"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r.returncode == 0
    lines = [l for l in r.stdout.splitlines() if l.strip()]
    assert len(lines) >= 100
    assert any(l.startswith("q_pricing_summary\toracle") for l in lines)

    r2 = subprocess.run(
        [sys.executable, "-m", "teleharvest_ray", "query", "q_mad_by_lang",
         "--sf", "/root/testdata/sf0.001"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r2.returncode == 0, r2.stderr[-500:]
    assert "lang" in r2.stdout and "[5 rows]" in r2.stderr

    r3 = subprocess.run(
        [sys.executable, "-m", "teleharvest_ray", "query", "nope"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r3.returncode == 2
