"""Predicate-pushdown transcript reads (S1 watermark-bounded fetch)."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest

from teleharvest_ray.sources.datagen import GenSpec, generate
from teleharvest_ray.sources.transcripts import read_transcripts


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    d = tmp_path_factory.mktemp("src_data")
    generate(str(d), GenSpec(n_convs=60, n_files=3, seed=41, plant=False, drift_files=0))
    return str(d)


def test_watermark_bounded_read(ray_session, data):
    files = sorted(glob.glob(data + "/part-*.parquet"))
    full = read_transcripts(files, columns=["conv_id", "turn_idx"])
    n_all = full.count()
    # the (min_id, max_id] fetch window (telegram_service.py:19-30 analog)
    win = read_transcripts(files, columns=["conv_id", "turn_idx"], min_turn=5, max_turn=10)
    df = win.to_pandas()
    assert len(df) < n_all
    assert (df.turn_idx > 5).all() and (df.turn_idx <= 10).all()


def test_conv_filtered_read(ray_session, data):
    files = sorted(glob.glob(data + "/part-*.parquet"))
    idx = pq.read_table(data + "/conversations.parquet").to_pandas()
    pick = list(idx.conv_id.head(3))
    ds = read_transcripts(files, columns=["conv_id"], conv_ids=pick)
    got = set(ds.to_pandas().conv_id)
    assert got == set(pick)


def test_jsonl_source_conforms_to_schema(ray_session, tmp_path):
    """The JSONL reader must yield the same logical table as parquet —
    identical rows and core dtypes, missing columns null-filled."""
    import json

    import pandas as pd

    from teleharvest_ray.sources.transcripts import CORE_COLUMNS, read_transcripts_jsonl

    rows = [
        {"conv_id": "c-1", "turn_idx": 0, "role": "user", "text": "hello", "tool": None,
         "ts": "2024-01-05T10:00:00"},
        {"conv_id": "c-1", "turn_idx": 1, "role": "assistant", "text": "hi", "tool": "search",
         "ts": "2024-01-05T10:01:00"},
        {"conv_id": "c-2", "turn_idx": 0, "role": "user", "text": "x", "tool": None,
         "ts": "2024-01-06T09:30:00"},
    ]
    p = tmp_path / "t.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    out = read_transcripts_jsonl([str(p)]).to_pandas()
    assert list(out.columns) == CORE_COLUMNS
    assert len(out) == 3
    assert str(out.turn_idx.dtype) == "int32"
    assert pd.api.types.is_datetime64_any_dtype(out.ts)
    assert out.sort_values(["conv_id", "turn_idx"]).text.tolist() == ["hello", "hi", "x"]
    assert out.ts.iloc[0] == pd.Timestamp("2024-01-05T10:00:00")


def test_jsonl_source_tolerates_mixed_timestamps(ray_session, tmp_path):
    """Fractional-second, space-separated and junk ts strings must conform
    (or null) instead of aborting the read."""
    import json

    import pandas as pd

    from teleharvest_ray.sources.transcripts import read_transcripts_jsonl

    rows = [
        {"conv_id": "c-1", "turn_idx": 0, "role": "user", "text": "a", "tool": None,
         "ts": "2024-01-05T10:00:00.123456"},
        {"conv_id": "c-1", "turn_idx": 1, "role": "user", "text": "b", "tool": None,
         "ts": "2024-01-05 10:01:00"},
        {"conv_id": "c-1", "turn_idx": 2, "role": "user", "text": "c", "tool": None,
         "ts": "not-a-time"},
    ]
    p = tmp_path / "mixed.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    out = read_transcripts_jsonl([str(p)]).to_pandas().sort_values("turn_idx")
    assert pd.api.types.is_datetime64_any_dtype(out.ts)
    assert out.ts.iloc[1] == pd.Timestamp("2024-01-05T10:01:00")
    assert pd.isna(out.ts.iloc[2])
