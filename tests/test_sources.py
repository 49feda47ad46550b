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
