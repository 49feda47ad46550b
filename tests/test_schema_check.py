"""Schema-contract validation: expected-schema diffs and majority-consistency
election, footer-only."""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from teleharvest_ray.schema import TRANSCRIPT_FULL_SCHEMA
from teleharvest_ray.stages.schema_check import schema_diff, schema_report
from teleharvest_ray.sources.datagen import GenSpec, generate


@pytest.fixture()
def corpus(tmp_path):
    d = str(tmp_path / "data")
    generate(d, GenSpec(n_convs=30, n_files=4, seed=3, plant=False))
    return d


def test_clean_corpus_reports_nothing(ray_session, corpus):
    assert schema_report(corpus, TRANSCRIPT_FULL_SCHEMA).empty
    assert schema_report(corpus).empty  # consistency mode


def test_contract_diff_kinds(ray_session, corpus):
    files = sorted(glob.glob(os.path.join(corpus, "part-*.parquet")))
    # file 1: turn_idx silently widened to int64; file 2: tool dropped,
    # debug column added
    t1 = pq.read_table(files[1])
    pq.write_table(t1.set_column(t1.schema.get_field_index("turn_idx"), "turn_idx",
                                 t1["turn_idx"].cast(pa.int64())), files[1])
    t2 = pq.read_table(files[2]).drop_columns(["tool"])
    pq.write_table(t2.append_column("debug", pa.array(["x"] * t2.num_rows)), files[2])

    rep = schema_report(corpus, TRANSCRIPT_FULL_SCHEMA)
    by = {(r.file, r.issue, r.column) for r in rep.itertuples()}
    assert ("part-00001.parquet", "type_mismatch", "turn_idx") in by
    assert ("part-00002.parquet", "missing_column", "tool") in by
    assert ("part-00002.parquet", "extra_column", "debug") in by
    assert len(rep) == 3
    row = rep[(rep.file == "part-00001.parquet")].iloc[0]
    assert row.expected == "int32" and row.actual == "int64"

    # consistency mode elects the 2-file majority and flags both deviants
    rep2 = schema_report(corpus)
    assert set(rep2.file) == {"part-00001.parquet", "part-00002.parquet"}


def test_schema_diff_unit():
    a = pa.schema([("x", pa.int32()), ("y", pa.string())])
    b = pa.schema([("x", pa.int64()), ("z", pa.float64())])
    kinds = {(i["issue"], i["column"]) for i in schema_diff(a, b)}
    assert kinds == {("type_mismatch", "x"), ("missing_column", "z"), ("extra_column", "y")}


def test_majority_election_ignores_writer_metadata(ray_session, tmp_path):
    """Files with IDENTICAL field schemas but different writer metadata must
    count as one majority; a minority drifted field schema must lose."""
    import pandas as pd

    d = tmp_path / "meta"
    d.mkdir()
    base = pd.DataFrame({"a": [1, 2], "b": ["x", "y"]})
    # two metadata flavors of the SAME field schema
    pq.write_table(pa.Table.from_pandas(base), str(d / "part-00000.parquet"))
    plain = pa.table({"a": pa.array([1, 2], pa.int64()), "b": pa.array(["x", "y"])})
    pq.write_table(plain, str(d / "part-00001.parquet"))
    meta = plain.replace_schema_metadata({"writer": "other"})
    pq.write_table(meta, str(d / "part-00002.parquet"))
    # minority drift: a widened column, two copies (would win if metadata
    # split the true majority 1/1/1)
    bad = pa.table({"a": pa.array([1, 2], pa.int32()), "b": pa.array(["x", "y"])})
    pq.write_table(bad, str(d / "part-00003.parquet"))
    pq.write_table(bad, str(d / "part-00004.parquet"))

    rep = schema_report(str(d))
    assert set(rep.file) == {"part-00003.parquet", "part-00004.parquet"}
    assert (rep.issue == "type_mismatch").all()
