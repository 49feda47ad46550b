"""Schema-contract validation: detect schema drift across a partitioned
parquet corpus BEFORE scanning any data.

The north_rule names a "schema + constraint validation engine"; the
constraint half scans rows, this is the schema half. At 10^5+ partition
files the classic failure is one writer quietly changing a column's type or
dropping a field for a subset of files — a data-level scan then fails deep
inside a kernel (or worse, silently promotes types). This check reads ONLY
parquet footers (KB per file, no row groups), so it is metadata-sized at any
corpus size and runs as a distributed map over the file list.

Two modes:

- ``expected`` given — every file diffs against the contract
  (missing / extra columns, type mismatches).
- ``expected=None`` — consistency mode: the majority schema across files is
  elected as the reference (two tiny passes over footer fingerprints), and
  only deviating files report. This catches the one-bad-writer case without
  any declared contract.

Reference analog: the engine's ingest cast (sources/transcripts.py:60-75)
TOLERATES compatible deviations; this check makes them VISIBLE first.
"""

from __future__ import annotations

import glob
import os
from collections import Counter

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd


def schema_diff(actual: pa.Schema, expected: pa.Schema) -> list[dict]:
    """Field-by-field contract diff: one issue dict per deviation."""
    issues = []
    exp = {f.name: f for f in expected}
    act = {f.name: f for f in actual}
    for name, f in exp.items():
        if name not in act:
            issues.append(
                {"issue": "missing_column", "column": name, "expected": str(f.type), "actual": ""}
            )
        elif act[name].type != f.type:
            issues.append(
                {
                    "issue": "type_mismatch",
                    "column": name,
                    "expected": str(f.type),
                    "actual": str(act[name].type),
                }
            )
    for name, f in act.items():
        if name not in exp:
            issues.append(
                {"issue": "extra_column", "column": name, "expected": "", "actual": str(f.type)}
            )
    return issues


def _footer_schema(path: str) -> pa.Schema:
    return pq.ParquetFile(path).schema_arrow


def schema_report(
    data_dir: str,
    expected: pa.Schema | None = None,
    pattern: str = "part-*.parquet",
) -> pd.DataFrame:
    """Schema issues across every ``pattern`` file under ``data_dir`` as a
    frame of (file, issue, column, expected, actual); empty = contract holds.

    Distributed footer-only map; with ``expected=None`` the majority schema
    (by serialized-schema fingerprint) is elected first — the election
    shuffles only (file, fingerprint) rows, never schemas of agreeing files
    twice."""
    files = sorted(glob.glob(os.path.join(data_dir, pattern)))
    if not files:
        raise FileNotFoundError(f"no {pattern} under {data_dir}")

    empty = pd.DataFrame(
        {
            "file": pd.Series(dtype="object"),
            "issue": pd.Series(dtype="object"),
            "column": pd.Series(dtype="object"),
            "expected": pd.Series(dtype="object"),
            "actual": pd.Series(dtype="object"),
        }
    )

    if expected is None:
        # consistency mode: elect the majority schema from fingerprints
        def fingerprint(batch: pd.DataFrame) -> pd.DataFrame:
            rows = []
            for f in batch["path"]:
                # metadata-stripped: writer metadata (pandas index info,
                # library versions) varies across writers of IDENTICAL field
                # schemas — fingerprinting it would split the true majority
                # and could elect a minority (drifted) field schema
                s = _footer_schema(f).remove_metadata()
                rows.append({"path": f, "fp": s.serialize().to_pybytes().hex()})
            return pd.DataFrame(rows)

        fps = (
            rd.from_items([{"path": f} for f in files])
            .map_batches(fingerprint, batch_format="pandas")
            .to_pandas()
        )
        # deterministic election: highest count, fingerprint as tie-break
        majority_fp = min(Counter(fps.fp).items(), key=lambda kv: (-kv[1], kv[0]))[0]
        expected = pa.ipc.read_schema(pa.py_buffer(bytes.fromhex(majority_fp)))
        deviants = fps.loc[fps.fp != majority_fp, "path"].tolist()
        if not deviants:
            return empty
        files = deviants

    exp_hex = expected.serialize().to_pybytes().hex()

    def diff_files(batch: pd.DataFrame) -> pd.DataFrame:
        exp_schema = pa.ipc.read_schema(pa.py_buffer(bytes.fromhex(exp_hex)))
        rows = []
        for f in batch["path"]:
            for issue in schema_diff(_footer_schema(f), exp_schema):
                rows.append({"file": os.path.basename(f), **issue})
        return pd.DataFrame(rows) if rows else empty

    out = (
        rd.from_items([{"path": f} for f in files])
        .map_batches(diff_files, batch_format="pandas")
        .to_pandas()
    )
    if not len(out):
        return empty
    return out.sort_values(["file", "column", "issue"]).reset_index(drop=True)
