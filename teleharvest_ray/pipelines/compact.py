"""Small-file parquet compaction — the maintenance sink of a 100 TB corpus.

Long-running ingest (and the validator's own per-partition outputs) leave
directories of many small parquet files; reads then pay per-file footer +
scheduling overhead. ``compact_parquet`` merges them into ~target-size
outputs with the properties a petabyte-scale run needs:

- **Deterministic plan from metadata only**: groups are first-fit over the
  name-sorted file list using on-disk sizes (no data read at plan time), so
  the same input set always yields the same groups and output names.
- **Streaming**: each group task copies row group by row group
  (``ParquetFile.iter_batches`` would re-encode; reading one row group at a
  time keeps peak heap at row-group size, never group size).
- **Resumable + atomic**: output names embed a digest of the member files;
  finished outputs are skipped on re-run, and every write goes to a
  ``.tmp`` then ``os.replace`` — a killed run leaves no torn files.
- **Raw Ray tasks, deliberately**: this is a file-granular sink (one output
  FILE per group with deterministic names), which ``Dataset.write_parquet``
  cannot express — the SURVEY.md §2.10 "(c) raw tasks as a last resort"
  case. Partitioning assumption: one schema per directory (run the
  schema-check stage first; a mismatching file fails its group loudly).
"""

from __future__ import annotations

import hashlib
import os

import pyarrow.parquet as pq

import ray


def plan_compaction(sized_files: list[tuple[str, int]], target_bytes: int) -> list[list[str]]:
    """First-fit grouping over the (already name-sorted) file list: a group
    closes once it holds >= target_bytes or the list ends. Oversized files
    get a singleton group (they are already compact)."""
    groups: list[list[str]] = []
    cur: list[str] = []
    cur_bytes = 0
    for path, size in sized_files:
        cur.append(path)
        cur_bytes += size
        if cur_bytes >= target_bytes:
            groups.append(cur)
            cur, cur_bytes = [], 0
    if cur:
        groups.append(cur)
    return groups


def _group_digest(paths: list[str]) -> str:
    h = hashlib.sha256("\n".join(os.path.basename(p) for p in paths).encode())
    return h.hexdigest()[:12]


@ray.remote(num_cpus=1)
def _compact_group(paths: list[str], out_path: str) -> dict:
    """Copy every row group of every member file into one output, schema
    checked against the first member (compaction contract: one schema per
    directory). Atomic via tmp + rename."""
    tmp = out_path + ".tmp"
    first = pq.ParquetFile(paths[0])
    schema = first.schema_arrow
    rows = 0
    writer = pq.ParquetWriter(tmp, schema)
    try:
        for p in paths:
            f = pq.ParquetFile(p)
            if f.schema_arrow != schema:
                raise ValueError(
                    f"schema mismatch in compaction group: {p} != {paths[0]} "
                    "(run schema-check and fix drift before compacting)"
                )
            for rg in range(f.num_row_groups):
                t = f.read_row_group(rg)
                writer.write_table(t)
                rows += t.num_rows
    finally:
        writer.close()
    os.replace(tmp, out_path)
    return {"out": os.path.basename(out_path), "n_inputs": len(paths), "rows": rows}


def compact_parquet(
    in_dir: str,
    out_dir: str,
    target_mb: int = 256,
    resume: bool = True,
    prefix: str = "",
) -> dict:
    """Compact every ``{prefix}*.parquet`` under ``in_dir`` into
    ~``target_mb`` outputs under ``out_dir``. Returns a summary; safe to
    re-run (finished groups are skipped by their digest-stamped output
    name). ``prefix`` scopes the sweep to one homogeneous file family when
    the directory also holds sidecar/manifest parquet (e.g. ``part-``)."""
    os.makedirs(out_dir, exist_ok=True)
    files = sorted(
        os.path.join(in_dir, f)
        for f in os.listdir(in_dir)
        if f.endswith(".parquet") and f.startswith(prefix)
    )
    sized = [(p, os.stat(p).st_size) for p in files]
    groups = plan_compaction(sized, target_mb * 1024 * 1024)

    futures, skipped, expected = [], 0, set()
    for i, grp in enumerate(groups):
        name = f"compact-{i:05d}-{_group_digest(grp)}.parquet"
        expected.add(name)
        out_path = os.path.join(out_dir, name)
        if resume and os.path.exists(out_path):
            skipped += 1
            continue
        futures.append(_compact_group.remote(grp, out_path))
    done = ray.get(futures)
    # outputs from an EARLIER plan over a different input set: surfaced, not
    # deleted — the caller decides (an input change shifts group boundaries,
    # so stale names no longer appear in the current plan)
    stray = sorted(
        f for f in os.listdir(out_dir) if f.endswith(".parquet") and f not in expected
    )
    return {
        "n_input_files": len(files),
        "bytes_in": sum(s for _, s in sized),
        "n_groups": len(groups),
        "n_written": len(done),
        "n_skipped_resume": skipped,
        "rows_written": sum(d["rows"] for d in done),
        "stray_outputs": stray,
    }
