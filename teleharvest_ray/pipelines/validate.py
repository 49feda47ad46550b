"""The end-to-end resumable validation pipeline.

Orchestrates the three reference entry points (``main.py:25-29``) recast for
Ray Data:

- **Phase 1 — per-partition validation** (EP1 ``fetch_and_process`` analog,
  ``processor.py:55-79``): an actor-pool ``map_batches`` over the partition
  (file) list. Each actor holds the broadcast ReferenceProfile (the
  published-set/side-input analog, ``processor.py:58``) loaded ONCE in
  ``__init__``; per partition it runs the vectorized short-circuit chain,
  column stats, and the drift check, writes the partition's violation +
  annotated outputs atomically, and returns a lineage/metrics record. The
  driver streams these records into the checkpoint store as they complete —
  a killed run resumes by replaying only partitions without a record.
- **Phase 2 — key-space checks** (the PK/watermark discipline,
  ``models/message.py:34-36,75-89``): one salted hash-shuffle over pruned
  columns for dup/seq/orphan violations; recorded under the ``_global``
  checkpoint key, recomputed only when the validated partition set changed.

Partition = input file: at 100 TB the input is O(100k) files of 0.25–1 GB, so
file granularity gives both enough parallelism for a 256-node cluster and
bounded per-task memory. Reading a file whole inside the actor (rather than
letting read_parquet split it into fragments) is deliberate: the per-row
chain's last-turn exemption and the per-partition metrics record need
file-local scope (the reference's per-fetched-batch semantics,
``processor.py:76-77``).
"""

from __future__ import annotations

import glob
import hashlib as _hashlib
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data as rd

from ..checks import filter_violations
from ..config import ValidationConfig
from ..stages.keyspace import (
    build_bloom_index,
    conv_partials_table,
    keyspace_checks,
    keyspace_from_states,
    merge_conv_partials,
    prep_state,
)
from ..stages.row_checks import build_conv_last, chain_violations, evaluate_chain
from ..stages.stats import (
    drift_check,
    merge_stats,
    partition_stats,
    stats_from_bytes,
    stats_summary,
    stats_to_bytes,
)
from ..state.checkpoint import CheckpointStore, atomic_write_parquet
from ..state.profile import ReferenceProfile, build_profile


class PartitionValidator:
    """Stateful validator actor: profile deserialized once per actor
    (the A3/A4 load-once pattern — reference embedding model + published
    snapshot, ``services/embedding_service.py:15-16``, ``processor.py:58``)."""

    def __init__(
        self,
        cfg: ValidationConfig,
        profile_ref,
        out_dir: str,
        write_annotated: bool,
        on_error: str = "raise",
    ):
        self.cfg = cfg
        self.profile: ReferenceProfile = ray.get(profile_ref)
        self.out_dir = out_dir
        self.write_annotated = write_annotated
        self.on_error = on_error

    def __call__(self, batch) -> pa.Table:
        records = []
        start_rows = batch["start_row"] if "start_row" in batch else [0] * len(batch["path"])
        for path, pid, sr in zip(batch["path"], batch["pid"], start_rows):
            # poison-partition isolation: at target scale one corrupt file
            # must not kill a multi-hour run — record the failure, keep going
            # (the partition gets no checkpoint record, so the next run
            # retries it)
            if self.on_error == "skip":
                try:
                    records.append(self._one(str(path), str(pid), int(sr)))
                except Exception as e:  # noqa: BLE001 — isolation boundary
                    records.append(self._error_record(str(pid), str(path), e))
            else:
                records.append(self._one(str(path), str(pid), int(sr)))
        return pa.Table.from_pylist(records)

    @staticmethod
    def _error_record(pid: str, path: str, err: Exception) -> dict:
        """Schema-complete failure record (same keys as a success record so
        batches concatenate cleanly)."""
        return {
            "partition_id": pid,
            "rows_scanned": 0,
            "violations": 0,
            "pass": False,
            "sketch_state": b"",
            "keyspace_conv_path": "",
            "keyspace_blob": "",
            "keyspace_digest": "",
            "input_file": path,
            "input_size": -1,
            "input_mtime": -1.0,
            "wall_s": 0.0,
            "error": f"{type(err).__name__}: {err}",
        }

    def _one(self, path: str, pid: str, start_row: int = 0) -> dict:
        """Validate rows ``[start_row, end)`` of the partition. ``start_row
        > 0`` is the ROW-LEVEL INCREMENTAL path (the reference's watermark:
        only rows past the last validated id are fetched, processor.py:59-63,
        models/message.py:75-89, under the same append-only/id-monotone
        contract): only the delta rows are scanned, their outputs MERGE into
        the partition's existing violations/sketch/keyspace state, and the
        last-turn ER exemption is scoped to the delta (the reference's
        per-fetched-batch semantics, processor.py:76-77)."""
        t0 = time.perf_counter()
        # stat BEFORE the scan: rows appended concurrently with this scan are
        # not covered by the recorded size/mtime, so the next resume's stat
        # pre-filter misses and schedules the delta (a post-scan stat would
        # mark them validated without ever reading them)
        st_pre = os.stat(path)
        # stream the partition ROW-GROUP-wise: peak actor memory is bounded by
        # row-group size, not file size (a 1 GB file never materializes whole).
        # Chain semantics are per-fetched-batch by definition (the last-turn ER
        # exemption recasts the reference's per-batch flag, processor.py:76-77)
        # and the stats sketches merge associatively, so group-wise == whole.
        pf = pq.ParquetFile(path)
        # per-conv max turn (over the fetched span) for the last-turn ER
        # exemption: a cheap two-column read keeps the exemption fetch-scoped
        # even though the text columns stream row-group-wise
        conv_last = None
        try:
            kt = pq.read_table(path, columns=["conv_id", "turn_idx"])
            if start_row:
                kt = kt.slice(start_row)
            cl_conv = kt["conv_id"].to_pandas()
            cl_turn = kt["turn_idx"].to_numpy(zero_copy_only=False)
            # sorted-hash-array map, not a Python dict: ~12 B/conversation
            # (uint64 key + max) vs ~100+ B/entry for an object dict — the
            # heaviest per-task transient at multi-million-conv files
            conv_last = build_conv_last(cl_conv.to_numpy(), cl_turn)
        except Exception:
            pass
        ann_parts, vio_parts, stats = [], [], None
        ks_blobs, ks_convs = [], []
        cum = 0
        for rg in range(pf.num_row_groups):
            n_rg = pf.metadata.row_group(rg).num_rows
            if cum + n_rg <= start_row:  # fully validated already
                cum += n_rg
                continue
            tbl_g = pf.read_row_group(rg)
            if cum < start_row:  # partially-new row group: keep the new tail
                tbl_g = tbl_g.slice(start_row - cum)
            cum += n_rg
            ann_g = evaluate_chain(tbl_g, self.cfg, self.profile.exemplars, conv_last=conv_last)
            ann_parts.append(ann_g)
            vio_parts.append(chain_violations(ann_g))
            s = partition_stats(tbl_g, self.cfg)
            stats = s if stats is None else merge_stats(stats, s)
            ks = prep_state(tbl_g)
            ks_blobs.append(ks["blob"])
            ks_convs.append(ks["conv"])
        if stats is None:  # zero row groups (or an empty delta)
            empty = pq.read_table(path).slice(start_row)
            ann_parts = [evaluate_chain(empty, self.cfg, self.profile.exemplars)]
            vio_parts = [chain_violations(ann_parts[0])]
            stats = partition_stats(empty, self.cfg)
        ann = pa.concat_tables(ann_parts)
        vio = pa.concat_tables(vio_parts)
        delta_rows = ann.num_rows

        # Incremental path: fold the already-validated prefix's state back in
        # (sketches merge associatively; hash blobs concatenate; conv partials
        # re-aggregate) so the record/sidecar describe the WHOLE partition.
        prev_rows = 0
        if start_row:
            old = CheckpointStore(os.path.join(self.out_dir, "checkpoints")).read(pid)
            if old is not None:
                prev_rows = int(old.get("rows_scanned", 0))
                if old.get("sketch_state"):
                    stats = merge_stats(stats_from_bytes(old["sketch_state"]), stats)
                # scheduling only emits start_row>0 when both sidecars exist
                # (run_validation's has_state guard) — older record formats
                # take the full-rescan path instead of a lossy delta
                ob = old.get("keyspace_blob")
                if ob and os.path.exists(ob):
                    ks_blobs.insert(0, np.fromfile(ob, dtype=np.uint64).tobytes())
                oc = old.get("keyspace_conv_path")
                if oc and os.path.exists(oc):
                    ks_convs.insert(0, pq.read_table(oc).to_pandas())

        # key-space state piggybacks on this (only) scan of the partition so
        # phase 2 never re-reads validated data (SURVEY §4 shuffle-minimization).
        # The packed-hash blob is SORTED here (distributed, in the actor) and
        # written as a sidecar file next to the partition's outputs — the
        # lineage record carries only its path + digest, so at 10^12 keys the
        # driver never holds blob bytes; phase-2 range-merge tasks memmap the
        # files and binary-search their own hash range (keyspace._range_dups).
        hashes = (
            np.sort(np.frombuffer(b"".join(ks_blobs), dtype=np.uint64))
            if any(ks_blobs)
            else np.empty(0, np.uint64)
        )
        blob_digest = _hashlib.sha256(hashes.tobytes()).hexdigest()
        # content-addressed sidecar name: a delta revalidation writes a NEW
        # file, so the prior record's blob stays intact until the new record
        # is durable (the driver deletes superseded blobs only after
        # store.write) — a crash anywhere leaves a consistent (record, blob)
        # pair to resume from
        blob_path = os.path.join(self.out_dir, "keyspace", f"{pid}-{blob_digest[:12]}.bin")
        os.makedirs(os.path.dirname(blob_path), exist_ok=True)
        tmp = blob_path + ".tmp"
        with open(tmp, "wb") as fh:
            fh.write(hashes.tobytes())
        os.replace(tmp, blob_path)
        # conv partials go to a parquet sidecar under the same epoch tag —
        # phase 2 reads ALL partitions' partials as one Dataset and
        # re-aggregates them distributed, so conversation-count-sized state
        # never materializes on the driver
        conv_path = os.path.join(self.out_dir, "keyspace", f"{pid}-{blob_digest[:12]}-conv.parquet")
        atomic_write_parquet(conv_partials_table(merge_conv_partials(ks_convs)), conv_path)

        # drift is a whole-partition distribution check → merged stats
        findings = (
            []
            if ("drift" in self.cfg.disabled_checks or stats["n_rows"] == 0)
            else drift_check(stats, self.profile, self.cfg)
        )
        if findings:
            vio = pa.concat_tables(
                [
                    vio,
                    pa.table(
                        {
                            "conv_id": pa.array([f"partition:{pid}"], pa.string()),
                            "turn_idx": pa.array([-1], pa.int32()),
                            "check_id": pa.array(["drift"], pa.string()),
                            "detail": pa.array([";".join(findings)], pa.string()),
                        }
                    ),
                ]
            )
        vio = filter_violations(vio, self.cfg)
        vio_path = os.path.join(self.out_dir, "violations", f"{pid}.parquet")
        if start_row and os.path.exists(vio_path):
            # keep prior row-level violations; drift was recomputed above over
            # the merged stats, so stale drift rows are replaced, not doubled
            old_vio = pq.read_table(vio_path)
            import pyarrow.compute as _pc

            old_vio = old_vio.filter(_pc.not_equal(old_vio["check_id"], "drift"))
            vio = pa.concat_tables([old_vio, vio])
        atomic_write_parquet(vio, vio_path)
        if self.write_annotated:
            ann_path = os.path.join(self.out_dir, "annotated", f"{pid}.parquet")
            if start_row and os.path.exists(ann_path):
                ann = pa.concat_tables([pq.read_table(ann_path), ann])
            atomic_write_parquet(ann, ann_path)
        return {
            "partition_id": pid,
            "rows_scanned": prev_rows + delta_rows,
            "violations": vio.num_rows,
            "pass": vio.num_rows == 0,
            "sketch_state": stats_to_bytes(stats),
            "keyspace_conv_path": conv_path,
            "keyspace_blob": blob_path,
            "keyspace_digest": blob_digest,
            "input_file": path,
            "input_size": st_pre.st_size,
            "input_mtime": st_pre.st_mtime,
            "wall_s": round(time.perf_counter() - t0, 4),
            "error": "",
        }


def probe_scoring_capability(probe) -> bool:
    """Run the scoring capability probe ONCE at run start (the reference
    checks its credit balance before processing and disables scoring on
    failure, ``processor.py:32-35``; its error-type mapping
    ``services/openai_service.py:68-77`` collapses here to one boolean
    seam). Any exception or falsy result means 'scoring unavailable'."""
    try:
        return bool(probe())
    except Exception:
        return False


def run_validation(
    data_dir: str,
    out_dir: str,
    cfg: ValidationConfig | None = None,
    resume: bool = True,
    concurrency: int | None = None,
    write_annotated: bool = True,
    capability_probe=None,
    on_error: str = "raise",
) -> dict:
    """Validate every ``part-*.parquet`` under ``data_dir``; resumable.

    ``capability_probe``: optional zero-arg callable probed ONCE before the
    run; a failure/falsy result disables the scoring sub-chain for the whole
    run (the reference's runtime credits gate).

    ``on_error="skip"``: poison-partition isolation — a partition whose scan
    raises (corrupt file, bad footer) is recorded under
    ``summary["partitions_error"]`` instead of killing the run; it gets NO
    checkpoint record (so the next run retries it), its state is excluded
    from the merged stats and global keyspace checks, and the global-check
    digest covers only the validated set (fixing the file therefore forces a
    global recompute). Default ``"raise"`` preserves fail-fast semantics."""
    cfg = cfg or ValidationConfig()
    if capability_probe is not None and not probe_scoring_capability(capability_probe):
        from dataclasses import replace

        cfg = replace(cfg, scoring_enabled=False)
    files = sorted(glob.glob(os.path.join(data_dir, "part-*.parquet")))
    if not files:
        raise FileNotFoundError(f"no part-*.parquet under {data_dir}")
    pids = [os.path.splitext(os.path.basename(f))[0] for f in files]
    store = CheckpointStore(os.path.join(out_dir, "checkpoints"))
    done = (
        {pid: rec for pid, rec in store.completed().items() if not pid.startswith("_")}
        if resume
        else {}
    )
    if not resume:
        store.clear()
        done = {}

    # Reference profile: the designated reference partition is the first
    # READABLE file (deterministic; configurable by convention). Only the
    # three needed columns leave disk. Under on_error="skip" a corrupt first
    # file must not kill the run here on the driver any more than in an
    # actor — fall through to the next file (the corrupt one still surfaces
    # in partitions_error when its scan task runs).
    profile = None
    for ref_path in files:
        try:
            ref_tbl = pq.read_table(ref_path, columns=["text", "role", "tool"])
            profile = build_profile(ref_tbl, cfg)
            break
        except Exception:
            if on_error != "skip":
                raise
    if profile is None:
        raise RuntimeError(f"no readable partition to build the reference profile under {data_dir}")
    profile_ref = ray.put(profile)

    # Work list. A partition with a record can still need work when the file
    # GREW since validation (the reference's watermark semantics: new rows
    # append under an id-monotone contract, processor.py:59-63) — only the
    # delta rows [rows_scanned, end) revalidate, merging into the existing
    # state. A shrunk/replaced file falls back to full revalidation. The
    # growth probe is a footer-only read per already-validated file.
    todo = []
    errors: dict[str, str] = {}
    for f, p in zip(files, pids):
        rec = done.get(p)
        if rec is None:
            todo.append({"path": f, "pid": p, "start_row": 0})
            continue
        # cheap stat pre-filter: footer only opens when size/mtime moved, so
        # an unchanged 100k-file resume costs 100k stats, not footer reads
        st = os.stat(f)
        if rec.get("input_size") == st.st_size and rec.get("input_mtime") == st.st_mtime:
            continue
        try:
            n_now = pq.ParquetFile(f).metadata.num_rows
        except Exception as e:  # changed file now unreadable — same isolation
            if on_error != "skip":
                raise
            errors[p] = f"{type(e).__name__}: {e}"
            done.pop(p)
            continue
        n_rec = int(rec.get("rows_scanned", 0))
        if n_now == n_rec:
            # size/mtime moved but row count matches: the file was REPLACED
            # with different content of equal length (equal-count appends
            # can't happen under the append-only contract). Equality of row
            # counts proves nothing about content — full rescan, else stale
            # violations/sketch/keyspace state survives the swap.
            todo.append({"path": f, "pid": p, "start_row": 0})
            done.pop(p)
            continue
        # delta revalidation needs the prefix's sidecar state to merge into;
        # records without it (older formats, or sidecars gone from disk)
        # fall back to a full rescan — NEVER a delta that would silently
        # drop the prefix's key hashes and conv partials
        has_state = (
            rec.get("keyspace_blob")
            and os.path.exists(rec["keyspace_blob"])
            and rec.get("keyspace_conv_path")
            and os.path.exists(rec["keyspace_conv_path"])
        )
        start = n_rec if (n_now > n_rec and has_state) else 0
        todo.append({"path": f, "pid": p, "start_row": start})
        done.pop(p)
    n_resumed = len(files) - len(todo) - len(errors)
    new_records = []
    if todo:
        avail = int(ray.available_resources().get("CPU", 4))
        # actors sized to memory bandwidth, not vCPU count (see
        # ValidationConfig.validator_num_cpus) — explicit concurrency wins
        conc = concurrency or max(1, min(len(todo), int(avail / cfg.validator_num_cpus)))
        ds = rd.from_items(todo)
        result = ds.map_batches(
            PartitionValidator,
            fn_constructor_args=(cfg, profile_ref, out_dir, write_annotated, on_error),
            batch_size=1,
            concurrency=conc,
            num_cpus=cfg.validator_num_cpus if concurrency is None else 1.0,
            batch_format="pandas",
        )
        # stream records into the checkpoint store as partitions finish
        for batch in result.iter_batches(batch_size=1, batch_format="pyarrow"):
            for rec in batch.to_pylist():
                if rec.get("error"):
                    # failed partition: surface it, write NO checkpoint
                    # record (next run retries), keep the run going
                    errors[rec["partition_id"]] = rec["error"]
                    continue
                store.write(rec["partition_id"], rec)
                new_records.append(rec)
                # the record is durable → superseded sidecar files can go
                keep = {rec.get("keyspace_blob"), rec.get("keyspace_conv_path")}
                for pat in ("-*.bin", "-*-conv.parquet"):
                    for stale in glob.glob(
                        os.path.join(out_dir, "keyspace", rec["partition_id"] + pat)
                    ):
                        if stale not in keep:
                            try:
                                os.unlink(stale)
                            except OSError:
                                pass
        # per-stage execution stats (wall/cpu/memory per operator) for tuning
        try:
            with open(os.path.join(out_dir, "ray_stats.txt"), "w") as fh:
                fh.write(result.stats())
        except Exception:
            pass

    all_records = {**done, **{r["partition_id"]: r for r in new_records}}
    # errored partitions contribute NO state anywhere downstream
    good_pids = [p for p in pids if p in all_records]
    good_files = [f for f, p in zip(files, pids) if p in all_records]
    if not good_pids:
        raise RuntimeError(f"every partition failed: {errors}")

    # merged global column stats (sketch union — associative)
    merged = None
    for pid in good_pids:
        rec = all_records[pid]
        s = stats_from_bytes(rec["sketch_state"])
        merged = s if merged is None else merge_stats(merged, s)

    # Phase 2: key-space checks — assembled from the per-partition states the
    # validators embedded in their lineage records (no second scan of the
    # data; only candidate verification re-reads pruned columns)
    gkey = "_global"
    grec = store.read(gkey) if resume else None
    # staleness is keyed on a digest over WHICH partitions were validated and
    # their keyspace content (per-partition blob digests computed by the
    # validators — the driver never re-reads blob bytes to digest them), not
    # just the partition count — a replaced same-count partition set must
    # recompute the global checks
    dig = _hashlib.sha256()
    for pid in good_pids:
        rec = all_records[pid]
        dig.update(pid.encode())
        dig.update((rec.get("keyspace_digest") or "").encode())
    global_digest = dig.hexdigest()
    if errors:
        # global referential checks (dup/seq/orphan) are only meaningful over
        # the FULL corpus: a conversation split across a good and an errored
        # partition would otherwise emit false seq_gap/orphan rows and
        # persist them. Skip the phase entirely; the digest (over good
        # partitions only) changes once the failed file validates, which
        # forces the recompute then. Any _global.parquet on disk is from the
        # last complete run — global_checks_skipped flags that staleness.
        g_violations = 0
        global_checks_skipped = True
    elif grec is None or grec.get("digest") != global_digest:
        turns = rd.read_parquet(good_files, columns=["conv_id", "turn_idx"])
        conv_index_path = os.path.join(data_dir, "conversations.parquet")
        if not os.path.exists(conv_index_path):
            known = []
        elif pq.ParquetFile(conv_index_path).metadata.num_rows > cfg.orphan_bloom_threshold:
            # big index: distributed partial-Bloom build (OR-merge) — the
            # driver holds only the final filter bits, never the id list
            known = build_bloom_index(conv_index_path)
        else:
            known = pq.read_table(conv_index_path)["conv_id"].to_pylist()
        usable = [
            pid
            for pid in good_pids
            if all_records[pid].get("keyspace_conv_path")
            and os.path.exists(all_records[pid]["keyspace_conv_path"])
            and all_records[pid].get("keyspace_blob")
            and os.path.exists(all_records[pid]["keyspace_blob"])
        ]
        if len(usable) == len(good_pids):
            # both halves of the keyspace state stay on disk: blob PATHS go
            # to the range-merge tasks, and the conv partial sidecars stream
            # through a distributed groupby — the driver sees only candidates.
            # Below a size threshold the partials merge driver-side instead:
            # a Ray groupby costs seconds of fixed overhead that dwarfs a
            # small pandas merge (same dispatch pattern as embedding_near_dup;
            # equivalence of the two paths is test-asserted).
            blobs = [all_records[pid]["keyspace_blob"] for pid in good_pids]
            conv_paths = [all_records[pid]["keyspace_conv_path"] for pid in good_pids]
            n_partial_rows = sum(pq.ParquetFile(p).metadata.num_rows for p in conv_paths)
            if n_partial_rows < 2_000_000:
                summ = merge_conv_partials([pq.read_table(p).to_pandas() for p in conv_paths])
            else:
                summ = rd.read_parquet(conv_paths)
            gvio = keyspace_from_states(blobs, summ, turns, known, cfg)
        else:  # records from an older run without sidecar state: full scan
            gvio = keyspace_checks(turns, known, cfg)
        gvio = filter_violations(gvio, cfg)
        atomic_write_parquet(gvio, os.path.join(out_dir, "violations", "_global.parquet"))
        store.write(
            gkey,
            {"partition_id": gkey, "n_partitions": len(good_files), "digest": global_digest, "violations": gvio.num_rows},
        )
        g_violations = gvio.num_rows
        global_checks_skipped = False
    else:
        g_violations = grec["violations"]
        global_checks_skipped = False

    per_part_violations = int(sum(r["violations"] for r in all_records.values() if r["partition_id"] != gkey))
    summary = {
        "n_partitions": len(files),
        "n_resumed": n_resumed,
        "n_validated_now": len(new_records),
        "rows_scanned": int(sum(r["rows_scanned"] for r in all_records.values())),
        "violations_partition_local": per_part_violations,
        "violations_global": int(g_violations),
        "global_checks_skipped": global_checks_skipped,
        "partitions_failed": [p for p in good_pids if not all_records[p]["pass"]],
        "partitions_error": errors,
        "column_stats": stats_summary(merged) if merged else None,
        "out_dir": out_dir,
    }
    return summary


def read_violations(out_dir: str):
    """All violation rows of a completed run as one pandas DataFrame."""
    import pandas as pd

    frames = []
    for f in sorted(glob.glob(os.path.join(out_dir, "violations", "*.parquet"))):
        frames.append(pq.read_table(f).to_pandas())
    if not frames:
        return pd.DataFrame(columns=["conv_id", "turn_idx", "check_id", "detail"])
    return pd.concat(frames, ignore_index=True)


def compare_runs(out_a: str, out_b: str) -> dict:
    """Drift between two completed validation runs, from their checkpoint
    records' sketch states only — no data is re-read. The successive-corpus
    regression check: run validation on v1 and v2, then diff the merged
    distributions."""
    from ..stages.stats import compare_run_stats

    def merged_of(out_dir: str) -> dict:
        store = CheckpointStore(os.path.join(out_dir, "checkpoints"))
        merged = None
        for pid, rec in store.completed().items():
            if pid.startswith("_") or not rec.get("sketch_state"):
                continue
            s = stats_from_bytes(rec["sketch_state"])
            merged = s if merged is None else merge_stats(merged, s)
        if merged is None:
            raise FileNotFoundError(f"no sketch states under {out_dir}")
        return merged

    return compare_run_stats(merged_of(out_a), merged_of(out_b))
