"""Per-partition lineage + metrics checkpoint store.

The north_rule requires every partition to write a lineage + metrics record
(rows scanned, violations, sketch states) so a killed run resumes by
replaying only unvalidated partitions. This recasts the reference's
per-channel watermark (``models/message.py:75-89``, ``processor.py:60-61``)
— where the durable DB row count WAS the checkpoint — as an explicit store:
one JSON record per partition, written atomically (tmp + ``os.replace``).

Output files for a partition (violations / annotated parquet) are also
written via tmp+rename by the validator, so a record existing implies its
outputs are complete — the resume contract.
"""

from __future__ import annotations

import base64
import json
import os


class CheckpointStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def record_path(self, partition_id: str) -> str:
        return os.path.join(self.root, f"{partition_id}.json")

    def write(self, partition_id: str, record: dict) -> None:
        """Atomic write: a record is either fully present or absent. Binary
        fields (sketch/keyspace states) are b64-wrapped transparently."""
        record = dict(record)
        b64_keys = [k for k, v in record.items() if isinstance(v, bytes)]
        for k in b64_keys:
            record[k] = base64.b64encode(record[k]).decode()
        record["_b64_keys"] = b64_keys
        tmp = self.record_path(partition_id) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(record, f)
        os.replace(tmp, self.record_path(partition_id))

    def read(self, partition_id: str) -> dict | None:
        p = self.record_path(partition_id)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            rec = json.load(f)
        for k in rec.pop("_b64_keys", ["sketch_state"] if rec.get("sketch_state") else []):
            if rec.get(k) is not None:
                rec[k] = base64.b64decode(rec[k])
        return rec

    def completed(self) -> dict[str, dict]:
        out = {}
        for fn in os.listdir(self.root):
            if fn.endswith(".json"):
                pid = fn[:-5]
                rec = self.read(pid)
                if rec is not None:
                    out[pid] = rec
        return out

    def clear(self) -> None:
        for fn in os.listdir(self.root):
            if fn.endswith(".json") or fn.endswith(".tmp"):
                os.unlink(os.path.join(self.root, fn))


def atomic_write_parquet(table, final_path: str) -> None:
    """Write a parquet file so it is either complete or absent."""
    import pyarrow.parquet as pq

    os.makedirs(os.path.dirname(final_path), exist_ok=True)
    tmp = final_path + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, final_path)
