"""Declarative check registry — the user-extension surface (SURVEY.md §2.9).

The reference externalizes behaviour through service ABCs + config
(``services/interfaces.py:13-77``, ``settings.py:8-21``); our seam is a
registry of :class:`Check` descriptors. Each check has an id (stable —
violation rows carry it), the stage that produces it, column dependencies,
and the reference citation it recasts. ``ValidationConfig.disabled_checks``
turns any of them off declaratively; :func:`filter_violations` applies that
at the violation-emission boundary, so custom deployments choose their
constraint set without touching stage code.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow as pa
import pyarrow.compute as pc

from .config import ValidationConfig


@dataclass(frozen=True)
class Check:
    id: str
    stage: str  # 'row' | 'keyspace' | 'partition'
    columns: tuple[str, ...]
    description: str
    reference: str  # file:line in /root/reference this recasts


REGISTRY: dict[str, Check] = {
    c.id: c
    for c in (
        Check("text_missing", "row", ("text",), "text null or empty", "processor.py:98-100"),
        Check("conv_id_missing", "row", ("conv_id",), "conv_id null or empty", "processor.py:102-104"),
        Check("text_too_short", "row", ("text",), "normalized text under min_len", "processor.py:106-109"),
        Check("stop_word", "row", ("text",), "stop-word pattern match", "processor.py:90-95,111-114"),
        Check(
            "low_engagement", "row", ("views", "reactions", "forwards"),
            "engagement rate below threshold at volume (last turn exempt)", "processor.py:116-119",
        ),
        Check("low_score", "row", ("text",), "quality score <= min_score", "processor.py:124-127"),
        Check("low_score_alt", "row", ("text",), "rewrite score <= min_score_alt", "processor.py:132-135"),
        Check(
            "metrics_missing", "row", ("views", "reactions"),
            "views/reactions absent or zero", "processor.py:147-157",
        ),
        Check("dup_key", "keyspace", ("conv_id", "turn_idx"), "duplicate (conv_id, turn_idx)", "models/message.py:34-36"),
        Check("seq_gap", "keyspace", ("conv_id", "turn_idx"), "turn_idx not gap-free 0..n", "models/message.py:75-89 (north_rule)"),
        Check("orphan_conv", "keyspace", ("conv_id",), "conv_id absent from index", "north_rule referential"),
        Check("drift", "partition", ("role", "tool", "text"), "distribution drift vs reference profile", "processor.py:138-143 (north_rule)"),
    )
}


def filter_violations(tbl: pa.Table, cfg: ValidationConfig) -> pa.Table:
    """Drop violation rows whose check id is disabled in the config."""
    if not cfg.disabled_checks or tbl.num_rows == 0:
        return tbl
    mask = pc.invert(pc.is_in(tbl["check_id"], value_set=pa.array(list(cfg.disabled_checks))))
    return tbl.filter(mask)
