"""Transcript source readers with read-time pruning.

S1 of the operator inventory: the reference fetches messages for a channel in
an id range ``(min_id, max_id]`` or the latest ``limit`` when no watermark
exists (``services/telegram_service.py:19-39``). At scale the equivalent is
pushing both the column list and the row predicate into the Parquet scan so
only needed columns/row-groups leave storage (SURVEY.md §2.1 S1 mapping).
"""

from __future__ import annotations

import pyarrow.compute as pc
import pyarrow.dataset as pads

import ray.data as rd
from ray.data import Dataset

from ..schema import TRANSCRIPT_SCHEMA

CORE_COLUMNS = [f.name for f in TRANSCRIPT_SCHEMA]


def read_transcripts(
    paths,
    columns: list[str] | None = None,
    min_turn: int | None = None,
    max_turn: int | None = None,
    conv_ids: list[str] | None = None,
) -> Dataset:
    """Column-pruned, predicate-pushed transcript read.

    ``min_turn``/``max_turn`` reproduce the watermark-bounded fetch
    (``telegram_service.py:19-30``: ``(min_id, max_id]``); ``conv_ids``
    restricts to specific conversations (the per-channel loop analog,
    ``processor.py:59``). All three push into the Parquet reader as a
    ``pyarrow.dataset`` expression — row groups whose statistics exclude the
    range never leave disk.
    """
    expr = None

    def conj(e):
        nonlocal expr
        expr = e if expr is None else expr & e

    if min_turn is not None:
        conj(pads.field("turn_idx") > pc.scalar(min_turn))
    if max_turn is not None:
        conj(pads.field("turn_idx") <= pc.scalar(max_turn))
    if conv_ids is not None:
        conj(pads.field("conv_id").isin(conv_ids))
    return rd.read_parquet(paths, columns=columns, filter=expr)


def read_transcripts_jsonl(
    paths,
    columns: list[str] | None = None,
) -> Dataset:
    """JSONL transcript source: same logical table as the parquet reader,
    for pipelines whose upstream emits newline-delimited JSON (a common
    transcript interchange format). Rows are cast to TRANSCRIPT_SCHEMA's
    core types per batch — ts strings parse to timestamp[us] — so every
    downstream stage sees one schema regardless of the wire format. JSON
    has no row-group statistics, so there is no predicate pushdown here;
    pruning happens at the first map."""
    import pyarrow as pa

    ds = rd.read_json(paths)
    want = columns or CORE_COLUMNS
    cast_types = {f.name: f.type for f in TRANSCRIPT_SCHEMA}

    def parse_ts(col):
        """Tolerant ISO-ish string→timestamp[us]: whole-column Arrow cast
        first (handles fractional seconds), then per-value strptime
        fallbacks for 'T'- and space-separated forms with nulls for
        unparseable values — one bad row must not abort the read."""
        try:
            return col.cast(pa.timestamp("us"))
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
            a = pc.strptime(col, format="%Y-%m-%dT%H:%M:%S", unit="us", error_is_null=True)
            b = pc.strptime(col, format="%Y-%m-%d %H:%M:%S", unit="us", error_is_null=True)
            return pc.coalesce(a, b)

    def conform(tbl: pa.Table) -> pa.Table:
        cols = {}
        for name in want:
            if name in tbl.column_names:
                col = tbl[name]
                t = cast_types.get(name)
                if t is not None and col.type != t:
                    if pa.types.is_timestamp(t) and pa.types.is_string(col.type):
                        col = parse_ts(col)
                    else:
                        col = col.cast(t)
                cols[name] = col
            else:
                t = cast_types.get(name, pa.string())
                cols[name] = pa.nulls(tbl.num_rows, t)
        return pa.table(cols)

    return ds.map_batches(conform, batch_format="pyarrow")
