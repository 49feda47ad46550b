"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing here
(or in the library) calls ``ray.init`` / ``ray.shutdown``.

- ``entry()`` — flagship pipeline: the full transcript validation engine on a
  deterministic synthetic transcript table sized for sf0.001 (the transcript
  shape is this engine's native input, BASELINE.json input_hint); returns the
  violation table.
- ``queries()`` — one callable per implemented operator/pipeline from
  SURVEY.md §2 (see teleharvest_ray/pipelines/queries.py).
- ``oracle_sql()`` — DuckDB-equivalent SQL for every SQL-expressible query;
  non-SQL-expressible entries (deterministic sketch/hash pipelines, the
  transcript validator itself) are omitted and get rows-only checks.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows>=0."""
    from teleharvest_ray.pipelines.queries import validate_transcripts

    return validate_transcripts("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from teleharvest_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from teleharvest_ray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
