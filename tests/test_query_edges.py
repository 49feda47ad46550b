"""Edge-input parity: run selected queries() entries against a tiny
synthetic sf_dir engineered for the paths the standard testdata never
exercises (doc 0 shorter than the phrase, event-type pairs that never
co-occur, single-row groups), and compare against the SAME oracle SQL over
the same tables — true engine-vs-oracle parity on the edges."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def edge_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("edge_sf")
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(6, dtype=np.int64),
            # doc 0 has TWO words -> 3-gram phrase is empty
            "text": ["only two", "alpha beta gamma", "alpha beta gamma",
                     "x y z w", "", "solo"],
            "lang": ["en", "en", "de", "fr", "zh", "es"],
            "source": ["a"] * 6,
            "n_chars": np.array([8, 16, 16, 7, 0, 4], dtype=np.int64),
        }
    )
    docs.to_parquet(os.path.join(d, "documents.parquet"), index=False)
    # user 1 does click+view on one day; user 2 does ONLY purchase ->
    # (click, purchase) etc never co-occur
    ts = pd.to_datetime(
        ["2024-01-01 00:00:00", "2024-01-01 01:00:00", "2024-01-02 05:00:00"]
    ).astype("datetime64[us]")
    events = pd.DataFrame(
        {
            "event_id": np.arange(3, dtype=np.int64),
            "ts": ts,
            "user_id": np.array([1, 1, 2], dtype=np.int64),
            "event_type": ["click", "view", "purchase"],
            "value": np.array([1.5, 2.5, 3.5]),
            "props": ['{"k": 1}', '{"k": 2}', '{"k": 3}'],
        }
    )
    events.to_parquet(os.path.join(d, "events.parquet"), index=False)
    return str(d)


@pytest.fixture(scope="module")
def edge_con(edge_dir):
    import duckdb

    con = duckdb.connect()
    for t in ("documents", "events"):
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{edge_dir}/{t}.parquet')"
        )
    return con


EDGE_QUERIES = [
    "q_phrase_search",        # doc 0 shorter than the phrase: empty result
    "q_audience_overlap",     # never-co-occurring type pairs must be ABSENT
    "q_checksum_by_shard",    # single tiny shard, empty-text doc
    "q_table_fingerprint",    # empty-text doc excluded on both sides
    "q_fd_audit",             # convs of size 1, violators-only output
    "q_longest_run",          # runs of length 1
    "q_markov_transitions",   # single-event user contributes nothing
    "q_dwell_time",           # last event per user excluded
    "q_charset_profile",      # empty-string doc contributes no codepoints
    "q_vocab_spectrum",
    "q_mannwhitney_u",
    "q_ks_exact",
    "q_interarrival_hist",
    "q_decay_scores",
    "q_collect_events",
    # the mini docs have <4-word texts, so the 4-gram candidate graph is
    # EMPTY — these exercise the empty-graph paths end to end
    "q_triangle_counts",
    "q_degree_distribution",
    "q_hits",
    "q_bfs_levels",
    "q_assortativity",
    "q_dedup_report",
    "q_containment_pairs",
    "q_edit_distance_pairs",
    "q_trimmed_mean",
    "q_log_compaction",
    "q_autocorr_daily",
    "q_kanonymity_audit",
    "q_trailing_hour",
    "q_snapshot_diff",
]


@pytest.mark.parametrize("name", EDGE_QUERIES)
def test_edge_parity(ray_session, edge_dir, edge_con, name):
    import __ray_entry__ as e

    got = e.queries()[name](edge_dir)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    exp = edge_con.sql(e.oracle_sql()[name]).df()
    cols = sorted(got.columns)
    assert cols == sorted(exp.columns), (cols, sorted(exp.columns))
    g = got[cols].sort_values(cols).reset_index(drop=True)
    x = exp[cols].sort_values(cols).reset_index(drop=True)
    assert len(g) == len(x), (name, len(g), len(x))
    for c in cols:
        assert g[c].astype(str).equals(x[c].astype(str)), f"{name}.{c}"
