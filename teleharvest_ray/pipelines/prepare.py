"""Flagship training-data preparation: the end-to-end corpus pipeline a
100 TB pretraining run needs, composed entirely from this repo's operators —

  raw docs ─ quality gate (Gopher repetition filters, stages/text_analysis)
           ─ benchmark decontamination  (stages/decontam, gram semi-join)
           ─ near-dup collapse          (stages/dedup gram edges +
                                         stages/cluster connected components)
           ─ token counting + packing   (stages/sampling.pack_sequences)
           ─ deterministic split export (stages/sampling.hash_split,
                                         hive-partitioned parquet)

Every stage is a streaming Dataset transform; the only driver-held state is
stage COUNTS (the manifest) and the candidate-sized dedup edge set. Stage
retention is reported explicitly — a silently-dropping pipeline fails its
conservation oracle (q_prepare_corpus), which recomputes every stage's
retained count in SQL from the same gates.

No reference analog (the reference scores rows one at a time for a feed;
SURVEY.md §2.10) — this is the target-scale composition the X-series
operators exist for.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from ..stages import cluster as cl
from ..stages import decontam as dc
from ..stages import dedup as dd
from ..stages import joins as jn
from ..stages import sampling as sp
from ..stages import text_analysis as ta


def _mod_filter(col: str, mod: int, want_zero: bool):
    def fn(tbl: pa.Table) -> pa.Table:
        k = tbl[col]
        m = pc.equal(pc.subtract(k, pc.multiply(pc.divide(k, mod), mod)), 0)
        return tbl.filter(m if want_zero else pc.invert(m))

    return fn


def prepare_training_shards(
    docs: Dataset,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_budget: int = 2048,
    bench_mod: int = 13,
    dedup_gram: int = 4,
    split_fracs: dict[str, float] | None = None,
    split_seed: int = 97,
) -> dict:
    """Run the full preparation pipeline; returns the stage manifest.

    The held-out benchmark set is ``doc_id % bench_mod == 0`` (stand-in for
    an external eval suite); those docs never enter the corpus. Output is
    one hive-partitioned parquet directory per split with (id, tokens,
    shard_id) rows; texts are re-joinable by id from the source (the export
    carries layout, not payload)."""
    docs = docs.materialize()
    n_input = docs.count()

    bench = docs.map_batches(_mod_filter(id_col, bench_mod, True), batch_format="pyarrow")
    pool = docs.map_batches(_mod_filter(id_col, bench_mod, False), batch_format="pyarrow")

    def quality(tbl: pa.Table) -> pa.Table:
        stats = ta.repetition_stats(tbl, text_col=text_col, id_col=id_col)
        return tbl.filter(pc.equal(stats["keep"], 1))  # row-aligned by construction

    kept = pool.map_batches(quality, batch_format="pyarrow").materialize()
    n_quality = kept.count()

    flagged = dc.decontaminate(kept, bench, text_col=text_col, id_col=id_col, n=4)
    clean = jn.anti_join(kept, flagged, on=id_col).materialize()
    n_clean = clean.count()

    edges = dd.gram_edges(clean, text_col, id_col, n=dedup_gram)
    labels = cl.connected_components(edges, nodes=clean.select_columns([id_col]))
    drops = cl.cluster_stats(labels).map_batches(
        lambda t: t.filter(pc.equal(t["keep"], 0)).select(["node"]).rename_columns([id_col]),
        batch_format="pyarrow",
    )
    final = jn.anti_join(clean, drops, on=id_col).materialize()
    n_final = final.count()

    def add_tokens(tbl: pa.Table) -> pa.Table:
        toks = pc.fill_null(pc.count_substring_regex(tbl[text_col], pattern=r"\S+"), 0)
        return pa.table({id_col: tbl[id_col], "tokens": toks.cast(pa.int64())})

    # materialized so the token total and the packed export each consume the
    # SAME computed blocks — without it both sinks re-run add_tokens (and
    # the export re-runs packing) over the full corpus
    with_tokens = final.map_batches(add_tokens, batch_format="pyarrow").materialize()
    packed = sp.pack_sequences(with_tokens, id_col, "tokens", budget=token_budget)

    split_fracs = split_fracs or {"train": 0.95, "val": 0.05}
    # split by SHARD, not by doc: a packed shard is the training unit, so all
    # of its docs must land in the same split (doc-keyed hashing would tear
    # shards across train/val)
    assigned = sp.hash_split(packed, "shard_id", split_fracs, seed=split_seed)
    assigned.write_parquet(out_dir, partition_cols=["split"])

    from ray.data.aggregate import Sum

    # shard-independent total: read it from the materialized token table so
    # the packing map runs exactly once (for the export above)
    tot = with_tokens.aggregate(Sum("tokens", alias_name="t"))
    return {
        "n_input": int(n_input),
        "n_bench_heldout": int(bench.count()),
        "n_quality": int(n_quality),
        "n_clean": int(n_clean),
        "n_final": int(n_final),
        "total_tokens": int(tot["t"]),
        "token_budget": token_budget,
        "out_dir": out_dir,
        "splits": list(split_fracs),
    }
