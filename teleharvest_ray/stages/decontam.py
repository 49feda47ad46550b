"""Benchmark decontamination: flag corpus documents that share at least one
word n-gram with a benchmark ("held-out eval") document set — the standard
train/test-overlap scrub a training-data pipeline runs before export.

Scale shape (100 TB): the benchmark side is gram-hashed and deduplicated
per batch BEFORE anything leaves the workers, so the exchange is
distinct-gram-sized (8 bytes each), never text-sized. Under
:data:`_BENCH_BROADCAST_HASHES` distinct grams the set is broadcast once
(``ray.put``) and every corpus batch is scanned locally — zero shuffles.
Above it, the corpus's (id, gram_hash) pairs semi-join the benchmark grams
through :func:`~teleharvest_ray.stages.joins.anti_join`'s one-shuffle
bucketed path and a groupby counts hits per doc — hashes move, text never
does.

No reference analog (target-only 100 TB toolkit, SURVEY.md §2.10); the
gram-chaining kernel mirrors ``dedup._shingle_hashes`` but splits on single
spaces (``string_split(text, ' ')`` semantics) so the SQL oracle and the
Ray path see the same token stream, and dedups (doc, gram) pairs so
``n_shared`` counts DISTINCT shared grams.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
from ray.data import Dataset
from ray.data.aggregate import Count

from ..functions.arrays import member_mask
from ..functions.ngrams import chain_gram_hashes, explode_tokens

#: broadcast ceiling for the benchmark gram-hash set — 16M uint64 = 128 MB,
#: comfortably under the per-task ray.get budget; real benchmark suites are
#: a few MB of text so the broadcast path is the overwhelmingly common one
_BENCH_BROADCAST_HASHES = 16_000_000


def gram_hash_pairs(texts, n: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc-DISTINCT (doc_row, gram_hash) pairs for word ``n``-grams.

    Tokens are split on single spaces (matching SQL ``string_split``); the
    gram hash is the shared rolling-hash kernel (functions/ngrams.py), so
    equal word sequences collide with probability ~2**-64. One explode, no
    per-row Python.
    """
    rows, wh = explode_tokens(texts, sep=" ")
    rows, gh = chain_gram_hashes(rows, wh, n)
    if not len(rows):
        return rows, gh
    # a doc lives entirely inside one batch row, so per-batch dedup of
    # (doc, gram) IS global dedup — n_shared counts distinct grams
    order = np.lexsort((gh, rows))
    rows, gh = rows[order], gh[order]
    keep = np.r_[True, (rows[1:] != rows[:-1]) | (gh[1:] != gh[:-1])]
    return rows[keep], gh[keep]


def bench_gram_hashes(bench: Dataset, text_col: str, n: int) -> Dataset:
    """Distinct gram hashes of the benchmark set as a one-column dataset —
    deduplicated per batch so the exchange is distinct-sized."""

    def per_batch(tbl: pa.Table) -> pa.Table:
        _, gh = gram_hash_pairs(tbl[text_col].to_numpy(zero_copy_only=False), n)
        return pa.table({"gram_hash": np.unique(gh)})

    return bench.select_columns([text_col]).map_batches(per_batch, batch_format="pyarrow")


def decontaminate(
    corpus: Dataset,
    bench: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 4,
) -> Dataset:
    """(id_col, n_shared) for every corpus doc sharing >=1 word ``n``-gram
    with ``bench``; ``n_shared`` = number of DISTINCT shared grams. Docs
    with zero overlap are absent from the output (contamination is sparse
    by construction — the result is hit-sized, not corpus-sized)."""
    grams = bench_gram_hashes(bench, text_col, n).materialize()  # bench side: small by contract
    if grams.count() <= _BENCH_BROADCAST_HASHES:
        bh = np.unique(grams.to_pandas()["gram_hash"].to_numpy())
        ref = ray.put(bh)

        def per_batch(tbl: pa.Table) -> pa.Table:
            texts = tbl[text_col].to_numpy(zero_copy_only=False)
            ids = tbl[id_col].to_numpy(zero_copy_only=False)
            rows, gh = gram_hash_pairs(texts, n)
            hit = member_mask(ray.get(ref), gh)
            cnt = np.bincount(rows[hit], minlength=len(ids)).astype(np.int64)
            nz = np.flatnonzero(cnt)
            return pa.table({id_col: ids[nz], "n_shared": cnt[nz]})

        return corpus.map_batches(per_batch, batch_format="pyarrow")

    # scale path: explode (id, gram_hash) pairs — 16 B/row, never text —
    # semi-join the benchmark grams, count hits per doc
    from . import joins as jn

    def explode(tbl: pa.Table) -> pa.Table:
        rows, gh = gram_hash_pairs(tbl[text_col].to_numpy(zero_copy_only=False), n)
        ids = tbl[id_col].to_numpy(zero_copy_only=False)
        return pa.table({id_col: ids[rows], "gram_hash": gh})

    pairs = corpus.map_batches(explode, batch_format="pyarrow")
    hits = jn.anti_join(pairs, grams, on="gram_hash", anti=False)
    return hits.groupby(id_col).aggregate(Count(alias_name="n_shared"))
