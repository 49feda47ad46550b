"""Persisted MinHash-LSH index + incremental (delta-vs-corpus) near-dup check.

A 100 TB corpus is not re-deduplicated per ingest batch: the LSH banded
table (``bands`` rows of ~20 bytes per doc — band id, bucket hash, doc id;
text NEVER enters the index) is persisted once as partitioned parquet, and
each new delta is checked against it:

1. :func:`build_minhash_index` streams the corpus's banded table to disk via
   ``Dataset.write_parquet`` (many files — appendable, resumable reads) and
   stamps the signature params in ``index_meta.json`` so a check with
   mismatched params fails loudly instead of silently missing pairs.
2. :func:`dedup_against_index` bands ONLY the delta, unions it with the
   stored banded table (a pruned columnar read), and pairs through the same
   ONE-shuffle machinery as the batch path (``dedup._bucket_pairs_distributed``)
   with an ``is_new`` payload — only CROSS (corpus x delta) pairs survive,
   so intra-corpus duplicates are never recomputed. Verification gathers
   texts for the candidate ids only (anomaly-sized) and applies the exact
   gram-Jaccard gate.
3. :func:`append_to_index` adds the accepted delta's banded rows to the
   index directory (parquet filenames are unique per write), keeping the
   index current without rewriting it.

Equivalence contract (test-asserted): pairs found by the incremental path
== the cross-subset of a full-corpus batch dedup at the same banding.

No reference analog (the reference re-reads its published window per run,
``models/message.py:112-126``); this is the SURVEY §2.10 target-scale
extension of X-series dedup.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd
from ray.data import Dataset

from ..stages import dedup as dd

_META_NAME = "index_meta.json"
_DATA_SUBDIR = "banded"


def _meta_path(index_dir: str) -> str:
    return os.path.join(index_dir, _META_NAME)


def build_minhash_index(
    ds: Dataset,
    text_col: str,
    id_col: str,
    index_dir: str,
    n_hashes: int = 63,
    bands: int = 21,
    shingle: int = 3,
) -> dict:
    """Persist the corpus's LSH banded table; returns the stamped meta.

    Refuses a non-empty store: parquet writes APPEND (unique filenames —
    exactly what :func:`append_to_index` relies on), so rebuilding over an
    old index would silently union stale banded rows from the previous
    corpus. Point a rebuild at a fresh directory (or remove the old one
    explicitly)."""
    data_dir = os.path.join(index_dir, _DATA_SUBDIR)
    os.makedirs(data_dir, exist_ok=True)
    stale = [f for f in os.listdir(data_dir) if f.endswith(".parquet")]
    if stale:
        raise FileExistsError(
            f"{data_dir} already holds {len(stale)} banded file(s); "
            "build_minhash_index never overwrites — use append_to_index to add "
            "a delta, or remove the directory to rebuild"
        )
    banded = dd.minhash_banded(ds, text_col, id_col, n_hashes, bands, shingle)
    banded.write_parquet(os.path.join(index_dir, _DATA_SUBDIR))
    meta = {
        "n_hashes": n_hashes,
        "bands": bands,
        "shingle": shingle,
        "id_col": id_col,
    }
    tmp = _meta_path(index_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, _meta_path(index_dir))
    return meta


def append_to_index(ds: Dataset, text_col: str, index_dir: str) -> None:
    """Band a new delta with the INDEX'S params and add it to the store
    (write_parquet filenames are unique, so this is a pure append)."""
    with open(_meta_path(index_dir)) as f:
        meta = json.load(f)
    banded = dd.minhash_banded(
        ds, text_col, meta["id_col"], meta["n_hashes"], meta["bands"], meta["shingle"]
    )
    banded.write_parquet(os.path.join(index_dir, _DATA_SUBDIR))


def dedup_against_index(
    new_ds: Dataset,
    corpus_ds: Dataset,
    text_col: str,
    id_col: str,
    index_dir: str,
    threshold: float = 0.8,
    n_parts: int = 32,
) -> pd.DataFrame:
    """Near-dup pairs between a delta and the indexed corpus: (id_a, id_b,
    jaccard) with exact gram Jaccard >= ``threshold``, id_a < id_b, CROSS
    pairs only. ``corpus_ds`` supplies the old side's texts for the
    candidate-sized verification gather (the index itself holds no text)."""
    with open(_meta_path(index_dir)) as f:
        meta = json.load(f)
    if meta["id_col"] != id_col:
        raise ValueError(f"index was built on id column {meta['id_col']!r}, not {id_col!r}")

    old = rd.read_parquet(os.path.join(index_dir, _DATA_SUBDIR), columns=["band", "bh", id_col])
    old = old.map_batches(
        lambda t: t.append_column("is_new", pa.array(np.zeros(t.num_rows, dtype=np.int64))),
        batch_format="pyarrow",
    )
    new_banded = dd.minhash_banded(
        new_ds, text_col, id_col, meta["n_hashes"], meta["bands"], meta["shingle"]
    ).map_batches(
        lambda t: t.append_column("is_new", pa.array(np.ones(t.num_rows, dtype=np.int64))),
        batch_format="pyarrow",
    )
    pairs = dd._bucket_pairs_distributed(
        old.union(new_banded), ["band", "bh"], id_col, payload_cols=("is_new",), n_parts=n_parts
    )
    pairs = pairs[pairs["is_new_a"] != pairs["is_new_b"]][["id_a", "id_b"]].reset_index(drop=True)
    if not len(pairs):
        return pairs.assign(jaccard=pd.Series(dtype="float64"))
    cand_ids = np.unique(pairs[["id_a", "id_b"]].to_numpy().ravel())
    old_texts = dd.gather_texts(corpus_ds, id_col, text_col, cand_ids)
    new_texts = dd.gather_texts(new_ds, id_col, text_col, cand_ids)
    id_to_text = {
        **dict(zip(old_texts[id_col], old_texts[text_col])),
        **dict(zip(new_texts[id_col], new_texts[text_col])),
    }
    out = dd.verify_pairs_jaccard(pairs, id_to_text, threshold=threshold)
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)
