"""Shared word-explode + rolling n-gram hash kernels.

Three stages need the same shape — tokenize a text column, hash every token,
and chain consecutive token hashes into n-gram fingerprints, all with ONE
pandas explode and no per-row Python: MinHash shingling
(``stages/dedup.py``), benchmark decontamination (``stages/decontam.py``)
and the repetition quality gates (``stages/text_analysis.py``). Keeping one
copy means a kernel fix (e.g. the repeated-word collision regression, where
``acc ^ (shifted + k)`` collapsed "x x" grams to a constant) lands
everywhere at once.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .hashing import hash_strings, splitmix64

_U64 = np.uint64


def explode_tokens(texts, sep: str | None = None) -> tuple[np.ndarray, np.ndarray]:
    """(doc_row, token_hash) pairs for every token in ``texts`` — one pandas
    explode, vectorized across the whole batch. ``sep=None`` splits on
    whitespace runs (Python ``str.split()``, drops empty tokens); ``sep=' '``
    splits on single spaces (SQL ``string_split`` semantics — empty tokens
    preserved, so oracles see the same token stream). Null texts contribute
    no tokens."""
    s = pd.Series(np.asarray(texts, dtype=object))
    ex = s.str.split(sep).explode()
    ex = ex[ex.notna()]
    if not len(ex):
        return np.empty(0, np.int64), np.empty(0, _U64)
    return ex.index.to_numpy(np.int64), hash_strings(ex.to_numpy(object))


def chain_gram_hashes(
    rows: np.ndarray, wh: np.ndarray, n: int
) -> tuple[np.ndarray, np.ndarray]:
    """Rolling ``n``-gram hashes over per-doc token-hash streams: the
    (doc_row, gram_hash) pair of every n-gram that fits inside its doc, in
    document order. Each step pre-mixes the accumulator
    (``splitmix64(acc ^ k)`` before xoring the shifted word hash) so
    repeated-word grams don't collapse to a constant; equal word sequences
    collide with probability ~2**-64."""
    gh = wh.copy()
    valid = np.ones(len(wh), dtype=bool)
    pos = np.arange(len(wh))
    for k in range(1, n):
        shifted = np.roll(wh, -k)
        same_doc = (np.roll(rows, -k) == rows) & (pos + k < len(wh))
        with np.errstate(over="ignore"):
            gh = splitmix64(splitmix64(gh ^ _U64(k)) ^ shifted)
        valid &= same_doc
    return rows[valid], gh[valid]
