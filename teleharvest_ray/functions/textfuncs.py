"""Vectorized text functions for the validation chain.

Each function is the columnar recast of a scalar operation in the reference's
per-row predicate chain (``processor.py:97-145``), implemented over whole
Arrow/numpy batches — never a Python loop over rows.

- ``normalize_trailing_links`` — the P3 trailing-markdown-link strip,
  ``re.sub(r'\\s*\\[.*?]\\(https?://[^)]+\\)$', '', text, flags=MULTILINE)``
  (reference processor.py:106). Uses the same regex via pyarrow's RE2 engine
  with the ``(?m)`` flag; parity with Python ``re`` is unit-tested.
- ``quality_score`` — deterministic stand-in for the LLM evaluation
  (reference services/openai_service.py:35-59 → float 1..100): 100 × fraction
  of non-space characters that are alphanumeric. Transparent, vectorized, and
  plantable by the data generator.
- ``rewrite_alt`` — deterministic stand-in for the LLM rewrite (P9,
  processor.py:131): lowercase + whitespace collapse + trim.
- ``alt_score`` — second evaluation (P10): 100 × distinct-word ratio of the
  rewritten text (penalizes degenerate repetition).
- ``token_count`` — embedding-proxy feature (P11 recast per SURVEY §2.2).
- ``hashed_bow`` — 64-dim hashed bag-of-words unit vectors, the
  embedding-proxy used for the broadcast max-cosine similarity (P12/J1 recast,
  reference services/embedding_service.py:34-45).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .hashing import hash_strings

TRAILING_LINK_RE = r"(?m)\s*\[.*?\]\(https?://[^)]+\)$"
BOW_DIM = 64


def normalize_trailing_links(arr: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    """Strip trailing markdown links per line (reference processor.py:106)."""
    return pc.replace_substring_regex(arr, pattern=TRAILING_LINK_RE, replacement="")


def utf8_len(arr) -> pa.Array:
    return pc.utf8_length(arr)


def quality_score(arr: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """100 * alnum_chars / non-space_chars; NaN for null, 0 for empty."""
    alnum = pc.count_substring_regex(arr, pattern=r"[^\W_]").to_numpy(zero_copy_only=False).astype(np.float64)
    nonspace = pc.count_substring_regex(arr, pattern=r"\S").to_numpy(zero_copy_only=False).astype(np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        out = np.where(nonspace > 0, 100.0 * alnum / np.maximum(nonspace, 1), 0.0)
    return out


def rewrite_alt(arr) -> pa.Array | pa.ChunkedArray:
    """Deterministic 'rewrite': lowercase, collapse whitespace, trim."""
    out = pc.utf8_lower(arr)
    out = pc.replace_substring_regex(out, pattern=r"\s+", replacement=" ")
    return pc.utf8_trim_whitespace(out)


def alt_score(arr) -> np.ndarray:
    """100 * distinct words / total words, vectorized via explode+groupby."""
    s = pd.Series(_to_object(arr))
    words = s.str.split()
    n = len(s)
    out = np.zeros(n, dtype=np.float64)
    nonnull = words.notna()
    if nonnull.any():
        ex = words[nonnull].explode().dropna()
        if len(ex):
            grp = ex.groupby(level=0)
            distinct = grp.nunique()
            total = grp.size()
            ratio = (distinct / total).reindex(s.index[nonnull]).fillna(0.0)
            out[nonnull.to_numpy()] = 100.0 * ratio.to_numpy()
    return out


def token_count(arr) -> np.ndarray:
    """Whitespace-token count (embedding-proxy length feature)."""
    return pc.count_substring_regex(arr, pattern=r"\S+").to_numpy(zero_copy_only=False)


def _to_object(arr) -> np.ndarray:
    if isinstance(arr, (pa.Array, pa.ChunkedArray)):
        return arr.to_pandas().to_numpy(dtype=object)
    return np.asarray(arr, dtype=object)


def hashed_bow(texts, dim: int = BOW_DIM) -> np.ndarray:
    """(n, dim) L2-normalized hashed bag-of-words matrix (deterministic).

    Tokens hash with the process-stable string hash; counts accumulate into
    ``hash % dim`` buckets via one explode + one np.add.at — no per-row loop.
    """
    s = pd.Series(_to_object(texts))
    n = len(s)
    mat = np.zeros((n, dim), dtype=np.float64)
    words = s.str.split()
    nonnull = words.notna()
    if nonnull.any():
        ex = words[nonnull].explode().dropna()
        if len(ex):
            rows = ex.index.to_numpy(dtype=np.int64)
            buckets = (hash_strings(ex.to_numpy(dtype=object)) % np.uint64(dim)).astype(np.int64)
            np.add.at(mat, (rows, buckets), 1.0)
    norms = np.linalg.norm(mat, axis=1)
    mat /= np.maximum(norms, 1e-12)[:, None]
    return mat


def max_cosine(vecs: np.ndarray, exemplars: np.ndarray | None) -> np.ndarray:
    """Max cosine of each row vector against the exemplar matrix — the
    broadcast nested-loop 'join' with max-aggregation (J1, reference
    processor.py:140-143 / embedding_service.py:34-45). Empty exemplar set
    → 0.0 (reference embedding_service.py:44-45)."""
    if exemplars is None or len(exemplars) == 0:
        return np.zeros(len(vecs), dtype=np.float64)
    sims = vecs @ exemplars.T  # one matmul per batch
    return sims.max(axis=1)
