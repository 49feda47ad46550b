"""Reference-partition profile: the broadcast side input.

Analog of the reference's published-set snapshot — read once per run
(``processor.py:58``, query ``models/message.py:112-126``) and used as a
broadcast side input for the max-cosine similarity (``processor.py:140-143``)
— plus the north_rule's drift baseline: role/tool frequency tables, a
text-length histogram (KS), and a token-count histogram (quantile deltas).

The profile is tiny (KBs): frequency dicts, two histogram sketches, and a
small exemplar matrix. It travels to every validator via ``ray.put`` once,
never re-shipped per batch.
"""

from __future__ import annotations

import pickle
from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa

from ..config import ValidationConfig
from ..functions.sketches import HistogramSketch
from ..functions.textfuncs import hashed_bow, token_count


@dataclass
class ReferenceProfile:
    role_freq: dict
    tool_freq: dict
    len_hist: HistogramSketch
    token_hist: HistogramSketch
    exemplars: np.ndarray  # (K, BOW_DIM) unit vectors — published-set analog
    n_rows: int

    def to_bytes(self) -> bytes:
        return pickle.dumps(self, protocol=4)

    @staticmethod
    def from_bytes(b: bytes) -> "ReferenceProfile":
        return pickle.loads(b)


def build_profile(
    tbl: pa.Table,
    cfg: ValidationConfig | None = None,
    n_exemplars: int = 32,
) -> ReferenceProfile:
    """Build the profile from a clean reference partition (a pyarrow Table).

    Exemplar selection is deterministic: evenly-spaced non-null texts (no RNG,
    so resume and oracle comparisons are stable).
    """
    cfg = cfg or ValidationConfig()
    role = pd.Series(tbl["role"].to_pandas())
    tool = pd.Series(tbl["tool"].to_pandas())
    role_freq = role.value_counts(dropna=False).to_dict()
    tool_freq = tool.value_counts(dropna=False).to_dict()

    text = tbl["text"]
    lens = pa.compute.utf8_length(text).to_numpy(zero_copy_only=False).astype(np.float64)
    len_hist = HistogramSketch(cfg.len_hist_bin, cfg.len_hist_max)
    len_hist.update(lens[~np.isnan(lens)])
    toks = token_count(text).astype(np.float64)
    token_hist = HistogramSketch(1, 1024)
    token_hist.update(toks[~np.isnan(toks)])

    texts_pd = text.to_pandas()
    nonnull_idx = np.flatnonzero(texts_pd.notna().to_numpy())
    if len(nonnull_idx):
        take = nonnull_idx[np.linspace(0, len(nonnull_idx) - 1, min(n_exemplars, len(nonnull_idx))).astype(int)]
        exemplars = hashed_bow(texts_pd.iloc[take].to_numpy(dtype=object))
    else:
        exemplars = np.zeros((0, 64))
    # normalize freq dicts keys: None-safe strings
    role_freq = {("<null>" if pd.isna(k) else str(k)): int(v) for k, v in role_freq.items()}
    tool_freq = {("<null>" if pd.isna(k) else str(k)): int(v) for k, v in tool_freq.items()}
    return ReferenceProfile(role_freq, tool_freq, len_hist, token_hist, exemplars, tbl.num_rows)
