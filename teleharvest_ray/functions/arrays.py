"""Small vectorized array utilities shared across stages."""

from __future__ import annotations

import numpy as np
import pandas as pd


def member_mask(sorted_arr: np.ndarray, values: np.ndarray) -> np.ndarray:
    """Vectorized membership of ``values`` in a sorted array, null-safe:
    nulls are non-members (object arrays with None would break searchsorted's
    comparisons otherwise)."""
    out = np.zeros(len(values), dtype=bool)
    if len(sorted_arr) == 0 or len(values) == 0:
        return out
    if values.dtype == object or values.dtype.kind == "f":
        ok = pd.notna(values)
    else:
        ok = np.ones(len(values), dtype=bool)
    vals = values[ok]
    pos = np.clip(np.searchsorted(sorted_arr, vals), 0, len(sorted_arr) - 1)
    out[ok] = sorted_arr[pos] == vals
    return out
