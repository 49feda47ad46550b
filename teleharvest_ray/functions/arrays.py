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


def list_to_mat(col) -> np.ndarray:
    """(n, dim) float64 matrix from an Arrow list<float> column, zero-copy
    where possible: uniform-width lists reshape the flat values buffer
    directly (the hot-path embedding layout) instead of stacking n Python
    objects — ~30x faster per batch and no object-array transient. Ragged
    or null-bearing columns fall back to the object stack."""
    import pyarrow as pa

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col, pa.Array) and pa.types.is_list(col.type) and col.null_count == 0:
        offs = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        widths = offs[1:] - offs[:-1]
        if len(widths) and (widths == widths[0]).all() and widths[0] > 0:
            flat = col.values.to_numpy(zero_copy_only=False)
            return (
                flat[offs[0] : offs[-1]]
                .reshape(len(widths), widths[0])
                .astype(np.float64, copy=False)
            )
    vals = col.to_pandas().to_numpy() if hasattr(col, "to_pandas") else np.asarray(col)
    return np.stack(vals).astype(np.float64)
