"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are opaque ``binary`` columns with typed metadata columns;
decode / feature-extract / resize / frame-sample are actor-pool
``map_batches`` stages. The decode kernels themselves are STUBBED (no
image/audio libraries in this container — clearly marked below); the Ray-side
plumbing — schema, small batch sizes for wide binary rows, actor signature,
output layout — is real and tested.

Scale notes: binary payloads dominate block size; use small ``batch_size``
and let ``DataContext.target_max_block_size`` keep blocks sane; the metadata
path (everything below except the stub body) is exactly what a real decoder
would keep.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

try:  # real decoders would import here; gate behind import-try per contract
    import PIL.Image as _PIL  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False


def attach_payload_meta(tbl: pa.Table, payload_col: str) -> pa.Table:
    """Typed metadata for an opaque payload column: byte length plus a
    deterministic pseudo-geometry derived from it (stands in for the header
    parse a real decoder does)."""
    n_bytes = pc.binary_length(tbl[payload_col]).cast(pa.int64())
    nb = n_bytes.to_numpy(zero_copy_only=False).astype(np.int64)
    width = nb % 640
    height = (nb // 640) % 480
    out = tbl.append_column("n_bytes", n_bytes)
    out = out.append_column("width", pa.array(width))
    out = out.append_column("height", pa.array(height))
    return out


class ImageDecodeStage:
    """Actor-pool decode stage: a REAL PIL decode branch behind the import
    gate, a deterministic stub otherwise.

    ``__init__`` loads the codec once per actor (the A3 load-once pattern);
    ``__call__`` decodes a batch. ``codec`` selects the kernel:

    - ``"auto"`` (default): PIL if importable, else the stub.
    - ``"pil"``: require PIL (``ImportError`` when absent — this container
      ships none, but the branch is executed in CI via an injected fake
      module, tests/test_multimodal_text.py).
    - ``"stub"``: the deterministic byte-fold features.
    - ``strict=True`` with no codec raises ``NotImplementedError`` per batch
      (the honest capability boundary).
    """

    def __init__(
        self,
        target_size: tuple[int, int] = (64, 64),
        strict: bool = False,
        codec: str = "auto",
    ):
        self.target_size = target_size
        self.strict = strict
        self._codec = None
        if codec == "pil" or (codec == "auto" and _HAS_PIL):
            # resolved at ACTOR construction so cluster images with the
            # library (or tests injecting a fake) take the real branch
            import importlib

            self._codec = importlib.import_module("PIL.Image")
        elif codec not in ("auto", "stub"):
            raise ValueError(f"unknown codec {codec!r}")
        self.has_codec = self._codec is not None

    def _decode_pil(self, raw: list) -> np.ndarray:
        """Real kernel: decode + grayscale + resize per payload, 8 band-mean
        features. Decoding is inherently per-payload (codec API); the actor
        pool parallelizes across batches."""
        import io

        feats = np.zeros((len(raw), 8), dtype=np.float32)
        for i, r in enumerate(raw):
            img = self._codec.open(io.BytesIO(r)).convert("L").resize(self.target_size)
            px = np.asarray(img, dtype=np.float32).ravel()
            if px.size:
                feats[i] = [float(seg.mean()) if len(seg) else 0.0 for seg in np.array_split(px, 8)]
        return feats

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if self.strict and not self.has_codec:
            raise NotImplementedError(
                "image decode requires an imaging library not present in this "
                "environment; run with strict=False for the deterministic stub"
            )
        payloads = batch["payload"]
        if self.has_codec:
            raw = [p if isinstance(p, (bytes, bytearray)) else bytes(p) for p in payloads]
            batch = batch.copy()
            batch["decoded_w"] = self.target_size[0]
            batch["decoded_h"] = self.target_size[1]
            batch["features"] = list(self._decode_pil(raw))
            return batch
        # STUB: a real decoder would decode+resize here. The deterministic
        # stand-in folds payload bytes into a tiny feature vector (8 segment
        # means, array_split boundaries) so downstream stages (dedup, ANN)
        # are exercised end-to-end — computed in ONE vectorized pass over the
        # batch's concatenated bytes, no per-payload loop.
        raw = [p if isinstance(p, (bytes, bytearray)) else bytes(p) for p in payloads]
        lens = np.fromiter((len(r) for r in raw), dtype=np.int64, count=len(raw))
        n = len(raw)
        feats = np.zeros((n, 8), dtype=np.float32)
        total = int(lens.sum())
        if total:
            flat = np.frombuffer(b"".join(raw), dtype=np.uint8).astype(np.float32)
            offs = np.concatenate([[0], np.cumsum(lens)])[:-1]
            j = np.arange(8)
            div, mod = lens // 8, lens % 8
            # array_split boundary j*div + min(j, mod), shifted by payload start
            bounds = offs[:, None] + j[None, :] * div[:, None] + np.minimum(j[None, :], mod[:, None])
            seg_len = np.diff(np.concatenate([bounds, (offs + lens)[:, None]], axis=1), axis=1)
            fb = bounds.reshape(-1)
            valid = fb < total  # reduceat cannot take a start == len(flat)
            sums = np.zeros(n * 8, dtype=np.float64)
            if valid.any():
                red = np.add.reduceat(flat, fb[valid])
                # a start index with an empty segment returns flat[start]; zero it after
                sums[valid] = red
            sums = sums.reshape(n, 8)
            sl = seg_len.astype(np.float64)
            with np.errstate(invalid="ignore", divide="ignore"):
                feats = np.where(sl > 0, sums / np.maximum(sl, 1), 0.0).astype(np.float32)
        feats = list(feats)
        batch = batch.copy()
        batch["decoded_w"] = self.target_size[0]
        batch["decoded_h"] = self.target_size[1]
        batch["features"] = feats
        return batch


def frame_sample_plan(tbl: pa.Table, every_n: int = 30) -> pa.Table:
    """Frame-sampling plan for video payloads: emits (payload_id, frame_idx)
    rows without touching payload bytes — the flat_map shape a real sampler
    uses. Frame count is derived from the byte length (stub for container
    header parsing)."""
    nb = pc.binary_length(tbl["payload"]).to_numpy(zero_copy_only=False).astype(np.int64)
    n_frames = np.maximum(nb // 1024, 1)
    sampled = [np.arange(0, f, every_n) for f in n_frames]
    counts = np.array([len(s) for s in sampled])
    ids = tbl["payload_id"].to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "payload_id": pa.array(np.repeat(ids, counts)),
            "frame_idx": pa.array(np.concatenate(sampled) if counts.sum() else np.array([], dtype=np.int64)),
        }
    )


def decode_pipeline(ds: Dataset, concurrency: int = 4, batch_size: int = 64) -> Dataset:
    """Wire the decode stage as an actor pool with small batches (wide binary
    rows) — the canonical multimodal stage shape."""
    return ds.map_batches(
        ImageDecodeStage,
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )
