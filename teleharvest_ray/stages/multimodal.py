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


def decode_netpbm(raw: bytes) -> np.ndarray:
    """REAL image decode for binary Netpbm payloads (public format: P6 = RGB,
    P5 = grayscale, 8-bit) — no external library needed, so this decode path
    is genuinely executable in this container, not a stub. Parses the header
    (magic; whitespace-separated width/height/maxval tokens with ``#``
    comment lines; single whitespace before the raster) and returns the
    raster as ``(h, w, 3)`` or ``(h, w)`` uint8."""
    magic = bytes(raw[:2])
    if magic not in (b"P6", b"P5"):
        raise ValueError("not a binary netpbm payload")
    pos, n, vals = 2, len(raw), []
    while len(vals) < 3:
        while pos < n and raw[pos : pos + 1].isspace():
            pos += 1
        if pos < n and raw[pos : pos + 1] == b"#":
            while pos < n and raw[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < n and not raw[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated netpbm header")
        vals.append(int(raw[start:pos]))
    # Exactly ONE whitespace byte separates maxval from the raster — that is
    # the Netpbm spec's rule, and it is deliberate here: raster bytes may
    # themselves be whitespace-valued (0x09-0x0D, 0x20), so greedily skipping
    # "whitespace" would silently eat the first pixels of a conformant image.
    # Nonconformant writers that emit \r\n after maxval therefore decode
    # shifted; strictness is the safe side of that trade.
    pos += 1
    w, h, maxval = vals
    if not (0 < maxval < 256):
        raise ValueError("only 8-bit netpbm supported")
    ch = 3 if magic == b"P6" else 1
    need = w * h * ch
    if n - pos < need:
        raise ValueError("netpbm raster shorter than header promises")
    px = np.frombuffer(raw, dtype=np.uint8, count=need, offset=pos)
    return px.reshape(h, w, 3) if ch == 3 else px.reshape(h, w)


def resize_nearest(img: np.ndarray, size: tuple[int, int]) -> np.ndarray:
    """Nearest-neighbor resize to ``(w, h)``: source index =
    ``out_idx * src // dst`` — pure integer indexing, which is what lets the
    q_ppm_decode oracle replay the resample analytically in SQL."""
    h, w = img.shape[:2]
    tw, th = size
    ri = (np.arange(th, dtype=np.int64) * h) // th
    ci = (np.arange(tw, dtype=np.int64) * w) // tw
    return img[ri][:, ci]


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
    - ``"ppm"``: the in-repo :func:`decode_netpbm` kernel — a REAL decode of
      a real public binary format that needs no external library, so this
      branch runs for real here (q_ppm_decode certifies it end-to-end).
      Adds ``src_w``/``src_h`` (parsed header) and ``gray_sum`` (int64
      channel-sum of the resized raster) to the output.
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
        self.ppm = codec == "ppm"
        if codec == "pil" or (codec == "auto" and _HAS_PIL):
            # resolved at ACTOR construction so cluster images with the
            # library (or tests injecting a fake) take the real branch
            import importlib

            self._codec = importlib.import_module("PIL.Image")
        elif codec not in ("auto", "stub", "ppm"):
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

    def _decode_ppm(self, raw: list) -> pd.DataFrame:
        """Real kernel for binary Netpbm: parse + resize + features, all
        in-repo numpy. ``gray_sum`` (total channel sum of the resized raster,
        int64) is the integer the q_ppm_decode oracle recomputes
        analytically, so the WHOLE path — header parse, raster layout,
        nearest-neighbor index math — is certified bit-exactly."""
        n = len(raw)
        tw, th = self.target_size
        feats = np.zeros((n, 8), dtype=np.float32)
        gray_sum = np.zeros(n, dtype=np.int64)
        src_w = np.zeros(n, dtype=np.int64)
        src_h = np.zeros(n, dtype=np.int64)
        for i, r in enumerate(raw):
            img = decode_netpbm(r)
            src_h[i], src_w[i] = img.shape[0], img.shape[1]
            rs = resize_nearest(img, (tw, th)).astype(np.int64)
            gray = rs.sum(axis=2) if rs.ndim == 3 else rs
            gray_sum[i] = int(gray.sum())
            flat = gray.astype(np.float32).ravel()
            if flat.size:
                feats[i] = [
                    float(seg.mean()) if len(seg) else 0.0
                    for seg in np.array_split(flat, 8)
                ]
        return pd.DataFrame(
            {
                "src_w": src_w,
                "src_h": src_h,
                "gray_sum": gray_sum,
                "features": list(feats),
            }
        )

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if self.strict and not self.has_codec and not self.ppm:
            raise NotImplementedError(
                "image decode requires an imaging library not present in this "
                "environment; run with strict=False for the deterministic stub"
            )
        payloads = batch["payload"]
        if self.ppm:
            raw = [p if isinstance(p, (bytes, bytearray)) else bytes(p) for p in payloads]
            dec = self._decode_ppm(raw)
            batch = batch.reset_index(drop=True).copy()
            batch["src_w"] = dec["src_w"]
            batch["src_h"] = dec["src_h"]
            batch["decoded_w"] = self.target_size[0]
            batch["decoded_h"] = self.target_size[1]
            batch["gray_sum"] = dec["gray_sum"]
            batch["features"] = dec["features"]
            return batch
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
