"""Multimodal plumbing (stubbed decode, real Ray actor-pool shape) and
text-analysis stage tests."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from teleharvest_ray.stages import multimodal as mm
from teleharvest_ray.stages import text_analysis as ta


@pytest.fixture(scope="module")
def payloads():
    rng = np.random.default_rng(12)
    rows = [
        {"payload_id": i, "payload": rng.integers(0, 256, int(n)).astype(np.uint8).tobytes()}
        for i, n in enumerate(rng.integers(100, 50_000, 20))
    ]
    rows.append({"payload_id": 99, "payload": b""})
    return pd.DataFrame(rows)


def test_decode_pipeline_actor_pool(ray_session, payloads):
    ds = rd.from_pandas(payloads)
    out = mm.decode_pipeline(ds, concurrency=2, batch_size=8).to_pandas()
    assert len(out) == len(payloads)
    assert (out.decoded_w == 64).all() and (out.decoded_h == 64).all()
    feats = np.stack(out.sort_values("payload_id").features.to_numpy())
    assert feats.shape == (21, 8)
    # deterministic: same payload → same features across runs
    out2 = mm.decode_pipeline(rd.from_pandas(payloads), concurrency=2, batch_size=8).to_pandas()
    feats2 = np.stack(out2.sort_values("payload_id").features.to_numpy())
    assert np.allclose(feats, feats2)
    # empty payload handled
    assert np.allclose(feats[-1], 0)


def test_decode_strict_raises_without_codec(payloads):
    stage = mm.ImageDecodeStage(strict=True)
    if not stage.has_codec:
        with pytest.raises(NotImplementedError):
            stage(payloads.head(2))


def test_frame_sample_plan(payloads):
    tbl = pa.Table.from_pandas(payloads.head(5), preserve_index=False)
    plan = mm.frame_sample_plan(tbl, every_n=10).to_pandas()
    nb = payloads.head(5).payload.str.len().to_numpy()
    expect = sum(len(range(0, max(int(n) // 1024, 1), 10)) for n in nb)
    assert len(plan) == expect
    assert (plan.frame_idx % 10 == 0).all()


def test_payload_meta_matches_formula(payloads):
    tbl = pa.Table.from_pandas(payloads, preserve_index=False)
    out = mm.attach_payload_meta(tbl, "payload").to_pandas()
    nb = payloads.payload.str.len().to_numpy()
    assert (out.n_bytes.to_numpy() == nb).all()
    assert (out.width.to_numpy() == nb % 640).all()
    assert (out.height.to_numpy() == (nb // 640) % 480).all()


def test_langid_actor(ray_session):
    df = pd.DataFrame(
        {
            "doc_id": range(4),
            "text": [
                "the cat and the dog sat in a chair for a while",
                "der hund und die katze ist nicht ein problem mit zu",
                "el perro y la casa es una cosa que con por",
                "zzz qqq www",
            ],
        }
    )
    out = rd.from_pandas(df).map_batches(ta.LangIdStage, batch_format="pandas", concurrency=1).to_pandas()
    out = out.sort_values("doc_id")
    assert list(out.lang_pred) == ["en", "de", "es", "und"]


def test_fingerprint_whitespace_case_invariant():
    t1 = pa.table({"doc_id": [1], "text": ["Hello   World"]})
    t2 = pa.table({"doc_id": [1], "text": ["hello world"]})
    f1 = ta.fingerprint64(t1)["fingerprint"].to_pylist()
    f2 = ta.fingerprint64(t2)["fingerprint"].to_pylist()
    assert f1 == f2
    t3 = pa.table({"doc_id": [1], "text": ["different text"]})
    assert ta.fingerprint64(t3)["fingerprint"].to_pylist() != f1


def test_pii_scan_and_redact_parity():
    """pii_scan counts match DuckDB's RE2 on the same patterns; redact
    removes every match it counted."""
    import duckdb
    import pyarrow as pa

    from teleharvest_ray.stages import text_analysis as ta

    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "contact a@b.co or c.d+x@e-f.org now",
                    "see https://x.io/p?q=1 and http://y.z/a",
                    "call +4915112345678 twice +123456789",
                    None,
                ]
            ),
        }
    )
    out = ta.pii_scan(tbl).to_pandas()
    con = duckdb.connect()
    con.register("t", tbl)
    for name, pat in {**ta.PII_PATTERNS, **ta.CONTAMINATION_PATTERNS}.items():
        sql = con.execute(
            f"SELECT coalesce(len(regexp_extract_all(text, '{pat}')), 0) FROM t ORDER BY doc_id"
        ).fetchall()
        got = out[f"n_{name}"].fillna(0).tolist()
        assert got == [r[0] for r in sql], (name, got, sql)
    red = ta.redact(tbl).to_pandas()
    rescan = ta.pii_scan(pa.Table.from_pandas(red.rename(columns={}), preserve_index=False)).to_pandas()
    for name in ta.PII_PATTERNS:
        assert rescan[f"n_{name}"].fillna(0).sum() == 0, name


def test_decode_real_branch_with_fake_pil(monkeypatch, payloads):
    """Execute the REAL codec branch by injecting a fake PIL.Image module:
    codec loads once per stage, each payload is open->convert->resize'd and
    the 8 band-mean features come from the fake pixel matrix."""
    import sys
    import types

    opens = []

    class _FakeImg:
        def __init__(self, data):
            self.data = data

        def convert(self, mode):
            assert mode == "L"
            return self

        def resize(self, size):
            self.size = size
            return self

        def __array__(self, dtype=None):
            # 4x4 constant image whose value is the payload length
            return np.full((4, 4), float(len(self.data)), dtype=dtype or np.float32)

    fake_image_mod = types.ModuleType("PIL.Image")

    def _open(bio):
        data = bio.read()
        opens.append(len(data))
        return _FakeImg(data)

    fake_image_mod.open = _open
    fake_pil = types.ModuleType("PIL")
    fake_pil.Image = fake_image_mod
    monkeypatch.setitem(sys.modules, "PIL", fake_pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", fake_image_mod)

    stage = mm.ImageDecodeStage(target_size=(4, 4), codec="pil")
    assert stage.has_codec
    df = pd.DataFrame({"payload_id": [0, 1], "payload": [b"abc", b"0123456789"]})
    out = stage(df)
    # every feature band of a constant image equals the payload byte length
    assert [f[0] for f in out["features"]] == [3.0, 10.0]
    assert all(np.allclose(f, f[0]) for f in out["features"])
    assert opens == [3, 10]
    assert (out["decoded_w"] == 4).all() and (out["decoded_h"] == 4).all()


def test_decode_codec_validation():
    with pytest.raises(ValueError, match="unknown codec"):
        mm.ImageDecodeStage(codec="libjpeg")


# ---------------------------------------------------------------------------
# real Netpbm decode path (no external library needed)
# ---------------------------------------------------------------------------


def test_decode_netpbm_p6_p5_comments_and_errors():
    import numpy as np
    import pytest
    from teleharvest_ray.stages import multimodal as mm

    rgb = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    p6 = b"P6\n# a comment\n# another\n3 2\n255\n" + rgb.tobytes()
    assert (mm.decode_netpbm(p6) == rgb).all()

    gray = np.arange(12, dtype=np.uint8).reshape(3, 4)
    p5 = b"P5  4\t3  255 " + gray.tobytes()  # arbitrary whitespace between tokens
    assert (mm.decode_netpbm(p5) == gray).all()

    with pytest.raises(ValueError):
        mm.decode_netpbm(b"JPEG")
    with pytest.raises(ValueError):
        mm.decode_netpbm(b"P6\n3 2\n")  # truncated header
    with pytest.raises(ValueError):
        mm.decode_netpbm(b"P6\n3 2\n255\n\x00\x00")  # raster too short
    with pytest.raises(ValueError):
        mm.decode_netpbm(b"P6\n1 1\n65535\n\x00\x00")  # 16-bit unsupported


def test_resize_nearest_index_rule():
    import numpy as np
    from teleharvest_ray.stages import multimodal as mm

    img = np.arange(16 * 16 * 3, dtype=np.uint8).reshape(16, 16, 3)
    assert (mm.resize_nearest(img, (8, 8)) == img[::2, ::2]).all()
    up = mm.resize_nearest(np.arange(4, dtype=np.uint8).reshape(2, 2), (4, 4))
    assert (up == np.repeat(np.repeat(np.arange(4).reshape(2, 2), 2, 0), 2, 1)).all()


def test_ppm_stage_end_to_end():
    import numpy as np
    import pandas as pd
    from teleharvest_ray.stages import multimodal as mm

    rng = np.random.default_rng(5)
    imgs = rng.integers(0, 256, size=(4, 16, 16, 3)).astype(np.uint8)
    header = b"P6\n16 16\n255\n"
    batch = pd.DataFrame(
        {"doc_id": np.arange(4, dtype=np.int64),
         "payload": [header + im.tobytes() for im in imgs]}
    )
    out = mm.ImageDecodeStage(target_size=(8, 8), codec="ppm")(batch)
    for i in range(4):
        expect = imgs[i][::2, ::2].astype(np.int64).sum()
        assert out.gray_sum[i] == expect
    assert out.src_w.tolist() == [16] * 4 and out.decoded_h.tolist() == [8] * 4
    assert all(len(f) == 8 for f in out.features)
