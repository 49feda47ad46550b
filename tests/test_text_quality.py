"""Unit tests for the dup-n-gram and OOV quality kernels
(stages/text_analysis.dup_ngram_stats / OOVStage / common_vocabulary) —
brute-force parity plus the degenerate-input edges the oracles also encode."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import teleharvest_ray.stages.text_analysis as ta


def _brute_dup_frac(text: str | None, n: int) -> tuple[int, int]:
    if text is None:
        return 0, 0
    ws = text.split(" ")
    grams = [tuple(ws[i : i + n]) for i in range(len(ws) - n + 1)]
    from collections import Counter

    c = Counter(grams)
    return len(grams), sum(v for v in c.values() if v >= 2)


def test_dup_ngram_stats_brute_force_parity():
    rng = np.random.default_rng(3)
    vocab = list("abcdefg")
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(0, 30)).tolist()) or ""
        for _ in range(200)
    ] + [None, "", "a", "a a", "x x x x x x"]
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    out = ta.dup_ngram_stats(tbl, n=3).to_pandas()
    for i, t in enumerate(texts):
        ng, nd = _brute_dup_frac(t, 3)
        assert out.n_grams[i] == ng, (i, t)
        assert out.n_dup_grams[i] == nd, (i, t)
        expect = nd / ng if ng else 0.0
        assert out.dup_ngram_frac[i] == expect


def test_oov_stage_counts_and_edges():
    common = frozenset({"the", "cat"})
    stage = ta.OOVStage(common)
    batch = pd.DataFrame(
        {
            "doc_id": np.arange(5, dtype=np.int64),
            "text": ["the cat sat", "the the", None, "", "zz zz zz"],
        }
    )
    out = stage(batch)
    assert out.n_words.tolist() == [3, 2, 0, 1, 3]  # "" splits to one empty token
    assert out.n_oov.tolist() == [1, 0, 0, 1, 3]
    assert out.oov_ratio.tolist() == [1 / 3, 0.0, 0.0, 1.0, 1.0]


def test_common_vocabulary_df_threshold(ray_session):
    import ray.data as rd

    # word "rare" in 1 of 20 docs (5% < 10% threshold); "hot" in all
    texts = [f"hot w{i % 3}" + (" rare" if i == 0 else "") for i in range(20)]
    ds = rd.from_pandas(pd.DataFrame({"doc_id": np.arange(20, dtype=np.int64), "text": texts}))
    common = ta.common_vocabulary(ds, n_docs=20)
    assert "hot" in common and "rare" not in common
    # w0..w2 each appear in ~1/3 of docs -> common at the 10% threshold
    assert {"w0", "w1", "w2"} <= common
