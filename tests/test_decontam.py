"""Decontamination + repetition filters: brute-force parity, distributed-path
equivalence, and regressions for the repeated-word hash-collision bug."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

import teleharvest_ray.stages.decontam as dc
import teleharvest_ray.stages.joins as jn
from teleharvest_ray.stages.text_analysis import repetition_stats

_WORDS = ["key", "agg", "row", "scan", "slow", "fast", "table", "value", "part", "hash"]


def _mk_docs(n=120, seed=4, lo=4, hi=30):
    rng = np.random.default_rng(seed)
    texts = [
        " ".join(rng.choice(_WORDS, size=rng.integers(lo, hi)))
        for _ in range(n)
    ]
    return pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64), "text": texts})


def _brute_grams(text: str, n: int) -> set:
    ws = text.split(" ")
    return {" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)}


def _brute_decontam(docs: pd.DataFrame, n: int) -> pd.DataFrame:
    bench = set()
    for _, r in docs[docs.doc_id % 13 == 0].iterrows():
        bench |= _brute_grams(r.text, n)
    rows = []
    for _, r in docs[docs.doc_id % 13 != 0].iterrows():
        shared = _brute_grams(r.text, n) & bench
        if shared:
            rows.append({"doc_id": r.doc_id, "n_shared": len(shared)})
    return pd.DataFrame(rows, dtype=np.int64).reset_index(drop=True)


def _run_decontam(docs: pd.DataFrame, n: int = 4) -> pd.DataFrame:
    ds = rd.from_pandas(docs)
    bench = ds.filter(lambda r: r["doc_id"] % 13 == 0)
    corpus = ds.filter(lambda r: r["doc_id"] % 13 != 0)
    out = dc.decontaminate(corpus, bench, n=n).to_pandas()
    out["n_shared"] = out["n_shared"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def test_decontaminate_matches_brute_force(ray_session):
    docs = _mk_docs()
    got = _run_decontam(docs, n=3)
    want = _brute_decontam(docs, 3)
    pd.testing.assert_frame_equal(got, want)
    assert len(want) > 0


def test_decontaminate_scale_path_matches_broadcast(ray_session, monkeypatch):
    docs = _mk_docs(seed=9)
    bc = _run_decontam(docs, n=3)
    monkeypatch.setattr(dc, "_BENCH_BROADCAST_HASHES", 0)
    # also force the semi-join inside anti_join onto its bucketed path
    monkeypatch.setattr(jn, "_BROADCAST_KEY_ROWS", 0)
    sh = _run_decontam(docs, n=3)
    pd.testing.assert_frame_equal(bc, sh)
    assert len(bc) > 0


def test_gram_hash_repeated_words_do_not_collide():
    # regression: "x x" and "y y" bigrams collided to a constant when the
    # combine was gh ^ (shifted + k)
    _, g1 = dc.gram_hash_pairs(np.array(["key key"], object), 2)
    _, g2 = dc.gram_hash_pairs(np.array(["row row"], object), 2)
    assert len(g1) == len(g2) == 1 and g1[0] != g2[0]


def _brute_repetition(docs: pd.DataFrame) -> pd.DataFrame:
    rows = []
    for _, r in docs.iterrows():
        ws = r.text.split(" ") if isinstance(r.text, str) else []
        bgs = [" ".join(ws[i : i + 2]) for i in range(len(ws) - 1)]
        cnt = pd.Series(bgs).value_counts()
        dup = 1.0 - len(set(ws)) / len(ws) if ws else 0.0
        top = cnt.iloc[0] / len(bgs) if bgs else 0.0
        rows.append(
            {
                "doc_id": r.doc_id,
                "n_words": len(ws),
                "dup_word_frac": dup,
                "top_bigram_frac": top,
                "keep": int(dup <= 0.625 and top <= 0.05 and len(ws) >= 2),
            }
        )
    out = pd.DataFrame(rows)
    out["doc_id"] = out["doc_id"].astype("int64")
    out["n_words"] = out["n_words"].astype("int64")
    out["keep"] = out["keep"].astype("int64")
    return out


def test_repetition_stats_matches_brute_force():
    docs = _mk_docs(n=80, seed=11)
    # plant a phrase-loop doc and a word-loop doc so both gates trip
    docs.loc[0, "text"] = "spam ham " * 20 + "spam ham"
    docs.loc[1, "text"] = " ".join(["loop"] * 25)
    # degenerate docs pass both fraction gates trivially — the min-words
    # gate must reject them (keep=0), and a row must still be emitted
    docs.loc[2, "text"] = "solo"
    docs.loc[3, "text"] = ""
    docs.loc[4, "text"] = None
    got = repetition_stats(pa.table(docs)).to_pandas()
    want = _brute_repetition(docs)
    pd.testing.assert_frame_equal(got, want)
    assert got.loc[0, "keep"] == 0 and got.loc[1, "keep"] == 0
    assert list(got.loc[2:4, "keep"]) == [0, 0, 0]
    assert list(got.loc[2:4, "n_words"]) == [1, 1, 0]
    assert got["keep"].sum() > 0
