"""Incremental dedup against a persisted MinHash-LSH index."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from teleharvest_ray.pipelines import dedup_index as di
from teleharvest_ray.stages import dedup as dd


def _corpus(rng, n, start_id=0, dup_of=None):
    vocab = [f"tok{i}" for i in range(40)]
    texts = [" ".join(vocab[j] for j in rng.integers(0, 40, 30)) for _ in range(n)]
    if dup_of is not None:
        # near-duplicate: copy with one token changed (J well above 0.8)
        for tgt, src in dup_of.items():
            w = src.split()
            w[5] = "CHANGED"
            texts[tgt] = " ".join(w)
    return pd.DataFrame({"doc_id": np.arange(start_id, start_id + n), "text": texts})


def test_incremental_matches_batch_cross_pairs(ray_session, tmp_path):
    """Pairs from the delta-vs-index path == the cross subset of a
    full-corpus batch dedup at identical banding + threshold."""
    rng = np.random.default_rng(5)
    old = _corpus(rng, 40)
    new = _corpus(rng, 20, start_id=100)
    # plant cross near-dups: two new docs clone old texts
    new.loc[3, "text"] = old.loc[7, "text"]
    w = old.loc[11, "text"].split()
    w[2] = "edited"
    new.loc[9, "text"] = " ".join(w)
    # and one intra-new dup that must NOT appear (cross only)
    new.loc[12, "text"] = new.loc[3, "text"]

    idx = str(tmp_path / "idx")
    di.build_minhash_index(rd.from_pandas(old), "text", "doc_id", idx)
    got = di.dedup_against_index(
        rd.from_pandas(new), rd.from_pandas(old), "text", "doc_id", idx, threshold=0.8
    )

    both = pd.concat([old, new], ignore_index=True)
    cands = dd.minhash_lsh_candidates(rd.from_pandas(both), "text", "doc_id", n_hashes=63, bands=21)
    texts = dict(zip(both.doc_id, both.text))
    full = dd.verify_pairs_jaccard(cands, texts, threshold=0.8)
    cross = full[(full.id_a < 100) != (full.id_b < 100)].sort_values(["id_a", "id_b"]).reset_index(drop=True)

    pd.testing.assert_frame_equal(got, cross)
    assert {(7, 103), (11, 109)} <= set(zip(got.id_a, got.id_b))
    assert (103, 112) not in set(zip(got.id_a, got.id_b))  # intra-delta pair excluded


def test_append_then_check_sees_earlier_delta(ray_session, tmp_path):
    """After append_to_index, a later delta pairs against the appended docs."""
    rng = np.random.default_rng(6)
    old = _corpus(rng, 20)
    d1 = _corpus(rng, 5, start_id=50)
    d2 = _corpus(rng, 5, start_id=80)
    d2.loc[2, "text"] = d1.loc[4, "text"]  # dup of an APPENDED doc

    idx = str(tmp_path / "idx")
    di.build_minhash_index(rd.from_pandas(old), "text", "doc_id", idx)
    di.append_to_index(rd.from_pandas(d1), "text", idx)
    corpus = rd.from_pandas(pd.concat([old, d1], ignore_index=True))
    got = di.dedup_against_index(rd.from_pandas(d2), corpus, "text", "doc_id", idx)
    assert (54, 82) in set(zip(got.id_a, got.id_b))


def test_mismatched_id_col_fails_loudly(ray_session, tmp_path):
    rng = np.random.default_rng(7)
    old = _corpus(rng, 5)
    idx = str(tmp_path / "idx")
    di.build_minhash_index(rd.from_pandas(old), "text", "doc_id", idx)
    with pytest.raises(ValueError, match="id column"):
        di.dedup_against_index(rd.from_pandas(old), rd.from_pandas(old), "text", "other", idx)


def test_short_docs_never_pair(ray_session, tmp_path):
    """Docs with fewer tokens than the shingle width have no signature —
    they must not LSH-pair with each other (the all-max-sentinel bug)."""
    old = pd.DataFrame({"doc_id": [1, 2], "text": ["hello world", "one two three four five six"]})
    new = pd.DataFrame({"doc_id": [100], "text": ["foo"]})
    idx = str(tmp_path / "idx")
    di.build_minhash_index(rd.from_pandas(old), "text", "doc_id", idx)
    got = di.dedup_against_index(rd.from_pandas(new), rd.from_pandas(old), "text", "doc_id", idx)
    assert len(got) == 0, got


def test_rebuild_into_existing_index_refused(ray_session, tmp_path):
    rng = np.random.default_rng(8)
    old = _corpus(rng, 5)
    idx = str(tmp_path / "idx")
    di.build_minhash_index(rd.from_pandas(old), "text", "doc_id", idx)
    with pytest.raises(FileExistsError, match="never overwrites"):
        di.build_minhash_index(rd.from_pandas(old), "text", "doc_id", idx)
