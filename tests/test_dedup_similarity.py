"""Focused tests for the dedup and similarity-search stages on data with
PLANTED near-duplicates (the generator-oracle pattern applied to dedup)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from teleharvest_ray.stages import dedup as dd
from teleharvest_ray.stages import similarity as sim


@pytest.fixture(scope="module")
def docs():
    rng = np.random.default_rng(5)
    vocab = np.array([f"w{i}" for i in range(200)])
    base = [" ".join(vocab[rng.integers(0, 200, 60)]) for _ in range(120)]
    rows = []
    for i, t in enumerate(base):
        rows.append({"doc_id": i, "text": t})
    # planted near-dups: copy doc 0/1/2 with 3 words changed (high jaccard)
    for j, src in enumerate((0, 1, 2)):
        w = base[src].split()
        for k in range(3):
            w[10 + k] = f"changed{j}{k}"
        rows.append({"doc_id": 1000 + j, "text": " ".join(w)})
    # exact dup of doc 5
    rows.append({"doc_id": 2000, "text": base[5]})
    return pd.DataFrame(rows)


def test_minhash_lsh_finds_planted_neardups(ray_session, docs):
    ds = rd.from_pandas(docs)
    cands = dd.minhash_lsh_candidates(ds, "text", "doc_id", n_hashes=64, bands=16)
    id_to_text = dict(zip(docs.doc_id, docs.text))
    verified = dd.verify_pairs_jaccard(cands, id_to_text, threshold=0.5)
    pairs = set(map(tuple, verified[["id_a", "id_b"]].itertuples(index=False)))
    assert {(0, 1000), (1, 1001), (2, 1002), (5, 2000)} <= pairs
    # no wild false positives after verification
    assert len(pairs) < 20


def test_simhash_finds_exact_and_near(ray_session, docs):
    ds = rd.from_pandas(docs)
    pairs = dd.simhash_candidates(ds, "text", "doc_id")
    exact = pairs[(pairs.id_a == 5) & (pairs.id_b == 2000)]
    assert len(exact) == 1 and exact.hamming.iloc[0] == 0
    near = pairs[(pairs.id_a == 0) & (pairs.id_b == 1000)]
    assert len(near) == 1 and near.hamming.iloc[0] <= 16


def test_tri_pairs_matches_bruteforce():
    """Vectorized triangular pair generator vs a per-bucket brute force."""
    rng = np.random.default_rng(12)
    bdf = pd.DataFrame(
        {
            "band": rng.integers(0, 4, 2000).astype(np.int32),
            "bh": rng.integers(0, 120, 2000),
            "doc_id": rng.integers(0, 500, 2000),
        }
    )
    got = dd._tri_pairs(bdf, ["band", "bh"], "doc_id")
    expect = set()
    u = bdf.drop_duplicates(["band", "bh", "doc_id"])
    for _, g in u.groupby(["band", "bh"]):
        ids = np.sort(g.doc_id.to_numpy())
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                expect.add((ids[i], ids[j]))
    assert set(map(tuple, got[["id_a", "id_b"]].itertuples(index=False))) == expect
    assert len(expect) > 100  # non-trivial case


def test_distributed_pairing_matches_driver(ray_session, monkeypatch):
    """Cluster path (hash-partition on bucket key + per-partition pairing)
    must produce the identical candidate set as a single-node pairing over
    the same banded table. Forces the shuffle path (the size dispatch would
    otherwise pick local pairing at this toy size)."""
    monkeypatch.setattr(dd, "_LOCAL_PAIRING_ROWS", 0)
    rng = np.random.default_rng(11)
    bdf = pd.DataFrame(
        {
            "band": rng.integers(0, 8, 5000).astype(np.int32),
            "bh": rng.integers(0, 300, 5000),
            "doc_id": rng.integers(0, 800, 5000),
        }
    )
    got = dd._bucket_pairs_distributed(rd.from_pandas(bdf), ["band", "bh"], "doc_id", n_parts=7)
    exp = dd._tri_pairs(bdf, ["band", "bh"], "doc_id")
    gset = set(map(tuple, got[["id_a", "id_b"]].itertuples(index=False)))
    eset = set(map(tuple, exp[["id_a", "id_b"]].itertuples(index=False)))
    assert gset == eset and len(gset) > 0


def test_pairing_small_input_dispatch(ray_session):
    """Below the banded-row threshold the dispatch pairs locally — result
    identical to _tri_pairs, no groupby shuffle fixed cost."""
    rng = np.random.default_rng(12)
    bdf = pd.DataFrame(
        {
            "band": rng.integers(0, 4, 1000).astype(np.int32),
            "bh": rng.integers(0, 60, 1000),
            "doc_id": rng.integers(0, 300, 1000),
        }
    )
    assert dd._LOCAL_PAIRING_ROWS > 1000
    got = dd._bucket_pairs_distributed(rd.from_pandas(bdf), ["band", "bh"], "doc_id")
    exp = dd._tri_pairs(bdf, ["band", "bh"], "doc_id")
    gset = set(map(tuple, got[["id_a", "id_b"]].itertuples(index=False)))
    eset = set(map(tuple, exp[["id_a", "id_b"]].itertuples(index=False)))
    assert gset == eset and len(gset) > 0


def test_gather_texts_candidate_sized(ray_session, docs):
    ds = rd.from_pandas(docs)
    out = dd.gather_texts(ds, "doc_id", "text", np.array([0, 5, 1000, 2000]))
    assert set(out.doc_id) == {0, 5, 1000, 2000}
    lookup = dict(zip(docs.doc_id, docs.text))
    assert all(lookup[i] == t for i, t in zip(out.doc_id, out.text))


def test_exact_text_dedup(ray_session, docs):
    ds = rd.from_pandas(docs)
    out = dd.exact_text_dedup(ds, "text", "doc_id").to_pandas()
    dup_groups = out[out.n_copies > 1]
    assert len(dup_groups) == 1 and dup_groups.doc_id.iloc[0] == 5
    assert out.n_copies.sum() == len(docs)


def test_topk_exact_vs_bruteforce(ray_session):
    rng = np.random.default_rng(8)
    vecs = rng.standard_normal((300, 32))
    df = pd.DataFrame({"vec_id": np.arange(300), "embedding": list(vecs.astype(np.float32))})
    ds = rd.from_pandas(df)
    q = vecs[:4]
    got = sim.topk_cosine(ds, q, np.arange(4), k=5, vec_col="embedding", id_col="vec_id")
    # numpy brute force oracle
    nv = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    nq = (q / np.linalg.norm(q, axis=1, keepdims=True)).astype(np.float64)
    sims = nq @ nv.T
    for qi in range(4):
        s = sims[qi].copy()
        s[qi] = -np.inf
        want = set(np.argsort(-s)[:5])
        have = set(got[got.query_id == qi].vec_id)
        assert have == want, qi


def test_lsh_topk_recall(ray_session):
    rng = np.random.default_rng(9)
    vecs = rng.standard_normal((500, 32))
    df = pd.DataFrame({"vec_id": np.arange(500), "embedding": list(vecs.astype(np.float32))})
    ds = rd.from_pandas(df)
    q = vecs[:8]
    exact = sim.topk_cosine(ds, q, np.arange(8), k=5)
    approx = sim.lsh_bucket_topk(ds, q, np.arange(8), k=5, n_planes=4, n_tables=8)
    e = set(map(tuple, exact[["query_id", "vec_id"]].itertuples(index=False)))
    a = set(map(tuple, approx[["query_id", "vec_id"]].itertuples(index=False)))
    recall = len(e & a) / len(e)
    assert recall >= 0.6, recall  # bucketed ANN trades recall for pruning


def test_embedding_near_dup_lsh_matches_exact(ray_session):
    """LSH fallback (no corpus broadcast): exact precision — every emitted
    pair is cosine-verified — and high recall vs the exhaustive path."""
    rng = np.random.default_rng(13)
    vecs = rng.standard_normal((400, 24))
    for k in range(20):  # planted near-dups, cos >= ~0.9
        vecs[300 + k] = vecs[k] + rng.standard_normal(24) * 0.1
    df = pd.DataFrame({"vec_id": np.arange(400), "embedding": list(vecs.astype(np.float32))})
    ds = rd.from_pandas(df)
    exact = dd.embedding_near_dup(ds, "embedding", "vec_id", 0.9, vecs, np.arange(400)).to_pandas()
    lsh = dd.embedding_near_dup(ds, "embedding", "vec_id", 0.9).to_pandas()  # no matrix → LSH path
    e = set(map(tuple, exact[["id_a", "id_b"]].itertuples(index=False)))
    a = set(map(tuple, lsh[["id_a", "id_b"]].itertuples(index=False)))
    assert len(e) >= 20
    assert a <= e, "LSH must not emit unverified pairs"
    assert len(e & a) / len(e) >= 0.85, f"recall {len(e & a) / len(e):.2f}"


def test_embedding_near_dup_planted(ray_session):
    rng = np.random.default_rng(10)
    vecs = rng.standard_normal((200, 16))
    vecs[150] = vecs[3] + rng.standard_normal(16) * 0.05  # planted near-dup
    df = pd.DataFrame({"vec_id": np.arange(200), "embedding": list(vecs.astype(np.float32))})
    ds = rd.from_pandas(df)
    out = dd.embedding_near_dup(ds, "embedding", "vec_id", 0.95, vecs, np.arange(200)).to_pandas()
    assert (3, 150) in set(map(tuple, out[["id_a", "id_b"]].itertuples(index=False)))


def test_verify_pairs_vectorized_matches_scalar(ray_session, docs):
    """The lexsort-based pair verification must match the scalar exact
    n-gram Jaccard pair by pair (no threshold filtering)."""
    all_ids = docs.doc_id.to_numpy()
    rng = np.random.default_rng(14)
    pairs = pd.DataFrame(
        {
            "id_a": rng.choice(all_ids, 200),
            "id_b": rng.choice(all_ids, 200),
        }
    )
    pairs = pairs[pairs.id_a < pairs.id_b].drop_duplicates().reset_index(drop=True)
    # add the planted near-dup pairs so nontrivial jaccards are covered
    pairs = pd.concat(
        [pairs, pd.DataFrame({"id_a": [0, 1, 2, 5], "id_b": [1000, 1001, 1002, 2000]})],
        ignore_index=True,
    )
    lookup = dict(zip(docs.doc_id, docs.text))
    got = dd.verify_pairs_jaccard(pairs, lookup, threshold=0.0)
    want = np.array(
        [dd.word_ngram_jaccard(lookup[a], lookup[b]) for a, b in zip(pairs.id_a, pairs.id_b)]
    )
    assert len(got) == len(pairs)
    assert np.allclose(got.jaccard.to_numpy(), want)


def test_ivf_topk_recall(ray_session):
    """IVF probes a fraction of centroid lists yet keeps high recall on
    clustered data; a full-probe run must equal the exact top-k."""
    rng = np.random.default_rng(19)
    centers = rng.standard_normal((8, 32)) * 3
    vecs = np.concatenate([c + rng.standard_normal((80, 32)) for c in centers])
    df = pd.DataFrame({"vec_id": np.arange(len(vecs)), "embedding": list(vecs.astype(np.float32))})
    ds = rd.from_pandas(df)
    q = vecs[:8]
    exact = sim.topk_cosine(ds, q, np.arange(8), k=5)
    e = set(map(tuple, exact[["query_id", "vec_id"]].itertuples(index=False)))
    approx = sim.ivf_topk(ds, q, np.arange(8), k=5, n_centroids=16, n_probe=4, sample=640)
    a = set(map(tuple, approx[["query_id", "vec_id"]].itertuples(index=False)))
    assert len(e & a) / len(e) >= 0.8, len(e & a) / len(e)
    # probing every list == exact search
    full = sim.ivf_topk(ds, q, np.arange(8), k=5, n_centroids=16, n_probe=16, sample=640)
    f = set(map(tuple, full[["query_id", "vec_id"]].itertuples(index=False)))
    assert f == e


def test_bucketed_left_join_consistent_schema(ray_session):
    """Non-inner joins must emit ONE schema across buckets: the NA-fillable
    side's int columns promote to float64 up front, whether or not a given
    bucket happens to contain unmatched keys."""
    import ray.data as rd2

    from teleharvest_ray.stages.joins import bucketed_hash_join

    left = rd2.from_pandas(pd.DataFrame({"k": np.arange(1000), "lv": np.arange(1000) * 2}))
    right = rd2.from_pandas(pd.DataFrame({"k": np.arange(0, 1000, 2), "rv": np.arange(500)}))
    out = bucketed_hash_join(left, right, on="k", n_buckets=8, how="left").to_pandas()
    assert len(out) == 1000
    assert str(out["rv"].dtype) == "float64"  # NA-fillable side promoted uniformly
    assert str(out["lv"].dtype) == "int64"  # left side never NA in a left join
    matched = out[out.k % 2 == 0]
    assert (matched.sort_values("k").rv.to_numpy() == np.arange(500)).all()
    assert out[out.k % 2 == 1].rv.isna().all()


def test_longest_shared_run_matches_brute_force():
    """Randomized exactness: planted shared runs of known length, verified
    against an O(n*m) token-level brute force."""
    from teleharvest_ray.functions.hashing import hash_strings
    from teleharvest_ray.stages.dedup import longest_shared_run

    def brute(a, b):
        wa, wb = a.split(" "), b.split(" ")
        best = 0
        for i in range(len(wa)):
            for j in range(len(wb)):
                k = 0
                while i + k < len(wa) and j + k < len(wb) and wa[i + k] == wb[j + k]:
                    k += 1
                best = max(best, k)
        return best

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(25)]
    for trial in range(60):
        na, nb = rng.integers(1, 50, 2)
        wa = [vocab[i] for i in rng.integers(0, 25, na)]
        wb = [vocab[i] for i in rng.integers(0, 25, nb)]
        if trial % 2 == 0:
            run = [vocab[i] for i in rng.integers(0, 25, int(rng.integers(1, 15)))]
            pa_, pb = int(rng.integers(0, na)), int(rng.integers(0, nb))
            wa = wa[:pa_] + run + wa[pa_:]
            wb = wb[:pb] + run + wb[pb:]
        a, b = " ".join(wa), " ".join(wb)
        got = longest_shared_run(
            hash_strings(np.array(a.split(" "), dtype=object)),
            hash_strings(np.array(b.split(" "), dtype=object)),
            lo=0,
        )
        assert got == brute(a, b), (trial, a, b)


def test_shared_span_pairs_end_to_end(ray_session):
    """Planted 10-token run across two docs is found with its exact length;
    unrelated docs produce no pair."""
    import ray.data as rd
    from teleharvest_ray.stages.dedup import shared_span_pairs

    run = " ".join(f"r{i}" for i in range(10))
    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [f"alpha beta {run} gamma", f"start {run} end here", "totally different words only"],
        }
    )
    out = shared_span_pairs(rd.from_pandas(df), "text", "doc_id", min_tokens=8)
    assert len(out) == 1
    assert (int(out.id_a[0]), int(out.id_b[0]), int(out.max_run[0])) == (1, 2, 10)


def test_char_jaccard_blockwise_hot_group(ray_session):
    """One group much hotter than the others must produce identical pairs
    whether the pair space is walked in tiny tiles or one dense pass —
    proving the tile walk (which bounds memory to block^2 cells) loses no
    pairs across tile boundaries."""
    rng = np.random.default_rng(7)
    alpha = list("abcdefghijklmnop")
    rows = []
    # hot group: 60 docs over a tiny alphabet -> many qualifying pairs
    for i in range(60):
        chars = rng.choice(alpha, size=rng.integers(3, 8), replace=False)
        rows.append({"doc_id": i, "text": "".join(chars), "source": "hot"})
    for i in range(5):
        rows.append({"doc_id": 100 + i, "text": "xyz" + alpha[i], "source": "cold"})
    df = pd.DataFrame(rows)

    def run(block):
        out = dd.char_jaccard_pairs(
            rd.from_pandas(df), "text", "doc_id", "source", threshold=0.5, block=block
        ).to_pandas()
        return set(map(tuple, out[["id_a", "id_b"]].to_numpy()))

    dense = run(10_000)  # one tile covers everything (the old dense shape)
    tiled = run(7)  # forces diagonal AND off-diagonal tiles in the hot group
    assert dense == tiled
    assert len(dense) > 10  # the hot group actually exercises multi-tile pairing


def test_myers_distance_matches_bruteforce_dp():
    """Fuzz the bit-parallel kernel (word path <=64 bytes AND numpy
    fallback) against the classic O(mn) DP, over a unicode alphabet so the
    byte-level (DuckDB levenshtein) semantics are exercised."""
    import random

    def brute(a: str, b: str) -> int:
        a, b = a.encode(), b.encode()
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    rng = random.Random(7)
    alph = "abcd таро"
    for _ in range(200):
        a = "".join(rng.choice(alph) for _ in range(rng.randint(0, 90)))
        b = "".join(rng.choice(alph) for _ in range(rng.randint(0, 90)))
        assert dd.myers_distance(a, b) == brute(a, b), (a, b)
    assert dd.myers_distance("", "") == 0
    assert dd.myers_distance("", "abc") == 3


def test_myers_batch_matches_scalar():
    """Lane-parallel batch kernel == scalar kernel on prefix-64 semantics,
    over ragged lengths, empties, and non-ASCII (which routes lanes through
    the scalar fallback when UTF-8 expansion exceeds one word)."""
    import random

    import numpy as np

    rng = random.Random(13)
    alph = "abcde  таро"
    a = ["".join(rng.choice(alph) for _ in range(rng.randint(0, 120))) for _ in range(300)]
    b = ["".join(rng.choice(alph) for _ in range(rng.randint(0, 120))) for _ in range(300)]
    got = dd.myers_distance_batch(a, b, prefix=64)
    exp = np.array([dd.myers_distance(x[:64], y[:64]) for x, y in zip(a, b)], dtype=np.int64)
    assert (got == exp).all()
    assert len(dd.myers_distance_batch([], [])) == 0
