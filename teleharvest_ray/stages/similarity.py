"""Similarity search over an embedding column (``list<float>``).

Baseline: brute-force cosine top-k — each batch does one matmul against a
broadcast query matrix (``ray.put`` once, read per actor/task; the J1
broadcast-small-side pattern, reference ``processor.py:140-143``), emits its
batch-local top-k per query, and a tiny driver-side merge finishes. Scale
paths: LSH-bucketed ANN — random-hyperplane signatures bucket both queries
and corpus, candidates only within matching buckets — and IVF — a sampled
spherical-k-means coarse quantizer with per-query n_probe nearest inverted
lists. Both are shuffle-free (only small query/centroid state broadcasts)
and trade recall for pruning.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset

from ..functions.arrays import list_to_mat


def _l2(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def topk_cosine(
    ds: Dataset,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    exclude_self: bool = True,
) -> pd.DataFrame:
    """Exact top-k by cosine: per-batch matmul + per-batch partial top-k, then
    a driver merge over (n_queries × k × n_blocks) candidate rows — the only
    thing ever collected is candidates, never vectors."""
    qm = _l2(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put(qm)
    qid_ref = ray.put(np.asarray(query_ids))

    def per_batch(tbl: pa.Table) -> pa.Table:
        q = ray.get(q_ref)
        qids = ray.get(qid_ref)
        vecs = _l2(list_to_mat(tbl[vec_col]))
        ids = tbl[id_col].to_numpy(zero_copy_only=False)
        sims = q @ vecs.T  # (n_q, n_batch)
        if exclude_self:
            self_mask = qids[:, None] == ids[None, :]
            sims = np.where(self_mask, -np.inf, sims)
        kk = min(k, sims.shape[1])
        top = np.argpartition(-sims, kth=kk - 1, axis=1)[:, :kk]
        rows = np.repeat(qids, kk)
        cand = ids[top.reshape(-1)]
        sv = np.take_along_axis(sims, top, axis=1).reshape(-1)
        keep = np.isfinite(sv)
        return pa.table(
            {
                "query_id": pa.array(rows[keep]),
                id_col: pa.array(cand[keep]),
                "sim": pa.array(sv[keep]),
            }
        )

    cands = ds.map_batches(per_batch, batch_format="pyarrow").to_pandas()
    if not len(cands):
        return pd.DataFrame({"query_id": [], id_col: [], "rank": []})
    # deterministic ranking: sim desc, id asc tiebreak
    cands = cands.sort_values(["query_id", "sim", id_col], ascending=[True, False, True])
    cands["rank"] = cands.groupby("query_id").cumcount() + 1
    out = cands[cands["rank"] <= k].reset_index(drop=True)
    return out[["query_id", "rank", id_col, "sim"]]


def _blockwise_topk_pairs(q, qids, vecs, ids, k, match_fn, block: int = 512):
    """Vectorized candidate scoring shared by the ANN variants: per
    query-block (bounds the boolean match matrix at block × n_batch),
    gather all (query, candidate) pairs at once, one einsum for their
    cosines, then a lexsort-based per-query top-k — no per-query Python
    loop, so large query sets cost O(pairs) numpy work. ``match_fn(s0, s1)``
    returns the (block, n_batch) candidate mask for queries [s0, s1)."""
    rows_q, rows_id, rows_sim = [], [], []
    for s0 in range(0, len(q), block):
        s1 = min(s0 + block, len(q))
        m = match_fn(s0, s1)
        bqi, vi = np.nonzero(m)
        if not len(bqi):
            continue
        gqi = bqi + s0
        # chunk the fancy-index gathers: at high match density (IVF with a
        # generous n_probe) n_pairs × dim × 16 B of gathered copies would
        # spike actor memory; chunking bounds the transient at ~130 MB while
        # the per-pair sims array itself stays 8 B/pair
        sims = np.empty(len(gqi))
        chunk = max(16_384, 8_000_000 // max(q.shape[1], 1))
        for c0 in range(0, len(gqi), chunk):
            c1 = min(c0 + chunk, len(gqi))
            sims[c0:c1] = np.einsum("ij,ij->i", q[gqi[c0:c1]], vecs[vi[c0:c1]])
        cand = ids[vi]
        nonself = cand != qids[gqi]
        gqi, cand, sims = gqi[nonself], cand[nonself], sims[nonself]
        if not len(gqi):
            continue
        order = np.lexsort((cand, -sims, gqi))  # query asc, sim desc, id asc
        gqi, cand, sims = gqi[order], cand[order], sims[order]
        starts = np.flatnonzero(np.r_[True, gqi[1:] != gqi[:-1]])
        counts = np.diff(np.r_[starts, len(gqi)])
        ranks = np.arange(len(gqi)) - np.repeat(starts, counts)
        keep = ranks < k
        rows_q.append(qids[gqi[keep]])
        rows_id.append(cand[keep])
        rows_sim.append(sims[keep])
    return rows_q, rows_id, rows_sim


def lsh_bucket_topk(
    ds: Dataset,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 13,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> pd.DataFrame:
    """Approximate top-k: random-hyperplane signature buckets over
    ``n_tables`` independent tables (union of candidates — the standard LSH
    recall lever); each corpus batch only scores queries sharing a bucket in
    at least one table. Same output contract as :func:`topk_cosine`."""
    rng = np.random.default_rng(seed)
    dim = queries.shape[1]
    planes = rng.standard_normal((n_tables, dim, n_planes))
    qm = _l2(np.asarray(queries, dtype=np.float64))
    q_sig = np.stack(
        [(((qm @ planes[t]) > 0).astype(np.uint8) * (1 << np.arange(n_planes))).sum(1) for t in range(n_tables)]
    )  # (n_tables, n_q)
    q_ref = ray.put((qm, np.asarray(query_ids), q_sig, planes))

    def per_batch(tbl: pa.Table) -> pa.Table:
        q, qids, qsig, pl = ray.get(q_ref)
        vecs = _l2(list_to_mat(tbl[vec_col]))
        ids = tbl[id_col].to_numpy(zero_copy_only=False)
        nt, npl = pl.shape[0], pl.shape[2]
        sig = np.stack(
            [(((vecs @ pl[t]) > 0).astype(np.uint8) * (1 << np.arange(npl))).sum(1) for t in range(nt)]
        )  # (n_tables, n_batch)
        rows_q, rows_id, rows_sim = _blockwise_topk_pairs(
            q, qids, vecs, ids, k, lambda s0, s1: (qsig[:, s0:s1, None] == sig[:, None, :]).any(0)
        )
        if not rows_q:
            return pa.table({"query_id": pa.array([], pa.int64()), id_col: pa.array([], pa.int64()), "sim": pa.array([], pa.float64())})
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(rows_q)),
                id_col: pa.array(np.concatenate(rows_id)),
                "sim": pa.array(np.concatenate(rows_sim)),
            }
        )

    cands = ds.map_batches(per_batch, batch_format="pyarrow").to_pandas()
    if not len(cands):
        return pd.DataFrame({"query_id": [], id_col: [], "rank": [], "sim": []})
    cands = cands.sort_values(["query_id", "sim", id_col], ascending=[True, False, True])
    cands["rank"] = cands.groupby("query_id").cumcount() + 1
    return cands[cands["rank"] <= k][["query_id", "rank", id_col, "sim"]].reset_index(drop=True)


def train_ivf_centroids(
    ds: Dataset,
    n_centroids: int = 64,
    sample: int = 50_000,
    n_iter: int = 5,
    seed: int = 11,
    vec_col: str = "embedding",
) -> np.ndarray:
    """Coarse quantizer for IVF: deterministic spherical k-means over a
    bounded sample (``ds.limit(sample)`` — a streaming take, never the full
    corpus). Returns L2-normalized (n_centroids, dim) centroids. At cluster
    scale the sample is the only training data that leaves the dataset."""
    df = ds.limit(sample).to_pandas()
    X = _l2(np.stack(df[vec_col].to_numpy()).astype(np.float64))
    n_centroids = min(n_centroids, len(X))
    rng = np.random.default_rng(seed)
    C = X[rng.choice(len(X), n_centroids, replace=False)]
    for _ in range(n_iter):
        assign = np.argmax(X @ C.T, axis=1)  # cosine on unit vectors
        for c in range(n_centroids):  # n_centroids is small by construction
            members = X[assign == c]
            if len(members):
                C[c] = members.sum(0)
        C = _l2(C)
    return C


def ivf_topk(
    ds: Dataset,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int,
    n_centroids: int = 64,
    n_probe: int = 8,
    sample: int = 50_000,
    seed: int = 11,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> pd.DataFrame:
    """IVF approximate top-k: corpus vectors assign to their nearest
    centroid per batch; each query probes its ``n_probe`` nearest centroid
    lists and scores only those candidates — the classic inverted-file
    pruning, broadcast-light (only the small centroid matrix ships). Same
    output contract as :func:`topk_cosine`; recall rises with ``n_probe``."""
    C = train_ivf_centroids(ds, n_centroids, sample, seed=seed, vec_col=vec_col)
    qm = _l2(np.asarray(queries, dtype=np.float64))
    # (n_q, n_probe) probed centroid ids -> boolean probe mask per query
    probe_order = np.argsort(-(qm @ C.T), axis=1)[:, : min(n_probe, len(C))]
    probe_mask = np.zeros((len(qm), len(C)), dtype=bool)
    np.put_along_axis(probe_mask, probe_order, True, axis=1)
    ref = ray.put((qm, np.asarray(query_ids), C, probe_mask))

    def per_batch(tbl: pa.Table) -> pa.Table:
        q, qids, cm, pmask = ray.get(ref)
        vecs = _l2(list_to_mat(tbl[vec_col]))
        ids = tbl[id_col].to_numpy(zero_copy_only=False)
        assign = np.argmax(vecs @ cm.T, axis=1)  # (n_batch,)
        rows_q, rows_id, rows_sim = _blockwise_topk_pairs(
            q, qids, vecs, ids, k, lambda s0, s1: pmask[s0:s1][:, assign]
        )
        if not rows_q:
            return pa.table(
                {"query_id": pa.array([], pa.int64()), id_col: pa.array([], pa.int64()), "sim": pa.array([], pa.float64())}
            )
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(rows_q)),
                id_col: pa.array(np.concatenate(rows_id)),
                "sim": pa.array(np.concatenate(rows_sim)),
            }
        )

    cands = ds.map_batches(per_batch, batch_format="pyarrow").to_pandas()
    if not len(cands):
        return pd.DataFrame({"query_id": [], id_col: [], "rank": [], "sim": []})
    cands = cands.sort_values(["query_id", "sim", id_col], ascending=[True, False, True])
    cands["rank"] = cands.groupby("query_id").cumcount() + 1
    return cands[cands["rank"] <= k][["query_id", "rank", id_col, "sim"]].reset_index(drop=True)
