"""Similarity search over an embedding column (``list<float>``).

Baseline: brute-force cosine top-k — each batch does one matmul against a
broadcast query matrix (``ray.put`` once, read per actor/task; the J1
broadcast-small-side pattern, reference ``processor.py:140-143``), emits its
batch-local top-k per query, and a tiny driver-side merge finishes. Scale
path: LSH-bucketed ANN — random-hyperplane signatures bucket both queries and
corpus, candidates only within matching buckets (recall traded for a
shuffle-free candidate generation).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset


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
        vecs = _l2(np.stack(tbl[vec_col].to_pandas().to_numpy()).astype(np.float64))
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
        vecs = _l2(np.stack(tbl[vec_col].to_pandas().to_numpy()).astype(np.float64))
        ids = tbl[id_col].to_numpy(zero_copy_only=False)
        nt, npl = pl.shape[0], pl.shape[2]
        sig = np.stack(
            [(((vecs @ pl[t]) > 0).astype(np.uint8) * (1 << np.arange(npl))).sum(1) for t in range(nt)]
        )  # (n_tables, n_batch)
        # vectorized across queries: per query-block (bounds the boolean
        # match matrix at block × n_batch), gather all (query, candidate)
        # pairs at once, one einsum for their cosines, then a lexsort-based
        # per-query top-k — no per-query Python loop, so large query sets
        # cost O(pairs) numpy work
        rows_q, rows_id, rows_sim = [], [], []
        QB = 512
        for s0 in range(0, len(q), QB):
            s1 = min(s0 + QB, len(q))
            m = (qsig[:, s0:s1, None] == sig[:, None, :]).any(0)  # (block, n_batch)
            bqi, vi = np.nonzero(m)
            if not len(bqi):
                continue
            gqi = bqi + s0
            sims = np.einsum("ij,ij->i", q[gqi], vecs[vi])
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
