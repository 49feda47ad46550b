"""Mergeable sketches for distributed column statistics.

The north_rule requires approx-distinct via HyperLogLog merged in a
groupby-aggregate reduce, plus quantile sketches for length/token
distributions. All sketches here are:

- **mergeable** (associative, commutative merge) so they compose with Ray
  Data's partial+final aggregation (SURVEY.md §2.5 G6),
- **deterministic across processes** (fixed hash key via functions.hashing;
  HLL and Histogram are additionally order-independent, so resumed runs
  produce bit-identical state),
- **tiny** (KBs) so the reduce stage shuffles sketch bytes, never data.

HLL: standard dense HyperLogLog (Flajolet et al. 2007) with linear-counting
small-range correction. Histogram: fixed-bin counting histogram — exact,
order-independent, and directly usable for the KS drift statistic. KLL: a
simplified deterministic-compaction KLL (Karnin-Lang-Liberty 2016 shape) for
unbounded doubles; its estimates are order-dependent within error bounds
(documented), so drift checks on bounded ints prefer the histogram.
"""

from __future__ import annotations

import pickle
import zlib

import numpy as np

from .hashing import hash_strings, splitmix64

_U64 = np.uint64


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------


class HyperLogLog:
    """Dense HLL over uint64 hashes; registers are uint8, merge = elementwise max."""

    __slots__ = ("p", "m", "registers")

    def __init__(self, p: int = 14, registers: np.ndarray | None = None):
        self.p = p
        self.m = 1 << p
        self.registers = (
            registers if registers is not None else np.zeros(self.m, dtype=np.uint8)
        )

    def update_hashes(self, h: np.ndarray) -> None:
        if len(h) == 0:
            return
        h = h.astype(_U64, copy=False)
        idx = (h >> _U64(64 - self.p)).astype(np.int64)
        w = (h << _U64(self.p)) | _U64((1 << self.p) - 1)  # pad tail with 1s
        # rho = #leading zeros of w + 1. Highest-set-bit via float64 log2 on
        # 32-bit halves (uint32 values are exactly representable in float64,
        # so floor(log2) is exact).
        hi = (w >> _U64(32)).astype(np.int64)
        lo = (w & _U64(0xFFFFFFFF)).astype(np.int64)
        hb = np.where(
            hi != 0,
            32 + np.floor(np.log2(np.maximum(hi, 1).astype(np.float64))).astype(np.int64),
            np.floor(np.log2(np.maximum(lo, 1).astype(np.float64))).astype(np.int64),
        )
        lz = (64 - hb).astype(np.uint8)  # leading zeros + 1 (w != 0 by padding)
        np.maximum.at(self.registers, idx, lz)

    def update_strings(self, values) -> None:
        self.update_hashes(hash_strings(values))

    def update_ints(self, values: np.ndarray) -> None:
        self.update_hashes(splitmix64(np.asarray(values, dtype=np.int64).view(_U64)))

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        if m >= 128:
            alpha = 0.7213 / (1 + 1.079 / m)
        else:
            alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(self.m, 0.7213 / (1 + 1.079 / m))
        regs = self.registers.astype(np.float64)
        est = alpha * m * m / np.sum(np.exp2(-regs))
        if est <= 2.5 * m:
            zeros = int(np.count_nonzero(self.registers == 0))
            if zeros:
                return m * np.log(m / zeros)
        return float(est)

    def to_bytes(self) -> bytes:
        return bytes([self.p]) + zlib.compress(self.registers.tobytes(), 1)

    @classmethod
    def from_bytes(cls, b: bytes) -> "HyperLogLog":
        p = b[0]
        regs = np.frombuffer(zlib.decompress(b[1:]), dtype=np.uint8).copy()
        return cls(p=p, registers=regs)


# ---------------------------------------------------------------------------
# Fixed-bin counting histogram (exact, order-independent, mergeable)
# ---------------------------------------------------------------------------


class HistogramSketch:
    """Counting histogram over non-negative ints (lengths, token counts).

    Bin i covers [i*bin_width, (i+1)*bin_width); the last bin is an overflow
    bucket. Merge = vector add. Supplies exact ECDF at bin boundaries → the
    KS drift statistic, and quantiles at bin resolution.
    """

    __slots__ = ("bin_width", "n_bins", "counts", "total", "vmin", "vmax", "vsum")

    def __init__(self, bin_width: int = 32, max_value: int = 8192):
        self.bin_width = bin_width
        self.n_bins = max_value // bin_width + 1
        self.counts = np.zeros(self.n_bins, dtype=np.int64)
        self.total = 0
        self.vmin = None
        self.vmax = None
        self.vsum = 0.0

    def update(self, values: np.ndarray) -> None:
        v = np.asarray(values)
        v = v[~np.isnan(v.astype(np.float64))] if v.dtype.kind == "f" else v
        if len(v) == 0:
            return
        v = v.astype(np.int64)
        idx = np.clip(v // self.bin_width, 0, self.n_bins - 1)
        np.add.at(self.counts, idx, 1)
        self.total += len(v)
        mn, mx = int(v.min()), int(v.max())
        self.vmin = mn if self.vmin is None else min(self.vmin, mn)
        self.vmax = mx if self.vmax is None else max(self.vmax, mx)
        self.vsum += float(v.sum())

    def merge(self, other: "HistogramSketch") -> "HistogramSketch":
        assert self.bin_width == other.bin_width and self.n_bins == other.n_bins
        self.counts += other.counts
        self.total += other.total
        if other.vmin is not None:
            self.vmin = other.vmin if self.vmin is None else min(self.vmin, other.vmin)
            self.vmax = other.vmax if self.vmax is None else max(self.vmax, other.vmax)
        self.vsum += other.vsum
        return self

    def ecdf(self) -> np.ndarray:
        if self.total == 0:
            return np.zeros(self.n_bins)
        return np.cumsum(self.counts) / self.total

    def ks_distance(self, other: "HistogramSketch") -> float:
        """Max |ECDF1 - ECDF2| at shared bin boundaries (KS statistic)."""
        if self.total == 0 or other.total == 0:
            return 0.0
        return float(np.max(np.abs(self.ecdf() - other.ecdf())))

    def quantile(self, q: float) -> float:
        if self.total == 0:
            return float("nan")
        target = q * self.total
        cum = np.cumsum(self.counts)
        i = int(np.searchsorted(cum, target, side="left"))
        i = min(i, self.n_bins - 1)
        return (i + 0.5) * self.bin_width

    def mean(self) -> float:
        return self.vsum / self.total if self.total else float("nan")

    def to_bytes(self) -> bytes:
        return zlib.compress(
            pickle.dumps(
                (self.bin_width, self.n_bins, self.counts, self.total, self.vmin, self.vmax, self.vsum),
                protocol=4,
            ),
            1,
        )

    @classmethod
    def from_bytes(cls, b: bytes) -> "HistogramSketch":
        bin_width, n_bins, counts, total, vmin, vmax, vsum = pickle.loads(zlib.decompress(b))
        h = cls.__new__(cls)
        h.bin_width, h.n_bins, h.counts, h.total = bin_width, n_bins, counts.copy(), total
        h.vmin, h.vmax, h.vsum = vmin, vmax, vsum
        return h


# ---------------------------------------------------------------------------
# KLL-style quantile sketch (for unbounded doubles)
# ---------------------------------------------------------------------------


class KLLSketch:
    """Simplified KLL (Karnin-Lang-Liberty 2016) quantile sketch.

    Levels hold sorted buffers; a full level compacts by keeping every other
    element (deterministic offset alternation instead of a coin flip — makes
    the sketch process-deterministic for a fixed input order; across Ray's
    nondeterministic block order estimates stay within the usual KLL error,
    see PAPERS.md EDBT'23 analysis). Element at level L has weight 2^L.
    """

    __slots__ = ("k", "levels", "n", "_parity")

    def __init__(self, k: int = 200):
        self.k = k
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self.n = 0
        self._parity = 0

    def _capacity(self, level: int, n_levels: int) -> int:
        # top levels get ~k, lower levels shrink by 2/3 per step below top
        c = int(self.k * (2.0 / 3.0) ** (n_levels - 1 - level))
        return max(c, 8)

    def update(self, values: np.ndarray) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return
        self.n += len(v)
        self.levels[0] = np.concatenate([self.levels[0], v])
        self._compress()

    def _compress(self) -> None:
        lvl = 0
        while lvl < len(self.levels):
            cap = self._capacity(lvl, len(self.levels))
            buf = self.levels[lvl]
            if len(buf) > 2 * cap:
                buf = np.sort(buf)
                self._parity ^= 1
                kept = buf[self._parity :: 2]
                if lvl + 1 == len(self.levels):
                    self.levels.append(np.empty(0, dtype=np.float64))
                self.levels[lvl + 1] = np.concatenate([self.levels[lvl + 1], kept])
                self.levels[lvl] = np.empty(0, dtype=np.float64)
            lvl += 1

    def merge(self, other: "KLLSketch") -> "KLLSketch":
        assert self.k == other.k
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
        for i, buf in enumerate(other.levels):
            if len(buf):
                self.levels[i] = np.concatenate([self.levels[i], buf])
        self.n += other.n
        self._compress()
        return self

    def quantile(self, q: float) -> float:
        if self.n == 0:
            return float("nan")
        vals = []
        wts = []
        for lvl, buf in enumerate(self.levels):
            if len(buf):
                vals.append(buf)
                wts.append(np.full(len(buf), 1 << lvl, dtype=np.int64))
        v = np.concatenate(vals)
        w = np.concatenate(wts)
        order = np.argsort(v, kind="stable")
        v, w = v[order], w[order]
        cw = np.cumsum(w)
        target = q * cw[-1]
        i = int(np.searchsorted(cw, target, side="left"))
        return float(v[min(i, len(v) - 1)])

    def to_bytes(self) -> bytes:
        return zlib.compress(pickle.dumps((self.k, self.levels, self.n, self._parity), protocol=4), 1)

    @classmethod
    def from_bytes(cls, b: bytes) -> "KLLSketch":
        k, levels, n, parity = pickle.loads(zlib.decompress(b))
        s = cls(k)
        s.levels, s.n, s._parity = [np.asarray(x) for x in levels], n, parity
        return s


# ---------------------------------------------------------------------------
# SpaceSaving heavy hitters (mergeable, one-sided error)
# ---------------------------------------------------------------------------


class SpaceSaving:
    """SpaceSaving top-k sketch (Metwally et al. 2005): tracks ``capacity``
    counters; any item with true frequency > n/capacity is GUARANTEED to be
    among the counters (one-sided: the candidate set is a superset of the
    true heavy hitters, counts may overestimate by at most ``err``).

    Mergeable: counter-wise sum with re-truncation keeps the superset
    guarantee at capacity summed error. The intended shape is
    sketch-per-batch → merge → EXACT verification of the candidate set with
    one filtered count (see queries.q_heavy_hitters) — the same
    candidates-then-verify paradigm as the keyspace dup check.
    """

    __slots__ = ("capacity", "counts", "errs", "n")

    def __init__(self, capacity: int = 256):
        self.capacity = capacity
        self.counts: dict = {}
        self.errs: dict = {}
        self.n = 0

    def update(self, values: np.ndarray, weights: np.ndarray | None = None) -> None:
        """Bulk update: pre-aggregate the batch (vectorized), then fold the
        per-batch totals — the dict loop runs over DISTINCT batch values."""
        vals, inv = np.unique(np.asarray(values, dtype=object), return_inverse=True)
        w = np.bincount(inv, weights=weights).astype(np.int64) if weights is not None else np.bincount(inv)
        self.n += int(w.sum())
        for v, c in zip(vals, w):
            c = int(c)
            if v in self.counts:
                self.counts[v] += c
            elif len(self.counts) < self.capacity:
                self.counts[v] = c
                self.errs[v] = 0
            else:
                victim = min(self.counts, key=self.counts.get)
                base = self.counts.pop(victim)
                self.errs.pop(victim)
                self.counts[v] = base + c
                self.errs[v] = base
        # keep n consistent even when weights exceed int32 etc.

    def merge(self, other: "SpaceSaving") -> "SpaceSaving":
        for v, c in other.counts.items():
            if v in self.counts:
                self.counts[v] += c
                self.errs[v] += other.errs[v]
            else:
                self.counts[v] = c
                self.errs[v] = other.errs.get(v, 0)
        self.n += other.n
        if len(self.counts) > self.capacity:
            keep = sorted(self.counts, key=self.counts.get, reverse=True)[: self.capacity]
            dropped_max = max(self.counts[v] for v in self.counts if v not in set(keep))
            self.counts = {v: self.counts[v] for v in keep}
            self.errs = {v: self.errs.get(v, 0) + dropped_max for v in keep}
        return self

    def candidates(self, k: int) -> list:
        """Top-k candidate values (a superset-biased ranking by upper-bound
        count); verify exactly before trusting the order."""
        return sorted(self.counts, key=self.counts.get, reverse=True)[:k]

    def to_bytes(self) -> bytes:
        return zlib.compress(pickle.dumps((self.capacity, self.counts, self.errs, self.n), protocol=4))

    @classmethod
    def from_bytes(cls, b: bytes) -> "SpaceSaving":
        cap, counts, errs, n = pickle.loads(zlib.decompress(b))
        s = cls(capacity=cap)
        s.counts, s.errs, s.n = counts, errs, n
        return s


# ---------------------------------------------------------------------------
# Count-Min sketch (point-frequency estimation, one-sided error)
# ---------------------------------------------------------------------------


class CountMinSketch:
    """Count-Min sketch (Cormode & Muthukrishnan 2005): ``d`` hash rows of
    ``w`` int64 counters. Update adds each key's weight at one cell per row;
    a point estimate is the MIN over rows, so it NEVER undercounts and
    overcounts by at most ``eps * N`` (eps = e/w, N = total weight) with
    probability >= 1 - e^-d per query.

    Merge = elementwise add (associative + commutative), so per-batch partial
    sketches compose with Ray Data's partial+final reduce exactly like
    :class:`HyperLogLog`. Row seeds are fixed (splitmix64 of the row index),
    so sketches built in different processes / partition orders are
    bit-identical state — the property every sketch in this module keeps.

    Intended shape (queries.q_cms_user_counts): sketch-per-batch -> merge ->
    certify the estimates against the exact groupby counts (est >= exact and
    est - exact <= error_bound pinned TRUE by the SQL oracle) — the
    candidates-then-verify paradigm of :class:`SpaceSaving`, in certificate
    form.
    """

    __slots__ = ("d", "w", "table")

    def __init__(self, d: int = 4, w: int = 2048, table: np.ndarray | None = None):
        self.d = d
        self.w = w
        self.table = table if table is not None else np.zeros((d, w), dtype=np.int64)

    def _cells(self, h: np.ndarray) -> np.ndarray:
        """(d, n) counter indices for key hashes ``h`` — one splitmix64 mix
        per row with a fixed per-row seed."""
        h = h.astype(_U64, copy=False)
        out = np.empty((self.d, len(h)), dtype=np.int64)
        for r in range(self.d):
            seed = splitmix64(np.asarray([r + 1], dtype=_U64))[0]
            out[r] = (splitmix64(h ^ seed) % _U64(self.w)).astype(np.int64)
        return out

    def update_hashes(self, h: np.ndarray, weights: np.ndarray | None = None) -> None:
        if len(h) == 0:
            return
        cells = self._cells(h)
        wts = (
            np.ones(len(h), dtype=np.int64)
            if weights is None
            else np.asarray(weights, dtype=np.int64)
        )
        for r in range(self.d):
            np.add.at(self.table[r], cells[r], wts)

    def update_ints(self, values: np.ndarray) -> None:
        self.update_hashes(splitmix64(np.asarray(values).astype(_U64)))

    def estimate_hashes(self, h: np.ndarray) -> np.ndarray:
        if len(h) == 0:
            return np.empty(0, dtype=np.int64)
        cells = self._cells(h)
        ests = np.empty((self.d, len(h)), dtype=np.int64)
        for r in range(self.d):
            ests[r] = self.table[r][cells[r]]
        return ests.min(axis=0)

    def estimate_ints(self, values: np.ndarray) -> np.ndarray:
        return self.estimate_hashes(splitmix64(np.asarray(values).astype(_U64)))

    def total(self) -> int:
        """Total inserted weight N (any row's sum — all rows see every update)."""
        return int(self.table[0].sum())

    def error_bound(self) -> int:
        """ceil(e/w * N): the classic one-sided overcount bound."""
        return int(np.ceil(np.e / self.w * self.total()))

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        if (self.d, self.w) != (other.d, other.w):
            raise ValueError("CountMinSketch shape mismatch")
        self.table += other.table
        return self

    def to_bytes(self) -> bytes:
        return zlib.compress(
            pickle.dumps((self.d, self.w, self.table), protocol=4), 1
        )

    @classmethod
    def from_bytes(cls, b: bytes) -> "CountMinSketch":
        d, w, table = pickle.loads(zlib.decompress(b))
        return cls(d=d, w=w, table=table)
