"""Mergeable single-pass sketches: Welford moments, t-digest, HyperLogLog.

These replace the reference's whole-DataFrame statistics
(matrix_validator.py:531-659 mean/std/skew; rule_validator.py:355-371 qcut
quantiles; rule_validator.py:338 / variant_validator.py:403 nunique) with
partial+merge accumulators so a Ray Data pipeline can compute them in one
streaming pass: each ``map_batches`` task emits one serialized partial per
batch, and a tiny downstream reduce merges them (see stages/statstage.py).

All implementations are pure numpy (public algorithms: Chan et al. parallel
moments; Dunning's merging t-digest; Flajolet et al. HyperLogLog with
linear-counting small-range correction).
"""

from __future__ import annotations

import pickle
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

# --------------------------------------------------------------------------
# Welford / Chan parallel moments (count, mean, M2, M3) + min/max
# --------------------------------------------------------------------------


@dataclass
class Moments:
    n: float = 0.0
    mean: float = 0.0
    m2: float = 0.0
    m3: float = 0.0
    min: float = float("inf")
    max: float = float("-inf")

    def add_array(self, x: np.ndarray) -> "Moments":
        x = np.asarray(x, dtype=np.float64)
        x = x[~np.isnan(x)]
        if x.size == 0:
            return self
        nb = float(x.size)
        mb = float(x.mean())
        d = x - mb
        other = Moments(
            n=nb,
            mean=mb,
            m2=float(np.dot(d, d)),
            m3=float(np.sum(d**3)),
            min=float(x.min()),
            max=float(x.max()),
        )
        return self.merge(other)

    def merge(self, o: "Moments") -> "Moments":
        if o.n == 0:
            return self
        if self.n == 0:
            self.n, self.mean, self.m2, self.m3 = o.n, o.mean, o.m2, o.m3
            self.min, self.max = o.min, o.max
            return self
        na, nb, n = self.n, o.n, self.n + o.n
        d = o.mean - self.mean
        self.m3 = (
            self.m3
            + o.m3
            + d**3 * na * nb * (na - nb) / n**2
            + 3.0 * d * (na * o.m2 - nb * self.m2) / n
        )
        self.m2 = self.m2 + o.m2 + d * d * na * nb / n
        self.mean = self.mean + d * nb / n
        self.n = n
        self.min = min(self.min, o.min)
        self.max = max(self.max, o.max)
        return self

    @property
    def variance(self) -> float:  # population variance, like np.var / stddev_pop
        return self.m2 / self.n if self.n > 0 else float("nan")

    @property
    def std(self) -> float:
        return float(np.sqrt(self.variance)) if self.n > 0 else float("nan")

    @property
    def skewness(self) -> float:
        """Population (g1) skewness; the reference's df.skew() is the
        adjusted variant — adjust() converts when n is known."""
        if self.n == 0 or self.m2 == 0:
            return float("nan")
        return float((self.m3 / self.n) / (self.m2 / self.n) ** 1.5)

    @property
    def skewness_adjusted(self) -> float:
        """Adjusted Fisher-Pearson skew (pandas df.skew, rule_validator.py:397)."""
        n, g1 = self.n, self.skewness
        if n < 3 or np.isnan(g1):
            return float("nan")
        return float(g1 * np.sqrt(n * (n - 1)) / (n - 2))


# --------------------------------------------------------------------------
# Merging t-digest (Dunning) — quantiles / CDF for qcut, drift histograms
# --------------------------------------------------------------------------


@dataclass
class TDigest:
    compression: float = 100.0
    means: np.ndarray = field(default_factory=lambda: np.empty(0))
    weights: np.ndarray = field(default_factory=lambda: np.empty(0))
    _buf_m: list = field(default_factory=list)
    _buf_w: list = field(default_factory=list)

    def add_array(self, x: np.ndarray, weight: float = 1.0) -> "TDigest":
        x = np.asarray(x, dtype=np.float64)
        x = x[~np.isnan(x)]
        if x.size == 0:
            return self
        if x.size > 2048:
            # vectorized pre-clustering: sort once, reduce to ~1024 exact
            # equal-weight bins (C-speed) before the centroid merge — keeps
            # the Python merge loop off the per-row hot path
            x = np.sort(x)
            n_bins = 1024
            edges = np.linspace(0, x.size, n_bins + 1).astype(np.int64)
            edges = np.unique(edges)
            counts = np.diff(edges).astype(np.float64)
            sums = np.add.reduceat(x, edges[:-1])
            self._buf_m.append(sums / counts)
            self._buf_w.append(counts * weight)
        else:
            self._buf_m.append(x)
            self._buf_w.append(np.full(x.size, weight))
        if sum(a.size for a in self._buf_m) > 8192:
            self._compress()
        return self

    def merge(self, o: "TDigest") -> "TDigest":
        o._compress()
        if o.means.size:
            self._buf_m.append(o.means)
            self._buf_w.append(o.weights)
            self._compress()
        return self

    def _k(self, q: np.ndarray) -> np.ndarray:
        # k1 scale function: delta/(2*pi) * asin(2q-1)
        return self.compression / (2 * np.pi) * np.arcsin(2 * np.clip(q, 0, 1) - 1)

    def _compress(self) -> None:
        """Vectorized bucket-merge compression: sort centroids, map each to a
        half-unit cell of the k1 scale function by its mid-quantile, and
        weighted-average within cells (C-speed reduceat; cell width 1/2 in
        k-space keeps the per-centroid quantile error within the standard
        t-digest bound, at ~2x the centroid count of the greedy merge)."""
        if self._buf_m:
            m = np.concatenate([self.means] + self._buf_m)
            w = np.concatenate([self.weights] + self._buf_w)
            self._buf_m, self._buf_w = [], []
        else:
            m, w = self.means, self.weights
        if m.size == 0:
            return
        order = np.argsort(m, kind="stable")
        m, w = m[order], w[order]
        total = w.sum()
        cum = np.cumsum(w)
        qmid = (cum - w / 2.0) / total
        cell = np.floor(self._k(qmid) * 2.0)
        starts = np.concatenate([[0], np.flatnonzero(np.diff(cell)) + 1])
        wsum = np.add.reduceat(w, starts)
        msum = np.add.reduceat(m * w, starts)
        self.means = msum / wsum
        self.weights = wsum

    @property
    def total_weight(self) -> float:
        self._compress()
        return float(self.weights.sum()) if self.weights.size else 0.0

    def quantile(self, q: float) -> float:
        self._compress()
        if self.means.size == 0:
            return float("nan")
        if self.means.size == 1:
            return float(self.means[0])
        cum = np.cumsum(self.weights) - self.weights / 2.0
        target = q * self.weights.sum()
        return float(np.interp(target, cum, self.means))

    def quantile_step(self, q: float) -> float:
        """Step-function inverse CDF: the centroid whose cumulative-weight
        span contains q*total. Unlike the interpolating ``quantile``, a
        heavily tied value (one fat centroid) is returned EXACTLY for every
        q inside its span — needed to mirror pandas qcut's duplicate-edge
        collapse (rule_validator.py:357, duplicates='drop')."""
        self._compress()
        if self.means.size == 0:
            return float("nan")
        cum = np.cumsum(self.weights)
        target = np.clip(q, 0.0, 1.0) * cum[-1]
        i = int(np.searchsorted(cum, target, side="left"))
        return float(self.means[min(i, self.means.size - 1)])

    def cdf_leq(self, x: float) -> float:
        """P(X <= x) with FULL tie mass at centroid values (upper-step
        convention) — mirrors qcut's (lo, hi] bin assignment for tied data,
        unlike the interpolated midpoint ``cdf``."""
        self._compress()
        if self.means.size == 0:
            return float("nan")
        total = self.weights.sum()
        return float(self.weights[self.means <= x].sum() / total)

    def cdf(self, x: float) -> float:
        self._compress()
        if self.means.size == 0:
            return float("nan")
        if self.means.size == 1:
            return 0.5 if x == self.means[0] else (0.0 if x < self.means[0] else 1.0)
        cum = np.cumsum(self.weights) - self.weights / 2.0
        total = self.weights.sum()
        return float(np.clip(np.interp(x, self.means, cum / total), 0.0, 1.0))

    def histogram(self, edges: np.ndarray) -> np.ndarray:
        """Approximate bin masses between consecutive edges (for PSI)."""
        cdfs = np.array([self.cdf(e) for e in edges])
        return np.diff(cdfs)


# --------------------------------------------------------------------------
# HyperLogLog (p-register, linear-counting correction) — distinct conv_id
# --------------------------------------------------------------------------


def _hash64(values) -> np.ndarray:
    """Deterministic vectorized 64-bit hash (pandas siphash, fixed key)."""
    arr = np.asarray(values, dtype=object)
    return pd.util.hash_array(arr, categorize=False).astype(np.uint64)


def hash_string_array(arr) -> np.ndarray:
    """Deterministic 64-bit fingerprint per string, computed directly from
    the Arrow buffers — NO per-row Python objects (the object-array path
    allocates a PyStr per row, which dominates memory traffic at scale).

    Fingerprint = mix(byte_length, sum(bytes), sum(bytes * local_position)),
    each exact via two global cumsums + offset gathers (O(total_bytes),
    fully vectorized). Strong enough for content-parity / duplicate checks
    (a collision needs equal length, byte-sum AND position-weighted sum);
    not a cryptographic hash. Nulls hash to a fixed sentinel.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.null_count:
        arr = pc.fill_null(arr, "\x00NULL\x00")
    if pa.types.is_large_string(arr.type):
        off_dtype = np.int64
    else:
        off_dtype = np.int32
    bufs = arr.buffers()
    offs_all = np.frombuffer(bufs[1], dtype=off_dtype)
    offs = offs_all[arr.offset: arr.offset + len(arr) + 1].astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8)
    b = data.astype(np.uint64)
    c_b = np.concatenate([[np.uint64(0)], np.cumsum(b)])
    gpos = np.arange(b.size, dtype=np.uint64)
    c_bp = np.concatenate([[np.uint64(0)], np.cumsum(b * gpos)])
    s, e = offs[:-1], offs[1:]
    S = c_b[e] - c_b[s]
    P = (c_bp[e] - c_bp[s]) - s.astype(np.uint64) * S
    L = (e - s).astype(np.uint64)
    h = (
        (L + np.uint64(0x9E3779B97F4A7C15)) * np.uint64(0xBF58476D1CE4E5B9)
        ^ (S * np.uint64(0x94D049BB133111EB))
        ^ (P * np.uint64(0x2545F4914F6CDD1D))
    )
    h ^= h >> np.uint64(29)
    h *= np.uint64(0xBF58476D1CE4E5B9)
    h ^= h >> np.uint64(32)
    return h


def _bit_length(v: np.ndarray) -> np.ndarray:
    v = v.copy()
    bl = np.zeros(v.shape, dtype=np.int64)
    for shift in (32, 16, 8, 4, 2, 1):
        m = v >= (np.uint64(1) << np.uint64(shift))
        bl[m] += shift
        v[m] >>= np.uint64(shift)
    bl[v > 0] += 1
    return bl


@dataclass
class HLL:
    p: int = 14
    registers: np.ndarray | None = None

    def __post_init__(self):
        # register count must derive from p — a fixed 2^14 default silently
        # broke every HLL(p != 14) (3/4 of registers never written at p=12,
        # so linear counting always fired and estimates were ~20x low)
        if self.registers is None:
            self.registers = np.zeros(1 << self.p, np.uint8)
        elif self.registers.size != (1 << self.p):
            raise ValueError(
                f"HLL: {self.registers.size} registers for p={self.p} "
                f"(expected {1 << self.p})")

    def add_hashes(self, h: np.ndarray) -> "HLL":
        p = np.uint64(self.p)
        idx = (h >> (np.uint64(64) - p)).astype(np.int64)
        w = h & ((np.uint64(1) << (np.uint64(64) - p)) - np.uint64(1))
        rho = ((64 - self.p) - _bit_length(w) + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rho)
        return self

    def add_values(self, values) -> "HLL":
        return self.add_hashes(_hash64(values))

    def merge(self, o: "HLL") -> "HLL":
        np.maximum(self.registers, o.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = float(self.registers.size)
        alpha = 0.7213 / (1 + 1.079 / m)
        e = alpha * m * m / np.sum(2.0 ** -self.registers.astype(np.float64))
        zeros = float(np.count_nonzero(self.registers == 0))
        if e <= 2.5 * m and zeros > 0:
            e = m * np.log(m / zeros)
        return float(e)


# --------------------------------------------------------------------------
# serialization helpers (for shipping partials through Arrow binary columns)
# --------------------------------------------------------------------------


class SpaceSaving:
    """Misra-Gries / Space-Saving heavy-hitters sketch (public algorithm:
    Misra & Gries 1982; Metwally et al. 2005; mergeability per Agarwal et
    al. 2013): at most ``k`` counters, every reported count is within
    ``err_bound`` of truth (est <= true + err_bound is NOT possible — the
    batched Misra-Gries decrement only UNDERcounts, so
    true - err_bound <= est <= true), and any item with true count >
    err_bound is guaranteed present. Batch-vectorized: updates merge an
    exact per-batch value_counts into the counter table and re-truncate by
    subtracting the (k+1)-th largest count from everything — one pandas
    pass, no per-item Python loop. When k >= distinct items no truncation
    ever fires and the sketch is EXACT (err_bound 0), which is the regime
    the hash-oracled query runs in; the bounded-memory regime is pinned by
    the error-bound property test. Zero-shuffle at scale: each block ships
    a <= k-row counter frame to the driver, vocabulary never shuffles."""

    __slots__ = ("k", "counts", "err_bound")

    def __init__(self, k: int):
        self.k = int(k)
        self.counts = pd.Series(dtype=np.int64)
        self.err_bound = np.int64(0)

    def _truncate(self) -> None:
        if len(self.counts) <= self.k:
            return
        srt = np.sort(self.counts.to_numpy())[::-1]
        cut = srt[self.k]  # (k+1)-th largest
        self.counts = self.counts - cut
        self.counts = self.counts[self.counts > 0]
        self.err_bound += cut

    def update_counts(self, items, counts) -> "SpaceSaving":
        add = pd.Series(np.asarray(counts, dtype=np.int64),
                        index=pd.Index(items))
        self.counts = self.counts.add(add, fill_value=0).astype(np.int64)
        self._truncate()
        return self

    def merge(self, other: "SpaceSaving") -> "SpaceSaving":
        self.counts = self.counts.add(other.counts,
                                      fill_value=0).astype(np.int64)
        self.err_bound += other.err_bound
        self._truncate()
        return self

    def top(self, n: int) -> pd.DataFrame:
        """Top-n surviving counters -> DataFrame[(word, n)] ordered by
        (count desc, word asc)."""
        df = pd.DataFrame({"word": self.counts.index.to_numpy(),
                           "n": self.counts.to_numpy(np.int64)})
        df = df.sort_values(["n", "word"], ascending=[False, True],
                            kind="stable")
        return df.head(n).reset_index(drop=True)


class BloomFilter:
    """Mergeable Bloom filter over 64-bit hashes (public double-hashing
    scheme, Kirsch & Mitzenmacher 2006: g_i = h1 + i*h2 mod m). Fully
    vectorized adds/queries; filters over the same (m, n_hashes) geometry
    merge by OR — each block builds its own and the driver (or a tree
    reduce) ORs #blocks fixed-size bitsets, so a reference key set of any
    cardinality costs m bits, never a shuffle. Negatives are definite;
    positives need an exact verify (the semi-join prefilter contract)."""

    __slots__ = ("m", "n_hashes", "bits")

    def __init__(self, m_bits: int = 1 << 20, n_hashes: int = 5):
        self.m = int(m_bits)
        self.n_hashes = int(n_hashes)
        self.bits = np.zeros(self.m // 64 + 1, dtype=np.uint64)

    def _positions(self, h64: np.ndarray) -> np.ndarray:
        h1 = h64
        h2 = (h64 >> np.uint64(33)) | np.uint64(1)  # odd -> full cycle
        i = np.arange(self.n_hashes, dtype=np.uint64)[:, None]
        return ((h1[None, :] + i * h2[None, :]) % np.uint64(self.m))

    def add_hashes(self, h64: np.ndarray) -> "BloomFilter":
        if len(h64) == 0:
            return self
        pos = self._positions(np.asarray(h64, dtype=np.uint64)).ravel()
        np.bitwise_or.at(self.bits, (pos >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (pos & np.uint64(63)))
        return self

    def contains_hashes(self, h64: np.ndarray) -> np.ndarray:
        if len(h64) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(np.asarray(h64, dtype=np.uint64))
        got = (self.bits[(pos >> np.uint64(6)).astype(np.int64)]
               >> (pos & np.uint64(63))) & np.uint64(1)
        return got.all(axis=0)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        assert (self.m, self.n_hashes) == (other.m, other.n_hashes)
        np.bitwise_or(self.bits, other.bits, out=self.bits)
        return self


def dumps(obj) -> bytes:
    if isinstance(obj, TDigest):
        obj._compress()
        obj._buf_m, obj._buf_w = [], []
    td = getattr(obj, "tdigest", None)  # ShardStats and friends: compress
    if isinstance(td, TDigest):        # the digest, not its raw buffers
        td._compress()
        td._buf_m, td._buf_w = [], []
    return pickle.dumps(obj, protocol=pickle.HIGHEST_PROTOCOL)


def loads(b: bytes):
    return pickle.loads(b)
