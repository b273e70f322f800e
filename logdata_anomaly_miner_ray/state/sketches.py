"""Mergeable sketches: HyperLogLog, t-digest, Welford moments.

AMiner tracks distincts with exact Python sets
(reference: aminer/analysis/NewMatchPathValueDetector.py:28-194) and
never computes quantiles (VariableTypeDetector keeps raw value lists
capped at 1500, reference: aminer/analysis/EventTypeDetector.py:31-32).
Neither survives 10^12 rows, so the engine computes these bounded,
mergeable summaries per Arrow block and tree-reduces them; an exact
mode (plain sets / full sorts) remains available for small-scale
oracle tests.

Pure numpy — no external sketch library, no scipy.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# hashing helpers (vectorized, deterministic across processes)
# ---------------------------------------------------------------------------

_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer — turns arbitrary uint64 into
    well-mixed uint64. Used to post-mix cheap polynomial string hashes."""
    x = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        x += np.uint64(0x9E3779B97F4A7C15)
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        x = x ^ (x >> np.uint64(31))
    return x & _MASK64


def hash_strings(values, seed: int = 0) -> np.ndarray:
    """Deterministic 64-bit hashes of a sequence of str/bytes.

    FNV-1a over utf-8 bytes, post-mixed with splitmix64. Python-level
    loop is only used for the byte feed; cost is acceptable because
    hashing is O(len) anyway and this runs inside distributed
    map_batches tasks, not on the driver.
    """
    out = np.empty(len(values), dtype=np.uint64)
    fnv_offset = 0xCBF29CE484222325 ^ (seed * 0x9E3779B97F4A7C15 & 0xFFFFFFFFFFFFFFFF)
    fnv_prime = 0x100000001B3
    mask = 0xFFFFFFFFFFFFFFFF
    for i, v in enumerate(values):
        if v is None:
            out[i] = 0
            continue
        if isinstance(v, str):
            v = v.encode("utf-8", "surrogatepass")
        elif not isinstance(v, (bytes, bytearray)):
            v = str(v).encode("utf-8")
        h = fnv_offset
        for b in v:
            h = ((h ^ b) * fnv_prime) & mask
        out[i] = h
    return splitmix64(out)


def hash_int64(values: np.ndarray, seed: int = 0) -> np.ndarray:
    """Vectorized hash of an int64/uint64 array."""
    x = values.astype(np.uint64, copy=True)
    if seed:
        with np.errstate(over="ignore"):
            x ^= splitmix64(np.full(1, np.uint64(seed)))[0]
    return splitmix64(x)


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------


class HyperLogLog:
    """Dense HyperLogLog over 64-bit hashes; mergeable via register max.

    Replaces AMiner's exact known_values sets
    (reference: aminer/analysis/NewMatchPathValueDetector.py:68-120)
    for high-cardinality distinct tracking. p=12 → 4096 one-byte
    registers, ~1.6% relative error, 4 KiB per (column) state.
    """

    __slots__ = ("p", "m", "registers")

    def __init__(self, p: int = 12, registers: np.ndarray | None = None):
        self.p = p
        self.m = 1 << p
        self.registers = (
            registers if registers is not None else np.zeros(self.m, dtype=np.uint8)
        )

    def add_hashes(self, h: np.ndarray) -> "HyperLogLog":
        if len(h) == 0:
            return self
        h = h.astype(np.uint64, copy=False)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        # rank = leading position of first set bit in the low (64-p) bits
        low = (h << np.uint64(self.p)) & _MASK64
        # number of leading zeros of `low` + 1; low==0 → max rank
        nlz = np.full(len(h), 64 - self.p, dtype=np.uint8)
        nz = low != 0
        if nz.any():
            # float64 log2 is exact enough for leading-zero extraction <2^53?
            # Not for full 64-bit — use bit trick on uint64 instead.
            lowbits = low[nz]
            lz = np.zeros(lowbits.shape, dtype=np.uint8)
            shift = np.uint64(32)
            cur = lowbits.copy()
            for s in (32, 16, 8, 4, 2, 1):
                s_ = np.uint64(s)
                mask_hi = cur >> np.uint64(64 - s)
                zero_hi = mask_hi == 0
                lz[zero_hi] += np.uint8(s)
                cur[zero_hi] = (cur[zero_hi] << s_) & _MASK64
            del shift
            nlz_nz = np.minimum(lz, 64 - self.p)
            nlz[nz] = nlz_nz
        rank = (nlz + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)
        return self

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        inv = np.exp2(-self.registers.astype(np.float64))
        est = alpha * m * m / inv.sum()
        zeros = int((self.registers == 0).sum())
        if est <= 2.5 * m and zeros:
            est = m * np.log(m / zeros)  # linear counting, small range
        return float(est)

    # serialization for shipping through Arrow binary columns
    def to_bytes(self) -> bytes:
        return bytes([self.p]) + self.registers.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "HyperLogLog":
        p = b[0]
        return cls(p, np.frombuffer(b[1:], dtype=np.uint8).copy())


# ---------------------------------------------------------------------------
# Welford moments (count / mean / M2) — exact, mergeable
# ---------------------------------------------------------------------------


class Moments:
    """Mergeable (n, mean, M2, min, max, n_null) for one numeric column.

    The two-bin mean/variance compare of
    MatchValueAverageChangeDetector (reference:
    aminer/analysis/MatchValueAverageChangeDetector.py:25-245) and the
    mean±std frequency band of EventFrequencyDetector (reference:
    aminer/analysis/EventFrequencyDetector.py:361-400) both reduce to
    these moments; Chan's parallel update keeps the merge exact.
    """

    __slots__ = ("n", "mean", "m2", "min", "max", "n_null")

    def __init__(self, n=0, mean=0.0, m2=0.0, mn=np.inf, mx=-np.inf, n_null=0):
        self.n = int(n)
        self.mean = float(mean)
        self.m2 = float(m2)
        self.min = float(mn)
        self.max = float(mx)
        self.n_null = int(n_null)

    @classmethod
    def from_array(cls, a: np.ndarray, n_null: int = 0) -> "Moments":
        a = a[~np.isnan(a)] if a.dtype.kind == "f" else a
        if len(a) == 0:
            return cls(n_null=n_null)
        a = a.astype(np.float64, copy=False)
        mean = float(a.mean())
        return cls(
            len(a),
            mean,
            float(((a - mean) ** 2).sum()),
            float(a.min()),
            float(a.max()),
            n_null,
        )

    def merge(self, o: "Moments") -> "Moments":
        if o.n:
            if not self.n:
                self.n, self.mean, self.m2 = o.n, o.mean, o.m2
            else:
                n = self.n + o.n
                d = o.mean - self.mean
                self.mean += d * o.n / n
                self.m2 += o.m2 + d * d * self.n * o.n / n
                self.n = n
            self.min = min(self.min, o.min)
            self.max = max(self.max, o.max)
        self.n_null += o.n_null
        return self

    @property
    def std(self) -> float:  # population std, like numpy default
        return float(np.sqrt(self.m2 / self.n)) if self.n else float("nan")

    @property
    def var(self) -> float:
        return self.m2 / self.n if self.n else float("nan")


# ---------------------------------------------------------------------------
# t-digest (merging digest, scale function k1) — approximate quantiles
# ---------------------------------------------------------------------------


class TDigest:
    """Compact mergeable quantile digest (Dunning's merging t-digest).

    Centroids kept as parallel (mean, weight) arrays; merge = concat,
    sort, recompress under the k1 scale function. delta=200 →
    ≤ ~400 centroids, sub-1% quantile error at the tails. Feeds the
    KS-style drift check that recasts VariableTypeDetector's
    goodness-of-fit tests (reference:
    aminer/analysis/VariableTypeDetector.py:969-1165).
    """

    __slots__ = ("delta", "means", "weights")

    def __init__(self, delta: int = 200, means=None, weights=None):
        self.delta = delta
        self.means = np.array([] if means is None else means, dtype=np.float64)
        self.weights = np.array([] if weights is None else weights, dtype=np.float64)

    @classmethod
    def from_array(cls, a: np.ndarray, delta: int = 200) -> "TDigest":
        a = a.astype(np.float64, copy=False)
        a = a[~np.isnan(a)]
        d = cls(delta)
        if len(a):
            vals, counts = np.unique(a, return_counts=True)
            d.means, d.weights = vals, counts.astype(np.float64)
            d._compress()
        return d

    def merge(self, o: "TDigest") -> "TDigest":
        if len(o.means):
            self.means = np.concatenate([self.means, o.means])
            self.weights = np.concatenate([self.weights, o.weights])
            order = np.argsort(self.means, kind="mergesort")
            self.means, self.weights = self.means[order], self.weights[order]
            self._compress()
        return self

    def _k(self, q: np.ndarray) -> np.ndarray:
        return (self.delta / (2 * np.pi)) * np.arcsin(2 * np.clip(q, 0, 1) - 1)

    def _compress(self) -> None:
        if len(self.means) <= 1:
            return
        total = self.weights.sum()
        # greedy left-to-right merge under the k1 size bound. The
        # scale-function values needed are k(cumsum[i]/total) for
        # every prefix — ONE vectorized arcsin instead of a per-
        # element array-allocating call (was ~0.35 s per 40k-value
        # block, now ~1 ms; boundaries identical up to float
        # associativity, which only shifts a centroid edge).
        cumsum = np.cumsum(self.weights)
        K = self._k(cumsum / total).tolist()
        out_means: list[float] = []
        out_weights: list[float] = []
        means = self.means.tolist()
        weights = self.weights.tolist()
        cur_m, cur_w = means[0], weights[0]
        k_lo = float(self._k(np.array([0.0]))[0])
        for i in range(1, len(means)):
            if K[i] - k_lo <= 1.0:
                w = weights[i]
                cur_m = (cur_m * cur_w + means[i] * w) / (cur_w + w)
                cur_w += w
            else:
                out_means.append(cur_m)
                out_weights.append(cur_w)
                k_lo = K[i - 1]
                cur_m, cur_w = means[i], weights[i]
        out_means.append(cur_m)
        out_weights.append(cur_w)
        self.means = np.array(out_means)
        self.weights = np.array(out_weights)

    def quantile(self, q) -> np.ndarray:
        qs = np.atleast_1d(np.asarray(q, dtype=np.float64))
        if not len(self.means):
            return np.full(qs.shape, np.nan)
        cum = np.cumsum(self.weights) - self.weights / 2.0
        total = self.weights.sum()
        return np.interp(qs * total, cum, self.means)

    def cdf(self, x) -> np.ndarray:
        xs = np.atleast_1d(np.asarray(x, dtype=np.float64))
        if not len(self.means):
            return np.full(xs.shape, np.nan)
        cum = np.cumsum(self.weights) - self.weights / 2.0
        total = self.weights.sum()
        return np.clip(np.interp(xs, self.means, cum / total), 0.0, 1.0)


class MisraGries:
    """Mergeable heavy-hitters counter sketch (Misra-Gries).

    Holds at most ``capacity`` (value, count) entries. Guarantees
    after any sequence of ``add``/``merge`` folding a stream of N
    items: every value with true frequency > N/(capacity+1) is
    retained, and each retained count undercounts its true frequency
    by at most N/(capacity+1). Both properties survive merging
    (Agarwal et al., "Mergeable Summaries", PODS 2012).

    Reference parity note: AMiner keeps exact per-path value counts
    in EventTypeDetector (analysis/EventTypeDetector.py:configured
    count dicts); this is the bounded-memory recast used when the
    value domain is unbounded at 100 TB scale. The exact answer is
    recovered by a second broadcast recount pass (see
    stages/heavy_hitters.py).
    """

    def __init__(self, capacity: int):
        if capacity < 1:
            raise ValueError("capacity must be >= 1")
        self.capacity = int(capacity)
        self.counts: dict = {}

    def add(self, values, counts) -> "MisraGries":
        """Fold pre-aggregated (values, counts) pairs (e.g. the
        output of np.unique(..., return_counts=True))."""
        c = self.counts
        for v, n in zip(values, counts):
            c[v] = c.get(v, 0) + int(n)
        self._shrink()
        return self

    def merge(self, other: "MisraGries") -> "MisraGries":
        self.add(list(other.counts.keys()), list(other.counts.values()))
        return self

    def _shrink(self) -> None:
        m = len(self.counts)
        if m <= self.capacity:
            return
        vals = np.fromiter(self.counts.values(), dtype=np.int64, count=m)
        # subtract the (capacity+1)-th largest count from everything,
        # drop non-positive — the batched form of the one-at-a-time
        # MG decrement (same invariant, one pass)
        cut = int(np.partition(vals, m - self.capacity - 1)[m - self.capacity - 1])
        self.counts = {v: c - cut for v, c in self.counts.items() if c > cut}

    def items(self):
        return self.counts.items()
