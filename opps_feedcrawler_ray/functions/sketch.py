"""Mergeable sketches (ray_guide.md "Aggregation at scale": emit one
serialized sketch per batch, merge in a tiny second stage).

HyperLogLog (Flajolet et al. 2007, public) with the standard bias
correction; register hash = the engine's pinned 64-bit fingerprint of
the key's decimal string, so estimates are deterministic and
PYTHONHASHSEED-independent.  At 10^10 keys a p=14 HLL (16 KB) replaces
the exact distinct shuffle entirely.
"""

from __future__ import annotations

import numpy as np

from .hashing import fingerprint64


class HyperLogLog:
    def __init__(self, p: int = 12, registers: np.ndarray | None = None) -> None:
        self.p = p
        self.m = 1 << p
        self.reg = registers if registers is not None else np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, hashes: np.ndarray) -> None:
        """Vectorized register update from uint64 hashes."""
        h = hashes.astype(np.uint64)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rem = (h << np.uint64(self.p)) & np.uint64(0xFFFFFFFFFFFFFFFF)
        # rank = leading zeros of the remaining 64-p bits, +1
        rank = np.full(len(h), 64 - self.p + 1, dtype=np.uint8)
        nz = rem != 0
        if nz.any():
            bits = 63 - np.floor(np.log2(rem[nz].astype(np.float64))).astype(np.int64)
            rank[nz] = (bits + 1).astype(np.uint8)
        np.maximum.at(self.reg, idx, rank)

    def add_values(self, values) -> None:
        self.add_hashes(
            np.array([fingerprint64(str(v)) for v in values], dtype=np.uint64)
        )

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        return HyperLogLog(self.p, np.maximum(self.reg, other.reg))

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / np.sum(2.0 ** -self.reg.astype(np.float64))
        if est <= 2.5 * m:
            zeros = int(np.count_nonzero(self.reg == 0))
            if zeros:
                est = m * np.log(m / zeros)  # small-range correction
        return float(est)

    def to_bytes(self) -> bytes:
        return bytes([self.p]) + self.reg.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "HyperLogLog":
        return cls(b[0], np.frombuffer(b[1:], dtype=np.uint8).copy())


def hll_init_rows(hashes: np.ndarray, p: int) -> np.ndarray:
    """One single-element HLL register row per uint64 hash — the
    HyperBall per-node initializer.  Returns uint8 [n, 2**p]."""
    h = hashes.astype(np.uint64)
    n, m = len(h), 1 << p
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rem = (h << np.uint64(p)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    rank = np.full(n, 64 - p + 1, dtype=np.uint8)
    nz = rem != 0
    if nz.any():
        bits = 63 - np.floor(np.log2(rem[nz].astype(np.float64))).astype(np.int64)
        rank[nz] = (bits + 1).astype(np.uint8)
    regs = np.zeros((n, m), dtype=np.uint8)
    regs[np.arange(n), idx] = rank
    return regs


def hll_estimate_rows(regs: np.ndarray) -> np.ndarray:
    """Vectorized per-row HLL cardinality estimate (same bias/small-range
    corrections as ``HyperLogLog.estimate``) over a uint8 [n, m] register
    matrix.  Returns float64 [n]."""
    m = float(regs.shape[1])
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(2.0 ** -regs.astype(np.float64), axis=1)
    zeros = np.count_nonzero(regs == 0, axis=1)
    small = (est <= 2.5 * m) & (zeros > 0)
    if small.any():
        est[small] = m * np.log(m / zeros[small])
    return est


class QuantileSketch:
    """Mergeable ε-approximate quantile summary (the Manku–Rajagopalan–
    Lindsay collapse scheme, SIGMOD'98, deterministic variant): a sketch
    is ≤ ``k`` sorted (value, weight) points; pruning a weight-W summary
    to k points picks the values at cumulative-weight targets
    (j+0.5)·W/k, adding at most W/(2k) rank error.  The sketch carries
    its own certified bound: ``err_bound`` accumulates the pruning debt,
    so ``rank(v)`` is always within ±err_bound of the true rank — the
    tests assert against the sketch's self-reported certificate, not a
    hand-waved ε.  Deterministic (no RNG) ⇒ byte-stable results for a
    fixed merge order.  Mergeable ⇒ a valid Ray combiner: per-batch
    sketches merge associatively with bounded error growth
    (log-of-batches levels at fan-in 2; one driver fold adds one prune
    per batch in the worst case — still ≤ batches·W_batch/(2k) ≪ N/2k·…
    for the sizes used here)."""

    __slots__ = ("k", "values", "weights", "err_bound")

    def __init__(self, k: int = 256, values=None, weights=None, err_bound: float = 0.0):
        self.k = int(k)
        self.values = (
            np.asarray(values, dtype=np.float64) if values is not None
            else np.empty(0, np.float64)
        )
        self.weights = (
            np.asarray(weights, dtype=np.float64) if weights is not None
            else np.empty(0, np.float64)
        )
        self.err_bound = float(err_bound)

    @property
    def total(self) -> float:
        return float(self.weights.sum())

    @classmethod
    def from_values(cls, arr, k: int = 256) -> "QuantileSketch":
        v = np.sort(np.asarray(arr, dtype=np.float64))
        sk = cls(k, v, np.ones(len(v)))
        sk._maybe_prune()
        return sk

    def _maybe_prune(self) -> None:
        if len(self.values) <= self.k:
            return
        w = self.weights
        total = w.sum()
        cum = np.cumsum(w) - 0.5 * w  # midpoint rank of each point
        targets = (np.arange(self.k) + 0.5) * (total / self.k)
        idx = np.searchsorted(cum, targets, side="left")
        idx = np.minimum(idx, len(self.values) - 1)
        self.values = self.values[idx]
        self.weights = np.full(self.k, total / self.k)
        # rank error added by collapsing a WEIGHTED summary: W/(2k) on the
        # low side, up to w_max/2 extra on the high side (a heavy input
        # point can sit just below a target's first-eligible midrank)
        self.err_bound += total / (2 * self.k) + float(w.max()) / 2.0

    def merge(self, other: "QuantileSketch") -> "QuantileSketch":
        v = np.concatenate([self.values, other.values])
        w = np.concatenate([self.weights, other.weights])
        order = np.argsort(v, kind="stable")
        out = QuantileSketch(
            max(self.k, other.k), v[order], w[order],
            self.err_bound + other.err_bound,
        )
        out._maybe_prune()
        return out

    def rank(self, x: float) -> float:
        """Estimated #elements ≤ x (true rank within ±err_bound)."""
        i = np.searchsorted(self.values, x, side="right")
        return float(self.weights[:i].sum())

    @property
    def q_err_bound(self) -> float:
        """Certified max |true_rank(quantile(q)) − q·N|: the rank
        certificate plus the inversion slack of one point's half-weight
        (quantile() returns a stored value; its midrank can sit up to
        w/2 past the target before the rank error even applies)."""
        w_max = float(self.weights.max()) if len(self.weights) else 0.0
        return self.err_bound + w_max / 2.0

    def quantile(self, q: float) -> float:
        if len(self.values) == 0:
            return float("nan")
        cum = np.cumsum(self.weights) - 0.5 * self.weights
        i = np.searchsorted(cum, q * self.total, side="left")
        return float(self.values[min(i, len(self.values) - 1)])

    def to_bytes(self) -> bytes:
        head = np.array([self.k, len(self.values)], dtype=np.int64).tobytes()
        err = np.array([self.err_bound], dtype=np.float64).tobytes()
        return head + err + self.values.tobytes() + self.weights.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "QuantileSketch":
        k, n = np.frombuffer(b[:16], dtype=np.int64)
        err = float(np.frombuffer(b[16:24], dtype=np.float64)[0])
        v = np.frombuffer(b[24 : 24 + 8 * n], dtype=np.float64)
        w = np.frombuffer(b[24 + 8 * n : 24 + 16 * n], dtype=np.float64)
        return cls(int(k), v.copy(), w.copy(), err)


class CountMinSketch:
    """Count-Min sketch (Cormode & Muthukrishnan 2005): ``d`` rows of
    ``w`` int64 counters; point estimate = min over rows; guarantees
    est >= true and est <= true + e·N/w per row with prob 1/2 (so over
    d independent rows, + eN/w w.p. 1 − 2^−d).  Rows hash via
    independent splitmix64 mixes of the engine's pinned 64-bit token
    fingerprint ⇒ deterministic.  Merge = elementwise sum — an exact
    combiner, so per-batch sketches reduce associatively and only
    d·w·8 bytes ever move per batch."""

    __slots__ = ("d", "w", "tab")

    def __init__(self, d: int = 4, w: int = 2048, tab: np.ndarray | None = None):
        self.d, self.w = int(d), int(w)
        self.tab = tab if tab is not None else np.zeros((d, w), dtype=np.int64)

    @staticmethod
    def _mix(h: np.ndarray, salt: int) -> np.ndarray:
        x = h.astype(np.uint64) + np.uint64((salt * 0x9E3779B97F4A7C15) % 2**64)
        z = x
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))

    def add_hashes(self, hashes: np.ndarray, counts: np.ndarray) -> None:
        """Vectorized bulk add: ``counts[i]`` occurrences of the item
        whose base fingerprint is ``hashes[i]``."""
        c = counts.astype(np.int64)
        for r in range(self.d):
            idx = (self._mix(hashes, r + 1) % np.uint64(self.w)).astype(np.int64)
            np.add.at(self.tab[r], idx, c)

    def query_hashes(self, hashes: np.ndarray) -> np.ndarray:
        ests = np.empty((self.d, len(hashes)), dtype=np.int64)
        for r in range(self.d):
            idx = (self._mix(hashes, r + 1) % np.uint64(self.w)).astype(np.int64)
            ests[r] = self.tab[r][idx]
        return ests.min(axis=0)

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        assert (self.d, self.w) == (other.d, other.w)
        return CountMinSketch(self.d, self.w, self.tab + other.tab)

    def to_bytes(self) -> bytes:
        return np.array([self.d, self.w], dtype=np.int64).tobytes() + self.tab.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "CountMinSketch":
        d, w = np.frombuffer(b[:16], dtype=np.int64)
        return cls(int(d), int(w),
                   np.frombuffer(b[16:], dtype=np.int64).reshape(int(d), int(w)).copy())
