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
