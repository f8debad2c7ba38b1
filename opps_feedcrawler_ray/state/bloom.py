"""Serializable Bloom filter for the URL-seen set (SURVEY.md §2.3 A1).

The north rule names "bloom/cuckoo URL-seen" — this is the Bloom half,
a drop-in alternative to :class:`state.cuckoo.CuckooFilter` selected via
``CrawlConfig.seen_filter="bloom"``.  Classic Bloom (Bloom 1970; Kirsch
& Mitzenmacher 2006 double hashing — public literature):

* one bit array of ``m`` bits (power of 2), stored as numpy uint64 words;
* ``k`` probe positions per key via double hashing
  ``h_i = h1 + i*h2 (mod m)`` — Kirsch-Mitzenmacher shows this preserves
  the asymptotic false-positive rate of k independent hashes;
* the item key is the engine's already-uniform 64-bit URL fingerprint
  (functions/hashing.py), so h1/h2 are cheap splitmix-style mixes;
* NO false negatives ever (a set bit is never cleared) — the same hard
  invariant the cuckoo filter carries, so first-seen-wins dedup holds;
* sized at ``bits_per_key`` bits/key (default 16 → k=11, FP ≈ 0.05% at
  design load, comparable to the cuckoo's 16-bit-fingerprint ~0.01%);
  10^10 keys ≈ 20 GB across the actor pool, each frontier shard holding
  its host partition's slice (SURVEY.md §4 memory row).

Trade-off vs cuckoo (why both exist): Bloom is simpler and its inserts
are pure vectorized bit-OR (no eviction path, no overflow set), but it
cannot delete and needs ~25% more bits for the same FP rate.  The crawl
never deletes URLs, so both satisfy the engine contract; the filter
kind is frozen in the checkpoint manifest like every routing knob.
"""

from __future__ import annotations

import pickle

import numpy as np

_M1 = np.uint64(0x9E3779B97F4A7C15)  # splitmix64 increment
_M2 = np.uint64(0xBF58476D1CE4E5B9)  # splitmix64 mix constant


def _mix64(x: np.ndarray, mult: np.uint64) -> np.ndarray:
    y = x * mult
    y ^= y >> np.uint64(31)
    y *= _M2
    y ^= y >> np.uint64(29)
    return y


class BloomFilter:
    """Approximate membership with NO false negatives (Bloom invariant)."""

    def __init__(
        self,
        capacity: int = 1 << 16,
        bits_per_key: int = 16,
        _words: np.ndarray | None = None,
        _k: int | None = None,
    ) -> None:
        if _words is not None:
            self.words = _words
            self.num_bits = len(_words) * 64
            self.k = int(_k)
        else:
            nbits = 64
            while nbits < capacity * bits_per_key:
                nbits <<= 1
            self.num_bits = nbits
            self.words = np.zeros(nbits // 64, dtype=np.uint64)
            # optimal k = (m/n) ln2; clamp to [1, 16]
            self.k = max(1, min(16, round(bits_per_key * 0.6931)))
        self.count = 0

    # -- vectorized probe positions -------------------------------------
    def _positions(self, keys: np.ndarray) -> np.ndarray:
        """(n, k) int64 bit positions — double hashing, h2 forced odd so
        every probe sequence covers the (power-of-2) bit space."""
        kk = np.asarray(keys, dtype=np.uint64)
        h1 = _mix64(kk, _M1)
        h2 = _mix64(kk ^ np.uint64(0xDEADBEEFCAFEF00D), _M1) | np.uint64(1)
        i = np.arange(self.k, dtype=np.uint64)
        mask = np.uint64(self.num_bits - 1)
        return ((h1[:, None] + i[None, :] * h2[:, None]) & mask).astype(np.int64)

    # -- core ops (scalar API parity with CuckooFilter) ------------------
    def contains(self, key: int) -> bool:
        return bool(self.contains_batch(np.array([key], dtype=np.uint64))[0])

    def add(self, key: int) -> bool:
        """Insert; True iff the key was (probably) new."""
        return bool(self.add_batch(np.array([key], dtype=np.uint64))[0])

    # -- vectorized batch ops (the frontier-offer hot path) --------------
    def contains_batch(self, keys: np.ndarray) -> np.ndarray:
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(keys)
        word = self.words[pos >> 6]
        bit = np.uint64(1) << (pos.astype(np.uint64) & np.uint64(63))
        return ((word & bit) != 0).all(axis=1)

    def insert_batch(self, keys: np.ndarray) -> None:
        """Set all probe bits for keys KNOWN to be new (caller dedups)."""
        if len(keys) == 0:
            return
        pos = self._positions(np.asarray(keys, dtype=np.uint64)).ravel()
        bit = np.uint64(1) << (pos.astype(np.uint64) & np.uint64(63))
        # np.bitwise_or.at handles repeated word indices within the batch
        np.bitwise_or.at(self.words, pos >> 6, bit)

    def add_batch(self, keys: np.ndarray) -> np.ndarray:
        """uint64 keys → bool mask of NEW keys.  Duplicate keys within the
        batch report new on their FIRST occurrence only (np.unique), same
        contract as CuckooFilter.add_batch: membership is one vectorized
        pass against the batch-START bit array, then new keys' bits are
        set.  No-false-negative guarantee unchanged."""
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        uniq, first_idx = np.unique(np.asarray(keys, dtype=np.uint64), return_index=True)
        new_u = ~self.contains_batch(uniq)
        out = np.zeros(len(keys), dtype=bool)
        out[first_idx[new_u]] = True
        self.insert_batch(uniq[new_u])
        self.count += int(new_u.sum())
        return out

    # -- checkpoint serialization ----------------------------------------
    def to_bytes(self) -> bytes:
        return pickle.dumps(
            {
                "kind": "bloom",
                "words": self.words.tobytes(),
                "k": self.k,
                "count": self.count,
            },
            protocol=4,
        )

    @classmethod
    def from_bytes(cls, b: bytes) -> "BloomFilter":
        return cls._from_dict(pickle.loads(b))

    @classmethod
    def _from_dict(cls, d: dict) -> "BloomFilter":
        words = np.frombuffer(d["words"], dtype=np.uint64).copy()
        f = cls(_words=words, _k=d["k"])
        f.count = d["count"]
        return f

    _POPCNT = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(
        axis=1
    ).astype(np.uint8)

    def load_factor(self) -> float:
        """Fraction of set bits (design target ≈ 1 - e^{-kn/m} ≈ 0.5).
        Byte-popcount lookup — no 8× unpackbits allocation on a
        multi-GB frontier-scale bit array."""
        set_bits = int(self._POPCNT[self.words.view(np.uint8)].sum(dtype=np.int64))
        return set_bits / float(self.num_bits)


def seen_filter_from_bytes(b: bytes):
    """Checkpoint-restore dispatcher: Bloom blobs are tagged with
    ``kind="bloom"``; untagged blobs are cuckoo (backward compatible with
    every pre-bloom checkpoint).  The blob is unpickled ONCE — it holds
    the multi-GB filter array at frontier scale, so a load-to-inspect +
    load-again dispatch would double restore CPU and peak memory."""
    from .cuckoo import CuckooFilter

    d = pickle.loads(b)
    if isinstance(d, dict) and d.get("kind") == "bloom":
        return BloomFilter._from_dict(d)
    return CuckooFilter._from_dict(d)


def make_seen_filter(kind: str, capacity: int):
    from .cuckoo import CuckooFilter

    if kind == "bloom":
        return BloomFilter(capacity=capacity)
    if kind == "cuckoo":
        return CuckooFilter(capacity=capacity)
    raise ValueError(f"unknown seen_filter kind: {kind!r} (expected bloom|cuckoo)")
