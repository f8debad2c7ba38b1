"""Serializable cuckoo filter for the URL-seen set (SURVEY.md §2.3 A1).

Design (Fan et al., "Cuckoo Filter: Practically Better Than Bloom",
CoNEXT 2014 — public literature):

* table of ``num_buckets`` buckets × 4 slots of 16-bit fingerprints,
  stored as one numpy uint16 array (empty slot = 0);
* item key is the engine's 64-bit URL fingerprint (already uniform —
  functions/hashing.py), so in-filter hashing is cheap bit mixing;
* partial-key cuckoo hashing: ``i2 = i1 XOR h(fp)``;
* bounded eviction (500 kicks); on failure the item goes to an exact
  Python overflow set → the filter NEVER reports a false negative
  (hard invariant, tested);
* ~12.8 bits/key at 95% load → 10^10 keys ≈ 16 GB across the actor
  pool; each frontier actor holds one shard sized by its host
  partition (SURVEY.md §4 memory row), serialized into the Parquet
  checkpoint via :meth:`to_bytes`.

Deletion is supported (standard cuckoo property) but unused by the
crawl (URLs are never unseen).
"""

from __future__ import annotations

import pickle

import numpy as np

_MAX_KICKS = 500
_SLOTS = 4


def _fp16(key: int) -> int:
    """16-bit nonzero fingerprint from a 64-bit key."""
    fp = (key ^ (key >> 17) ^ (key >> 33)) & 0xFFFF
    return fp or 1


def _mix(x: int) -> int:
    # splitmix64-style mix, truncated — public-domain construction
    x = (x * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    x ^= x >> 29
    return x


class CuckooFilter:
    """Approximate membership with NO false negatives (overflow-backed)."""

    def __init__(self, capacity: int = 1 << 16, _table: np.ndarray | None = None) -> None:
        if _table is not None:
            self.num_buckets = len(_table) // _SLOTS
            self.table = _table
        else:
            nb = 1
            while nb * _SLOTS * 0.95 < capacity:
                nb <<= 1
            self.num_buckets = nb
            self.table = np.zeros(nb * _SLOTS, dtype=np.uint16)
        self.overflow: set[int] = set()
        self.count = 0

    # -- bucket helpers ------------------------------------------------
    def _i1(self, key: int) -> int:
        return _mix(key) & (self.num_buckets - 1)

    def _i2(self, i1: int, fp: int) -> int:
        return (i1 ^ _mix(fp)) & (self.num_buckets - 1)

    def _bucket(self, i: int) -> np.ndarray:
        return self.table[i * _SLOTS : (i + 1) * _SLOTS]

    # -- core ops ------------------------------------------------------
    def contains(self, key: int) -> bool:
        fp = _fp16(key)
        i1 = self._i1(key)
        if fp in self._bucket(i1):
            return True
        i2 = self._i2(i1, fp)
        if fp in self._bucket(i2):
            return True
        return key in self.overflow

    def add(self, key: int) -> bool:
        """Insert; returns True if key was (probably) new, False if it was
        already present.  first-seen-wins dedup = ``add`` returning True."""
        if self.contains(key):
            return False
        self._insert(key)
        self.count += 1
        return True

    def _insert(self, key: int) -> None:
        fp = _fp16(key)
        i1 = self._i1(key)
        T = self.table
        for i in (i1, self._i2(i1, fp)):
            base = i * _SLOTS
            for s in range(base, base + _SLOTS):
                if T[s] == 0:
                    T[s] = fp
                    return
        self._insert_evict(key, fp, i1)

    def _insert_evict(self, key: int, fp: int, i1: int) -> None:
        """Slow path: bounded cuckoo eviction (deterministic, no RNG)."""
        rng_state = key
        i = i1
        for kick in range(_MAX_KICKS):
            rng_state = _mix(rng_state + kick)
            b = self._bucket(i)
            slot = rng_state % _SLOTS
            fp, b[slot] = int(b[slot]), fp
            i = self._i2(i, fp)
            b = self._bucket(i)
            empty = np.flatnonzero(b == 0)
            if len(empty):
                b[empty[0]] = fp
                return
        self.overflow.add(key)  # never lose an insert → no false negatives

    def insert_batch(self, keys: np.ndarray) -> None:
        """Insert keys KNOWN to be new: (fp, i1, i2) computed in ONE
        vectorized pass, slots written with scalar int ops (~1µs/key vs
        ~15µs for per-key numpy slicing).  Identical placement to calling
        ``_insert`` per key in order."""
        if len(keys) == 0:
            return
        fp, i1, i2 = self._fp_i1_i2(np.asarray(keys, dtype=np.uint64))
        T = self.table
        fpl = fp.tolist()
        i1l = (i1 * _SLOTS).tolist()
        i2l = (i2 * _SLOTS).tolist()
        for j in range(len(fpl)):
            f = fpl[j]
            placed = False
            for base in (i1l[j], i2l[j]):
                for s in range(base, base + _SLOTS):
                    if T[s] == 0:
                        T[s] = f
                        placed = True
                        break
                if placed:
                    break
            if not placed:
                self._insert_evict(int(keys[j]), f, i1l[j] // _SLOTS)

    # -- vectorized batch ops (the frontier-offer hot path) -------------
    def _fp_i1_i2(self, keys: np.ndarray):
        """Vectorized (fp16, i1, i2) for a uint64 key array — identical
        bit-for-bit to the scalar _fp16/_i1/_i2 (numpy uint64 arithmetic
        wraps mod 2^64 exactly like the masked Python-int version)."""
        k = keys.astype(np.uint64, copy=False)
        fp = (k ^ (k >> np.uint64(17)) ^ (k >> np.uint64(33))) & np.uint64(0xFFFF)
        fp[fp == 0] = 1
        mixed = k * np.uint64(0x9E3779B97F4A7C15)
        mixed ^= mixed >> np.uint64(29)
        nb_mask = np.uint64(self.num_buckets - 1)
        i1 = mixed & nb_mask
        mfp = fp * np.uint64(0x9E3779B97F4A7C15)
        mfp ^= mfp >> np.uint64(29)
        i2 = (i1 ^ mfp) & nb_mask
        return fp.astype(np.uint16), i1.astype(np.int64), i2.astype(np.int64)

    def contains_batch(self, keys: np.ndarray) -> np.ndarray:
        """Vectorized membership: uint64 keys → bool mask (no false
        negatives, same guarantees as scalar ``contains``)."""
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        fp, i1, i2 = self._fp_i1_i2(keys)
        T = self.table.reshape(-1, _SLOTS)
        hit = (T[i1] == fp[:, None]).any(axis=1)
        miss = ~hit
        if miss.any():
            hit[miss] = (T[i2[miss]] == fp[miss, None]).any(axis=1)
        if self.overflow:
            still = ~hit
            if still.any():
                ov = np.fromiter(self.overflow, dtype=np.uint64, count=len(self.overflow))
                hit[still] |= np.isin(keys[still].astype(np.uint64), ov)
        return hit

    def add_batch(self, keys: np.ndarray) -> np.ndarray:
        """Vector entry point: uint64 keys → bool mask of NEW keys.
        Duplicate keys within the batch report new on their FIRST
        occurrence only (exact within-batch dedup via np.unique).
        Membership is ONE vectorized pass against the batch-START table;
        only genuinely-new keys take the per-key insert path.  Vs a
        sequential add loop this can only differ by admitting MORE: a
        same-batch insert's fingerprint can no longer false-positive a
        later new key.  No-false-negative guarantee unchanged."""
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        uniq, first_idx = np.unique(np.asarray(keys, dtype=np.uint64), return_index=True)
        new_u = ~self.contains_batch(uniq)
        out = np.zeros(len(keys), dtype=bool)
        out[first_idx[new_u]] = True
        self.insert_batch(uniq[new_u])
        self.count += int(new_u.sum())
        return out

    # -- checkpoint serialization -------------------------------------
    def to_bytes(self) -> bytes:
        return pickle.dumps(
            {
                "table": self.table.tobytes(),
                "num_buckets": self.num_buckets,
                "overflow": sorted(self.overflow),
                "count": self.count,
            },
            protocol=4,
        )

    @classmethod
    def from_bytes(cls, b: bytes) -> "CuckooFilter":
        return cls._from_dict(pickle.loads(b))

    @classmethod
    def _from_dict(cls, d: dict) -> "CuckooFilter":
        table = np.frombuffer(d["table"], dtype=np.uint16).copy()
        f = cls(_table=table)
        f.num_buckets = d["num_buckets"]
        f.overflow = set(d["overflow"])
        f.count = d["count"]
        return f

    def load_factor(self) -> float:
        return float(np.count_nonzero(self.table)) / self.table.size
