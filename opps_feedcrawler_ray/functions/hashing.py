"""Pinned 64-bit URL fingerprints (SURVEY.md §2.2 M3).

The north-star spec asks for "FarmHash-style" 64-bit fingerprints as the
dedup identity of a canonical URL; what is binding (SURVEY.md §7 hard
part 5) is that the fingerprint is 64-bit, stable across processes and
machines (PYTHONHASHSEED-independent), and pinned by committed goldens.

We use BLAKE2b with an 8-byte digest (stdlib ``hashlib``, C-speed,
keyed-off, no randomization) interpreted little-endian as uint64.  This
is frozen: changing it invalidates every golden, checkpoint and seen-set
in existence, so DO NOT change it.

Reference parity note: the reference checkout is empty (SURVEY.md §0);
the upstream app deduped by raw entry link string equality — a 64-bit
fingerprint of the canonical URL is the scale-ready restatement of that
identity.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterable

import numpy as np
import pyarrow as pa

_H = hashlib.blake2b


def fingerprint64(s: str | bytes) -> int:
    """64-bit stable fingerprint of a string. Frozen spec — see module doc."""
    if isinstance(s, str):
        s = s.encode("utf-8", "surrogatepass")
    return int.from_bytes(_H(s, digest_size=8).digest(), "little")


def fingerprint64_batch(values: Iterable[str | bytes]) -> np.ndarray:
    """Vectorized-ish batch fingerprinting → uint64 ndarray.

    The per-item cost is one C-implemented blake2b call (~0.5 µs); a
    65 536-row batch hashes in ~40 ms, far below the cost of the
    surrounding Arrow I/O, so a tight Python loop here is acceptable and
    profiled (SURVEY.md §7 hard part 5).
    """
    h = _H
    fb = int.from_bytes
    if not hasattr(values, "__len__"):
        values = list(values)
    out = np.empty(len(values), dtype=np.uint64)
    for i, s in enumerate(values):
        if isinstance(s, str):
            s = s.encode("utf-8", "surrogatepass")
        out[i] = fb(h(s, digest_size=8).digest(), "little")
    return out


def fingerprint64_array(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Arrow string array → Arrow uint64 fingerprint array."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return pa.array(fingerprint64_batch(arr.to_pylist()), type=pa.uint64())
