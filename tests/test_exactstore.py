"""ExactSeenStore (disk-backed exact seen-set, state/exactstore.py):
membership/export semantics must be EXACTLY those of a plain dict, with
bounded memtable memory, under forced spills at adversarial thresholds.
"""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
from hypothesis import given, settings
from hypothesis import strategies as st

from opps_feedcrawler_ray.state.exactstore import ExactSeenStore


def _mk(tmp, threshold):
    return ExactSeenStore(str(tmp / "spill"), spill_threshold=threshold)


@given(
    keys=st.lists(st.integers(min_value=0, max_value=2**64 - 1), min_size=0, max_size=200),
    threshold=st.sampled_from([1, 2, 3, 7, 50, 1000]),
)
@settings(max_examples=60, deadline=None)
def test_store_equals_dict(tmp_path_factory, keys, threshold):
    tmp = tmp_path_factory.mktemp("exactstore")
    store = _mk(tmp, threshold)
    ref: dict[int, str] = {}
    for step, k in enumerate(keys):
        arr = np.array([k], dtype=np.uint64)
        is_new = store.confirm_new(arr)[0]
        assert is_new == (k not in ref), (step, k)
        if is_new:
            url = f"http://h{k % 7}.test/p{k}"
            store.add(int(k), url)
            ref[int(k)] = url
        store.maybe_spill()
        # memtable never exceeds the threshold after maybe_spill
        assert len(store.mem) < threshold or threshold == 1
    assert len(store) == len(ref)
    # export == dict's sorted items, byte-for-byte
    exp = store.export()
    items = sorted(ref.items())
    assert exp["url_hash"].to_pylist() == [k for k, _ in items]
    assert exp["url"].to_pylist() == [v for _, v in items]


def test_store_blob_roundtrip_and_stale_segments(tmp_path):
    """Checkpoint blob restores membership + export exactly; a segment
    spilled AFTER the blob was taken is invisible to the restored store
    (resume-from-older-checkpoint semantics) and gets atomically
    overwritten by the restored store's next spill."""
    store = ExactSeenStore(str(tmp_path / "s"), spill_threshold=4)
    for k in range(10):
        store.add(k, f"u{k}")
        store.maybe_spill()
    blob = store.state_blob()
    # post-blob spill (the "crashed timeline" segment)
    for k in range(100, 106):
        store.add(k, f"u{k}")
        store.maybe_spill()
    restored = ExactSeenStore.from_blob(blob)
    keys = np.array([0, 5, 9, 100, 105, 999], dtype=np.uint64)
    assert restored.confirm_new(keys).tolist() == [False, False, False, True, True, True]
    assert restored.export()["url_hash"].to_pylist() == list(range(10))
    # next spill from the restored store overwrites the stale file name
    n_seg_before = len(restored.segments)
    for k in range(200, 205):
        restored.add(k, f"u{k}")
        restored.maybe_spill()
    assert len(restored.segments) > n_seg_before
    for p in restored.segments:
        t = pq.read_table(p)
        assert t.num_rows > 0
    # and the merged export now covers both timelines' surviving keys
    assert restored.export()["url_hash"].to_pylist() == list(range(10)) + list(range(200, 205))


def test_store_memory_is_hashes_only(tmp_path):
    """After spills, the resident state holds NO url strings for spilled
    entries — only the sorted uint64 hash arrays."""
    store = ExactSeenStore(str(tmp_path / "s"), spill_threshold=8)
    for k in range(64):
        store.add(k, "x" * 1000)
        store.maybe_spill()
    assert len(store.mem) == 0  # 64 % 8 == 0: everything spilled
    assert sum(len(h) for h in store._seg_hashes) == 64
    for sh in store._seg_hashes:
        assert sh.dtype == np.uint64
        assert (np.diff(sh.astype(np.int64)) > 0).all() or len(sh) < 2
