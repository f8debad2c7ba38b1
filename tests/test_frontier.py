

def test_pending_spill_random_interleavings_match_no_spill(tmp_path):
    """Property: under ANY (seeded-random) interleaving of offers and
    polls, a spill-forced frontier emits byte-identical ready tables to
    the in-memory twin — the order-preservation proof for the reload
    condition (head shorter than budget, or budget-th key ≥ boundary)."""
    import numpy as np
    import pyarrow as pa

    from opps_feedcrawler_ray.state.frontier import FrontierActor

    cls = getattr(FrontierActor, "__ray_actor_class__", FrontierActor)

    def mk(spill: bool, seed_dir: str):
        kw = {}
        if spill:
            kw = dict(pending_spill_dir=seed_dir,
                      pending_spill_threshold=7, pending_spill_keep=4)
        return cls(0, 1, politeness_budget=3, store_exact=False, **kw)

    for seed in range(12):
        rng = np.random.default_rng(seed)
        a = mk(False, "")
        b = mk(True, str(tmp_path / f"spill{seed}"))
        next_hash = 1
        for rnd in range(10):
            for _ in range(int(rng.integers(0, 3))):  # 0-2 offer batches
                n = int(rng.integers(1, 40))
                hosts = [f"h{int(x)}.ex" for x in rng.integers(0, 4, n)]
                hashes = list(range(next_hash, next_hash + n))
                next_hash += n
                t = pa.table({
                    "url": pa.array([f"http://{h}/p{x}" for h, x in zip(hosts, hashes)]),
                    "url_hash": pa.array(hashes, pa.uint64()),
                    "host": pa.array(hosts),
                    "priority": pa.array(
                        np.round(rng.uniform(0, 5, n), 3), pa.float64()),
                    "round": pa.array([rnd] * n, pa.int32()),
                })
                a.offer(t)
                b.offer(t)
            ra = a.poll_ready(rnd)
            rb = b.poll_ready(rnd)
            assert ra.equals(rb), f"seed={seed} round={rnd}"
            assert a.pending_count() == b.pending_count(), (seed, rnd)
        # drain fully: every remaining row must come back in order
        for rnd in range(10, 40):
            ra, rb = a.poll_ready(rnd), b.poll_ready(rnd)
            assert ra.equals(rb), f"drain seed={seed} round={rnd}"
            if a.pending_count() == 0 and b.pending_count() == 0:
                break
        assert a.pending_count() == b.pending_count() == 0


def test_pending_spill_segments_survive_reload_until_next_checkpoint(tmp_path):
    """Crash tolerance: a reload consumes a segment in memory but must NOT
    delete its file while the last durable checkpoint still references
    it — a kill after the reload (before the next checkpoint) restores
    from that checkpoint and needs the file.  Files are GC'd only after
    the next checkpoint publishes."""
    import glob
    import os

    import numpy as np
    import pyarrow as pa

    from opps_feedcrawler_ray.state.frontier import FrontierActor

    cls = getattr(FrontierActor, "__ray_actor_class__", FrontierActor)
    sdir = str(tmp_path / "spill")
    ck = str(tmp_path / "ck")

    def offer(actor, start, n, host="h0.ex", rnd=0):
        hashes = list(range(start, start + n))
        actor.offer(pa.table({
            "url": pa.array([f"http://{host}/p{x}" for x in hashes]),
            "url_hash": pa.array(hashes, pa.uint64()),
            "host": pa.array([host] * n),
            "priority": pa.array(np.linspace(5, 1, n), pa.float64()),
            "round": pa.array([rnd] * n, pa.int32()),
        }))

    a = cls(0, 1, politeness_budget=3, store_exact=False,
            pending_spill_dir=sdir, pending_spill_threshold=7,
            pending_spill_keep=4)
    offer(a, 1, 30)
    a.poll_ready(0)                      # spills the tail
    segs = glob.glob(f"{sdir}/pseg-*.parquet")
    assert segs
    a.checkpoint(ck, 0)                  # checkpoint references the segment
    # force a reload: offer a better-priority row than the boundary, or
    # just drain the head below the budget
    for rnd in range(1, 4):
        a.poll_ready(rnd)
    # reload has consumed the segment in memory — file must SURVIVE
    # because the round-0 checkpoint still lists it
    for p in segs:
        assert os.path.exists(p), "segment deleted while still referenced"
    # crash now: a fresh actor restores from the round-0 checkpoint
    b = cls(0, 1, politeness_budget=3, store_exact=False,
            pending_spill_dir=sdir, pending_spill_threshold=7,
            pending_spill_keep=4)
    assert b.restore(ck) == 0
    # the restored frontier drains the same rows the original would have
    drained = []
    for rnd in range(1, 20):
        t = b.poll_ready(rnd)
        drained.extend(t["url_hash"].to_pylist())
        if b.pending_count() == 0:
            break
    assert sorted(drained) == list(range(4, 31))  # rows 1-3 emitted pre-ckpt
    # after the NEXT checkpoint the consumed files are garbage-collected
    a.checkpoint(ck + "2", 3)
    for p in segs:
        assert not os.path.exists(p), "consumed segment not GC'd post-checkpoint"
