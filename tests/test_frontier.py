

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
