"""Tests for the bucketed out-of-driver label exchange (graphcore) —
VERDICT r4 task #1.

Three layers:
  * equality twins: the bucketed exchange must produce IDENTICAL output
    to the prior broadcast path on the corpus fixtures (BFS, SSSP, SCC);
  * driver-heap proof: BFS over a synthetic 400k-node graph completes
    with per-bucket Parquet output — every table the driver ``ray.get``s
    during iteration is structurally asserted scalar-only
    (``graphcore._driver_get``), per-bucket state stays ~|V|/B, and the
    full label table is never driver-resident;
  * core unit behavior: partition_by_key bucket layout + stale-dir wipe.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def test_bfs_bucketed_equals_broadcast(ray_session, tmp_path):
    from opps_feedcrawler_ray.pipelines.webpipe import doc_bfs_depth

    b = doc_bfs_depth(SF, work_dir=str(tmp_path / "wb"), exchange="bucketed")
    r = doc_bfs_depth(SF, work_dir=str(tmp_path / "wr"), exchange="broadcast")
    pd.testing.assert_frame_equal(b, r)


def test_sssp_bucketed_equals_broadcast(ray_session, tmp_path):
    from opps_feedcrawler_ray.pipelines.webpipe import doc_sssp

    b = doc_sssp(SF, work_dir=str(tmp_path / "wb"), exchange="bucketed")
    r = doc_sssp(SF, work_dir=str(tmp_path / "wr"), exchange="broadcast")
    pd.testing.assert_frame_equal(b, r)


def test_scc_bucketed_equals_broadcast(ray_session, tmp_path):
    from opps_feedcrawler_ray.pipelines.webpipe import doc_scc

    b = doc_scc(SF, work_dir=str(tmp_path / "wb"), exchange="bucketed")
    r = doc_scc(SF, work_dir=str(tmp_path / "wr"), exchange="broadcast")
    pd.testing.assert_frame_equal(b, r)


def test_bfs_bucketed_nondefault_bucket_count(ray_session, tmp_path):
    """Output must be invariant to the bucket count (pure layout knob)."""
    from opps_feedcrawler_ray.pipelines.webpipe import doc_bfs_depth

    b3 = doc_bfs_depth(SF, work_dir=str(tmp_path / "w3"), n_buckets=3)
    b1 = doc_bfs_depth(SF, work_dir=str(tmp_path / "w1"), n_buckets=1)
    b8 = doc_bfs_depth(SF, work_dir=str(tmp_path / "w8"), n_buckets=8)
    pd.testing.assert_frame_equal(b3, b8)
    pd.testing.assert_frame_equal(b1, b8)


def test_scc_bucketed_nondefault_bucket_count(ray_session, tmp_path):
    from opps_feedcrawler_ray.pipelines.webpipe import doc_scc

    b3 = doc_scc(SF, work_dir=str(tmp_path / "w3"), n_buckets=3)
    b8 = doc_scc(SF, work_dir=str(tmp_path / "w8"), n_buckets=8)
    pd.testing.assert_frame_equal(b3, b8)


def _tree_edges_ds(n_nodes: int, fanout: int = 10):
    """Synthetic shallow tree: node i (i>=1) has parent (i-1)//fanout —
    depth grows logarithmically, so BFS converges in ~log_f(N) rounds.
    Built via ray.data.range so the edge table is generated inside
    tasks, not on the test driver."""
    import ray.data as rd

    def to_edges(batch: pa.Table) -> pa.Table:
        child = batch["id"].to_numpy(zero_copy_only=False).astype(np.int64) + 1
        parent = (child - 1) // fanout
        return pa.table({"a": pa.array(parent, pa.int64()),
                         "b": pa.array(child, pa.int64())})

    return rd.range(n_nodes - 1).map_batches(to_edges, batch_format="pyarrow")


def test_bfs_bucketed_driver_heap_proof(ray_session, tmp_path):
    """The out-of-driver claim, end to end on a graph whose label table
    (400k rows) dwarfs any per-bucket slice: the run must complete with
    per-bucket Parquet output (driver receives row COUNTS only — the
    node-sized result never lands on the driver), per-bucket size must
    stay ≈|V|/B, and every driver-side ``ray.get`` inside the fixpoint
    loop is structurally asserted to be scalars (graphcore._driver_get
    raises on any table-sized payload)."""
    from opps_feedcrawler_ray.pipelines.webpipe import _relax_bucketed

    n_nodes, fanout, n_buckets = 400_000, 10, 16
    edges = _tree_edges_ds(n_nodes, fanout)
    summary = _relax_bucketed(
        edges, source=0, max_iters=20,
        gc_dir=str(tmp_path / "gc"), n_buckets=n_buckets,
        out_parquet=str(tmp_path / "out"),
    )
    # the driver-side return is B rows of counts, not 400k labels
    assert len(summary) == n_buckets
    assert int(summary["rows"].sum()) == n_nodes
    assert int(summary["rows"].max()) <= int(1.5 * n_nodes / n_buckets)

    # verify depths against the closed form, reading the per-bucket
    # Parquet the way a downstream stage would
    parts = [
        pd.read_parquet(str(tmp_path / "out" / f"b{b}.parquet"))
        for b in range(n_buckets)
    ]
    got = pd.concat(parts, ignore_index=True).sort_values("node")
    assert len(got) == n_nodes
    nodes = got["node"].to_numpy()
    assert nodes.min() == 0 and nodes.max() == n_nodes - 1
    # expected depth: #applications of child->(child-1)//fanout to reach 0
    expect = np.zeros(n_nodes, dtype=np.int64)
    cur = np.arange(n_nodes, dtype=np.int64)
    for _ in range(30):
        live = cur > 0
        if not live.any():
            break
        expect[live] += 1
        cur = np.where(live, (cur - 1) // fanout, cur)
    np.testing.assert_array_equal(got["lab"].to_numpy(), expect[nodes])


def test_driver_get_rejects_table_payloads(ray_session):
    from opps_feedcrawler_ray.pipelines import graphcore as gc

    import ray

    ok = [ray.put(3), ray.put((1, 2))]
    assert gc._driver_get(ok) == [3, (1, 2)]
    bad = [ray.put(pd.DataFrame({"x": [1]}))]
    with pytest.raises(AssertionError):
        gc._driver_get(bad)


def test_partition_by_key_layout_and_stale_wipe(ray_session, tmp_path):
    import ray
    import ray.data as rd

    from opps_feedcrawler_ray.pipelines import graphcore as gc

    out = str(tmp_path / "part")
    ds = rd.from_arrow(
        pa.table({"a": pa.array(list(range(100)), pa.int64()),
                  "b": pa.array([1] * 100, pa.int64())})
    )
    refs = gc.partition_by_key(ds, "a", 4, out, ["a", "b"])
    parts = ray.get(refs)
    assert sum(len(p) for p in parts) == 100
    for b, p in enumerate(parts):
        if len(p):
            assert (p["a"].to_numpy() % 4 == b).all()

    # stale-bucket wipe: repartition with fewer rows must not resurrect
    # old bucket files
    ds2 = rd.from_arrow(
        pa.table({"a": pa.array([0, 1], pa.int64()),
                  "b": pa.array([9, 9], pa.int64())})
    )
    refs2 = gc.partition_by_key(ds2, "a", 4, out, ["a", "b"])
    parts2 = ray.get(refs2)
    assert sum(len(p) for p in parts2) == 2
    assert len(parts2[2]) == 0 and len(parts2[3]) == 0
    assert not os.path.exists(os.path.join(out, "b9.parquet"))


def test_host_spectral_lanczos_matches_dense(ray_session):
    """VERDICT r4 task #3: the distributed-multiply Lanczos path must
    reproduce the dense-eigh twin — eigenvalues to 1e9 rounding, and
    eigenvectors up to the e6 floor (the host graph's spectrum here is
    simple, so the pairs are unique up to the pinned sign rule)."""
    from opps_feedcrawler_ray.pipelines.webpipe import host_spectral_embedding

    lan = host_spectral_embedding(SF, k=2, solver="lanczos")
    den = host_spectral_embedding(SF, k=2, solver="dense")
    assert list(lan["host"]) == list(den["host"])
    for i in (1, 2):
        assert abs(int(lan[f"lam{i}_e9"].iloc[0]) - int(den[f"lam{i}_e9"].iloc[0])) <= 1
        a = lan[f"x{i}_e6"].to_numpy(dtype=np.float64)
        d = den[f"x{i}_e6"].to_numpy(dtype=np.float64)
        # same vector up to rounding (sign pinned by the largest-entry rule)
        assert np.abs(a - d).max() <= 2


def test_host_spectral_k_clamped_small_graph(ray_session):
    """ADVICE r4: k >= n_hosts must degrade gracefully, not IndexError."""
    from opps_feedcrawler_ray.pipelines.webpipe import host_spectral_embedding

    for solver in ("lanczos", "dense"):
        out = host_spectral_embedding(SF, k=999, solver=solver)
        n = len(out)
        # exactly n-1 non-trivial eigenpairs are emitted
        lam_cols = [c for c in out.columns if c.startswith("lam")]
        assert len(lam_cols) == n - 1


def test_katz_bucketed_equals_broadcast(ray_session, tmp_path):
    """Exact integer equality between the out-of-driver exchange and
    the broadcast twin (associativity of integer addition — same sums,
    same // 100, any partitioning)."""
    from opps_feedcrawler_ray.pipelines.webpipe import doc_katz_centrality

    b = doc_katz_centrality(SF, work_dir=str(tmp_path / "wb"), exchange="bucketed")
    r = doc_katz_centrality(SF, work_dir=str(tmp_path / "wr"), exchange="broadcast")
    pd.testing.assert_frame_equal(b, r)


def test_hyperball_bucketed_equals_broadcast(ray_session, tmp_path):
    """Per-node estimates are bit-identical (same registers, same round
    order), so harmonic centrality matches exactly; the neighborhood
    totals differ only by cross-bucket float summation order."""
    from opps_feedcrawler_ray.pipelines.webpipe import (
        doc_harmonic_centrality, doc_neighborhood_function,
    )

    n1 = doc_neighborhood_function(SF, work_dir=str(tmp_path / "wb"),
                                   exchange="bucketed")
    n2 = doc_neighborhood_function(SF, work_dir=str(tmp_path / "wr"),
                                   exchange="broadcast")
    assert (n1["t"] == n2["t"]).all()
    assert np.allclose(n1["est_pairs"], n2["est_pairs"], rtol=1e-9)

    h1 = doc_harmonic_centrality(SF, work_dir=str(tmp_path / "wb2"),
                                 exchange="bucketed")
    h2 = doc_harmonic_centrality(SF, work_dir=str(tmp_path / "wr2"),
                                 exchange="broadcast")
    pd.testing.assert_frame_equal(h1, h2)


def test_luby_mis_bucketed_equals_broadcast(ray_session, tmp_path):
    from opps_feedcrawler_ray.pipelines.webpipe import doc_luby_mis

    b = doc_luby_mis(SF, work_dir=str(tmp_path / "wb"), exchange="bucketed")
    r = doc_luby_mis(SF, work_dir=str(tmp_path / "wr"), exchange="broadcast")
    pd.testing.assert_frame_equal(b, r)


def test_matching_bucketed_equals_broadcast(ray_session, tmp_path):
    from opps_feedcrawler_ray.pipelines.webpipe import doc_maximal_matching

    b = doc_maximal_matching(SF, work_dir=str(tmp_path / "wb"),
                             exchange="bucketed")
    r = doc_maximal_matching(SF, work_dir=str(tmp_path / "wr"),
                             exchange="broadcast")
    pd.testing.assert_frame_equal(b, r)


def test_scc_bucketed_driver_heap_proof(ray_session, tmp_path):
    """SCC's out-of-driver claim on a 200k-node graph of 50k disjoint
    4-cycles (each cycle one SCC): the run completes with per-bucket
    Parquet output — the driver receives row COUNTS only, per-bucket
    state stays ≈|V|/B, assignments equal the closed form (scc_id =
    cycle base), and every driver ``ray.get`` in the phase loop is
    scalar-only (graphcore._driver_get)."""
    import ray.data as rd

    from opps_feedcrawler_ray.pipelines.webpipe import _scc_bucketed

    n_nodes, cyc, n_buckets = 200_000, 4, 16

    def to_edges(batch: pa.Table) -> pa.Table:
        i = batch["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        base = (i // cyc) * cyc
        nxt = base + (i - base + 1) % cyc
        return pa.table({"a": pa.array(i, pa.int64()),
                         "b": pa.array(nxt, pa.int64())})

    edges = rd.range(n_nodes).map_batches(to_edges, batch_format="pyarrow")
    summary = _scc_bucketed(edges, str(tmp_path / "gc"), n_buckets,
                            out_parquet=str(tmp_path / "out"))
    assert len(summary) == n_buckets
    assert int(summary["rows"].sum()) == n_nodes
    assert int(summary["rows"].max()) <= int(1.5 * n_nodes / n_buckets)

    parts = [
        pd.read_parquet(str(tmp_path / "out" / f"b{b}.parquet"))
        for b in range(n_buckets)
    ]
    got = pd.concat(parts, ignore_index=True).sort_values("node")
    assert len(got) == n_nodes
    nodes = got["node"].to_numpy()
    np.testing.assert_array_equal(got["scc"].to_numpy(), (nodes // cyc) * cyc)


def _rand_edges_ds(n_nodes: int, n_edges: int, seed: int):
    import ray.data as rd

    rng = np.random.RandomState(seed)
    a = rng.randint(0, n_nodes, n_edges).astype(np.int64)
    b = rng.randint(0, n_nodes, n_edges).astype(np.int64)
    keep = a != b
    df = pd.DataFrame({"a": a[keep], "b": b[keep]}).drop_duplicates()
    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)), df


def _tarjan_scc(edges_df: pd.DataFrame) -> dict:
    """Iterative Tarjan; scc id = min member id (the repo convention)."""
    import collections

    adj = collections.defaultdict(list)
    nodes = set()
    for x, y in zip(edges_df["a"], edges_df["b"]):
        adj[int(x)].append(int(y))
        nodes.add(int(x))
        nodes.add(int(y))
    index = {}
    low = {}
    onstack = set()
    stack = []
    out = {}
    counter = [0]
    for s in sorted(nodes):
        if s in index:
            continue
        work = [(s, iter(adj[s]))]
        index[s] = low[s] = counter[0]
        counter[0] += 1
        stack.append(s)
        onstack.add(s)
        while work:
            v, it = work[-1]
            advanced = False
            for w in it:
                if w not in index:
                    index[w] = low[w] = counter[0]
                    counter[0] += 1
                    stack.append(w)
                    onstack.add(w)
                    work.append((w, iter(adj[w])))
                    advanced = True
                    break
                elif w in onstack:
                    low[v] = min(low[v], index[w])
            if advanced:
                continue
            work.pop()
            if work:
                pv = work[-1][0]
                low[pv] = min(low[pv], low[v])
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stack.pop()
                    onstack.discard(w)
                    comp.append(w)
                    if w == v:
                        break
                cid = min(comp)
                for w in comp:
                    out[w] = cid
    return out


def test_scc_bucketed_random_directed_graphs(ray_session, tmp_path):
    """Phase-structure coverage the corpus graph can't provide: random
    directed multigraphs (several densities/seeds) must match an
    independent Tarjan replay exactly."""
    from opps_feedcrawler_ray.pipelines.webpipe import _scc_bucketed

    for seed, n, m in [(1, 60, 100), (2, 120, 150), (3, 200, 600)]:
        ds, df = _rand_edges_ds(n, m, seed)
        got = _scc_bucketed(ds, str(tmp_path / f"gc{seed}"), n_buckets=4)
        exp = _tarjan_scc(df)
        assert len(got) == len(exp)
        for did, cid in zip(got["doc_id"], got["scc_id"]):
            assert exp[int(did)] == int(cid), (seed, did, cid, exp[int(did)])


def test_relax_bucketed_random_graphs_vs_dijkstra(ray_session, tmp_path):
    """Bucketed weighted relaxation on random directed graphs equals a
    heap Dijkstra replay with the same id-arithmetic weights."""
    import heapq

    from opps_feedcrawler_ray.pipelines.webpipe import _relax_bucketed

    def w(aa, bb):
        return 1 + (7 * aa + 13 * bb) % 5

    for seed, n, m in [(4, 80, 200), (5, 150, 400)]:
        ds, df = _rand_edges_ds(n, m, seed)
        src = int(min(df["a"].min(), df["b"].min()))
        got = _relax_bucketed(ds, src, 200, str(tmp_path / f"g{seed}"),
                              n_buckets=4, weight_fn=w, out_col="dist")
        adj = {}
        for x, y in zip(df["a"], df["b"]):
            adj.setdefault(int(x), []).append((int(y), int(w(x, y))))
        dist = {src: 0}
        pq = [(0, src)]
        while pq:
            d, v = heapq.heappop(pq)
            if d > dist.get(v, 1 << 60):
                continue
            for u, wt in adj.get(v, []):
                nd = d + wt
                if nd < dist.get(u, 1 << 60):
                    dist[u] = nd
                    heapq.heappush(pq, (nd, u))
        exp = pd.DataFrame(sorted(dist.items()), columns=["doc_id", "dist"]
                           ).astype("int64")
        pd.testing.assert_frame_equal(got, exp)


def test_ktruss_distributed_peel_equals_worklist(ray_session, tmp_path):
    """The iterative distributed recount (bounded driver memory) must
    land on the same unique peeling fixpoint as the O(|T|) driver
    worklist, for several k."""
    from opps_feedcrawler_ray.pipelines.webpipe import doc_ktruss

    for k in (3, 4):
        d = doc_ktruss(SF, k=k, work_dir=str(tmp_path / f"wd{k}"),
                       peel="distributed")
        w = doc_ktruss(SF, k=k, work_dir=str(tmp_path / f"ww{k}"),
                       peel="worklist")
        pd.testing.assert_frame_equal(d, w)


def test_lanczos_converges_past_initial_basis():
    """The residual-checked basis expansion: on a 100-node graph the
    initial m=24 Krylov basis is NOT the full space, so the solver must
    expand until the bottom eigenpairs match a dense eigh to tight
    tolerance (the round-5 review found the fixed-m version returned
    unconverged Ritz pairs here)."""
    from opps_feedcrawler_ray.pipelines.webpipe import _lanczos_smallest

    rng = np.random.RandomState(9)
    n = 100
    A = np.zeros((n, n))
    for _ in range(400):
        i, j = rng.randint(0, n, 2)
        if i != j:
            w = rng.randint(1, 5)
            A[i, j] += w
            A[j, i] += w
    deg = np.where(A.sum(axis=1) == 0, 1.0, A.sum(axis=1))
    dmh = 1.0 / np.sqrt(deg)
    L = np.eye(n) - dmh[:, None] * A * dmh[None, :]

    vals, vecs = _lanczos_smallest(lambda x: L @ x, n, n_want=3)
    dense_vals = np.linalg.eigvalsh(L)
    for i in range(3):
        assert abs(vals[i] - dense_vals[i]) < 1e-7, (i, vals[i], dense_vals[i])
        v = vecs[:, i] / np.linalg.norm(vecs[:, i])
        assert np.linalg.norm(L @ v - vals[i] * v) < 1e-6


def test_luby_bucketed_random_graphs_vs_sequential_replica(ray_session, tmp_path):
    """Bucketed Luby MIS on random undirected graphs must equal an
    independent sequential replay of the same rounds (same splitmix64
    priorities, same strict (priority, id) rule, same knockouts)."""
    from opps_feedcrawler_ray.pipelines.webpipe import _luby_bucketed, _splitmix64

    for seed, n, m in [(11, 80, 160), (12, 200, 700)]:
        ds, df = _rand_edges_ds(n, m, seed)
        # undirected canonical: a<b
        a = np.minimum(df["a"].to_numpy(), df["b"].to_numpy())
        b = np.maximum(df["a"].to_numpy(), df["b"].to_numpy())
        keep = a != b
        und = pd.DataFrame({"a": a[keep], "b": b[keep]}).drop_duplicates()
        import pyarrow as pa
        import ray.data as rd
        und_ds = rd.from_arrow(pa.Table.from_pandas(und, preserve_index=False))
        got = _luby_bucketed(und_ds, n, str(tmp_path / f"g{seed}"), n_buckets=4)

        # sequential replica
        adj = {}
        for x, y in zip(und["a"], und["b"]):
            adj.setdefault(int(x), set()).add(int(y))
            adj.setdefault(int(y), set()).add(int(x))
        active = set(range(n))
        in_mis = set()
        rnd = 0
        while active:
            salt = np.uint64((0xD1B54A32D192ED03 * (rnd + 1)) & 0xFFFFFFFFFFFFFFFF)
            prio = _splitmix64(np.arange(n, dtype=np.uint64) ^ salt)
            joins = set()
            for v in active:
                nbrs = [u for u in adj.get(v, ()) if u in active]
                lose = any(
                    (prio[u] < prio[v]) or (prio[u] == prio[v] and u < v)
                    for u in nbrs
                )
                if not lose:
                    joins.add(v)
            in_mis |= joins
            knocked = {u for v in joins for u in adj.get(v, ()) if u in active}
            active -= joins | knocked
            rnd += 1
        exp = np.zeros(n, dtype=np.int64)
        exp[sorted(in_mis)] = 1
        assert len(got) == n
        np.testing.assert_array_equal(got["in_mis"].to_numpy(), exp)


def test_matching_bucketed_random_graphs_properties(ray_session, tmp_path):
    """Bucketed maximal matching on random graphs must equal the
    sequential greedy over global fingerprint order (the documented
    locally-minimal-edge equivalence), be vertex-disjoint and maximal."""
    from opps_feedcrawler_ray.functions.hashing import fingerprint64
    from opps_feedcrawler_ray.pipelines.webpipe import _matching_bucketed

    for seed, n, m in [(21, 60, 150), (22, 150, 500)]:
        ds, df = _rand_edges_ds(n, m, seed)
        a = np.minimum(df["a"].to_numpy(), df["b"].to_numpy())
        b = np.maximum(df["a"].to_numpy(), df["b"].to_numpy())
        keep = a != b
        und = pd.DataFrame({"a": a[keep], "b": b[keep]}).drop_duplicates()
        import pyarrow as pa
        import ray.data as rd
        und_ds = rd.from_arrow(pa.Table.from_pandas(und, preserve_index=False))
        got = _matching_bucketed(und_ds, str(tmp_path / f"m{seed}"), n_buckets=4)

        # sequential greedy in global fingerprint order
        edges = sorted(
            ((int(x), int(y)) for x, y in zip(und["a"], und["b"])),
            key=lambda e: fingerprint64(f"{e[0]}:{e[1]}"),
        )
        used = set()
        exp = set()
        for x, y in edges:
            if x not in used and y not in used:
                exp.add((x, y))
                used.add(x)
                used.add(y)
        got_set = set(zip(got["src_doc"].astype(int), got["dst_doc"].astype(int)))
        assert got_set == exp
        # vertex-disjoint
        flat = list(got["src_doc"]) + list(got["dst_doc"])
        assert len(flat) == len(set(flat))


def test_katz_bucketed_random_graphs_vs_numpy(ray_session, tmp_path):
    """Bucketed Katz on random undirected graphs must exactly equal the
    dense integer replica x' = A·(1e6 + x) // 100 per node."""
    from opps_feedcrawler_ray.pipelines.webpipe import _katz_bucketed

    for seed, n, m in [(31, 50, 120), (32, 120, 400)]:
        ds, df = _rand_edges_ds(n, m, seed)
        a = np.minimum(df["a"].to_numpy(), df["b"].to_numpy())
        b = np.maximum(df["a"].to_numpy(), df["b"].to_numpy())
        keep = a != b
        und = pd.DataFrame({"a": a[keep], "b": b[keep]}).drop_duplicates()
        import pyarrow as pa
        import ray.data as rd
        und_ds = rd.from_arrow(pa.Table.from_pandas(und, preserve_index=False))
        iters = 6
        got = _katz_bucketed(und_ds, iters, str(tmp_path / f"k{seed}"),
                             n_buckets=4)

        A = np.zeros((n, n), dtype=np.int64)
        for x, y in zip(und["a"], und["b"]):
            A[int(x), int(y)] = 1
            A[int(y), int(x)] = 1
        x = np.zeros(n, dtype=np.int64)
        for _ in range(iters):
            x = (A @ (1_000_000 + x)) // 100
        nodes = np.unique(np.concatenate([und["a"], und["b"]]))
        exp = pd.DataFrame({"doc_id": nodes, "katz": x[nodes]}).astype("int64")
        exp = exp.sort_values(["katz", "doc_id"], ascending=[False, True]
                              ).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, exp)
