"""IVF index quality: trained centroids (deterministic spherical
k-means, round 3) must give balanced cells and high probe recall vs the
exact brute-force baseline — the properties random hyperplane
pseudo-centroids could not guarantee on clustered embeddings."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import ray.data as rd

SF = "/root/testdata/sf0.1"


def _recall_and_balance(tmp_path, n_cells=16, n_probe=4, k=10, n_queries=25):
    from opps_feedcrawler_ray.pipelines.ann import brute_force_topk, ivf_build, ivf_search

    emb = pq.read_table(f"{SF}/embeddings.parquet")
    order = {v: i for i, v in enumerate(emb["vec_id"].to_pylist())}
    queries = np.array(
        [emb["embedding"][order[q]].as_py() for q in range(n_queries)], dtype=np.float64
    )
    ds = rd.read_parquet(f"{SF}/embeddings.parquet")
    cells_dir = ivf_build(ds, str(tmp_path / "ivf"), n_cells=n_cells)
    exact = brute_force_topk(ds, queries, k=k)
    approx = ivf_search(cells_dir, queries, k=k, n_cells=n_cells, n_probe=n_probe)
    recalls = []
    for qi in range(n_queries):
        e = set(exact.loc[exact["query_idx"] == qi, "vec_id"])
        a = set(approx.loc[approx["query_idx"] == qi, "vec_id"])
        recalls.append(len(e & a) / k)
    sizes = np.array(
        [len(g) for _, g in rd.read_parquet(cells_dir).to_pandas().groupby("cell")]
    )
    return float(np.mean(recalls)), sizes


def test_ivf_trained_recall_and_balance(ray_session, tmp_path):
    recall, sizes = _recall_and_balance(tmp_path)
    n = sizes.sum()
    print(
        f"\nIVF trained k-means: recall@10={recall:.3f} at n_probe=4/16, "
        f"cells={len(sizes)}, sizes min/med/max = "
        f"{sizes.min()}/{int(np.median(sizes))}/{sizes.max()} of {n}"
    )
    assert recall >= 0.9, f"probe recall {recall} below 0.9"
    # balance: no trained cell may swallow most of the corpus (the
    # hyperplane failure mode); median cell within 4x of fair share
    assert sizes.max() < 0.5 * n
    assert len(sizes) >= 8  # most cells live


def test_ivf_centroids_deterministic(ray_session, tmp_path):
    """Same corpus → bit-identical centroids (hash-ordered sample +
    seeded k-means, no ambient RNG), so a rebuilt index probes the
    same cells."""
    from opps_feedcrawler_ray.pipelines.ann import _train_centroids

    ds = rd.read_parquet(f"{SF}/embeddings.parquet")
    c1 = _train_centroids(ds, 16, "embedding", "vec_id")
    c2 = _train_centroids(ds, 16, "embedding", "vec_id")
    assert np.array_equal(c1, c2)


def test_embedding_pca_matches_numpy(ray_session):
    """Two-pass distributed PCA == driver-side numpy PCA (same sign
    convention), and the projection is centered."""
    import numpy as np
    import pandas as pd

    from opps_feedcrawler_ray.pipelines.ann import embedding_pca

    sf = "/root/testdata/sf0.01"
    got = embedding_pca(sf, n_components=3)
    ref = pd.read_parquet(f"{sf}/embeddings.parquet").sort_values("vec_id")
    x = np.asarray(ref["embedding"].to_list(), dtype=np.float64)
    xc = x - x.mean(axis=0)
    vals, vecs = np.linalg.eigh(xc.T @ xc / len(x))
    w = vecs[:, ::-1][:, :3]
    for j in range(3):
        i = int(np.argmax(np.abs(w[:, j])))
        if w[i, j] < 0:
            w[:, j] = -w[:, j]
    want = xc @ w
    assert got["vec_id"].tolist() == ref["vec_id"].tolist()
    np.testing.assert_allclose(
        got[["pc1", "pc2", "pc3"]].to_numpy(), want, atol=1e-9
    )
    # projections are centered and variance-ordered
    np.testing.assert_allclose(got[["pc1", "pc2", "pc3"]].mean(), 0, atol=1e-9)
    v = got[["pc1", "pc2", "pc3"]].var().to_numpy()
    assert v[0] >= v[1] >= v[2]


def test_hard_negatives_matches_numpy(ray_session):
    from opps_feedcrawler_ray.pipelines.ann import _unit, hard_negatives

    got = hard_negatives(SF, n_queries=10, k=4)
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    V = _unit(np.asarray(emb["embedding"].tolist(), dtype=np.float64))
    ids = emb["vec_id"].to_numpy()
    labels = emb["label"].to_numpy()
    rows = []
    for qid in sorted(ids[ids < 10]):
        qi = int(np.where(ids == qid)[0][0])
        sims = V[qi] @ V.T
        mask = labels == labels[qi]
        sims[mask] = -np.inf
        order = np.lexsort((ids, -sims))[:4]
        for r, j in enumerate(order, 1):
            rows.append((qid, int(ids[j]),
                         int(np.floor(sims[j] * 1e6 + 0.5)), r))
    exp = pd.DataFrame(rows, columns=["query_id", "neg_id", "cosine_e6", "rank"])
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # every mined negative must truly carry a different label
    lab = dict(zip(ids.tolist(), labels.tolist()))
    assert all(lab[q] != lab[n] for q, n in zip(got["query_id"], got["neg_id"]))


def test_kcenter_coreset_matches_greedy_twin(ray_session):
    from opps_feedcrawler_ray.pipelines.ann import _unit, kcenter_coreset

    k = 8
    got = kcenter_coreset(SF, k=k)
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    V = _unit(np.asarray(emb["embedding"].tolist(), dtype=np.float64))
    ids = emb["vec_id"].to_numpy().astype("int64")
    start = int(ids.min())
    sel = [start]
    dists = [0.0]
    for _ in range(1, k):
        S = V[np.isin(ids, sel)]
        d = 1.0 - (V @ S.T).max(axis=1)
        d[np.isin(ids, sel)] = -np.inf
        j = np.lexsort((ids, -d))[0]
        sel.append(int(ids[j]))
        dists.append(float(d[j]))
    assert got["vec_id"].tolist() == sel
    assert got["dist_e6"].tolist() == [int(np.floor(x * 1e6 + 0.5)) for x in dists]
    # diversity invariant: selection distances are non-increasing
    d6 = got["dist_e6"].to_numpy()[1:]
    assert (np.diff(d6) <= 0).all()
    # determinism
    again = kcenter_coreset(SF, k=k)
    pd.testing.assert_frame_equal(got, again)


def test_pq_encode_and_adc_topk(ray_session):
    """Product quantization: codebook shape, code range, reconstruction
    error way under variance, ADC top-k recall vs exact L2, self-hit,
    and determinism — on the near-random sf0.1 embeddings (PQ's
    worst-case input; real text embeddings compress far better)."""
    import ray.data as rd

    from opps_feedcrawler_ray.pipelines.ann import pq_encode, pq_topk, pq_train

    m, ksub = 32, 64
    ds = rd.read_parquet(f"{SF}/embeddings.parquet")
    emb = pd.read_parquet(f"{SF}/embeddings.parquet").sort_values(
        "vec_id").reset_index(drop=True)
    V = np.asarray(emb["embedding"].tolist(), dtype=np.float64)
    ids = emb["vec_id"].to_numpy().astype("int64")

    books = pq_train(ds, m=m, ksub=ksub)
    assert books.shape == (m, ksub, V.shape[1] // m)
    codes = pq_encode(ds, books)
    assert codes["vec_id"].tolist() == ids.tolist()
    C = np.asarray(codes["code"].tolist(), dtype=np.int64)
    assert C.shape == (len(V), m) and C.min() >= 0 and C.max() < ksub
    # reconstruction from codewords: far below the per-dim variance
    recon = np.concatenate([books[j][C[:, j]] for j in range(m)], axis=1)
    mse = float(((V - recon) ** 2).mean())
    var = float(V.var(axis=0).mean())
    assert mse < 0.1 * var

    q = V[:3]
    got = pq_topk(ds, q, k=10, m=m, ksub=ksub)
    assert (got.groupby("query_idx").size() == 10).all()
    for qi in range(3):
        d = ((V - q[qi]) ** 2).sum(1)
        exact = set(ids[np.lexsort((ids, d))[:10]].tolist())
        approx = set(got.loc[got["query_idx"] == qi, "vec_id"].tolist())
        assert int(ids[qi]) in approx          # a stored vector finds itself
        assert len(exact & approx) >= 5        # recall@10 >= 0.5 (measured 7-8)
    pd.testing.assert_frame_equal(got, pq_topk(ds, q, k=10, m=m, ksub=ksub))


def test_ivfpq_topk_recall_and_determinism(ray_session):
    """IVFPQ composition: probed-cell coverage, ADC recall vs exact L2
    over unit vectors restricted to probed cells (the IVF term) and vs
    global exact (end-to-end), self-hit, and determinism."""
    import ray.data as rd

    from opps_feedcrawler_ray.pipelines.ann import _pinned_centroids, _unit, ivfpq_topk

    ds = rd.read_parquet(f"{SF}/embeddings.parquet")
    emb = pd.read_parquet(f"{SF}/embeddings.parquet").sort_values(
        "vec_id").reset_index(drop=True)
    V = _unit(np.asarray(emb["embedding"].tolist(), dtype=np.float64))
    ids = emb["vec_id"].to_numpy().astype("int64")
    q = V[:3]
    n_cells, n_probe = 16, 6
    got = ivfpq_topk(ds, q, k=10, n_cells=n_cells, n_probe=n_probe, m=32, ksub=64)
    assert (got.groupby("query_idx").size() == 10).all()

    cents = _pinned_centroids(V.shape[1], n_cells)
    cell = np.argmax(V @ cents.T, axis=1)
    for qi in range(3):
        probed = set(np.argsort(-(q[qi] @ cents.T))[:n_probe].tolist())
        in_probe = np.isin(cell, list(probed))
        # oracle restricted to probed cells (isolates PQ error from IVF)
        d = ((V[in_probe] - q[qi]) ** 2).sum(1)
        pids = ids[in_probe]
        exact_probed = set(pids[np.lexsort((pids, d))[:10]].tolist())
        approx = set(got.loc[got["query_idx"] == qi, "vec_id"].tolist())
        assert int(ids[qi]) in approx                      # self-hit
        assert len(exact_probed & approx) >= 5             # PQ recall >= 0.5
        # results only come from probed cells
        assert all(cell[np.searchsorted(ids, a)] in probed for a in approx)
    pd.testing.assert_frame_equal(
        got, ivfpq_topk(ds, q, k=10, n_cells=n_cells, n_probe=n_probe, m=32, ksub=64)
    )


def test_hybrid_search_rrf_matches_replay(ray_session):
    """RRF fusion equals an in-process replay: the dense leg re-ranked
    brute-force in numpy from the parquet, the fusion recomputed from
    integer ranks — and the distributed result is run-to-run stable."""
    from opps_feedcrawler_ray.pipelines.analytics import bm25_search
    from opps_feedcrawler_ray.pipelines.ann import _unit, hybrid_search_rrf

    sf = "/root/testdata/sf0.001"
    got = hybrid_search_rrf(sf, k=10, k_lex=50, k_dense=50)

    lex = bm25_search(sf, k=50).reset_index(drop=True)
    lex_rank = {int(d): i + 1 for i, d in enumerate(lex["doc_id"])}
    emb = pq.read_table(f"{sf}/embeddings.parquet").to_pandas()
    emb = emb.sort_values("vec_id").reset_index(drop=True)
    V = _unit(np.array(emb["embedding"].to_list(), dtype=np.float64))
    ids = emb["vec_id"].to_numpy(dtype="int64")
    seeds = sorted(int(d) for d in lex["doc_id"].head(3))
    qv = V[np.searchsorted(ids, seeds)].mean(axis=0)
    qv = qv / np.linalg.norm(qv)
    sims = V @ qv
    order = np.lexsort((ids, -sims))[:50]
    dense_rank = {int(ids[i]): r + 1 for r, i in enumerate(order)}

    rows = []
    for d in sorted(set(lex_rank) | set(dense_rank)):
        rl, rd_ = lex_rank.get(d, 0), dense_rank.get(d, 0)
        s = (1_000_000_000 // (60 + rl) if rl else 0) + (
            1_000_000_000 // (60 + rd_) if rd_ else 0)
        rows.append((d, s, rl, rd_))
    exp = (
        pd.DataFrame(rows, columns=["doc_id", "rrf_e9", "lex_rank", "dense_rank"])
        .sort_values(["rrf_e9", "doc_id"], ascending=[False, True])
        .head(10)
        .reset_index(drop=True)
        .astype({"doc_id": "int64", "rrf_e9": "int64",
                 "lex_rank": "int64", "dense_rank": "int64"})
    )
    pd.testing.assert_frame_equal(got, exp)
    pd.testing.assert_frame_equal(got, hybrid_search_rrf(sf, k=10))


def test_embedding_kmeans_matches_replay_and_lloyd(ray_session):
    """Distributed Lloyd's k-means equals an exact single-process replay
    (e6-integer partials make it layout-independent) and inertia does
    not increase with more iterations."""
    from opps_feedcrawler_ray.pipelines.ann import _mix64, embedding_kmeans

    sf = "/root/testdata/sf0.001"
    k, n_iters = 8, 5
    got = embedding_kmeans(sf, k=k, n_iters=n_iters)

    emb = pd.read_parquet(f"{sf}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    X = np.array(emb["embedding"].to_list(), dtype="float64")
    ids = emb["vec_id"].to_numpy().astype(np.int64)
    order = np.argsort(_mix64(ids), kind="stable")[:k]
    C = np.floor(X[order] * 1e6 + 0.5) / 1e6
    dim = X.shape[1]
    for _ in range(n_iters):
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        a = np.argmin(d2, axis=1)
        xq = np.floor(X * 1e6 + 0.5).astype("int64")
        for c in range(k):
            m = a == c
            if m.any():
                s = xq[m].sum(axis=0)
                C[c] = np.floor(s / 1e6 / m.sum() * 1e6 + 0.5) / 1e6
    d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    a = np.argmin(d2, axis=1)
    r = X - C[a]
    e = np.floor((r * r).sum(axis=1) * 1e6 + 0.5).astype("int64")
    exp = (
        pd.DataFrame({"cell": a.astype("int64"), "sse_e6": e})
        .groupby("cell", as_index=False)
        .agg(n=("sse_e6", "size"), sse_e6=("sse_e6", "sum"))
        [["cell", "n", "sse_e6"]]
        .sort_values("cell").reset_index(drop=True)
        .astype({"cell": "int64", "n": "int64", "sse_e6": "int64"})
    )
    pd.testing.assert_frame_equal(got, exp)
    one = embedding_kmeans(sf, k=k, n_iters=1)
    assert got["sse_e6"].sum() <= one["sse_e6"].sum()
    assert got["n"].sum() == len(X)


def _brute_dbscan(ids, V, threshold, min_pts):
    """Textbook DBSCAN with the engine's deterministic disambiguation:
    clusters = components of the core-core neighbor graph labeled by
    min core id; border points attach to the min-labeled core
    neighbor."""
    import numpy as np

    n = len(ids)
    norms = np.linalg.norm(V, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    U = V / norms
    sims = U @ U.T
    nbr = sims >= threshold
    np.fill_diagonal(nbr, True)
    core = nbr.sum(axis=1) >= min_pts
    label = {int(ids[i]): -1 for i in range(n)}
    role = {int(ids[i]): 2 for i in range(n)}
    seen = set()
    for i in np.argsort(ids):
        if not core[i] or i in seen:
            continue
        comp = {i}
        stack = [i]
        while stack:
            v = stack.pop()
            for w in np.nonzero(nbr[v] & core)[0]:
                if w not in comp:
                    comp.add(int(w)); stack.append(int(w))
        seen |= comp
        cid = int(min(ids[j] for j in comp))
        for j in comp:
            label[int(ids[j])] = cid
            role[int(ids[j])] = 0
    for i in range(n):
        if core[i]:
            continue
        cand = [label[int(ids[j])] for j in np.nonzero(nbr[i] & core)[0] if j != i]
        if cand:
            label[int(ids[i])] = min(cand)
            role[int(ids[i])] = 1
    return label, role


def test_embedding_dbscan_matches_brute_twin(ray_session):
    from opps_feedcrawler_ray.pipelines.ann import embedding_dbscan

    got = embedding_dbscan(SF, threshold=0.5, min_pts=4)
    emb = pd.read_parquet(f"{SF}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    ids = emb["vec_id"].to_numpy(dtype="int64")
    V = np.array(emb["embedding"].to_list(), dtype="float64")
    label, role = _brute_dbscan(ids, V, 0.5, 4)
    assert len(got) == len(ids)
    for _, r in got.iterrows():
        assert int(r["cluster"]) == label[int(r["vec_id"])]
        assert int(r["role"]) == role[int(r["vec_id"])]


def test_dbscan_recovers_planted_blobs(ray_session):
    import ray.data as rd

    from opps_feedcrawler_ray.pipelines.ann import dbscan_embeddings

    rng = np.random.RandomState(7)
    dim = 16
    centers = np.eye(dim)[:3] * 10.0
    rows = []
    vid = 0
    for c in range(3):
        for _ in range(20):
            rows.append((vid, (centers[c] + rng.normal(0, 0.3, dim)).tolist()))
            vid += 1
    # isolated noise points: near-orthogonal directions far from blobs
    for j in range(5):
        v = np.zeros(dim); v[8 + j] = 10.0
        rows.append((vid, v.tolist())); vid += 1
    df = pd.DataFrame(rows, columns=["vec_id", "embedding"])
    ds = rd.from_pandas(df)
    got = (dbscan_embeddings(ds, threshold=0.9, min_pts=4)
           .to_pandas().sort_values("vec_id").reset_index(drop=True))
    # each blob is exactly one cluster labeled by its min member id
    for c in range(3):
        blob = got.iloc[c * 20:(c + 1) * 20]
        assert set(blob["cluster"]) == {c * 20}
        assert set(blob["role"]) <= {0, 1}
    noise = got.iloc[60:]
    assert (noise["cluster"] == -1).all()
    assert (noise["role"] == 2).all()


def test_ann_ranking_eval_matches_pandas_replay(ray_session):
    from opps_feedcrawler_ray.pipelines.ann import ann_ranking_eval

    n_q, k = 10, 8
    got = ann_ranking_eval(SF, n_queries=n_q, k=k).set_index("query_id")
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    V = np.array(emb["embedding"].to_list(), dtype="float64")
    norms = np.linalg.norm(V, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    U = V / norms
    ids = emb["vec_id"].to_numpy(dtype="int64")
    labs = emb["label"].to_numpy(dtype="int64")
    disc = 1.0 / np.log2(np.arange(2, k + 2, dtype=np.float64))
    assert len(got) == n_q
    for qpos in np.nonzero(ids < n_q)[0]:
        qid, qlab = int(ids[qpos]), int(labs[qpos])
        sims = U[qpos] @ U.T
        order = np.lexsort((ids, -sims))
        order = order[ids[order] != qid][:k]
        rel = (labs[order] == qlab).astype("float64")
        n_rel = int((labs == qlab).sum()) - 1
        dcg = float((rel * disc[: len(rel)]).sum())
        idcg = float(disc[: min(k, max(n_rel, 0))].sum())
        ndcg = dcg / idcg if idcg > 0 else 0.0
        assert int(got.loc[qid, "n_rel"]) == n_rel
        assert int(got.loc[qid, "prec_e6"]) == int(
            np.floor(rel.sum() / k * 1e6 + 0.5))
        assert abs(got.loc[qid, "ndcg_e6"] / 1e6 - ndcg) < 2e-6


def test_bisecting_kmeans_matches_replay_twin(ray_session):
    from opps_feedcrawler_ray.pipelines.ann import (
        _mix64, embedding_bisecting_kmeans,
    )

    SFD = "/root/testdata/sf0.001"
    k, n_iters = 5, 3
    got = embedding_bisecting_kmeans(SFD, k=k, n_iters=n_iters)
    emb = pd.read_parquet(f"{SFD}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    X = np.array(emb["embedding"].to_list(), dtype="float64")
    ids = emb["vec_id"].to_numpy(dtype="int64")

    def walk(tree):
        lab = np.ones(len(X), dtype="int64")
        while True:
            act = np.array([(2 * l) in tree for l in lab])
            if not act.any():
                return lab
            for l in np.unique(lab[act]):
                m = lab == l
                da = ((X[m] - tree[2 * l]) ** 2).sum(axis=1)
                db = ((X[m] - tree[2 * l + 1]) ** 2).sum(axis=1)
                lab[m] = np.where(da <= db, 2 * l, 2 * l + 1)

    def stats(tree):
        lab = walk(tree)
        rows = []
        for l in np.unique(lab):
            m = lab == l
            c = tree.get(int(l))
            if c is None:
                c = np.floor(X[m].mean(axis=0) * 1e6 + 0.5) / 1e6
            r = X[m] - c
            rows.append((int(l), int(m.sum()),
                         int(np.floor((r * r).sum(axis=1) * 1e6 + 0.5)
                             .astype("int64").sum())))
        return pd.DataFrame(rows, columns=["leaf", "n", "sse_e6"])

    tree, leaves = {}, [1]
    while len(leaves) < k:
        st = stats(tree).set_index("leaf")
        target = int(st.sort_values(["sse_e6", "leaf"],
                                    ascending=[False, True]).index[0])
        lab = walk(tree)
        m = lab == target
        mix = _mix64(ids[m])
        order = np.argsort(mix, kind="stable")[:2]
        C2 = np.floor(X[m][order] * 1e6 + 0.5) / 1e6
        for _ in range(n_iters):
            Xm = X[walk(tree) == target]
            d2 = ((Xm[:, None, :] - C2[None, :, :]) ** 2).sum(axis=2)
            a = np.argmin(d2, axis=1)
            xq = np.floor(Xm * 1e6 + 0.5).astype("int64")
            for cell in np.unique(a):
                mm = a == cell
                C2[cell] = np.floor(
                    xq[mm].sum(axis=0).astype("float64") / 1e6 / mm.sum()
                    * 1e6 + 0.5
                ) / 1e6
        tree[2 * target] = C2[0]
        tree[2 * target + 1] = C2[1]
        leaves = [l for l in leaves if l != target] + [2 * target, 2 * target + 1]
    exp = (stats(tree).sort_values("leaf").reset_index(drop=True)
           .astype({"leaf": "int64", "n": "int64", "sse_e6": "int64"}))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert len(got) == k
    assert int(got["n"].sum()) == len(X)


def test_embedding_silhouette_matches_replay_and_kmeans(ray_session):
    from opps_feedcrawler_ray.pipelines.ann import (
        _mix64, embedding_kmeans, embedding_silhouette,
    )

    SFD = "/root/testdata/sf0.001"
    k, it = 6, 4
    got = embedding_silhouette(SFD, k=k, n_iters=it).set_index("cell")
    km = embedding_kmeans(SFD, k=k, n_iters=it).set_index("cell")
    # the silhouette run trains the SAME centroids: cluster sizes agree
    for c in km.index:
        assert int(got.loc[c, "n"]) == int(km.loc[c, "n"])

    # exact replay of training + scoring
    emb = pd.read_parquet(f"{SFD}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    X = np.array(emb["embedding"].to_list(), dtype="float64")
    ids = emb["vec_id"].to_numpy(dtype="int64")
    order = np.argsort(_mix64(ids), kind="stable")[:k]
    C = np.floor(X[order] * 1e6 + 0.5) / 1e6
    for _ in range(it):
        d2 = (X * X).sum(axis=1)[:, None] - 2 * (X @ C.T) + (C * C).sum(axis=1)
        a = np.argmin(d2, axis=1)
        xq = np.floor(X * 1e6 + 0.5).astype("int64")
        for cell in np.unique(a):
            m = a == cell
            C[cell] = np.floor(
                xq[m].sum(axis=0).astype("float64") / 1e6 / m.sum() * 1e6 + 0.5
            ) / 1e6
    d2 = np.maximum(
        (X * X).sum(axis=1)[:, None] - 2 * (X @ C.T) + (C * C).sum(axis=1), 0.0
    )
    own = np.argmin(d2, axis=1)
    d = np.sqrt(d2)
    av = d[np.arange(len(X)), own]
    dm = d.copy()
    dm[np.arange(len(X)), own] = np.inf
    bv = dm.min(axis=1)
    s = np.where(np.maximum(av, bv) > 0, (bv - av) / np.maximum(av, bv), 0.0)
    se = np.floor(s * 1e6 + 0.5).astype("int64")
    for c in np.unique(own):
        m = own == c
        assert int(got.loc[int(c), "mean_sil_e6"]) == int(se[m].sum()) // int(m.sum())
    # silhouette lives in [-1, 1]
    assert got["mean_sil_e6"].between(-1_000_000, 1_000_000).all()


def test_embedding_lof_matches_brute_replay(ray_session):
    from opps_feedcrawler_ray.pipelines.ann import embedding_lof

    SFD = "/root/testdata/sf0.001"
    k, topn = 8, 15
    got = embedding_lof(SFD, k=k, topn=topn)
    emb = pd.read_parquet(f"{SFD}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    X = np.array(emb["embedding"].to_list(), dtype="float64")
    ids = emb["vec_id"].to_numpy(dtype="int64")
    n = len(ids)
    d = np.sqrt(np.maximum(
        ((X[:, None, :] - X[None, :, :]) ** 2).sum(axis=2), 0.0))
    np.fill_diagonal(d, np.inf)
    nbrs, kdist = {}, {}
    for i in range(n):
        order = np.lexsort((ids, d[i]))[:k]
        nbrs[int(ids[i])] = [int(ids[j]) for j in order]
        kdist[int(ids[i])] = float(d[i][order].max())
    pos = {int(v): i for i, v in enumerate(ids)}
    lrd = {}
    for p, os_ in nbrs.items():
        reach = [max(kdist[o], d[pos[p], pos[o]]) for o in os_]
        lrd[p] = 1.0 / (sum(reach) / len(reach))
    lof = {p: (sum(lrd[o] for o in os_) / len(os_)) / lrd[p]
           for p, os_ in nbrs.items()}
    exp = (
        pd.DataFrame({"vec_id": list(lof.keys()),
                      "lof_e6": [int(np.floor(v * 1e6 + 0.5))
                                 for v in lof.values()]})
        .sort_values(["lof_e6", "vec_id"], ascending=[False, True])
        .head(topn).reset_index(drop=True)
        .astype({"vec_id": "int64", "lof_e6": "int64"})
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # LOF of an inlier cluster hovers near 1.0; top outliers exceed it
    assert int(got["lof_e6"].iloc[0]) >= 1_000_000


def test_embedding_random_projection_replay_and_jl(ray_session):
    import pandas as pd

    from opps_feedcrawler_ray.pipelines.ann import embedding_random_projection
    from opps_feedcrawler_ray.pipelines.webpipe import _splitmix64

    k = 16
    got = embedding_random_projection(SF, k=k)
    emb = pd.read_parquet(f"{SF}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    x = np.asarray(emb["embedding"].tolist(), dtype=np.float64)
    d = x.shape[1]
    idx = np.arange(d * k, dtype=np.uint64)
    sign = np.where((_splitmix64(idx) & np.uint64(1)).astype(bool),
                    1.0, -1.0).reshape(d, k)
    y = x @ (sign / np.sqrt(k))
    exp = np.floor(y * 1e6 + 0.5).astype("int64")
    got_m = (
        got.pivot(index="vec_id", columns="j", values="y_e6")
        .loc[emb["vec_id"].to_numpy()].to_numpy()
    )
    assert (got_m == exp).all()
    # JL distortion: projected pairwise distances track the originals
    rng_pairs = [(i, (i * 37 + 11) % len(x)) for i in range(0, len(x), 7)]
    ratios = []
    for a, b in rng_pairs:
        if a == b:
            continue
        do = np.linalg.norm(x[a] - x[b])
        dp = np.linalg.norm(y[a] - y[b])
        if do > 0:
            ratios.append(dp / do)
    r = np.asarray(ratios)
    assert 0.4 < r.mean() < 1.6
    assert (r > 0.15).all() and (r < 3.0).all()


def _blob_corpus(n_blobs: int = 30, per: int = 20, dim: int = 32, seed: int = 11):
    """Tight planted blobs with near-orthogonal centers — the density
    regime the LSH edge source targets (intra-blob cosine ≈ 0.99)."""
    rng = np.random.RandomState(seed)
    centers = rng.normal(0, 1, (n_blobs, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    vid = 0
    for c in range(n_blobs):
        for _ in range(per):
            v = centers[c] * 10.0 + rng.normal(0, 0.3, dim)
            rows.append((vid, v.tolist()))
            vid += 1
    return pd.DataFrame(rows, columns=["vec_id", "embedding"])


def test_dbscan_lsh_edge_source_equals_exact_on_fixtures(ray_session):
    """VERDICT r4 task #2: the default (sub-quadratic sign-LSH) edge
    source must produce identical clusters to the exact all-pairs twin
    on the driver fixtures."""
    from opps_feedcrawler_ray.pipelines.ann import embedding_dbscan

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        lsh = embedding_dbscan(sf, threshold=0.5, min_pts=4, edge_source="lsh")
        exact = embedding_dbscan(sf, threshold=0.5, min_pts=4, edge_source="exact")
        pd.testing.assert_frame_equal(lsh, exact)


def test_dbscan_lsh_edge_source_equals_exact_on_blobs(ray_session):
    """Identical clusters on a planted-blob corpus where the eps-graph
    is non-trivial (30 blobs × 20 points), lsh vs exact."""
    from opps_feedcrawler_ray.pipelines.ann import dbscan_embeddings

    df = _blob_corpus()
    ds = rd.from_pandas(df)
    lsh = (dbscan_embeddings(ds, threshold=0.9, min_pts=4, edge_source="lsh")
           .to_pandas().sort_values("vec_id").reset_index(drop=True))
    ds2 = rd.from_pandas(df)
    exact = (dbscan_embeddings(ds2, threshold=0.9, min_pts=4, edge_source="exact")
             .to_pandas().sort_values("vec_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(lsh, exact)
    # sanity: every blob actually clustered (not vacuously equal)
    assert (lsh["cluster"] >= 0).sum() == len(df)


def test_dbscan_lsh_candidate_generation_subquadratic(ray_session):
    """The point of the swap: candidate pairs examined by the banded
    sign-LSH kernel must be a small fraction of the n(n-1)/2 the exact
    baseline pays, while the verified pair set stays identical."""
    from opps_feedcrawler_ray.pipelines.dedup import (
        embedding_allpairs_cosine, embedding_dedup_pairs,
    )

    df = _blob_corpus()
    n = len(df)
    stats: dict = {}
    got = embedding_dedup_pairs(
        rd.from_pandas(df), threshold=0.9, n_tables=16, bits_per_table=8,
        stats=stats,
    )
    exact = embedding_allpairs_cosine(rd.from_pandas(df), threshold=0.9)
    total = n * (n - 1) // 2
    assert stats["n_candidates"] >= len(exact)          # recall on this corpus
    assert stats["n_candidates"] < 0.4 * total          # pruning happened
    pd.testing.assert_frame_equal(
        got[["a", "b"]].reset_index(drop=True),
        exact[["a", "b"]].reset_index(drop=True),
    )


def test_dbscan_distributed_components_backend_equals_unionfind(ray_session):
    """The graphcore min-label components backend (the past-10^8-pairs
    swap for the driver union-find) must produce identical clusters and
    roles on the planted-blob corpus and the fixture."""
    from opps_feedcrawler_ray.pipelines.ann import dbscan_embeddings

    df = _blob_corpus()
    uf = (dbscan_embeddings(rd.from_pandas(df), threshold=0.9, min_pts=4,
                            cluster_backend="unionfind")
          .to_pandas().sort_values("vec_id").reset_index(drop=True))
    dist = (dbscan_embeddings(rd.from_pandas(df), threshold=0.9, min_pts=4,
                              cluster_backend="distributed")
            .to_pandas().sort_values("vec_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(uf, dist)
    assert (uf["cluster"] >= 0).any()


def test_min_label_components_equals_unionfind_replay(ray_session, tmp_path):
    """graphcore.min_label_components on a random multigraph must equal
    a sequential union-find with min-root labeling."""
    from opps_feedcrawler_ray.pipelines import graphcore as gc

    rng = np.random.RandomState(5)
    n = 3000
    a = rng.randint(0, n, 6000).astype(np.int64)
    b = rng.randint(0, n, 6000).astype(np.int64)
    keep = a != b
    a, b = a[keep], b[keep]
    import pyarrow as pa
    got = gc.min_label_components(
        rd.from_arrow(pa.table({"a": pa.array(a), "b": pa.array(b)})),
        str(tmp_path / "gc"), n_buckets=8,
    )
    parent = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for x, y in zip(a, b):
        rx, ry = find(int(x)), find(int(y))
        if rx != ry:
            lo, hi = (rx, ry) if rx < ry else (ry, rx)
            parent[hi] = lo
    nodes = np.unique(np.concatenate([a, b]))
    exp = pd.DataFrame({"node": nodes,
                        "comp": [find(int(x)) for x in nodes]})
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True),
        exp.astype({"node": "int64", "comp": "int64"}).reset_index(drop=True),
    )
