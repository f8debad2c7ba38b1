"""Dedup pipeline tests (round-2 rework): minhash candidate-verify path,
survivor-mode broadcast anti-join (no driver-side id enumeration), exact
embedding all-pairs vs the multi-table LSH path.

Brute-force twins are computed in-process over the sf0.001 fixtures
(50-ish docs / 50 vecs) so every approximate path is checked against an
exact reference."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from opps_feedcrawler_ray.functions.text import jaccard, shingles
from opps_feedcrawler_ray.pipelines.dedup import (
    _pairs_to_dropped,
    embedding_allpairs_cosine,
    embedding_dedup_pairs,
    minhash_lsh_dedup,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_table():
    return pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])


def brute_jaccard_pairs(t, threshold, k_shingle):
    ids = t["doc_id"].to_pylist()
    texts = t["text"].to_pylist()
    sh = {i: shingles(x, k_shingle) for i, x in zip(ids, texts)}
    out = {}
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            s = jaccard(sh[ids[i]], sh[ids[j]])
            if s >= threshold:
                a, b = sorted((ids[i], ids[j]))
                out[(a, b)] = s
    return out


def test_minhash_pairs_subset_of_exact(ray_session, docs_table):
    ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    got = minhash_lsh_dedup(ds, threshold=0.5, return_pairs=True)
    exact = brute_jaccard_pairs(docs_table, 0.5, 5)
    # verification is exact, so every returned pair must be a true pair
    # with the true similarity; LSH may only MISS pairs, never invent them
    for a, b, sim in zip(got["a"], got["b"], got["sim"]):
        assert (a, b) in exact
        assert sim == pytest.approx(exact[(a, b)], abs=0)
    # the fixture's near-dup pairs are high-similarity → recall 1.0 here
    assert set(zip(got["a"], got["b"])) == set(exact)


def test_minhash_survivors_broadcast_antijoin(ray_session, docs_table):
    ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    pairs = minhash_lsh_dedup(ds, threshold=0.5, return_pairs=True)
    survivors = minhash_lsh_dedup(ds, threshold=0.5).to_pandas()
    dropped = _pairs_to_dropped(zip(pairs["a"], pairs["b"]))
    all_ids = set(docs_table["doc_id"].to_pylist())
    assert set(survivors["doc_id"]) == all_ids - dropped
    assert dropped  # fixture contains injected near-dups
    # min-id survivor rule: every dropped id has a smaller surviving root
    for d in dropped:
        assert any(s < d for s in survivors["doc_id"])


def test_ngram_max_df_lower_bound(ray_session, docs_table):
    """The 100 TB stop-shingle guard: max_df results are a subset of the
    exact pairs (precision exact, recall may drop), and a no-op cap
    reproduces the exact output."""
    from opps_feedcrawler_ray.pipelines.dedup import ngram_jaccard_pairs

    ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    exact = ngram_jaccard_pairs(ds, threshold=0.5, k_shingle=3)
    capped_loose = ngram_jaccard_pairs(ds, threshold=0.5, k_shingle=3, max_df=10**9)
    assert capped_loose.equals(exact)
    capped = ngram_jaccard_pairs(ds, threshold=0.5, k_shingle=3, max_df=5)
    exact_pairs = set(zip(exact["a"], exact["b"]))
    assert set(zip(capped["a"], capped["b"])) <= exact_pairs
    # jaccard is a lower bound under the cap
    em = {(a, b): j for a, b, j in zip(exact["a"], exact["b"], exact["jaccard"])}
    for a, b, j in zip(capped["a"], capped["b"], capped["jaccard"]):
        assert j <= em[(a, b)] + 1e-12


def test_coarse_bucket_count_invariance(ray_session):
    """Coarse-bucket counts are a pure scheduling knob (round-3: derived
    from input size instead of fixed literals): outputs must be identical
    under a B sweep, since equal keys always share a bucket."""
    from opps_feedcrawler_ray.pipelines.dedup import (
        coarse_buckets,
        ngram_jaccard_pairs,
        simhash_dedup,
    )

    # the derivation itself: bounded below/above, monotone in rows
    assert coarse_buckets(None) == 64
    assert coarse_buckets(10) == 64
    assert coarse_buckets(16384 * 100) == 100
    assert coarse_buckets(10**12) == 65536
    ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    sweeps = [7, 64, 1009]
    mh = [
        minhash_lsh_dedup(ds, threshold=0.5, return_pairs=True, n_buckets=b)
        for b in sweeps
    ]
    assert mh[0].equals(mh[1]) and mh[1].equals(mh[2])
    sh = [simhash_dedup(ds, max_hamming=10, n_buckets=b) for b in sweeps]
    assert sh[0].equals(sh[1]) and sh[1].equals(sh[2])
    ng = [ngram_jaccard_pairs(ds, threshold=0.5, k_shingle=3, n_buckets=b) for b in sweeps]
    assert ng[0].equals(ng[1]) and ng[1].equals(ng[2])
    eds = rd.read_parquet(f"{SF}/embeddings.parquet")
    el = [embedding_dedup_pairs(eds, threshold=0.5, n_buckets=b) for b in sweeps]
    assert el[0].equals(el[1]) and el[1].equals(el[2])


def test_embedding_allpairs_exact(ray_session):
    t = pq.read_table(f"{SF}/embeddings.parquet")
    V = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    ids = np.asarray(t["vec_id"].to_pylist())
    sims = V @ V.T
    want = {
        (int(ids[i]), int(ids[j])): sims[i, j]
        for i in range(len(ids))
        for j in range(i + 1, len(ids))
        if sims[i, j] >= 0.5
    }
    ds = rd.read_parquet(f"{SF}/embeddings.parquet")
    got = embedding_allpairs_cosine(ds, threshold=0.5, n_blocks=4)
    assert {(a, b) for a, b in zip(got["a"], got["b"])} == set(want)
    for a, b, c in zip(got["a"], got["b"], got["cosine"]):
        assert c == pytest.approx(want[(a, b)], rel=1e-12)


def test_embedding_lsh_matches_exact(ray_session):
    """The multi-table sign-LSH path is approximate by construction; pin
    it equal to the exact all-pairs output on a corpus with PLANTED
    near-dups (the raw fixture has no pair above 0.52, which would make
    this vacuous).  Deterministic: pinned hyperplanes + fixed data."""
    base = pq.read_table(f"{SF}/embeddings.parquet")
    V = np.array(base["embedding"].to_pylist(), dtype=np.float32)
    rng = np.random.default_rng(13)
    dup_src = np.arange(0, 40, 4)
    dups = V[dup_src] + rng.normal(0, 0.05, (len(dup_src), V.shape[1])).astype(
        np.float32
    ) * np.abs(V[dup_src]).mean()
    allv = np.concatenate([V, dups])
    ids = list(range(len(allv)))
    t = pa.table(
        {"vec_id": pa.array(ids, pa.int64()),
         "embedding": pa.array([v.tolist() for v in allv], pa.list_(pa.float32()))}
    )
    ds = rd.from_arrow(t)
    exact = embedding_allpairs_cosine(ds, threshold=0.9, n_blocks=4)
    lsh = embedding_dedup_pairs(ds, threshold=0.9)
    assert len(exact) >= 5  # the planted dups are really there
    assert list(zip(lsh["a"], lsh["b"])) == list(zip(exact["a"], exact["b"]))
    # and on the real sf0.01 table the LSH finds the single true pair
    ds01 = rd.read_parquet("/root/testdata/sf0.01/embeddings.parquet")
    lsh01 = embedding_dedup_pairs(ds01, threshold=0.5)
    exact01 = embedding_allpairs_cosine(ds01, threshold=0.5, n_blocks=4)
    assert list(zip(lsh01["a"], lsh01["b"])) == list(zip(exact01["a"], exact01["b"]))
    assert len(exact01) == 1


def test_cell_pair_indices_matches_bruteforce():
    """The vectorized within-cell pair-enumeration kernel (the innermost
    step of every LSH path) must emit exactly the i<j pairs a nested loop
    emits, for adversarial cell layouts: singletons, one giant cell,
    empty input, duplicate ids pre-deduped by callers."""
    from opps_feedcrawler_ray.pipelines.dedup import _cell_pair_indices, _pairs_in_cells

    rng = np.random.default_rng(42)
    for trial in range(20):
        n_cells = int(rng.integers(1, 12))
        sizes = rng.integers(0, 9, n_cells)
        c = np.repeat(np.arange(n_cells), sizes)
        a_idx, b_idx = _cell_pair_indices(c)
        want = {
            (i, j)
            for s in range(n_cells)
            for i in np.flatnonzero(c == s)
            for j in np.flatnonzero(c == s)
            if i < j
        }
        got = set(zip(a_idx.tolist(), b_idx.tolist()))
        assert got == want and len(a_idx) == len(want), (trial, c)
        assert (a_idx < b_idx).all() if len(a_idx) else True
    # empty + all-singleton edges
    for c in (np.empty(0, np.int64), np.arange(5)):
        a_idx, b_idx = _cell_pair_indices(c)
        assert len(a_idx) == 0 and len(b_idx) == 0

    # _pairs_in_cells end-to-end vs brute force on a random frame
    g = pd.DataFrame(
        {"band": rng.integers(0, 3, 500), "band_key": rng.integers(0, 20, 500),
         "doc_id": rng.integers(0, 60, 500)}
    )
    out = _pairs_in_cells(g, ["band", "band_key"], "doc_id")
    brute = set()
    for _, cell in g.groupby(["band", "band_key"]):
        ids = sorted(set(int(x) for x in cell["doc_id"]))
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                brute.add((ids[i], ids[j]))
    assert set(zip(out["a"], out["b"])) == brute


def test_dup_clusters_matches_bfs_components(ray_session):
    """Union-find cluster labels equal an independent BFS transitive
    closure over the same pair list; singletons label themselves and
    exactly one keep=1 (the min id) per cluster."""
    from opps_feedcrawler_ray.pipelines.dedup import dup_clusters, ngram_jaccard_pairs

    got = dup_clusters(SF)
    docs = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    pairs = ngram_jaccard_pairs(docs, threshold=0.3999, k_shingle=3)
    pairs["j"] = np.floor(pairs["jaccard_e4_raw"] + 0.5).astype("int64")
    pairs = pairs[pairs["j"] >= 4000]

    adj: dict[int, set[int]] = {}
    for a, b in zip(pairs["a"], pairs["b"]):
        adj.setdefault(int(a), set()).add(int(b))
        adj.setdefault(int(b), set()).add(int(a))
    label = {}
    for start in sorted(adj):
        if start in label:
            continue
        comp, stack = [], [start]
        seen = {start}
        while stack:
            x = stack.pop()
            comp.append(x)
            for y in adj[x]:
                if y not in seen:
                    seen.add(y)
                    stack.append(y)
        m = min(comp)
        for x in comp:
            label[x] = m

    ids = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])["doc_id"].to_pylist()
    exp = pd.DataFrame(
        {"doc_id": sorted(ids),
         "cluster_id": [label.get(i, i) for i in sorted(ids)]}
    )
    exp["keep"] = (exp["cluster_id"] == exp["doc_id"]).astype("int64")
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert set(got.groupby("cluster_id")["keep"].sum()) == {1}


def test_prefix_jaccard_matches_bruteforce(ray_session, tmp_path_factory):
    """Prefix filtering loses NO qualifying pair: random small-vocab docs
    (heavy overlap), several thresholds, compared against a driver-side
    exact all-pairs token-set Jaccard."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from opps_feedcrawler_ray.pipelines.dedup import prefix_jaccard_pairs

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(30)]
    docs = []
    for i in range(80):
        n = int(rng.integers(3, 20))
        docs.append(" ".join(rng.choice(vocab, n, replace=True)))
    # plant exact and near dups
    docs[50] = docs[10]
    docs[51] = docs[10] + " extra"
    tmp = str(tmp_path_factory.mktemp("ppjoin"))
    tbl = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                    "text": pa.array(docs)})
    pq.write_table(tbl, f"{tmp}/docs.parquet")

    def brute(th):
        sets = [set(d.split()) for d in docs]
        out = []
        for a in range(len(sets)):
            for b in range(a + 1, len(sets)):
                u = len(sets[a] | sets[b])
                if u and len(sets[a] & sets[b]) / u >= th:
                    out.append((a, b))
        return sorted(out)

    ds = rd.read_parquet(f"{tmp}/docs.parquet")
    for th in (0.5, 0.75, 0.9, 1.0):
        got = prefix_jaccard_pairs(ds, threshold=th)
        assert sorted(zip(got["a"], got["b"])) == brute(th), th


def test_winnow_guarantee_no_false_negatives():
    """Schleimer et al. guarantee: two strings sharing a substring of
    byte length >= w + k - 1 MUST share a winnowed fingerprint value —
    exercised over randomized contexts around a planted shared run."""
    from opps_feedcrawler_ray.pipelines.dedup import _winnow_values

    k, w = 16, 15
    t = w + k - 1
    rng = np.random.RandomState(7)
    alpha = "abcdefghij "
    for trial in range(50):
        shared = "".join(alpha[i] for i in rng.randint(0, len(alpha), t))
        ctx_a = "".join(alpha[i] for i in rng.randint(0, len(alpha), rng.randint(0, 80)))
        ctx_b = "".join(alpha[i] for i in rng.randint(0, len(alpha), rng.randint(0, 80)))
        a = (ctx_a + shared + ctx_a[::-1]).encode()
        b = (ctx_b + shared + ctx_b[::-1]).encode()
        fa, fb = _winnow_values(a, k, w), _winnow_values(b, k, w)
        assert len(np.intersect1d(fa, fb)) > 0, trial


def test_exact_substring_pairs_matches_brute(ray_session):
    from opps_feedcrawler_ray.pipelines.dedup import exact_substring_pairs

    got = exact_substring_pairs(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    t = 30
    gs = {
        r.doc_id: set(r.text[i : i + t] for i in range(len(r.text) - t + 1))
        for r in docs.itertuples()
    }
    ids = sorted(gs)
    exp = sorted(
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if gs[a] and not gs[a].isdisjoint(gs[b])
    )
    assert sorted(zip(got["doc_a"], got["doc_b"])) == exp
    assert len(exp) > 0  # the fixture really contains long shared runs


def test_semantic_dedup_single_cluster_equals_brute(ray_session):
    """n_clusters=1 degenerates SemDeDup to exact all-pairs: output must
    equal the brute cosine baseline bit-for-bit (same e6 rounding)."""
    from opps_feedcrawler_ray.pipelines.dedup import semantic_dedup_pairs

    vecs = rd.read_parquet(f"{SF}/embeddings.parquet")
    got = semantic_dedup_pairs(vecs, n_clusters=1, threshold=0.4)
    df = pd.read_parquet(f"{SF}/embeddings.parquet")
    U = np.array(df["embedding"].to_list(), dtype=np.float64)
    U /= np.linalg.norm(U, axis=1, keepdims=True)
    ids = df["vec_id"].to_numpy().astype(np.int64)
    order = np.argsort(ids)
    ids, U = ids[order], U[order]
    sims = U @ U.T
    ai, bi = np.triu_indices(len(ids), k=1)
    keep = sims[ai, bi] >= 0.4
    exp = pd.DataFrame(
        {"a": ids[ai[keep]], "b": ids[bi[keep]],
         "cosine_e6": np.floor(sims[ai[keep], bi[keep]] * 1e6 + 0.5).astype("int64")}
    ).sort_values(["a", "b"]).reset_index(drop=True)
    assert len(exp) > 0
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_semantic_dedup_clustered_is_exact_subset(ray_session):
    """With real clustering the output is a SUBSET of the brute pairs
    (SemDeDup's documented trade: cross-cluster pairs are skipped), and
    every emitted cosine is bit-equal to the brute value — within-cluster
    pruning is exact, only the scope is approximate."""
    from opps_feedcrawler_ray.pipelines.dedup import semantic_dedup_pairs

    vecs = rd.read_parquet(f"{SF}/embeddings.parquet")
    got = semantic_dedup_pairs(vecs, n_clusters=6, threshold=0.4)
    df = pd.read_parquet(f"{SF}/embeddings.parquet")
    U = np.array(df["embedding"].to_list(), dtype=np.float64)
    U /= np.linalg.norm(U, axis=1, keepdims=True)
    ids = df["vec_id"].to_numpy().astype(np.int64)
    idx = {int(i): n for n, i in enumerate(ids)}
    brute = {}
    for a, b in zip(ids[np.triu_indices(len(ids), k=1)[0]],
                    ids[np.triu_indices(len(ids), k=1)[1]]):
        s = float(U[idx[int(a)]] @ U[idx[int(b)]])
        if s >= 0.4:
            key = (min(int(a), int(b)), max(int(a), int(b)))
            brute[key] = int(np.floor(s * 1e6 + 0.5))
    assert len(got) > 0
    for r in got.itertuples():
        assert brute[(r.a, r.b)] == r.cosine_e6


def test_ngram_containment_detects_subset_doc(ray_session):
    """Containment metric: a short doc fully embedded in a long one
    scores 1.0 containment but well under 0.5 Jaccard — and both metrics
    agree with a brute-force shingle-set recomputation."""
    from opps_feedcrawler_ray.pipelines.dedup import ngram_jaccard_pairs

    short = "alpha beta gamma delta epsilon zeta"
    long = short + " " + " ".join(f"w{i} x{i} y{i}" for i in range(20))
    other = "one two three four five six seven"
    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": [short, long, other]})
    ds = rd.from_arrow(t)
    cont = ngram_jaccard_pairs(ds, threshold=0.9999, metric="containment")
    assert list(zip(cont["a"], cont["b"])) == [(1, 2)]
    jac = ngram_jaccard_pairs(ds, threshold=0.5, metric="jaccard")
    assert jac.empty  # subset pair invisible to resemblance
    # brute-force twin: containment == |A∩B| / min on raw shingle sets
    sa, sb = shingles(short, 3), shingles(long, 3)
    exp = len(sa & sb) / min(len(sa), len(sb))
    assert abs(cont["jaccard"].iloc[0] - exp) < 1e-12


def test_ngram_containment_vs_jaccard_on_fixtures(ray_session):
    """On every co-occurring pair, containment >= jaccard (min <= union
    denominator), and threshold=0 runs of both metrics pair identically."""
    from opps_feedcrawler_ray.pipelines.dedup import ngram_jaccard_pairs

    ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    jac = ngram_jaccard_pairs(ds, threshold=0.0, k_shingle=3)
    con = ngram_jaccard_pairs(ds, threshold=0.0, k_shingle=3, metric="containment")
    jm = {(a, b): v for a, b, v in zip(jac["a"], jac["b"], jac["jaccard"])}
    cm = {(a, b): v for a, b, v in zip(con["a"], con["b"], con["jaccard"])}
    assert set(jm) == set(cm)
    assert all(cm[k] >= jm[k] - 1e-12 for k in jm)


def test_dedup_cascade_funnel_consistency(ray_session):
    from opps_feedcrawler_ray.functions.text import doc_fingerprint
    from opps_feedcrawler_ray.pipelines.dedup import dedup_cascade

    sf = "/root/testdata/sf0.001"
    got = dedup_cascade(sf)
    assert list(got["stage"]) == ["exact", "minhash_lsh", "simhash"]
    # funnel arithmetic: each stage's output feeds the next
    assert (got["n_out"] == got["n_in"] - got["n_dropped"]).all()
    assert list(got["n_in"][1:]) == list(got["n_out"][:-1])
    assert (got["n_dropped"] >= 0).all()
    # stage 1 pinned against an exact pandas recount
    docs = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    n_distinct = len(set(doc_fingerprint(docs["text"].tolist())))
    assert got.loc[0, "n_out"] == n_distinct
    # determinism
    pd.testing.assert_frame_equal(got, dedup_cascade(sf))


def test_part_snm_pairs_matches_brute_replay(ray_session):
    """Distributed sorted-neighborhood pairs == a single sorted-pass
    replay (cross-block stitching is exact), including under a forced
    many-tiny-block layout where windows span several blocks."""
    from opps_feedcrawler_ray.pipelines.dedup import part_snm_pairs

    SF = "/root/testdata/sf0.001"
    w, thr = 5, 6000
    got = part_snm_pairs(SF, window=w, threshold_e4=thr)

    part = (
        pd.read_parquet(f"{SF}/part.parquet", columns=["p_partkey", "p_name"])
        .sort_values(["p_name", "p_partkey"]).reset_index(drop=True)
    )
    toks = [set(s.split(" ")) - {""} for s in part["p_name"]]
    keys = part["p_partkey"].to_numpy(dtype="int64")
    rows = []
    for i in range(len(keys)):
        for j in range(i + 1, min(i + w, len(keys))):
            inter = len(toks[i] & toks[j])
            union = len(toks[i] | toks[j])
            s = (inter * 10000) // union if union else 0
            if s >= thr:
                lo, hi = sorted((int(keys[i]), int(keys[j])))
                rows.append((lo, hi, s))
    exp = (
        pd.DataFrame(rows, columns=["a", "b", "sim_e4"])
        .sort_values(["a", "b"]).reset_index(drop=True)
    )
    assert len(exp) > 0  # fixture sanity: the window finds real matches
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_embedding_topk_pairs_matches_brute_matrix(ray_session):
    from opps_feedcrawler_ray.pipelines.dedup import embedding_topk_pairs

    SF = "/root/testdata/sf0.001"
    k = 15
    ds = rd.read_parquet(f"{SF}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    got = embedding_topk_pairs(ds, k=k)
    emb = pd.read_parquet(f"{SF}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    V = np.array(emb["embedding"].to_list(), dtype="float64")
    norms = np.linalg.norm(V, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    U = V / norms
    ids = emb["vec_id"].to_numpy(dtype="int64")
    sims = U @ U.T
    iu = np.triu_indices(len(ids), 1)
    lo = np.minimum(ids[iu[0]], ids[iu[1]])
    hi = np.maximum(ids[iu[0]], ids[iu[1]])
    exp = (
        pd.DataFrame({
            "a": lo, "b": hi,
            "cos_e9": np.floor(sims[iu] * 1e9 + 0.5).astype("int64"),
        })
        .sort_values(["cos_e9", "a", "b"], ascending=[False, True, True])
        .head(k).reset_index(drop=True)
        .astype({"a": "int64", "b": "int64"})
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_golden_records_matches_pandas_twin(ray_session):
    from opps_feedcrawler_ray.pipelines.dedup import (
        _ngram_cluster_labels, golden_records,
    )

    SF = "/root/testdata/sf0.001"
    got = golden_records(SF)
    lab = _ngram_cluster_labels(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "n_chars", "lang"])
    docs["cluster_id"] = [lab.get(int(i), int(i)) for i in docs["doc_id"]]
    rows = []
    for cid, g in docs.groupby("cluster_id"):
        g = g.sort_values(["n_chars", "doc_id"], ascending=[False, True])
        rows.append((int(cid), len(g), int(g["doc_id"].min()),
                     int(g["doc_id"].iloc[0]), int(g["n_chars"].iloc[0]),
                     g["lang"].iloc[0]))
    exp = pd.DataFrame(rows, columns=["cluster_id", "n_members",
                                      "canonical_id", "survivor_id",
                                      "max_chars", "survivor_lang"])
    exp = exp.sort_values("cluster_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # at least one real (multi-member) cluster exists in the fixture
    assert (exp["n_members"] > 1).any()


# --- content-defined chunking ---------------------------------------------


def _cdc_cuts_pure_python(data: bytes, mask=0x3F, min_len=32, max_len=512):
    """Per-byte replica of the windowed polynomial rolling-hash cut
    rule: h_i recomputed from scratch at every position."""
    from opps_feedcrawler_ray.functions.hashing import fingerprint64

    W, P = 16, 0x9E3779B97F4A7C15
    gear = [fingerprint64(bytes([b])) for b in range(256)]
    n = len(data)
    if n == 0:
        return []
    if n < W:
        return [n]
    cand = []
    for i in range(n - W + 1):
        h = 0
        for j in range(W):
            # window bytes data[i..i+W-1]; newest byte gets P^0
            h = (h + gear[data[i + j]] * pow(P, W - 1 - j, 1 << 64)) % (1 << 64)
        if h & mask == 0:
            cand.append(i + W)
    cuts, last = [], 0
    for c in cand:
        while c - last > max_len:
            cuts.append(last + max_len)
            last += max_len
        if c - last >= min_len:
            cuts.append(c)
            last = c
    while n - last > max_len:
        cuts.append(last + max_len)
        last += max_len
    if last < n:
        cuts.append(n)
    return cuts


def test_cdc_cut_points_match_pure_python_replica():
    from opps_feedcrawler_ray.pipelines.dedup import (
        _cdc_cut_points,
        _cdc_gear_table,
        _cdc_powers,
    )

    gear, powers = _cdc_gear_table(), _cdc_powers()
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["text"]).head(25)
    rng_texts = list(docs["text"]) + ["", "x", "a" * 15, "b" * 16, "c" * 2000]
    for t in rng_texts:
        data = (t or "").encode("utf-8", "surrogatepass")
        got = _cdc_cut_points(data, gear, powers)
        exp = _cdc_cuts_pure_python(data)
        assert got == exp, (t[:40], got[:5], exp[:5])
        # invariants: cuts strictly increasing, last == len, max respected
        if data:
            assert got[-1] == len(data)
            assert all(b - a <= 512 for a, b in zip([0] + got, got))


def test_doc_cdc_chunks_matches_pandas_census(ray_session):
    """Distributed census equals a driver-side replica over the same
    cut rule, and a one-word edit only perturbs O(1) chunks."""
    from opps_feedcrawler_ray.functions.hashing import fingerprint64
    from opps_feedcrawler_ray.pipelines.dedup import (
        _cdc_cut_points,
        _cdc_gear_table,
        _cdc_powers,
        doc_cdc_chunks,
    )

    got = doc_cdc_chunks(SF)
    gear, powers = _cdc_gear_table(), _cdc_powers()
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    rows = []
    for did, t in zip(docs["doc_id"], docs["text"]):
        data = (t or "").encode("utf-8", "surrogatepass")
        last = 0
        for c in _cdc_cut_points(data, gear, powers):
            ck = data[last:c]
            rows.append((np.uint64(fingerprint64(ck)).astype(np.int64),
                         len(ck), int(did)))
            last = c
    df = pd.DataFrame(rows, columns=["chunk_fp", "chunk_len", "doc_id"])
    exp = df.groupby("chunk_fp", as_index=False).agg(
        chunk_len=("chunk_len", "first"),
        n_occ=("doc_id", "size"),
        n_docs=("doc_id", "nunique"),
    )
    exp = exp[exp["n_occ"] >= 2].astype("int64").sort_values(
        ["n_occ", "chunk_fp"], ascending=[False, True]
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    # locality: editing one word in the middle leaves most cuts intact
    base = (docs["text"].iloc[0] or "").encode()
    mid = len(base) // 2
    edited = base[:mid] + b"EDITED" + base[mid:]
    c1 = _cdc_cut_points(base, gear, powers)
    c2 = _cdc_cut_points(edited, gear, powers)
    # suffix cuts re-align (shifted by the 6 inserted bytes)
    tail1 = [c for c in c1 if c > mid + 32]
    tail2 = [c - 6 for c in c2 if c - 6 > mid + 32]
    assert set(tail1) & set(tail2), "no boundary re-alignment after edit"


def test_verify_pairs_vectorized_empty_set_jaccard(ray_session):
    """Two empty shingle sets are identical documents: the vectorized
    jaccard_sorted kernel must report J = 1.0 like the sim_fn twin
    (functions.text.jaccard), not 0.0 — empty docs always collide in
    every MinHash band, so this is a reachable verify case."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from opps_feedcrawler_ray.pipelines.dedup import _verify_pairs_distributed

    ds = rd.from_arrow(pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                                 "text": pa.array(["", ""], pa.string())}))
    cand = pd.DataFrame({"a": [1], "b": [2]})

    def feats(batch: pa.Table, cand_arr) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        keep = np.isin(ids, cand_arr)
        return pa.table({"doc_id": pa.array(ids[keep], pa.int64()),
                         "feat": pa.array([[] for _ in range(int(keep.sum()))],
                                          pa.list_(pa.uint64()))})

    from opps_feedcrawler_ray.functions.text import jaccard

    for kind in ("jaccard_sorted", None):
        out = _verify_pairs_distributed(
            ds, cand, feats,
            sim_fn=jaccard, threshold=0.5, id_col="doc_id",
            feat_type=pa.list_(pa.uint64()),
            prep_fn=lambda f: set(int(x) for x in f),
            sim_kind=kind,
        )
        assert len(out) == 1 and float(out["sim"].iloc[0]) == 1.0, (kind, out)
