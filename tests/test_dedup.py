"""Dedup pipeline tests (round-2 rework): minhash candidate-verify path,
survivor-mode broadcast anti-join (no driver-side id enumeration), exact
embedding all-pairs vs the multi-table LSH path.

Brute-force twins are computed in-process over the sf0.001 fixtures
(50-ish docs / 50 vecs) so every approximate path is checked against an
exact reference."""

from __future__ import annotations

import numpy as np
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


def test_embedding_lsh_matches_exact_at_high_threshold(ray_session):
    """The multi-table sign-LSH path is approximate by construction, but
    with T=8 tables × 4 bits its recall at cosine ≥ 0.85 is ≈0.98+ and
    the pinned hyperplanes make it deterministic — pin it equal to the
    exact output on the fixture corpus."""
    ds = rd.read_parquet(f"{SF}/embeddings.parquet")
    exact = embedding_allpairs_cosine(ds, threshold=0.85, n_blocks=4)
    lsh = embedding_dedup_pairs(ds, threshold=0.85)
    assert list(zip(lsh["a"], lsh["b"])) == list(zip(exact["a"], exact["b"]))
