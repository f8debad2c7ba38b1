"""Deduplication pipelines over a documents table (driver prompt:
exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup).

Every variant is Ray-Data-first and scale-shaped:

* exact        — content-hash in ``map_batches`` (vectorized), then ONE
                 hash-shuffle ``groupby(hash).map_groups(first)``;
* minhash_lsh  — shingle→minhash per batch (stateless tasks), explode to
                 (band, band_hash) rows, ONE groupby over band buckets
                 → candidate pairs, verified by exact Jaccard inside the
                 group task; pairs → survivor set via driver-side
                 union-find over the (small) candidate-pair list only;
* simhash      — 64-bit simhash per batch, banded into 4×16-bit chunks
                 (Hamming ≤3 ⇒ some chunk equal), groupby chunk →
                 verify Hamming distance in-group;
* ngram_jaccard— LSH-free exact variant for small inputs / oracle tests:
                 candidate pairs from shared rare shingles;
* embedding    — cosine near-dup over an embedding column: normalize per
                 batch, LSH-bucket by sign of random-ish (pinned)
                 hyperplanes, verify cosine in-group.

All return the SURVIVOR documents (first doc_id wins per duplicate
cluster) unless ``return_pairs=True``.  The union-find runs on the
candidate-PAIR list, which LSH keeps tiny relative to the corpus — the
documented partitioning assumption (ray_guide.md near-dup pattern).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..functions.text import (
    doc_fingerprint,
    jaccard,
    lsh_band_keys,
    minhash_signature,
    shingles,
    simhash,
)


# --------------------------------------------------------------- exact
def exact_dedup(ds: rd.Dataset, text_col: str = "text", id_col: str = "doc_id") -> rd.Dataset:
    """First-seen-wins exact dedup by normalized content fingerprint.
    Survivor = min(id) per content hash (deterministic, order-free)."""

    def add_hash(batch: pa.Table) -> pa.Table:
        fps = doc_fingerprint(batch[text_col].to_pylist())
        return batch.append_column("__fp", pa.array(fps, pa.uint64()))

    def first(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values(id_col).head(1).drop(columns=["__fp"])

    return (
        ds.map_batches(add_hash, batch_format="pyarrow")
        .groupby("__fp")
        .map_groups(first, batch_format="pandas")
    )


# ----------------------------------------------------------- minhash LSH
def _pairs_to_survivors(pairs: list[tuple[int, int]], all_ids: list[int]) -> set[int]:
    """Union-find over candidate pairs (small by construction); survivor
    of each cluster = min id; returns the set of surviving ids."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    dropped = {x for x in parent if find(x) != x}
    return {i for i in all_ids if i not in dropped}


def minhash_lsh_dedup(
    ds: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    n_bands: int = 16,
    k_shingle: int = 5,
    return_pairs: bool = False,
):
    """MinHash+LSH near-dup: shingle → 128-perm minhash → 16 bands →
    band-bucket groupby → exact-Jaccard verify inside each bucket."""

    def sig_stage(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        texts = batch[text_col].to_pylist()
        out_id, out_band, out_key, out_sh = [], [], [], []
        for i, t in zip(ids, texts):
            sh = shingles(t, k_shingle)
            sig = minhash_signature(sh)
            keys = lsh_band_keys(sig, n_bands)
            for b, key in enumerate(keys):
                out_id.append(i)
                out_band.append(b)
                out_key.append(key)
                out_sh.append(np.fromiter(sh, dtype=np.uint64, count=len(sh)))
        return pa.table(
            {
                id_col: pa.array(out_id, pa.int64()),
                "band": pa.array(out_band, pa.int32()),
                "band_key": pa.array(out_key, pa.uint64()),
                "shingles": pa.array([s.tolist() for s in out_sh], pa.list_(pa.uint64())),
            }
        )

    def verify_bucket(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) < 2:
            return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                                 "b": pd.Series([], dtype="int64"),
                                 "sim": pd.Series([], dtype="float64")})
        rows = group.drop_duplicates(subset=[id_col])
        ids = rows[id_col].tolist()
        shs = [set(int(x) for x in s) for s in rows["shingles"]]
        a_out, b_out, sim_out = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                s = jaccard(shs[i], shs[j])
                if s >= threshold:
                    a, b = sorted((ids[i], ids[j]))
                    a_out.append(a)
                    b_out.append(b)
                    sim_out.append(s)
        return pd.DataFrame({"a": a_out, "b": b_out, "sim": sim_out})

    pairs_ds = (
        ds.map_batches(sig_stage, batch_format="pyarrow")
        .groupby(["band", "band_key"])
        .map_groups(verify_bucket, batch_format="pandas")
    )
    pair_rows = pairs_ds.to_pandas()
    if pair_rows.empty:
        pair_rows = pd.DataFrame({"a": pd.Series([], dtype="int64"),
                                  "b": pd.Series([], dtype="int64"),
                                  "sim": pd.Series([], dtype="float64")})
    pair_rows = pair_rows.drop_duplicates(subset=["a", "b"])
    if return_pairs:
        return pair_rows.sort_values(["a", "b"]).reset_index(drop=True)
    all_ids = [r[id_col] for r in ds.select_columns([id_col]).take_all()]
    survivors = _pairs_to_survivors(
        list(zip(pair_rows["a"], pair_rows["b"])), all_ids
    )
    keep = ray_put_set(survivors)

    def filt(batch: pa.Table) -> pa.Table:
        import ray as _ray

        s = _ray.get(keep)
        mask = pa.array([i in s for i in batch[id_col].to_pylist()])
        return batch.filter(mask)

    return ds.map_batches(filt, batch_format="pyarrow")


def ray_put_set(s):
    import ray

    return ray.put(s)


# --------------------------------------------------------------- simhash
def simhash_dedup(
    ds: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    return_pairs: bool = False,
):
    """SimHash near-dup: 64-bit simhash, banded into 4 × 16-bit chunks
    (pigeonhole: Hamming ≤ 3 ⇒ at least one chunk identical)."""

    def sig_stage(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        texts = batch[text_col].to_pylist()
        out_id, out_chunk, out_key, out_sig = [], [], [], []
        for i, t in zip(ids, texts):
            h = simhash(t)
            for c in range(4):
                out_id.append(i)
                out_chunk.append(c)
                out_key.append((h >> (16 * c)) & 0xFFFF)
                out_sig.append(h)
        return pa.table(
            {
                id_col: pa.array(out_id, pa.int64()),
                "chunk": pa.array(out_chunk, pa.int32()),
                "chunk_key": pa.array(out_key, pa.int32()),
                "sig": pa.array(out_sig, pa.uint64()),
            }
        )

    def verify(group: pd.DataFrame) -> pd.DataFrame:
        rows = group.drop_duplicates(subset=[id_col])
        ids = rows[id_col].tolist()
        sigs = [int(s) for s in rows["sig"]]
        a_out, b_out, d_out = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                d = bin(sigs[i] ^ sigs[j]).count("1")
                if d <= max_hamming:
                    a, b = sorted((ids[i], ids[j]))
                    a_out.append(a)
                    b_out.append(b)
                    d_out.append(d)
        return pd.DataFrame(
            {"a": pd.Series(a_out, dtype="int64"),
             "b": pd.Series(b_out, dtype="int64"),
             "hamming": pd.Series(d_out, dtype="int64")}
        )

    pairs = (
        ds.map_batches(sig_stage, batch_format="pyarrow")
        .groupby(["chunk", "chunk_key"])
        .map_groups(verify, batch_format="pandas")
        .to_pandas()
    )
    if pairs.empty:
        return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                             "b": pd.Series([], dtype="int64"),
                             "hamming": pd.Series([], dtype="int64")})
    return pairs.drop_duplicates(subset=["a", "b"]).sort_values(["a", "b"]).reset_index(drop=True)


# -------------------------------------------------------- ngram jaccard
def ngram_jaccard_pairs(
    ds: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    k_shingle: int = 3,
) -> pd.DataFrame:
    """All-pairs n-gram Jaccard ≥ threshold via shingle-bucket join:
    explode (shingle_hash, id), groupby shingle → co-occurring id pairs,
    count shared shingles per pair, compute exact Jaccard with per-doc
    shingle counts (no full cross product — only docs sharing ≥1 shingle
    meet)."""

    def sh_stage(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        texts = batch[text_col].to_pylist()
        out_id, out_sh, out_n = [], [], []
        for i, t in zip(ids, texts):
            sh = shingles(t, k_shingle)
            for s in sh:
                out_id.append(i)
                out_sh.append(s)
                out_n.append(len(sh))
        return pa.table(
            {
                id_col: pa.array(out_id, pa.int64()),
                "sh": pa.array(out_sh, pa.uint64()),
                "n_sh": pa.array(out_n, pa.int64()),
            }
        )

    def add_shbucket(batch: pa.Table) -> pa.Table:
        # shingle-hash → coarse bucket: turns millions of 1-row "groups"
        # into ~1024 vectorizable ones (one shuffle, same co-location:
        # equal shingles share a bucket)
        b = (batch["sh"].to_numpy(zero_copy_only=False) % 1024).astype("int32")
        return batch.append_column("shb", pa.array(b))

    def pairs_in_bucket(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates(subset=[id_col, "sh"])[[id_col, "sh", "n_sh"]]
        m = g.merge(g, on="sh", suffixes=("_a", "_b"))
        m = m[m[f"{id_col}_a"] < m[f"{id_col}_b"]]
        if m.empty:
            return pd.DataFrame(
                {"a": pd.Series([], dtype="int64"), "b": pd.Series([], dtype="int64"),
                 "na": pd.Series([], dtype="int64"), "nb": pd.Series([], dtype="int64"),
                 "shared": pd.Series([], dtype="int64")}
            )
        co = m.groupby(
            [f"{id_col}_a", f"{id_col}_b", "n_sh_a", "n_sh_b"], as_index=False
        ).size()
        return co.rename(
            columns={f"{id_col}_a": "a", f"{id_col}_b": "b",
                     "n_sh_a": "na", "n_sh_b": "nb", "size": "shared"}
        ).astype("int64")

    co = (
        ds.map_batches(sh_stage, batch_format="pyarrow")
        .map_batches(add_shbucket, batch_format="pyarrow")
        .groupby("shb")
        .map_groups(pairs_in_bucket, batch_format="pandas")
        .groupby(["a", "b", "na", "nb"])
        .sum("shared")
        .to_pandas()
    )
    if co.empty:
        return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                             "b": pd.Series([], dtype="int64"),
                             "jaccard": pd.Series([], dtype="float64")})
    shared = co["sum(shared)"] if "sum(shared)" in co.columns else co["shared"]
    co["jaccard"] = shared / (co["na"] + co["nb"] - shared)
    out = co[co["jaccard"] >= threshold][["a", "b", "jaccard"]]
    return out.sort_values(["a", "b"]).reset_index(drop=True)


# ------------------------------------------------- embedding cosine dup
def embedding_dedup_pairs(
    ds: rd.Dataset,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    n_planes: int = 12,
) -> pd.DataFrame:
    """Cosine near-dup over an embedding column: sign-LSH bucket by
    pinned hyperplanes, exact cosine verify within buckets."""
    from ..functions.hashing import fingerprint64

    def planes(dim: int) -> np.ndarray:
        # pinned pseudo-random hyperplanes — seeded from the engine hash
        rng = np.random.default_rng(fingerprint64("embedding-lsh-planes") % (2**32))
        return rng.standard_normal((n_planes, dim))

    state = {}

    def bucket_stage(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        vecs = np.array(batch[vec_col].to_pylist(), dtype=np.float64)
        if "P" not in state:
            state["P"] = planes(vecs.shape[1])
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        unit = vecs / norms
        bits = (unit @ state["P"].T) > 0
        keys = np.packbits(bits, axis=1, bitorder="little")[:, :2].copy().view(np.uint16).ravel()
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "bkey": pa.array(keys.astype(np.int32), pa.int32()),
                "unit": pa.array([u.tolist() for u in unit], pa.list_(pa.float64())),
            }
        )

    def verify(group: pd.DataFrame) -> pd.DataFrame:
        rows = group.drop_duplicates(subset=[id_col])
        ids = rows[id_col].tolist()
        U = np.array([np.asarray(u) for u in rows["unit"]])
        sims = U @ U.T
        a_out, b_out, s_out = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if sims[i, j] >= threshold:
                    a, b = sorted((ids[i], ids[j]))
                    a_out.append(a); b_out.append(b); s_out.append(float(sims[i, j]))
        return pd.DataFrame(
            {"a": pd.Series(a_out, dtype="int64"), "b": pd.Series(b_out, dtype="int64"),
             "cosine": pd.Series(s_out, dtype="float64")}
        )

    out = (
        ds.map_batches(bucket_stage, batch_format="pyarrow")
        .groupby("bkey")
        .map_groups(verify, batch_format="pandas")
        .to_pandas()
    )
    if out.empty:  # no buckets produced pairs → typed empty frame
        return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                             "b": pd.Series([], dtype="int64"),
                             "cosine": pd.Series([], dtype="float64")})
    return (
        out.drop_duplicates(subset=["a", "b"]).sort_values(["a", "b"]).reset_index(drop=True)
    )
