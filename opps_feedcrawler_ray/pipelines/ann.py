"""Similarity search over an embedding column (driver prompt):
brute-force cosine top-k as the exact baseline, IVF-style bucketed
variant as the scale path.

Baseline: the query matrix is broadcast ONCE (``ray.put``), each batch
computes a numpy matmul against it, emits its LOCAL top-k per query
(partial top-k inside map_batches — the combiner pattern), and a final
tiny reduction merges partials.  Data moved to the driver = O(k ×
n_queries), never the corpus.

IVF variant: corpus vectors are assigned to ``n_cells`` centroid cells
(pinned deterministic pseudo-centroids — no training RNG at query
time); a query probes only its ``n_probe`` nearest cells.  Recall <1 by
design; the partitioning assumption is that cells are balanced enough
that a probe reads ~n_probe/n_cells of the corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..functions.hashing import fingerprint64


def _unit(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


class _BruteTopK:
    def __init__(self, q_ref, k: int, vec_col: str, id_col: str) -> None:
        self.q_ref = q_ref
        self.k = k
        self.vec_col = vec_col
        self.id_col = id_col
        self._q = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._q is None:
            self._q = ray.get(self.q_ref)  # (n_queries, dim) unit rows
        V = _unit(np.array(batch[self.vec_col].to_pylist(), dtype=np.float64))
        ids = np.asarray(batch[self.id_col].to_pylist(), dtype=np.int64)
        sims = self._q @ V.T  # (n_q, n_batch)
        k = min(self.k, sims.shape[1])
        part = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        q_idx, v_idx, s_out = [], [], []
        for qi in range(sims.shape[0]):
            for vi in part[qi]:
                q_idx.append(qi)
                v_idx.append(int(ids[vi]))
                s_out.append(float(sims[qi, vi]))
        return pa.table(
            {
                "query_idx": pa.array(q_idx, pa.int32()),
                self.id_col: pa.array(v_idx, pa.int64()),
                "cosine": pa.array(s_out, pa.float64()),
            }
        )


def brute_force_topk(
    ds: rd.Dataset,
    queries: np.ndarray,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> pd.DataFrame:
    """Exact cosine top-k: partial top-k per batch, merge of partials.
    Returns (query_idx, id, cosine) rows, k per query, cosine DESC,
    ties broken by id ASC (deterministic)."""
    q = _unit(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put(q)
    partials = ds.map_batches(
        _BruteTopK(q_ref, k, vec_col, id_col), batch_format="pyarrow"
    ).to_pandas()  # O(k × n_queries × n_blocks) rows — small
    out = []
    for qi, grp in partials.groupby("query_idx"):
        grp = grp.sort_values(["cosine", id_col], ascending=[False, True]).head(k)
        out.append(grp)
    return pd.concat(out).reset_index(drop=True)


def _pinned_centroids(dim: int, n_cells: int) -> np.ndarray:
    rng = np.random.default_rng(fingerprint64("ivf-centroids") % (2**32))
    return _unit(rng.standard_normal((n_cells, dim)))


def ivf_build(
    ds: rd.Dataset,
    index_dir: str,
    n_cells: int = 16,
    vec_col: str = "embedding",
) -> str:
    """Build the IVF layout ONCE: assign every vector to its pinned
    centroid cell and write hive-partitioned parquet by cell.  At query
    time :func:`ivf_search` reads ONLY the probed cells (partition
    pruning) — the 100 TB shape the round-1 union-probe variant lacked
    (it scanned the whole corpus before pruning).  Idempotent."""
    import os

    marker = os.path.join(index_dir, "_IVF_BUILT")
    cells_dir = os.path.join(index_dir, "cells")  # marker lives OUTSIDE the
    # data dir so read_parquet never tries to parse it as parquet
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read().strip() != str(n_cells):
                raise ValueError(f"IVF layout at {index_dir} built with a different n_cells")
        return cells_dir

    def assign(batch: pa.Table) -> pa.Table:
        V = _unit(np.array(batch[vec_col].to_pylist(), dtype=np.float64))
        C = _pinned_centroids(V.shape[1], n_cells)
        cell = np.argmax(V @ C.T, axis=1).astype(np.int32)
        return batch.append_column("cell", pa.array(cell))

    # crash-safe rebuild: write_parquet APPENDS, so a half-written layout
    # from a killed build must be cleared before re-running (else the
    # marker would legitimize duplicated vectors)
    import shutil

    shutil.rmtree(cells_dir, ignore_errors=True)
    ds.map_batches(assign, batch_format="pyarrow").write_parquet(
        cells_dir, partition_cols=["cell"]
    )
    with open(marker, "w") as f:
        f.write(str(n_cells))
    return cells_dir


def ivf_search(
    index_dir: str,
    queries: np.ndarray,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> pd.DataFrame:
    """Probe-only IVF search over an :func:`ivf_build` layout: reads only
    the ``n_probe`` nearest cells per query (union across queries) via
    parquet partition pruning, then exact cosine within the slice."""
    import os

    q = _unit(np.asarray(queries, dtype=np.float64))
    cents = _pinned_centroids(q.shape[1], n_cells)
    probe_cells = np.argsort(-(q @ cents.T), axis=1)[:, :n_probe]
    wanted = sorted({int(c) for row in probe_cells for c in row})
    # directory-level pruning: read ONLY the probed cells' partition files
    import glob

    paths = [
        f
        for c in wanted
        for f in sorted(glob.glob(os.path.join(index_dir, f"cell={c}", "*.parquet")))
    ]
    if not paths:
        return pd.DataFrame({"query_idx": pd.Series([], dtype="int32"),
                             id_col: pd.Series([], dtype="int64"),
                             "cosine": pd.Series([], dtype="float64")})
    pruned = rd.read_parquet(paths)
    q_ref = ray.put(q)
    partials = pruned.map_batches(
        _BruteTopK(q_ref, k, vec_col, id_col), batch_format="pyarrow"
    ).to_pandas()
    out = []
    for qi, grp in partials.groupby("query_idx"):
        grp = grp.sort_values(["cosine", id_col], ascending=[False, True]).head(k)
        out.append(grp)
    return pd.concat(out).reset_index(drop=True) if out else partials


def ivf_topk(
    ds: rd.Dataset,
    queries: np.ndarray,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> pd.DataFrame:
    """IVF-bucketed approximate top-k: assign vectors to pinned centroid
    cells, probe only the query's n_probe nearest cells."""
    q = _unit(np.asarray(queries, dtype=np.float64))
    cents = _pinned_centroids(q.shape[1], n_cells)
    probe_cells = np.argsort(-(q @ cents.T), axis=1)[:, :n_probe]  # (n_q, n_probe)
    cells_needed = sorted({int(c) for row in probe_cells for c in row})
    cents_ref = ray.put(cents)
    cells_ref = ray.put(set(cells_needed))

    def assign_and_filter(batch: pa.Table) -> pa.Table:
        C = ray.get(cents_ref)
        wanted = ray.get(cells_ref)
        V = _unit(np.array(batch[vec_col].to_pylist(), dtype=np.float64))
        cell = np.argmax(V @ C.T, axis=1)
        mask = pa.array([int(c) in wanted for c in cell])
        out = batch.append_column("cell", pa.array(cell.astype(np.int32)))
        return out.filter(mask)

    pruned = ds.map_batches(assign_and_filter, batch_format="pyarrow")
    q_ref = ray.put(q)
    partials = pruned.map_batches(
        _BruteTopK(q_ref, k, vec_col, id_col), batch_format="pyarrow"
    ).to_pandas()
    out = []
    for qi, grp in partials.groupby("query_idx"):
        # a query may only use results from its probed cells — already
        # guaranteed by pruning to the union; per-query cell filtering
        # is skipped (union-probe approximation, documented)
        grp = grp.sort_values(["cosine", id_col], ascending=[False, True]).head(k)
        out.append(grp)
    return pd.concat(out).reset_index(drop=True) if out else partials
