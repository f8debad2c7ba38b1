"""Bucketed distributed label exchange — the out-of-driver iterative
graph core (VERDICT r4 task #1).

Every iterative doc-graph op previously kept a ``{node: label}`` dict on
the driver and re-broadcast it via ``ray.put`` each iteration.  That is
fine while the label table fits the driver heap (hosts; sandbox docs)
and it remains available as the ``exchange="broadcast"`` twin — but at
10^10 documents the label table itself is the thing that must be
distributed.  This module is the documented fallback, now code:

  * Nodes are hash-partitioned into ``n_buckets`` buckets
    (``node % n_buckets``) and co-partitioned with their edges: edges
    are exchanged ONCE (one groupby shuffle, per-bucket Parquet spill
    under ``work_dir``) keyed on the traversal-source endpoint, then
    pinned in the object store as one ObjectRef per bucket — the return
    ref of a remote read task, so edge bytes never touch the driver.
  * Per-bucket label/state tables live in the object store the same
    way.  The driver holds ONLY the B refs plus per-bucket change
    counters (ints) — never a node-sized object.
  * One iteration = B ``propose`` tasks (each joins its bucket's edges
    with its bucket's labels and emits dst-bucket-partitioned
    proposals, min/any-combined per task) + B ``merge`` tasks (each
    folds the proposals addressed to its bucket into its label table
    and reports how many rows changed).  Proposals flow task→task as
    ObjectRefs; the driver ``ray.get``s only the integer change counts.
  * Fixpoint = a full iteration with zero changes in every bucket.

Scale shape: per iteration the exchange moves O(|frontier|) proposal
rows through the object store in B×B slices; edges never move after the
initial partition.  B is a knob — at 10^10 nodes pick B so one bucket's
label table fits a worker heap (the driver never holds one either way).
The B² proposal refs per iteration are bytes on the driver, not rows.

Kernel taxonomy: ``webpipe._relax_bucketed`` is the canonical
frontier-only min-label relaxation (BFS/SSSP); this module's
``min_label_components`` and SCC's forward sweep are deliberate
specializations of the same propose/merge shape (different state
columns — component labels vs colors + phase flags) rather than
parameterizations, because their merge-side constraints (active sets,
class membership) don't fit a weight_fn hook.  A change to the shared
shape (frontier filter, searchsorted fold) should be mirrored across
the three sites.
"""

from __future__ import annotations

import os
from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

__all__ = [
    "expand_undirected",
    "node_table",
    "partition_by_key",
    "init_state_refs",
    "bucketed_fixpoint",
    "collect_state",
    "write_state_parquet",
    "map_state",
    "min_label_components",
]


def expand_undirected(ds: "rd.Dataset") -> "rd.Dataset":
    """Undirected (a, b) edge Dataset → directed contribution copies
    (both directions) — the shared first stage of every bucketed
    undirected-graph op (Katz, HyperBall, Luby MIS, components)."""

    def expand(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"a": pa.array(np.concatenate([a, b]), pa.int64()),
                         "b": pa.array(np.concatenate([b, a]), pa.int64())})

    return ds.map_batches(expand, batch_format="pyarrow")


def node_table(ds: "rd.Dataset", cols: tuple = ("a",)) -> "rd.Dataset":
    """Per-batch-unique node Dataset drawn from ``cols`` of an edge
    Dataset (global dedup happens in the partition spill)."""

    def node_batch(t: pa.Table) -> pa.Table:
        arr = np.unique(np.concatenate(
            [t[c].to_numpy(zero_copy_only=False) for c in cols]
        )).astype(np.int64)
        return pa.table({"node": pa.array(arr, pa.int64())})

    return ds.map_batches(node_batch, batch_format="pyarrow")


def _driver_get(refs):
    """The ONLY ``ray.get`` the fixpoint driver loop performs — and a
    structural proof obligation: every payload must be a scalar/tuple of
    scalars (change counts, settle infos), never a node-sized table.
    Asserted always-on (zero cost at these sizes) so the 'driver holds
    refs + counters only' claim is enforced by code, not comment."""
    vals = ray.get(refs)
    for v in vals:
        assert np.isscalar(v) or (
            isinstance(v, tuple) and all(np.isscalar(x) for x in v)
        ), f"driver-side get of non-scalar payload: {type(v)}"
    return vals


@ray.remote
def _read_bucket_parquet(path: str, columns: list[str]) -> pd.DataFrame:
    """Remote per-bucket Parquet read; the task's return ref IS the
    pinned per-bucket table (bytes live in the object store, not the
    driver).  A missing file is an ERROR, never an empty table —
    ``partition_by_key`` writes every bucket (empty ones included), so
    absence means the spill dir was wiped out from under this run
    (e.g. a concurrent same-dir call) and silently returning empty
    would corrupt results instead of failing loudly."""
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"graphcore bucket spill missing: {path} — the partition "
            "directory was removed mid-run (concurrent partition_by_key "
            "on the same out_dir?)"
        )
    df = pd.read_parquet(path, columns=columns)
    return df.reset_index(drop=True)


def partition_by_key(
    ds: "rd.Dataset",
    key_col: str,
    n_buckets: int,
    out_dir: str,
    columns: list[str],
    spill_transform: Callable[[pd.DataFrame], pd.DataFrame] | None = None,
) -> list["ray.ObjectRef"]:
    """One groupby exchange: bucket ``ds`` rows by ``key_col %
    n_buckets``, spill one Parquet file per bucket under ``out_dir``
    (wiped first — stale buckets from a previous corpus must not
    survive), and return B ObjectRefs to the per-bucket tables (loaded
    by remote tasks — no driver materialization of row data).
    ``spill_transform`` (e.g. ``drop_duplicates``) runs per bucket
    inside the exchange task before the spill."""
    import shutil

    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    gb_field = pa.field("__gb", pa.int64())

    def tag(batch: pa.Table) -> pa.Table:
        key = batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.append_column(gb_field, pa.array(key % n_buckets, pa.int64()))

    def spill(g: pd.DataFrame) -> pd.DataFrame:
        b = int(g["__gb"].iloc[0])
        part = g[columns].reset_index(drop=True)
        if spill_transform is not None:
            part = spill_transform(part).reset_index(drop=True)
        part.to_parquet(os.path.join(out_dir, f"b{b}.parquet"))
        return pd.DataFrame({"b": [b]})

    (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("__gb")
        .map_groups(spill, batch_format="pandas")
        .materialize()
    )
    # every bucket gets a file — empty buckets included — so a missing
    # file downstream is unambiguously a wiped directory, not emptiness
    empty = pd.DataFrame({c: pd.Series([], dtype="int64") for c in columns})
    for b in range(n_buckets):
        path = os.path.join(out_dir, f"b{b}.parquet")
        if not os.path.exists(path):
            empty.to_parquet(path)
    return [
        _read_bucket_parquet.remote(os.path.join(out_dir, f"b{b}.parquet"), columns)
        for b in range(n_buckets)
    ]


@ray.remote
def _init_state(maker: Callable[[int], pd.DataFrame], b: int) -> pd.DataFrame:
    return maker(b)


def init_state_refs(
    maker: Callable[[int], pd.DataFrame], n_buckets: int
) -> list["ray.ObjectRef"]:
    """Per-bucket initial state tables, built inside remote tasks so the
    driver never holds one (``maker(b)`` must return only bucket ``b``'s
    rows — e.g. the BFS source row in its home bucket, empty
    elsewhere)."""
    return [_init_state.remote(maker, b) for b in range(n_buckets)]


@ray.remote
def _propose_task(
    propose_fn: Callable, n_buckets: int, edges_df: pd.DataFrame, state_df: pd.DataFrame
):
    """Run the per-bucket propose step and split its output by
    destination bucket (``node % n_buckets``).  Returns a B-tuple of
    DataFrames (``num_returns=n_buckets`` at the call site), each
    shipped directly to the one merge task that needs it."""
    props = propose_fn(edges_df, state_df)
    if props is None or not len(props):
        empty = None
        out = [empty] * n_buckets
    else:
        dstb = props["node"].to_numpy().astype(np.int64) % n_buckets
        order = np.argsort(dstb, kind="stable")
        props = props.iloc[order].reset_index(drop=True)
        dstb = dstb[order]
        bounds = np.searchsorted(dstb, np.arange(n_buckets + 1))
        out = [
            props.iloc[bounds[b]: bounds[b + 1]] if bounds[b] < bounds[b + 1] else None
            for b in range(n_buckets)
        ]
    return tuple(out) if n_buckets > 1 else out[0]


@ray.remote(num_returns=2)
def _merge_task(merge_fn: Callable, state_df: pd.DataFrame, *prop_parts):
    """Fold every proposal slice addressed to this bucket into its state
    table.  Returns ``(new_state_df, n_changed)`` — the driver gets only
    the int — or ``(new_state_df, (n_changed, info))`` when the merge
    also emits a scalar per-bucket info (e.g. a per-round aggregate)."""
    parts = [p for p in prop_parts if p is not None and len(p)]
    props = (
        pd.concat(parts, ignore_index=True)
        if parts
        else pd.DataFrame()
    )
    res = merge_fn(state_df, props)
    if len(res) == 3:
        new_state, n_changed, info = res
        return new_state, (int(n_changed), info)
    new_state, n_changed = res
    return new_state, int(n_changed)


def bucketed_fixpoint(
    edge_refs: list["ray.ObjectRef"],
    state_refs: list["ray.ObjectRef"],
    propose_fn: Callable[[pd.DataFrame, pd.DataFrame], pd.DataFrame],
    merge_fn: Callable[[pd.DataFrame, pd.DataFrame], tuple],
    max_iters: int = 64,
    collect_infos: bool = False,
) -> tuple:
    """Iterate propose→merge rounds until no bucket changes (or
    ``max_iters``).  ``propose_fn(edges_df, state_df)`` returns a
    DataFrame with a ``node`` column (destination node) plus payload;
    ``merge_fn(state_df, props_df)`` returns ``(new_state, n_changed)``
    or ``(new_state, n_changed, info_scalar)``.  Both run inside Ray
    tasks over per-bucket tables; the driver touches refs and scalars
    only.  Returns ``(final_state_refs, iters_run)`` — or, with
    ``collect_infos=True``, ``(final_state_refs, iters_run, infos)``
    where ``infos[t]`` is the per-bucket list of ``(n_changed, info)``
    tuples for iteration t."""
    n_buckets = len(edge_refs)
    assert len(state_refs) == n_buckets
    iters = 0
    infos: list[list] = []
    for _ in range(max_iters):
        iters += 1
        prop = [
            _propose_task.options(num_returns=n_buckets).remote(
                propose_fn, n_buckets, edge_refs[b], state_refs[b]
            )
            for b in range(n_buckets)
        ]
        if n_buckets == 1:
            prop = [[prop[0]]]
        new_refs: list = []
        changed_refs: list = []
        for b in range(n_buckets):
            nl, ch = _merge_task.remote(
                merge_fn, state_refs[b], *[prop[s][b] for s in range(n_buckets)]
            )
            new_refs.append(nl)
            changed_refs.append(ch)
        state_refs = new_refs
        vals = _driver_get(changed_refs)
        if collect_infos:
            infos.append(
                [v if isinstance(v, tuple) else (v, None) for v in vals]
            )
        total = sum(v[0] if isinstance(v, tuple) else v for v in vals)
        if total == 0:
            break
    if collect_infos:
        return state_refs, iters, infos
    return state_refs, iters


def collect_state(state_refs: list["ray.ObjectRef"]) -> pd.DataFrame:
    """Final result collect — the ONE driver materialization, of the
    op's OUTPUT (the driver contract returns a DataFrame).  At 100 TB
    replace with a per-bucket ``write_parquet`` and return the paths;
    nothing in the iteration above requires this step."""
    parts = ray.get(state_refs)
    parts = [p for p in parts if len(p)]
    if not parts:
        return pd.DataFrame()
    return pd.concat(parts, ignore_index=True)


def min_label_components(
    edges_ds: "rd.Dataset",
    gc_dir: str,
    n_buckets: int = 8,
    max_iters: int = 10_000,
) -> pd.DataFrame:
    """CONNECTED COMPONENTS by distributed min-label propagation over an
    UNDIRECTED edge Dataset (columns ``a``, ``b``) — the out-of-driver
    replacement for a driver-side union-find that several docstrings
    promised and round 5 makes code.  Labels start as node ids and
    min-propagate through the bucketed exchange (frontier-only, like
    BFS) until fixpoint; the final label of every node is its
    component's minimum member id (the same id rule the union-find
    paths use), reached in ≤ eccentricity(min-node) rounds.

    Returns a DataFrame (node, comp) via the final collect (component
    labeling is the OUTPUT; at 100 TB swap the collect for
    ``write_state_parquet`` exactly as the BFS proof test does)."""
    directed = expand_undirected(edges_ds)
    edge_refs = partition_by_key(
        directed, "a", n_buckets, os.path.join(gc_dir, "edges"), ["a", "b"]
    )
    node_refs = partition_by_key(
        node_table(directed), "node", n_buckets,
        os.path.join(gc_dir, "nodes"), ["node"],
        spill_transform=lambda d: d.drop_duplicates(),
    )

    def init_fn(nodes_df: pd.DataFrame):
        nd = np.sort(nodes_df["node"].to_numpy(dtype=np.int64))
        st = pd.DataFrame({"node": nd, "lab": nd,
                           "fresh": np.ones(len(nd), dtype=np.int64)})
        return st, 0

    state_refs, _ = map_state(init_fn, node_refs)

    def propose(edges_df: pd.DataFrame, st: pd.DataFrame):
        if not len(edges_df) or not len(st):
            return None
        frontier = st[st["fresh"] == 1]
        if not len(frontier):
            return None
        m = edges_df.merge(frontier[["node", "lab"]], left_on="a",
                           right_on="node")
        if not len(m):
            return None
        return (
            pd.DataFrame({"node": m["b"].to_numpy(dtype="int64"),
                          "nd": m["lab"].to_numpy(dtype="int64")})
            .groupby("node", as_index=False)["nd"]
            .min()
        )

    def merge(st: pd.DataFrame, props: pd.DataFrame):
        st = st.assign(fresh=0)
        if not len(props) or not len(st):
            return st, 0
        p = props.groupby("node", as_index=False)["nd"].min()
        sn = st["node"].to_numpy()
        lab = st["lab"].to_numpy().copy()
        fresh = st["fresh"].to_numpy().copy()
        pos = np.clip(np.searchsorted(sn, p["node"].to_numpy(dtype=np.int64)),
                      0, max(len(sn) - 1, 0))
        nd = p["nd"].to_numpy(dtype=np.int64)
        better = (sn[pos] == p["node"].to_numpy(dtype=np.int64)) & (nd < lab[pos])
        n_changed = int(better.sum())
        if n_changed:
            lab[pos[better]] = nd[better]
            fresh[pos[better]] = 1
            st = st.assign(lab=lab, fresh=fresh)
        return st, n_changed

    state_refs, _ = bucketed_fixpoint(
        edge_refs, state_refs, propose, merge, max_iters=max_iters
    )
    out = collect_state(state_refs)
    if not len(out):
        return pd.DataFrame({"node": pd.Series([], dtype="int64"),
                             "comp": pd.Series([], dtype="int64")})
    return (
        out[["node", "lab"]].rename(columns={"lab": "comp"})
        .sort_values("node").reset_index(drop=True)
        .astype({"node": "int64", "comp": "int64"})
    )


@ray.remote
def _write_bucket_parquet(state_df: pd.DataFrame, path: str) -> int:
    state_df.reset_index(drop=True).to_parquet(path)
    return int(len(state_df))


def write_state_parquet(
    state_refs: list["ray.ObjectRef"], out_dir: str
) -> list[int]:
    """The 100-TB finalizer: each bucket writes its own Parquet file
    inside a task; the driver receives only per-bucket row counts.
    Resumable output shape (one file per bucket) — the alternative to
    ``collect_state`` when the result itself is node-sized."""
    import shutil

    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    refs = [
        _write_bucket_parquet.remote(state_refs[b], os.path.join(out_dir, f"b{b}.parquet"))
        for b in range(len(state_refs))
    ]
    return _driver_get(refs)


@ray.remote
def _state_update_task(fn: Callable, state_df: pd.DataFrame, *extra):
    """Apply ``fn(state_df, *extra_dfs)`` in a task; returns
    ``(new_state, info)`` where ``info`` is a small picklable summary
    (counts).  Used by multi-phase algorithms (SCC) to transition
    per-bucket state without driver round-trips."""
    return fn(state_df, *[e for e in extra])


def map_state(
    fn: Callable, state_refs: list["ray.ObjectRef"], *extra_refs_lists
) -> tuple[list["ray.ObjectRef"], list]:
    """Per-bucket state transition: ``fn(state_b, *extras_b) ->
    (new_state_b, info_b)``.  Returns ``(new_state_refs,
    [info_b, ...])`` — infos are ray.get'd (must be small: ints/tuples),
    states stay in the object store."""
    pairs = [
        _state_update_task.options(num_returns=2).remote(
            fn, state_refs[b], *[lst[b] for lst in extra_refs_lists]
        )
        for b in range(len(state_refs))
    ]
    new_refs = [p[0] for p in pairs]
    infos = _driver_get([p[1] for p in pairs])
    return new_refs, infos
