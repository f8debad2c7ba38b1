"""Distributed join strategies (SURVEY.md §2.4).

Two explicit strategies, chosen by the caller (the planner is the
programmer here — partitioning decisions are visible, per the north
rule's "partitioning / shuffle / skew handled explicitly"):

* :func:`broadcast_join` — small side materialized ONCE into the object
  store via ``ray.put`` and read once per task (actor-cached), then a
  vectorized pandas merge per batch.  No shuffle.  Use when one side
  fits in a worker's heap (dimension tables, robots sets, blocklists).

* :func:`shuffle_join` — explicit partitioned hash join: both sides get
  a ``__bucket = url-style hash(key) % B`` column, are unioned with a
  side tag, hash-shuffled ONCE by bucket, and joined bucket-locally
  inside ``map_groups``.  This is the portable co-shuffle pattern (Ray
  Data has no two-sided ``cogroup``); B controls parallelism and skew
  granularity.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd


def _key_hash(df: pd.DataFrame, on: list[str]) -> np.ndarray:
    """Deterministic uint64 hash of the key columns (vectorized)."""
    h = np.zeros(len(df), dtype=np.uint64)
    for c in on:
        col = pd.util.hash_array(df[c].to_numpy(), hash_key="0123456789123456")
        h = h * np.uint64(0x9E3779B97F4A7C15) + col.astype(np.uint64)
    return h


class _BroadcastJoiner:
    def __init__(self, small_ref, on, how, suffix) -> None:
        self.small_ref = small_ref
        self.on = on
        self.how = how
        self.suffix = suffix
        self._small: pd.DataFrame | None = None

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if self._small is None:
            self._small = ray.get(self.small_ref)  # once per actor, zero re-ship
        out = batch.merge(self._small, on=self.on, how=self.how, suffixes=("", self.suffix))
        return out


def broadcast_join(
    big: rd.Dataset,
    small: rd.Dataset | pd.DataFrame,
    on: str | list[str],
    how: str = "inner",
    concurrency: int = 4,
) -> rd.Dataset:
    """big ⋈ small with the small side broadcast (no shuffle).

    The small side is fully materialized — caller asserts it is small
    (≲ a few hundred MB).  Stateful actor pool caches the broadcast.
    """
    on = [on] if isinstance(on, str) else list(on)
    if isinstance(small, rd.Dataset):
        small = small.to_pandas()
    small_ref = ray.put(small)
    return big.map_batches(
        _BroadcastJoiner(small_ref, on, how, "_r"),
        batch_format="pandas",
        concurrency=concurrency,
    )


def shuffle_join(
    left: rd.Dataset,
    right: rd.Dataset,
    on: str | list[str],
    how: str = "inner",
    num_buckets: int = 16,
) -> rd.Dataset:
    """Explicit partitioned hash join of two large datasets.

    One all-to-all exchange total: tag each side, bucket by key hash,
    union, groupby(bucket), pandas merge per bucket.  Skewed keys can be
    salted by raising ``num_buckets``; the bucket function is
    key-deterministic so co-partitioning is exact.
    """
    on = [on] if isinstance(on, str) else list(on)
    nb = num_buckets
    left_cols = left.schema().names
    right_cols = right.schema().names
    all_cols = left_cols + [c for c in right_cols if c not in left_cols]

    def tag(side: int, my_cols: list[str]):
        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            batch = batch.copy()
            batch["__side"] = np.int8(side)
            batch["__bucket"] = (_key_hash(batch, on) % np.uint64(nb)).astype(np.int32)
            for c in all_cols:  # pad to the union schema so Dataset.union types align
                if c not in my_cols:
                    batch[c] = None
            return batch[all_cols + ["__side", "__bucket"]]

        return fn

    lt = left.map_batches(tag(0, left_cols), batch_format="pandas")
    rt = right.map_batches(tag(1, right_cols), batch_format="pandas")
    both = lt.union(rt)

    def join_bucket(group: pd.DataFrame) -> pd.DataFrame:
        l = group.loc[group["__side"] == 0, left_cols]
        r = group.loc[group["__side"] == 1, right_cols]
        return l.merge(r, on=on, how=how, suffixes=("", "_r"))

    return both.groupby("__bucket").map_groups(join_bucket, batch_format="pandas")


def builtin_join(
    left: rd.Dataset,
    right: rd.Dataset,
    on: str | list[str],
    how: str = "inner",
    num_partitions: int = 16,
) -> rd.Dataset:
    """The THIRD strategy (SURVEY §2.4 J1 stated plan): Ray Data's native
    hash-shuffle ``Dataset.join`` (ray 2.49+).  Kept alongside the two
    custom strategies so users can pick the engine-managed exchange;
    byte-equivalence with :func:`shuffle_join` is pinned in tests."""
    on = [on] if isinstance(on, str) else list(on)
    how_map = {"inner": "inner", "left": "left_outer", "right": "right_outer",
               "outer": "full_outer"}
    return left.join(
        right,
        join_type=how_map.get(how, how),
        num_partitions=num_partitions,
        on=tuple(on),
    )


class _HotSideJoiner:
    def __init__(self, hot_keys_ref, hot_small_ref, on, schema) -> None:
        self.hot_keys_ref = hot_keys_ref
        self.hot_small_ref = hot_small_ref
        self.on = on
        self.schema = schema
        self._state = None

    def __call__(self, batch: pd.DataFrame) -> pa.Table:
        if self._state is None:
            self._state = (ray.get(self.hot_keys_ref), ray.get(self.hot_small_ref))
        hot_keys, hot_small = self._state
        sub = batch[batch[self.on].isin(hot_keys)]
        out = sub.merge(hot_small, on=self.on, how="inner")
        # explicit schema: a batch with zero hot rows must not infer
        # null-typed object columns and break downstream union/unify
        return pa.Table.from_pandas(
            out[[f.name for f in self.schema]], preserve_index=False, schema=self.schema
        )


def skew_split_join(
    big: rd.Dataset,
    small: rd.Dataset | pd.DataFrame,
    on: str,
    hot_threshold: int = 100_000,
    num_buckets: int = 16,
) -> rd.Dataset:
    """SKEW-SPLIT inner hash join — the canonical hot-key technique.

    1. Exact big-side key histogram: per-batch partial counts → ONE
       exchange bounded by |distinct keys|.  (At unbounded cardinality
       swap in the Misra-Gries sketch from ``functions/sketch.py`` —
       only the HOT set, tiny by definition, is ever needed.)
    2. Keys with count > ``hot_threshold`` join MAP-SIDE: their dim rows
       broadcast once via ``ray.put`` — a mega-key's rows never funnel
       through a single shuffle partition.
    3. Cold keys take the normal co-shuffle (:func:`shuffle_join`).
    4. Result = union of the two halves (same column set, inner only —
       outer variants would need dim-side orphan accounting across the
       split).

    The big side streams three times (histogram + hot pass + cold pass):
    at 100 TB three pruned streaming reads beat shipping a hot key
    through one reducer (and the histogram pass reads the key column
    only).  Column names must not collide outside the key."""
    if isinstance(small, rd.Dataset):
        small = small.to_pandas()
    big_schema = big.schema()
    overlap = (set(big_schema.names) & set(small.columns)) - {on}
    if overlap:
        raise ValueError(f"non-key column collision: {overlap}")

    # coarse-bucket aggregate (the repo's fast path for keyed combines):
    # a raw groupby(key) pays per-distinct-key group overhead in the sort
    # aggregate; equal keys share a bucket, so the per-key sum vectorizes
    # inside ≤nb pandas tasks instead
    _hschema = pa.schema(
        [(on, dict(zip(big_schema.names, big_schema.types))[on]),
         ("__n", pa.int64()), ("__b", pa.int64())]
    )

    def key_partial(batch: pd.DataFrame) -> pa.Table:
        g = batch.groupby([on], as_index=False).agg(__n=(on, "size"))
        g["__b"] = (_key_hash(g, [on]) % np.uint64(num_buckets)).astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False, schema=_hschema)

    def key_sum(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(on, as_index=False)["__n"].sum()

    hist = (
        big.map_batches(key_partial, batch_format="pandas")
        .groupby("__b")
        .map_groups(key_sum, batch_format="pandas")
        .to_pandas()
    )
    hot_vals = set(hist.loc[hist["__n"] > hot_threshold, on].tolist())
    hot_small = small[small[on].isin(hot_vals)]
    cold_small = small[~small[on].isin(hot_vals)]

    small_schema = pa.Schema.from_pandas(small)
    out_fields = [pa.field(n, t) for n, t in zip(big_schema.names, big_schema.types)]
    out_fields += [small_schema.field(c) for c in small.columns if c != on]
    out_schema = pa.schema(out_fields)

    halves = []
    hot_ref = ray.put(hot_vals)  # ONE object-store copy, shared by both stages
    if hot_vals:
        halves.append(
            big.map_batches(
                _HotSideJoiner(hot_ref, ray.put(hot_small), on, out_schema),
                batch_format="pandas",
            )
        )
    if len(cold_small):

        class _ColdFilter:
            def __init__(self) -> None:
                self._hot = None

            def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
                if self._hot is None:
                    self._hot = ray.get(hot_ref)
                return batch[~batch[on].isin(self._hot)]

        cold_big = big.map_batches(_ColdFilter(), batch_format="pandas")
        cold_joined = shuffle_join(
            cold_big, rd.from_pandas(cold_small), on, how="inner",
            num_buckets=num_buckets,
        ).map_batches(
            lambda b: pa.Table.from_pandas(
                b[[f.name for f in out_schema]], preserve_index=False,
                schema=out_schema,
            ),
            batch_format="pandas",
        )
        halves.append(cold_joined)
    if not halves:
        return rd.from_arrow(out_schema.empty_table())
    return halves[0] if len(halves) == 1 else halves[0].union(halves[1])


def sort_merge_join(
    left: rd.Dataset,
    right: rd.Dataset,
    on: str,
    n_ranges: int = 64,
    how: str = "inner",
    sample_every: int = 64,
) -> rd.Dataset:
    """RANGE-PARTITIONED SORT-MERGE join — the strategy the
    broadcast / hash-shuffle / bloom / skew-split family was missing:
    both sides are routed by ORDERED key ranges (so each partition's
    output is key-ordered — the property downstream merge/as-of
    consumers want for free), then joined partition-locally on sorted
    frames.

    The range boundaries come from a deterministic sample of the LEFT
    side's keys (every ``sample_every``-th key per batch after an
    in-batch sort — bounded O(rows/sample_every) driver rows, the same
    sample-sort recipe Ray's own sort uses); each side then crosses ONE
    exchange routed by ``searchsorted(boundaries, key)``.  Skewed key
    ranges split by widening n_ranges; a single mega-KEY still funnels
    to one partition — that is the skew_split_join's job, not this
    strategy's."""
    assert how == "inner", "sort_merge_join implements inner joins"

    def sample_keys(batch: pd.DataFrame) -> pd.DataFrame:
        k = np.sort(batch[on].to_numpy())
        return pd.DataFrame({on: k[::sample_every]})

    samp = np.sort(
        left.map_batches(sample_keys, batch_format="pandas")
        .to_pandas()[on].to_numpy()
    )
    if len(samp) == 0:
        bounds = np.array([], dtype="int64")
    else:
        qs = (np.arange(1, n_ranges) * len(samp)) // n_ranges
        bounds = np.unique(samp[qs])
    bounds_ref = ray.put(bounds)
    left_cols = left.schema().names
    right_cols = right.schema().names
    all_cols = left_cols + [c for c in right_cols if c not in left_cols]

    def route(side: int, my_cols: list[str]):
        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            b = ray.get(bounds_ref)
            out = batch.copy()
            out["__rng"] = np.searchsorted(
                b, out[on].to_numpy(), side="right"
            ).astype("int64")
            out["__side"] = np.int8(side)
            for c in all_cols:  # pad to the union schema (as shuffle_join)
                if c not in my_cols:
                    out[c] = None
            return out[all_cols + ["__side", "__rng"]]
        return fn

    def merge_range(g: pd.DataFrame) -> pd.DataFrame:
        a = (g.loc[g["__side"] == 0, left_cols]
             .sort_values(on, kind="mergesort"))
        b = (g.loc[g["__side"] == 1, right_cols]
             .sort_values(on, kind="mergesort"))
        return a.merge(b, on=on, how="inner", suffixes=("", "_r"), sort=True)

    both = left.map_batches(route(0, left_cols), batch_format="pandas").union(
        right.map_batches(route(1, right_cols), batch_format="pandas")
    )
    return both.groupby("__rng").map_groups(merge_range, batch_format="pandas")
