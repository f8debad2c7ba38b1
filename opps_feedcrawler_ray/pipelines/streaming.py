"""Stream-shaped operators over the ordered events log (SURVEY.md §2.9,
ray_guide.md "Streaming-shaped workloads" pattern).

Ray Data has no event-time windows; these operators treat ``events`` as
an ordered, user-partitioned log: ONE hash shuffle by ``user_id`` (the
partition key), then per-partition pandas over the ts-sorted group.
Ordering assumption (stated per the guide): all rows of a user are in
one group and sorted by (ts, event_id) before windowing — exactly the
per-key ordered-log contract a streaming engine would provide.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd


def _t(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


def asof_last_purchase(sf_dir: str) -> pd.DataFrame:
    """As-of join (backward, inclusive): for every event, the timestamp
    of the same user's most recent purchase at-or-before it.  Implemented
    as groupby(user) → sorted ``pd.merge_asof`` per group — the bucketed
    as-of join pattern; matches DuckDB ``ASOF LEFT JOIN`` semantics."""
    ev = rd.read_parquet(_t(sf_dir, "events"), columns=["event_id", "user_id", "ts", "event_type"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"]).reset_index(drop=True)
        marks = g.loc[g["event_type"] == "purchase", ["user_id", "ts"]].copy()
        marks = marks.rename(columns={"ts": "last_purchase_ts"})
        out = pd.merge_asof(
            g[["event_id", "user_id", "ts"]],
            marks,
            left_on="ts",
            right_on="last_purchase_ts",
            by="user_id",
            direction="backward",
            allow_exact_matches=True,
        )
        return out[["event_id", "last_purchase_ts"]]

    return ev.groupby("user_id").map_groups(per_user, batch_format="pandas").to_pandas()


def sessionize(sf_dir: str, gap_minutes: int = 30) -> pd.DataFrame:
    """Gap-based sessionization: a new session starts when a user's
    inter-event gap exceeds ``gap_minutes``.  Returns per-user session
    and event counts (tumbling/session-window aggregate)."""
    ev = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts", "event_id"])
    gap = pd.Timedelta(minutes=gap_minutes)

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        new_s = (g["ts"].diff().isna() | (g["ts"].diff() > gap)).sum()
        return pd.DataFrame(
            {"user_id": [g["user_id"].iloc[0]],
             "n_sessions": [np.int64(new_s)],
             "n_events": [np.int64(len(g))]}
        )

    return ev.groupby("user_id").map_groups(per_user, batch_format="pandas").to_pandas()


def sessionize_salted(sf_dir: str, gap_minutes: int = 30) -> pd.DataFrame:
    """Mega-user-safe sessionize (the de-skew path the per-user
    ``map_groups`` family lacked in round 1): partition each user's log by
    DAY — no single group ever exceeds one user-day — count sessions
    locally, then merge across day boundaries in a second tiny pass.

    Exactness: a partition's first event always opens a local session;
    globally it only does so if the gap from the previous partition's
    last event exceeds the threshold — so
    ``total = Σ local_sessions − #(boundaries with gap ≤ threshold)``.
    Output is identical to :func:`sessionize` (same DuckDB oracle)."""
    ev = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts", "event_id"])
    gap = pd.Timedelta(minutes=gap_minutes)

    def add_keys(batch: pd.DataFrame) -> pd.DataFrame:
        batch["day"] = batch["ts"].dt.floor("D")
        # coarse shuffle key: equal (user, day) → equal bucket; the
        # per-(user, day) grouping then runs pandas-side (C speed) —
        # one Ray group per cell would mean 100k+ tiny groups
        batch["bb"] = (
            batch["user_id"].to_numpy() * 1000003 + batch["day"].astype("int64")
        ) % 256
        return batch

    def chunks_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        out = []
        for (uid, day), cell in g.groupby(["user_id", "day"], sort=False):
            d = cell["ts"].diff()
            out.append(
                (uid, day, np.int64((d.isna() | (d > gap)).sum()),
                 np.int64(len(cell)), cell["ts"].iloc[0], cell["ts"].iloc[-1])
            )
        return pd.DataFrame(
            out, columns=["user_id", "day", "n_local", "n_events", "first_ts", "last_ts"]
        )

    def add_user_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        batch["ub"] = batch["user_id"] % 256
        return batch

    def merge_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "day"])
        out = []
        for uid, u in g.groupby("user_id", sort=False):
            merges = int((u["first_ts"] - u["last_ts"].shift(1) <= gap).sum())
            out.append(
                (uid, np.int64(u["n_local"].sum() - merges), np.int64(u["n_events"].sum()))
            )
        return pd.DataFrame(out, columns=["user_id", "n_sessions", "n_events"])

    return (
        ev.map_batches(add_keys, batch_format="pandas")
        .groupby("bb")
        .map_groups(chunks_in_bucket, batch_format="pandas")
        .map_batches(add_user_bucket, batch_format="pandas")
        .groupby("ub")
        .map_groups(merge_in_bucket, batch_format="pandas")
        .to_pandas()[["user_id", "n_sessions", "n_events"]]
    )


def top_spender_events(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """Semi join via broadcast key set (J-pattern, ray_guide.md): events
    of the k users with the highest total purchase value.  The top-k set
    is computed with a small grouped aggregate, broadcast once with
    ray.put, and applied as a vectorized membership filter per batch."""
    ev = rd.read_parquet(_t(sf_dir, "events"), columns=["event_id", "user_id", "event_type", "value"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch[batch["event_type"] == "purchase"].copy()
        b["value_e4"] = np.round(b["value"] * 10000).astype("int64")
        return b.groupby("user_id", as_index=False).agg(value_e4=("value_e4", "sum"))

    totals = (
        ev.map_batches(partial, batch_format="pandas")
        .groupby("user_id")
        .sum("value_e4")
        .to_pandas()
        .rename(columns={"sum(value_e4)": "value_e4"})
    )
    top = totals.sort_values(["value_e4", "user_id"], ascending=[False, True]).head(k)
    keyset_ref = ray.put(np.sort(top["user_id"].to_numpy().astype("int64")))

    def semi(batch: pa.Table) -> pa.Table:
        keys = ray.get(keyset_ref)
        users = batch["user_id"].to_numpy(zero_copy_only=False)
        mask = pa.array(np.isin(users, keys))
        return batch.select(["event_id", "user_id"]).filter(mask)

    return ev.map_batches(semi, batch_format="pyarrow").to_pandas()


def revenue_by_nation(sf_dir: str) -> pd.DataFrame:
    """Chained joins: orders ⋈ customer (broadcast) ⋈ nation (broadcast)
    → per-nation order counts and revenue (integer-scaled)."""
    from ..functions.joins import broadcast_join

    orders = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"])
    cust = pd.read_parquet(_t(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"]).rename(
        columns={"c_custkey": "o_custkey"}
    )
    nation = pd.read_parquet(_t(sf_dir, "nation"), columns=["n_nationkey", "n_name"]).rename(
        columns={"n_nationkey": "c_nationkey"}
    )
    j = broadcast_join(orders, cust, on="o_custkey")
    j = broadcast_join(j, nation, on="c_nationkey")

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch["revenue_e2"] = np.round(batch["o_totalprice"] * 100).astype("int64")
        return batch.groupby("n_name", as_index=False).agg(
            n_orders=("revenue_e2", "size"), revenue_e2=("revenue_e2", "sum")
        )

    out = (
        j.map_batches(partial, batch_format="pandas")
        .groupby("n_name")
        .sum(["n_orders", "revenue_e2"])
        .to_pandas()
        .rename(columns={"sum(n_orders)": "n_orders", "sum(revenue_e2)": "revenue_e2"})
    )
    return out[["n_name", "n_orders", "revenue_e2"]]
