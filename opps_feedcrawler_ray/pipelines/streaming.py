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
    nb = _salt_buckets(ev)

    def add_keys(batch: pd.DataFrame) -> pd.DataFrame:
        batch["day"] = batch["ts"].dt.floor("D")
        # coarse shuffle key: equal (user, day) → equal bucket; the
        # per-(user, day) grouping then runs pandas-side (C speed) —
        # one Ray group per cell would mean 100k+ tiny groups
        batch["bb"] = (
            batch["user_id"].to_numpy() * 1000003 + batch["day"].astype("int64")
        ) % nb
        return batch

    def chunks_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized across all (user, day) cells at once: grouped diff →
        # session-open flags → one grouped agg (no per-cell Python loop)
        g = g.sort_values(["user_id", "ts", "event_id"])
        d = g.groupby(["user_id", "day"], sort=False)["ts"].diff()
        return (
            g.assign(news=(d.isna() | (d > gap)).astype("int64"))
            .groupby(["user_id", "day"], as_index=False, sort=False)
            .agg(n_local=("news", "sum"), n_events=("news", "size"),
                 first_ts=("ts", "first"), last_ts=("ts", "last"))
        )

    def add_user_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        batch["ub"] = batch["user_id"] % nb
        return batch

    def merge_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "day"])
        prev_last = g.groupby("user_id", sort=False)["last_ts"].shift(1)
        merged = (
            g.assign(m=((g["first_ts"] - prev_last) <= gap).astype("int64"))
            .groupby("user_id", as_index=False, sort=False)
            .agg(n_local=("n_local", "sum"), m=("m", "sum"),
                 n_events=("n_events", "sum"))
        )
        merged["n_sessions"] = (merged["n_local"] - merged["m"]).astype("int64")
        return merged[["user_id", "n_sessions", "n_events"]]

    return (
        ev.map_batches(add_keys, batch_format="pandas")
        .groupby("bb")
        .map_groups(chunks_in_bucket, batch_format="pandas")
        .map_batches(add_user_bucket, batch_format="pandas")
        .groupby("ub")
        .map_groups(merge_in_bucket, batch_format="pandas")
        .to_pandas()[["user_id", "n_sessions", "n_events"]]
    )


# ------------------------------------------------- salted per-user ops
#
# The sessionize_salted de-skew recipe, generalized to the whole
# per-user map_groups family (round 3): partition each user's ordered
# log by DAY so no group ever exceeds one user-day, compute the window
# locally per (user, day) cell, and make the result exact by routing a
# small per-(user, day) BOUNDARY row (carry-in state from the user's
# earlier days) into the same coarse shuffle via Dataset.union.  The
# boundary table is produced distributed (per-batch partial aggregate →
# one small user-bucketed shuffle), never broadcast and never
# driver-materialized, so a mega-user can no longer stall a round.

_US_PER_DAY = 86_400_000_000


def _salt_buckets(ev: rd.Dataset) -> int:
    from .dedup import coarse_buckets

    return coarse_buckets(ev.count())


def _union_schema_rows(
    user_id: np.ndarray, day: np.ndarray, ts_us: np.ndarray,
    event_id: np.ndarray, etype: np.ndarray, val: np.ndarray, is_b: int,
) -> pd.DataFrame:
    n = len(user_id)
    return pd.DataFrame(
        {
            "user_id": pd.Series(user_id, dtype="int64"),
            "day": pd.Series(day, dtype="int64"),
            "ts_us": pd.Series(ts_us, dtype="int64"),
            "event_id": pd.Series(event_id, dtype="int64"),
            "etype": pd.Series(etype, dtype="int8"),
            "val": pd.Series(val, dtype="int64"),
            "is_b": pd.Series(np.full(n, is_b, dtype=np.int8), dtype="int8"),
        }
    )


def _events_union_rows(batch: pd.DataFrame, purchase_flag: bool) -> pd.DataFrame:
    ts_us = batch["ts"].astype("datetime64[us]").astype("int64").to_numpy()
    et = (
        (batch["event_type"].to_numpy() == "purchase").astype(np.int8)
        if purchase_flag
        else np.zeros(len(batch), dtype=np.int8)
    )
    return _union_schema_rows(
        batch["user_id"].to_numpy(), ts_us // _US_PER_DAY, ts_us,
        batch["event_id"].to_numpy(), et, np.zeros(len(batch), dtype=np.int64), 0,
    )


def _day_boundary_rows(
    ev: rd.Dataset, partial_fn, reducer: str, per_user_fn, nb: int
) -> rd.Dataset:
    """Distributed per-(user, day) boundary table: per-batch partial
    summaries (one row per user-day per batch) → ONE user-bucketed
    shuffle → per-user day-ordered scan emits carry-in rows in the
    union schema.  Size ≈ #user-days, a tiny fraction of events."""

    def add_ub(b: pd.DataFrame) -> pd.DataFrame:
        b["ub"] = b["user_id"] % nb
        return b

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        day_s = (
            g.groupby(["user_id", "day"], as_index=False, sort=True)
            .agg(s=("s", reducer))
        )
        outs = []
        for uid, u in day_s.groupby("user_id", sort=False):
            days, vals = per_user_fn(u["day"].to_numpy(), u["s"].to_numpy())
            if len(days):
                n = len(days)
                outs.append(_union_schema_rows(
                    np.full(n, uid, dtype=np.int64), days,
                    np.full(n, -1, dtype=np.int64), np.full(n, -1, dtype=np.int64),
                    np.zeros(n, dtype=np.int8), vals, 1,
                ))
        if not outs:
            return _union_schema_rows(*([np.array([], dtype=np.int64)] * 6), 1)
        return pd.concat(outs, ignore_index=True)

    return (
        ev.map_batches(partial_fn, batch_format="pandas")
        .map_batches(add_ub, batch_format="pandas")
        .groupby("ub")
        .map_groups(per_bucket, batch_format="pandas")
    )


def _run_salted_user_day(
    events_u: rd.Dataset, boundary: rd.Dataset, bucket_fn, empty_fn, nb: int
) -> pd.DataFrame:
    """ONE coarse (user, day)-keyed shuffle of the full event log plus
    the tiny boundary rows; per-task work is bounded by ~rows/nb, and
    each (user, day) cell sees at most one boundary row.

    ``bucket_fn`` receives the bucket's EVENT rows with their cell's
    boundary value merged in as a ``bval`` column (NaN when the cell has
    no carry-in) and must compute the window VECTORIZED across all cells
    at once (grouped cumcount/diff/cummax — pandas C kernels).  The
    earlier per-(user, day) Python loop with a per-cell callback cost
    ~150 µs × #cells per task (#cells ≈ rows, so effectively a per-row
    loop in the hot path); this form is ~5× faster at sf0.1 and
    row-count-independent in overhead."""

    def add_bb(b: pd.DataFrame) -> pd.DataFrame:
        b["bb"] = (b["user_id"].to_numpy() * 1000003 + b["day"].to_numpy()) % nb
        return b

    def in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        b = g[g["is_b"] == 1]
        e = g[g["is_b"] == 0]
        if not len(e):
            return empty_fn()
        e = e.merge(
            b[["user_id", "day", "val"]].rename(columns={"val": "bval"}),
            on=["user_id", "day"],
            how="left",
        )
        return bucket_fn(e)

    return (
        events_u.union(boundary)
        .map_batches(add_bb, batch_format="pandas")
        .groupby("bb")
        .map_groups(in_bucket, batch_format="pandas")
        .to_pandas()
    )


def user_event_seq_salted(sf_dir: str) -> pd.DataFrame:
    """Mega-user-safe per-user event sequence numbers: local ranks per
    (user, day) cell plus a carry-in OFFSET boundary row (cumulative
    count of the user's earlier days).  Output identical to
    ``analytics.user_event_seq`` (same DuckDB oracle)."""
    ev = rd.read_parquet(_t(sf_dir, "events"), columns=["event_id", "user_id", "ts"])
    nb = _salt_buckets(ev)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.assign(day=b["ts"].astype("datetime64[us]").astype("int64") // _US_PER_DAY)
        return b.groupby(["user_id", "day"], as_index=False).agg(s=("event_id", "size"))

    def offsets(days: np.ndarray, counts: np.ndarray):
        off = np.cumsum(counts)[:-1]
        return days[1:], off  # first day's offset is 0 → no boundary row

    def bucket(e: pd.DataFrame) -> pd.DataFrame:
        e = e.sort_values(["user_id", "day", "ts_us", "event_id"])
        base = e["bval"].fillna(0).to_numpy(dtype="int64")
        rank = e.groupby(["user_id", "day"], sort=False).cumcount().to_numpy()
        return pd.DataFrame(
            {"event_id": e["event_id"].to_numpy(),
             "user_id": e["user_id"].to_numpy(),
             "seq_in_user": (base + rank + 1).astype("int64")}
        )

    def empty() -> pd.DataFrame:
        return pd.DataFrame({"event_id": pd.Series([], dtype="int64"),
                             "user_id": pd.Series([], dtype="int64"),
                             "seq_in_user": pd.Series([], dtype="int64")})

    boundary = _day_boundary_rows(ev, partial, "sum", offsets, nb)
    events_u = ev.map_batches(
        lambda b: _events_union_rows(b, False), batch_format="pandas"
    )
    return _run_salted_user_day(events_u, boundary, bucket, empty, nb)


def events_lag_delta_salted(sf_dir: str) -> pd.DataFrame:
    """Mega-user-safe LAG delta: in-cell diffs, with each day's first
    event closed by a boundary row carrying the PREVIOUS day-with-events'
    last timestamp.  Output identical to ``analytics.events_lag_delta``."""
    ev = rd.read_parquet(_t(sf_dir, "events"), columns=["event_id", "user_id", "ts"])
    nb = _salt_buckets(ev)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.assign(
            ts_us=b["ts"].astype("datetime64[us]").astype("int64")
        ).assign(day=lambda d: d["ts_us"] // _US_PER_DAY)
        return b.groupby(["user_id", "day"], as_index=False).agg(s=("ts_us", "max"))

    def prev_last(days: np.ndarray, last_ts: np.ndarray):
        return days[1:], last_ts[:-1]

    def bucket(e: pd.DataFrame) -> pd.DataFrame:
        e = e.sort_values(["user_id", "day", "ts_us", "event_id"])
        us = e["ts_us"].to_numpy()
        d = e.groupby(["user_id", "day"], sort=False)["ts_us"].diff().to_numpy()
        first = np.isnan(d)
        bv = e["bval"].to_numpy(dtype="float64")  # NaN = no carry-in
        no_carry = np.isnan(bv)
        bvi = np.where(no_carry, 0, bv).astype("int64")
        delta = np.where(
            first, np.where(no_carry, np.int64(-1), us - bvi), np.nan_to_num(d)
        ).astype("int64")
        return pd.DataFrame(
            {"event_id": e["event_id"].to_numpy(),
             "user_id": e["user_id"].to_numpy(),
             "delta_us": delta}
        )

    def empty() -> pd.DataFrame:
        return pd.DataFrame({"event_id": pd.Series([], dtype="int64"),
                             "user_id": pd.Series([], dtype="int64"),
                             "delta_us": pd.Series([], dtype="int64")})

    boundary = _day_boundary_rows(ev, partial, "max", prev_last, nb)
    events_u = ev.map_batches(
        lambda b: _events_union_rows(b, False), batch_format="pandas"
    )
    return _run_salted_user_day(events_u, boundary, bucket, empty, nb)


def asof_last_purchase_salted(sf_dir: str) -> pd.DataFrame:
    """Mega-user-safe as-of join: in-cell backward-inclusive purchase
    lookup (searchsorted over the cell's purchase timestamps), seeded by
    a boundary row carrying the latest purchase timestamp from the
    user's earlier days (running max, propagated across purchase-free
    days).  Output identical to :func:`asof_last_purchase`."""
    ev = rd.read_parquet(
        _t(sf_dir, "events"), columns=["event_id", "user_id", "ts", "event_type"]
    )
    nb = _salt_buckets(ev)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        ts_us = b["ts"].astype("datetime64[us]").astype("int64")
        b = b.assign(
            day=ts_us // _US_PER_DAY,
            # -1 sentinel for "no purchase this row"; max-reduce keeps
            # any real timestamp over it
            p=np.where(b["event_type"].to_numpy() == "purchase", ts_us, -1),
        )
        return b.groupby(["user_id", "day"], as_index=False).agg(s=("p", "max"))

    def carry(days: np.ndarray, last_p: np.ndarray):
        run = np.maximum.accumulate(last_p)[:-1]
        keep = run >= 0
        return days[1:][keep], run[keep]

    def bucket(e: pd.DataFrame) -> pd.DataFrame:
        # etype DESC within equal ts: a purchase at the same timestamp as
        # another event must be visible to it (backward-INCLUSIVE as-of,
        # matching the searchsorted side='right' semantics + the oracle's
        # e.ts >= m.ts), so purchases sort first and the grouped cummax
        # below already contains them when the tied event is scanned
        e = e.sort_values(
            ["user_id", "day", "ts_us", "etype", "event_id"],
            ascending=[True, True, True, False, True],
        )
        p = np.where(
            e["etype"].to_numpy() == 1, e["ts_us"].to_numpy(), np.int64(-1)
        )
        cm = (
            e.assign(__p=p)
            .groupby(["user_id", "day"], sort=False)["__p"]
            .cummax()
            .to_numpy()
        )
        bv = e["bval"].fillna(-1).to_numpy(dtype="int64")
        lp = np.maximum(cm, bv)
        return pd.DataFrame(
            {"event_id": e["event_id"].to_numpy(),
             "last_purchase_ts": pd.Series(
                 np.where(lp >= 0, lp, np.int64(0)).view("datetime64[us]")
             ).mask(lp < 0)}
        )

    def empty() -> pd.DataFrame:
        return pd.DataFrame({"event_id": pd.Series([], dtype="int64"),
                             "last_purchase_ts": pd.Series([], dtype="datetime64[us]")})

    boundary = _day_boundary_rows(ev, partial, "max", carry, nb)
    events_u = ev.map_batches(
        lambda b: _events_union_rows(b, True), batch_format="pandas"
    )
    return _run_salted_user_day(events_u, boundary, bucket, empty, nb)


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


def events_range_join_count(sf_dir: str, window_hours: int = 1) -> pd.DataFrame:
    """RANGE JOIN (equality key + time-interval predicate — the join
    class as-of/semi/broadcast/shuffle don't cover): for each event,
    count the SAME user's events with ``ts ∈ [e.ts − window, e.ts)``.

    Distributed shape: a range join with an equality key partitions by
    that key — one coarse user-bucket shuffle; inside a bucket each
    user's sorted timestamp vector answers all of that user's window
    counts via two binary searches per event (np.searchsorted), so
    per-bucket cost is O(n log n) in bucket rows, never O(n²).  A
    mega-user spanning the window bound would get the day-partition +
    boundary-carry treatment of the ``*_salted`` family; the window
    carry here would be the trailing ``window`` of the previous
    partition.

    Exactness vs the oracle: the half-open window [ts − w, ts) excludes
    the event itself and any equal-timestamp peers, matching the SQL
    predicate ``p.ts >= e.ts - w AND p.ts < e.ts`` with 'left'-side
    searchsorted on both bounds."""
    ev = rd.read_parquet(_t(sf_dir, "events"), columns=["event_id", "user_id", "ts"])
    nb = _salt_buckets(ev)
    w_us = np.int64(window_hours) * 3_600_000_000

    def add_ub(b: pd.DataFrame) -> pd.DataFrame:
        b["ub"] = (b["user_id"].to_numpy() % nb).astype("int64")
        return b

    def count_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
        ts = g["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        out = np.empty(len(g), dtype=np.int64)
        uid = g["user_id"].to_numpy()
        for seg in np.split(np.arange(len(g)), np.flatnonzero(uid[1:] != uid[:-1]) + 1):
            seg_ts = ts[seg]
            lo = np.searchsorted(seg_ts, seg_ts - w_us, side="left")
            hi = np.searchsorted(seg_ts, seg_ts, side="left")
            out[seg] = hi - lo
        return pd.DataFrame(
            {"event_id": g["event_id"].to_numpy(),
             "user_id": uid,
             "n_prev_1h": out}
        )

    return (
        ev.map_batches(add_ub, batch_format="pandas")
        .groupby("ub")
        .map_groups(count_in_bucket, batch_format="pandas")
        .to_pandas()
    )


def asof_next_click(sf_dir: str) -> pd.DataFrame:
    """As-of join, FORWARD direction (the complement of
    :func:`asof_last_purchase`): for every event, the timestamp of the
    same user's NEXT click at-or-after it — the "time to next action"
    primitive behind response-latency and abandonment metrics.

    Same bucketed shape as the backward join: groupby(user) → sorted
    ``pd.merge_asof(direction='forward')`` per group; matches the SQL
    ``MIN(c.ts) WHERE c.ts >= e.ts`` correlated form exactly (ties on
    equal timestamps return that timestamp on both sides)."""
    ev = rd.read_parquet(
        _t(sf_dir, "events"), columns=["event_id", "user_id", "ts", "event_type"]
    )

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"]).reset_index(drop=True)
        marks = g.loc[g["event_type"] == "click", ["user_id", "ts"]].copy()
        marks = marks.rename(columns={"ts": "next_click_ts"})
        out = pd.merge_asof(
            g[["event_id", "user_id", "ts"]],
            marks,
            left_on="ts",
            right_on="next_click_ts",
            by="user_id",
            direction="forward",
            allow_exact_matches=True,
        )
        return out[["event_id", "next_click_ts"]]

    return ev.groupby("user_id").map_groups(per_user, batch_format="pandas").to_pandas()


def session_stats(sf_dir: str, gap_minutes: int = 30) -> pd.DataFrame:
    """SESSION-WINDOW AGGREGATE: per user, the session count, the
    largest session's event count, and total active time (sum of
    within-session gaps, exact microseconds) — the dependent
    two-level aggregate :func:`sessionize` stops short of.

    Scale shape: one coarse user-bucket exchange, then every window
    statistic derives from a single vectorized pass across all users in
    the bucket at once (grouped diff → open flags → cumsum session ids
    → two grouped aggregates) — no per-user Python."""
    from .dedup import coarse_buckets

    ev = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts", "event_id"])
    nb = coarse_buckets(ev.count(), rows_per_task=65536)
    gap_us = np.int64(gap_minutes) * 60_000_000

    def add_ub(b: pd.DataFrame) -> pd.DataFrame:
        b["ub"] = (b["user_id"].to_numpy() % nb).astype("int64")
        return b

    def stats_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        # exact integer microseconds: a float total_seconds() round-trip
        # truncates ~1 us on large gaps (measured at sf0.01)
        g["ts_us"] = g["ts"].astype("datetime64[us]").astype("int64")
        dt = g.groupby("user_id", sort=False)["ts_us"].diff().to_numpy()
        news = np.isnan(dt) | (dt > gap_us)
        active = np.where(news, 0, np.nan_to_num(dt)).astype("int64")
        sid = np.cumsum(news)  # globally increasing → unique per session
        sizes = (
            pd.DataFrame({"user_id": g["user_id"].to_numpy(), "sid": sid})
            .groupby(["user_id", "sid"], as_index=False)
            .size()
        )
        per_user = sizes.groupby("user_id", as_index=False).agg(
            n_sessions=("size", "size"), max_session_events=("size", "max")
        )
        act = (
            pd.DataFrame({"user_id": g["user_id"].to_numpy(), "a": active})
            .groupby("user_id", as_index=False)["a"]
            .sum()
            .rename(columns={"a": "active_us"})
        )
        out = per_user.merge(act, on="user_id")
        return out.astype("int64")

    return (
        ev.map_batches(add_ub, batch_format="pandas")
        .groupby("ub")
        .map_groups(stats_in_bucket, batch_format="pandas")
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )


def events_ewma(sf_dir: str, alpha: float = 0.3) -> pd.DataFrame:
    """Grouped EWMA — the LINEAR-RECURRENCE SCAN class
    (y_i = (1−α)·y_{i−1} + α·x_i, y_0 = x_0): inherently sequential per
    key, unlike every rank/diff/cumsum window in the repo, so it stands
    in for online feature smoothing and anomaly baselines.

    Scale shape: users are independent, so ONE user-bucket exchange
    parallelizes across keys; inside a bucket the recurrence runs in
    pandas' C ``groupby().ewm(adjust=False)`` kernel across all users at
    once.  MEGA-USER PATH (documented contract, same as the *_salted
    family): a single user's log split into segments composes
    associatively — each segment reduces to (A, B) with
    y_end = A·y_start + B, A = (1−α)^n — so a day-partitioned run needs
    only a tiny per-(user, day) boundary pass to chain carries, exactly
    the `_day_boundary_rows` shape.  Rows-only in the driver (recursive
    float scan isn't SQL-expressible); pinned against an explicit
    per-event Python recursion twin in tests."""
    from .dedup import coarse_buckets

    ev = rd.read_parquet(
        _t(sf_dir, "events"), columns=["event_id", "user_id", "ts", "value"]
    )
    nb = coarse_buckets(ev.count(), rows_per_task=65536)

    def add_ub(b: pd.DataFrame) -> pd.DataFrame:
        b["ub"] = (b["user_id"].to_numpy() % nb).astype("int64")
        return b

    def scan_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        y = (
            g.groupby("user_id", sort=False)["value"]
            .ewm(alpha=alpha, adjust=False)
            .mean()
            .reset_index(drop=True)
            .to_numpy()
        )
        return pd.DataFrame(
            {"event_id": g["event_id"].to_numpy(),
             "user_id": g["user_id"].to_numpy(),
             "ewma": y}
        )

    return (
        ev.map_batches(add_ub, batch_format="pandas")
        .groupby("ub")
        .map_groups(scan_in_bucket, batch_format="pandas")
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )


def events_late_arrivals(
    sf_dir: str, lateness_hours: int = 1
) -> pd.DataFrame:
    """WATERMARK + LATE-DATA accounting — the event-time vs arrival-time
    streaming concept (Dataflow/Beam semantics): arrival order is
    ``event_id``; the watermark before each arrival is the max event
    time seen so far minus nothing (raw high-water mark), and an arrival
    is LATE when it lags that mark by more than ``lateness``.  Output:
    per 1-hour tumbling event-time window, on-time vs late counts.

    Scale shape — a GLOBAL ordered scan (not per-key like the *_salted
    family): two-phase parallel prefix-max.  Phase 1: one pass over
    contiguous arrival-range buckets computes each bucket's local
    prefix-max and emits one (bucket, max) row; the driver prefix-folds
    the ≤ n_buckets maxima into per-bucket carries (tiny).  Phase 2: a
    second bucketed pass applies carry ∨ local prefix, flags lateness,
    and pre-aggregates per (window) — the exchange closing the query is
    |windows|-bounded."""
    import ray

    from .dedup import coarse_buckets

    ev = rd.read_parquet(_t(sf_dir, "events"), columns=["event_id", "ts"])
    n = ev.count()
    nb = coarse_buckets(n, rows_per_task=65536)
    span = max(1, -(-int(n) // nb))  # ceil: contiguous arrival ranges
    late_us = np.int64(lateness_hours) * 3_600_000_000
    hour_us = np.int64(3_600_000_000)

    def add_rb(b: pd.DataFrame) -> pd.DataFrame:
        b["ts_us"] = b["ts"].astype("datetime64[us]").astype("int64")
        b["rb"] = (b["event_id"].to_numpy() // span).astype("int64")
        return b[["event_id", "ts_us", "rb"]]

    def bucket_max(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"rb": [np.int64(g["rb"].iloc[0])],
             "mx": [np.int64(g["ts_us"].max())]}
        )

    ranged = ev.map_batches(add_rb, batch_format="pandas")
    maxima = (
        ranged.groupby("rb").map_groups(bucket_max, batch_format="pandas")
        .to_pandas()
        .sort_values("rb")
    )
    # driver-side prefix fold over <= nb rows: carry[b] = max of all
    # buckets strictly before b (INT64_MIN when none)
    carry_vals = np.concatenate(
        ([np.iinfo(np.int64).min], np.maximum.accumulate(maxima["mx"].to_numpy())[:-1])
    )
    carry_ref = ray.put(dict(zip(maxima["rb"].to_numpy(), carry_vals)))

    def flag_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        carries = ray.get(carry_ref)
        g = g.sort_values("event_id")
        ts = g["ts_us"].to_numpy()
        local = np.concatenate(
            ([np.iinfo(np.int64).min], np.maximum.accumulate(ts)[:-1])
        )
        wm = np.maximum(local, carries[int(g["rb"].iloc[0])])
        late = (wm != np.iinfo(np.int64).min) & (wm - ts > late_us)
        win = (ts // hour_us) * hour_us
        out = (
            pd.DataFrame({"win_us": win, "late": late.astype("int64")})
            .groupby("win_us", as_index=False)
            .agg(n_ontime=("late", lambda s: int((1 - s).sum())),
                 n_late=("late", "sum"))
        )
        return out.astype("int64")

    out = (
        ranged.groupby("rb").map_groups(flag_in_bucket, batch_format="pandas")
        .to_pandas()
        .groupby("win_us", as_index=False)[["n_ontime", "n_late"]]
        .sum()  # |windows|-bounded
    )
    out["win"] = pd.to_datetime(out["win_us"], unit="us")
    out = out[["win", "n_ontime", "n_late"]].astype(
        {"n_ontime": "int64", "n_late": "int64"}
    )
    return out.sort_values("win").reset_index(drop=True)
