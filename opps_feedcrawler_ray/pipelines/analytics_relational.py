"""Core relational operators: joins, grouping sets, pivots, SCD2/PIT, layout (Z-order), profiling, maintenance (IVM/upsert/diff) over the TPC-H-ish tables.

Split from the original ``analytics.py`` (round 5, VERDICT r4 task #5); the
``analytics`` facade re-exports every name, so the registry and oracle
surface are unchanged."""

from __future__ import annotations
import json
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ..functions.joins import broadcast_join, shuffle_join, skew_split_join
from ..functions.text import count_tokens
from ..functions.urlnorm import canonicalize_batch
from ..stages.urlstages import CanonicalizeStage

from .analytics_shared import (  # noqa: F401
    _t,
)


# ---------------------------------------------------------------- G1/G2
def source_stats(sf_dir: str) -> pd.DataFrame:
    """Per-source doc counts + char sums with batch-level pre-aggregation
    (combiner) before the small groupby shuffle."""

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select(["source", "n_chars"]).to_pandas()
        g = df.groupby("source", as_index=False).agg(
            n_docs=("n_chars", "size"), sum_chars=("n_chars", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    ds = (
        rd.read_parquet(_t(sf_dir, "documents"), columns=["source", "n_chars"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .sum(["n_docs", "sum_chars"])
    )
    df = ds.to_pandas()
    df = df.rename(columns={"sum(n_docs)": "n_docs", "sum(sum_chars)": "sum_chars"})
    df["avg_chars"] = (df["sum_chars"] / df["n_docs"]).round(6)
    return df[["source", "n_docs", "sum_chars", "avg_chars"]]


def filter_lang(sf_dir: str) -> rd.Dataset:
    """Predicate pushdown at the read: only en rows leave storage."""
    return rd.read_parquet(
        _t(sf_dir, "documents"),
        columns=["doc_id", "source", "n_chars"],
        filter=(pc.field("lang") == "en"),
    )


def topk_chars(sf_dir: str) -> pd.DataFrame:
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "n_chars"])
    out = ds.sort(["n_chars", "doc_id"], descending=[True, False]).limit(20)
    return out.to_pandas()


# ---------------------------------------------------------------- joins
def orders_by_segment(sf_dir: str) -> pd.DataFrame:
    """Broadcast join: customer (small) shipped once via ray.put."""
    orders = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"])
    cust = pd.read_parquet(_t(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"])
    cust = cust.rename(columns={"c_custkey": "o_custkey"})

    joined = broadcast_join(orders, cust, on="o_custkey")

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch["price_e2"] = np.round(batch["o_totalprice"] * 100).astype("int64")
        g = batch.groupby("c_mktsegment", as_index=False).agg(
            n_orders=("price_e2", "size"), revenue_e2=("price_e2", "sum")
        )
        return g

    out = (
        joined.map_batches(partial, batch_format="pandas")
        .groupby("c_mktsegment")
        .sum(["n_orders", "revenue_e2"])
        .to_pandas()
        .rename(columns={"sum(n_orders)": "n_orders", "sum(revenue_e2)": "revenue_e2"})
    )
    return out[["c_mktsegment", "n_orders", "revenue_e2"]]


def lineitem_order_priority(sf_dir: str) -> pd.DataFrame:
    """Explicit bucketed shuffle join of two large tables on orderkey."""
    li = rd.read_parquet(
        _t(sf_dir, "lineitem"), columns=["l_orderkey", "l_extendedprice", "l_discount"]
    )
    orders = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderkey", "o_orderpriority"])

    def rekey(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.rename(columns={"o_orderkey": "l_orderkey"})

    orders = orders.map_batches(rekey, batch_format="pandas")
    joined = shuffle_join(li, orders, on="l_orderkey", num_buckets=16)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        rev = np.round(batch["l_extendedprice"] * (1 - batch["l_discount"]) * 10000).astype("int64")
        batch = batch.assign(revenue_e4=rev)
        return batch.groupby("o_orderpriority", as_index=False).agg(
            n_items=("revenue_e4", "size"), revenue_e4=("revenue_e4", "sum")
        )

    out = (
        joined.map_batches(partial, batch_format="pandas")
        .groupby("o_orderpriority")
        .sum(["n_items", "revenue_e4"])
        .to_pandas()
        .rename(columns={"sum(n_items)": "n_items", "sum(revenue_e4)": "revenue_e4"})
    )
    return out[["o_orderpriority", "n_items", "revenue_e4"]]


def region_nations(sf_dir: str) -> pd.DataFrame:
    nation = rd.read_parquet(_t(sf_dir, "nation"))
    region = pd.read_parquet(_t(sf_dir, "region")).rename(
        columns={"r_regionkey": "n_regionkey"}
    )
    joined = broadcast_join(nation, region, on="n_regionkey")
    out = (
        joined.groupby("r_name")
        .count()
        .to_pandas()
        .rename(columns={"count()": "n_nations"})
    )
    return out[["r_name", "n_nations"]]


# ---------------------------------------------------------- aggregates
def distinct_users(sf_dir: str) -> pd.DataFrame:
    """COUNT DISTINCT without a skewed group: event_type has ~5 values, so
    ``groupby(event_type).map_groups`` would materialize ~20 % of the table
    per task.  Two-stage instead — both shuffles key on high-cardinality
    composites, no group ever exceeds O(1) rows:

      1. combiner + a COARSE-BUCKET shuffle on ``user_id % B`` with the
         per-(type, user) sum done in pandas inside each bucket task — a
         Ray aggregate keyed on the raw pair would create ~one group per
         distinct pair (the near-all-distinct-key pathology: ~100 µs of
         per-group overhead each); equal pairs share a bucket because the
         bucket depends only on user_id;
      2. combiner + ``groupby(event_type).sum()`` over ≤ |types| rows per
         batch → n_users = pair count, n_events = sum of counts.
    """
    from .dedup import coarse_buckets

    ev = rd.read_parquet(_t(sf_dir, "events"), columns=["event_type", "user_id"])
    nb = coarse_buckets(ev.count(), rows_per_task=65536)

    def combine_pairs(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().groupby(
            ["event_type", "user_id"], as_index=False
        ).size().rename(columns={"size": "n"})
        df["__b"] = (df["user_id"].to_numpy() % nb).astype("int64")
        # explicit schema: an empty block would otherwise infer null-typed
        # object columns and break downstream schema unification
        return pa.Table.from_pandas(
            df,
            schema=pa.schema(
                [("event_type", pa.string()), ("user_id", pa.int64()),
                 ("n", pa.int64()), ("__b", pa.int64())]
            ),
            preserve_index=False,
        )

    def sum_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["event_type", "user_id"], as_index=False)["n"].sum()

    pairs = (
        ev.map_batches(combine_pairs, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(sum_pairs, batch_format="pandas")
    )

    def combine_types(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().groupby("event_type", as_index=False).agg(
            n_users=("n", "size"), n_events=("n", "sum")
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    out = (
        pairs.map_batches(combine_types, batch_format="pyarrow")
        .groupby("event_type")
        .sum(["n_users", "n_events"])
        .to_pandas()
        .rename(columns={"sum(n_users)": "n_users", "sum(n_events)": "n_events"})
    )
    return out[["event_type", "n_users", "n_events"]]


def events_daily(sf_dir: str) -> pd.DataFrame:
    ev = rd.read_parquet(_t(sf_dir, "events"), columns=["event_type", "ts", "value"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch["day"] = batch["ts"].dt.floor("D")
        batch["value_e4"] = np.round(batch["value"] * 10000).astype("int64")
        return batch.groupby(["event_type", "day"], as_index=False).agg(
            n=("value_e4", "size"), value_e4=("value_e4", "sum")
        )

    out = (
        ev.map_batches(partial, batch_format="pandas")
        .groupby(["event_type", "day"])
        .sum(["n", "value_e4"])
        .to_pandas()
        .rename(columns={"sum(n)": "n", "sum(value_e4)": "value_e4"})
    )
    return out[["event_type", "day", "n", "value_e4"]]


def json_extract_events(sf_dir: str) -> rd.Dataset:
    ev = rd.read_parquet(_t(sf_dir, "events"), columns=["event_id", "props"])

    def fn(batch: pa.Table) -> pa.Table:
        ks = [
            int(json.loads(p)["k"]) if p else None
            for p in batch["props"].to_pylist()
        ]
        return pa.table(
            {"event_id": batch["event_id"], "k": pa.array(ks, pa.int64())}
        )

    return ev.map_batches(fn, batch_format="pyarrow")


def pricing_summary(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q1-shaped summary with exact integer-scaled sums."""
    li = rd.read_parquet(
        _t(sf_dir, "lineitem"),
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.assign(
            qty_e2=np.round(batch["l_quantity"] * 100).astype("int64"),
            base_e2=np.round(batch["l_extendedprice"] * 100).astype("int64"),
            disc_e4=np.round(
                batch["l_extendedprice"] * (1 - batch["l_discount"]) * 10000
            ).astype("int64"),
        )
        return batch.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty_e2=("qty_e2", "sum"),
            sum_base_e2=("base_e2", "sum"),
            sum_disc_e4=("disc_e4", "sum"),
            count_order=("qty_e2", "size"),
        )

    out = (
        li.map_batches(partial, batch_format="pandas")
        .groupby(["l_returnflag", "l_linestatus"])
        .sum(["sum_qty_e2", "sum_base_e2", "sum_disc_e4", "count_order"])
        .to_pandas()
    )
    out = out.rename(
        columns={f"sum({c})": c for c in ["sum_qty_e2", "sum_base_e2", "sum_disc_e4", "count_order"]}
    )
    return out[["l_returnflag", "l_linestatus", "sum_qty_e2", "sum_base_e2", "sum_disc_e4", "count_order"]]


def supplier_topk(sf_dir: str) -> pd.DataFrame:
    ds = rd.read_parquet(_t(sf_dir, "supplier"), columns=["s_suppkey", "s_name", "s_acctbal"])
    out = ds.sort(["s_acctbal", "s_suppkey"], descending=[True, False]).limit(10).to_pandas()
    out["s_acctbal_e2"] = np.round(out["s_acctbal"] * 100).astype("int64")
    return out[["s_suppkey", "s_name", "s_acctbal_e2"]]


def embeddings_by_label(sf_dir: str) -> pd.DataFrame:
    ds = rd.read_parquet(_t(sf_dir, "embeddings"), columns=["label"])
    out = ds.groupby("label").count().to_pandas().rename(columns={"count()": "n_vecs"})
    return out[["label", "n_vecs"]]


# ------------------------------------------------------------- url ops
def url_canonicalize(sf_dir: str) -> pd.DataFrame:
    """M1/M2/M4 with a SQL-twin: messy URLs constructed from (source,
    doc_id), canonicalized by the engine; the oracle states the expected
    canonical/surt/host strings directly."""
    docs = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "source"])

    def build(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        srcs = batch["source"].to_pylist()
        messy = [f"HTTP://{s.upper()}.EXAMPLE:80/d/./{i}" for s, i in zip(srcs, ids)]
        canon, surt, host = canonicalize_batch(messy)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "url_canon": pa.array(canon, pa.string()),
                "surt": pa.array(surt, pa.string()),
                "host": pa.array(host, pa.string()),
            }
        )

    return docs.map_batches(build, batch_format="pyarrow").to_pandas()


def exact_dedup_docs(sf_dir: str) -> pd.DataFrame:
    """Exact dedup over a dup-injected corpus: documents ∪ (doc_id+10⁶
    copies) → min-id survivor + copy count per distinct text."""
    docs = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def shift(batch: pa.Table) -> pa.Table:
        ids = pc.add(batch["doc_id"], pa.scalar(1_000_000, pa.int64()))
        return pa.table({"doc_id": ids, "text": batch["text"]})

    both = docs.union(docs.map_batches(shift, batch_format="pyarrow"))
    from ..functions.text import doc_fingerprint

    def add_fp(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__fp", pa.array(doc_fingerprint(batch["text"].to_pylist()), pa.uint64())
        )

    def reduce_group(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": [int(g["doc_id"].min())], "n_copies": [np.int64(len(g))]}
        )

    return (
        both.map_batches(add_fp, batch_format="pyarrow")
        .groupby("__fp")
        .map_groups(reduce_group, batch_format="pandas")
        .to_pandas()
    )


def topk_per_group(sf_dir: str) -> pd.DataFrame:
    """G4: per-group top-k (the reference's per-feed max_entries cap) —
    top 3 docs by n_chars per lang, deterministic tie-break."""
    docs = rd.read_parquet(_t(sf_dir, "documents"), columns=["lang", "doc_id", "n_chars"])

    def top3(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["n_chars", "doc_id"], ascending=[False, True]).head(3)

    return docs.groupby("lang").map_groups(top3, batch_format="pandas").to_pandas()


def supplier_nation_builtin(sf_dir: str) -> pd.DataFrame:
    """J1 built-in variant: Ray Data's native hash-shuffle Dataset.join
    (the stated-plan third strategy alongside broadcast/shuffle)."""
    from ..functions.joins import builtin_join

    sup = rd.read_parquet(
        _t(sf_dir, "supplier"), columns=["s_suppkey", "s_name", "s_nationkey"]
    )
    nat = rd.read_parquet(_t(sf_dir, "nation"), columns=["n_nationkey", "n_name"])

    def rekey(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["s_nationkey", "n_name"])

    out = builtin_join(
        sup, nat.map_batches(rekey, batch_format="pyarrow"), on="s_nationkey",
        num_partitions=8,
    ).to_pandas()
    return out[["s_suppkey", "s_name", "n_name"]]


def orders_monthly(sf_dir: str) -> pd.DataFrame:
    """Date-truncation aggregate with batch combiner (G1 + date math)."""
    orders = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderdate", "o_totalprice"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch["month"] = batch["o_orderdate"].dt.to_period("M").dt.to_timestamp()
        batch["revenue_e2"] = np.round(batch["o_totalprice"] * 100).astype("int64")
        return batch.groupby("month", as_index=False).agg(
            n_orders=("revenue_e2", "size"), revenue_e2=("revenue_e2", "sum")
        )

    out = (
        orders.map_batches(partial, batch_format="pandas")
        .groupby("month")
        .sum(["n_orders", "revenue_e2"])
        .to_pandas()
        .rename(columns={"sum(n_orders)": "n_orders", "sum(revenue_e2)": "revenue_e2"})
    )
    return out[["month", "n_orders", "revenue_e2"]]


def part_type_stats(sf_dir: str) -> pd.DataFrame:
    """String-function aggregate: first word of p_type, size stats."""
    part = rd.read_parquet(_t(sf_dir, "part"), columns=["p_type", "p_size"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch["type_head"] = batch["p_type"].str.split(" ").str[0]
        return batch.groupby("type_head", as_index=False).agg(
            n_parts=("p_size", "size"), sum_size=("p_size", "sum")
        )

    out = (
        part.map_batches(partial, batch_format="pandas")
        .groupby("type_head")
        .sum(["n_parts", "sum_size"])
        .to_pandas()
        .rename(columns={"sum(n_parts)": "n_parts", "sum(sum_size)": "sum_size"})
    )
    out["sum_size"] = out["sum_size"].astype("int64")
    return out[["type_head", "n_parts", "sum_size"]]


def customer_balance_buckets(sf_dir: str) -> pd.DataFrame:
    """CASE-bucketed histogram over customer account balances."""
    cust = rd.read_parquet(_t(sf_dir, "customer"), columns=["c_acctbal"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = pd.cut(
            batch["c_acctbal"],
            bins=[-float("inf"), 0, 2500, 5000, 7500, float("inf")],
            labels=["neg", "low", "mid", "high", "top"],
            right=False,
        ).astype(str)
        return pd.DataFrame({"bucket": b}).groupby("bucket", as_index=False).agg(
            n_customers=("bucket", "size")
        )

    out = (
        cust.map_batches(partial, batch_format="pandas")
        .groupby("bucket")
        .sum("n_customers")
        .to_pandas()
        .rename(columns={"sum(n_customers)": "n_customers"})
    )
    return out[["bucket", "n_customers"]]


def orders_yoy_growth(sf_dir: str) -> pd.DataFrame:
    """Year-over-year revenue deltas — LAG over an AGGREGATED series:
    per-batch (year, revenue) partials → one |years|-bounded exchange;
    the lag/diff runs on the driver over that bounded series (first year
    has no predecessor and is excluded on both sides)."""
    orders = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderdate", "o_totalprice"])

    _schema = pa.schema([("year", pa.int64()), ("rev_e2", pa.int64())])

    def partial(b: pd.DataFrame) -> pa.Table:
        b = b.assign(
            year=b["o_orderdate"].dt.year.astype("int64"),
            rev_e2=np.round(b["o_totalprice"].to_numpy() * 100).astype("int64"),
        )
        g = b.groupby("year", as_index=False).agg(rev_e2=("rev_e2", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False, schema=_schema)

    y = (
        orders.map_batches(partial, batch_format="pandas")
        .groupby("year")
        .sum("rev_e2")
        .to_pandas()
        .rename(columns={"sum(rev_e2)": "rev_e2"})
        .sort_values("year")
        .reset_index(drop=True)
    )
    y["delta_e2"] = y["rev_e2"].diff()
    y = y.dropna(subset=["delta_e2"])
    y["delta_e2"] = y["delta_e2"].astype("int64")
    return y[["year", "rev_e2", "delta_e2"]].reset_index(drop=True)


def events_segment_skew_join(sf_dir: str) -> pd.DataFrame:
    """Fact ⋈ dim through the SKEW-SPLIT strategy
    (``functions.joins.skew_split_join``): users above the hot threshold
    join map-side against broadcast dim rows, the cold tail co-shuffles —
    the explicit hot-key handling the north rule's "skew handled
    explicitly" names for joins (the salted windows cover groupby skew).
    The split is invisible in the answer, so the plain join+aggregate SQL
    is an exact oracle; the threshold (80) makes BOTH halves non-empty at
    sf0.01, which the companion test pins."""
    ev = rd.read_parquet(
        _t(sf_dir, "events"), columns=["user_id", "event_type", "value"]
    )
    cust = pd.read_parquet(
        _t(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"]
    ).rename(columns={"c_custkey": "user_id"})
    joined = skew_split_join(ev, cust, on="user_id", hot_threshold=80)

    _pschema = pa.schema(
        [("c_mktsegment", pa.string()), ("event_type", pa.string()),
         ("n", pa.int64()), ("value_e4", pa.int64())]
    )

    def partial(b: pd.DataFrame) -> pa.Table:
        b = b.assign(
            value_e4=np.round(b["value"].to_numpy() * 10000).astype("int64")
        )
        g = b.groupby(["c_mktsegment", "event_type"], as_index=False).agg(
            n=("value_e4", "size"), value_e4=("value_e4", "sum")
        )
        # explicit schema: a zero-hot-key block yields an EMPTY frame here
        # whose object columns would otherwise infer Arrow null type
        return pa.Table.from_pandas(g, preserve_index=False, schema=_pschema)

    out = (
        joined.map_batches(partial, batch_format="pandas")
        .groupby(["c_mktsegment", "event_type"])
        .sum(["n", "value_e4"])
        .to_pandas()
        .rename(columns={"sum(n)": "n", "sum(value_e4)": "value_e4"})
    )
    return (
        out[["c_mktsegment", "event_type", "n", "value_e4"]]
        .sort_values(["c_mktsegment", "event_type"])
        .reset_index(drop=True)
    )


def nation_balance_stats(sf_dir: str) -> pd.DataFrame:
    """Per-nation count / sum / population variance of account balances
    from INTEGER partial sums (n, Σv, Σv²) pre-aggregated per batch
    (combiner → one tiny groupby) — the numerically-exact distributed
    variance shape; the final double expression mirrors the oracle
    term-for-term so the e4 value hashes bit-equal."""
    cust = rd.read_parquet(_t(sf_dir, "customer"), columns=["c_nationkey", "c_acctbal"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        v = np.floor(df["c_acctbal"].to_numpy() * 100.0 + 0.5).astype("int64")
        df = pd.DataFrame({"c_nationkey": df["c_nationkey"].astype("int64"),
                           "n_cust": 1, "sum_e2": v, "sumsq": v * v})
        g = df.groupby("c_nationkey", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    df = (
        cust.map_batches(partial, batch_format="pyarrow")
        .groupby("c_nationkey")
        .sum(["n_cust", "sum_e2", "sumsq"])
        .to_pandas()
        .rename(columns={"sum(n_cust)": "n_cust", "sum(sum_e2)": "sum_e2",
                         "sum(sumsq)": "sumsq"})
    )
    n = df["n_cust"].to_numpy().astype("float64")
    s = df["sum_e2"].to_numpy().astype("float64")
    q = df["sumsq"].to_numpy().astype("float64")
    df["var_e4"] = np.floor((q * n - s * s) / (n * n) + 0.5).astype("int64")
    return df[["c_nationkey", "n_cust", "sum_e2", "var_e4"]]


def orders_rollup(sf_dir: str) -> pd.DataFrame:
    """GROUP BY ROLLUP(year, month): leaf aggregates run distributed
    (per-batch combiners → one small groupby over ~|year·month| keys);
    the year subtotals and grand total derive from the LEAF table on the
    driver — bounded by key cardinality, never data size.  NULL rollup
    markers encode as -1 on both sides."""
    orders = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderdate", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["year"] = df["o_orderdate"].dt.year.astype("int64")
        df["month"] = df["o_orderdate"].dt.month.astype("int64")
        df["e2"] = np.floor(df["o_totalprice"].to_numpy() * 100.0 + 0.5).astype("int64")
        g = df.groupby(["year", "month"], as_index=False).agg(
            n_orders=("e2", "size"), revenue_e2=("e2", "sum")
        )
        return pa.Table.from_pandas(
            g,
            preserve_index=False,
            schema=pa.schema(
                [("year", pa.int64()), ("month", pa.int64()),
                 ("n_orders", pa.int64()), ("revenue_e2", pa.int64())]
            ),
        )

    leaf = (
        orders.map_batches(partial, batch_format="pyarrow")
        .groupby(["year", "month"])
        .sum(["n_orders", "revenue_e2"])
        .to_pandas()
        .rename(columns={"sum(n_orders)": "n_orders", "sum(revenue_e2)": "revenue_e2"})
    )
    yr = leaf.groupby("year", as_index=False)[["n_orders", "revenue_e2"]].sum()
    yr["month"] = -1
    tot = pd.DataFrame(
        {
            "year": [-1],
            "month": [-1],
            "n_orders": [leaf["n_orders"].sum()],
            "revenue_e2": [leaf["revenue_e2"].sum()],
        }
    )
    out = pd.concat([leaf, yr, tot], ignore_index=True)
    out = out[["year", "month", "n_orders", "revenue_e2"]].astype("int64")
    return out.sort_values(["year", "month"]).reset_index(drop=True)


def customer_no_big_order(sf_dir: str) -> pd.DataFrame:
    """Distributed ANTI JOIN (NOT EXISTS) as a bucketed one-exchange
    shuffle: both sides hash-partition on the join key; a left row
    survives iff its bucket holds no right-side key.  Unlike the
    broadcast-keyset anti-join (top_spender_events), this shape holds
    when the right side is itself too large to broadcast; the right
    side is pre-filtered AND pre-distincted per batch (combiner) so
    only unique keys enter the exchange."""
    from .dedup import coarse_buckets

    cust = rd.read_parquet(_t(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"])
    orders = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"])
    nb = coarse_buckets(cust.count(), rows_per_task=65536)

    def tag_left(batch: pa.Table) -> pa.Table:
        k = batch["c_custkey"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "key": pa.array(k, pa.int64()),
                "c_mktsegment": pc.cast(batch["c_mktsegment"], pa.string()),
                "side": pa.array(np.zeros(len(k), dtype=np.int8)),
                "__b": pa.array((k % nb).astype("int64")),
            }
        )

    def tag_right(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.greater(batch["o_totalprice"], 450000.0))
        k = np.unique(t["o_custkey"].to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "key": pa.array(k, pa.int64()),
                "c_mktsegment": pa.array([None] * len(k), pa.string()),
                "side": pa.array(np.ones(len(k), dtype=np.int8)),
                "__b": pa.array((k % nb).astype("int64")),
            }
        )

    def anti(g: pd.DataFrame) -> pd.DataFrame:
        right = g.loc[g["side"] == 1, "key"].to_numpy()
        left = g[g["side"] == 0]
        keep = left.loc[
            ~np.isin(left["key"].to_numpy(), right), ["key", "c_mktsegment"]
        ]
        return keep.rename(columns={"key": "c_custkey"})

    return (
        cust.map_batches(tag_left, batch_format="pyarrow")
        .union(orders.map_batches(tag_right, batch_format="pyarrow"))
        .groupby("__b")
        .map_groups(anti, batch_format="pandas")
        .to_pandas()
    )


_SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]


def orders_pivot_month_segment(sf_dir: str) -> pd.DataFrame:
    """PIVOT: month × market-segment revenue matrix.  Broadcast the tiny
    customer→segment map, pivot each batch into the FIXED column set
    (combiner — the wide layout exists before the shuffle), then one
    groupby-sum over ~|months| keys.  Integer e2 revenue end-to-end."""
    orders = rd.read_parquet(
        _t(sf_dir, "orders"), columns=["o_custkey", "o_totalprice", "o_orderdate"]
    )
    cust = pd.read_parquet(
        _t(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"]
    ).rename(columns={"c_custkey": "o_custkey"})
    joined = broadcast_join(orders, cust, on="o_custkey")
    cols = [f"rev_{s.lower()}_e2" for s in _SEGMENTS]

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["month"] = df["o_orderdate"].dt.strftime("%Y-%m")
        df["e2"] = np.floor(df["o_totalprice"].to_numpy() * 100.0 + 0.5).astype("int64")
        p = df.pivot_table(
            index="month", columns="c_mktsegment", values="e2",
            aggfunc="sum", fill_value=0,
        ).reindex(columns=_SEGMENTS, fill_value=0)
        p.columns = cols
        p = p.reset_index()
        for c in cols:
            p[c] = p[c].astype("int64")
        return pa.Table.from_pandas(
            p,
            preserve_index=False,
            schema=pa.schema(
                [("month", pa.string())] + [(c, pa.int64()) for c in cols]
            ),
        )

    df = (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("month")
        .sum(cols)
        .to_pandas()
        .rename(columns={f"sum({c})": c for c in cols})
    )
    return df[["month"] + cols]


def customer_big_order_counts(sf_dir: str) -> pd.DataFrame:
    """LEFT OUTER join as a bucketed one-exchange shuffle with zero-fill:
    every customer row survives, carrying its count of high-value orders
    (0 when none — the rows the inner join would drop).  The right side
    pre-aggregates per batch (combiner), so the exchange ships per-key
    partial counts, not order rows."""
    from .dedup import coarse_buckets

    cust = rd.read_parquet(_t(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"])
    orders = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"])
    nb = coarse_buckets(cust.count(), rows_per_task=65536)

    def tag_left(batch: pa.Table) -> pa.Table:
        k = batch["c_custkey"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "key": pa.array(k, pa.int64()),
                "c_mktsegment": pc.cast(batch["c_mktsegment"], pa.string()),
                "n_big": pa.array(np.full(len(k), -1, dtype=np.int64)),
                "__b": pa.array((k % nb).astype("int64")),
            }
        )

    def tag_right(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.greater(batch["o_totalprice"], 450000.0))
        k, n = np.unique(
            t["o_custkey"].to_numpy(zero_copy_only=False), return_counts=True
        )
        return pa.table(
            {
                "key": pa.array(k, pa.int64()),
                "c_mktsegment": pa.array([None] * len(k), pa.string()),
                "n_big": pa.array(n.astype("int64")),
                "__b": pa.array((k % nb).astype("int64")),
            }
        )

    def left_join(g: pd.DataFrame) -> pd.DataFrame:
        right = (
            g.loc[g["n_big"] >= 0, ["key", "n_big"]]
            .groupby("key", as_index=False)["n_big"]
            .sum()
        )
        left = g.loc[g["n_big"] < 0, ["key", "c_mktsegment"]]
        out = left.merge(right, on="key", how="left")
        out["n_big"] = out["n_big"].fillna(0).astype("int64")
        return out.rename(columns={"key": "c_custkey"})

    return (
        cust.map_batches(tag_left, batch_format="pyarrow")
        .union(orders.map_batches(tag_right, batch_format="pyarrow"))
        .groupby("__b")
        .map_groups(left_join, batch_format="pandas")
        .to_pandas()
    )


def part_lineitem_full_outer(sf_dir: str) -> pd.DataFrame:
    """FULL OUTER join as the bucketed one-exchange shuffle (completing
    the join family: inner/broadcast/builtin/semi/anti/left/asof/range):
    unmatched rows SURVIVE ON BOTH SIDES — left-only parts carry
    n_heavy=0, right-only lineitem groups carry p_size=-1.  The right
    side pre-aggregates per batch, so the exchange ships per-key partial
    counts, never lineitem rows."""
    from .dedup import coarse_buckets

    part = rd.read_parquet(_t(sf_dir, "part"), columns=["p_partkey", "p_size"])
    li = rd.read_parquet(_t(sf_dir, "lineitem"), columns=["l_partkey", "l_quantity"])
    nb = coarse_buckets(part.count(), rows_per_task=65536)

    def tag_left(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.greater(batch["p_size"], 45))
        k = t["p_partkey"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "partkey": pa.array(k, pa.int64()),
                "p_size": pc.cast(t["p_size"], pa.int64()),
                "n_heavy": pa.array(np.zeros(len(k), dtype=np.int64)),
                "side": pa.array(np.zeros(len(k), dtype=np.int8)),
                "__b": pa.array((k % nb).astype("int64")),
            }
        )

    def tag_right(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.greater(batch["l_quantity"], 49.0))
        k, n = np.unique(
            t["l_partkey"].to_numpy(zero_copy_only=False), return_counts=True
        )
        return pa.table(
            {
                "partkey": pa.array(k, pa.int64()),
                "p_size": pa.array(np.full(len(k), -1, dtype=np.int64)),
                "n_heavy": pa.array(n.astype("int64")),
                "side": pa.array(np.ones(len(k), dtype=np.int8)),
                "__b": pa.array((k % nb).astype("int64")),
            }
        )

    def full_outer(g: pd.DataFrame) -> pd.DataFrame:
        left = g.loc[g["side"] == 0, ["partkey", "p_size"]]
        right = (
            g.loc[g["side"] == 1, ["partkey", "n_heavy"]]
            .groupby("partkey", as_index=False)["n_heavy"]
            .sum()
        )
        out = left.merge(right, on="partkey", how="outer")
        out["p_size"] = out["p_size"].fillna(-1).astype("int64")
        out["n_heavy"] = out["n_heavy"].fillna(0).astype("int64")
        return out

    return (
        part.map_batches(tag_left, batch_format="pyarrow")
        .union(li.map_batches(tag_right, batch_format="pyarrow"))
        .groupby("__b")
        .map_groups(full_outer, batch_format="pandas")
        .to_pandas()
        .sort_values("partkey")
        .reset_index(drop=True)
    )


def supplier_names_by_nation(sf_dir: str) -> pd.DataFrame:
    """Grouped COLLECT / string_agg: comma-joined supplier names per
    nation in deterministic (sorted) order.  Coarse-bucketed on the
    nation key; per-group state is bounded by the group's OWN payload
    (the thing being collected), which is the inherent cost of a
    collect — document, don't hide."""
    from .dedup import coarse_buckets

    sup = rd.read_parquet(_t(sf_dir, "supplier"), columns=["s_nationkey", "s_name"])
    nb = coarse_buckets(sup.count(), rows_per_task=65536)

    def tag(batch: pa.Table) -> pa.Table:
        k = batch["s_nationkey"].to_numpy(zero_copy_only=False).astype("int64")
        return pa.table(
            {
                "s_nationkey": pa.array(k),
                "s_name": pc.cast(batch["s_name"], pa.string()),
                "__b": pa.array(k % nb),
            }
        )

    def collect(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("s_name")
        return (
            g.groupby("s_nationkey", as_index=False)
            .agg(names=("s_name", ",".join), n_suppliers=("s_name", "size"))
        )

    return (
        sup.map_batches(tag, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(collect, batch_format="pandas")
        .to_pandas()
        .sort_values("s_nationkey")
        .reset_index(drop=True)
    )


def lineitem_above_avg(sf_dir: str) -> pd.DataFrame:
    """DECORRELATED correlated subquery (TPC-H Q17 shape): per part,
    count lineitems whose quantity exceeds that part's average quantity.

    Scale shape: the correlated `(SELECT AVG(...) WHERE l2.partkey =
    l.partkey)` decorrelates into (1) per-batch (partkey → sum, count)
    partials + a coarse-bucket grouped sum (the per-part aggregate table,
    |parts| rows — orders of magnitude smaller than lineitem), (2) that
    table broadcast via ray.put into a streaming filter pass.  The
    comparison runs as integer cross-multiplication (qty·count > sum) so
    no float average crosses the oracle boundary — the SQL twin uses the
    identical inequality.  At 10^9 parts the broadcast side becomes the
    bucketed exchange `customer_big_order_counts` already implements."""
    import ray

    from .dedup import coarse_buckets

    li = rd.read_parquet(_t(sf_dir, "lineitem"), columns=["l_partkey", "l_quantity"])
    nb = coarse_buckets(li.count(), rows_per_task=65536)

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["q"] = np.floor(df["l_quantity"].to_numpy() + 0.5).astype("int64")
        g = df.groupby("l_partkey", as_index=False).agg(s=("q", "sum"), c=("q", "size"))
        g["__b"] = (g["l_partkey"].to_numpy() % nb).astype("int64")
        return pa.Table.from_pandas(
            g,
            schema=pa.schema([("l_partkey", pa.int64()), ("s", pa.int64()),
                              ("c", pa.int64()), ("__b", pa.int64())]),
            preserve_index=False,
        )

    def sum_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("l_partkey", as_index=False)[["s", "c"]].sum()

    avg = (
        li.map_batches(partial, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(sum_bucket, batch_format="pandas")
        .to_pandas()
    )
    avg = avg.sort_values("l_partkey")  # sorted ONCE for batch searchsorted
    avg_ref = ray.put(
        (avg["l_partkey"].to_numpy().astype(np.int64),
         avg["s"].to_numpy().astype(np.int64),
         avg["c"].to_numpy().astype(np.int64))
    )

    def above(batch: pa.Table) -> pa.Table:
        keys, s, c = ray.get(avg_ref)
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        q = np.floor(batch["l_quantity"].to_numpy(zero_copy_only=False) + 0.5).astype(np.int64)
        idx = np.searchsorted(keys, pk)
        keep = q * c[idx] > s[idx]  # qty > avg, exactly, in integers
        g = pd.DataFrame({"l_partkey": pk[keep]}).groupby(
            "l_partkey", as_index=False
        ).size().rename(columns={"size": "n_above"})
        g["__b"] = (g["l_partkey"].to_numpy() % nb).astype("int64")
        return pa.Table.from_pandas(
            g,
            schema=pa.schema([("l_partkey", pa.int64()), ("n_above", pa.int64()),
                              ("__b", pa.int64())]),
            preserve_index=False,
        )

    def sum_above(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("l_partkey", as_index=False)["n_above"].sum()

    out = (
        li.map_batches(above, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(sum_above, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("l_partkey").reset_index(drop=True)


def lineitem_bloom_join(sf_dir: str) -> rd.Dataset:
    """Bloom-filter join pre-filter — THE bandwidth saver for selective
    joins at 100 TB: the small (filtered) side's keys are sketched into
    a Bloom filter (~2 B/key vs ~30 B/key for an exact set) and
    broadcast once; big-side batches drop non-matching rows BEFORE any
    join exchange.  No false negatives → no lost matches; false
    positives are eliminated by the exact probe that follows.  At this
    scale the small side also fits a broadcast lookup, so the exact
    probe is batch-local and the whole join is shuffle-free; when it
    doesn't, the same bloom mask feeds the bucketed shuffle join and
    only ~selectivity of the big side crosses the wire."""
    import ray

    from ..state.bloom import BloomFilter

    small = rd.read_parquet(
        _t(sf_dir, "orders"),
        columns=["o_orderkey", "o_totalprice"],
        filter=(pc.field("o_totalprice") > 480000.0),
    ).to_pandas()
    keys = small["o_orderkey"].to_numpy(dtype=np.int64)
    price_e2 = np.floor(small["o_totalprice"].to_numpy() * 100.0 + 0.5).astype(np.int64)
    bloom = BloomFilter(capacity=max(len(keys), 1), bits_per_key=10)
    bloom.insert_batch(keys.astype(np.uint64))
    # exact side: hash-sorted key array + aligned payload (searchsorted probe)
    order = np.argsort(keys)
    bloom_ref = ray.put(bloom)
    keys_ref = ray.put(keys[order])
    price_ref = ray.put(price_e2[order])

    def probe(batch: pa.Table) -> pa.Table:
        bl = ray.get(bloom_ref)
        lk = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        maybe = bl.contains_batch(lk.astype(np.uint64))
        if not maybe.any():
            return pa.table(
                {"l_orderkey": pa.array([], pa.int64()),
                 "l_linenumber": pa.array([], pa.int64()),
                 "o_price_e2": pa.array([], pa.int64())}
            )
        t = batch.filter(pa.array(maybe))
        sk = ray.get(keys_ref)
        sp = ray.get(price_ref)
        lk2 = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(sk, lk2)
        pos[pos >= len(sk)] = len(sk) - 1
        hit = sk[pos] == lk2  # kills bloom false positives exactly
        t = t.filter(pa.array(hit))
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "l_linenumber": pc.cast(t["l_linenumber"], pa.int64()),
                "o_price_e2": pa.array(sp[pos[hit]], pa.int64()),
            }
        )

    return rd.read_parquet(
        _t(sf_dir, "lineitem"), columns=["l_orderkey", "l_linenumber"]
    ).map_batches(probe, batch_format="pyarrow")


def orders_cube_year_priority(sf_dir: str) -> pd.DataFrame:
    """GROUP BY CUBE(year, o_orderpriority) — completes the grouping-sets
    family next to ROLLUP: all four groupings ((y,p), (y), (p), ())
    derive from the SAME distributed leaf table, so the exchange stays
    bounded by |years|·|priorities| regardless of input size.  Rollup
    markers encode as -1 / 'ALL' on both sides."""
    orders = rd.read_parquet(
        _t(sf_dir, "orders"), columns=["o_orderdate", "o_orderpriority", "o_totalprice"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["year"] = df["o_orderdate"].dt.year.astype("int64")
        df["e2"] = np.floor(df["o_totalprice"].to_numpy() * 100.0 + 0.5).astype("int64")
        g = df.groupby(["year", "o_orderpriority"], as_index=False).agg(
            n_orders=("e2", "size"), revenue_e2=("e2", "sum")
        )
        return pa.Table.from_pandas(
            g,
            preserve_index=False,
            schema=pa.schema(
                [("year", pa.int64()), ("o_orderpriority", pa.string()),
                 ("n_orders", pa.int64()), ("revenue_e2", pa.int64())]
            ),
        )

    leaf = (
        orders.map_batches(partial, batch_format="pyarrow")
        .groupby(["year", "o_orderpriority"])
        .sum(["n_orders", "revenue_e2"])
        .to_pandas()
        .rename(columns={"sum(n_orders)": "n_orders", "sum(revenue_e2)": "revenue_e2"})
    )
    m = ["n_orders", "revenue_e2"]
    by_y = leaf.groupby("year", as_index=False)[m].sum()
    by_y["o_orderpriority"] = "ALL"
    by_p = leaf.groupby("o_orderpriority", as_index=False)[m].sum()
    by_p["year"] = -1
    tot = pd.DataFrame(
        {"year": [-1], "o_orderpriority": ["ALL"],
         "n_orders": [leaf["n_orders"].sum()], "revenue_e2": [leaf["revenue_e2"].sum()]}
    )
    out = pd.concat([leaf, by_y, by_p, tot], ignore_index=True)[
        ["year", "o_orderpriority", "n_orders", "revenue_e2"]
    ]
    out["year"] = out["year"].astype("int64")
    return out.sort_values(["year", "o_orderpriority"]).reset_index(drop=True)


def orders_upsert_latest(sf_dir: str) -> pd.DataFrame:
    """MERGE / upsert (SCD latest-wins): a deterministic update stream
    (every 10th order re-observed 30 days later at a new price) is
    applied over the base table; the latest observation per key wins
    and the version count is kept — the change-data-capture shape every
    warehouse pipeline runs.

    100 TB shape: per-batch combiner keeps ONE candidate (max (ts, src))
    and a version count per key per batch, then one key-bucket exchange
    merges candidates — the exchange carries keys, not history."""
    from .dedup import coarse_buckets

    orders = rd.read_parquet(
        _t(sf_dir, "orders"), columns=["o_orderkey", "o_totalprice", "o_orderdate"]
    )
    nb = coarse_buckets(orders.count(), rows_per_task=65536)

    def versions(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        base = pd.DataFrame(
            {
                "o_orderkey": df["o_orderkey"],
                "price_e2": np.floor(df["o_totalprice"].to_numpy() * 100.0 + 0.5).astype("int64"),
                "ts": df["o_orderdate"],
                "src": np.int64(0),
            }
        )
        upd = df[df["o_orderkey"] % 10 == 0]
        upd = pd.DataFrame(
            {
                "o_orderkey": upd["o_orderkey"],
                "price_e2": np.floor(upd["o_totalprice"].to_numpy() * 110.0 + 0.5).astype("int64"),
                "ts": upd["o_orderdate"] + pd.Timedelta(days=30),
                "src": np.int64(1),
            }
        )
        allv = pd.concat([base, upd], ignore_index=True)
        # batch-local pre-reduce: latest candidate + version count per key
        allv = allv.sort_values(["o_orderkey", "ts", "src"])
        g = allv.groupby("o_orderkey", as_index=False)
        latest = g.tail(1)
        latest = latest.merge(
            g.size().rename(columns={"size": "n_versions"}), on="o_orderkey"
        )
        latest["n_versions"] = latest["n_versions"].astype("int64")
        latest["__b"] = (latest["o_orderkey"].to_numpy() % nb).astype("int64")
        return pa.Table.from_pandas(
            latest,
            schema=pa.schema(
                [("o_orderkey", pa.int64()), ("price_e2", pa.int64()),
                 ("ts", pa.timestamp("us")), ("src", pa.int64()),
                 ("n_versions", pa.int64()), ("__b", pa.int64())]
            ),
            preserve_index=False,
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_orderkey", "ts", "src"])
        counts = g.groupby("o_orderkey", as_index=False)["n_versions"].sum()
        latest = g.groupby("o_orderkey", as_index=False).tail(1)
        out = latest.drop(columns=["n_versions", "__b"]).merge(counts, on="o_orderkey")
        return out[["o_orderkey", "price_e2", "src", "n_versions"]]

    out = (
        orders.map_batches(versions, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("o_orderkey").reset_index(drop=True)


def part_fuzzy_name_match(sf_dir: str) -> pd.DataFrame:
    """Similarity join with blocking: deterministic typo probes (middle
    character deleted from each distinct part name) matched back against
    the name vocabulary at edit distance ≤ 1.  The blocking key (first
    character) is what makes the class scale: candidate pairs are
    bounded by block sizes, never |probes|×|names|; the DP kernel runs
    only inside blocks and carries a distance cap for early exit.

    100 TB shape: vocabulary extracted via per-batch distinct combiners
    (name-cardinality-bounded exchange); the small name side broadcasts;
    probes stream through map_batches."""
    import ray

    from ..functions.text import levenshtein

    parts = rd.read_parquet(_t(sf_dir, "part"), columns=["p_name"])

    def distinct_partial(batch: pa.Table) -> pa.Table:
        return pa.table({"p_name": pc.unique(batch["p_name"])})

    names = sorted(
        set(
            parts.map_batches(distinct_partial, batch_format="pyarrow")
            .to_pandas()["p_name"]
        )
    )
    by_first: dict[str, list[str]] = {}
    for nm in names:
        by_first.setdefault(nm[:1], []).append(nm)
    block_ref = ray.put(by_first)

    def probe_and_match(batch: pa.Table) -> pa.Table:
        blocks = ray.get(block_ref)
        out_p, out_n, out_d = [], [], []
        for nm in batch["p_name"].to_pylist():
            mid = len(nm) // 2
            probe = nm[:mid] + nm[mid + 1:]
            for cand in blocks.get(probe[:1], ()):
                d = levenshtein(probe, cand, cap=1)
                if d <= 1:
                    out_p.append(probe)
                    out_n.append(cand)
                    out_d.append(d)
        return pa.table(
            {
                "probe": pa.array(out_p, pa.string()),
                "p_name": pa.array(out_n, pa.string()),
                "dist": pa.array(out_d, pa.int64()),
            }
        )

    probes = rd.from_pandas(pd.DataFrame({"p_name": names}))
    out = probes.map_batches(probe_and_match, batch_format="pyarrow").to_pandas()
    return out.sort_values(["probe", "p_name"]).reset_index(drop=True)


def supplier_ship_overlap(sf_dir: str) -> pd.DataFrame:
    """INTERVAL-OVERLAP self-join: per supplier, the number of pairs of
    its lineitems whose shipment windows [shipdate, shipdate + quantity
    days] overlap — the interval×interval join class (overlap, not the
    point-in-range predicate events_range_join_count covers).

    Scale shape: a naive approach is the O(n²) per-key self join; this
    runs the sweep-count identity instead — for row i with interval
    [s_i, e_i], #overlaps = #{starts ≤ e_i} − #{ends < s_i} − 1, so the
    per-supplier pair count is two global searchsorted gathers over a
    composite (supplier·R + day) int64 key, zero per-group Python.
    Rows of OTHER suppliers cancel exactly: every earlier-supplier row
    contributes one start and one end below this supplier's band.  One
    supplier-bucket exchange (coarse buckets) co-locates each
    supplier's rows; the exchange ships 3 int64 columns, not the table."""
    from .dedup import coarse_buckets

    li = rd.read_parquet(
        _t(sf_dir, "lineitem"), columns=["l_suppkey", "l_shipdate", "l_quantity"]
    )
    nb = coarse_buckets(li.count(), rows_per_task=65536)
    epoch0 = pd.Timestamp("1990-01-01")
    R = np.int64(1 << 20)  # > any day index; supp·R ≤ 1e6·2^20 ≪ 2^63

    def to_keys(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        supp = df["l_suppkey"].to_numpy().astype(np.int64)
        s = ((pd.to_datetime(df["l_shipdate"]) - epoch0).dt.days).to_numpy().astype(np.int64)
        e = s + df["l_quantity"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "l_suppkey": pa.array(supp, pa.int64()),
                "skey": pa.array(supp * R + s, pa.int64()),
                "ekey": pa.array(supp * R + e, pa.int64()),
                "__b": pa.array(supp % nb, pa.int64()),
            }
        )

    def count_overlaps(g: pd.DataFrame) -> pd.DataFrame:
        sk = np.sort(g["skey"].to_numpy())
        ek = np.sort(g["ekey"].to_numpy())
        # per row: starts ≤ my end  minus  ends < my start  minus self
        a = np.searchsorted(sk, g["ekey"].to_numpy(), side="right")
        b = np.searchsorted(ek, g["skey"].to_numpy(), side="left")
        per_row = a - b - 1
        out = pd.DataFrame({"l_suppkey": g["l_suppkey"], "pr": per_row})
        out = out.groupby("l_suppkey", as_index=False)["pr"].sum()
        out["n_overlap_pairs"] = (out["pr"] // 2).astype("int64")
        return out[out["n_overlap_pairs"] > 0][["l_suppkey", "n_overlap_pairs"]]

    out = (
        li.map_batches(to_keys, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(count_overlaps, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("l_suppkey").reset_index(drop=True)


def events_unpivot_props(sf_dir: str) -> pd.DataFrame:
    """UNPIVOT / melt — the inverse of the pivot reshape: each event row
    fans out into one (event_id, key, val) long-format row per measure
    (value at e2, and the user id), the shape feature stores and
    key-value ingestion layers consume.

    Scale shape: a pure stateless row-expanding ``map_batches`` (the
    UNNEST direction of the reshape family) — zero shuffle, output is
    k× the input rows but each task's expansion stays inside its own
    batch."""
    ev = rd.read_parquet(
        _t(sf_dir, "events"), columns=["event_id", "user_id", "value"]
    )

    def melt(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        eid = df["event_id"].to_numpy().astype("int64")
        v_e2 = np.floor(df["value"].to_numpy() * 100.0 + 0.5).astype("int64")
        uid = df["user_id"].to_numpy().astype("int64")
        n = len(df)
        return pa.table(
            {
                "event_id": pa.array(np.repeat(eid, 2), pa.int64()),
                "key": pa.array(["value_e2", "user_id"] * n, pa.string()),
                "val": pa.array(
                    np.column_stack([v_e2, uid]).reshape(-1), pa.int64()
                ),
            }
        )

    out = ev.map_batches(melt, batch_format="pyarrow").to_pandas()
    return out.sort_values(["event_id", "key"]).reset_index(drop=True)


def table_profile(sf_dir: str, table: str = "orders") -> pd.DataFrame:
    """COLUMN PROFILER — the data-quality sweep every ingestion pipeline
    runs first: per column, row count, null count, and EXACT distinct
    count (the HLL twin ``hll_distinct_users`` covers the approximate
    path; a profiler feeding schema-drift alerts needs exactness).

    Scale shape: the null/row tallies are per-batch partials summed on
    the driver (|columns| rows).  Exact distincts use the two-stage
    shape of ``distinct_users`` generalized across columns: per-batch
    DISTINCT (column, value) rows → ONE (column, value-hash)-bucket
    exchange (equal values co-locate, so a per-bucket nunique is exact
    and collision-free — hashing only routes, never identifies) →
    |columns|·n_buckets partial counts to the driver.  Values ride as
    repr() strings (injective for int64/float64/timestamp) so one
    exchange serves every column type."""
    from ..functions.hashing import fingerprint64
    from .dedup import coarse_buckets

    ds = rd.read_parquet(_t(sf_dir, table))
    cols = ds.schema().names
    nb = coarse_buckets(ds.count(), rows_per_task=65536)

    def tally(batch: pa.Table) -> pa.Table:
        names, n_rows, n_nulls = [], [], []
        for c in cols:
            names.append(c)
            n_rows.append(batch.num_rows)
            n_nulls.append(batch[c].null_count)
        return pa.table(
            {"col_name": pa.array(names, pa.string()),
             "n_rows": pa.array(n_rows, pa.int64()),
             "n_nulls": pa.array(n_nulls, pa.int64())}
        )

    counts = (
        ds.map_batches(tally, batch_format="pyarrow")
        .to_pandas()
        .groupby("col_name", as_index=False)[["n_rows", "n_nulls"]]
        .sum()
    )

    def distinct_partial(batch: pa.Table) -> pa.Table:
        frames = []
        df = batch.to_pandas()
        for c in cols:
            # batch-local dedup first: the hash loop runs over the
            # column's batch-distinct set, not its rows
            vals = pd.Series(df[c].dropna().unique()).astype(str)
            frames.append(pd.DataFrame({
                "col_name": c,
                "vb": np.fromiter(
                    (fingerprint64(s) % nb for s in vals),
                    dtype=np.int64, count=len(vals),
                ),
                "v": vals,
            }))
        out = pd.concat(frames, ignore_index=True)
        return pa.Table.from_pandas(
            out, preserve_index=False,
            schema=pa.schema([("col_name", pa.string()), ("vb", pa.int64()),
                              ("v", pa.string())]),
        )

    def nd_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        co = g.groupby("col_name", as_index=False)["v"].nunique()
        return co.rename(columns={"v": "nd"})

    nd = (
        ds.map_batches(distinct_partial, batch_format="pyarrow")
        .groupby("vb")
        .map_groups(nd_in_bucket, batch_format="pandas")
        .to_pandas()
        .groupby("col_name", as_index=False)["nd"]
        .sum()
        .rename(columns={"nd": "n_distinct"})
    )
    out = counts.merge(nd, on="col_name", how="left")
    out["n_distinct"] = out["n_distinct"].fillna(0).astype("int64")
    out[["n_rows", "n_nulls"]] = out[["n_rows", "n_nulls"]].astype("int64")
    return out.sort_values("col_name").reset_index(drop=True)


def orders_profile(sf_dir: str) -> pd.DataFrame:
    return table_profile(sf_dir, "orders")


def _skyline(df: pd.DataFrame) -> pd.DataFrame:
    """Skyline (Pareto frontier) of (minimize p_retailprice, maximize
    p_size): a row survives iff no other row is ≤ on price AND ≥ on
    size with at least one strict.  Vectorized sweep: per distinct
    price, M2 = that price's max size; M1 = running max size over
    STRICTLY smaller prices.  keep ⇔ size == M2 ∧ size > M1 (ties on
    the frontier point all survive — equal pairs never dominate)."""
    lvl = df.groupby("p_retailprice")["p_size"].max().sort_index()
    m1 = lvl.cummax().shift(1, fill_value=np.iinfo(np.int64).min)
    m2 = df["p_retailprice"].map(lvl)
    m1v = df["p_retailprice"].map(m1)
    keep = (df["p_size"] == m2) & (df["p_size"] > m1v)
    return df[keep]


def part_pareto(sf_dir: str) -> pd.DataFrame:
    """SKYLINE QUERY (Börzsönyi et al. 2001): parts Pareto-optimal on
    (cheapest price, largest size).

    Scale shape: the skyline operator admits an exact combiner —
    skyline(A ∪ B) = skyline(skyline(A) ∪ skyline(B)) — so each batch
    reduces to its local frontier (typically O(log n) of the batch) and
    the driver closes over the tiny candidate union.  No shuffle at
    all: one streaming pass + a driver-side merge of frontiers."""
    parts = rd.read_parquet(
        _t(sf_dir, "part"), columns=["p_partkey", "p_retailprice", "p_size"]
    )

    def local_frontier(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        sk = _skyline(df)
        return pa.Table.from_pandas(
            sk, preserve_index=False,
            schema=pa.schema([("p_partkey", pa.int64()),
                              ("p_retailprice", pa.float64()),
                              ("p_size", pa.int32())]),
        )

    cand = parts.map_batches(local_frontier, batch_format="pyarrow").to_pandas()
    out = _skyline(cand).copy()
    out["price_e2"] = np.floor(
        out["p_retailprice"].to_numpy() * 100.0 + 0.5
    ).astype("int64")
    out["p_size"] = out["p_size"].astype("int64")
    return (
        out[["p_partkey", "price_e2", "p_size"]]
        .sort_values("p_partkey")
        .reset_index(drop=True)
    )


def contacts_union_by_name(sf_dir: str) -> pd.DataFrame:
    """UNION BY NAME with schema evolution — the heterogenous-source
    concat every ingestion layer needs: customer and supplier rows
    merge on aligned column NAMES, with columns absent on one side
    (here ``segment``) null-filled, plus a lineage ``kind`` column.
    Ray Data's ``union`` requires identical schemas, so each side is
    aligned in a stateless ``map_batches`` first — zero shuffles."""
    cust = rd.read_parquet(
        _t(sf_dir, "customer"), columns=["c_name", "c_acctbal", "c_mktsegment"]
    )
    supp = rd.read_parquet(_t(sf_dir, "supplier"), columns=["s_name", "s_acctbal"])

    _schema = pa.schema(
        [("name", pa.string()), ("acctbal_e2", pa.int64()),
         ("segment", pa.string()), ("kind", pa.string())]
    )

    def from_cust(b: pa.Table) -> pa.Table:
        bal = np.floor(
            b["c_acctbal"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype("int64")
        return pa.table(
            {"name": b["c_name"], "acctbal_e2": pa.array(bal, pa.int64()),
             "segment": b["c_mktsegment"],
             "kind": pa.array(["customer"] * b.num_rows, pa.string())},
            schema=_schema,
        )

    def from_supp(b: pa.Table) -> pa.Table:
        bal = np.floor(
            b["s_acctbal"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype("int64")
        return pa.table(
            {"name": b["s_name"], "acctbal_e2": pa.array(bal, pa.int64()),
             "segment": pa.array([None] * b.num_rows, pa.string()),
             "kind": pa.array(["supplier"] * b.num_rows, pa.string())},
            schema=_schema,
        )

    out = (
        cust.map_batches(from_cust, batch_format="pyarrow")
        .union(supp.map_batches(from_supp, batch_format="pyarrow"))
        .to_pandas()
    )
    return out.sort_values(["kind", "name"]).reset_index(drop=True)


def orders_diff(sf_dir: str) -> pd.DataFrame:
    """TABLE DIFF / CDC derivation — classify every key of two table
    versions as added / removed / changed / same.  The v2 snapshot is
    derived deterministically from v1 (so the oracle rebuilds it in
    SQL): keys ≡ 0 (mod 97) are deleted, URGENT orders get a 1.00 price
    bump, and keys ≡ 0 (mod 101) reappear shifted by +10^9 (inserts).

    Scale shape: both versions stream through the SAME key-bucket
    exchange (side-tagged rows) and every bucket classifies its keys
    vectorized — the classic sort-free distributed diff; output is the
    4-row status census."""
    from .dedup import coarse_buckets

    orders = rd.read_parquet(
        _t(sf_dir, "orders"),
        columns=["o_orderkey", "o_totalprice", "o_orderpriority"],
    )
    nb = coarse_buckets(orders.count(), rows_per_task=65536)

    def sides(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        df["price_e2"] = np.floor(
            df["o_totalprice"].to_numpy() * 100.0 + 0.5
        ).astype("int64")
        v1 = df[["o_orderkey", "price_e2"]].assign(side=0)
        keep = df["o_orderkey"] % 97 != 0
        bump = (df["o_orderpriority"] == "1-URGENT").to_numpy()
        v2 = df.loc[keep, ["o_orderkey", "price_e2"]].copy()
        v2["price_e2"] += np.where(bump[keep.to_numpy()], 100, 0)
        v2["side"] = 1
        ins = df.loc[df["o_orderkey"] % 101 == 0, ["o_orderkey", "price_e2"]].copy()
        ins["o_orderkey"] += 1_000_000_000
        ins["side"] = 1
        out = pd.concat([v1, v2, ins], ignore_index=True)
        out["kb"] = (out["o_orderkey"].to_numpy() % nb).astype("int64")
        return pa.Table.from_pandas(
            out, preserve_index=False,
            schema=pa.schema([("o_orderkey", pa.int64()), ("price_e2", pa.int64()),
                              ("side", pa.int64()), ("kb", pa.int64())]),
        )

    def classify(g: pd.DataFrame) -> pd.DataFrame:
        a = g[g["side"] == 0].set_index("o_orderkey")["price_e2"]
        b = g[g["side"] == 1].set_index("o_orderkey")["price_e2"]
        j = a.to_frame("p1").join(b.to_frame("p2"), how="outer")
        status = np.where(
            j["p1"].isna(), "added",
            np.where(j["p2"].isna(), "removed",
                     np.where(j["p1"] != j["p2"], "changed", "same")),
        )
        out = pd.DataFrame({"status": status}).groupby(
            "status", as_index=False
        ).size().rename(columns={"size": "n"})
        out["n"] = out["n"].astype("int64")
        return out

    return (
        orders.map_batches(sides, batch_format="pyarrow")
        .groupby("kb")
        .map_groups(classify, batch_format="pandas")
        .to_pandas()
        .groupby("status", as_index=False)["n"]
        .sum()  # 4-row census
        .sort_values("status")
        .reset_index(drop=True)
    )


def nation_region_cross(sf_dir: str) -> pd.DataFrame:
    """CROSS JOIN — the cartesian member of the join family: every
    (nation, region) combination with a home-region flag.  Implemented
    as the broadcast nested-loop shape (small side ``ray.put`` once,
    cartesian emitted per batch) — the only correct distributed plan
    for a true cross product."""
    import ray

    nat = rd.read_parquet(
        _t(sf_dir, "nation"), columns=["n_name", "n_regionkey"]
    )
    reg = pd.read_parquet(
        _t(sf_dir, "region"), columns=["r_regionkey", "r_name"]
    )
    reg_ref = ray.put(reg)

    def cross(batch: pa.Table) -> pa.Table:
        r = ray.get(reg_ref)
        df = batch.to_pandas()
        m = df.merge(r, how="cross")
        m["is_home"] = (
            m["n_regionkey"].to_numpy() == m["r_regionkey"].to_numpy()
        ).astype("int64")
        return pa.Table.from_pandas(
            m[["n_name", "r_name", "is_home"]], preserve_index=False,
            schema=pa.schema([("n_name", pa.string()), ("r_name", pa.string()),
                              ("is_home", pa.int64())]),
        )

    return (
        nat.map_batches(cross, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["n_name", "r_name"])
        .reset_index(drop=True)
    )


def nation_share_of_region(sf_dir: str) -> pd.DataFrame:
    """RATIO-TO-PARENT reporting — each nation's revenue share within
    its region (the window-over-aggregate class: SUM OVER (PARTITION BY
    parent) against grouped detail rows).  Reuses the broadcast-join
    revenue rollup; the |nations|-sized result computes shares
    driver-side with the oracle's identical float expression."""
    from ..functions.joins import broadcast_join

    orders = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"])
    cust = pd.read_parquet(
        _t(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"]
    ).rename(columns={"c_custkey": "o_custkey"})
    nation = pd.read_parquet(
        _t(sf_dir, "nation"), columns=["n_nationkey", "n_name", "n_regionkey"]
    ).rename(columns={"n_nationkey": "c_nationkey"})
    region = pd.read_parquet(_t(sf_dir, "region"), columns=["r_regionkey", "r_name"])
    j = broadcast_join(orders, cust, on="o_custkey")

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch["revenue_e2"] = np.floor(
            batch["o_totalprice"].to_numpy() * 100.0 + 0.5
        ).astype("int64")
        return batch.groupby("c_nationkey", as_index=False).agg(
            revenue_e2=("revenue_e2", "sum")
        )

    nat = (
        j.map_batches(partial, batch_format="pandas")
        .groupby("c_nationkey")
        .sum("revenue_e2")
        .to_pandas()
        .rename(columns={"sum(revenue_e2)": "revenue_e2"})
        .merge(nation, on="c_nationkey")
        .merge(region, left_on="n_regionkey", right_on="r_regionkey")
    )
    tot = nat.groupby("r_name")["revenue_e2"].transform("sum")
    nat["share_e6"] = np.floor(
        nat["revenue_e2"].to_numpy(dtype="float64") * 1e6
        / tot.to_numpy(dtype="float64") + 0.5
    ).astype("int64")
    return (
        nat[["r_name", "n_name", "revenue_e2", "share_e6"]]
        .sort_values(["r_name", "n_name"])
        .reset_index(drop=True)
    )


def orders_digest(sf_dir: str) -> pd.DataFrame:
    """ORDER-INVARIANT TABLE CHECKSUM — the replication/migration
    verification primitive: a commutative sum of per-row md5 prefixes
    over a canonical string form, so any partitioning / block order /
    shuffle of the same rows yields the SAME digest.  Per-batch partial
    sums; the driver folds ≤ n_batches integers."""
    import hashlib

    orders = rd.read_parquet(
        _t(sf_dir, "orders"),
        columns=["o_orderkey", "o_orderstatus", "o_orderpriority"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        rows = (
            df["o_orderkey"].astype(str)
            + "|" + df["o_orderstatus"] + "|" + df["o_orderpriority"]
        )
        s = int(
            np.fromiter(
                (int(hashlib.md5(r.encode()).hexdigest()[:8], 16) for r in rows),
                dtype=np.int64, count=len(rows),
            ).sum()
        )
        return pa.table(
            {"n": pa.array([len(rows)], pa.int64()),
             "d": pa.array([s], pa.int64())}
        )

    p = orders.map_batches(partial, batch_format="pyarrow").to_pandas()
    return pd.DataFrame(
        {"n_rows": [np.int64(p["n"].sum())], "digest": [np.int64(p["d"].sum())]}
    )


def source_stats_incremental(sf_dir: str) -> pd.DataFrame:
    """INCREMENTAL VIEW MAINTENANCE demo — merge-on-read: the
    ``source_stats`` aggregate is maintained as a BASE partial (even
    doc_ids, the 'materialized' view) merged with a DELTA partial (odd
    doc_ids, 'new arrivals') — the mergeable-aggregate contract every
    streaming refresh needs.  Output equals plain ``source_stats``
    (same oracle SQL), proving the partition-merge identity."""

    def half(parity: int):
        ds = rd.read_parquet(
            _t(sf_dir, "documents"), columns=["doc_id", "source", "n_chars"]
        )

        def partial(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            df = df[df["doc_id"] % 2 == parity]
            g = df.groupby("source", as_index=False).agg(
                n_docs=("n_chars", "size"), sum_chars=("n_chars", "sum")
            )
            return pa.Table.from_pandas(
                g, preserve_index=False,
                schema=pa.schema([("source", pa.string()), ("n_docs", pa.int64()),
                                  ("sum_chars", pa.int64())]),
            )

        return (
            ds.map_batches(partial, batch_format="pyarrow")
            .groupby("source")
            .sum(["n_docs", "sum_chars"])
            .to_pandas()
            .rename(columns={"sum(n_docs)": "n_docs",
                             "sum(sum_chars)": "sum_chars"})
        )

    base, delta = half(0), half(1)
    merged = (
        pd.concat([base, delta], ignore_index=True)
        .groupby("source", as_index=False)[["n_docs", "sum_chars"]]
        .sum()
    )
    merged["avg_chars"] = (
        merged["sum_chars"] * 1.0 / merged["n_docs"]
    ).round(6)
    merged[["n_docs", "sum_chars"]] = merged[["n_docs", "sum_chars"]].astype("int64")
    return merged.sort_values("source").reset_index(drop=True)


def source_dup_factor(sf_dir: str) -> pd.DataFrame:
    """CORPUS DUPLICATION INFLATION per source — the health metric dedup
    planning starts from: docs vs distinct exact texts (md5 identity),
    and the inflation ratio.  Scale shape: per-batch distinct
    (source, md5) combiner → ONE md5-bucket exchange (exact per-bucket
    distinct, hash routes / values identify) → |sources|-bounded
    census."""
    import hashlib

    from .dedup import coarse_buckets

    docs = rd.read_parquet(_t(sf_dir, "documents"), columns=["source", "text"])
    nb = coarse_buckets(docs.count(), rows_per_task=65536)

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"source": batch["source"].to_pylist(),
             "md5": [hashlib.md5((t or "").encode()).hexdigest()
                     for t in batch["text"].to_pylist()]}
        )
        g = df.groupby(["source", "md5"], as_index=False).size().rename(
            columns={"size": "n"}
        )
        g["__b"] = np.fromiter(
            (int(m[:8], 16) % nb for m in g["md5"]), dtype=np.int64, count=len(g)
        )
        return pa.Table.from_pandas(
            g, preserve_index=False,
            schema=pa.schema([("source", pa.string()), ("md5", pa.string()),
                              ("n", pa.int64()), ("__b", pa.int64())]),
        )

    def census(g: pd.DataFrame) -> pd.DataFrame:
        co = g.groupby(["source", "md5"], as_index=False)["n"].sum()
        out = co.groupby("source", as_index=False).agg(
            n_docs=("n", "sum"), n_distinct=("n", "size")
        )
        return out.astype({"n_docs": "int64", "n_distinct": "int64"})

    out = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(census, batch_format="pandas")
        .to_pandas()
        .groupby("source", as_index=False)[["n_docs", "n_distinct"]]
        .sum()
    )
    out["dup_ratio_e6"] = np.floor(
        out["n_docs"].to_numpy(dtype="float64") * 1e6
        / out["n_distinct"].to_numpy(dtype="float64") + 0.5
    ).astype("int64")
    out[["n_docs", "n_distinct"]] = out[["n_docs", "n_distinct"]].astype("int64")
    return out.sort_values("source").reset_index(drop=True)


def _scd2_change_rows(g: pd.DataFrame, cust: str, day: str, okey: str,
                      prio: str) -> pd.DataFrame:
    """The SCD2 change-detection rule shared by ``orders_scd2`` and
    ``orders_pit_join`` (one definition so the version semantics can
    never drift): sort by (cust, day, okey), keep rows whose priority
    differs from the customer's previous row, number versions 1..k."""
    g = g.sort_values([cust, day, okey])
    prev = g.groupby(cust)[prio].shift()
    ch = g[prev.isna() | (prev != g[prio])].copy()
    ch["version"] = (ch.groupby(cust).cumcount() + 1).astype("int64")
    return ch


def orders_scd2(sf_dir: str) -> pd.DataFrame:
    """SLOWLY-CHANGING-DIMENSION TYPE 2 history build: collapse each
    customer's order stream into validity intervals of
    ``o_orderpriority`` — a new version opens whenever the priority
    differs from the previous order (ordered by date, orderkey), and
    closes at the next change (open intervals carry the 9999999
    sentinel so no NULL reaches the value hash).  Scale shape: ONE
    custkey-bucket exchange; inside each bucket every per-customer
    lag/lead/cumcount is a grouped pandas kernel across all customers
    at once (no per-cell loop)."""
    from .dedup import coarse_buckets

    SENTINEL = 9999999
    orders = rd.read_parquet(
        _t(sf_dir, "orders"),
        columns=["o_custkey", "o_orderkey", "o_orderdate", "o_orderpriority"],
    )
    nb = coarse_buckets(orders.count(), rows_per_task=65536)

    def tag(batch: pa.Table) -> pa.Table:
        b = batch["o_custkey"].to_numpy(zero_copy_only=False).astype("int64") % nb
        return batch.append_column("__b", pa.array(b, pa.int64()))

    def scd2(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["__day"] = (g["o_orderdate"].astype("int64")
                      // 86_400_000_000).astype("int64")
        ch = _scd2_change_rows(
            g, "o_custkey", "__day", "o_orderkey", "o_orderpriority"
        )
        ch["valid_from"] = ch["__day"]
        ch["valid_to"] = (
            ch.groupby("o_custkey")["valid_from"].shift(-1)
            .fillna(SENTINEL).astype("int64")
        )
        out = ch.rename(
            columns={"o_custkey": "custkey", "o_orderpriority": "priority"}
        )[["custkey", "priority", "valid_from", "valid_to", "version"]]
        return out

    return (
        orders.map_batches(tag, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(scd2, batch_format="pandas")
        .to_pandas()
        .sort_values(["custkey", "version"])
        .reset_index(drop=True)
    )


def referential_integrity_audit(sf_dir: str) -> pd.DataFrame:
    """DATA-QUALITY GATE: orphan foreign keys across the star schema
    (lineitem→orders, orders→customer, customer→nation).  Each edge is
    ONE key-bucket exchange carrying pre-aggregated (key, n) child
    partials and distinct parent keys — the per-bucket orphan count is
    a vectorized ``isin`` — so the driver only ever sees 3 rows.  The
    100 TB story: no broadcast of the (possibly huge) parent key set;
    both sides co-shuffle on the same key hash."""
    from .dedup import coarse_buckets

    edges = [
        ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
        ("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ]
    rows = []
    for fk, child, ckey, parent, pkey in edges:
        ch = rd.read_parquet(_t(sf_dir, child), columns=[ckey])
        pr = rd.read_parquet(_t(sf_dir, parent), columns=[pkey])
        n_rows = ch.count()
        nb = coarse_buckets(n_rows, rows_per_task=262144)
        schema = pa.schema([("k", pa.int64()), ("n", pa.int64()),
                            ("side", pa.int64()), ("__b", pa.int64())])

        def child_partial(batch: pa.Table, _k=ckey) -> pa.Table:
            v = batch[_k].to_numpy(zero_copy_only=False).astype("int64")
            ks, ns = np.unique(v, return_counts=True)
            return pa.Table.from_arrays(
                [pa.array(ks, pa.int64()),
                 pa.array(ns.astype("int64"), pa.int64()),
                 pa.array(np.zeros(len(ks), dtype="int64"), pa.int64()),
                 pa.array(ks % nb, pa.int64())], schema=schema)

        def parent_partial(batch: pa.Table, _k=pkey) -> pa.Table:
            ks = np.unique(batch[_k].to_numpy(zero_copy_only=False).astype("int64"))
            return pa.Table.from_arrays(
                [pa.array(ks, pa.int64()),
                 pa.array(np.ones(len(ks), dtype="int64"), pa.int64()),
                 pa.array(np.ones(len(ks), dtype="int64"), pa.int64()),
                 pa.array(ks % nb, pa.int64())], schema=schema)

        def orphan_count(g: pd.DataFrame) -> pd.DataFrame:
            pk = g.loc[g["side"] == 1, "k"]
            c = g[g["side"] == 0]
            n = int(c.loc[~c["k"].isin(pk), "n"].sum())
            return pd.DataFrame({"n_orphans": pd.array([n], dtype="int64")})

        both = ch.map_batches(child_partial, batch_format="pyarrow").union(
            pr.map_batches(parent_partial, batch_format="pyarrow")
        )
        orphans = int(
            both.groupby("__b").map_groups(orphan_count, batch_format="pandas")
            .to_pandas()["n_orphans"].sum()
        )
        rows.append({"fk": fk, "n_rows": n_rows, "n_orphans": orphans})
    out = pd.DataFrame(rows).astype({"n_rows": "int64", "n_orphans": "int64"})
    return out.sort_values("fk").reset_index(drop=True)


def _zorder_interleave(x: np.ndarray, y: np.ndarray, bits: int = 16) -> np.ndarray:
    """Bit-interleave two masked non-negative int arrays into a Morton
    (Z-order) key: x takes even bit positions, y odd."""
    z = np.zeros(len(x), dtype=np.int64)
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def zorder_layout(sf_dir: str, rows_per_file: int = 1024) -> pd.DataFrame:
    """Z-ORDER (Morton) STORAGE LAYOUT over (o_custkey, order day): the
    multi-dimensional clustering step a lakehouse runs before writing,
    so 2-D range predicates prune files on BOTH columns.  Returns the
    per-file min/max manifest (what a file-skipping planner consumes).
    Scale shape: global rank WITHOUT a global sort — rows co-shuffle on
    the zkey's high bits (bounded bucket count), per-bucket local rank
    + broadcast cumulative bucket offsets give the exact global rank,
    per-bucket partial file stats merge in the metadata-sized driver
    manifest."""
    from .dedup import coarse_buckets  # noqa: F401  (same bucketing family)

    orders = rd.read_parquet(
        _t(sf_dir, "orders"), columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )
    HB = 32  # bucket on zfull's high bits (drop 20 tiebreak + 12 low z bits)

    def keyed(batch: pa.Table) -> pa.Table:
        ck = batch["o_custkey"].to_numpy(zero_copy_only=False).astype("int64")
        day = (
            batch["o_orderdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            // 86_400_000_000
        ).astype("int64")
        ok = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype("int64")
        z = _zorder_interleave(ck & 0xFFFF, day & 0xFFFF)
        zfull = z * 1048576 + (ok % 1048576)
        return pa.table(
            {"zfull": pa.array(zfull, pa.int64()),
             "okey": pa.array(ok, pa.int64()),
             "ck": pa.array(ck, pa.int64()),
             "day": pa.array(day, pa.int64()),
             "__hb": pa.array(zfull >> HB, pa.int64())}
        )

    keyed_ds = orders.map_batches(keyed, batch_format="pyarrow")
    # pass 1: bucket histogram -> exact global offsets (bounded rows)
    counts = (
        keyed_ds.groupby("__hb").count().to_pandas().sort_values("__hb")
    )
    counts["offset"] = counts["count()"].cumsum().shift(fill_value=0).astype("int64")
    offsets = dict(zip(counts["__hb"].astype("int64"), counts["offset"]))

    def file_stats(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["zfull", "okey"])
        base = offsets[int(g["__hb"].iloc[0])]
        rank = base + np.arange(len(g), dtype=np.int64)
        g = g.assign(file_id=(rank // rows_per_file).astype("int64"))
        out = g.groupby("file_id", as_index=False).agg(
            n=("okey", "size"), min_ck=("ck", "min"), max_ck=("ck", "max"),
            min_day=("day", "min"), max_day=("day", "max"),
        )
        return out.astype({c: "int64" for c in out.columns})

    parts = (
        keyed_ds.groupby("__hb").map_groups(file_stats, batch_format="pandas")
        .to_pandas()
    )
    out = parts.groupby("file_id", as_index=False).agg(
        n=("n", "sum"), min_ck=("min_ck", "min"), max_ck=("max_ck", "max"),
        min_day=("min_day", "min"), max_day=("max_day", "max"),
    )
    return out.sort_values("file_id").reset_index(drop=True).astype(
        {c: "int64" for c in out.columns}
    )


def orders_grouping_sets(sf_dir: str) -> pd.DataFrame:
    """GROUPING SETS ((status), (priority), ()) — the arbitrary-set
    sibling of the ROLLUP/CUBE operators, with the standard GROUPING()
    bit id.  Each set is an independent domain-bounded combiner pass
    over the SAME per-batch partials (one stream read, three tiny
    reductions on the driver — no exchange)."""
    orders = rd.read_parquet(
        _t(sf_dir, "orders"), columns=["o_orderstatus", "o_orderpriority", "o_totalprice"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["r"] = np.floor(df["o_totalprice"].to_numpy() * 100 + 0.5).astype("int64")
        g = df.groupby(["o_orderstatus", "o_orderpriority"], as_index=False).agg(
            n=("r", "size"), rev=("r", "sum"))
        return pa.Table.from_pandas(
            g, preserve_index=False,
            schema=pa.schema([("o_orderstatus", pa.string()),
                              ("o_orderpriority", pa.string()),
                              ("n", pa.int64()), ("rev", pa.int64())]),
        )

    base = (
        orders.map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby(["o_orderstatus", "o_orderpriority"], as_index=False)[["n", "rev"]]
        .sum()
    )
    # GROUPING() bits (status, priority): 0b01 = priority aggregated away,
    # 0b10 = status aggregated away, 0b11 = grand total
    by_status = base.groupby("o_orderstatus", as_index=False)[["n", "rev"]].sum()
    by_status["o_orderpriority"] = None
    by_status["grouping_id"] = 1
    by_prio = base.groupby("o_orderpriority", as_index=False)[["n", "rev"]].sum()
    by_prio["o_orderstatus"] = None
    by_prio["grouping_id"] = 2
    total = pd.DataFrame(
        {"o_orderstatus": [None], "o_orderpriority": [None],
         "n": [base["n"].sum()], "rev": [base["rev"].sum()], "grouping_id": [3]}
    )
    out = pd.concat([by_status, by_prio, total], ignore_index=True)[
        ["o_orderstatus", "o_orderpriority", "grouping_id", "n", "rev"]
    ]
    out = out.rename(columns={"n": "n_orders", "rev": "revenue_e2"})
    out["grouping_id"] = out["grouping_id"].astype("int64")
    out[["n_orders", "revenue_e2"]] = out[["n_orders", "revenue_e2"]].astype("int64")
    return out.sort_values(
        ["grouping_id", "o_orderstatus", "o_orderpriority"],
        na_position="last",
    ).reset_index(drop=True)


def lineitem_mode_quantity(sf_dir: str) -> pd.DataFrame:
    """Grouped statistical MODE (most frequent value, smallest-value
    tie-break) — the missing member of the SQL aggregate family next to
    median/quantiles/MAD.  Per return flag: the modal l_quantity, its
    frequency, and the group row count.

    Scale shape: the classic domain-bounded histogram exchange —
    per-batch (flag, qty) count partials (TPC-H quantities are integers
    1..50, so ≤ |flags|·50 rows leave every block), coarse-bucketed
    pandas sums, then the argmax walks ≤ |domain| driver rows.  The
    deterministic tie-break (max count, then MIN quantity) keeps the
    answer partitioning-independent."""
    li = rd.read_parquet(_t(sf_dir, "lineitem"),
                         columns=["l_returnflag", "l_quantity"])
    from .dedup import coarse_buckets

    nb = coarse_buckets(li.count(), rows_per_task=65536)
    _schema = pa.schema(
        [("l_returnflag", pa.string()), ("q", pa.int64()),
         ("n", pa.int64()), ("__b", pa.int64())]
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["q"] = np.floor(df["l_quantity"].to_numpy() + 0.5).astype("int64")
        g = df.groupby(["l_returnflag", "q"], as_index=False).agg(
            n=("q", "size")
        )
        g["__b"] = (g["q"].to_numpy() % nb).astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False, schema=_schema)

    def sum_cells(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["l_returnflag", "q"], as_index=False)["n"].sum()

    cells = (
        li.map_batches(partial, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(sum_cells, batch_format="pandas")
        .to_pandas()
    )
    out = []
    for flag, g in cells.groupby("l_returnflag"):
        g = g.sort_values(["n", "q"], ascending=[False, True])
        out.append((flag, int(g["q"].iloc[0]), int(g["n"].iloc[0]),
                    int(g["n"].sum())))
    return (
        pd.DataFrame(out, columns=["l_returnflag", "mode_qty", "n_mode", "n_rows"])
        .sort_values("l_returnflag").reset_index(drop=True)
        .astype({"mode_qty": "int64", "n_mode": "int64", "n_rows": "int64"})
    )


def orders_ivm_agg(sf_dir: str) -> pd.DataFrame:
    """INCREMENTAL VIEW MAINTENANCE — update a grouped aggregate from a
    CDC delta WITHOUT re-aggregating the new snapshot (the O(|delta|)
    path every materialized-view engine runs).  Uses the same
    deterministic v1→v2 rule as ``orders_diff`` (keys ≡ 0 mod 97
    deleted, URGENT orders bumped +1.00, keys ≡ 0 mod 101 re-inserted
    shifted), so the oracle can rebuild v2 in SQL and aggregate it
    directly — the engine's base ⊕ delta merge must land on exactly
    that.

    Per priority group: the v1 aggregate, the delta aggregate (computed
    from delta rows ONLY), and their merge — with the IVM identity
    n_v2 = n_v1 + d_n, sum_v2 = sum_v1 + d_sum baked into the output.

    Scale shape: ONE streaming pass over v1 emits per-batch integer
    partials for BOTH the base and the delta aggregate (≤ |priorities|
    rows per block — pure combiner, no data-sized exchange); the driver
    folds ≤ |groups| rows.  At 100 TB the base aggregate would already
    be materialized and only the delta pass runs."""
    orders = rd.read_parquet(
        _t(sf_dir, "orders"),
        columns=["o_orderkey", "o_totalprice", "o_orderpriority"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["p"] = np.floor(
            df["o_totalprice"].to_numpy() * 100.0 + 0.5
        ).astype("int64")
        key = df["o_orderkey"].to_numpy()
        removed = key % 97 == 0
        urgent = (df["o_orderpriority"] == "1-URGENT").to_numpy()
        inserted = key % 101 == 0
        # delta contributions per v1 row (additive over groups)
        d_n = inserted.astype("int64") - removed.astype("int64")
        d_s = (
            inserted * df["p"].to_numpy()
            - removed * df["p"].to_numpy()
            # price bump applies to rows that SURVIVE into v2
            + (urgent & ~removed) * 100
        ).astype("int64")
        g = (
            pd.DataFrame({
                "o_orderpriority": df["o_orderpriority"],
                "n_v1": 1, "s_v1": df["p"], "d_n": d_n, "d_s": d_s,
            })
            .groupby("o_orderpriority", as_index=False)
            .agg(n_v1=("n_v1", "sum"), s_v1=("s_v1", "sum"),
                 d_n=("d_n", "sum"), d_s=("d_s", "sum"))
        )
        return pa.Table.from_pandas(
            g, preserve_index=False,
            schema=pa.schema([
                ("o_orderpriority", pa.string()), ("n_v1", pa.int64()),
                ("s_v1", pa.int64()), ("d_n", pa.int64()), ("d_s", pa.int64()),
            ]),
        )

    parts = orders.map_batches(partial, batch_format="pyarrow").to_pandas()
    agg = parts.groupby("o_orderpriority", as_index=False).sum()
    agg["n_v2"] = agg["n_v1"] + agg["d_n"]
    agg["sum_v2_e2"] = agg["s_v1"] + agg["d_s"]
    return (
        agg.rename(columns={"s_v1": "sum_v1_e2"})
        .sort_values("o_orderpriority").reset_index(drop=True)
        [["o_orderpriority", "n_v1", "sum_v1_e2", "d_n", "d_s",
          "n_v2", "sum_v2_e2"]]
        .astype({c: "int64" for c in
                 ["n_v1", "sum_v1_e2", "d_n", "d_s", "n_v2", "sum_v2_e2"]})
    )


def data_quality_checks(sf_dir: str) -> pd.DataFrame:
    """DATA-VALIDATION SUITE — the constraint-audit pass every 100 TB
    ingest runs before training (Great-Expectations-style): primary-key
    uniqueness, referential integrity, range and domain checks, each
    reported as (constraint_name, n_checked, n_violations).

    Scale shapes per constraint class: PK uniqueness routes the key
    column through ONE bucket exchange (in-bucket size − nunique — the
    honest exact-uniqueness cost); the big-big FK check co-shuffles
    per-batch (key, multiplicity) child partials with parent key-marker
    rows (bucket-complete membership); the small-dim FK check broadcasts
    the parent keyset once (``ray.put`` + ``np.isin``); range/domain
    checks are pure streaming combiners (zero exchange)."""
    import ray

    from .dedup import coarse_buckets

    out: list[tuple[str, int, int]] = []

    # ---- PK uniqueness: orders.o_orderkey (one bucket exchange)
    orders = rd.read_parquet(_t(sf_dir, "orders"),
                             columns=["o_orderkey", "o_custkey"])
    n_orders = orders.count()
    nb = coarse_buckets(n_orders, rows_per_task=65536)

    def route(batch: pa.Table) -> pa.Table:
        k = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"k": pa.array(k, pa.int64()),
                         "__b": pa.array(k % nb, pa.int64())})

    def dup_excess(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"x": [int(len(g) - g["k"].nunique())]})

    dups = (
        orders.map_batches(route, batch_format="pyarrow")
        .groupby("__b").map_groups(dup_excess, batch_format="pandas")
        .to_pandas()["x"].sum()
    )
    out.append(("orders_pk_unique", n_orders, int(dups)))

    # ---- small-dim FK: orders.o_custkey ⊆ customer.c_custkey (broadcast)
    cust_keys = np.sort(
        rd.read_parquet(_t(sf_dir, "customer"), columns=["c_custkey"])
        .to_pandas()["c_custkey"].to_numpy().astype(np.int64)
    )
    keys_ref = ray.put(cust_keys)

    def fk_small(batch: pa.Table) -> pa.Table:
        ks = ray.get(keys_ref)
        c = batch["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        bad = int((~np.isin(c, ks)).sum())
        return pa.table({"n": pa.array([len(c)], pa.int64()),
                         "bad": pa.array([bad], pa.int64())})

    fk1 = orders.map_batches(fk_small, batch_format="pyarrow").to_pandas()
    out.append(("orders_fk_customer", int(fk1["n"].sum()), int(fk1["bad"].sum())))

    # ---- big-big FK: lineitem.l_orderkey ⊆ orders.o_orderkey
    # (co-shuffled (key, multiplicity) child partials + parent markers)
    li = rd.read_parquet(_t(sf_dir, "lineitem"),
                         columns=["l_orderkey", "l_quantity"])
    n_li = li.count()
    nb2 = coarse_buckets(n_li, rows_per_task=65536)
    _fk_schema = pa.schema([("k", pa.int64()), ("n", pa.int64()),
                            ("__b", pa.int64())])

    def child_partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"k": batch["l_orderkey"].to_numpy(zero_copy_only=False)
             .astype(np.int64)}
        )
        g = df.groupby("k", as_index=False).agg(n=("k", "size"))
        g["__b"] = (g["k"].to_numpy() % nb2).astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False, schema=_fk_schema)

    def parent_marker(batch: pa.Table) -> pa.Table:
        k = np.unique(
            batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        )
        return pa.table({"k": pa.array(k, pa.int64()),
                         "n": pa.array(np.full(len(k), -1), pa.int64()),
                         "__b": pa.array(k % nb2, pa.int64())})

    def orphan_rows(g: pd.DataFrame) -> pd.DataFrame:
        parents = set(g.loc[g["n"] < 0, "k"].tolist())
        child = g[g["n"] > 0]
        bad = int(child.loc[~child["k"].isin(parents), "n"].sum())
        return pd.DataFrame({"x": [bad]})

    both = li.map_batches(child_partial, batch_format="pyarrow").union(
        orders.map_batches(parent_marker, batch_format="pyarrow")
    )
    orphans = (
        both.groupby("__b").map_groups(orphan_rows, batch_format="pandas")
        .to_pandas()["x"].sum()
    )
    out.append(("lineitem_fk_orders", n_li, int(orphans)))

    # ---- range/domain checks: streaming combiners, zero exchange
    def qty_range(batch: pa.Table) -> pa.Table:
        q = batch["l_quantity"].to_numpy(zero_copy_only=False)
        bad = int(((q < 1) | (q > 50)).sum())
        return pa.table({"n": pa.array([len(q)], pa.int64()),
                         "bad": pa.array([bad], pa.int64())})

    r = li.map_batches(qty_range, batch_format="pyarrow").to_pandas()
    out.append(("lineitem_qty_range", int(r["n"].sum()), int(r["bad"].sum())))

    ev = rd.read_parquet(_t(sf_dir, "events"), columns=["value", "user_id"])

    def value_cap(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        u = batch["user_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "n": pa.array([len(v)], pa.int64()),
            "cap": pa.array([int((v > 450.0).sum())], pa.int64()),
            "uid": pa.array([int((u < 1).sum())], pa.int64()),
        })

    e = ev.map_batches(value_cap, batch_format="pyarrow").to_pandas()
    out.append(("events_value_cap450", int(e["n"].sum()), int(e["cap"].sum())))
    out.append(("events_user_positive", int(e["n"].sum()), int(e["uid"].sum())))

    return (
        pd.DataFrame(out, columns=["constraint_name", "n_checked", "n_violations"])
        .sort_values("constraint_name").reset_index(drop=True)
        .astype({"n_checked": "int64", "n_violations": "int64"})
    )


def join_size_estimate(sf_dir: str, d: int = 4, w: int = 8192) -> pd.DataFrame:
    """JOIN-SIZE ESTIMATION by Count-Min inner product (Cormode &
    Muthukrishnan 2005 §4.2) — the query-optimizer primitive that
    decides broadcast vs shuffle vs skew-split BEFORE any exchange
    runs.  |A ⋈ B| = Σ_k f_A(k)·f_B(k) is estimated as
    min_r ⟨CMS_A[r], CMS_B[r]⟩; collisions only add, so the estimate is
    a certified UPPER-side bracket: exact ≤ est ≤ exact + (e/w)·|A|·|B|
    per row (min over d rows in practice far tighter).

    Scale shape: each side streams once, emitting one d×w sketch per
    batch (exact elementwise-sum combiners — d·w·8 bytes per block, no
    key exchange at all); the EXACT twin answer rides one (key,
    multiplicity)-bucket co-shuffle for the test/report.  Output: one
    row with both sizes, the estimate, and the certified slack."""
    import math

    from ..functions.sketch import CountMinSketch
    from .dedup import coarse_buckets

    li = rd.read_parquet(_t(sf_dir, "lineitem"), columns=["l_orderkey"])
    orders = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderkey"])

    def sketch_side(col: str):
        def fn(batch: pa.Table) -> pa.Table:
            k = batch[col].to_numpy(zero_copy_only=False).astype(np.uint64)
            keys, counts = np.unique(k, return_counts=True)
            cms = CountMinSketch(d, w)
            cms.add_hashes(keys, counts)
            return pa.table({"sk": pa.array([cms.to_bytes()], pa.binary()),
                             "n": pa.array([len(k)], pa.int64())})
        return fn

    def fold(ds_part) -> tuple[CountMinSketch, int]:
        rows = ds_part.to_pandas()
        cms = CountMinSketch.from_bytes(rows["sk"].iloc[0])
        for b in rows["sk"].iloc[1:]:
            cms = cms.merge(CountMinSketch.from_bytes(b))
        return cms, int(rows["n"].sum())

    cms_a, n_a = fold(li.map_batches(sketch_side("l_orderkey"),
                                     batch_format="pyarrow"))
    cms_b, n_b = fold(orders.map_batches(sketch_side("o_orderkey"),
                                         batch_format="pyarrow"))
    est = int(min(int(np.dot(cms_a.tab[r], cms_b.tab[r]))
                  for r in range(d)))
    bound = int(math.ceil(math.e / w * n_a * n_b))

    # exact join size: one (key, multiplicity)-bucket co-shuffle
    nb = coarse_buckets(n_a, rows_per_task=65536)
    _schema = pa.schema([("k", pa.int64()), ("n", pa.int64()),
                         ("side", pa.int64()), ("__b", pa.int64())])

    def side_partial(col: str, side: int):
        def fn(batch: pa.Table) -> pa.Table:
            k = batch[col].to_numpy(zero_copy_only=False).astype(np.int64)
            keys, counts = np.unique(k, return_counts=True)
            return pa.table({"k": pa.array(keys, pa.int64()),
                             "n": pa.array(counts.astype(np.int64), pa.int64()),
                             "side": pa.array(np.full(len(keys), side), pa.int64()),
                             "__b": pa.array(keys % nb, pa.int64())},
                            schema=_schema)
        return fn

    def bucket_product(g: pd.DataFrame) -> pd.DataFrame:
        a = g[g["side"] == 0].groupby("k")["n"].sum()
        b = g[g["side"] == 1].groupby("k")["n"].sum()
        j = a.to_frame("na").join(b.to_frame("nb"), how="inner")
        return pd.DataFrame({"x": [int((j["na"] * j["nb"]).sum())]})

    exact = int(
        li.map_batches(side_partial("l_orderkey", 0), batch_format="pyarrow")
        .union(orders.map_batches(side_partial("o_orderkey", 1),
                                  batch_format="pyarrow"))
        .groupby("__b").map_groups(bucket_product, batch_format="pandas")
        .to_pandas()["x"].sum()
    )
    return pd.DataFrame({
        "n_lineitem": pd.array([n_a], dtype="int64"),
        "n_orders": pd.array([n_b], dtype="int64"),
        "exact_rows": pd.array([exact], dtype="int64"),
        "est_rows": pd.array([est], dtype="int64"),
        "bound_rows": pd.array([bound], dtype="int64"),
    })


def lineitem_qty_means(sf_dir: str) -> pd.DataFrame:
    """PYTHAGOREAN MEANS — grouped arithmetic, GEOMETRIC and HARMONIC
    means (the two non-linear aggregate cousins the SUM/AVG family
    misses; geometric = rate compounding, harmonic = rate averaging).

    Exactness contract: quantities are integers 1..50, so ln(q) and 1/q
    are floored to e9/e12 INTEGERS per distinct value and summed as
    int64 — order-free and partitioning-free; each final mean is ONE
    float expression replicated verbatim in the oracle (floor parity of
    ln/recip over the whole domain verified against DuckDB).

    Scale shape: the same (flag, qty) domain-bounded histogram exchange
    as the mode aggregate — ≤ |flags|·50 rows leave any block."""
    import math

    from .dedup import coarse_buckets

    li = rd.read_parquet(_t(sf_dir, "lineitem"),
                         columns=["l_returnflag", "l_quantity"])
    nb = coarse_buckets(li.count(), rows_per_task=65536)
    _schema = pa.schema(
        [("l_returnflag", pa.string()), ("q", pa.int64()),
         ("n", pa.int64()), ("__b", pa.int64())]
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["q"] = np.floor(df["l_quantity"].to_numpy() + 0.5).astype("int64")
        g = df.groupby(["l_returnflag", "q"], as_index=False).agg(n=("q", "size"))
        g["__b"] = (g["q"].to_numpy() % nb).astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False, schema=_schema)

    def sum_cells(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["l_returnflag", "q"], as_index=False)["n"].sum()

    cells = (
        li.map_batches(partial, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(sum_cells, batch_format="pandas")
        .to_pandas()
    )
    out = []
    for flag, g in cells.groupby("l_returnflag"):
        q = g["q"].to_numpy(dtype="int64")
        nq = g["n"].to_numpy(dtype="int64")
        n = int(nq.sum())
        s_q = int((nq * q).sum())
        s_ln = int((nq * np.floor(np.log(q.astype("float64")) * 1e9)
                    .astype("int64")).sum())
        s_r = int((nq * np.floor(1e12 / q).astype("int64")).sum())
        mean_e6 = int(np.floor(float(s_q) / n * 1e6 + 0.5))
        geo_e6 = int(np.floor(
            math.exp(float(s_ln) / (float(n) * 1e9)) * 1e6 + 0.5))
        harm_e6 = int(np.floor(float(n) * 1e12 / float(s_r) * 1e6 + 0.5))
        out.append((flag, n, mean_e6, geo_e6, harm_e6))
    return (
        pd.DataFrame(out, columns=["l_returnflag", "n", "mean_e6",
                                   "geo_e6", "harm_e6"])
        .sort_values("l_returnflag").reset_index(drop=True)
        .astype({"n": "int64", "mean_e6": "int64", "geo_e6": "int64",
                 "harm_e6": "int64"})
    )


def _morton_interleave16(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized 16+16-bit Morton (Z-order) interleave → uint32 keys
    (a in even bits, b in odd)."""

    def spread(x: np.ndarray) -> np.ndarray:
        x = x.astype(np.uint64) & np.uint64(0xFFFF)
        x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF)
        x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F)
        x = (x | (x << np.uint64(2))) & np.uint64(0x33333333)
        x = (x | (x << np.uint64(1))) & np.uint64(0x55555555)
        return x

    return spread(a) | (spread(b) << np.uint64(1))


def events_zorder_prune_stats(
    sf_dir: str, work_dir: str | None = None, row_group_size: int = 512
) -> pd.DataFrame:
    """Z-ORDER (Morton space-filling-curve) DATA LAYOUT — the
    multi-column clustering trick behind Delta/Iceberg ZORDER BY: sort
    rows by the bit-interleave of (user_id, day) so parquet row-group
    min/max stats prune reads for filters on EITHER or BOTH columns,
    where a 1-D sort prunes only its own column.

    The operator writes the events table twice — sorted by user_id
    (the naive layout) and by the Morton key — with small row groups,
    then scores three representative filter boxes (user-only, day-only,
    user×day) purely from parquet FOOTER metadata (row-group min/max
    overlap — exactly what a reader's predicate pushdown consults; no
    data is read to score).  Output: row groups touched per (layout,
    query), the measurable 'prune at the read' win.

    Scale shape: key computation is a stateless vectorized pass; each
    layout is ONE range-partitioned sort + streaming write; scoring
    walks footers only.  Rows-only (layout physics, not SQL); the twin
    asserts both layouts return identical query answers and pins the
    pruning invariants."""
    import os

    import pyarrow.parquet as _pq

    sf_tag = os.path.basename(os.path.normpath(sf_dir))
    work = work_dir or f"/tmp/opps_feedcrawler_ray/zorder-{sf_tag}"
    ev = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["event_id", "user_id", "ts"])

    # global day origin + extents (one tiny combiner) — the filter boxes
    # below are FRACTIONS of the data's own (user, day) extents so the
    # operator is scale-factor independent
    def extent(b: pa.Table) -> pa.Table:
        d = (b["ts"].to_numpy(zero_copy_only=False)
             .astype("datetime64[D]").astype("int64"))
        u = b["user_id"].to_numpy(zero_copy_only=False).astype("int64")
        return pa.table({"dlo": pa.array([int(d.min())], pa.int64()),
                         "dhi": pa.array([int(d.max())], pa.int64()),
                         "uhi": pa.array([int(u.max())], pa.int64())})

    ext = ev.map_batches(extent, batch_format="pyarrow").to_pandas()
    lo_day = int(ext["dlo"].min())
    n_days = int(ext["dhi"].max()) - lo_day + 1
    n_users = int(ext["uhi"].max()) + 1

    def add_keys(batch: pa.Table) -> pa.Table:
        u = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        day = (
            batch["ts"].to_numpy(zero_copy_only=False)
            .astype("datetime64[D]").astype("int64") - lo_day
        )
        z = _morton_interleave16(u.astype(np.uint64), day.astype(np.uint64))
        return pa.table({
            "event_id": batch["event_id"],
            "user_id": pa.array(u, pa.int64()),
            "day": pa.array(day.astype(np.int64), pa.int64()),
            "zkey": pa.array(z.astype(np.int64), pa.int64()),
        })

    keyed_ds = ev.map_batches(add_keys, batch_format="pyarrow")
    layouts = {
        "user_sorted": keyed_ds.sort("user_id"),
        "zorder": keyed_ds.sort("zkey"),
    }
    import shutil

    u1, u2 = n_users // 8, n_users // 4          # a 1/8-wide user slice
    d1, d2 = n_days // 4, n_days // 2            # a 1/4-wide day slice
    boxes = {
        "user_box": (u1, u2, None, None),
        "day_box": (None, None, d1, d2),
        "user_day_box": (u1, u2, d1, d2),
    }
    out = []
    for name, ds_sorted in layouts.items():
        path = os.path.join(work, name)
        shutil.rmtree(path, ignore_errors=True)
        ds_sorted.write_parquet(path, row_group_size=row_group_size)
        rgs = []  # (u_min, u_max, d_min, d_max) per row group
        for fn in sorted(os.listdir(path)):
            if not fn.endswith(".parquet"):
                continue
            pf = _pq.ParquetFile(os.path.join(path, fn))
            ui = pf.schema_arrow.names.index("user_id")
            di = pf.schema_arrow.names.index("day")
            for g in range(pf.metadata.num_row_groups):
                rg = pf.metadata.row_group(g)
                su, sd = rg.column(ui).statistics, rg.column(di).statistics
                rgs.append((su.min, su.max, sd.min, sd.max))
        for qname, (ulo, uhi, dlo, dhi) in boxes.items():
            touched = 0
            for (umin, umax, dmin, dmax) in rgs:
                if ulo is not None and (umax < ulo or umin >= uhi):
                    continue
                if dlo is not None and (dmax < dlo or dmin >= dhi):
                    continue
                touched += 1
            out.append((name, qname, len(rgs), touched))
    return (
        pd.DataFrame(out, columns=["layout", "query", "n_rowgroups", "touched"])
        .sort_values(["layout", "query"]).reset_index(drop=True)
        .astype({"n_rowgroups": "int64", "touched": "int64"})
    )


def revenue_monthly_sortmerge(sf_dir: str) -> pd.DataFrame:
    """Monthly gross revenue via the RANGE-PARTITIONED SORT-MERGE join
    (``functions.joins.sort_merge_join``) — the ordered-partition join
    strategy, oracle-checked against the plain SQL join so the routing
    + merge machinery is hash-verified end-to-end.

    Scale shape: one boundary sample of the left keys, ONE ordered-range
    exchange for both sides, per-range sorted merges; the joined stream
    reduces through a |months|-bounded combiner."""
    from ..functions.joins import sort_merge_join

    li = rd.read_parquet(_t(sf_dir, "lineitem"),
                         columns=["l_orderkey", "l_extendedprice"])
    orders = rd.read_parquet(_t(sf_dir, "orders"),
                             columns=["o_orderkey", "o_orderdate"])

    def prep_o(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        return pa.Table.from_pandas(
            pd.DataFrame({
                "l_orderkey": df["o_orderkey"].astype("int64"),
                "month": df["o_orderdate"].astype("datetime64[ns]")
                .dt.strftime("%Y-%m"),
            }),
            preserve_index=False,
            schema=pa.schema([("l_orderkey", pa.int64()), ("month", pa.string())]),
        )

    om = orders.map_batches(prep_o, batch_format="pyarrow")
    joined = sort_merge_join(li, om, on="l_orderkey", n_ranges=32)

    _schema = pa.schema([("month", pa.string()), ("n_items", pa.int64()),
                         ("revenue_e2", pa.int64())])

    def partial(batch: pd.DataFrame) -> pa.Table:
        p = np.floor(
            batch["l_extendedprice"].to_numpy() * 100.0 + 0.5
        ).astype("int64")
        g = pd.DataFrame({"month": batch["month"], "n_items": 1,
                          "revenue_e2": p}).groupby(
            "month", as_index=False
        ).sum()
        return pa.Table.from_pandas(g, preserve_index=False, schema=_schema)

    return (
        joined.map_batches(partial, batch_format="pandas").to_pandas()
        .groupby("month", as_index=False)[["n_items", "revenue_e2"]].sum()
        .sort_values("month").reset_index(drop=True)
        .astype({"n_items": "int64", "revenue_e2": "int64"})
    )


def lineitem_exact_median_price(sf_dir: str) -> pd.DataFrame:
    """EXACT DISTRIBUTED SELECTION on an UNBOUNDED domain — the lower
    median of l_extendedprice found by iterative MULTI-PIVOT range
    narrowing (the classic k-th-element algorithm for data that does
    not fit a value histogram): each pass counts rows into 256 equal
    sub-ranges of the current [lo, hi] bracket (a ≤256-row combiner per
    block, no exchange), the driver picks the sub-range containing the
    k-th element, and recursion stops when the bracket collapses —
    ⌈log₂₅₆(range)⌉ ≈ 3–4 streaming passes total, each cheaper than one
    shuffle.  Complements the bounded-domain histogram median
    (``events_median_value``) where a full value census is impossible.

    Oracle-exact: the k-th order statistic is an integer; DuckDB
    reproduces it by ORDER BY/OFFSET."""
    li = rd.read_parquet(_t(sf_dir, "lineitem"), columns=["l_extendedprice"])

    def to_e2(batch: pa.Table) -> np.ndarray:
        return np.floor(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0
            + 0.5
        ).astype("int64")

    def extent(batch: pa.Table) -> pa.Table:
        p = to_e2(batch)
        return pa.table({"lo": pa.array([int(p.min())], pa.int64()),
                         "hi": pa.array([int(p.max())], pa.int64()),
                         "n": pa.array([len(p)], pa.int64())})

    ext = li.map_batches(extent, batch_format="pyarrow").to_pandas()
    lo, hi = int(ext["lo"].min()), int(ext["hi"].max())
    n = int(ext["n"].sum())
    k = (n + 1) // 2  # lower median
    passes = 0
    while hi > lo:
        passes += 1
        width = max(1, (hi - lo + 1 + 255) // 256)
        base_lo, base_w = lo, width

        def bucket_counts(batch: pa.Table) -> pa.Table:
            p = to_e2(batch)
            m = (p >= base_lo) & (p < base_lo + 256 * base_w)
            b = (p[m] - base_lo) // base_w
            below = int((p < base_lo).sum())
            bb, cc = np.unique(b, return_counts=True)
            return pa.table({
                "b": pa.array(np.concatenate([[-1], bb]), pa.int64()),
                "c": pa.array(
                    np.concatenate([[below], cc]).astype("int64"), pa.int64()),
            })

        cnt = (
            li.map_batches(bucket_counts, batch_format="pyarrow").to_pandas()
            .groupby("b")["c"].sum()
        )
        below = int(cnt.get(-1, 0))
        cum = below
        for bi in range(256):
            c = int(cnt.get(bi, 0))
            if cum + c >= k:
                lo = base_lo + bi * base_w
                hi = min(hi, base_lo + (bi + 1) * base_w - 1)
                break
            cum += c
        else:  # k beyond the bracket (cannot happen with exact extents)
            break
    del passes  # diagnostic only; the oracle cannot express pass counts
    return pd.DataFrame({
        "n": pd.array([n], dtype="int64"),
        "k": pd.array([k], dtype="int64"),
        "median_e2": pd.array([lo], dtype="int64"),
    })


def orders_pit_join(sf_dir: str) -> pd.DataFrame:
    """POINT-IN-TIME (temporal) JOIN — facts matched to the SCD2
    dimension version valid AT FACT TIME, the warehouse operator that
    ``asof`` (nearest event) and plain equi-joins cannot express: each
    lineitem, at its SHIP date, picks the customer-priority version
    (built by the exact ``orders_scd2`` rule) whose
    [valid_from, valid_to) interval contains that day.  Same-day
    version changes resolve to the highest version (empty intervals
    match nothing) — identical to the oracle's BETWEEN semantics.

    Scale shape: TWO co-shuffles and nothing else — (1) an
    orderkey-bucket exchange attaches custkey to each fact, (2) a
    custkey-bucket exchange co-locates facts with the dimension-source
    rows; inside each bucket the SCD2 build is the shared grouped
    kernel and the interval lookup is ONE ``merge_asof`` over all
    customers at once (backward-last ≡ interval containment because
    consecutive intervals abut).  Each bucket emits ≤ |priorities| ×
    |versions| partial rows; the driver folds a tiny frame."""
    from .dedup import coarse_buckets

    li = rd.read_parquet(
        _t(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_quantity", "l_shipdate"],
    )
    orders = rd.read_parquet(
        _t(sf_dir, "orders"),
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
    )
    nb = coarse_buckets(li.count(), rows_per_task=65536)

    s1 = pa.schema([("k", pa.int64()), ("q", pa.int64()), ("day", pa.int64()),
                    ("side", pa.int64()), ("__b", pa.int64())])

    def li_partial(batch: pa.Table) -> pa.Table:
        k = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype("int64")
        q = np.floor(
            batch["l_quantity"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype("int64")
        day = (batch["l_shipdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
               // 86_400_000_000).astype("int64")
        return pa.table(
            {"k": k, "q": q, "day": day,
             "side": np.zeros(len(k), dtype="int64"), "__b": k % nb},
            schema=s1,
        )

    def or_partial(batch: pa.Table) -> pa.Table:
        k = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype("int64")
        c = batch["o_custkey"].to_numpy(zero_copy_only=False).astype("int64")
        return pa.table(
            {"k": k, "q": c, "day": np.zeros(len(k), dtype="int64"),
             "side": np.ones(len(k), dtype="int64"), "__b": k % nb},
            schema=s1,
        )

    def attach_cust(g: pd.DataFrame) -> pd.DataFrame:
        right = g[g["side"] == 1][["k", "q"]].rename(columns={"q": "custkey"})
        left = g[g["side"] == 0][["k", "q", "day"]]
        m = left.merge(right, on="k", how="inner")
        m["__b2"] = (m["custkey"].to_numpy() % nb).astype("int64")
        return m[["custkey", "q", "day", "__b2"]]

    facts = (
        li.map_batches(li_partial, batch_format="pyarrow")
        .union(orders.map_batches(or_partial, batch_format="pyarrow"))
        .groupby("__b")
        .map_groups(attach_cust, batch_format="pandas")
    )

    s2 = pa.schema([("custkey", pa.int64()), ("q", pa.int64()),
                    ("day", pa.int64()), ("prio", pa.string()),
                    ("okey", pa.int64()), ("side", pa.int64()),
                    ("__b2", pa.int64())])

    def fact_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {"custkey": batch["custkey"], "q": batch["q"], "day": batch["day"],
             "prio": pa.array([""] * n, pa.string()),
             "okey": np.zeros(n, dtype="int64"),
             "side": np.zeros(n, dtype="int64"), "__b2": batch["__b2"]},
            schema=s2,
        )

    def dim_rows(batch: pa.Table) -> pa.Table:
        c = batch["o_custkey"].to_numpy(zero_copy_only=False).astype("int64")
        day = (batch["o_orderdate"].cast(pa.int64())
               .to_numpy(zero_copy_only=False) // 86_400_000_000).astype("int64")
        return pa.table(
            {"custkey": c, "q": np.zeros(len(c), dtype="int64"), "day": day,
             "prio": batch["o_orderpriority"],
             "okey": batch["o_orderkey"].to_numpy(zero_copy_only=False)
             .astype("int64"),
             "side": np.ones(len(c), dtype="int64"), "__b2": c % nb},
            schema=s2,
        )

    def pit(g: pd.DataFrame) -> pd.DataFrame:
        ch = _scd2_change_rows(
            g[g["side"] == 1], "custkey", "day", "okey", "prio"
        ).rename(columns={"day": "vf"})
        f = g[g["side"] == 0][["custkey", "q", "day"]].sort_values("day")
        ch = ch.sort_values(["vf", "version"], kind="stable")
        m = pd.merge_asof(
            f, ch[["custkey", "vf", "prio", "version"]],
            left_on="day", right_on="vf", by="custkey", direction="backward",
        )
        m = m.dropna(subset=["version"])
        out = m.groupby(["prio", "version"], as_index=False).agg(
            n_items=("q", "size"), sum_qty_e2=("q", "sum")
        )
        out["version"] = out["version"].astype("int64")
        out["n_items"] = out["n_items"].astype("int64")
        out["sum_qty_e2"] = out["sum_qty_e2"].astype("int64")
        return out.rename(columns={"prio": "priority"})

    cells = (
        facts.map_batches(fact_rows, batch_format="pyarrow")
        .union(orders.map_batches(dim_rows, batch_format="pyarrow"))
        .groupby("__b2")
        .map_groups(pit, batch_format="pandas")
        .to_pandas()
    )
    out = cells.groupby(["priority", "version"], as_index=False).agg(
        n_items=("n_items", "sum"), sum_qty_e2=("sum_qty_e2", "sum")
    )
    return (
        out.sort_values(["priority", "version"]).reset_index(drop=True)
        .astype({"version": "int64", "n_items": "int64", "sum_qty_e2": "int64"})
    )


def part_name_similarity_join(sf_dir: str, k: int = 2) -> pd.DataFrame:
    """STRING SIMILARITY JOIN — all distinct part-name pairs within
    Levenshtein distance ``k``, via FastSS / SymSpell deletion-
    neighborhood blocking (Bocek et al. 2007): if ed(a, b) <= k the two
    names share a variant reachable by <= k character deletions from
    each, so grouping on variant fingerprints yields a candidate
    SUPERSET; an exact DP verify inside pair-hash buckets makes the
    result exact (never all-pairs).  Complements
    ``part_fuzzy_name_match`` (probe-vs-vocabulary at ed <= 1,
    first-char blocking): this is the full SELF-join at ed <= 2 with a
    blocking scheme whose recall is provable, not heuristic.

    Scale shape: the neighborhood expansion runs per DISTINCT name per
    batch (dictionary-bounded, ~|name|^k variants each); ONE variant
    exchange emits candidate pairs (np.triu over <=bucket-size name
    lists); pair-hash buckets dedupe globally and verify with the
    O(|a|·|b|) DP on candidates only."""
    from ..functions.hashing import fingerprint64_batch
    from .dedup import coarse_buckets

    parts = rd.read_parquet(_t(sf_dir, "part"), columns=["p_name"])
    nb = coarse_buckets(parts.count(), rows_per_task=65536)

    s1 = pa.schema([("variant", pa.int64()), ("name", pa.string())])

    def variants(batch: pa.Table) -> pa.Table:
        names = pc.unique(batch["p_name"]).to_pylist()
        vh, nm = [], []
        for name in names:
            seen = {name}
            frontier = {name}
            for _ in range(k):
                nxt = set()
                for s in frontier:
                    for i in range(len(s)):
                        t = s[:i] + s[i + 1:]
                        if t not in seen:
                            seen.add(t)
                            nxt.add(t)
                frontier = nxt
            vh.extend(seen)
            nm.extend([name] * len(seen))
        fp = fingerprint64_batch(vh).astype("int64")
        return pa.table({"variant": fp, "name": pa.array(nm, pa.string())},
                        schema=s1)

    def cand_pairs(g: pd.DataFrame) -> pd.DataFrame:
        names = np.unique(g["name"].to_numpy())
        if len(names) < 2:
            return pd.DataFrame({"name_a": pd.Series([], dtype="object"),
                                 "name_b": pd.Series([], dtype="object"),
                                 "__pb": pd.Series([], dtype="int64")})
        i, j = np.triu_indices(len(names), 1)
        a, b = names[i], names[j]
        pb = (
            fingerprint64_batch([x + "\x1f" + y for x, y in zip(a, b)])
            .astype("int64") % nb
        )
        return pd.DataFrame({"name_a": a, "name_b": b, "__pb": pb})

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        from ..functions.text import levenshtein

        g = g.drop_duplicates(["name_a", "name_b"])
        d = np.array(
            [levenshtein(a, b, cap=k)
             for a, b in zip(g["name_a"], g["name_b"])],
            dtype="int64",
        )
        out = g.assign(dist=d)
        return out[out["dist"] <= k][["name_a", "name_b", "dist"]]

    def batch_names(b: pa.Table) -> pa.Table:
        return pa.table({"p_name": pc.unique(b["p_name"])})

    def first_name(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    # global name dedup BEFORE the neighborhood expansion, so a name
    # repeated across batches pays the O(|name|^k) expansion once
    names = (
        parts.map_batches(batch_names, batch_format="pyarrow")
        .groupby("p_name")
        .map_groups(first_name, batch_format="pandas")
    )

    out = (
        names.map_batches(variants, batch_format="pyarrow")
        .groupby("variant")
        .map_groups(cand_pairs, batch_format="pandas")
        .groupby("__pb")
        .map_groups(verify, batch_format="pandas")
        .to_pandas()
    )
    return (
        out.drop_duplicates(["name_a", "name_b"])
        .sort_values(["name_a", "name_b"]).reset_index(drop=True)
        .astype({"dist": "int64"})
    )


def part_fd_discovery(sf_dir: str) -> pd.DataFrame:
    """FUNCTIONAL-DEPENDENCY DISCOVERY (the TANE level-1 pass,
    Huhtala et al. 1999): for every ordered column pair (lhs, rhs) of
    the part table, whether lhs → rhs holds, with the exact number of
    violating lhs values (lhs groups containing >1 distinct rhs) — the
    data-profiling primitive schema-inference and key-detection tools
    are built on, beyond ``table_profile``'s per-column stats.

    Scale shape: per-batch distinct (pair, lhs, rhs) partials → ONE
    exchange bucketed by hash(pair, lhs) so every lhs group is
    bucket-complete → per-bucket violating-lhs counts (≤ |pairs| rows
    each) SUM exactly on the driver.  The exchange carries |pairs| ×
    distinct rows — TANE prunes the lattice level by level exactly to
    bound this."""
    from ..functions.hashing import fingerprint64_batch
    from .dedup import coarse_buckets

    cols = ["p_partkey", "p_name", "p_brand", "p_type", "p_size"]
    parts = rd.read_parquet(_t(sf_dir, "part"), columns=cols)
    nb = coarse_buckets(parts.count(), rows_per_task=16384)

    s1 = pa.schema([("pid", pa.int64()), ("a", pa.string()),
                    ("b", pa.string()), ("__b", pa.int64())])
    pairs = [(i, j) for i in range(len(cols)) for j in range(len(cols))
             if i != j]

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        outs = []
        for pid, (i, j) in enumerate(pairs):
            # match COUNT(DISTINCT rhs) semantics: NULL rhs never counts;
            # NULL lhs is one group (its string form plays that role)
            mask = df[cols[j]].notna()
            d = pd.DataFrame({
                "a": df[cols[i]][mask].astype(str),
                "b": df[cols[j]][mask].astype(str),
            }).drop_duplicates()
            d.insert(0, "pid", np.int64(pid))
            outs.append(d)
        out = pd.concat(outs, ignore_index=True)
        key = (out["pid"].astype(str) + "\x1f" + out["a"]).tolist()
        out["__b"] = fingerprint64_batch(key).astype("int64") % nb
        return pa.Table.from_pandas(out, schema=s1, preserve_index=False)

    def violations(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["pid", "a", "b"])
        per_lhs = d.groupby(["pid", "a"], as_index=False).agg(
            nb_=("b", "nunique")
        )
        out = (
            per_lhs[per_lhs["nb_"] > 1]
            .groupby("pid", as_index=False).size()
            .rename(columns={"size": "n_violating"})
        )
        return out.astype({"pid": "int64", "n_violating": "int64"})

    cells = (
        parts.map_batches(partial, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(violations, batch_format="pandas")
        .to_pandas()
    )
    agg = dict(
        cells.groupby("pid")["n_violating"].sum()
    ) if len(cells) else {}
    rows = [
        (cols[i], cols[j], int(agg.get(pid, 0)),
         1 if agg.get(pid, 0) == 0 else 0)
        for pid, (i, j) in enumerate(pairs)
    ]
    out = pd.DataFrame(
        rows, columns=["lhs", "rhs", "n_violating", "holds"]
    ).astype({"n_violating": "int64", "holds": "int64"})
    return out.sort_values(["lhs", "rhs"]).reset_index(drop=True)
