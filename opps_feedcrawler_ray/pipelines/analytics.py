"""Driver-contract analytics pipelines over /root/testdata tables
(SURVEY.md §5.4): each function takes ``sf_dir`` and returns a Dataset /
DataFrame whose column names match the DuckDB oracle SQL exactly.

Float policy: any aggregated money/value column is computed as
``SUM(CAST(ROUND(x * 10^s) AS BIGINT))`` on BOTH sides (column suffix
``_e{s}``) — integer math end-to-end, so value hashes match regardless
of floating summation order.  Ratios/averages are derived from exact
integers and rounded to 6 digits.
"""

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


def _t(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


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


def user_event_seq(sf_dir: str) -> pd.DataFrame:
    """Streaming-shaped: per-user ordered log, sequence number per event
    (groupby user → sort by ts within group — the ordered-partition
    pattern for windowed processing)."""
    ev = rd.read_parquet(_t(sf_dir, "events"), columns=["event_id", "user_id", "ts"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"]).reset_index(drop=True)
        g["seq_in_user"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["event_id", "user_id", "seq_in_user"]]

    return ev.groupby("user_id").map_groups(per_user, batch_format="pandas").to_pandas()


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


# ------------------------------------------------------------ text ops
def token_counts(sf_dir: str) -> rd.Dataset:
    docs = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": pa.array(count_tokens(batch["text"].to_pylist()), pa.int64()),
            }
        )

    return docs.map_batches(fn, batch_format="pyarrow")


_STOPWORDS = ("the", "and", "of", "to", "a", "in", "is", "that", "it", "for")


def text_quality(sf_dir: str) -> rd.Dataset:
    """Quality signals with oracle-matching semantics: counts, not models."""
    docs = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    stop = set(_STOPWORDS)

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        n_chars_text, n_punct, n_stop = [], [], []
        for t in texts:
            t = t or ""
            n_chars_text.append(len(t))
            n_punct.append(sum(1 for ch in t if ch in ".!?,;:"))
            toks = [w for w in t.lower().split() if w]
            n_stop.append(sum(1 for w in toks if w in stop))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_chars_text": pa.array(n_chars_text, pa.int64()),
                "n_punct": pa.array(n_punct, pa.int64()),
                "n_stop": pa.array(n_stop, pa.int64()),
            }
        )

    return docs.map_batches(fn, batch_format="pyarrow")


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


def events_lag_delta(sf_dir: str) -> pd.DataFrame:
    """Windowed LAG: seconds since the user's previous event (ordered-
    partition pattern; first event per user → NULL)."""
    ev = rd.read_parquet(_t(sf_dir, "events"), columns=["event_id", "user_id", "ts"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"]).reset_index(drop=True)
        # epoch microseconds (exact ints; force µs resolution explicitly)
        us = g["ts"].astype("datetime64[us]").astype("int64")
        # first event per user has no predecessor → -1 sentinel on BOTH
        # sides (a NULL BIGINT comes back as float64 from the oracle,
        # which would break the integer value hash)
        g["delta_us"] = (us - us.shift(1)).fillna(-1).astype("int64")
        return g[["event_id", "user_id", "delta_us"]]

    return ev.groupby("user_id").map_groups(per_user, batch_format="pandas").to_pandas()


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


def doc_md5(sf_dir: str) -> rd.Dataset:
    """Oracle-checkable content fingerprint: hex MD5 of the raw text
    (hashlib.md5 ≡ DuckDB md5()); the engine's blake2b fingerprint stays
    golden-pinned in doc_fingerprints."""
    docs = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        import hashlib

        hx = [
            hashlib.md5((t or "").encode("utf-8")).hexdigest()
            for t in batch["text"].to_pylist()
        ]
        return pa.table({"doc_id": batch["doc_id"], "md5_hex": pa.array(hx, pa.string())})

    return docs.map_batches(fn, batch_format="pyarrow")


def events_moving_sum3(sf_dir: str) -> pd.DataFrame:
    """Sliding-window aggregate (ROWS BETWEEN 2 PRECEDING AND CURRENT
    ROW): per-user 3-row moving sum of value_e2, ordered by (ts,
    event_id).  Integer e2 values make the window sum order-independent
    and hash-exact vs the oracle.  Scale note: the per-user ``map_groups``
    accepts the same day-salt + 2-row boundary-carry rework as the
    ``*_salted`` family (streaming.py) when a mega-user appears."""
    ev = rd.read_parquet(
        _t(sf_dir, "events"), columns=["event_id", "user_id", "ts", "value"]
    )

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"]).reset_index(drop=True)
        # half-up e2: identical FLOOR(x*100 + 0.5) expression on both sides
        v = np.floor(g["value"].to_numpy() * 100.0 + 0.5).astype("int64")
        m = v.copy()
        if len(m) > 1:
            m[1:] += v[:-1]
        if len(m) > 2:
            m[2:] += v[:-2]
        return pd.DataFrame(
            {"event_id": g["event_id"].to_numpy(),
             "user_id": g["user_id"].to_numpy(),
             "msum_e2": m}
        )

    return ev.groupby("user_id").map_groups(per_user, batch_format="pandas").to_pandas()


def user_event_pattern_counts(sf_dir: str) -> pd.DataFrame:
    """MATCH_RECOGNIZE-style sequence pattern matching: per user, count
    non-overlapping ``view+ click+ purchase`` runs in the time-ordered
    event stream (regex over the event-initial string — event types have
    distinct initials).  Shape: ONE user-keyed coarse-bucket exchange;
    inside each bucket the sort + per-user char-join build the sequences
    (bounded: a user's whole stream fits a task — the same assumption
    the as-of family documents) and one vectorized ``.str.count`` scores
    every user at once.  Both sides count with the identical regex, so
    non-overlapping greedy semantics match exactly."""
    ev = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "event_type", "ts", "event_id"])
    nb = 64

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.assign(ch=b["event_type"].str[0])
        b["__b"] = (b["user_id"].to_numpy(dtype="int64") % nb).astype("int64")
        return b[["user_id", "ch", "ts", "event_id", "__b"]]

    _oschema = pa.schema([("user_id", pa.int64()), ("n_funnels", pa.int64())])

    def bucket(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["user_id", "ts", "event_id"])
        seq = g.groupby("user_id", sort=True)["ch"].agg("".join)
        out = pd.DataFrame(
            {"user_id": seq.index.to_numpy(dtype="int64"),
             "n_funnels": seq.str.count("v+c+p").to_numpy(dtype="int64")}
        )
        return pa.Table.from_pandas(out, preserve_index=False, schema=_oschema)

    return (
        ev.map_batches(add_bucket, batch_format="pandas")
        .groupby("__b")
        .map_groups(bucket, batch_format="pandas")
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )


def purchase_click_days_bag(sf_dir: str) -> pd.DataFrame:
    """INTERSECT ALL — BAG semantics (completes the set-op family next
    to the distinct INTERSECT/EXCEPT): multiset intersection of the
    (user, day) occurrences of purchases and clicks, i.e. per key
    ``min(n_purchase, n_click)`` copies survive.  Shape: per-batch
    (user, day) per-side count combiner → ONE user-keyed coarse-bucket
    exchange (equal keys share a bucket) → vectorized per-key min; keys
    with a zero side vanish, exactly like SQL INTERSECT ALL."""
    ev = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "event_type", "ts"])
    nb = 64

    _pschema = pa.schema(
        [("user_id", pa.int64()), ("day", pa.timestamp("ns")),
         ("p", pa.int64()), ("c", pa.int64()), ("__b", pa.int64())]
    )

    def partial(b: pd.DataFrame) -> pa.Table:
        b = b[b["event_type"].isin(("purchase", "click"))]
        b = b.assign(day=b["ts"].dt.floor("D"))
        g = b.groupby(["user_id", "day", "event_type"], as_index=False).agg(
            n=("event_type", "size")
        )
        is_p = g["event_type"].to_numpy() == "purchase"
        n = g["n"].to_numpy(dtype="int64")
        g = g.assign(p=np.where(is_p, n, 0), c=np.where(is_p, 0, n))
        g = g.assign(__b=(g["user_id"].to_numpy(dtype="int64") % nb))
        return pa.Table.from_pandas(
            g[["user_id", "day", "p", "c", "__b"]], preserve_index=False,
            schema=_pschema,
        )

    _oschema = pa.schema(
        [("user_id", pa.int64()), ("day", pa.timestamp("ns")), ("n", pa.int64())]
    )

    def bucket(g: pd.DataFrame) -> pa.Table:
        s = g.groupby(["user_id", "day"], as_index=False)[["p", "c"]].sum()
        s = s.assign(n=np.minimum(s["p"].to_numpy(), s["c"].to_numpy()))
        s = s[s["n"] > 0]
        return pa.Table.from_pandas(
            s[["user_id", "day", "n"]], preserve_index=False, schema=_oschema
        )

    return (
        ev.map_batches(partial, batch_format="pandas")
        .groupby("__b")
        .map_groups(bucket, batch_format="pandas")
        .to_pandas()
        .sort_values(["user_id", "day"])
        .reset_index(drop=True)
    )


def segment_event_chi2(sf_dir: str) -> pd.DataFrame:
    """Chi-square test of independence between customer segment and
    event type — the statistical-hypothesis-testing aggregate (are the
    two categoricals associated?).  Shape: broadcast dim join + per-batch
    (segment, type) count combiner → ONE exchange bounded by the
    |segments|·|types| contingency table; the statistic (observed vs
    expected under independence) is vectorized driver math over those
    ≤25 cells, rounded to integer e6 with the oracle's expression."""
    ev = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "event_type"])
    cust = pd.read_parquet(
        _t(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"]
    ).rename(columns={"c_custkey": "user_id"})
    joined = broadcast_join(ev, cust, on="user_id")

    _schema = pa.schema(
        [("seg", pa.string()), ("et", pa.string()), ("o", pa.int64())]
    )

    def partial(b: pd.DataFrame) -> pa.Table:
        g = (
            b.rename(columns={"c_mktsegment": "seg", "event_type": "et"})
            .groupby(["seg", "et"], as_index=False)
            .agg(o=("et", "size"))
        )
        return pa.Table.from_pandas(g, preserve_index=False, schema=_schema)

    c = (
        joined.map_batches(partial, batch_format="pandas")
        .groupby(["seg", "et"])
        .sum("o")
        .to_pandas()
        .rename(columns={"sum(o)": "o"})
    )
    o = c["o"].to_numpy(dtype="float64")
    rt = c.groupby("seg")["o"].transform("sum").to_numpy(dtype="float64")
    ct = c.groupby("et")["o"].transform("sum").to_numpy(dtype="float64")
    n = o.sum()
    e = rt * ct / n
    chi2 = float((np.power(o - e, 2) / e).sum())
    return pd.DataFrame(
        {
            "n_cells": pd.array([len(c)], dtype="int64"),
            "dof": pd.array(
                [(c["seg"].nunique() - 1) * (c["et"].nunique() - 1)], dtype="int64"
            ),
            "chi2_e6": pd.array([int(np.floor(chi2 * 1e6 + 0.5))], dtype="int64"),
        }
    )


def users_weekly_purchasers(sf_dir: str) -> pd.DataFrame:
    """Relational DIVISION (the classic "FOR ALL" query): users with at
    least one purchase in EVERY week the corpus has purchases.  Shape:
    per-batch distinct (user, week) combiner → ONE exchange bounded by
    |users|·|weeks| distinct pairs; the divisor cardinality and the
    per-user week counts are tiny follow-up aggregates over that pinned
    pair set.  Week = Monday-start truncation, the same rule as SQL
    ``date_trunc('week', ts)``."""
    ev = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "event_type", "ts"])
    nb = 64

    _schema = pa.schema(
        [("user_id", pa.int64()), ("week", pa.timestamp("ns")), ("__b", pa.int64())]
    )

    def partial(b: pd.DataFrame) -> pa.Table:
        b = b[b["event_type"] == "purchase"]
        d = b["ts"].dt.normalize()
        b = b.assign(week=d - pd.to_timedelta(d.dt.dayofweek, unit="D"))
        d2 = b[["user_id", "week"]].drop_duplicates()
        # user-keyed coarse bucket: ALL of a user's pair rows land in one
        # bucket task, so the per-user distinct-week count completes there
        d2 = d2.assign(__b=(d2["user_id"].to_numpy(dtype="int64") % nb))
        return pa.Table.from_pandas(d2, preserve_index=False, schema=_schema)

    def bucket_counts(g: pd.DataFrame) -> pa.Table:
        c = (
            g[["user_id", "week"]].drop_duplicates()
            .groupby("user_id", as_index=False)
            .agg(nw=("week", "size"))
        )
        return pa.Table.from_pandas(
            c, preserve_index=False,
            schema=pa.schema([("user_id", pa.int64()), ("nw", pa.int64())]),
        )

    dist = ev.map_batches(partial, batch_format="pandas").materialize()
    # divisor cardinality: per-block unique weeks → driver union (no shuffle)
    wk = dist.map_batches(
        lambda t: pa.table({"week": pc.unique(t["week"])}), batch_format="pyarrow"
    ).to_pandas()
    n_weeks = wk["week"].nunique()
    per_user = (
        dist.groupby("__b").map_groups(bucket_counts, batch_format="pandas").to_pandas()
    )
    out = per_user.loc[per_user["nw"] == n_weeks, ["user_id"]]
    return out.sort_values("user_id").reset_index(drop=True)


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


def source_lang_entropy(sf_dir: str) -> pd.DataFrame:
    """Corpus-mix diagnostics: Shannon entropy of each source's language
    distribution — the information-theoretic aggregate data-mixing
    dashboards track.  Shape: per-batch (source, lang) count combiner →
    ONE exchange bounded by |sources|·|langs|; the entropy itself is
    computed on the driver from that bounded table (grouped vectorized
    p·ln p, rounded to e6 with the same floor(x+0.5) the oracle uses)."""
    docs = rd.read_parquet(_t(sf_dir, "documents"), columns=["source", "lang"])

    _schema = pa.schema(
        [("source", pa.string()), ("lang", pa.string()), ("n", pa.int64())]
    )

    def partial(b: pd.DataFrame) -> pa.Table:
        g = b.groupby(["source", "lang"], as_index=False).agg(n=("lang", "size"))
        return pa.Table.from_pandas(g, preserve_index=False, schema=_schema)

    c = (
        docs.map_batches(partial, batch_format="pandas")
        .groupby(["source", "lang"])
        .sum("n")
        .to_pandas()
        .rename(columns={"sum(n)": "n"})
    )
    tot = c.groupby("source")["n"].transform("sum").to_numpy(dtype="float64")
    p = c["n"].to_numpy(dtype="float64") / tot
    c = c.assign(term=-(p * np.log(p)))
    out = c.groupby("source", as_index=False).agg(
        n_langs=("lang", "size"), s=("term", "sum")
    )
    out["entropy_e6"] = np.floor(out["s"].to_numpy() * 1e6 + 0.5).astype("int64")
    return (
        out[["source", "n_langs", "entropy_e6"]]
        .astype({"n_langs": "int64"})
        .sort_values("source")
        .reset_index(drop=True)
    )


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


def active_users_7d(sf_dir: str) -> pd.DataFrame:
    """Trailing-window DISTINCT-COUNT: per (event_type, day), users
    active in the trailing 7 days — the window × distinct combination
    no cumsum trick covers (a user seen twice in the window must count
    once).  Shape: (1) BATCH-LOCAL distinct (type, user, day) — volume
    reduction only, no global dedup exchange needed, since the final
    in-group ``nunique`` dedups cross-batch repeats implicitly; (2) each
    triple fans out to its ≤7 visible days (bounded ×7, filtered to the
    observed-day spine broadcast via ``ray.put``); (3) the single
    all-to-all: one (type, day) exchange with an in-group ``nunique`` —
    group count is |types|·|days|, group size ≤ 7·|users| per batch
    source.  The reduced triple set is materialized because the spine
    derives from it; at true scale recompute instead of pinning."""
    import ray

    ev = rd.read_parquet(_t(sf_dir, "events"), columns=["event_type", "user_id", "ts"])

    _tschema = pa.schema(
        [("event_type", pa.string()), ("user_id", pa.int64()),
         ("day", pa.timestamp("ns"))]
    )

    def dedup_partial(b: pd.DataFrame) -> pa.Table:
        b = b.assign(day=b["ts"].dt.floor("D"))
        return pa.Table.from_pandas(
            b[["event_type", "user_id", "day"]].drop_duplicates(),
            preserve_index=False, schema=_tschema,
        )

    # batch-local dedup is VOLUME REDUCTION only — no global triple
    # exchange is needed, because the final per-(type, day) ``nunique``
    # dedups cross-batch repeats implicitly.  ONE all-to-all total.
    acts = ev.map_batches(dedup_partial, batch_format="pandas").materialize()
    # observed-day spine: per-block unique days → driver union (no shuffle)
    spine = set(
        acts.map_batches(
            lambda t: pa.table({"day": pc.unique(t["day"])}), batch_format="pyarrow"
        ).to_pandas()["day"]
    )
    spine_ref = ray.put(spine)

    def expand(b: pd.DataFrame) -> pa.Table:
        sp = ray.get(spine_ref)
        n = len(b)
        idx = np.tile(np.arange(n), 7)
        off = np.repeat(np.arange(7), n)
        out = pd.DataFrame(
            {
                "event_type": b["event_type"].to_numpy()[idx],
                "user_id": b["user_id"].to_numpy()[idx],
                "day": b["day"].to_numpy()[idx] + off * np.timedelta64(1, "D"),
            }
        )
        return pa.Table.from_pandas(
            out[out["day"].isin(sp)], preserve_index=False, schema=_tschema,
        )

    def count_group(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "day": [g["day"].iloc[0]],
                "n_active": [np.int64(g["user_id"].nunique())],
            }
        )

    return (
        acts.map_batches(expand, batch_format="pandas")
        .groupby(["event_type", "day"])
        .map_groups(count_group, batch_format="pandas")
        .to_pandas()
        .sort_values(["event_type", "day"])
        .reset_index(drop=True)
    )


def events_trailing_3d(sf_dir: str) -> pd.DataFrame:
    """Time-RANGE windowed aggregate: per-user trailing-3-day sum
    (``SUM(value_e2) OVER (PARTITION BY user_id ORDER BY ts RANGE
    BETWEEN INTERVAL 3 DAY PRECEDING AND CURRENT ROW)``) — the
    time-based sibling of the ROWS-frame ``events_moving_sum3``.

    Scale shape: ONE user-bucket exchange (hash(user) % nb, not
    per-user groups), then inside each bucket the frame bounds of
    EVERY row come from two global ``searchsorted`` calls over a
    composite (user-code · R + ts-offset) int64 key — zero per-user
    Python.  R exceeds the bucket's time span + window, so a lower
    bound can never bleed into the previous user's key range.  RANGE
    peer semantics (ties at the current ts are in-frame) via the
    ``side="right"`` upper bound.  Integer e2 values keep the sums
    hash-exact vs the oracle."""
    ev = rd.read_parquet(
        _t(sf_dir, "events"), columns=["event_id", "user_id", "ts", "value"]
    )
    nb = 64
    _w = 3 * 86400 * 10**6  # 3 days in microseconds

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b["__b"] = (b["user_id"].to_numpy(dtype="int64") % nb).astype("int64")
        return b

    def bucket(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame(
                {"event_id": pd.Series(dtype="int64"),
                 "user_id": pd.Series(dtype="int64"),
                 "trail_e2": pd.Series(dtype="int64")}
            )
        g = g.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
        ts = g["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        uid = g["user_id"].to_numpy(dtype="int64")
        codes = pd.factorize(uid)[0].astype("int64")  # ascending (g is sorted)
        off = ts - ts.min()
        r = off.max() + _w + 2
        if codes[-1] >= (2**62) // max(r, 1):
            # composite key would overflow int64 and silently unsort —
            # raise rather than return wrong frames; the fix is a higher
            # bucket count (fewer users per bucket) or coarser ts units
            raise ValueError(
                f"trailing-window composite key overflow: {codes[-1] + 1} "
                f"users x {r} us span in one bucket — raise nb above {nb}"
            )
        key = codes * r + off
        v = np.floor(g["value"].to_numpy() * 100.0 + 0.5).astype("int64")
        cs = np.concatenate([[0], np.cumsum(v)])
        lo = np.searchsorted(key, codes * r + (off - _w), side="left")
        hi = np.searchsorted(key, key, side="right")  # last peer + 1
        return pd.DataFrame(
            {"event_id": g["event_id"].to_numpy(),
             "user_id": uid,
             "trail_e2": (cs[hi] - cs[lo]).astype("int64")}
        )

    return (
        ev.map_batches(add_bucket, batch_format="pandas")
        .groupby("__b")
        .map_groups(bucket, batch_format="pandas")
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )


def events_trailing_3d_max(sf_dir: str) -> pd.DataFrame:
    """Time-RANGE windowed EXTREMUM: per-user trailing-3-day MAX — the
    aggregate prefix sums cannot express (max has no inverse), solved
    with a SPARSE-TABLE range-maximum query built once per bucket:
    level k holds the max of each 2^k-long run, and every row's frame
    maximum is ``max(sp[k][lo], sp[k][hi-2^k+1])`` for k = ⌊log2 w⌋ —
    two vectorized gathers per row, O(n log n) build, zero per-user
    Python.  Frame bounds come from the same composite-key searchsorted
    (and overflow guard) as ``events_trailing_3d``; RANGE peer semantics
    included."""
    ev = rd.read_parquet(
        _t(sf_dir, "events"), columns=["event_id", "user_id", "ts", "value"]
    )
    nb = 64
    _w = 3 * 86400 * 10**6

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b["__b"] = (b["user_id"].to_numpy(dtype="int64") % nb).astype("int64")
        return b

    def bucket(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame(
                {"event_id": pd.Series(dtype="int64"),
                 "user_id": pd.Series(dtype="int64"),
                 "tmax_e2": pd.Series(dtype="int64")}
            )
        g = g.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
        ts = g["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        uid = g["user_id"].to_numpy(dtype="int64")
        codes = pd.factorize(uid)[0].astype("int64")
        off = ts - ts.min()
        r = off.max() + _w + 2
        if codes[-1] >= (2**62) // max(r, 1):
            raise ValueError(
                f"trailing-window composite key overflow: {codes[-1] + 1} "
                f"users x {r} us span in one bucket — raise nb above {nb}"
            )
        key = codes * r + off
        v = np.floor(g["value"].to_numpy() * 100.0 + 0.5).astype("int64")
        lo = np.searchsorted(key, codes * r + (off - _w), side="left")
        hi = np.searchsorted(key, key, side="right") - 1  # last peer, inclusive
        # sparse-table RMQ over v
        n = len(v)
        levels = [v]
        k, span = 0, 1
        while span * 2 <= n:
            prev = levels[k]
            levels.append(np.maximum(prev[: n - span * 2 + 1], prev[span : n - span + 1]))
            k += 1
            span *= 2
        w = hi - lo + 1  # ≥ 1 (the row itself is always in-frame)
        kk = np.log2(w).astype(np.int64)  # exact for powers of two
        sp = np.int64(1) << kk
        table = np.empty((len(levels), n), dtype="int64")
        for i, lv in enumerate(levels):
            table[i, : len(lv)] = lv
        tmax = np.maximum(table[kk, lo], table[kk, hi - sp + 1])
        return pd.DataFrame(
            {"event_id": g["event_id"].to_numpy(), "user_id": uid,
             "tmax_e2": tmax.astype("int64")}
        )

    return (
        ev.map_batches(add_bucket, batch_format="pandas")
        .groupby("__b")
        .map_groups(bucket, batch_format="pandas")
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )


def orders_rank_in_segment(sf_dir: str) -> pd.DataFrame:
    """RANK() with ties per market segment over a broadcast join, kept
    scale-shaped by a COMBINER: each batch keeps only rows whose price is
    among its local top-10 DISTINCT prices per segment (a row with global
    rank ≤ 10 has < 10 distinct prices above it globally, hence locally —
    so the prefilter is lossless); the exact tie-aware rank then runs in
    a small per-segment group."""
    orders = rd.read_parquet(
        _t(sf_dir, "orders"), columns=["o_orderkey", "o_custkey", "o_totalprice"]
    )
    cust = pd.read_parquet(_t(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"])
    cust = cust.rename(columns={"c_custkey": "o_custkey"})
    joined = broadcast_join(orders, cust, on="o_custkey")

    def local_top(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["price_e2"] = np.floor(
            df["o_totalprice"].to_numpy() * 100.0 + 0.5
        ).astype("int64")
        keep = []
        for seg, g in df.groupby("c_mktsegment"):
            cut = np.sort(g["price_e2"].unique())[::-1][:10][-1]
            keep.append(g[g["price_e2"] >= cut])
        out = pd.concat(keep) if keep else df.iloc[:0]
        return pa.Table.from_pandas(
            out[["c_mktsegment", "o_orderkey", "price_e2"]], preserve_index=False
        )

    def rank_seg(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["rnk"] = (
            g["price_e2"].rank(method="min", ascending=False).astype("int64")
        )
        g = g[g["rnk"] <= 10].sort_values(["rnk", "o_orderkey"])
        return g[["c_mktsegment", "o_orderkey", "price_e2", "rnk"]]

    return (
        joined.map_batches(local_top, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .map_groups(rank_seg, batch_format="pandas")
        .to_pandas()
    )


def doc_regex_count(sf_dir: str) -> rd.Dataset:
    """Vectorized regex search: per-doc non-overlapping match count of a
    word pattern, fully inside Arrow compute (RE2 — the same engine
    DuckDB's regexp functions use, so counts agree exactly)."""
    docs = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(
            pc.utf8_lower(batch["text"]), pattern=r"\bthe\b"
        )
        t = pa.table(
            {"doc_id": batch["doc_id"], "n_the": pc.cast(n, pa.int64())}
        )
        return t.filter(pc.greater(t["n_the"], 0))

    return docs.map_batches(fn, batch_format="pyarrow")


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


def sample_docs(sf_dir: str) -> rd.Dataset:
    """O4: seeded sampling (rows-only check — sampling is engine-defined)."""
    return rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "lang"]).random_sample(
        0.2, seed=42
    )


def _event_value_hist(sf_dir: str) -> pd.DataFrame:
    """Distributed (event_type, v_e2) → count HISTOGRAM: per-batch
    combiners, then a coarse-bucket pandas sum (a Ray aggregate keyed on
    the raw pair would hit the near-all-distinct-key pathology).  Scale
    shape: the shuffled payload is bounded by the DISTINCT-value count
    of the integer e2 domain — not the row count — so a 100 TB events
    table reduces to the same ~|domain| histogram before anything
    reaches the driver.  Exact order statistics (median, discrete
    quantiles, min/max, mode) all walk this one table."""
    from .dedup import coarse_buckets

    ev = rd.read_parquet(_t(sf_dir, "events"), columns=["event_type", "value"])
    nb = coarse_buckets(ev.count(), rows_per_task=65536)

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["v_e2"] = np.floor(df["value"].to_numpy() * 100.0 + 0.5).astype("int64")
        g = df.groupby(["event_type", "v_e2"], as_index=False).agg(
            n=("v_e2", "size")
        )
        g["__b"] = (g["v_e2"].to_numpy() % nb).astype("int64")
        return pa.Table.from_pandas(
            g,
            preserve_index=False,
            # explicit schema: an empty block would infer null-typed
            # object columns and break downstream schema unification
            schema=pa.schema(
                [("event_type", pa.string()), ("v_e2", pa.int64()),
                 ("n", pa.int64()), ("__b", pa.int64())]
            ),
        )

    def sum_hist(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["event_type", "v_e2"], as_index=False)["n"].sum()

    return (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(sum_hist, batch_format="pandas")
        .to_pandas()  # ≤ |distinct e2 values| rows — bounded by domain, not data
    )


def order_stat(v: np.ndarray, c: np.ndarray, k: int) -> int:
    """k-th smallest (1-indexed) of the multiset encoded as a sorted
    value histogram (values ``v`` with counts ``c``) — the pure kernel
    under the distributed median/quantile walks (hypothesis-tested
    against the expanded-array order statistic)."""
    cum = np.cumsum(c)
    return int(v[np.searchsorted(cum, max(k, 1))])


def events_median_value(sf_dir: str) -> pd.DataFrame:
    """EXACT median per event type over the distributed value histogram
    (:func:`_event_value_hist`).  2*median is an exact integer for both
    odd (2a) and even (a+b) group sizes, so the value hashes bit-equal
    vs DuckDB's quantile_cont(0.5)."""
    out = []
    for et, g in _event_value_hist(sf_dir).groupby("event_type"):
        g = g.sort_values("v_e2")
        v = g["v_e2"].to_numpy()
        c = g["n"].to_numpy()
        n = int(c.sum())
        if n % 2:
            med2 = 2 * order_stat(v, c, n // 2 + 1)
        else:
            med2 = order_stat(v, c, n // 2) + order_stat(v, c, n // 2 + 1)
        out.append((et, n, med2))
    return pd.DataFrame(out, columns=["event_type", "n", "med2_e2"])


def events_quantiles(sf_dir: str) -> pd.DataFrame:
    """Grouped DISCRETE quantiles (p10/p90) + min/max from the same
    distributed histogram: quantile_disc(q) = the ceil(q·n)-th smallest
    (1-indexed), a pure integer order statistic — no interpolation, no
    float crossing the oracle."""
    out = []
    for et, g in _event_value_hist(sf_dir).groupby("event_type"):
        g = g.sort_values("v_e2")
        v = g["v_e2"].to_numpy()
        c = g["n"].to_numpy()
        n = int(c.sum())

        def disc(q: float) -> int:
            return order_stat(v, c, int(np.ceil(q * n)))

        out.append((et, n, int(v[0]), disc(0.1), disc(0.9), int(v[-1])))
    return pd.DataFrame(
        out,
        columns=["event_type", "n", "min_e2", "p10_e2", "p90_e2", "max_e2"],
    )


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


def doc_token_counts(sf_dir: str) -> pd.DataFrame:
    """flat_map / UNNEST: explode whitespace-delimited tokens entirely
    inside Arrow compute (split_pattern → list_flatten → value_counts —
    zero per-row Python), per-batch count combiners, then one small
    groupby-sum keyed on the token.  A token lives wholly in its hash
    partition, so a per-partition top-k combiner (orders_rank_in_segment
    style) composes losslessly when the vocabulary outgrows the driver."""
    docs = rd.read_parquet(_t(sf_dir, "documents"), columns=["text"])

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern(batch["text"], pattern=" "))
        toks = toks.filter(pc.not_equal(toks, ""))
        vc = pc.value_counts(toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks)
        return pa.table(
            {
                "token": vc.field("values"),
                "n": pc.cast(vc.field("counts"), pa.int64()),
            }
        )

    df = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("token")
        .sum("n")
        .to_pandas()
        .rename(columns={"sum(n)": "n"})
    )
    return df.sort_values(["n", "token"], ascending=[False, True]).reset_index(drop=True)


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


def purchase_click_users(sf_dir: str) -> pd.DataFrame:
    """INTERSECT: users present in BOTH the high-value purchase set and
    the high-value click set.  Per-batch membership-flag partials
    OR-combine through one groupby keyed on user_id — the exchanged
    payload is bounded by |distinct users|, never event rows."""
    ev = rd.read_parquet(
        _t(sf_dir, "events"), columns=["user_id", "event_type", "value"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.filter(
            pc.and_(
                pc.greater(batch["value"], 99.0),
                pc.is_in(
                    batch["event_type"],
                    value_set=pa.array(["purchase", "click"]),
                ),
            )
        )
        df = t.to_pandas()
        df["is_p"] = (df["event_type"] == "purchase").astype("int64")
        df["is_c"] = (df["event_type"] == "click").astype("int64")
        g = df.groupby("user_id", as_index=False).agg(
            is_p=("is_p", "max"), is_c=("is_c", "max")
        )
        return pa.Table.from_pandas(
            g,
            preserve_index=False,
            schema=pa.schema(
                [("user_id", pa.int64()), ("is_p", pa.int64()), ("is_c", pa.int64())]
            ),
        )

    df = (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .max(["is_p", "is_c"])
        .to_pandas()
        .rename(columns={"max(is_p)": "is_p", "max(is_c)": "is_c"})
    )
    df = df[(df["is_p"] > 0) & (df["is_c"] > 0)].sort_values("user_id")
    return df[["user_id"]].reset_index(drop=True)


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


def heavy_hitter_tokens(sf_dir: str, sketch_k: int = 64, pct: int = 2) -> pd.DataFrame:
    """EXACT heavy hitters (tokens with > ``pct``% of all occurrences)
    via the classic two-pass sketch composition: pass 1 builds mergeable
    Misra-Gries summaries per batch (bounded at ``sketch_k`` counters —
    constant state no matter the vocabulary; merged error ≤
    total/(k+1), Agarwal et al., "Mergeable Summaries"), pass 2 exactly
    recounts ONLY the surviving candidates.  Because pct/100 >
    1/(sketch_k+1), every true heavy hitter is provably a candidate, so
    the output equals the exact-count oracle despite the sketch."""
    docs = rd.read_parquet(_t(sf_dir, "documents"), columns=["text"])

    def mg_partial(batch: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern(batch["text"], pattern=" "))
        toks = toks.filter(pc.not_equal(toks, ""))
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        vc = pc.value_counts(toks)
        t = vc.field("values").to_pandas()
        n = vc.field("counts").to_numpy(zero_copy_only=False).astype("int64")
        total = int(n.sum())
        if len(n) > sketch_k:  # Misra-Gries trim: uniform decrement
            cut = np.sort(n)[::-1][sketch_k]
            keep = n - cut > 0
            t, n = t[keep], n[keep] - cut
        # total rides in-band under the EMPTY-STRING token — structurally
        # collision-free because "" is filtered out of the token stream
        # above (a real token can never be empty)
        out = pd.concat(
            [
                pd.DataFrame({"token": t, "n": n}),
                pd.DataFrame({"token": [""], "n": np.array([total], dtype="int64")}),
            ],
            ignore_index=True,
        )
        return pa.Table.from_pandas(
            out,
            preserve_index=False,
            schema=pa.schema([("token", pa.string()), ("n", pa.int64())]),
        )

    sk = (
        docs.map_batches(mg_partial, batch_format="pyarrow")
        .groupby("token")
        .sum("n")
        .to_pandas()
        .rename(columns={"sum(n)": "n"})
    )
    # candidate cut at the PROVABLE lower bound for a true heavy hitter's
    # merged counter (true n − total/(k+1) > total·(pct/100 − 1/(k+1))):
    # no true hitter can fall below it, and since merged counters never
    # overestimate and sum to ≤ total, at most 1/(pct/100 − 1/(k+1))
    # ≈ 217 candidates survive — bounded driver state.  (A plain top-k
    # trim here would NOT be safe: >k non-hitters can out-count a
    # trimmed-down true hitter.)
    total = int(sk.loc[sk["token"] == "", "n"].iloc[0])
    lower = total * (pct / 100.0 - 1.0 / (sketch_k + 1))
    cand = sk[(sk["token"] != "") & (sk["n"] > lower)]
    if cand.empty:  # no possible hitter — skip pass 2 (empty aggregate
        # would drop the column schema entirely)
        return pd.DataFrame({"token": pd.Series(dtype=object),
                             "n": pd.Series(dtype="int64")})
    cand_tokens = pa.array(cand["token"].tolist(), pa.string())

    def exact_count(batch: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern(batch["text"], pattern=" "))
        toks = toks.filter(pc.is_in(toks, value_set=cand_tokens))
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        vc = pc.value_counts(toks)
        return pa.table(
            {
                "token": vc.field("values"),
                "n": pc.cast(vc.field("counts"), pa.int64()),
            }
        )

    df = (
        docs.map_batches(exact_count, batch_format="pyarrow")
        .groupby("token")
        .sum("n")
        .to_pandas()
        .rename(columns={"sum(n)": "n"})
    )
    df = df[df["n"] * 100 > total * pct]
    return df.sort_values(["n", "token"], ascending=[False, True]).reset_index(drop=True)


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


def events_hopping_window(sf_dir: str) -> pd.DataFrame:
    """HOPPING-WINDOW aggregate (size 1 h, hop 15 min — the overlapped
    streaming window sessionize/tumbling don't cover): each event
    belongs to exactly size/hop = 4 epoch-aligned windows, exploded
    VECTORIZED (np.repeat — no per-row Python), pre-aggregated per batch
    (combiner), then one groupby over ~|windows|·|types| keys.  Window
    membership is pure integer epoch arithmetic, identical in the
    oracle, so counts and e2 sums hash-exact."""
    size_us = 3_600_000_000
    hop_us = 900_000_000
    k = size_us // hop_us  # 4 windows per event
    ev = rd.read_parquet(_t(sf_dir, "events"), columns=["event_type", "ts", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        ts = df["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        v = np.floor(df["value"].to_numpy() * 100.0 + 0.5).astype("int64")
        base = (ts // hop_us) * hop_us  # latest window start containing t
        ks = np.tile(np.arange(k, dtype=np.int64), len(df))
        starts = np.repeat(base, k) - ks * hop_us
        g = (
            pd.DataFrame(
                {
                    "window_start_us": starts,
                    "event_type": np.repeat(df["event_type"].to_numpy(), k),
                    "n": 1,
                    "value_e2": np.repeat(v, k),
                }
            )
            .groupby(["window_start_us", "event_type"], as_index=False)
            .sum()
        )
        return pa.Table.from_pandas(
            g,
            preserve_index=False,
            schema=pa.schema(
                [("window_start_us", pa.int64()), ("event_type", pa.string()),
                 ("n", pa.int64()), ("value_e2", pa.int64())]
            ),
        )

    df = (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby(["window_start_us", "event_type"])
        .sum(["n", "value_e2"])
        .to_pandas()
        .rename(columns={"sum(n)": "n", "sum(value_e2)": "value_e2"})
    )
    return df.sort_values(["window_start_us", "event_type"]).reset_index(drop=True)


def embedding_centroids(sf_dir: str) -> pd.DataFrame:
    """Grouped VECTOR aggregate — per-label centroid sums over the
    embedding column (the reduce inside k-means/cluster-update loops):
    each batch stacks its vectors into one (n, dim) matrix and emits
    per-(label, dim) integer e6 partial sums (combiner: ≤ |labels|·dim
    rows per batch regardless of batch size), then one small groupby
    closes the reduction.  Elements round to e6 integers BEFORE summing,
    so the result is float-summation-order-free and oracle-exact; the
    centroid itself is sum_e6 / n_vecs, left undivided to keep the
    contract integer-only."""
    emb = rd.read_parquet(_t(sf_dir, "embeddings"), columns=["label", "embedding"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        out_label, out_i, out_n, out_s = [], [], [], []
        for label, g in df.groupby("label"):  # ≤ |labels| groups per batch
            m = np.stack(g["embedding"].to_numpy())
            e6 = np.floor(m.astype(np.float64) * 1e6 + 0.5).astype(np.int64)
            dim = e6.shape[1]
            out_label.append(np.full(dim, label, dtype=np.int64))
            out_i.append(np.arange(1, dim + 1, dtype=np.int64))  # 1-based like SQL
            out_n.append(np.full(dim, len(g), dtype=np.int64))
            out_s.append(e6.sum(axis=0))
        return pa.table(
            {
                "label": pa.array(np.concatenate(out_label) if out_label else
                                  np.empty(0, dtype=np.int64)),
                "i": pa.array(np.concatenate(out_i) if out_i else
                              np.empty(0, dtype=np.int64)),
                "n_vecs": pa.array(np.concatenate(out_n) if out_n else
                                   np.empty(0, dtype=np.int64)),
                "sum_e6": pa.array(np.concatenate(out_s) if out_s else
                                   np.empty(0, dtype=np.int64)),
            }
        )

    return (
        emb.map_batches(partial, batch_format="pyarrow")
        .groupby(["label", "i"])
        .sum(["n_vecs", "sum_e6"])
        .to_pandas()
        .rename(columns={"sum(n_vecs)": "n_vecs", "sum(sum_e6)": "sum_e6"})
        .sort_values(["label", "i"])
        .reset_index(drop=True)
    )


def quality_score_model(sf_dir: str) -> rd.Dataset:
    """Model-scoring as an ACTOR-POOL stage (stages/scoring.py): the
    integer linear "checkpoint" loads once per actor in ``__init__``,
    batches score vectorized in ``__call__`` — the exact Ray shape a
    real classifier stage uses, with a bit-exact oracle because the
    model is integer-linear over the frozen quality features."""
    from ..stages.scoring import QualityScorer

    docs = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    return docs.map_batches(
        QualityScorer, batch_format="pyarrow", concurrency=(1, 4), num_cpus=1
    )


def doc_split_assign(sf_dir: str) -> rd.Dataset:
    """Deterministic train/val/test split assignment — the standard
    content-hash split a training-data pipeline needs so re-runs and
    cross-engine rebuilds agree row-for-row: bucket = first byte of
    md5(doc_id as text) mod 10 → train(0–7)/val(8)/test(9).  Stateless
    map_batches, no shuffle; md5 on both sides makes it oracle-exact."""
    docs = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id"])

    def fn(batch: pa.Table) -> pa.Table:
        from ..functions.text import split_bucket

        b = split_bucket(batch["doc_id"].to_pylist())
        split = np.where(b <= 7, "train", np.where(b == 8, "val", "test"))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "split": pa.array(split.tolist(), pa.string()),
            }
        )

    return docs.map_batches(fn, batch_format="pyarrow")


def pack_token_chunks(sf_dir: str, budget: int = 512) -> pd.DataFrame:
    """Training-shard PACKING: greedily pack documents into chunks of at
    most ``budget`` tokens (docs above the budget get a chunk of their
    own), preserving doc_id order within each pack partition.  The pack
    runs per PARTITION (doc_id-range buckets) with batch-local greedy
    state — embarrassingly parallel, engine-defined chunk ids (partition
    major, rows-only check); invariants (every doc exactly once, chunk
    totals ≤ budget unless single-doc, order preserved) are pinned by
    tests.  PARTITIONING ASSUMPTION: packing quality is per-partition
    (no chunk spans partitions) — the trade a distributed packer makes
    for a shuffle-free single pass."""
    from .dedup import coarse_buckets

    docs = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    nb = coarse_buckets(docs.count(), rows_per_task=16384)

    def tag(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        nt = count_tokens(batch["text"].to_pylist())
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_tokens": pa.array(nt),
                "part": pa.array((ids % nb).astype("int64")),
            }
        )

    def pack(g: pd.DataFrame) -> pd.DataFrame:
        from ..functions.text import greedy_pack

        g = g.sort_values("doc_id")
        part = int(g["part"].iloc[0])
        nt = g["n_tokens"].to_numpy()
        chunk = greedy_pack(nt, budget)
        out = pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy(),
                "n_tokens": nt,
                # chunk ids globally unique: partition-major composite
                "chunk_id": part * 1_000_000_000 + chunk,
            }
        )
        return out

    return (
        docs.map_batches(tag, batch_format="pyarrow")
        .groupby("part")
        .map_groups(pack, batch_format="pandas")
        .to_pandas()
    )


def decontaminate_ngrams(sf_dir: str, n: int = 8) -> pd.DataFrame:
    """Benchmark DECONTAMINATION: flag training docs sharing any word
    ``n``-gram with a held-out set (here: the md5-split test docs of the
    same table).  The held-out n-gram fingerprints are collected once
    (test split ≪ corpus), broadcast, and each batch checks its rolling
    64-bit n-gram hashes with ``np.isin`` — one streaming pass over the
    corpus, no shuffle.  Returns flagged (train doc, #hits) rows.
    PARTITIONING ASSUMPTION: the held-out fingerprint set fits a
    worker's heap (benchmark suites are ≪ the training corpus); a
    held-out set that outgrows RAM shuffles both sides on gram-hash
    buckets instead."""
    import hashlib

    docs = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def _grams(text: str) -> np.ndarray:
        toks = [t for t in (text or "").split() if t]
        if len(toks) < n:
            return np.empty(0, dtype=np.uint64)
        joined = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
        return np.fromiter(
            (
                int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "big")
                for s in joined
            ),
            dtype=np.uint64,
            count=len(joined),
        )

    def _split_mask(ids: list) -> np.ndarray:
        from ..functions.text import split_bucket

        return split_bucket(ids) == 9

    def test_grams(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        keep = _split_mask(ids)
        texts = batch["text"].to_pylist()
        hs = [
            _grams(t) for t, k in zip(texts, keep) if k
        ]
        u = (
            np.unique(np.concatenate(hs))
            if hs
            else np.empty(0, dtype=np.uint64)
        )
        return pa.table({"g": pa.array(u.astype("int64"))})  # int64 view for Ray

    hdf = docs.map_batches(test_grams, batch_format="pyarrow").to_pandas()
    # an ALL-empty result can come back column-less — keep the typed shape
    heldout = (
        np.unique(hdf["g"].to_numpy()) if "g" in hdf.columns
        else np.empty(0, dtype="int64")
    )  # |test-split n-grams| — small vs corpus; broadcast via closure

    def flag(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        is_test = _split_mask(ids)
        texts = batch["text"].to_pylist()
        out_id, out_hits = [], []
        # train/val docs only — test docs trivially self-match
        for i, t, te in zip(ids, texts, is_test):
            if te:
                continue
            hs = _grams(t)
            hits = int(np.isin(hs.astype("int64"), heldout).sum()) if len(hs) else 0
            if hits:
                out_id.append(i)
                out_hits.append(hits)
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "n_hits": pa.array(out_hits, pa.int64()),
            }
        )

    out = docs.map_batches(flag, batch_format="pyarrow").to_pandas()
    if "doc_id" not in out.columns:  # all-empty blocks lose the schema
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "n_hits": pd.Series(dtype="int64")})
    return out.sort_values("doc_id").reset_index(drop=True)


def tfidf_top_terms(sf_dir: str, k: int = 3) -> pd.DataFrame:
    """TF-IDF top-k terms per document in TWO streaming passes and ZERO
    data-sized shuffles: (1) document-frequency partials per batch →
    one groupby bounded by |vocabulary|; (2) re-stream the docs, join
    the broadcast idf table per batch, score and take the local top-k —
    a document never spans batches, so tf and the top-k are batch-local.
    Ordering key is the ROUNDED integer score (+ token asc), so ranking
    is float-order-free on both sides of the oracle.  PARTITIONING
    ASSUMPTION: the df/idf table is vocabulary-bounded and fits a
    worker's heap; an unbounded web vocabulary calls for a min_df cut
    (rare terms score ≈ tf·ln N and need no table entry) or feature
    hashing before broadcast."""
    docs = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    n_docs = docs.count()

    def explode(batch: pa.Table) -> pd.DataFrame:
        toks = pc.split_pattern(batch["text"], pattern=" ")
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        out = pd.DataFrame(
            {
                "doc_id": np.repeat(
                    batch["doc_id"].to_numpy(zero_copy_only=False), lens
                ),
                "token": flat.to_pandas(),
            }
        )
        return out[out["token"] != ""]

    def df_partial(batch: pa.Table) -> pa.Table:
        d = explode(batch).drop_duplicates()
        g = d.groupby("token", as_index=False).agg(nd=("doc_id", "size"))
        return pa.Table.from_pandas(
            g,
            preserve_index=False,
            schema=pa.schema([("token", pa.string()), ("nd", pa.int64())]),
        )

    dfreq = (
        docs.map_batches(df_partial, batch_format="pyarrow")
        .groupby("token")
        .sum("nd")
        .to_pandas()
        .rename(columns={"sum(nd)": "nd"})
    )
    dfreq["idf"] = np.log(float(n_docs) / dfreq["nd"].to_numpy().astype("float64"))
    idf = dfreq[["token", "idf"]]

    def score(batch: pa.Table) -> pa.Table:
        tf = (
            explode(batch)
            .groupby(["doc_id", "token"], as_index=False)
            .agg(tf=("token", "size"))
            .merge(idf, on="token")
        )
        tf["tfidf_e4"] = np.floor(
            tf["tf"].to_numpy() * tf["idf"].to_numpy() * 1e4 + 0.5
        ).astype("int64")
        top = (
            tf.sort_values(
                ["doc_id", "tfidf_e4", "token"], ascending=[True, False, True]
            )
            .groupby("doc_id")
            .head(k)
        )
        return pa.Table.from_pandas(
            top[["doc_id", "token", "tfidf_e4"]], preserve_index=False
        )

    return (
        docs.map_batches(score, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["doc_id", "tfidf_e4", "token"], ascending=[True, False, True])
        .reset_index(drop=True)
    )


def doc_lm_perplexity(sf_dir: str) -> pd.DataFrame:
    """Bigram language-model quality scoring (the CCNet/KenLM-style
    perplexity filter, Wenzek et al. 2020, trained here on the corpus
    itself): ONE explode pass emits per-batch partial bigram counts plus
    distinct-token marker rows, ONE vocabulary-bounded groupby builds the
    model, the context counts and vocabulary size are DERIVED from the
    bigram table (no second corpus pass), and a final streaming pass
    scores every document — per-doc mean negative log-likelihood under
    Laplace smoothing as a rounded integer (``nll_e6``), float-order-free
    vs the oracle.  PARTITIONING ASSUMPTION: the model table is bounded
    by the number of DISTINCT observed bigrams and fits a worker heap
    (same assumption as tfidf's idf table); a web-scale vocabulary calls
    for a min-count cutoff (rare bigrams score at the unsmoothed floor)
    or feature hashing before broadcast."""
    import ray

    docs = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    # marker w2 for distinct-token rows: a token can never contain the
    # split delimiter, so " " is unreachable as a real second word
    _V = " "

    def tokens_of(batch: pa.Table):
        toks = pc.split_pattern(batch["text"], pattern=" ")
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        tok = flat.to_pandas().to_numpy(dtype=object)
        di = np.repeat(batch["doc_id"].to_numpy(zero_copy_only=False), lens)
        keep = tok != ""
        return tok[keep], di[keep]

    def bigrams_from(tok: np.ndarray, di: np.ndarray) -> pd.DataFrame:
        if len(tok) < 2:
            return pd.DataFrame({"doc_id": di[:0], "w1": tok[:0], "w2": tok[:0]})
        same = di[:-1] == di[1:]
        return pd.DataFrame(
            {"doc_id": di[:-1][same], "w1": tok[:-1][same], "w2": tok[1:][same]}
        )

    def bigrams_of(batch: pa.Table) -> pd.DataFrame:
        return bigrams_from(*tokens_of(batch))

    _schema = pa.schema([("w1", pa.string()), ("w2", pa.string()), ("c", pa.int64())])

    def partial(batch: pa.Table) -> pa.Table:
        tok, di = tokens_of(batch)  # ONE tokenization per batch
        b = bigrams_from(tok, di)
        g = b.groupby(["w1", "w2"], as_index=False).agg(c=("w1", "size"))
        # distinct-token markers (vocabulary size needs LAST tokens too,
        # which never appear as a bigram context): one row per distinct
        # token in this batch, summed counts are ignored downstream
        marks = pd.DataFrame({"w1": pd.unique(tok), "w2": _V, "c": 1})
        return pa.Table.from_pandas(
            pd.concat([g, marks], ignore_index=True), preserve_index=False,
            schema=_schema,
        )

    model = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby(["w1", "w2"])
        .sum("c")
        .to_pandas()
        .rename(columns={"sum(c)": "c"})
    )
    is_mark = model["w2"].to_numpy() == _V
    vocab = int(is_mark.sum())
    c2 = model[~is_mark].rename(columns={"c": "c2"})
    c1 = c2.groupby("w1", as_index=False).agg(c1=("c2", "sum"))

    model_ref = ray.put((c2, c1, vocab))

    class _Score:
        def __init__(self) -> None:
            self._m = None

        def __call__(self, batch: pa.Table) -> pa.Table:
            if self._m is None:
                self._m = ray.get(model_ref)
            c2, c1, vocab = self._m
            b = bigrams_of(batch)
            b = b.merge(c2, on=["w1", "w2"], how="left").merge(c1, on="w1", how="left")
            cc2 = b["c2"].fillna(0).to_numpy(dtype="float64")
            cc1 = b["c1"].fillna(0).to_numpy(dtype="float64")
            b["nll"] = -np.log((cc2 + 1.0) / (cc1 + float(vocab)))
            g = b.groupby("doc_id", as_index=False).agg(
                n_bigrams=("nll", "size"), s=("nll", "sum")
            )
            g["nll_e6"] = np.floor(
                g["s"].to_numpy() / g["n_bigrams"].to_numpy() * 1e6 + 0.5
            ).astype("int64")
            return pa.Table.from_pandas(
                g[["doc_id", "n_bigrams", "nll_e6"]], preserve_index=False,
                schema=pa.schema(
                    [("doc_id", pa.int64()), ("n_bigrams", pa.int64()),
                     ("nll_e6", pa.int64())]
                ),
            )

    return (
        docs.map_batches(_Score(), batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
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


def orders_ntile(sf_dir: str) -> pd.DataFrame:
    """NTILE(4) per market segment over integer order prices, tie-broken
    by o_orderkey — the quantile-bucket window function.

    Scale shape (no global sort): (1) per-batch (segment, price_e2)
    histograms → coarse-bucket sums → a DOMAIN-bounded rank table (one
    row per distinct price per segment) broadcast with each price's
    strictly-higher-count and the segment total; (2) ONE bucketed
    exchange on (segment, price_e2) orders the tied rows by orderkey so
    global rank = n_higher + tie rank; NTILE comes from DuckDB's rule
    (first n%4 buckets get one extra row) applied to the rank —
    vectorized per group."""
    import ray

    from .dedup import coarse_buckets

    orders = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderkey", "o_custkey", "o_totalprice"])
    cust = rd.read_parquet(_t(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"])
    seg_map = cust.to_pandas().sort_values("c_custkey")  # broadcast small side
    seg_ref = ray.put(
        (seg_map["c_custkey"].to_numpy().astype(np.int64),
         seg_map["c_mktsegment"].to_numpy())
    )
    nb = coarse_buckets(orders.count(), rows_per_task=16384)

    def with_seg(batch: pa.Table) -> pd.DataFrame:
        ck, seg = ray.get(seg_ref)
        df = batch.to_pandas()
        idx = np.searchsorted(ck, df["o_custkey"].to_numpy().astype(np.int64))
        df["seg"] = seg[idx]
        df["price_e2"] = np.floor(df["o_totalprice"].to_numpy() * 100 + 0.5).astype("int64")
        return df[["o_orderkey", "seg", "price_e2"]]

    def hist_partial(batch: pa.Table) -> pa.Table:
        df = with_seg(batch)
        g = df.groupby(["seg", "price_e2"], as_index=False).size()
        g["__b"] = (g["price_e2"].to_numpy() % nb).astype("int64")
        return pa.Table.from_pandas(
            g,
            schema=pa.schema([("seg", pa.string()), ("price_e2", pa.int64()),
                              ("size", pa.int64()), ("__b", pa.int64())]),
            preserve_index=False,
        )

    def hist_sum(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["seg", "price_e2"], as_index=False)["size"].sum()

    hist = (
        orders.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(hist_sum, batch_format="pandas")
        .to_pandas()
    )
    # rank table: per (seg, price) the count of strictly-HIGHER-priced
    # rows in the segment, plus per-seg totals (domain-bounded, tiny)
    hist = hist.sort_values(["seg", "price_e2"], ascending=[True, False])
    hist["n_higher"] = hist.groupby("seg")["size"].cumsum() - hist["size"]
    totals = hist.groupby("seg", as_index=False)["size"].sum().rename(columns={"size": "n"})
    rank_ref = ray.put(
        (hist.set_index(["seg", "price_e2"])["n_higher"].to_dict(),
         dict(zip(totals["seg"], totals["n"])))
    )

    def add_bucket(batch: pa.Table) -> pa.Table:
        df = with_seg(batch)
        df["__b"] = (df["price_e2"].to_numpy() % nb).astype("int64")
        return pa.Table.from_pandas(
            df,
            schema=pa.schema([("o_orderkey", pa.int64()), ("seg", pa.string()),
                              ("price_e2", pa.int64()), ("__b", pa.int64())]),
            preserve_index=False,
        )

    def ntile_group(g: pd.DataFrame) -> pd.DataFrame:
        import ray as _ray

        n_higher, totals_d = _ray.get(rank_ref)
        g = g.sort_values(["seg", "price_e2", "o_orderkey"],
                          ascending=[True, False, True]).reset_index(drop=True)
        tie = g.groupby(["seg", "price_e2"]).cumcount().to_numpy()
        base = np.fromiter(
            (n_higher[(s, p)] for s, p in zip(g["seg"], g["price_e2"])),
            dtype=np.int64, count=len(g),
        )
        rank = base + tie  # 0-based global rank within segment
        n = np.fromiter((totals_d[s] for s in g["seg"]), dtype=np.int64, count=len(g))
        # DuckDB NTILE(4): first n%4 buckets hold n//4+1 rows
        big, rem = n // 4, n % 4
        cut = rem * (big + 1)
        q = np.where(
            rank < cut,
            rank // np.maximum(big + 1, 1),
            rem + (rank - cut) // np.maximum(big, 1),
        ) + 1
        return pd.DataFrame({"o_orderkey": g["o_orderkey"].astype("int64"),
                             "seg": g["seg"],
                             "price_e2": g["price_e2"].astype("int64"),
                             "quartile": q.astype("int64")})

    out = (
        orders.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(ntile_group, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("o_orderkey").reset_index(drop=True)


def events_first_last(sf_dir: str) -> pd.DataFrame:
    """Grouped FIRST_VALUE / LAST_VALUE (argmin/argmax aggregate): per
    user, the event_id of the earliest and latest event under the total
    order (ts, event_id).

    Scale shape: a pure combiner aggregate — each batch emits one
    candidate (min-pair, max-pair) row per user it saw; a coarse-bucket
    exchange merges candidates with vectorized idxmin/idxmax.  No sort,
    no per-user group materialization."""
    from .dedup import coarse_buckets

    ev = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts", "event_id"])
    nb = coarse_buckets(ev.count(), rows_per_task=65536)

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["ts_us"] = df["ts"].astype("datetime64[us]").astype("int64")
        lo = df.loc[df.groupby("user_id")["ts_us"].idxmin()]
        # tie-break inside the batch: smallest event_id among equal min ts
        lo = df.merge(lo[["user_id", "ts_us"]], on=["user_id", "ts_us"]).groupby(
            "user_id", as_index=False
        ).agg(first_ts=("ts_us", "first"), first_event=("event_id", "min"))
        hi = df.loc[df.groupby("user_id")["ts_us"].idxmax()]
        hi = df.merge(hi[["user_id", "ts_us"]], on=["user_id", "ts_us"]).groupby(
            "user_id", as_index=False
        ).agg(last_ts=("ts_us", "max"), last_event=("event_id", "max"))
        g = lo.merge(hi, on="user_id")
        g["__b"] = (g["user_id"].to_numpy() % nb).astype("int64")
        return pa.Table.from_pandas(
            g,
            schema=pa.schema([("user_id", pa.int64()), ("first_ts", pa.int64()),
                              ("first_event", pa.int64()), ("last_ts", pa.int64()),
                              ("last_event", pa.int64()), ("__b", pa.int64())]),
            preserve_index=False,
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        # lexicographic (ts, event_id) min/max via sort + dedupe — no
        # composite integer key (ts_us * shift would overflow int64)
        lo = g.sort_values(["user_id", "first_ts", "first_event"]).drop_duplicates(
            "user_id", keep="first"
        )
        hi = g.sort_values(["user_id", "last_ts", "last_event"]).drop_duplicates(
            "user_id", keep="last"
        )
        return lo[["user_id", "first_event"]].merge(
            hi[["user_id", "last_event"]], on="user_id"
        )

    out = (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("user_id").reset_index(drop=True)


def doc_repetition_stats(sf_dir: str) -> pd.DataFrame:
    """Gopher-style repetition quality signals (Rae et al. 2021 — the
    public "Scaling Language Models" heuristic family): per doc the
    duplicate-token fraction, the most frequent token and its fraction,
    and the most frequent word bigram and its fraction (ties broken
    lexicographically — deterministic).  Fractions are half-up e6
    integers computed with the SAME float expression as the oracle.

    100 TB shape: purely batch-local — one Arrow split per batch, grouped
    pandas kernels across ALL docs in the batch at once (no per-doc
    Python loop), no shuffle of any kind; output is O(docs)."""
    docs = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        toks = pc.split_pattern(batch["text"], " ")
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = np.asarray(pc.list_flatten(toks).to_pylist(), dtype=object)
        did = np.repeat(ids, lens)
        df = pd.DataFrame({"doc_id": did, "tok": flat})
        g = df.groupby("doc_id")
        stat = g.agg(n_tokens=("tok", "size"), n_distinct=("tok", "nunique"))
        tc = df.groupby(["doc_id", "tok"]).size().reset_index(name="c")
        tc = tc.sort_values(["doc_id", "c", "tok"], ascending=[True, False, True])
        ttop = tc.drop_duplicates("doc_id").set_index("doc_id")
        # bigrams: adjacent tokens within the same doc (flat layout makes
        # the boundary mask one vectorized compare)
        same = did[1:] == did[:-1]
        bdf = pd.DataFrame(
            {
                "doc_id": did[:-1][same],
                "bg": pd.Series(flat[:-1][same]) + " " + pd.Series(flat[1:][same]),
            }
        )
        bc = bdf.groupby(["doc_id", "bg"]).size().reset_index(name="c")
        bc = bc.sort_values(["doc_id", "c", "bg"], ascending=[True, False, True])
        btop = bc.drop_duplicates("doc_id").set_index("doc_id")
        out = stat.join(ttop.rename(columns={"tok": "top_token", "c": "tc"}))
        out = out.join(btop.rename(columns={"bg": "top_bigram", "c": "bc"}), how="inner")
        n = out["n_tokens"].to_numpy(dtype=np.float64)
        nd = out["n_distinct"].to_numpy(dtype=np.float64)
        out["dup_token_frac_e6"] = np.floor(1e6 * (n - nd) / n + 0.5).astype("int64")
        out["top_token_frac_e6"] = np.floor(
            1e6 * out["tc"].to_numpy(dtype=np.float64) / n + 0.5
        ).astype("int64")
        out["top_bigram_frac_e6"] = np.floor(
            1e6 * out["bc"].to_numpy(dtype=np.float64) / (n - 1.0) + 0.5
        ).astype("int64")
        out = out.reset_index()[
            ["doc_id", "n_tokens", "n_distinct", "dup_token_frac_e6",
             "top_token", "top_token_frac_e6", "top_bigram", "top_bigram_frac_e6"]
        ]
        return pa.Table.from_pandas(
            out,
            schema=pa.schema(
                [("doc_id", pa.int64()), ("n_tokens", pa.int64()),
                 ("n_distinct", pa.int64()), ("dup_token_frac_e6", pa.int64()),
                 ("top_token", pa.string()), ("top_token_frac_e6", pa.int64()),
                 ("top_bigram", pa.string()), ("top_bigram_frac_e6", pa.int64())]
            ),
            preserve_index=False,
        )

    out = docs.map_batches(fn, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def pii_redact_docs(sf_dir: str) -> rd.Dataset:
    """PII redaction stage (the training-data scrub every large corpus
    pipeline carries): deterministic per-doc PII is spliced into the text
    (the synthetic corpus has none), then emails/phones/IPv4s are counted
    and globally replaced via RE2 — the same engine DuckDB's regexp
    functions use, so the oracle replays the transform byte-for-byte.

    100 TB shape: stateless map_batches, all-Arrow kernels (concat +
    count/replace_substring_regex), zero shuffle."""
    from ..functions.text import redact_pii

    docs = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        aug = pc.binary_join_element_wise(
            batch["text"],
            pa.array([f"contact user{i}@mail{i % 7}.example.com" for i in did]),
            pa.array([f"call (555) 010-{i % 10000:04d}" for i in did]),
            pa.array([f"from 192.168.{i % 256}.{i % 254 + 1}" for i in did]),
            " ",
        )
        clean, counts = redact_pii(aug)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "clean_text": clean,
                "n_email": counts["email"],
                "n_phone": counts["phone"],
                "n_ipv4": counts["ipv4"],
            }
        )

    return docs.map_batches(fn, batch_format="pyarrow")


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


def stratified_sample_docs(sf_dir: str, k: int = 5) -> pd.DataFrame:
    """Deterministic stratified sampling: k docs per source, ranked by
    md5(doc_id) — a seedless, shuffle-order-free "random" draw that any
    engine reproduces bit-for-bit (same rule the split assigner uses).

    100 TB shape: a LOSSLESS per-batch top-k combiner (a row in the
    global per-source top-k has < k rows ranked above it in ANY batch,
    so batch-local top-k can never drop a winner) cuts the exchange to
    ≤ k rows per (source, batch); the final per-source cut is a
    |sources|-key groupby."""
    docs = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "source"])

    def local_topk(batch: pa.Table) -> pa.Table:
        import hashlib

        df = batch.to_pandas()
        df["h"] = [
            hashlib.md5(str(i).encode()).hexdigest() for i in df["doc_id"]
        ]
        df = df.sort_values(["source", "h", "doc_id"]).groupby("source").head(k)
        return pa.Table.from_pandas(
            df,
            schema=pa.schema(
                [("doc_id", pa.int64()), ("source", pa.string()), ("h", pa.string())]
            ),
            preserve_index=False,
        )

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["h", "doc_id"]).head(k).copy()
        g["sample_rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["source", "doc_id", "sample_rank"]]

    out = (
        docs.map_batches(local_topk, batch_format="pyarrow")
        .groupby("source")
        .map_groups(final_topk, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values(["source", "sample_rank"]).reset_index(drop=True)


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


def token_postings(sf_dir: str, min_df: int = 20) -> pd.DataFrame:
    """Inverted-index build — the retrieval-side primitive of a webtext
    corpus: token → (document frequency, comma-joined sorted doc-id
    posting list) for tokens in ≥ ``min_df`` docs.

    100 TB shape: per-batch explode + (token, doc) dedup combiner, then
    ONE groupby(token) exchange shipping exactly the posting pairs (the
    index's own size — there is no smaller exchange that still builds
    it); the merge is a vectorized per-group sort+join.  Postings are
    strings so the oracle (string_agg ORDER BY) replays them exactly."""
    docs = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        toks = pc.split_pattern(batch["text"], " ")
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = np.asarray(pc.list_flatten(toks).to_pylist(), dtype=object)
        df = pd.DataFrame({"token": flat, "doc_id": np.repeat(ids, lens)})
        df = df[df["token"] != ""].drop_duplicates(["token", "doc_id"])
        return pa.Table.from_pandas(
            df,
            schema=pa.schema([("token", pa.string()), ("doc_id", pa.int64())]),
            preserve_index=False,
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(g["doc_id"].to_numpy())
        if len(ids) < min_df:
            # typed empty frame: a plain empty object column would infer
            # Arrow null and break downstream schema unification
            return pd.DataFrame(
                {
                    "token": pd.Series([], dtype="string"),
                    "df": pd.Series([], dtype="int64"),
                    "postings": pd.Series([], dtype="string"),
                }
            )
        return pd.DataFrame(
            {
                "token": [g["token"].iloc[0]],
                "df": np.array([len(ids)], dtype=np.int64),
                "postings": [",".join(map(str, ids))],
            }
        )

    out = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("token")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("token").reset_index(drop=True)


def user_funnel_stage(sf_dir: str) -> pd.DataFrame:
    """First-touch funnel (view → click → purchase, strictly increasing
    ts): per user the furthest stage reached — the standard product-
    analytics ordered-sequence operator.  Greedy earliest-first rule on
    BOTH sides: first view, then the first click after it, then the
    first purchase after that.

    100 TB shape: events pre-filtered to the three funnel types at the
    read, ONE user-bucket exchange (coarse buckets), then vectorized
    per-bucket pandas merges — the sequencing needs each user's events
    co-located; no smaller exchange computes an ordered chain."""
    from .dedup import coarse_buckets

    ev = rd.read_parquet(
        _t(sf_dir, "events"),
        columns=["user_id", "event_type", "ts"],
        filter=(pc.field("event_type").isin(["view", "click", "purchase"])),
    )
    nb = coarse_buckets(ev.count(), rows_per_task=65536)

    def add_bucket(batch: pa.Table) -> pa.Table:
        u = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.append_column("__b", pa.array(u % nb, pa.int64()))

    def funnel(g: pd.DataFrame) -> pd.DataFrame:
        v = g[g.event_type == "view"].groupby("user_id")["ts"].min().rename("vt")
        c = g[g.event_type == "click"].merge(v, on="user_id")
        c = c[c.ts > c.vt].groupby("user_id")["ts"].min().rename("ct")
        p = g[g.event_type == "purchase"].merge(c, on="user_id")
        p = p[p.ts > p.ct].groupby("user_id")["ts"].min().rename("pt")
        out = pd.DataFrame({"user_id": g["user_id"].unique()})
        out["funnel_stage"] = (
            out["user_id"].isin(v.index).astype("int64")
            + out["user_id"].isin(c.index).astype("int64")
            + out["user_id"].isin(p.index).astype("int64")
        )
        return out

    out = (
        ev.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(funnel, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("user_id").reset_index(drop=True)


def events_value_time_corr(sf_dir: str) -> pd.DataFrame:
    """Grouped Pearson correlation of (value, time) per event type from
    MERGEABLE integer moments — the combiner-shaped statistics aggregate:
    each batch emits (n, Σx, Σy, Σxy, Σx², Σy²) as exact int64 (x = value
    half-up e2, y = seconds since 2024-01-01) — safe PER BATCH (≤4096
    rows × y² ≤ 6.7e12 ≈ 2.7e16 ≪ 2^63); the final merge over the
    metadata-sized moment rows runs on the driver in arbitrary-precision
    Python ints, so no global Σy² can silently wrap at any sf (numpy
    int64 sums wrap without warning; the oracle's HUGEINT errors loudly
    instead).  The correlation derives from the exact integers with the
    SAME final float expression as the oracle (corr_e6 half-up)."""
    ev = rd.read_parquet(_t(sf_dir, "events"), columns=["event_type", "value", "ts"])
    epoch0 = pd.Timestamp("2024-01-01")

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        x = np.floor(df["value"].to_numpy() * 100.0 + 0.5).astype("int64")
        y = ((df["ts"] - epoch0).dt.total_seconds()).astype("int64").to_numpy()
        df2 = pd.DataFrame(
            {"event_type": df["event_type"], "n": 1, "sx": x, "sy": y,
             "sxy": x * y, "sxx": x * x, "syy": y * y}
        )
        g = df2.groupby("event_type", as_index=False).sum()
        return pa.Table.from_pandas(
            g,
            schema=pa.schema(
                [("event_type", pa.string())]
                + [(c, pa.int64()) for c in ("n", "sx", "sy", "sxy", "sxx", "syy")]
            ),
            preserve_index=False,
        )

    parts = ev.map_batches(partial, batch_format="pyarrow").to_pandas()
    # exact big-int merge: one tiny row per (batch, type) reaches the
    # driver; Python ints never overflow where an int64 groupby would wrap
    cols = ["n", "sx", "sy", "sxy", "sxx", "syy"]
    m = parts.groupby("event_type", as_index=False)[cols].agg(
        lambda s: sum(int(v) for v in s)
    )
    n = m["n"].to_numpy(dtype=np.float64)
    sx = m["sx"].astype(np.float64).to_numpy()
    sy = m["sy"].astype(np.float64).to_numpy()
    cov = n * m["sxy"].astype(np.float64).to_numpy() - sx * sy
    vx = n * m["sxx"].astype(np.float64).to_numpy() - sx * sx
    vy = n * m["syy"].astype(np.float64).to_numpy() - sy * sy
    m["corr_e6"] = np.floor(cov / np.sqrt(vx * vy) * 1e6 + 0.5).astype("int64")
    out = m[["event_type", "n", "corr_e6"]]
    return out.sort_values("event_type").reset_index(drop=True)


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


def orders_percent_rank(sf_dir: str) -> rd.Dataset:
    """percent_rank + cume_dist for EVERY row without any per-group
    sort: pass 1 builds per-(segment, price_e2) counts (the exchange is
    bounded by the value DOMAIN, the median/quantile trick); the
    cumulative tables broadcast once; pass 2 assigns each row its
    below/tie counts via vectorized searchsorted.  Ties follow SQL
    window semantics exactly: percent_rank = below/(n-1), cume_dist =
    (below+ties)/n, on exact integers — the final doubles are the same
    IEEE quotients the oracle's window functions produce.  At a price
    domain too large to broadcast, the cum tables range-partition (the
    same fallback the quantile family documents)."""
    import ray

    cust = rd.read_parquet(
        _t(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"]
    ).to_pandas()
    seg_map_ref = ray.put(dict(zip(cust["c_custkey"], cust["c_mktsegment"])))
    orders = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderkey", "o_custkey", "o_totalprice"])

    def hist_partial(batch: pa.Table) -> pa.Table:
        seg_map = ray.get(seg_map_ref)
        df = batch.to_pandas()
        df["c_mktsegment"] = df["o_custkey"].map(seg_map)
        df["price_e2"] = np.floor(df["o_totalprice"].to_numpy() * 100.0 + 0.5).astype("int64")
        g = df.groupby(["c_mktsegment", "price_e2"], as_index=False).size()
        return pa.Table.from_pandas(
            g.rename(columns={"size": "cnt"}),
            schema=pa.schema([("c_mktsegment", pa.string()), ("price_e2", pa.int64()),
                              ("cnt", pa.int64())]),
            preserve_index=False,
        )

    # domain-bounded partials merge on the DRIVER (one pandas groupby —
    # no second all-to-all; (seg, price) keys would also trip the
    # near-all-distinct Ray-aggregate pathology).  At a price domain too
    # large for one heap, range-partition the value axis instead (the
    # quantile family's documented fallback).
    hist = (
        orders.map_batches(hist_partial, batch_format="pyarrow")
        .to_pandas()
        .groupby(["c_mktsegment", "price_e2"], as_index=False)["cnt"].sum()
    )
    cum: dict[str, tuple[np.ndarray, np.ndarray, np.ndarray, int]] = {}
    for seg, g in hist.groupby("c_mktsegment"):
        g = g.sort_values("price_e2")
        vals = g["price_e2"].to_numpy()
        cnts = g["cnt"].to_numpy()
        below = np.concatenate(([0], np.cumsum(cnts)))[:-1]
        cum[seg] = (vals, below, cnts, int(cnts.sum()))
    cum_ref = ray.put(cum)

    def assign(batch: pa.Table) -> pa.Table:
        tables = ray.get(cum_ref)
        seg_map = ray.get(seg_map_ref)
        df = batch.to_pandas()
        df["c_mktsegment"] = df["o_custkey"].map(seg_map)
        price = np.floor(df["o_totalprice"].to_numpy() * 100.0 + 0.5).astype("int64")
        pr = np.empty(len(df), dtype=np.float64)
        cd = np.empty(len(df), dtype=np.float64)
        segs = df["c_mktsegment"].to_numpy()
        for seg in pd.unique(segs):
            m = segs == seg
            vals, below, cnts, n = tables[seg]
            pos = np.searchsorted(vals, price[m])
            b = below[pos].astype(np.float64)
            t = cnts[pos].astype(np.float64)
            pr[m] = b / (n - 1) if n > 1 else 0.0
            cd[m] = (b + t) / n
        out = pa.table(
            {
                "o_orderkey": pa.array(df["o_orderkey"].to_numpy(), pa.int64()),
                "c_mktsegment": pa.array(segs, pa.string()),
                "pr_e6": pa.array(np.floor(pr * 1e6 + 0.5).astype("int64"), pa.int64()),
                "cd_e6": pa.array(np.floor(cd * 1e6 + 0.5).astype("int64"), pa.int64()),
            }
        )
        return out

    return orders.map_batches(assign, batch_format="pyarrow")


def events_daily_distinct_users(sf_dir: str) -> pd.DataFrame:
    """COUNT(DISTINCT user_id) per (event_type, day) — the windowed-cube
    sibling of ``distinct_users``.  Same two-stage shape: per-batch
    triple dedup (combiner) + a COARSE-BUCKET shuffle on user_id (equal
    triples share a bucket because the bucket ignores the group columns),
    per-bucket exact dedup in pandas, then a small ≤|types×days|-key
    groupby-sum.  No shuffle ever keys on the raw high-cardinality
    triple (the near-all-distinct-key pathology)."""
    from .dedup import coarse_buckets

    ev = rd.read_parquet(_t(sf_dir, "events"), columns=["event_type", "ts", "user_id"])
    nb = coarse_buckets(ev.count(), rows_per_task=65536)

    def triples(batch: pd.DataFrame) -> pa.Table:
        batch["day"] = batch["ts"].dt.floor("D")
        df = batch[["event_type", "day", "user_id"]].drop_duplicates()
        df = df.assign(__b=(df["user_id"].to_numpy() % nb).astype("int64"))
        return pa.Table.from_pandas(
            df,
            preserve_index=False,
            schema=pa.schema(
                [("event_type", pa.string()), ("day", pa.timestamp("us")),
                 ("user_id", pa.int64()), ("__b", pa.int64())]
            ),
        )

    def bucket_count(g: pd.DataFrame) -> pd.DataFrame:
        d = g[["event_type", "day", "user_id"]].drop_duplicates()
        return d.groupby(["event_type", "day"], as_index=False).agg(
            n_users=("user_id", "size")
        )

    out = (
        ev.map_batches(triples, batch_format="pandas")
        .groupby("__b")
        .map_groups(bucket_count, batch_format="pandas")
        .groupby(["event_type", "day"])
        .sum("n_users")
        .to_pandas()
        .rename(columns={"sum(n_users)": "n_users"})
    )
    return out[["event_type", "day", "n_users"]].sort_values(
        ["event_type", "day"]
    ).reset_index(drop=True)


def user_mode_event(sf_dir: str) -> pd.DataFrame:
    """Grouped MODE with a deterministic tie-break (count DESC, value
    ASC) — the statistical-mode aggregate.  Per-batch (user, type) count
    partials OR-combine through ONE coarse-bucket exchange keyed on
    user_id (every row of a user lands in one task); the argmax runs as
    a vectorized grouped idxmax inside each bucket.  Exchange payload ≤
    |users|·|types| partial rows, never event rows."""
    from .dedup import coarse_buckets

    ev = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "event_type"])
    nb = coarse_buckets(ev.count(), rows_per_task=65536)

    def partial(batch: pd.DataFrame) -> pa.Table:
        g = batch.groupby(["user_id", "event_type"], as_index=False).size().rename(
            columns={"size": "n"}
        )
        g["__b"] = (g["user_id"].to_numpy() % nb).astype("int64")
        return pa.Table.from_pandas(
            g,
            preserve_index=False,
            schema=pa.schema(
                [("user_id", pa.int64()), ("event_type", pa.string()),
                 ("n", pa.int64()), ("__b", pa.int64())]
            ),
        )

    def bucket_mode(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(["user_id", "event_type"], as_index=False)["n"].sum()
        # deterministic argmax: sort by (n desc, event_type asc), take head
        s = s.sort_values(["user_id", "n", "event_type"],
                          ascending=[True, False, True])
        top = s.groupby("user_id", as_index=False).head(1)
        return top.rename(columns={"event_type": "mode_event", "n": "n_mode"})[
            ["user_id", "mode_event", "n_mode"]
        ]

    out = (
        ev.map_batches(partial, batch_format="pandas")
        .groupby("__b")
        .map_groups(bucket_mode, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("user_id").reset_index(drop=True)


def purchase_days_no_click(sf_dir: str) -> pd.DataFrame:
    """EXCEPT over a composite high-cardinality key: (user_id, day)
    pairs that saw a purchase but no click.  Set membership flags
    OR-combine per batch, one coarse-bucket exchange on user_id
    colocates equal pairs, and the per-bucket cut keeps has_a AND NOT
    has_b — the general distributed EXCEPT shape (no sort, payload ≤
    |distinct pairs|)."""
    from .dedup import coarse_buckets

    ev = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts", "event_type"])
    nb = coarse_buckets(ev.count(), rows_per_task=65536)

    def partial(batch: pd.DataFrame) -> pa.Table:
        batch = batch[batch["event_type"].isin(["purchase", "click"])].copy()
        batch["day"] = batch["ts"].dt.floor("D")
        batch["is_p"] = (batch["event_type"] == "purchase").astype("int64")
        batch["is_c"] = (batch["event_type"] == "click").astype("int64")
        g = batch.groupby(["user_id", "day"], as_index=False).agg(
            is_p=("is_p", "max"), is_c=("is_c", "max")
        )
        g["__b"] = (g["user_id"].to_numpy() % nb).astype("int64")
        return pa.Table.from_pandas(
            g,
            preserve_index=False,
            schema=pa.schema(
                [("user_id", pa.int64()), ("day", pa.timestamp("us")),
                 ("is_p", pa.int64()), ("is_c", pa.int64()), ("__b", pa.int64())]
            ),
        )

    def bucket_except(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(["user_id", "day"], as_index=False).agg(
            is_p=("is_p", "max"), is_c=("is_c", "max")
        )
        return s[(s["is_p"] > 0) & (s["is_c"] == 0)][["user_id", "day"]]

    out = (
        ev.map_batches(partial, batch_format="pandas")
        .groupby("__b")
        .map_groups(bucket_except, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values(["user_id", "day"]).reset_index(drop=True)


def events_daily_gapfill(sf_dir: str, min_value: float = 150.0) -> pd.DataFrame:
    """Date-spine GAP FILL: daily counts of high-value events per type,
    zero-filled over the complete [min day, max day] calendar so
    downstream time-series consumers never see missing rows.  The heavy
    part (daily counts) is a distributed combiner + ≤|types×days|-key
    groupby; the spine itself is metadata-sized (|days|·|types| rows)
    and assembles on the driver — the standard split for a 100 TB input
    whose OUTPUT grid is tiny."""
    ev = rd.read_parquet(_t(sf_dir, "events"), columns=["event_type", "ts", "value"])

    def partial(batch: pd.DataFrame) -> pa.Table:
        batch = batch[batch["value"] > min_value].copy()
        batch["day"] = batch["ts"].dt.floor("D")
        g = batch.groupby(["event_type", "day"], as_index=False).size().rename(
            columns={"size": "n"}
        )
        return pa.Table.from_pandas(
            g,
            preserve_index=False,
            schema=pa.schema(
                [("event_type", pa.string()), ("day", pa.timestamp("us")),
                 ("n", pa.int64())]
            ),
        )

    # the global day range comes from the UNFILTERED table (cheap
    # min/max aggregate) so the spine is stable under the value filter
    bounds = (
        rd.read_parquet(_t(sf_dir, "events"), columns=["ts"])
        .map_batches(
            lambda b: pa.table(
                {"mn": pa.array([pc.min(b["ts"]).as_py()], pa.timestamp("us")),
                 "mx": pa.array([pc.max(b["ts"]).as_py()], pa.timestamp("us"))}
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    mn = bounds["mn"].min().floor("D")
    mx = bounds["mx"].max().floor("D")

    counts = (
        ev.map_batches(partial, batch_format="pandas")
        .groupby(["event_type", "day"])
        .sum("n")
        .to_pandas()
        .rename(columns={"sum(n)": "n"})
    )
    types = sorted(counts["event_type"].unique())
    spine = pd.MultiIndex.from_product(
        [types, pd.date_range(mn, mx, freq="D")], names=["event_type", "day"]
    ).to_frame(index=False)
    out = spine.merge(counts, on=["event_type", "day"], how="left")
    out["n"] = out["n"].fillna(0).astype("int64")
    return out.sort_values(["event_type", "day"]).reset_index(drop=True)


def passage_dedup_docs(sf_dir: str, k: int = 5) -> pd.DataFrame:
    """Passage-level exact dedup (the MassiveText/CCNet line-dedup rule
    applied to ``k``-token passages — Rae et al. 2021 dedup repeated
    passages, Wenzek et al. 2020 dedup lines): split every doc into
    non-overlapping ``k``-token chunks; a chunk occurrence survives iff
    it is the corpus-wide FIRST occurrence of that exact passage string
    (minimal ``(doc_id, chunk_pos)``).  Returns per-doc ``n_chunks``,
    ``n_kept`` and the cleaned text (kept passages re-joined in order;
    a fully-duplicated doc cleans to NULL).

    Scale shape: pass 1 is a per-batch combiner (distinct passages with
    local min-key + count) into ONE coarse-bucketed exchange whose
    per-bucket pandas groupby yields global winners; only passages with
    corpus count ≥ 2 (the boilerplate set — tiny vs the corpus) reach
    the driver and are broadcast into pass 2, a shuffle-free streaming
    re-scan that drops every occurrence losing to the broadcast winner.
    The exchange ships DISTINCT passages once each; at 100 TB you'd key
    it on a 128-bit passage hash and keep strings worker-local — exact
    strings keep the sandbox oracle-exact."""
    from .dedup import coarse_buckets

    docs = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    nb = coarse_buckets(docs.count(), rows_per_task=8192)
    POS_BITS = 20  # composite key doc_id<<20 | chunk_pos (≤1M chunks/doc)

    def _chunks(text: str) -> list[str]:
        toks = (text or "").split(" ")  # exact string_split semantics
        return [" ".join(toks[i : i + k]) for i in range(0, len(toks), k)]

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        assert ids.max(initial=0) < (1 << (63 - POS_BITS)), "doc_id overflows key"
        rows_line, rows_key = [], []
        for d, t in zip(ids, batch["text"].to_pylist()):
            base = int(d) << POS_BITS
            for p, c in enumerate(_chunks(t)):
                rows_line.append(c)
                rows_key.append(base + p)
        df = pd.DataFrame({"line": rows_line, "key": rows_key})
        agg = df.groupby("line", as_index=False).agg(key=("key", "min"), c=("key", "size"))
        # deterministic cross-process bucket (builtin hash() is seeded
        # per interpreter — equal lines MUST share a bucket across tasks)
        agg["__b"] = (
            pd.util.hash_array(agg["line"].to_numpy(dtype=object)) % nb
        ).astype("int64")
        return pa.Table.from_pandas(
            agg,
            schema=pa.schema(
                [("line", pa.string()), ("key", pa.int64()),
                 ("c", pa.int64()), ("__b", pa.int64())]
            ),
            preserve_index=False,
        )

    def winners(g: pd.DataFrame) -> pd.DataFrame:
        w = g.groupby("line", as_index=False).agg(key=("key", "min"), c=("c", "sum"))
        return w[w["c"] >= 2][["line", "key"]]

    dup = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(winners, batch_format="pandas")
        .to_pandas()
    )
    dup_map = (
        dict(zip(dup["line"], dup["key"])) if len(dup) else {}
    )  # boilerplate set — broadcast via closure

    def clean(batch: pa.Table) -> pa.Table:
        out_id, out_n, out_kept, out_text = [], [], [], []
        for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            cs = _chunks(t)
            base = int(d) << POS_BITS
            kept = [
                c for p, c in enumerate(cs)
                if dup_map.get(c, base + p) == base + p
            ]
            out_id.append(d)
            out_n.append(len(cs))
            out_kept.append(len(kept))
            out_text.append(" ".join(kept) if kept else None)
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "n_chunks": pa.array(out_n, pa.int64()),
                "n_kept": pa.array(out_kept, pa.int64()),
                "text_clean": pa.array(out_text, pa.string()),
            }
        )

    df = docs.map_batches(clean, batch_format="pyarrow").to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)


def events_value_quantile_sketch(sf_dir: str, k: int = 256) -> pd.DataFrame:
    """Per-type approximate quantiles via the mergeable MRL sketch
    (functions.sketch.QuantileSketch) — the scale path for quantiles
    over data too big to sort: each batch contributes one ≤k-point
    sketch per event_type (a combiner — O(k) per batch regardless of
    rows), the driver folds partials in a deterministic order, and the
    result carries the sketch's own certified max rank error.  The
    exact twin (events_quantiles) needs a full sort; this needs one
    streaming pass and O(k · types · batches) driver bytes."""
    from ..functions.sketch import QuantileSketch

    ev = rd.read_parquet(_t(sf_dir, "events"), columns=["event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        types, sks, ns = [], [], []
        for t, g in df.groupby("event_type"):
            types.append(t)
            sks.append(QuantileSketch.from_values(g["value"].to_numpy(), k).to_bytes())
            ns.append(len(g))
        return pa.table(
            {
                "event_type": pa.array(types, pa.string()),
                "sk": pa.array(sks, pa.binary()),
                "n": pa.array(ns, pa.int64()),
            }
        )

    parts = ev.map_batches(partial, batch_format="pyarrow").to_pandas()
    rows = []
    for t, g in parts.groupby("event_type", sort=True):
        blobs = sorted(g["sk"].tolist())  # order-stable fold
        sk = QuantileSketch.from_bytes(blobs[0])
        for b in blobs[1:]:
            sk = sk.merge(QuantileSketch.from_bytes(b))
        rows.append(
            (t, int(g["n"].sum()), sk.quantile(0.5), sk.quantile(0.9),
             sk.quantile(0.99), sk.q_err_bound)
        )
    return pd.DataFrame(
        rows, columns=["event_type", "n", "p50", "p90", "p99", "err_bound"]
    ).sort_values("event_type").reset_index(drop=True)


def bm25_search(
    sf_dir: str, query: tuple = ("table", "scan", "merge"), k: int = 20
) -> pd.DataFrame:
    """BM25 ranked retrieval (Robertson-Sparck Jones probabilistic
    ranking, the Lucene-parameterised form: k1=1.2, b=0.75, idf =
    ln((N-df+0.5)/(df+0.5)+1)) of the top-``k`` documents for a fixed
    query-term set.  Scale shape — TWO streaming passes, ZERO shuffles:
    pass 1 reduces per-batch corpus statistics (doc count, total token
    count, per-query-term document frequencies — O(|query|) per batch);
    pass 2 scores only docs containing a query term against the
    broadcast constants and keeps a per-batch partial top-k (the ANN
    combiner pattern), so the driver merges O(k x batches) rows.
    Scores ship as half-up e6 integers for oracle-exact comparison."""
    K1, B = 1.2, 0.75
    terms = list(query)
    docs = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def stats(batch: pa.Table) -> pa.Table:
        dfs = dict.fromkeys(terms, 0)
        n_tok = 0
        for t in batch["text"].to_pylist():
            toks = [w for w in (t or "").split(" ") if w]
            n_tok += len(toks)
            s = set(toks)
            for q in terms:
                if q in s:
                    dfs[q] += 1
        return pa.table(
            {
                "n_docs": pa.array([batch.num_rows], pa.int64()),
                "n_tok": pa.array([n_tok], pa.int64()),
                **{f"df_{i}": pa.array([dfs[q]], pa.int64()) for i, q in enumerate(terms)},
            }
        )

    st = docs.map_batches(stats, batch_format="pyarrow").to_pandas().sum()
    n, avgdl = int(st["n_docs"]), st["n_tok"] / st["n_docs"]
    idf = {
        q: float(np.log((n - st[f"df_{i}"] + 0.5) / (st[f"df_{i}"] + 0.5) + 1.0))
        for i, q in enumerate(terms)
    }

    def score(batch: pa.Table) -> pa.Table:
        ids, scores = [], []
        for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            toks = [w for w in (t or "").split(" ") if w]
            dl = len(toks)
            s = 0.0
            hit = False
            for q in terms:
                tf = toks.count(q)
                if tf:
                    hit = True
                    s += idf[q] * tf * (K1 + 1) / (tf + K1 * (1 - B + B * dl / avgdl))
            if hit:
                ids.append(d)
                scores.append(int(np.floor(s * 1e6 + 0.5)))
        out = pd.DataFrame({"doc_id": ids, "score_e6": scores})
        out = out.sort_values(
            ["score_e6", "doc_id"], ascending=[False, True]
        ).head(k)  # partial top-k: O(k) rows leave each batch
        return pa.Table.from_pandas(
            out,
            schema=pa.schema([("doc_id", pa.int64()), ("score_e6", pa.int64())]),
            preserve_index=False,
        )

    df = docs.map_batches(score, batch_format="pyarrow").to_pandas()
    return (
        df.sort_values(["score_e6", "doc_id"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )


def weighted_sample_docs(sf_dir: str, k: int = 25, seed: int = 0) -> pd.DataFrame:
    """Distributed weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis 2006): each doc draws a deterministic uniform u from
    md5(seed:doc_id) and gets key = −ln(u)/weight; the global k
    smallest keys are the sample — provably equivalent to sequential
    weighted draws without replacement.  Embarrassingly parallel: every
    batch emits its own k smallest (a partial top-k combiner), the
    driver merges O(k × batches) rows; no shuffle, no driver-side data.
    Deterministic + seedable, so the sample is reproducible across
    cluster sizes and retries (the md5 draw replaces RNG state — the
    same trick the split assigner uses).  Weight = n_chars."""
    import hashlib

    docs = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "n_chars"])
    pre = f"{seed}:" if seed else ""

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        w = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.float64)
        m = w > 0
        ids, w = ids[m], w[m]
        u = np.fromiter(
            (
                int(hashlib.md5(f"{pre}{i}".encode()).hexdigest()[:8], 16)
                for i in ids
            ),
            dtype=np.float64, count=len(ids),
        )
        key = -np.log((u + 0.5) / 4294967296.0) / w
        order = np.lexsort((ids, key))[:k]
        return pa.table(
            {
                "doc_id": pa.array(ids[order], pa.int64()),
                "n_chars": pa.array(w[order].astype(np.int64), pa.int64()),
                "key": pa.array(key[order], pa.float64()),
            }
        )

    df = docs.map_batches(partial, batch_format="pyarrow").to_pandas()
    df = df.sort_values(["key", "doc_id"]).head(k)
    return df[["doc_id", "n_chars"]].sort_values("doc_id").reset_index(drop=True)


def events_mad_value(sf_dir: str) -> pd.DataFrame:
    """Grouped ROBUST statistics: exact median-absolute-deviation and a
    3-MAD outlier count per event type — the standard robust outlier
    screen (Hampel identifier) that a mean/stddev z-score gets wrong on
    heavy tails.

    Scale shape: everything derives from the SAME domain-bounded
    distributed value histogram the median/quantile family walks
    (:func:`_event_value_hist`) — one combiner pass, shuffle payload
    bounded by the distinct-e2-value DOMAIN, never row count.  The
    dependent two-level aggregate (median of |x − median|) needs NO
    second data pass: the deviation histogram is a re-keying of the
    value histogram on the driver.  Integer-exact end to end: dev2 =
    |2·v − med2| (2× scale absorbs the even-size half), mad4 =
    2·median(dev2) = 4·MAD, and the Hampel cut |x − med| > 3·MAD
    becomes the pure integer comparison 2·dev2 > 3·mad4 — no float
    crosses the oracle."""
    out = []
    for et, g in _event_value_hist(sf_dir).groupby("event_type"):
        g = g.sort_values("v_e2")
        v = g["v_e2"].to_numpy()
        c = g["n"].to_numpy()
        n = int(c.sum())
        if n % 2:
            med2 = 2 * order_stat(v, c, n // 2 + 1)
        else:
            med2 = order_stat(v, c, n // 2) + order_stat(v, c, n // 2 + 1)
        dev = pd.DataFrame({"d2": np.abs(2 * v - med2), "n": c})
        dg = dev.groupby("d2", as_index=False)["n"].sum().sort_values("d2")
        dv = dg["d2"].to_numpy()
        dc = dg["n"].to_numpy()
        if n % 2:
            mad4 = 2 * order_stat(dv, dc, n // 2 + 1)
        else:
            mad4 = order_stat(dv, dc, n // 2) + order_stat(dv, dc, n // 2 + 1)
        n_out = int(c[np.abs(2 * v - med2) * 2 > 3 * mad4].sum())
        out.append((et, n, med2, mad4, n_out))
    return pd.DataFrame(
        out, columns=["event_type", "n", "med2_e2", "mad4_e2", "n_outliers"]
    )


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


def lineitem_price_regression(sf_dir: str) -> pd.DataFrame:
    """Grouped ORDINARY-LEAST-SQUARES regression (the SQL REGR_* family):
    per return flag, fit extendedprice = slope·quantity + intercept and
    report r² — the statistics aggregate one level past correlation
    (corr gives direction; regression gives the fitted model).

    Scale shape: identical to :func:`events_value_time_corr` — per-batch
    EXACT int64 moment combiners (y at e2; per-batch sums stay ≪ 2^63),
    merged on the driver in arbitrary-precision Python ints, so no global
    Σy² can silently wrap at any sf.  Slope/intercept/r² derive from the
    exact integers with the SAME final float expressions as the oracle
    (half-up e6) — no float ordering crosses the hash."""
    li = rd.read_parquet(
        _t(sf_dir, "lineitem"),
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        x = df["l_quantity"].to_numpy().astype("int64")
        y = np.floor(df["l_extendedprice"].to_numpy() * 100.0 + 0.5).astype("int64")
        g = pd.DataFrame(
            {"l_returnflag": df["l_returnflag"], "n": 1, "sx": x, "sy": y,
             "sxy": x * y, "sxx": x * x, "syy": y * y}
        ).groupby("l_returnflag", as_index=False).sum()
        return pa.Table.from_pandas(
            g,
            schema=pa.schema(
                [("l_returnflag", pa.string())]
                + [(c, pa.int64()) for c in ("n", "sx", "sy", "sxy", "sxx", "syy")]
            ),
            preserve_index=False,
        )

    parts = li.map_batches(partial, batch_format="pyarrow").to_pandas()
    cols = ["n", "sx", "sy", "sxy", "sxx", "syy"]
    m = parts.groupby("l_returnflag", as_index=False)[cols].agg(
        lambda s: sum(int(v) for v in s)
    )
    n = m["n"].astype(np.float64).to_numpy()
    sx = m["sx"].astype(np.float64).to_numpy()
    sy = m["sy"].astype(np.float64).to_numpy()
    sxy = m["sxy"].astype(np.float64).to_numpy()
    sxx = m["sxx"].astype(np.float64).to_numpy()
    syy = m["syy"].astype(np.float64).to_numpy()
    cov = n * sxy - sx * sy
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    m["slope_e6"] = np.floor(cov / vx * 1e6 + 0.5).astype("int64")
    m["intercept_e6"] = np.floor((sy * sxx - sx * sxy) / vx * 1e6 + 0.5).astype("int64")
    m["r2_e6"] = np.floor(cov * cov / (vx * vy) * 1e6 + 0.5).astype("int64")
    out = m[["l_returnflag", "n", "slope_e6", "intercept_e6", "r2_e6"]]
    return out.sort_values("l_returnflag").reset_index(drop=True)


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


def _word_count_table(sf_dir: str) -> dict:
    """Corpus → vocabulary-bounded word → count dict: per-batch
    combiners + ONE coarse-bucket exchange (payload bounded by the
    VOCABULARY, not the corpus — the exact reduction real subword
    trainers use).  Shared by the BPE and unigram-LM tokenizer ops."""
    from .dedup import coarse_buckets

    docs = rd.read_parquet(_t(sf_dir, "documents"), columns=["text"])
    nb = coarse_buckets(docs.count(), rows_per_task=16384)

    def word_partial(batch: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern(batch["text"], " "))
        df = pd.DataFrame({"word": toks.to_pandas()})
        df = df[df["word"] != ""]
        g = df.groupby("word", as_index=False).agg(n=("word", "size"))
        g["__b"] = (
            np.frombuffer(
                pd.util.hash_array(g["word"].to_numpy(object)).tobytes(),
                dtype=np.uint64,
            ).astype(np.int64)
            % nb + nb
        ) % nb
        return pa.Table.from_pandas(
            g,
            schema=pa.schema(
                [("word", pa.string()), ("n", pa.int64()), ("__b", pa.int64())]
            ),
            preserve_index=False,
        )

    def sum_counts(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("word", as_index=False)["n"].sum()

    wc_df = (
        docs.map_batches(word_partial, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(sum_counts, batch_format="pandas")
        .to_pandas()  # vocabulary-bounded, never corpus-sized
    )
    return dict(zip(wc_df["word"], wc_df["n"]))


def _bpe_merges(sf_dir: str, n_merges: int) -> list:
    """Shared trainer behind :func:`bpe_vocab` and
    :func:`bpe_encode_docs`: the word-count reduction above →
    deterministic driver-side merge loop."""
    from ..functions.text import bpe_learn

    return bpe_learn(_word_count_table(sf_dir), n_merges)


def bpe_vocab(sf_dir: str, n_merges: int = 40) -> pd.DataFrame:
    """TOKENIZER TRAINING: learn a BPE merge table over the corpus
    (Sennrich et al. 2016) — the step a real training-data pipeline runs
    before token counting/packing ever happens.

    Scale shape: the corpus reduces to a word → count table via per-batch
    combiners + ONE coarse-bucket exchange (payload bounded by the
    VOCABULARY, not the corpus — the exact reduction real BPE trainers
    use); the merge loop then runs driver-side over that bounded table
    (:func:`~opps_feedcrawler_ray.functions.text.bpe_learn`),
    deterministic under any batch/cluster layout.  Iterative and
    count-threshold driven — not SQL-expressible, so this query is
    rows-only; the kernel is pinned by the published worked example and
    an independent-recount property test."""
    merges = _bpe_merges(sf_dir, n_merges)
    return pd.DataFrame(
        {
            "rank": pd.Series(range(len(merges)), dtype="int64"),
            "left": [a for a, _ in merges],
            "right": [b for _, b in merges],
        }
    )


def event_type_lift(sf_dir: str) -> pd.DataFrame:
    """ASSOCIATION-RULE mining (market-basket support/lift, Agrawal &
    Srikant 1994): for every unordered event-type pair, how many users
    did both, and the lift vs independence — the co-occurrence analytics
    class (frequent itemsets of size 2).

    Scale shape: per-batch distinct (user, type) combiner → one
    user-bucket exchange where each user's type SET completes → pair
    fan-out bounded by |types|² per user (types ≤ 5 here; a wide-domain
    deployment would Apriori-prune on min-support first, same exchange)
    → the (a, b) count table is |types|²-bounded — the driver only ever
    sees domain-sized tables.  Lift derives from exact integer counts
    with the same final float expression as the oracle (e6 half-up)."""
    from .dedup import coarse_buckets

    ev = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "event_type"])
    nb = coarse_buckets(ev.count(), rows_per_task=65536)

    def distinct_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().drop_duplicates()
        df["__b"] = (df["user_id"].to_numpy().astype("int64") % nb).astype("int64")
        return pa.Table.from_pandas(
            df,
            schema=pa.schema(
                [("user_id", pa.int64()), ("event_type", pa.string()),
                 ("__b", pa.int64())]
            ),
            preserve_index=False,
        )

    def pairs_per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["user_id", "event_type"])
        m = g.merge(g, on="user_id")
        # unordered pairs (a < b) plus the diagonal for singleton counts
        m = m[m["event_type_x"] <= m["event_type_y"]]
        out = m.groupby(["event_type_x", "event_type_y"], as_index=False).agg(
            n_users=("user_id", "size")
        )
        out["n_users"] = out["n_users"].astype("int64")
        # also one row per bucket for the user-universe count
        uni = pd.DataFrame(
            {"event_type_x": [" "], "event_type_y": [" "],
             "n_users": [g["user_id"].nunique()]}
        )
        return pd.concat([out, uni], ignore_index=True)

    tab = (
        ev.map_batches(distinct_partial, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(pairs_per_user, batch_format="pandas")
        .to_pandas()
        .groupby(["event_type_x", "event_type_y"], as_index=False)["n_users"]
        .sum()  # |types|²-bounded
    )
    total = int(tab[tab["event_type_x"] == " "]["n_users"].iloc[0])
    tab = tab[tab["event_type_x"] != " "]
    single = {
        r.event_type_x: int(r.n_users)
        for r in tab[tab["event_type_x"] == tab["event_type_y"]].itertuples()
    }
    out = tab[tab["event_type_x"] < tab["event_type_y"]].copy()
    out = out.rename(columns={"event_type_x": "type_a", "event_type_y": "type_b",
                              "n_users": "n_both"})
    na = out["type_a"].map(single).astype("int64")
    nb_ = out["type_b"].map(single).astype("int64")
    out["support_e6"] = np.floor(
        out["n_both"].to_numpy() / total * 1e6 + 0.5
    ).astype("int64")
    out["lift_e6"] = np.floor(
        out["n_both"].to_numpy().astype("float64") * total
        / (na.to_numpy().astype("float64") * nb_.to_numpy()) * 1e6 + 0.5
    ).astype("int64")
    out["n_both"] = out["n_both"].astype("int64")
    return (
        out[["type_a", "type_b", "n_both", "support_e6", "lift_e6"]]
        .sort_values(["type_a", "type_b"])
        .reset_index(drop=True)
    )


def dsir_resample(sf_dir: str, k: int = 100, dim: int = 4096, seed: int = 0) -> pd.DataFrame:
    """DSIR data selection (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every document by
    the log-likelihood ratio of a TARGET domain vs the raw corpus under
    hashed-unigram bag-of-words models, then Gumbel-top-k resample —
    the published recipe for tilting a web-scale corpus toward a
    high-quality target distribution.  Target here = the English slice
    (the stand-in for "quality" in the fixture corpus).

    Scale shape: pass 1 accumulates the two ``dim``-bounded hashed
    count vectors via per-batch combiners (payload = 2·dim ints per
    batch, never rows); the smoothed log-ratio table broadcasts once;
    pass 2 streams the corpus computing per-doc importance log-weights
    plus a DETERMINISTIC md5-seeded Gumbel perturbation (the same
    RNG-free draw the weighted sampler uses), with per-batch partial
    top-k — the driver merges O(k × batches) rows.  Two streaming
    passes, zero data-sized shuffles, reproducible across cluster
    sizes and retries."""
    import hashlib

    docs = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text", "lang"])

    def _buckets(text: str) -> np.ndarray:
        toks = [t for t in text.lower().split(" ") if t]
        if not toks:
            return np.empty(0, np.int64)
        return np.fromiter(
            (int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % dim for t in toks),
            dtype=np.int64, count=len(toks),
        )

    def count_partial(batch: pa.Table) -> pa.Table:
        tgt = np.zeros(dim, np.int64)
        allc = np.zeros(dim, np.int64)
        for txt, lang in zip(batch["text"].to_pylist(), batch["lang"].to_pylist()):
            b = _buckets(txt)
            if len(b) == 0:
                continue
            binc = np.bincount(b, minlength=dim)
            allc += binc
            if lang == "en":
                tgt += binc
        return pa.table(
            {"bucket": pa.array(np.arange(dim), pa.int64()),
             "tgt": pa.array(tgt, pa.int64()),
             "all": pa.array(allc, pa.int64())}
        )

    cnt = (
        docs.map_batches(count_partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("bucket", as_index=False)[["tgt", "all"]]
        .sum()  # dim-bounded — a combiner merge, not a data shuffle
        .sort_values("bucket")
    )
    t = cnt["tgt"].to_numpy().astype(np.float64)
    a = cnt["all"].to_numpy().astype(np.float64)
    # add-1 smoothing keeps zero-count buckets finite
    lr = np.log((t + 1.0) / (t.sum() + dim)) - np.log((a + 1.0) / (a.sum() + dim))

    import ray

    lr_ref = ray.put(lr)
    pre = f"{seed}:" if seed else ""

    def score_partial(batch: pa.Table) -> pa.Table:
        table = ray.get(lr_ref)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lws = np.empty(len(ids), np.float64)
        for i, txt in enumerate(batch["text"].to_pylist()):
            b = _buckets(txt)
            lws[i] = float(table[b].sum()) if len(b) else -np.inf
        u = np.fromiter(
            (int(hashlib.md5(f"{pre}{i}".encode()).hexdigest()[:8], 16) for i in ids),
            dtype=np.float64, count=len(ids),
        )
        gumbel = -np.log(-np.log((u + 0.5) / 4294967296.0))
        key = lws + gumbel
        order = np.lexsort((ids, -key))[:k]  # partial top-k per batch
        return pa.table(
            {"doc_id": pa.array(ids[order], pa.int64()),
             "log_weight_e6": pa.array(
                 np.floor(lws[order] * 1e6 + 0.5).astype(np.int64), pa.int64()),
             "key": pa.array(key[order], pa.float64())}
        )

    df = docs.map_batches(score_partial, batch_format="pyarrow").to_pandas()
    df = df.sort_values(["key", "doc_id"], ascending=[False, True]).head(k)
    return (
        df[["doc_id", "log_weight_e6"]]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def events_running_total(sf_dir: str) -> pd.DataFrame:
    """Grouped RUNNING TOTAL — ``SUM(value) OVER (PARTITION BY user
    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)`` — the cumulative
    window frame the moving/lag/rank family doesn't cover.

    Scale shape: one user-bucket exchange (the documented floor for
    ordered per-user windows), then ONE grouped pandas cumsum across all
    users in the bucket at once — no per-user Python.  Values ride as
    exact e2 integers so the cumulative sums are associative-exact and
    hash-equal to the oracle."""
    from .dedup import coarse_buckets

    ev = rd.read_parquet(
        _t(sf_dir, "events"), columns=["user_id", "ts", "event_id", "value"]
    )
    nb = coarse_buckets(ev.count(), rows_per_task=65536)

    def add_bucket(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["v_e2"] = np.floor(df["value"].to_numpy() * 100.0 + 0.5).astype("int64")
        df["__b"] = (df["user_id"].to_numpy() % nb).astype("int64")
        return pa.Table.from_pandas(
            df[["user_id", "ts", "event_id", "v_e2", "__b"]],
            schema=pa.schema([("user_id", pa.int64()), ("ts", pa.timestamp("us")),
                              ("event_id", pa.int64()), ("v_e2", pa.int64()),
                              ("__b", pa.int64())]),
            preserve_index=False,
        )

    def cumsum(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        g["running_e2"] = g.groupby("user_id")["v_e2"].cumsum().astype("int64")
        return g[["event_id", "user_id", "running_e2"]]

    out = (
        ev.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(cumsum, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("event_id").reset_index(drop=True)


def user_retention_cohorts(sf_dir: str) -> pd.DataFrame:
    """RETENTION COHORT analysis — the product-analytics matrix: users
    cohorted by first-activity week, counted at each later week offset
    they were active.

    Scale shape: per-batch distinct (user, week) + per-batch min-week
    combiners → ONE user-bucket exchange where each user's first week
    and active-week set complete → (cohort_week, offset) counts — the
    output exchange is bounded by |weeks|², never row count."""
    from .dedup import coarse_buckets

    ev = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts"])
    nb = coarse_buckets(ev.count(), rows_per_task=65536)
    epoch0 = pd.Timestamp("2024-01-01")  # Monday anchor for week index

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["week"] = ((df["ts"] - epoch0).dt.days // 7).astype("int64")
        g = df[["user_id", "week"]].drop_duplicates()
        g["__b"] = (g["user_id"].to_numpy() % nb).astype("int64")
        return pa.Table.from_pandas(
            g,
            schema=pa.schema([("user_id", pa.int64()), ("week", pa.int64()),
                              ("__b", pa.int64())]),
            preserve_index=False,
        )

    def cohort_counts(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["user_id", "week"])
        first = g.groupby("user_id")["week"].transform("min")
        out = pd.DataFrame(
            {"cohort_week": first, "week_offset": g["week"] - first}
        )
        out = out.groupby(["cohort_week", "week_offset"], as_index=False).agg(
            n_users=("week_offset", "size")
        )
        out["n_users"] = out["n_users"].astype("int64")
        return out

    out = (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(cohort_counts, batch_format="pandas")
        .to_pandas()
        .groupby(["cohort_week", "week_offset"], as_index=False)["n_users"]
        .sum()  # |weeks|²-bounded
    )
    out["n_users"] = out["n_users"].astype("int64")
    return out.sort_values(["cohort_week", "week_offset"]).reset_index(drop=True)


def top_tokens_per_lang(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """GROUPED top-k heavy terms — the per-language vocabulary head
    (stopword discovery / corpus fingerprinting input).

    Scale shape: per-batch (lang, token) count combiner → ONE
    token-bucket exchange (equal tokens co-locate, so per-bucket counts
    are EXACT) → per-bucket, per-lang local top-k cut with the global
    ordering key (n desc, token asc).  The local cut is a provable
    superset of the global top-k (a bucket holds a token's entire
    count), so the driver merges ≤ k·|langs|·n_buckets rows — never the
    vocabulary."""
    from ..functions.hashing import fingerprint64
    from .dedup import coarse_buckets

    docs = rd.read_parquet(_t(sf_dir, "documents"), columns=["lang", "text"])
    nb = coarse_buckets(docs.count(), rows_per_task=256, lo=64)

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch["text"], pattern=" ")
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        df = pd.DataFrame(
            {"lang": np.repeat(
                np.asarray(batch["lang"].to_pylist(), dtype=object), lens),
             "token": flat.to_pandas()}
        )
        g = df[df["token"] != ""].groupby(
            ["lang", "token"], as_index=False
        ).agg(n=("token", "size"))
        # stable bucket hash on the batch-unique token set (bounded by
        # per-batch vocabulary, not token occurrences)
        g["__b"] = np.fromiter(
            (fingerprint64(t) % nb for t in g["token"]),
            dtype=np.int64, count=len(g),
        )
        return pa.Table.from_pandas(
            g, preserve_index=False,
            schema=pa.schema([("lang", pa.string()), ("token", pa.string()),
                              ("n", pa.int64()), ("__b", pa.int64())]),
        )

    def local_topk(g: pd.DataFrame) -> pd.DataFrame:
        co = g.groupby(["lang", "token"], as_index=False)["n"].sum()
        top = (
            co.sort_values(["lang", "n", "token"], ascending=[True, False, True])
            .groupby("lang")
            .head(k)
        )
        return top.reset_index(drop=True)

    out = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(local_topk, batch_format="pandas")
        .to_pandas()
        .sort_values(["lang", "n", "token"], ascending=[True, False, True])
    )
    out["rn"] = out.groupby("lang").cumcount().astype("int64") + 1
    out = out[out["rn"] <= k]
    out["n"] = out["n"].astype("int64")
    return out[["lang", "token", "n", "rn"]].reset_index(drop=True)


def user_day_streaks(sf_dir: str) -> pd.DataFrame:
    """GAPS-AND-ISLANDS — longest run of consecutive active days per
    user, the classic ``day - ROW_NUMBER()`` island construction that no
    fixed window frame expresses.

    Scale shape: per-batch distinct (user, epoch-day) combiner shrinks
    the exchange to the user×day domain (never raw event rows), then ONE
    user-bucket exchange where each user's day set completes; islands
    come from a single grouped cumcount subtraction across every user in
    the bucket at once — no per-user Python."""
    from .dedup import coarse_buckets

    ev = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts"])
    nb = coarse_buckets(ev.count(), rows_per_task=65536)
    epoch = pd.Timestamp("1970-01-01")

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["day"] = (df["ts"] - epoch).dt.days.astype("int64")
        g = df[["user_id", "day"]].drop_duplicates()
        g["__b"] = (g["user_id"].to_numpy() % nb).astype("int64")
        return pa.Table.from_pandas(
            g,
            schema=pa.schema([("user_id", pa.int64()), ("day", pa.int64()),
                              ("__b", pa.int64())]),
            preserve_index=False,
        )

    def streaks(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["user_id", "day"]).sort_values(["user_id", "day"])
        # island id: consecutive days share (day - rank-within-user)
        g["isl"] = g["day"].to_numpy() - g.groupby("user_id").cumcount().to_numpy()
        runs = g.groupby(["user_id", "isl"], as_index=False).agg(
            length=("day", "size")
        )
        out = runs.groupby("user_id", as_index=False).agg(
            n_active_days=("length", "sum"),
            n_streaks=("length", "size"),
            max_streak=("length", "max"),
        )
        return out.astype("int64")

    out = (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(streaks, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("user_id").reset_index(drop=True)


def events_running_distinct(sf_dir: str) -> pd.DataFrame:
    """Grouped RUNNING DISTINCT COUNT — ``COUNT(DISTINCT event_type)``
    up to each event per user, the cumulative-dedup window the plain
    running total can't express (SQL needs a first-occurrence flag +
    running sum because DISTINCT isn't frameable).

    Scale shape: one user-bucket exchange, then a single vectorized pass
    per bucket: sort by (user, ts, event_id), first-occurrence mask via
    ``duplicated`` on (user, type), grouped cumsum — no per-user
    Python."""
    from .dedup import coarse_buckets

    ev = rd.read_parquet(
        _t(sf_dir, "events"), columns=["user_id", "ts", "event_id", "event_type"]
    )
    nb = coarse_buckets(ev.count(), rows_per_task=65536)

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = (batch["user_id"].to_numpy(zero_copy_only=False) % nb).astype("int64")
        return batch.append_column("__b", pa.array(b))

    def running(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        first = (~g.duplicated(["user_id", "event_type"])).astype("int64")
        g["n_distinct_types"] = first.groupby(
            g["user_id"].to_numpy()
        ).cumsum().astype("int64")
        return g[["event_id", "user_id", "n_distinct_types"]]

    out = (
        ev.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(running, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("event_id").reset_index(drop=True)


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


def purchase_click_days_except(sf_dir: str) -> pd.DataFrame:
    """EXCEPT ALL — BAG semantics (the multiset difference completing
    the bag family next to ``purchase_click_days_bag``): per (user, day)
    key, ``max(0, n_purchase − n_click)`` copies survive — SQL
    ``EXCEPT ALL``'s multiplicity rule.  Same single-exchange shape as
    the bag intersect: per-batch per-side count combiner → ONE
    user-bucket exchange → vectorized per-key difference."""
    ev = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "event_type", "ts"])
    nb = 64

    _pschema = pa.schema(
        [("user_id", pa.int64()), ("day", pa.timestamp("ns")),
         ("p", pa.int64()), ("c", pa.int64()), ("__b", pa.int64())]
    )

    def partial(b: pd.DataFrame) -> pa.Table:
        b = b[b["event_type"].isin(("purchase", "click"))]
        b = b.assign(day=b["ts"].dt.floor("D"))
        g = b.groupby(["user_id", "day", "event_type"], as_index=False).agg(
            n=("event_type", "size")
        )
        is_p = g["event_type"].to_numpy() == "purchase"
        n = g["n"].to_numpy(dtype="int64")
        g = g.assign(p=np.where(is_p, n, 0), c=np.where(is_p, 0, n))
        g = g.assign(__b=(g["user_id"].to_numpy(dtype="int64") % nb))
        return pa.Table.from_pandas(
            g[["user_id", "day", "p", "c", "__b"]], preserve_index=False,
            schema=_pschema,
        )

    _oschema = pa.schema(
        [("user_id", pa.int64()), ("day", pa.timestamp("ns")), ("n", pa.int64())]
    )

    def bucket(g: pd.DataFrame) -> pa.Table:
        s = g.groupby(["user_id", "day"], as_index=False)[["p", "c"]].sum()
        s = s.assign(
            n=np.maximum(s["p"].to_numpy() - s["c"].to_numpy(), 0)
        )
        s = s[s["n"] > 0]
        return pa.Table.from_pandas(
            s[["user_id", "day", "n"]], preserve_index=False, schema=_oschema
        )

    return (
        ev.map_batches(partial, batch_format="pandas")
        .groupby("__b")
        .map_groups(bucket, batch_format="pandas")
        .to_pandas()
        .sort_values(["user_id", "day"])
        .reset_index(drop=True)
    )


def event_transition_matrix(sf_dir: str) -> pd.DataFrame:
    """MARKOV TRANSITION COUNTS — categorical LAG: for every
    consecutive pair in a user's time-ordered stream, count
    (from_type → to_type) transitions; the behavioral-model input the
    numeric lag/diff family doesn't cover.

    Scale shape: one user-bucket exchange, grouped shift across all
    users in the bucket at once, then a |types|²-bounded count
    combiner closes the query."""
    from .dedup import coarse_buckets

    ev = rd.read_parquet(
        _t(sf_dir, "events"), columns=["user_id", "ts", "event_id", "event_type"]
    )
    nb = coarse_buckets(ev.count(), rows_per_task=65536)

    def add_ub(b: pd.DataFrame) -> pd.DataFrame:
        b["ub"] = (b["user_id"].to_numpy() % nb).astype("int64")
        return b

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        prev = g.groupby("user_id", sort=False)["event_type"].shift(1)
        d = pd.DataFrame({"from_type": prev, "to_type": g["event_type"]})
        d = d[d["from_type"].notna()]
        out = d.groupby(["from_type", "to_type"], as_index=False).size().rename(
            columns={"size": "n"}
        )
        out["n"] = out["n"].astype("int64")
        return out

    return (
        ev.map_batches(add_ub, batch_format="pandas")
        .groupby("ub")
        .map_groups(pairs_in_bucket, batch_format="pandas")
        .to_pandas()
        .groupby(["from_type", "to_type"], as_index=False)["n"]
        .sum()  # |types|²-bounded
        .sort_values(["from_type", "to_type"])
        .reset_index(drop=True)
    )


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


def events_trimmed_mean(sf_dir: str) -> pd.DataFrame:
    """ROBUST TRIMMED MEAN (10% each tail) per event type — the
    order-statistic aggregate between the median and the plain mean.

    Derives ENTIRELY from the domain-bounded value histogram
    (:func:`_event_value_hist`): with cumulative counts, the kept mass
    per value bucket is ``clip(min(cum, n−k) − max(cum_prev, k), 0)``
    — so the trim needs no second data pass and no sort exchange.
    Integer-exact: k = n // 10 (integer division both sides), sums in
    e2 units, the e6 mean uses the identical float expression as the
    oracle."""
    rows = []
    for et, g in _event_value_hist(sf_dir).groupby("event_type"):
        g = g.sort_values("v_e2")
        v = g["v_e2"].to_numpy()
        c = g["n"].to_numpy()
        n = int(c.sum())
        k = n // 10
        cum = np.cumsum(c)
        lo = np.concatenate(([0], cum[:-1]))
        kept = np.clip(np.minimum(cum, n - k) - np.maximum(lo, k), 0, None)
        s = int((v * kept).sum())
        n_kept = n - 2 * k
        mean_e6 = int(np.floor(float(s) * 10000 / n_kept + 0.5))
        rows.append((et, n_kept, s, mean_e6))
    out = pd.DataFrame(
        rows, columns=["event_type", "n_kept", "trimmed_sum_e2", "trimmed_mean_e6"]
    )
    return out.sort_values("event_type").reset_index(drop=True)


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


def events_time_weighted_avg(sf_dir: str) -> pd.DataFrame:
    """TIME-WEIGHTED AVERAGE — each value weighted by how long it was
    "held" (until the user's next event): the step-function integral
    metric (position/price averaging), distinct from every count-based
    mean.  Integer-exact: e2 values × whole seconds held, the e6 final
    uses the identical float expression as the oracle.

    Scale shape: one user-bucket exchange; holding times come from a
    grouped shift across all users in the bucket at once."""
    from .dedup import coarse_buckets

    ev = rd.read_parquet(
        _t(sf_dir, "events"), columns=["user_id", "ts", "event_id", "value"]
    )
    nb = coarse_buckets(ev.count(), rows_per_task=65536)

    def add_ub(b: pd.DataFrame) -> pd.DataFrame:
        b["ub"] = (b["user_id"].to_numpy() % nb).astype("int64")
        return b

    def twa_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        us = g["ts"].astype("datetime64[us]").astype("int64")
        nxt = us.groupby(g["user_id"].to_numpy()).shift(-1)
        held = nxt - us
        m = held.notna()
        v = np.floor(g["value"].to_numpy() * 100.0 + 0.5).astype("int64")
        dt_s = (held[m].to_numpy(dtype="int64")) // 1_000_000
        d = pd.DataFrame(
            {"user_id": g["user_id"].to_numpy()[m.to_numpy()],
             "wv": v[m.to_numpy()] * dt_s, "dt": dt_s}
        )
        a = d.groupby("user_id", as_index=False)[["wv", "dt"]].sum()
        a = a[a["dt"] > 0]
        return pd.DataFrame(
            {"user_id": a["user_id"].astype("int64"),
             "held_s": a["dt"].astype("int64"),
             "twa_e6": np.floor(
                 a["wv"].to_numpy(dtype="float64") * 10000 / a["dt"].to_numpy()
                 + 0.5
             ).astype("int64")}
        )

    return (
        ev.map_batches(add_ub, batch_format="pandas")
        .groupby("ub")
        .map_groups(twa_in_bucket, batch_format="pandas")
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )


def events_global_rank(sf_dir: str) -> pd.DataFrame:
    """GLOBAL DENSE RANK of every event's value — total-order
    assignment WITHOUT a total sort: phase 1 reduces the stream to its
    domain-bounded distinct-value set (the `_event_value_hist` shape,
    values only); the driver sorts the ≤|domain| values once; phase 2
    re-streams events and assigns ranks by a broadcast binary search.
    The classic two-phase rank pattern for data whose value domain ≪
    row count."""
    import ray

    from .dedup import coarse_buckets

    ev = rd.read_parquet(_t(sf_dir, "events"), columns=["event_id", "value"])
    nb = coarse_buckets(ev.count(), rows_per_task=65536)

    def vals_partial(batch: pa.Table) -> pa.Table:
        v = np.unique(
            np.floor(
                batch["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
            ).astype("int64")
        )
        return pa.table(
            {"v": pa.array(v, pa.int64()),
             "__b": pa.array(v % nb, pa.int64())}
        )

    def uniq(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"v": g["v"].unique().astype("int64")})

    vals = (
        ev.map_batches(vals_partial, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(uniq, batch_format="pandas")
        .to_pandas()["v"]
        .to_numpy()
    )
    sorted_ref = ray.put(np.sort(vals))

    def assign(batch: pa.Table) -> pa.Table:
        sv = ray.get(sorted_ref)
        v = np.floor(
            batch["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype("int64")
        return pa.table(
            {"event_id": batch["event_id"],
             "rnk": pa.array(np.searchsorted(sv, v) + 1, pa.int64())}
        )

    return (
        ev.map_batches(assign, batch_format="pyarrow")
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )


def docs_matching_all_terms(
    sf_dir: str, terms: tuple[str, ...] = ("data", "spark", "merge")
) -> pd.DataFrame:
    """CONJUNCTIVE (AND) term search — the boolean-retrieval primitive
    under ``bm25_search``'s ranked layer: docs whose token set contains
    EVERY query term.  Stateless vectorized filter (one compiled
    word-boundary regex per term, no shuffle, no index) — the
    full-scan baseline an inverted index (``token_postings``) would
    accelerate."""
    import re

    docs = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    pats = [re.compile(rf"(?:^| ){re.escape(t)}(?: |$)") for t in terms]

    def filt(batch: pa.Table) -> pa.Table:
        s = batch["text"].to_pandas()
        m = np.ones(len(s), dtype=bool)
        for p in pats:
            m &= s.str.contains(p).to_numpy()
        return pa.table({"doc_id": batch["doc_id"].filter(pa.array(m))})

    return (
        docs.map_batches(filt, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def events_hash_sample(sf_dir: str) -> pd.DataFrame:
    """DETERMINISTIC BERNOULLI SAMPLE (~10%) — hash-gated row filter
    using the repo's single split-hash convention
    (:func:`..functions.text.split_bucket`, md5 first byte mod 10), so
    the sample is reproducible, layout-independent, and — unlike the
    seeded reservoir ops — EXACTLY oracle-checkable in SQL.  Stateless
    map, no shuffle; at 100 TB this is the row-filter pushdown shape."""
    from ..functions.text import split_bucket

    ev = rd.read_parquet(
        _t(sf_dir, "events"), columns=["event_id", "user_id", "event_type"]
    )

    def filt(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy(zero_copy_only=False)
        keep = split_bucket(ids) == 0
        return batch.filter(pa.array(keep))

    return (
        ev.map_batches(filt, batch_format="pyarrow")
        .to_pandas()
        .sort_values("event_id")
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


def user_activity_gini(sf_dir: str) -> pd.DataFrame:
    """GINI COEFFICIENT of per-user event counts — the inequality /
    skew-diagnostic aggregate (is crawl or traffic volume concentrated
    on a few keys?).

    Exactness without a global sort: ties in the rank formula
    contribute ``n·Σi`` regardless of intra-tie order, so Σ i·nᵢ over
    the sorted counts collapses onto the COUNT-HISTOGRAM — for each
    distinct count value c with frequency f starting at rank base:
    c·(f·base + f(f+1)/2).  Per-user counts reduce in one user-bucket
    exchange; the histogram of counts is domain-bounded; the driver
    folds the closed form with exact integers and applies the oracle's
    identical float expression once."""
    from .dedup import coarse_buckets

    ev = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id"])
    nb = coarse_buckets(ev.count(), rows_per_task=65536)

    def partial(batch: pa.Table) -> pa.Table:
        g = (
            batch.to_pandas().groupby("user_id", as_index=False).size()
            .rename(columns={"size": "n"})
        )
        g["__b"] = (g["user_id"].to_numpy() % nb).astype("int64")
        return pa.Table.from_pandas(
            g, preserve_index=False,
            schema=pa.schema([("user_id", pa.int64()), ("n", pa.int64()),
                              ("__b", pa.int64())]),
        )

    def count_hist(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby("user_id", as_index=False)["n"].sum()
        h = c.groupby("n", as_index=False).size().rename(columns={"size": "f"})
        return h.astype("int64")

    hist = (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(count_hist, batch_format="pandas")
        .to_pandas()
        .groupby("n", as_index=False)["f"]
        .sum()  # ≤ |distinct count values| rows
        .sort_values("n")
    )
    base = 0
    S = 0  # Σ i·n over the (virtually) sorted counts — exact ints
    k = int(hist["f"].sum())
    s = int((hist["n"] * hist["f"]).sum())
    for c, f in zip(hist["n"], hist["f"]):
        c, f = int(c), int(f)
        S += c * (f * base + f * (f + 1) // 2)
        base += f
    gini = 2.0 * S / (k * s) - (k + 1.0) / k
    return pd.DataFrame(
        {"n_users": [np.int64(k)], "n_events": [np.int64(s)],
         "gini_e6": [np.int64(np.floor(gini * 1e6 + 0.5))]}
    )


def purchase_attribution(sf_dir: str, window_days: int = 7) -> pd.DataFrame:
    """AS-OF WITH TOLERANCE — attribution: a purchase is ATTRIBUTED when
    the same user clicked within the preceding ``window_days`` (half-open
    [ts − w, ts)), else organic; completing the as-of family (backward /
    forward / bounded-lookback).  Output: per purchase day, attributed
    vs organic counts.

    Scale shape: one user-bucket exchange; inside a bucket each user's
    sorted click-timestamp vector answers all of that user's lookback
    probes via two binary searches per purchase (the range-join
    kernel), then a |days|-bounded count combiner closes."""
    from .dedup import coarse_buckets

    ev = rd.read_parquet(
        _t(sf_dir, "events"), columns=["user_id", "ts", "event_type"]
    )
    nb = coarse_buckets(ev.count(), rows_per_task=65536)
    w_us = np.int64(window_days) * 86_400_000_000
    day_us = np.int64(86_400_000_000)

    def add_ub(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["event_type"].isin(("purchase", "click"))].copy()
        b["ub"] = (b["user_id"].to_numpy() % nb).astype("int64")
        return b

    def attribute(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"]).reset_index(drop=True)
        us = g["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        uid = g["user_id"].to_numpy()
        is_p = (g["event_type"] == "purchase").to_numpy()
        att = np.zeros(len(g), dtype=bool)
        for seg in np.split(
            np.arange(len(g)), np.flatnonzero(uid[1:] != uid[:-1]) + 1
        ):
            if not len(seg):
                continue
            cts = us[seg][~is_p[seg]]  # user's sorted click times
            pm = seg[is_p[seg]]
            if len(pm) and len(cts):
                lo = np.searchsorted(cts, us[pm] - w_us, side="left")
                hi = np.searchsorted(cts, us[pm], side="left")
                att[pm] = hi > lo
        day = (us[is_p] // day_us) * day_us
        out = (
            pd.DataFrame({"day_us": day, "a": att[is_p].astype("int64")})
            .groupby("day_us", as_index=False)
            .agg(n_attributed=("a", "sum"), n_organic=("a", lambda s: int((1 - s).sum())))
        )
        return out.astype("int64")

    out = (
        ev.map_batches(add_ub, batch_format="pandas")
        .groupby("ub")
        .map_groups(attribute, batch_format="pandas")
        .to_pandas()
        .groupby("day_us", as_index=False)[["n_attributed", "n_organic"]]
        .sum()  # |days|-bounded
    )
    out["day"] = pd.to_datetime(out["day_us"], unit="us")
    return (
        out[["day", "n_attributed", "n_organic"]]
        .astype({"n_attributed": "int64", "n_organic": "int64"})
        .sort_values("day")
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


def events_ks_test(sf_dir: str) -> pd.DataFrame:
    """TWO-SAMPLE KOLMOGOROV–SMIRNOV statistic between the click and
    purchase value distributions — the distribution-drift test beyond
    the chi-square independence op.  INTEGER-EXACT: D's numerator is
    max |ca·nb − cb·na| over the merged e2 value grid (cross-multiplied
    cumulative counts — no float CDFs), derived entirely from the
    domain-bounded per-type value histogram; only the final e6 ratio
    touches floats, with the oracle's identical expression."""
    h = _event_value_hist(sf_dir)
    h = h[h["event_type"].isin(("click", "purchase"))]
    g = (
        h.pivot_table(index="v_e2", columns="event_type", values="n",
                      aggfunc="sum", fill_value=0)
        .reindex(columns=["click", "purchase"], fill_value=0)
        .sort_index()
    )
    ca = g["click"].to_numpy(dtype="int64").cumsum()
    cb = g["purchase"].to_numpy(dtype="int64").cumsum()
    na, nb = int(ca[-1]), int(cb[-1])
    d_num = int(np.abs(ca * nb - cb * na).max())
    d_den = na * nb
    return pd.DataFrame(
        {"n_click": [np.int64(na)], "n_purchase": [np.int64(nb)],
         "d_num": [np.int64(d_num)],
         "ks_e6": [np.int64(np.floor(float(d_num) * 1e6 / d_den + 0.5))]}
    )


def doc_clean_md5(sf_dir: str) -> pd.DataFrame:
    """TEXT NORMALIZATION stage — the LLM-corpus cleaning transform
    (NFC unicode normalize → lowercase → collapse whitespace runs →
    strip), verified by per-doc md5 of the cleaned text so the oracle
    pins every byte.  Stateless vectorized map, zero shuffles."""
    import hashlib
    import re
    import unicodedata

    docs = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    ws = re.compile(r"\s+")

    def clean(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        out = [
            hashlib.md5(
                ws.sub(" ", unicodedata.normalize("NFC", t or "").lower())
                .strip()
                .encode()
            ).hexdigest()
            for t in texts
        ]
        return pa.table(
            {"doc_id": batch["doc_id"], "clean_md5": pa.array(out, pa.string())}
        )

    return (
        docs.map_batches(clean, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def split_contamination(sf_dir: str, n_gram: int = 8) -> pd.DataFrame:
    """CROSS-SPLIT CONTAMINATION MATRIX — the eval-hygiene sweep
    (Brown et al. 2020 §4 / GPT-3 appendix C): for every ordered split
    pair (train→val, train→test, val→test), how many docs of the LATER
    split share at least one word 8-gram with any doc of the earlier
    one.  Complements ``decontaminate_ngrams`` (which gates against an
    external held-out set) by auditing the engine's OWN split
    assignment.

    Scale shape: distinct (gram-hash, split-rank, doc) rows → ONE
    gram-bucket exchange where each gram's split membership completes
    (emit (rank_a, rank_b, doc_b) contamination witnesses, bounded by
    pairs × docs) → ONE doc-bucket distinct exchange → 3-row census.
    Both exchanges are combiner-fed; raw text never re-shuffles."""
    from ..functions.hashing import fingerprint64
    from ..functions.text import split_bucket
    from .dedup import coarse_buckets

    docs = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    nb = coarse_buckets(docs.count(), rows_per_task=256, lo=64)

    def gram_rows(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        rank = np.where(split_bucket(ids) <= 7, 0,
                        np.where(split_bucket(ids) == 8, 1, 2))
        out_g, out_r, out_d = [], [], []
        for i, txt in enumerate(batch["text"].to_pylist()):
            w = [t for t in (txt or "").split(" ") if t]
            if len(w) < n_gram:
                continue
            gs = {
                fingerprint64(" ".join(w[j:j + n_gram]))
                for j in range(len(w) - n_gram + 1)
            }
            out_g.extend(gs)
            out_r.extend([int(rank[i])] * len(gs))
            out_d.extend([int(ids[i])] * len(gs))
        gh = np.array(out_g, dtype=np.uint64).view(np.int64)
        return pa.table(
            {"g": pa.array(gh, pa.int64()),
             "r": pa.array(out_r, pa.int64()),
             "d": pa.array(out_d, pa.int64()),
             "gb": pa.array(gh % nb, pa.int64())}
        )

    def witnesses(g: pd.DataFrame) -> pd.DataFrame:
        # per gram: which split ranks are present; every doc of a higher
        # rank is contaminated by EACH lower rank present (all ordered
        # pairs — a gram spanning all three splits witnesses train→val,
        # train→test AND val→test, like the SQL a.rank < b.rank join)
        g = g.drop_duplicates(["g", "r", "d"])
        has0 = g.groupby("g")["r"].transform("min") == 0
        has1 = (g["r"] == 1).groupby(g["g"].to_numpy()).transform("max")
        parts = []
        for ra, rb, m in (
            (0, 1, (g["r"] == 1) & has0),
            (0, 2, (g["r"] == 2) & has0),
            (1, 2, (g["r"] == 2) & has1),
        ):
            if m.any():
                parts.append(pd.DataFrame(
                    {"ra": ra, "rb": rb, "d": g["d"][m].to_numpy()}
                ))
        if not parts:
            return pd.DataFrame(
                {"ra": pd.Series([], dtype="int64"),
                 "rb": pd.Series([], dtype="int64"),
                 "d": pd.Series([], dtype="int64"),
                 "db": pd.Series([], dtype="int64")}
            )
        out = pd.concat(parts, ignore_index=True).drop_duplicates()
        out["db"] = out["d"] % 64
        return out.astype("int64")

    def distinct_docs(g: pd.DataFrame) -> pd.DataFrame:
        co = g.drop_duplicates(["ra", "rb", "d"]).groupby(
            ["ra", "rb"], as_index=False
        ).agg(n_contaminated=("d", "size"))
        return co.astype("int64")

    out = (
        docs.map_batches(gram_rows, batch_format="pyarrow")
        .groupby("gb")
        .map_groups(witnesses, batch_format="pandas")
        .groupby("db")
        .map_groups(distinct_docs, batch_format="pandas")
        .to_pandas()
        .groupby(["ra", "rb"], as_index=False)["n_contaminated"]
        .sum()
    )
    names = {0: "train", 1: "val", 2: "test"}
    out["from_split"] = out["ra"].map(names)
    out["to_split"] = out["rb"].map(names)
    out["n_contaminated"] = out["n_contaminated"].astype("int64")
    return (
        out[["from_split", "to_split", "n_contaminated"]]
        .sort_values(["from_split", "to_split"])
        .reset_index(drop=True)
    )


def langid_confusion(sf_dir: str) -> pd.DataFrame:
    """LANGUAGE-ID CONFUSION MATRIX — classifier-quality diagnostics:
    counts per (labeled lang, predicted lang) over the n-gram heuristic
    detector.  Rows-only in the driver (the detector isn't
    SQL-expressible); pinned against an in-process recompute twin.
    Per-batch count combiner → |langs|²-bounded close."""
    from ..functions.text import detect_lang

    docs = rd.read_parquet(_t(sf_dir, "documents"), columns=["lang", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        pred = detect_lang(batch["text"].to_pylist())
        g = (
            pd.DataFrame({"lang": batch["lang"].to_pylist(), "pred": pred})
            .groupby(["lang", "pred"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        return pa.Table.from_pandas(
            g, preserve_index=False,
            schema=pa.schema([("lang", pa.string()), ("pred", pa.string()),
                              ("n", pa.int64())]),
        )

    return (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "pred"])
        .sum("n")
        .to_pandas()
        .rename(columns={"sum(n)": "n"})
        .astype({"n": "int64"})
        .sort_values(["lang", "pred"])
        .reset_index(drop=True)
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


def embedding_quantize_int8(sf_dir: str) -> pd.DataFrame:
    """VECTOR QUANTIZATION (symmetric per-vector int8): the 4×-smaller
    ANN storage path — q = round(x·127/max|x|) — with per-vector
    reconstruction-error accounting.  Rows-only in the driver (float
    rounding in SQL would be fragile); pinned against a numpy twin and
    a max-error bound ≤ scale/2 in tests.  Stateless vectorized
    map_batches, zero shuffles; output is the (vec_id, scale_e9,
    max_err_e6) manifest a quantized shard layout would carry."""
    emb = rd.read_parquet(_t(sf_dir, "embeddings"), columns=["vec_id", "embedding"])

    def quantize(batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        vecs = np.asarray(batch["embedding"].to_pylist(), dtype=np.float64)
        mx = np.abs(vecs).max(axis=1)
        mx = np.where(mx == 0, 1.0, mx)
        scale = mx / 127.0
        q = np.clip(np.round(vecs / scale[:, None]), -127, 127)
        err = np.abs(q * scale[:, None] - vecs).max(axis=1)
        return pa.table(
            {"vec_id": pa.array(ids, pa.int64()),
             "scale_e9": pa.array(
                 np.floor(scale * 1e9 + 0.5).astype("int64"), pa.int64()),
             "max_err_e6": pa.array(
                 np.floor(err * 1e6 + 0.5).astype("int64"), pa.int64())}
        )

    return (
        emb.map_batches(quantize, batch_format="pyarrow")
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )


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


def orders_benford(sf_dir: str) -> pd.DataFrame:
    """BENFORD FIRST-DIGIT CENSUS over ``o_totalprice`` — the classic
    anomaly screen for value distributions.  Pure streaming aggregate:
    each batch reduces to a length-9 bincount, partials sum on the
    driver; zero shuffles, zero data-sized driver state.  Digit
    extraction is floor(p / 10^floor(log10 p)) on IEEE doubles —
    bit-identical in numpy and DuckDB's libm."""
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        p = batch["o_totalprice"].to_numpy(zero_copy_only=False)
        p = p[p > 0]
        d = np.floor(p / np.power(10.0, np.floor(np.log10(p)))).astype("int64")
        counts = np.bincount(d, minlength=10)[1:10]
        return pa.table({"digit": pa.array(np.arange(1, 10), pa.int64()),
                         "n": pa.array(counts.astype("int64"), pa.int64())})

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("digit").sum("n").to_pandas()
        .rename(columns={"sum(n)": "n"})
    )
    total = int(agg["n"].sum())
    agg["pct_e6"] = np.floor(
        agg["n"].to_numpy(dtype="float64") * 1e6 / total + 0.5
    ).astype("int64")
    agg = agg[agg["n"] > 0]
    agg["n"] = agg["n"].astype("int64")
    return agg.sort_values("digit").reset_index(drop=True)


def events_autocorr(sf_dir: str) -> pd.DataFrame:
    """LAG-1 SERIAL AUTOCORRELATION of event values per event type,
    pairs formed inside each (user, type) stream ordered by (ts,
    event_id) — the drift/seasonality screen for behavioural data.
    Same exactness trick as :func:`events_value_time_corr`: values are
    half-up e2 integers, each user-bucket emits exact int64 moment rows
    (n, Σx, Σy, Σxy, Σx², Σy²), the driver merges them in
    arbitrary-precision Python ints, and the final float expression is
    IDENTICAL to the oracle's.  ONE user-bucket exchange; per-bucket
    lag is a grouped pandas ``shift`` across all users at once."""
    from .dedup import coarse_buckets

    ev = rd.read_parquet(
        _t(sf_dir, "events"), columns=["user_id", "event_type", "ts", "event_id", "value"]
    )
    nb = coarse_buckets(ev.count(), rows_per_task=131072)

    def tag(batch: pa.Table) -> pa.Table:
        b = batch["user_id"].to_numpy(zero_copy_only=False).astype("int64") % nb
        return batch.append_column("__b", pa.array(b, pa.int64()))

    def moments(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "event_type", "ts", "event_id"])
        x = np.floor(g["value"].to_numpy() * 100.0 + 0.5).astype("int64")
        g = g.assign(x=x)
        g["y"] = g.groupby(["user_id", "event_type"])["x"].shift()
        p = g.dropna(subset=["y"])
        xx = p["x"].to_numpy()
        yy = p["y"].to_numpy().astype("int64")
        df2 = pd.DataFrame(
            {"event_type": p["event_type"].to_numpy(), "n": 1, "sx": xx, "sy": yy,
             "sxy": xx * yy, "sxx": xx * xx, "syy": yy * yy}
        )
        out = df2.groupby("event_type", as_index=False).sum()
        return out.astype({c: "int64" for c in ("n", "sx", "sy", "sxy", "sxx", "syy")})

    parts = (
        ev.map_batches(tag, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(moments, batch_format="pandas")
        .to_pandas()
    )
    cols = ["n", "sx", "sy", "sxy", "sxx", "syy"]
    m = parts.groupby("event_type", as_index=False)[cols].agg(
        lambda s: sum(int(v) for v in s)
    )
    n = m["n"].to_numpy(dtype=np.float64)
    sx = m["sx"].astype(np.float64).to_numpy()
    sy = m["sy"].astype(np.float64).to_numpy()
    sxy = m["sxy"].astype(np.float64).to_numpy()
    sxx = m["sxx"].astype(np.float64).to_numpy()
    syy = m["syy"].astype(np.float64).to_numpy()
    corr = (n * sxy - sx * sy) / np.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    out = pd.DataFrame(
        {"event_type": m["event_type"],
         "n_pairs": m["n"].astype("int64"),
         "autocorr_e6": np.floor(corr * 1e6 + 0.5).astype("int64")}
    )
    return out.sort_values("event_type").reset_index(drop=True)


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


def balanced_resample(sf_dir: str) -> pd.DataFrame:
    """CLASS-BALANCING DOWNSAMPLE of the embedding table: each label is
    hash-thinned by an integer divisor k = floor(n_label / n_min) so
    every class lands within one hash-stride of the minority count —
    the deterministic (seedless, shardable) way to balance a training
    set.  Two streaming passes: per-label counts (tiny) → broadcast
    divisors → filtered per-label aggregate; the kept-row identity is
    value-checked via the order-free id sum."""
    emb = rd.read_parquet(_t(sf_dir, "embeddings"), columns=["vec_id", "label"])
    counts = emb.groupby("label").count().to_pandas()
    n_min = int(counts["count()"].min())
    kdiv = {
        int(r["label"]): max(1, int(r["count()"]) // n_min)
        for _, r in counts.iterrows()
    }  # |labels| entries — rides the task closure, no broadcast needed

    def keep_stats(batch: pa.Table, kd=kdiv) -> pa.Table:
        ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype("int64")
        labels = batch["label"].to_numpy(zero_copy_only=False).astype("int64")
        h = (ids * 2654435761) % 4294967296
        ks = np.fromiter((kd[int(l)] for l in labels), dtype=np.int64, count=len(labels))
        kept = (h % ks) == 0
        df = pd.DataFrame({"label": labels[kept], "one": 1, "vec_id": ids[kept]})
        g = df.groupby("label", as_index=False).agg(
            n_after=("one", "sum"), id_sum=("vec_id", "sum")
        )
        return pa.Table.from_pandas(
            g, preserve_index=False,
            schema=pa.schema([("label", pa.int64()), ("n_after", pa.int64()),
                              ("id_sum", pa.int64())]),
        )

    agg = (
        emb.map_batches(keep_stats, batch_format="pyarrow")
        .groupby("label").sum(["n_after", "id_sum"]).to_pandas()
        .rename(columns={"sum(n_after)": "n_after", "sum(id_sum)": "id_sum"})
    )
    before = counts.rename(columns={"count()": "n_before"})
    before["label"] = before["label"].astype("int64")
    out = before.merge(agg, on="label", how="left").fillna(0)
    out["k_div"] = out["label"].map(kdiv).astype("int64")
    out = out.astype({"n_before": "int64", "n_after": "int64", "id_sum": "int64"})
    return out[["label", "n_before", "k_div", "n_after", "id_sum"]].sort_values(
        "label"
    ).reset_index(drop=True)


def doc_char_chunks(sf_dir: str, window: int = 500, overlap: int = 100) -> pd.DataFrame:
    """RAG-STYLE OVERLAPPING CHUNKING: fixed character windows with
    overlap (stride = window − overlap), one row per chunk with its
    span and content md5 — the retrieval-index export next to
    :func:`pack_token_chunks`'s training-side packing.  Stateless
    flat-map, zero shuffles; chunk counts derive from text length so
    the layout is reproducible shard-by-shard."""
    import hashlib

    stride = window - overlap
    docs = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def chunks(batch: pa.Table) -> pa.Table:
        ids, idxs, starts, lens, md5s = [], [], [], [], []
        for did, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            t = text or ""
            n = len(t)
            n_chunks = max(1, -((-(n - overlap)) // stride))
            for i in range(n_chunks):
                s = i * stride
                ln = min(window, n - s)
                ids.append(did)
                idxs.append(i)
                starts.append(s)
                lens.append(ln)
                md5s.append(hashlib.md5(t[s:s + ln].encode()).hexdigest())
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()),
             "chunk_idx": pa.array(idxs, pa.int64()),
             "start_c": pa.array(starts, pa.int64()),
             "len_c": pa.array(lens, pa.int64()),
             "chunk_md5": pa.array(md5s, pa.string())}
        )

    return (
        docs.map_batches(chunks, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )


def welch_ttest(sf_dir: str) -> pd.DataFrame:
    """WELCH'S UNEQUAL-VARIANCE T-TEST of every event type's value
    distribution against the 'click' baseline — the A/B-testing
    primitive for continuous metrics (chi-square's categorical sibling
    :func:`segment_event_chi2`).  Exactness contract: per-batch integer
    moments (x = value e2) merge exactly; t and the Welch–Satterthwaite
    df derive from the SAME float expression as the oracle, so the e6/e3
    roundings agree."""
    ev = rd.read_parquet(_t(sf_dir, "events"), columns=["event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        x = np.floor(df["value"].to_numpy() * 100.0 + 0.5).astype("int64")
        g = pd.DataFrame({"event_type": df["event_type"], "n": 1, "sx": x,
                          "sxx": x * x}).groupby("event_type", as_index=False).sum()
        return pa.Table.from_pandas(
            g, preserve_index=False,
            schema=pa.schema([("event_type", pa.string()), ("n", pa.int64()),
                              ("sx", pa.int64()), ("sxx", pa.int64())]),
        )

    parts = ev.map_batches(partial, batch_format="pyarrow").to_pandas()
    m = parts.groupby("event_type", as_index=False)[["n", "sx", "sxx"]].agg(
        lambda s: sum(int(v) for v in s)
    )
    base = m[m["event_type"] == "click"].iloc[0]
    n2, sx2, sxx2 = float(base["n"]), float(base["sx"]), float(base["sxx"])
    v2 = (n2 * sxx2 - sx2 * sx2) / (n2 * (n2 - 1.0))
    b = v2 / n2
    rows = []
    for _, r in m[m["event_type"] != "click"].iterrows():
        n1, sx1, sxx1 = float(r["n"]), float(r["sx"]), float(r["sxx"])
        v1 = (n1 * sxx1 - sx1 * sx1) / (n1 * (n1 - 1.0))
        a = v1 / n1
        s = a + b
        t = (sx1 / n1 - sx2 / n2) / np.sqrt(s)
        df_w = s * s / (a * a / (n1 - 1.0) + b * b / (n2 - 1.0))
        rows.append((r["event_type"], int(r["n"]),
                     int(np.floor(t * 1e6 + 0.5)),
                     int(np.floor(df_w * 1e3 + 0.5))))
    out = pd.DataFrame(rows, columns=["event_type", "n", "t_e6", "df_e3"])
    return out.sort_values("event_type").reset_index(drop=True)


def woe_iv(sf_dir: str, threshold: float = 450000.0) -> pd.DataFrame:
    """WEIGHT-OF-EVIDENCE / INFORMATION-VALUE supervised binning: decile
    the customers by account balance (exact NTILE semantics — no sort:
    bounded high-bits histogram → broadcast offsets → per-bucket local
    rank), label each customer good/bad by whether ANY order exceeds
    ``threshold``, and score each decile's separation.  The IV terms are
    rounded to e9 integers PER DECILE before summing, so the total is
    exact regardless of float summation order on either side."""
    import ray

    from .dedup import coarse_buckets  # noqa: F401

    cust = rd.read_parquet(_t(sf_dir, "customer"), columns=["c_custkey", "c_acctbal"])
    n_total = cust.count()
    q, rem = divmod(n_total, 10)

    def keyed(batch: pa.Table) -> pa.Table:
        bal = np.floor(
            batch["c_acctbal"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype("int64")
        ck = batch["c_custkey"].to_numpy(zero_copy_only=False).astype("int64")
        return pa.table({"bal_e2": pa.array(bal, pa.int64()),
                         "ck": pa.array(ck, pa.int64()),
                         "__hb": pa.array(bal // 1024, pa.int64())})

    keyed_ds = cust.map_batches(keyed, batch_format="pyarrow")
    counts = keyed_ds.groupby("__hb").count().to_pandas().sort_values("__hb")
    counts["offset"] = counts["count()"].cumsum().shift(fill_value=0).astype("int64")
    offsets = dict(zip(counts["__hb"].astype("int64"), counts["offset"]))

    big = (
        rd.read_parquet(_t(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"])
        .filter(expr=f"o_totalprice > {threshold}")
        .groupby("o_custkey").count().to_pandas()
    )
    big_ref = ray.put(frozenset(int(k) for k in big["o_custkey"]))

    def decile_stats(g: pd.DataFrame, _ref=big_ref, _off=offsets) -> pd.DataFrame:
        good_set = ray.get(_ref)
        g = g.sort_values(["bal_e2", "ck"])
        r = _off[int(g["__hb"].iloc[0])] + np.arange(len(g), dtype=np.int64)
        # NTILE(10): first `rem` tiles take q+1 rows
        decile = np.where(
            r < rem * (q + 1), r // (q + 1), rem + (r - rem * (q + 1)) // q
        ) + 1
        good = g["ck"].isin(good_set).to_numpy()
        out = pd.DataFrame({"decile": decile.astype("int64"),
                            "n": 1, "n_good": good.astype("int64")})
        return out.groupby("decile", as_index=False).sum().astype("int64")

    d = (
        keyed_ds.groupby("__hb").map_groups(decile_stats, batch_format="pandas")
        .to_pandas()
        .groupby("decile", as_index=False)[["n", "n_good"]].sum()
    )
    d["n_bad"] = d["n"] - d["n_good"]
    G = float(d["n_good"].sum())
    B = float(d["n_bad"].sum())
    gs = d["n_good"].to_numpy(dtype="float64") / G
    bs = d["n_bad"].to_numpy(dtype="float64") / B
    woe = np.log(gs / bs)
    term_e9 = np.floor((gs - bs) * woe * 1e9 + 0.5).astype("int64")
    out = pd.DataFrame({
        "decile": d["decile"].astype("int64"),
        "n": d["n"].astype("int64"),
        "n_good": d["n_good"].astype("int64"),
        "n_bad": d["n_bad"].astype("int64"),
        "woe_e6": np.floor(woe * 1e6 + 0.5).astype("int64"),
        "iv_e9": np.int64(term_e9.sum()),
    })
    return out.sort_values("decile").reset_index(drop=True)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    z = x
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def doc_augment(sf_dir: str, n_variants: int = 2, drop_pct: int = 10) -> pd.DataFrame:
    """DETERMINISTIC DATA AUGMENTATION (token dropout): each document
    emits variant 0 (identity) plus ``n_variants`` copies with ~10 % of
    whitespace tokens dropped, selected by a seedless splitmix64 hash of
    (doc_id, variant, token index) — reproducible shard-by-shard with
    NO shared RNG state, the only augmentation scheme that stays
    deterministic under Ray's nondeterministic block order.  Stateless
    map_batches, zero shuffles."""
    import hashlib

    docs = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def augment(batch: pa.Table) -> pa.Table:
        ids, variants, ntoks, md5s = [], [], [], []
        for did, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            toks = (text or "").split()
            idx = np.arange(len(toks), dtype=np.uint64)
            for v in range(n_variants + 1):
                if v == 0:
                    kept = toks
                else:
                    with np.errstate(over="ignore"):
                        seed = np.uint64(did) * np.uint64(
                            0x9E3779B97F4A7C15
                        ) + np.uint64(v) * np.uint64(0xBF58476D1CE4E5B9)
                        h = _splitmix64(seed + idx)
                    keep = (h % np.uint64(100)) >= np.uint64(drop_pct)
                    kept = [t for t, k in zip(toks, keep) if k]
                ids.append(did)
                variants.append(v)
                ntoks.append(len(kept))
                md5s.append(hashlib.md5(" ".join(kept).encode()).hexdigest())
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()),
             "variant": pa.array(variants, pa.int64()),
             "n_tokens": pa.array(ntoks, pa.int64()),
             "aug_md5": pa.array(md5s, pa.string())}
        )

    return (
        docs.map_batches(augment, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["doc_id", "variant"])
        .reset_index(drop=True)
    )


def events_psi(sf_dir: str, split: str = "2024-01-16") -> pd.DataFrame:
    """POPULATION STABILITY INDEX per event type — the binned drift
    metric ML monitoring runs next to the KS test
    (:func:`events_ks_test`): values land in 10 log2 width bins,
    reference = events before ``split``, current = after; shares are
    Laplace-smoothed (+1/bin) so empty bins stay finite, and each bin's
    PSI term is rounded to an e9 integer BEFORE summing, making the
    total exact under any summation order.  ONE streaming combiner pass
    (per-batch (type, bin, period) counts), |types|x10x2 rows to the
    driver."""
    ev = rd.read_parquet(_t(sf_dir, "events"), columns=["event_type", "ts", "value"])
    split_ts = pd.Timestamp(split)

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        v = df["value"].to_numpy(dtype="float64")
        b = np.minimum(9, np.floor(np.log2(1.0 + v))).astype("int64")
        cur = (df["ts"] >= split_ts).to_numpy()
        g = pd.DataFrame({"event_type": df["event_type"], "bin": b,
                          "cur": cur.astype("int64"), "n": 1}).groupby(
            ["event_type", "bin", "cur"], as_index=False
        ).sum()
        return pa.Table.from_pandas(
            g, preserve_index=False,
            schema=pa.schema([("event_type", pa.string()), ("bin", pa.int64()),
                              ("cur", pa.int64()), ("n", pa.int64())]),
        )

    parts = (
        ev.map_batches(partial, batch_format="pyarrow").to_pandas()
        .groupby(["event_type", "bin", "cur"], as_index=False)["n"].sum()
    )
    # full (type x bin) grid: smoothing counts absent bins too
    types = sorted(parts["event_type"].unique())
    grid = pd.MultiIndex.from_product(
        [types, range(10)], names=["event_type", "bin"]
    ).to_frame(index=False)
    ref = parts[parts["cur"] == 0].rename(columns={"n": "n_ref"})
    cur = parts[parts["cur"] == 1].rename(columns={"n": "n_cur"})
    m = grid.merge(ref[["event_type", "bin", "n_ref"]], how="left").merge(
        cur[["event_type", "bin", "n_cur"]], how="left"
    ).fillna(0).astype({"n_ref": "int64", "n_cur": "int64"})
    tot = m.groupby("event_type")[["n_ref", "n_cur"]].transform("sum")
    p = (m["n_ref"] + 1.0) / (tot["n_ref"] + 10.0)
    qq = (m["n_cur"] + 1.0) / (tot["n_cur"] + 10.0)
    m["term_e9"] = np.floor((qq - p) * np.log(qq / p) * 1e9 + 0.5).astype("int64")
    m["psi_e9"] = m.groupby("event_type")["term_e9"].transform("sum").astype("int64")
    return m.sort_values(["event_type", "bin"]).reset_index(drop=True)


def embedding_fisher(sf_dir: str) -> pd.DataFrame:
    """CLASS-SEPARABILITY DIAGNOSTICS of the embedding space: per label,
    the mean within-class per-dimension variance and the squared
    distance of the class centroid from the global centroid (the
    between-class scatter contribution) — the Fisher-criterion view of
    whether labels are learnable from the vectors.  Exactness: vectors
    are e4 integers, per-(label, dim) moments merge exactly, and the
    between-term is e9-rounded PER DIMENSION before summing.  ONE
    combiner pass; (labels x dims) moment rows to the driver."""
    emb = rd.read_parquet(_t(sf_dir, "embeddings"), columns=["embedding", "label"])
    D = 64

    def moments(batch: pa.Table) -> pa.Table:
        x = np.asarray(batch["embedding"].to_pylist(), dtype=np.float64)
        x4 = np.floor(x * 1e4 + 0.5).astype("int64")
        labels = batch["label"].to_numpy(zero_copy_only=False).astype("int64")
        rows = []
        for lab in np.unique(labels):
            sub = x4[labels == lab]
            rows.append((int(lab), len(sub), sub.sum(axis=0), (sub * sub).sum(axis=0)))
        out = {"label": pa.array([r[0] for r in rows for _ in range(D)], pa.int64()),
               "dim": pa.array([d for _ in rows for d in range(D)], pa.int64()),
               "n": pa.array([r[1] for r in rows for _ in range(D)], pa.int64()),
               "sx": pa.array(np.concatenate([r[2] for r in rows]), pa.int64()),
               "sxx": pa.array(np.concatenate([r[3] for r in rows]), pa.int64())}
        return pa.table(out)

    parts = (
        emb.map_batches(moments, batch_format="pyarrow").to_pandas()
        .groupby(["label", "dim"], as_index=False).sum()
    )
    # exact global per-dim sums
    g = parts.groupby("dim", as_index=False)[["n", "sx"]].sum().rename(
        columns={"n": "N", "sx": "gx"}
    )
    m = parts.merge(g, on="dim")
    n = m["n"].to_numpy(dtype="float64")
    sx = m["sx"].to_numpy(dtype="float64")
    N = m["N"].to_numpy(dtype="float64")
    gx = m["gx"].to_numpy(dtype="float64")
    md = (sx * N - gx * n) / (n * N)  # centroid offset, e4 units
    m["bterm_e9"] = np.floor(md * md * 10.0 + 0.5).astype("int64")
    # exact integer reductions per label (python ints — no overflow)
    out_rows = []
    for lab, grp in m.groupby("label"):
        nl = int(grp["n"].iloc[0])
        wnum_l = sum(int(a) * int(b) - int(c) * int(c)
                     for a, b, c in zip(grp["n"], grp["sxx"], grp["sx"]))
        within = float(wnum_l) / (nl * nl * D)  # e8 units
        between_e9 = int(grp["bterm_e9"].sum())
        out_rows.append(
            (int(lab), nl,
             int(np.floor(within / 100.0 + 0.5)),     # e8 → e6
             int(np.floor(between_e9 / (D * 1000.0) + 0.5)))  # mean over dims, e6
        )
    out = pd.DataFrame(out_rows, columns=["label", "n", "within_e6", "between_e6"])
    return out.sort_values("label").reset_index(drop=True)


def events_cume_dist(sf_dir: str) -> pd.DataFrame:
    """CUME_DIST window function per event type WITHOUT a total sort —
    the two-phase domain-bounded pattern of :func:`events_global_rank`:
    phase 1 reduces the stream to per-(type, value) counts, the driver
    cumsums the ≤|domain| rows, phase 2 re-streams events and assigns
    count_le/n by broadcast binary search.  cd_e9 = half-up e9 of the
    single float division, identical to the oracle's."""
    import ray

    from .dedup import coarse_buckets

    ev = rd.read_parquet(_t(sf_dir, "events"), columns=["event_id", "event_type", "value"])
    nb = coarse_buckets(ev.count(), rows_per_task=65536)

    def counts_partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"event_type": batch["event_type"].to_pylist(),
             "v": np.floor(
                 batch["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
             ).astype("int64")}
        )
        g = df.groupby(["event_type", "v"], as_index=False).size().rename(
            columns={"size": "n"}
        )
        g["__b"] = g["v"].to_numpy() % nb
        return pa.Table.from_pandas(
            g, preserve_index=False,
            schema=pa.schema([("event_type", pa.string()), ("v", pa.int64()),
                              ("n", pa.int64()), ("__b", pa.int64())]),
        )

    def merge_counts(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["event_type", "v"], as_index=False)["n"].sum()

    counts = (
        ev.map_batches(counts_partial, batch_format="pyarrow")
        .groupby("__b").map_groups(merge_counts, batch_format="pandas")
        .to_pandas()
        .sort_values(["event_type", "v"])
    )
    counts["le"] = counts.groupby("event_type")["n"].cumsum().astype("int64")
    totals = counts.groupby("event_type")["n"].sum().to_dict()
    # broadcast per-type (sorted values, cumulative counts) tables
    lut = {
        et: (g["v"].to_numpy(), g["le"].to_numpy(), int(totals[et]))
        for et, g in counts.groupby("event_type")
    }
    lut_ref = ray.put(lut)

    def assign(batch: pa.Table) -> pa.Table:
        tab = ray.get(lut_ref)
        ids = batch["event_id"].to_numpy(zero_copy_only=False).astype("int64")
        v = np.floor(
            batch["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype("int64")
        ets = batch["event_type"].to_numpy(zero_copy_only=False)
        cd = np.empty(len(ids), dtype="int64")
        for et in np.unique(ets):
            vs, le, n = tab[et]
            m = ets == et
            idx = np.searchsorted(vs, v[m], side="left")
            cd[m] = np.floor(le[idx] / float(n) * 1e9 + 0.5).astype("int64")
        return pa.table({"event_id": pa.array(ids, pa.int64()),
                         "cd_e9": pa.array(cd, pa.int64())})

    return (
        ev.map_batches(assign, batch_format="pyarrow")
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )


def purchase_no_recent_click(sf_dir: str) -> pd.DataFrame:
    """RANGE ANTI-JOIN: purchases with NO click by the same user in the
    preceding hour — the negative form of the event-window joins
    (:func:`events_trailing_3d` counts, this one vetoes).  ONE
    user-bucket exchange; inside each bucket the composite-key
    (uid·R + ts) searchsorted window counts clicks for ALL users'
    purchases at once, and count == 0 selects — no per-user loop."""
    from .dedup import coarse_buckets

    ev = rd.read_parquet(
        _t(sf_dir, "events"), columns=["event_id", "user_id", "event_type", "ts"]
    )
    nb = coarse_buckets(ev.count(), rows_per_task=131072)
    W = 3_600_000_000  # 1 hour in µs

    def tag(batch: pa.Table) -> pa.Table:
        b = batch["user_id"].to_numpy(zero_copy_only=False).astype("int64") % nb
        return batch.append_column("__b", pa.array(b, pa.int64()))

    def anti(g: pd.DataFrame) -> pd.DataFrame:
        g = g[g["event_type"].isin(["click", "purchase"])]
        if not len(g):
            return pd.DataFrame({"event_id": pd.array([], dtype="int64")})
        ts = g["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        uid = g["user_id"].to_numpy().astype("int64")
        lo, hi = ts.min(), ts.max()
        R = (hi - lo) + W + 2  # composite stride: no cross-user bleed
        key = uid * R + (ts - lo)
        clicks = np.sort(key[(g["event_type"] == "click").to_numpy()])
        pm = (g["event_type"] == "purchase").to_numpy()
        pk = key[pm]
        left = np.searchsorted(clicks, pk - W, side="left")
        right = np.searchsorted(clicks, pk, side="left")
        keep = (right - left) == 0
        return pd.DataFrame(
            {"event_id": g.loc[pm, "event_id"].to_numpy()[keep].astype("int64")}
        )

    return (
        ev.map_batches(tag, batch_format="pyarrow")
        .groupby("__b").map_groups(anti, batch_format="pandas")
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )


def token_zipf_fit(sf_dir: str, k: int = 100) -> pd.DataFrame:
    """ZIPF'S-LAW FIT over the corpus vocabulary: OLS slope of
    ln(frequency) on ln(rank) for the top-k tokens — the canonical
    sanity check that a text corpus is natural language (slope ≈ −1)
    rather than boilerplate or noise.  Token counts reduce through ONE
    token-bucket exchange with per-bucket top-k partials (≤ k rows per
    bucket reach the driver); every OLS sum is built from e9-integer
    per-term roundings, so the fit is exact under any summation
    order."""
    from .dedup import coarse_buckets

    docs = rd.read_parquet(_t(sf_dir, "documents"), columns=["text"])
    nb = coarse_buckets(docs.count(), rows_per_task=8192)

    def tok_partial(batch: pa.Table) -> pa.Table:
        from collections import Counter

        from ..functions.hashing import fingerprint64

        c: Counter = Counter()
        for t in batch["text"].to_pylist():
            c.update(w for w in (t or "").split(" ") if w)
        toks = np.array(list(c.keys()), dtype=object)
        ns = np.fromiter(c.values(), dtype=np.int64, count=len(c))
        # deterministic token hash — Python's hash() is per-process salted
        # and would split a token's counts across buckets between workers
        b = np.fromiter(
            (fingerprint64(t) & 0x7FFFFFFF for t in toks),
            dtype=np.int64, count=len(toks),
        ) % nb
        return pa.table({"token": pa.array(toks, pa.string()),
                         "n": pa.array(ns, pa.int64()),
                         "__b": pa.array(b, pa.int64())})

    def topk_partial(g: pd.DataFrame) -> pd.DataFrame:
        co = g.groupby("token", as_index=False)["n"].sum()
        co = co.sort_values(["n", "token"], ascending=[False, True]).head(k)
        return co.astype({"n": "int64"})

    cand = (
        docs.map_batches(tok_partial, batch_format="pyarrow")
        .groupby("__b").map_groups(topk_partial, batch_format="pandas")
        .to_pandas()
        .sort_values(["n", "token"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
    cand["rank"] = np.arange(1, len(cand) + 1, dtype="int64")
    x = np.log(cand["rank"].to_numpy(dtype="float64"))
    y = np.log(cand["n"].to_numpy(dtype="float64"))
    sx = int(np.floor(x * 1e9 + 0.5).astype("int64").sum())
    sy = int(np.floor(y * 1e9 + 0.5).astype("int64").sum())
    sxy = int(np.floor(x * y * 1e9 + 0.5).astype("int64").sum())
    sxx = int(np.floor(x * x * 1e9 + 0.5).astype("int64").sum())
    K = float(len(cand))
    fx, fy, fxy, fxx = (s / 1e9 for s in (sx, sy, sxy, sxx))
    slope = (K * fxy - fx * fy) / (K * fxx - fx * fx)
    out = cand[["rank", "token", "n"]].copy()
    out["slope_e6"] = np.int64(int(np.floor(slope * 1e6 + 0.5)))
    return out


def orders_gaps_islands(sf_dir: str) -> pd.DataFrame:
    """GAPS-AND-ISLANDS: per customer, maximal runs of orders where
    consecutive order dates are ≤ 30 days apart.  The classic
    LAG + windowed-SUM SQL idiom runs here as ONE customer-bucket
    exchange; inside each bucket a single lexsorted pass computes
    break flags and island ids for ALL customers at once (grouped
    diff/cumsum — no per-customer loop)."""
    from .dedup import coarse_buckets

    orders = rd.read_parquet(
        _t(sf_dir, "orders"), columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )
    nb = coarse_buckets(orders.count(), rows_per_task=131072)

    def tag(batch: pa.Table) -> pa.Table:
        b = batch["o_custkey"].to_numpy(zero_copy_only=False).astype("int64") % nb
        return batch.append_column("__b", pa.array(b, pa.int64()))

    def islands(g: pd.DataFrame) -> pd.DataFrame:
        out_schema = {"custkey": "int64", "n_islands": "int64", "max_island": "int64"}
        if not len(g):
            return pd.DataFrame({k: pd.array([], dtype=v) for k, v in out_schema.items()})
        days = (g["o_orderdate"].astype("datetime64[s]").astype("int64") // 86400).to_numpy()
        ck = g["o_custkey"].to_numpy().astype("int64")
        ok = g["o_orderkey"].to_numpy().astype("int64")
        order = np.lexsort((ok, days, ck))
        ck, days = ck[order], days[order]
        new_cust = np.r_[True, ck[1:] != ck[:-1]]
        gap = np.r_[0, np.diff(days)]
        brk = new_cust | (gap > 30)
        isl = np.cumsum(brk)  # globally unique island ids across customers
        sz = pd.DataFrame({"ck": ck, "isl": isl}).groupby(
            ["ck", "isl"], as_index=False, sort=False
        ).size()
        out = sz.groupby("ck", as_index=False).agg(
            n_islands=("isl", "size"), max_island=("size", "max")
        ).rename(columns={"ck": "custkey"})
        return out.astype(out_schema)

    return (
        orders.map_batches(tag, batch_format="pyarrow")
        .groupby("__b").map_groups(islands, batch_format="pandas")
        .to_pandas().sort_values("custkey").reset_index(drop=True)
    )


def _ntile4(rank_1based: np.ndarray, n: int) -> np.ndarray:
    """SQL NTILE(4) bucket for a 1-based global rank: the first n%4
    buckets get ceil(n/4) rows, the rest floor(n/4) (DuckDB rule)."""
    q, m = divmod(int(n), 4)
    big = (q + 1) * m
    r = rank_1based.astype("int64")
    return np.where(
        r <= big, (r - 1) // (q + 1), m + (r - big - 1) // max(q, 1)
    ).astype("int64") + 1


def customer_rfm(sf_dir: str) -> pd.DataFrame:
    """RFM SEGMENTATION: per customer Recency (days since last order,
    vs the corpus max date), Frequency (order count) and Monetary
    (exact cents), each quartile-binned with NTILE(4) and a custkey
    tiebreak (monetary tiles bin on $1000 grain so the tile domain is
    bounded).  Scale shape — NO global sort: (1) one custkey-bucket
    exchange reduces orders to per-customer aggregates; (2) per-batch
    metric histograms (domain-bounded: days / order-count / $1000
    grains) give each distinct metric value its strictly-lower count;
    (3) one (metric, value)-bucket exchange tie-ranks customers inside
    each value by custkey; (4) one custkey-bucket pivot reassembles the
    three tiles per customer."""
    import ray

    from .dedup import coarse_buckets

    orders = rd.read_parquet(
        _t(sf_dir, "orders"), columns=["o_custkey", "o_orderdate", "o_totalprice"]
    )
    nb = coarse_buckets(orders.count(), rows_per_task=65536)

    agg_schema = pa.schema([
        ("custkey", pa.int64()), ("last_day", pa.int64()),
        ("freq", pa.int64()), ("monetary_e2", pa.int64()),
    ])

    def agg_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["last_day"] = df["o_orderdate"].astype("datetime64[s]").astype("int64") // 86400
        df["m_e2"] = np.floor(df["o_totalprice"].to_numpy() * 100 + 0.5).astype("int64")
        g = df.groupby("o_custkey", as_index=False).agg(
            last_day=("last_day", "max"), freq=("m_e2", "size"), monetary_e2=("m_e2", "sum")
        ).rename(columns={"o_custkey": "custkey"})
        g["__b"] = g["custkey"].to_numpy() % nb
        return pa.Table.from_pandas(
            g, preserve_index=False, schema=agg_schema.append(pa.field("__b", pa.int64()))
        )

    def agg_merge(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("custkey", as_index=False).agg(
            last_day=("last_day", "max"), freq=("freq", "sum"), monetary_e2=("monetary_e2", "sum")
        )

    agg = (
        orders.map_batches(agg_partial, batch_format="pyarrow")
        .groupby("__b").map_groups(agg_merge, batch_format="pandas")
        .materialize()
    )
    gmax_day = int(agg.max("last_day"))

    # metric encoding: 0=recency ASC, 1=freq DESC, 2=monetary-grain DESC —
    # all normalized to ASC int values so one rank rule serves all three
    def metric_values(df: pd.DataFrame) -> dict[int, np.ndarray]:
        return {
            0: (gmax_day - df["last_day"].to_numpy()).astype("int64"),
            1: (-df["freq"].to_numpy()).astype("int64"),
            2: (-(df["monetary_e2"].to_numpy() // 100000)).astype("int64"),
        }

    def hist_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        vals = metric_values(df)
        parts = [
            pd.DataFrame({"metric": m, "v": v}).groupby(
                ["metric", "v"], as_index=False
            ).size() for m, v in vals.items()
        ]
        return pa.Table.from_pandas(
            pd.concat(parts, ignore_index=True), preserve_index=False,
            schema=pa.schema([("metric", pa.int64()), ("v", pa.int64()), ("size", pa.int64())]),
        )

    hist = (
        agg.map_batches(hist_partial, batch_format="pyarrow")
        .to_pandas()
        .groupby(["metric", "v"], as_index=False)["size"].sum()
        .sort_values(["metric", "v"])
    )
    n_total = int(hist.loc[hist["metric"] == 0, "size"].sum())
    hist["n_before"] = hist.groupby("metric")["size"].cumsum() - hist["size"]
    nb_ref = ray.put(hist.set_index(["metric", "v"])["n_before"].to_dict())

    def tie_rows(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        vals = metric_values(df)
        parts = []
        for m, v in vals.items():
            p = df[["custkey", "last_day", "freq", "monetary_e2"]].copy()
            p["metric"], p["v"] = m, v
            parts.append(p)
        out = pd.concat(parts, ignore_index=True)
        out["__b"] = (out["metric"].to_numpy() * 1000003 + out["v"].to_numpy()) % nb
        return pa.Table.from_pandas(
            out, preserve_index=False,
            schema=pa.schema([
                ("custkey", pa.int64()), ("last_day", pa.int64()), ("freq", pa.int64()),
                ("monetary_e2", pa.int64()), ("metric", pa.int64()), ("v", pa.int64()),
                ("__b", pa.int64()),
            ]),
        )

    def tie_rank(g: pd.DataFrame) -> pd.DataFrame:
        cols = ["custkey", "last_day", "freq", "monetary_e2", "metric", "tile"]
        if not len(g):
            return pd.DataFrame({c: pd.array([], dtype="int64") for c in cols})
        import ray as _ray
        n_before = _ray.get(nb_ref)
        g = g.sort_values(["metric", "v", "custkey"])
        tr = g.groupby(["metric", "v"]).cumcount().to_numpy()
        base = g.set_index(["metric", "v"]).index.map(n_before).to_numpy().astype("int64")
        g = g.reset_index(drop=True)
        g["tile"] = _ntile4(base + tr + 1, n_total)
        return g[cols].astype("int64")

    def pivot(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"custkey": "int64", "recency_days": "int64", "freq": "int64",
                "monetary_e2": "int64", "r_tile": "int64", "f_tile": "int64",
                "m_tile": "int64"}
        if not len(g):
            return pd.DataFrame({k: pd.array([], dtype=v) for k, v in cols.items()})
        w = g.pivot_table(index="custkey", columns="metric", values="tile",
                          aggfunc="first").rename(columns={0: "r_tile", 1: "f_tile", 2: "m_tile"})
        meta = g.groupby("custkey").agg(
            last_day=("last_day", "first"), freq=("freq", "first"),
            monetary_e2=("monetary_e2", "first")
        )
        out = meta.join(w).reset_index()
        out["recency_days"] = gmax_day - out["last_day"]
        return out[list(cols)].astype(cols)

    def tag_custkey(batch: pa.Table) -> pa.Table:
        b = batch["custkey"].to_numpy(zero_copy_only=False) % nb
        return batch.append_column("__b2", pa.array(b, pa.int64()))

    return (
        agg.map_batches(tie_rows, batch_format="pyarrow")
        .groupby("__b").map_groups(tie_rank, batch_format="pandas")
        .map_batches(tag_custkey, batch_format="pyarrow")
        .groupby("__b2").map_groups(pivot, batch_format="pandas")
        .to_pandas().sort_values("custkey").reset_index(drop=True)
    )


def source_vocab_jaccard(sf_dir: str) -> pd.DataFrame:
    """CROSS-SOURCE VOCABULARY OVERLAP (mirror / shared-boilerplate
    detection): Jaccard similarity of the distinct-token vocabularies
    of every source pair.  ONE token-bucket exchange holds each token's
    full source set in one task (per-batch (token, source) dedup first,
    so duplicate tokens never ride the shuffle twice per source); pair
    emission inside a bucket is the vectorized per-cell kernel shared
    with the LSH dedup paths.  Only O(|sources|² + |sources|) counter
    rows per bucket reach the driver."""
    from .dedup import _pairs_in_cells, coarse_buckets

    docs = rd.read_parquet(_t(sf_dir, "documents"), columns=["text", "source"])
    nb = coarse_buckets(docs.count(), rows_per_task=8192)

    def tok_partial(batch: pa.Table) -> pa.Table:
        from ..functions.hashing import fingerprint64

        texts = batch["text"].to_pylist()
        srcs = batch["source"].to_pylist()
        toks, owners = [], []
        for t, s in zip(texts, srcs):
            ws = [w for w in (t or "").split(" ") if w]
            toks.extend(ws)
            owners.extend([s] * len(ws))
        df = pd.DataFrame({"token": toks, "source": owners}).drop_duplicates()
        uniq = df["token"].unique()
        h = {t: (fingerprint64(t) & 0x7FFFFFFF) % nb for t in uniq}
        df["__b"] = df["token"].map(h).astype("int64")
        return pa.Table.from_pandas(
            df, preserve_index=False,
            schema=pa.schema([("token", pa.string()), ("source", pa.string()),
                              ("__b", pa.int64())]),
        )

    def bucket_counts(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"source_a": "object", "source_b": "object", "n": "int64"}
        if not len(g):
            return pd.DataFrame({"source_a": pd.array([], dtype="string"),
                                 "source_b": pd.array([], dtype="string"),
                                 "n": pd.array([], dtype="int64")})
        g = g.drop_duplicates(["token", "source"])
        # vocab-size rows: source_b = "" sentinel
        voc = g.groupby("source", as_index=False)["token"].nunique().rename(
            columns={"source": "source_a", "token": "n"})
        voc["source_b"] = ""
        # pair rows: per token, all source pairs (codes are lexicographic)
        su = np.sort(g["source"].unique())
        g = g.assign(scode=np.searchsorted(su, g["source"].to_numpy()).astype("int64"))
        pairs = _pairs_in_cells(g, ["token"], "scode")
        pc = pairs.groupby(["a", "b"], as_index=False).size()
        pc["source_a"] = su[pc["a"].to_numpy()]
        pc["source_b"] = su[pc["b"].to_numpy()]
        pc = pc.rename(columns={"size": "n"})
        return pd.concat(
            [voc[["source_a", "source_b", "n"]], pc[["source_a", "source_b", "n"]]],
            ignore_index=True,
        ).astype(cols)

    rows = (
        docs.map_batches(tok_partial, batch_format="pyarrow")
        .groupby("__b").map_groups(bucket_counts, batch_format="pandas")
        .to_pandas()
    )
    voc = rows[rows["source_b"] == ""].groupby("source_a")["n"].sum()
    inter = (
        rows[rows["source_b"] != ""]
        .groupby(["source_a", "source_b"], as_index=False)["n"].sum()
        .rename(columns={"n": "shared_terms"})
    )
    na = voc.reindex(inter["source_a"]).to_numpy().astype("int64")
    nbv = voc.reindex(inter["source_b"]).to_numpy().astype("int64")
    sh = inter["shared_terms"].to_numpy().astype("int64")
    inter["jaccard_e6"] = np.floor(sh * 1e6 / (na + nbv - sh) + 0.5).astype("int64")
    inter["shared_terms"] = inter["shared_terms"].astype("int64")
    return inter.sort_values(["source_a", "source_b"]).reset_index(drop=True)


def sequential_pattern_support(sf_dir: str) -> pd.DataFrame:
    """SEQUENTIAL-PATTERN SUPPORT (PrefixSpan's length-2 core): for
    every ordered pair of event types (a, b), the number of users whose
    FIRST occurrence of a precedes their first occurrence of b.  ONE
    user-bucket exchange over per-batch (user, type, min ts) partials;
    inside a bucket the pair emission is the shared vectorized per-cell
    kernel over users sorted by first-occurrence time, so ties are
    adjacent and the strict < filter is one array compare.  Only
    O(|types|²) counter rows per bucket reach the driver."""
    from .dedup import _cell_pair_indices, coarse_buckets

    ev = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "event_type", "ts"])
    nb = coarse_buckets(ev.count(), rows_per_task=131072)

    def first_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["t0"] = df["ts"].astype("datetime64[us]").astype("int64")
        g = df.groupby(["user_id", "event_type"], as_index=False)["t0"].min()
        g["__b"] = g["user_id"].to_numpy() % nb
        return pa.Table.from_pandas(
            g, preserve_index=False,
            schema=pa.schema([("user_id", pa.int64()), ("event_type", pa.string()),
                              ("t0", pa.int64()), ("__b", pa.int64())]),
        )

    def pair_counts(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({"etype_a": pd.array([], dtype="string"),
                                 "etype_b": pd.array([], dtype="string"),
                                 "support": pd.array([], dtype="int64")})
        g = g.groupby(["user_id", "event_type"], as_index=False)["t0"].min()
        g = g.sort_values(["user_id", "t0", "event_type"]).reset_index(drop=True)
        uid, codes = pd.factorize(g["user_id"], sort=False)[0], None
        a_idx, b_idx = _cell_pair_indices(uid)
        t0 = g["t0"].to_numpy()
        keep = t0[a_idx] < t0[b_idx]  # ties (equal first-occurrence) excluded
        et = g["event_type"].to_numpy()
        pairs = pd.DataFrame({"etype_a": et[a_idx[keep]], "etype_b": et[b_idx[keep]]})
        out = pairs.groupby(["etype_a", "etype_b"], as_index=False).size().rename(
            columns={"size": "support"})
        return out.astype({"support": "int64"})

    rows = (
        ev.map_batches(first_partial, batch_format="pyarrow")
        .groupby("__b").map_groups(pair_counts, batch_format="pandas")
        .to_pandas()
    )
    return (
        rows.groupby(["etype_a", "etype_b"], as_index=False)["support"].sum()
        .astype({"support": "int64"})
        .sort_values(["etype_a", "etype_b"]).reset_index(drop=True)
    )


def events_dow_seasonality(sf_dir: str) -> pd.DataFrame:
    """DAY-OF-WEEK SEASONALITY INDEX per event type: mean value on each
    weekday relative to the type's overall mean (1e6-scaled).  Pure
    combiner shape — per-batch (type, dow) sum/count partials are
    domain-bounded (|types|·7 rows per block), so the reduction is a
    driver-side combine with NO exchange; the ratio is one float
    expression replicated verbatim in the oracle."""
    ev = rd.read_parquet(_t(sf_dir, "events"), columns=["event_type", "ts", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        # DuckDB dayofweek(): 0=Sunday..6=Saturday; pandas: 0=Monday
        df["dow"] = (df["ts"].dt.dayofweek.astype("int64") + 1) % 7
        df["v_e2"] = np.floor(df["value"].to_numpy() * 100 + 0.5).astype("int64")
        g = df.groupby(["event_type", "dow"], as_index=False).agg(
            s=("v_e2", "sum"), n=("v_e2", "size"))
        return pa.Table.from_pandas(
            g, preserve_index=False,
            schema=pa.schema([("event_type", pa.string()), ("dow", pa.int64()),
                              ("s", pa.int64()), ("n", pa.int64())]),
        )

    d = (
        ev.map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby(["event_type", "dow"], as_index=False)[["s", "n"]].sum()
    )
    t = d.groupby("event_type", as_index=False)[["s", "n"]].sum().rename(
        columns={"s": "st", "n": "nt"})
    out = d.merge(t, on="event_type")
    out["index_e6"] = np.floor(
        (out["s"].to_numpy().astype("float64") * out["nt"].to_numpy())
        / (out["n"].to_numpy().astype("float64") * out["st"].to_numpy())
        * 1e6 + 0.5
    ).astype("int64")
    out = out[["event_type", "dow", "n", "index_e6"]].astype(
        {"dow": "int64", "n": "int64"})
    return out.sort_values(["event_type", "dow"]).reset_index(drop=True)


def events_anomaly_ids(sf_dir: str) -> pd.DataFrame:
    """ROBUST OUTLIER IDs: every event whose value fails the 3-MAD
    Hampel cut for its type.  The median and MAD derive from the SAME
    domain-bounded value histogram the quantile family walks
    (:func:`_event_value_hist`) — integer-exact (med2 = 2·median,
    mad4 = 4·MAD, cut 2·|2v − med2| > 3·mad4), so no float crosses the
    oracle; the flag pass is one streaming broadcast-cut scan."""
    import ray

    cuts = {}
    for et, g in _event_value_hist(sf_dir).groupby("event_type"):
        g = g.sort_values("v_e2")
        v = g["v_e2"].to_numpy()
        c = g["n"].to_numpy()
        n = int(c.sum())
        if n % 2:
            med2 = 2 * order_stat(v, c, n // 2 + 1)
        else:
            med2 = order_stat(v, c, n // 2) + order_stat(v, c, n // 2 + 1)
        dg = pd.DataFrame({"d2": np.abs(2 * v - med2), "n": c}).groupby(
            "d2", as_index=False)["n"].sum().sort_values("d2")
        dv, dc = dg["d2"].to_numpy(), dg["n"].to_numpy()
        if n % 2:
            mad4 = 2 * order_stat(dv, dc, n // 2 + 1)
        else:
            mad4 = order_stat(dv, dc, n // 2) + order_stat(dv, dc, n // 2 + 1)
        cuts[et] = (int(med2), int(mad4))
    cuts_ref = ray.put(cuts)

    ev = rd.read_parquet(_t(sf_dir, "events"), columns=["event_id", "event_type", "value"])

    def flag(batch: pa.Table) -> pa.Table:
        cu = ray.get(cuts_ref)
        ids = batch["event_id"].to_numpy(zero_copy_only=False).astype("int64")
        v = np.floor(batch["value"].to_numpy(zero_copy_only=False) * 100 + 0.5).astype("int64")
        ets = batch["event_type"].to_numpy(zero_copy_only=False)
        keep = np.zeros(len(ids), dtype=bool)
        for et in np.unique(ets):
            med2, mad4 = cu[et]
            m = ets == et
            keep[m] = 2 * np.abs(2 * v[m] - med2) > 3 * mad4
        return pa.table({"event_id": pa.array(ids[keep], pa.int64()),
                         "event_type": pa.array(ets[keep], pa.string())})

    return (
        ev.map_batches(flag, batch_format="pyarrow")
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )


def cohort_ltv(sf_dir: str) -> pd.DataFrame:
    """COHORT LIFETIME-VALUE CURVE: customers cohorted by first-order
    month; per (cohort, months-since-first) cell the active-customer
    count, revenue, and the cohort's cumulative revenue.  ONE
    custkey-bucket exchange computes each customer's cohort and its
    per-(cohort, age) contributions locally (a customer lives in exactly
    one bucket, so distinct-customer counts are bucket-complete); only
    the DOMAIN-bounded (cohort × age) grid reaches the driver, which
    cumsums the curve."""
    from .dedup import coarse_buckets

    orders = rd.read_parquet(
        _t(sf_dir, "orders"), columns=["o_custkey", "o_orderdate", "o_totalprice"]
    )
    nb = coarse_buckets(orders.count(), rows_per_task=131072)

    def tag(batch: pa.Table) -> pa.Table:
        b = batch["o_custkey"].to_numpy(zero_copy_only=False).astype("int64") % nb
        return batch.append_column("__b", pa.array(b, pa.int64()))

    def cells(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"cohort_ym": "int64", "age_months": "int64",
                "active_customers": "int64", "revenue_e2": "int64"}
        if not len(g):
            return pd.DataFrame({k: pd.array([], dtype=v) for k, v in cols.items()})
        dt = g["o_orderdate"].astype("datetime64[s]")
        g = g.assign(
            ym=(dt.dt.year * 12 + (dt.dt.month - 1)).astype("int64"),
            r=np.floor(g["o_totalprice"].to_numpy() * 100 + 0.5).astype("int64"),
        )
        first = g.groupby("o_custkey")["ym"].transform("min")
        g["cohort"] = first
        g["age_months"] = g["ym"] - first
        out = g.groupby(["cohort", "age_months"], as_index=False).agg(
            active_customers=("o_custkey", "nunique"), revenue_e2=("r", "sum"))
        out["cohort_ym"] = (out["cohort"] // 12) * 100 + out["cohort"] % 12 + 1
        return out[list(cols)].astype(cols)

    grid = (
        orders.map_batches(tag, batch_format="pyarrow")
        .groupby("__b").map_groups(cells, batch_format="pandas")
        .to_pandas()
        .groupby(["cohort_ym", "age_months"], as_index=False)[
            ["active_customers", "revenue_e2"]].sum()
        .sort_values(["cohort_ym", "age_months"])
    )
    grid["cum_revenue_e2"] = grid.groupby("cohort_ym")["revenue_e2"].cumsum()
    return grid.astype("int64").reset_index(drop=True)


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


def doc_ngram_novelty(sf_dir: str, n: int = 3) -> pd.DataFrame:
    """N-GRAM NOVELTY per document: the fraction of a doc's distinct
    word 3-grams whose FIRST corpus occurrence (by doc_id order) is this
    doc — the 'new text rate' curation metric that separates original
    content from recombined boilerplate.  ONE gram-bucket exchange holds
    each gram's full posting in one task (min doc_id is bucket-local
    truth); per-doc partial (total, novel) counters flow through one
    doc-bucket combine — no driver-side data beyond the final per-doc
    table."""
    from .dedup import coarse_buckets

    docs = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    nb = coarse_buckets(docs.count(), rows_per_task=4096)

    def grams(batch: pa.Table) -> pa.Table:
        from ..functions.hashing import fingerprint64

        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype("int64")
        gid, gh = [], []
        for did, t in zip(ids, batch["text"].to_pylist()):
            ws = [w for w in (t or "").split(" ") if w]
            seen = {fingerprint64(" ".join(ws[i:i + n])) & 0x7FFFFFFFFFFFFFFF
                    for i in range(len(ws) - n + 1)}
            gid.extend([did] * len(seen))
            gh.extend(seen)
        gh = np.asarray(gh, dtype="int64")
        return pa.table({"doc_id": pa.array(gid, pa.int64()),
                         "g": pa.array(gh, pa.int64()),
                         "__b": pa.array(gh % nb, pa.int64())})

    def bucket_partial(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"doc_id": "int64", "n_grams": "int64", "novel": "int64"}
        if not len(g):
            return pd.DataFrame({k: pd.array([], dtype=v) for k, v in cols.items()})
        first = g.groupby("g")["doc_id"].transform("min")
        g = g.assign(nv=(g["doc_id"] == first).astype("int64"))
        out = g.groupby("doc_id", as_index=False).agg(
            n_grams=("g", "size"), novel=("nv", "sum"))
        return out.astype(cols)

    def tag_doc(batch: pa.Table) -> pa.Table:
        b = batch["doc_id"].to_numpy(zero_copy_only=False) % nb
        return batch.append_column("__b2", pa.array(b, pa.int64()))

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"doc_id": "int64", "n_grams": "int64", "novel": "int64",
                "novelty_e6": "int64"}
        if not len(g):
            return pd.DataFrame({k: pd.array([], dtype=v) for k, v in cols.items()})
        out = g.groupby("doc_id", as_index=False)[["n_grams", "novel"]].sum()
        out["novelty_e6"] = np.floor(
            out["novel"].to_numpy() * 1e6 / out["n_grams"].to_numpy() + 0.5
        ).astype("int64")
        return out.astype(cols)

    return (
        docs.map_batches(grams, batch_format="pyarrow")
        .groupby("__b").map_groups(bucket_partial, batch_format="pandas")
        .map_batches(tag_doc, batch_format="pyarrow")
        .groupby("__b2").map_groups(combine, batch_format="pandas")
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )


def events_percentile_cont(sf_dir: str) -> pd.DataFrame:
    """INTERPOLATED percentiles (SQL PERCENTILE_CONT / quantile_cont)
    per event type from the SAME domain-bounded value histogram the
    discrete-quantile family walks (:func:`_event_value_hist`) — no new
    exchange.  At q ∈ {0.25, 0.75} the interpolation position
    h = (n−1)·q has a fractional part in {0, ¼, ½, ¾}, so 4·result is
    an EXACT integer (4a + frac4·(b−a)): the value hashes bit-equal vs
    DuckDB's quantile_cont with no float crossing the oracle."""
    out = []
    for et, g in _event_value_hist(sf_dir).groupby("event_type"):
        g = g.sort_values("v_e2")
        v = g["v_e2"].to_numpy()
        c = g["n"].to_numpy()
        n = int(c.sum())

        def cont4(qn: int, qd: int = 4) -> int:
            # h = (n-1)*qn/qd;  lo = floor(h);  frac4 = 4*(h - lo)
            num = (n - 1) * qn
            lo, rem = divmod(num, qd)
            frac4 = rem * 4 // qd
            a = order_stat(v, c, lo + 1)
            if frac4 == 0:
                return 4 * a
            b = order_stat(v, c, lo + 2)
            return 4 * a + frac4 * (b - a)

        out.append((et, n, cont4(1), cont4(3)))
    return pd.DataFrame(
        out, columns=["event_type", "n", "p25_e2x4", "p75_e2x4"]
    ).astype({"n": "int64", "p25_e2x4": "int64", "p75_e2x4": "int64"})


def segment_event_mutual_info(sf_dir: str) -> pd.DataFrame:
    """MUTUAL INFORMATION between customer market segment and event type
    (nats, 1e6-scaled) — the information-theoretic sibling of the
    chi-square independence test: MI = Σ p(s,t)·ln(p(s,t)/(p(s)p(t))).
    Same scale shape as :func:`segment_event_chi2`: broadcast dim join +
    per-batch count combiner → ONE exchange bounded by the
    |segments|·|types| contingency table; the statistic is vectorized
    driver math over those ≤25 cells with the oracle's expression."""
    ev = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "event_type"])
    cust = pd.read_parquet(
        _t(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"]
    ).rename(columns={"c_custkey": "user_id"})
    joined = broadcast_join(ev, cust, on="user_id")

    _schema = pa.schema(
        [("seg", pa.string()), ("et", pa.string()), ("o", pa.int64())]
    )

    def partial(b: pd.DataFrame) -> pa.Table:
        g = (
            b.rename(columns={"c_mktsegment": "seg", "event_type": "et"})
            .groupby(["seg", "et"], as_index=False)
            .agg(o=("et", "size"))
        )
        return pa.Table.from_pandas(g, preserve_index=False, schema=_schema)

    c = (
        joined.map_batches(partial, batch_format="pandas")
        .groupby(["seg", "et"])
        .sum("o")
        .to_pandas()
        .rename(columns={"sum(o)": "o"})
        .sort_values(["seg", "et"])
    )
    o = c["o"].to_numpy(dtype="float64")
    rt = c.groupby("seg")["o"].transform("sum").to_numpy(dtype="float64")
    ct = c.groupby("et")["o"].transform("sum").to_numpy(dtype="float64")
    n = o.sum()
    mi = float(((o / n) * np.log(o * n / (rt * ct))).sum())
    return pd.DataFrame(
        {
            "n_cells": pd.array([len(c)], dtype="int64"),
            "mi_e6": pd.array([int(np.floor(mi * 1e6 + 0.5))], dtype="int64"),
        }
    )


def events_bootstrap_ci(sf_dir: str, n_replicas: int = 200) -> pd.DataFrame:
    """POISSON-BOOTSTRAP 95 % confidence interval for each event type's
    mean value (Chamandy, Muralidharan, Najmi & Naidu 2012 — the
    streaming bootstrap: per replica b, every row gets an independent
    Poisson(1) weight, so a replica is computable as a weighted SUM
    without ever materializing a resample).  Weights are DETERMINISTIC
    — Poisson inverse-CDF over u = splitmix64(event_id·B + b)/2⁶⁴ — so
    the interval is reproducible across runs, partitionings, and
    cluster sizes (no RNG state).  Scale shape: per-batch partials are
    (type, replica, Σwv, Σw) — domain-bounded at |types|·B rows per
    block regardless of data size — combined on the driver; the
    percentile cut runs over B replica means per type.  Cost is B
    weighted sums per row, the bootstrap's irreducible price (B
    tunable).  Rows-only (the hash-driven resample isn't reasonably
    SQL-expressible); twin test replays the exact rule in pandas."""
    ev = rd.read_parquet(_t(sf_dir, "events"), columns=["event_id", "event_type", "value"])
    B = int(n_replicas)
    # Poisson(1) inverse CDF thresholds, scaled to uint64 range
    import math as _math

    pk = np.cumsum(np.exp(-1.0) / np.array([_math.factorial(k) for k in range(12)]))
    thresholds = np.minimum(pk * float(2**64), float(2**64 - 1)).astype(np.uint64)

    _schema = pa.schema(
        [("event_type", pa.string()), ("b", pa.int64()),
         ("swv", pa.int64()), ("sw", pa.int64())]
    )

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        v = np.floor(
            batch["value"].to_numpy(zero_copy_only=False) * 100 + 0.5
        ).astype("int64")
        ets = batch["event_type"].to_numpy(zero_copy_only=False)
        # (n, B) Poisson(1) weights from one vectorized mix per replica
        u = _splitmix64(ids[:, None] * np.uint64(B) + np.arange(B, dtype=np.uint64)[None, :])
        w = np.searchsorted(thresholds, u, side="left").astype("int64")  # (n, B)
        rows = []
        for et in np.unique(ets):
            m = ets == et
            swv = (w[m] * v[m][:, None]).sum(axis=0)  # (B,)
            sw = w[m].sum(axis=0)
            rows.append(pd.DataFrame(
                {"event_type": et, "b": np.arange(B, dtype="int64"),
                 "swv": swv, "sw": sw}
            ))
        return pa.Table.from_pandas(
            pd.concat(rows) if rows else pd.DataFrame(
                {"event_type": [], "b": [], "swv": [], "sw": []}
            ),
            preserve_index=False, schema=_schema,
        )

    agg = (
        ev.map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby(["event_type", "b"], as_index=False)[["swv", "sw"]].sum()
    )
    out = []
    for et, g in agg.groupby("event_type"):
        means = g["swv"].to_numpy(dtype="float64") / np.maximum(
            g["sw"].to_numpy(dtype="float64"), 1.0
        )
        means.sort()
        lo = means[int(np.floor(0.025 * (len(means) - 1)))]
        hi = means[int(np.ceil(0.975 * (len(means) - 1)))]
        out.append((et, len(means),
                    int(np.floor(lo * 1e4 + 0.5)), int(np.floor(hi * 1e4 + 0.5))))
    return pd.DataFrame(
        out, columns=["event_type", "n_replicas", "lo_e6", "hi_e6"]
    ).sort_values("event_type").reset_index(drop=True)


def purchase_survival_km(sf_dir: str) -> pd.DataFrame:
    """KAPLAN-MEIER survival estimator (Kaplan & Meier 1958) for
    time-to-first-purchase: each user enters at their first event of any
    type; the event is their first purchase (any purchase is ≥ the
    global first, so per-user MIN timestamps suffice); users who never
    purchase are right-CENSORED at the corpus' max timestamp.  Duration
    is whole days (integer µs arithmetic).  Output: one row per event
    time t with the at-risk count n(t) (reverse cumsum), event count
    d(t), hazard_e6 = floor(1e6·d/n + ½), and the survival curve
    S(t) = Π_{t'≤t}(1 − d/n).

    Exactness: n, d are exact ints; hazard is one float div + floor
    replicated verbatim in SQL; S(t) is a SEQUENTIAL double product in
    ascending-t order on BOTH sides — the oracle forces the identical
    multiply order with a recursive CTE (windowed PRODUCT would be
    segment-tree-associated and could differ in the last ulp).

    Scale shape: per-batch (user, min ts, min purchase ts) partials →
    ONE user-bucket exchange where per-user firsts complete; each bucket
    emits a DOMAIN-BOUNDED (t_day, d, c) census (≤ span-days rows), so
    only |days|-sized tables and the final ≤|event-times| KM fold reach
    the driver."""
    from .dedup import coarse_buckets

    ev = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "event_type", "ts"])
    nb = coarse_buckets(ev.count(), rows_per_task=65536)

    DAY_US = 86_400_000_000

    _p_schema = pa.schema(
        [("user_id", pa.int64()), ("t0", pa.int64()), ("tp", pa.int64()),
         ("__b", pa.int64())]
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        us = df["ts"].astype("datetime64[us]").astype("int64")
        df = df.assign(us=us)
        g0 = df.groupby("user_id", as_index=False)["us"].min().rename(columns={"us": "t0"})
        gp = (
            df[df["event_type"] == "purchase"]
            .groupby("user_id", as_index=False)["us"].min().rename(columns={"us": "tp"})
        )
        m = g0.merge(gp, on="user_id", how="left")
        m["tp"] = m["tp"].fillna(-1).astype("int64")
        m["__b"] = (m["user_id"] % nb).astype("int64")
        return pa.Table.from_pandas(m, preserve_index=False, schema=_p_schema)

    def census(g: pd.DataFrame, horizon_us: int) -> pd.DataFrame:
        cols = {"t_day": "int64", "d": "int64", "c": "int64"}
        if not len(g):
            return pd.DataFrame({k: pd.array([], dtype=v) for k, v in cols.items()})
        BIG = np.int64(2**62)  # "no purchase" sentinel that min() ignores
        g = g.assign(tp=np.where(g["tp"].to_numpy() < 0, BIG, g["tp"].to_numpy()))
        f = g.groupby("user_id", as_index=False).agg(t0=("t0", "min"), tp=("tp", "min"))
        has_p = f["tp"].to_numpy() < BIG
        end = np.where(has_p, f["tp"].to_numpy(), horizon_us)
        t = (end - f["t0"].to_numpy()) // DAY_US
        out = pd.DataFrame({"t_day": t, "e": has_p.astype("int64")})
        cen = out.groupby("t_day", as_index=False).agg(d=("e", "sum"), c=("e", "size"))
        return cen.astype(cols)

    # horizon needs one cheap pass; pd.Timestamp handles every scalar
    # flavor Dataset.max can return, and .value//1000 is EXACT µs (a
    # float .timestamp() round-trip can land 1 µs low — hash-breaking)
    mx = rd.read_parquet(_t(sf_dir, "events"), columns=["ts"]).max("ts")
    horizon = int(pd.Timestamp(mx).value // 1000)

    cen = (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(lambda g: census(g, horizon), batch_format="pandas")
        .to_pandas()
        .groupby("t_day", as_index=False)[["d", "c"]].sum()
        .sort_values("t_day")
    )
    # KM fold over the ≤|days| census: reverse-cumsum at-risk, event rows only
    n_risk = cen["c"].to_numpy()[::-1].cumsum()[::-1]
    cen = cen.assign(n_risk=n_risk)
    km = cen[cen["d"] > 0].reset_index(drop=True)
    sv = 1.0
    surv, haz = [], []
    for n_i, d_i in zip(km["n_risk"].to_numpy(), km["d"].to_numpy()):
        haz.append(int(np.floor(1e6 * d_i / n_i + 0.5)))
        sv = sv * ((n_i - d_i) / n_i)  # sequential: matches the recursive CTE
        surv.append(int(np.floor(sv * 1e6 + 0.5)))
    return pd.DataFrame(
        {"t_day": km["t_day"].astype("int64"),
         "n_risk": km["n_risk"].astype("int64"),
         "d": km["d"].astype("int64"),
         "hazard_e6": pd.array(haz, dtype="int64"),
         "surv_e6": pd.array(surv, dtype="int64")}
    )


class _BpeEncodeStage:
    """Actor-pool BPE ENCODER: the merge table loads ONCE per actor in
    ``__init__`` (broadcast via ray.put); ``__call__`` encodes each
    batch's DISTINCT words once through a per-actor memo dict that
    persists across batches — the standard segmenter-with-cache shape a
    real tokenizer service uses (vocabulary-bounded state, not
    corpus-bounded)."""

    def __init__(self, merges_ref):
        import ray

        from ..functions.text import bpe_encode

        self._merges = ray.get(merges_ref)
        self._encode = bpe_encode
        self._memo: dict[str, int] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype("int64")
        n_words = np.zeros(len(ids), dtype=np.int64)
        n_toks = np.zeros(len(ids), dtype=np.int64)
        memo, enc, merges = self._memo, self._encode, self._merges
        for i, t in enumerate(batch["text"].to_pylist()):
            words = [w for w in (t or "").split(" ") if w]
            n_words[i] = len(words)
            tot = 0
            for w in words:
                n = memo.get(w)
                if n is None:
                    n = len(enc(w, merges))
                    memo[w] = n
                tot += n
            n_toks[i] = tot
        fert = np.floor(n_toks * 1e6 / np.maximum(n_words, 1) + 0.5).astype("int64")
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()),
             "n_words": pa.array(n_words, pa.int64()),
             "n_bpe_tokens": pa.array(n_toks, pa.int64()),
             "fertility_e6": pa.array(fert, pa.int64())}
        )


def bpe_encode_docs(sf_dir: str, n_merges: int = 40) -> pd.DataFrame:
    """TOKENIZER APPLICATION — the encode half of the BPE story
    (:func:`bpe_vocab` trains, this op segments the corpus with the
    learned merges): per-doc word count, BPE token count, and fertility
    (tokens/word, e6) — the statistic tokenizer evaluations report.

    Scale shape: train on the vocabulary-bounded reduction, broadcast
    the merge list once, then ONE streaming actor-pool pass
    (:class:`_BpeEncodeStage`, per-actor word→length memo) — no
    shuffle, output is one row per doc.  Greedy rank-ordered BPE
    segmentation is iterative per word — not SQL-expressible, so
    rows-only; the twin test replays encode in pure Python."""
    import ray

    merges_ref = ray.put(_bpe_merges(sf_dir, n_merges))
    docs = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    # autoscaling pool capped below the CPU budget so upstream read
    # tasks always have a slot (fixed pools == num_cpus can deadlock)
    out = docs.map_batches(
        _BpeEncodeStage,
        batch_format="pyarrow",
        concurrency=(1, 2),
        fn_constructor_args=(merges_ref,),
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def doc_compression_ratio(sf_dir: str, level: int = 6) -> pd.DataFrame:
    """COMPRESSION-RATIO quality signal: zlib-compressed size over raw
    UTF-8 size per document (e6 half-up) — the classic
    repetitive-boilerplate detector (highly compressible ⇒ templated /
    repeated text; the Gopher pipeline's repetition filters approximate
    exactly this signal, Rae et al. 2021).  Flags docs whose ratio
    falls below ``0.4`` as repetitive.

    Scale shape: stateless vectorized-per-row ``map_batches`` — zero
    shuffle, one streaming pass, CPU-bound compression distributed
    across the pool.  zlib output bytes are deterministic for a fixed
    level, but no SQL engine exposes zlib ⇒ rows-only; the twin test
    replays the exact rule."""
    import zlib

    docs = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def ratios(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype("int64")
        raw_len = np.zeros(len(ids), dtype=np.int64)
        comp_len = np.zeros(len(ids), dtype=np.int64)
        for i, t in enumerate(batch["text"].to_pylist()):
            b = (t or "").encode("utf-8")
            raw_len[i] = len(b)
            comp_len[i] = len(zlib.compress(b, level))
        ratio = np.floor(comp_len * 1e6 / np.maximum(raw_len, 1) + 0.5).astype("int64")
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()),
             "raw_bytes": pa.array(raw_len, pa.int64()),
             "zlib_bytes": pa.array(comp_len, pa.int64()),
             "ratio_e6": pa.array(ratio, pa.int64()),
             "repetitive": pa.array(ratio < 400_000)}
        )

    out = docs.map_batches(ratios, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def orders_urgent_logreg(
    sf_dir: str, n_iters: int = 20, lr: float = 0.5
) -> pd.DataFrame:
    """DISTRIBUTED MODEL TRAINING: full-batch gradient-descent logistic
    regression predicting ``o_orderpriority = '1-URGENT'`` from order
    price — the canonical data-parallel optimizer loop (each iteration:
    broadcast weights → per-batch partial gradients → driver reduce →
    update), the shape every distributed SGD/L-BFGS trainer scales by.

    Determinism at any partitioning: each ROW's gradient contribution is
    floored to an e9 INTEGER before summation (int64 sums are order-free;
    float gradient sums would drift with block layout), and the weight
    update runs in double on the driver from those exact integers — so
    training is bit-reproducible across cluster sizes.  The feature
    dataset (2 floats/row) is projected once and pinned; per iteration
    only the (dim+1)-integer partial vector moves.  Iterative → no SQL
    oracle (rows-only); the twin test replays the exact rule in numpy
    and pins a quality floor (training loss decreases; final accuracy
    beats the majority class)."""
    feats = rd.read_parquet(
        _t(sf_dir, "orders"), columns=["o_totalprice", "o_orderpriority"]
    )

    def featurize(batch: pa.Table) -> pa.Table:
        x = batch["o_totalprice"].to_numpy(zero_copy_only=False) / 500_000.0
        y = pc.equal(batch["o_orderpriority"], "1-URGENT").to_numpy(
            zero_copy_only=False
        ).astype("float64")
        return pa.table(
            {"x": pa.array(x, pa.float64()), "y": pa.array(y, pa.float64())}
        )

    ds = feats.map_batches(featurize, batch_format="pyarrow").materialize()
    n = ds.count()

    _g_schema = pa.schema(
        [("g0", pa.int64()), ("g1", pa.int64()), ("nll", pa.int64()),
         ("correct", pa.int64())]
    )

    history = []
    w = np.zeros(2, dtype=np.float64)  # [bias, price coef]
    for it in range(n_iters):
        w0, w1 = float(w[0]), float(w[1])

        def grad_partial(batch: pa.Table) -> pa.Table:
            x = batch["x"].to_numpy(zero_copy_only=False)
            y = batch["y"].to_numpy(zero_copy_only=False)
            z = w0 + w1 * x
            p = 1.0 / (1.0 + np.exp(-z))
            r = p - y
            # e9-integer per-ROW contributions -> order-free int sums
            g0 = int(np.floor(r * 1e9 + 0.5).astype("int64").sum())
            g1 = int(np.floor(r * x * 1e9 + 0.5).astype("int64").sum())
            eps = 1e-12
            nll = int(
                np.floor(
                    -(y * np.log(p + eps) + (1 - y) * np.log(1 - p + eps)) * 1e9
                    + 0.5
                ).astype("int64").sum()
            )
            correct = int(((p >= 0.5) == (y >= 0.5)).sum())
            return pa.table(
                {"g0": [g0], "g1": [g1], "nll": [nll], "correct": [correct]},
                schema=_g_schema,
            )

        agg = (
            ds.map_batches(grad_partial, batch_format="pyarrow")
            .to_pandas()[["g0", "g1", "nll", "correct"]].sum()
        )
        history.append(
            (it, int(np.floor(w[0] * 1e6 + 0.5)), int(np.floor(w[1] * 1e6 + 0.5)),
             int(agg["nll"] // max(n, 1)), int(agg["correct"]))
        )
        w = w - lr * np.array([agg["g0"], agg["g1"]], dtype=np.float64) / (1e9 * n)
    return pd.DataFrame(
        history, columns=["iter", "w0_e6", "w1_e6", "mean_nll_e9", "n_correct"]
    ).astype("int64")


def events_cusum_changepoint(sf_dir: str) -> pd.DataFrame:
    """CHANGE-POINT DETECTION via one-sided CUSUM (Page 1954): per event
    type, the cumulative-sum statistic s_d = max(0, s_{d−1} + (x̄_d − m))
    over the DAILY mean value series (m = the type's global mean), whose
    peak marks the most sustained upward drift.  Reports the peak, its
    first day, and how many days the statistic was armed (> 0).

    Exactness: daily/global means are single divisions of exact e2
    integers; the recursion is a SEQUENTIAL double fold in ascending-day
    order on BOTH sides — the oracle forces the identical order with a
    recursive CTE (the Kaplan-Meier trick), so doubles match bit-for-bit
    and the e2 half-up peak hashes equal.

    Scale shape: per-batch (type, day, Σe2, n) combiners → ONE exchange
    bounded by the |types|·|days| DOMAIN; the driver folds the ≤domain
    table."""
    ev = rd.read_parquet(_t(sf_dir, "events"), columns=["event_type", "ts", "value"])

    _schema = pa.schema(
        [("event_type", pa.string()), ("day", pa.timestamp("us")),
         ("s", pa.int64()), ("n", pa.int64())]
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["day"] = df["ts"].dt.floor("D")
        df["e2"] = np.floor(df["value"].to_numpy() * 100 + 0.5).astype("int64")
        g = df.groupby(["event_type", "day"], as_index=False).agg(
            s=("e2", "sum"), n=("e2", "size")
        )
        return pa.Table.from_pandas(g, preserve_index=False, schema=_schema)

    daily = (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "day"])
        .sum(["s", "n"])
        .to_pandas()
        .rename(columns={"sum(s)": "s", "sum(n)": "n"})
        .sort_values(["event_type", "day"])
    )
    out = []
    for et, g in daily.groupby("event_type"):
        S = int(g["s"].sum())
        N = int(g["n"].sum())
        m = S / N  # one exact-int division, replicated in SQL
        cs = 0.0
        peak, peak_day, n_pos = -1.0, None, 0
        for day, s_i, n_i in zip(g["day"], g["s"], g["n"]):
            cs = max(0.0, cs + (int(s_i) / int(n_i) - m))
            if cs > 0:
                n_pos += 1
            if cs > peak:
                peak, peak_day = cs, day
        out.append(
            (et, len(g), peak_day, int(np.floor(peak + 0.5)), n_pos)
        )
    return pd.DataFrame(
        out, columns=["event_type", "n_days", "peak_day", "peak_cusum_e2",
                      "n_pos_days"]
    ).astype({"n_days": "int64", "peak_cusum_e2": "int64", "n_pos_days": "int64"})


def doc_coverage_select(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """SUBMODULAR CORPUS SELECTION — greedy MAX-COVERAGE (Nemhauser,
    Wolsey & Fisher 1978: the greedy (1−1/e) guarantee): pick ``k`` docs
    maximizing distinct-token coverage, the canonical diversity-driven
    data-curation selector (the lexical cousin of the k-center coreset).

    Each round: broadcast the covered-token hash set (sorted int64
    array) → per-batch vectorized gains (np.isin over each doc's
    DISTINCT token hashes) → per-batch partial argmax (gain DESC,
    doc_id ASC) → tiny driver reduce; the winner's tokens join the
    covered set.  Tokenization happens ONCE into a pinned (doc_id,
    hashes) dataset — k passes ship only gains.  Deterministic by the
    total tie order.  Iterative/greedy → rows-only; the twin replays
    the exact greedy in pure Python."""
    from ..functions.hashing import fingerprint64

    docs = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def tokenize(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype("int64")
        out = []
        for t in batch["text"].to_pylist():
            hs = {fingerprint64(w) & 0x7FFFFFFFFFFFFFFF
                  for w in (t or "").split(" ") if w}
            out.append(np.fromiter(hs, dtype=np.int64, count=len(hs)))
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()),
             "h": pa.array([x.tolist() for x in out], pa.list_(pa.int64()))}
        )

    tok = docs.map_batches(tokenize, batch_format="pyarrow").materialize()

    import ray

    # each partial also carries its candidate's token list, so the round
    # winner's tokens are already on the driver — no extra dataset pass
    _schema = pa.schema(
        [("doc_id", pa.int64()), ("gain", pa.int64()),
         ("h", pa.list_(pa.int64()))]
    )
    covered = np.empty(0, dtype=np.int64)
    chosen: set[int] = set()
    rows = []
    for rank in range(k):
        cov_ref = ray.put(np.sort(covered))
        chosen_ref = ray.put(chosen)

        def best_partial(batch: pa.Table) -> pa.Table:
            cov = ray.get(cov_ref)
            ch = ray.get(chosen_ref)
            best_gain, best_id, best_h = -1, None, None
            for did, hs in zip(batch["doc_id"].to_pylist(), batch["h"].to_pylist()):
                if did in ch:
                    continue
                a = np.asarray(hs, dtype=np.int64)
                if len(cov):
                    g = int((~np.isin(a, cov, assume_unique=True)).sum())
                else:
                    g = len(a)
                if g > best_gain or (g == best_gain and did < best_id):
                    best_gain, best_id, best_h = g, did, hs
            if best_id is None:
                return pa.table({"doc_id": [], "gain": [], "h": []}, schema=_schema)
            return pa.table(
                {"doc_id": [best_id], "gain": [best_gain], "h": [best_h]},
                schema=_schema,
            )

        parts = tok.map_batches(best_partial, batch_format="pyarrow").to_pandas()
        if not len(parts):
            break
        parts = parts.sort_values(["gain", "doc_id"], ascending=[False, True])
        wid, wgain = int(parts.iloc[0]["doc_id"]), int(parts.iloc[0]["gain"])
        covered = np.union1d(
            covered, np.asarray(parts.iloc[0]["h"], dtype=np.int64)
        )
        chosen.add(wid)
        rows.append((rank, wid, wgain, len(covered)))
    return pd.DataFrame(
        rows, columns=["rank", "doc_id", "gain", "covered_total"]
    ).astype("int64")


def events_holt_forecast(sf_dir: str) -> pd.DataFrame:
    """FORECASTING: Holt double-exponential smoothing (Holt 1957) over
    each event type's daily-mean series — level s_t = α·x_t +
    (1−α)(s_{t−1}+b_{t−1}), trend b_t = β(s_t−s_{t−1}) + (1−β)b_{t−1},
    init s_1 = x_1, b_1 = x_2−x_1 (0 for a one-day series); reports the
    final level/trend and the one-step-ahead forecast s+b.

    Exactness: α=0.5 and β=0.25 are exact binary fractions; x_t and the
    folds are the SAME double ops on both sides, forced sequential by the
    oracle's recursive CTE (the KM/CUSUM trick).  Scale shape: the
    |types|·|days| domain-bounded daily-mean exchange (shared shape with
    :func:`events_cusum_changepoint`), then an O(days) driver fold."""
    ALPHA, BETA = 0.5, 0.25
    ev = rd.read_parquet(_t(sf_dir, "events"), columns=["event_type", "ts", "value"])

    _schema = pa.schema(
        [("event_type", pa.string()), ("day", pa.timestamp("us")),
         ("s", pa.int64()), ("n", pa.int64())]
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["day"] = df["ts"].dt.floor("D")
        df["e2"] = np.floor(df["value"].to_numpy() * 100 + 0.5).astype("int64")
        g = df.groupby(["event_type", "day"], as_index=False).agg(
            s=("e2", "sum"), n=("e2", "size")
        )
        return pa.Table.from_pandas(g, preserve_index=False, schema=_schema)

    daily = (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "day"])
        .sum(["s", "n"])
        .to_pandas()
        .rename(columns={"sum(s)": "s", "sum(n)": "n"})
        .sort_values(["event_type", "day"])
    )
    out = []
    for et, g in daily.groupby("event_type"):
        x = g["s"].to_numpy(dtype="int64") / g["n"].to_numpy(dtype="int64")
        s = x[0]
        b = (x[1] - x[0]) if len(x) > 1 else 0.0
        for t in range(1, len(x)):
            s_new = ALPHA * x[t] + (1 - ALPHA) * (s + b)
            b = BETA * (s_new - s) + (1 - BETA) * b
            s = s_new
        out.append(
            (et, len(x), int(np.floor(s * 1e4 + 0.5)),
             int(np.floor(b * 1e4 + 0.5)), int(np.floor((s + b) * 1e4 + 0.5)))
        )
    return pd.DataFrame(
        out, columns=["event_type", "n_days", "level_e6", "trend_e6",
                      "forecast_e6"]
    ).astype({"n_days": "int64", "level_e6": "int64", "trend_e6": "int64",
              "forecast_e6": "int64"})


def source_simpson_diversity(sf_dir: str) -> pd.DataFrame:
    """SIMPSON DIVERSITY index per source over its token distribution —
    1 − Σ nᵢ(nᵢ−1)/(N(N−1)), the probability two tokens drawn without
    replacement differ (Simpson 1949; the ecology/corpus-diversity
    complement of the entropy diagnostic).  EXACT integers end-to-end:
    the statistic is a ratio of integer sums, e6-floored identically in
    the oracle — no log/float enters at all.

    Scale shape: per-batch (source, token) count combiner → ONE
    token-bucket exchange where each (source, token) total completes →
    per-source Σn(n−1) partials (vocabulary-bounded) → |sources|-row
    driver table."""
    from .dedup import coarse_buckets

    docs = rd.read_parquet(_t(sf_dir, "documents"), columns=["source", "text"])
    nb = coarse_buckets(docs.count(), rows_per_task=8192)

    _schema = pa.schema(
        [("source", pa.string()), ("token", pa.string()),
         ("n", pa.int64()), ("__b", pa.int64())]
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        rows = []
        for src, t in zip(df["source"], df["text"]):
            for w in (t or "").split(" "):
                if w:
                    rows.append((src, w))
        g = pd.DataFrame(rows, columns=["source", "token"]).groupby(
            ["source", "token"], as_index=False
        ).agg(n=("token", "size"))
        g["__b"] = (
            pd.util.hash_array(g["token"].to_numpy(object)).astype("int64")
            % nb + nb
        ) % nb
        return pa.Table.from_pandas(g, preserve_index=False, schema=_schema)

    _p2 = pa.schema([("source", pa.string()), ("nn", pa.int64()), ("N", pa.int64())])

    def bucket_close(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"source": "object", "nn": "int64", "N": "int64"}
        if not len(g):
            return pd.DataFrame({k: pd.Series(dtype=v) for k, v in cols.items()})
        tot = g.groupby(["source", "token"], as_index=False)["n"].sum()
        tot["nn"] = tot["n"] * (tot["n"] - 1)
        out = tot.groupby("source", as_index=False).agg(
            nn=("nn", "sum"), N=("n", "sum")
        )
        return out[["source", "nn", "N"]]

    agg = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(bucket_close, batch_format="pandas")
        .to_pandas()
        .groupby("source", as_index=False)[["nn", "N"]].sum()
        .sort_values("source")
    )
    # exact integer floor of 1e6·(1 − nn/(N(N−1))) — python bigints (the
    # 1e6·N² intermediate would silently wrap int64 past ~3e6 tokens)
    simpson_e6 = [
        (1_000_000 * (int(N) * (int(N) - 1) - int(nn)))
        // max(int(N) * (int(N) - 1), 1)
        for nn, N in zip(agg["nn"], agg["N"])
    ]
    return pd.DataFrame(
        {"source": agg["source"], "n_tokens": agg["N"].astype("int64"),
         "simpson_e6": pd.array(simpson_e6, dtype="int64")}
    ).reset_index(drop=True)


def lineitem_weighted_median(sf_dir: str) -> pd.DataFrame:
    """WEIGHTED MEDIAN (weighted order statistic): per return-flag, the
    smallest price whose cumulative QUANTITY weight reaches half the
    total — the robust 'typical traded price' (each row votes with its
    quantity, not once).  Exact: prices live on an integer e2 domain;
    the rule 2·cumw ≥ W is pure integer comparison, replicated by the
    oracle's windowed cumsum.

    Scale shape: per-batch (flag, price_e2, Σqty) histogram combiners →
    ONE coarse-bucketed exchange (prices are NEAR-ALL-DISTINCT, so the
    key must be hash-bucketed, not grouped natively — the round-3
    distinct-key pathology; this query originally used the native
    groupby and measured 7.8 s at sf0.1, ~6× the bucketed path) →
    per-flag sorted cumsum on the driver."""
    from .dedup import coarse_buckets

    li = rd.read_parquet(
        _t(sf_dir, "lineitem"),
        columns=["l_returnflag", "l_extendedprice", "l_quantity"],
    )
    nb = coarse_buckets(li.count(), rows_per_task=65536)

    _schema = pa.schema(
        [("flag", pa.string()), ("p_e2", pa.int64()), ("w", pa.int64()),
         ("__b", pa.int64())]
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["p_e2"] = np.floor(
            df["l_extendedprice"].to_numpy() * 100 + 0.5
        ).astype("int64")
        df["w"] = np.floor(df["l_quantity"].to_numpy() + 0.5).astype("int64")
        g = df.groupby(["l_returnflag", "p_e2"], as_index=False).agg(w=("w", "sum"))
        g = g.rename(columns={"l_returnflag": "flag"})
        g["__b"] = (g["p_e2"].to_numpy() % nb).astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False, schema=_schema)

    def sum_cells(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["flag", "p_e2"], as_index=False)["w"].sum()

    hist = (
        li.map_batches(partial, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(sum_cells, batch_format="pandas")
        .to_pandas()
        .sort_values(["flag", "p_e2"])
    )
    out = []
    for flag, g in hist.groupby("flag"):
        w = g["w"].to_numpy(dtype="int64")
        W = int(w.sum())
        cum = np.cumsum(w)
        idx = int(np.searchsorted(2 * cum, W, side="left"))
        out.append((flag, W, int(g["p_e2"].to_numpy()[idx])))
    return pd.DataFrame(
        out, columns=["l_returnflag", "total_qty", "wmedian_price_e2"]
    ).astype({"total_qty": "int64", "wmedian_price_e2": "int64"})


def events_mannwhitney(sf_dir: str) -> pd.DataFrame:
    """MANN-WHITNEY U rank-sum test (tie-corrected normal approximation)
    of every event type's value distribution against the 'click'
    baseline — the NONPARAMETRIC sibling of :func:`welch_ttest` (no
    normality assumption; compares whole distributions by rank).

    Exactness contract: everything up to the z-score is INTEGER —
    average ranks are half-integers, so 2·R1 (``r12``) and 2·U1
    (``u2``) are exact int64 derived from the domain-bounded value
    histogram; the tie term Σ(t³−t) is integer too.  z replicates the
    oracle's float expression verbatim.

    Scale shape: rides the SAME distributed (type, v_e2) histogram as
    the median/quantile/MAD family (:func:`_event_value_hist`) — the
    shuffle payload is bounded by the value DOMAIN, not the row count;
    rank sums come from cumulative counts over ≤|domain| rows on the
    driver.  No sort exchange, no second data pass."""
    import math

    hist = _event_value_hist(sf_dir)
    click = (
        hist[hist["event_type"] == "click"][["v_e2", "n"]]
        .rename(columns={"n": "c2"})
    )
    out = []
    for et, g in hist[hist["event_type"] != "click"].groupby("event_type"):
        m = (
            g[["v_e2", "n"]].rename(columns={"n": "c1"})
            .merge(click, on="v_e2", how="outer")
            .fillna(0)
            .sort_values("v_e2")
        )
        c1 = m["c1"].to_numpy(dtype="int64")
        c2 = m["c2"].to_numpy(dtype="int64")
        t = c1 + c2
        sm = np.cumsum(t) - t  # count of strictly-smaller values
        n1, n2 = int(c1.sum()), int(c2.sum())
        nn = n1 + n2
        # 2·(rank sum of sample 1): avg rank of value v is sm + (t+1)/2
        r12 = int((c1 * (2 * sm + t + 1)).sum())
        u2 = r12 - n1 * (n1 + 1)  # 2·U1
        tie = int((t * t * t - t).sum())
        z = (u2 / 2 - float(n1) * n2 / 2) / math.sqrt(
            float(n1) * n2 / 12 * ((nn + 1) - float(tie) / (float(nn) * (nn - 1)))
        )
        out.append((et, n1, n2, u2, int(np.floor(z * 1e6 + 0.5))))
    return (
        pd.DataFrame(out, columns=["event_type", "n1", "n2", "u2", "z_e6"])
        .sort_values("event_type")
        .reset_index(drop=True)
    )


def events_spearman_corr(sf_dir: str) -> pd.DataFrame:
    """SPEARMAN RANK CORRELATION between event value and hour-of-day per
    event type (tie-handled via average ranks) — the rank-based,
    outlier-robust sibling of the Pearson op
    (:func:`events_value_time_corr`).

    Exactness contract: doubled average ranks (2·min_rank + t − 1) are
    exact integers; all five moment sums (Σrx·ry, Σrx, Σry, Σrx²,
    Σry²) are exact Python ints folded from the contingency table, and
    ρ replicates the oracle's single float expression.

    Scale shape: per-batch (type, v_e2, hour) count combiners → one
    coarse-bucket exchange bounded by |value domain|·24, NOT the row
    count; ranks derive from the two MARGINAL histograms, and the
    cross-moment Σ rx·ry folds over the contingency cells — no per-row
    ranks ever materialize, no sort exchange."""
    import math

    from .dedup import coarse_buckets

    ev = rd.read_parquet(_t(sf_dir, "events"), columns=["event_type", "value", "ts"])
    nb = coarse_buckets(ev.count(), rows_per_task=65536)

    _schema = pa.schema(
        [("event_type", pa.string()), ("v_e2", pa.int64()),
         ("hour", pa.int64()), ("n", pa.int64()), ("__b", pa.int64())]
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["v_e2"] = np.floor(df["value"].to_numpy() * 100.0 + 0.5).astype("int64")
        df["hour"] = df["ts"].dt.hour.astype("int64")
        g = df.groupby(["event_type", "v_e2", "hour"], as_index=False).agg(
            n=("hour", "size")
        )
        g["__b"] = (g["v_e2"].to_numpy() % nb).astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False, schema=_schema)

    def sum_cells(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["event_type", "v_e2", "hour"], as_index=False)["n"].sum()

    cells = (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(sum_cells, batch_format="pandas")
        .to_pandas()  # ≤ |value domain|·24 rows — domain-bounded
    )
    out = []
    for et, g in cells.groupby("event_type"):
        # marginal value histogram → doubled average rank per value
        mv = g.groupby("v_e2", as_index=False)["n"].sum().sort_values("v_e2")
        cv = mv["n"].to_numpy(dtype="int64")
        rx2 = 2 * (np.cumsum(cv) - cv) + cv + 1  # = 2·avg_rank, integer
        rx_of = dict(zip(mv["v_e2"], rx2))
        mh = g.groupby("hour", as_index=False)["n"].sum().sort_values("hour")
        ch = mh["n"].to_numpy(dtype="int64")
        ry2 = 2 * (np.cumsum(ch) - ch) + ch + 1
        ry_of = dict(zip(mh["hour"], ry2))
        n_tot = int(cv.sum())
        rxs = np.array([rx_of[v] for v in g["v_e2"]], dtype="int64")
        rys = np.array([ry_of[h] for h in g["hour"]], dtype="int64")
        ns = g["n"].to_numpy(dtype="int64")
        sxy = int((ns * rxs * rys).sum())
        sx = int((cv * rx2).sum())
        sy = int((ch * ry2).sum())
        sxx = int((cv * rx2 * rx2).sum())
        syy = int((ch * ry2 * ry2).sum())
        num = n_tot * sxy - sx * sy  # exact Python int
        dx = n_tot * sxx - sx * sx
        dy = n_tot * syy - sy * sy
        rho = float(num) / math.sqrt(float(dx) * float(dy))
        out.append((et, n_tot, int(np.floor(rho * 1e6 + 0.5))))
    return (
        pd.DataFrame(out, columns=["event_type", "n", "rho_e6"])
        .sort_values("event_type")
        .reset_index(drop=True)
    )


def customer_loo_encoding(sf_dir: str) -> pd.DataFrame:
    """LEAVE-ONE-OUT TARGET ENCODING of the customer market segment
    against account balance — the leakage-safe categorical encoder for
    model training (each row's encoded value excludes its OWN target:
    (S_seg − x_i)/(n_seg − 1)).

    Scale shape: per-batch (segment, n, Σbal_e2) combiners fold to a
    ≤|segments| table, broadcast once; the encode pass is stateless and
    streaming (zero shuffles — the classic broadcast-small-side shape).
    Integer e2 balances end-to-end; the division replicates the
    oracle's float expression."""
    cust = rd.read_parquet(
        _t(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment", "c_acctbal"]
    )

    _schema = pa.schema(
        [("c_mktsegment", pa.string()), ("n", pa.int64()), ("s", pa.int64())]
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        x = np.floor(df["c_acctbal"].to_numpy() * 100.0 + 0.5).astype("int64")
        g = pd.DataFrame({"c_mktsegment": df["c_mktsegment"], "n": 1, "s": x}).groupby(
            "c_mktsegment", as_index=False
        ).sum()
        return pa.Table.from_pandas(g, preserve_index=False, schema=_schema)

    parts = cust.map_batches(partial, batch_format="pyarrow").to_pandas()
    agg = parts.groupby("c_mktsegment", as_index=False)[["n", "s"]].sum()
    seg_n = dict(zip(agg["c_mktsegment"], agg["n"].astype(int)))
    seg_s = dict(zip(agg["c_mktsegment"], agg["s"].astype(int)))

    def encode(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        x = np.floor(df["c_acctbal"].to_numpy() * 100.0 + 0.5).astype("int64")
        n = df["c_mktsegment"].map(seg_n).to_numpy(dtype="int64")
        s = df["c_mktsegment"].map(seg_s).to_numpy(dtype="int64")
        # LOO mean in dollars, e6-rounded: (S−x)/(n−1) is e2 dollars → ×1e4
        loo = np.floor((s - x).astype("float64") / (n - 1) * 1e4 + 0.5).astype("int64")
        return pa.table(
            {
                "c_custkey": batch["c_custkey"],
                "c_mktsegment": batch["c_mktsegment"],
                "loo_e6": pa.array(loo, pa.int64()),
            }
        )

    return (
        cust.map_batches(encode, batch_format="pyarrow")
        .to_pandas()
        .sort_values("c_custkey")
        .reset_index(drop=True)
    )


def nb_lang_predict(sf_dir: str) -> pd.DataFrame:
    """MULTINOMIAL NAIVE BAYES language classifier — distributed
    GENERATIVE-MODEL TRAINING (count-based MLE with Laplace smoothing)
    + broadcast model scoring, the supervised sibling of the heuristic
    :func:`langid` and the discriminative :func:`orders_urgent_logreg`.

    Train: per-(lang, token) counts via one vocabulary-bounded exchange
    (the same reduction BPE/tf-idf use); log-probabilities are frozen
    to e6 INTEGERS (floor(ln((c+1)/(tot+V))·1e6+0.5)) so document
    scores are exact integer sums — order-free, bit-equal to the
    oracle regardless of summation order.  Predict: model broadcast
    once; each batch tokenizes in Arrow, maps tokens to vocab codes via
    searchsorted, and accumulates the (doc × lang) score matrix with
    one np.add.at — no per-row Python.  Ties break on the smaller
    lang."""
    docs = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "lang", "text"])

    _schema = pa.schema(
        [("lang", pa.string()), ("token", pa.string()), ("c", pa.int64())]
    )

    def count_partial(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch["text"], pattern=" ")
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks).to_pandas()
        langs = batch["lang"].to_pandas()
        df = pd.DataFrame(
            {"lang": np.repeat(langs.to_numpy(), lens), "token": flat}
        )
        df = df[df["token"] != ""]
        g = df.groupby(["lang", "token"], as_index=False).agg(c=("token", "size"))
        return pa.Table.from_pandas(g, preserve_index=False, schema=_schema)

    lc = (
        docs.map_batches(count_partial, batch_format="pyarrow")
        .groupby(["lang", "token"])
        .sum("c")
        .to_pandas()
        .rename(columns={"sum(c)": "c"})
    )  # ≤ |langs|·|vocab| rows — vocabulary-bounded

    # doc counts per lang (priors) — tiny combiner
    nd = (
        docs.map_batches(
            lambda b: pa.table(
                {"lang": b["lang"], "d": pa.array(np.ones(b.num_rows, dtype="int64"))}
            ),
            batch_format="pyarrow",
        )
        .groupby("lang")
        .sum("d")
        .to_pandas()
        .rename(columns={"sum(d)": "d"})
        .sort_values("lang")
    )
    langs = nd["lang"].tolist()
    n_docs = int(nd["d"].sum())
    prior = {
        l: int(np.floor(np.log(float(d) / n_docs) * 1e6 + 0.5))
        for l, d in zip(nd["lang"], nd["d"].astype(int))
    }

    vocab = np.sort(lc["token"].unique())
    vv = len(vocab)
    tot = lc.groupby("lang")["c"].sum().to_dict()
    # lp[token_code, lang_idx] = e6 integer log P(token | lang), smoothed
    lp = np.zeros((vv, len(langs)), dtype="int64")
    for j, l in enumerate(langs):
        c = np.zeros(vv, dtype="int64")
        sub = lc[lc["lang"] == l]
        c[np.searchsorted(vocab, sub["token"].to_numpy())] = sub["c"].to_numpy()
        tl = int(tot.get(l, 0))
        lp[:, j] = np.floor(
            np.log((c + 1).astype("float64") / (tl + vv)) * 1e6 + 0.5
        ).astype("int64")
    prior_vec = np.array([prior[l] for l in langs], dtype="int64")
    lang_arr = np.array(langs)

    import ray

    model_ref = ray.put((vocab, lp, prior_vec, lang_arr))

    def score(batch: pa.Table, _ref=model_ref) -> pa.Table:
        voc, lpm, pv, la = ray.get(_ref)
        toks = pc.split_pattern(batch["text"], pattern=" ")
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(np.arange(batch.num_rows), lens)
        keep = flat != ""
        flat, doc_idx = flat[keep], doc_idx[keep]
        codes = np.searchsorted(voc, flat)
        scores = np.tile(pv, (batch.num_rows, 1))  # priors
        np.add.at(scores, doc_idx, lpm[codes])
        best = np.argmax(scores, axis=1)  # first (lex-smallest lang) wins ties
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "lang": batch["lang"],
                "pred": pa.array(la[best]),
                "score": pa.array(scores[np.arange(len(best)), best], pa.int64()),
            }
        )

    return (
        docs.map_batches(score, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def events_decision_stump(sf_dir: str) -> pd.DataFrame:
    """DECISION-STUMP TRAINING (the CART/C4.5 split-search kernel): for
    each event type, the best one-vs-rest value threshold "v ≤ t" by
    variance reduction (equivalently, maximizing Σ c²/n over the two
    children — the Gini/Brier split criterion for a binary target).
    This is the histogram-based split search real distributed
    tree-learners (XGBoost/LightGBM-style) run per feature.

    Exactness contract: child counts (cL, nL) are exact integers from
    the domain-bounded value histogram; the split score replicates the
    oracle's float expression; ties break on the smaller threshold.

    Scale shape: rides :func:`_event_value_hist` — per-batch (type,
    v_e2) count combiners, ONE exchange bounded by the value DOMAIN;
    the split scan is two cumsums over ≤|domain| rows on the driver
    (exactly how histogram-split tree learners bound their exchange by
    #bins, not #rows)."""
    hist = _event_value_hist(sf_dir)
    piv = (
        hist.pivot_table(index="v_e2", columns="event_type", values="n",
                         aggfunc="sum", fill_value=0)
        .sort_index()
    )
    vals = piv.index.to_numpy(dtype="int64")
    tv = piv.to_numpy(dtype="int64").sum(axis=1)
    nl = np.cumsum(tv)  # rows with v <= vals[i]
    n_tot = int(nl[-1])
    keep = nl < n_tot  # both children non-empty
    out = []
    for et in sorted(piv.columns):
        cl = np.cumsum(piv[et].to_numpy(dtype="int64"))
        ct = int(cl[-1])
        cL = cl[keep]
        nL = nl[keep]
        cR = ct - cL
        nR = n_tot - nL
        score = (cL.astype("float64") * cL) / nL + (cR.astype("float64") * cR) / nR
        i = int(np.argmax(score))  # first max -> smallest threshold
        out.append((et, int(vals[keep][i]), int(nL[i]), int(cL[i]),
                    int(np.floor(score[i] * 1e6 + 0.5))))
    return pd.DataFrame(
        out, columns=["event_type", "threshold_e2", "n_left", "pos_left",
                      "score_e6"]
    )


def events_gbm_stumps(sf_dir: str, rounds: int = 5) -> pd.DataFrame:
    """GRADIENT-BOOSTED STUMP TRAINING (histogram GBM — the
    XGBoost/LightGBM approximate split-finding loop, Chen & Guestrin
    2016 / Ke et al. 2017): ``rounds`` squared-loss boosting rounds of
    one-split trees over two binned features (value e2, hour-of-day)
    predicting the binary target ``event_type == 'purchase'``.

    Per round: the ensemble-so-far broadcasts into one ``map_batches``
    pass over events, which (a) reconstructs every row's current score
    F(x) by replaying the broadcast stumps (vectorized), (b) forms the
    integer residual r = y·1e9 − F, and (c) emits per-(feature, bin)
    partials (n, Σr) — a combiner, so the exchange is bounded by the
    BIN DOMAIN (|v_e2 domain| + 24), never the row count.  The driver
    closes the round with two cumsum scans (the histogram split search)
    and picks the (feature, threshold) maximizing the variance-reduction
    score SL²/nL + SR²/nR; leaf values are lr=½ of the child residual
    mean, floored to e9 integers.

    Exactness contract: y, F, and r are int64 e9 units end-to-end, so
    every Σr is an order-free integer sum ⇒ bit-identical models across
    runs, batch layouts, and cluster sizes.  Rows-only driver check
    (iterative training); tests pin an exact single-process numpy
    replay, loss monotonicity, and accuracy > majority-class.

    Returns one row per boosting round:
    (round, feature, threshold, left_e9, right_e9).
    """
    from .dedup import coarse_buckets

    ev = rd.read_parquet(_t(sf_dir, "events"), columns=["event_type", "value", "ts"])
    nb = coarse_buckets(ev.count(), rows_per_task=65536)
    E9 = np.int64(1_000_000_000)

    # round 0 base score: exact integer mean of y in e9 units
    def base_partial(batch: pa.Table) -> pa.Table:
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        return pa.table({"pos": [int((et == "purchase").sum())],
                         "n": [len(et)]})

    tot = (
        ev.map_batches(base_partial, batch_format="pyarrow")
        .sum(["pos", "n"])
    )
    pos_tot, n_tot = int(tot["sum(pos)"]), int(tot["sum(n)"])
    if n_tot == 0:
        return pd.DataFrame({c: pd.Series(dtype="int64" if c != "feature" else object)
                             for c in ["round", "feature", "threshold",
                                       "left_e9", "right_e9"]})
    base_e9 = (pos_tot * int(E9)) // n_tot

    hist_schema = pa.schema([("f", pa.int8()), ("bin", pa.int64()),
                             ("n", pa.int64()), ("s", pa.int64()),
                             ("__b", pa.int64())])
    stumps: list[tuple[int, int, int, int]] = []  # (f, thr, left_e9, right_e9)

    def _features(df: pd.DataFrame):
        v = np.floor(df["value"].to_numpy() * 100.0 + 0.5).astype("int64")
        h = df["ts"].dt.hour.to_numpy().astype("int64")
        return v, h

    def _score(v: np.ndarray, h: np.ndarray, model) -> np.ndarray:
        F = np.full(len(v), base_e9, dtype=np.int64)
        for f, thr, lv, rv in model:
            x = v if f == 0 else h
            F += np.where(x <= thr, np.int64(lv), np.int64(rv))
        return F

    for _ in range(rounds):
        model = tuple(stumps)  # rebound, picklable, broadcast via closure

        def resid_hist(batch: pa.Table, _model=model) -> pa.Table:
            df = batch.to_pandas()
            v, h = _features(df)
            y = (df["event_type"].to_numpy() == "purchase").astype(np.int64) * E9
            r = y - _score(v, h, _model)
            parts = []
            for f, x in ((0, v), (1, h)):
                g = pd.DataFrame({"bin": x, "r": r}).groupby("bin")
                agg = g["r"].agg(["size", "sum"]).reset_index()
                parts.append(pd.DataFrame({
                    "f": np.int8(f), "bin": agg["bin"].astype("int64"),
                    "n": agg["size"].astype("int64"),
                    "s": agg["sum"].astype("int64"),
                }))
            out = pd.concat(parts, ignore_index=True)
            out["__b"] = ((out["bin"] * 2 + out["f"]) % nb).astype("int64")
            return pa.Table.from_pandas(out, preserve_index=False,
                                        schema=hist_schema)

        def hist_sum(g: pd.DataFrame) -> pd.DataFrame:
            return g.groupby(["f", "bin"], as_index=False)[["n", "s"]].sum()

        hist = (
            ev.map_batches(resid_hist, batch_format="pyarrow")
            .groupby("__b")
            .map_groups(hist_sum, batch_format="pandas")
            .to_pandas()
        )
        best = None  # (score, f, thr, SL, nL, SR, nR) — max score, tie → smaller (f, thr)
        for f in (0, 1):
            hf = hist[hist["f"] == f].sort_values("bin")
            bins = hf["bin"].to_numpy()
            nL = np.cumsum(hf["n"].to_numpy())
            sL = np.cumsum(hf["s"].to_numpy())
            keep = nL < n_tot
            if not keep.any():
                continue
            nl, sl = nL[keep], sL[keep]
            nr, sr = n_tot - nl, int(sL[-1]) - sl
            sc = (sl.astype("float64") ** 2) / nl + (sr.astype("float64") ** 2) / nr
            i = int(np.argmax(sc))  # first max ⇒ smallest threshold
            cand = (float(sc[i]), -f, -int(bins[keep][i]),
                    int(sl[i]), int(nl[i]), int(sr[i]), int(nr[i]))
            if best is None or cand[:3] > best[:3]:
                best = cand
        if best is None:
            break
        _, nf, nthr, SL, nL_, SR, nR_ = best
        f, thr = -nf, -nthr
        left = SL // (2 * nL_)   # lr = 1/2, floor division — exact ints
        right = SR // (2 * nR_)
        stumps.append((f, thr, left, right))

    return pd.DataFrame(
        [(i, "v_e2" if f == 0 else "hour", thr, lv, rv)
         for i, (f, thr, lv, rv) in enumerate(stumps)],
        columns=["round", "feature", "threshold", "left_e9", "right_e9"],
    ).astype({"round": "int64", "threshold": "int64",
              "left_e9": "int64", "right_e9": "int64"})


def isotonic_fit(v: np.ndarray, n: np.ndarray, s: np.ndarray):
    """Pool-Adjacent-Violators (Ayer et al. 1955) over a weighted value
    histogram, EXACT: pools carry integer (n, s) and the violator test
    compares means as cross-multiplied integers (s1·n2 > s2·n1), so the
    fit is platform- and order-exact.  Inputs must be sorted by v.
    Returns (v, fitted_e9) with fitted_e9 = floor(pool_s·1e9 / pool_n)
    — non-decreasing by construction."""
    pools: list[list[int]] = []  # [n, s, count_of_bins]
    for i in range(len(v)):
        pools.append([int(n[i]), int(s[i]), 1])
        # merge while the previous pool's mean exceeds the last's
        while len(pools) > 1 and pools[-2][1] * pools[-1][0] > pools[-1][1] * pools[-2][0]:
            n2, s2, c2 = pools.pop()
            pools[-1][0] += n2
            pools[-1][1] += s2
            pools[-1][2] += c2
    fitted = np.empty(len(v), dtype=np.int64)
    j = 0
    for pn, ps, pc in pools:
        fitted[j:j + pc] = (ps * 1_000_000_000) // pn
        j += pc
    return fitted


def events_isotonic_calibration(sf_dir: str) -> pd.DataFrame:
    """ISOTONIC CALIBRATION (PAVA — the monotone probability-calibration
    curve classifiers are post-processed with): fit the best
    non-decreasing estimate of P(event_type = 'purchase' | value) in
    least squares, over the integer e2 value domain.

    Scale shape: ONE domain-bounded exchange — per-batch (v_e2 →
    (n, n_purchase)) combiners, bucket-summed exactly like
    :func:`_event_value_hist`; the PAVA sweep itself runs on the driver
    over ≤|domain| pools (linear time, integer arithmetic), which is
    how isotonic fits stay exact at any row count: rows reduce to the
    bin histogram before anything leaves the cluster.

    Rows-only driver check (PAVA's sequential pooling is not
    SQL-expressible); tests pin an exact brute replay, verify
    monotonicity, pool-mean preservation, and the least-squares
    optimality KKT condition on the pooled solution.

    Returns (v_e2, n, fitted_e9) sorted by v_e2."""
    from .dedup import coarse_buckets

    ev = rd.read_parquet(_t(sf_dir, "events"), columns=["event_type", "value"])
    nb = coarse_buckets(ev.count(), rows_per_task=65536)
    schema = pa.schema([("v_e2", pa.int64()), ("n", pa.int64()),
                        ("s", pa.int64()), ("__b", pa.int64())])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["v_e2"] = np.floor(df["value"].to_numpy() * 100.0 + 0.5).astype("int64")
        df["y"] = (df["event_type"].to_numpy() == "purchase").astype("int64")
        g = df.groupby("v_e2", as_index=False).agg(n=("y", "size"), s=("y", "sum"))
        g["__b"] = (g["v_e2"].to_numpy() % nb).astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False, schema=schema)

    def hsum(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("v_e2", as_index=False)[["n", "s"]].sum()

    hist = (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(hsum, batch_format="pandas")
        .to_pandas()
        .sort_values("v_e2")
        .reset_index(drop=True)
    )
    if hist.empty:
        return pd.DataFrame({"v_e2": pd.Series(dtype="int64"),
                             "n": pd.Series(dtype="int64"),
                             "fitted_e9": pd.Series(dtype="int64")})
    fitted = isotonic_fit(hist["v_e2"].to_numpy(), hist["n"].to_numpy(),
                          hist["s"].to_numpy())
    return pd.DataFrame({"v_e2": hist["v_e2"], "n": hist["n"],
                         "fitted_e9": fitted})


def _tdiv(a: int, b: int) -> int:
    """Integer division truncating toward zero — DuckDB's ``//``
    semantics (Python's ``//`` floors), so oracle comparisons of
    negative rationals are exact."""
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q


def events_type_regression(sf_dir: str) -> pd.DataFrame:
    """GROUPED OLS REGRESSION (the SQL ``regr_slope``/``regr_intercept``
    family): per event type, the least-squares line of value-e2 on
    hour-of-day, computed EXACTLY from five integer moments per group
    (n, Σx, Σy, Σxy, Σx²) — the classic one-pass mergeable-moments
    shape: per-batch combiners, one |types|-bounded exchange, and the
    closed form evaluated on the driver in arbitrary-precision ints
    (slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²)), shipped as
    truncate-toward-zero e9 integers so the DuckDB oracle (HUGEINT
    arithmetic, same truncation) matches hash-exactly.

    Returns (event_type, n, slope_e9, intercept_e9) sorted by type."""
    ev = rd.read_parquet(_t(sf_dir, "events"), columns=["event_type", "value", "ts"])

    schema = pa.schema([("event_type", pa.string()), ("n", pa.int64()),
                        ("sx", pa.int64()), ("sy", pa.int64()),
                        ("sxy", pa.int64()), ("sxx", pa.int64())])

    def moments(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        x = df["ts"].dt.hour.to_numpy().astype("int64")
        y = np.floor(df["value"].to_numpy() * 100.0 + 0.5).astype("int64")
        g = pd.DataFrame({"event_type": df["event_type"], "x": x, "y": y,
                          "xy": x * y, "xx": x * x})
        agg = g.groupby("event_type", as_index=False).agg(
            n=("x", "size"), sx=("x", "sum"), sy=("y", "sum"),
            sxy=("xy", "sum"), sxx=("xx", "sum"))
        return pa.Table.from_pandas(agg, preserve_index=False, schema=schema)

    mom = (
        ev.map_batches(moments, batch_format="pyarrow")
        .groupby("event_type")
        .sum(["n", "sx", "sy", "sxy", "sxx"])
        .to_pandas()
    )
    mom.columns = [c.replace("sum(", "").replace(")", "") for c in mom.columns]
    rows = []
    for _, r in mom.sort_values("event_type").iterrows():
        n, sx, sy, sxy, sxx = (int(r["n"]), int(r["sx"]), int(r["sy"]),
                               int(r["sxy"]), int(r["sxx"]))
        num = n * sxy - sx * sy
        den = n * sxx - sx * sx
        if den == 0:
            slope = 0
            intercept = _tdiv(sy * 1_000_000_000, n)
        else:
            slope = _tdiv(num * 1_000_000_000, den)
            intercept = _tdiv((sy * den - num * sx) * 1_000_000_000, n * den)
        rows.append((r["event_type"], n, slope, intercept))
    return pd.DataFrame(
        rows, columns=["event_type", "n", "slope_e9", "intercept_e9"]
    ).astype({"n": "int64", "slope_e9": "int64", "intercept_e9": "int64"})


def events_hbos_outliers(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """HISTOGRAM-BASED OUTLIER SCORING (HBOS, Goldstein & Dengel 2012)
    with an INTEGER rarity score: an event is anomalous when both its
    value bin and its hour bin are rare, scored by the exact product
    f_value · f_hour of the two global bin frequencies (smaller =
    more anomalous — the integer-exact monotone transform of the usual
    Σ log(1/f) score for two features).

    Scale shape: TWO domain-bounded histogram reduces (value e2 domain,
    24 hours) broadcast back into ONE streaming scoring pass with a
    per-batch partial bottom-k — no row ever shuffles; the driver
    merges O(k · batches) candidates.  Fully integer ⇒ oracle-exact.

    Returns the ``k`` most anomalous rows
    (event_id, v_e2, hour, f_v, f_h, rarity), rarity ASC, event_id ASC.
    """
    import ray

    from .dedup import coarse_buckets

    ev = rd.read_parquet(_t(sf_dir, "events"), columns=["event_id", "value", "ts"])
    nb = coarse_buckets(ev.count(), rows_per_task=65536)

    vh_schema = pa.schema([("v_e2", pa.int64()), ("n", pa.int64()),
                           ("__b", pa.int64())])

    def v_partial(batch: pa.Table) -> pa.Table:
        v = np.floor(batch["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
                     ).astype("int64")
        u, c = np.unique(v, return_counts=True)
        return pa.Table.from_arrays(
            [pa.array(u), pa.array(c.astype("int64")), pa.array(u % nb)],
            schema=vh_schema)

    def v_sum(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("v_e2", as_index=False)["n"].sum()

    vhist = (
        ev.map_batches(v_partial, batch_format="pyarrow")
        .groupby("__b").map_groups(v_sum, batch_format="pandas")
        .to_pandas()
    )

    def h_partial(batch: pa.Table) -> pa.Table:
        h = batch["ts"].to_pandas().dt.hour.to_numpy().astype("int64")
        u, c = np.unique(h, return_counts=True)
        return pa.table({"hour": u, "n": c.astype("int64")})

    hhist = (
        ev.map_batches(h_partial, batch_format="pyarrow")
        .to_pandas().groupby("hour", as_index=False)["n"].sum()
    )  # 24-row partial table — driver sum is the combiner's tiny tail

    v_keys = vhist["v_e2"].to_numpy(dtype="int64")
    v_cnts = vhist["n"].to_numpy(dtype="int64")
    vo = np.argsort(v_keys)
    v_keys, v_cnts = v_keys[vo], v_cnts[vo]
    h_cnt = np.zeros(24, dtype=np.int64)
    h_cnt[hhist["hour"].to_numpy()] = hhist["n"].to_numpy()
    ref = ray.put((v_keys, v_cnts, h_cnt))

    out_schema = pa.schema([("event_id", pa.int64()), ("v_e2", pa.int64()),
                            ("hour", pa.int64()), ("f_v", pa.int64()),
                            ("f_h", pa.int64()), ("rarity", pa.int64())])

    def score(batch: pa.Table, _ref=ref, _k=k) -> pa.Table:
        vk, vc, hc = ray.get(_ref)
        df = batch.to_pandas()
        v = np.floor(df["value"].to_numpy() * 100.0 + 0.5).astype("int64")
        h = df["ts"].dt.hour.to_numpy().astype("int64")
        fv = vc[np.searchsorted(vk, v)]
        fh = hc[h]
        rarity = fv * fh
        order = np.lexsort((df["event_id"].to_numpy(), rarity))[:_k]
        return pa.Table.from_arrays(
            [pa.array(df["event_id"].to_numpy()[order]),
             pa.array(v[order]), pa.array(h[order]),
             pa.array(fv[order]), pa.array(fh[order]),
             pa.array(rarity[order])],
            schema=out_schema)

    cand = ev.map_batches(score, batch_format="pyarrow").to_pandas()
    out = cand.sort_values(["rarity", "event_id"]).head(k).reset_index(drop=True)
    return out.astype({c: "int64" for c in out.columns})


def token_cms_counts(
    sf_dir: str,
    probe: tuple = ("the", "a", "of", "to", "data", "table", "scan", "merge"),
    d: int = 4,
    w: int = 2048,
) -> pd.DataFrame:
    """COUNT-MIN SKETCH token frequencies (Cormode & Muthukrishnan
    2005) with the sketch's own CERTIFIED error bound in-band: ONE
    streaming pass builds a d×w counter sketch per batch (vectorized
    over the batch's value_counts — per-unique-token hashing, not
    per-occurrence) and sketches merge by elementwise sum — an exact
    combiner, so only d·w·8 = 64 KB moves per batch no matter the
    vocabulary or row count.  Point estimates for the ``probe`` tokens
    come off the merged sketch; ``bound`` = N·e/w is the classic
    per-row Markov bound the tests assert as a hard sandwich
    (exact ≤ est ≤ exact + bound, the left inequality deterministic).

    Rows-only driver check (a sketch estimate has no SQL equal); tests
    pin the sandwich against exact pandas recounts plus merge
    order-independence.

    Returns (token, est_n, n_total, bound) per probe token."""
    from ..functions.hashing import fingerprint64
    from ..functions.sketch import CountMinSketch

    docs = rd.read_parquet(_t(sf_dir, "documents"), columns=["text"])

    def cms_partial(batch: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern(batch["text"], pattern=" "))
        toks = toks.filter(pc.not_equal(toks, ""))
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        vc = pc.value_counts(toks)
        uniq = vc.field("values").to_pylist()
        cnts = vc.field("counts").to_numpy(zero_copy_only=False).astype("int64")
        sk = CountMinSketch(d, w)
        if uniq:
            hashes = np.array([fingerprint64(t) for t in uniq], dtype=np.uint64)
            sk.add_hashes(hashes, cnts)
        return pa.table({"sketch": pa.array([sk.to_bytes()], pa.binary()),
                         "n": pa.array([int(cnts.sum())], pa.int64())})

    parts = docs.map_batches(cms_partial, batch_format="pyarrow").to_pandas()
    merged = CountMinSketch(d, w)
    n_total = 0
    for _, r in parts.iterrows():
        merged = merged.merge(CountMinSketch.from_bytes(r["sketch"]))
        n_total += int(r["n"])
    ph = np.array([fingerprint64(t) for t in probe], dtype=np.uint64)
    est = merged.query_hashes(ph)
    bound = int(np.ceil(n_total * np.e / w))
    return pd.DataFrame({
        "token": list(probe),
        "est_n": est.astype("int64"),
        "n_total": np.int64(n_total),
        "bound": np.int64(bound),
    })


def _textrank_edges(sf_dir: str, min_len: int = 4) -> pd.DataFrame:
    """Distributed token co-occurrence edge build for TextRank:
    per-batch counts of ADJACENT filtered-token pairs (window 2 over
    tokens of length >= ``min_len``), canonicalized a < b, then one
    coarse-bucket exchange sums them — the shuffled payload is bounded
    by the DISTINCT-pair vocabulary, not token occurrences.  Returns
    (a, b, w) with a < b."""
    from .dedup import coarse_buckets

    docs = rd.read_parquet(_t(sf_dir, "documents"), columns=["text"])
    nb = coarse_buckets(docs.count(), rows_per_task=4096)
    schema = pa.schema([("a", pa.string()), ("b", pa.string()),
                        ("w", pa.int64()), ("__b", pa.int64())])

    def pair_partial(batch: pa.Table) -> pa.Table:
        lst = pc.split_pattern(batch["text"], pattern=" ")
        if isinstance(lst, pa.ChunkedArray):
            lst = lst.combine_chunks()
        toks = lst.values.to_pandas()
        lens = np.diff(lst.offsets.to_numpy(zero_copy_only=False))
        doc = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        keep = toks.str.len().to_numpy() >= min_len
        toks, doc = toks[keep].to_numpy(), doc[keep]
        if len(toks) < 2:
            return pa.Table.from_pandas(
                pd.DataFrame({"a": [], "b": [], "w": [], "__b": []}),
                preserve_index=False, schema=schema)
        same = doc[:-1] == doc[1:]
        u, v = toks[:-1][same], toks[1:][same]
        lo = np.minimum(u, v)
        hi = np.maximum(u, v)
        g = (pd.DataFrame({"a": lo, "b": hi})
             .groupby(["a", "b"], as_index=False).size()
             .rename(columns={"size": "w"}))
        g = g[g["a"] != g["b"]]  # self-loops carry no rank
        # seed-stable bucket key (PYTHONHASHSEED varies across workers;
        # the same pair MUST route to one bucket or its counts split)
        key = pd.util.hash_array((g["a"] + "\x1f" + g["b"]).to_numpy())
        g["__b"] = (key % np.uint64(nb)).astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False, schema=schema)

    def pair_sum(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["a", "b"], as_index=False)["w"].sum()

    return (
        docs.map_batches(pair_partial, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(pair_sum, batch_format="pandas")
        .to_pandas()
    )


def textrank_keywords(sf_dir: str, k: int = 25, iters: int = 10,
                      damping: float = 0.85, min_len: int = 4) -> pd.DataFrame:
    """TEXTRANK keyword extraction (Mihalcea & Tarau, EMNLP 2004):
    PageRank over the corpus-level token co-occurrence graph (window 2,
    tokens of length >= ``min_len``), returning the top-``k`` keywords.

    Scale shape: the edge build is a per-batch pair-count combiner +
    ONE vocabulary-bounded exchange (:func:`_textrank_edges`); the rank
    loop is the shared integer-e9 PageRank core (edges pinned, only the
    |vocab|-bounded rank table moves per iteration — the fits-a-heap
    assumption host_pagerank documents, same bucketed fallback past
    it).  Undirected co-occurrence feeds the directed core as two
    opposite arcs of equal weight.  Fully integer ⇒ platform-exact.

    Rows-only driver check (iterative); tests pin the edge build
    against a per-doc pure-Python replay and the ranking against the
    float power iteration within integer-flooring tolerance.

    Returns (token, rank_e9), rank DESC, token ASC, top-k."""
    from .webpipe import _integer_pagerank

    und = _textrank_edges(sf_dir, min_len=min_len)
    if und.empty:
        return pd.DataFrame({"token": pd.Series(dtype=object),
                             "rank_e9": pd.Series(dtype="int64")})
    both = pd.concat([
        und.rename(columns={"a": "src", "b": "dst"}),
        und.rename(columns={"b": "src", "a": "dst"}),
    ], ignore_index=True)[["src", "dst", "w"]]
    ranks = _integer_pagerank(both, iters=iters, damping=damping)
    out = ranks.rename(columns={"node": "token"}).sort_values(
        ["rank_e9", "token"], ascending=[False, True]).head(k)
    return out.reset_index(drop=True)


def conformal_token_interval(sf_dir: str, alpha_pct: int = 10) -> pd.DataFrame:
    """SPLIT-CONFORMAL PREDICTION (Vovk et al.; Papadopoulos et al.
    2002 — the distribution-free uncertainty wrapper every production
    model stage needs): calibrate a prediction interval for a doc's
    token count predicted by the fixed published rule
    ``pred = n_chars // 6``, using the engine's deterministic val split
    (md5 bucket 8) as the calibration set, and report the held-out
    test-split (bucket 9) coverage.

    q̂ = the ⌈(n_cal+1)·(1−α)⌉-th smallest absolute residual on the
    calibration split — the split-conformal quantile that guarantees
    ≥ 1−α marginal coverage under exchangeability.

    Scale shape: ONE residual-domain-bounded histogram exchange on the
    calibration split (per-batch combiners), the order statistic read
    off the histogram (:func:`order_stat`); test coverage is a second
    streaming counting pass against the broadcast q̂ — no row ever
    shuffles.  Fully integer ⇒ oracle-exact.

    Returns one row: (q_hat, n_cal, n_test, n_covered)."""
    from ..functions.text import split_bucket
    from .dedup import coarse_buckets

    docs = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    nb = coarse_buckets(docs.count(), rows_per_task=65536)

    def _features(batch: pa.Table):
        texts = batch["text"].to_pylist()
        n_chars = np.array([len(t or "") for t in texts], dtype=np.int64)
        n_tokens = np.array(
            [sum(1 for w in (t or "").split(" ") if w) for t in texts],
            dtype=np.int64)
        resid = np.abs(n_tokens - n_chars // 6)
        bucket = split_bucket(batch["doc_id"].to_pylist())
        return resid, bucket

    hist_schema = pa.schema([("r", pa.int64()), ("n", pa.int64()),
                             ("__b", pa.int64())])

    def cal_hist(batch: pa.Table) -> pa.Table:
        resid, bucket = _features(batch)
        r = resid[bucket == 8]
        u, c = np.unique(r, return_counts=True)
        return pa.Table.from_arrays(
            [pa.array(u), pa.array(c.astype("int64")), pa.array(u % nb)],
            schema=hist_schema)

    def hsum(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("r", as_index=False)["n"].sum()

    hist = (
        docs.map_batches(cal_hist, batch_format="pyarrow")
        .groupby("__b").map_groups(hsum, batch_format="pandas")
        .to_pandas().sort_values("r").reset_index(drop=True)
    )
    n_cal = int(hist["n"].sum())
    k = -(-((n_cal + 1) * (100 - alpha_pct)) // 100)  # ceil
    k = min(k, n_cal)  # degenerate tiny-cal guard (q̂ = max residual)
    q_hat = order_stat(hist["r"].to_numpy(), hist["n"].to_numpy(), k)

    def test_cover(batch: pa.Table) -> pa.Table:
        resid, bucket = _features(batch)
        t = resid[bucket == 9]
        return pa.table({"n_test": [int(len(t))],
                         "n_covered": [int((t <= q_hat).sum())]})

    cov = docs.map_batches(test_cover, batch_format="pyarrow").to_pandas().sum()
    return pd.DataFrame({
        "q_hat": [int(q_hat)], "n_cal": [n_cal],
        "n_test": [int(cov["n_test"])], "n_covered": [int(cov["n_covered"])],
    }).astype("int64")


def user_overlap_sketch(sf_dir: str, k: int = 1024) -> pd.DataFrame:
    """THETA/KMV SKETCH SET INTERSECTION (Beyer et al. 2007; the
    DataSketches theta-sketch operation): estimate the number of
    DISTINCT users shared by every pair of event types from k-minimum-
    value sketches — the scale answer when exact distinct-intersections
    would need a full user×type shuffle.

    Per batch: distinct user hashes per type reduce to the k smallest
    (a mergeable combiner — ≤ k·8 bytes per type per batch moves);
    the driver merges per-type KMVs, then estimates each pairwise
    intersection with the standard theta rule: θ = min(θ_A, θ_B),
    est = |{h ∈ A ∩ B : h < θ}| · 2⁶⁴/θ.  Hashes are splitmix64 of the
    user id ⇒ deterministic.

    Rows-only driver check (sketch estimate); tests pin the exact
    pandas intersections within the 1/√k error band plus determinism
    and the merge-order-free combiner property.

    Returns (type_a, type_b, est_n) for type_a < type_b."""
    ev = rd.read_parquet(_t(sf_dir, "events"), columns=["event_type", "user_id"])
    U64 = float(2**64)

    def kmv_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        out_t, out_h = [], []
        for et, g in df.groupby("event_type"):
            h = np.sort(_splitmix64(np.unique(g["user_id"].to_numpy())
                                    .astype(np.uint64)))[:k]
            out_t.append(et)
            out_h.append(h.tobytes())
        return pa.table({"event_type": pa.array(out_t, pa.string()),
                         "kmv": pa.array(out_h, pa.binary())})

    parts = ev.map_batches(kmv_partial, batch_format="pyarrow").to_pandas()
    sketches: dict[str, np.ndarray] = {}
    for _, r in parts.iterrows():
        h = np.frombuffer(r["kmv"], dtype=np.uint64)
        prev = sketches.get(r["event_type"])
        merged = h if prev is None else np.union1d(prev, h)  # distinct+sorted
        sketches[r["event_type"]] = merged[:k]

    types = sorted(sketches)
    rows = []
    for i, a in enumerate(types):
        for b in types[i + 1:]:
            A, B = sketches[a], sketches[b]
            # θ = k-th min of each sketch (the sketch is exact below θ);
            # a sketch with < k entries saw its whole set — θ = 2^64
            th_a = float(A[-1]) if len(A) == k else U64
            th_b = float(B[-1]) if len(B) == k else U64
            theta = min(th_a, th_b)
            common = np.intersect1d(A, B)
            m = int((common < theta).sum()) if theta < U64 else len(common)
            est = int(round(m * U64 / theta)) if theta < U64 else m
            rows.append((a, b, est))
    return pd.DataFrame(rows, columns=["type_a", "type_b", "est_n"]).astype(
        {"est_n": "int64"})


def events_seasonal_decompose(sf_dir: str) -> pd.DataFrame:
    """CLASSICAL ADDITIVE SEASONAL DECOMPOSITION (the moving-average
    method behind STL's ancestor, Macaulay 1931): daily mean value →
    centered 7-day moving-average TREND → day-of-week SEASONAL index
    (mean of the detrended series per weekday) → REMAINDER, all in
    exact integers (daily mean frozen as floor(Σv·1e6/n); seasonal
    means truncate toward zero like the DuckDB oracle's ``//``).

    Scale shape: ONE |days|-bounded exchange (per-batch (day → Σv, n)
    combiners); the decomposition itself walks ≤|days| rows on the
    driver — rows reduce to the daily census before anything moves,
    the same domain-bound contract as the histogram family.

    Returns one row per day with a full 7-day window:
    (day, mean_e6, trend_e6, seasonal_e6, remainder_e6)."""
    from .dedup import coarse_buckets

    ev = rd.read_parquet(_t(sf_dir, "events"), columns=["ts", "value"])
    nb = coarse_buckets(ev.count(), rows_per_task=65536)
    schema = pa.schema([("day", pa.string()), ("s", pa.int64()),
                        ("n", pa.int64()), ("__b", pa.int64())])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["day"] = df["ts"].dt.strftime("%Y-%m-%d")
        df["v"] = np.floor(df["value"].to_numpy() * 100.0 + 0.5).astype("int64")
        g = df.groupby("day", as_index=False).agg(s=("v", "sum"), n=("v", "size"))
        g["__b"] = pd.util.hash_array(g["day"].to_numpy()).astype("int64") % nb
        return pa.Table.from_pandas(g, preserve_index=False, schema=schema)

    def dsum(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("day", as_index=False)[["s", "n"]].sum()

    daily = (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby("__b").map_groups(dsum, batch_format="pandas")
        .to_pandas().sort_values("day").reset_index(drop=True)
    )
    if len(daily) < 7:
        return pd.DataFrame({c: pd.Series(dtype="int64" if c != "day" else object)
                             for c in ["day", "mean_e6", "trend_e6",
                                       "seasonal_e6", "remainder_e6"]})
    m = (daily["s"].to_numpy() * 1_000_000) // daily["n"].to_numpy()
    # centered 7-day MA (floor of the exact integer mean), full windows only
    csum = np.concatenate([[0], np.cumsum(m)])
    trend = (csum[7:] - csum[:-7]) // 7  # trend[i] centers day i+3
    days = daily["day"].to_numpy()
    core = slice(3, len(m) - 3)
    x = m[core] - trend  # detrended
    dts = pd.to_datetime(days[core])
    dow = ((dts.dayofweek.to_numpy() + 1) % 7).astype("int64")  # DuckDB 0=Sun
    sea = np.zeros(7, dtype=np.int64)
    for d in range(7):
        sel = dow == d
        if sel.any():
            sea[d] = _tdiv(int(x[sel].sum()), int(sel.sum()))
    return pd.DataFrame({
        "day": days[core],
        "mean_e6": m[core],
        "trend_e6": trend,
        "seasonal_e6": sea[dow],
        "remainder_e6": x - sea[dow],
    }).astype({c: "int64" for c in ["mean_e6", "trend_e6", "seasonal_e6",
                                    "remainder_e6"]})


def events_cuped_adjust(sf_dir: str) -> pd.DataFrame:
    """CUPED VARIANCE REDUCTION (Deng, Xu, Kohavi & Walker, WSDM 2013 —
    the standard pre-experiment covariate adjustment in A/B analysis):
    per user, X = pre-period value total (days 1–15), Y = post-period
    total; θ = cov(X,Y)/var(X) pooled over all users; each arm
    (user_id % 2) reports its raw and CUPED-adjusted mean
    Ȳ_g − θ·(X̄_g − X̄).

    Scale shape: ONE user-bucket exchange builds the per-user (X, Y)
    table from per-batch combiners; the pooled moments (n, ΣX, ΣY,
    ΣXY, ΣX²) and per-arm sums are EXACT integers reduced from that
    bounded table, and the driver evaluates the closed form in doubles
    with the same expression tree the DuckDB oracle uses ⇒ hash-exact.

    Returns (grp, n_users, mean_y_e6, mean_adj_e6, theta_e6) per arm."""
    from .dedup import coarse_buckets

    ev = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["user_id", "ts", "value"])
    nb = coarse_buckets(ev.count(), rows_per_task=65536)
    schema = pa.schema([("user_id", pa.int64()), ("x", pa.int64()),
                        ("y", pa.int64()), ("__b", pa.int64())])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        v = np.floor(df["value"].to_numpy() * 100.0 + 0.5).astype("int64")
        pre = df["ts"].dt.day.to_numpy() <= 15
        g = pd.DataFrame({"user_id": df["user_id"],
                          "x": np.where(pre, v, 0),
                          "y": np.where(pre, 0, v)})
        agg = g.groupby("user_id", as_index=False)[["x", "y"]].sum()
        agg["__b"] = (agg["user_id"].to_numpy() % nb).astype("int64")
        return pa.Table.from_pandas(agg, preserve_index=False, schema=schema)

    def usum(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("user_id", as_index=False)[["x", "y"]].sum()

    users = (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby("__b").map_groups(usum, batch_format="pandas")
        .to_pandas()
    )
    x = users["x"].to_numpy(dtype="int64")
    y = users["y"].to_numpy(dtype="int64")
    n = len(users)
    sx, sy = int(x.sum()), int(y.sum())
    sxy, sxx = int((x * y).sum()), int((x * x).sum())
    den = n * sxx - sx * sx
    theta = float(n * sxy - sx * sy) / float(den) if den else 0.0
    gx = float(sx) / float(n)
    rows = []
    for grp in (0, 1):
        sel = (users["user_id"].to_numpy() % 2) == grp
        ng = int(sel.sum())
        if ng == 0:
            rows.append((grp, 0, 0, 0, int(np.floor(theta * 1e6 + 0.5))))
            continue
        sxg, syg = int(x[sel].sum()), int(y[sel].sum())
        mean_y = float(syg) / float(ng)
        mean_adj = mean_y - theta * (float(sxg) / float(ng) - gx)
        rows.append((grp, ng,
                     int(np.floor(mean_y * 1e6 + 0.5)),
                     int(np.floor(mean_adj * 1e6 + 0.5)),
                     int(np.floor(theta * 1e6 + 0.5))))
    return pd.DataFrame(
        rows, columns=["grp", "n_users", "mean_y_e6", "mean_adj_e6", "theta_e6"]
    ).astype("int64")


def _ed1(a: str, b: str) -> bool:
    """Exact edit-distance-1 test (substitution / single insert-delete;
    the FastSS verify kernel — O(len), no DP table)."""
    la, lb = len(a), len(b)
    if la == lb:
        return sum(1 for x, y in zip(a, b) if x != y) == 1
    if abs(la - lb) != 1:
        return False
    if la > lb:
        a, b, la, lb = b, a, lb, la
    # a is shorter: b must equal a with one char inserted
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1:]


def token_typo_pairs(sf_dir: str) -> pd.DataFrame:
    """STRING-SIMILARITY SELF-JOIN at edit distance 1 via DELETION
    NEIGHBORHOODS (FastSS, Bocek et al. 2007 — the signature scheme
    that makes fuzzy joins scale: a string emits itself plus its
    |t| single-deletion variants as join keys; two strings are within
    one edit IFF they share a key, so candidate generation is an
    EQUI-join, never a quadratic scan), over the distinct customer
    names (the digit-structured key space where one-typo collisions
    actually live).

    Scale shape: distinct names reduce vocabulary-bounded (per-batch
    unique + one seed-stable name-bucket exchange); each name then
    emits |t|+1 keys into ONE key-bucket exchange; per key the
    candidate pairs enumerate via np.triu over the (tiny — names
    agreeing everywhere but the deleted position) key group and verify
    with the exact O(len) kernel before anything leaves the task; only
    verified pairs (deduped across shared keys) reach the driver —
    output-sized, never candidate-sized.

    Oracle-exact vs DuckDB ``levenshtein(a, b) = 1`` over the same
    distinct-name set (FastSS covers exactly the substitution /
    single-indel pairs Levenshtein-1 admits).

    Returns (tok_a, tok_b) with tok_a < tok_b, sorted."""
    from .dedup import coarse_buckets

    cust = rd.read_parquet(_t(sf_dir, "customer"), columns=["c_name"])
    nb = coarse_buckets(cust.count(), rows_per_task=4096)

    tok_schema = pa.schema([("t", pa.string()), ("__b", pa.int64())])

    def tok_partial(batch: pa.Table) -> pa.Table:
        s = batch["c_name"].to_pandas().drop_duplicates()
        key = pd.util.hash_array(s.to_numpy())
        return pa.Table.from_pandas(
            pd.DataFrame({"t": s, "__b": (key % np.uint64(nb)).astype("int64")}),
            preserve_index=False, schema=tok_schema)

    def tok_distinct(g: pd.DataFrame) -> pd.DataFrame:
        return g[["t"]].drop_duplicates()

    toks = (
        cust.map_batches(tok_partial, batch_format="pyarrow")
        .groupby("__b").map_groups(tok_distinct, batch_format="pandas")
    )

    key_schema = pa.schema([("k", pa.string()), ("t", pa.string()),
                            ("__b", pa.int64())])

    def emit_keys(batch: pa.Table) -> pa.Table:
        ks, ts = [], []
        for t in batch["t"].to_pylist():
            ks.append(t)
            ts.append(t)
            for i in range(len(t)):
                ks.append(t[:i] + t[i + 1:])
                ts.append(t)
        df = pd.DataFrame({"k": ks, "t": ts})
        df["__b"] = (pd.util.hash_array(df["k"].to_numpy())
                     % np.uint64(nb)).astype("int64")
        return pa.Table.from_pandas(df, preserve_index=False, schema=key_schema)

    pair_schema = pa.schema([("tok_a", pa.string()), ("tok_b", pa.string())])

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for _, kg in g.groupby("k"):
            u = np.sort(kg["t"].unique())
            if len(u) < 2:
                continue
            ii, jj = np.triu_indices(len(u), k=1)
            for i, j in zip(ii, jj):
                a, b = u[i], u[j]
                if _ed1(a, b):
                    out_a.append(a)
                    out_b.append(b)
        # explicit string dtype: an empty object column would infer a
        # null-typed block and break downstream schema unification
        return pd.DataFrame({"tok_a": pd.Series(out_a, dtype="string"),
                             "tok_b": pd.Series(out_b, dtype="string")}
                            ).drop_duplicates()

    pairs = (
        toks.map_batches(emit_keys, batch_format="pyarrow")
        .groupby("__b").map_groups(pairs_in_bucket, batch_format="pandas")
        .to_pandas()
    )
    if pairs.empty:  # typed empty result (schema-stable for the oracle)
        return pd.DataFrame({"tok_a": pd.Series(dtype=object),
                             "tok_b": pd.Series(dtype=object)})
    # cross-bucket dedup: a pair can surface under several shared keys
    # (different buckets); verified-pair volume is output-sized
    pairs = pairs.drop_duplicates().sort_values(["tok_a", "tok_b"])
    return pairs.reset_index(drop=True)


def token_pmi_collocations(sf_dir: str, k: int = 25, min_count: int = 5,
                           min_len: int = 4) -> pd.DataFrame:
    """COLLOCATION MINING by pointwise mutual information (Church &
    Hanks 1990): rank adjacent token pairs by PMI = ln(p(a,b) /
    (p(a)·p(b))) with a ``min_count`` support floor — the classic
    corpus-statistics operator behind phrase detection
    (word2vec-style "new_york" merging).

    Scale shape: pair counts ride the SAME vocabulary-bounded exchange
    as TextRank (:func:`_textrank_edges`); token marginals are one
    value_counts combiner + a vocabulary-bounded sum; PMI evaluates on
    the driver over ≤|pairs| rows as ln(x) − ln(y) of EXACT integer
    cross-products, the identical double expression the DuckDB oracle
    uses ⇒ hash-exact.

    Returns top-``k`` (tok_a, tok_b, n_pair, pmi_e6), pmi DESC then
    pair ASC."""
    from .dedup import coarse_buckets

    all_pairs = _textrank_edges(sf_dir, min_len=min_len)
    pairs = all_pairs[all_pairs["w"] >= min_count]

    docs = rd.read_parquet(_t(sf_dir, "documents"), columns=["text"])
    nb = coarse_buckets(docs.count(), rows_per_task=4096)
    cnt_schema = pa.schema([("t", pa.string()), ("n", pa.int64()),
                            ("__b", pa.int64())])

    def count_partial(batch: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern(batch["text"], pattern=" "))
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        s = toks.to_pandas()
        s = s[s.str.len() >= min_len]
        vc = s.value_counts()
        df = pd.DataFrame({"t": vc.index, "n": vc.to_numpy().astype("int64")})
        df["__b"] = (pd.util.hash_array(df["t"].to_numpy())
                     % np.uint64(nb)).astype("int64")
        return pa.Table.from_pandas(df, preserve_index=False, schema=cnt_schema)

    def csum(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("t", as_index=False)["n"].sum()

    marg = (
        docs.map_batches(count_partial, batch_format="pyarrow")
        .groupby("__b").map_groups(csum, batch_format="pandas")
        .to_pandas()
    )
    n_tok = int(marg["n"].sum())
    cnt = dict(zip(marg["t"], marg["n"].astype(int)))
    # N_pairs = total ADJACENT pair occurrences = sum of all edge weights
    # BEFORE the support floor (one edge build, reused)
    n_pairs = int(all_pairs["w"].sum())

    rows = []
    for _, r in pairs.iterrows():
        a, b, w = r["a"], r["b"], int(r["w"])
        x = w * n_tok * n_tok
        y = n_pairs * cnt[a] * cnt[b]
        pmi = np.log(float(x)) - np.log(float(y))
        rows.append((a, b, w, int(np.floor(pmi * 1e6 + 0.5))))
    out = pd.DataFrame(rows, columns=["tok_a", "tok_b", "n_pair", "pmi_e6"])
    out = out.sort_values(["pmi_e6", "tok_a", "tok_b"],
                          ascending=[False, True, True]).head(k)
    return out.reset_index(drop=True).astype(
        {"n_pair": "int64", "pmi_e6": "int64"})


def events_anova_f(sf_dir: str) -> pd.DataFrame:
    """ONE-WAY ANOVA F-test of event value across ALL event types — the
    parametric k-group mean-difference test (the k-group extension of
    :func:`welch_ttest`; its nonparametric twin is
    :func:`events_kruskal_wallis`).

    Exactness contract: the per-group moments (n, Σv, Σv²) are EXACT
    integers off the domain-bounded value histogram; the one float
    reduction Σ Sg²/ng folds SEQUENTIALLY in event_type order — the
    oracle's recursive CTE forces the identical add order, so the
    double (and its e6 floor) hash-match bit-for-bit.

    Scale shape: rides the SAME distributed (type, v_e2) histogram as
    the median/quantile/MAD/Mann-Whitney family
    (:func:`_event_value_hist`) — shuffle payload bounded by the value
    DOMAIN, not the row count; the fold runs over k ≤ |types| rows on
    the driver.  No extra data pass."""
    hist = _event_value_hist(sf_dir)
    v = hist["v_e2"].to_numpy(dtype="int64")
    n = hist["n"].to_numpy(dtype="int64")
    hist = hist.assign(s=v * n, q=(v * v) * n)
    m = (
        hist.groupby("event_type", as_index=False)
        .agg(n=("n", "sum"), s=("s", "sum"), q=("q", "sum"))
        .sort_values("event_type")
    )
    k = len(m)
    N = int(m["n"].sum())
    S = int(m["s"].sum())
    Q = int(m["q"].sum())  # python int — no int64 wrap at any sf
    acc = 0.0
    for sg, ng in zip(m["s"], m["n"]):
        # same expression tree as the oracle's CTE step:
        # acc + CAST(s AS DOUBLE) * s / n
        acc = acc + float(sg) * float(sg) / float(ng)
    ssb = acc - float(S) * float(S) / float(N)
    ssw = float(Q) - acc
    f = (ssb / (k - 1)) / (ssw / (N - k))
    return pd.DataFrame(
        {"n_rows": pd.array([N], dtype="int64"),
         "n_groups": pd.array([k], dtype="int64"),
         "f_e6": pd.array([int(np.floor(f * 1e6 + 0.5))], dtype="int64")}
    )


def events_kruskal_wallis(sf_dir: str) -> pd.DataFrame:
    """KRUSKAL-WALLIS H rank test across ALL event types — the k-group
    nonparametric ANOVA (extends :func:`events_mannwhitney` from 2 to k
    samples), tie-corrected.

    Exactness contract: doubled average ranks (2·sm + t + 1) make every
    per-group rank sum R2g an exact integer; the tie term Σ(t³−t) is
    integer; the single float reduction Σ R2g²/ng folds sequentially in
    event_type order, mirrored by the oracle's recursive CTE ⇒
    hash-exact.

    Scale shape: the global value histogram (strictly-smaller counts)
    and the per-group rank sums all derive from ONE domain-bounded
    (type, v_e2) histogram exchange — no sort, no per-row ranks."""
    hist = _event_value_hist(sf_dir)
    # global per-value tie counts + strictly-smaller cumulative
    h = hist.groupby("v_e2", as_index=False)["n"].sum().sort_values("v_e2")
    t = h["n"].to_numpy(dtype="int64")
    sm = np.cumsum(t) - t
    r2_of = dict(zip(h["v_e2"], 2 * sm + t + 1))  # 2·avg_rank per value
    hist = hist.assign(
        r2=hist["n"].to_numpy(dtype="int64")
        * np.array([r2_of[x] for x in hist["v_e2"]], dtype="int64")
    )
    m = (
        hist.groupby("event_type", as_index=False)
        .agg(n=("n", "sum"), r2=("r2", "sum"))
        .sort_values("event_type")
    )
    k = len(m)
    N = int(m["n"].sum())
    tie = int((t * t * t - t).sum())
    acc = 0.0
    for r2g, ng in zip(m["r2"], m["n"]):
        acc = acc + float(r2g) * float(r2g) / float(ng)
    h_unc = 12.0 / (float(N) * float(N + 1)) * (acc / 4.0) - 3.0 * float(N + 1)
    corr = 1.0 - float(tie) / (float(N) * float(N) * float(N) - float(N))
    hstat = h_unc / corr
    return pd.DataFrame(
        {"n_rows": pd.array([N], dtype="int64"),
         "n_groups": pd.array([k], dtype="int64"),
         "h_e6": pd.array([int(np.floor(hstat * 1e6 + 0.5))], dtype="int64")}
    )


def lang_temperature_sample(sf_dir: str, alpha: float = 0.5) -> pd.DataFrame:
    """TEMPERATURE-BASED DATA MIXING (the multilingual-balancing sampler
    from mBERT/XLM-R-style training, Conneau et al. 2020): resample the
    corpus so language i's share follows p_i ∝ n_i^alpha — low-resource
    languages are kept whole while high-resource ones downsample.  The
    per-doc acceptance rate is a_i = (n_min / n_i)^(1 − alpha) (the
    smallest language keeps everything), decided by a DETERMINISTIC
    md5 gate: keep doc iff u32(md5(doc_id)) < floor(a_i · 2^32) — the
    same hash-gate convention as ``doc_split_assign`` /
    ``events_hash_sample``, so the DuckDB oracle replays the draw
    bit-for-bit (seedless, shuffle-order-free).

    Scale shape: pass 1 is a |langs|-bounded count combiner (no
    exchange); thresholds broadcast; pass 2 is one streaming filter —
    zero shuffles end-to-end."""
    import hashlib
    import math

    docs = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "lang"])

    _p = pa.schema([("lang", pa.string()), ("n", pa.int64())])

    def count_partial(batch: pa.Table) -> pa.Table:
        vc = batch["lang"].to_pandas().value_counts()
        return pa.Table.from_pandas(
            pd.DataFrame({"lang": vc.index, "n": vc.to_numpy().astype("int64")}),
            preserve_index=False, schema=_p,
        )

    counts = (
        docs.map_batches(count_partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("lang", as_index=False)["n"].sum()  # ≤ |langs| rows
    )
    n_min = int(counts["n"].min())
    # floor(((n_min/n_i) ** (1-alpha)) * 2^32), identical double expr as
    # the oracle's POWER(CAST(n_min AS DOUBLE)/n, 1-alpha)
    thr = {
        lang: int(math.floor(
            math.pow(float(n_min) / float(n), 1.0 - alpha) * 4294967296.0))
        for lang, n in zip(counts["lang"], counts["n"])
    }

    def gate(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        u32 = np.fromiter(
            (int.from_bytes(
                hashlib.md5(str(i).encode()).digest()[:4], "big")
             for i in df["doc_id"]),
            dtype=np.int64, count=len(df),
        )
        cut = df["lang"].map(thr).to_numpy(dtype="int64")
        return pa.Table.from_pandas(
            df[u32 < cut], preserve_index=False,
            schema=pa.schema([("doc_id", pa.int64()), ("lang", pa.string())]),
        )

    out = docs.map_batches(gate, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _als_init_q(types: list) -> np.ndarray:
    """Deterministic rank-2 item-factor init: two md5-derived uniforms in
    [0.5, 1.5) per type, pre-quantized to e6 so every replica starts from
    the identical integer state."""
    import hashlib

    q = np.empty((len(types), 2), dtype="float64")
    for i, t in enumerate(types):
        d = hashlib.md5(str(t).encode()).digest()
        u0 = int.from_bytes(d[:4], "big") / 4294967296.0
        u1 = int.from_bytes(d[4:8], "big") / 4294967296.0
        q[i] = (0.5 + u0, 0.5 + u1)
    return np.floor(q * 1e6 + 0.5) / 1e6


def user_type_als(
    sf_dir: str, n_iters: int = 4, lam: float = 0.1
) -> pd.DataFrame:
    """MATRIX FACTORIZATION by ALTERNATING LEAST SQUARES (Koren, Bell &
    Volinsky 2009; the Spark-MLlib/implicit-feedback recommender shape):
    factor the user × event-type count matrix into rank-2 user/item
    factors.  Each half-step is a closed-form ridge solve.

    Distributed shape: the (user, type, c) count table is built by ONE
    user-bucket exchange (a user's rows are bucket-complete) and PINNED;
    per iteration the k×2 item-factor matrix broadcasts into a
    map_batches pass that (a) solves every user's 2×2 ridge system
    vectorized, (b) quantizes the user factors to e6, and (c) emits
    per-type integer normal-equation partials (Σ u·uᵀ, Σ c·u as e12/e6
    ints) — int sums are ORDER-FREE, so training is bit-reproducible
    across any partitioning / cluster size, and user factors never
    materialize globally.  The driver re-solves the k item systems from
    the exact integer sums.  Iterative float solve → no SQL oracle
    (rows-only); the twin replays the rule exactly and pins a
    loss-decrease floor."""
    ev = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "event_type"])
    from .dedup import coarse_buckets

    nb = coarse_buckets(ev.count(), rows_per_task=65536)

    _c_schema = pa.schema(
        [("user_id", pa.int64()), ("event_type", pa.string()),
         ("c", pa.int64()), ("__b", pa.int64())]
    )

    def count_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby(["user_id", "event_type"], as_index=False).agg(
            c=("event_type", "size")
        )
        g["__b"] = (g["user_id"].to_numpy() % nb).astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False, schema=_c_schema)

    def sum_counts(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["user_id", "event_type"], as_index=False)["c"].sum()

    counts = (
        ev.map_batches(count_partial, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(sum_counts, batch_format="pandas")
        .materialize()  # |users|·|types|-bounded, pinned across iterations
        # (block layout preserves bucket-completeness: a user's rows
        # never split across blocks, which the per-user solve requires)
    )
    types = sorted(
        counts.groupby("event_type").count().to_pandas()["event_type"]
    )
    t_idx = {t: i for i, t in enumerate(types)}
    k = len(types)
    Q = _als_init_q(types)

    _p_schema = pa.schema(
        [("ti", pa.int64()), ("a00", pa.int64()), ("a01", pa.int64()),
         ("a11", pa.int64()), ("b0", pa.int64()), ("b1", pa.int64())]
    )

    def user_halfstep(df: pd.DataFrame, Qcur: np.ndarray) -> np.ndarray:
        """Solve every user's 2x2 ridge system vectorized; returns the
        e6-quantized user factor aligned to df's rows.  Callers pass df
        pre-sorted by (user_id, event_type) so the per-user float add
        order is layout-independent and the e6 quantization is
        bit-reproducible across any partitioning."""
        ti = df["event_type"].map(t_idx).to_numpy()
        c = df["c"].to_numpy(dtype="float64")
        q = Qcur[ti]  # (rows, 2)
        # per-user A = sum q qT + lam I, b = sum c q (grouped sums)
        uid, inv = np.unique(df["user_id"].to_numpy(), return_inverse=True)
        nA = len(uid)
        a00 = np.bincount(inv, q[:, 0] * q[:, 0], nA) + lam
        a01 = np.bincount(inv, q[:, 0] * q[:, 1], nA)
        a11 = np.bincount(inv, q[:, 1] * q[:, 1], nA) + lam
        b0 = np.bincount(inv, c * q[:, 0], nA)
        b1 = np.bincount(inv, c * q[:, 1], nA)
        det = a00 * a11 - a01 * a01
        u0 = (a11 * b0 - a01 * b1) / det
        u1 = (a00 * b1 - a01 * b0) / det
        U = np.floor(np.stack([u0, u1], axis=1) * 1e6 + 0.5) / 1e6
        return U[inv]

    for _ in range(n_iters):
        Qcur = Q.copy()

        def item_partial(batch: pa.Table, _Q=Qcur) -> pa.Table:
            df = batch.to_pandas()
            if not len(df):
                return _p_schema.empty_table()
            df = df.sort_values(["user_id", "event_type"], kind="mergesort")
            u = user_halfstep(df, _Q)
            ti = df["event_type"].map(t_idx).to_numpy(dtype="int64")
            c = df["c"].to_numpy(dtype="float64")
            # e12 / e6 integer contributions -> order-free int64 sums
            p = pd.DataFrame({
                "ti": ti,
                "a00": np.floor(u[:, 0] * u[:, 0] * 1e12 + 0.5).astype("int64"),
                "a01": np.floor(u[:, 0] * u[:, 1] * 1e12 + 0.5).astype("int64"),
                "a11": np.floor(u[:, 1] * u[:, 1] * 1e12 + 0.5).astype("int64"),
                "b0": np.floor(c * u[:, 0] * 1e6 + 0.5).astype("int64"),
                "b1": np.floor(c * u[:, 1] * 1e6 + 0.5).astype("int64"),
            })
            g = p.groupby("ti", as_index=False).sum()
            return pa.Table.from_pandas(g, preserve_index=False,
                                        schema=_p_schema)

        parts = (
            counts.map_batches(item_partial, batch_format="pyarrow",
                               batch_size=None)
            .to_pandas()  # <= blocks x k tiny integer rows
            .groupby("ti", as_index=False).sum()
        )
        for _, r in parts.iterrows():
            A = np.array(
                [[r["a00"] / 1e12 + lam, r["a01"] / 1e12],
                 [r["a01"] / 1e12, r["a11"] / 1e12]]
            )
            b = np.array([r["b0"] / 1e6, r["b1"] / 1e6])
            qi = np.linalg.solve(A, b)
            Q[int(r["ti"])] = np.floor(qi * 1e6 + 0.5) / 1e6

    Qfinal = Q.copy()

    _s_schema = pa.schema([("sse", pa.int64())])

    def sse_partial(batch: pa.Table, _Q=Qfinal) -> pa.Table:
        df = batch.to_pandas()
        if not len(df):
            return _s_schema.empty_table()
        df = df.sort_values(["user_id", "event_type"], kind="mergesort")
        u = user_halfstep(df, _Q)
        q = _Q[df["event_type"].map(t_idx).to_numpy()]
        r = df["c"].to_numpy(dtype="float64") - (u * q).sum(axis=1)
        sse = int(np.floor(r * r * 1e6 + 0.5).astype("int64").sum())
        return pa.Table.from_pandas(pd.DataFrame({"sse": [sse]}),
                                    preserve_index=False, schema=_s_schema)

    sse = int(
        counts.map_batches(sse_partial, batch_format="pyarrow",
                           batch_size=None)
        .to_pandas()["sse"].sum()
    )
    return pd.DataFrame({
        "event_type": types,
        "q0_e6": np.floor(Qfinal[:, 0] * 1e6 + 0.5).astype("int64"),
        "q1_e6": np.floor(Qfinal[:, 1] * 1e6 + 0.5).astype("int64"),
        "sse_e6": pd.array([sse] * k, dtype="int64"),
    })


def doc_blocklist_filter(
    sf_dir: str, terms: tuple = ("spark", "dup", "skew")
) -> rd.Dataset:
    """SAFETY-WORDLIST SCREENING — the blocklist gate every training-data
    pipeline runs before packing (flag documents whose text hits any
    listed term; the flagged set is reviewed/dropped, the complement
    flows on).  Word-boundary counting on RE2 (pyarrow
    ``count_substring_regex`` — the same engine as DuckDB's regexp
    functions, so hit counts agree exactly).

    Scale shape: the compiled alternation broadcasts inside the task
    closure; one stateless streaming pass, zero shuffles; only flagged
    rows leave the scan.  Returns (doc_id, n_hits) for flagged docs."""
    docs = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    pattern = r"\b(?:" + "|".join(terms) + r")\b"

    def fn(batch: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(pc.utf8_lower(batch["text"]),
                                     pattern=pattern)
        t = pa.table({"doc_id": batch["doc_id"],
                      "n_hits": pc.cast(n, pa.int64())})
        return t.filter(pc.greater(t["n_hits"], 0))

    return docs.map_batches(fn, batch_format="pyarrow")


def events_kendall_tau(sf_dir: str) -> pd.DataFrame:
    """KENDALL TAU-B rank correlation between event value and hour of
    day per event type — the third rank-correlation sibling (Pearson →
    Spearman → Kendall), tie-corrected.

    Exactness contract: the concordant/discordant pair counts C and D
    are EXACT integers computed from 2-D PREFIX SUMS over the
    domain-bounded (value, hour) contingency table — NO pair
    materialization (the oracle brute-forces the same counts with an
    O(n²) self-join; this side is O(|domain|)).  The tie terms are
    integer marginals; tau-b replicates the oracle's one float
    expression.

    Scale shape: rides the SAME (type, v_e2, hour) contingency exchange
    as Spearman — shuffle payload bounded by |value domain|·24, never
    the row count; the prefix-sum walk runs over ≤|domain| driver
    rows."""
    import math

    from .dedup import coarse_buckets

    ev = rd.read_parquet(_t(sf_dir, "events"), columns=["event_type", "value", "ts"])
    nb = coarse_buckets(ev.count(), rows_per_task=65536)

    _schema = pa.schema(
        [("event_type", pa.string()), ("v_e2", pa.int64()),
         ("hour", pa.int64()), ("n", pa.int64()), ("__b", pa.int64())]
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["v_e2"] = np.floor(df["value"].to_numpy() * 100.0 + 0.5).astype("int64")
        df["hour"] = df["ts"].dt.hour.astype("int64")
        g = df.groupby(["event_type", "v_e2", "hour"], as_index=False).agg(
            n=("hour", "size")
        )
        g["__b"] = (g["v_e2"].to_numpy() % nb).astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False, schema=_schema)

    def sum_cells(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["event_type", "v_e2", "hour"], as_index=False)["n"].sum()

    cells = (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(sum_cells, batch_format="pandas")
        .to_pandas()
    )
    out = []
    for et, g in cells.groupby("event_type"):
        vs = np.sort(g["v_e2"].unique())
        vi = {v: i for i, v in enumerate(vs)}
        M = np.zeros((len(vs), 24), dtype="int64")
        M[[vi[v] for v in g["v_e2"]], g["hour"].to_numpy()] = (
            g["n"].to_numpy(dtype="int64")
        )
        # 2-D inclusive prefix sums -> strictly-less-in-both /
        # strictly-greater-in-both counts per cell
        P = M.cumsum(axis=0).cumsum(axis=1)
        less_both = np.zeros_like(M)
        less_both[1:, 1:] = P[:-1, :-1]
        S = M[::-1, ::-1].cumsum(axis=0).cumsum(axis=1)[::-1, ::-1]
        greater_both = np.zeros_like(M)
        greater_both[:-1, :-1] = S[1:, 1:]
        # discordant: less in v & greater in h (and the mirror)
        Pv = M.cumsum(axis=0)  # v <= vi per column
        Sh = M[:, ::-1].cumsum(axis=1)[:, ::-1]  # h >= hi per row
        lv_gh = np.zeros_like(M)
        # strictly less v, strictly greater h: prefix over v of suffix over h
        T = Sh.cumsum(axis=0)
        lv_gh[1:, :-1] = T[:-1, 1:]
        gv_lh = np.zeros_like(M)
        T2 = M[:, :].cumsum(axis=1)          # h <= hi per row
        T3 = T2[::-1, :].cumsum(axis=0)[::-1, :]  # suffix over v of prefix h
        gv_lh[:-1, 1:] = T3[1:, :-1]
        c2 = int((M * (less_both + greater_both)).sum())  # 2·C
        d2 = int((M * (lv_gh + gv_lh)).sum())             # 2·D
        n_tot = int(M.sum())
        n0 = n_tot * (n_tot - 1) // 2
        tv = M.sum(axis=1)
        th = M.sum(axis=0)
        n1 = int((tv * (tv - 1) // 2).sum())
        n2 = int((th * (th - 1) // 2).sum())
        tau = (c2 / 2 - d2 / 2) / math.sqrt(
            float(n0 - n1) * float(n0 - n2)
        )
        out.append((et, n_tot, c2 // 2, d2 // 2,
                    int(np.floor(tau * 1e6 + 0.5))))
    return (
        pd.DataFrame(out, columns=["event_type", "n", "conc", "disc", "tau_e6"])
        .sort_values("event_type").reset_index(drop=True)
        .astype({"n": "int64", "conc": "int64", "disc": "int64",
                 "tau_e6": "int64"})
    )


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


def orders_benford_digits(sf_dir: str) -> pd.DataFrame:
    """BENFORD'S-LAW digit audit (Newcomb 1881 / Benford 1938) — the
    data-forensics screen that flags fabricated or unit-mixed numeric
    columns: the distribution of FIRST significant digits of
    o_totalprice (in cents) against the log10(1 + 1/d) reference.

    Exactness: the first digit is pure integer math (repeated //10 —
    no float log10 edge at powers of ten); shares and the reference
    curve are e6-floored from exact integers, the reference via the
    same log10 expression on both sides.

    Scale shape: a 9-bin digit census is the smallest possible combiner
    — ≤ 9 rows leave every block, zero exchange, driver folds 9·blocks
    rows."""
    orders = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        p = np.floor(
            batch["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype("int64")
        d = p.copy()
        while (d > 9).any():
            d = np.where(d > 9, d // 10, d)
        dig, n = np.unique(d, return_counts=True)
        return pa.table({"digit": pa.array(dig, pa.int64()),
                         "n": pa.array(n.astype(np.int64), pa.int64())})

    cnt = (
        orders.map_batches(partial, batch_format="pyarrow").to_pandas()
        .groupby("digit", as_index=False)["n"].sum()
    )
    total = int(cnt["n"].sum())
    full = pd.DataFrame({"digit": np.arange(1, 10, dtype="int64")}).merge(
        cnt, on="digit", how="left"
    ).fillna({"n": 0})
    full["n"] = full["n"].astype("int64")
    full["share_e6"] = np.floor(
        full["n"].to_numpy() / total * 1e6 + 0.5
    ).astype("int64")
    full["benford_e6"] = np.floor(
        np.log10(1.0 + 1.0 / full["digit"].to_numpy()) * 1e6 + 0.5
    ).astype("int64")
    return full.sort_values("digit").reset_index(drop=True)


def events_daily_dense(sf_dir: str) -> pd.DataFrame:
    """TIME-SERIES DENSIFICATION (gap filling / spine join) — daily
    event counts per type INCLUDING explicit zero rows for days with no
    events, over the global [min_day, max_day] calendar spine.  The
    reshape every downstream window/forecast operator assumes (a 7-day
    MA over a gappy series is silently wrong).

    Scale shape: one |types|·|days|-bounded count combiner (the same
    domain-bounded exchange as the seasonal family); the spine is pure
    driver arithmetic over the tiny aggregate — the raw rows are
    touched exactly once."""
    ev = rd.read_parquet(_t(sf_dir, "events"), columns=["event_type", "ts"])

    _schema = pa.schema([("event_type", pa.string()), ("day", pa.string()),
                         ("n", pa.int64())])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["day"] = df["ts"].dt.strftime("%Y-%m-%d")
        g = df.groupby(["event_type", "day"], as_index=False).agg(
            n=("day", "size")
        )
        return pa.Table.from_pandas(g, preserve_index=False, schema=_schema)

    cnt = (
        ev.map_batches(partial, batch_format="pyarrow").to_pandas()
        .groupby(["event_type", "day"], as_index=False)["n"].sum()
    )
    days = pd.date_range(cnt["day"].min(), cnt["day"].max(), freq="D")
    spine = pd.MultiIndex.from_product(
        [sorted(cnt["event_type"].unique()),
         days.strftime("%Y-%m-%d")],
        names=["event_type", "day"],
    ).to_frame(index=False)
    out = spine.merge(cnt, on=["event_type", "day"], how="left").fillna({"n": 0})
    out["n"] = out["n"].astype("int64")
    return out.sort_values(["event_type", "day"]).reset_index(drop=True)


def events_value_zscore(sf_dir: str) -> rd.Dataset:
    """FEATURE STANDARDIZATION — per-row z-score of event value within
    its type ((x − μ)/σ, population σ), the preprocessing transform
    every numeric feature pipeline runs before model training.

    Scale shape: exact integer (n, Σx, Σx²) moment combiners fold to a
    ≤|types| table, broadcast into a second stateless streaming encode
    pass (zero shuffles — the broadcast-group-stats transform shape).
    μ, σ and z replicate the oracle's float expressions from the SAME
    integers, so hashes match exactly."""
    ev = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["event_id", "event_type", "value"])

    _schema = pa.schema([("event_type", pa.string()), ("n", pa.int64()),
                         ("s1", pa.int64()), ("s2", pa.int64())])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        x = np.floor(df["value"].to_numpy() * 100.0 + 0.5).astype("int64")
        g = pd.DataFrame({"event_type": df["event_type"], "n": 1,
                          "s1": x, "s2": x * x}).groupby(
            "event_type", as_index=False
        ).sum()
        return pa.Table.from_pandas(g, preserve_index=False, schema=_schema)

    agg = (
        ev.map_batches(partial, batch_format="pyarrow").to_pandas()
        .groupby("event_type", as_index=False)[["n", "s1", "s2"]].sum()
    )
    t_n = dict(zip(agg["event_type"], agg["n"].astype(int)))
    t_s1 = dict(zip(agg["event_type"], agg["s1"].astype(int)))
    t_s2 = dict(zip(agg["event_type"], agg["s2"].astype(int)))

    def encode(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        x = np.floor(df["value"].to_numpy() * 100.0 + 0.5).astype("int64")
        n = df["event_type"].map(t_n).to_numpy(dtype="float64")
        s1 = df["event_type"].map(t_s1).to_numpy(dtype="float64")
        s2 = df["event_type"].map(t_s2).to_numpy(dtype="float64")
        mu = s1 / n
        sd = np.sqrt(s2 / n - mu * mu)
        z = np.floor((x - mu) / sd * 1e6 + 0.5).astype("int64")
        return pa.table({
            "event_id": batch["event_id"],
            "event_type": batch["event_type"],
            "v_e2": pa.array(x, pa.int64()),
            "z_e6": pa.array(z, pa.int64()),
        })

    return ev.map_batches(encode, batch_format="pyarrow")


def logreg_lambda_sweep(
    sf_dir: str, lambdas: tuple = (0.0, 0.01, 0.1, 1.0),
    n_iters: int = 15, lr: float = 0.5,
) -> pd.DataFrame:
    """HYPERPARAMETER SEARCH (model selection) — train the URGENT-order
    logistic regression under EVERY L2 strength SIMULTANEOUSLY: one
    data pass per iteration computes the gradient partials for all
    |λ| models at once (the grid rides the broadcast, not extra
    epochs), then a deterministic holdout split (o_orderkey % 5 == 0)
    scores each model and the smallest-λ val-NLL argmin is selected.

    Determinism: per-row gradient/NLL contributions floor to e9
    integers per λ before summation (order-free int64 reduce, as in
    ``orders_urgent_logreg``); the L2 term is applied on the driver in
    doubles from exact state — training is bit-reproducible across any
    partitioning.  Rows-only (iterative); the twin replays the rule in
    numpy and pins selection + regularization monotonicity."""
    feats = rd.read_parquet(
        _t(sf_dir, "orders"),
        columns=["o_orderkey", "o_totalprice", "o_orderpriority"],
    )

    def featurize(batch: pa.Table) -> pa.Table:
        x = batch["o_totalprice"].to_numpy(zero_copy_only=False) / 500_000.0
        y = pc.equal(batch["o_orderpriority"], "1-URGENT").to_numpy(
            zero_copy_only=False
        ).astype("float64")
        val = (
            batch["o_orderkey"].to_numpy(zero_copy_only=False) % 5 == 0
        ).astype("float64")
        return pa.table({"x": pa.array(x, pa.float64()),
                         "y": pa.array(y, pa.float64()),
                         "val": pa.array(val, pa.float64())})

    ds = feats.map_batches(featurize, batch_format="pyarrow").materialize()
    L = len(lambdas)
    _schema = pa.schema([("li", pa.int64()), ("g0", pa.int64()),
                         ("g1", pa.int64()), ("vnll", pa.int64()),
                         ("vcorrect", pa.int64()), ("ntr", pa.int64()),
                         ("nval", pa.int64())])

    W = np.zeros((L, 2), dtype=np.float64)
    for _ in range(n_iters):
        Wc = W.copy()

        def sweep_partial(batch: pa.Table) -> pa.Table:
            x = batch["x"].to_numpy(zero_copy_only=False)
            y = batch["y"].to_numpy(zero_copy_only=False)
            val = batch["val"].to_numpy(zero_copy_only=False) > 0.5
            tr = ~val
            rows = {c: [] for c in ("li", "g0", "g1", "vnll", "vcorrect",
                                    "ntr", "nval")}
            eps = 1e-12
            for li in range(L):
                z = Wc[li, 0] + Wc[li, 1] * x
                p = 1.0 / (1.0 + np.exp(-z))
                r = p - y
                rows["li"].append(li)
                rows["g0"].append(int(np.floor(
                    r[tr] * 1e9 + 0.5).astype("int64").sum()))
                rows["g1"].append(int(np.floor(
                    (r * x)[tr] * 1e9 + 0.5).astype("int64").sum()))
                nllv = -(y * np.log(p + eps) + (1 - y) * np.log(1 - p + eps))
                rows["vnll"].append(int(np.floor(
                    nllv[val] * 1e9 + 0.5).astype("int64").sum()))
                rows["vcorrect"].append(int(((p >= 0.5) == (y >= 0.5))[val].sum()))
                rows["ntr"].append(int(tr.sum()))
                rows["nval"].append(int(val.sum()))
            return pa.table(rows, schema=_schema)

        agg = (
            ds.map_batches(sweep_partial, batch_format="pyarrow").to_pandas()
            .groupby("li", as_index=False).sum()
        ).set_index("li")
        for li in range(L):
            n_tr = max(int(agg.loc[li, "ntr"]), 1)
            g = np.array([agg.loc[li, "g0"], agg.loc[li, "g1"]],
                         dtype=np.float64) / (1e9 * n_tr)
            g[1] += lambdas[li] * W[li, 1]  # L2 on the coef, not the bias
            W[li] = W[li] - lr * g
        last = agg

    out = []
    best = None
    for li in range(L):
        nval = max(int(last.loc[li, "nval"]), 1)
        vnll = int(last.loc[li, "vnll"] // nval)
        out.append((int(round(lambdas[li] * 1e6)),
                    int(np.floor(W[li, 0] * 1e6 + 0.5)),
                    int(np.floor(W[li, 1] * 1e6 + 0.5)),
                    vnll, int(last.loc[li, "vcorrect"])))
        if best is None or vnll < out[best][3]:
            best = li
    df = pd.DataFrame(
        out, columns=["lambda_e6", "w0_e6", "w1_e6", "val_nll_e9", "val_correct"]
    )
    df["selected"] = (np.arange(L) == best).astype("int64")
    return df.astype("int64")


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


def events_kanonymity_audit(sf_dir: str, k: int = 5) -> pd.DataFrame:
    """PRIVACY AUDIT — k-anonymity over the quasi-identifier tuple
    (event_type, hour-of-day, value bucket): every QI combination
    observed by FEWER than ``k`` rows is a re-identification risk the
    release pipeline must generalize or suppress (Sweeney 2002).
    Returns the violating combinations with their group sizes.

    Scale shape: the QI census is a domain-bounded combiner
    (|types|·24·|value buckets| rows per block ceiling); the HAVING-<k
    cut runs on the folded census — no data-sized exchange."""
    from .dedup import coarse_buckets

    ev = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["event_type", "ts", "value"])
    nb = coarse_buckets(ev.count(), rows_per_task=65536)
    _schema = pa.schema([("event_type", pa.string()), ("hour", pa.int64()),
                         ("vbucket", pa.int64()), ("n", pa.int64()),
                         ("__b", pa.int64())])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["hour"] = df["ts"].dt.hour.astype("int64")
        v = np.floor(df["value"].to_numpy() * 100.0 + 0.5).astype("int64")
        df["vbucket"] = v // 5000
        g = df.groupby(["event_type", "hour", "vbucket"], as_index=False).agg(
            n=("hour", "size")
        )
        g["__b"] = ((g["hour"] * 31 + g["vbucket"]) % nb).astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False, schema=_schema)

    def cut(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(["event_type", "hour", "vbucket"], as_index=False)["n"].sum()
        return s[s["n"] < k]

    return (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby("__b").map_groups(cut, batch_format="pandas")
        .to_pandas()
        .sort_values(["event_type", "hour", "vbucket"]).reset_index(drop=True)
        .astype({"hour": "int64", "vbucket": "int64", "n": "int64"})
    )


def events_synthesize(sf_dir: str, n_rows: int = 20000) -> rd.Dataset:
    """SYNTHETIC DATA GENERATION — draw ``n_rows`` synthetic events
    whose (event_type), (value | type) and (hour | type) MARGINALS
    follow the source table's empirical distributions (the
    privacy-friendly stand-in corpus pattern: share the shape, not the
    rows).  Values come from the real per-type value histogram via
    inverse-CDF, so every synthetic value is a value the source could
    produce.

    Determinism: "randomness" is the splitmix64 stream of the synthetic
    row index (three decorrelated salts for type/value/hour) — no RNG
    state, identical output at any partitioning or cluster size.

    Scale shape: the fitted model is three domain-bounded histograms
    (one tiny exchange over the source); generation is an
    embarrassingly parallel ``ray.data.range(n)`` map with the model
    broadcast once."""
    import ray

    from .dedup import coarse_buckets

    ev = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["event_type", "ts", "value"])
    nb = coarse_buckets(ev.count(), rows_per_task=65536)
    _schema = pa.schema([("event_type", pa.string()), ("v_e2", pa.int64()),
                         ("hour", pa.int64()), ("n", pa.int64()),
                         ("__b", pa.int64())])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["v_e2"] = np.floor(df["value"].to_numpy() * 100.0 + 0.5).astype("int64")
        df["hour"] = df["ts"].dt.hour.astype("int64")
        g = df.groupby(["event_type", "v_e2", "hour"], as_index=False).agg(
            n=("hour", "size"))
        g["__b"] = (g["v_e2"].to_numpy() % nb).astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False, schema=_schema)

    def sum_cells(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["event_type", "v_e2", "hour"], as_index=False)["n"].sum()

    cells = (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby("__b").map_groups(sum_cells, batch_format="pandas")
        .to_pandas()
    )
    types = sorted(cells["event_type"].unique())
    t_tot = cells.groupby("event_type")["n"].sum()
    type_cdf = np.cumsum([int(t_tot[t]) for t in types]).astype("float64")
    type_cdf /= type_cdf[-1]
    model = {}
    for t in types:
        g = cells[cells["event_type"] == t]
        vg = g.groupby("v_e2")["n"].sum().sort_index()
        hg = g.groupby("hour")["n"].sum().sort_index()
        model[t] = (
            vg.index.to_numpy(dtype="int64"),
            (vg.cumsum() / vg.sum()).to_numpy(dtype="float64"),
            hg.index.to_numpy(dtype="int64"),
            (hg.cumsum() / hg.sum()).to_numpy(dtype="float64"),
        )
    ref = ray.put((types, type_cdf, model))

    def mix(i: np.ndarray, salt: int) -> np.ndarray:
        x = i.astype(np.uint64) + np.uint64((salt * 0x9E3779B97F4A7C15) % 2**64)
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return (x ^ (x >> np.uint64(31))).astype(np.float64) / 2.0**64

    def gen(batch: pa.Table) -> pa.Table:
        tys, tcdf, mdl = ray.get(ref)
        i = batch["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ti = np.searchsorted(tcdf, mix(i, 1), side="right")
        ti = np.minimum(ti, len(tys) - 1)
        v = np.zeros(len(i), dtype="int64")
        h = np.zeros(len(i), dtype="int64")
        for k in np.unique(ti):
            m = ti == k
            vals, vcdf, hours, hcdf = mdl[tys[int(k)]]
            v[m] = vals[np.minimum(
                np.searchsorted(vcdf, mix(i[m], 2), side="right"),
                len(vals) - 1)]
            h[m] = hours[np.minimum(
                np.searchsorted(hcdf, mix(i[m], 3), side="right"),
                len(hours) - 1)]
        return pa.table({
            "synth_id": pa.array(i, pa.int64()),
            "event_type": pa.array([tys[int(k)] for k in ti], pa.string()),
            "v_e2": pa.array(v, pa.int64()),
            "hour": pa.array(h, pa.int64()),
        })

    return rd.range(n_rows).map_batches(gen, batch_format="pyarrow")


def events_psi_drift(sf_dir: str) -> pd.DataFrame:
    """DRIFT MONITORING — Population Stability Index between the first
    and second half of the event stream's time range, per event type
    (the model-monitoring screen that pages when a feature's
    distribution moves: PSI = Σ_bins (p_a − p_b)·ln(p_a/p_b)).

    Exactness: bins are fixed-width value buckets (v_e2 // 5000);
    per-bin probabilities derive from exact integer counts (clipped at
    1e-6 so empty bins stay finite — the standard PSI convention), each
    bin's contribution floors to an e9 integer, and the SUM of those
    integers is order-free — the oracle replays the identical
    expression tree.

    Scale shape: one |types|·|bins|·2-bounded histogram combiner (the
    period flag rides the cell key); the PSI fold walks ≤ |domain|
    driver rows."""
    from .dedup import coarse_buckets

    ev = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["event_type", "ts", "value"])

    def extent(b: pa.Table) -> pa.Table:
        d = (b["ts"].to_numpy(zero_copy_only=False)
             .astype("datetime64[D]").astype("int64"))
        return pa.table({"lo": pa.array([int(d.min())], pa.int64()),
                         "hi": pa.array([int(d.max())], pa.int64())})

    ext = ev.map_batches(extent, batch_format="pyarrow").to_pandas()
    lo, hi = int(ext["lo"].min()), int(ext["hi"].max())
    mid = (hi - lo) // 2  # day-index boundary: A = di <= mid

    nb = coarse_buckets(ev.count(), rows_per_task=65536)
    _schema = pa.schema([("event_type", pa.string()), ("vb", pa.int64()),
                         ("na", pa.int64()), ("nbb", pa.int64()),
                         ("__b", pa.int64())])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        di = (df["ts"].to_numpy().astype("datetime64[D]").astype("int64") - lo)
        df["vb"] = (
            np.floor(df["value"].to_numpy() * 100.0 + 0.5).astype("int64")
            // 5000
        )
        df["ina"] = (di <= mid).astype("int64")
        g = df.groupby(["event_type", "vb"], as_index=False).agg(
            na=("ina", "sum"), nbb=("ina", lambda s: int((1 - s).sum()))
        )
        g["__b"] = (g["vb"].to_numpy() % nb).astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False, schema=_schema)

    def sum_cells(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["event_type", "vb"], as_index=False)[["na", "nbb"]].sum()

    cells = (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby("__b").map_groups(sum_cells, batch_format="pandas")
        .to_pandas()
    )
    out = []
    for et, g in cells.groupby("event_type"):
        n_a = int(g["na"].sum())
        n_b = int(g["nbb"].sum())
        pa_ = np.maximum(g["na"].to_numpy(dtype="float64") / n_a, 1e-6)
        pb_ = np.maximum(g["nbb"].to_numpy(dtype="float64") / n_b, 1e-6)
        contrib = np.floor((pa_ - pb_) * np.log(pa_ / pb_) * 1e9 + 0.5)
        out.append((et, n_a, n_b, int(contrib.astype("int64").sum())))
    return (
        pd.DataFrame(out, columns=["event_type", "n_a", "n_b", "psi_e9"])
        .sort_values("event_type").reset_index(drop=True)
        .astype({"n_a": "int64", "n_b": "int64", "psi_e9": "int64"})
    )


def event_attribution_markov(sf_dir: str) -> pd.DataFrame:
    """MARKETING ATTRIBUTION — first-order Markov removal effects
    (Anderl et al. 2016): model each user's journey (non-purchase
    touches ordered by time, absorbed by the first purchase = CONV or
    end-of-data = NULL) as a Markov chain, score each channel by how
    much total conversion probability disappears when the channel is
    removed (its transitions redirected to NULL), and normalize the
    removal effects into attribution shares — the data-driven
    alternative to last-touch rules.

    Scale shape: journeys live inside ONE user-bucket exchange (a user
    is bucket-complete); per-bucket grouped shifts emit |states|²-
    bounded transition-count partials; the absorbing-chain solves run
    on the driver over a (channels+2)² matrix.  Exact integer counts in,
    one deterministic linear solve out.  Rows-only (matrix inverse);
    the twin replays journeys and the solve in pure pandas/numpy."""
    from .dedup import coarse_buckets

    ev = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["user_id", "event_type", "ts", "event_id"])
    nb = coarse_buckets(ev.count(), rows_per_task=65536)
    _schema = pa.schema([("src", pa.string()), ("dst", pa.string()),
                         ("n", pa.int64())])

    def route(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["__b"] = (df["user_id"].to_numpy() % nb).astype("int64")
        return pa.Table.from_pandas(df, preserve_index=False)

    def transitions(g: pd.DataFrame) -> pd.DataFrame:
        # deterministic event order: (ts, event_id) total order; fully
        # vectorized journey build (grouped cumsum + shift, no row loop)
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        grp = g.groupby("user_id", sort=False)
        is_p = (g["event_type"] == "purchase").astype("int64")
        before_first = grp["event_type"].transform(
            lambda s: (s == "purchase").cumsum()
        ).to_numpy() - is_p.to_numpy() == 0
        j = g[before_first.astype(bool) & (g["event_type"] != "purchase")]
        jg = j.groupby("user_id", sort=False)
        src = jg["event_type"].shift(1).fillna("START")
        inner = pd.DataFrame({"src": src, "dst": j["event_type"]})
        # terminal row per user: last journey touch (or START) → CONV/NULL
        conv_users = set(g.loc[is_p.to_numpy() == 1, "user_id"].unique())
        last = j.groupby("user_id", sort=False)["event_type"].last()
        all_users = g["user_id"].unique()
        last_full = pd.Series("START", index=all_users)
        last_full.loc[last.index] = last
        term = pd.DataFrame({
            "src": last_full.to_numpy(),
            "dst": ["CONV" if u in conv_users else "NULL" for u in all_users],
        })
        out = pd.concat([inner, term], ignore_index=True)
        return out.groupby(["src", "dst"], as_index=False).size().rename(
            columns={"size": "n"})

    counts = (
        ev.map_batches(route, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(transitions, batch_format="pandas")
        .to_pandas()
        .groupby(["src", "dst"], as_index=False)["n"].sum()
    )

    channels = sorted(
        set(counts["src"]) | set(counts["dst"]) - {"START", "CONV", "NULL"}
    )
    channels = [c for c in channels if c not in ("START", "CONV", "NULL")]
    states = ["START"] + channels + ["CONV", "NULL"]
    idx = {s: i for i, s in enumerate(states)}
    n_states = len(states)
    T = np.zeros((n_states, n_states), dtype="float64")
    for _, r in counts.iterrows():
        T[idx[r["src"]], idx[r["dst"]]] += float(r["n"])
    row_sums = T.sum(axis=1, keepdims=True)
    row_sums[row_sums == 0] = 1.0
    P = T / row_sums

    def conv_prob(P: np.ndarray, removed: int | None) -> float:
        Q = P.copy()
        if removed is not None:
            # removal effect: the channel's inbound mass goes to NULL
            Q[:, idx["NULL"]] += Q[:, removed]
            Q[:, removed] = 0.0
            Q[removed, :] = 0.0
        trans = [i for i, s in enumerate(states) if s not in ("CONV", "NULL")]
        A = np.eye(len(trans)) - Q[np.ix_(trans, trans)]
        b = Q[np.ix_(trans, [idx["CONV"]])].ravel()
        sol = np.linalg.solve(A, b)
        return float(sol[trans.index(idx["START"])])

    base = conv_prob(P, None)
    res = []
    for c in channels:
        re = base - conv_prob(P, idx[c])
        res.append((c, re))
    tot = sum(max(re, 0.0) for _, re in res)
    out = []
    touch = counts[counts["dst"].isin(channels)].groupby("dst")["n"].sum()
    for c, re in res:
        share = max(re, 0.0) / tot if tot > 0 else 0.0
        out.append((c, int(np.floor(re / base * 1e6 + 0.5)) if base > 0 else 0,
                    int(np.floor(share * 1e6 + 0.5)),
                    int(touch.get(c, 0))))
    return (
        pd.DataFrame(out, columns=["channel", "removal_e6",
                                   "attribution_e6", "n_touches"])
        .sort_values("channel").reset_index(drop=True)
        .astype({"removal_e6": "int64", "attribution_e6": "int64",
                 "n_touches": "int64"})
    )


def doc_encoding_audit(sf_dir: str) -> pd.DataFrame:
    """ENCODING-HYGIENE AUDIT per source — counts of documents with
    non-NFC text, stray control characters, or mojibake/replacement
    artifacts (functions.text.encoding_flags), the ingestion screen
    every web-text corpus runs before tokenization (a non-NFC or
    mojibake doc silently splits dedup and token identity).

    Scale shape: stateless per-batch flagging + a |sources|-bounded
    count combiner; zero data-sized exchange.  Rows-only (Unicode
    normalization is not SQL-expressible in DuckDB); planted-fixture +
    twin tests pin the flags."""
    from ..functions.text import encoding_flags

    docs = rd.read_parquet(_t(sf_dir, "documents"),
                           columns=["source", "text"])
    _schema = pa.schema([("source", pa.string()), ("n_docs", pa.int64()),
                         ("n_non_nfc", pa.int64()), ("n_control", pa.int64()),
                         ("n_mojibake", pa.int64())])

    def partial(batch: pa.Table) -> pa.Table:
        flags = encoding_flags(batch["text"].to_pylist())
        g = pd.DataFrame({
            "source": batch["source"].to_pylist(),
            "n_docs": 1,
            "n_non_nfc": flags["non_nfc"],
            "n_control": flags["control"],
            "n_mojibake": flags["mojibake"],
        }).groupby("source", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False, schema=_schema)

    return (
        docs.map_batches(partial, batch_format="pyarrow").to_pandas()
        .groupby("source", as_index=False).sum()
        .sort_values("source").reset_index(drop=True)
        .astype({c: "int64" for c in
                 ["n_docs", "n_non_nfc", "n_control", "n_mojibake"]})
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


def docs_phrase_search(
    sf_dir: str, t1: str = "table", t2: str = "hash"
) -> pd.DataFrame:
    """PHRASE SEARCH — positional adjacency query ("t1 t2" as an exact
    phrase), the retrieval operator a doc-level inverted index
    (``token_postings``) cannot answer: it needs token POSITIONS, not
    just membership.  Per matching doc: match count + first match
    position (1-based token ordinal, matching SQL array indexing).

    Scale shape: ONE stateless streaming pass — tokens never leave the
    scan.  Each batch splits its own rows and tests adjacency with
    vectorized masks (``tok[i] == t1 & tok[i+1] == t2`` within the same
    row), so the exchange cost is zero and the output is bounded by the
    number of matching docs.  A pre-built positional index would trade
    this scan for an O(df(t1)+df(t2)) postings intersect — worth it
    only for repeated queries; both shapes are index-free here because
    the corpus scan is the honest cold-query cost."""
    docs = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    _schema = pa.schema(
        [("doc_id", pa.int64()), ("n_matches", pa.int64()),
         ("first_pos", pa.int64())]
    )

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        toks = pc.split_pattern(batch["text"], " ")
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        lens = lens.astype(np.int64)
        flat = pc.list_flatten(toks)
        n_tok = len(flat)
        if n_tok < 2:
            return _schema.empty_table()
        is1 = pc.equal(flat, t1).to_numpy(zero_copy_only=False)
        is2 = pc.equal(flat, t2).to_numpy(zero_copy_only=False)
        docidx = np.repeat(np.arange(len(ids), dtype=np.int64), lens)
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        pos = np.arange(n_tok, dtype=np.int64) - np.repeat(starts, lens)
        hit = is1[:-1] & is2[1:] & (docidx[:-1] == docidx[1:])
        hi = np.nonzero(hit)[0]
        if len(hi) == 0:
            return _schema.empty_table()
        hd = docidx[hi]
        n_m = np.bincount(hd, minlength=len(ids))
        first = np.full(len(ids), np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(first, hd, pos[hi] + 1)  # 1-based ordinal
        sel = n_m > 0
        return pa.table(
            {"doc_id": ids[sel], "n_matches": n_m[sel].astype(np.int64),
             "first_pos": first[sel]},
            schema=_schema,
        )

    out = docs.map_batches(partial, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def doc_readability(sf_dir: str) -> pd.DataFrame:
    """READABILITY census (Flesch reading-ease family) per source:
    word counts, vowel-group syllable proxies, and the summed per-doc
    Flesch score (206.835 − 1.015·words/sentences − 84.6·syll/words;
    the corpus carries no sentence punctuation so sentences ≡ 1,
    documented and mirrored in the oracle).  Scores are floored to e3
    integers per doc BEFORE summation so the per-source totals are
    order-free exact.

    Scale shape: pure combiner — each batch reduces to ≤ |sources|
    rows (token split + one vectorized regex count per batch); the
    final fold is a tiny groupby.  No data-sized exchange."""
    docs = rd.read_parquet(_t(sf_dir, "documents"), columns=["source", "text"])
    _schema = pa.schema(
        [("source", pa.string()), ("n_docs", pa.int64()),
         ("sum_words", pa.int64()), ("sum_syllables", pa.int64()),
         ("sum_flesch_e3", pa.int64())]
    )

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch["text"], " ")
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        words = lens.astype(np.int64)
        flat = pc.list_flatten(toks)
        vg = pc.count_substring_regex(flat, "[aeiou]+")
        vg = vg.to_numpy(zero_copy_only=False).astype(np.int64)
        docidx = np.repeat(np.arange(len(words), dtype=np.int64), words)
        syl = np.bincount(docidx, weights=vg, minlength=len(words))
        syl = syl.astype(np.int64)
        w = words.astype(np.float64)
        score = 206.835 - 1.015 * w - 84.6 * (syl.astype(np.float64) / w)
        score_e3 = np.floor(score * 1000.0 + 0.5).astype(np.int64)
        df = pd.DataFrame(
            {"source": batch["source"].to_pandas(), "w": words, "s": syl,
             "f": score_e3}
        )
        g = df.groupby("source", as_index=False).agg(
            n_docs=("w", "size"), sum_words=("w", "sum"),
            sum_syllables=("s", "sum"), sum_flesch_e3=("f", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False, schema=_schema)

    out = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .sum(["n_docs", "sum_words", "sum_syllables", "sum_flesch_e3"])
        .to_pandas()
    )
    out = out.rename(columns={f"sum({c})": c for c in
                              ["n_docs", "sum_words", "sum_syllables",
                               "sum_flesch_e3"]})
    return (
        out[["source", "n_docs", "sum_words", "sum_syllables",
             "sum_flesch_e3"]]
        .sort_values("source").reset_index(drop=True)
    )


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


def orders_theilsen_trend(sf_dir: str) -> pd.DataFrame:
    """ROBUST REGRESSION (Theil–Sen estimator, Sen 1968): the median of
    all pairwise slopes of daily revenue vs day — the
    breakdown-point-29% trend line OLS (``lineitem_price_regression``)
    cannot give.  Slope and intercept floored at e6 / e0 on both sides
    from bit-identical double arithmetic over the same int64 daily
    table.

    Scale shape: the pairwise-slope set is O(|days|²) — quadratic in
    the DOMAIN, not the data — so ONE |days|-bounded combiner pass
    reduces 100 TB to ≤ a few thousand (day, rev) rows and the driver
    finishes the median exactly; nothing data-sized moves."""
    orders = rd.read_parquet(
        _t(sf_dir, "orders"), columns=["o_orderdate", "o_totalprice"]
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        day = (
            batch["o_orderdate"].values.astype("datetime64[s]")
            .astype("int64") // 86400
        )
        rev = np.floor(
            batch["o_totalprice"].to_numpy() * 100.0 + 0.5
        ).astype("int64")
        return (
            pd.DataFrame({"day": day, "rev_e2": rev})
            .groupby("day", as_index=False)["rev_e2"].sum()
        )

    daily = (
        orders.map_batches(partial, batch_format="pandas")
        .to_pandas()
        .groupby("day", as_index=False)["rev_e2"].sum()
        .sort_values("day")
    )
    day = daily["day"].to_numpy(dtype="float64")
    rev = daily["rev_e2"].to_numpy(dtype="float64")
    if len(day) < 2:
        # degenerate table: no pairwise slopes exist; both sides define
        # the trend as 0 (oracle: COALESCE over the empty median)
        slope = 0.0
    else:
        i, j = np.triu_indices(len(day), 1)
        slopes = (rev[j] - rev[i]) / (day[j] - day[i])
        slope = float(np.median(slopes))
    if len(day) == 0:
        icept = 0.0
    else:
        icept = float(
            np.median(rev - (np.floor(slope * 1e6 + 0.5) / 1e6) * day)
        )
    return pd.DataFrame({
        "n_days": np.array([len(day)], dtype="int64"),
        "slope_e6": np.array([np.floor(slope * 1e6 + 0.5)], dtype="int64"),
        "icept_e2": np.array([np.floor(icept + 0.5)], dtype="int64"),
    })


def purchase_shapley_attribution(sf_dir: str) -> pd.DataFrame:
    """SHAPLEY-VALUE ATTRIBUTION (Shapley 1953; data-driven marketing
    attribution à la Zhao et al. 2018): the conversion characteristic
    function v(S) = observed purchase rate of users whose non-purchase
    channel set is exactly S (unobserved subsets contribute 0), and
    each channel's credit is its exact Shapley value over the
    2^|channels| lattice — a different published model from the
    removal-effect Markov attribution (``event_attribution_markov``).

    Scale shape: ONE user-bucket exchange completes each user's
    channel bitmask + converted flag; per-bucket (mask, users,
    conversions) partials are ≤ 2^|channels| rows; the driver folds
    the 16-row table and runs the closed-form Shapley sum — nothing
    data-sized anywhere."""
    from .dedup import coarse_buckets

    channels = ["click", "error", "signup", "view"]
    n = len(channels)
    ev = rd.read_parquet(
        _t(sf_dir, "events"), columns=["user_id", "event_type"]
    )
    nb = coarse_buckets(ev.count(), rows_per_task=65536)

    s1 = pa.schema([("user_id", pa.int64()), ("event_type", pa.string()),
                    ("__b", pa.int64())])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().drop_duplicates()
        u = df["user_id"].to_numpy().astype("int64")
        return pa.table(
            {"user_id": u, "event_type": df["event_type"], "__b": u % nb},
            schema=s1,
        )

    def masks(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["user_id", "event_type"])
        bit = pd.Series(
            {c: 1 << k for k, c in enumerate(channels)}, dtype="int64"
        )
        g = g.assign(
            b=g["event_type"].map(bit).fillna(0).astype("int64"),
            conv=(g["event_type"] == "purchase").astype("int64"),
        )
        per_user = g.groupby("user_id").agg(
            mask=("b", "sum"), conv=("conv", "max")
        )
        out = per_user.groupby("mask", as_index=False).agg(
            n_users=("conv", "size"), n_conv=("conv", "sum")
        )
        return out.astype(
            {"mask": "int64", "n_users": "int64", "n_conv": "int64"}
        )

    cells = (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(masks, batch_format="pandas")
        .to_pandas()
    )
    tab = cells.groupby("mask", as_index=False).sum()
    users = np.zeros(1 << n, dtype="int64")
    convs = np.zeros(1 << n, dtype="int64")
    users[tab["mask"].to_numpy()] = tab["n_users"].to_numpy()
    convs[tab["mask"].to_numpy()] = tab["n_conv"].to_numpy()
    v = np.where(users > 0, convs / np.maximum(users, 1), 0.0)

    import math

    rows = []
    for k, c in enumerate(channels):
        phi = 0.0
        for s in range(1 << n):
            if s & (1 << k):
                continue
            size = bin(s).count("1")
            w = (math.factorial(size) * math.factorial(n - size - 1)
                 / math.factorial(n))
            phi += w * (v[s | (1 << k)] - v[s])
        rows.append((c, int(np.floor(phi * 1e6 + 0.5))))
    return pd.DataFrame(rows, columns=["channel", "phi_e6"]).astype(
        {"phi_e6": "int64"}
    )


def vocab_richness(sf_dir: str) -> pd.DataFrame:
    """SPECIES-RICHNESS / vocabulary-coverage estimation (Chao 1984;
    Good–Turing): per source, the distinct-token count V, total tokens
    N, singleton/doubleton counts f1/f2, and the bias-corrected Chao1
    estimate of TRUE vocabulary size V + f1(f1−1)/(2(f2+1)) — the "how
    much vocabulary haven't we crawled yet" question a corpus grower
    asks; distinct from ``token_zipf_fit`` (rank-frequency slope).

    Scale shape: per-batch (source, token) count partials → ONE
    vocabulary-bounded token-bucket exchange where each (source, token)
    count completes → per-bucket (V, N, f1, f2) partials SUM exactly
    (a token lives in one bucket); the driver folds |sources| rows and
    applies the identical float expression tree as the oracle."""
    from ..functions.hashing import fingerprint64_batch
    from .dedup import coarse_buckets

    docs = rd.read_parquet(_t(sf_dir, "documents"), columns=["source", "text"])
    nb = coarse_buckets(docs.count(), rows_per_task=4096)

    s1 = pa.schema([("source", pa.string()), ("token", pa.string()),
                    ("n", pa.int64()), ("__b", pa.int64())])

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch["text"], pattern=" ")
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        df = pd.DataFrame({
            "source": np.repeat(
                batch["source"].to_numpy(zero_copy_only=False), lens
            ),
            "token": flat.to_pandas(),
        })
        df = df[df["token"] != ""]
        g = df.groupby(["source", "token"], as_index=False).size().rename(
            columns={"size": "n"}
        )
        key = (g["source"] + "\x1f" + g["token"]).tolist()
        g["__b"] = fingerprint64_batch(key).astype("int64") % nb
        return pa.Table.from_pandas(g, schema=s1, preserve_index=False)

    def richness(g: pd.DataFrame) -> pd.DataFrame:
        t = g.groupby(["source", "token"], as_index=False)["n"].sum()
        out = t.groupby("source", as_index=False).agg(
            v=("n", "size"), n_tokens=("n", "sum"),
            f1=("n", lambda s: int((s == 1).sum())),
            f2=("n", lambda s: int((s == 2).sum())),
        )
        return out.astype({"v": "int64", "n_tokens": "int64",
                           "f1": "int64", "f2": "int64"})

    cells = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(richness, batch_format="pandas")
        .to_pandas()
    )
    out = cells.groupby("source", as_index=False).sum()
    v = out["v"].to_numpy(dtype="int64")
    f1 = out["f1"].to_numpy(dtype="int64")
    f2 = out["f2"].to_numpy(dtype="int64")
    chao = v + f1.astype("float64") * (f1 - 1) / (2.0 * (f2 + 1))
    out["chao1_e6"] = np.floor(chao * 1e6 + 0.5).astype("int64")
    return (
        out.sort_values("source").reset_index(drop=True)
        [["source", "v", "n_tokens", "f1", "f2", "chao1_e6"]]
        .astype({"v": "int64", "n_tokens": "int64", "f1": "int64",
                 "f2": "int64", "chao1_e6": "int64"})
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


def error_propensity_att(
    sf_dir: str, n_iters: int = 30, lr: float = 0.5
) -> pd.DataFrame:
    """PROPENSITY-SCORE MATCHING (Rosenbaum & Rubin 1983) — the
    observational-causal-inference composite: treatment = user is
    error-prone (more 'error' events than 'signup' events — every user
    in the synthetic corpus hits at least one error, so presence alone
    separates nobody), outcome = purchase count; a deterministic
    logistic propensity P(treated | activity) is trained
    data-parallel, then greedy 1-NN matching WITHOUT replacement on
    the propensity pairs each treated user with its closest control,
    and ATT = mean(outcome_t − outcome_matched); the naive unadjusted
    difference is reported next to it.

    Scale shape: (1) per-user features via ONE user-bucket exchange;
    (2) propensity training re-uses the e9-integer per-row gradient
    rule (``orders_urgent_logreg``) over the PINNED user-feature
    dataset — bit-reproducible at any partitioning, only a
    (dim+1)-int vector moves per iteration; (3) matching runs on the
    |users|-bounded (propensity, outcome) table — the same
    fits-a-heap assumption the rank tables document; a
    propensity-range bucket exchange is the fallback past it."""
    from .dedup import coarse_buckets

    ev = rd.read_parquet(
        _t(sf_dir, "events"), columns=["user_id", "event_type"]
    )
    nb = coarse_buckets(ev.count(), rows_per_task=65536)

    s1 = pa.schema([("user_id", pa.int64()), ("event_type", pa.string()),
                    ("n", pa.int64()), ("__b", pa.int64())])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().groupby(
            ["user_id", "event_type"], as_index=False
        ).size().rename(columns={"size": "n"})
        df["__b"] = (df["user_id"].to_numpy() % nb).astype("int64")
        return pa.Table.from_pandas(df, schema=s1, preserve_index=False)

    feat_schema = pa.schema([
        ("user_id", pa.int64()), ("t", pa.float64()), ("y", pa.float64()),
        ("x1", pa.float64()), ("x2", pa.float64()), ("x3", pa.float64()),
    ])

    def featurize(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby(["user_id", "event_type"])["n"].sum().unstack(
            fill_value=0
        )
        for col in ("view", "click", "signup", "error", "purchase"):
            if col not in c.columns:
                c[col] = 0
        return pd.DataFrame({
            "user_id": c.index.to_numpy(dtype="int64"),
            "t": (c["error"].to_numpy()
                  > c["signup"].to_numpy()).astype("float64"),
            "y": c["purchase"].to_numpy(dtype="float64"),
            "x1": np.log1p(c["view"].to_numpy(dtype="float64")),
            "x2": np.log1p(c["click"].to_numpy(dtype="float64")),
            "x3": np.log1p(c["signup"].to_numpy(dtype="float64")),
        })

    feats = (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(featurize, batch_format="pandas")
        .materialize()
    )

    w = np.zeros(4, dtype=np.float64)  # bias, x1, x2, x3
    g_schema = pa.schema([(f"g{i}", pa.int64()) for i in range(4)])
    n_users = feats.count()
    for _ in range(n_iters):
        ws = tuple(float(v) for v in w)

        def grad_partial(batch: pa.Table, _w=ws) -> pa.Table:
            x = np.column_stack([
                np.ones(batch.num_rows),
                batch["x1"].to_numpy(zero_copy_only=False),
                batch["x2"].to_numpy(zero_copy_only=False),
                batch["x3"].to_numpy(zero_copy_only=False),
            ])
            t = batch["t"].to_numpy(zero_copy_only=False)
            p = 1.0 / (1.0 + np.exp(-(x @ np.asarray(_w))))
            r = (p - t)[:, None] * x
            g = np.floor(r * 1e9 + 0.5).astype("int64").sum(axis=0)
            return pa.table(
                {f"g{i}": np.array([g[i]], dtype="int64") for i in range(4)},
                schema=g_schema,
            )

        parts = feats.map_batches(
            grad_partial, batch_format="pyarrow"
        ).to_pandas()
        grad = parts.sum().to_numpy(dtype="float64") / 1e9 / n_users
        w = w - lr * grad

    tbl = feats.to_pandas()  # |users|-bounded (documented assumption)
    x = np.column_stack([
        np.ones(len(tbl)), tbl["x1"], tbl["x2"], tbl["x3"]
    ])
    prop = 1.0 / (1.0 + np.exp(-(x @ w)))
    t = tbl["t"].to_numpy() > 0
    y = tbl["y"].to_numpy()
    uid = tbl["user_id"].to_numpy()

    # greedy 1-NN without replacement, deterministic order
    treated = sorted(
        zip(-prop[t], uid[t], prop[t], y[t])
    )
    ctrl = pd.DataFrame(
        {"p": prop[~t], "uid": uid[~t], "y": y[~t]}
    ).sort_values(["p", "uid"]).reset_index(drop=True)
    used = np.zeros(len(ctrl), dtype=bool)
    cps = ctrl["p"].to_numpy()
    cys = ctrl["y"].to_numpy()
    nc = len(ctrl)
    n_used = 0
    diffs = []
    # nearest UNUSED control by |p - tp| via searchsorted + outward
    # scan (cps is sorted) — O(log C + skipped) per treated instead of
    # a full argsort; the tie rule is exactly the stable-argsort one:
    # equal distance resolves to the LOWEST control index
    for _negp, _tuid, tp, ty in treated:
        if n_used == nc:
            break
        pos = int(np.searchsorted(cps, tp))
        li = pos - 1
        while li >= 0 and used[li]:
            li -= 1
        ri = pos
        while ri < nc and used[ri]:
            ri += 1
        if li < 0:
            cand = ri
        elif ri >= nc:
            cand = li
        else:
            cand = li if (tp - cps[li]) <= (cps[ri] - tp) else ri
        # walk to the leftmost unused duplicate of the chosen value
        # (same distance, lower index wins under the stable rule)
        v = cps[cand]
        lo = cand
        while lo - 1 >= 0 and cps[lo - 1] == v:
            lo -= 1
        for jdx in range(lo, cand):
            if not used[jdx]:
                cand = jdx
                break
        used[cand] = True
        n_used += 1
        diffs.append(ty - float(cys[cand]))
    att = float(np.mean(diffs)) if diffs else 0.0
    naive = float(y[t].mean() - y[~t].mean()) if t.any() and (~t).any() else 0.0
    return pd.DataFrame({
        "n_treated": np.array([int(t.sum())], dtype="int64"),
        "n_control": np.array([int((~t).sum())], dtype="int64"),
        "n_matched": np.array([len(diffs)], dtype="int64"),
        "att_e6": np.array([int(np.floor(att * 1e6 + 0.5))], dtype="int64"),
        "naive_e6": np.array(
            [int(np.floor(naive * 1e6 + 0.5))], dtype="int64"
        ),
    })


def events_ldiversity_audit(sf_dir: str, l_min: int = 3) -> pd.DataFrame:
    """PRIVACY AUDIT — l-DIVERSITY (Machanavajjhala et al. 2006): a
    quasi-identifier group backed by fewer than ``l_min`` DISTINCT
    sensitive values (here user_id) lets an attacker who locates a
    target's QI group infer the sensitive attribute even when the group
    is large enough to pass k-anonymity — the diversity complement of
    ``events_kanonymity_audit`` (group SIZE vs group VALUE DIVERSITY),
    over the same QI tuple (event_type, hour, value bucket).

    Scale shape: per-batch distinct (QI, user) partials → ONE exchange
    bucketed on the (hour, vbucket) hash so every QI group's user set
    is bucket-complete → exact per-group nunique and the HAVING-<l cut
    inside the bucket; the driver sees only violating groups."""
    from .dedup import coarse_buckets

    ev = rd.read_parquet(
        _t(sf_dir, "events"),
        columns=["event_type", "ts", "value", "user_id"],
    )
    nb = coarse_buckets(ev.count(), rows_per_task=65536)
    _schema = pa.schema([("event_type", pa.string()), ("hour", pa.int64()),
                         ("vbucket", pa.int64()), ("user_id", pa.int64()),
                         ("__b", pa.int64())])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["hour"] = df["ts"].dt.hour.astype("int64")
        v = np.floor(df["value"].to_numpy() * 100.0 + 0.5).astype("int64")
        df["vbucket"] = v // 5000
        d = df[["event_type", "hour", "vbucket", "user_id"]].drop_duplicates()
        d = d.copy()
        d["__b"] = ((d["hour"] * 31 + d["vbucket"]) % nb).astype("int64")
        return pa.Table.from_pandas(d, preserve_index=False, schema=_schema)

    def cut(g: pd.DataFrame) -> pd.DataFrame:
        s = g.drop_duplicates().groupby(
            ["event_type", "hour", "vbucket"], as_index=False
        ).agg(n_users=("user_id", "nunique"))
        return s[s["n_users"] < l_min].astype({"n_users": "int64"})

    return (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby("__b").map_groups(cut, batch_format="pandas")
        .to_pandas()
        .sort_values(["event_type", "hour", "vbucket"]).reset_index(drop=True)
        .astype({"hour": "int64", "vbucket": "int64", "n_users": "int64"})
    )


def events_tcloseness_audit(sf_dir: str, t_e6: int = 20000) -> pd.DataFrame:
    """PRIVACY AUDIT — t-CLOSENESS (Li, Li & Venkatasubramanian 2007):
    a quasi-identifier group whose SENSITIVE-value distribution sits
    further than ``t`` (ordered-attribute Earth Mover's Distance) from
    the table-wide distribution leaks attribute information even when
    it passes k-anonymity (size) and l-diversity (distinct count) — the
    distributional member of the audit trio (``events_kanonymity_audit``,
    ``events_ldiversity_audit``).  QI = (event_type, hour); sensitive =
    the ordered value bucket.  Ordered EMD = Σ|cum(P)−cum(Q)| / (m−1),
    computed in exact integers over the common denominator n·nt (one
    float division at the very end, identical expression tree to the
    DuckDB oracle, so value hashes are exact).

    Scale shape: pass 1 is a per-batch bincount partial into a tiny
    groupby (global distribution = one row per value bucket, broadcast
    via closure); pass 2 re-partials per-QI-group counts and exchanges
    ONCE on the hour hash so each group's histogram is bucket-complete;
    EMD and the HAVING-> t cut run inside the bucket and the driver
    sees only violating groups."""
    from .dedup import coarse_buckets

    ev = rd.read_parquet(_t(sf_dir, "events"), columns=["event_type", "ts", "value"])

    def _vb(values: np.ndarray) -> np.ndarray:
        return np.floor(values * 100.0 + 0.5).astype(np.int64) // 5000

    def gpart(batch: pa.Table) -> pa.Table:
        vb = _vb(batch.column("value").to_numpy(zero_copy_only=False))
        u, c = np.unique(vb, return_counts=True)
        return pa.table({"vb": u, "c": c.astype("int64")})

    gdf = (
        ev.map_batches(gpart, batch_format="pyarrow")
        .groupby("vb").sum("c").to_pandas()
        .sort_values("vb").reset_index(drop=True)
    )
    dom = gdf["vb"].to_numpy(dtype=np.int64)
    cg = gdf["sum(c)"].to_numpy(dtype=np.int64)
    nt = int(cg.sum())
    m = len(dom)

    nb = coarse_buckets(ev.count(), rows_per_task=65536)
    _schema = pa.schema([("event_type", pa.string()), ("hour", pa.int64()),
                         ("vb", pa.int64()), ("c", pa.int64()), ("__b", pa.int64())])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["hour"] = df["ts"].dt.hour.astype("int64")
        df["vb"] = _vb(df["value"].to_numpy())
        g = df.groupby(["event_type", "hour", "vb"], as_index=False).size()
        g = g.rename(columns={"size": "c"})
        g["c"] = g["c"].astype("int64")
        g["__b"] = (g["hour"] % nb).astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False, schema=_schema)

    cumcg = np.cumsum(cg)

    def cut(b: pd.DataFrame) -> pd.DataFrame:
        s = b.groupby(["event_type", "hour", "vb"], as_index=False)["c"].sum()
        rows: list[tuple[str, int, int]] = []
        for (et, hour), g in s.groupby(["event_type", "hour"]):
            c = np.zeros(m, dtype=np.int64)
            c[np.searchsorted(dom, g["vb"].to_numpy())] = g["c"].to_numpy()
            n = int(c.sum())
            if m <= 1:
                emd_e6 = 0
            else:
                cumc = np.cumsum(c)
                numer = int(np.abs(cumc * nt - cumcg * n).sum())
                emd_e6 = int(np.floor(
                    float(numer) * 1e6 / (float(n) * float(nt) * (m - 1)) + 0.5
                ))
            if emd_e6 > t_e6:
                rows.append((str(et), int(hour), emd_e6))
        return pd.DataFrame(rows, columns=["event_type", "hour", "emd_e6"]).astype(
            {"hour": "int64", "emd_e6": "int64"}
        )

    out = (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby("__b").map_groups(cut, batch_format="pandas")
        .to_pandas()
    )
    if out.empty:
        # no violating group anywhere (larger groups concentrate toward
        # the global distribution): an all-empty map_groups output drops
        # its schema — rebuild the typed empty frame
        return pd.DataFrame(
            {"event_type": pd.Series([], dtype=object),
             "hour": pd.Series([], dtype="int64"),
             "emd_e6": pd.Series([], dtype="int64")}
        )
    return (
        out.sort_values(["event_type", "hour"]).reset_index(drop=True)
        .astype({"hour": "int64", "emd_e6": "int64"})
    )


def events_fdr_bh(sf_dir: str, q_e6: int = 50000) -> pd.DataFrame:
    """MULTIPLE-TESTING CONTROL — Benjamini–Hochberg FDR (1995): one
    two-sided z-test per (event_type, hour) group (H0: group mean value
    equals the global mean, variance from the global moments), then the
    step-up procedure at FDR level ``q`` across all m hypotheses.
    Returns EVERY hypothesis with its raw p, BH-adjusted p (the running
    suffix-min of m·p_i/i, the standard `p.adjust(method="BH")` value)
    and the reject flag — on null-structured data the rejected set is
    legitimately empty, so the adjusted column is what the oracle hash
    locks down.  p-values use the Abramowitz–Stegun 7.1.26 erfc
    polynomial (plain arithmetic + exp, so the DuckDB twin evaluates
    the IDENTICAL expression tree); p is integer-scaled to e6 before
    the BH arithmetic, which then runs in exact integers on both sides.

    Scale shape: per-batch moment partials (n, Σx, Σx²) per group →
    one tiny groupby (m is bounded by |event_type|×24 — a fixed, data-
    independent domain); the global moments are the SUM of the group
    rows, so one pass feeds both; BH itself is O(m log m) driver math
    on the bounded hypothesis table."""
    ev = rd.read_parquet(_t(sf_dir, "events"), columns=["event_type", "ts", "value"])
    _schema = pa.schema([("event_type", pa.string()), ("hour", pa.int64()),
                         ("n", pa.int64()), ("s1", pa.int64()), ("s2", pa.int64())])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["hour"] = df["ts"].dt.hour.astype("int64")
        x = np.floor(df["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        df["x"] = x
        df["x2"] = x * x
        g = df.groupby(["event_type", "hour"], as_index=False).agg(
            n=("x", "size"), s1=("x", "sum"), s2=("x2", "sum"))
        for c in ("n", "s1", "s2"):
            g[c] = g[c].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False, schema=_schema)

    g = (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "hour"])
        .sum(["n", "s1", "s2"])
        .to_pandas()
        .rename(columns={"sum(n)": "n", "sum(s1)": "s1", "sum(s2)": "s2"})
    )
    n0 = int(g["n"].sum())
    s1g = int(g["s1"].sum())
    s2g = int(g["s2"].sum())

    n = g["n"].to_numpy(dtype=np.float64)
    s1 = g["s1"].to_numpy(dtype=np.float64)
    mu0 = float(s1g) / n0
    var0 = float(s2g) / n0 - mu0 * mu0
    az = np.abs((s1 / n - mu0) / np.sqrt(var0 / n))
    aa = az / np.sqrt(2.0)
    tt = 1.0 / (1.0 + 0.3275911 * aa)
    p = ((((1.061405429 * tt - 1.453152027) * tt + 1.421413741) * tt
          - 0.284496736) * tt + 0.254829592) * tt * np.exp(-aa * aa)
    g["p_e6"] = np.floor(p * 1e6 + 0.5).astype("int64")

    g = g.sort_values(["p_e6", "event_type", "hour"]).reset_index(drop=True)
    m = len(g)
    i = np.arange(1, m + 1, dtype=np.int64)
    p_e6 = g["p_e6"].to_numpy(dtype=np.int64)
    adj = np.minimum(1_000_000, p_e6 * m // i)
    g["padj_e6"] = np.minimum.accumulate(adj[::-1])[::-1].astype("int64")
    ok = p_e6 * m <= q_e6 * i
    k = int(i[ok].max()) if ok.any() else 0
    g["rejected"] = (i <= k).astype("int64")

    out = g[["event_type", "hour", "n", "p_e6", "padj_e6", "rejected"]]
    return (
        out.sort_values(["event_type", "hour"]).reset_index(drop=True)
        .astype({"hour": "int64", "n": "int64"})
    )


def token_ppmi_svd(sf_dir: str, vocab_size: int = 64, window: int = 2,
                   dims: int = 16) -> pd.DataFrame:
    """WORD-EMBEDDING TRAINING — count-based PPMI-SVD vectors (Levy &
    Goldberg 2014: SGNS factorizes a shifted PMI matrix; the explicit
    PPMI + truncated-SVD pipeline is its deterministic classical twin):
    token co-occurrence counts within a symmetric ``window`` over every
    document, positive pointwise mutual information, then rank-``dims``
    SVD with the singular-value-weighted left factors (U·√Σ) as the
    embeddings.  Fully deterministic — counts are exact integers under
    any parallelism, and each singular vector's sign is fixed
    (largest-|.| coordinate positive), so output is stable across runs
    and cluster sizes (rows-only contract entry; brute-force numpy twin
    in tests).

    Scale shape: pass 1 is the distributed token-count partial → tiny
    groupby → top-``vocab_size`` cut on the driver (count desc, token
    asc — the vocab table is the broadcast side, V strings); pass 2
    emits per-batch V×V co-occurrence partials as (a, b, c) rows — the
    batch's docs are CONCATENATED with a -1 separator so all window
    offsets vectorize as shifted-array pairs, no per-doc Python — into
    ONE (a, b) groupby whose result is ≤V² rows; PPMI + SVD are O(V²)
    driver math, independent of corpus size."""
    docs = rd.read_parquet(_t(sf_dir, "documents"), columns=["text"])

    def count_part(batch: pa.Table) -> pa.Table:
        toks: list[str] = []
        for t in batch.column("text").to_pylist():
            toks.extend((t or "").split())
        if not toks:
            return pa.table({"token": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64())})
        u, c = np.unique(np.asarray(toks, dtype=object), return_counts=True)
        return pa.table({"token": pa.array(list(u), pa.string()),
                         "c": pa.array(c.astype("int64"), pa.int64())})

    counts = (
        docs.map_batches(count_part, batch_format="pyarrow")
        .groupby("token").sum("c").to_pandas()
        .rename(columns={"sum(c)": "c"})
        .sort_values(["c", "token"], ascending=[False, True])
        .head(vocab_size).reset_index(drop=True)
    )
    vocab = counts["token"].tolist()
    vid = {t: i for i, t in enumerate(vocab)}
    V = len(vocab)
    if V == 0:
        return pd.DataFrame(columns=["token"] + [f"d{j}" for j in range(dims)])

    def cooc_part(batch: pa.Table) -> pa.Table:
        ids: list[int] = []
        for t in batch.column("text").to_pylist():
            ids.extend(vid.get(w, -1) for w in (t or "").split())
            ids.extend([-1] * window)  # window-wide separator: no offset
            # k <= window can pair tokens across the doc boundary
        a = np.asarray(ids, dtype=np.int64)
        mat = np.zeros((V, V), dtype=np.int64)
        for k in range(1, window + 1):
            if len(a) <= k:
                break
            x, y = a[:-k], a[k:]
            ok = (x >= 0) & (y >= 0)
            xf, yf = x[ok], y[ok]
            np.add.at(mat.ravel(), xf * V + yf, 1)
            np.add.at(mat.ravel(), yf * V + xf, 1)
        nz = np.nonzero(mat)
        return pa.table({
            "a": pa.array(nz[0].astype("int64"), pa.int64()),
            "b": pa.array(nz[1].astype("int64"), pa.int64()),
            "c": pa.array(mat[nz].astype("int64"), pa.int64()),
        })

    co = (
        docs.map_batches(cooc_part, batch_format="pyarrow")
        .groupby(["a", "b"]).sum("c").to_pandas()
        .rename(columns={"sum(c)": "c"})
    )
    M = np.zeros((V, V), dtype=np.float64)
    M[co["a"].to_numpy(), co["b"].to_numpy()] = co["c"].to_numpy()
    total = M.sum()
    ra = M.sum(axis=1)
    with np.errstate(divide="ignore", invalid="ignore"):
        pmi = np.log(M * total / np.outer(ra, ra))
    ppmi = np.where(np.isfinite(pmi) & (pmi > 0.0), pmi, 0.0)
    u, s, _ = np.linalg.svd(ppmi, full_matrices=False)
    d = min(dims, V)
    w = u[:, :d] * np.sqrt(s[:d])
    for j in range(d):
        i = int(np.argmax(np.abs(w[:, j])))
        if w[i, j] < 0:
            w[:, j] = -w[:, j]
    out = pd.DataFrame({"token": vocab})
    for j in range(dims):
        out[f"d{j}"] = np.round(w[:, j], 6) if j < d else 0.0
    return out.sort_values("token").reset_index(drop=True)


def events_dp_daily_release(sf_dir: str, eps_e3: int = 1000) -> pd.DataFrame:
    """DIFFERENTIAL-PRIVACY RELEASE — Laplace mechanism (Dwork et al.
    2006) over the daily event-count histogram: each exact count gets
    Laplace(Δf/ε) noise (Δf = 1 for a counting query) before release.
    The privacy audits (k-anonymity / l-diversity / t-closeness) FLAG
    risky groups; this op is the release side — the published table
    itself carries the ε-DP guarantee.  Noise is pseudo-random but
    DETERMINISTIC: u ∈ (0,1) is derived from blake2b("dp:" + day), so
    the release is reproducible across runs and cluster sizes (rows-only
    contract entry; the twin test replays the mechanism and checks the
    inverse-CDF algebra).  ε = eps_e3/1000; released counts are clamped
    at 0 and rounded to integers.

    Scale shape: exact counts via per-batch partials + one tiny
    groupby (the day domain is bounded); noise is a vectorized
    per-group transform on the result — no extra pass, no shuffle."""
    import hashlib

    ev = rd.read_parquet(_t(sf_dir, "events"), columns=["ts"])
    _schema = pa.schema([("day", pa.string()), ("n", pa.int64())])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df["ts"].dt.strftime("%Y-%m-%d").value_counts().sort_index()
        return pa.Table.from_pandas(
            pd.DataFrame({"day": g.index.astype(str), "n": g.to_numpy("int64")}),
            preserve_index=False, schema=_schema)

    g = (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby("day").sum("n").to_pandas()
        .rename(columns={"sum(n)": "n"})
        .sort_values("day").reset_index(drop=True)
    )
    eps = eps_e3 / 1000.0
    b = 1.0 / eps  # Laplace scale for sensitivity-1 counting
    u = np.array([
        (int.from_bytes(hashlib.blake2b(f"dp:{d}".encode(), digest_size=8).digest(),
                        "big") + 0.5) / 2.0 ** 64
        for d in g["day"]
    ])
    lap = -b * np.sign(u - 0.5) * np.log(1.0 - 2.0 * np.abs(u - 0.5))
    g["n_released"] = np.maximum(
        0, g["n"].to_numpy("int64") + np.floor(lap + 0.5).astype(np.int64))
    return g[["day", "n_released"]].astype({"n_released": "int64"})


def unigram_lm_vocab(sf_dir: str, vocab_size: int = 48,
                     max_piece_len: int = 5) -> pd.DataFrame:
    """TOKENIZER TRAINING — unigram language model (Kudo 2018, the
    SentencePiece algorithm): the PROBABILISTIC counterpart of
    :func:`bpe_vocab` — instead of greedy merges, an EM-fitted piece
    distribution pruned to ``vocab_size`` (single characters exempt so
    every word stays coverable).

    Scale shape: the corpus reduces to the vocabulary-bounded
    word → count table (shared :func:`_word_count_table` exchange);
    EM + pruning run driver-side over that bounded table with FIXED
    iteration order, so the vocabulary is identical under any batch or
    cluster layout.  Iterative EM is not SQL-expressible → rows-only;
    the kernel is pinned by determinism, coverage, and Viterbi-vs-brute
    twin tests.  Returns (rank, piece, logprob_e6)."""
    from ..functions.text import unigram_learn

    vocab = unigram_learn(
        _word_count_table(sf_dir), vocab_size=vocab_size,
        max_piece_len=max_piece_len,
    )
    return pd.DataFrame(
        {
            "rank": pd.Series(range(len(vocab)), dtype="int64"),
            "piece": [p for p, _ in vocab],
            "logprob_e6": pd.Series(
                [int(np.floor(lp * 1e6 + 0.5)) for _, lp in vocab], dtype="int64"
            ),
        }
    )


def unigram_encode_docs(sf_dir: str, vocab_size: int = 48,
                        max_piece_len: int = 5) -> pd.DataFrame:
    """TOKENIZATION PASS — Viterbi-segment every document with the
    trained unigram-LM vocabulary (the inference half of
    :func:`unigram_lm_vocab`, as :func:`bpe_encode_docs` is to
    :func:`bpe_vocab`): per-doc piece count, character count and the
    fertility ratio (pieces per whitespace word) that tokenizer
    evaluations report.

    Scale shape: the piece table is trained once (bounded), broadcast
    via ``ray.put``, and applied in one streaming ``map_batches`` pass
    with a per-actor memoised word → pieces cache (Zipf makes the cache
    hit rate the token frequency curve) — no shuffle, no driver data."""
    import ray

    from ..functions.text import unigram_learn, unigram_segment

    vocab = unigram_learn(
        _word_count_table(sf_dir), vocab_size=vocab_size,
        max_piece_len=max_piece_len,
    )
    vocab_ref = ray.put(dict(vocab))

    class _Encode:
        def __init__(self, ref) -> None:
            self.logp = ray.get(ref)
            self.memo: dict[str, int] = {}

        def __call__(self, batch: pa.Table) -> pa.Table:
            memo = self.memo
            logp = self.logp
            n_pieces = np.zeros(batch.num_rows, dtype=np.int64)
            n_words = np.zeros(batch.num_rows, dtype=np.int64)
            for r, text in enumerate(batch.column("text").to_pylist()):
                words = (text or "").split()
                n_words[r] = len(words)
                tot = 0
                for w in words:
                    k = memo.get(w)
                    if k is None:
                        k = memo[w] = len(
                            unigram_segment(w, logp, max_piece_len)
                        )
                    tot += k
                n_pieces[r] = tot
            return pa.table(
                {
                    "doc_id": batch["doc_id"],
                    "n_words": pa.array(n_words, pa.int64()),
                    "n_pieces": pa.array(n_pieces, pa.int64()),
                    "fertility_e4": pa.array(
                        np.where(
                            n_words > 0,
                            np.floor(n_pieces * 1e4 / np.maximum(n_words, 1) + 0.5),
                            0,
                        ).astype(np.int64),
                        pa.int64(),
                    ),
                }
            )

    docs = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    return (
        docs.map_batches(_Encode(vocab_ref), batch_format="pyarrow", concurrency=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def events_voptimal_histogram(sf_dir: str, n_buckets: int = 8) -> pd.DataFrame:
    """OPTIMIZER-STATISTICS CONSTRUCTION — V-optimal histogram (Jagadish
    et al. VLDB 1998): the ``n_buckets``-bucket partition of the value
    domain minimizing total within-bucket SSE (frequency variance) — the
    histogram class query optimizers build because equi-width/equi-depth
    buckets blur skew.  Dynamic program over bucket-boundary prefix sums
    with a deterministic smaller-split tie-break.

    Scale shape: the corpus reduces to an exact (quantized value →
    count) table via per-batch bincount partials + one tiny groupby (the
    domain, ≤ ~500 distinct ints here, bounded by the value range — the
    reduction every histogram builder uses); the O(B·D²) DP runs
    driver-side on that bounded table.  DP is not SQL-expressible →
    rows-only; twin test checks the DP against exhaustive enumeration on
    a coarse domain plus cost invariants."""
    ev = rd.read_parquet(_t(sf_dir, "events"), columns=["value"])

    def partial(batch: pa.Table) -> pa.Table:
        v = np.floor(
            batch.column("value").to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        u, c = np.unique(v, return_counts=True)
        return pa.table({"v": u, "c": c.astype("int64")})

    freq = (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby("v").sum("c").to_pandas()
        .rename(columns={"sum(c)": "c"})
        .sort_values("v").reset_index(drop=True)
    )
    v = freq["v"].to_numpy(dtype=np.float64)
    c = freq["c"].to_numpy(dtype=np.float64)
    D = len(v)
    B = min(n_buckets, D)
    # prefix sums → SSE of any [i, j) span in O(1):
    # sse = Σ c·v² − (Σ c·v)² / Σ c
    p0 = np.concatenate([[0.0], np.cumsum(c)])
    p1 = np.concatenate([[0.0], np.cumsum(c * v)])
    p2 = np.concatenate([[0.0], np.cumsum(c * v * v)])

    def sse(i: int, j: int) -> float:
        n = p0[j] - p0[i]
        if n <= 0:
            return 0.0
        s = p1[j] - p1[i]
        return (p2[j] - p2[i]) - s * s / n

    INF = float("inf")
    cost = np.full((B + 1, D + 1), INF)
    split = np.zeros((B + 1, D + 1), dtype=np.int64)
    cost[0, 0] = 0.0
    for b in range(1, B + 1):
        for j in range(b, D + 1):
            best, arg = INF, -1
            for i in range(b - 1, j):
                s = cost[b - 1, i] + sse(i, j)
                if s < best:  # strict ⇒ smallest split wins ties
                    best, arg = s, i
            cost[b, j] = best
            split[b, j] = arg
    bounds = [D]
    j = D
    for b in range(B, 0, -1):
        j = int(split[b, j])
        bounds.append(j)
    bounds = bounds[::-1]
    rows = []
    for b in range(B):
        i, j = bounds[b], bounds[b + 1]
        rows.append((
            b, int(v[i]), int(v[j - 1]), int(p0[j] - p0[i]),
            int(np.floor(sse(i, j) * 1e6 + 0.5)),
        ))
    return pd.DataFrame(
        rows, columns=["bucket", "lo", "hi", "n", "sse_e6"]
    ).astype({"bucket": "int64", "lo": "int64", "hi": "int64",
              "n": "int64", "sse_e6": "int64"})


def events_dgim_window(sf_dir: str, window_us: int = 7 * 86_400_000_000
                       ) -> pd.DataFrame:
    """STREAMING WINDOW SKETCH — DGIM (Datar, Gionis, Indyk & Motwani,
    SICOMP 2002): approximate the number of events per type in the
    trailing time window using O(log² W) exponentially-sized buckets
    instead of the raw stream, with the classic ≤ 50 % error guarantee
    (the true count is underestimated by at most half the oldest
    bucket).  The set-ops complement of the HLL/CMS/KLL sketch family —
    those summarize VALUES, DGIM summarizes a sliding WINDOW.

    Scale shape: per-type streams route through ONE event_type exchange;
    the sequential bucket-merge pass (the algorithm is one-pass by
    construction) runs inside each group, and only (type, approx, bound)
    rows reach the driver.  PARTITIONING ASSUMPTION: one type's stream
    fits its group task (the same per-key assumption every per-stream
    sketch makes); a hotter stream shards by time and merges bucket
    lists end-to-end.  Rows-only; the twin checks the guarantee against
    the exact trailing count and replays the bucket rule."""
    ev = rd.read_parquet(_t(sf_dir, "events"), columns=["event_type", "ts"])

    def run(g: pd.DataFrame) -> pd.DataFrame:
        from collections import deque

        ts = np.sort(g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64))
        end = int(ts[-1])
        cutoff = end - window_us
        # DGIM state: per size 2^k, a newest-first deque of bucket
        # timestamps (a bucket's ts = its most recent event); ≤2 per
        # size after each cascade merge — O(1) amortized per event, no
        # bucket-list rescans
        sizes: list[deque] = [deque()]
        for t in ts:
            sizes[0].appendleft(int(t))
            k = 0
            while len(sizes[k]) == 3:
                old2 = sizes[k].pop()  # oldest
                old1 = sizes[k].pop()  # second-oldest (newer of the two)
                del old2  # merged bucket keeps the NEWER timestamp
                if k + 1 == len(sizes):
                    sizes.append(deque())
                sizes[k + 1].appendleft(old1)
                k += 1
        live = sorted(
            ((t, 1 << k) for k, dq in enumerate(sizes) for t in dq
             if t >= cutoff),
            key=lambda b: -b[0],
        )
        if not live:
            approx = bound = 0
        else:
            oldest = live[-1][1]
            approx = sum(b[1] for b in live[:-1]) + oldest // 2 + (oldest & 1)
            bound = oldest // 2  # error ≤ half the straddling bucket
        exact = int((ts >= cutoff).sum())
        return pd.DataFrame(
            {"event_type": [g["event_type"].iloc[0]],
             "n_approx": [int(approx)], "err_bound": [int(bound)],
             "n_exact": [exact]}
        ).astype({"n_approx": "int64", "err_bound": "int64", "n_exact": "int64"})

    return (
        ev.groupby("event_type").map_groups(run, batch_format="pandas")
        .to_pandas().sort_values("event_type").reset_index(drop=True)
    )


def _matrix_profile_kernel(x: np.ndarray, m: int) -> tuple[np.ndarray, np.ndarray]:
    """Self-join z-normalized MATRIX PROFILE of one series: for every
    length-m subsequence, the distance to (and index of) its nearest
    neighbor outside the trivial-match exclusion zone |i−j| ≤ m//2.
    Full pairwise Gram-matrix formulation — d²(i,j) = ‖z_i‖² + ‖z_j‖²
    − 2·z_i·z_j via one matmul (the exact expansion, NOT the 2m(1−ρ)
    shortcut: constant σ=0 subsequences z-map to the ZERO vector with
    ‖z‖²=0, so two flat windows are distance 0 from each other, the
    convention the brute-force twin pins).  O(H²)
    memory/time in the series length — callers bound H (the hourly
    census), not the row count."""
    n = len(x) - m + 1
    S = np.lib.stride_tricks.sliding_window_view(
        x.astype(np.float64), m
    )
    mu = S.mean(axis=1)
    sd = S.std(axis=1)
    sd = np.where(sd == 0.0, 1.0, sd)
    Z = (S - mu[:, None]) / sd[:, None]
    nrm = (Z * Z).sum(axis=1)
    D = np.sqrt(np.maximum(nrm[:, None] + nrm[None, :] - 2.0 * (Z @ Z.T), 0.0))
    idx = np.arange(n)
    D[np.abs(idx[:, None] - idx[None, :]) <= m // 2] = np.inf
    return D.min(axis=1), D.argmin(axis=1)


def events_matrix_profile(sf_dir: str, window: int = 24) -> pd.DataFrame:
    """MATRIX PROFILE motif + discord discovery (Yeh et al., "Matrix
    Profile I", ICDM 2016) over each event_type's HOURLY mean-value
    series — the time-series-mining member of the analysis family
    (EWMA=smoothing, Holt=forecast, CUSUM=changepoint, MP=motifs):
    for every length-``window`` subsequence, the z-normalized distance
    to its nearest non-trivial neighbor (exclusion zone window//2);
    the global minimum of that profile is the top MOTIF pair (the
    series' most-repeated shape), the global maximum the top DISCORD
    (its most anomalous window).

    Scale shape: the data-sized pass is ONE (event_type × hour)-bounded
    exchange (per-batch integer combiners — the histogram-family domain
    contract; hourly mean frozen as floor-div of value_e2 sums, missing
    hours densified to 0); the O(H²) profile then walks the ≤|types|·|hours|
    census on the driver (H ≈ 720 here; at longer horizons the kernel
    swaps to STOMP's O(H²) time / O(H) memory streaming recurrence, the
    census exchange unchanged).  Rows-only; a brute-force per-window
    twin is pinned in tests.

    Returns one row per event_type: (event_type, n_hours, motif_a,
    motif_b, motif_dist_e6, discord_idx, discord_dist_e6) — indices are
    hour offsets from the type's first hour."""
    from .dedup import coarse_buckets

    ev = rd.read_parquet(_t(sf_dir, "events"), columns=["ts", "event_type", "value"])
    nb = coarse_buckets(ev.count(), rows_per_task=65536)
    schema = pa.schema([("event_type", pa.string()), ("hour", pa.int64()),
                        ("s", pa.int64()), ("n", pa.int64()), ("__b", pa.int64())])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["hour"] = (df["ts"].astype("int64") // 3_600_000_000).astype("int64")
        df["v"] = np.floor(df["value"].to_numpy() * 100.0 + 0.5).astype("int64")
        g = df.groupby(["event_type", "hour"], as_index=False).agg(
            s=("v", "sum"), n=("v", "size")
        )
        g["__b"] = (
            pd.util.hash_array(g["hour"].to_numpy()).astype("int64") % nb
        )
        return pa.Table.from_pandas(g, preserve_index=False, schema=schema)

    def hsum(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["event_type", "hour"], as_index=False)[["s", "n"]].sum()

    census = (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby("__b").map_groups(hsum, batch_format="pandas")
        .to_pandas().sort_values(["event_type", "hour"]).reset_index(drop=True)
    )
    cols = ["event_type", "n_hours", "motif_a", "motif_b", "motif_dist_e6",
            "discord_idx", "discord_dist_e6"]
    rows = []
    for et, g in census.groupby("event_type"):
        h = g["hour"].to_numpy(dtype=np.int64)
        lo, hi = int(h.min()), int(h.max())
        series = np.zeros(hi - lo + 1, dtype=np.int64)
        series[h - lo] = (g["s"].to_numpy() * 10_000) // g["n"].to_numpy()
        if len(series) < 2 * window:
            continue  # too short for one non-trivial neighbor
        prof, nn = _matrix_profile_kernel(series, window)
        finite = np.isfinite(prof)
        if not finite.any():
            continue
        mi = int(np.flatnonzero(finite)[np.argmin(prof[finite])])
        mj = int(nn[mi])
        di = int(np.flatnonzero(finite)[np.argmax(prof[finite])])
        rows.append(
            (et, len(series), min(mi, mj), max(mi, mj),
             int(np.floor(prof[mi] * 1e6 + 0.5)), di,
             int(np.floor(prof[di] * 1e6 + 0.5)))
        )
    out = pd.DataFrame(rows, columns=cols)
    if len(out) == 0:
        return pd.DataFrame({c: pd.Series(dtype=object if c == "event_type"
                                          else "int64") for c in cols})
    return (
        out.astype({c: "int64" for c in cols[1:]})
        .sort_values("event_type").reset_index(drop=True)
    )


def events_diff_in_diff(sf_dir: str) -> pd.DataFrame:
    """DIFFERENCE-IN-DIFFERENCES (Card & Krueger 1994 canon) — the
    pre/post × treated/control causal-effect estimator completing the
    experiment-analysis family (CUPED=variance reduction, propensity
    matching=selection, Shapley/Markov=attribution, DiD=natural
    experiment): arm = user_id % 2 (1 treated), period split after
    day 15 (the CUPED boundary), outcome = event value.  The estimate
    is DiD = (ȳ_T,post − ȳ_T,pre) − (ȳ_C,post − ȳ_C,pre).

    Scale shape: per-batch (arm × period) integer combiners (value
    frozen e2) → a 4-key groupby — nothing else moves; the closed form
    is evaluated in doubles with the same expression tree the DuckDB
    oracle uses ⇒ hash-exact.

    Returns one row per cell: (treated, post, n_events, mean_e6,
    did_e6) — did_e6 repeated on every row, ORDER BY treated, post."""
    from .dedup import coarse_buckets  # noqa: F401  (family convention)

    ev = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts", "value"])
    schema = pa.schema([("treated", pa.int64()), ("post", pa.int64()),
                        ("s", pa.int64()), ("n", pa.int64())])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = pd.DataFrame({
            "treated": (df["user_id"].to_numpy() % 2).astype("int64"),
            "post": (df["ts"].dt.day.to_numpy() > 15).astype("int64"),
            "s": np.floor(df["value"].to_numpy() * 100.0 + 0.5).astype("int64"),
        })
        agg = g.groupby(["treated", "post"], as_index=False).agg(
            s=("s", "sum"), n=("s", "size")
        )
        return pa.Table.from_pandas(agg, preserve_index=False, schema=schema)

    cells = (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby(["treated", "post"])
        .sum(["s", "n"])
        .to_pandas()
        .rename(columns={"sum(s)": "s", "sum(n)": "n"})
        .sort_values(["treated", "post"])
        .reset_index(drop=True)
    )
    mean = {}
    for _, r in cells.iterrows():
        mean[(int(r["treated"]), int(r["post"]))] = (
            float(r["s"]) / float(r["n"]) if r["n"] else 0.0
        )
    did = (mean.get((1, 1), 0.0) - mean.get((1, 0), 0.0)) - (
        mean.get((0, 1), 0.0) - mean.get((0, 0), 0.0)
    )
    cells["mean_e6"] = [
        int(np.floor(mean[(int(t), int(p))] * 1e4 + 0.5))
        for t, p in zip(cells["treated"], cells["post"])
    ]
    cells["did_e6"] = int(np.floor(did * 1e4 + 0.5))
    out = cells.rename(columns={"n": "n_events"})[
        ["treated", "post", "n_events", "mean_e6", "did_e6"]
    ]
    return out.astype("int64")


def events_ams_f2(sf_dir: str, groups: int = 6, per_group: int = 16) -> pd.DataFrame:
    """AMS "TUG-OF-WAR" SECOND-MOMENT SKETCH (Alon, Matias & Szegedy,
    STOC 1996) — the MOMENTS member completing the sketch family
    (HLL=cardinality, CMS=frequency, KLL=quantiles, DGIM=window,
    AMS=F2): per event_type, estimate F2 = Σ_u f_u² of the user
    frequency vector with k = groups·per_group sign counters
    X_i = Σ_u f_u·s_i(u), s_i(u) ∈ {±1} derived from one pinned
    fingerprint per user expanded k ways by splitmix64 (vectorized, no
    RNG, no per-counter hashing) — estimate = median over groups of the
    mean of X_i² (the paper's median-of-means).  The EXACT F2 rides along (one
    user-bounded exchange, the certified-bracket pattern the CMS
    join-size estimator uses) so the report carries its own error.

    Scale shape: the sketch pass is per-batch combiners emitting
    |types|·k partial rows (the X_i are linear, so partials sum) → one
    tiny groupby; the exact pass is one (event_type × user)-bounded
    exchange.  Both are census-bounded — event rows never move.
    Rows-only; a sequential replica + guarantee twin is pinned.

    Returns (event_type, f2_exact, f2_est, rel_err_e6)."""
    from ..functions.hashing import fingerprint64_batch
    from .dedup import coarse_buckets

    k = groups * per_group
    ev = rd.read_parquet(_t(sf_dir, "events"), columns=["event_type", "user_id"])
    nb = coarse_buckets(ev.count(), rows_per_task=65536)

    sk_schema = pa.schema([("event_type", pa.string()), ("i", pa.int64()),
                           ("x", pa.int64())])

    def _signs(users: np.ndarray) -> np.ndarray:
        """(|users| × k) ±1 matrix: one pinned fingerprint per user,
        splitmix64-expanded across the k counters — one blake2b pass +
        one vectorized mix, not k hash passes."""
        fp = fingerprint64_batch([str(u) for u in users])
        grid = _splitmix64(
            fp[:, None] + np.arange(1, k + 1, dtype=np.uint64)[None, :]
        )
        return (grid & np.uint64(1)).astype(np.int64) * 2 - 1

    def sk_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        rows = []
        for et, g in df.groupby("event_type"):
            users, counts = np.unique(g["user_id"].to_numpy(dtype=np.int64),
                                      return_counts=True)
            x = counts.astype(np.int64) @ _signs(users)  # (k,)
            rows.append(pd.DataFrame(
                {"event_type": et, "i": np.arange(k, dtype=np.int64), "x": x}
            ))
        out = (pd.concat(rows, ignore_index=True) if rows
               else pd.DataFrame({"event_type": [], "i": [], "x": []}))
        return pa.Table.from_pandas(out, preserve_index=False, schema=sk_schema)

    sk = (
        ev.map_batches(sk_partial, batch_format="pyarrow")
        .groupby(["event_type", "i"]).sum("x")
        .to_pandas().rename(columns={"sum(x)": "x"})
    )

    ex_schema = pa.schema([("event_type", pa.string()), ("user_id", pa.int64()),
                           ("n", pa.int64()), ("__b", pa.int64())])

    def ex_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby(["event_type", "user_id"], as_index=False).size()
        g = g.rename(columns={"size": "n"})
        g["__b"] = (g["user_id"].to_numpy() % nb).astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False, schema=ex_schema)

    def ex_merge(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby(["event_type", "user_id"], as_index=False)["n"].sum()
        m["f2"] = m["n"].to_numpy(dtype=np.int64) ** 2
        return m.groupby("event_type", as_index=False)["f2"].sum()

    exact = (
        ev.map_batches(ex_partial, batch_format="pyarrow")
        .groupby("__b").map_groups(ex_merge, batch_format="pandas")
        .to_pandas()
        .groupby("event_type", as_index=False)["f2"].sum()
    )

    rows = []
    for et, g in sk.groupby("event_type"):
        x = g.sort_values("i")["x"].to_numpy(dtype=np.int64)
        x2 = x * x
        means = [int(x2[j * per_group:(j + 1) * per_group].sum()) // per_group
                 for j in range(groups)]
        est = int(np.median(np.array(means, dtype=np.int64)))
        f2 = int(exact.loc[exact["event_type"] == et, "f2"].iloc[0])
        rel = abs(est - f2) / f2 if f2 else 0.0
        rows.append((et, f2, est, int(np.floor(rel * 1e6 + 0.5))))
    out = pd.DataFrame(rows, columns=["event_type", "f2_exact", "f2_est",
                                      "rel_err_e6"])
    return (
        out.astype({"f2_exact": "int64", "f2_est": "int64",
                    "rel_err_e6": "int64"})
        .sort_values("event_type").reset_index(drop=True)
    )


def _iforest_c(n: int) -> float:
    """Average unsuccessful-search path length in a BST of n nodes —
    the isolation-forest normalizer c(n) (Liu, Ting & Zhou 2008)."""
    if n <= 1:
        return 0.0
    h = float(np.log(n - 1)) + 0.5772156649015329
    return 2.0 * h - 2.0 * (n - 1) / n


def _iforest_build(sample: np.ndarray, tree_id: int, psi: int):
    """One deterministic iTree over ``sample`` (rows × features):
    feature choice and split point derive from the pinned fingerprint
    of (tree_id, node_id) — no RNG, so any executor builds the
    identical forest.  Returns flat arrays (feature, thresh, left,
    right, size); leaves have feature = −1."""
    from ..functions.hashing import fingerprint64

    max_depth = int(np.ceil(np.log2(max(psi, 2))))
    feat, thr, left, right, size = [], [], [], [], []

    def new_node():
        feat.append(-1)
        thr.append(0.0)
        left.append(-1)
        right.append(-1)
        size.append(0)
        return len(feat) - 1

    def build(rows: np.ndarray, depth: int) -> int:
        nid = new_node()
        size[nid] = len(rows)
        if len(rows) <= 1 or depth >= max_depth:
            return nid
        nf = sample.shape[1]
        f0 = fingerprint64(f"if:{tree_id}:{nid}:f") % nf
        chosen = -1
        for d in range(nf):  # deterministic cycle past constant features
            f = (f0 + d) % nf
            lo = float(sample[rows, f].min())
            hi = float(sample[rows, f].max())
            if hi > lo:
                chosen = f
                break
        if chosen < 0:
            return nid  # all-constant cell → leaf
        u = fingerprint64(f"if:{tree_id}:{nid}:s") / float(1 << 64)
        cut = lo + u * (hi - lo)
        go_l = sample[rows, chosen] < cut
        if not go_l.any() or go_l.all():  # cut == a boundary value
            go_l = sample[rows, chosen] <= lo
            # ADVICE r4: traversal routes with strict `< thr`, so the
            # stored threshold must be the smallest float ABOVE lo for
            # the scoring partition to match this build partition
            cut = float(np.nextafter(lo, np.inf))
            if go_l.all():
                return nid
        feat[nid] = chosen
        thr[nid] = cut
        left[nid] = build(rows[go_l], depth + 1)
        right[nid] = build(rows[~go_l], depth + 1)
        return nid

    build(np.arange(len(sample)), 0)
    return (np.array(feat, dtype=np.int64), np.array(thr, dtype=np.float64),
            np.array(left, dtype=np.int64), np.array(right, dtype=np.int64),
            np.array(size, dtype=np.int64))


def _iforest_paths(forest, X: np.ndarray) -> np.ndarray:
    """Mean path length of every row of X over the forest — vectorized
    level-synchronous traversal (one comparison per live point per
    level, ≤ log2(psi) levels per tree)."""
    total = np.zeros(len(X), dtype=np.float64)
    for feat, thr, left, right, size in forest:
        node = np.zeros(len(X), dtype=np.int64)
        depth = np.zeros(len(X), dtype=np.float64)
        while True:
            f = feat[node]
            live = f >= 0
            if not live.any():
                break
            idx = np.flatnonzero(live)
            fn = f[idx]
            go_l = X[idx, fn] < thr[node[idx]]
            node[idx] = np.where(go_l, left[node[idx]], right[node[idx]])
            depth[idx] += 1.0
        leaf_sz = size[node]
        adj = np.array([_iforest_c(int(s)) for s in leaf_sz])
        total += depth + adj
    return total / len(forest)


def events_isolation_forest(sf_dir: str, trees: int = 64, psi: int = 256,
                            topk: int = 20) -> pd.DataFrame:
    """ISOLATION FOREST anomaly scoring (Liu, Ting & Zhou, ICDM 2008)
    over per-event features (value, hour-of-day, day-of-week) — the
    ensemble member of the outlier family (HBOS=histogram, LOF=density,
    iForest=isolation): anomalies isolate in few random splits, so
    score = 2^(−E[path]/c(psi)).

    Determinism without RNG: the per-tree samples are the globally
    smallest trees·psi rows by pinned fingerprint of event_id (tree t
    takes rank slice [t·psi, (t+1)·psi)), and every split's feature and
    cut point derive from fingerprint(tree, node) — any cluster layout
    builds the identical forest.

    Scale shape: sampling is per-batch partial top-(trees·psi) merges
    (the IVF trainer's bounded-sample pattern); the forest (≤ trees·2psi
    flat nodes) broadcasts via ``ray.put`` into ONE streaming scoring
    pass emitting per-batch top-k candidates — events never move.
    Rows-only; a sequential-scorer twin + planted-outlier test pinned.

    Returns the topk most anomalous (event_id, score_e6), score DESC,
    event_id ASC on ties."""
    import ray

    from ..functions.hashing import fingerprint64_batch

    need = trees * psi
    ev = rd.read_parquet(_t(sf_dir, "events"), columns=["event_id", "ts", "value"])

    def _features(df: pd.DataFrame) -> np.ndarray:
        return np.column_stack([
            df["value"].to_numpy(dtype=np.float64),
            df["ts"].dt.hour.to_numpy().astype(np.float64),
            df["ts"].dt.dayofweek.to_numpy().astype(np.float64),
        ])

    def sample_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        h = fingerprint64_batch([str(e) for e in df["event_id"]])
        X = _features(df)
        keep = np.argsort(h)[:need]
        return pa.table({
            "h": pa.array(h[keep].view(np.int64)),
            "f0": pa.array(X[keep, 0]), "f1": pa.array(X[keep, 1]),
            "f2": pa.array(X[keep, 2]),
        })

    samp = (
        ev.map_batches(sample_partial, batch_format="pyarrow")
        .to_pandas()
    )
    samp["hu"] = samp["h"].to_numpy().view(np.uint64)
    samp = samp.sort_values("hu").head(need)
    S = samp[["f0", "f1", "f2"]].to_numpy(dtype=np.float64)
    n_trees = max(1, len(S) // psi)
    forest = [_iforest_build(S[t * psi:(t + 1) * psi], t, psi)
              for t in range(n_trees)]
    cp = _iforest_c(psi)
    forest_ref = ray.put(forest)

    def score_partial(batch: pa.Table) -> pa.Table:
        fo = ray.get(forest_ref)
        df = batch.to_pandas()
        path = _iforest_paths(fo, _features(df))
        score = np.power(2.0, -path / cp)
        k = min(topk, len(df))
        top = np.argsort(-score, kind="stable")[:k]
        return pa.table({
            "event_id": pa.array(df["event_id"].to_numpy()[top], pa.int64()),
            "score_e6": pa.array(
                np.floor(score[top] * 1e6 + 0.5).astype(np.int64)
            ),
        })

    cand = ev.map_batches(score_partial, batch_format="pyarrow").to_pandas()
    out = (
        cand.sort_values(["score_e6", "event_id"], ascending=[False, True])
        .head(topk).reset_index(drop=True)
        .astype({"event_id": "int64", "score_e6": "int64"})
    )
    return out


def purchase_cox_ph(sf_dir: str, iters: int = 8) -> pd.DataFrame:
    """COX PROPORTIONAL-HAZARDS regression (Cox, JRSS-B 1972; Breslow
    tie handling) for time-to-first-purchase — the REGRESSION member of
    the survival family (``purchase_survival_km`` is the nonparametric
    curve): covariates x1 = user_id % 2 (the experiment arm the DiD /
    CUPED ops use) and x2 = log1p(#view events), duration in whole days
    from the user's first event to first purchase, never-purchasers
    right-censored at the corpus max timestamp (the KM convention).

    Fit: Newton–Raphson on the Breslow partial log-likelihood, a fixed
    ``iters`` iterations from β = 0.  Risk-set sums S0 = Σ e^{xβ},
    S1 = Σ x·e^{xβ}, S2 = Σ xxᵀ·e^{xβ} come from reverse cumsums over
    users sorted by (duration DESC, user_id ASC) with tie groups read
    at their last index — fixed order ⇒ bitwise-deterministic floats.

    Scale shape: ONE user-bucket exchange reduces events to per-user
    (t_first, t_first_purchase, n_view) via per-batch MIN/MIN/SUM
    combiners; Newton walks the ≤|users| table on the driver (the
    bounded-census contract the CUPED / logreg ops document).
    Rows-only; a per-event-time risk-set-loop twin (gradient ≈ 0 at
    the fit, loglik equality) is pinned in tests.

    Returns one row per coefficient: (feature, beta_e6, se_e6,
    loglik_e6 repeated)."""
    from .dedup import coarse_buckets

    ev = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["user_id", "ts", "event_type"])
    nb = coarse_buckets(ev.count(), rows_per_task=65536)
    BIG = np.int64(2**62)
    schema = pa.schema([("user_id", pa.int64()), ("t0", pa.int64()),
                        ("tp", pa.int64()), ("tmax", pa.int64()),
                        ("nv", pa.int64()), ("__b", pa.int64())])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        t = df["ts"].astype("int64")
        is_p = (df["event_type"] == "purchase").to_numpy()
        is_v = (df["event_type"] == "view").to_numpy()
        g = pd.DataFrame({
            "user_id": df["user_id"], "t0": t,
            "tp": np.where(is_p, t, BIG), "tmax": t,
            "nv": is_v.astype("int64"),
        }).groupby("user_id", as_index=False).agg(
            t0=("t0", "min"), tp=("tp", "min"), tmax=("tmax", "max"),
            nv=("nv", "sum"),
        )
        g["__b"] = (g["user_id"].to_numpy() % nb).astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False, schema=schema)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("user_id", as_index=False).agg(
            t0=("t0", "min"), tp=("tp", "min"), tmax=("tmax", "max"),
            nv=("nv", "sum"),
        )

    users = (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby("__b").map_groups(merge, batch_format="pandas")
        .to_pandas().sort_values("user_id").reset_index(drop=True)
    )
    gmax = int(users["tmax"].max())
    event = (users["tp"].to_numpy(dtype=np.int64) < BIG)
    end = np.where(event, users["tp"].to_numpy(dtype=np.int64), gmax)
    dur = (end - users["t0"].to_numpy(dtype=np.int64)) // 86_400_000_000
    X = np.column_stack([
        (users["user_id"].to_numpy() % 2).astype(np.float64),
        np.log1p(users["nv"].to_numpy(dtype=np.float64)),
    ])
    beta, loglik, _g, H = _cox_newton(dur, event, X, users["user_id"].to_numpy(),
                                      iters=iters)
    se = np.sqrt(np.diag(np.linalg.inv(-H)))
    rows = [(f, int(np.floor(b * 1e6 + 0.5)), int(np.floor(s * 1e6 + 0.5)),
             int(np.floor(loglik * 1e6 + 0.5)))
            for f, b, s in zip(["arm", "log1p_views"], beta, se)]
    return pd.DataFrame(
        rows, columns=["feature", "beta_e6", "se_e6", "loglik_e6"]
    ).astype({"beta_e6": "int64", "se_e6": "int64", "loglik_e6": "int64"})


def _cox_newton(dur: np.ndarray, event: np.ndarray, X: np.ndarray,
                uid: np.ndarray, iters: int = 8):
    """Newton–Raphson on the Breslow partial log-likelihood.  Sorted
    (duration DESC, uid ASC); reverse-scan cumsums give the risk-set
    sums; tie groups read at their LAST index.  Returns (β, loglik,
    gradient, Hessian) at the final iterate."""
    order = np.lexsort((uid, -dur))
    d = dur[order]
    e = event[order]
    x = X[order]
    n, p = x.shape
    # index of the last row of each row's duration-tie group
    grp_end = np.searchsorted(-d, -d, side="right") - 1
    ev_idx = np.flatnonzero(e)
    beta = np.zeros(p)
    for _ in range(iters):
        w = np.exp(x @ beta)                      # (n,)
        s0 = np.cumsum(w)[grp_end[ev_idx]]
        s1 = np.cumsum(x * w[:, None], axis=0)[grp_end[ev_idx]]
        xx = x[:, :, None] * x[:, None, :] * w[:, None, None]
        s2 = np.cumsum(xx, axis=0)[grp_end[ev_idx]]
        mu = s1 / s0[:, None]
        grad = (x[ev_idx] - mu).sum(axis=0)
        H = -(s2 / s0[:, None, None]
              - mu[:, :, None] * mu[:, None, :]).sum(axis=0)
        beta = beta - np.linalg.solve(H, grad)
    w = np.exp(x @ beta)
    s0 = np.cumsum(w)[grp_end[ev_idx]]
    s1 = np.cumsum(x * w[:, None], axis=0)[grp_end[ev_idx]]
    xx = x[:, :, None] * x[:, None, :] * w[:, None, None]
    s2 = np.cumsum(xx, axis=0)[grp_end[ev_idx]]
    mu = s1 / s0[:, None]
    loglik = float((x[ev_idx] @ beta - np.log(s0)).sum())
    grad = (x[ev_idx] - mu).sum(axis=0)
    H = -(s2 / s0[:, None, None] - mu[:, :, None] * mu[:, None, :]).sum(axis=0)
    return beta, loglik, grad, H


def wordpiece_vocab(sf_dir: str, n_merges: int = 40) -> pd.DataFrame:
    """WORDPIECE tokenizer training (Schuster & Nakajima, ICASSP 2012 —
    the BERT tokenizer), completing the subword-trainer trio (BPE =
    count-greedy, unigram-LM = probabilistic prune, WordPiece =
    likelihood-gain greedy): merges maximize count(pair)/(count(l)·
    count(r)), scores compared as exact integer cross products.

    Scale shape: identical to the other two trainers — the corpus
    reduces to the SHARED vocabulary-bounded word-count exchange
    (``_word_count_table``); the merge loop is driver math on that
    bounded table.  Rows-only; a worked-example twin and an
    independence-from-batch-layout property ride the shared exchange's
    existing tests.

    Returns (rank, left, right, token, score_e9)."""
    from ..functions.text import wordpiece_learn

    merges = wordpiece_learn(_word_count_table(sf_dir), n_merges)
    return pd.DataFrame(
        {
            "rank": pd.Series(range(len(merges)), dtype="int64"),
            "left": [m[0] for m in merges],
            "right": [m[1] for m in merges],
            "token": [m[2] for m in merges],
            "score_e9": pd.Series([m[3] for m in merges], dtype="int64"),
        }
    )


def wordpiece_encode_docs(sf_dir: str, n_merges: int = 40) -> pd.DataFrame:
    """WordPiece ENCODE pass (greedy longest-match-first with ``##``
    continuations — the BERT runtime): per-doc word count, piece count,
    [UNK] count and fertility_e6, the statistic tokenizer evaluations
    report.

    Scale shape: train on the shared bounded exchange, broadcast the
    vocab set via ``ray.put``, ONE streaming pass with a per-batch
    word→pieces memo (Zipf makes the hit rate the frequency curve) —
    no shuffle.  Rows-only; the twin replays encode in pure Python and
    checks reconstruction."""
    import ray

    from ..functions.text import wordpiece_encode, wordpiece_learn

    wc = _word_count_table(sf_dir)
    merges = wordpiece_learn(wc, n_merges)
    vocab = {m[2] for m in merges}
    for w in wc:
        if w:
            vocab.add(w[0])
            vocab.update("##" + c for c in w[1:])
    vocab_ref = ray.put(vocab)

    def encode(batch: pa.Table) -> pa.Table:
        vb = ray.get(vocab_ref)
        memo: dict[str, tuple[int, int]] = {}
        ids, nw, npc, nu, fert = [], [], [], [], []
        for did, text in zip(batch["doc_id"].to_pylist(),
                             batch["text"].to_pylist()):
            words = [w for w in (text or "").split(" ") if w]
            pieces = 0
            unk = 0
            for w in words:
                if w not in memo:
                    ps = wordpiece_encode(w, vb)
                    memo[w] = (len(ps), sum(1 for p in ps if p == "[UNK]"))
                a, b = memo[w]
                pieces += a
                unk += b
            ids.append(did)
            nw.append(len(words))
            npc.append(pieces)
            nu.append(unk)
            fert.append(int(np.floor(pieces / len(words) * 1e6 + 0.5))
                        if words else 0)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_words": pa.array(nw, pa.int64()),
            "n_pieces": pa.array(npc, pa.int64()),
            "n_unk": pa.array(nu, pa.int64()),
            "fertility_e6": pa.array(fert, pa.int64()),
        })

    out = (
        rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
        .map_batches(encode, batch_format="pyarrow")
        .to_pandas()
    )
    return out.sort_values("doc_id").reset_index(drop=True)


def events_holtwinters_forecast(sf_dir: str) -> pd.DataFrame:
    """HOLT-WINTERS additive triple exponential smoothing (Winters
    1960) over each event type's daily-mean series, period 7 —
    completing the smoothing ladder (EWMA=level, Holt=+trend,
    Holt-Winters=+seasonality): α=1/2, β=γ=1/4 chosen so the WHOLE
    recursion runs in EXACT e6 integers with truncating division —

        L_t = (x_t − s_slot + L + B) tdiv 2
        B_t = (L_t − L + 3B) tdiv 4
        s_slot ← (x_t − L_t + 3·s_slot) tdiv 4      (slot = (t−1) mod 7)

    init after two full weeks: L = tdiv(Σweek1, 7), B = tdiv(Σweek2 −
    Σweek1, 49), s_i = x_i − L.  Truncation (not floor) matches
    DuckDB's ``//`` on negatives, so the recursive-CTE oracle is
    hash-exact with zero float ops anywhere.

    Scale shape: the |types|·|days| domain-bounded daily exchange
    (shared with Holt/CUSUM), then an O(days) driver fold.  Types with
    < 14 days are excluded on both sides.

    Returns 7 rows per type: (event_type, h, level_e6, trend_e6,
    forecast_e6) with forecast = L + h·B + s[(n+h−1) mod 7]."""
    ev = rd.read_parquet(_t(sf_dir, "events"), columns=["event_type", "ts", "value"])
    _schema = pa.schema(
        [("event_type", pa.string()), ("day", pa.timestamp("us")),
         ("s", pa.int64()), ("n", pa.int64())]
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["day"] = df["ts"].dt.floor("D")
        df["e2"] = np.floor(df["value"].to_numpy() * 100 + 0.5).astype("int64")
        g = df.groupby(["event_type", "day"], as_index=False).agg(
            s=("e2", "sum"), n=("e2", "size")
        )
        return pa.Table.from_pandas(g, preserve_index=False, schema=_schema)

    daily = (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "day"])
        .sum(["s", "n"])
        .to_pandas()
        .rename(columns={"sum(s)": "s", "sum(n)": "n"})
        .sort_values(["event_type", "day"])
    )
    rows = []
    for et, g in daily.groupby("event_type"):
        x = [
            _tdiv(int(s) * 10_000, int(n))
            for s, n in zip(g["s"], g["n"])
        ]  # daily mean, e6 ints (s is e2)
        n_days = len(x)
        if n_days < 14:
            continue
        lev = _tdiv(sum(x[0:7]), 7)
        tr = _tdiv(sum(x[7:14]) - sum(x[0:7]), 49)
        seas = [x[i] - lev for i in range(7)]
        for t in range(7, n_days):
            slot = t % 7
            l_new = _tdiv(x[t] - seas[slot] + lev + tr, 2)
            tr = _tdiv(l_new - lev + 3 * tr, 4)
            seas[slot] = _tdiv(x[t] - l_new + 3 * seas[slot], 4)
            lev = l_new
        for h in range(1, 8):
            rows.append((et, h, lev, tr,
                         lev + h * tr + seas[(n_days + h - 1) % 7]))
    return pd.DataFrame(
        rows, columns=["event_type", "h", "level_e6", "trend_e6",
                       "forecast_e6"]
    ).astype({"h": "int64", "level_e6": "int64", "trend_e6": "int64",
              "forecast_e6": "int64"})


def lineitem_huber_regression(sf_dir: str, iters: int = 5,
                              delta_e2: int = 135) -> pd.DataFrame:
    """HUBER M-ESTIMATION robust regression (Huber 1964) of
    extendedprice on quantity — completing the regression ladder
    (OLS = ``lineitem_price_regression``, Theil–Sen = median slope,
    Huber = bounded-influence IRLS): residuals beyond δ·σ get weight
    δσ/|r| instead of 1, so price outliers stop dominating the fit.

    Determinism at scale: every IRLS pass reduces the data to EXACT
    integer weighted moments (y in e2, weights in e4 — per-batch int64
    partials merged in arbitrary-precision Python ints, the
    ``lineitem_price_regression`` pattern), and the β update is the
    closed-form double expression over those integers — no
    float-summation order anywhere.  σ is frozen after the OLS pass
    (√(RSS/n), the standard one-step scale) so later passes need no
    distributed median.  ``iters`` fixed passes; each is one
    ``map_batches`` + driver merge.

    Rows-only; a numpy replica twin plus a bounded-influence property
    (Huber slope between Theil-Sen-ish trimmed and OLS extremes) is
    pinned in tests.  Returns one row: (slope_e6, intercept_e6,
    sigma_e2, n_down, n_rows)."""
    li = rd.read_parquet(_t(sf_dir, "lineitem"),
                         columns=["l_quantity", "l_extendedprice"])

    def moments(beta):
        """One weighted-moment pass at parameters beta (or None for the
        OLS pass): returns python-int (sw, swx, swy, swxx, swxy, n_down,
        n) merged from per-batch int64 partials."""
        b0_e2, b1_e6, sig_e2 = beta if beta else (0, 0, 0)

        def partial(batch: pa.Table) -> pa.Table:
            x = batch["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
            y = np.floor(
                batch["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0
                + 0.5
            ).astype(np.int64)
            if beta is None:
                w = np.full(len(x), 10_000, dtype=np.int64)
                down = np.zeros(len(x), dtype=bool)
            else:
                # residual in e2 units: r = y − (b0 + b1·x); b1 at e6 →
                # b1·x·1e-4 lands in e2 via truncating div (exact ints)
                r = y - (np.int64(b0_e2) + (np.int64(b1_e6) * x) // 10_000)
                ar = np.abs(r)
                thr = np.int64(delta_e2) * np.int64(sig_e2) // 100
                down = ar > thr
                w = np.where(
                    down,
                    np.maximum(1, thr * 10_000 // np.maximum(ar, 1)),
                    10_000,
                ).astype(np.int64)
            return pa.table({
                "sw": pa.array([int(w.sum())], pa.int64()),
                "swx": pa.array([int((w * x).sum())], pa.int64()),
                "swy": pa.array([int((w * y).sum())], pa.int64()),
                "swxx": pa.array([int((w * x * x).sum())], pa.int64()),
                "swxy": pa.array([int((w * x * y).sum())], pa.int64()),
                "nd": pa.array([int(down.sum())], pa.int64()),
                "n": pa.array([len(x)], pa.int64()),
            })

        parts = li.map_batches(partial, batch_format="pyarrow",
                               batch_size=2048).to_pandas()
        return [int(parts[c].astype(object).sum())
                for c in ["sw", "swx", "swy", "swxx", "swxy", "nd", "n"]]

    # pass 0: OLS (unit weights) + frozen scale from exact moments
    sw, swx, swy, swxx, swxy, _, n = moments(None)
    den = sw * swxx - swx * swx
    b1 = (sw * swxy - swx * swy) / den if den else 0.0
    b0 = (swy - b1 * swx) / sw
    # sigma² = Σw(y−ŷ)²/Σw from the same moments (all exact ints, final
    # float): Σw y² needed — recompute via the weighted identity instead:
    # RSS = Σwy² − b0Σwy − b1Σwxy ; Σwy² = 1e4·Σy² (unit pass) — Σy² can
    # exceed int64 at big sf, so derive sigma from a bounded SAMPLE-free
    # exact identity in python ints via a dedicated pass:
    def _rss_pass(b0f, b1f):
        b0_e2 = int(np.floor(b0f + 0.5))
        b1_e6 = int(np.floor(b1f * 10_000 + 0.5))

        def partial(batch: pa.Table) -> pa.Table:
            x = batch["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
            y = np.floor(
                batch["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0
                + 0.5
            ).astype(np.int64)
            r = y - (np.int64(b0_e2) + (np.int64(b1_e6) * x) // 10_000)
            # per-batch Σr² stays ≪ 2^63 at batch_size 2048 (r ≲ e7 e2
            # units ⇒ r² ≲ e14; ×2048 ≈ e17); cross-batch merge is
            # Python-int
            return pa.table({
                "rr": pa.array([int((r * r).sum())], pa.int64()),
                "n": pa.array([len(x)], pa.int64()),
            })

        parts = li.map_batches(partial, batch_format="pyarrow",
                               batch_size=2048).to_pandas()
        return (int(parts["rr"].astype(object).sum()),
                int(parts["n"].astype(object).sum()))

    rr, n = _rss_pass(b0, b1)
    sig_e2 = int(np.floor((rr / n) ** 0.5 + 0.5))  # residual RMS, e2 units
    n_down = 0
    for _ in range(iters):
        beta = (int(np.floor(b0 + 0.5)), int(np.floor(b1 * 10_000 + 0.5)),
                sig_e2)
        sw, swx, swy, swxx, swxy, n_down, n = moments(beta)
        den = sw * swxx - swx * swx
        b1 = (sw * swxy - swx * swy) / den if den else 0.0
        b0 = (swy - b1 * swx) / sw
    return pd.DataFrame({
        "slope_e6": [int(np.floor(b1 * 10_000 + 0.5))],
        "intercept_e6": [int(np.floor(b0 * 10_000 + 0.5))],
        "sigma_e2": [sig_e2],
        "n_down": [int(n_down)],
        "n_rows": [int(n)],
    }).astype("int64")


def events_kleinberg_bursts(sf_dir: str, s: float = 1.5,
                            gamma: float = 0.5) -> pd.DataFrame:
    """KLEINBERG BURST DETECTION (Kleinberg, KDD 2002) over each event
    type's arrival stream — the bursty-structure member of the temporal
    family (CUSUM=level shift, DGIM=window counts, MP=motifs,
    bursts=rate episodes): a 2-state automaton with base rate
    λ0 = (n−1)/T and burst rate λ1 = s·λ0 (defaults s=1.5, γ=0.5 — tuned so the
    near-Poisson synthetic streams still surface their genuine rate
    fluctuations as episodes); gap x costs
    λ_i·x − ln λ_i in state i, entering the burst state costs
    γ·ln(n); Viterbi (ties prefer the base state) segments the stream
    into maximal burst episodes.

    Scale shape: ONE event_type exchange; the per-type DP is O(n)
    sequential BY CONSTRUCTION (the documented per-key assumption the
    DGIM op states; hotter streams shard by time and stitch).
    Rows-only; a brute recursive-DP twin on synthetic streams plus a
    pipeline replica are pinned in tests.

    Returns one row per burst episode: (event_type, burst_idx,
    start_ts, end_ts, n_gaps)."""
    ev = rd.read_parquet(_t(sf_dir, "events"), columns=["event_type", "ts"])

    def per_type(g: pd.DataFrame) -> pd.DataFrame:
        et = g["event_type"].iloc[0]
        ts = np.sort(g["ts"].astype("int64").to_numpy())
        empty = pd.DataFrame({
            "event_type": pd.Series(dtype=object),
            "burst_idx": pd.Series(dtype="int64"),
            "start_ts": pd.Series(dtype="int64"),
            "end_ts": pd.Series(dtype="int64"),
            "n_gaps": pd.Series(dtype="int64"),
        })
        n = len(ts)
        if n < 3 or ts[-1] == ts[0]:
            return empty
        gaps = np.diff(ts) / 1e6  # seconds
        gaps = np.maximum(gaps, 1e-9)
        T = (ts[-1] - ts[0]) / 1e6
        lam0 = (n - 1) / T
        lam1 = s * lam0
        enter = gamma * np.log(n)
        c0, c1 = 0.0, np.inf  # start in base state
        back = np.empty((len(gaps), 2), dtype=np.int8)
        for i, x in enumerate(gaps):
            e0 = lam0 * x - np.log(lam0)
            e1 = lam1 * x - np.log(lam1)
            # ties prefer base state (strict < for the burst branch)
            n0 = min(c0, c1) + e0
            back[i, 0] = 0 if c0 <= c1 else 1
            n1 = min(c0 + enter, c1) + e1
            back[i, 1] = 1 if c1 <= c0 + enter else 0
            c0, c1 = n0, n1
        state = 0 if c0 <= c1 else 1
        states = np.empty(len(gaps), dtype=np.int8)
        for i in range(len(gaps) - 1, -1, -1):
            states[i] = state
            state = back[i, state]
        rows = []
        i = 0
        while i < len(states):
            if states[i] == 1:
                j = i
                while j + 1 < len(states) and states[j + 1] == 1:
                    j += 1
                rows.append((et, len(rows), int(ts[i]), int(ts[j + 1]),
                             j - i + 1))
                i = j + 1
            i += 1
        if not rows:
            return empty
        return pd.DataFrame(rows, columns=["event_type", "burst_idx",
                                           "start_ts", "end_ts", "n_gaps"])

    out = (
        ev.groupby("event_type")
        .map_groups(per_type, batch_format="pandas")
        .to_pandas()
    )
    if len(out) == 0:
        return pd.DataFrame({
            "event_type": pd.Series(dtype=object),
            "burst_idx": pd.Series(dtype="int64"),
            "start_ts": pd.Series(dtype="int64"),
            "end_ts": pd.Series(dtype="int64"),
            "n_gaps": pd.Series(dtype="int64"),
        })
    return (
        out.astype({"burst_idx": "int64", "start_ts": "int64",
                    "end_ts": "int64", "n_gaps": "int64"})
        .sort_values(["event_type", "burst_idx"]).reset_index(drop=True)
    )


def events_sinkhorn_ot(sf_dir: str, bins: int = 20, eps: float = 0.05,
                       iters: int = 200) -> pd.DataFrame:
    """ENTROPIC OPTIMAL TRANSPORT between event types (Sinkhorn
    iterations, Cuturi NeurIPS 2013) — the OT member of the
    distribution-distance family (KS=sup gap, PSI=binned log-ratio,
    t-closeness=ordered EMD, OT=full transport geometry): each type's
    value distribution quantizes to a ``bins``-bin histogram over the
    global range; every unordered type pair gets (a) the exact 1-D
    Wasserstein-1 distance (the |CDF_a − CDF_b| cumsum closed form)
    and (b) the Sinkhorn distance <P, C> after ``iters`` u/v scalings
    at regularization ``eps`` — the scalable approximation whose gap
    vs the exact EMD the report itself exposes.

    Scale shape: ONE (type × bin)-bounded histogram exchange
    (per-batch bincount combiners — the histogram-family contract);
    the |types|²·bins² Sinkhorn is driver math on that census.
    Deterministic: fixed iteration count, fixed matrix, sequential
    driver fold.  Rows-only; twin checks marginal feasibility,
    symmetry, and Sinkhorn ≥ exact-EMD-minus-tolerance (entropic bias
    is upward at <P,C> for matched marginals).

    Returns (type_a, type_b, emd_e6, sinkhorn_e6, gap_e6)."""
    from .dedup import coarse_buckets

    ev = rd.read_parquet(_t(sf_dir, "events"), columns=["event_type", "value"])
    nb = coarse_buckets(ev.count(), rows_per_task=65536)
    gmin, gmax = 0.0, 100.0  # events.value domain is [0, 100) by schema
    schema = pa.schema([("event_type", pa.string()), ("bin", pa.int64()),
                        ("n", pa.int64()), ("__b", pa.int64())])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        v = df["value"].to_numpy(dtype=np.float64)
        b = np.clip(((v - gmin) / (gmax - gmin) * bins).astype(np.int64),
                    0, bins - 1)
        g = pd.DataFrame({"event_type": df["event_type"], "bin": b}).groupby(
            ["event_type", "bin"], as_index=False).size().rename(
            columns={"size": "n"})
        g["__b"] = (g["bin"].to_numpy() % nb).astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False, schema=schema)

    census = (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(lambda g: g.groupby(["event_type", "bin"],
                                        as_index=False)["n"].sum(),
                    batch_format="pandas")
        .to_pandas()
    )
    types = sorted(census["event_type"].unique())
    hist = {}
    for et in types:
        h = np.zeros(bins, dtype=np.float64)
        sub = census[census["event_type"] == et]
        h[sub["bin"].to_numpy()] = sub["n"].to_numpy()
        hist[et] = h / h.sum()
    # cost: normalized bin distance
    i = np.arange(bins)
    C = np.abs(i[:, None] - i[None, :]) / (bins - 1)
    K = np.exp(-C / eps)
    rows = []
    for ai in range(len(types)):
        for bi in range(ai + 1, len(types)):
            a, b = hist[types[ai]], hist[types[bi]]
            # exact 1-D W1: integral of |CDF gap|, in bin-distance units
            emd = float(np.abs(np.cumsum(a - b)[:-1]).sum()) / (bins - 1)
            u = np.ones(bins)
            v = np.ones(bins)
            for _ in range(iters):
                u = a / np.maximum(K @ v, 1e-300)
                v = b / np.maximum(K.T @ u, 1e-300)
            P = u[:, None] * K * v[None, :]
            sink = float((P * C).sum())
            emd_e6 = int(np.floor(emd * 1e6 + 0.5))
            sink_e6 = int(np.floor(sink * 1e6 + 0.5))
            rows.append((types[ai], types[bi], emd_e6, sink_e6,
                         sink_e6 - emd_e6))
    return pd.DataFrame(
        rows, columns=["type_a", "type_b", "emd_e6", "sinkhorn_e6", "gap_e6"]
    ).astype({"emd_e6": "int64", "sinkhorn_e6": "int64", "gap_e6": "int64"})


def events_platt_calibration(sf_dir: str, iters: int = 25) -> pd.DataFrame:
    """PLATT SCALING (Platt 1999) of P(event_type = 'purchase' | value)
    — the PARAMETRIC calibration twin of
    :func:`events_isotonic_calibration` (sigmoid σ(a·v + b) vs PAVA's
    monotone step curve), with Platt's prior-smoothed targets
    t+ = (N₊+1)/(N₊+2), t− = 1/(N₋+2) so the fit never saturates.

    Scale shape: the SAME domain-bounded (v_e2 → n, n_purchase)
    exchange the isotonic op uses; the 2-parameter Newton then runs on
    the driver over ≤|domain| bins — fixed ``iters`` iterations from
    (a, b) = (0, ln(N₊/N₋)), deterministic double arithmetic in fixed
    bin order.  Rows-only; the twin checks the replica, a stationary
    gradient, and that binned sigmoid predictions track empirical
    purchase rates.

    Returns one row per distinct v_e2: (v_e2, n, n_pos, p_e9) plus the
    fitted (a_e9, b_e9) repeated."""
    from .dedup import coarse_buckets

    ev = rd.read_parquet(_t(sf_dir, "events"), columns=["event_type", "value"])
    nb = coarse_buckets(ev.count(), rows_per_task=65536)
    schema = pa.schema([("v_e2", pa.int64()), ("n", pa.int64()),
                        ("s", pa.int64()), ("__b", pa.int64())])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["v_e2"] = np.floor(df["value"].to_numpy() * 100 + 0.5).astype("int64")
        df["pos"] = (df["event_type"] == "purchase").astype("int64")
        g = df.groupby("v_e2", as_index=False).agg(n=("pos", "size"),
                                                   s=("pos", "sum"))
        g["__b"] = (g["v_e2"].to_numpy() % nb).astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False, schema=schema)

    hist = (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(lambda g: g.groupby("v_e2", as_index=False)[["n", "s"]].sum(),
                    batch_format="pandas")
        .to_pandas().sort_values("v_e2").reset_index(drop=True)
    )
    a, b, hist = _platt_newton(hist, iters=iters)
    v = hist["v_e2"].to_numpy(dtype=np.float64) / 100.0
    p = 1.0 / (1.0 + np.exp(-(a * v + b)))
    out = hist.rename(columns={"s": "n_pos"})[["v_e2", "n", "n_pos"]].copy()
    out["p_e9"] = np.floor(p * 1e9 + 0.5).astype("int64")
    out["a_e9"] = int(np.floor(a * 1e9 + 0.5))
    out["b_e9"] = int(np.floor(b * 1e9 + 0.5))
    return out.astype({c: "int64" for c in out.columns if c != "event_type"})


def _platt_newton(hist: pd.DataFrame, iters: int = 25):
    """Newton on Platt's smoothed-target cross-entropy over the binned
    census: weights n per bin, targets t = (s·t₊ + (n−s)·t₋)/n folded
    per bin (equivalent to per-row targets since the loss is linear in
    t).  Returns (a, b, hist)."""
    n = hist["n"].to_numpy(dtype=np.float64)
    s = hist["s"].to_numpy(dtype=np.float64)
    v = hist["v_e2"].to_numpy(dtype=np.float64) / 100.0
    npos, nneg = float(s.sum()), float((n - s).sum())
    tpos = (npos + 1.0) / (npos + 2.0)
    tneg = 1.0 / (nneg + 2.0)
    t = (s * tpos + (n - s) * tneg) / n  # per-bin mean target
    a, b = 0.0, float(np.log((npos + 1.0) / (nneg + 1.0)))
    for _ in range(iters):
        z = a * v + b
        p = 1.0 / (1.0 + np.exp(-z))
        w = n * p * (1.0 - p)
        g = n * (p - t)
        ga, gb = float((g * v).sum()), float(g.sum())
        haa = float((w * v * v).sum()) + 1e-12
        hab = float((w * v).sum())
        hbb = float(w.sum()) + 1e-12
        det = haa * hbb - hab * hab
        da = (gb * hab - ga * hbb) / det
        db = (ga * hab - gb * haa) / det
        a, b = a + da, b + db
    return a, b, hist
