"""Statistics, hypothesis tests, time-series, sketches and sampling over value columns.

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
    _event_value_hist,
    _splitmix64,
    _t,
    _tdiv,
    order_stat,
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


def sample_docs(sf_dir: str) -> rd.Dataset:
    """O4: seeded sampling (rows-only check — sampling is engine-defined)."""
    return rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "lang"]).random_sample(
        0.2, seed=42
    )


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
