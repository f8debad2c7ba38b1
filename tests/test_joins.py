"""Join-strategy equivalence: the built-in Dataset.join (ray-managed
hash shuffle) must agree row-for-row with the explicit bucketed
shuffle_join and the broadcast join on the same inputs."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data as rd

from opps_feedcrawler_ray.functions.joins import (
    broadcast_join,
    builtin_join,
    shuffle_join,
)


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_join_strategies_agree(ray_session):
    left = rd.from_arrow(
        pa.table({"k": list(range(40)) * 2, "lv": list(range(80))})
    )
    right_tbl = pa.table({"k": list(range(0, 60, 2)), "rv": list(range(30))})
    right = rd.from_arrow(right_tbl)

    built = _norm(builtin_join(left, right, on="k", num_partitions=4).to_pandas())
    shuffled = _norm(shuffle_join(left, right, on="k", num_buckets=4).to_pandas())
    broadcast = _norm(
        broadcast_join(left, right_tbl.to_pandas(), on="k").to_pandas()
    )
    for other, name in ((shuffled, "shuffle"), (broadcast, "broadcast")):
        assert list(built.columns) == list(other.columns), name
        pd.testing.assert_frame_equal(
            built.astype("int64"), other.astype("int64"), check_dtype=False
        )
    # inner-join cardinality: keys 0..38 even → 20 matches × 2 dups = 40
    assert len(built) == 40


def test_sessionize_salted_equals_plain(ray_session):
    """The day-partitioned boundary-merge sessionize must equal the
    single-group-per-user version exactly (same oracle either way)."""
    import pandas as pd

    from opps_feedcrawler_ray.pipelines.streaming import sessionize, sessionize_salted

    sf = "/root/testdata/sf0.01"
    plain = sessionize(sf).sort_values("user_id").reset_index(drop=True)
    salted = sessionize_salted(sf).sort_values("user_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        plain[["user_id", "n_sessions", "n_events"]],
        salted[["user_id", "n_sessions", "n_events"]],
    )


def test_salted_per_user_family_equals_plain(ray_session):
    """Round-3 de-skew family: the day-partitioned + boundary-row
    variants of user_event_seq / events_lag_delta / asof_last_purchase
    must equal their single-group-per-user twins exactly (the salted
    forms share their oracles)."""
    import pandas as pd

    from opps_feedcrawler_ray.pipelines import analytics as A
    from opps_feedcrawler_ray.pipelines import streaming as S

    sf = "/root/testdata/sf0.01"
    for plain_fn, salted_fn in (
        (A.user_event_seq, S.user_event_seq_salted),
        (A.events_lag_delta, S.events_lag_delta_salted),
        (S.asof_last_purchase, S.asof_last_purchase_salted),
    ):
        plain = plain_fn(sf).sort_values("event_id").reset_index(drop=True)
        salted = salted_fn(sf).sort_values("event_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(plain[sorted(plain.columns)],
                                      salted[sorted(salted.columns)])


def test_skew_split_join_equals_shuffle(ray_session):
    """Hot/cold split must be invisible: skew_split_join == shuffle_join
    on a corpus with a genuine mega-key, at thresholds that exercise
    all-hot, mixed, and all-cold splits."""
    import numpy as np

    from opps_feedcrawler_ray.functions.joins import skew_split_join

    rng = np.random.default_rng(7)
    keys = np.concatenate([np.full(500, 3), rng.integers(0, 40, 300)])  # key 3 is hot
    left = rd.from_arrow(
        pa.table({"k": pa.array(keys, pa.int64()),
                  "lv": pa.array(np.arange(len(keys)), pa.int64())})
    )
    right = pd.DataFrame({"k": np.arange(40, dtype="int64"),
                          "name": [f"dim{i}" for i in range(40)]})
    want = _norm(shuffle_join(left, rd.from_pandas(right), on="k", num_buckets=4).to_pandas())
    for thr in (0, 100, 10**9):  # all-hot / mixed / all-cold
        got = _norm(skew_split_join(left, right, on="k", hot_threshold=thr,
                                    num_buckets=4).to_pandas())
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_skew_split_join_routes_hot_key_mapside(ray_session):
    """At threshold 100 exactly one key is hot (the 500-row mega-key):
    the histogram split is what the docstring claims."""
    import numpy as np

    import ray
    from opps_feedcrawler_ray.functions import joins as J

    rng = np.random.default_rng(7)
    keys = np.concatenate([np.full(500, 3), rng.integers(0, 40, 300)])
    left = rd.from_arrow(pa.table({"k": pa.array(keys, pa.int64())}))

    def key_partial(batch):
        return batch.groupby(["k"], as_index=False).agg(__n=("k", "size"))

    hist = (
        left.map_batches(key_partial, batch_format="pandas")
        .groupby("k").sum("__n").to_pandas()
    )
    hot = set(hist.loc[hist["sum(__n)"] > 100, "k"].tolist())
    assert hot == {3}


def test_sort_merge_join_matches_pandas_and_is_range_ordered(ray_session):
    from opps_feedcrawler_ray.functions.joins import sort_merge_join

    SF = "/root/testdata/sf0.001"
    li = rd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey", "l_quantity"])
    o = rd.read_parquet(f"{SF}/orders.parquet",
                        columns=["o_orderkey", "o_orderpriority"]).map_batches(
        lambda b: b.rename_columns(["l_orderkey", "o_orderpriority"]),
        batch_format="pyarrow",
    )
    got = sort_merge_join(li, o, on="l_orderkey", n_ranges=7).to_pandas()
    ldf = pd.read_parquet(f"{SF}/lineitem.parquet",
                          columns=["l_orderkey", "l_quantity"])
    odf = pd.read_parquet(f"{SF}/orders.parquet",
                          columns=["o_orderkey", "o_orderpriority"]).rename(
        columns={"o_orderkey": "l_orderkey"})
    exp = ldf.merge(odf, on="l_orderkey", how="inner")
    key = ["l_orderkey", "l_quantity", "o_orderpriority"]
    pd.testing.assert_frame_equal(
        got.sort_values(key).reset_index(drop=True)[key],
        exp.sort_values(key).reset_index(drop=True)[key],
        check_dtype=False,
    )
    assert len(got) == len(exp) > 0
