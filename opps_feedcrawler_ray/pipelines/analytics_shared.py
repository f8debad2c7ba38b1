"""Shared table-path / order-statistic / hashing helpers.

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


def _t(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


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


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    z = x
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _tdiv(a: int, b: int) -> int:
    """Integer division truncating toward zero — DuckDB's ``//``
    semantics (Python's ``//`` floors), so oracle comparisons of
    negative rationals are exact."""
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q
