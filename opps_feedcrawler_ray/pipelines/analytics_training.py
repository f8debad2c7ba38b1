"""Training-data preparation, ML fitting, tokenizer training and privacy operators.

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
    _word_count_table,
    order_stat,
)


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
