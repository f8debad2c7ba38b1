"""Text, token, retrieval and language-analysis operators over the documents table.

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
