"""Flagship crawl over a pages table derived from the driver's
``documents`` testdata (SURVEY.md §3.2 E2): deterministic, hermetic, and
scale-proportional (sf0.001 → small corpus, sf0.1 → bench corpus).

Derivation (id-pure, like sources/corpus.py):
  * host   = ``h{doc_id % n_hosts}.example``  (16 hosts)
  * path   = ``/priv/{doc_id}`` when doc_id % 13 == 7 (robots-blocked),
             else ``/d/{doc_id}``
  * html   = title + the document's text wrapped in <p> + script block +
             6 deterministic outlinks to other doc ids (messy forms)
  * text   = FROZEN extractor output over that html (golden invariant)
  * plus one root page + one robots.txt per host (``Disallow: /priv/``)
  * seeds  = the 16 host roots
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from ..functions.extract import extract_text
from ..schemas import PAGES, SEEDS
from .crawl import CrawlConfig, crawl

N_HOSTS = 16
N_LINKS = 6
EPOCH_US = 1_704_067_200_000_000


def _url(doc_id: int) -> str:
    host = f"h{doc_id % N_HOSTS}.example"
    path = f"/priv/{doc_id}" if doc_id % 13 == 7 else f"/d/{doc_id}"
    return f"http://{host}{path}"


def _messy(doc_id: int, variant: int) -> str:
    host = f"h{doc_id % N_HOSTS}.example"
    path = f"/priv/{doc_id}" if doc_id % 13 == 7 else f"/d/{doc_id}"
    v = variant % 3
    if v == 0:
        return f"HTTP://{host.upper()}{path}"
    if v == 1:
        return f"http://{host}:80{path}"
    return f"http://{host}/.{path}"


def build_pages_from_documents(documents_path: str, out_dir: str) -> dict[str, str]:
    """documents.parquet → pages_parquet/ dir + seeds.parquet (idempotent).
    The derived pages corpus is sorted and written BY RAY (streaming) —
    no driver-side materialization of the corpus (VERDICT r1 item 6)."""
    pages_dir = os.path.join(out_dir, "pages_parquet")
    seeds_path = os.path.join(out_dir, "seeds.parquet")
    done = os.path.join(pages_dir, "_DONE")
    if os.path.exists(done) and os.path.exists(seeds_path):
        return {"pages": pages_dir, "seeds": seeds_path}
    shutil.rmtree(pages_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)

    n_docs = pq.read_metadata(documents_path).num_rows

    def build(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        langs = batch["lang"].to_pylist()
        urls, tss, htmls, outs = [], [], [], []
        for i, (did, body, lang) in enumerate(zip(ids, texts, langs)):
            targets = [(did * 37 + 11 * k + 1) % n_docs for k in range(N_LINKS)]
            anchors = "".join(
                f'<a href="{_messy(t, did + k)}">ref {k}</a>' for k, t in enumerate(targets)
            )
            html = (
                f"<html><head><title>Doc {did}</title><script>t({did});</script></head>"
                f"<body><h1>Document {did}</h1><p>{body}</p><div>{anchors}</div></body></html>"
            ).encode()
            urls.append(_url(did))
            tss.append(EPOCH_US + did * 1_000_000)
            htmls.append(html)
            outs.append(extract_text(urls[-1], html))
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(tss, pa.timestamp("us")),
                "html": pa.array(htmls, pa.binary()),
                "text": pa.array(outs, pa.string()),
                "lang": pa.array(langs, pa.string()),
            },
            schema=PAGES,
        )

    # derive → sort → write entirely inside Ray Data (streaming; the
    # corpus never lands on the driver)
    (
        rd.read_parquet(documents_path, columns=["doc_id", "text", "lang"])
        .map_batches(build, batch_format="pyarrow", batch_size=2048)
        .sort("warc_ts")
        .write_parquet(pages_dir)
    )

    # host roots + robots
    urls, tss, htmls, texts, langs = [], [], [], [], []
    for h in range(N_HOSTS):
        root_targets = [(h * 53 + 17 * k + 3) % n_docs for k in range(N_LINKS)]
        anchors = "".join(
            f'<a href="{_messy(t, h + k)}">hub {k}</a>' for k, t in enumerate(root_targets)
        )
        root_html = (
            f"<html><head><title>h{h} home</title></head>"
            f"<body><h1>h{h}.example</h1><div>{anchors}</div></body></html>"
        ).encode()
        for url, html in (
            (f"http://h{h}.example/", root_html),
            (f"http://h{h}.example/robots.txt", b"User-agent: *\nDisallow: /priv/\n"),
        ):
            urls.append(url)
            tss.append(EPOCH_US - 10_000_000 + len(urls) * 1_000)
            htmls.append(html)
            texts.append(extract_text(url, html))
            langs.append("en")
    extra = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        },
        schema=PAGES,
    )
    pq.write_table(extra, os.path.join(pages_dir, "000_roots_robots.parquet"))
    seeds = pa.table(
        {
            "url": pa.array([f"http://h{h}.example/" for h in range(N_HOSTS)], pa.string()),
            "priority": pa.array([1.0] * N_HOSTS, pa.float64()),
        },
        schema=SEEDS,
    )
    pq.write_table(seeds, seeds_path)
    with open(done, "w") as f:
        f.write("ok")
    return {"pages": pages_dir, "seeds": seeds_path}


def crawl_documents(
    sf_dir: str,
    work_dir: str | None = None,
    politeness_budget: int = 32,
    num_frontier_actors: int = 4,
    num_buckets: int = 16,
    checkpoint_every: int = 4,
) -> rd.Dataset:
    """Derive a pages corpus from sf_dir's documents table, crawl it,
    return the crawl log as a Dataset (sorted by fetch_seq)."""
    sf_tag = os.path.basename(os.path.normpath(sf_dir))
    work = work_dir or f"/tmp/opps_feedcrawler_ray/webpipe-{sf_tag}"
    paths = build_pages_from_documents(os.path.join(sf_dir, "documents.parquet"),
                                       os.path.join(work, "corpus"))
    cfg = CrawlConfig(
        pages_path=paths["pages"],
        seeds_path=paths["seeds"],
        out_dir=os.path.join(work, "out"),
        num_frontier_actors=num_frontier_actors,
        politeness_budget=politeness_budget,
        num_buckets=num_buckets,
        checkpoint_every=checkpoint_every,
    )
    crawl(cfg)
    import glob

    files = sorted(glob.glob(os.path.join(cfg.out_dir, "crawl_log", "round=*", "*.parquet")))
    return rd.read_parquet(files).sort("fetch_seq")


def host_link_graph(sf_dir: str, work_dir: str | None = None):
    """Host→host LINK GRAPH over the derived pages corpus — the classic
    Common-Crawl webgraph derivative: parse every doc page's anchors with
    the frozen extractor, canonicalize the messy href forms
    (HTTP://UPPER, :80, /./ dot-segments), and reduce to (src_host,
    dst_host) edge counts via per-batch combiners + one ≤|hosts|²-key
    groupby.  The corpus' links are id-arithmetic ((doc·37+11k+1) mod n,
    k<6, provably distinct per page so the extractor's within-page dedup
    drops nothing), which makes the whole parse→canonicalize→aggregate
    composition checkable against a closed-form SQL oracle."""
    import pandas as pd

    from ..functions.extract import parse_links
    from ..functions.urlnorm import canonicalize_batch, extract_host

    sf_tag = os.path.basename(os.path.normpath(sf_dir))
    work = work_dir or f"/tmp/opps_feedcrawler_ray/webpipe-{sf_tag}"
    paths = build_pages_from_documents(os.path.join(sf_dir, "documents.parquet"),
                                       os.path.join(work, "corpus"))
    pages = rd.read_parquet(paths["pages"], columns=["url", "html"])

    def partial(batch: pa.Table) -> pa.Table:
        srcs: list[str] = []
        dsts: list[str] = []
        for u, h in zip(batch["url"].to_pylist(), batch["html"].to_pylist()):
            if "/d/" not in u and "/priv/" not in u:
                continue  # host roots / robots.txt — not document pages
            links = parse_links(u, h)
            if not links:
                continue
            _, _, hosts = canonicalize_batch(links)
            sh = extract_host(u)
            for dh in hosts:
                if dh:
                    srcs.append(sh)
                    dsts.append(dh)
        g = (
            pd.DataFrame({"src_host": srcs, "dst_host": dsts})
            .groupby(["src_host", "dst_host"], as_index=False)
            .size()
            .rename(columns={"size": "n_links"})
        )
        return pa.Table.from_pandas(
            g,
            preserve_index=False,
            # explicit schema: an all-roots batch yields EMPTY object
            # columns, which would otherwise infer as Arrow null type
            schema=pa.schema(
                [("src_host", pa.string()), ("dst_host", pa.string()),
                 ("n_links", pa.int64())]
            ),
        )

    return (
        pages.map_batches(partial, batch_format="pyarrow")
        .groupby(["src_host", "dst_host"])
        .sum("n_links")
        .to_pandas()
        .rename(columns={"sum(n_links)": "n_links"})
        .sort_values(["src_host", "dst_host"])
        .reset_index(drop=True)
    )


def host_pagerank(
    sf_dir: str, iters: int = 10, damping: float = 0.85, work_dir: str | None = None
):
    """ITERATIVE distributed PageRank over the host link graph — the
    iterative-dataflow class (non-SQL-expressible; rows-only check with
    a numpy power-iteration twin in tests).  Per iteration: the rank
    vector (≤ |hosts| entries — tiny) broadcasts into a ``map_batches``
    over the EDGE dataset, which emits weighted contributions per batch
    (combiner), and one |hosts|-key groupby-sum closes the step.  Edges
    never move after the initial build; only the small rank table does —
    the standard scale shape for 10^9-edge graphs.  Ranks are held in
    integer e9 units so the result is platform-exact and
    iteration-order-free.

    PARTITIONING ASSUMPTION: the rank table fits a worker's heap
    (|hosts| ≪ |edges|; ~100 M hosts × 16 B ≈ 1.6 GB is the ceiling).
    Past that, the rank broadcast becomes a bucketed rank⋈edge
    co-shuffle on hash(src_host) — same iteration body, one extra
    exchange per step."""
    import pandas as pd

    edges_df = host_link_graph(sf_dir, work_dir=work_dir)
    if len(edges_df) == 0:  # linkless corpus → empty rank table, typed
        return pd.DataFrame(
            {"host": pd.Series(dtype=object), "rank_e9": pd.Series(dtype="int64")}
        )
    core = _integer_pagerank(
        edges_df.rename(columns={"src_host": "src", "dst_host": "dst",
                                 "n_links": "w"}),
        iters=iters, damping=damping,
    )
    out = core.rename(columns={"node": "host"}).sort_values(
        ["rank_e9", "host"], ascending=[False, True]
    )
    return out.reset_index(drop=True)


def host_trustrank(
    sf_dir: str, iters: int = 10, damping: float = 0.85, n_seeds: int = 4,
    work_dir: str | None = None,
):
    """TRUSTRANK + SPAM MASS over the host link graph — the web-spam
    demotion classic (Gyöngyi, Garcia-Molina & Pedersen, "Combating Web
    Spam with TrustRank", VLDB 2004; spam mass from Gyöngyi et al.,
    "Link Spam Detection Based on Mass Estimation", VLDB 2006).  Three
    runs of the shared integer-e9 core over the SAME pinned edge
    dataset:

    1. seed selection — the paper's inverse-PageRank heuristic: classic
       PageRank on the TRANSPOSED graph; the top ``n_seeds`` hosts
       (rank DESC, host ASC — deterministic) become the trusted seed
       set (the paper then filters by human oracle; the deterministic
       corpus stands in, all selected seeds trusted);
    2. classic PageRank p (for the mass estimate);
    3. TrustRank t = PageRank with the residual pool (teleport +
       dangling + flooring remainders) restricted to the seeds.

    Relative spam mass M = (p − t)/p, emitted integer-scaled as
    ``spam_mass_e3 = ((p − t)·1000) // p`` (negative for trust-rich
    hosts — seeds and their neighborhoods — by design).  All three
    runs are exact-integer and iteration-order-free, so the whole
    result is platform-exact: rows-only driver check + a sequential
    integer-replica twin test.

    Scale shape: identical to host_pagerank — edges pinned once, only
    the ≤|hosts| rank table moves per iteration; the two extra runs
    triple the iteration count, not the data volume."""
    import pandas as pd

    edges_df = host_link_graph(sf_dir, work_dir=work_dir)
    if len(edges_df) == 0:
        return pd.DataFrame(
            {"host": pd.Series(dtype=object),
             "trustrank_e9": pd.Series(dtype="int64"),
             "pagerank_e9": pd.Series(dtype="int64"),
             "spam_mass_e3": pd.Series(dtype="int64"),
             "is_seed": pd.Series(dtype="int32")}
        )
    core = edges_df.rename(
        columns={"src_host": "src", "dst_host": "dst", "n_links": "w"}
    )
    inv = _integer_pagerank(
        core.rename(columns={"src": "dst", "dst": "src"}),
        iters=iters, damping=damping,
    ).sort_values(["rank_e9", "node"], ascending=[False, True])
    seeds = sorted(inv["node"].head(n_seeds))
    pr = _integer_pagerank(core, iters=iters, damping=damping)
    tr = _integer_pagerank(core, iters=iters, damping=damping,
                           teleport_nodes=seeds)
    out = pr.rename(columns={"rank_e9": "pagerank_e9"}).merge(
        tr.rename(columns={"rank_e9": "trustrank_e9"}), on="node"
    )
    p = out["pagerank_e9"].to_numpy(dtype="int64")
    t = out["trustrank_e9"].to_numpy(dtype="int64")
    # the uniform residual split gives every node ≥1 unit only while the
    # residual pool (~1.5e8 units) covers every node; guard the divisor
    # so node counts past that bound degrade instead of dividing by zero
    # (ADVICE r4)
    out["spam_mass_e3"] = (p - t) * 1000 // np.maximum(p, 1)
    out["is_seed"] = out["node"].isin(seeds).astype("int32")
    out = out.rename(columns={"node": "host"})[
        ["host", "trustrank_e9", "pagerank_e9", "spam_mass_e3", "is_seed"]
    ]
    return (
        out.sort_values(["trustrank_e9", "host"], ascending=[False, True])
        .reset_index(drop=True)
    )


def _integer_pagerank(edges_df, iters: int = 10, damping: float = 0.85,
                      teleport_nodes=None):
    """Shared integer-e9 PageRank core over a weighted DIRECTED edge
    table (columns src, dst, w) — the iteration body host_pagerank
    documents: the rank vector broadcasts into a ``map_batches`` over
    the pinned edge dataset (per-batch contribution combiners), one
    |nodes|-key groupby-sum closes each step, and all arithmetic is
    exact integer division with the residual pool (teleport + dangling
    + flooring remainders) redistributed uniformly, so any executor's
    summation order gives identical results.  Returns an UNSORTED
    (node, rank_e9) frame.

    ``teleport_nodes`` (optional) restricts the residual pool to a
    subset of nodes — the biased-teleport generalization TrustRank
    needs (Gyöngyi et al., VLDB 2004): with a seed list, every
    iteration's pool (teleport + dangling + flooring remainders) lands
    uniformly on the SEEDS instead of all nodes, remainder to the
    lexicographically first seeds.  ``None`` keeps classic PageRank."""
    import pandas as pd

    nodes = sorted(set(edges_df["src"]) | set(edges_df["dst"]))
    n_nodes = len(nodes)
    if teleport_nodes is None:
        tnodes = nodes
    else:
        tnodes = sorted(set(teleport_nodes))
        missing = set(tnodes) - set(nodes)
        if missing:
            raise ValueError(f"teleport nodes not in graph: {sorted(missing)[:5]}")
    od = edges_df.groupby("src")["w"].sum().to_dict()  # invariant

    edges = rd.from_arrow(
        pa.Table.from_pandas(edges_df[["src", "dst", "w"]], preserve_index=False)
    ).materialize()  # iterate over a pinned edge dataset (built once)

    # biased start: with a seed set, initial mass sits on the seeds
    # (the paper's d vector); classic PageRank starts uniform
    if teleport_nodes is None:
        rank = {h: 1_000_000_000 // n_nodes for h in nodes}
    else:
        rank = {h: 0 for h in nodes}
        for h in tnodes:
            rank[h] = 1_000_000_000 // len(tnodes)
    # init slack (1e9 − Σ) re-enters via iteration 1's residual pool
    for _ in range(iters):
        r = rank  # rebound (never mutated) — no per-iteration copy

        def contribute(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            src_rank = df["src"].map(r).to_numpy(dtype="int64")
            src_deg = df["src"].map(od).to_numpy(dtype="int64")
            # exact per-edge share via floor division; the flooring
            # remainder joins the uniformly-redistributed pool below, so
            # total mass is conserved exactly every iteration
            share = src_rank * df["w"].to_numpy() // src_deg
            g = (
                pd.DataFrame({"dst": df["dst"], "c": share})
                .groupby("dst", as_index=False)["c"]
                .sum()
            )
            return pa.Table.from_pandas(
                g, preserve_index=False,
                schema=pa.schema([("dst", pa.string()), ("c", pa.int64())]),
            )

        contrib = (
            edges.map_batches(contribute, batch_format="pyarrow")
            .groupby("dst")
            .sum("c")
            .to_pandas()
            .rename(columns={"sum(c)": "c"})
            .set_index("dst")["c"]
        )
        # damped rank = floor(contrib·d); the residual pool (teleport
        # (1−d) + dangling + all flooring remainders) redistributes
        # uniformly — exact integer split, remainder to the
        # lexicographically first nodes (deterministic)
        dm = int(round(damping * 1000))  # permille — int(0.85*1000) could truncate
        new_rank = {
            h: (int(contrib.get(h, 0)) * dm) // 1000 for h in nodes
        }
        pool = 1_000_000_000 - sum(new_rank.values())
        per, rem = divmod(pool, len(tnodes))
        for i, h in enumerate(tnodes):
            new_rank[h] += per + (1 if i < rem else 0)
        rank = new_rank
    return pd.DataFrame({"node": nodes, "rank_e9": [rank[h] for h in nodes]})


def components_from_edges(edges_df, max_iters: int = 50):
    """Distributed CONNECTED COMPONENTS over an undirected (src_host,
    dst_host) edge list — iterative min-label propagation, the classic
    non-SQL iterative-dataflow op alongside PageRank.

    Per iteration: the label table (≤ |hosts| entries — the same
    fits-a-heap assumption host_pagerank documents, with the same
    bucketed co-shuffle fallback past ~10^8 hosts) broadcasts via
    ray.put into a ``map_batches`` over the PINNED edge dataset; each
    batch emits per-endpoint min-label proposals (combiner: one row per
    (host) per batch), and one |hosts|-key groupby-min closes the step.
    Converges in ≤ graph-diameter iterations; the driver early-exits on
    fixpoint by comparing two |hosts|-sized dicts.  Component ids are
    the lexicographically smallest member host — deterministic,
    order-free, content-addressable."""
    import ray

    import pandas as pd

    hosts = sorted(set(edges_df["src_host"]) | set(edges_df["dst_host"]))
    if not hosts:
        return pd.DataFrame(
            {"host": pd.Series(dtype=object), "component": pd.Series(dtype=object)}
        )
    label = {h: h for h in hosts}  # min-string label
    edges = rd.from_arrow(
        pa.Table.from_pandas(
            edges_df[["src_host", "dst_host"]].drop_duplicates(),
            preserve_index=False,
        )
    ).materialize()

    for _ in range(max_iters):
        lab_ref = ray.put(label)

        def propose(batch: pa.Table) -> pa.Table:
            lab = ray.get(lab_ref)
            df = batch.to_pandas()
            ls = df["src_host"].map(lab)
            ld = df["dst_host"].map(lab)
            m = np.minimum(ls.to_numpy(dtype=object), ld.to_numpy(dtype=object))
            g = (
                pd.concat(
                    [pd.DataFrame({"host": df["src_host"], "m": m}),
                     pd.DataFrame({"host": df["dst_host"], "m": m})]
                )
                .groupby("host", as_index=False)["m"]
                .min()
            )
            return pa.Table.from_pandas(
                g, preserve_index=False,
                schema=pa.schema([("host", pa.string()), ("m", pa.string())]),
            )

        prop = (
            edges.map_batches(propose, batch_format="pyarrow")
            .groupby("host")
            .min("m")
            .to_pandas()
            .rename(columns={"min(m)": "m"})
        )
        new_label = dict(label)
        for h, m in zip(prop["host"], prop["m"]):
            if m < new_label[h]:
                new_label[h] = m
        if new_label == label:
            break
        label = new_label
    out = pd.DataFrame({"host": hosts, "component": [label[h] for h in hosts]})
    return out.sort_values("host").reset_index(drop=True)


def host_components(sf_dir: str, work_dir: str | None = None):
    """Connected components of the host link graph (rows-only driver
    check; the propagation core is pinned against a union-find twin in
    tests)."""
    return components_from_edges(host_link_graph(sf_dir, work_dir=work_dir))


def kcore_from_edges(edges_df) -> "pd.DataFrame":
    """k-CORE DECOMPOSITION (coreness per host) over an undirected edge
    list — iterative pruning (Batagelj–Zaveršnik semantics, parallel
    peeling formulation): at level k, repeatedly drop every vertex whose
    degree in the SURVIVING subgraph is < k until fixpoint; vertices
    dropped before level k survives get coreness k−1.

    Scale shape (same contract as host_pagerank / components): the
    undirected-simple edge dataset is pinned ONCE; each peel round is a
    single ``map_batches`` combiner over edges (alive-mask broadcast via
    ray.put, per-batch endpoint degree partials) closed by one
    |hosts|-key groupby-sum.  Only the |hosts|-bounded degree/alive
    tables ever move — edges never re-shuffle.  Round count is
    Σ_k (peel rounds at k) — O(k_max + longest removal chain), the
    known bound for parallel peeling."""
    import ray

    import pandas as pd

    # undirected simple graph: unordered pair dedup, self-loops dropped
    a = np.minimum(edges_df["src_host"].to_numpy(dtype=object),
                   edges_df["dst_host"].to_numpy(dtype=object))
    b = np.maximum(edges_df["src_host"].to_numpy(dtype=object),
                   edges_df["dst_host"].to_numpy(dtype=object))
    und = pd.DataFrame({"u": a, "v": b})
    und = und[und["u"] != und["v"]].drop_duplicates()
    hosts = sorted(set(und["u"]) | set(und["v"]))
    if not hosts:
        return pd.DataFrame(
            {"host": pd.Series(dtype=object),
             "coreness": pd.Series(dtype="int64")}
        )
    edges = rd.from_arrow(
        pa.Table.from_pandas(und, preserve_index=False)
    ).materialize()

    coreness = {h: 0 for h in hosts}
    alive = set(hosts)
    k = 1
    while alive:
        alive_ref = ray.put(alive)

        def deg_partial(batch: pa.Table) -> pa.Table:
            al = ray.get(alive_ref)
            df = batch.to_pandas()
            m = df["u"].isin(al) & df["v"].isin(al)
            df = df[m]
            g = (
                pd.concat([df["u"].rename("host"), df["v"].rename("host")])
                .value_counts()
                .rename_axis("host")
                .reset_index(name="d")
            )
            return pa.Table.from_pandas(
                g, preserve_index=False,
                schema=pa.schema([("host", pa.string()), ("d", pa.int64())]),
            )

        deg = (
            edges.map_batches(deg_partial, batch_format="pyarrow")
            .groupby("host")
            .sum("d")
            .to_pandas()
            .rename(columns={"sum(d)": "d"})
        )
        dd = dict(zip(deg["host"], deg["d"])) if "host" in deg.columns else {}
        drop = {h for h in alive if dd.get(h, 0) < k}
        if not drop:
            k += 1  # level-k core settled; survivors have coreness ≥ k
            for h in alive:
                coreness[h] = k - 1
            continue
        for h in drop:
            coreness[h] = k - 1
        alive -= drop
    out = pd.DataFrame(
        {"host": hosts, "coreness": [coreness[h] for h in hosts]}
    )
    out["coreness"] = out["coreness"].astype("int64")
    return out.sort_values("host").reset_index(drop=True)


def host_kcore(sf_dir: str, work_dir: str | None = None):
    """Coreness of every host in the link graph (rows-only driver check;
    the peeling core is pinned against a brute sequential-peel twin in
    tests)."""
    return kcore_from_edges(host_link_graph(sf_dir, work_dir=work_dir))


def communities_from_edges(edges_df, max_iters: int = 40):
    """LABEL-PROPAGATION COMMUNITY DETECTION (Raghavan, Albert & Kumara
    2007) over an undirected weighted (src_host, dst_host, n_links) edge
    list — the community sibling of :func:`components_from_edges` (which
    finds reachability, not density).

    Deterministic SEMI-SYNCHRONOUS variant: a node adopts the label
    with the largest total incident edge weight among its neighbors
    (the node's current label casts a weight-1 self-vote; ties break to
    the lexicographically smallest label), but only HALF the nodes —
    the hash-parity class matching the iteration's parity — update per
    sweep.  Alternating two-coloring is the published fix for the
    label-swap oscillation fully synchronous LPA exhibits on dense /
    bipartite-like graphs (measured here: the corpus host graph
    flip-flops between two global label states forever under the
    synchronous rule, and settles in ~4 semi-synchronous sweeps).
    No RNG, no visit-order dependence ⇒ byte-stable output; convergence
    = one full even+odd pair of sweeps with zero label changes.

    Scale shape (same as PageRank/components): labels (≤ |hosts| — the
    documented fits-a-heap assumption with the bucketed co-shuffle
    fallback past ~10^8 hosts) broadcast via ray.put into a
    ``map_batches`` over the PINNED edge dataset; each batch emits
    (host, neighbor_label, weight) partials combined per batch, one
    |hosts·labels|-key groupby-sum closes the step, and the argmax over
    that bounded table runs as vectorized driver math.  Early exit on
    fixpoint.  Community ids are the smallest member host."""
    import ray

    import pandas as pd

    e = edges_df[["src_host", "dst_host", "n_links"]]
    e = e[e["src_host"] != e["dst_host"]]  # self-loops don't vote
    hosts = sorted(set(e["src_host"]) | set(e["dst_host"]))
    if not hosts:
        return pd.DataFrame(
            {"host": pd.Series(dtype=object), "community": pd.Series(dtype=object)}
        )
    # undirected: collapse (a,b)+(b,a) weights onto the sorted pair once
    und = e.assign(
        a=np.minimum(e["src_host"], e["dst_host"]),
        b=np.maximum(e["src_host"], e["dst_host"]),
    ).groupby(["a", "b"], as_index=False)["n_links"].sum()
    edges = rd.from_arrow(
        pa.Table.from_pandas(und, preserve_index=False)
    ).materialize()

    from ..functions.hashing import fingerprint64

    label = {h: h for h in hosts}
    parity = {h: fingerprint64(h) & 1 for h in hosts}
    prev_changed = -1
    for it in range(max_iters):
        lab_ref = ray.put(label)

        def votes(batch: pa.Table) -> pa.Table:
            lab = ray.get(lab_ref)
            df = batch.to_pandas()
            w = df["n_links"].to_numpy(dtype="int64")
            g = (
                pd.concat(
                    [pd.DataFrame({"host": df["a"], "lbl": df["b"].map(lab), "w": w}),
                     pd.DataFrame({"host": df["b"], "lbl": df["a"].map(lab), "w": w})]
                )
                .groupby(["host", "lbl"], as_index=False)["w"]
                .sum()
            )
            return pa.Table.from_pandas(
                g, preserve_index=False,
                schema=pa.schema([("host", pa.string()), ("lbl", pa.string()),
                                  ("w", pa.int64())]),
            )

        tally = (
            edges.map_batches(votes, batch_format="pyarrow")
            .groupby(["host", "lbl"])
            .sum("w")
            .to_pandas()
            .rename(columns={"sum(w)": "w"})
        )
        # weight-1 self-vote with the node's current label
        self_rows = pd.DataFrame(
            {"host": hosts, "lbl": [label[h] for h in hosts], "w": 1}
        )
        tally = (
            pd.concat([tally, self_rows])
            .groupby(["host", "lbl"], as_index=False)["w"]
            .sum()
        )
        # argmax by (w DESC, lbl ASC): sort once, take the first row per host
        tally = tally.sort_values(
            ["host", "w", "lbl"], ascending=[True, False, True]
        )
        win = tally.drop_duplicates("host", keep="first")
        prop = dict(zip(win["host"], win["lbl"]))
        # semi-synchronous: only this sweep's parity class updates
        new_label = {
            h: (prop.get(h, label[h]) if parity[h] == it % 2 else label[h])
            for h in hosts
        }
        changed = sum(1 for h in hosts if new_label[h] != label[h])
        label = new_label
        if changed == 0 and prev_changed == 0:
            break  # a full even+odd pair of sweeps moved nothing
        prev_changed = changed
    # canonicalize: community id = smallest member host
    out = pd.DataFrame({"host": hosts, "community": [label[h] for h in hosts]})
    rep = out.groupby("community")["host"].min().to_dict()
    out["community"] = out["community"].map(rep)
    return out.sort_values("host").reset_index(drop=True)


def host_communities(sf_dir: str, work_dir: str | None = None):
    """Label-propagation communities of the host link graph (rows-only
    driver check; the propagation core is pinned by synthetic
    structural twins — cliques, bridges, paths — in tests)."""
    return communities_from_edges(host_link_graph(sf_dir, work_dir=work_dir))


def _doc_link_edges(sf_dir: str, work_dir: str | None = None):
    """Shared first stage of the doc-graph family (triangles, link
    prediction): parse the derived corpus' pages, canonicalize hrefs,
    and reduce to the globally-deduped UNDIRECTED edge set (a < b,
    self-links dropped) via per-batch dedup + one pair-bucket exchange.
    Returns ``(edges_dataset (materialized: consumed more than once),
    n_docs, nb)``."""
    import pandas as pd

    from ..functions.extract import parse_links
    from ..functions.urlnorm import canonicalize_batch
    from .dedup import coarse_buckets

    sf_tag = os.path.basename(os.path.normpath(sf_dir))
    work = work_dir or f"/tmp/opps_feedcrawler_ray/webpipe-{sf_tag}"
    paths = build_pages_from_documents(os.path.join(sf_dir, "documents.parquet"),
                                       os.path.join(work, "corpus"))
    n_docs = pq.read_metadata(
        os.path.join(sf_dir, "documents.parquet")
    ).num_rows
    pages = rd.read_parquet(paths["pages"], columns=["url", "html"])
    nb = coarse_buckets(pages.count(), rows_per_task=16384)

    def _doc_id(url: str) -> int:
        return int(url.rsplit("/", 1)[1])

    pair_schema = pa.schema([("a", pa.int64()), ("b", pa.int64()), ("__b", pa.int64())])

    def edge_partial(batch: pa.Table) -> pa.Table:
        srcs: list[int] = []
        dsts: list[int] = []
        for u, h in zip(batch["url"].to_pylist(), batch["html"].to_pylist()):
            if "/d/" not in u and "/priv/" not in u:
                continue  # host roots / robots.txt — not document pages
            links = parse_links(u, h)
            if not links:
                continue
            canons, _, _ = canonicalize_batch(links)
            sid = _doc_id(u)
            for c in canons:
                if c:
                    srcs.append(sid)
                    dsts.append(_doc_id(c))
        s = np.asarray(srcs, dtype=np.int64)
        d = np.asarray(dsts, dtype=np.int64)
        a = np.minimum(s, d)
        b = np.maximum(s, d)
        keep = a != b  # self-links carry no triangles / no prediction value
        df = pd.DataFrame({"a": a[keep], "b": b[keep]}).drop_duplicates()
        df["__b"] = ((df["a"] * np.int64(n_docs) + df["b"]) % nb).astype("int64")
        return pa.Table.from_pandas(df, preserve_index=False, schema=pair_schema)

    def bucket_dedup(g: pd.DataFrame) -> pd.DataFrame:
        return g[["a", "b"]].drop_duplicates()

    edges = (
        pages.map_batches(edge_partial, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(bucket_dedup, batch_format="pandas")
        .materialize()
    )
    return edges, n_docs, nb


def _doc_degrees(edges, nb: int) -> "pd.DataFrame":
    """Node degree table of the undirected edge dataset: per-batch unique
    counts -> node-bucketed sums.  Node-bounded output (the fits-a-heap
    assumption host_pagerank documents, same bucketed-join fallback past
    it).  Shared by triangles / link prediction / clustering coeff."""
    import pandas as pd

    deg_schema = pa.schema([("node", pa.int64()), ("c", pa.int64()), ("__b", pa.int64())])

    def deg_partial(batch: pa.Table) -> pa.Table:
        nodes = np.concatenate(
            [batch["a"].to_numpy(zero_copy_only=False),
             batch["b"].to_numpy(zero_copy_only=False)]
        )
        u, c = np.unique(nodes, return_counts=True)
        df = pd.DataFrame({"node": u, "c": c.astype("int64")})
        df["__b"] = (df["node"] % nb).astype("int64")
        return pa.Table.from_pandas(df, preserve_index=False, schema=deg_schema)

    def deg_sum(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("node", as_index=False)["c"].sum()

    return (
        edges.map_batches(deg_partial, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(deg_sum, batch_format="pandas")
        .to_pandas()
    )


def doc_triangle_counts(sf_dir: str, work_dir: str | None = None,
                        _edges=None, _deg_df=None):
    """Distributed TRIANGLE COUNTING over the doc-level link graph — the
    degree-orientation algorithm (Chiba–Nishizeki / Schank–Wagner node
    iterator): orient each undirected edge from the lower-(degree, id)
    endpoint to the higher, enumerate wedges at each apex (out-degree
    after orientation is O(sqrt(m)), so wedge volume is bounded), and
    close them with a co-shuffled membership probe against the oriented
    edge set.  Every stage is a combiner + one coarse-bucket exchange:

      1. parse pages → undirected (a,b) pairs, per-batch dedup,
         pair-bucket shuffle for the global dedup;
      2. degrees via node-bucketed partial sums (the degree table is
         ≤|nodes| rows — same fits-a-heap broadcast assumption
         host_pagerank documents, same bucketed-join fallback past it);
      3. wedges per apex grouped by src bucket, emitted with the
         vectorized ``_cell_pair_indices`` kernel (zero Python pairs);
      4. wedge rows UNION edge rows co-shuffle on hash(u,v); per-bucket
         membership is one ``np.isin`` over packed int64 keys (packing
         assumes ids < 2^31; at web scale the key becomes a 128-bit
         hash);
      5. matched wedges emit 3 per-vertex partials → node-bucketed sum.

    The corpus' links are id-arithmetic ((doc·37+11k+1) mod n), so the
    whole parse→canonicalize→count composition has a closed-form SQL
    oracle (like host_link_graph)."""
    import pandas as pd

    from .dedup import _cell_pair_indices

    # callers that already built the edge dataset (clustering coeff)
    # pass it in — the corpus parse happens once
    edges, n_docs, nb = _edges or _doc_link_edges(sf_dir, work_dir)
    deg_df = _deg_df if _deg_df is not None else _doc_degrees(edges, nb)
    # degree-rank = (degree, id) lexicographic — a total order, so the
    # orientation is acyclic; broadcast as two aligned sorted arrays
    import ray

    deg_nodes = deg_df["node"].to_numpy(dtype=np.int64)
    order = np.argsort(deg_nodes)
    deg_ref = ray.put((deg_nodes[order], deg_df["c"].to_numpy(dtype=np.int64)[order]))

    def orient(batch: pa.Table) -> pa.Table:
        nodes, degs = ray.get(deg_ref)
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        da = degs[np.searchsorted(nodes, a)]
        db = degs[np.searchsorted(nodes, b)]
        # lower (degree, id) endpoint becomes the wedge apex; the end's
        # degree rides along so wedge ends can be RANK-ordered to match
        a_first = (da < db) | ((da == db) & (a < b))
        u = np.where(a_first, a, b)
        v = np.where(a_first, b, a)
        dv = np.where(a_first, db, da)
        return pa.table(
            {"u": pa.array(u, pa.int64()), "v": pa.array(v, pa.int64()),
             "dv": pa.array(dv, pa.int64()),
             "__b": pa.array((u % nb).astype("int64"), pa.int64())}
        )

    oriented = edges.map_batches(orient, batch_format="pyarrow").materialize()

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["u", "v"])
        codes = g.groupby("u", sort=False).ngroup().to_numpy()
        i, j = _cell_pair_indices(codes)
        uu = g["u"].to_numpy()
        vv = g["v"].to_numpy()
        dvv = g["dv"].to_numpy()
        # wedge ends ordered by the SAME (degree, id) rank the edge
        # orientation uses, so the closing edge key matches exactly
        # (vv[i] < vv[j] within a run, so ties keep id order)
        swap = dvv[i] > dvv[j]
        lo = np.where(swap, vv[j], vv[i])
        hi = np.where(swap, vv[i], vv[j])
        return pd.DataFrame(
            {"u": lo, "v": hi, "apex": uu[i],
             "kind": np.ones(len(i), dtype=np.int64)}
        )

    def tag_edges(batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        u = batch["u"].to_numpy(dtype=np.int64)
        v = batch["v"].to_numpy(dtype=np.int64)
        # pandas blocks to match the wedge map_groups output block type
        return pd.DataFrame(
            {"u": u, "v": v,
             "apex": np.full(n, -1, dtype=np.int64),
             "kind": np.zeros(n, dtype=np.int64),
             "__b": ((u * np.int64(n_docs) + v) % nb).astype("int64")}
        )

    def wedge_rows(g: pd.DataFrame) -> pd.DataFrame:
        w = wedges(g)
        if len(w) == 0:
            return pd.DataFrame(
                {"u": pd.Series(dtype="int64"), "v": pd.Series(dtype="int64"),
                 "apex": pd.Series(dtype="int64"), "kind": pd.Series(dtype="int64"),
                 "__b": pd.Series(dtype="int64")}
            )
        w["__b"] = ((w["u"] * np.int64(n_docs) + w["v"]) % nb).astype("int64")
        return w

    wedge_ds = (
        oriented.groupby("__b").map_groups(wedge_rows, batch_format="pandas")
    )
    probe = wedge_ds.union(oriented.map_batches(tag_edges, batch_format="pandas"))

    cnt_schema = pa.schema([("doc_id", pa.int64()), ("t", pa.int64()), ("__b", pa.int64())])

    def close_wedges(g: pd.DataFrame) -> pd.DataFrame:
        key = g["u"].to_numpy(dtype=np.int64) * np.int64(n_docs) + g["v"].to_numpy(
            dtype=np.int64
        )
        is_edge = g["kind"].to_numpy() == 0
        hit = np.isin(key[~is_edge], key[is_edge])
        w = g[~is_edge]
        tri_nodes = np.concatenate(
            [w["apex"].to_numpy(dtype=np.int64)[hit],
             w["u"].to_numpy(dtype=np.int64)[hit],
             w["v"].to_numpy(dtype=np.int64)[hit]]
        )
        u, c = np.unique(tri_nodes, return_counts=True)
        df = pd.DataFrame({"doc_id": u, "t": c.astype("int64")})
        df["__b"] = (df["doc_id"] % nb).astype("int64")
        return pa.Table.from_pandas(df, preserve_index=False, schema=cnt_schema).to_pandas()

    def count_sum(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("doc_id", as_index=False)["t"].sum()
        return s.rename(columns={"t": "n_triangles"})

    out = (
        probe.groupby("__b")
        .map_groups(close_wedges, batch_format="pandas")
        .groupby("__b")
        .map_groups(count_sum, batch_format="pandas")
        .to_pandas()
    )
    return out[["doc_id", "n_triangles"]].sort_values("doc_id").reset_index(drop=True)


def _doc_directed_edges(sf_dir: str, work_dir: str | None = None) -> "rd.Dataset":
    """DIRECTED, self-loop-free, per-batch-deduped doc→doc link edges
    (a, b) from the derived corpus — the shared edge build for BFS depth
    and weighted SSSP (parse → canonicalize → id arithmetic, the same
    pipeline the triangle/link-graph oracles pin)."""
    import pandas as pd

    from ..functions.extract import parse_links
    from ..functions.urlnorm import canonicalize_batch

    sf_tag = os.path.basename(os.path.normpath(sf_dir))
    work = work_dir or f"/tmp/opps_feedcrawler_ray/webpipe-{sf_tag}"
    paths = build_pages_from_documents(
        os.path.join(sf_dir, "documents.parquet"), os.path.join(work, "corpus")
    )
    pages = rd.read_parquet(paths["pages"], columns=["url", "html"])

    def _doc_id(url: str) -> int:
        return int(url.rsplit("/", 1)[1])

    edge_schema = pa.schema([("a", pa.int64()), ("b", pa.int64())])

    def edge_partial(batch: pa.Table) -> pa.Table:
        srcs: list[int] = []
        dsts: list[int] = []
        for u, h in zip(batch["url"].to_pylist(), batch["html"].to_pylist()):
            if "/d/" not in u and "/priv/" not in u:
                continue  # host roots / robots.txt — not document pages
            links = parse_links(u, h)
            if not links:
                continue
            canons, _, _ = canonicalize_batch(links)
            sid = _doc_id(u)
            for c in canons:
                if c:
                    srcs.append(sid)
                    dsts.append(_doc_id(c))
        s = np.asarray(srcs, dtype=np.int64)
        d = np.asarray(dsts, dtype=np.int64)
        keep = s != d  # self-links never change a distance
        df = pd.DataFrame({"a": s[keep], "b": d[keep]}).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False, schema=edge_schema)

    return pages.map_batches(edge_partial, batch_format="pyarrow").materialize()


def _relax_bucketed(
    edges, source: int, max_iters: int, gc_dir: str, n_buckets: int,
    weight_fn=None, out_col: str = "depth", out_parquet: str | None = None,
) -> "pd.DataFrame":
    """Shared bucketed min-label relaxation core for BFS (unit weights)
    and SSSP (``weight_fn(a, b) -> int64 weights``): frontier-only
    propose (rows whose label improved last round carry ``fresh=1``),
    per-task min combiners, dst-bucket-partitioned proposal flow, and a
    driver that sees only refs + change counts.  See ``graphcore``."""
    import pandas as pd

    from . import graphcore as gc

    edge_refs = gc.partition_by_key(edges, "a", n_buckets, gc_dir, ["a", "b"])

    def init(b: int) -> pd.DataFrame:
        if source % n_buckets == b:
            return pd.DataFrame(
                {"node": [source], "lab": [0], "fresh": [1]}
            ).astype("int64")
        return pd.DataFrame(
            {c: pd.Series([], dtype="int64") for c in ("node", "lab", "fresh")}
        )

    state_refs = gc.init_state_refs(init, n_buckets)

    def propose(edges_df: pd.DataFrame, state_df: pd.DataFrame):
        if not len(edges_df) or not len(state_df):
            return None
        frontier = state_df[state_df["fresh"] == 1]
        if not len(frontier):
            return None
        m = edges_df.merge(frontier[["node", "lab"]], left_on="a", right_on="node")
        if not len(m):
            return None
        aa = m["a"].to_numpy(dtype="int64")
        bb = m["b"].to_numpy(dtype="int64")
        w = (
            np.ones(len(m), dtype=np.int64)
            if weight_fn is None
            else weight_fn(aa, bb)
        )
        return (
            pd.DataFrame({"node": bb, "nd": m["lab"].to_numpy(dtype="int64") + w})
            .groupby("node", as_index=False)["nd"]
            .min()
        )

    def merge(state_df: pd.DataFrame, props: pd.DataFrame):
        state_df = state_df.assign(fresh=0)
        if not len(props):
            return state_df, 0
        p = props.groupby("node", as_index=False)["nd"].min()
        m = p.merge(state_df[["node", "lab"]], on="node", how="left")
        better = m["lab"].isna() | (m["nd"] < m["lab"])
        n_changed = int(better.sum())
        if not n_changed:
            return state_df, 0
        upd = pd.DataFrame(
            {"node": m.loc[better, "node"].to_numpy(dtype="int64"),
             "lab": m.loc[better, "nd"].to_numpy(dtype="int64"),
             "fresh": np.ones(n_changed, dtype=np.int64)}
        )
        keep = state_df[~state_df["node"].isin(upd["node"])]
        new = pd.concat([keep, upd], ignore_index=True)
        return new.astype({"node": "int64", "lab": "int64", "fresh": "int64"}), n_changed

    state_refs, _ = gc.bucketed_fixpoint(
        edge_refs, state_refs, propose, merge, max_iters=max_iters
    )
    if out_parquet is not None:
        # node-sized result: per-bucket Parquet written inside tasks;
        # the driver sees row counts only (the 100-TB output shape)
        counts = gc.write_state_parquet(state_refs, out_parquet)
        return pd.DataFrame(
            {"bucket": np.arange(len(counts), dtype=np.int64),
             "rows": np.asarray(counts, dtype=np.int64)}
        )
    out = gc.collect_state(state_refs)
    if not len(out):
        out = pd.DataFrame({"node": [source], "lab": [0]})
    out = (
        out[["node", "lab"]]
        .rename(columns={"node": "doc_id", "lab": out_col})
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    return out.astype({"doc_id": "int64", out_col: "int64"})


def _bfs_bucketed(
    edges, source: int, max_depth: int, gc_dir: str, n_buckets: int
) -> "pd.DataFrame":
    return _relax_bucketed(edges, source, max_depth, gc_dir, n_buckets,
                           weight_fn=None, out_col="depth")


def doc_bfs_depth(
    sf_dir: str, work_dir: str | None = None, source: int = 0, max_depth: int = 32,
    exchange: str = "bucketed", n_buckets: int = 8,
) -> pd.DataFrame:
    """Distributed BFS (crawl-depth labeling from a seed) over the
    DIRECTED doc link graph — the fourth iterative-graph op next to
    PageRank, connected components and triangle counting, and the batch
    twin of what the crawl's round counter computes live.

    ``exchange="bucketed"`` (default, VERDICT r4 task #1) runs the
    out-of-driver label exchange from ``graphcore``: nodes are
    hash-bucketed and co-partitioned with their out-edges (one shuffle,
    per-bucket object-store pins), per-iteration depth proposals flow
    task→task partitioned by destination bucket with per-task min
    combiners, ONLY frontier rows (depth improved last round) propose,
    and the driver holds B ObjectRefs plus integer change counts — no
    node-sized object ever lands on the driver heap until the final
    result collect the driver contract requires.

    ``exchange="broadcast"`` is the prior fits-a-heap twin: the
    ≤|reached| depth dict broadcasts via ``ray.put`` into ONE
    ``map_batches`` over the PINNED edge dataset per iteration; kept
    for scale-regime choice (tiny graphs — fewer moving parts) and as
    the equality twin the tests compare against.  Both early-exit on
    fixpoint (≤ graph-eccentricity iterations).  Oracle: recursive-CTE
    min-reachable depth over the corpus' closed-form id-arithmetic
    links (same closed form the triangle oracle proves equal to the
    parse → canonicalize pipeline)."""
    import pandas as pd

    import ray

    edges = _doc_directed_edges(sf_dir, work_dir)
    if exchange == "bucketed":
        sf_tag = os.path.basename(os.path.normpath(sf_dir))
        work = work_dir or f"/tmp/opps_feedcrawler_ray/webpipe-{sf_tag}"
        return _bfs_bucketed(
            edges, source, max_depth, os.path.join(work, f"gc_bfs-{os.getpid()}"), n_buckets
        )

    prop_schema = pa.schema([("doc_id", pa.int64()), ("nd", pa.int64())])
    depth: dict[int, int] = {source: 0}
    for _ in range(max_depth):
        ref = ray.put(depth)

        def propose(batch: pa.Table) -> pa.Table:
            dmap = ray.get(ref)
            df = batch.to_pandas()
            da = df["a"].map(dmap)
            m = da.notna()
            g = (
                pd.DataFrame(
                    {"doc_id": df.loc[m, "b"].to_numpy(dtype="int64"),
                     "nd": (da[m].to_numpy(dtype="float64") + 1).astype("int64")}
                )
                .groupby("doc_id", as_index=False)["nd"]
                .min()
            )
            return pa.Table.from_pandas(g, preserve_index=False, schema=prop_schema)

        # per-batch proposals are already min-combined and node-bounded —
        # the same fits-a-heap assumption the broadcast makes — so the
        # final min runs driver-side instead of paying one sort exchange
        # per iteration (blocks × |reached| rows cross, nothing shuffles)
        prop = (
            edges.map_batches(propose, batch_format="pyarrow")
            .to_pandas()
            .groupby("doc_id", as_index=False)["nd"]
            .min()
            .rename(columns={"nd": "min(nd)"})
        )
        changed = False
        for did, nd in zip(prop["doc_id"].to_numpy(), prop["min(nd)"].to_numpy()):
            did, nd = int(did), int(nd)
            if did not in depth or nd < depth[did]:
                depth[did] = nd
                changed = True
        if not changed:
            break
    out = pd.DataFrame(sorted(depth.items()), columns=["doc_id", "depth"])
    return out.astype({"doc_id": "int64", "depth": "int64"})


def host_hits(sf_dir: str, iters: int = 10, work_dir: str | None = None):
    """HITS hubs & authorities (Kleinberg 1999) over the host link graph
    — the mutually-recursive iterative-graph class PageRank's single
    recursion doesn't cover (authority = pointed-to by good hubs, hub =
    points at good authorities).

    Same scale shape as :func:`host_pagerank`: edges pinned once, only
    the two ≤|hosts|-entry score tables broadcast per iteration, one
    |hosts|-key groupby-sum per half-step.  Scores live in integer e9
    with exact L1 renormalization each half-step (floor scaling, the
    remainder to the lexicographically first hosts), so results are
    platform-exact, iteration-order-free, and mass-conserving — the
    rows-only check rides a float-replica twin + exact invariants.
    Raw sums stay < 2^63 while Σ(w)·1e9 < 2^63, i.e. up to ~9·10^9
    weighted edges per destination; past that the half-step needs the
    same bucketed co-shuffle fallback PageRank documents."""
    import pandas as pd

    edges_df = host_link_graph(sf_dir, work_dir=work_dir)
    hosts = sorted(set(edges_df["src_host"]) | set(edges_df["dst_host"]))
    n_hosts = len(hosts)
    if n_hosts == 0:
        return pd.DataFrame(
            {"host": pd.Series(dtype=object),
             "hub_e9": pd.Series(dtype="int64"),
             "auth_e9": pd.Series(dtype="int64")}
        )

    edges = rd.from_arrow(
        pa.Table.from_pandas(edges_df, preserve_index=False)
    ).materialize()

    def _renorm(raw: dict) -> dict:
        total = sum(raw.values())
        if total == 0:  # degenerate half-step: restart uniform
            base, rem = divmod(1_000_000_000, n_hosts)
            return {h: base + (1 if i < rem else 0) for i, h in enumerate(hosts)}
        scaled = {h: raw.get(h, 0) * 1_000_000_000 // total for h in hosts}
        pool = 1_000_000_000 - sum(scaled.values())
        for i, h in enumerate(hosts):
            if i < pool:
                scaled[h] += 1
        return scaled

    def _half_step(scores: dict, src_col: str, dst_col: str) -> dict:
        def contribute(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            s = df[src_col].map(scores).to_numpy(dtype="int64")
            g = (
                pd.DataFrame({"h": df[dst_col], "c": s * df["n_links"].to_numpy()})
                .groupby("h", as_index=False)["c"]
                .sum()
            )
            return pa.Table.from_pandas(
                g, preserve_index=False,
                schema=pa.schema([("h", pa.string()), ("c", pa.int64())]),
            )

        raw = (
            edges.map_batches(contribute, batch_format="pyarrow")
            .groupby("h")
            .sum("c")
            .to_pandas()
            .rename(columns={"sum(c)": "c"})
        )
        return _renorm(dict(zip(raw["h"], raw["c"].astype("int64"))))

    base, rem = divmod(1_000_000_000, n_hosts)
    hub = {h: base + (1 if i < rem else 0) for i, h in enumerate(hosts)}
    auth = dict(hub)
    for _ in range(iters):
        auth = _half_step(hub, "src_host", "dst_host")   # a ← Aᵀh
        hub = _half_step(auth, "dst_host", "src_host")   # h ← A·a
    out = pd.DataFrame(
        {"host": hosts,
         "hub_e9": [hub[h] for h in hosts],
         "auth_e9": [auth[h] for h in hosts]}
    ).sort_values(["auth_e9", "host"], ascending=[False, True])
    return out.reset_index(drop=True)


def doc_adamic_adar(
    sf_dir: str, k: int = 20, work_dir: str | None = None, max_degree: int | None = None
) -> "pd.DataFrame":
    """LINK PREDICTION over the doc link graph: top-k non-adjacent pairs
    by the Adamic–Adar index AA(x,y) = Σ_{z ∈ N(x)∩N(y)} 1/ln(deg z)
    (Adamic & Adar 2003) — the classic who-should-link-to-whom score.

    Exactness: each common neighbor contributes the INTEGER
    floor(1e9/ln(deg) + 0.5) (deg ≥ 2 for any common neighbor, so ln>0);
    integer sums are order-free and the oracle replays the identical
    floor expression, so the score hashes bit-equal.

    Scale shape (all combiner + bucket exchanges, shared with
    :func:`doc_triangle_counts` via :func:`_doc_link_edges`):

      1. undirected deduped edges (one pair-bucket exchange);
      2. degree table via node-bucketed partial sums, broadcast once
         (same fits-a-heap assumption/fallback PageRank documents);
      3. adjacency rows grouped by the CENTER vertex z; per-z neighbor
         pairs via the vectorized ``_cell_pair_indices`` kernel, each
         carrying z's integer weight — wedge volume is Σ deg², so
         ``max_degree`` (skip hubs: their 1/ln(deg) ≈ 0 contribution)
         is the documented web-scale cap, off at test scale;
      4. wedge rows UNION edge-marker rows co-shuffle on the pair key;
         per-bucket: drop already-adjacent pairs (np.isin on packed
         keys), sum weights, LOSSLESS local top-k (a pair lives in
         exactly one bucket) → O(k·buckets) driver merge."""
    import pandas as pd
    import ray

    from .dedup import _cell_pair_indices

    edges, n_docs, nb = _doc_link_edges(sf_dir, work_dir)
    deg_df = _doc_degrees(edges, nb)
    nodes_sorted = deg_df["node"].to_numpy(dtype=np.int64)
    order = np.argsort(nodes_sorted)
    nodes_sorted = nodes_sorted[order]
    degs_sorted = deg_df["c"].to_numpy(dtype=np.int64)[order]
    # integer per-neighbor contribution, the exactness trick
    w_sorted = np.floor(1e9 / np.log(np.maximum(degs_sorted, 2)) + 0.5).astype(np.int64)
    deg_ref = ray.put((nodes_sorted, degs_sorted, w_sorted))

    adj_schema = pa.schema([("z", pa.int64()), ("x", pa.int64()), ("__b", pa.int64())])

    def adj_rows(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        z = np.concatenate([a, b])
        x = np.concatenate([b, a])
        return pa.table(
            {"z": pa.array(z, pa.int64()), "x": pa.array(x, pa.int64()),
             "__b": pa.array((z % nb).astype("int64"), pa.int64())}
        )

    wedge_cols = {"u": "int64", "v": "int64", "w": "int64",
                  "kind": "int64", "__b2": "int64"}

    def _empty_wedges() -> pd.DataFrame:
        return pd.DataFrame({c: pd.Series(dtype=t) for c, t in wedge_cols.items()})

    def wedge_pairs(g: pd.DataFrame) -> pd.DataFrame:
        nodes, degs, ws = ray.get(deg_ref)
        if max_degree is not None:
            zi = np.searchsorted(nodes, g["z"].to_numpy(dtype=np.int64))
            g = g[degs[zi] <= max_degree]
        g = g.sort_values(["z", "x"])
        codes = g.groupby("z", sort=False).ngroup().to_numpy()
        i, j = _cell_pair_indices(codes)
        if len(i) == 0:
            return _empty_wedges()
        xs = g["x"].to_numpy(dtype=np.int64)
        zs = g["z"].to_numpy(dtype=np.int64)
        u = np.minimum(xs[i], xs[j])
        v = np.maximum(xs[i], xs[j])
        w = ws[np.searchsorted(nodes, zs[i])]
        df = pd.DataFrame({"u": u, "v": v, "w": w,
                           "kind": np.ones(len(u), dtype=np.int64)})
        df["__b2"] = ((df["u"] * np.int64(n_docs) + df["v"]) % nb).astype("int64")
        return df.astype(wedge_cols)

    def edge_markers(batch: pd.DataFrame) -> pd.DataFrame:
        u = batch["a"].to_numpy(dtype=np.int64)
        v = batch["b"].to_numpy(dtype=np.int64)
        df = pd.DataFrame({"u": u, "v": v,
                           "w": np.zeros(len(u), dtype=np.int64),
                           "kind": np.zeros(len(u), dtype=np.int64)})
        df["__b2"] = ((df["u"] * np.int64(n_docs) + df["v"]) % nb).astype("int64")
        return df.astype(wedge_cols)

    out_cols = {"a": "int64", "b": "int64", "cn": "int64", "aa_e9": "int64"}

    def score_bucket(g: pd.DataFrame) -> pd.DataFrame:
        key = g["u"].to_numpy(dtype=np.int64) * np.int64(n_docs) + g["v"].to_numpy(
            dtype=np.int64
        )
        is_edge = g["kind"].to_numpy() == 0
        wr = g[~is_edge].loc[~np.isin(key[~is_edge], key[is_edge])]
        if not len(wr):
            return pd.DataFrame({c: pd.Series(dtype=t) for c, t in out_cols.items()})
        s = wr.groupby(["u", "v"], as_index=False).agg(
            cn=("w", "size"), aa_e9=("w", "sum")
        )
        s = s.sort_values(["aa_e9", "u", "v"], ascending=[False, True, True]).head(k)
        return s.rename(columns={"u": "a", "v": "b"}).astype(out_cols)

    probe = (
        edges.map_batches(adj_rows, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(wedge_pairs, batch_format="pandas")
        .union(edges.map_batches(edge_markers, batch_format="pandas"))
    )
    parts = probe.groupby("__b2").map_groups(score_bucket, batch_format="pandas").to_pandas()
    return (
        parts.sort_values(["aa_e9", "a", "b"], ascending=[False, True, True])
        .head(k)
        .reset_index(drop=True)[["a", "b", "cn", "aa_e9"]]
    )


def doc_clustering_coeff(sf_dir: str, work_dir: str | None = None) -> "pd.DataFrame":
    """LOCAL CLUSTERING COEFFICIENT per doc (Watts & Strogatz 1998):
    c(v) = 2·T(v) / (deg(v)·(deg(v)−1)) over the undirected doc link
    graph — triangles from the existing degree-orientation pipeline
    (:func:`doc_triangle_counts`), degrees from the shared edge build;
    both tables are node-bounded, so the final join is a driver-side
    merge of two ≤|nodes| frames (the PageRank fits-a-heap assumption).
    e6 half-up with the identical float expression in the oracle."""
    import pandas as pd

    edges, n_docs, nb = _doc_link_edges(sf_dir, work_dir)
    deg_df = _doc_degrees(edges, nb)
    tri = doc_triangle_counts(
        sf_dir, work_dir, _edges=(edges, n_docs, nb), _deg_df=deg_df
    )
    deg = deg_df.rename(columns={"node": "doc_id", "c": "degree"})
    out = deg[deg["degree"] >= 2].merge(tri, on="doc_id", how="left")
    out["n_triangles"] = out["n_triangles"].fillna(0).astype("int64")
    d = out["degree"].to_numpy(dtype="float64")
    t = out["n_triangles"].to_numpy(dtype="float64")
    out["cc_e6"] = np.floor(2.0 * t * 1e6 / (d * (d - 1.0)) + 0.5).astype("int64")
    return (
        out[["doc_id", "degree", "n_triangles", "cc_e6"]]
        .sort_values("doc_id")
        .reset_index(drop=True)
        .astype({"doc_id": "int64", "degree": "int64"})
    )


def max_spanning_forest_from_edges(edges_df) -> "pd.DataFrame":
    """Distributed BORŮVKA MAXIMUM SPANNING FOREST over the weighted
    host graph — the web-graph BACKBONE (the strongest inter-host links
    that keep every component connected), the classic parallel-MST
    algorithm (Borůvka 1926; the GraphX/Pregel staple next to PageRank
    / components / k-core in this family).

    Determinism: edges carry the TOTAL ORDER key (−weight, u, v) — all
    effective weights distinct ⇒ the spanning forest is UNIQUE, so
    Borůvka here equals driver-side Kruskal exactly (the twin test).

    Scale shape: directed counts fold to undirected (u<v) edges via one
    ≤|hosts|²-bounded groupby; the edge dataset is PINNED (materialized
    once); per round the ≤|hosts| component-label dict broadcasts via
    ray.put into a map_batches that emits ONE best-edge candidate per
    (component, batch) (combiner), the driver reduces ≤|comps| rows and
    union-finds the merges.  Components at least halve per round ⇒
    ≤log₂|hosts| rounds; only label tables and candidate rows ever move
    after the pin."""
    import ray

    import pandas as pd

    und = edges_df.copy()
    u = np.minimum(und["src_host"], und["dst_host"])
    v = np.maximum(und["src_host"], und["dst_host"])
    und = (
        pd.DataFrame({"u": u, "v": v, "w": und["n_links"]})
        .groupby(["u", "v"], as_index=False)["w"].sum()
    )
    und = und[und["u"] != und["v"]].reset_index(drop=True)  # self-loops never span
    hosts = sorted(set(und["u"]) | set(und["v"]))
    if not hosts:
        return pd.DataFrame({
            "src_host": pd.Series(dtype=object), "dst_host": pd.Series(dtype=object),
            "n_links": pd.Series(dtype="int64")})
    edges = rd.from_arrow(
        pa.Table.from_pandas(und, preserve_index=False)
    ).materialize()

    parent = {h: h for h in hosts}

    def find(x: str) -> str:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    chosen: set[tuple[str, str, int]] = set()
    _schema = pa.schema([("comp", pa.string()), ("u", pa.string()),
                         ("v", pa.string()), ("w", pa.int64())])
    for _ in range(max(1, int(np.ceil(np.log2(len(hosts)))) + 1)):
        label = {h: find(h) for h in hosts}
        lab_ref = ray.put(label)

        def best_per_comp(batch: pa.Table, _ref=lab_ref) -> pa.Table:
            lab = ray.get(_ref)
            df = batch.to_pandas()
            cu = df["u"].map(lab)
            cv = df["v"].map(lab)
            keep = (cu != cv).to_numpy()
            df = df[keep]
            if not len(df):
                return pa.Table.from_pandas(
                    pd.DataFrame({"comp": [], "u": [], "v": [], "w": []}),
                    preserve_index=False, schema=_schema)
            d = pd.concat([
                df.assign(comp=cu[keep].to_numpy()),
                df.assign(comp=cv[keep].to_numpy()),
            ])
            # total order (−w, u, v): one best candidate per component
            d = d.sort_values(["comp", "w", "u", "v"],
                              ascending=[True, False, True, True])
            d = d.drop_duplicates("comp")[["comp", "u", "v", "w"]]
            return pa.Table.from_pandas(d, preserve_index=False, schema=_schema)

        cand = edges.map_batches(best_per_comp, batch_format="pyarrow").to_pandas()
        if not len(cand):
            break
        best = (
            cand.sort_values(["comp", "w", "u", "v"],
                             ascending=[True, False, True, True])
            .drop_duplicates("comp")
        )
        merged = False
        # deterministic merge order (comp ascending) — the chosen SET is
        # order-independent anyway (unique-MSF property)
        for _, r in best.iterrows():
            ru, rv = find(r["u"]), find(r["v"])
            if ru != rv:
                parent[max(ru, rv)] = min(ru, rv)
                chosen.add((r["u"], r["v"], int(r["w"])))
                merged = True
        if not merged:
            break
    out = pd.DataFrame(sorted(chosen), columns=["src_host", "dst_host", "n_links"])
    return out.reset_index(drop=True)


def host_spanning_forest(sf_dir: str, work_dir: str | None = None):
    """Maximum spanning forest of the host link graph (rows-only driver
    check; the Borůvka core is pinned against a Kruskal twin in
    tests)."""
    return max_spanning_forest_from_edges(host_link_graph(sf_dir, work_dir=work_dir))


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (np.asarray(x, dtype=np.uint64) + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    z = x
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _hyperball_bucketed(
    sf_dir: str, p: int = 8, max_iters: int = 32, work_dir: str | None = None,
    n_buckets: int = 8,
):
    """Out-of-driver HyperBall (VERDICT r4 task #1 family): per-node HLL
    registers live as per-bucket object-store pins co-partitioned with
    the (expanded, directed) edges; only counters that CHANGED last
    round propagate (the Boldi-Vigna systolic optimization — exact by
    max-merge idempotence: an unchanged source's registers were already
    absorbed a round earlier), per-destination max-reduce runs inside
    the propose task, and each merge max-folds its bucket, recomputes
    estimates for changed rows only, accumulates the per-node harmonic
    telescope in bucket state, and reports (changed, Σest) scalars.
    The driver holds refs + per-round scalar sums.

    Returns ``(nf_sums, state_refs)``: the per-round N(t) totals and the
    final per-bucket state (node, regs, est, harm) refs."""
    import pandas as pd

    import ray  # noqa: F401  (graphcore owns the task plumbing)

    from ..functions.sketch import hll_estimate_rows, hll_init_rows
    from . import graphcore as gc

    edges, _n_docs, _nb = _doc_link_edges(sf_dir, work_dir=work_dir)
    sf_tag = os.path.basename(os.path.normpath(sf_dir))
    work = work_dir or f"/tmp/opps_feedcrawler_ray/webpipe-{sf_tag}"
    gc_dir = os.path.join(work, f"gc_hb-{os.getpid()}")
    m = 1 << p

    directed = gc.expand_undirected(edges)
    edge_refs = gc.partition_by_key(
        directed, "a", n_buckets, os.path.join(gc_dir, "edges"), ["a", "b"]
    )
    node_refs = gc.partition_by_key(
        gc.node_table(directed), "node", n_buckets,
        os.path.join(gc_dir, "nodes"), ["node"],
        spill_transform=lambda d: d.drop_duplicates(),
    )

    def init_fn(nodes_df: pd.DataFrame):
        nd = np.sort(nodes_df["node"].to_numpy(dtype=np.int64))
        if not len(nd):
            st = pd.DataFrame({"node": pd.Series([], dtype="int64"),
                               "regs": pd.Series([], dtype=object),
                               "est": pd.Series([], dtype="float64"),
                               "harm": pd.Series([], dtype="float64"),
                               "fresh": pd.Series([], dtype="int64")})
            return st, (0, 0.0)
        regs = hll_init_rows(_splitmix64(nd.astype(np.uint64)), p)
        est = hll_estimate_rows(regs)
        st = pd.DataFrame({"node": nd, "regs": [r.tobytes() for r in regs],
                           "est": est, "harm": 0.0, "fresh": 1})
        return st, (0, float(est.sum()))

    state_refs, infos0 = gc.map_state(init_fn, node_refs)
    nf = [sum(i[1] for i in infos0)]

    def _rows_max_by_node(nodes_arr, mat):
        order = np.argsort(nodes_arr, kind="stable")
        ns = nodes_arr[order]
        starts = np.flatnonzero(np.r_[True, ns[1:] != ns[:-1]])
        return ns[starts], np.maximum.reduceat(mat[order], starts, axis=0)

    def propose(edges_df: pd.DataFrame, st: pd.DataFrame):
        if not len(edges_df) or not len(st):
            return None
        fresh = st[st["fresh"] == 1]
        if not len(fresh):
            return None
        mg = edges_df.merge(fresh[["node", "regs"]], left_on="a",
                            right_on="node")
        if not len(mg):
            return None
        dst = mg["b"].to_numpy(dtype=np.int64)
        R = np.frombuffer(b"".join(mg["regs"]), dtype=np.uint8).reshape(-1, m)
        dn, dm = _rows_max_by_node(dst, R)
        return pd.DataFrame({"node": dn, "regs": [r.tobytes() for r in dm]})

    def make_merge(t: int):
        def merge(st: pd.DataFrame, props: pd.DataFrame):
            st = st.assign(fresh=0)
            if not len(props) or not len(st):
                return st, 0, float(st["est"].sum()) if len(st) else 0.0
            pn = props["node"].to_numpy(dtype=np.int64)
            PM = np.frombuffer(b"".join(props["regs"]), dtype=np.uint8
                               ).reshape(-1, m)
            pnodes, pmerged = _rows_max_by_node(pn, PM)
            sn = st["node"].to_numpy()  # sorted by construction
            pos = np.clip(np.searchsorted(sn, pnodes), 0, len(sn) - 1)
            valid = sn[pos] == pnodes
            pos, pmerged = pos[valid], pmerged[valid]
            if not len(pos):
                return st, 0, float(st["est"].sum())
            M = np.frombuffer(b"".join(st["regs"]), dtype=np.uint8
                              ).reshape(-1, m)
            newrows = np.maximum(M[pos], pmerged)
            chg = (newrows != M[pos]).any(axis=1)
            n_changed = int(chg.sum())
            if n_changed:
                cp = pos[chg]
                est = st["est"].to_numpy().copy()
                harm = st["harm"].to_numpy().copy()
                new_est = hll_estimate_rows(newrows[chg])
                harm[cp] += np.maximum(new_est - est[cp], 0.0) / t
                est[cp] = new_est
                fresh = np.zeros(len(sn), dtype=np.int64)
                fresh[cp] = 1
                regs_col = list(st["regs"])
                for i_, r_ in zip(cp, newrows[chg]):
                    regs_col[i_] = r_.tobytes()
                st = pd.DataFrame({"node": sn, "regs": regs_col, "est": est,
                                   "harm": harm, "fresh": fresh})
            return st, n_changed, float(st["est"].sum())
        return merge

    for t in range(1, max_iters + 1):
        state_refs, _, it_infos = gc.bucketed_fixpoint(
            edge_refs, state_refs, propose, make_merge(t), max_iters=1,
            collect_infos=True,
        )
        vals = it_infos[0]
        if sum(v[0] for v in vals) == 0:  # exact fixpoint: no register grew
            break
        nf.append(sum(v[1] for v in vals))
    return nf, state_refs


def doc_neighborhood_function(
    sf_dir: str, p: int = 8, max_iters: int = 32, work_dir: str | None = None,
    exchange: str = "bucketed",
):
    """HYPERBALL (Boldi & Vigna, "In-Core Computation of Geometric
    Centralities with HyperBall", 2013 — the HADI/ANF lineage):
    estimate the NEIGHBORHOOD FUNCTION N(t) = |{(u,v): dist(u,v) <= t}|
    of the undirected doc link graph with one p=8 HyperLogLog counter
    per node, from which the effective diameter falls out.  This is THE
    scale algorithm for graph-distance statistics: exact all-pairs BFS
    is O(V*E) and unshardable, HyperBall is max-iters passes of a
    256 B/node max-merge — the same message shape as PageRank.

    Per iteration: the register matrix broadcasts (``ray.put`` once per
    round) into a ``map_batches`` over the PINNED edge dataset; each
    batch max-merges its sources' registers per destination
    (``np.maximum.reduceat`` — a combiner, so at most |batch dsts| rows
    leave), one node-bucket exchange max-merges across batches, and the
    driver folds the node-bounded result into the matrix (monotone
    union, so the fold is order-free and idempotent).  Counters are
    DETERMINISTIC (splitmix64 of the node id seeds the registers), so
    every run and every cluster size yields identical estimates.

    Convergence: N(t) is non-decreasing and saturates exactly when
    every ball stops growing; we stop at the first round where no
    register changes (exact fixpoint, not an epsilon test).

    PARTITIONING ASSUMPTION (same family as host_pagerank's): the
    register matrix fits a worker heap — |V| * 2^p bytes (10^8 nodes at
    p=8 is 25.6 GB; drop to p=6 / 6.4 GB or switch the broadcast to a
    bucketed counter<->edge co-shuffle on hash(node) past that; the
    iteration body is unchanged).

    Rows-only driver check (iterative + sketch-estimated, not
    SQL-expressible); tests pin it against an EXACT boolean-matrix BFS
    neighborhood function at small scale and assert per-t relative
    error within the p=8 HLL band plus run-to-run determinism.

    Returns one row per round t: (t int64, est_pairs float64).

    ``exchange="bucketed"`` (default, VERDICT r4 task #1 family) runs
    the register exchange out-of-driver (see ``_hyperball_bucketed`` —
    per-node estimates are bit-identical to the broadcast twin; the
    per-round totals differ only by float summation order across
    buckets); ``"broadcast"`` keeps the prior register-matrix broadcast
    as the twin."""
    import pandas as pd

    if exchange == "bucketed":
        nf, _refs = _hyperball_bucketed(sf_dir, p=p, max_iters=max_iters,
                                        work_dir=work_dir)
        rows_out = [(t, float(s)) for t, s in enumerate(nf)]
    else:
        nodes, per_round = _hyperball_rounds(sf_dir, p=p, max_iters=max_iters,
                                             work_dir=work_dir)
        rows_out = [(t, float(np.sum(est))) for t, est in enumerate(per_round)]
    return pd.DataFrame(rows_out, columns=["t", "est_pairs"]).astype(
        {"t": "int64", "est_pairs": "float64"}
    )


def _hyperball_rounds(
    sf_dir: str, p: int = 8, max_iters: int = 32, work_dir: str | None = None
):
    """Shared HyperBall iteration (see :func:`doc_neighborhood_function`
    for the full algorithm/shape notes).  Returns ``(nodes, per_round)``
    where ``per_round[t]`` is the float64 per-node ball-size estimate
    |B(u, t)| after round t (t = 0 .. saturation)."""
    import pandas as pd
    import ray

    from ..functions.sketch import hll_estimate_rows, hll_init_rows

    edges, _n_docs, nb = _doc_link_edges(sf_dir, work_dir=work_dir)
    # node universe = endpoints of the deduped edge set (isolated docs
    # carry no distance information; consistent with the graph family)
    nodes = (
        edges.map_batches(
            lambda b: pa.table(
                {"node": np.unique(np.concatenate([
                    b["a"].to_numpy(zero_copy_only=False),
                    b["b"].to_numpy(zero_copy_only=False),
                ]))}
            ),
            batch_format="pyarrow",
        )
        .to_pandas()["node"]
        .unique()
    )
    nodes = np.sort(nodes.astype(np.int64))
    n = len(nodes)
    if n == 0:
        return nodes, [np.zeros(0, dtype=np.float64)]

    regs = hll_init_rows(_splitmix64(nodes.astype(np.uint64)), p)
    per_round = [hll_estimate_rows(regs)]

    out_schema = pa.schema(
        [("node", pa.int64()), ("regs", pa.binary()), ("__b", pa.int64())]
    )
    m = 1 << p

    for t in range(1, max_iters + 1):
        regs_ref = ray.put(regs)

        def propagate(batch: pa.Table, _ref=regs_ref) -> pa.Table:
            R = ray.get(_ref)
            a = batch["a"].to_numpy(zero_copy_only=False)
            b = batch["b"].to_numpy(zero_copy_only=False)
            src = np.concatenate([a, b])
            dst = np.concatenate([b, a])
            si = np.searchsorted(nodes, src)
            di = np.searchsorted(nodes, dst)
            order = np.argsort(di, kind="stable")
            di_s = di[order]
            rows = R[si[order]]
            starts = np.flatnonzero(np.r_[True, di_s[1:] != di_s[:-1]])
            merged = np.maximum.reduceat(rows, starts, axis=0)
            dsts = nodes[di_s[starts]]
            return pa.Table.from_arrays(
                [
                    pa.array(dsts, type=pa.int64()),
                    pa.array([r.tobytes() for r in merged], type=pa.binary()),
                    pa.array(dsts % nb, type=pa.int64()),
                ],
                schema=out_schema,
            )

        def merge_group(g, _m=m):
            mat = np.frombuffer(b"".join(g["regs"]), dtype=np.uint8).reshape(-1, _m)
            node = g["node"].to_numpy()
            order = np.argsort(node, kind="stable")
            node_s = node[order]
            starts = np.flatnonzero(np.r_[True, node_s[1:] != node_s[:-1]])
            merged = np.maximum.reduceat(mat[order], starts, axis=0)
            return pd.DataFrame(
                {"node": node_s[starts], "regs": [r.tobytes() for r in merged]}
            )

        inc = (
            edges.map_batches(propagate, batch_format="pyarrow")
            .groupby("__b")
            .map_groups(merge_group, batch_format="pandas")
            .to_pandas()
        )
        new = regs.copy()
        if len(inc):
            ii = np.searchsorted(nodes, inc["node"].to_numpy())
            mat = np.frombuffer(b"".join(inc["regs"]), dtype=np.uint8).reshape(-1, m)
            np.maximum.at(new, ii, mat)
        if np.array_equal(new, regs):  # exact fixpoint — every ball closed
            break
        regs = new
        per_round.append(hll_estimate_rows(regs))

    return nodes, per_round


def doc_harmonic_centrality(
    sf_dir: str, k: int = 25, p: int = 8, max_iters: int = 32,
    work_dir: str | None = None, exchange: str = "bucketed",
):
    """HARMONIC CENTRALITY via HyperBall (Boldi & Vigna 2013 — the
    paper's headline application): H(u) = Σ_{v≠u} 1/dist(u, v),
    estimated per node from the ball-growth telescope
    Σ_t (|B(u,t)| − |B(u,t−1)|)/t over the shared HyperBall rounds
    (:func:`_hyperball_rounds` — one node-bucket register exchange per
    round, nothing extra for centrality: the per-node estimates are
    free off the same counters).  Growth increments clip at ≥ 0 (HLL
    estimates are monotone in the registers but the bias correction can
    wobble a hair).  Deterministic.

    Rows-only driver check; tests pin the exact BFS harmonic
    centralities at small scale (rank agreement + per-node band).

    Returns top-``k`` (doc_id, harmonic_e6), harmonic DESC, doc_id ASC.

    ``exchange="bucketed"`` (default) accumulates the per-node telescope
    INSIDE the bucket state as the registers grow (bit-identical to the
    broadcast twin's per-node result — each node's estimate sequence is
    computed from the same registers in the same round order), then
    takes a per-bucket local top-k before one B·k-row driver collect;
    ``"broadcast"`` keeps the prior full-matrix path as the twin."""
    import pandas as pd

    if exchange == "bucketed":
        from . import graphcore as gc

        _nf, state_refs = _hyperball_bucketed(sf_dir, p=p, max_iters=max_iters,
                                              work_dir=work_dir)

        def trim(st: pd.DataFrame):
            if not len(st):
                return pd.DataFrame({"node": pd.Series([], dtype="int64"),
                                     "harmonic_e6": pd.Series([], dtype="int64")}), 0
            top = pd.DataFrame({
                "node": st["node"].to_numpy(dtype=np.int64),
                "harmonic_e6": np.floor(
                    st["harm"].to_numpy(dtype=np.float64) * 1e6 + 0.5
                ).astype("int64"),
            }).sort_values(["harmonic_e6", "node"],
                           ascending=[False, True]).head(k)
            return top.reset_index(drop=True), 0

        trimmed, _ = gc.map_state(trim, state_refs)
        out = gc.collect_state(trimmed)
        if not len(out):
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "harmonic_e6": pd.Series(dtype="int64")})
        out = (
            out.rename(columns={"node": "doc_id"})
            .sort_values(["harmonic_e6", "doc_id"], ascending=[False, True])
            .head(k)
        )
        return out.astype({"doc_id": "int64", "harmonic_e6": "int64"}
                          ).reset_index(drop=True)

    nodes, per_round = _hyperball_rounds(sf_dir, p=p, max_iters=max_iters,
                                         work_dir=work_dir)
    if len(nodes) == 0:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "harmonic_e6": pd.Series(dtype="int64")})
    harm = np.zeros(len(nodes), dtype=np.float64)
    for t in range(1, len(per_round)):
        harm += np.maximum(per_round[t] - per_round[t - 1], 0.0) / t
    out = pd.DataFrame({
        "doc_id": nodes,
        "harmonic_e6": np.floor(harm * 1e6 + 0.5).astype("int64"),
    }).sort_values(["harmonic_e6", "doc_id"], ascending=[False, True]).head(k)
    return out.reset_index(drop=True)


def effective_diameter(nf: "pd.DataFrame", q: float = 0.9) -> float:
    """Standard interpolated effective diameter from a neighborhood
    function table (t, est_pairs): smallest (fractional) t where
    N(t) >= q * N(max)."""
    ts = nf["t"].to_numpy()
    ns = nf["est_pairs"].to_numpy(dtype=np.float64)
    target = q * ns[-1]
    k = int(np.argmax(ns >= target))
    if k == 0:
        return float(ts[0])
    lo, hi = ns[k - 1], ns[k]
    frac = 0.0 if hi == lo else (target - lo) / (hi - lo)
    return float(ts[k - 1] + frac * (ts[k] - ts[k - 1]))


def _brandes_source_pass(
    src: int, indptr: np.ndarray, indices: np.ndarray, n: int
) -> np.ndarray:
    """One exact Brandes (2001) source pass over a CSR adjacency:
    BFS shortest-path DAG + backward dependency accumulation.  Serial
    per source (deterministic), returns the per-node dependency vector
    delta (float64)."""
    sigma = np.zeros(n, dtype=np.float64)
    dist = np.full(n, -1, dtype=np.int64)
    sigma[src] = 1.0
    dist[src] = 0
    order: list[np.ndarray] = []
    frontier = np.array([src], dtype=np.int64)
    while len(frontier):
        order.append(frontier)
        # gather all neighbors of the frontier in one CSR slice pass
        starts, ends = indptr[frontier], indptr[frontier + 1]
        counts = ends - starts
        if not counts.sum():
            break
        flat = np.concatenate(
            [indices[s:e] for s, e in zip(starts, ends)]
        )
        srcs = np.repeat(frontier, counts)
        d = dist[frontier[0]] + 1
        # path counts: sigma[w] += sigma[v] for tree/DAG edges v->w
        new_mask = dist[flat] == -1
        dist[flat[new_mask]] = d
        dag_mask = dist[flat] == d
        np.add.at(sigma, flat[dag_mask], sigma[srcs[dag_mask]])
        frontier = np.unique(flat[new_mask])
    delta = np.zeros(n, dtype=np.float64)
    for frontier in reversed(order[1:]):
        for w in frontier:
            # predecessors of w: neighbors at dist[w]-1
            nbrs = indices[indptr[w]:indptr[w + 1]]
            preds = nbrs[dist[nbrs] == dist[w] - 1]
            contrib = sigma[preds] / sigma[w] * (1.0 + delta[w])
            np.add.at(delta, preds, contrib)
    delta[src] = 0.0
    return delta


def doc_betweenness(
    sf_dir: str, k: int = 20, work_dir: str | None = None,
    k_sources: int | None = None, max_sources: int = 1024,
) -> "pd.DataFrame":
    """BETWEENNESS CENTRALITY (Brandes 2001) over the undirected doc
    link graph — the shortest-path centrality that PageRank/harmonic
    miss (a bridge node scores high even with low degree).

    Distributed shape: betweenness parallelizes over SOURCES — each
    source's BFS + dependency accumulation is independent, so the
    source list becomes the Dataset and each task runs exact Brandes
    passes against a read-only CSR adjacency shipped ONCE via
    ``ray.put`` (one copy per node on a cluster; the graph-fits-a-node
    assumption is the standard parallel-Brandes trade — Madduri & Bader
    2009 — and the documented fallback past it is the Brandes-Pich 2007
    SAMPLED-source estimator, exposed as ``k_sources``: the same code
    path over the splitmix64-smallest source subset, unbiased up to the
    n/k rescale).  Per-source dependency vectors quantize to e9
    integers before summation, so the reduce is ORDER-FREE and the
    result bit-reproducible across partitionings.  Per task only the
    nonzero (node, bc_e9) partials leave; the driver folds ≤|nodes|
    integer rows.

    Returns the top-``k`` nodes by raw pair-dependency sum ``bc2_e9``
    (undirected double-count kept integer; halve for the textbook
    value), ties broken by doc_id."""
    import pandas as pd

    import ray

    from .ann import _mix64

    edges, n_docs, nb = _doc_link_edges(sf_dir, work_dir)
    n = n_docs
    block_refs = _edge_block_refs(edges)

    @ray.remote
    def build_csr(*blocks):
        # round 5: the |E|-sized CSR build runs in a task; its return
        # ref IS the pinned graph — the driver holds refs only
        e = _blocks_to_edge_df(blocks)
        a = e["a"].to_numpy(dtype="int64")
        b = e["b"].to_numpy(dtype="int64")
        # CSR over both directions (undirected)
        src = np.concatenate([a, b])
        dst = np.concatenate([b, a])
        o = np.lexsort((dst, src))
        src, dst = src[o], dst[o]
        indptr = np.zeros(n + 1, dtype=np.int64)
        np.add.at(indptr, src + 1, 1)
        indptr = np.cumsum(indptr)
        return indptr, dst, n

    graph_ref = build_csr.remote(*block_refs)

    sources = np.arange(n, dtype=np.int64)
    if k_sources is None and n > max_sources:
        # auto-engage the Brandes-Pich sampled estimator past the exact
        # budget: per-source cost is O(V+E) serial python, so exact
        # all-sources Brandes stops paying past ~1k sources
        k_sources = max_sources
    if k_sources is not None and k_sources < n:
        sources = sources[np.argsort(_mix64(sources), kind="stable")[:k_sources]]
        sources.sort()
    src_ds = rd.from_arrow(pa.table({"s": pa.array(sources, pa.int64())}))
    src_ds = src_ds.repartition(max(2, min(64, len(sources) // 8 or 1)))

    part_schema = pa.schema([("doc_id", pa.int64()), ("bc2_e9", pa.int64())])

    def source_pass(batch: pa.Table) -> pa.Table:
        indptr_, indices_, n_ = ray.get(graph_ref)
        acc = np.zeros(n_, dtype=np.int64)
        for s in batch["s"].to_numpy(zero_copy_only=False):
            delta = _brandes_source_pass(int(s), indptr_, indices_, n_)
            acc += np.floor(delta * 1e9 + 0.5).astype(np.int64)
        nz = np.flatnonzero(acc)
        return pa.table({
            "doc_id": pa.array(nz.astype("int64"), pa.int64()),
            "bc2_e9": pa.array(acc[nz], pa.int64()),
        })

    bc = (
        src_ds.map_batches(source_pass, batch_format="pyarrow",
                           batch_size=None)
        .to_pandas()  # ≤ tasks × |nodes| integer rows, node-bounded
        .groupby("doc_id", as_index=False)["bc2_e9"].sum()
    )
    out = (
        bc.sort_values(["bc2_e9", "doc_id"], ascending=[False, True])
        .head(k).reset_index(drop=True)
        .astype({"doc_id": "int64", "bc2_e9": "int64"})
    )
    return out


def doc_sssp(
    sf_dir: str, work_dir: str | None = None, source: int = 0,
    max_iters: int = 64, exchange: str = "bucketed", n_buckets: int = 8,
) -> pd.DataFrame:
    """WEIGHTED single-source shortest paths (distributed Bellman-Ford)
    over the directed doc link graph — the weighted sibling of
    ``doc_bfs_depth`` (hop counts can't express transfer costs; this is
    the relax-until-fixpoint loop Pregel/GraphX ship as SSSP).

    Edge weights are deterministic id arithmetic, w(a, b) =
    1 + (7a + 13b) mod 5 — derivable by the twin without shipping a
    weight column.  Per iteration the ≤|reached| distance table
    broadcasts (``ray.put``) into ONE ``map_batches`` over the PINNED
    edge dataset; each batch relaxes dist[b] = dist[a] + w with a
    per-batch min combiner (node-bounded output), the driver folds the
    proposals and early-exits on fixpoint.  Edges never move.  Weights
    are positive so Bellman-Ford converges in ≤ |V| rounds; rows-only
    (weighted recursive-CTE oracles explode on cyclic graphs) — the
    twin replays Dijkstra over the same edge list.

    ``exchange="bucketed"`` (default, VERDICT r4 task #1) relaxes
    through the ``graphcore`` out-of-driver label exchange (frontier-
    only proposals, dst-bucket-partitioned flow, driver holds refs +
    counters only); ``"broadcast"`` keeps the prior ≤|reached| dict
    broadcast as the fits-a-heap twin."""
    import pandas as pd

    import ray

    edges = _doc_directed_edges(sf_dir, work_dir)
    if exchange == "bucketed":
        sf_tag = os.path.basename(os.path.normpath(sf_dir))
        work = work_dir or f"/tmp/opps_feedcrawler_ray/webpipe-{sf_tag}"

        def _w(aa: np.ndarray, bb: np.ndarray) -> np.ndarray:
            return 1 + (7 * aa + 13 * bb) % 5

        return _relax_bucketed(
            edges, source, max_iters, os.path.join(work, f"gc_sssp-{os.getpid()}"),
            n_buckets, weight_fn=_w, out_col="dist",
        )

    prop_schema = pa.schema([("doc_id", pa.int64()), ("nd", pa.int64())])
    dist: dict[int, int] = {source: 0}
    for _ in range(max_iters):
        ref = ray.put(dist)

        def relax(batch: pa.Table) -> pa.Table:
            dmap = ray.get(ref)
            df = batch.to_pandas()
            da = df["a"].map(dmap)
            m = da.notna()
            if not m.any():
                return pa.Table.from_pandas(
                    pd.DataFrame({"doc_id": [], "nd": []}),
                    preserve_index=False, schema=prop_schema,
                )
            aa = df.loc[m, "a"].to_numpy(dtype="int64")
            bb = df.loc[m, "b"].to_numpy(dtype="int64")
            w = 1 + (7 * aa + 13 * bb) % 5
            g = (
                pd.DataFrame(
                    {"doc_id": bb,
                     "nd": da[m].to_numpy(dtype="float64").astype("int64") + w}
                )
                .groupby("doc_id", as_index=False)["nd"]
                .min()
            )
            return pa.Table.from_pandas(g, preserve_index=False, schema=prop_schema)

        prop = (
            edges.map_batches(relax, batch_format="pyarrow")
            .to_pandas()
            .groupby("doc_id", as_index=False)["nd"]
            .min()
        )
        changed = False
        for did, nd in zip(prop["doc_id"].to_numpy(), prop["nd"].to_numpy()):
            did, nd = int(did), int(nd)
            if did not in dist or nd < dist[did]:
                dist[did] = nd
                changed = True
        if not changed:
            break
    out = pd.DataFrame(sorted(dist.items()), columns=["doc_id", "dist"])
    return out.astype({"doc_id": "int64", "dist": "int64"})


def _luby_bucketed(edges_ds, n_docs: int, gc_dir: str,
                   n_buckets: int) -> "pd.DataFrame":
    """Out-of-driver Luby MIS (VERDICT r4 task #1 family): node state
    (active / MIS / pending-join) lives as per-bucket pins
    co-partitioned with the expanded directed edges; priorities are a
    pure function of (node id, round salt) so NOTHING node-sized ever
    broadcasts.  Each round = two one-shot exchanges: (1) min active-
    neighbor (priority, id) proposals decide joiners at the destination
    merge; (2) joiner markers knock out neighborhoods, the merge folds
    joins into the MIS and reports the bucket's remaining-active count
    — the driver loops on the scalar total.  Identical output to the
    broadcast twin (same priorities, same strict comparison)."""
    import pandas as pd

    from . import graphcore as gc

    edge_refs = gc.partition_by_key(
        gc.expand_undirected(edges_ds), "a", n_buckets, gc_dir, ["a", "b"],
    )

    def init(bk: int) -> pd.DataFrame:
        nd = np.arange(bk, n_docs, n_buckets, dtype=np.int64)
        return pd.DataFrame({"node": nd,
                             "active": np.ones(len(nd), dtype=np.int64),
                             "mis": np.zeros(len(nd), dtype=np.int64),
                             "join": np.zeros(len(nd), dtype=np.int64)})

    state_refs = gc.init_state_refs(init, n_buckets)
    remaining = n_docs
    rnd = 0
    while remaining > 0:
        salt = np.uint64((0xD1B54A32D192ED03 * (rnd + 1)) & 0xFFFFFFFFFFFFFFFF)

        def propose_min(edges_df: pd.DataFrame, st: pd.DataFrame, _s=salt):
            if not len(edges_df) or not len(st):
                return None
            sn = st["node"].to_numpy()  # arange-strided: sorted
            act = st["active"].to_numpy()
            src = edges_df["a"].to_numpy(dtype=np.int64)
            dst = edges_df["b"].to_numpy(dtype=np.int64)
            pos = np.clip(np.searchsorted(sn, src), 0, len(sn) - 1)
            live = (sn[pos] == src) & (act[pos] == 1)
            if not live.any():
                return None
            src, dst = src[live], dst[live]
            np_ = _splitmix64(src.astype(np.uint64) ^ _s)
            df = pd.DataFrame({"node": dst, "np_": np_, "nid": src})
            return (
                df.sort_values(["np_", "nid"])
                .groupby("node", as_index=False)
                .first()
            )

        def merge_join(st: pd.DataFrame, props: pd.DataFrame, _s=salt):
            act = st["active"].to_numpy()
            join = act.copy()  # no active neighbor => local minimum
            if len(props):
                best = (
                    props.sort_values(["np_", "nid"])
                    .groupby("node", as_index=False)
                    .first()
                )
                sn = st["node"].to_numpy()
                pos = np.clip(np.searchsorted(sn, best["node"].to_numpy()),
                              0, len(sn) - 1)
                valid = (sn[pos] == best["node"].to_numpy()) & (act[pos] == 1)
                pos_v = pos[valid]
                np_min = best["np_"].to_numpy().astype(np.uint64)[valid]
                nid = best["nid"].to_numpy()[valid]
                mine = _splitmix64(sn[pos_v].astype(np.uint64) ^ _s)
                lose = (np_min < mine) | ((np_min == mine) & (nid < sn[pos_v]))
                join[pos_v[lose]] = 0
            return st.assign(join=join), 1

        state_refs, _ = gc.bucketed_fixpoint(
            edge_refs, state_refs, propose_min, merge_join, max_iters=1
        )

        def propose_knock(edges_df: pd.DataFrame, st: pd.DataFrame):
            if not len(edges_df) or not len(st):
                return None
            sn = st["node"].to_numpy()
            jn = st["join"].to_numpy()
            src = edges_df["a"].to_numpy(dtype=np.int64)
            dst = edges_df["b"].to_numpy(dtype=np.int64)
            pos = np.clip(np.searchsorted(sn, src), 0, len(sn) - 1)
            joined = (sn[pos] == src) & (jn[pos] == 1)
            if not joined.any():
                return None
            return pd.DataFrame({"node": np.unique(dst[joined])})

        def merge_knock(st: pd.DataFrame, props: pd.DataFrame):
            act = st["active"].to_numpy().copy()
            mis = st["mis"].to_numpy().copy()
            join = st["join"].to_numpy()
            mis[join == 1] = 1
            act[join == 1] = 0
            if len(props):
                sn = st["node"].to_numpy()
                pos = np.clip(np.searchsorted(sn, props["node"].to_numpy()),
                              0, len(sn) - 1)
                hit = sn[pos] == props["node"].to_numpy()
                act[pos[hit]] = 0
            st = st.assign(active=act, mis=mis,
                           join=np.zeros(len(st), dtype=np.int64))
            return st, 1, int(act.sum())

        state_refs, _, infos = gc.bucketed_fixpoint(
            edge_refs, state_refs, propose_knock, merge_knock, max_iters=1,
            collect_infos=True,
        )
        remaining = sum(v[1] for v in infos[0])
        rnd += 1

    out = gc.collect_state(state_refs)
    if not len(out):  # empty corpus: match the broadcast twin's frame
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "in_mis": pd.Series([], dtype="int64")})
    out = (
        out[["node", "mis"]].rename(columns={"node": "doc_id",
                                             "mis": "in_mis"})
        .sort_values("doc_id").reset_index(drop=True)
    )
    return out.astype({"doc_id": "int64", "in_mis": "int64"})


def doc_luby_mis(sf_dir: str, work_dir: str | None = None,
                 exchange: str = "bucketed",
                 n_buckets: int = 8) -> "pd.DataFrame":
    """MAXIMAL INDEPENDENT SET via Luby's algorithm (Luby 1986) — the
    classic parallel symmetry-breaking primitive — over the undirected
    doc link graph: each round every still-active node draws a pinned
    splitmix64 priority; local minima (strictly smaller than every
    active neighbor, ties broken by node id) join the MIS and knock out
    their neighborhoods.  Terminates in O(log n) rounds w.h.p.

    Scale shape: the edge set is built once by the shared
    ``_doc_link_edges`` stage and PINNED; each round runs two streaming
    passes over it (min-neighbor-priority partials, then
    neighbor-of-joiner marks) with only node-bounded arrays moving —
    the same rank-table-fits-heap assumption ``host_pagerank``
    documents, with the same bucketed fallback beyond it.  Output: one
    row per doc with its MIS membership flag.

    ``exchange="bucketed"`` (default, VERDICT r4 task #1 family) runs
    the rounds out-of-driver via ``_luby_bucketed``; ``"broadcast"``
    keeps the prior node-array broadcast as the equality twin."""
    import pandas as pd

    import ray

    edges, n_docs, _nb = _doc_link_edges(sf_dir, work_dir)
    if exchange == "bucketed":
        sf_tag = os.path.basename(os.path.normpath(sf_dir))
        work = work_dir or f"/tmp/opps_feedcrawler_ray/webpipe-{sf_tag}"
        return _luby_bucketed(edges, n_docs, os.path.join(work, f"gc_mis-{os.getpid()}"),
                              n_buckets)

    active = np.ones(n_docs, dtype=bool)
    in_mis = np.zeros(n_docs, dtype=bool)
    rnd = 0
    while active.any():
        salt = np.uint64(
            (0xD1B54A32D192ED03 * (rnd + 1)) & 0xFFFFFFFFFFFFFFFF
        )
        prio = _splitmix64(np.arange(n_docs, dtype=np.uint64) ^ salt)
        act_ref = ray.put(active)
        prio_ref = ray.put(prio)

        def min_nbr(batch: pa.Table, _a=act_ref, _p=prio_ref) -> pa.Table:
            import ray as _ray

            act = _ray.get(_a)
            pr = _ray.get(_p)
            a = batch["a"].to_numpy(zero_copy_only=False)
            b = batch["b"].to_numpy(zero_copy_only=False)
            live = act[a] & act[b]
            a, b = a[live], b[live]
            # per-batch node-bounded partial: min active-neighbor
            # (priority, id) key per endpoint
            df = pd.DataFrame({
                "node": np.concatenate([a, b]),
                "np_": np.concatenate([pr[b], pr[a]]).astype("uint64"),
                "nid": np.concatenate([b, a]),
            })
            g = df.sort_values(["np_", "nid"]).groupby(
                "node", as_index=False
            ).first()
            return pa.table({
                "node": g["node"].to_numpy().astype("int64"),
                "np_": g["np_"].to_numpy().astype("uint64"),
                "nid": g["nid"].to_numpy().astype("int64"),
            })

        parts = edges.map_batches(min_nbr, batch_format="pyarrow").to_pandas()
        joins = active.copy()  # no active neighbor => local minimum
        if len(parts):
            best = parts.sort_values(["np_", "nid"]).groupby("node").first()
            nodes = best.index.to_numpy()
            np_min = best["np_"].to_numpy().astype(np.uint64)
            nid = best["nid"].to_numpy()
            mine = prio[nodes]
            # strict (priority, id) comparison against the best neighbor
            lose = (np_min < mine) | ((np_min == mine) & (nid < nodes))
            joins[nodes[lose]] = False
        join_ref = ray.put(joins)

        def nbr_of_join(batch: pa.Table, _j=join_ref) -> pa.Table:
            import ray as _ray

            j = _ray.get(_j)
            a = batch["a"].to_numpy(zero_copy_only=False)
            b = batch["b"].to_numpy(zero_copy_only=False)
            out = np.unique(np.concatenate([b[j[a]], a[j[b]]]))
            return pa.table({"node": out.astype("int64")})

        knocked = edges.map_batches(
            nbr_of_join, batch_format="pyarrow"
        ).to_pandas()
        in_mis[joins] = True
        active &= ~joins
        if len(knocked):
            active[knocked["node"].to_numpy()] = False
        rnd += 1

    return pd.DataFrame({
        "doc_id": np.arange(n_docs, dtype="int64"),
        "in_mis": in_mis.astype("int64"),
    })


def _scc_bucketed(edges_ds, gc_dir: str, n_buckets: int,
                  out_parquet: str | None = None) -> "pd.DataFrame":
    """Out-of-driver coloring SCC (VERDICT r4 task #1): the same
    Orzan-phase semantics as the broadcast twin below, but every
    node-sized table (colors, root markers, SCC assignments) lives as
    per-bucket object-store pins and every propagation step flows
    through the ``graphcore`` bucketed exchange.  Two one-time edge
    partitions (by src for the forward sweeps, by dst for the backward
    sweeps); the driver holds B refs plus per-bucket counters."""
    import pandas as pd

    from . import graphcore as gc

    fwd_refs = gc.partition_by_key(
        edges_ds, "a", n_buckets, os.path.join(gc_dir, "fwd"), ["a", "b"]
    )
    bwd_refs = gc.partition_by_key(
        edges_ds, "b", n_buckets, os.path.join(gc_dir, "bwd"), ["a", "b"]
    )

    node_refs = gc.partition_by_key(
        gc.node_table(edges_ds, cols=("a", "b")), "node", n_buckets,
        os.path.join(gc_dir, "nodes"), ["node"],
        spill_transform=lambda d: d.drop_duplicates(),
    )

    def init_fn(nodes_df: pd.DataFrame):
        # sorted by node once here; every transition preserves order,
        # so the merges below can use searchsorted lookups instead of
        # rebuilding an index per call
        st = nodes_df.sort_values("node").reset_index(drop=True)
        st["scc"] = np.int64(-1)
        return st.astype({"node": "int64", "scc": "int64"}), int(len(st))

    state_refs, counts = gc.map_state(init_fn, node_refs)
    n_active = sum(counts)

    def phase_init(st: pd.DataFrame):
        st = st.copy()
        active = st["scc"].to_numpy() == -1
        st["color"] = np.where(active, st["node"].to_numpy(), -1).astype("int64")
        st["fresh"] = active.astype("int64")
        return st, int(active.sum())

    def propose_fwd(edges_df: pd.DataFrame, st: pd.DataFrame):
        if not len(edges_df) or not len(st):
            return None
        frontier = st[st["fresh"] == 1]
        if not len(frontier):
            return None
        m = edges_df.merge(frontier[["node", "color"]], left_on="a", right_on="node")
        if not len(m):
            return None
        return (
            pd.DataFrame({"node": m["b"].to_numpy(dtype="int64"),
                          "lab": m["color"].to_numpy(dtype="int64")})
            .groupby("node", as_index=False)["lab"]
            .min()
        )

    def merge_fwd(st: pd.DataFrame, props: pd.DataFrame):
        st = st.assign(fresh=0)
        if not len(props) or not len(st):
            return st, 0
        p = props.groupby("node", as_index=False)["lab"].min()
        sn = st["node"].to_numpy()  # sorted since init
        keys = p["node"].to_numpy(dtype="int64")
        lab = p["lab"].to_numpy(dtype="int64")
        pos = np.clip(np.searchsorted(sn, keys), 0, max(len(sn) - 1, 0))
        color = st["color"].to_numpy().copy()
        fresh = st["fresh"].to_numpy().copy()
        valid = sn[pos] == keys
        pv, lv = pos[valid], lab[valid]
        better = (color[pv] != -1) & (lv < color[pv])
        n_changed = int(better.sum())
        if n_changed:
            color[pv[better]] = lv[better]
            fresh[pv[better]] = 1
        st = st.assign(color=color, fresh=fresh)
        return st, n_changed

    def bwd_init(st: pd.DataFrame):
        st = st.copy()
        active = st["scc"].to_numpy() == -1
        root = active & (st["color"].to_numpy() == st["node"].to_numpy())
        st["rlab"] = np.where(root, st["color"].to_numpy(), -1).astype("int64")
        st["fresh"] = root.astype("int64")
        return st, int(root.sum())

    def propose_bwd(edges_df: pd.DataFrame, st: pd.DataFrame):
        if not len(edges_df) or not len(st):
            return None
        frontier = st[(st["fresh"] == 1) & (st["rlab"] != -1)]
        if not len(frontier):
            return None
        m = edges_df.merge(
            frontier[["node", "rlab", "color"]], left_on="b", right_on="node"
        )
        if not len(m):
            return None
        return (
            pd.DataFrame({"node": m["a"].to_numpy(dtype="int64"),
                          "lab": m["rlab"].to_numpy(dtype="int64"),
                          "memb": m["color"].to_numpy(dtype="int64")})
            .groupby(["node", "memb"], as_index=False)["lab"]
            .min()
        )

    def merge_bwd(st: pd.DataFrame, props: pd.DataFrame):
        st = st.assign(fresh=0)
        if not len(props) or not len(st):
            return st, 0
        sn = st["node"].to_numpy()  # sorted since init
        keys = props["node"].to_numpy(dtype="int64")
        pos = np.clip(np.searchsorted(sn, keys), 0, max(len(sn) - 1, 0))
        lab = props["lab"].to_numpy(dtype="int64")
        memb = props["memb"].to_numpy(dtype="int64")
        scc = st["scc"].to_numpy()
        color = st["color"].to_numpy()
        rlab = st["rlab"].to_numpy().copy()
        fresh = st["fresh"].to_numpy().copy()
        valid = sn[pos] == keys
        pv, lv, mv = pos[valid], lab[valid], memb[valid]
        ok = (scc[pv] == -1) & (color[pv] == mv)
        better = ok & ((rlab[pv] == -1) | (lv < rlab[pv]))
        # per-node dedup: a node can receive from several classes; only
        # its own class passes ``ok``, so at most one row per node wins
        n_changed = int(better.sum())
        if n_changed:
            rlab[pv[better]] = lv[better]
            fresh[pv[better]] = 1
        st = st.assign(rlab=rlab, fresh=fresh)
        return st, n_changed

    def settle(st: pd.DataFrame):
        st = st.copy()
        active = st["scc"].to_numpy() == -1
        hit = (
            active
            & (st["rlab"].to_numpy() != -1)
            & (st["rlab"].to_numpy() == st["color"].to_numpy())
        )
        scc = st["scc"].to_numpy().copy()
        scc[hit] = st["color"].to_numpy()[hit]
        st = st.assign(scc=scc).drop(columns=["color", "rlab", "fresh"])
        return st, (int(hit.sum()), int((scc == -1).sum()))

    def settle_roots(st: pd.DataFrame):
        # defensive twin of the broadcast safety branch (unreachable in
        # theory: the min active node is always a settled root)
        st = st.copy()
        active = st["scc"].to_numpy() == -1
        root = active & (st["color"].to_numpy() == st["node"].to_numpy())
        scc = st["scc"].to_numpy().copy()
        scc[root] = st["node"].to_numpy()[root]
        st = st.assign(scc=scc).drop(columns=["color", "rlab", "fresh"])
        return st, (int(root.sum()), int((scc == -1).sum()))

    guard = 0
    while n_active > 0:
        guard += 1
        if guard > 10_000:  # matches broadcast termination guarantee
            raise RuntimeError("SCC phase loop failed to converge")
        state_refs, _ = gc.map_state(phase_init, state_refs)
        state_refs, _ = gc.bucketed_fixpoint(
            fwd_refs, state_refs, propose_fwd, merge_fwd, max_iters=10_000
        )
        state_refs, _ = gc.map_state(bwd_init, state_refs)
        state_refs, _ = gc.bucketed_fixpoint(
            bwd_refs, state_refs, propose_bwd, merge_bwd, max_iters=10_000
        )
        pending = state_refs
        state_refs, infos = gc.map_state(settle, pending)
        n_done = sum(i[0] for i in infos)
        if n_done == 0:
            state_refs, infos = gc.map_state(settle_roots, pending)
        n_active = sum(i[1] for i in infos)

    if out_parquet is not None:
        # node-sized result: per-bucket Parquet written inside tasks;
        # the driver sees row counts only (the 100-TB output shape)
        counts = gc.write_state_parquet(state_refs, out_parquet)
        return pd.DataFrame(
            {"bucket": np.arange(len(counts), dtype=np.int64),
             "rows": np.asarray(counts, dtype=np.int64)}
        )
    out = gc.collect_state(state_refs)
    if not len(out):
        return pd.DataFrame(
            {"doc_id": pd.Series([], dtype="int64"),
             "scc_id": pd.Series([], dtype="int64")}
        )
    out = (
        out[["node", "scc"]]
        .rename(columns={"node": "doc_id", "scc": "scc_id"})
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    return out.astype({"doc_id": "int64", "scc_id": "int64"})


def doc_scc(
    sf_dir: str, work_dir: str | None = None,
    exchange: str = "bucketed", n_buckets: int = 8,
) -> "pd.DataFrame":
    """STRONGLY-connected components over the DIRECTED doc link graph —
    the directed complement of the undirected connected-components op
    (mutual reachability, not mere contact): the coloring algorithm
    (Orzan 2004; the phase structure FW-BW trimming shares — Fleischer
    et al. 2000), which is the standard label-propagation SCC for
    vertex-centric/distributed engines where Tarjan's DFS stack cannot
    be parallelized.

    Per phase over the ACTIVE subgraph: (1) forward min-label
    propagation to fixpoint — each label class then contains exactly
    one root (the node equal to its label); (2) one backward
    propagation of the root marker CONSTRAINED to its label class —
    nodes reached both ways are exactly the root's SCC; assign and
    deactivate them.  Each iteration is the repo's pinned-edges pattern:
    the ≤|V| label table broadcasts via ``ray.put`` into ONE
    ``map_batches`` over the edge dataset with per-batch min/any
    combiners (node-bounded output), the driver folds proposals and
    early-exits on fixpoint — edges never move.  Driver memory: O(|V|)
    labels, the same fits-a-heap assumption PageRank/BFS document (past
    it, fold labels through a bucketed co-shuffle keyed on node).
    Rows-only; the twin replays Tarjan over the same edge list.
    Returns (doc_id, scc_id = min member id) sorted by doc_id.

    ``exchange="bucketed"`` (default, VERDICT r4 task #1) runs the same
    phase semantics through the ``graphcore`` out-of-driver exchange —
    colors / root markers / assignments live as per-bucket object-store
    pins, propagation flows dst-bucket-partitioned task→task, and the
    driver holds only refs + counters; ``"broadcast"`` keeps the prior
    fits-a-heap dict path as the equality twin."""
    import pandas as pd

    import ray

    edges_ds = _doc_directed_edges(sf_dir, work_dir)
    if exchange == "bucketed":
        sf_tag = os.path.basename(os.path.normpath(sf_dir))
        work = work_dir or f"/tmp/opps_feedcrawler_ray/webpipe-{sf_tag}"
        return _scc_bucketed(edges_ds, os.path.join(work, f"gc_scc-{os.getpid()}"), n_buckets)
    ed = edges_ds.to_pandas()  # edge list is pinned once per phase below;
    # the pandas copy here only bootstraps the node set (|E| bounded at
    # test scale — at 100 TB derive nodes from a map_batches distinct)
    nodes = np.union1d(ed["a"].unique(), ed["b"].unique()).astype(np.int64)
    edges = rd.from_arrow(pa.table({"a": pa.array(ed["a"], pa.int64()),
                                    "b": pa.array(ed["b"], pa.int64())})).materialize()

    scc: dict[int, int] = {}
    active = set(map(int, nodes))
    prop_schema = pa.schema([("v", pa.int64()), ("lab", pa.int64())])

    def _propagate(direction: str, label: dict, member=None) -> dict:
        """Min-label fixpoint along ``direction`` ('fwd': a→b, 'bwd':
        b→a) over edges whose BOTH endpoints are active; when ``member``
        is given, propagation additionally stays inside one forward-label
        class (the backward sweep of the coloring algorithm)."""
        label = dict(label)
        while True:
            ref = ray.put((label, member))

            def step(batch: pa.Table) -> pa.Table:
                lab, memb = ray.get(ref)
                df = batch.to_pandas()
                src, dst = ("a", "b") if direction == "fwd" else ("b", "a")
                ls = df[src].map(lab)
                m = ls.notna()
                if memb is not None:
                    ms = df[src].map(memb)
                    md = df[dst].map(memb)
                    m &= ms.notna() & md.notna() & (ms == md)
                if not m.any():
                    return pa.Table.from_pandas(
                        pd.DataFrame({"v": [], "lab": []}),
                        preserve_index=False, schema=prop_schema)
                g = (
                    pd.DataFrame({"v": df.loc[m, dst].to_numpy(dtype="int64"),
                                  "lab": ls[m].to_numpy(dtype="float64")
                                  .astype("int64")})
                    .groupby("v", as_index=False)["lab"].min()
                )
                return pa.Table.from_pandas(g, preserve_index=False,
                                            schema=prop_schema)

            prop = (
                edges.map_batches(step, batch_format="pyarrow")
                .to_pandas()
                .groupby("v", as_index=False)["lab"].min()
            )
            changed = False
            for v, lb in zip(prop["v"].to_numpy(), prop["lab"].to_numpy()):
                v, lb = int(v), int(lb)
                if v in label and lb < label[v]:
                    label[v] = lb
                    changed = True
                elif v not in label and (member is None or v in member):
                    # backward sweep may REACH nodes not yet marked
                    if member is not None:
                        label[v] = lb
                        changed = True
            if not changed:
                return label

    while active:
        # phase 1: forward min-label over the active subgraph
        color = _propagate("fwd", {v: v for v in active})
        # phase 2: backward root-marker sweep inside each color class
        roots = {v: c for v, c in color.items() if v == c}
        reached = _propagate("bwd", roots, member=color)
        for v, c in reached.items():
            if color.get(v) == c:
                scc[v] = c
        done = set(scc) & active
        if not done:  # safety: every phase settles at least the roots
            for v in roots:
                scc[v] = v
            done = set(roots)
        active -= done
        # restrict next phase's edges implicitly: _propagate only reads
        # labels of still-active nodes (inactive sources map to NaN)

    out = pd.DataFrame(sorted(scc.items()), columns=["doc_id", "scc_id"])
    return out.astype({"doc_id": "int64", "scc_id": "int64"})


def _dust_rule(u1: str, u2: str) -> tuple[str, str]:
    """The substitution rule one content-identical URL pair implies:
    strip the longest common prefix, then the longest common suffix of
    the remainders; the leftover middles form alpha→beta directed
    toward the SHORTER url (tie: lexicographically smaller) — the
    normalization direction.  ('/d/12/index.html', '/d/12') →
    ('/index.html', '')."""
    short, long_ = sorted((u1, u2), key=lambda u: (len(u), u))
    p = 0
    lim = min(len(short), len(long_))
    while p < lim and short[p] == long_[p]:
        p += 1
    s = 0
    lim = min(len(short), len(long_)) - p  # suffix must not overlap prefix
    while s < lim and short[len(short) - 1 - s] == long_[len(long_) - 1 - s]:
        s += 1
    return long_[p:len(long_) - s], short[p:len(short) - s]


def dust_rules(sf_dir: str, min_support: int = 3) -> "pd.DataFrame":
    """DUST — Different URLs with Similar Text (Bar-Yossef, Keidar &
    Schonfeld, "Do Not Crawl in the DUST", WWW 2007): mine URL
    substring-substitution rules alpha→beta from pairs of DISTINCT
    canonical URLs serving identical content, so a crawler can
    normalize away alias families (/index.html suffixes, print views,
    path synonyms) without fetching them.  This is the
    content-identical variant of DustBuster: candidate pairs come from
    exact content-fingerprint groups (the paper mines likely pairs from
    URL lists alone and validates by fetching; with the corpus in hand
    the fingerprint group IS the validation), pairs within a group are
    ADJACENT in sorted URL order (the paper's O(group)-pairs shortcut),
    and each pair contributes the rule from ``_dust_rule``.

    The documents corpus is alias-free, so the operator derives the
    classic alias families deterministically (docs with doc_id % 4 == 0
    get ONE alias each, family = doc_id % 3): '/index.html' suffix,
    '?format=print' query, '/d/'→'/doc/' path synonym — and must
    recover exactly those rules at full support.  Rows-only; a pandas
    brute-force twin is pinned in tests.

    Scale shape: ONE fingerprint exchange (the exact-dedup shuffle;
    fp reinterpreted int64), per-group work O(|group| log |group|)
    emitting |group|−1 pair rows, then a tiny (alpha, beta) groupby —
    rules and supports only ever reach the driver."""
    import pandas as pd

    from ..functions.hashing import fingerprint64
    from ..functions.urlnorm import extract_host

    def expand(batch: pa.Table) -> pa.Table:
        urls: list[str] = []
        fps: list[int] = []
        for did, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            fp = fingerprint64(text or "")
            u = _url(did)
            urls.append(u)
            fps.append(fp)
            if did % 4 == 0:
                fam = did % 3
                if fam == 0:
                    a = u + "/index.html"
                elif fam == 1:
                    a = u + "?format=print"
                else:
                    a = u.replace("/d/", "/doc/")
                if a != u:  # /priv/ urls have no fam-2 alias
                    urls.append(a)
                    fps.append(fp)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                # int64-reinterpret for the exchange (engine convention)
                "fp": pa.array(
                    np.array(fps, dtype=np.uint64).view(np.int64)
                ),
            }
        )

    def pair_rules(g: pd.DataFrame) -> pd.DataFrame:
        us = sorted(set(g["url"]))
        if len(us) < 2:
            return pd.DataFrame({"alpha": [], "beta": [], "host": []}).astype(
                {"alpha": "object", "beta": "object", "host": "object"}
            )
        rows = []
        for u1, u2 in zip(us, us[1:]):
            a, b = _dust_rule(u1, u2)
            rows.append((a, b, extract_host(u1)))
        return pd.DataFrame(rows, columns=["alpha", "beta", "host"])

    def rule_stats(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "alpha": [g["alpha"].iloc[0]],
                "beta": [g["beta"].iloc[0]],
                "support": [len(g)],
                "n_hosts": [int(g["host"].nunique())],
            }
        )

    out = (
        rd.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text"],
        )
        .map_batches(expand, batch_format="pyarrow")
        .groupby("fp")
        .map_groups(pair_rules, batch_format="pandas")
        .groupby(["alpha", "beta"])
        .map_groups(rule_stats, batch_format="pandas")
        .to_pandas()
    )
    if len(out) == 0:
        return pd.DataFrame(
            {"alpha": pd.Series(dtype=object), "beta": pd.Series(dtype=object),
             "support": pd.Series(dtype="int64"),
             "n_hosts": pd.Series(dtype="int64")}
        )
    out = out[out["support"] >= min_support]
    out = out.astype({"support": "int64", "n_hosts": "int64"})
    return (
        out.sort_values(["support", "alpha", "beta"],
                        ascending=[False, True, True])
        .reset_index(drop=True)
    )


def doc_ktruss(sf_dir: str, k: int = 3, work_dir: str | None = None,
               peel: str = "worklist") -> "pd.DataFrame":
    """K-TRUSS decomposition (fixed k) of the undirected doc link graph
    — the cohesive-subgraph classic (Cohen 2008, "Trusses: cohesive
    subgraphs for social network analysis"): the maximal subgraph in
    which EVERY edge participates in ≥ k−2 triangles, computed by
    support peeling — count per-edge triangle support, delete every
    edge below k−2, recount on the survivor subgraph, repeat to
    fixpoint (deleting an edge can only lower its neighbors' support,
    so peeling converges and the fixpoint is unique — order-free).

    The DATA-SIZED work — triangle enumeration — runs distributed
    exactly once, as the same degree-orientation dataflow as
    ``doc_triangle_counts`` (each triangle surfaces exactly once, at
    its lowest-(degree, id) apex); matched wedges emit (apex, lo, hi)
    TRIANGLE rows instead of per-vertex counts.  The peeling fixpoint
    then runs on the driver over the triangle list with a worklist
    (delete edge → kill its triangles → decrement the other two edges'
    support → enqueue any that drop below k−2): O(|T|) total work,
    versus one full distributed recount per peel round.

    PARTITIONING ASSUMPTION (``peel="worklist"``, default): the
    triangle list fits the driver heap (|T| ≤ wedge volume, bounded by
    the degree orientation at O(m·√m)).  Past that,
    ``peel="distributed"`` (round 5 — the documented fallback, now
    code) re-runs the distributed enumeration per peel round over the
    SURVIVING edge Dataset: each round recomputes subgraph degrees,
    re-orients, closes wedges, folds per-edge support through the
    (u,v)-bucket exchange, and filters sub-threshold edges inside the
    same exchange — the driver holds only alive-edge COUNTS between
    rounds and collects the (output-sized) fixpoint truss at the end.
    The fixpoint is unique (peeling is order-free), so both peels
    return identical rows — pinned by a test.  Rows-only; a sequential
    set-based peeling twin is pinned in tests."""
    import pandas as pd
    import ray

    from .dedup import _cell_pair_indices

    if k < 3:
        raise ValueError("k-truss needs k >= 3")
    edges, n_docs, nb = _doc_link_edges(sf_dir, work_dir)
    deg_df = _doc_degrees(edges, nb)
    dn = deg_df["node"].to_numpy(dtype=np.int64)
    order = np.argsort(dn)
    deg_ref = ray.put((dn[order], deg_df["c"].to_numpy(dtype=np.int64)[order]))

    def orient(batch: pa.Table) -> pa.Table:
        nodes, degs = ray.get(deg_ref)
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        da = degs[np.searchsorted(nodes, a)]
        db = degs[np.searchsorted(nodes, b)]
        a_first = (da < db) | ((da == db) & (a < b))
        u = np.where(a_first, a, b)
        v = np.where(a_first, b, a)
        dv = np.where(a_first, db, da)
        return pa.table(
            {"u": pa.array(u, pa.int64()), "v": pa.array(v, pa.int64()),
             "dv": pa.array(dv, pa.int64()),
             "__b": pa.array((u % nb).astype("int64"), pa.int64())}
        )

    def wedge_rows(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["u", "v"])
        codes = g.groupby("u", sort=False).ngroup().to_numpy()
        i, j = _cell_pair_indices(codes)
        empty = pd.DataFrame(
            {"u": pd.Series(dtype="int64"), "v": pd.Series(dtype="int64"),
             "apex": pd.Series(dtype="int64"), "kind": pd.Series(dtype="int64"),
             "__b": pd.Series(dtype="int64")}
        )
        if len(i) == 0:
            return empty
        uu = g["u"].to_numpy()
        vv = g["v"].to_numpy()
        dvv = g["dv"].to_numpy()
        swap = dvv[i] > dvv[j]
        lo = np.where(swap, vv[j], vv[i])
        hi = np.where(swap, vv[i], vv[j])
        w = pd.DataFrame(
            {"u": lo, "v": hi, "apex": uu[i],
             "kind": np.ones(len(i), dtype=np.int64)}
        )
        w["__b"] = ((w["u"] * np.int64(n_docs) + w["v"]) % nb).astype("int64")
        return w

    def tag_edges(batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        u = batch["u"].to_numpy(dtype=np.int64)
        v = batch["v"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {"u": u, "v": v,
             "apex": np.full(n, -1, dtype=np.int64),
             "kind": np.zeros(n, dtype=np.int64),
             "__b": ((u * np.int64(n_docs) + v) % nb).astype("int64")}
        )

    def triangles(g: pd.DataFrame) -> pd.DataFrame:
        """Close wedges in this (u,v)-bucket: matched wedges ARE the
        triangles (apex; lo, hi), each enumerated exactly once."""
        key = (g["u"].to_numpy(dtype=np.int64) * np.int64(n_docs)
               + g["v"].to_numpy(dtype=np.int64))
        is_edge = g["kind"].to_numpy() == 0
        hit = np.isin(key[~is_edge], key[is_edge])
        w = g[~is_edge]
        return pd.DataFrame(
            {"apex": w["apex"].to_numpy(dtype=np.int64)[hit],
             "lo": w["u"].to_numpy(dtype=np.int64)[hit],
             "hi": w["v"].to_numpy(dtype=np.int64)[hit]}
        )

    if peel == "distributed":
        thresh = k - 2
        nd_ = np.int64(n_docs)
        empty_out = pd.DataFrame(
            {c: pd.Series(dtype="int64")
             for c in ["src_doc", "dst_doc", "support"]}
        )

        def make_orient(dref):
            def orient_r(batch: pa.Table) -> pa.Table:
                nodes, degs = ray.get(dref)
                a = batch["a"].to_numpy(zero_copy_only=False)
                b = batch["b"].to_numpy(zero_copy_only=False)
                da = degs[np.searchsorted(nodes, a)]
                db = degs[np.searchsorted(nodes, b)]
                a_first = (da < db) | ((da == db) & (a < b))
                u = np.where(a_first, a, b)
                v = np.where(a_first, b, a)
                dv = np.where(a_first, db, da)
                return pa.table(
                    {"u": pa.array(u, pa.int64()), "v": pa.array(v, pa.int64()),
                     "dv": pa.array(dv, pa.int64()),
                     "__b": pa.array((u % nb).astype("int64"), pa.int64())}
                )
            return orient_r

        def tri_support_rows(batch: pd.DataFrame) -> pd.DataFrame:
            # each triangle adds +1 support to its three edges
            ap = batch["apex"].to_numpy(dtype=np.int64)
            lo = batch["lo"].to_numpy(dtype=np.int64)
            hi = batch["hi"].to_numpy(dtype=np.int64)
            us, vs = [], []
            for x, y in ((ap, lo), (ap, hi), (lo, hi)):
                us.append(np.minimum(x, y))
                vs.append(np.maximum(x, y))
            u = np.concatenate(us)
            v = np.concatenate(vs)
            g = (
                pd.DataFrame({"u": u, "v": v})
                .groupby(["u", "v"], as_index=False)
                .size()
                .rename(columns={"size": "cnt"})
            )
            g["kind"] = np.int64(1)
            g["__b"] = ((g["u"] * nd_ + g["v"]) % nb).astype("int64")
            return g[["u", "v", "cnt", "kind", "__b"]]

        def edge_marker(batch: pd.DataFrame) -> pd.DataFrame:
            u = batch["a"].to_numpy(dtype=np.int64)
            v = batch["b"].to_numpy(dtype=np.int64)
            return pd.DataFrame(
                {"u": u, "v": v,
                 "cnt": np.zeros(len(u), dtype=np.int64),
                 "kind": np.zeros(len(u), dtype=np.int64),
                 "__b": ((u * nd_ + v) % nb).astype("int64")}
            )

        def keep_supported(g: pd.DataFrame) -> pd.DataFrame:
            # edges in this bucket whose summed triangle support clears
            # the threshold survive, carrying their support
            sup = (
                g.groupby(["u", "v"], as_index=False)
                .agg(cnt=("cnt", "sum"), has_edge=("kind", lambda s: (s == 0).any()))
            )
            sup = sup[sup["has_edge"] & (sup["cnt"] >= thresh)]
            return pd.DataFrame(
                {"a": sup["u"].to_numpy(dtype=np.int64),
                 "b": sup["v"].to_numpy(dtype=np.int64),
                 "support": sup["cnt"].to_numpy(dtype=np.int64)}
            )

        alive = edges.materialize()
        n_alive = alive.count()
        while True:
            if n_alive == 0:
                return empty_out
            deg_r = _doc_degrees(alive, nb)
            dn_r = deg_r["node"].to_numpy(dtype=np.int64)
            order_r = np.argsort(dn_r)
            dref = ray.put(
                (dn_r[order_r], deg_r["c"].to_numpy(dtype=np.int64)[order_r])
            )
            oriented_r = alive.map_batches(
                make_orient(dref), batch_format="pyarrow"
            ).materialize()
            survivors = (
                oriented_r.groupby("__b")
                .map_groups(wedge_rows, batch_format="pandas")
                .union(oriented_r.map_batches(tag_edges, batch_format="pandas"))
                .groupby("__b")
                .map_groups(triangles, batch_format="pandas")
                .map_batches(tri_support_rows, batch_format="pandas")
                .union(alive.map_batches(edge_marker, batch_format="pandas"))
                .groupby("__b")
                .map_groups(keep_supported, batch_format="pandas")
                .materialize()
            )
            n_new = survivors.count()
            if n_new == n_alive:  # fixpoint: collect the (output-sized) truss
                out = survivors.to_pandas()
                if not len(out):
                    return empty_out
                return (
                    out.rename(columns={"a": "src_doc", "b": "dst_doc"})
                    .astype({"src_doc": "int64", "dst_doc": "int64",
                             "support": "int64"})
                    .sort_values(["src_doc", "dst_doc"])
                    .reset_index(drop=True)
                )
            alive = survivors.select_columns(["a", "b"]).materialize()
            n_alive = n_new

    oriented = edges.map_batches(orient, batch_format="pyarrow").materialize()
    tri = (
        oriented.groupby("__b")
        .map_groups(wedge_rows, batch_format="pandas")
        .union(oriented.map_batches(tag_edges, batch_format="pandas"))
        .groupby("__b")
        .map_groups(triangles, batch_format="pandas")
        .to_pandas()  # fits-heap assumption documented above
    )

    edf = edges.to_pandas()[["a", "b"]]
    nd = np.int64(n_docs)
    ekey = (edf["a"].to_numpy(dtype=np.int64) * nd
            + edf["b"].to_numpy(dtype=np.int64))
    eorder = np.argsort(ekey)
    ekey_sorted = ekey[eorder]
    n_edges = len(ekey_sorted)
    support = np.zeros(n_edges, dtype=np.int64)
    # triangle → its 3 edge indices (positions in ekey_sorted)
    tri_edges = np.empty((len(tri), 3), dtype=np.int64)
    if len(tri):
        ap = tri["apex"].to_numpy(dtype=np.int64)
        lo = tri["lo"].to_numpy(dtype=np.int64)
        hi = tri["hi"].to_numpy(dtype=np.int64)
        for c, (x, y) in enumerate(((ap, lo), (ap, hi), (lo, hi))):
            kk = np.minimum(x, y) * nd + np.maximum(x, y)
            tri_edges[:, c] = np.searchsorted(ekey_sorted, kk)
        np.add.at(support, tri_edges.ravel(), 1)
    # per-edge triangle membership lists (CSR over edge index)
    flat = tri_edges.ravel()
    tids = np.repeat(np.arange(len(tri), dtype=np.int64), 3)
    so = np.argsort(flat, kind="stable")
    starts = np.searchsorted(flat[so], np.arange(n_edges))
    ends = np.searchsorted(flat[so], np.arange(n_edges) + 1)
    tid_sorted = tids[so]

    thresh = k - 2
    alive_e = np.ones(n_edges, dtype=bool)
    alive_t = np.ones(len(tri), dtype=bool)
    work = list(np.flatnonzero(support < thresh))
    for ei in work:
        if not alive_e[ei]:
            continue
        alive_e[ei] = False
        for p in range(starts[ei], ends[ei]):
            t = tid_sorted[p]
            if not alive_t[t]:
                continue
            alive_t[t] = False
            for other in tri_edges[t]:
                if other != ei and alive_e[other]:
                    support[other] -= 1
                    if support[other] < thresh:
                        work.append(other)

    keep = alive_e & (support >= thresh)
    out = pd.DataFrame(
        {"src_doc": edf["a"].to_numpy(dtype=np.int64)[eorder][keep],
         "dst_doc": edf["b"].to_numpy(dtype=np.int64)[eorder][keep],
         "support": support[keep]}
    ).astype({"src_doc": "int64", "dst_doc": "int64", "support": "int64"})
    return out.sort_values(["src_doc", "dst_doc"]).reset_index(drop=True)


def _matching_bucketed(edges_ds, gc_dir: str, n_buckets: int) -> "pd.DataFrame":
    """Out-of-driver maximal matching (VERDICT r4 task #1 family): the
    fingerprinted edge set expands to directed copies ONCE (both copies
    carry the canonical a<b fingerprint) and co-partitions with node
    state (matched / partner / round / current min-fp).  Each round is
    two one-shot exchanges: (1) live-edge min-fp proposals (src-side
    liveness filtered in propose, dst-side in merge — a dead endpoint
    on either side silences the edge) rebuild the per-node minima and
    report per-bucket live counts (the driver's stop scalar); (2) each
    edge copy that wins its src half (fp == src min) claims its dst,
    which accepts iff it wins the dst half too — both endpoints retire
    symmetrically via the two copies.  Winners record (partner, round)
    in bucket state; the final collect emits each matched edge once in
    canonical orientation.  Identical output to the broadcast twin."""
    import pandas as pd

    from ..functions.hashing import fingerprint64_batch
    from . import graphcore as gc

    def with_fp_expand(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        fp = fingerprint64_batch(
            [f"{x}:{y}" for x, y in zip(a, b)]
        ).view(np.int64)
        return pa.table({
            "a": pa.array(np.concatenate([a, b]), pa.int64()),
            "b": pa.array(np.concatenate([b, a]), pa.int64()),
            "fp": pa.array(np.concatenate([fp, fp]), pa.int64()),
        })

    directed = edges_ds.map_batches(with_fp_expand, batch_format="pyarrow")
    edge_refs = gc.partition_by_key(
        directed, "a", n_buckets, os.path.join(gc_dir, "edges"),
        ["a", "b", "fp"],
    )
    node_refs = gc.partition_by_key(
        gc.node_table(directed), "node", n_buckets,
        os.path.join(gc_dir, "nodes"), ["node"],
        spill_transform=lambda d: d.drop_duplicates(),
    )

    def init_fn(nodes_df: pd.DataFrame):
        nd = np.sort(nodes_df["node"].to_numpy(dtype=np.int64))
        st = pd.DataFrame({"node": nd,
                           "matched": np.zeros(len(nd), dtype=np.int64),
                           "partner": np.full(len(nd), -1, dtype=np.int64),
                           "rnd": np.full(len(nd), -1, dtype=np.int64),
                           "mfp": np.zeros(len(nd), dtype=np.int64)})
        return st, 0

    state_refs, _ = gc.map_state(init_fn, node_refs)

    def _pos(sn: np.ndarray, keys: np.ndarray):
        pos = np.clip(np.searchsorted(sn, keys), 0, max(len(sn) - 1, 0))
        return pos, (sn[pos] == keys) if len(sn) else np.zeros(len(keys), bool)

    def prop_min(edges_df: pd.DataFrame, st: pd.DataFrame):
        if not len(edges_df) or not len(st):
            return None
        sn = st["node"].to_numpy()
        matched = st["matched"].to_numpy()
        src = edges_df["a"].to_numpy(dtype=np.int64)
        pos, hit = _pos(sn, src)
        live = hit & (matched[pos] == 0)
        if not live.any():
            return None
        dst = edges_df["b"].to_numpy(dtype=np.int64)[live]
        fpu = edges_df["fp"].to_numpy()[live].view(np.uint64)
        df = pd.DataFrame({"node": dst, "mu": fpu})
        g = df.groupby("node", as_index=False)["mu"].min()
        return g

    def merge_min(st: pd.DataFrame, props: pd.DataFrame):
        mfp = np.zeros(len(st), dtype=np.int64)
        n_live = 0
        if len(props) and len(st):
            p = props.groupby("node", as_index=False)["mu"].min()
            sn = st["node"].to_numpy()
            matched = st["matched"].to_numpy()
            pos, hit = _pos(sn, p["node"].to_numpy(dtype=np.int64))
            ok = hit & (matched[pos] == 0)
            mfp[pos[ok]] = p["mu"].to_numpy().astype(np.uint64)[ok].view(np.int64)
            n_live = int(ok.sum())
        return st.assign(mfp=mfp), 1, n_live

    def prop_win(edges_df: pd.DataFrame, st: pd.DataFrame):
        if not len(edges_df) or not len(st):
            return None
        sn = st["node"].to_numpy()
        matched = st["matched"].to_numpy()
        mfp = st["mfp"].to_numpy()
        src = edges_df["a"].to_numpy(dtype=np.int64)
        fpu = edges_df["fp"].to_numpy().view(np.uint64)
        pos, hit = _pos(sn, src)
        win_src = hit & (matched[pos] == 0) & (
            mfp[pos].view(np.uint64) == fpu
        ) & (mfp[pos] != 0)
        if not win_src.any():
            return None
        return pd.DataFrame({
            "node": edges_df["b"].to_numpy(dtype=np.int64)[win_src],
            "fp": edges_df["fp"].to_numpy()[win_src],
            "other": src[win_src],
        })

    def make_merge_win(rnd: int):
        def merge_win(st: pd.DataFrame, props: pd.DataFrame):
            if not len(props) or not len(st):
                return st, 1
            sn = st["node"].to_numpy()
            matched = st["matched"].to_numpy().copy()
            partner = st["partner"].to_numpy().copy()
            rcol = st["rnd"].to_numpy().copy()
            mfp = st["mfp"].to_numpy()
            pn = props["node"].to_numpy(dtype=np.int64)
            fpu = props["fp"].to_numpy().view(np.uint64)
            pos, hit = _pos(sn, pn)
            win = hit & (matched[pos] == 0) & (
                mfp[pos].view(np.uint64) == fpu
            ) & (mfp[pos] != 0)
            if win.any():
                matched[pos[win]] = 1
                partner[pos[win]] = props["other"].to_numpy(dtype=np.int64)[win]
                rcol[pos[win]] = rnd
            return st.assign(matched=matched, partner=partner, rnd=rcol), 1
        return merge_win

    rnd = 0
    while True:
        state_refs, _, infos = gc.bucketed_fixpoint(
            edge_refs, state_refs, prop_min, merge_min, max_iters=1,
            collect_infos=True,
        )
        if sum(v[1] for v in infos[0]) == 0:  # no live edge anywhere
            break
        state_refs, _ = gc.bucketed_fixpoint(
            edge_refs, state_refs, prop_win, make_merge_win(rnd), max_iters=1
        )
        rnd += 1

    st = gc.collect_state(state_refs)
    if not len(st):
        return pd.DataFrame({c: pd.Series(dtype="int64")
                             for c in ["src_doc", "dst_doc", "edge_rank"]})
    mt = st[st["matched"] == 1]
    out = pd.DataFrame({
        "src_doc": np.minimum(mt["node"].to_numpy(dtype=np.int64),
                              mt["partner"].to_numpy(dtype=np.int64)),
        "dst_doc": np.maximum(mt["node"].to_numpy(dtype=np.int64),
                              mt["partner"].to_numpy(dtype=np.int64)),
        "edge_rank": mt["rnd"].to_numpy(dtype=np.int64),
    }).drop_duplicates()
    if not len(out):
        return pd.DataFrame({c: pd.Series(dtype="int64")
                             for c in ["src_doc", "dst_doc", "edge_rank"]})
    return (
        out.astype("int64").sort_values(["src_doc", "dst_doc"])
        .reset_index(drop=True)
    )


def doc_maximal_matching(sf_dir: str, work_dir: str | None = None,
                         exchange: str = "bucketed",
                         n_buckets: int = 8) -> "pd.DataFrame":
    """MAXIMAL MATCHING over the undirected doc link graph — the EDGE
    twin of Luby's MIS (``doc_luby_mis``) and the standard coarsening
    primitive of multilevel graph partitioners (Karypis & Kumar's
    METIS family): a set of vertex-disjoint edges no live edge can
    extend.  Symmetry breaking is the locally-minimal-edge rule
    (Israeli & Itai 1986): per round, an edge joins the matching iff
    its pinned 64-bit fingerprint is the MINIMUM among all live edges
    at BOTH endpoints; both endpoints then retire.  That fixpoint
    equals the sequential greedy matching that scans edges in global
    fingerprint order — the twin test replays exactly that.

    Scale shape per round: one ``map_batches`` over the pinned edge
    dataset emits per-batch (node → min edge-fp) partials → one
    node-bounded groupby-min (the fits-a-heap label-table assumption
    host_pagerank documents); winners are detected edge-locally against
    the broadcast min table and only WINNING edges reach the driver
    (cumulatively ≤ |V|/2).  O(log |E|) rounds expected.

    Returns matched (src_doc, dst_doc, edge_rank) rows, edge_rank =
    the round the edge entered the matching, sorted by (src_doc,
    dst_doc).

    ``exchange="bucketed"`` (default, VERDICT r4 task #1 family) runs
    the rounds out-of-driver via ``_matching_bucketed``; ``"broadcast"``
    keeps the prior matched-node-array broadcast as the equality twin."""
    import pandas as pd
    import ray

    from ..functions.hashing import fingerprint64_batch

    edges, n_docs, nb = _doc_link_edges(sf_dir, work_dir)
    if exchange == "bucketed":
        sf_tag = os.path.basename(os.path.normpath(sf_dir))
        work = work_dir or f"/tmp/opps_feedcrawler_ray/webpipe-{sf_tag}"
        return _matching_bucketed(edges, os.path.join(work, f"gc_match-{os.getpid()}"),
                                  n_buckets)

    def with_fp(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        fp = fingerprint64_batch([f"{x}:{y}" for x, y in zip(a, b)])
        return pa.table({
            "a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64()),
            "fp": pa.array(fp.view(np.int64)),
        })

    cur = edges.map_batches(with_fp, batch_format="pyarrow").materialize()
    matched_nodes = np.array([], dtype=np.int64)
    out_rows: list[tuple[int, int, int]] = []
    rnd = 0
    min_schema = pa.schema([("node", pa.int64()), ("m", pa.int64())])

    while cur.count() > 0:
        mref = ray.put(np.sort(matched_nodes))

        def live_only(batch: pa.Table, _m=mref) -> pa.Table:
            dead = ray.get(_m)
            a = batch["a"].to_numpy(zero_copy_only=False)
            b = batch["b"].to_numpy(zero_copy_only=False)
            keep = ~(np.isin(a, dead) | np.isin(b, dead))
            return batch.filter(pa.array(keep))

        live = cur.map_batches(live_only, batch_format="pyarrow").materialize()
        if live.count() == 0:
            break

        def node_min_partial(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            # compare fingerprints as UNSIGNED — reinterpret to uint64,
            # min, back; pandas min on the int64 view would misorder
            fpu = df["fp"].to_numpy().view(np.uint64)
            long = pd.DataFrame({
                "node": np.concatenate([df["a"].to_numpy(), df["b"].to_numpy()]),
                "m": np.concatenate([fpu, fpu]).view(np.int64),
            })
            long["mu"] = long["m"].to_numpy().view(np.uint64)
            g = long.loc[long.groupby("node")["mu"].idxmin(), ["node", "m"]]
            return pa.Table.from_pandas(g, preserve_index=False, schema=min_schema)

        parts = (
            live.map_batches(node_min_partial, batch_format="pyarrow")
            .to_pandas()
        )
        parts["mu"] = parts["m"].to_numpy().view(np.uint64)
        node_min = parts.loc[parts.groupby("node")["mu"].idxmin()]
        nodes_sorted = node_min["node"].to_numpy(dtype=np.int64)
        order = np.argsort(nodes_sorted)
        nm_ref = ray.put((nodes_sorted[order],
                          node_min["mu"].to_numpy()[order]))

        def winners(batch: pa.Table, _r=nm_ref) -> pa.Table:
            nodes, mins = ray.get(_r)
            a = batch["a"].to_numpy(zero_copy_only=False)
            b = batch["b"].to_numpy(zero_copy_only=False)
            fpu = batch["fp"].to_numpy(zero_copy_only=False).view(np.uint64)
            win = (mins[np.searchsorted(nodes, a)] == fpu) & (
                mins[np.searchsorted(nodes, b)] == fpu
            )
            return batch.filter(pa.array(win))

        won = live.map_batches(winners, batch_format="pyarrow").to_pandas()
        if len(won) == 0:
            break  # cannot happen: every round has a global min edge
        for a, b in zip(won["a"], won["b"]):
            out_rows.append((int(a), int(b), rnd))
        matched_nodes = np.concatenate(
            [matched_nodes, won["a"].to_numpy(dtype=np.int64),
             won["b"].to_numpy(dtype=np.int64)]
        )
        cur = live
        rnd += 1

    out = pd.DataFrame(out_rows, columns=["src_doc", "dst_doc", "edge_rank"])
    if len(out) == 0:
        return pd.DataFrame({c: pd.Series(dtype="int64")
                             for c in ["src_doc", "dst_doc", "edge_rank"]})
    return (
        out.astype("int64").sort_values(["src_doc", "dst_doc"])
        .reset_index(drop=True)
    )


def warc_cdx_index(sf_dir: str, n_files: int = 4,
                   work_dir: str | None = None) -> "pd.DataFrame":
    """WARC + CDX round trip over the documents-derived corpus: pack the
    pages into ``n_files`` per-record-gzip WARC/1.0 files (the
    Common-Crawl layout — one gzip member per record, hash-partitioned
    by url fingerprint, record order sorted by url within each file so
    the packing is deterministic), then build the CDX capture index
    (``sources.io.build_cdx_index``) over the directory and return it.

    The index IS the random-access contract: every row's (filename,
    offset, length) must gunzip to exactly one record whose
    WARC-Target-URI equals the row's url — the e2e test seeks and
    verifies records straight from index rows.

    Scale shape: WARC packing is one url-fingerprint exchange +
    one writer task per file; indexing is one task per WARC file + the
    (surt, ts14) sort — both are the real artifacts' build shapes."""
    import pandas as pd

    from ..functions.hashing import fingerprint64_array
    from ..sources.io import build_cdx_index, write_pages_warc

    sf_tag = os.path.basename(os.path.normpath(sf_dir))
    work = work_dir or f"/tmp/opps_feedcrawler_ray/webpipe-{sf_tag}"
    paths = build_pages_from_documents(os.path.join(sf_dir, "documents.parquet"),
                                       os.path.join(work, "corpus"))
    # ADVICE r4: the packing cache must key on everything that changes
    # the packing (n_files + corpus fingerprint), and concurrent runs
    # must not see a half-written directory — build in a tmp dir and
    # atomically rename into the keyed location.
    doc_path = os.path.join(sf_dir, "documents.parquet")
    stat = os.stat(doc_path)
    # fingerprint = rows + size + mtime: a regenerated corpus with the
    # same row count but different content still misses the cache
    corpus_fp = (
        f"{pq.read_metadata(doc_path).num_rows}"
        f"-{stat.st_size}-{stat.st_mtime_ns}"
    )
    warc_dir = os.path.join(work, f"warc-n{n_files}-r{corpus_fp}")
    done = os.path.join(warc_dir, "_DONE")
    if not os.path.exists(done):
        import glob as _glob
        import time as _time

        # sweep crashed builds' orphan tmp dirs once they are clearly
        # not a live concurrent build (a killed run's
        # warc-*.tmp-<otherpid> is never reused).  Finished caches for
        # OTHER keys are left alone — a concurrent differently-keyed
        # run may be reading them right now, and the key space is tiny
        for stale in _glob.glob(os.path.join(work, "warc-n*.tmp-*")):
            if stale != warc_dir and (
                _time.time() - os.path.getmtime(stale) > 6 * 3600
            ):
                shutil.rmtree(stale, ignore_errors=True)
        tmp_dir = f"{warc_dir}.tmp-{os.getpid()}"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        os.makedirs(tmp_dir, exist_ok=True)
        pages = rd.read_parquet(paths["pages"])

        def bucketed(batch: pa.Table) -> pa.Table:
            fp = fingerprint64_array(batch["url"])
            b = pa.array(
                (np.asarray(fp, dtype=np.uint64) % np.uint64(n_files))
                .astype(np.int64)
            )
            return batch.append_column("__b", b)

        def write_file(g, _dir=tmp_dir):
            import pandas as _pd

            g = g.sort_values("url")
            b = int(g["__b"].iloc[0])
            t = pa.Table.from_pandas(g.drop(columns=["__b"]),
                                     preserve_index=False)
            write_pages_warc(t, os.path.join(_dir, f"part-{b:03d}.warc.gz"),
                             member_gzip=True)
            return _pd.DataFrame({"b": [b], "n": [len(g)]})

        (
            pages.map_batches(bucketed, batch_format="pyarrow")
            .groupby("__b")
            .map_groups(write_file, batch_format="pandas")
            .to_pandas()
        )
        with open(os.path.join(tmp_dir, "_DONE"), "w") as f:
            f.write("ok")
        try:
            os.rename(tmp_dir, warc_dir)  # atomic publish
        except OSError:
            # a concurrent run published first — use its copy
            shutil.rmtree(tmp_dir, ignore_errors=True)
    out = build_cdx_index(warc_dir).to_pandas()
    return out.reset_index(drop=True)


def _edge_block_refs(ds) -> list:
    """Block refs of an edge Dataset, for shipping into ONE remote task
    (shared by the sequential-by-construction graph ops).  The only
    place the private ``iter_internal_ref_bundles`` API is touched."""
    refs: list = []
    for bundle in ds.iter_internal_ref_bundles():
        refs.extend(bundle.block_refs)
    return refs


def _blocks_to_edge_df(blocks) -> "pd.DataFrame":
    """Concatenate shipped edge blocks inside a task (the only place
    the private ``BlockAccessor`` API is touched)."""
    import pandas as pd

    from ray.data.block import BlockAccessor

    dfs = [BlockAccessor.for_block(bl).to_pandas() for bl in blocks]
    return (pd.concat(dfs, ignore_index=True) if dfs
            else pd.DataFrame({"a": [], "b": []}))


def doc_ppr_push(sf_dir: str, alpha: float = 0.15, eps: float = 1e-6,
                 topk: int = 20, work_dir: str | None = None) -> "pd.DataFrame":
    """LOCAL personalized PageRank via the ACL PUSH algorithm (Andersen,
    Chung & Lang, FOCS 2006) from a deterministic seed doc (the
    smallest doc id with an edge) — the LOCAL-computation member of the
    graph family: unlike the global power iteration, push touches only
    the neighborhood where mass actually lands, with total work
    O(1/(α·ε)) independent of graph size.  Lazy-walk formulation:
    while some r(v) ≥ ε·d(v):  p(v) += α·r(v);  r(v) ← (1−α)r(v)/2;
    each neighbor u gets (1−α)r(v)/(2d(v)).  Nodes are processed in
    ascending id order (deterministic single-threaded fold), so the
    result is exactly reproducible.

    Scale shape: the edge build is the shared distributed corpus parse;
    the push itself is sequential by construction (ascending-id sweep)
    and runs in ONE remote task fed the edge dataset's block refs — the
    driver holds only the topk output (round 5: previously the full
    edge set materialized driver-side via ``to_pandas``).  The task's
    working set is the CSR plus the TOUCHED neighborhood (bounded by
    the push-work theorem, NOT the graph — this is the one graph op
    where single-process locality is the algorithm's point; the global
    twin is host_pagerank).  Rows-only; the twin checks the ACL
    invariant 0 ≤ exact_ppr − p ≤ ε·d elementwise against a dense
    linear-solve PPR.

    Returns topk (doc_id, ppr_e9) rows plus the seed marked, DESC."""
    import pandas as pd
    import ray

    edges, n_docs, nb = _doc_link_edges(sf_dir, work_dir)
    block_refs = _edge_block_refs(edges)

    @ray.remote
    def push_task(*blocks) -> "pd.DataFrame":
        edf = _blocks_to_edge_df(blocks)
        if len(edf) == 0:
            return pd.DataFrame({c: pd.Series(dtype="int64")
                                 for c in ["doc_id", "ppr_e9", "is_seed"]})
        a = edf["a"].to_numpy(dtype=np.int64)
        b = edf["b"].to_numpy(dtype=np.int64)
        src = np.concatenate([a, b])
        dst = np.concatenate([b, a])
        order = np.lexsort((dst, src))  # full order: block-layout-proof
        src, dst = src[order], dst[order]
        nodes = np.unique(src)
        starts = np.searchsorted(src, nodes)
        ends = np.searchsorted(src, nodes, side="right")
        deg = (ends - starts).astype(np.int64)
        idx = {int(n): i for i, n in enumerate(nodes)}
        seed = int(nodes.min())

        p: dict = {}
        r: dict = {seed: 1.0}
        # ascending-id sweep until no residual exceeds eps·d — deterministic
        while True:
            hot = sorted(v for v, rv in r.items() if rv >= eps * deg[idx[v]])
            if not hot:
                break
            for v in hot:
                rv = r[v]
                if rv < eps * deg[idx[v]]:
                    continue  # drained by an earlier neighbor this sweep
                p[v] = p.get(v, 0.0) + alpha * rv
                share = (1.0 - alpha) * rv / (2.0 * deg[idx[v]])
                r[v] = (1.0 - alpha) * rv / 2.0
                i = idx[v]
                for u in dst[starts[i]:ends[i]]:
                    r[int(u)] = r.get(int(u), 0.0) + share

        out = pd.DataFrame(
            {"doc_id": list(p.keys()),
             "ppr_e9": [int(np.floor(v * 1e9 + 0.5)) for v in p.values()]}
        )
        out["is_seed"] = (out["doc_id"] == seed).astype("int64")
        return (
            out.astype({"doc_id": "int64", "ppr_e9": "int64"})
            .sort_values(["ppr_e9", "doc_id"], ascending=[False, True])
            .head(topk).reset_index(drop=True)
        )

    return ray.get(push_task.remote(*block_refs))


def _katz_bucketed(edges_ds, iters: int, gc_dir: str,
                   n_buckets: int) -> "pd.DataFrame":
    """Out-of-driver Katz (VERDICT r4 task #1 family): the undirected
    edge set expands to directed contributions ONCE and co-partitions
    with the rank table by source bucket; each iteration's integer
    neighbor sums flow dst-bucket-partitioned through the ``graphcore``
    exchange with per-task partial sums, the merge REPLACES each
    bucket's rank rows (x' is a fresh sum, so exact integer // 100
    after the full per-node fold — identical to the broadcast twin by
    associativity of integer addition), and the driver holds refs +
    counters for exactly ``iters`` rounds."""
    import pandas as pd

    from . import graphcore as gc

    directed = gc.expand_undirected(edges_ds)
    edge_refs = gc.partition_by_key(directed, "a", n_buckets, gc_dir, ["a", "b"])

    def init(_b: int) -> pd.DataFrame:
        return pd.DataFrame(
            {c: pd.Series([], dtype="int64") for c in ("node", "lab")}
        )

    state_refs = gc.init_state_refs(init, n_buckets)

    def propose(edges_df: pd.DataFrame, st: pd.DataFrame):
        if not len(edges_df):
            return None
        src = edges_df["a"].to_numpy(dtype="int64")
        dst = edges_df["b"].to_numpy(dtype="int64")
        if len(st):
            nodes_s = st["node"].to_numpy()  # merge keeps this sorted
            vals_s = st["lab"].to_numpy()
            pos = np.clip(np.searchsorted(nodes_s, src), 0, len(nodes_s) - 1)
            hit = nodes_s[pos] == src
            val = 1_000_000 + np.where(hit, vals_s[pos], 0)
        else:
            val = np.full(len(src), 1_000_000, dtype=np.int64)
        return (
            pd.DataFrame({"node": dst, "nd": val})
            .groupby("node", as_index=False)["nd"]
            .sum()
        )

    def merge(st: pd.DataFrame, props: pd.DataFrame):
        # replace semantics: x' is rebuilt from this round's sums; the
        # constant changed=1 makes bucketed_fixpoint run exactly
        # max_iters rounds (truncated series, not a fixpoint)
        if not len(props):
            return st.iloc[0:0], 1
        p = props.groupby("node", as_index=False)["nd"].sum()
        new = pd.DataFrame(
            {"node": p["node"].to_numpy(dtype="int64"),
             "lab": p["nd"].to_numpy(dtype="int64") // 100}
        ).sort_values("node").reset_index(drop=True)
        return new, 1

    state_refs, _ = gc.bucketed_fixpoint(
        edge_refs, state_refs, propose, merge, max_iters=iters
    )
    out = gc.collect_state(state_refs)
    if not len(out):
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "katz": pd.Series([], dtype="int64")})
    out = out[["node", "lab"]].rename(columns={"node": "doc_id", "lab": "katz"})
    return (
        out.astype({"doc_id": "int64", "katz": "int64"})
        .sort_values(["katz", "doc_id"], ascending=[False, True])
        .reset_index(drop=True)
    )


def doc_katz_centrality(sf_dir: str, iters: int = 8,
                        work_dir: str | None = None,
                        exchange: str = "bucketed",
                        n_buckets: int = 8) -> "pd.DataFrame":
    """TRUNCATED KATZ CENTRALITY (Katz 1953) over the undirected doc
    link graph — the attenuated-walk-count member of the centrality
    family (degree=1-hop, Katz=all walks damped α^len, PageRank=
    normalized, harmonic/betweenness=distance-based): x = Σ_{k=1..K}
    α^k·(A^k·1), computed as K pinned-edges iterations of
    x' = A·(1e6 + x) // 100 (α = 1/100 exact integer, β·1e6 the unit
    seed), so every entry is an exact integer and any executor's
    summation order agrees — the host_pagerank determinism scheme
    without the mass-conservation pool (Katz mass is unnormalized).
    α=0.01 keeps the truncated series dominant-eigenvalue-safe for any
    graph with max degree < 100; K=8 walks.

    Scale shape: ``exchange="bucketed"`` (default, VERDICT r4 task #1
    family) routes the per-iteration integer sums through the
    ``graphcore`` out-of-driver exchange — rank rows co-partitioned
    with their edges, driver holds refs + counters only;
    ``"broadcast"`` keeps the prior shape (one ``map_batches`` over the
    pinned edge dataset + node-bounded groupby per iteration, the
    fits-a-heap label-table assumption) as the equality twin.
    Rows-only; a numpy replica twin requires exact equality.

    Returns (doc_id, katz) sorted katz DESC, doc_id ASC."""
    import pandas as pd
    import ray

    edges, n_docs, nb = _doc_link_edges(sf_dir, work_dir)
    if exchange == "bucketed":
        sf_tag = os.path.basename(os.path.normpath(sf_dir))
        work = work_dir or f"/tmp/opps_feedcrawler_ray/webpipe-{sf_tag}"
        return _katz_bucketed(edges, iters, os.path.join(work, f"gc_katz-{os.getpid()}"),
                              n_buckets)
    edf_nodes = None
    x: dict[int, int] = {}
    part_schema = pa.schema([("node", pa.int64()), ("c", pa.int64()),
                             ("__b", pa.int64())])

    for _ in range(iters):
        if x:
            xs = np.array(sorted(x), dtype=np.int64)
            xv = np.array([x[int(n)] for n in xs], dtype=np.int64)
        else:
            xs = np.array([], dtype=np.int64)
            xv = np.array([], dtype=np.int64)
        xref = ray.put((xs, xv))

        def contribute(batch: pa.Table, _r=xref) -> pa.Table:
            import pandas as _pd

            nodes_s, vals_s = ray.get(_r)
            a = batch["a"].to_numpy(zero_copy_only=False)
            b = batch["b"].to_numpy(zero_copy_only=False)
            # undirected: each endpoint receives the other's (seed + x);
            # sorted-array searchsorted lookup (the objstore fetch kernel)
            src = np.concatenate([a, b])
            dst = np.concatenate([b, a])
            if len(nodes_s):
                pos = np.searchsorted(nodes_s, src)
                pos = np.clip(pos, 0, len(nodes_s) - 1)
                hit = nodes_s[pos] == src
                val = 1_000_000 + np.where(hit, vals_s[pos], 0)
            else:
                val = np.full(len(src), 1_000_000, dtype=np.int64)
            g = _pd.DataFrame({"node": dst, "c": val}).groupby(
                "node", as_index=False)["c"].sum()
            g["__b"] = (g["node"].to_numpy() % nb).astype("int64")
            return pa.Table.from_pandas(g, preserve_index=False,
                                        schema=part_schema)

        sums = (
            edges.map_batches(contribute, batch_format="pyarrow")
            .groupby("__b")
            .map_groups(
                lambda g: g.groupby("node", as_index=False)["c"].sum(),
                batch_format="pandas",
            )
            .to_pandas()
        )
        x = {int(n): int(c) // 100 for n, c in zip(sums["node"], sums["c"])}
        if edf_nodes is None:
            edf_nodes = sorted(x)

    out = pd.DataFrame(
        {"doc_id": edf_nodes, "katz": [x.get(n, 0) for n in edf_nodes]}
    ).astype("int64")
    return (
        out.sort_values(["katz", "doc_id"], ascending=[False, True])
        .reset_index(drop=True)
    )


def _host_norm_adjacency(edges_df):
    """Shared front half of both spectral solvers: host index + the
    COALESCED symmetric normalized adjacency in coordinate form
    (i, j, c) with c = d_i^{-1/2}·A_ij·d_j^{-1/2} — never a dense
    |hosts|×|hosts| matrix."""
    import pandas as pd

    hosts = sorted(set(edges_df["src_host"]) | set(edges_df["dst_host"]))
    n = len(hosts)
    idx = {h: q for q, h in enumerate(hosts)}
    si = edges_df["src_host"].map(idx).to_numpy(dtype=np.int64)
    di = edges_df["dst_host"].map(idx).to_numpy(dtype=np.int64)
    w = edges_df["n_links"].to_numpy(dtype=np.float64)
    keep = si != di  # self-loops don't affect cuts
    si, di, w = si[keep], di[keep], w[keep]
    coo = (
        pd.DataFrame({"i": np.concatenate([si, di]),
                      "j": np.concatenate([di, si]),
                      "w": np.concatenate([w, w])})
        .groupby(["i", "j"], as_index=False)["w"].sum()
    )
    deg = np.zeros(n)
    np.add.at(deg, coo["i"].to_numpy(), coo["w"].to_numpy())
    deg = np.where(deg == 0, 1.0, deg)
    dmh = 1.0 / np.sqrt(deg)
    ii = coo["i"].to_numpy(dtype=np.int64)
    jj = coo["j"].to_numpy(dtype=np.int64)
    cc = dmh[ii] * coo["w"].to_numpy() * dmh[jj]
    return hosts, ii, jj, cc


def _lanczos_smallest(matvec, n: int, n_want: int, seed: int = 1234,
                      tol: float = 1e-8):
    """Lanczos tridiagonalization with full reorthogonalization,
    deterministic deflation restarts, AND residual-checked basis
    expansion: starting from m = min(n, max(3·n_want, 24)) Krylov
    steps, the bottom ``n_want`` Ritz pairs are verified against the
    actual multiply (‖L·v − λv‖ ≤ tol·max(1, |λ|)) and the basis
    doubles until they converge or m reaches n (where the Krylov space
    is exhausted and the Ritz pairs ARE the eigenpairs) — so larger
    host graphs pay more multiplies instead of silently returning
    unconverged estimates.  The classic bounded-memory iterative
    eigensolver (Golub & Van Loan ch. 10).  Returns
    (ritz_values, ritz_vectors[:, order]) ascending."""
    m = min(n, max(3 * n_want, 24))
    while True:
        vals, vecs = _lanczos_basis(matvec, n, m, seed)
        converged = True
        for i in range(min(n_want, vecs.shape[1])):
            v = vecs[:, i]
            nv = float(np.linalg.norm(v))
            if nv == 0.0:
                continue
            u = v / nv
            resid = float(np.linalg.norm(matvec(u) - vals[i] * u))
            if resid > tol * max(1.0, abs(float(vals[i]))):
                converged = False
                break
        if converged or m >= n:
            return vals, vecs
        m = min(n, 2 * m)


def _lanczos_basis(matvec, n: int, m: int, seed: int = 1234):
    """One Lanczos sweep of (up to) ``m`` basis vectors; see
    :func:`_lanczos_smallest` for the algorithm notes."""
    rng = np.random.default_rng(seed)
    V: list[np.ndarray] = []
    alphas: list[float] = []
    betas: list[float] = []  # betas[t] couples basis vectors t and t+1

    def fresh_vector() -> np.ndarray | None:
        for _ in range(8):  # restart draws are cheap; n tries suffice
            v = rng.standard_normal(n)
            for u in V:
                v -= (u @ v) * u
            nv = float(np.linalg.norm(v))
            if nv > 1e-8:
                return v / nv
        return None

    v0 = fresh_vector()
    if v0 is None:
        return np.zeros(0), np.zeros((n, 0))
    V.append(v0)
    while len(alphas) < m:
        wv = matvec(V[-1])
        a = float(V[-1] @ wv)
        alphas.append(a)
        if len(alphas) == m:
            break
        wv = wv - a * V[-1]
        if betas and betas[-1] != 0.0 and len(V) >= 2:
            wv = wv - betas[-1] * V[-2]
        for _ in range(2):  # full reorthogonalization, twice for stability
            for u in V:
                wv -= (u @ wv) * u
        b = float(np.linalg.norm(wv))
        if b > 1e-10:
            betas.append(b)
            V.append(wv / b)
        else:
            if len(V) >= n:
                break
            nxt = fresh_vector()
            if nxt is None:
                break
            betas.append(0.0)  # restart boundary: T stays block-tridiagonal
            V.append(nxt)
    mm = len(alphas)
    T = np.diag(np.asarray(alphas))
    for t in range(mm - 1):
        T[t, t + 1] = T[t + 1, t] = betas[t]
    vals, S = np.linalg.eigh(T)
    Vmat = np.column_stack(V[:mm])
    return vals, Vmat @ S


def host_spectral_embedding(sf_dir: str, k: int = 2,
                            work_dir: str | None = None,
                            solver: str = "lanczos") -> "pd.DataFrame":
    """SPECTRAL EMBEDDING of the host link graph (Laplacian eigenmaps,
    Belkin & Niyogi 2003; normalized cut spectra, Shi & Malik 2000) —
    the spectral member of the graph family: coordinates = the k
    eigenvectors of the symmetric normalized Laplacian
    L = I − D^{−1/2}·A·D^{−1/2} with the smallest non-trivial
    eigenvalues.  λ₂ (the Fiedler value) > 0 iff the graph is
    connected, and the λ₂ eigenvector is the classic bisection
    direction.

    Determinism: the edge weights are exact integers, the Lanczos seed
    is pinned, and each eigenvector's sign is fixed by making its
    largest-|entry| coordinate positive (first index on ties).  k is
    clamped to n−1 available non-trivial eigenpairs (a ≤k-host graph
    returns the host column plus however many pairs exist).

    Scale shape (VERDICT r4 task #3 — the big-graph path is now code):
    ``solver="lanczos"`` (default) never forms the dense matrix — the
    L·x multiply runs as ONE ``map_batches`` pass over the PINNED
    coalesced-coefficient edge dataset per Lanczos step (per-batch
    node-bounded partial sums, hosts-bounded driver fold: exactly the
    ``_integer_pagerank`` dataflow), and driver memory is the m×n
    Lanczos basis (m ≈ 3k) instead of n².  ``solver="dense"`` keeps the
    numpy ``eigh`` on the explicit matrix as the equality twin.
    Rows-only; the twins verify the eigen equations, orthonormality,
    Fiedler-connectivity, and lanczos == dense eigenvalues.

    Returns (host, then for i in 1..k: lam{i}_e9, x{i}_e6)."""
    import pandas as pd

    import ray

    edges_df = host_link_graph(sf_dir, work_dir=work_dir)
    hosts, ii, jj, cc = _host_norm_adjacency(edges_df)
    n = len(hosts)
    if n == 0:
        return pd.DataFrame({"host": pd.Series(dtype=object)})
    k = min(k, max(0, n - 1))  # ADVICE r4: ≤k-host graphs must not IndexError

    if solver == "dense":
        A = np.zeros((n, n))
        A[ii, jj] = cc
        L = np.eye(n) - A
        vals, vecs = np.linalg.eigh(L)
        vals, vecs = vals[: k + 1], vecs[:, : k + 1]
    else:
        coef = rd.from_arrow(
            pa.table({"i": pa.array(ii, pa.int64()),
                      "j": pa.array(jj, pa.int64()),
                      "c": pa.array(cc, pa.float64())})
        ).materialize()

        def matvec(x: np.ndarray) -> np.ndarray:
            x_ref = ray.put(x)

            def contribute(batch: pa.Table) -> pa.Table:
                xv = ray.get(x_ref)
                bi = batch["i"].to_numpy(zero_copy_only=False)
                bj = batch["j"].to_numpy(zero_copy_only=False)
                bc = batch["c"].to_numpy(zero_copy_only=False)
                ui, inv = np.unique(bi, return_inverse=True)
                s = np.zeros(len(ui))
                np.add.at(s, inv, bc * xv[bj])
                return pa.table({"i": pa.array(ui, pa.int64()),
                                 "s": pa.array(s, pa.float64())})

            parts = (
                coef.map_batches(contribute, batch_format="pyarrow")
                .to_pandas()  # hosts-bounded partials (blocks × touched i)
                .groupby("i")["s"].sum()
            )
            y = np.zeros(n)
            y[parts.index.to_numpy(dtype=np.int64)] = parts.to_numpy()
            return x - y  # L·x = x − D^{-1/2}·A·D^{-1/2}·x

        vals, vecs = _lanczos_smallest(matvec, n, n_want=k + 1)
        vals, vecs = vals[: k + 1], vecs[:, : k + 1]

    out = pd.DataFrame({"host": hosts})
    for i in range(1, k + 1):
        v = vecs[:, i]
        j = int(np.argmax(np.abs(v)))
        if v[j] < 0:
            v = -v
        out[f"lam{i}_e9"] = int(np.floor(vals[i] * 1e9 + 0.5))
        out[f"x{i}_e6"] = np.floor(v * 1e6 + 0.5).astype("int64")
    return out.sort_values("host").reset_index(drop=True)
