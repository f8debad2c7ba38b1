"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: no
``ray.init`` / ``ray.shutdown`` anywhere in the package (only bench.py,
CLI mains and the pytest fixture own a session).

Each ``queries()`` entry is one operator/pipeline from SURVEY.md §2 (or
a training-data op from the driver prompt); SQL-expressible ones have a
DuckDB twin in ``oracle_sql()`` with IDENTICAL column names.  Float
aggregates are integer-scaled (``_e2``/``_e4`` suffixes) on both sides
so value hashes are exact — see pipelines/analytics.py docstring.
"""

from __future__ import annotations

import glob
import os
from collections.abc import Callable
from typing import Any

_STOP_LIST = "('the','and','of','to','a','in','is','that','it','for')"


def entry() -> Any:
    """Flagship crawl over a pages corpus derived from sf0.001 documents."""
    from opps_feedcrawler_ray.pipelines.webpipe import crawl_documents

    return crawl_documents("/root/testdata/sf0.001")


def _q_crawl(sf_dir: str):
    from opps_feedcrawler_ray.pipelines.webpipe import crawl_documents

    return crawl_documents(sf_dir)


def _q_crawl_host_stats(sf_dir: str):
    """G1 over the crawl log: per-host fetched pages + outlink totals."""
    from opps_feedcrawler_ray.pipelines.webpipe import crawl_documents

    log = crawl_documents(sf_dir)
    import pandas as pd

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"host": [g["host"].iloc[0]], "n_pages": [len(g)],
             "n_links_total": [int(g["n_links"].sum())]}
        )

    return log.groupby("host").map_groups(agg, batch_format="pandas").to_pandas()


def _q_hll_distinct(sf_dir: str):
    """Approximate COUNT DISTINCT via mergeable HLL sketches: one sketch
    per batch, tiny merge stage (rows-only check: approximate by design;
    the exact twin is the distinct_users query)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from opps_feedcrawler_ray.functions.sketch import HyperLogLog

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "user_id"])

    def sketch_batch(batch: pa.Table) -> pa.Table:
        import pandas as pd

        df = batch.to_pandas()
        rows = []
        for et, g in df.groupby("event_type"):
            h = HyperLogLog(p=12)
            h.add_values(g["user_id"].tolist())
            rows.append((et, h.to_bytes()))
        return pa.table(
            {"event_type": pa.array([r[0] for r in rows], pa.string()),
             "sketch": pa.array([r[1] for r in rows], pa.binary())}
        )

    partials = ev.map_batches(sketch_batch, batch_format="pyarrow").to_pandas()
    out_rows = []
    for et, g in partials.groupby("event_type"):
        merged = HyperLogLog.from_bytes(bytes(g["sketch"].iloc[0]))
        for b in g["sketch"].iloc[1:]:
            merged = merged.merge(HyperLogLog.from_bytes(bytes(b)))
        out_rows.append({"event_type": et, "approx_users": int(round(merged.estimate()))})
    import pandas as pd

    return pd.DataFrame(out_rows)


def _q_minhash_pairs(sf_dir: str):
    import ray.data as rd

    from opps_feedcrawler_ray.pipelines.dedup import minhash_lsh_dedup

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return minhash_lsh_dedup(docs, threshold=0.5, return_pairs=True)


def _q_simhash_pairs(sf_dir: str):
    import ray.data as rd

    from opps_feedcrawler_ray.pipelines.dedup import simhash_dedup

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return simhash_dedup(docs, max_hamming=10)


def _q_ngram_jaccard(sf_dir: str):
    """Oracle-checked exact shingle Jaccard: DuckDB rebuilds the same word
    3-shingles via list ops.  Pipeline threshold sits just below 0.4 and
    BOTH sides filter on the half-up-rounded e4 value computed with the
    identical float expression (shared*10000.0/union), so membership and
    hashes match bit-for-bit."""
    import numpy as np
    import ray.data as rd

    from opps_feedcrawler_ray.pipelines.dedup import ngram_jaccard_pairs

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    df = ngram_jaccard_pairs(docs, threshold=0.3999, k_shingle=3)
    df["jaccard_e4"] = np.floor(df["jaccard_e4_raw"] + 0.5).astype("int64")
    df = df[df["jaccard_e4"] >= 4000]
    return df[["a", "b", "jaccard_e4"]].reset_index(drop=True)


def _q_prefix_jaccard(sf_dir: str):
    """Oracle-checked PPJoin-style prefix-filtered token-SET Jaccard:
    DuckDB computes the exact all-pairs set Jaccard; the pipeline only
    indexes each doc's rarest-token prefix.  Pipeline threshold sits
    just below 0.9 and BOTH sides filter on the half-up e6 value from
    the identical float expression ((inter/union)*1e6), so membership
    and hashes match bit-for-bit."""
    import numpy as np
    import ray.data as rd

    from opps_feedcrawler_ray.pipelines.dedup import prefix_jaccard_pairs

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    df = prefix_jaccard_pairs(docs, threshold=0.8999)
    df["jac_e6"] = np.floor(df["sim"] * 1e6 + 0.5).astype("int64")
    df = df[df["jac_e6"] >= 900000]
    return df[["a", "b", "jac_e6"]].sort_values(["a", "b"]).reset_index(drop=True)


def _q_ngram_jaccard_maxdf(sf_dir: str):
    """Same exact-Jaccard query with the ``max_df`` 100 TB stop-shingle
    guard ACTIVE (max_df=50).  On the fixtures the max shingle document
    frequency is <10, so the guard provably drops nothing and the exact
    DuckDB oracle still applies — this proves the distributed hot-shingle
    filter path doesn't change answers when it shouldn't."""
    import numpy as np
    import ray.data as rd

    from opps_feedcrawler_ray.pipelines.dedup import ngram_jaccard_pairs

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    df = ngram_jaccard_pairs(docs, threshold=0.3999, k_shingle=3, max_df=50)
    df["jaccard_e4"] = np.floor(df["jaccard_e4_raw"] + 0.5).astype("int64")
    df = df[df["jaccard_e4"] >= 4000]
    return df[["a", "b", "jaccard_e4"]].reset_index(drop=True)


def _q_ngram_containment(sf_dir: str):
    """Oracle-checked exact shingle CONTAINMENT (shared/min set size,
    Broder 1997) — the subset-document detector: a short doc quoted
    whole inside a long one scores 1.0 here but low Jaccard.  Pipeline
    threshold sits just below 0.8 and BOTH sides filter on the half-up
    e4 value from the identical float expression
    (shared*10000.0/min(na,nb)), so membership and hashes match
    bit-for-bit."""
    import numpy as np
    import ray.data as rd

    from opps_feedcrawler_ray.pipelines.dedup import ngram_jaccard_pairs

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    df = ngram_jaccard_pairs(
        docs, threshold=0.7999, k_shingle=3, metric="containment"
    )
    df["containment_e4"] = np.floor(df["jaccard_e4_raw"] + 0.5).astype("int64")
    df = df[df["containment_e4"] >= 8000]
    return df[["a", "b", "containment_e4"]].reset_index(drop=True)


def _q_embedding_dups(sf_dir: str):
    """EXACT all-pairs cosine ≥ 0.5 (triangle block join, recall 1.0) —
    oracle-checked so this query can never silently return empty again.
    Pipeline threshold sits just below 0.5 and BOTH sides filter on the
    rounded e6 value, so borderline float jitter cannot flip membership."""
    import numpy as np
    import ray.data as rd

    from opps_feedcrawler_ray.pipelines.dedup import embedding_allpairs_cosine

    vecs = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    df = embedding_allpairs_cosine(vecs, threshold=0.4999)
    df["cosine_e6"] = np.floor(df["cosine"] * 1e6 + 0.5).astype("int64")
    df = df[df["cosine_e6"] >= 500000]
    return df[["a", "b", "cosine_e6"]].reset_index(drop=True)


def _q_embedding_dups_lsh(sf_dir: str):
    """Sub-quadratic multi-table sign-LSH variant (the 100 TB path);
    rows-only by nature, but test_dedup pins it equal to the exact
    all-pairs output at the same threshold on the fixture corpus."""
    import numpy as np
    import ray.data as rd

    from opps_feedcrawler_ray.pipelines.dedup import embedding_dedup_pairs

    vecs = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    df = embedding_dedup_pairs(vecs, threshold=0.5)
    df["cosine_e6"] = np.floor(df["cosine"] * 1e6 + 0.5).astype("int64")
    return df[["a", "b", "cosine_e6"]].reset_index(drop=True)


def _q_semantic_dedup(sf_dir: str):
    """SemDeDup cluster-then-prune (rows-only: the within-cluster scope
    depends on the trained clustering, not SQL-expressible); test_dedup
    pins n_clusters=1 equal to the exact all-pairs baseline and checks
    the clustered output is an exact-cosine SUBSET of it."""
    import ray.data as rd

    from opps_feedcrawler_ray.pipelines.dedup import semantic_dedup_pairs

    vecs = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    return semantic_dedup_pairs(vecs, n_clusters=8, threshold=0.4)


def _q_ann(sf_dir: str):
    import numpy as np
    import pyarrow.parquet as _pq
    import ray.data as rd

    from opps_feedcrawler_ray.pipelines.ann import brute_force_topk

    emb = _pq.read_table(f"{sf_dir}/embeddings.parquet")
    order = {v: i for i, v in enumerate(emb["vec_id"].to_pylist())}
    queries = np.array(
        [emb["embedding"][order[q]].as_py() for q in (0, 1, 2)], dtype=np.float64
    )
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    out = brute_force_topk(ds, queries, k=10)
    out = out.rename(columns={"query_idx": "query_idx", "vec_id": "vec_id"})
    out["cosine_e6"] = (out["cosine"] * 1e6).round().astype("int64")
    return out[["query_idx", "vec_id", "cosine_e6"]]


def _q_ivf_ann(sf_dir: str):
    import numpy as np
    import pyarrow.parquet as _pq
    import ray.data as rd

    from opps_feedcrawler_ray.pipelines.ann import ivf_topk

    emb = _pq.read_table(f"{sf_dir}/embeddings.parquet")
    order = {v: i for i, v in enumerate(emb["vec_id"].to_pylist())}
    queries = np.array(
        [emb["embedding"][order[q]].as_py() for q in (0, 1, 2)], dtype=np.float64
    )
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    out = ivf_topk(ds, queries, k=10, n_cells=8, n_probe=3)
    out["cosine_e6"] = (out["cosine"] * 1e6).round().astype("int64")
    return out[["query_idx", "vec_id", "cosine_e6"]]


def _q_hard_negatives(sf_dir: str):
    from opps_feedcrawler_ray.pipelines.ann import hard_negatives

    return hard_negatives(sf_dir, n_queries=20, k=5)


def _q_kcenter_coreset(sf_dir: str):
    """Greedy k-center (farthest-point) coreset — iterative argmax has
    no SQL form; rows-only, pinned element-wise to a numpy twin in
    test_ann."""
    from opps_feedcrawler_ray.pipelines.ann import kcenter_coreset

    return kcenter_coreset(sf_dir, k=16)


def _q_doc_sssp(sf_dir: str):
    """Weighted SSSP (distributed Bellman-Ford relax-to-fixpoint over
    pinned edges, deterministic id-arithmetic weights); rows-only —
    test pins it to a Dijkstra replay over the same edge list."""
    from opps_feedcrawler_ray.pipelines.webpipe import doc_sssp

    return doc_sssp(sf_dir, source=0)


def _q_doc_scc(sf_dir: str):
    """Strongly-connected components via the coloring algorithm (Orzan
    2004) over the DIRECTED doc link graph — the mutual-reachability
    complement of undirected components; rows-only — the twin replays
    Tarjan over the same edge list and requires exact partition
    equality (both sides label by min member)."""
    from opps_feedcrawler_ray.pipelines.webpipe import doc_scc

    return doc_scc(sf_dir)


def _q_doc_luby_mis(sf_dir: str):
    """Maximal independent set via Luby's parallel symmetry-breaking
    rounds over the pinned undirected doc link graph; rows-only — the
    twin checks independence, maximality, and determinism exactly."""
    from opps_feedcrawler_ray.pipelines.webpipe import doc_luby_mis

    return doc_luby_mis(sf_dir)


def _q_doc_betweenness(sf_dir: str):
    """Source-parallel exact Brandes betweenness (per-source passes
    fan out over a broadcast CSR; e9-integer dependency partials);
    rows-only by nature (shortest-path DAG recursion has no SQL oracle)
    — twin tests pin structural graphs and a full brute Brandes."""
    from opps_feedcrawler_ray.pipelines.webpipe import doc_betweenness

    return doc_betweenness(sf_dir, k=20)


def _q_ann_ranking_eval(sf_dir: str):
    """Offline retrieval evaluation: precision@k + NDCG@k of the exact
    cosine retriever under label-match relevance (rows-only; full
    pandas replay twin in test_ann)."""
    from opps_feedcrawler_ray.pipelines.ann import ann_ranking_eval

    return ann_ranking_eval(sf_dir, n_queries=20, k=10)


def _q_golden_records(sf_dir: str):
    """Golden-record survivorship after cluster dedup (longest-text
    survivor, min-id canonical key, deterministic ties); oracle =
    recursive-CTE transitive closure + windowed argmax."""
    from opps_feedcrawler_ray.pipelines.dedup import golden_records

    return golden_records(sf_dir)


def _q_embedding_topk_pairs(sf_dir: str):
    """Global top-k similarity join (closest pairs, no threshold):
    per-block-pair local top-k provably contains the global answer
    (rows-only: float cosine ranking; brute-matrix twin in
    test_dedup)."""
    import ray.data as rd

    from opps_feedcrawler_ray.pipelines.dedup import embedding_topk_pairs

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    return embedding_topk_pairs(ds, k=20)


def _q_part_snm_pairs(sf_dir: str):
    """Sorted-neighborhood entity-resolution blocking (range-sorted
    window pairs + boundary-fragment stitching), token-Jaccard
    verified; oracle = ROW_NUMBER rank self-join with the same integer
    Jaccard."""
    from opps_feedcrawler_ray.pipelines.dedup import part_snm_pairs

    return part_snm_pairs(sf_dir, window=5, threshold_e4=6000)


def _q_embedding_dbscan(sf_dir: str):
    """DBSCAN density clustering (exact eps-neighbor edges -> core set
    -> union-find components -> border attachment -> one broadcast
    labeling pass); rows-only by nature (density clustering) —
    test_ann pins it to a textbook sequential replay and planted
    blobs."""
    from opps_feedcrawler_ray.pipelines.ann import embedding_dbscan

    return embedding_dbscan(sf_dir, threshold=0.5, min_pts=4)


def _q_embedding_lof(sf_dir: str):
    """Local Outlier Factor (density-ratio outliers): exact kNN via
    block-pair partial top-k supersets, k-distance/LRD broadcasts
    (rows-only; bit-exact brute replay twin in test_ann)."""
    from opps_feedcrawler_ray.pipelines.ann import embedding_lof

    return embedding_lof(sf_dir, k=10, topn=20)


def _q_embedding_silhouette(sf_dir: str):
    """Simplified (centroid) silhouette validation of the k-means
    clustering — per-cluster mean silhouette from one streaming pass
    over broadcast centroids (rows-only; exact replay twin)."""
    from opps_feedcrawler_ray.pipelines.ann import embedding_silhouette

    return embedding_silhouette(sf_dir, k=8, n_iters=5)


def _q_embedding_bisecting(sf_dir: str):
    """Bisecting k-means (divisive hierarchical clustering): split-tree
    broadcast, state-free leaf re-derivation per pass; rows-only —
    exact single-process replay twin in test_ann."""
    from opps_feedcrawler_ray.pipelines.ann import embedding_bisecting_kmeans

    # k=5/n_iters=3 keeps the pass count ((k-1)·(2+iters)+1) modest —
    # the sandbox embeddings are tiny, so fixed per-pass cost dominates
    return embedding_bisecting_kmeans(sf_dir, k=5, n_iters=3)


def _q_embedding_kmeans(sf_dir: str):
    """Distributed Lloyd's k-means (broadcast centroids -> e6-integer
    partial sums -> driver update); rows-only by nature (iterative float
    EM) — test_ann pins it to an exact single-process replay."""
    from opps_feedcrawler_ray.pipelines.ann import embedding_kmeans

    return embedding_kmeans(sf_dir, k=8, n_iters=5)


def _q_embedding_random_projection(sf_dir: str):
    """Johnson-Lindenstrauss Rademacher projection (pinned splitmix64
    sign matrix, one streaming matmul); rows-only — test_ann replays R
    exactly and checks the JL distortion band on sampled pairs."""
    from opps_feedcrawler_ray.pipelines.ann import embedding_random_projection

    return embedding_random_projection(sf_dir, k=16)


def _q_embedding_pca(sf_dir: str):
    """Two-pass distributed PCA (moment partials -> driver eigh ->
    streaming projection); rows-only by nature (no SQL eigensolver) —
    test_ann pins it element-wise to driver-side numpy PCA."""
    from opps_feedcrawler_ray.pipelines.ann import embedding_pca

    return embedding_pca(sf_dir, n_components=2)


def _q_ivf_partitioned(sf_dir: str):
    """IVF with a REAL cell-partitioned layout: build once (hive
    partition by cell), search reads only the probed cells (partition
    pruning) — the 100 TB path.  Approximate by design → rows-only."""
    import os

    import numpy as np
    import pyarrow.parquet as _pq
    import ray.data as rd

    from opps_feedcrawler_ray.pipelines.ann import ivf_build, ivf_search

    emb = _pq.read_table(f"{sf_dir}/embeddings.parquet")
    order = {v: i for i, v in enumerate(emb["vec_id"].to_pylist())}
    queries = np.array(
        [emb["embedding"][order[q]].as_py() for q in (0, 1, 2)], dtype=np.float64
    )
    tag = os.path.basename(os.path.normpath(sf_dir))
    cells_dir = ivf_build(
        rd.read_parquet(f"{sf_dir}/embeddings.parquet"),
        f"/tmp/opps_feedcrawler_ray/ivf8-{tag}",
        n_cells=8,
    )
    out = ivf_search(cells_dir, queries, k=10, n_cells=8, n_probe=3)
    out["cosine_e6"] = (out["cosine"] * 1e6).round().astype("int64")
    return out[["query_idx", "vec_id", "cosine_e6"]]


def _q_host_link_graph(sf_dir: str):
    from opps_feedcrawler_ray.pipelines.webpipe import host_link_graph

    return host_link_graph(sf_dir)


def _q_trainprep(sf_dir: str):
    """Composed training-corpus prep flow (quality gate → dedup → split
    → pack → partitioned write); returns the per-split manifest.
    Engine-defined layout → rows-only; invariants pinned in tests."""
    from opps_feedcrawler_ray.pipelines.trainprep import training_corpus_pipeline

    return training_corpus_pipeline(sf_dir)


def _q_doc_triangles(sf_dir: str):
    from opps_feedcrawler_ray.pipelines.webpipe import doc_triangle_counts

    return doc_triangle_counts(sf_dir)


def _q_doc_adamic_adar(sf_dir: str):
    from opps_feedcrawler_ray.pipelines.webpipe import doc_adamic_adar

    return doc_adamic_adar(sf_dir, k=20)


def _q_doc_clustering(sf_dir: str):
    from opps_feedcrawler_ray.pipelines.webpipe import doc_clustering_coeff

    return doc_clustering_coeff(sf_dir)


def _q_doc_bfs_depth(sf_dir: str):
    from opps_feedcrawler_ray.pipelines.webpipe import doc_bfs_depth

    return doc_bfs_depth(sf_dir)


def _q_host_pagerank(sf_dir: str):
    """Iterative distributed PageRank (rows-only: iterative algorithms
    have no SQL oracle; a numpy power-iteration twin is pinned in tests)."""
    from opps_feedcrawler_ray.pipelines.webpipe import host_pagerank

    return host_pagerank(sf_dir, iters=5)


def _q_host_trustrank(sf_dir: str):
    """TrustRank + spam mass (Gyöngyi et al. VLDB 2004/2006): biased-
    teleport integer PageRank with inverse-PageRank seed selection
    (rows-only: iterative, no SQL oracle; a sequential integer-replica
    twin with exact mass conservation is pinned in tests)."""
    from opps_feedcrawler_ray.pipelines.webpipe import host_trustrank

    return host_trustrank(sf_dir, iters=5)


def _q_doc_cdc_chunks(sf_dir: str):
    """Content-defined-chunking dedup census (rsync/LBFS/FastCDC
    family): windowed rolling-hash boundaries, recurring-chunk report
    (rows-only: the cut rule has no SQL twin; per-byte replica +
    census replica + edit-locality tests are pinned)."""
    from opps_feedcrawler_ray.pipelines.dedup import doc_cdc_chunks

    return doc_cdc_chunks(sf_dir)


def _q_doc_ktruss(sf_dir: str):
    """3-truss of the doc link graph via distributed triangle
    enumeration + driver worklist peeling (rows-only: iterative
    fixpoint, no SQL oracle; a brute-force recount-peeling twin is
    pinned in tests)."""
    from opps_feedcrawler_ray.pipelines.webpipe import doc_ktruss

    return doc_ktruss(sf_dir, k=3)


def _q_host_spectral_embedding(sf_dir: str):
    """Laplacian-eigenmap spectral embedding of the host graph
    (rows-only: eigensolve; the twin verifies L·v = λ·v, unit norm,
    and the Fiedler-connectivity property)."""
    from opps_feedcrawler_ray.pipelines.webpipe import host_spectral_embedding

    return host_spectral_embedding(sf_dir)


def _q_doc_katz_centrality(sf_dir: str):
    """Truncated Katz centrality (integer attenuated-walk counts;
    rows-only: iterative, no SQL oracle; an exact dense numpy replica
    twin is pinned in tests)."""
    from opps_feedcrawler_ray.pipelines.webpipe import doc_katz_centrality

    return doc_katz_centrality(sf_dir)


def _q_doc_ppr_push(sf_dir: str):
    """Local personalized PageRank via ACL push (rows-only: local
    iterative algorithm; the twin proves the FOCS'06 invariant
    0 ≤ exact − p ≤ ε·deg against a dense linear-solve PPR)."""
    from opps_feedcrawler_ray.pipelines.webpipe import doc_ppr_push

    return doc_ppr_push(sf_dir)


def _q_warc_cdx_index(sf_dir: str):
    """WARC packing + CDX capture index (the web-archive random-access
    artifact; rows-only: byte geometry has no SQL twin; the e2e test
    seeks records straight from index rows and verifies url + digest)."""
    from opps_feedcrawler_ray.pipelines.webpipe import warc_cdx_index

    return warc_cdx_index(sf_dir)


def _q_doc_maximal_matching(sf_dir: str):
    """Maximal matching (Israeli–Itai locally-minimal-edge rounds),
    the coarsening primitive (rows-only: iterative fixpoint; the
    sequential-greedy-equality + maximality twin is pinned in tests)."""
    from opps_feedcrawler_ray.pipelines.webpipe import doc_maximal_matching

    return doc_maximal_matching(sf_dir)


def _q_dust_rules(sf_dir: str):
    """DUST rule mining (Bar-Yossef et al. WWW 2007): URL substitution
    rules from content-identical URL-pair groups (rows-only: the alias
    derivation + LCP/LCS rule extraction has no SQL twin; a pandas
    brute-force replica is pinned in tests)."""
    from opps_feedcrawler_ray.pipelines.webpipe import dust_rules

    return dust_rules(sf_dir)


def _q_host_hits(sf_dir: str):
    """HITS hubs/authorities (rows-only: iterative, no SQL oracle; a
    replica twin with exact mass-conservation invariants is pinned in
    tests)."""
    from opps_feedcrawler_ray.pipelines.webpipe import host_hits

    return host_hits(sf_dir, iters=5)


def _q_host_components(sf_dir: str):
    """Iterative connected components via min-label propagation
    (rows-only: iterative; a union-find twin is pinned in tests)."""
    from opps_feedcrawler_ray.pipelines.webpipe import host_components

    return host_components(sf_dir)


def _q_host_kcore(sf_dir: str):
    """Iterative k-core decomposition by parallel peeling (rows-only:
    iterative; a brute sequential-peel twin is pinned in tests)."""
    from opps_feedcrawler_ray.pipelines.webpipe import host_kcore

    return host_kcore(sf_dir)


def _q_host_spanning_forest(sf_dir: str):
    """Borůvka maximum spanning forest — the web-graph backbone
    (rows-only: iterative; a Kruskal twin under the same edge total
    order is pinned in tests — unique-MSF ⇒ exact equality)."""
    from opps_feedcrawler_ray.pipelines.webpipe import host_spanning_forest

    return host_spanning_forest(sf_dir)


def _q_user_overlap_sketch(sf_dir: str):
    """Theta/KMV-sketch pairwise distinct-user overlaps (rows-only:
    sketch estimate; tests pin the exact-intersection error band and
    combiner order-independence)."""
    from opps_feedcrawler_ray.pipelines.analytics import user_overlap_sketch

    return user_overlap_sketch(sf_dir)


def _q_textrank(sf_dir: str):
    """TextRank keyword extraction — PageRank over the token
    co-occurrence graph (rows-only: iterative; tests pin the edge build
    against a pure-Python replay and the ranking against the float
    power iteration)."""
    from opps_feedcrawler_ray.pipelines.analytics import textrank_keywords

    return textrank_keywords(sf_dir)


def _q_token_cms(sf_dir: str):
    """Count-Min-sketch token frequencies with the certified N·e/w
    bound (rows-only: sketch estimates have no SQL equal; tests pin the
    exact-count sandwich and combiner order-independence)."""
    from opps_feedcrawler_ray.pipelines.analytics import token_cms_counts

    return token_cms_counts(sf_dir)


def _q_events_isotonic(sf_dir: str):
    """Isotonic calibration curve via exact integer PAVA over the
    domain-bounded value histogram (rows-only: sequential pooling is
    not SQL-expressible; tests pin an exact replay + monotonicity +
    pool-mean preservation + optimality)."""
    from opps_feedcrawler_ray.pipelines.analytics import events_isotonic_calibration

    return events_isotonic_calibration(sf_dir)


def _q_hybrid_search_rrf(sf_dir: str):
    """BM25 + dense-cosine hybrid retrieval fused with reciprocal-rank
    fusion (rows-only: the dense leg is not SQL-expressible; tests pin
    a full in-process replay of both legs and the integer fusion)."""
    from opps_feedcrawler_ray.pipelines.ann import hybrid_search_rrf

    return hybrid_search_rrf(sf_dir)


def _q_events_gbm_stumps(sf_dir: str):
    """Histogram-GBM boosted-stump training (rows-only: iterative model
    training; tests pin a bit-exact single-process replay of the
    integer-residual recipe plus loss-decrease and accuracy floors)."""
    from opps_feedcrawler_ray.pipelines.analytics import events_gbm_stumps

    return events_gbm_stumps(sf_dir)


def _q_doc_harmonic_centrality(sf_dir: str):
    """HyperBall harmonic centrality over the doc link graph (rows-only:
    iterative sketch; tests pin the per-node exact-BFS error band and
    determinism)."""
    from opps_feedcrawler_ray.pipelines.webpipe import doc_harmonic_centrality

    return doc_harmonic_centrality(sf_dir)


def _q_doc_neighborhood_function(sf_dir: str):
    """HyperBall neighborhood function N(t) + effective diameter over
    the doc link graph (rows-only: iterative + sketch-estimated; tests
    pin it against an exact boolean-matrix BFS within the p=8 HLL error
    band, with an exact-fixpoint saturation round)."""
    from opps_feedcrawler_ray.pipelines.webpipe import doc_neighborhood_function

    return doc_neighborhood_function(sf_dir)


def _q_ann_pq(sf_dir: str):
    """Product-quantization ADC top-k (rows-only: trained codebooks +
    asymmetric distances have no SQL oracle; recall-vs-brute and
    reconstruction twins are pinned in test_ann)."""
    import numpy as np
    import pyarrow.parquet as _pq
    import ray.data as rd

    from opps_feedcrawler_ray.pipelines.ann import pq_topk

    emb = _pq.read_table(f"{sf_dir}/embeddings.parquet")
    order = {v: i for i, v in enumerate(emb["vec_id"].to_pylist())}
    queries = np.array(
        [emb["embedding"][order[q]].as_py() for q in (0, 1, 2)], dtype=np.float64
    )
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    # m=32 subspaces x 64 codewords: 32 B/vector (8x vs float32), the
    # config that holds recall@10 >= 0.7 on these near-random embeddings
    return pq_topk(ds, queries, k=10, m=32, ksub=64)


def _q_ann_ivfpq(sf_dir: str):
    """IVF+PQ composed index (coarse cells + residual product codes,
    ADC over probed cells only) — rows-only; recall/self-hit/probe-set
    twins in test_ann."""
    import numpy as np
    import pyarrow.parquet as _pq
    import ray.data as rd

    from opps_feedcrawler_ray.pipelines.ann import ivfpq_topk

    emb = _pq.read_table(f"{sf_dir}/embeddings.parquet")
    order = {v: i for i, v in enumerate(emb["vec_id"].to_pylist())}
    queries = np.array(
        [emb["embedding"][order[q]].as_py() for q in (0, 1, 2)], dtype=np.float64
    )
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    return ivfpq_topk(ds, queries, k=10, n_cells=16, n_probe=6, m=32, ksub=64)


def _q_dedup_cascade(sf_dir: str):
    """Composed exact → MinHash-LSH → SimHash dedup funnel (rows-only:
    chained approximate stages; funnel-arithmetic + exact-stage-recount
    + determinism twins in test_dedup)."""
    from opps_feedcrawler_ray.pipelines.dedup import dedup_cascade

    return dedup_cascade(sf_dir)


def _q_host_communities(sf_dir: str):
    """Label-propagation community detection (rows-only: iterative, no
    SQL oracle; synthetic structural twins — cliques, bridges, paths —
    are pinned in tests)."""
    from opps_feedcrawler_ray.pipelines.webpipe import host_communities

    return host_communities(sf_dir)


def _q_langid(sf_dir: str):
    import pyarrow as pa
    import ray.data as rd

    from opps_feedcrawler_ray.functions.text import detect_lang

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": batch["doc_id"],
             "lang_pred": pa.array(detect_lang(batch["text"].to_pylist()), pa.string())}
        )

    return docs.map_batches(fn, batch_format="pyarrow")


def _q_fingerprints(sf_dir: str):
    import pyarrow as pa
    import ray.data as rd

    from opps_feedcrawler_ray.functions.text import doc_fingerprint

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        fp = doc_fingerprint(batch["text"].to_pylist())
        return pa.table(
            {"doc_id": batch["doc_id"],
             "fp_hex": pa.array([f"{int(x):016x}" for x in fp], pa.string())}
        )

    return docs.map_batches(fn, batch_format="pyarrow")


def _q_media_image(sf_dir: str):
    # round-4: REAL decode (fake=False) over hermetically-generated
    # BMP/PPM payloads — the actual codec path, golden-pinned in tests
    import ray.data as rd

    from opps_feedcrawler_ray.stages.multimodal import decode_images, synth_media_table

    media = rd.from_arrow(synth_media_table(64, real=True))
    imgs = media.filter(lambda r: r["kind"] == "image")
    feats = decode_images(imgs, concurrency=2, batch_size=8, fake=False)

    def summarize(batch):
        import numpy as np
        import pyarrow as pa

        means = [float(np.mean(f)) for f in batch["feature"].to_pylist()]
        return pa.table(
            {"media_id": batch["media_id"], "height": batch["height"],
             "width": batch["width"],
             "feat_mean_e6": pa.array([int(round(m * 1e6)) for m in means], pa.int64())}
        )

    return feats.map_batches(summarize, batch_format="pyarrow")


def _q_media_image_dups(sf_dir: str):
    """Perceptual-hash (aHash) near-duplicate image pairs over a
    deterministic corpus with planted jittered copies — banding + exact
    Hamming verify; brute-force-parity + recall-guarantee twins in
    test_multimodal (rows-only: codec + popcount, no SQL analogue)."""
    import ray.data as rd

    from opps_feedcrawler_ray.stages.multimodal import (
        image_phash_dups, synth_image_dup_table,
    )

    ds = rd.from_arrow(synth_image_dup_table(96))
    return image_phash_dups(ds, max_hamming=4)


def _q_media_video_scenes(sf_dir: str):
    """Shot-boundary detection over planted-scene concatenated-P6
    videos (real codec): full-frame mean-abs-diff threshold, one row
    per video with the boundary list (rows-only; planted-cut recovery
    + replay twins in test_multimodal)."""
    import ray.data as rd

    from opps_feedcrawler_ray.stages.multimodal import (
        detect_video_scenes, synth_video_scene_table,
    )

    ds = rd.from_arrow(synth_video_scene_table(24))
    return detect_video_scenes(ds, concurrency=2, batch_size=4, fake=False)


def _q_media_quality(sf_dir: str):
    """Per-asset media quality signals over the real codecs (image
    brightness/contrast/entropy, audio rms/zcr/duration) — the
    multimodal quality gate (rows-only; exact replay twin)."""
    import ray.data as rd

    from opps_feedcrawler_ray.stages.multimodal import (
        media_quality, synth_media_table,
    )

    ds = rd.from_arrow(synth_media_table(64, real=True))
    return media_quality(ds, concurrency=2, batch_size=8, fake=False)


def _q_media_audio_dups(sf_dir: str):
    """Energy-envelope audio fingerprint near-dup pairs over a corpus
    with planted noise-jittered copies — the shared 64-bit banding
    engine over the WAV stage (rows-only; brute-parity twins)."""
    import ray.data as rd

    from opps_feedcrawler_ray.stages.multimodal import (
        audio_fp_dups, synth_audio_dup_table,
    )

    ds = rd.from_arrow(synth_audio_dup_table(60))
    return audio_fp_dups(ds, max_hamming=4)


def _q_media_audio(sf_dir: str):
    import ray.data as rd

    from opps_feedcrawler_ray.stages.multimodal import frame_audio, synth_media_table

    media = rd.from_arrow(synth_media_table(64, real=True))
    auds = media.filter(lambda r: r["kind"] == "audio")
    return frame_audio(auds, concurrency=2, batch_size=8, fake=False).select_columns(
        ["media_id", "n_frames", "sample_rate"]
    )


def _q_media_video(sf_dir: str):
    # stride-sampled frames from concatenated-P6 video streams (real mode)
    import ray.data as rd

    from opps_feedcrawler_ray.stages.multimodal import sample_video_frames, synth_media_table

    media = rd.from_arrow(synth_media_table(64, real=True))
    vids = media.filter(lambda r: r["kind"] == "video")
    return sample_video_frames(
        vids, concurrency=2, batch_size=4, fake=False, stride=2
    ).select_columns(["media_id", "frame_idx", "n_frames"])


def queries() -> dict[str, Callable[[str], Any]]:
    from opps_feedcrawler_ray.pipelines import analytics as A
    from opps_feedcrawler_ray.pipelines import dedup as D
    from opps_feedcrawler_ray.pipelines import streaming as S

    return {
        # relational / aggregate operators (oracle-checked)
        "source_stats": A.source_stats,
        "filter_lang": A.filter_lang,
        "topk_chars": A.topk_chars,
        "orders_by_segment": A.orders_by_segment,
        "lineitem_order_priority": A.lineitem_order_priority,
        "region_nations": A.region_nations,
        "distinct_users": A.distinct_users,
        "events_daily": A.events_daily,
        "json_extract_events": A.json_extract_events,
        "pricing_summary": A.pricing_summary,
        "supplier_topk": A.supplier_topk,
        "user_event_seq": A.user_event_seq,
        "user_event_seq_salted": S.user_event_seq_salted,
        "asof_last_purchase": S.asof_last_purchase,
        "asof_last_purchase_salted": S.asof_last_purchase_salted,
        "sessionize": S.sessionize,
        "sessionize_salted": S.sessionize_salted,
        "events_range_join_count": S.events_range_join_count,
        "asof_next_click": S.asof_next_click,
        "session_stats": S.session_stats,
        "events_ewma": S.events_ewma,
        "events_late_arrivals": S.events_late_arrivals,
        "orders_profile": A.orders_profile,
        "purchase_click_days_except": A.purchase_click_days_except,
        "events_trimmed_mean": A.events_trimmed_mean,
        "events_time_weighted_avg": A.events_time_weighted_avg,
        "events_hash_sample": A.events_hash_sample,
        "purchase_attribution": A.purchase_attribution,
        "events_ks_test": A.events_ks_test,
        "split_contamination": A.split_contamination,
        "langid_confusion": A.langid_confusion,
        "source_dup_factor": A.source_dup_factor,
        "embedding_quantize_int8": A.embedding_quantize_int8,
        "orders_scd2": A.orders_scd2,
        "orders_pit_join": A.orders_pit_join,
        "part_name_similarity_join": A.part_name_similarity_join,
        "orders_theilsen_trend": A.orders_theilsen_trend,
        "vocab_richness": A.vocab_richness,
        "part_fd_discovery": A.part_fd_discovery,
        # propensity matching: iterative trained model + greedy matching,
        # rows-only — bit-exact replay twin in tests
        "error_propensity_att": A.error_propensity_att,
        "events_ldiversity_audit": A.events_ldiversity_audit,
        "events_tcloseness_audit": A.events_tcloseness_audit,
        "events_fdr_bh": A.events_fdr_bh,
        # PPMI-SVD word vectors: exact-integer co-occurrence under any
        # parallelism + sign-fixed SVD, rows-only — dense numpy twin in tests
        "token_ppmi_svd": A.token_ppmi_svd,
        # Laplace-mechanism DP release: deterministic hash-derived noise,
        # rows-only — mechanism-replay twin in tests
        "events_dp_daily_release": A.events_dp_daily_release,
        # unigram-LM (SentencePiece) tokenizer: iterative EM over the
        # bounded word-count table, rows-only — determinism/coverage/
        # Viterbi-vs-brute twins in tests
        "unigram_lm_vocab": A.unigram_lm_vocab,
        "wordpiece_vocab": A.wordpiece_vocab,
        "wordpiece_encode_docs": A.wordpiece_encode_docs,
        "unigram_encode_docs": A.unigram_encode_docs,
        # V-optimal histogram: DP over the bounded quantized domain,
        # rows-only — exhaustive-enumeration twin in tests
        "events_voptimal_histogram": A.events_voptimal_histogram,
        # DGIM sliding-window sketch: per-stream sequential by
        # construction, rows-only — guarantee-vs-exact twin in tests
        "events_dgim_window": A.events_dgim_window,
        "events_matrix_profile": A.events_matrix_profile,
        "events_diff_in_diff": A.events_diff_in_diff,
        "events_ams_f2": A.events_ams_f2,
        "events_isolation_forest": A.events_isolation_forest,
        "purchase_cox_ph": A.purchase_cox_ph,
        "lineitem_huber_regression": A.lineitem_huber_regression,
        "purchase_shapley_attribution": A.purchase_shapley_attribution,
        "referential_integrity_audit": A.referential_integrity_audit,
        "orders_benford": A.orders_benford,
        "source_stats_incremental": A.source_stats_incremental,
        "doc_clean_md5": A.doc_clean_md5,
        "nation_share_of_region": A.nation_share_of_region,
        "orders_digest": A.orders_digest,
        "nation_region_cross": A.nation_region_cross,
        "user_activity_gini": A.user_activity_gini,
        "events_global_rank": A.events_global_rank,
        "docs_matching_all_terms": A.docs_matching_all_terms,
        "contacts_union_by_name": A.contacts_union_by_name,
        "orders_diff": A.orders_diff,
        "event_transition_matrix": A.event_transition_matrix,
        "part_pareto": A.part_pareto,
        "top_spender_events": S.top_spender_events,
        "revenue_by_nation": S.revenue_by_nation,
        "hll_distinct_users": _q_hll_distinct,
        "embeddings_by_label": A.embeddings_by_label,
        "supplier_nation_builtin": A.supplier_nation_builtin,
        "events_lag_delta": A.events_lag_delta,
        "events_lag_delta_salted": S.events_lag_delta_salted,
        "orders_monthly": A.orders_monthly,
        "part_type_stats": A.part_type_stats,
        "customer_balance_buckets": A.customer_balance_buckets,
        "doc_md5": A.doc_md5,
        "events_moving_sum3": A.events_moving_sum3,
        "orders_rank_in_segment": A.orders_rank_in_segment,
        "doc_regex_count": A.doc_regex_count,
        "nation_balance_stats": A.nation_balance_stats,
        "events_median_value": A.events_median_value,
        "customer_no_big_order": A.customer_no_big_order,
        "doc_token_counts": A.doc_token_counts,
        "passage_dedup_docs": A.passage_dedup_docs,
        "events_value_quantile_sketch": A.events_value_quantile_sketch,
        "bm25_search": A.bm25_search,
        "weighted_sample_docs": A.weighted_sample_docs,
        "doc_repetition_stats": A.doc_repetition_stats,
        "pii_redact_docs": A.pii_redact_docs,
        "lineitem_bloom_join": A.lineitem_bloom_join,
        "stratified_sample_docs": A.stratified_sample_docs,
        "orders_cube_year_priority": A.orders_cube_year_priority,
        "token_postings": A.token_postings,
        "user_funnel_stage": A.user_funnel_stage,
        "events_value_time_corr": A.events_value_time_corr,
        "events_mad_value": A.events_mad_value,
        "supplier_ship_overlap": A.supplier_ship_overlap,
        "lineitem_price_regression": A.lineitem_price_regression,
        "events_unpivot_props": A.events_unpivot_props,
        "bpe_vocab": A.bpe_vocab,
        "event_type_lift": A.event_type_lift,
        "dsir_resample": A.dsir_resample,
        "events_running_total": A.events_running_total,
        "user_retention_cohorts": A.user_retention_cohorts,
        "user_day_streaks": A.user_day_streaks,
        "events_running_distinct": A.events_running_distinct,
        "ngram_containment_pairs": _q_ngram_containment,
        "orders_upsert_latest": A.orders_upsert_latest,
        "part_fuzzy_name_match": A.part_fuzzy_name_match,
        "orders_percent_rank": A.orders_percent_rank,
        "orders_pivot_month_segment": A.orders_pivot_month_segment,
        "purchase_click_users": A.purchase_click_users,
        "tfidf_top_terms": A.tfidf_top_terms,
        "doc_lm_perplexity": A.doc_lm_perplexity,
        "events_trailing_3d": A.events_trailing_3d,
        "active_users_7d": A.active_users_7d,
        "events_segment_skew_join": A.events_segment_skew_join,
        "source_lang_entropy": A.source_lang_entropy,
        "users_weekly_purchasers": A.users_weekly_purchasers,
        "segment_event_chi2": A.segment_event_chi2,
        "purchase_click_days_bag": A.purchase_click_days_bag,
        "user_event_pattern_counts": A.user_event_pattern_counts,
        "events_trailing_3d_max": A.events_trailing_3d_max,
        "orders_yoy_growth": A.orders_yoy_growth,
        "customer_big_order_counts": A.customer_big_order_counts,
        "heavy_hitter_tokens": A.heavy_hitter_tokens,
        "events_quantiles": A.events_quantiles,
        "orders_rollup": A.orders_rollup,
        "doc_split_assign": A.doc_split_assign,
        "pack_token_chunks": A.pack_token_chunks,
        "decontaminate_ngrams": A.decontaminate_ngrams,
        "host_link_graph": _q_host_link_graph,
        "host_pagerank": _q_host_pagerank,
        "host_trustrank": _q_host_trustrank,
        "dust_rules": _q_dust_rules,
        "doc_ktruss": _q_doc_ktruss,
        "doc_cdc_chunks": _q_doc_cdc_chunks,
        "doc_maximal_matching": _q_doc_maximal_matching,
        "warc_cdx_index": _q_warc_cdx_index,
        "doc_ppr_push": _q_doc_ppr_push,
        "doc_katz_centrality": _q_doc_katz_centrality,
        "events_kleinberg_bursts": A.events_kleinberg_bursts,
        "host_spectral_embedding": _q_host_spectral_embedding,
        "events_sinkhorn_ot": A.events_sinkhorn_ot,
        "events_platt_calibration": A.events_platt_calibration,
        "host_hits": _q_host_hits,
        "host_components": _q_host_components,
        "host_kcore": _q_host_kcore,
        "host_spanning_forest": _q_host_spanning_forest,
        "doc_neighborhood_function": _q_doc_neighborhood_function,
        "doc_harmonic_centrality": _q_doc_harmonic_centrality,
        "host_communities": _q_host_communities,
        "top_tokens_per_lang": A.top_tokens_per_lang,
        "doc_triangle_counts": _q_doc_triangles,
        "doc_adamic_adar": _q_doc_adamic_adar,
        "doc_clustering_coeff": _q_doc_clustering,
        "doc_bfs_depth": _q_doc_bfs_depth,
        "events_daily_distinct_users": A.events_daily_distinct_users,
        "user_mode_event": A.user_mode_event,
        "purchase_days_no_click": A.purchase_days_no_click,
        "events_daily_gapfill": A.events_daily_gapfill,
        "quality_score_model": A.quality_score_model,
        "embedding_centroids": A.embedding_centroids,
        "events_hopping_window": A.events_hopping_window,
        "part_lineitem_full_outer": A.part_lineitem_full_outer,
        "supplier_names_by_nation": A.supplier_names_by_nation,
        "lineitem_above_avg": A.lineitem_above_avg,
        "orders_ntile": A.orders_ntile,
        "events_first_last": A.events_first_last,
        "training_corpus_manifest": _q_trainprep,
        # crawl-engine operators
        "url_canonicalize": A.url_canonicalize,
        "topk_per_group": A.topk_per_group,
        "sample_docs": A.sample_docs,
        "crawl_documents": _q_crawl,
        "crawl_host_stats": _q_crawl_host_stats,
        # training-data ops
        "token_counts": A.token_counts,
        "text_quality": A.text_quality,
        "exact_dedup": A.exact_dedup_docs,
        "minhash_pairs": _q_minhash_pairs,
        "simhash_pairs": _q_simhash_pairs,
        "ngram_jaccard_pairs": _q_ngram_jaccard,
        "ngram_jaccard_maxdf": _q_ngram_jaccard_maxdf,
        "prefix_jaccard_pairs": _q_prefix_jaccard,
        "exact_substring_pairs": D.exact_substring_pairs,
        "dup_clusters": D.dup_clusters,
        "embedding_dups": _q_embedding_dups,
        "embedding_dups_lsh": _q_embedding_dups_lsh,
        "semantic_dedup_pairs": _q_semantic_dedup,
        "ann_cosine_topk": _q_ann,
        "ann_ivf_topk": _q_ivf_ann,
        "ann_ivf_partitioned": _q_ivf_partitioned,
        "ann_pq_topk": _q_ann_pq,
        "ann_ivfpq_topk": _q_ann_ivfpq,
        "embedding_pca": _q_embedding_pca,
        "embedding_random_projection": _q_embedding_random_projection,
        "embedding_kmeans": _q_embedding_kmeans,
        "embedding_bisecting_kmeans": _q_embedding_bisecting,
        "embedding_silhouette": _q_embedding_silhouette,
        "embedding_lof": _q_embedding_lof,
        "doc_betweenness": _q_doc_betweenness,
        "doc_sssp": _q_doc_sssp,
        "doc_luby_mis": _q_doc_luby_mis,
        "doc_scc": _q_doc_scc,
        "ann_hard_negatives": _q_hard_negatives,
        "kcenter_coreset": _q_kcenter_coreset,
        "events_autocorr": A.events_autocorr,
        "zorder_layout": A.zorder_layout,
        "balanced_resample": A.balanced_resample,
        "doc_char_chunks": A.doc_char_chunks,
        "welch_ttest": A.welch_ttest,
        "woe_iv": A.woe_iv,
        "doc_augment": A.doc_augment,
        "events_psi": A.events_psi,
        "embedding_fisher": A.embedding_fisher,
        "events_cume_dist": A.events_cume_dist,
        "purchase_no_recent_click": A.purchase_no_recent_click,
        "token_zipf_fit": A.token_zipf_fit,
        "orders_gaps_islands": A.orders_gaps_islands,
        "customer_rfm": A.customer_rfm,
        "source_vocab_jaccard": A.source_vocab_jaccard,
        "events_bootstrap_ci": A.events_bootstrap_ci,
        "purchase_survival_km": A.purchase_survival_km,
        "bpe_encode_docs": A.bpe_encode_docs,
        "doc_compression_ratio": A.doc_compression_ratio,
        "orders_urgent_logreg": A.orders_urgent_logreg,
        "events_cusum_changepoint": A.events_cusum_changepoint,
        "doc_coverage_select": A.doc_coverage_select,
        "events_holt_forecast": A.events_holt_forecast,
        "events_holtwinters_forecast": A.events_holtwinters_forecast,
        "dedup_cascade": _q_dedup_cascade,
        "source_simpson_diversity": A.source_simpson_diversity,
        "lineitem_weighted_median": A.lineitem_weighted_median,
        "events_mannwhitney": A.events_mannwhitney,
        "events_decision_stump": A.events_decision_stump,
        "events_gbm_stumps": _q_events_gbm_stumps,
        "events_type_regression": A.events_type_regression,
        "events_hbos_outliers": A.events_hbos_outliers,
        "conformal_token_interval": A.conformal_token_interval,
        "events_seasonal_decompose": A.events_seasonal_decompose,
        "events_cuped_adjust": A.events_cuped_adjust,
        "token_typo_pairs": A.token_typo_pairs,
        "token_pmi_collocations": A.token_pmi_collocations,
        "events_anova_f": A.events_anova_f,
        "events_kruskal_wallis": A.events_kruskal_wallis,
        "lang_temperature_sample": A.lang_temperature_sample,
        "user_type_als": A.user_type_als,
        "doc_blocklist_filter": A.doc_blocklist_filter,
        "events_kendall_tau": A.events_kendall_tau,
        "lineitem_mode_quantity": A.lineitem_mode_quantity,
        "orders_ivm_agg": A.orders_ivm_agg,
        "data_quality_checks": A.data_quality_checks,
        "join_size_estimate": A.join_size_estimate,
        "lineitem_qty_means": A.lineitem_qty_means,
        "orders_benford_digits": A.orders_benford_digits,
        "events_daily_dense": A.events_daily_dense,
        "events_value_zscore": A.events_value_zscore,
        "logreg_lambda_sweep": A.logreg_lambda_sweep,
        "events_zorder_prune_stats": A.events_zorder_prune_stats,
        "revenue_monthly_sortmerge": A.revenue_monthly_sortmerge,
        "events_kanonymity_audit": A.events_kanonymity_audit,
        "golden_records": _q_golden_records,
        "events_synthesize": A.events_synthesize,
        "events_psi_drift": A.events_psi_drift,
        "event_attribution_markov": A.event_attribution_markov,
        "doc_encoding_audit": A.doc_encoding_audit,
        "lineitem_exact_median_price": A.lineitem_exact_median_price,
        "docs_phrase_search": A.docs_phrase_search,
        "doc_readability": A.doc_readability,
        "part_snm_pairs": _q_part_snm_pairs,
        "embedding_topk_pairs": _q_embedding_topk_pairs,
        "embedding_dbscan": _q_embedding_dbscan,
        "ann_ranking_eval": _q_ann_ranking_eval,
        "hybrid_search_rrf": _q_hybrid_search_rrf,
        "events_isotonic_calibration": _q_events_isotonic,
        "token_cms_counts": _q_token_cms,
        "textrank_keywords": _q_textrank,
        "user_overlap_sketch": _q_user_overlap_sketch,
        "events_spearman_corr": A.events_spearman_corr,
        "customer_loo_encoding": A.customer_loo_encoding,
        "nb_lang_predict": A.nb_lang_predict,
        "events_percentile_cont": A.events_percentile_cont,
        "segment_event_mutual_info": A.segment_event_mutual_info,
        "sequential_pattern_support": A.sequential_pattern_support,
        "events_dow_seasonality": A.events_dow_seasonality,
        "events_anomaly_ids": A.events_anomaly_ids,
        "cohort_ltv": A.cohort_ltv,
        "orders_grouping_sets": A.orders_grouping_sets,
        "doc_ngram_novelty": A.doc_ngram_novelty,
        "langid": _q_langid,
        "doc_fingerprints": _q_fingerprints,
        "media_image_features": _q_media_image,
        "media_image_dups": _q_media_image_dups,
        "media_audio_dups": _q_media_audio_dups,
        "media_video_scenes": _q_media_video_scenes,
        "media_quality": _q_media_quality,
        "media_audio_frames": _q_media_audio,
        "media_video_frames": _q_media_video,
    }


def _shapley_oracle_sql() -> str:
    """Exact Shapley attribution over the 16-subset lattice, generated
    so the SQL's term order and weight arithmetic mirror the engine's
    float expression tree exactly (same left-to-right sums)."""
    import math

    channels = ["click", "error", "signup", "view"]
    n = len(channels)
    case = " + ".join(
        f"{1 << k} * MAX(CASE WHEN event_type = '{channels[k]}' "
        "THEN 1 ELSE 0 END)"
        for k in range(n)
    )
    head = (
        "WITH u AS (SELECT user_id, " + case + " AS mask, "
        "MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv "
        "FROM events GROUP BY user_id), "
        "c AS (SELECT mask, COUNT(*) AS n, SUM(conv) AS k FROM u "
        "GROUP BY mask), "
        "v AS (SELECT m.mask, COALESCE(CAST(c.k AS DOUBLE) / c.n, 0.0) "
        "AS val FROM (SELECT UNNEST(RANGE(16)) AS mask) m "
        "LEFT JOIN c USING (mask))"
    )
    sels = []
    for k, ch in enumerate(channels):
        terms = []
        for s in range(1 << n):
            if s & (1 << k):
                continue
            size = bin(s).count("1")
            w = (f"({math.factorial(size)}.0 * "
                 f"{math.factorial(n - size - 1)}.0 / "
                 f"{math.factorial(n)}.0)")
            terms.append(
                f"{w} * ((SELECT val FROM v WHERE mask = {s | (1 << k)}) "
                f"- (SELECT val FROM v WHERE mask = {s}))"
            )
        expr = " + ".join(terms)
        sels.append(
            f"SELECT '{ch}' AS channel, "
            f"CAST(FLOOR(({expr}) * 1e6 + 0.5) AS BIGINT) AS phi_e6"
        )
    return head + " " + " UNION ALL ".join(sels) + " ORDER BY channel"


def _fd_oracle_sql() -> str:
    """Exact FD level-1 check per ordered column pair of part."""
    cols = ["p_partkey", "p_name", "p_brand", "p_type", "p_size"]
    sels = []
    for i, a in enumerate(cols):
        for j, b in enumerate(cols):
            if i == j:
                continue
            sels.append(
                f"SELECT '{a}' AS lhs, '{b}' AS rhs, "
                f"CAST((SELECT COUNT(*) FROM (SELECT {a} FROM part "
                f"GROUP BY {a} HAVING COUNT(DISTINCT {b}) > 1)) "
                "AS BIGINT) AS n_violating"
            )
    return (
        "SELECT lhs, rhs, n_violating, CAST(CASE WHEN n_violating = 0 "
        "THEN 1 ELSE 0 END AS BIGINT) AS holds FROM ("
        + " UNION ALL ".join(sels) + ") ORDER BY lhs, rhs"
    )


def oracle_sql() -> dict[str, str]:
    sql = {
        "source_stats": (
            "SELECT source, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars, "
            "ROUND(SUM(n_chars) * 1.0 / COUNT(*), 6) AS avg_chars "
            "FROM documents GROUP BY source"
        ),
        "filter_lang": (
            "SELECT doc_id, source, n_chars FROM documents WHERE lang = 'en'"
        ),
        "topk_chars": (
            "SELECT doc_id, n_chars FROM documents "
            "ORDER BY n_chars DESC, doc_id ASC LIMIT 20"
        ),
        "orders_by_segment": (
            "SELECT c_mktsegment, COUNT(*) AS n_orders, "
            "CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_e2 "
            "FROM orders JOIN customer ON o_custkey = c_custkey "
            "GROUP BY c_mktsegment"
        ),
        "lineitem_order_priority": (
            "SELECT o_orderpriority, COUNT(*) AS n_items, "
            "CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS revenue_e4 "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "GROUP BY o_orderpriority"
        ),
        "region_nations": (
            "SELECT r_name, COUNT(*) AS n_nations FROM nation "
            "JOIN region ON n_regionkey = r_regionkey GROUP BY r_name"
        ),
        "distinct_users": (
            "SELECT event_type, COUNT(DISTINCT user_id) AS n_users, "
            "COUNT(*) AS n_events FROM events GROUP BY event_type"
        ),
        "events_daily": (
            "SELECT event_type, date_trunc('day', ts) AS day, COUNT(*) AS n, "
            "CAST(SUM(CAST(ROUND(value * 10000) AS BIGINT)) AS BIGINT) AS value_e4 "
            "FROM events GROUP BY event_type, date_trunc('day', ts)"
        ),
        "json_extract_events": (
            "SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k "
            "FROM events"
        ),
        "pricing_summary": (
            "SELECT l_returnflag, l_linestatus, "
            "CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_e2, "
            "CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_e2, "
            "CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS sum_disc_e4, "
            "COUNT(*) AS count_order "
            "FROM lineitem GROUP BY l_returnflag, l_linestatus"
        ),
        "supplier_topk": (
            "SELECT s_suppkey, s_name, CAST(ROUND(s_acctbal * 100) AS BIGINT) AS s_acctbal_e2 "
            "FROM supplier ORDER BY s_acctbal DESC, s_suppkey ASC LIMIT 10"
        ),
        "user_event_seq": (
            "SELECT event_id, user_id, "
            "ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS seq_in_user "
            "FROM events"
        ),
        "user_event_seq_salted": (
            "SELECT event_id, user_id, "
            "ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS seq_in_user "
            "FROM events"
        ),
        "asof_last_purchase": (
            "WITH marks AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase') "
            "SELECT e.event_id, m.ts AS last_purchase_ts "
            "FROM events e ASOF LEFT JOIN marks m ON e.user_id = m.user_id AND e.ts >= m.ts"
        ),
        "asof_last_purchase_salted": (
            "WITH marks AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase') "
            "SELECT e.event_id, m.ts AS last_purchase_ts "
            "FROM events e ASOF LEFT JOIN marks m ON e.user_id = m.user_id AND e.ts >= m.ts"
        ),
        "orders_profile": (
            # column profiler: per column, rows / nulls / exact distincts
            "SELECT col_name, CAST(n_rows AS BIGINT) AS n_rows, "
            "CAST(n_nulls AS BIGINT) AS n_nulls, "
            "CAST(n_distinct AS BIGINT) AS n_distinct FROM ("
            "SELECT 'o_orderkey' AS col_name, COUNT(*) AS n_rows, "
            "COUNT(*) - COUNT(o_orderkey) AS n_nulls, "
            "COUNT(DISTINCT o_orderkey) AS n_distinct FROM orders "
            "UNION ALL SELECT 'o_custkey', COUNT(*), "
            "COUNT(*) - COUNT(o_custkey), COUNT(DISTINCT o_custkey) FROM orders "
            "UNION ALL SELECT 'o_orderstatus', COUNT(*), "
            "COUNT(*) - COUNT(o_orderstatus), COUNT(DISTINCT o_orderstatus) "
            "FROM orders "
            "UNION ALL SELECT 'o_totalprice', COUNT(*), "
            "COUNT(*) - COUNT(o_totalprice), COUNT(DISTINCT o_totalprice) "
            "FROM orders "
            "UNION ALL SELECT 'o_orderdate', COUNT(*), "
            "COUNT(*) - COUNT(o_orderdate), COUNT(DISTINCT o_orderdate) "
            "FROM orders "
            "UNION ALL SELECT 'o_orderpriority', COUNT(*), "
            "COUNT(*) - COUNT(o_orderpriority), COUNT(DISTINCT o_orderpriority) "
            "FROM orders) ORDER BY col_name"
        ),
        "events_late_arrivals": (
            # watermark = max event time over STRICT arrival predecessors
            # (arrival order = event_id); late = lags the mark > 1 hour
            "WITH w AS (SELECT event_id, ts, MAX(ts) OVER ("
            "ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING "
            "AND 1 PRECEDING) AS wm FROM events), "
            "f AS (SELECT date_trunc('hour', ts) AS win, "
            "CASE WHEN wm IS NOT NULL AND "
            "date_diff('microsecond', ts, wm) > 3600000000 "
            "THEN 1 ELSE 0 END AS late FROM w) "
            "SELECT win, CAST(SUM(1 - late) AS BIGINT) AS n_ontime, "
            "CAST(SUM(late) AS BIGINT) AS n_late "
            "FROM f GROUP BY win ORDER BY win"
        ),
        "asof_next_click": (
            # forward as-of: DuckDB ASOF supports only the backward
            # inequality, so the oracle is the correlated MIN form
            "SELECT e.event_id, "
            "(SELECT MIN(c.ts) FROM events c WHERE c.user_id = e.user_id "
            "AND c.event_type = 'click' AND c.ts >= e.ts) AS next_click_ts "
            "FROM events e"
        ),
        "session_stats": (
            # dependent two-level session aggregate: open flags → session
            # ids → per-session sizes → per-user stats + exact active time
            "WITH l AS (SELECT user_id, ts, event_id, "
            "LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts "
            "FROM events), "
            "s AS (SELECT user_id, ts, event_id, pts, "
            "CASE WHEN pts IS NULL OR ts - pts > INTERVAL 30 MINUTE "
            "THEN 1 ELSE 0 END AS news FROM l), "
            "i AS (SELECT user_id, pts, ts, news, SUM(news) OVER ("
            "PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS UNBOUNDED PRECEDING) AS sid FROM s), "
            "c AS (SELECT user_id, sid, COUNT(*) AS n FROM i "
            "GROUP BY user_id, sid), "
            "a AS (SELECT user_id, SUM(CASE WHEN news = 0 THEN "
            "date_diff('microsecond', pts, ts) ELSE 0 END) AS active_us "
            "FROM i GROUP BY user_id) "
            "SELECT c.user_id, CAST(COUNT(*) AS BIGINT) AS n_sessions, "
            "CAST(MAX(n) AS BIGINT) AS max_session_events, "
            "CAST(a.active_us AS BIGINT) AS active_us "
            "FROM c JOIN a ON c.user_id = a.user_id "
            "GROUP BY c.user_id, a.active_us ORDER BY c.user_id"
        ),
        "sessionize": (
            "WITH t AS (SELECT user_id, event_id, CASE WHEN "
            "LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL "
            "OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) > INTERVAL 30 MINUTE "
            "THEN 1 ELSE 0 END AS new_s FROM events) "
            "SELECT user_id, CAST(SUM(new_s) AS BIGINT) AS n_sessions, "
            "COUNT(*) AS n_events FROM t GROUP BY user_id"
        ),
        "sessionize_salted": (
            "WITH t AS (SELECT user_id, event_id, CASE WHEN "
            "LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL "
            "OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) > INTERVAL 30 MINUTE "
            "THEN 1 ELSE 0 END AS new_s FROM events) "
            "SELECT user_id, CAST(SUM(new_s) AS BIGINT) AS n_sessions, "
            "COUNT(*) AS n_events FROM t GROUP BY user_id"
        ),
        "top_spender_events": (
            "SELECT event_id, user_id FROM events WHERE user_id IN ("
            "SELECT user_id FROM events WHERE event_type = 'purchase' GROUP BY user_id "
            "ORDER BY CAST(SUM(CAST(ROUND(value * 10000) AS BIGINT)) AS BIGINT) DESC, user_id ASC "
            "LIMIT 10)"
        ),
        "revenue_by_nation": (
            "SELECT n_name, COUNT(*) AS n_orders, "
            "CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_e2 "
            "FROM orders JOIN customer ON o_custkey = c_custkey "
            "JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name"
        ),
        "embeddings_by_label": (
            "SELECT label, COUNT(*) AS n_vecs FROM embeddings GROUP BY label"
        ),
        "supplier_nation_builtin": (
            "SELECT s_suppkey, s_name, n_name FROM supplier "
            "JOIN nation ON s_nationkey = n_nationkey"
        ),
        "events_lag_delta": (
            "SELECT event_id, user_id, "
            "COALESCE(epoch_us(ts) - LAG(epoch_us(ts)) OVER ("
            "PARTITION BY user_id ORDER BY ts, event_id), -1) AS delta_us "
            "FROM events"
        ),
        "events_lag_delta_salted": (
            "SELECT event_id, user_id, "
            "COALESCE(epoch_us(ts) - LAG(epoch_us(ts)) OVER ("
            "PARTITION BY user_id ORDER BY ts, event_id), -1) AS delta_us "
            "FROM events"
        ),
        "orders_monthly": (
            "SELECT date_trunc('month', o_orderdate) AS month, COUNT(*) AS n_orders, "
            "CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_e2 "
            "FROM orders GROUP BY date_trunc('month', o_orderdate)"
        ),
        "part_type_stats": (
            "SELECT string_split(p_type, ' ')[1] AS type_head, COUNT(*) AS n_parts, "
            "CAST(SUM(p_size) AS BIGINT) AS sum_size "
            "FROM part GROUP BY string_split(p_type, ' ')[1]"
        ),
        "customer_balance_buckets": (
            "SELECT bucket, COUNT(*) AS n_customers FROM ("
            "SELECT CASE WHEN c_acctbal < 0 THEN 'neg' "
            "WHEN c_acctbal < 2500 THEN 'low' "
            "WHEN c_acctbal < 5000 THEN 'mid' "
            "WHEN c_acctbal < 7500 THEN 'high' ELSE 'top' END AS bucket "
            "FROM customer) GROUP BY bucket"
        ),
        "doc_md5": (
            "SELECT doc_id, md5(text) AS md5_hex FROM documents"
        ),
        "events_range_join_count": (
            # range join: equality key (user) + half-open trailing window
            "SELECT e.event_id, e.user_id, ("
            "SELECT COUNT(*) FROM events p WHERE p.user_id = e.user_id "
            "AND p.ts >= e.ts - INTERVAL 1 HOUR AND p.ts < e.ts"
            ") AS n_prev_1h FROM events e"
        ),
        "events_moving_sum3": (
            # 3-row sliding window over half-up e2 integers: exact sum,
            # deterministic (ts, event_id) order
            "SELECT event_id, user_id, "
            "CAST(SUM(v) OVER (PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS msum_e2 "
            "FROM (SELECT event_id, user_id, ts, "
            "CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v FROM events)"
        ),
        "orders_rank_in_segment": (
            "SELECT c_mktsegment, o_orderkey, price_e2, rnk FROM ("
            "SELECT c.c_mktsegment, o.o_orderkey, "
            "CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT) AS price_e2, "
            "RANK() OVER (PARTITION BY c.c_mktsegment "
            "ORDER BY CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT) DESC) AS rnk "
            "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey) "
            "WHERE rnk <= 10"
        ),
        "doc_regex_count": (
            # RE2 on both sides (DuckDB regexp_* and pyarrow
            # count_substring_regex): identical match semantics
            "SELECT doc_id, n_the FROM ("
            "SELECT doc_id, CAST(len(regexp_extract_all(lower(text), "
            "'\\bthe\\b')) AS BIGINT) AS n_the FROM documents) WHERE n_the > 0"
        ),
        "nation_balance_stats": (
            # population variance from integer partial sums; final double
            # expression mirrors the Ray side term-for-term
            "SELECT c_nationkey, n_cust, sum_e2, "
            "CAST(FLOOR((CAST(sumsq AS DOUBLE) * n_cust - "
            "CAST(sum_e2 AS DOUBLE) * sum_e2) / "
            "(CAST(n_cust AS DOUBLE) * n_cust) + 0.5) AS BIGINT) AS var_e4 FROM ("
            "SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, "
            "COUNT(*) AS n_cust, "
            "CAST(SUM(v) AS BIGINT) AS sum_e2, CAST(SUM(v * v) AS BIGINT) AS sumsq "
            "FROM (SELECT c_nationkey, "
            "CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS v FROM customer) "
            "GROUP BY c_nationkey)"
        ),
        "topk_per_group": (
            "SELECT lang, doc_id, n_chars FROM ("
            "SELECT lang, doc_id, n_chars, ROW_NUMBER() OVER ("
            "PARTITION BY lang ORDER BY n_chars DESC, doc_id ASC) AS rn "
            "FROM documents) WHERE rn <= 3"
        ),
        "url_canonicalize": (
            "SELECT doc_id, "
            "'http://' || lower(source) || '.example/d/' || doc_id AS url_canon, "
            "'example,' || lower(source) || ')/d/' || doc_id AS surt, "
            "lower(source) || '.example' AS host "
            "FROM documents"
        ),
        "token_counts": (
            "SELECT doc_id, "
            "len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))::BIGINT AS n_tokens "
            "FROM documents"
        ),
        "text_quality": (
            "SELECT doc_id, LENGTH(text) AS n_chars_text, "
            "LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[.!?,;:]', '', 'g')) AS n_punct, "
            "len(list_filter(string_split_regex(lower(text), '\\s+'), "
            f"x -> x IN {_STOP_LIST}))::BIGINT AS n_stop "
            "FROM documents"
        ),
        "exact_dedup": (
            "WITH all_docs AS (SELECT doc_id, text FROM documents "
            "UNION ALL SELECT doc_id + 1000000, text FROM documents) "
            "SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies "
            "FROM all_docs GROUP BY text"
        ),
        "exact_substring_pairs": (
            # ground truth for the winnowing path: doc pairs sharing any
            # verbatim 30-char substring, via the stride-1 t-gram self-join
            "WITH g AS (SELECT doc_id, substring(text, CAST(i AS INT), 30) AS g "
            "FROM documents, UNNEST(range(1, length(text) - 30 + 2)) AS t(i)) "
            "SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b "
            "FROM g a JOIN g b ON a.g = b.g AND a.doc_id < b.doc_id "
            "ORDER BY doc_a, doc_b"
        ),
        "ngram_jaccard_pairs": (
            # rebuild the engine's word 3-shingles (words = [\w']+ on
            # lower(text), shingle = 3 consecutive words joined by ' ') and
            # compute exact Jaccard over DISTINCT shingles; docs with no
            # words produce no shingles and never pair (as in the pipeline)
            "WITH toks AS (SELECT doc_id, "
            "regexp_extract_all(lower(text), '[a-z0-9_'']+') AS w FROM documents), "
            "sh AS (SELECT doc_id, CASE "
            "WHEN len(w) < 3 THEN [array_to_string(w, ' ')] "
            "ELSE list_distinct(list_transform(range(1, len(w) - 1), "
            "i -> array_to_string(w[i:i+2], ' '))) END AS s "
            "FROM toks WHERE len(w) > 0) "
            "SELECT a, b, jaccard_e4 FROM ("
            "SELECT x.doc_id AS a, y.doc_id AS b, "
            "CAST(FLOOR(len(list_intersect(x.s, y.s)) * 10000.0 / "
            "(len(x.s) + len(y.s) - len(list_intersect(x.s, y.s))) + 0.5) AS BIGINT) "
            "AS jaccard_e4 "
            "FROM sh x JOIN sh y ON x.doc_id < y.doc_id "
            "WHERE len(list_intersect(x.s, y.s)) > 0) "
            "WHERE jaccard_e4 >= 4000"
        ),
        "ngram_containment_pairs": (
            # same word 3-shingles; containment = shared / min set size
            "WITH toks AS (SELECT doc_id, "
            "regexp_extract_all(lower(text), '[a-z0-9_'']+') AS w FROM documents), "
            "sh AS (SELECT doc_id, CASE "
            "WHEN len(w) < 3 THEN [array_to_string(w, ' ')] "
            "ELSE list_distinct(list_transform(range(1, len(w) - 1), "
            "i -> array_to_string(w[i:i+2], ' '))) END AS s "
            "FROM toks WHERE len(w) > 0) "
            "SELECT a, b, containment_e4 FROM ("
            "SELECT x.doc_id AS a, y.doc_id AS b, "
            "CAST(FLOOR(len(list_intersect(x.s, y.s)) * 10000.0 / "
            "LEAST(len(x.s), len(y.s)) + 0.5) AS BIGINT) "
            "AS containment_e4 "
            "FROM sh x JOIN sh y ON x.doc_id < y.doc_id "
            "WHERE len(list_intersect(x.s, y.s)) > 0) "
            "WHERE containment_e4 >= 8000"
        ),
        "events_trailing_3d_max": (
            # RANGE-frame extremum (prefix sums can't); peers in-frame
            "SELECT event_id, user_id, "
            "CAST(MAX(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) OVER ("
            "PARTITION BY user_id ORDER BY ts "
            "RANGE BETWEEN INTERVAL 3 DAY PRECEDING AND CURRENT ROW) AS BIGINT) "
            "AS tmax_e2 FROM events ORDER BY event_id"
        ),
        "user_event_pattern_counts": (
            # MATCH_RECOGNIZE-lite: regex over the time-ordered
            # event-initial string; same pattern both sides
            "WITH s AS (SELECT user_id, "
            "string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS seq "
            "FROM events GROUP BY user_id) "
            "SELECT user_id, CAST(len(regexp_extract_all(seq, 'v+c+p')) AS BIGINT) "
            "AS n_funnels FROM s ORDER BY user_id"
        ),
        "purchase_click_days_bag": (
            # INTERSECT ALL (bag): min(multiplicity) copies survive;
            # grouped to counts so the compare is row-stable
            "SELECT user_id, day, COUNT(*)::BIGINT AS n FROM ("
            "SELECT user_id, date_trunc('day', ts) AS day FROM events "
            "WHERE event_type = 'purchase' "
            "INTERSECT ALL "
            "SELECT user_id, date_trunc('day', ts) AS day FROM events "
            "WHERE event_type = 'click') "
            "GROUP BY user_id, day ORDER BY user_id, day"
        ),
        "source_dup_factor": (
            # duplication inflation: docs vs distinct md5 texts
            "SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs, "
            "CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_distinct, "
            "CAST(FLOOR(COUNT(*) * 1e6 / COUNT(DISTINCT md5(text)) + 0.5) "
            "AS BIGINT) AS dup_ratio_e6 "
            "FROM documents GROUP BY source ORDER BY source"
        ),
        "orders_scd2": (
            # SCD2 validity intervals of o_orderpriority per customer
            "WITH w AS (SELECT o_custkey, o_orderkey, o_orderpriority, "
            "CAST(FLOOR(EPOCH(o_orderdate) / 86400) AS BIGINT) AS d, "
            "LAG(o_orderpriority) OVER (PARTITION BY o_custkey "
            "ORDER BY o_orderdate, o_orderkey) AS prev FROM orders), "
            "c AS (SELECT o_custkey, o_orderkey, o_orderpriority, d FROM w "
            "WHERE prev IS NULL OR prev <> o_orderpriority) "
            "SELECT o_custkey AS custkey, o_orderpriority AS priority, "
            "d AS valid_from, "
            "COALESCE(LEAD(d) OVER (PARTITION BY o_custkey "
            "ORDER BY d, o_orderkey), 9999999) AS valid_to, "
            "CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey "
            "ORDER BY d, o_orderkey) AS BIGINT) AS version "
            "FROM c ORDER BY custkey, version"
        ),
        "orders_pit_join": (
            # point-in-time join: lineitem at SHIP date vs the SCD2
            # customer-priority version valid at that day
            "WITH w AS (SELECT o_custkey, o_orderkey, o_orderpriority, "
            "CAST(FLOOR(EPOCH(o_orderdate) / 86400) AS BIGINT) AS d, "
            "LAG(o_orderpriority) OVER (PARTITION BY o_custkey "
            "ORDER BY o_orderdate, o_orderkey) AS prev FROM orders), "
            "c AS (SELECT o_custkey, o_orderkey, o_orderpriority, d FROM w "
            "WHERE prev IS NULL OR prev <> o_orderpriority), "
            "v AS (SELECT o_custkey AS custkey, o_orderpriority AS priority, "
            "d AS valid_from, "
            "COALESCE(LEAD(d) OVER (PARTITION BY o_custkey "
            "ORDER BY d, o_orderkey), 9999999) AS valid_to, "
            "CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey "
            "ORDER BY d, o_orderkey) AS BIGINT) AS version FROM c), "
            "f AS (SELECT o.o_custkey AS custkey, "
            "CAST(FLOOR(EPOCH(l.l_shipdate) / 86400) AS BIGINT) AS shipday, "
            "CAST(FLOOR(l.l_quantity * 100 + 0.5) AS BIGINT) AS q "
            "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey) "
            "SELECT v.priority, v.version, "
            "CAST(COUNT(*) AS BIGINT) AS n_items, "
            "CAST(SUM(f.q) AS BIGINT) AS sum_qty_e2 "
            "FROM f JOIN v ON f.custkey = v.custkey "
            "AND f.shipday >= v.valid_from AND f.shipday < v.valid_to "
            "GROUP BY v.priority, v.version ORDER BY priority, version"
        ),
        "part_name_similarity_join": (
            # exact Levenshtein-threshold join over distinct names
            "WITH n AS (SELECT DISTINCT p_name FROM part) "
            "SELECT a.p_name AS name_a, b.p_name AS name_b, "
            "CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist "
            "FROM n a JOIN n b ON a.p_name < b.p_name "
            "AND levenshtein(a.p_name, b.p_name) <= 2 "
            "ORDER BY name_a, name_b"
        ),
        "orders_theilsen_trend": (
            # Theil-Sen: median pairwise slope of daily revenue
            "WITH d AS (SELECT CAST(FLOOR(EPOCH(o_orderdate) / 86400) "
            "AS BIGINT) AS day, CAST(SUM(CAST(FLOOR(o_totalprice * 100 "
            "+ 0.5) AS BIGINT)) AS BIGINT) AS rev_e2 "
            "FROM orders GROUP BY 1), "
            "s AS (SELECT (b.rev_e2 - a.rev_e2) "
            "/ CAST(b.day - a.day AS DOUBLE) AS sl "
            "FROM d a JOIN d b ON a.day < b.day), "
            "m AS (SELECT CAST(FLOOR(COALESCE(MEDIAN(sl), 0.0) * 1e6 "
            "+ 0.5) AS BIGINT) AS slope_e6 FROM s), "
            "i AS (SELECT CAST(FLOOR(COALESCE(MEDIAN(d.rev_e2 "
            "- (m.slope_e6 / 1e6) * d.day), 0.0) + 0.5) AS BIGINT) "
            "AS icept_e2 FROM d, m GROUP BY ALL) "
            "SELECT CAST((SELECT COUNT(*) FROM d) AS BIGINT) AS n_days, "
            "m.slope_e6, i.icept_e2 FROM m, i"
        ),
        "purchase_shapley_attribution": _shapley_oracle_sql(),
        "part_fd_discovery": _fd_oracle_sql(),
        "vocab_richness": (
            # Chao1 bias-corrected species richness per source
            "WITH t AS (SELECT source, t AS token, COUNT(*) AS n FROM ("
            "SELECT source, unnest(string_split(text, ' ')) AS t "
            "FROM documents) WHERE t <> '' GROUP BY source, t) "
            "SELECT source, CAST(COUNT(*) AS BIGINT) AS v, "
            "CAST(SUM(n) AS BIGINT) AS n_tokens, "
            "CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1, "
            "CAST(SUM(CASE WHEN n = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2, "
            "CAST(FLOOR((COUNT(*) + CAST(SUM(CASE WHEN n = 1 THEN 1 "
            "ELSE 0 END) AS DOUBLE) * (SUM(CASE WHEN n = 1 THEN 1 ELSE 0 "
            "END) - 1) / (2.0 * (SUM(CASE WHEN n = 2 THEN 1 ELSE 0 END) "
            "+ 1))) * 1e6 + 0.5) AS BIGINT) AS chao1_e6 "
            "FROM t GROUP BY source ORDER BY source"
        ),
        "referential_integrity_audit": (
            # orphan FK counts across the star schema
            "SELECT fk, n_rows, n_orphans FROM ("
            "SELECT 'lineitem->orders' AS fk, COUNT(*) AS n_rows, "
            "CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_orphans FROM lineitem l "
            "LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey "
            "UNION ALL "
            "SELECT 'orders->customer', COUNT(*), "
            "CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) "
            "AS BIGINT) FROM orders o "
            "LEFT JOIN customer c ON o.o_custkey = c.c_custkey "
            "UNION ALL "
            "SELECT 'customer->nation', COUNT(*), "
            "CAST(SUM(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END) "
            "AS BIGINT) FROM customer c "
            "LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey"
            ") ORDER BY fk"
        ),
        "orders_benford": (
            # first-significant-digit census of o_totalprice
            "WITH d AS (SELECT CAST(FLOOR(o_totalprice / POWER(10, "
            "FLOOR(LOG10(o_totalprice)))) AS BIGINT) AS digit FROM orders "
            "WHERE o_totalprice > 0), "
            "g AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY digit), "
            "t AS (SELECT SUM(n) AS total FROM g) "
            "SELECT digit, CAST(n AS BIGINT) AS n, "
            "CAST(FLOOR(n * 1e6 / total + 0.5) AS BIGINT) AS pct_e6 "
            "FROM g, t WHERE n > 0 ORDER BY digit"
        ),
        "source_stats_incremental": (
            # IVM merge-on-read must equal the plain aggregate
            "SELECT source, COUNT(*) AS n_docs, "
            "CAST(SUM(n_chars) AS BIGINT) AS sum_chars, "
            "ROUND(SUM(n_chars) * 1.0 / COUNT(*), 6) AS avg_chars "
            "FROM documents GROUP BY source ORDER BY source"
        ),
        "split_contamination": (
            # word 8-grams; every ordered split pair sharing a gram
            # counts the later split's distinct contaminated docs
            "WITH toks AS (SELECT doc_id, "
            "list_filter(string_split(text, ' '), x -> x <> '') AS w "
            "FROM documents), "
            "g AS (SELECT doc_id, unnest(list_transform(range(1, len(w) - 6), "
            "i -> array_to_string(w[i:i+7], ' '))) AS gram FROM toks "
            "WHERE len(w) >= 8), "
            "s AS (SELECT doc_id, CASE WHEN b <= 7 THEN 0 WHEN b = 8 THEN 1 "
            "ELSE 2 END AS r FROM (SELECT doc_id, "
            "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)) "
            "AS INTEGER) % 10 AS b FROM documents)), "
            "gs AS (SELECT DISTINCT g.gram, s.r, g.doc_id FROM g "
            "JOIN s USING (doc_id)), "
            "w AS (SELECT DISTINCT a.r AS ra, b.r AS rb, b.doc_id AS d "
            "FROM gs a JOIN gs b ON a.gram = b.gram AND a.r < b.r) "
            "SELECT CASE ra WHEN 0 THEN 'train' WHEN 1 THEN 'val' "
            "ELSE 'test' END AS from_split, "
            "CASE rb WHEN 1 THEN 'val' ELSE 'test' END AS to_split, "
            "CAST(COUNT(*) AS BIGINT) AS n_contaminated FROM w "
            "GROUP BY ra, rb ORDER BY from_split, to_split"
        ),
        "events_ks_test": (
            # KS numerator via cross-multiplied cumulative counts — the
            # whole statistic is integer until the final e6 ratio
            "WITH x AS (SELECT CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v, "
            "CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_a "
            "FROM events WHERE event_type IN ('click', 'purchase')), "
            "g AS (SELECT v, SUM(is_a) AS a, SUM(1 - is_a) AS b FROM x "
            "GROUP BY v), "
            "c AS (SELECT v, SUM(a) OVER (ORDER BY v) AS ca, "
            "SUM(b) OVER (ORDER BY v) AS cb FROM g), "
            "t AS (SELECT SUM(a) AS na, SUM(b) AS nb FROM g) "
            "SELECT CAST(t.na AS BIGINT) AS n_click, "
            "CAST(t.nb AS BIGINT) AS n_purchase, "
            "CAST(MAX(ABS(c.ca * t.nb - c.cb * t.na)) AS BIGINT) AS d_num, "
            "CAST(FLOOR(CAST(MAX(ABS(c.ca * t.nb - c.cb * t.na)) AS DOUBLE) "
            "* 1e6 / (t.na * t.nb) + 0.5) AS BIGINT) AS ks_e6 "
            "FROM c, t GROUP BY t.na, t.nb"
        ),
        "doc_clean_md5": (
            # byte-identical normalization: NFC → lower → \s+ → ' ' → trim
            "SELECT doc_id, md5(trim(regexp_replace(lower(nfc_normalize(text)), "
            "'\\s+', ' ', 'g'))) AS clean_md5 FROM documents ORDER BY doc_id"
        ),
        "purchase_attribution": (
            # bounded-lookback as-of: click within [ts - 7d, ts) → attributed
            "WITH p AS (SELECT user_id, ts, date_trunc('day', ts) AS day "
            "FROM events WHERE event_type = 'purchase'), "
            "c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'), "
            "f AS (SELECT day, CASE WHEN EXISTS (SELECT 1 FROM c "
            "WHERE c.user_id = p.user_id AND c.ts >= p.ts - INTERVAL 7 DAY "
            "AND c.ts < p.ts) THEN 1 ELSE 0 END AS a FROM p) "
            "SELECT day, CAST(SUM(a) AS BIGINT) AS n_attributed, "
            "CAST(SUM(1 - a) AS BIGINT) AS n_organic "
            "FROM f GROUP BY day ORDER BY day"
        ),
        "nation_share_of_region": (
            # ratio-to-parent: nation revenue over its region total
            "WITH nr AS (SELECT r.r_name, n.n_name, "
            "SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS revenue_e2 "
            "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey "
            "JOIN nation n ON c.c_nationkey = n.n_nationkey "
            "JOIN region r ON n.n_regionkey = r.r_regionkey "
            "GROUP BY r.r_name, n.n_name) "
            "SELECT r_name, n_name, CAST(revenue_e2 AS BIGINT) AS revenue_e2, "
            "CAST(FLOOR(CAST(revenue_e2 AS DOUBLE) * 1e6 / "
            "SUM(CAST(revenue_e2 AS DOUBLE)) OVER (PARTITION BY r_name) + 0.5) "
            "AS BIGINT) AS share_e6 FROM nr ORDER BY r_name, n_name"
        ),
        "orders_digest": (
            # commutative md5-prefix sum over the canonical row string
            "SELECT CAST(COUNT(*) AS BIGINT) AS n_rows, "
            "CAST(SUM(CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) "
            "|| '|' || o_orderstatus || '|' || o_orderpriority), 1, 8)) "
            "AS BIGINT)) AS BIGINT) AS digest FROM orders"
        ),
        "events_hash_sample": (
            # deterministic ~10% Bernoulli gate, same md5-first-byte rule
            # as split_bucket / doc_split_assign
            "SELECT event_id, user_id, event_type FROM events "
            "WHERE CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 2)) "
            "AS INT) % 10 = 0 ORDER BY event_id"
        ),
        "nation_region_cross": (
            "SELECT n_name, r_name, "
            "CAST(n.n_regionkey = r.r_regionkey AS BIGINT) AS is_home "
            "FROM nation n CROSS JOIN region r ORDER BY n_name, r_name"
        ),
        "user_activity_gini": (
            # Gini over per-user counts; rank order within count ties is
            # irrelevant to SUM(i*n), so both sides are order-free
            "WITH c AS (SELECT user_id, COUNT(*) AS n FROM events "
            "GROUP BY user_id), "
            "r AS (SELECT n, ROW_NUMBER() OVER (ORDER BY n, user_id) AS i, "
            "COUNT(*) OVER () AS k, SUM(n) OVER () AS s FROM c) "
            "SELECT CAST(k AS BIGINT) AS n_users, CAST(s AS BIGINT) AS n_events, "
            "CAST(FLOOR((2.0 * SUM(i * n) / (k * s) - (k + 1.0) / k) * 1e6 "
            "+ 0.5) AS BIGINT) AS gini_e6 FROM r GROUP BY k, s"
        ),
        "events_time_weighted_avg": (
            # value held until the user's next event; whole seconds via
            # integer floor division on epoch microseconds both sides
            "WITH s AS (SELECT user_id, "
            "CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v, "
            "epoch_us(ts) AS us, LEAD(epoch_us(ts)) OVER ("
            "PARTITION BY user_id ORDER BY ts, event_id) AS nxt FROM events), "
            "w AS (SELECT user_id, v * ((nxt - us) // 1000000) AS wv, "
            "(nxt - us) // 1000000 AS dt FROM s WHERE nxt IS NOT NULL), "
            "a AS (SELECT user_id, SUM(wv) AS sw, SUM(dt) AS sd FROM w "
            "GROUP BY user_id) "
            "SELECT user_id, CAST(sd AS BIGINT) AS held_s, "
            "CAST(FLOOR(CAST(sw AS DOUBLE) * 10000 / sd + 0.5) AS BIGINT) "
            "AS twa_e6 FROM a WHERE sd > 0 ORDER BY user_id"
        ),
        "events_global_rank": (
            # global dense rank over the e2 value domain
            "SELECT event_id, CAST(DENSE_RANK() OVER (ORDER BY "
            "CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rnk "
            "FROM events ORDER BY event_id"
        ),
        "docs_matching_all_terms": (
            # conjunctive boolean retrieval over whitespace tokens
            "SELECT doc_id FROM documents WHERE "
            "list_has_all(string_split(text, ' '), "
            "['data', 'spark', 'merge']) ORDER BY doc_id"
        ),
        "events_trimmed_mean": (
            # 10%-per-tail trimmed mean; k = n // 10 integer both sides,
            # ties at the cut are value-identical so which copies drop
            # doesn't change the sum
            "WITH x AS (SELECT event_type, "
            "CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v FROM events), "
            "r AS (SELECT event_type, v, ROW_NUMBER() OVER ("
            "PARTITION BY event_type ORDER BY v) AS rn, "
            "COUNT(*) OVER (PARTITION BY event_type) AS n FROM x), "
            "t AS (SELECT event_type, n, n // 10 AS k, "
            "SUM(CASE WHEN rn > n // 10 AND rn <= n - n // 10 "
            "THEN v ELSE 0 END) AS s FROM r GROUP BY event_type, n) "
            "SELECT event_type, CAST(n - 2 * k AS BIGINT) AS n_kept, "
            "CAST(s AS BIGINT) AS trimmed_sum_e2, "
            "CAST(FLOOR(CAST(s AS DOUBLE) * 10000 / (n - 2 * k) + 0.5) "
            "AS BIGINT) AS trimmed_mean_e6 FROM t ORDER BY event_type"
        ),
        "contacts_union_by_name": (
            # union-by-name with null fill for the absent column
            "SELECT name, acctbal_e2, segment, kind FROM ("
            "SELECT c_name AS name, "
            "CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS acctbal_e2, "
            "c_mktsegment AS segment, 'customer' AS kind FROM customer "
            "UNION ALL SELECT s_name, "
            "CAST(FLOOR(s_acctbal * 100 + 0.5) AS BIGINT), "
            "NULL, 'supplier' FROM supplier) ORDER BY kind, name"
        ),
        "orders_diff": (
            # rebuild the deterministic v2 snapshot and classify keys
            "WITH v1 AS (SELECT o_orderkey, "
            "CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS p FROM orders), "
            "v2 AS (SELECT o_orderkey, "
            "CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) + "
            "CASE WHEN o_orderpriority = '1-URGENT' THEN 100 ELSE 0 END AS p "
            "FROM orders WHERE o_orderkey % 97 <> 0 "
            "UNION ALL SELECT o_orderkey + 1000000000, "
            "CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) FROM orders "
            "WHERE o_orderkey % 101 = 0), "
            "j AS (SELECT v1.p AS p1, v2.p AS p2 FROM v1 "
            "FULL OUTER JOIN v2 ON v1.o_orderkey = v2.o_orderkey) "
            "SELECT status, CAST(COUNT(*) AS BIGINT) AS n FROM ("
            "SELECT CASE WHEN p1 IS NULL THEN 'added' "
            "WHEN p2 IS NULL THEN 'removed' "
            "WHEN p1 <> p2 THEN 'changed' ELSE 'same' END AS status FROM j) "
            "GROUP BY status ORDER BY status"
        ),
        "purchase_click_days_except": (
            # EXCEPT ALL (bag): max(0, n_left - n_right) copies survive
            "SELECT user_id, day, COUNT(*)::BIGINT AS n FROM ("
            "SELECT user_id, date_trunc('day', ts) AS day FROM events "
            "WHERE event_type = 'purchase' "
            "EXCEPT ALL "
            "SELECT user_id, date_trunc('day', ts) AS day FROM events "
            "WHERE event_type = 'click') "
            "GROUP BY user_id, day ORDER BY user_id, day"
        ),
        "event_transition_matrix": (
            # categorical LAG: consecutive-pair transition counts
            "WITH s AS (SELECT user_id, event_type, "
            "LAG(event_type) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id) AS from_type FROM events) "
            "SELECT from_type, event_type AS to_type, "
            "CAST(COUNT(*) AS BIGINT) AS n FROM s "
            "WHERE from_type IS NOT NULL "
            "GROUP BY from_type, to_type ORDER BY from_type, to_type"
        ),
        "part_pareto": (
            # skyline: no row <= on price and >= on size with one strict
            "SELECT p_partkey, "
            "CAST(FLOOR(p_retailprice * 100 + 0.5) AS BIGINT) AS price_e2, "
            "CAST(p_size AS BIGINT) AS p_size FROM part p "
            "WHERE NOT EXISTS (SELECT 1 FROM part q "
            "WHERE q.p_retailprice <= p.p_retailprice "
            "AND q.p_size >= p.p_size "
            "AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)) "
            "ORDER BY p_partkey"
        ),
        "events_percentile_cont": (
            # interpolated quantiles at q in {.25,.75}: 4*result is an
            # exact integer ((n-1)*q has fractional part in {0,.25,.5,.75})
            "SELECT event_type, COUNT(*) AS n, "
            "CAST(FLOOR(quantile_cont(v, 0.25) * 4 + 0.5) AS BIGINT) AS p25_e2x4, "
            "CAST(FLOOR(quantile_cont(v, 0.75) * 4 + 0.5) AS BIGINT) AS p75_e2x4 "
            "FROM (SELECT event_type, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v "
            "FROM events) GROUP BY event_type"
        ),
        "segment_event_mutual_info": (
            # mutual information (nats); e6 half-up with the SAME float
            # expression on both sides
            "WITH j AS (SELECT c_mktsegment AS seg, event_type AS et "
            "FROM events JOIN customer ON user_id = c_custkey), "
            "c AS (SELECT seg, et, COUNT(*)::DOUBLE AS o FROM j GROUP BY seg, et), "
            "r AS (SELECT seg, SUM(o) AS rt FROM c GROUP BY seg), "
            "k AS (SELECT et, SUM(o) AS ct FROM c GROUP BY et), "
            "n AS (SELECT SUM(o) AS n FROM c) "
            "SELECT CAST(COUNT(*) AS BIGINT) AS n_cells, "
            "CAST(FLOOR(SUM((c.o / n.n) * ln(c.o * n.n / (r.rt * k.ct))) "
            "* 1e6 + 0.5) AS BIGINT) AS mi_e6 "
            "FROM c JOIN r USING (seg) JOIN k USING (et) CROSS JOIN n"
        ),
        "segment_event_chi2": (
            # chi-square independence statistic; e6 half-up with the SAME
            # float expression on both sides
            "WITH j AS (SELECT c_mktsegment AS seg, event_type AS et "
            "FROM events JOIN customer ON user_id = c_custkey), "
            "c AS (SELECT seg, et, COUNT(*)::DOUBLE AS o FROM j GROUP BY seg, et), "
            "r AS (SELECT seg, SUM(o) AS rt FROM c GROUP BY seg), "
            "k AS (SELECT et, SUM(o) AS ct FROM c GROUP BY et), "
            "n AS (SELECT SUM(o) AS n FROM c) "
            "SELECT CAST(COUNT(*) AS BIGINT) AS n_cells, "
            "CAST((SELECT COUNT(*) FROM r) - 1 AS BIGINT) * "
            "CAST((SELECT COUNT(*) FROM k) - 1 AS BIGINT) AS dof, "
            "CAST(FLOOR(SUM(POWER(c.o - r.rt * k.ct / n.n, 2) / "
            "(r.rt * k.ct / n.n)) * 1e6 + 0.5) AS BIGINT) AS chi2_e6 "
            "FROM c JOIN r USING (seg) JOIN k USING (et) CROSS JOIN n"
        ),
        "users_weekly_purchasers": (
            # relational division: purchased in EVERY purchase week
            "SELECT user_id FROM (SELECT DISTINCT user_id, "
            "date_trunc('week', ts) AS w FROM events "
            "WHERE event_type = 'purchase') GROUP BY user_id "
            "HAVING COUNT(*) = (SELECT COUNT(DISTINCT date_trunc('week', ts)) "
            "FROM events WHERE event_type = 'purchase') ORDER BY user_id"
        ),
        "orders_yoy_growth": (
            # LAG over an aggregated series; the first year (no
            # predecessor) is excluded on both sides
            "SELECT year, rev_e2, delta_e2 FROM ("
            "WITH y AS (SELECT CAST(strftime(o_orderdate, '%Y') AS BIGINT) AS year, "
            "CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_e2 "
            "FROM orders GROUP BY 1) "
            "SELECT year, rev_e2, rev_e2 - LAG(rev_e2) OVER (ORDER BY year) AS delta_e2 "
            "FROM y) WHERE delta_e2 IS NOT NULL ORDER BY year"
        ),
        "source_lang_entropy": (
            # Shannon entropy of each source's language mix; e6 half-up
            # with the SAME float expression on both sides
            "WITH c AS (SELECT source, lang, COUNT(*)::BIGINT AS n "
            "FROM documents GROUP BY source, lang), "
            "t AS (SELECT source, SUM(n)::BIGINT AS tot FROM c GROUP BY source) "
            "SELECT c.source, CAST(COUNT(*) AS BIGINT) AS n_langs, "
            "CAST(FLOOR(-SUM((c.n * 1.0 / t.tot) * LN(c.n * 1.0 / t.tot)) "
            "* 1e6 + 0.5) AS BIGINT) AS entropy_e6 "
            "FROM c JOIN t USING (source) GROUP BY c.source ORDER BY c.source"
        ),
        "events_segment_skew_join": (
            # the hot/cold split is invisible in the answer — the plain
            # join + aggregate is an exact oracle for the skew strategy
            "SELECT c_mktsegment, event_type, COUNT(*) AS n, "
            "CAST(SUM(CAST(ROUND(value * 10000) AS BIGINT)) AS BIGINT) AS value_e4 "
            "FROM events JOIN customer ON user_id = c_custkey "
            "GROUP BY c_mktsegment, event_type ORDER BY c_mktsegment, event_type"
        ),
        "active_users_7d": (
            # trailing-7-day distinct users per (event_type, day); only
            # observed days emit (the Ray side filters on the same spine)
            "WITH ud AS (SELECT DISTINCT event_type, user_id, "
            "date_trunc('day', ts) AS day FROM events), "
            "spine AS (SELECT DISTINCT day FROM ud), "
            "vis AS (SELECT DISTINCT u.event_type, u.user_id, s.day "
            "FROM ud u JOIN spine s ON s.day BETWEEN u.day "
            "AND u.day + INTERVAL 6 DAY) "
            "SELECT event_type, day, COUNT(*)::BIGINT AS n_active "
            "FROM vis GROUP BY event_type, day ORDER BY event_type, day"
        ),
        "events_trailing_3d": (
            # time-RANGE frame: equal-ts rows are peers on both sides
            "SELECT event_id, user_id, "
            "CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) OVER ("
            "PARTITION BY user_id ORDER BY ts "
            "RANGE BETWEEN INTERVAL 3 DAY PRECEDING AND CURRENT ROW) AS BIGINT) "
            "AS trail_e2 FROM events ORDER BY event_id"
        ),
        "dup_clusters": (
            # same pair semantics as ngram_jaccard_pairs, then connected
            # components as min-reachable-id (recursive CTE); every doc
            # labeled, keep=1 on each cluster's canonical (min-id) member
            "WITH RECURSIVE toks AS (SELECT doc_id, "
            "regexp_extract_all(lower(text), '[a-z0-9_'']+') AS w FROM documents), "
            "sh AS (SELECT doc_id, CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')] "
            "ELSE list_distinct(list_transform(range(1, len(w) - 1), "
            "i -> array_to_string(w[i:i+2], ' '))) END AS s FROM toks WHERE len(w) > 0), "
            "pairs AS (SELECT a, b FROM ("
            "SELECT x.doc_id AS a, y.doc_id AS b, "
            "CAST(FLOOR(len(list_intersect(x.s, y.s)) * 10000.0 / "
            "(len(x.s) + len(y.s) - len(list_intersect(x.s, y.s))) + 0.5) AS BIGINT) AS j "
            "FROM sh x JOIN sh y ON x.doc_id < y.doc_id "
            "WHERE len(list_intersect(x.s, y.s)) > 0) WHERE j >= 4000), "
            "edges AS (SELECT a, b FROM pairs UNION SELECT b AS a, a AS b FROM pairs), "
            "reach AS (SELECT doc_id, doc_id AS r FROM documents "
            "UNION SELECT e.b AS doc_id, reach.r FROM reach JOIN edges e ON e.a = reach.doc_id) "
            "SELECT doc_id, MIN(r) AS cluster_id, "
            "CAST(CASE WHEN doc_id = MIN(r) THEN 1 ELSE 0 END AS BIGINT) AS keep "
            "FROM reach GROUP BY doc_id ORDER BY doc_id"
        ),
        "embedding_dups": (
            "SELECT a, b, cosine_e6 FROM ("
            "SELECT x.vec_id AS a, y.vec_id AS b, "
            "CAST(ROUND(list_cosine_similarity(CAST(x.embedding AS DOUBLE[]), "
            "CAST(y.embedding AS DOUBLE[])) * 1000000) AS BIGINT) AS cosine_e6 "
            "FROM embeddings x JOIN embeddings y ON x.vec_id < y.vec_id) "
            "WHERE cosine_e6 >= 500000"
        ),
        "ann_cosine_topk": (
            "WITH q AS ("
            "SELECT 0 AS query_idx, (SELECT embedding FROM embeddings WHERE vec_id = 0) AS qe "
            "UNION ALL SELECT 1, (SELECT embedding FROM embeddings WHERE vec_id = 1) "
            "UNION ALL SELECT 2, (SELECT embedding FROM embeddings WHERE vec_id = 2)) "
            "SELECT query_idx, vec_id, CAST(ROUND(cosine * 1000000) AS BIGINT) AS cosine_e6 FROM ("
            "SELECT q.query_idx, e.vec_id, "
            "list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q.qe AS DOUBLE[])) AS cosine, "
            "ROW_NUMBER() OVER (PARTITION BY q.query_idx ORDER BY "
            "list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q.qe AS DOUBLE[])) DESC, e.vec_id ASC) AS rn "
            "FROM embeddings e CROSS JOIN q) WHERE rn <= 10"
        ),
        "cohort_ltv": (
            # first-order-month cohorts x months-since-first LTV curve
            "WITH f AS (SELECT o_custkey, MIN(EXTRACT(year FROM o_orderdate) * 12 "
            "+ EXTRACT(month FROM o_orderdate) - 1) AS cm FROM orders GROUP BY 1), "
            "o AS (SELECT o.o_custkey, f.cm, "
            "(EXTRACT(year FROM o.o_orderdate) * 12 "
            "+ EXTRACT(month FROM o.o_orderdate) - 1) - f.cm AS age, "
            "CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT) AS r "
            "FROM orders o JOIN f ON f.o_custkey = o.o_custkey), "
            "c AS (SELECT CAST((cm // 12) * 100 + (cm % 12) + 1 AS BIGINT) AS cohort_ym, "
            "CAST(age AS BIGINT) AS age_months, "
            "CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS active_customers, "
            "CAST(SUM(r) AS BIGINT) AS revenue_e2 FROM o GROUP BY 1, 2) "
            "SELECT cohort_ym, age_months, active_customers, revenue_e2, "
            "CAST(SUM(revenue_e2) OVER (PARTITION BY cohort_ym ORDER BY age_months "
            "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_revenue_e2 "
            "FROM c ORDER BY cohort_ym, age_months"
        ),
        "orders_grouping_sets": (
            "SELECT o_orderstatus, o_orderpriority, "
            "CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS grouping_id, "
            "CAST(COUNT(*) AS BIGINT) AS n_orders, "
            "CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) "
            "AS revenue_e2 FROM orders "
            "GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ()) "
            "ORDER BY grouping_id, o_orderstatus, o_orderpriority"
        ),
        "doc_ngram_novelty": (
            # fraction of a doc's distinct word 3-grams first seen in it
            # (tokens = text split on ' ', empties dropped, as in the engine)
            "WITH toks AS (SELECT doc_id, "
            "list_filter(string_split(text, ' '), x -> x <> '') AS w FROM documents), "
            "sh AS (SELECT doc_id, list_distinct(list_transform("
            "range(1, len(w) - 1), i -> array_to_string(w[i:i+2], ' '))) AS s "
            "FROM toks WHERE len(w) >= 3), "
            "gr AS (SELECT doc_id, unnest(s) AS g FROM sh), "
            "fm AS (SELECT g, MIN(doc_id) AS fd FROM gr GROUP BY g) "
            "SELECT gr.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams, "
            "CAST(SUM(CASE WHEN fm.fd = gr.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS novel, "
            "CAST(FLOOR(SUM(CASE WHEN fm.fd = gr.doc_id THEN 1 ELSE 0 END) * 1e6 "
            "/ COUNT(*) + 0.5) AS BIGINT) AS novelty_e6 "
            "FROM gr JOIN fm USING(g) GROUP BY gr.doc_id ORDER BY doc_id"
        ),
        "sequential_pattern_support": (
            # users whose first occurrence of type a precedes first of b
            "WITH f AS (SELECT user_id, event_type, MIN(ts) AS t0 "
            "FROM events GROUP BY 1, 2) "
            "SELECT a.event_type AS etype_a, b.event_type AS etype_b, "
            "CAST(COUNT(*) AS BIGINT) AS support FROM f a "
            "JOIN f b ON a.user_id = b.user_id AND a.t0 < b.t0 "
            "GROUP BY 1, 2 ORDER BY 1, 2"
        ),
        "events_dow_seasonality": (
            # weekday mean value relative to the type's overall mean
            "WITH e AS (SELECT event_type, CAST(dayofweek(ts) AS BIGINT) AS dow, "
            "CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v_e2 FROM events), "
            "d AS (SELECT event_type, dow, CAST(SUM(v_e2) AS BIGINT) AS s, "
            "CAST(COUNT(*) AS BIGINT) AS n FROM e GROUP BY 1, 2), "
            "t AS (SELECT event_type, CAST(SUM(s) AS BIGINT) AS st, "
            "CAST(SUM(n) AS BIGINT) AS nt FROM d GROUP BY 1) "
            "SELECT d.event_type, d.dow, d.n, "
            "CAST(FLOOR((CAST(d.s AS DOUBLE) * t.nt) / (CAST(d.n AS DOUBLE) * t.st) "
            "* 1e6 + 0.5) AS BIGINT) AS index_e6 "
            "FROM d JOIN t USING(event_type) ORDER BY event_type, dow"
        ),
        "events_anomaly_ids": (
            # integer-exact Hampel cut: 2*|2v - med2| > 3*mad4 per type
            "WITH e AS (SELECT event_id, event_type, "
            "CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v FROM events), "
            "r AS (SELECT event_type, v, ROW_NUMBER() OVER ("
            "PARTITION BY event_type ORDER BY v) AS rn, "
            "COUNT(*) OVER (PARTITION BY event_type) AS n FROM e), "
            "m AS (SELECT event_type, CAST(SUM(CASE "
            "WHEN n % 2 = 1 AND rn = (n + 1) // 2 THEN 2 * v "
            "WHEN n % 2 = 0 AND rn IN (n // 2, n // 2 + 1) THEN v "
            "ELSE 0 END) AS BIGINT) AS med2 FROM r GROUP BY event_type), "
            "d AS (SELECT e.event_type, ABS(2 * e.v - m.med2) AS d2 "
            "FROM e JOIN m USING(event_type)), "
            "dr AS (SELECT event_type, d2, ROW_NUMBER() OVER ("
            "PARTITION BY event_type ORDER BY d2) AS rn, "
            "COUNT(*) OVER (PARTITION BY event_type) AS n FROM d), "
            "md AS (SELECT event_type, CAST(SUM(CASE "
            "WHEN n % 2 = 1 AND rn = (n + 1) // 2 THEN 2 * d2 "
            "WHEN n % 2 = 0 AND rn IN (n // 2, n // 2 + 1) THEN d2 "
            "ELSE 0 END) AS BIGINT) AS mad4 FROM dr GROUP BY event_type) "
            "SELECT e.event_id, e.event_type FROM e "
            "JOIN m USING(event_type) JOIN md USING(event_type) "
            "WHERE 2 * ABS(2 * e.v - m.med2) > 3 * md.mad4 ORDER BY event_id"
        ),
        "orders_gaps_islands": (
            # gaps-and-islands: runs of orders <=30 days apart per customer
            "WITH o AS (SELECT o_custkey, o_orderdate, o_orderkey, "
            "CASE WHEN datediff('day', LAG(o_orderdate) OVER ("
            "PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), o_orderdate) <= 30 "
            "THEN 0 ELSE 1 END AS brk FROM orders), "
            "g AS (SELECT o_custkey, SUM(brk) OVER ("
            "PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey "
            "ROWS UNBOUNDED PRECEDING) AS isl FROM o), "
            "s AS (SELECT o_custkey, isl, COUNT(*) AS sz FROM g GROUP BY 1, 2) "
            "SELECT o_custkey AS custkey, CAST(COUNT(*) AS BIGINT) AS n_islands, "
            "CAST(MAX(sz) AS BIGINT) AS max_island FROM s GROUP BY 1 ORDER BY custkey"
        ),
        "customer_rfm": (
            # RFM quartiles: NTILE(4) per metric, custkey tiebreak;
            # monetary tiles bin on $1000 grain (bounded tile domain)
            "WITH a AS (SELECT o_custkey AS custkey, "
            "CAST(datediff('day', MAX(o_orderdate), "
            "(SELECT MAX(o_orderdate) FROM orders)) AS BIGINT) "
            "AS recency_days, CAST(COUNT(*) AS BIGINT) AS freq, "
            "CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) "
            "AS monetary_e2 FROM orders GROUP BY o_custkey) "
            "SELECT custkey, recency_days, freq, monetary_e2, "
            "CAST(NTILE(4) OVER (ORDER BY recency_days ASC, custkey ASC) AS BIGINT) AS r_tile, "
            "CAST(NTILE(4) OVER (ORDER BY freq DESC, custkey ASC) AS BIGINT) AS f_tile, "
            "CAST(NTILE(4) OVER (ORDER BY CAST(FLOOR(monetary_e2 / 100000) AS BIGINT) DESC, "
            "custkey ASC) AS BIGINT) AS m_tile FROM a ORDER BY custkey"
        ),
        "source_vocab_jaccard": (
            # distinct-token vocabulary Jaccard per source pair
            "WITH v AS (SELECT DISTINCT source, t FROM (SELECT source, "
            "unnest(string_split(text, ' ')) AS t FROM documents) WHERE t <> ''), "
            "c AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM v GROUP BY source), "
            "i AS (SELECT a.source AS source_a, b.source AS source_b, "
            "CAST(COUNT(*) AS BIGINT) AS shared_terms FROM v a "
            "JOIN v b ON a.t = b.t AND a.source < b.source GROUP BY 1, 2) "
            "SELECT i.source_a, i.source_b, i.shared_terms, "
            "CAST(FLOOR(i.shared_terms * 1e6 / (ca.n + cb.n - i.shared_terms) + 0.5) "
            "AS BIGINT) AS jaccard_e6 FROM i "
            "JOIN c ca ON ca.source = i.source_a JOIN c cb ON cb.source = i.source_b "
            "ORDER BY source_a, source_b"
        ),
        "events_cume_dist": (
            "SELECT event_id, CAST(FLOOR(CUME_DIST() OVER ("
            "PARTITION BY event_type "
            "ORDER BY CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) * 1e9 + 0.5) "
            "AS BIGINT) AS cd_e9 FROM events ORDER BY event_id"
        ),
        "purchase_no_recent_click": (
            # range anti-join: no click in the preceding hour
            "SELECT event_id FROM events e WHERE event_type = 'purchase' "
            "AND NOT EXISTS (SELECT 1 FROM events c "
            "WHERE c.user_id = e.user_id AND c.event_type = 'click' "
            "AND c.ts >= e.ts - INTERVAL 1 HOUR AND c.ts < e.ts) "
            "ORDER BY event_id"
        ),
        "token_zipf_fit": (
            # OLS slope of ln(freq) on ln(rank), top-100 tokens,
            # e9-integer per-term sums (order-free exact)
            "WITH tok AS (SELECT t AS token, COUNT(*) AS n FROM "
            "(SELECT unnest(string_split(text, ' ')) AS t FROM documents) "
            "WHERE t <> '' GROUP BY t), "
            "top AS (SELECT token, CAST(n AS BIGINT) AS n, "
            "CAST(ROW_NUMBER() OVER (ORDER BY n DESC, token ASC) AS BIGINT) "
            "AS rank FROM tok ORDER BY n DESC, token ASC LIMIT 100), "
            "s AS (SELECT "
            "CAST(SUM(CAST(FLOOR(LN(rank) * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS sx, "
            "CAST(SUM(CAST(FLOOR(LN(n) * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS sy, "
            "CAST(SUM(CAST(FLOOR(LN(rank) * LN(n) * 1e9 + 0.5) AS BIGINT)) "
            "AS BIGINT) AS sxy, "
            "CAST(SUM(CAST(FLOOR(LN(rank) * LN(rank) * 1e9 + 0.5) AS BIGINT)) "
            "AS BIGINT) AS sxx, "
            "CAST(COUNT(*) AS DOUBLE) AS kk FROM top) "
            "SELECT rank, token, n, "
            "CAST(FLOOR((kk * (sxy / 1e9) - (sx / 1e9) * (sy / 1e9)) / "
            "(kk * (sxx / 1e9) - (sx / 1e9) * (sx / 1e9)) * 1e6 + 0.5) "
            "AS BIGINT) AS slope_e6 FROM top, s ORDER BY rank"
        ),
        "events_psi": (
            # PSI per event type: 10 log2 value bins, Laplace-smoothed,
            # e9-integer terms (order-free exact total)
            "WITH e AS (SELECT event_type, "
            "LEAST(9, CAST(FLOOR(LOG2(1 + value)) AS BIGINT)) AS bin, "
            "CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END AS cur "
            "FROM events), "
            "t AS (SELECT DISTINCT event_type FROM events), "
            "grid AS (SELECT event_type, UNNEST(generate_series(0, 9)) AS bin "
            "FROM t), "
            "c AS (SELECT event_type, bin, CAST(SUM(1 - cur) AS BIGINT) AS n_ref, "
            "CAST(SUM(cur) AS BIGINT) AS n_cur FROM e GROUP BY event_type, bin), "
            "m AS (SELECT g.event_type, g.bin, COALESCE(c.n_ref, 0) AS n_ref, "
            "COALESCE(c.n_cur, 0) AS n_cur FROM grid g LEFT JOIN c "
            "ON g.event_type = c.event_type AND g.bin = c.bin), "
            "tt AS (SELECT event_type, SUM(n_ref) AS tr, SUM(n_cur) AS tc "
            "FROM m GROUP BY event_type), "
            "x AS (SELECT m.event_type, m.bin, m.n_ref, m.n_cur, "
            "CAST(FLOOR(((m.n_cur + 1.0) / (tt.tc + 10.0) - "
            "(m.n_ref + 1.0) / (tt.tr + 10.0)) * "
            "LN(((m.n_cur + 1.0) / (tt.tc + 10.0)) / "
            "((m.n_ref + 1.0) / (tt.tr + 10.0))) * 1e9 + 0.5) AS BIGINT) "
            "AS term_e9 FROM m JOIN tt ON m.event_type = tt.event_type) "
            "SELECT event_type, bin, n_ref, n_cur, term_e9, "
            "CAST(SUM(term_e9) OVER (PARTITION BY event_type) AS BIGINT) "
            "AS psi_e9 FROM x ORDER BY event_type, bin"
        ),
        "embedding_fisher": (
            # per-label within-class variance + centroid offset (e4-int
            # vectors, exact moments, e9-int between terms)
            "WITH u AS (SELECT CAST(label AS BIGINT) AS label, "
            "UNNEST(generate_series(0, 63)) AS dim, "
            "CAST(FLOOR(UNNEST(CAST(embedding AS DOUBLE[])) * 1e4 + 0.5) "
            "AS BIGINT) AS x FROM embeddings), "
            "m AS (SELECT label, dim, COUNT(*) AS n, "
            "CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(x * x) AS BIGINT) AS sxx "
            "FROM u GROUP BY label, dim), "
            "g AS (SELECT dim, CAST(SUM(n) AS BIGINT) AS nn, "
            "CAST(SUM(sx) AS BIGINT) AS gx FROM m GROUP BY dim), "
            "j AS (SELECT m.label, m.n, m.sxx, m.sx, "
            "(CAST(m.sx AS DOUBLE) * CAST(g.nn AS DOUBLE) - "
            "CAST(g.gx AS DOUBLE) * CAST(m.n AS DOUBLE)) / "
            "(CAST(m.n AS DOUBLE) * CAST(g.nn AS DOUBLE)) AS md "
            "FROM m JOIN g ON m.dim = g.dim), "
            "f AS (SELECT label, MAX(n) AS n, "
            "CAST(SUM(n * sxx - sx * sx) AS BIGINT) AS wnum, "
            "CAST(SUM(CAST(FLOOR(md * md * 10 + 0.5) AS BIGINT)) AS BIGINT) "
            "AS bsum FROM j GROUP BY label) "
            "SELECT label, n, "
            "CAST(FLOOR(CAST(wnum AS DOUBLE) / (n * n * 64) / 100 + 0.5) "
            "AS BIGINT) AS within_e6, "
            "CAST(FLOOR(bsum / 64000.0 + 0.5) AS BIGINT) AS between_e6 "
            "FROM f ORDER BY label"
        ),
        "welch_ttest": (
            # Welch t + Satterthwaite df vs the 'click' baseline, from
            # exact integer moments (x = value e2)
            "WITH b AS (SELECT event_type, "
            "CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS x FROM events), "
            "m AS (SELECT event_type, COUNT(*) AS n, "
            "CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(x * x) AS BIGINT) AS sxx "
            "FROM b GROUP BY event_type), "
            "c AS (SELECT CAST(n AS DOUBLE) AS n2, CAST(sx AS DOUBLE) AS sx2, "
            "CAST(sxx AS DOUBLE) AS sxx2 FROM m WHERE event_type = 'click'), "
            "e AS (SELECT event_type, n, CAST(n AS DOUBLE) AS n1, "
            "CAST(sx AS DOUBLE) AS sx1, CAST(sxx AS DOUBLE) AS sxx1, "
            "n2, sx2, sxx2 FROM m, c WHERE event_type <> 'click'), "
            "v AS (SELECT event_type, n, n1, sx1, n2, sx2, "
            "((n1 * sxx1 - sx1 * sx1) / (n1 * (n1 - 1))) / n1 AS a, "
            "((n2 * sxx2 - sx2 * sx2) / (n2 * (n2 - 1))) / n2 AS bb FROM e), "
            "s AS (SELECT event_type, n, n1, sx1, n2, sx2, a, bb, "
            "a + bb AS ss FROM v) "
            "SELECT event_type, n, "
            "CAST(FLOOR((sx1 / n1 - sx2 / n2) / sqrt(ss) * 1e6 + 0.5) AS BIGINT) "
            "AS t_e6, "
            "CAST(FLOOR(ss * ss / (a * a / (n1 - 1) + bb * bb / (n2 - 1)) "
            "* 1e3 + 0.5) AS BIGINT) AS df_e3 "
            "FROM s ORDER BY event_type"
        ),
        "woe_iv": (
            # decile WOE + e9-integer IV terms (order-free exact sum)
            "WITH t AS (SELECT c_custkey, "
            "NTILE(10) OVER (ORDER BY c_acctbal, c_custkey) AS decile "
            "FROM customer), "
            "g AS (SELECT o_custkey AS k FROM orders "
            "WHERE o_totalprice > 450000 GROUP BY o_custkey), "
            "j AS (SELECT t.decile, "
            "CASE WHEN g.k IS NULL THEN 0 ELSE 1 END AS good "
            "FROM t LEFT JOIN g ON t.c_custkey = g.k), "
            "d AS (SELECT decile, COUNT(*) AS n, "
            "CAST(SUM(good) AS BIGINT) AS n_good, "
            "COUNT(*) - CAST(SUM(good) AS BIGINT) AS n_bad "
            "FROM j GROUP BY decile), "
            "tot AS (SELECT CAST(SUM(n_good) AS DOUBLE) AS G, "
            "CAST(SUM(n_bad) AS DOUBLE) AS B FROM d), "
            "w AS (SELECT decile, n, n_good, n_bad, "
            "LN((CAST(n_good AS DOUBLE) / G) / (CAST(n_bad AS DOUBLE) / B)) AS woe, "
            "CAST(n_good AS DOUBLE) / G - CAST(n_bad AS DOUBLE) / B AS dsh "
            "FROM d, tot) "
            "SELECT CAST(decile AS BIGINT) AS decile, n, n_good, n_bad, "
            "CAST(FLOOR(woe * 1e6 + 0.5) AS BIGINT) AS woe_e6, "
            "(SELECT CAST(SUM(CAST(FLOOR(dsh * woe * 1e9 + 0.5) AS BIGINT)) "
            "AS BIGINT) FROM w) AS iv_e9 "
            "FROM w ORDER BY decile"
        ),
        "zorder_layout": (
            # Morton-interleave (o_custkey & 0xFFFF, epoch-day & 0xFFFF),
            # orderkey-tiebroken global rank, 1024-row files
            "WITH k AS (SELECT o_orderkey AS okey, o_custkey AS ck, "
            "CAST(FLOOR(EPOCH(o_orderdate) / 86400) AS BIGINT) AS day "
            "FROM orders), "
            "z AS (SELECT okey, ck, day, ("
            + " + ".join(
                f"((((ck % 65536) >> {i}) & 1) << {2 * i})" for i in range(16)
            )
            + " + "
            + " + ".join(
                f"((((day % 65536) >> {i}) & 1) << {2 * i + 1})" for i in range(16)
            )
            + ") * 1048576 + (okey % 1048576) AS zfull FROM k), "
            "r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY zfull, okey) - 1 "
            "AS rnk FROM z) "
            "SELECT rnk // 1024 AS file_id, COUNT(*) AS n, "
            "MIN(ck) AS min_ck, MAX(ck) AS max_ck, "
            "MIN(day) AS min_day, MAX(day) AS max_day "
            "FROM r GROUP BY 1 ORDER BY file_id"
        ),
        "balanced_resample": (
            # hash-thinned class balancing: k = n_label // n_min
            "WITH c AS (SELECT CAST(label AS BIGINT) AS label, "
            "COUNT(*) AS n_before FROM embeddings GROUP BY 1), "
            "m AS (SELECT MIN(n_before) AS n_min FROM c), "
            "k AS (SELECT label, n_before, "
            "GREATEST(1, n_before // n_min) AS k_div FROM c, m), "
            "f AS (SELECT CAST(e.label AS BIGINT) AS label, e.vec_id "
            "FROM embeddings e JOIN k ON CAST(e.label AS BIGINT) = k.label "
            "WHERE ((CAST(e.vec_id AS HUGEINT) * 2654435761) % 4294967296) "
            "% k.k_div = 0), "
            "a AS (SELECT label, COUNT(*) AS n_after, "
            "CAST(SUM(vec_id) AS BIGINT) AS id_sum FROM f GROUP BY label) "
            "SELECT k.label, k.n_before, k.k_div, "
            "COALESCE(a.n_after, 0) AS n_after, "
            "COALESCE(a.id_sum, 0) AS id_sum "
            "FROM k LEFT JOIN a ON k.label = a.label ORDER BY k.label"
        ),
        "doc_char_chunks": (
            # 500-char windows, 100-char overlap (stride 400)
            "WITH d AS (SELECT doc_id, text, LENGTH(text) AS n, "
            "GREATEST(1, CAST(CEIL((LENGTH(text) - 100) / 400.0) AS BIGINT)) "
            "AS nc FROM documents), "
            "c AS (SELECT doc_id, text, n, "
            "UNNEST(generate_series(0, nc - 1)) AS i FROM d) "
            "SELECT doc_id, i AS chunk_idx, i * 400 AS start_c, "
            "LEAST(500, n - i * 400) AS len_c, "
            "md5(SUBSTR(text, i * 400 + 1, LEAST(500, n - i * 400))) "
            "AS chunk_md5 FROM c ORDER BY doc_id, chunk_idx"
        ),
        "ann_hard_negatives": (
            # top-5 cross-label cosine neighbours for the first 20 vectors
            "WITH q AS (SELECT vec_id AS query_id, label AS qlabel, "
            "CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id < 20), "
            "s AS (SELECT q.query_id, e.vec_id AS neg_id, "
            "list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qe) AS cos "
            "FROM embeddings e JOIN q ON e.label <> q.qlabel), "
            "r AS (SELECT query_id, neg_id, cos, "
            "ROW_NUMBER() OVER (PARTITION BY query_id "
            "ORDER BY cos DESC, neg_id ASC) AS rank FROM s) "
            "SELECT query_id, neg_id, "
            "CAST(FLOOR(cos * 1e6 + 0.5) AS BIGINT) AS cosine_e6, "
            "CAST(rank AS BIGINT) AS rank FROM r WHERE rank <= 5 "
            "ORDER BY query_id, rank"
        ),
        "events_autocorr": (
            # lag-1 autocorrelation from exact integer moments (same
            # final float expression as events_value_time_corr)
            "WITH b AS (SELECT event_type, "
            "CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS x, "
            "LAG(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) OVER "
            "(PARTITION BY user_id, event_type ORDER BY ts, event_id) AS y "
            "FROM events), "
            "p AS (SELECT event_type, x, y FROM b WHERE y IS NOT NULL), "
            "m AS (SELECT event_type, COUNT(*) AS n, "
            "CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy, "
            "CAST(SUM(x * y) AS BIGINT) AS sxy, "
            "CAST(SUM(x * x) AS BIGINT) AS sxx, "
            "CAST(SUM(y * y) AS BIGINT) AS syy FROM p GROUP BY event_type) "
            "SELECT event_type, n AS n_pairs, "
            "CAST(FLOOR((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) / "
            "sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) * "
            "(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)) * 1e6 + 0.5) "
            "AS BIGINT) AS autocorr_e6 FROM m ORDER BY event_type"
        ),
        "events_median_value": (
            # 2*median is integer-exact for odd (2a) and even (a+b) sizes
            "SELECT event_type, COUNT(*) AS n, "
            "CAST(2 * median(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) "
            "AS med2_e2 FROM events GROUP BY event_type"
        ),
        "customer_no_big_order": (
            "SELECT c_custkey, c_mktsegment FROM customer WHERE NOT EXISTS ("
            "SELECT 1 FROM orders WHERE o_custkey = c_custkey "
            "AND o_totalprice > 450000)"
        ),
        "top_tokens_per_lang": (
            # grouped top-k: rank on (n DESC, token ASC) — float-free
            "WITH t AS (SELECT lang, unnest(string_split(text, ' ')) AS token "
            "FROM documents), "
            "c AS (SELECT lang, token, COUNT(*) AS n FROM t "
            "WHERE token <> '' GROUP BY lang, token), "
            "r AS (SELECT lang, token, n, ROW_NUMBER() OVER ("
            "PARTITION BY lang ORDER BY n DESC, token) AS rn FROM c) "
            "SELECT lang, token, CAST(n AS BIGINT) AS n, "
            "CAST(rn AS BIGINT) AS rn FROM r WHERE rn <= 10 ORDER BY lang, rn"
        ),
        "doc_token_counts": (
            "SELECT t AS token, COUNT(*) AS n FROM ("
            "SELECT unnest(string_split(text, ' ')) AS t FROM documents) "
            "WHERE t <> '' GROUP BY t"
        ),
        "weighted_sample_docs": (
            # identical Efraimidis-Spirakis draw both sides: u from the
            # first 8 md5 hex chars of the id, key = -ln((u+0.5)/2^32)/w
            "SELECT doc_id, n_chars FROM ("
            "  SELECT doc_id, n_chars FROM documents WHERE n_chars > 0"
            "  ORDER BY -ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))"
            "    AS BIGINT) + 0.5) / 4294967296.0) / n_chars, doc_id"
            "  LIMIT 25"
            ") ORDER BY doc_id"
        ),
        "prefix_jaccard_pairs": (
            # exact all-pairs token-set Jaccard; both sides filter on the
            # half-up e6 of the SAME float expression (inter/union)*1e6
            "WITH ts AS ("
            "  SELECT doc_id, t FROM ("
            "    SELECT doc_id, unnest(string_split(text, ' ')) AS t"
            "    FROM documents) WHERE t <> '' GROUP BY doc_id, t"
            "), sz AS (SELECT doc_id, COUNT(*) AS n FROM ts GROUP BY doc_id),"
            "co AS ("
            "  SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS shared"
            "  FROM ts x JOIN ts y ON x.t = y.t AND x.doc_id < y.doc_id"
            "  GROUP BY x.doc_id, y.doc_id)"
            "SELECT a, b, CAST(FLOOR((shared * 1.0 /"
            "  (na.n + nb.n - shared)) * 1000000.0 + 0.5) AS BIGINT) AS jac_e6 "
            "FROM co JOIN sz na ON na.doc_id = a JOIN sz nb ON nb.doc_id = b "
            "WHERE CAST(FLOOR((shared * 1.0 / (na.n + nb.n - shared))"
            "  * 1000000.0 + 0.5) AS BIGINT) >= 900000 "
            "ORDER BY a, b"
        ),
        "bm25_search": (
            # identical BM25 parameterisation both sides: k1=1.2 b=0.75,
            # Lucene idf, half-up e6 integer scores
            "WITH toks AS ("
            "  SELECT doc_id, unnest(string_split(text, ' ')) AS t"
            "  FROM documents"
            "), toks_ne AS (SELECT doc_id, t FROM toks WHERE t <> ''),"
            "tf AS ("
            "  SELECT doc_id, t, COUNT(*) AS tf FROM toks_ne"
            "  WHERE t IN ('table', 'scan', 'merge') GROUP BY doc_id, t"
            "), dl AS ("
            "  SELECT doc_id, COUNT(*) AS dl FROM toks_ne GROUP BY doc_id"
            "), stats AS ("
            "  SELECT (SELECT COUNT(*) FROM documents) AS n,"
            # total tokens / total docs (a zero-token doc still counts,
            # matching the Ray pass-1 reduction)
            "         (SELECT COUNT(*) FROM toks_ne) * 1.0"
            "           / (SELECT COUNT(*) FROM documents) AS avgdl"
            "), df AS ("
            "  SELECT t, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY t)"
            "SELECT doc_id, CAST(FLOOR(SUM("
            "  ln((n - df + 0.5) / (df + 0.5) + 1)"
            "  * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))"
            ") * 1e6 + 0.5) AS BIGINT) AS score_e6 "
            "FROM tf JOIN dl USING (doc_id) CROSS JOIN stats "
            "JOIN df USING (t) "
            "GROUP BY doc_id ORDER BY score_e6 DESC, doc_id LIMIT 20"
        ),
        "passage_dedup_docs": (
            # same passage derivation both sides: non-overlapping 5-token
            # chunks (parallel unnests zip tok with pos), first corpus-wide
            # occurrence by (doc_id, chunk_pos) survives
            "WITH toks AS ("
            "  SELECT doc_id, unnest(string_split(text, ' ')) AS tok,"
            "         unnest(range(len(string_split(text, ' ')))) AS pos"
            "  FROM documents"
            "), chunks AS ("
            "  SELECT doc_id, pos // 5 AS cpos,"
            "         string_agg(tok, ' ' ORDER BY pos) AS line"
            "  FROM toks GROUP BY doc_id, pos // 5"
            "), ranked AS ("
            "  SELECT doc_id, cpos, line,"
            "         row_number() OVER (PARTITION BY line"
            "                            ORDER BY doc_id, cpos) AS rn"
            "  FROM chunks)"
            "SELECT doc_id, COUNT(*) AS n_chunks,"
            "       CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)"
            "         AS n_kept,"
            "       string_agg(CASE WHEN rn = 1 THEN line END, ' '"
            "                  ORDER BY cpos) AS text_clean "
            "FROM ranked GROUP BY doc_id ORDER BY doc_id"
        ),
        "orders_percent_rank": (
            "SELECT o_orderkey, c_mktsegment, "
            "CAST(FLOOR(percent_rank() OVER w * 1e6 + 0.5) AS BIGINT) AS pr_e6, "
            "CAST(FLOOR(cume_dist() OVER w * 1e6 + 0.5) AS BIGINT) AS cd_e6 "
            "FROM orders JOIN customer ON o_custkey = c_custkey "
            "WINDOW w AS (PARTITION BY c_mktsegment "
            "ORDER BY CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))"
        ),
        "part_fuzzy_name_match": (
            # same probe construction (middle char deleted) + first-char
            # blocking + edit distance <= 1
            "WITH n AS (SELECT DISTINCT p_name FROM part), "
            "p AS (SELECT substr(p_name, 1, "
            "CAST(FLOOR(length(p_name) / 2) AS INT)) || "
            "substr(p_name, CAST(FLOOR(length(p_name) / 2) AS INT) + 2) "
            "AS probe FROM n) "
            "SELECT p.probe, n.p_name, "
            "CAST(levenshtein(p.probe, n.p_name) AS BIGINT) AS dist "
            "FROM p JOIN n ON substr(p.probe, 1, 1) = substr(n.p_name, 1, 1) "
            "WHERE levenshtein(p.probe, n.p_name) <= 1 ORDER BY probe, p_name"
        ),
        "orders_upsert_latest": (
            # same deterministic update stream + latest-wins rule
            "WITH b AS (SELECT o_orderkey, "
            "CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS price_e2, "
            "CAST(o_orderdate AS TIMESTAMP) AS ts, 0 AS src FROM orders), "
            "u AS (SELECT o_orderkey, "
            "CAST(FLOOR(o_totalprice * 110 + 0.5) AS BIGINT) AS price_e2, "
            "CAST(o_orderdate AS TIMESTAMP) + INTERVAL 30 DAY AS ts, 1 AS src "
            "FROM orders WHERE o_orderkey % 10 = 0), "
            "a AS (SELECT * FROM b UNION ALL SELECT * FROM u) "
            "SELECT o_orderkey, price_e2, CAST(src AS BIGINT) AS src, "
            "n_versions FROM ("
            "SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey "
            "ORDER BY ts DESC, src DESC) AS rn, "
            "COUNT(*) OVER (PARTITION BY o_orderkey) AS n_versions FROM a) "
            "WHERE rn = 1 ORDER BY o_orderkey"
        ),
        "events_mad_value": (
            # integer-exact robust stats: med2 = 2*median, mad4 = 4*MAD,
            # Hampel 3-MAD cut as the pure integer test 2*dev2 > 3*mad4
            "WITH b AS (SELECT event_type, "
            "CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v FROM events), "
            "m AS (SELECT event_type, COUNT(*) AS n, "
            "CAST(2 * median(v) AS BIGINT) AS med2 FROM b GROUP BY event_type), "
            "d AS (SELECT b.event_type, m.n, m.med2, "
            "ABS(2 * b.v - m.med2) AS dev2 FROM b JOIN m USING (event_type)), "
            "md AS (SELECT event_type, CAST(2 * median(dev2) AS BIGINT) AS mad4 "
            "FROM d GROUP BY event_type) "
            "SELECT d.event_type, d.n, d.med2 AS med2_e2, md.mad4 AS mad4_e2, "
            "CAST(SUM(CASE WHEN 2 * d.dev2 > 3 * md.mad4 THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_outliers "
            "FROM d JOIN md USING (event_type) "
            "GROUP BY d.event_type, d.n, d.med2, md.mad4 ORDER BY d.event_type"
        ),
        "supplier_ship_overlap": (
            # interval-overlap self-join; (orderkey, linenumber) is NOT
            # unique in the data, so unordered pairs = (ordered-with-self
            # pair count - n)/2 — the same identity the sweep uses
            "WITH i AS (SELECT l_suppkey, l_shipdate AS sd, "
            "l_shipdate + to_days(CAST(l_quantity AS INT)) AS ed FROM lineitem), "
            "t AS (SELECT a.l_suppkey, COUNT(*) AS cnt "
            "FROM i a JOIN i b ON a.l_suppkey = b.l_suppkey "
            "AND a.sd <= b.ed AND b.sd <= a.ed GROUP BY a.l_suppkey), "
            "n AS (SELECT l_suppkey, COUNT(*) AS nr FROM i GROUP BY l_suppkey) "
            "SELECT t.l_suppkey, CAST((t.cnt - n.nr) / 2 AS BIGINT) "
            "AS n_overlap_pairs FROM t JOIN n USING (l_suppkey) "
            "WHERE t.cnt > n.nr ORDER BY t.l_suppkey"
        ),
        "events_running_total": (
            # cumulative window frame over exact e2 integers
            "SELECT event_id, user_id, "
            "CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) OVER ("
            "PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_e2 "
            "FROM events ORDER BY event_id"
        ),
        "user_day_streaks": (
            # gaps-and-islands: consecutive epoch-days share day - ROW_NUMBER()
            "WITH d AS (SELECT DISTINCT user_id, "
            "date_diff('day', TIMESTAMP '1970-01-01', ts) AS day FROM events), "
            "i AS (SELECT user_id, day, day - ROW_NUMBER() OVER ("
            "PARTITION BY user_id ORDER BY day) AS isl FROM d), "
            "s AS (SELECT user_id, isl, COUNT(*) AS len FROM i "
            "GROUP BY user_id, isl) "
            "SELECT user_id, CAST(SUM(len) AS BIGINT) AS n_active_days, "
            "CAST(COUNT(*) AS BIGINT) AS n_streaks, "
            "CAST(MAX(len) AS BIGINT) AS max_streak "
            "FROM s GROUP BY user_id ORDER BY user_id"
        ),
        "events_running_distinct": (
            # DISTINCT isn't frameable: first-occurrence flag + running sum
            "WITH f AS (SELECT event_id, user_id, ts, "
            "CASE WHEN ROW_NUMBER() OVER (PARTITION BY user_id, event_type "
            "ORDER BY ts, event_id) = 1 THEN 1 ELSE 0 END AS fst FROM events) "
            "SELECT event_id, user_id, CAST(SUM(fst) OVER ("
            "PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_distinct_types "
            "FROM f ORDER BY event_id"
        ),
        "user_retention_cohorts": (
            # cohort = first active week; count users per (cohort, offset)
            "WITH w AS (SELECT DISTINCT user_id, "
            "CAST(FLOOR(date_diff('day', TIMESTAMP '2024-01-01', ts) / 7) "
            "AS BIGINT) AS week FROM events), "
            "f AS (SELECT user_id, MIN(week) AS cohort_week FROM w GROUP BY user_id) "
            "SELECT f.cohort_week, w.week - f.cohort_week AS week_offset, "
            "COUNT(*) AS n_users FROM w JOIN f USING (user_id) "
            "GROUP BY f.cohort_week, week_offset "
            "ORDER BY f.cohort_week, week_offset"
        ),
        "event_type_lift": (
            # association rules over distinct (user, type) baskets;
            # identical final float expressions (support/lift, e6)
            "WITH d AS (SELECT DISTINCT user_id, event_type FROM events), "
            "tot AS (SELECT COUNT(DISTINCT user_id) AS t FROM events), "
            "s AS (SELECT event_type, COUNT(*) AS n FROM d GROUP BY event_type), "
            "p AS (SELECT a.event_type AS type_a, b.event_type AS type_b, "
            "COUNT(*) AS n_both FROM d a JOIN d b ON a.user_id = b.user_id "
            "AND a.event_type < b.event_type GROUP BY 1, 2) "
            "SELECT p.type_a, p.type_b, CAST(p.n_both AS BIGINT) AS n_both, "
            "CAST(FLOOR(CAST(p.n_both AS DOUBLE) / tot.t * 1e6 + 0.5) AS BIGINT) "
            "AS support_e6, "
            "CAST(FLOOR(CAST(p.n_both AS DOUBLE) * tot.t / "
            "(CAST(sa.n AS DOUBLE) * sb.n) * 1e6 + 0.5) AS BIGINT) AS lift_e6 "
            "FROM p, tot "
            "JOIN s sa ON sa.event_type = p.type_a "
            "JOIN s sb ON sb.event_type = p.type_b "
            "ORDER BY p.type_a, p.type_b"
        ),
        "lineitem_price_regression": (
            # grouped OLS from exact integer moments; identical final
            # float expressions both sides (slope/intercept/r2, e6)
            "WITH b AS (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS x, "
            "CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS y FROM lineitem), "
            "m AS (SELECT l_returnflag, COUNT(*) AS n, "
            "CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy, "
            "CAST(SUM(x * y) AS BIGINT) AS sxy, "
            "CAST(SUM(x * x) AS BIGINT) AS sxx, "
            "CAST(SUM(y * y) AS BIGINT) AS syy FROM b GROUP BY l_returnflag) "
            "SELECT l_returnflag, n, "
            "CAST(FLOOR((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) / "
            "(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) * 1e6 + 0.5) "
            "AS BIGINT) AS slope_e6, "
            "CAST(FLOOR((CAST(sy AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sxy) / "
            "(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) * 1e6 + 0.5) "
            "AS BIGINT) AS intercept_e6, "
            "CAST(FLOOR((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) * "
            "(CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) / "
            "((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) * "
            "(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)) * 1e6 + 0.5) "
            "AS BIGINT) AS r2_e6 FROM m ORDER BY l_returnflag"
        ),
        "events_unpivot_props": (
            # UNPIVOT to long format: two (key, val) rows per event
            "SELECT event_id, key, val FROM ("
            "SELECT event_id, 'value_e2' AS key, "
            "CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS val FROM events "
            "UNION ALL SELECT event_id, 'user_id' AS key, "
            "CAST(user_id AS BIGINT) AS val FROM events) "
            "ORDER BY event_id, key"
        ),
        "events_value_time_corr": (
            # exact integer moments -> identical final float expression
            "WITH b AS (SELECT event_type, "
            "CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS x, "
            "CAST(date_diff('second', TIMESTAMP '2024-01-01', ts) AS BIGINT) AS y "
            "FROM events), "
            "m AS (SELECT event_type, COUNT(*) AS n, "
            "CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy, "
            "CAST(SUM(x * y) AS BIGINT) AS sxy, "
            "CAST(SUM(x * x) AS BIGINT) AS sxx, "
            "CAST(SUM(y * y) AS BIGINT) AS syy FROM b GROUP BY event_type) "
            "SELECT event_type, n, "
            "CAST(FLOOR((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) / "
            "sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) * "
            "(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)) * 1e6 + 0.5) "
            "AS BIGINT) AS corr_e6 FROM m ORDER BY event_type"
        ),
        "user_funnel_stage": (
            # first-touch funnel: first view, first click AFTER it, first
            # purchase after that (strict ts); universe = users with at
            # least one funnel-type event (the same pre-filter both sides)
            "WITH f AS (SELECT user_id, event_type, ts FROM events "
            "WHERE event_type IN ('view', 'click', 'purchase')), "
            "v AS (SELECT user_id, min(ts) AS t FROM f "
            "WHERE event_type = 'view' GROUP BY user_id), "
            "c AS (SELECT f.user_id, min(f.ts) AS t FROM f JOIN v "
            "ON f.user_id = v.user_id AND f.ts > v.t "
            "WHERE f.event_type = 'click' GROUP BY f.user_id), "
            "p AS (SELECT f.user_id, min(f.ts) AS t FROM f JOIN c "
            "ON f.user_id = c.user_id AND f.ts > c.t "
            "WHERE f.event_type = 'purchase' GROUP BY f.user_id) "
            "SELECT u.user_id, "
            "CAST(CASE WHEN p.user_id IS NOT NULL THEN 3 "
            "WHEN c.user_id IS NOT NULL THEN 2 "
            "WHEN v.user_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) "
            "AS funnel_stage "
            "FROM (SELECT DISTINCT user_id FROM f) u "
            "LEFT JOIN v ON u.user_id = v.user_id "
            "LEFT JOIN c ON u.user_id = c.user_id "
            "LEFT JOIN p ON u.user_id = p.user_id ORDER BY u.user_id"
        ),
        "token_postings": (
            "WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t "
            "FROM documents), "
            "d AS (SELECT DISTINCT doc_id, t FROM toks WHERE t <> '') "
            "SELECT t AS token, COUNT(*) AS df, "
            "string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings "
            "FROM d GROUP BY t HAVING COUNT(*) >= 20 ORDER BY token"
        ),
        "orders_cube_year_priority": (
            "SELECT COALESCE(CAST(year(o_orderdate) AS BIGINT), -1) AS year, "
            "COALESCE(o_orderpriority, 'ALL') AS o_orderpriority, "
            "COUNT(*) AS n_orders, "
            "CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) "
            "AS revenue_e2 "
            "FROM orders GROUP BY CUBE(year(o_orderdate), o_orderpriority)"
        ),
        "stratified_sample_docs": (
            # same md5-of-id draw as the Ray side: deterministic, seedless
            "SELECT source, doc_id, CAST(rn AS BIGINT) AS sample_rank FROM ("
            "SELECT source, doc_id, ROW_NUMBER() OVER (PARTITION BY source "
            "ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn "
            "FROM documents) WHERE rn <= 5 ORDER BY source, rn"
        ),
        "lineitem_bloom_join": (
            "SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, "
            "CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS o_price_e2 "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "WHERE o_totalprice > 480000"
        ),
        "pii_redact_docs": (
            # same deterministic PII splice + the same RE2 patterns applied
            # in the same order as functions/text.py PII_PATTERNS
            "WITH aug AS (SELECT doc_id, text || ' contact user' || "
            "CAST(doc_id AS VARCHAR) || '@mail' || CAST(doc_id % 7 AS VARCHAR) || "
            "'.example.com call (555) 010-' || "
            "lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || "
            "' from 192.168.' || CAST(doc_id % 256 AS VARCHAR) || '.' || "
            "CAST(doc_id % 254 + 1 AS VARCHAR) AS t FROM documents) "
            "SELECT doc_id, "
            "regexp_replace(regexp_replace(regexp_replace(t, "
            "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'), "
            "'\\(?\\d{3}\\)?[ -]\\d{3}-\\d{4}', '<PHONE>', 'g'), "
            "'\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g') "
            "AS clean_text, "
            "len(regexp_extract_all(t, "
            "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_email, "
            "len(regexp_extract_all(t, "
            "'\\(?\\d{3}\\)?[ -]\\d{3}-\\d{4}')) AS n_phone, "
            "len(regexp_extract_all(t, "
            "'\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS n_ipv4 "
            "FROM aug"
        ),
        "doc_repetition_stats": (
            # Gopher-style repetition signals; ties on top token/bigram
            # break lexicographically, fractions are half-up e6 integers
            # computed with the SAME float expression as the Ray side
            "WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok "
            "FROM documents), "
            "tstat AS (SELECT doc_id, COUNT(*) AS n_tokens, "
            "COUNT(DISTINCT tok) AS n_distinct FROM toks GROUP BY doc_id), "
            "tcnt AS (SELECT doc_id, tok, COUNT(*) AS c FROM toks "
            "GROUP BY doc_id, tok), "
            "ttop AS (SELECT doc_id, tok AS top_token, c FROM ("
            "SELECT doc_id, tok, c, ROW_NUMBER() OVER (PARTITION BY doc_id "
            "ORDER BY c DESC, tok ASC) AS rn FROM tcnt) WHERE rn = 1), "
            "bgs AS (SELECT doc_id, unnest(list_transform("
            "generate_series(1, len(sp) - 1), i -> sp[i] || ' ' || sp[i + 1])) AS bg "
            "FROM (SELECT doc_id, string_split(text, ' ') AS sp FROM documents)), "
            "bcnt AS (SELECT doc_id, bg, COUNT(*) AS c FROM bgs GROUP BY doc_id, bg), "
            "btop AS (SELECT doc_id, bg AS top_bigram, c FROM ("
            "SELECT doc_id, bg, c, ROW_NUMBER() OVER (PARTITION BY doc_id "
            "ORDER BY c DESC, bg ASC) AS rn FROM bcnt) WHERE rn = 1) "
            "SELECT t.doc_id, t.n_tokens, t.n_distinct, "
            "CAST(FLOOR(1e6 * (t.n_tokens - t.n_distinct) / t.n_tokens + 0.5) "
            "AS BIGINT) AS dup_token_frac_e6, "
            "tt.top_token, "
            "CAST(FLOOR(1e6 * tt.c / t.n_tokens + 0.5) AS BIGINT) AS top_token_frac_e6, "
            "bt.top_bigram, "
            "CAST(FLOOR(1e6 * bt.c / (t.n_tokens - 1) + 0.5) AS BIGINT) "
            "AS top_bigram_frac_e6 "
            "FROM tstat t JOIN ttop tt USING (doc_id) JOIN btop bt USING (doc_id) "
            "ORDER BY doc_id"
        ),
        "orders_pivot_month_segment": (
            "SELECT strftime(o_orderdate, '%Y-%m') AS month, "
            + ", ".join(
                "CAST(COALESCE(SUM(CASE WHEN c_mktsegment = '{0}' THEN "
                "CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) END), 0) "
                "AS BIGINT) AS rev_{1}_e2".format(s, s.lower())
                for s in (
                    "AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"
                )
            )
            + " FROM orders JOIN customer ON o_custkey = c_custkey "
            "GROUP BY strftime(o_orderdate, '%Y-%m')"
        ),
        "purchase_click_users": (
            "SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 99 "
            "INTERSECT "
            "SELECT user_id FROM events WHERE event_type = 'click' AND value > 99"
        ),
        "tfidf_top_terms": (
            # rank on the ROUNDED integer score (+ token asc) so the
            # ordering never depends on float comparison of raw tf-idf
            "WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t "
            "FROM documents), "
            "tf AS (SELECT doc_id, t, COUNT(*) AS tf FROM toks WHERE t <> '' "
            "GROUP BY doc_id, t), "
            "df AS (SELECT t, COUNT(*) AS nd FROM tf GROUP BY t), "
            "n AS (SELECT COUNT(*) AS n FROM documents) "
            "SELECT doc_id, token, tfidf_e4 FROM ("
            "SELECT tf.doc_id, tf.t AS token, "
            "CAST(FLOOR(tf.tf * ln(CAST(n.n AS DOUBLE) / df.nd) * 10000 + 0.5) "
            "AS BIGINT) AS tfidf_e4, "
            "ROW_NUMBER() OVER (PARTITION BY tf.doc_id ORDER BY "
            "CAST(FLOOR(tf.tf * ln(CAST(n.n AS DOUBLE) / df.nd) * 10000 + 0.5) "
            "AS BIGINT) DESC, tf.t ASC) AS rn "
            "FROM tf JOIN df ON tf.t = df.t CROSS JOIN n) WHERE rn <= 3"
        ),
        "doc_lm_perplexity": (
            # Laplace-smoothed bigram LM trained on the corpus itself;
            # nll rounded to e6 with the SAME floor(x+0.5) on both sides
            "WITH lists AS (SELECT doc_id, "
            "list_filter(string_split(text, ' '), x -> x <> '') AS toks "
            "FROM documents), "
            "big AS (SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2 "
            "FROM lists, UNNEST(range(1, len(toks))) AS t(i)), "
            "c2 AS (SELECT w1, w2, COUNT(*)::BIGINT AS c2 FROM big GROUP BY w1, w2), "
            "c1 AS (SELECT w1, COUNT(*)::BIGINT AS c1 FROM big GROUP BY w1), "
            "v AS (SELECT COUNT(DISTINCT t)::BIGINT AS v FROM "
            "(SELECT unnest(toks) AS t FROM lists)) "
            "SELECT big.doc_id, COUNT(*)::BIGINT AS n_bigrams, "
            "CAST(FLOOR(-SUM(LN((c2.c2 + 1.0) / (c1.c1 + v.v))) / COUNT(*) "
            "* 1e6 + 0.5) AS BIGINT) AS nll_e6 "
            "FROM big JOIN c2 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v "
            "GROUP BY big.doc_id ORDER BY big.doc_id"
        ),
        "customer_big_order_counts": (
            "SELECT c_custkey, c_mktsegment, COUNT(o_custkey) AS n_big "
            "FROM customer LEFT JOIN ("
            "SELECT o_custkey FROM orders WHERE o_totalprice > 450000) o "
            "ON o_custkey = c_custkey GROUP BY c_custkey, c_mktsegment"
        ),
        "heavy_hitter_tokens": (
            # the Ray side uses a Misra-Gries sketch + exact re-count;
            # provably equal to this exact-count threshold query
            "WITH tc AS (SELECT t AS token, COUNT(*) AS n FROM ("
            "SELECT unnest(string_split(text, ' ')) AS t FROM documents) "
            "WHERE t <> '' GROUP BY t) "
            "SELECT token, n FROM tc "
            "WHERE n * 100 > (SELECT CAST(SUM(n) AS BIGINT) FROM tc) * 2"
        ),
        "events_quantiles": (
            # discrete quantiles are pure integer order statistics
            "SELECT event_type, COUNT(*) AS n, "
            "CAST(MIN(v) AS BIGINT) AS min_e2, "
            "CAST(quantile_disc(v, 0.1) AS BIGINT) AS p10_e2, "
            "CAST(quantile_disc(v, 0.9) AS BIGINT) AS p90_e2, "
            "CAST(MAX(v) AS BIGINT) AS max_e2 FROM ("
            "SELECT event_type, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v "
            "FROM events) GROUP BY event_type"
        ),
        "orders_rollup": (
            "SELECT COALESCE(CAST(year(o_orderdate) AS BIGINT), -1) AS year, "
            "COALESCE(CAST(month(o_orderdate) AS BIGINT), -1) AS month, "
            "COUNT(*) AS n_orders, "
            "CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) "
            "AS revenue_e2 FROM orders "
            "GROUP BY ROLLUP(year(o_orderdate), month(o_orderdate))"
        ),
        "doc_split_assign": (
            # identical md5-first-byte rule on both sides
            "SELECT doc_id, CASE WHEN b <= 7 THEN 'train' "
            "WHEN b = 8 THEN 'val' ELSE 'test' END AS split FROM ("
            "SELECT doc_id, CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)) "
            "AS INTEGER) % 10 AS b FROM documents)"
        ),
        # pack_token_chunks / decontaminate_ngrams: engine-defined layout /
        # blake2b n-gram hashes — no SQL oracle; invariants pinned in tests
        "host_link_graph": (
            # closed-form twin of the derived corpus' id-arithmetic links:
            # 6 anchors per doc page at (doc*37 + 11k + 1) mod n_docs —
            # checks the real parse→canonicalize→aggregate composition
            "WITH n AS (SELECT COUNT(*) AS n FROM documents), "
            "k AS (SELECT unnest(range(6)) AS k), "
            "e AS (SELECT 'h' || CAST(doc_id % 16 AS VARCHAR) || '.example' AS src_host, "
            "'h' || CAST(((doc_id * 37 + 11 * k + 1) % n.n) % 16 AS VARCHAR) "
            "|| '.example' AS dst_host FROM documents CROSS JOIN k CROSS JOIN n) "
            "SELECT src_host, dst_host, COUNT(*) AS n_links FROM e "
            "GROUP BY src_host, dst_host"
        ),
        "doc_triangle_counts": (
            # closed-form twin of the doc-level link graph: undirect +
            # dedup the id-arithmetic edges, enumerate ordered triangles
            # via a 3-way self-join, count each at all three vertices
            "WITH n AS (SELECT COUNT(*) AS n FROM documents), "
            "k AS (SELECT unnest(range(6)) AS k), "
            "e0 AS (SELECT doc_id AS a, (doc_id * 37 + 11 * k + 1) % n.n AS b "
            "FROM documents CROSS JOIN k CROSS JOIN n), "
            "e1 AS (SELECT DISTINCT least(a, b) AS a, greatest(a, b) AS b "
            "FROM e0 WHERE a <> b), "
            "tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z "
            "FROM e1 JOIN e1 e2 ON e1.b = e2.a "
            "JOIN e1 e3 ON e1.a = e3.a AND e2.b = e3.b), "
            "v AS (SELECT x AS doc_id FROM tri UNION ALL "
            "SELECT y FROM tri UNION ALL SELECT z FROM tri) "
            "SELECT doc_id, COUNT(*) AS n_triangles FROM v "
            "GROUP BY doc_id ORDER BY doc_id"
        ),
        "source_simpson_diversity": (
            # pure-integer Simpson index: ratio of integer sums, floor e6
            "WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS token "
            "FROM documents), "
            "t2 AS (SELECT source, token, COUNT(*) AS n FROM tok "
            "WHERE token <> '' GROUP BY 1, 2), "
            "a AS (SELECT source, CAST(SUM(n * (n - 1)) AS BIGINT) AS nn, "
            "CAST(SUM(n) AS BIGINT) AS N FROM t2 GROUP BY source) "
            "SELECT source, N AS n_tokens, "
            "CAST((1000000 * (N * (N - 1) - nn)) // "
            "GREATEST(N * (N - 1), 1) AS BIGINT) AS simpson_e6 "
            "FROM a ORDER BY source"
        ),
        "events_decision_stump": (
            # histogram split search: per type the one-vs-rest threshold
            # maximizing sum(c^2/n) over the children (variance reduction);
            # ties -> smaller threshold; same float expr both sides
            "WITH b AS (SELECT event_type, "
            "CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v FROM events), "
            "vals AS (SELECT DISTINCT v FROM b), "
            "ty AS (SELECT DISTINCT event_type AS et FROM b), "
            "tot AS (SELECT COUNT(*) AS n FROM b), "
            "ctot AS (SELECT event_type, COUNT(*) AS c FROM b GROUP BY 1), "
            "hv AS (SELECT event_type, v, COUNT(*) AS c FROM b GROUP BY 1, 2), "
            "h AS (SELECT v, COUNT(*) AS nv FROM b GROUP BY 1), "
            "grid AS (SELECT ty.et, vals.v, COALESCE(hv.c, 0) AS c "
            "FROM ty CROSS JOIN vals "
            "LEFT JOIN hv ON hv.event_type = ty.et AND hv.v = vals.v), "
            "cum AS (SELECT et, v, "
            "CAST(SUM(c) OVER (PARTITION BY et ORDER BY v) AS BIGINT) AS cl "
            "FROM grid), "
            "nlc AS (SELECT v, CAST(SUM(nv) OVER (ORDER BY v) AS BIGINT) AS nl "
            "FROM h), "
            "j AS (SELECT cum.et, cum.v, cum.cl, nlc.nl, tot.n, ctot.c AS ct "
            "FROM cum JOIN nlc USING (v) CROSS JOIN tot "
            "JOIN ctot ON ctot.event_type = cum.et WHERE nlc.nl < tot.n), "
            "s AS (SELECT et, v, cl, nl, "
            "CAST(cl AS DOUBLE) * cl / nl "
            "+ CAST(ct - cl AS DOUBLE) * (ct - cl) / (n - nl) AS score FROM j), "
            "r AS (SELECT et, v, cl, nl, score, ROW_NUMBER() OVER "
            "(PARTITION BY et ORDER BY score DESC, v ASC) AS rn FROM s) "
            "SELECT et AS event_type, v AS threshold_e2, nl AS n_left, "
            "cl AS pos_left, "
            "CAST(FLOOR(score * 1e6 + 0.5) AS BIGINT) AS score_e6 "
            "FROM r WHERE rn = 1 ORDER BY et"
        ),
        "events_mannwhitney": (
            # Mann-Whitney U vs the 'click' baseline: exact integer
            # doubled rank sums (u2 = 2*U1) from per-value counts, tie
            # correction Σ(t³−t), z from the identical float expression
            "WITH b AS (SELECT event_type, "
            "CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v FROM events), "
            "h AS (SELECT event_type, v, COUNT(*) AS n FROM b GROUP BY 1, 2), "
            "ty AS (SELECT DISTINCT event_type AS et FROM h "
            "WHERE event_type <> 'click'), "
            "c AS (SELECT ty.et, h.v, "
            "CAST(SUM(CASE WHEN h.event_type = ty.et THEN h.n ELSE 0 END) "
            "AS BIGINT) AS c1, "
            "CAST(SUM(CASE WHEN h.event_type = 'click' THEN h.n ELSE 0 END) "
            "AS BIGINT) AS c2 "
            "FROM ty JOIN h ON h.event_type = ty.et OR h.event_type = 'click' "
            "GROUP BY 1, 2), "
            "r AS (SELECT et, v, c1, c2, c1 + c2 AS t, "
            "COALESCE(SUM(c1 + c2) OVER (PARTITION BY et ORDER BY v "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS sm "
            "FROM c), "
            "a AS (SELECT et, CAST(SUM(c1) AS BIGINT) AS n1, "
            "CAST(SUM(c2) AS BIGINT) AS n2, "
            "CAST(SUM(c1 * (2 * sm + t + 1)) AS BIGINT) AS r12, "
            "CAST(SUM(t * t * t - t) AS BIGINT) AS tie "
            "FROM r GROUP BY et), "
            "f AS (SELECT et, n1, n2, n1 + n2 AS nn, "
            "r12 - n1 * (n1 + 1) AS u2, tie FROM a) "
            "SELECT et AS event_type, n1, n2, CAST(u2 AS BIGINT) AS u2, "
            "CAST(FLOOR((CAST(u2 AS DOUBLE) / 2 - CAST(n1 AS DOUBLE) * n2 / 2) "
            "/ sqrt(CAST(n1 AS DOUBLE) * n2 / 12 * ((nn + 1) - "
            "CAST(tie AS DOUBLE) / (CAST(nn AS DOUBLE) * (nn - 1)))) "
            "* 1e6 + 0.5) AS BIGINT) AS z_e6 "
            "FROM f ORDER BY event_type"
        ),
        "events_spearman_corr": (
            # Spearman rho(value, hour) per type: doubled average ranks
            # (2*min_rank + tied - 1) are exact integers; one float expr
            "WITH b AS (SELECT event_type, "
            "CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v, "
            "CAST(EXTRACT(hour FROM ts) AS BIGINT) AS h FROM events), "
            "rr AS (SELECT event_type, "
            "2 * RANK() OVER (PARTITION BY event_type ORDER BY v) "
            "+ COUNT(*) OVER (PARTITION BY event_type, v) - 1 AS rx2, "
            "2 * RANK() OVER (PARTITION BY event_type ORDER BY h) "
            "+ COUNT(*) OVER (PARTITION BY event_type, h) - 1 AS ry2 "
            "FROM b), "
            "a AS (SELECT event_type, COUNT(*) AS n, "
            "CAST(SUM(rx2 * ry2) AS BIGINT) AS sxy, "
            "CAST(SUM(rx2) AS BIGINT) AS sx, CAST(SUM(ry2) AS BIGINT) AS sy, "
            "CAST(SUM(rx2 * rx2) AS BIGINT) AS sxx, "
            "CAST(SUM(ry2 * ry2) AS BIGINT) AS syy FROM rr GROUP BY 1) "
            "SELECT event_type, CAST(n AS BIGINT) AS n, "
            "CAST(FLOOR(CAST(n * sxy - sx * sy AS DOUBLE) "
            "/ sqrt(CAST(n * sxx - sx * sx AS DOUBLE) "
            "* CAST(n * syy - sy * sy AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) "
            "AS rho_e6 FROM a ORDER BY event_type"
        ),
        "customer_loo_encoding": (
            # leave-one-out target encoding: (S_seg - x) / (n_seg - 1),
            # integer e2 balances, e6-rounded dollars
            "WITH b AS (SELECT c_custkey, c_mktsegment, "
            "CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS x FROM customer), "
            "w AS (SELECT c_custkey, c_mktsegment, "
            "CAST(SUM(x) OVER (PARTITION BY c_mktsegment) AS BIGINT) - x AS rest, "
            "COUNT(*) OVER (PARTITION BY c_mktsegment) - 1 AS m FROM b) "
            "SELECT c_custkey, c_mktsegment, "
            "CAST(FLOOR(CAST(rest AS DOUBLE) / m * 1e4 + 0.5) AS BIGINT) "
            "AS loo_e6 FROM w ORDER BY c_custkey"
        ),
        "nb_lang_predict": (
            # multinomial NB with Laplace smoothing: e6-integer token
            # log-probs => exact integer scores; ties -> smaller lang
            "WITH tok AS (SELECT doc_id, lang, "
            "unnest(string_split(text, ' ')) AS t FROM documents), "
            "tk AS (SELECT doc_id, lang, t FROM tok WHERE t <> ''), "
            "dc AS (SELECT doc_id, t, COUNT(*) AS c FROM tk GROUP BY 1, 2), "
            "lc AS (SELECT lang, t, COUNT(*) AS c FROM tk GROUP BY 1, 2), "
            "tot AS (SELECT lang, COUNT(*) AS n FROM tk GROUP BY 1), "
            "v AS (SELECT COUNT(DISTINCT t) AS vv FROM tk), "
            "nd AS (SELECT lang, COUNT(*) AS d FROM documents GROUP BY 1), "
            "ndt AS (SELECT COUNT(*) AS dd FROM documents), "
            "pr AS (SELECT nd.lang, CAST(FLOOR(LN(CAST(nd.d AS DOUBLE) / ndt.dd) "
            "* 1e6 + 0.5) AS BIGINT) AS p FROM nd CROSS JOIN ndt), "
            "sc AS (SELECT dc.doc_id, lg.lang AS cand, "
            "CAST(SUM(dc.c * CAST(FLOOR(LN(CAST(COALESCE(lc.c, 0) + 1 AS DOUBLE) "
            "/ (tot.n + v.vv)) * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS s "
            "FROM dc CROSS JOIN (SELECT DISTINCT lang FROM documents) lg "
            "JOIN tot ON tot.lang = lg.lang CROSS JOIN v "
            "LEFT JOIN lc ON lc.lang = lg.lang AND lc.t = dc.t "
            "GROUP BY 1, 2), "
            "fin AS (SELECT sc.doc_id, sc.cand, sc.s + pr.p AS score, "
            "ROW_NUMBER() OVER (PARTITION BY sc.doc_id "
            "ORDER BY sc.s + pr.p DESC, sc.cand ASC) AS rn "
            "FROM sc JOIN pr ON pr.lang = sc.cand) "
            "SELECT f.doc_id, d.lang, f.cand AS pred, "
            "CAST(f.score AS BIGINT) AS score "
            "FROM fin f JOIN documents d USING (doc_id) "
            "WHERE rn = 1 ORDER BY doc_id"
        ),
        "lineitem_weighted_median": (
            # weighted order statistic: first price whose 2*cumw >= W
            "WITH h AS (SELECT l_returnflag, "
            "CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS p_e2, "
            "CAST(SUM(CAST(FLOOR(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS w "
            "FROM lineitem GROUP BY 1, 2), "
            "c AS (SELECT l_returnflag, p_e2, w, "
            "SUM(w) OVER (PARTITION BY l_returnflag ORDER BY p_e2) AS cum, "
            "SUM(w) OVER (PARTITION BY l_returnflag) AS tot FROM h) "
            "SELECT l_returnflag, CAST(ANY_VALUE(tot) AS BIGINT) AS total_qty, "
            "CAST(MIN(CASE WHEN 2 * cum >= tot THEN p_e2 END) AS BIGINT) "
            "AS wmedian_price_e2 FROM c GROUP BY l_returnflag"
        ),
        "events_holtwinters_forecast": (
            # Holt-Winters additive, period 7, alpha=1/2 beta=gamma=1/4:
            # ALL-INTEGER recursion (e6, truncating //) forced sequential
            # by the recursive CTE — zero float ops on either side
            "WITH RECURSIVE daily AS (SELECT event_type, "
            "date_trunc('day', ts) AS day, "
            "CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS s, "
            "CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1, 2), "
            "dd AS (SELECT event_type, (s * 10000) // n AS x, "
            "ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS rn "
            "FROM daily), "
            "nd AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days "
            "FROM dd GROUP BY 1 HAVING COUNT(*) >= 14), "
            "init AS (SELECT d.event_type, "
            "SUM(CASE WHEN rn <= 7 THEN x ELSE 0 END) // 7 AS l0, "
            "(SUM(CASE WHEN rn BETWEEN 8 AND 14 THEN x ELSE 0 END) "
            "- SUM(CASE WHEN rn <= 7 THEN x ELSE 0 END)) // 49 AS b0, "
            "MAX(CASE WHEN rn = 1 THEN x END) AS x1, "
            "MAX(CASE WHEN rn = 2 THEN x END) AS x2, "
            "MAX(CASE WHEN rn = 3 THEN x END) AS x3, "
            "MAX(CASE WHEN rn = 4 THEN x END) AS x4, "
            "MAX(CASE WHEN rn = 5 THEN x END) AS x5, "
            "MAX(CASE WHEN rn = 6 THEN x END) AS x6, "
            "MAX(CASE WHEN rn = 7 THEN x END) AS x7 "
            "FROM dd d JOIN nd ON d.event_type = nd.event_type GROUP BY 1), "
            "rec AS (SELECT event_type, CAST(7 AS BIGINT) AS rn, l0 AS l, "
            "b0 AS b, x1 - l0 AS s0, x2 - l0 AS s1, x3 - l0 AS s2, "
            "x4 - l0 AS s3, x5 - l0 AS s4, x6 - l0 AS s5, x7 - l0 AS s6 "
            "FROM init "
            "UNION ALL SELECT event_type, rn, ln AS l, "
            "(ln - l + 3 * b) // 4 AS b, "
            "CASE WHEN slot = 0 THEN (x - ln + 3 * s0) // 4 ELSE s0 END, "
            "CASE WHEN slot = 1 THEN (x - ln + 3 * s1) // 4 ELSE s1 END, "
            "CASE WHEN slot = 2 THEN (x - ln + 3 * s2) // 4 ELSE s2 END, "
            "CASE WHEN slot = 3 THEN (x - ln + 3 * s3) // 4 ELSE s3 END, "
            "CASE WHEN slot = 4 THEN (x - ln + 3 * s4) // 4 ELSE s4 END, "
            "CASE WHEN slot = 5 THEN (x - ln + 3 * s5) // 4 ELSE s5 END, "
            "CASE WHEN slot = 6 THEN (x - ln + 3 * s6) // 4 ELSE s6 END "
            "FROM (SELECT dd.event_type, dd.rn, dd.x, rec.l, rec.b, "
            "rec.s0, rec.s1, rec.s2, rec.s3, rec.s4, rec.s5, rec.s6, "
            "(dd.rn - 1) % 7 AS slot, "
            "(dd.x - CASE (dd.rn - 1) % 7 WHEN 0 THEN rec.s0 "
            "WHEN 1 THEN rec.s1 WHEN 2 THEN rec.s2 WHEN 3 THEN rec.s3 "
            "WHEN 4 THEN rec.s4 WHEN 5 THEN rec.s5 ELSE rec.s6 END "
            "+ rec.l + rec.b) // 2 AS ln "
            "FROM dd JOIN rec ON dd.event_type = rec.event_type "
            "AND dd.rn = rec.rn + 1)), "
            "fin AS (SELECT r.* FROM rec r JOIN nd "
            "ON r.event_type = nd.event_type AND r.rn = nd.n_days), "
            "hs AS (SELECT UNNEST(range(1, 8)) AS h) "
            "SELECT f.event_type, CAST(hs.h AS BIGINT) AS h, "
            "CAST(f.l AS BIGINT) AS level_e6, CAST(f.b AS BIGINT) AS trend_e6, "
            "CAST(f.l + hs.h * f.b + CASE (nd.n_days + hs.h - 1) % 7 "
            "WHEN 0 THEN f.s0 WHEN 1 THEN f.s1 WHEN 2 THEN f.s2 "
            "WHEN 3 THEN f.s3 WHEN 4 THEN f.s4 WHEN 5 THEN f.s5 "
            "ELSE f.s6 END AS BIGINT) AS forecast_e6 "
            "FROM fin f JOIN nd ON f.event_type = nd.event_type "
            "CROSS JOIN hs ORDER BY f.event_type, hs.h"
        ),
        "events_holt_forecast": (
            # Holt double-exponential smoothing: the two-state recursion
            # forced sequential by the recursive CTE (identical double ops)
            "WITH RECURSIVE daily AS (SELECT event_type, "
            "date_trunc('day', ts) AS day, "
            "CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS s, "
            "COUNT(*) AS n FROM events GROUP BY 1, 2), "
            "dd AS (SELECT event_type, d.s * 1.0 / d.n AS x, "
            "ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS rn "
            "FROM daily d), "
            "x2 AS (SELECT event_type, x AS xx FROM dd WHERE rn = 2), "
            "rec AS (SELECT dd.event_type, dd.rn, dd.x AS s, "
            "COALESCE(x2.xx - dd.x, 0) AS b FROM dd "
            "LEFT JOIN x2 ON dd.event_type = x2.event_type WHERE dd.rn = 1 "
            "UNION ALL SELECT dd.event_type, dd.rn, "
            "0.5 * dd.x + 0.5 * (rec.s + rec.b), "
            "0.25 * ((0.5 * dd.x + 0.5 * (rec.s + rec.b)) - rec.s) "
            "+ 0.75 * rec.b FROM dd "
            "JOIN rec ON dd.event_type = rec.event_type AND dd.rn = rec.rn + 1), "
            "fin AS (SELECT event_type, MAX(rn) AS n_days FROM rec "
            "GROUP BY event_type) "
            "SELECT fin.event_type, fin.n_days, "
            "CAST(FLOOR(r.s * 10000 + 0.5) AS BIGINT) AS level_e6, "
            "CAST(FLOOR(r.b * 10000 + 0.5) AS BIGINT) AS trend_e6, "
            "CAST(FLOOR((r.s + r.b) * 10000 + 0.5) AS BIGINT) AS forecast_e6 "
            "FROM fin JOIN rec r ON r.event_type = fin.event_type "
            "AND r.rn = fin.n_days"
        ),
        "events_cusum_changepoint": (
            # CUSUM fold forced sequential (ascending day) by recursion —
            # identical double ops to the Ray driver fold
            "WITH RECURSIVE daily AS (SELECT event_type, "
            "date_trunc('day', ts) AS day, "
            "CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS s, "
            "COUNT(*) AS n FROM events GROUP BY 1, 2), "
            "m AS (SELECT event_type, SUM(s) * 1.0 / SUM(n) AS m FROM daily "
            "GROUP BY event_type), "
            "dd AS (SELECT d.event_type, d.day, d.s * 1.0 / d.n AS vbar, m.m, "
            "ROW_NUMBER() OVER (PARTITION BY d.event_type ORDER BY d.day) AS rn "
            "FROM daily d JOIN m ON d.event_type = m.event_type), "
            "rec AS (SELECT event_type, rn, day, GREATEST(0, vbar - m) AS cs "
            "FROM dd WHERE rn = 1 "
            "UNION ALL SELECT dd.event_type, dd.rn, dd.day, "
            "GREATEST(0, rec.cs + (dd.vbar - dd.m)) FROM dd "
            "JOIN rec ON dd.event_type = rec.event_type AND dd.rn = rec.rn + 1), "
            "pk AS (SELECT event_type, COUNT(*) AS n_days, MAX(cs) AS peak, "
            "CAST(SUM(CASE WHEN cs > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos_days "
            "FROM rec GROUP BY event_type) "
            "SELECT pk.event_type, pk.n_days, "
            "(SELECT MIN(day) FROM rec WHERE rec.event_type = pk.event_type "
            "AND rec.cs = pk.peak) AS peak_day, "
            "CAST(FLOOR(pk.peak + 0.5) AS BIGINT) AS peak_cusum_e2, "
            "pk.n_pos_days FROM pk"
        ),
        "purchase_survival_km": (
            # Kaplan-Meier: the recursive CTE forces the SAME sequential
            # ascending-t double-product order the Ray driver fold uses
            "WITH RECURSIVE f AS (SELECT user_id, MIN(epoch_us(ts)) AS t0, "
            "MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS tp "
            "FROM events GROUP BY user_id), "
            "mx AS (SELECT MAX(epoch_us(ts)) AS m FROM events), "
            "dur AS (SELECT (COALESCE(tp, m) - t0) // 86400000000 AS t_day, "
            "CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS e FROM f CROSS JOIN mx), "
            "cen AS (SELECT t_day, CAST(SUM(e) AS BIGINT) AS d, COUNT(*) AS c "
            "FROM dur GROUP BY t_day), "
            "kr AS (SELECT t_day, d, CAST(SUM(c) OVER (ORDER BY t_day DESC) AS BIGINT) "
            "AS n_risk FROM cen), "
            "km AS (SELECT t_day, n_risk, d, ROW_NUMBER() OVER (ORDER BY t_day) AS rn "
            "FROM kr WHERE d > 0), "
            "s AS (SELECT rn, t_day, n_risk, d, "
            "(n_risk - d) * 1.0 / n_risk AS sv FROM km WHERE rn = 1 "
            "UNION ALL SELECT km.rn, km.t_day, km.n_risk, km.d, "
            "s.sv * ((km.n_risk - km.d) * 1.0 / km.n_risk) "
            "FROM km JOIN s ON km.rn = s.rn + 1) "
            "SELECT t_day, n_risk, d, "
            "CAST(FLOOR(1000000.0 * d / n_risk + 0.5) AS BIGINT) AS hazard_e6, "
            "CAST(FLOOR(sv * 1000000 + 0.5) AS BIGINT) AS surv_e6 "
            "FROM s ORDER BY t_day"
        ),
        "doc_adamic_adar": (
            # closed-form twin: undirect + dedup the id-arithmetic edges,
            # wedge pairs per common neighbor z weighted by the SAME
            # integer floor(1e9/ln(deg z) + .5), existing edges excluded
            "WITH n AS (SELECT COUNT(*) AS n FROM documents), "
            "k AS (SELECT unnest(range(6)) AS k), "
            "e0 AS (SELECT doc_id AS a, (doc_id * 37 + 11 * k + 1) % n.n AS b "
            "FROM documents CROSS JOIN k CROSS JOIN n), "
            "e1 AS (SELECT DISTINCT least(a, b) AS a, greatest(a, b) AS b "
            "FROM e0 WHERE a <> b), "
            "adj AS (SELECT a AS z, b AS x FROM e1 UNION ALL SELECT b, a FROM e1), "
            "deg AS (SELECT z AS node, CAST(FLOOR(1000000000.0 / "
            "LN(GREATEST(COUNT(*), 2)) + 0.5) AS BIGINT) AS w FROM adj GROUP BY z), "
            "wp AS (SELECT n1.x AS a, n2.x AS b, n1.z AS z FROM adj n1 "
            "JOIN adj n2 ON n1.z = n2.z AND n1.x < n2.x), "
            "sc AS (SELECT wp.a, wp.b, COUNT(*) AS cn, "
            "CAST(SUM(deg.w) AS BIGINT) AS aa_e9 FROM wp "
            "JOIN deg ON wp.z = deg.node "
            "WHERE NOT EXISTS (SELECT 1 FROM e1 WHERE e1.a = wp.a AND e1.b = wp.b) "
            "GROUP BY wp.a, wp.b) "
            "SELECT a, b, cn, aa_e9 FROM sc "
            "ORDER BY aa_e9 DESC, a, b LIMIT 20"
        ),
        "doc_clustering_coeff": (
            # degrees + triangles from the closed-form edges; identical
            # float expression for the e6 coefficient
            "WITH n AS (SELECT COUNT(*) AS n FROM documents), "
            "k AS (SELECT unnest(range(6)) AS k), "
            "e0 AS (SELECT doc_id AS a, (doc_id * 37 + 11 * k + 1) % n.n AS b "
            "FROM documents CROSS JOIN k CROSS JOIN n), "
            "e1 AS (SELECT DISTINCT least(a, b) AS a, greatest(a, b) AS b "
            "FROM e0 WHERE a <> b), "
            "adj AS (SELECT a AS z, b AS x FROM e1 UNION ALL SELECT b, a FROM e1), "
            "deg AS (SELECT z AS doc_id, COUNT(*) AS degree FROM adj GROUP BY z), "
            "tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z FROM e1 "
            "JOIN e1 e2 ON e1.b = e2.a "
            "JOIN e1 e3 ON e1.a = e3.a AND e2.b = e3.b), "
            "v AS (SELECT x AS doc_id FROM tri UNION ALL SELECT y FROM tri "
            "UNION ALL SELECT z FROM tri), "
            "tc AS (SELECT doc_id, COUNT(*) AS n_triangles FROM v GROUP BY doc_id) "
            "SELECT deg.doc_id, deg.degree, "
            "CAST(COALESCE(tc.n_triangles, 0) AS BIGINT) AS n_triangles, "
            "CAST(FLOOR(2.0 * COALESCE(tc.n_triangles, 0) * 1000000 / "
            "(deg.degree * (deg.degree - 1.0)) + 0.5) AS BIGINT) AS cc_e6 "
            "FROM deg LEFT JOIN tc ON deg.doc_id = tc.doc_id "
            "WHERE deg.degree >= 2 ORDER BY deg.doc_id"
        ),
        "doc_bfs_depth": (
            # min-reachable depth (recursive CTE, UNION-deduped, depth
            # bounded) over the same closed-form directed links the
            # triangle oracle proves equal to the parse pipeline
            "WITH RECURSIVE n AS (SELECT COUNT(*) AS n FROM documents), "
            "k AS (SELECT unnest(range(6)) AS k), "
            "e0 AS (SELECT doc_id AS a, (doc_id * 37 + 11 * k + 1) % n.n AS b "
            "FROM documents CROSS JOIN k CROSS JOIN n), "
            "e AS (SELECT a, b FROM e0 WHERE a <> b), "
            "reach AS (SELECT 0 AS doc_id, 0 AS d "
            "UNION SELECT e.b, reach.d + 1 FROM reach "
            "JOIN e ON e.a = reach.doc_id WHERE reach.d < 32) "
            "SELECT doc_id, CAST(MIN(d) AS BIGINT) AS depth "
            "FROM reach GROUP BY doc_id ORDER BY doc_id"
        ),
        "events_daily_distinct_users": (
            "SELECT event_type, date_trunc('day', ts) AS day, "
            "COUNT(DISTINCT user_id) AS n_users FROM events "
            "GROUP BY event_type, date_trunc('day', ts) "
            "ORDER BY event_type, day"
        ),
        "user_mode_event": (
            # deterministic mode: count DESC, value ASC tie-break
            "SELECT user_id, event_type AS mode_event, n AS n_mode FROM ("
            "SELECT user_id, event_type, COUNT(*) AS n, "
            "ROW_NUMBER() OVER (PARTITION BY user_id "
            "ORDER BY COUNT(*) DESC, event_type) AS rn "
            "FROM events GROUP BY user_id, event_type) WHERE rn = 1 "
            "ORDER BY user_id"
        ),
        "purchase_days_no_click": (
            "(SELECT DISTINCT user_id, date_trunc('day', ts) AS day "
            "FROM events WHERE event_type = 'purchase') EXCEPT "
            "(SELECT DISTINCT user_id, date_trunc('day', ts) AS day "
            "FROM events WHERE event_type = 'click') "
            "ORDER BY user_id, day"
        ),
        "events_daily_gapfill": (
            # spine bounds come from the UNFILTERED table, like the Ray side
            "WITH d AS (SELECT event_type, date_trunc('day', ts) AS day, "
            "COUNT(*) AS n FROM events WHERE value > 150 GROUP BY 1, 2), "
            "b AS (SELECT date_trunc('day', min(ts)) AS mn, "
            "date_trunc('day', max(ts)) AS mx FROM events), "
            "s AS (SELECT unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS day "
            "FROM b), "
            "t AS (SELECT DISTINCT event_type FROM events WHERE value > 150) "
            "SELECT t.event_type, s.day, CAST(COALESCE(d.n, 0) AS BIGINT) AS n "
            "FROM t CROSS JOIN s LEFT JOIN d "
            "ON t.event_type = d.event_type AND s.day = d.day "
            "ORDER BY t.event_type, s.day"
        ),
        # host_pagerank: iterative algorithm, rows-only (numpy twin in tests)
        "quality_score_model": (
            # the actor-pool integer linear model, term-for-term
            "SELECT doc_id, score, score >= 380 AS keep FROM ("
            "SELECT doc_id, CAST(LENGTH(text) "
            "- 20 * (LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[.!?,;:]', '', 'g'))) "
            "+ 5 * len(list_filter(string_split_regex(lower(text), '\\s+'), "
            f"x -> x IN {_STOP_LIST})) "
            "+ 3 * len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) "
            "AS BIGINT) AS score FROM documents)"
        ),
        "embedding_centroids": (
            # e6-rounded BEFORE summing → float-order-free on both sides
            "SELECT label, i, COUNT(*) AS n_vecs, "
            "CAST(SUM(CAST(FLOOR(CAST(v AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) "
            "AS BIGINT) AS sum_e6 FROM ("
            "SELECT label, unnest(embedding) AS v, "
            "generate_subscripts(embedding, 1) AS i FROM embeddings) "
            "GROUP BY label, i"
        ),
        "events_hopping_window": (
            # 4 epoch-aligned 1h windows (15min hop) per event — pure
            # integer epoch arithmetic on both sides
            "SELECT window_start_us, event_type, COUNT(*) AS n, "
            "CAST(SUM(v) AS BIGINT) AS value_e2 FROM ("
            "SELECT (epoch_us(ts) // 900000000 - k) * 900000000 AS window_start_us, "
            "event_type, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v "
            "FROM events CROSS JOIN (SELECT unnest(range(4)) AS k)) "
            "GROUP BY window_start_us, event_type"
        ),
        "part_lineitem_full_outer": (
            "WITH a AS (SELECT p_partkey, p_size FROM part WHERE p_size > 45), "
            "b AS (SELECT l_partkey, COUNT(*) AS n FROM lineitem "
            "WHERE l_quantity > 49 GROUP BY l_partkey) "
            "SELECT COALESCE(a.p_partkey, b.l_partkey) AS partkey, "
            "CAST(COALESCE(a.p_size, -1) AS BIGINT) AS p_size, "
            "COALESCE(b.n, 0) AS n_heavy "
            "FROM a FULL OUTER JOIN b ON a.p_partkey = b.l_partkey"
        ),
        "supplier_names_by_nation": (
            "SELECT CAST(s_nationkey AS BIGINT) AS s_nationkey, "
            "string_agg(s_name, ',' ORDER BY s_name) AS names, "
            "COUNT(*) AS n_suppliers FROM supplier GROUP BY s_nationkey"
        ),
        "lineitem_above_avg": (
            # correlated subquery (qty > per-part AVG), written as the
            # integer cross-multiplied inequality on BOTH sides so no
            # float average crosses the hash boundary
            "SELECT CAST(l.l_partkey AS BIGINT) AS l_partkey, "
            "COUNT(*) AS n_above FROM lineitem l "
            "WHERE CAST(FLOOR(l.l_quantity + 0.5) AS BIGINT) * "
            "(SELECT COUNT(*) FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey) > "
            "(SELECT CAST(SUM(CAST(FLOOR(l3.l_quantity + 0.5) AS BIGINT)) AS BIGINT) "
            "FROM lineitem l3 WHERE l3.l_partkey = l.l_partkey) "
            "GROUP BY l.l_partkey"
        ),
        "orders_ntile": (
            "SELECT CAST(o.o_orderkey AS BIGINT) AS o_orderkey, "
            "c.c_mktsegment AS seg, "
            "CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT) AS price_e2, "
            "CAST(NTILE(4) OVER (PARTITION BY c.c_mktsegment "
            "ORDER BY CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT) DESC, "
            "o.o_orderkey) AS BIGINT) AS quartile "
            "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey"
        ),
        "events_first_last": (
            # grouped FIRST_VALUE/LAST_VALUE under the (ts, event_id)
            # total order
            "SELECT DISTINCT CAST(user_id AS BIGINT) AS user_id, "
            "CAST(FIRST_VALUE(event_id) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id) AS BIGINT) AS first_event, "
            "CAST(LAST_VALUE(event_id) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND "
            "UNBOUNDED FOLLOWING) AS BIGINT) AS last_event FROM events"
        ),
        "events_type_regression": (
            # grouped OLS (regr_slope family) from exact integer moments
            # in HUGEINT; // truncates toward zero on both sides
            "WITH b AS (SELECT event_type, "
            "CAST(EXTRACT(hour FROM ts) AS HUGEINT) AS x, "
            "CAST(FLOOR(value * 100 + 0.5) AS HUGEINT) AS y FROM events), "
            "m AS (SELECT event_type, CAST(COUNT(*) AS HUGEINT) AS n, "
            "SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy, "
            "SUM(x * x) AS sxx FROM b GROUP BY event_type) "
            "SELECT event_type, CAST(n AS BIGINT) AS n, "
            "CAST(CASE WHEN n * sxx - sx * sx = 0 THEN 0 "
            "ELSE ((n * sxy - sx * sy) * 1000000000) // (n * sxx - sx * sx) "
            "END AS BIGINT) AS slope_e9, "
            "CAST(CASE WHEN n * sxx - sx * sx = 0 "
            "THEN (sy * 1000000000) // n "
            "ELSE ((sy * (n * sxx - sx * sx) - (n * sxy - sx * sy) * sx) "
            "* 1000000000) // (n * (n * sxx - sx * sx)) "
            "END AS BIGINT) AS intercept_e9 "
            "FROM m ORDER BY event_type"
        ),
        "token_pmi_collocations": (
            # PMI over adjacent filtered-token pairs: ln of exact integer
            # cross-products, identical double expression both sides
            "WITH tk AS (SELECT doc_id, t, idx FROM ("
            "SELECT doc_id, unnest(string_split(text, ' ')) AS t, "
            "generate_subscripts(string_split(text, ' '), 1) AS idx "
            "FROM documents) WHERE LENGTH(t) >= 4), "
            "seq AS (SELECT doc_id, t, "
            "ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY idx) AS rn "
            "FROM tk), "
            "adj AS (SELECT a.t AS u, b.t AS v FROM seq a JOIN seq b "
            "ON a.doc_id = b.doc_id AND b.rn = a.rn + 1), "
            "pr AS (SELECT least(u, v) AS a, greatest(u, v) AS b, "
            "CAST(COUNT(*) AS HUGEINT) AS w FROM adj WHERE u <> v "
            "GROUP BY 1, 2), "
            "np AS (SELECT CAST(SUM(w) AS HUGEINT) AS n_pairs FROM pr), "
            "mg AS (SELECT t, CAST(COUNT(*) AS HUGEINT) AS n FROM tk "
            "GROUP BY t), "
            "nt AS (SELECT CAST(SUM(n) AS HUGEINT) AS n_tok FROM mg), "
            "sc AS (SELECT pr.a, pr.b, pr.w, "
            "ln(CAST(pr.w * nt.n_tok * nt.n_tok AS DOUBLE)) "
            "- ln(CAST(np.n_pairs * ma.n * mb.n AS DOUBLE)) AS pmi "
            "FROM pr CROSS JOIN np CROSS JOIN nt "
            "JOIN mg ma ON ma.t = pr.a JOIN mg mb ON mb.t = pr.b "
            "WHERE pr.w >= 5) "
            "SELECT a AS tok_a, b AS tok_b, CAST(w AS BIGINT) AS n_pair, "
            "CAST(FLOOR(pmi * 1e6 + 0.5) AS BIGINT) AS pmi_e6 FROM sc "
            "ORDER BY pmi_e6 DESC, tok_a, tok_b LIMIT 25"
        ),
        "events_anova_f": (
            # one-way ANOVA: exact integer moments per type; the single
            # float reduction sum(Sg^2/ng) folds sequentially in
            # event_type order via a recursive CTE so the add order (and
            # hence the double) matches the driver bit-for-bit
            "WITH RECURSIVE ev AS (SELECT event_type, "
            "CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v FROM events), "
            "m AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, "
            "CAST(SUM(v) AS BIGINT) AS s, "
            "CAST(SUM(CAST(v AS HUGEINT) * v) AS HUGEINT) AS q "
            "FROM ev GROUP BY event_type), "
            "ord AS (SELECT *, ROW_NUMBER() OVER (ORDER BY event_type) "
            "AS rn FROM m), "
            "fold(rn, acc) AS ("
            "SELECT rn, CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / "
            "CAST(n AS DOUBLE) FROM ord WHERE rn = 1 "
            "UNION ALL SELECT o.rn, f.acc + CAST(o.s AS DOUBLE) * "
            "CAST(o.s AS DOUBLE) / CAST(o.n AS DOUBLE) "
            "FROM fold f JOIN ord o ON o.rn = f.rn + 1), "
            "lastf AS (SELECT acc FROM fold ORDER BY rn DESC LIMIT 1), "
            "tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nr, "
            "CAST(SUM(s) AS BIGINT) AS st, CAST(SUM(q) AS HUGEINT) AS qt, "
            "CAST(COUNT(*) AS BIGINT) AS k FROM m) "
            "SELECT tot.nr AS n_rows, tot.k AS n_groups, "
            "CAST(FLOOR(((lastf.acc - CAST(tot.st AS DOUBLE) * "
            "CAST(tot.st AS DOUBLE) / CAST(tot.nr AS DOUBLE)) "
            "/ (tot.k - 1)) / ((CAST(tot.qt AS DOUBLE) - lastf.acc) "
            "/ (tot.nr - tot.k)) * 1e6 + 0.5) AS BIGINT) AS f_e6 "
            "FROM tot, lastf"
        ),
        "events_kruskal_wallis": (
            # Kruskal-Wallis: doubled average ranks (2*sm + t + 1) keep
            # every per-group rank sum integer; sum(R2g^2/ng) folds via
            # the same recursive-CTE sequential-order trick as ANOVA
            "WITH RECURSIVE ev AS (SELECT event_type, "
            "CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v FROM events), "
            "h AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS t FROM ev "
            "GROUP BY v), "
            "hh AS (SELECT v, t, CAST(SUM(t) OVER (ORDER BY v) - t "
            "AS BIGINT) AS sm FROM h), "
            "g AS (SELECT e.event_type, CAST(COUNT(*) AS BIGINT) AS n, "
            "CAST(SUM(CAST(2 * hh.sm + hh.t + 1 AS HUGEINT)) AS HUGEINT) "
            "AS r2 FROM ev e JOIN hh ON hh.v = e.v GROUP BY e.event_type), "
            "ord AS (SELECT *, ROW_NUMBER() OVER (ORDER BY event_type) "
            "AS rn FROM g), "
            "fold(rn, acc) AS ("
            "SELECT rn, CAST(r2 AS DOUBLE) * CAST(r2 AS DOUBLE) / "
            "CAST(n AS DOUBLE) FROM ord WHERE rn = 1 "
            "UNION ALL SELECT o.rn, f.acc + CAST(o.r2 AS DOUBLE) * "
            "CAST(o.r2 AS DOUBLE) / CAST(o.n AS DOUBLE) "
            "FROM fold f JOIN ord o ON o.rn = f.rn + 1), "
            "lastf AS (SELECT acc FROM fold ORDER BY rn DESC LIMIT 1), "
            "tie AS (SELECT CAST(SUM(t * t * t - t) AS BIGINT) AS tie "
            "FROM h), "
            "tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nr, "
            "CAST(COUNT(*) AS BIGINT) AS k FROM g) "
            "SELECT tot.nr AS n_rows, tot.k AS n_groups, "
            "CAST(FLOOR(((12.0 / (CAST(tot.nr AS DOUBLE) * "
            "CAST(tot.nr + 1 AS DOUBLE)) * (lastf.acc / 4.0) "
            "- 3.0 * CAST(tot.nr + 1 AS DOUBLE)) "
            "/ (1.0 - CAST(tie.tie AS DOUBLE) / "
            "(CAST(tot.nr AS DOUBLE) * CAST(tot.nr AS DOUBLE) * "
            "CAST(tot.nr AS DOUBLE) - CAST(tot.nr AS DOUBLE)))) "
            "* 1e6 + 0.5) AS BIGINT) AS h_e6 "
            "FROM tot, lastf, tie"
        ),
        "lang_temperature_sample": (
            # temperature mixing: acceptance rate (n_min/n_i)^(1-alpha)
            # per language, md5-u32 gate replayed bit-for-bit
            "WITH c AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n "
            "FROM documents GROUP BY lang), "
            "mn AS (SELECT CAST(MIN(n) AS BIGINT) AS n_min FROM c), "
            "thr AS (SELECT c.lang, CAST(FLOOR(POWER("
            "CAST(mn.n_min AS DOUBLE) / CAST(c.n AS DOUBLE), 0.5) "
            "* 4294967296.0) AS BIGINT) AS cut FROM c, mn) "
            "SELECT d.doc_id, d.lang FROM documents d "
            "JOIN thr ON thr.lang = d.lang "
            "WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), "
            "1, 8)) AS BIGINT) < thr.cut ORDER BY d.doc_id"
        ),
        "token_typo_pairs": (
            # FastSS = exactly the Levenshtein-1 pairs over the distinct
            # customer names
            "WITH tok AS (SELECT DISTINCT c_name AS t FROM customer) "
            "SELECT a.t AS tok_a, b.t AS tok_b FROM tok a JOIN tok b "
            "ON a.t < b.t AND levenshtein(a.t, b.t) = 1 "
            "ORDER BY tok_a, tok_b"
        ),
        "events_diff_in_diff": (
            # DiD: (arm × period) integer cells (value e2), double means,
            # identical expression tree for the estimate on both sides
            "WITH c AS (SELECT CAST(user_id % 2 AS BIGINT) AS treated, "
            "CAST(CASE WHEN EXTRACT(day FROM ts) > 15 THEN 1 ELSE 0 END "
            "AS BIGINT) AS post, "
            "CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS s, "
            "CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1, 2), "
            "d AS (SELECT ((SELECT CAST(s AS DOUBLE) / CAST(n AS DOUBLE) "
            "FROM c WHERE treated = 1 AND post = 1) "
            "- (SELECT CAST(s AS DOUBLE) / CAST(n AS DOUBLE) "
            "FROM c WHERE treated = 1 AND post = 0)) "
            "- ((SELECT CAST(s AS DOUBLE) / CAST(n AS DOUBLE) "
            "FROM c WHERE treated = 0 AND post = 1) "
            "- (SELECT CAST(s AS DOUBLE) / CAST(n AS DOUBLE) "
            "FROM c WHERE treated = 0 AND post = 0)) AS did) "
            "SELECT treated, post, n AS n_events, "
            "CAST(FLOOR(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) * 1e4 + 0.5) "
            "AS BIGINT) AS mean_e6, "
            "CAST(FLOOR(d.did * 1e4 + 0.5) AS BIGINT) AS did_e6 "
            "FROM c CROSS JOIN d ORDER BY treated, post"
        ),
        "events_cuped_adjust": (
            # CUPED: per-user pre(X)/post(Y) totals; pooled theta =
            # cov/var from exact integer moments; identical double
            # expression tree on both sides
            "WITH u AS (SELECT user_id, "
            "CAST(SUM(CASE WHEN EXTRACT(day FROM ts) <= 15 "
            "THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT) ELSE 0 END) "
            "AS BIGINT) AS x, "
            "CAST(SUM(CASE WHEN EXTRACT(day FROM ts) > 15 "
            "THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT) ELSE 0 END) "
            "AS BIGINT) AS y FROM events GROUP BY user_id), "
            "m AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n, "
            "CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy, "
            "CAST(SUM(x * y) AS HUGEINT) AS sxy, "
            "CAST(SUM(x * x) AS HUGEINT) AS sxx FROM u), "
            "t AS (SELECT CASE WHEN n * sxx - sx * sx = 0 THEN 0.0 "
            "ELSE CAST(n * sxy - sx * sy AS DOUBLE) "
            "/ CAST(n * sxx - sx * sx AS DOUBLE) END AS theta, "
            "CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS gx FROM m), "
            "g AS (SELECT user_id % 2 AS grp, "
            "CAST(COUNT(*) AS BIGINT) AS n_users, "
            "CAST(SUM(x) AS BIGINT) AS sxg, CAST(SUM(y) AS BIGINT) AS syg "
            "FROM u GROUP BY 1) "
            "SELECT CAST(grp AS BIGINT) AS grp, n_users, "
            "CAST(FLOOR(CAST(syg AS DOUBLE) / CAST(n_users AS DOUBLE) "
            "* 1e6 + 0.5) AS BIGINT) AS mean_y_e6, "
            "CAST(FLOOR((CAST(syg AS DOUBLE) / CAST(n_users AS DOUBLE) "
            "- t.theta * (CAST(sxg AS DOUBLE) / CAST(n_users AS DOUBLE) "
            "- t.gx)) * 1e6 + 0.5) AS BIGINT) AS mean_adj_e6, "
            "CAST(FLOOR(t.theta * 1e6 + 0.5) AS BIGINT) AS theta_e6 "
            "FROM g CROSS JOIN t ORDER BY grp"
        ),
        "events_seasonal_decompose": (
            # additive decomposition: daily mean (floor e6) -> centered
            # 7-day MA trend -> truncating dow seasonal -> remainder;
            # full windows only; all-integer on both sides
            "WITH d AS (SELECT strftime(ts, '%Y-%m-%d') AS day, "
            "CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS s, "
            "CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1), "
            "m AS (SELECT day, (s * 1000000) // n AS mv FROM d), "
            "w AS (SELECT day, mv, "
            "CAST(SUM(mv) OVER win AS BIGINT) AS ws, "
            "COUNT(*) OVER win AS cnt FROM m "
            "WINDOW win AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)), "
            "core AS (SELECT day, mv, ws // 7 AS trend, mv - ws // 7 AS x, "
            "CAST(dayofweek(CAST(day AS DATE)) AS BIGINT) AS dow "
            "FROM w WHERE cnt = 7), "
            "sea AS (SELECT dow, CAST(SUM(x) AS BIGINT) // "
            "CAST(COUNT(*) AS BIGINT) AS sv FROM core GROUP BY dow) "
            "SELECT core.day, CAST(mv AS BIGINT) AS mean_e6, "
            "CAST(trend AS BIGINT) AS trend_e6, "
            "CAST(sea.sv AS BIGINT) AS seasonal_e6, "
            "CAST(x - sea.sv AS BIGINT) AS remainder_e6 "
            "FROM core JOIN sea USING (dow) ORDER BY core.day"
        ),
        "conformal_token_interval": (
            # split-conformal: q_hat = ceil((n_cal+1)*0.9)-th smallest
            # |n_tokens - n_chars//6| on the md5 val split (bucket 8);
            # coverage counted on the test split (bucket 9) — all integer
            "WITH f AS (SELECT "
            "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)) "
            "AS INT) % 10 AS bucket, "
            "ABS(CAST(len(list_filter(string_split(text, ' '), "
            "x -> x <> '')) AS BIGINT) "
            "- CAST(LENGTH(text) AS BIGINT) // 6) AS r FROM documents), "
            "cal AS (SELECT r FROM f WHERE bucket = 8), "
            "n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cal FROM cal), "
            "q AS (SELECT r AS q_hat FROM cal CROSS JOIN n "
            "ORDER BY r LIMIT 1 OFFSET "
            "(SELECT CAST(-((-(n_cal + 1) * 90) // 100) AS BIGINT) - 1 "
            "FROM n)), "
            "t AS (SELECT r FROM f WHERE bucket = 9) "
            "SELECT q.q_hat, n.n_cal, "
            "CAST(COUNT(*) AS BIGINT) AS n_test, "
            "CAST(SUM(CASE WHEN t.r <= q.q_hat THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_covered FROM t CROSS JOIN q CROSS JOIN n "
            "GROUP BY q.q_hat, n.n_cal"
        ),
        "events_hbos_outliers": (
            # integer HBOS: rarity = f(value bin) * f(hour bin), bottom-20
            "WITH e AS (SELECT event_id, "
            "CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v_e2, "
            "CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour FROM events), "
            "fv AS (SELECT v_e2, CAST(COUNT(*) AS BIGINT) AS f_v "
            "FROM e GROUP BY v_e2), "
            "fh AS (SELECT hour, CAST(COUNT(*) AS BIGINT) AS f_h "
            "FROM e GROUP BY hour) "
            "SELECT e.event_id, e.v_e2, e.hour, fv.f_v, fh.f_h, "
            "fv.f_v * fh.f_h AS rarity "
            "FROM e JOIN fv USING (v_e2) JOIN fh USING (hour) "
            "ORDER BY rarity, e.event_id LIMIT 20"
        ),
        "doc_blocklist_filter": (
            # word-boundary blocklist hits; RE2 on both sides so the
            # non-overlapping match counts agree exactly
            "SELECT doc_id, n_hits FROM (SELECT doc_id, "
            "CAST(len(regexp_extract_all(lower(text), "
            "'\\b(?:spark|dup|skew)\\b')) AS BIGINT) AS n_hits "
            "FROM documents) WHERE n_hits > 0"
        ),
        "events_kendall_tau": (
            # Kendall tau-b: C/D brute-forced by an O(n^2) self-join per
            # type (each unordered pair counted twice, halved at the
            # end); tie terms from integer marginals; the tau expression
            # mirrors the engine's single float formula term-by-term
            "WITH b AS (SELECT event_type, "
            "CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v, "
            "CAST(EXTRACT(hour FROM ts) AS BIGINT) AS h FROM events), "
            "p AS (SELECT x.event_type AS event_type, "
            "CAST(SUM(CASE WHEN (x.v < y.v AND x.h < y.h) "
            "OR (x.v > y.v AND x.h > y.h) THEN 1 ELSE 0 END) AS BIGINT) AS c2, "
            "CAST(SUM(CASE WHEN (x.v < y.v AND x.h > y.h) "
            "OR (x.v > y.v AND x.h < y.h) THEN 1 ELSE 0 END) AS BIGINT) AS d2 "
            "FROM b x JOIN b y ON x.event_type = y.event_type GROUP BY 1), "
            "t AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM b "
            "GROUP BY 1), "
            "tv AS (SELECT event_type, CAST(SUM(c * (c - 1) // 2) AS BIGINT) "
            "AS n1 FROM (SELECT event_type, v, CAST(COUNT(*) AS BIGINT) AS c "
            "FROM b GROUP BY 1, 2) GROUP BY 1), "
            "th AS (SELECT event_type, CAST(SUM(c * (c - 1) // 2) AS BIGINT) "
            "AS n2 FROM (SELECT event_type, h, CAST(COUNT(*) AS BIGINT) AS c "
            "FROM b GROUP BY 1, 2) GROUP BY 1) "
            "SELECT t.event_type, t.n, c2 // 2 AS conc, d2 // 2 AS disc, "
            "CAST(FLOOR((CAST(c2 AS DOUBLE) / 2 - CAST(d2 AS DOUBLE) / 2) "
            "/ sqrt(CAST(t.n * (t.n - 1) // 2 - n1 AS DOUBLE) "
            "* CAST(t.n * (t.n - 1) // 2 - n2 AS DOUBLE)) * 1e6 + 0.5) "
            "AS BIGINT) AS tau_e6 "
            "FROM t JOIN p USING (event_type) JOIN tv USING (event_type) "
            "JOIN th USING (event_type) ORDER BY t.event_type"
        ),
        "data_quality_checks": (
            # constraint-audit census: PK uniqueness, two FK checks,
            # range/domain checks — one row per constraint
            "SELECT 'events_user_positive' AS constraint_name, "
            "CAST(COUNT(*) AS BIGINT) AS n_checked, "
            "CAST(SUM(CASE WHEN user_id < 1 THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_violations FROM events "
            "UNION ALL SELECT 'events_value_cap450', "
            "CAST(COUNT(*) AS BIGINT), "
            "CAST(SUM(CASE WHEN value > 450.0 THEN 1 ELSE 0 END) AS BIGINT) "
            "FROM events "
            "UNION ALL SELECT 'lineitem_fk_orders', "
            "(SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem), "
            "(SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l "
            "LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey "
            "WHERE o.o_orderkey IS NULL) "
            "UNION ALL SELECT 'lineitem_qty_range', "
            "(SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem), "
            "(SELECT CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50 "
            "THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem) "
            "UNION ALL SELECT 'orders_fk_customer', "
            "(SELECT CAST(COUNT(*) AS BIGINT) FROM orders), "
            "(SELECT CAST(COUNT(*) AS BIGINT) FROM orders o "
            "LEFT JOIN customer c ON o.o_custkey = c.c_custkey "
            "WHERE c.c_custkey IS NULL) "
            "UNION ALL SELECT 'orders_pk_unique', "
            "(SELECT CAST(COUNT(*) AS BIGINT) FROM orders), "
            "(SELECT CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) "
            "FROM orders) "
            "ORDER BY constraint_name"
        ),
        "orders_ivm_agg": (
            # incremental view maintenance: v1 aggregate, delta aggregate
            # from the deterministic CDC rule (same as orders_diff), and
            # the rebuilt-v2 aggregate the base+delta merge must equal
            "WITH v1 AS (SELECT o_orderpriority, "
            "CAST(COUNT(*) AS BIGINT) AS n_v1, "
            "CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) "
            "AS BIGINT) AS sum_v1_e2 FROM orders GROUP BY 1), "
            "v2rows AS (SELECT o_orderpriority, "
            "CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) + "
            "CASE WHEN o_orderpriority = '1-URGENT' THEN 100 ELSE 0 END AS p "
            "FROM orders WHERE o_orderkey % 97 <> 0 "
            "UNION ALL SELECT o_orderpriority, "
            "CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) FROM orders "
            "WHERE o_orderkey % 101 = 0), "
            "v2 AS (SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_v2, "
            "CAST(SUM(p) AS BIGINT) AS sum_v2_e2 FROM v2rows GROUP BY 1) "
            "SELECT o_orderpriority, n_v1, sum_v1_e2, "
            "n_v2 - n_v1 AS d_n, sum_v2_e2 - sum_v1_e2 AS d_s, "
            "n_v2, sum_v2_e2 "
            "FROM v1 JOIN v2 USING (o_orderpriority) ORDER BY o_orderpriority"
        ),
        "lineitem_exact_median_price": (
            # lower median as the k-th order statistic, k = ceil(n/2)
            "WITH p AS (SELECT CAST(FLOOR(l_extendedprice * 100 + 0.5) "
            "AS BIGINT) AS v FROM lineitem), "
            "t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
            "CAST((COUNT(*) + 1) // 2 AS BIGINT) AS k FROM p) "
            "SELECT t.n, t.k, "
            "(SELECT v FROM p ORDER BY v LIMIT 1 OFFSET "
            "(SELECT k - 1 FROM t)) AS median_e2 FROM t"
        ),
        "docs_phrase_search": (
            # exact-phrase adjacency via 1-based token ordinals: unnest
            # the same space-split both sides, self-join on pos+1
            "WITH toks AS (SELECT doc_id, arr[i] AS tok, i AS pos "
            "FROM (SELECT doc_id, string_split(text, ' ') AS arr "
            "FROM documents), "
            "LATERAL (SELECT unnest(generate_series(1, len(arr))) AS i)) "
            "SELECT a.doc_id, CAST(COUNT(*) AS BIGINT) AS n_matches, "
            "CAST(MIN(a.pos) AS BIGINT) AS first_pos "
            "FROM toks a JOIN toks b "
            "ON a.doc_id = b.doc_id AND b.pos = a.pos + 1 "
            "WHERE a.tok = 'table' AND b.tok = 'hash' "
            "GROUP BY 1 ORDER BY 1"
        ),
        "doc_readability": (
            # Flesch reading-ease census; sentences ≡ 1 (corpus has no
            # sentence punctuation), syllable proxy = vowel groups,
            # per-doc score floored to e3 BEFORE the order-free sum
            "WITH d AS (SELECT source, string_split(text, ' ') AS arr "
            "FROM documents), "
            "t AS (SELECT source, CAST(len(arr) AS BIGINT) AS w, "
            "(SELECT CAST(COALESCE(SUM(len(regexp_extract_all(arr[i], "
            "'[aeiou]+'))), 0) AS BIGINT) FROM "
            "unnest(generate_series(1, len(arr))) AS g(i)) AS s FROM d) "
            "SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs, "
            "CAST(SUM(w) AS BIGINT) AS sum_words, "
            "CAST(SUM(s) AS BIGINT) AS sum_syllables, "
            "CAST(SUM(CAST(FLOOR((206.835e0 - 1.015e0 * w - 84.6e0 * "
            "(CAST(s AS DOUBLE) / w)) * 1000.0e0 + 0.5e0) AS BIGINT)) "
            "AS BIGINT) AS sum_flesch_e3 "
            "FROM t GROUP BY source ORDER BY source"
        ),
        "events_psi_drift": (
            # PSI between the first/second half of the day range: e9
            # integer per-bin contributions (identical clip+ln exprs)
            "WITH lohi AS (SELECT MIN(CAST(ts AS DATE)) AS lo, "
            "MAX(CAST(ts AS DATE)) AS hi FROM events), "
            "b AS (SELECT event_type, "
            "CAST(FLOOR(value * 100 + 0.5) AS BIGINT) // 5000 AS vb, "
            "date_diff('day', lohi.lo, CAST(ts AS DATE)) AS di, "
            "date_diff('day', lohi.lo, lohi.hi) // 2 AS mid "
            "FROM events, lohi), "
            "h AS (SELECT event_type, vb, "
            "CAST(SUM(CASE WHEN di <= mid THEN 1 ELSE 0 END) AS BIGINT) AS na, "
            "CAST(SUM(CASE WHEN di > mid THEN 1 ELSE 0 END) AS BIGINT) AS nbb "
            "FROM b GROUP BY 1, 2), "
            "t AS (SELECT event_type, CAST(SUM(na) AS BIGINT) AS n_a, "
            "CAST(SUM(nbb) AS BIGINT) AS n_b FROM h GROUP BY 1) "
            "SELECT t.event_type, t.n_a, t.n_b, "
            "CAST(SUM(CAST(FLOOR((GREATEST(CAST(na AS DOUBLE) / t.n_a, 1e-6) "
            "- GREATEST(CAST(nbb AS DOUBLE) / t.n_b, 1e-6)) "
            "* ln(GREATEST(CAST(na AS DOUBLE) / t.n_a, 1e-6) "
            "/ GREATEST(CAST(nbb AS DOUBLE) / t.n_b, 1e-6)) * 1e9 + 0.5) "
            "AS BIGINT)) AS BIGINT) AS psi_e9 "
            "FROM h JOIN t USING (event_type) "
            "GROUP BY t.event_type, t.n_a, t.n_b ORDER BY t.event_type"
        ),
        "golden_records": (
            # cluster labels as in dup_clusters, then per-cluster
            # survivorship: longest-text member (tie min doc_id) carries
            # the content, min id is the canonical key
            "WITH RECURSIVE toks AS (SELECT doc_id, "
            "regexp_extract_all(lower(text), '[a-z0-9_'']+') AS w FROM documents), "
            "sh AS (SELECT doc_id, CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')] "
            "ELSE list_distinct(list_transform(range(1, len(w) - 1), "
            "i -> array_to_string(w[i:i+2], ' '))) END AS s FROM toks WHERE len(w) > 0), "
            "pairs AS (SELECT a, b FROM ("
            "SELECT x.doc_id AS a, y.doc_id AS b, "
            "CAST(FLOOR(len(list_intersect(x.s, y.s)) * 10000.0 / "
            "(len(x.s) + len(y.s) - len(list_intersect(x.s, y.s))) + 0.5) AS BIGINT) AS j "
            "FROM sh x JOIN sh y ON x.doc_id < y.doc_id "
            "WHERE len(list_intersect(x.s, y.s)) > 0) WHERE j >= 4000), "
            "edges AS (SELECT a, b FROM pairs UNION SELECT b AS a, a AS b FROM pairs), "
            "reach AS (SELECT doc_id, doc_id AS r FROM documents "
            "UNION SELECT e.b AS doc_id, reach.r FROM reach JOIN edges e ON e.a = reach.doc_id), "
            "lab AS (SELECT doc_id, MIN(r) AS cluster_id FROM reach GROUP BY doc_id), "
            "j AS (SELECT lab.cluster_id, d.doc_id, d.n_chars, d.lang, "
            "ROW_NUMBER() OVER (PARTITION BY lab.cluster_id "
            "ORDER BY d.n_chars DESC, d.doc_id ASC) AS rn "
            "FROM lab JOIN documents d USING (doc_id)), "
            "agg AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS n_members, "
            "CAST(MIN(doc_id) AS BIGINT) AS canonical_id FROM j GROUP BY 1) "
            "SELECT CAST(agg.cluster_id AS BIGINT) AS cluster_id, agg.n_members, "
            "agg.canonical_id, CAST(j.doc_id AS BIGINT) AS survivor_id, "
            "CAST(j.n_chars AS BIGINT) AS max_chars, j.lang AS survivor_lang "
            "FROM agg JOIN j ON j.cluster_id = agg.cluster_id AND j.rn = 1 "
            "ORDER BY cluster_id"
        ),
        "events_kanonymity_audit": (
            # k-anonymity: QI combos with fewer than 5 rows
            "SELECT event_type, "
            "CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour, "
            "CAST(FLOOR(value * 100 + 0.5) AS BIGINT) // 5000 AS vbucket, "
            "CAST(COUNT(*) AS BIGINT) AS n FROM events "
            "GROUP BY 1, 2, 3 HAVING COUNT(*) < 5 "
            "ORDER BY event_type, hour, vbucket"
        ),
        "events_ldiversity_audit": (
            # l-diversity: QI combos with fewer than 3 distinct users
            "SELECT event_type, "
            "CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour, "
            "CAST(FLOOR(value * 100 + 0.5) AS BIGINT) // 5000 AS vbucket, "
            "CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users "
            "FROM events GROUP BY 1, 2, 3 "
            "HAVING COUNT(DISTINCT user_id) < 3 "
            "ORDER BY event_type, hour, vbucket"
        ),
        "events_tcloseness_audit": (
            # t-closeness: QI groups whose ordered-EMD to the global
            # sensitive-value distribution exceeds t=0.02; exact integer
            # cumulatives over the n*nt common denominator, one final
            # float division identical to the engine's expression tree
            "WITH b AS (SELECT event_type, "
            "CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour, "
            "CAST(FLOOR(value * 100 + 0.5) AS BIGINT) // 5000 AS vb "
            "FROM events), "
            "dom AS (SELECT vb, CAST(COUNT(*) AS BIGINT) AS cg FROM b GROUP BY 1), "
            "tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS nt FROM b), "
            "grp AS (SELECT event_type, hour, CAST(COUNT(*) AS BIGINT) AS n "
            "FROM b GROUP BY 1, 2), "
            "cnt AS (SELECT event_type, hour, vb, CAST(COUNT(*) AS BIGINT) AS c "
            "FROM b GROUP BY 1, 2, 3), "
            "fullg AS (SELECT g.event_type, g.hour, d.vb, g.n, d.cg, "
            "COALESCE(c.c, 0) AS c FROM grp g CROSS JOIN dom d "
            "LEFT JOIN cnt c ON c.event_type = g.event_type "
            "AND c.hour = g.hour AND c.vb = d.vb), "
            "cum AS (SELECT event_type, hour, n, vb, "
            "SUM(c) OVER (PARTITION BY event_type, hour ORDER BY vb) AS cumc, "
            "SUM(cg) OVER (PARTITION BY event_type, hour ORDER BY vb) AS cumcg, "
            "COUNT(*) OVER (PARTITION BY event_type, hour) AS m FROM fullg), "
            "emd AS (SELECT event_type, hour, "
            "CASE WHEN MAX(m) > 1 THEN "
            "CAST(FLOOR(CAST(SUM(ABS(cumc * (SELECT nt FROM tot) - cumcg * n)) "
            "AS DOUBLE) * 1e6 / (CAST(n AS DOUBLE) * (SELECT nt FROM tot) "
            "* (MAX(m) - 1)) + 0.5) AS BIGINT) ELSE 0 END AS emd_e6 "
            "FROM cum GROUP BY event_type, hour, n) "
            "SELECT event_type, hour, emd_e6 FROM emd WHERE emd_e6 > 20000 "
            "ORDER BY event_type, hour"
        ),
        "events_fdr_bh": (
            # Benjamini-Hochberg over per-(event_type, hour) mean z-tests:
            # A&S 7.1.26 erfc polynomial for p (identical expression tree),
            # integer-scaled p before the exact-integer step-up arithmetic
            "WITH b AS (SELECT event_type, "
            "CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour, "
            "CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS x FROM events), "
            "g AS (SELECT event_type, hour, CAST(COUNT(*) AS BIGINT) AS n, "
            "CAST(SUM(x) AS BIGINT) AS s1 FROM b GROUP BY 1, 2), "
            "o AS (SELECT CAST(COUNT(*) AS BIGINT) AS n0, "
            "CAST(SUM(x) AS BIGINT) AS s1g, "
            "CAST(SUM(x * x) AS BIGINT) AS s2g FROM b), "
            "z AS (SELECT event_type, hour, n, "
            "ABS((CAST(s1 AS DOUBLE) / n - CAST(s1g AS DOUBLE) / n0) "
            "/ sqrt((CAST(s2g AS DOUBLE) / n0 "
            "- (CAST(s1g AS DOUBLE) / n0) * (CAST(s1g AS DOUBLE) / n0)) / n)) AS az "
            "FROM g CROSS JOIN o), "
            "p AS (SELECT event_type, hour, n, "
            "CAST(FLOOR(((((((1.061405429 * tt - 1.453152027) * tt "
            "+ 1.421413741) * tt - 0.284496736) * tt + 0.254829592) * tt) "
            "* exp(-aa * aa)) * 1e6 + 0.5) AS BIGINT) AS p_e6 "
            "FROM (SELECT event_type, hour, n, az / sqrt(2.0) AS aa, "
            "1.0 / (1.0 + 0.3275911 * (az / sqrt(2.0))) AS tt FROM z) q), "
            "r AS (SELECT event_type, hour, n, p_e6, "
            "ROW_NUMBER() OVER (ORDER BY p_e6, event_type, hour) AS i, "
            "CAST(COUNT(*) OVER () AS BIGINT) AS m FROM p), "
            "a AS (SELECT event_type, hour, n, p_e6, i, m, "
            "MIN(LEAST(1000000, (p_e6 * m) // i)) OVER "
            "(ORDER BY i ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) "
            "AS padj_e6 FROM r), "
            "k AS (SELECT COALESCE(MAX(i) FILTER (WHERE p_e6 * m <= 50000 * i), "
            "0) AS kk FROM r) "
            "SELECT event_type, hour, n, p_e6, padj_e6, "
            "CAST(CASE WHEN i <= kk THEN 1 ELSE 0 END AS BIGINT) AS rejected "
            "FROM a CROSS JOIN k ORDER BY event_type, hour"
        ),
        "revenue_monthly_sortmerge": (
            # plain SQL join — the engine side must reproduce it through
            # the range-partitioned sort-merge strategy
            "SELECT strftime(o_orderdate, '%Y-%m') AS month, "
            "CAST(COUNT(*) AS BIGINT) AS n_items, "
            "CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) "
            "AS BIGINT) AS revenue_e2 "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "GROUP BY 1 ORDER BY 1"
        ),
        "events_value_zscore": (
            # per-row population z-score from exact integer moments;
            # identical float expression tree on both sides
            "WITH b AS (SELECT event_id, event_type, "
            "CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS x FROM events), "
            "a AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, "
            "CAST(SUM(x) AS BIGINT) AS s1, CAST(SUM(x * x) AS BIGINT) AS s2 "
            "FROM b GROUP BY 1) "
            "SELECT b.event_id, b.event_type, b.x AS v_e2, "
            "CAST(FLOOR((b.x - CAST(s1 AS DOUBLE) / n) "
            "/ sqrt(CAST(s2 AS DOUBLE) / n "
            "- (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)) "
            "* 1e6 + 0.5) AS BIGINT) AS z_e6 "
            "FROM b JOIN a USING (event_type) ORDER BY b.event_id"
        ),
        "part_snm_pairs": (
            # sorted-neighborhood blocking: rank self-join within the
            # window, integer token-Jaccard (e4 truncating div) verify
            "WITH t AS (SELECT p_partkey, "
            "ROW_NUMBER() OVER (ORDER BY p_name, p_partkey) AS rn, "
            "list_distinct(list_filter(string_split(p_name, ' '), "
            "x -> x <> '')) AS tok FROM part), "
            "p AS (SELECT LEAST(x.p_partkey, y.p_partkey) AS a, "
            "GREATEST(x.p_partkey, y.p_partkey) AS b, "
            "CAST(len(list_intersect(x.tok, y.tok)) AS BIGINT) * 10000 "
            "// CAST(len(list_distinct(list_concat(x.tok, y.tok))) AS BIGINT) "
            "AS sim_e4 "
            "FROM t x JOIN t y ON y.rn > x.rn AND y.rn - x.rn < 5) "
            "SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b, sim_e4 "
            "FROM p WHERE sim_e4 >= 6000 ORDER BY a, b"
        ),
        "events_daily_dense": (
            # calendar-spine densification: every (type, day) cell over
            # the global min..max day range, zero-filled
            "WITH d AS (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, "
            "CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1, 2), "
            "b AS (SELECT MIN(CAST(day AS DATE)) AS lo, "
            "MAX(CAST(day AS DATE)) AS hi FROM d), "
            "spine AS (SELECT strftime(CAST(b.lo AS TIMESTAMP) "
            "+ i * INTERVAL 1 DAY, '%Y-%m-%d') AS day "
            "FROM b, range(0, 1000000) r(i) "
            "WHERE i <= date_diff('day', b.lo, b.hi)), "
            "ty AS (SELECT DISTINCT event_type FROM events) "
            "SELECT ty.event_type, spine.day, COALESCE(d.n, 0) AS n "
            "FROM ty CROSS JOIN spine "
            "LEFT JOIN d ON d.event_type = ty.event_type AND d.day = spine.day "
            "ORDER BY ty.event_type, spine.day"
        ),
        "orders_benford_digits": (
            # first-significant-digit census of the cent-integer price;
            # digit via string head (no float log10 edges), reference
            # curve via the same log10 floor on both sides
            "WITH p AS (SELECT CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) "
            "AS v FROM orders), "
            "c AS (SELECT CAST(SUBSTR(CAST(v AS VARCHAR), 1, 1) AS BIGINT) "
            "AS digit, CAST(COUNT(*) AS BIGINT) AS n FROM p GROUP BY 1), "
            "t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM c) "
            "SELECT d.digit, COALESCE(c.n, 0) AS n, "
            "CAST(FLOOR(CAST(COALESCE(c.n, 0) AS DOUBLE) / t.total * 1e6 "
            "+ 0.5) AS BIGINT) AS share_e6, "
            "CAST(FLOOR(log10(1.0 + 1.0 / d.digit) * 1e6 + 0.5) AS BIGINT) "
            "AS benford_e6 "
            "FROM (SELECT CAST(d AS BIGINT) AS digit FROM range(1, 10) r(d)) d "
            "LEFT JOIN c USING (digit) CROSS JOIN t ORDER BY d.digit"
        ),
        "lineitem_qty_means": (
            # Pythagorean means from per-distinct-value integer floors:
            # ln(q) e9 and 1/q e12 are exact int64 sums on both sides;
            # each mean is the engine's float expression verbatim
            "WITH c AS (SELECT l_returnflag, "
            "CAST(FLOOR(l_quantity + 0.5) AS BIGINT) AS q, "
            "CAST(COUNT(*) AS BIGINT) AS n FROM lineitem GROUP BY 1, 2), "
            "a AS (SELECT l_returnflag, CAST(SUM(n) AS BIGINT) AS n, "
            "CAST(SUM(n * q) AS BIGINT) AS s_q, "
            "CAST(SUM(n * CAST(FLOOR(ln(CAST(q AS DOUBLE)) * 1e9) AS BIGINT)) "
            "AS BIGINT) AS s_ln, "
            "CAST(SUM(n * CAST(FLOOR(1e12 / q) AS BIGINT)) AS BIGINT) AS s_r "
            "FROM c GROUP BY 1) "
            "SELECT l_returnflag, n, "
            "CAST(FLOOR(CAST(s_q AS DOUBLE) / n * 1e6 + 0.5) AS BIGINT) "
            "AS mean_e6, "
            "CAST(FLOOR(exp(CAST(s_ln AS DOUBLE) / (CAST(n AS DOUBLE) * 1e9)) "
            "* 1e6 + 0.5) AS BIGINT) AS geo_e6, "
            "CAST(FLOOR(CAST(n AS DOUBLE) * 1e12 / CAST(s_r AS DOUBLE) "
            "* 1e6 + 0.5) AS BIGINT) AS harm_e6 "
            "FROM a ORDER BY l_returnflag"
        ),
        "lineitem_mode_quantity": (
            # grouped MODE with deterministic max-count / min-value
            # tie-break; quantities are integral so FLOOR(x+0.5) is exact
            "WITH c AS (SELECT l_returnflag, "
            "CAST(FLOOR(l_quantity + 0.5) AS BIGINT) AS q, "
            "CAST(COUNT(*) AS BIGINT) AS n FROM lineitem GROUP BY 1, 2), "
            "r AS (SELECT l_returnflag, q, n, "
            "ROW_NUMBER() OVER (PARTITION BY l_returnflag "
            "ORDER BY n DESC, q ASC) AS rn, "
            "CAST(SUM(n) OVER (PARTITION BY l_returnflag) AS BIGINT) AS tot "
            "FROM c) "
            "SELECT l_returnflag, q AS mode_qty, n AS n_mode, tot AS n_rows "
            "FROM r WHERE rn = 1 ORDER BY l_returnflag"
        ),
    }
    # max_df=50 provably drops nothing on the fixtures (max shingle df < 10),
    # so the guarded query shares the exact oracle.
    sql["ngram_jaccard_maxdf"] = sql["ngram_jaccard_pairs"]
    return sql
