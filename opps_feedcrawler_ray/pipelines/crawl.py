"""The flagship crawl pipeline (SURVEY.md §3.2 E1): iterative BFS of
(poll ready → fetch-join → extract → offer discovered), Ray-Data-first.

Data never materializes on the driver: ready batches flow as Arrow
object refs from frontier actors into a Dataset
(``ray.data.from_arrow_refs``), every transform is ``map_batches`` over
zero-copy Arrow, the fetch join reads only the bucketed pages partition
it needs, and the only driver-side values are counters, per-host ready
counts (metadata for fetch_seq assignment) and object refs.

Determinism (SURVEY.md §2.12, frozen): per round each host emits up to
``politeness_budget`` URLs ordered (priority DESC, round-discovered ASC,
url ASC); the round serializes hosts ASC; ``fetch_seq`` enumerates that
serialization globally.  No RNG, no wall clock anywhere in the loop.
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..functions.hashing import fingerprint64, fingerprint64_batch
from ..sources.io import ingest_pages, read_bucket
from ..stages.urlstages import CanonicalizeStage, ExtractStage, explode_links
from ..state.frontier import FrontierActor

LOG_COLUMNS = ["url", "host", "round", "fetch_seq", "warc_ts", "text", "lang", "n_links", "status"]


@dataclass
class CrawlConfig:
    pages_path: str
    seeds_path: str
    out_dir: str
    num_frontier_actors: int = 8
    politeness_budget: int = 8
    max_rounds: int = 1000
    num_buckets: int = 32
    filter_capacity: int = 1 << 20
    store_exact: bool = True          # verification mode: exact dedup + seen-set export
    checkpoint_every: int = 1         # rounds between checkpoints (0 = off)
    actor_num_cpus: float = 0.5
    extract_concurrency: int | None = None   # None → stateless tasks (elastic)
    resume: bool = False
    stats: dict = field(default_factory=dict)


def _shard_indices(hosts: pa.ChunkedArray | pa.Array, num_shards: int) -> list[int]:
    """Per-row shard ids via dictionary-encoding: hash UNIQUE hosts only."""
    if isinstance(hosts, pa.ChunkedArray):
        hosts = hosts.combine_chunks()
    d = hosts.dictionary_encode()
    uniq = d.dictionary.to_pylist()
    shard_of_uniq = [fingerprint64(h) % num_shards for h in uniq]
    idx = d.indices.to_pylist()
    return [shard_of_uniq[i] for i in idx]


class _RouteToActors:
    """map_batches stage that routes rows to frontier shards and calls
    ``actor.<method>(sub_table)``, blocking on acks (round barrier).
    Emits one row of counts per batch — metadata, not data."""

    def __init__(self, actors: list, method: str) -> None:
        self.actors = actors
        self.method = method

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"offered": pa.array([0], pa.int64()),
                             "admitted": pa.array([0], pa.int64()),
                             "robots_blocked": pa.array([0], pa.int64())})
        shards = _shard_indices(batch["host"], len(self.actors))
        shard_arr = pa.array(shards, pa.int32())
        refs = []
        for s in sorted(set(shards)):
            sub = batch.filter(pc.equal(shard_arr, s))
            refs.append(getattr(self.actors[s], self.method).remote(sub))
        totals = {"offered": 0, "admitted": 0, "robots_blocked": 0}
        for r in ray.get(refs):
            if isinstance(r, dict):
                for k in totals:
                    totals[k] += r.get(k, 0)
        return pa.table({k: pa.array([v], pa.int64()) for k, v in totals.items()})


def _prepare_candidates(ds: rd.Dataset, default_priority: float | None = None) -> rd.Dataset:
    """url (+priority, round) → canonical url, surt, host, url_hash rows."""
    canon = CanonicalizeStage()

    def fn(batch: pa.Table) -> pa.Table:
        t = canon(batch)
        if "priority" not in t.column_names:
            t = t.append_column(
                "priority", pa.array([default_priority] * t.num_rows, pa.float64())
            )
        if "round" not in t.column_names:
            t = t.append_column("round", pa.array([0] * t.num_rows, pa.int32()))
        return t.select(["url", "url_hash", "surt", "host", "priority", "round"])

    return ds.map_batches(fn, batch_format="pyarrow")


class _FetchSim:
    """Per-bucket fetch join against the bucketed pages layout (J1).
    Used inside groupby("bucket").map_groups — ONE pages read per bucket
    per round, partition-pruned; pages bytes never shuffle."""

    def __init__(self, bucketed_dir: str) -> None:
        self.dir = bucketed_dir

    def __call__(self, group: pa.Table) -> pa.Table:
        bucket = int(group["bucket"][0].as_py())
        urls = group["url"]
        if isinstance(urls, pa.ChunkedArray):
            urls = urls.combine_chunks()
        pages = read_bucket(self.dir, bucket, urls)
        page_idx = {u: i for i, u in enumerate(pages["url"].to_pylist())}
        order = [page_idx.get(u) for u in urls.to_pylist()]
        found_mask = pa.array([i is not None for i in order])
        taken = pages.take(pa.array([i for i in order if i is not None], pa.int64()))
        n = group.num_rows
        # left-outer: align page columns to the ready rows
        out = group.drop_columns(["bucket"])
        ti = 0
        cols = {}
        for name, typ in (("warc_ts", pa.timestamp("us")), ("html", pa.binary()), ("lang", pa.string())):
            vals = [None] * n
            ti = 0
            for i, hit in enumerate(found_mask.to_pylist()):
                if hit:
                    vals[i] = taken[name][ti].as_py()
                    ti += 1
            cols[name] = pa.array(vals, typ)
        status = pa.array(
            ["fetched" if h else "not_found" for h in found_mask.to_pylist()], pa.string()
        )
        for name, arr in cols.items():
            out = out.append_column(name, arr)
        return out.append_column("status", status)


class _AssignSeq:
    """fetch_seq = base_offset[host] + host_rank (broadcast offsets via
    ray.put — read once per task, never re-shipped per batch)."""

    def __init__(self, offsets_ref) -> None:
        self.offsets_ref = offsets_ref
        self._offsets = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._offsets is None:
            self._offsets = ray.get(self.offsets_ref)
        off = self._offsets
        hosts = batch["host"].to_pylist()
        ranks = batch["host_rank"].to_pylist()
        seq = pa.array([off[h] + r for h, r in zip(hosts, ranks)], pa.int64())
        return batch.append_column("fetch_seq", seq)


def _load_robots_into_actors(cfg: CrawlConfig, actors: list) -> None:
    """Pre-scan pages for robots.txt bodies and deliver each shard its
    hosts' rules (host-partitioned — no broadcast of the full set)."""

    router_actors = actors

    def to_robots(batch: pa.Table) -> pa.Table:
        mask = pc.ends_with(batch["url"], pattern="/robots.txt")
        sub = batch.filter(mask)
        if sub.num_rows == 0:
            return pa.table({"host": pa.array([], pa.string()),
                             "body": pa.array([], pa.binary())})
        hosts = [u[len("http://"):].split("/", 1)[0] if u.startswith("http://")
                 else u[len("https://"):].split("/", 1)[0]
                 for u in sub["url"].to_pylist()]
        return pa.table({"host": pa.array(hosts, pa.string()), "body": sub["html"]})

    class RobotsRouter:
        def __call__(self, batch: pa.Table) -> pa.Table:
            if batch.num_rows:
                shards = _shard_indices(batch["host"], len(router_actors))
                shard_arr = pa.array(shards, pa.int32())
                refs = [
                    router_actors[s].load_robots.remote(batch.filter(pc.equal(shard_arr, s)))
                    for s in sorted(set(shards))
                ]
                ray.get(refs)
            return pa.table({"n": pa.array([batch.num_rows], pa.int64())})

    (
        rd.read_parquet(cfg.pages_path, columns=["url", "html"])
        .map_batches(to_robots, batch_format="pyarrow")
        .map_batches(RobotsRouter(), batch_format="pyarrow")
        .sum("n")
    )


def _write_manifest(cfg: CrawlConfig, round_idx: int, fetch_seq: int, lineage: list[dict]) -> None:
    ckpt_root = os.path.join(cfg.out_dir, "checkpoints")
    os.makedirs(ckpt_root, exist_ok=True)
    manifest = {
        "round": round_idx,
        "fetch_seq": fetch_seq,
        "num_shards": cfg.num_frontier_actors,
        "num_buckets": cfg.num_buckets,
        "politeness_budget": cfg.politeness_budget,
        "lineage": lineage,
    }
    tmp = os.path.join(ckpt_root, "_MANIFEST.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, os.path.join(ckpt_root, "_MANIFEST.json"))


def read_manifest(out_dir: str) -> dict | None:
    p = os.path.join(out_dir, "checkpoints", "_MANIFEST.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def crawl(cfg: CrawlConfig) -> dict:
    """Run the crawl; returns stats. Output layout under cfg.out_dir:
    crawl_log/round=N/*.parquet, seen_set/*.parquet, checkpoints/."""
    os.makedirs(cfg.out_dir, exist_ok=True)
    if not cfg.resume:  # fresh run: clear stale outputs (write_parquet appends)
        for sub in ("crawl_log", "seen_set", "checkpoints"):
            shutil.rmtree(os.path.join(cfg.out_dir, sub), ignore_errors=True)
    else:
        shutil.rmtree(os.path.join(cfg.out_dir, "seen_set"), ignore_errors=True)
    bucketed = ingest_pages(
        cfg.pages_path, os.path.join(cfg.out_dir, "pages_bucketed"), cfg.num_buckets
    )

    actors = [
        FrontierActor.options(num_cpus=cfg.actor_num_cpus).remote(
            i,
            cfg.num_frontier_actors,
            politeness_budget=cfg.politeness_budget,
            filter_capacity=cfg.filter_capacity,
            store_exact=cfg.store_exact,
        )
        for i in range(cfg.num_frontier_actors)
    ]
    ckpt_dir = os.path.join(cfg.out_dir, "checkpoints")
    log_dir = os.path.join(cfg.out_dir, "crawl_log")

    start_round = 0
    fetch_seq = 0
    manifest = read_manifest(cfg.out_dir) if cfg.resume else None
    if manifest is not None:
        if manifest["num_shards"] != cfg.num_frontier_actors:
            raise ValueError("cannot resume with a different shard count (frozen in manifest)")
        ray.get([a.restore.remote(ckpt_dir) for a in actors])
        start_round = manifest["round"] + 1
        fetch_seq = manifest["fetch_seq"]
        # drop any partially-written rounds after the checkpoint (D3 guard)
        if os.path.isdir(log_dir):
            for d in os.listdir(log_dir):
                if d.startswith("round=") and int(d.split("=")[1]) >= start_round:
                    shutil.rmtree(os.path.join(log_dir, d))
    else:
        _load_robots_into_actors(cfg, actors)
        seeds = rd.read_parquet(cfg.seeds_path)
        offers = _prepare_candidates(seeds, default_priority=1.0).map_batches(
            _RouteToActors(actors, "offer"), batch_format="pyarrow"
        )
        cfg.stats["seed_offered"] = int(offers.sum("offered") or 0)

    extract = ExtractStage()
    rounds_run = 0
    total_fetched = 0
    total_not_found = 0

    for r in range(start_round, cfg.max_rounds):
        ready_refs = [a.poll_ready.remote(r) for a in actors]
        metas = ray.get([a.poll_meta.remote() for a in actors])
        # poll_meta must observe the poll — enforce by getting polls' metadata
        # AFTER poll_ready completed: ray guarantees actor task order per caller,
        # and poll_meta was submitted after poll_ready on the same actor.
        n_ready = sum(sum(m.values()) for m in metas)
        if n_ready == 0:
            break
        # global fetch_seq offsets: hosts ASC across all shards (metadata only)
        host_counts: dict[str, int] = {}
        for m in metas:
            host_counts.update(m)
        offsets: dict[str, int] = {}
        acc = fetch_seq
        for h in sorted(host_counts):
            offsets[h] = acc
            acc += host_counts[h]
        fetch_seq = acc
        offsets_ref = ray.put(offsets)

        ready = rd.from_arrow_refs(ready_refs)
        nb = cfg.num_buckets

        def add_bucket(batch: pa.Table) -> pa.Table:
            h = batch["url_hash"].to_numpy(zero_copy_only=False)
            return batch.append_column("bucket", pa.array((h % nb).astype("int32")))

        fetch_sim = _FetchSim(bucketed)

        def fetch_group(group: pa.Table) -> pa.Table:
            return fetch_sim(group)

        fetched = (
            ready.map_batches(_AssignSeq(offsets_ref), batch_format="pyarrow")
            .map_batches(add_bucket, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(fetch_group, batch_format="pyarrow")
        )
        extracted = fetched.map_batches(
            extract,
            batch_format="pyarrow",
            **({"concurrency": cfg.extract_concurrency} if cfg.extract_concurrency else {}),
        ).materialize()  # round barrier: consumed twice (log sink + link frontier)

        extracted.select_columns(LOG_COLUMNS).write_parquet(
            os.path.join(log_dir, f"round={r}")
        )
        counts = extracted.groupby("status").count().take_all()
        by_status = {row["status"]: row["count()"] for row in counts}
        n_fetched = int(by_status.get("fetched", 0))
        n_missing = int(by_status.get("not_found", 0))
        total_fetched += n_fetched
        total_not_found += n_missing

        links = extracted.map_batches(
            lambda b, _r=r: explode_links(b, _r + 1), batch_format="pyarrow"
        )
        offers = _prepare_candidates(links).map_batches(
            _RouteToActors(actors, "offer"), batch_format="pyarrow"
        )
        offers.sum("offered")  # trigger + barrier

        if cfg.checkpoint_every and (r % cfg.checkpoint_every == 0):
            lineage = ray.get([a.checkpoint.remote(ckpt_dir, r) for a in actors])
            _write_manifest(cfg, r, fetch_seq, lineage)
        rounds_run += 1

    # final seen-set export (S6), verification mode only
    if cfg.store_exact:
        seen_refs = [a.export_seen.remote() for a in actors]
        rd.from_arrow_refs(seen_refs).sort("url_hash").write_parquet(
            os.path.join(cfg.out_dir, "seen_set")
        )
    stats = {
        "rounds": rounds_run,
        "fetch_seq": fetch_seq,
        "fetched": total_fetched,
        "not_found": total_not_found,
        "actor_stats": ray.get([a.stats.remote() for a in actors]),
    }
    cfg.stats.update(stats)
    return stats
