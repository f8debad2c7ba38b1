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
    # URL-seen filter kind: "cuckoo" (16-bit-fp cuckoo, deletable, ~12.8
    # bits/key) or "bloom" (pure bit-OR inserts, ~16 bits/key) — both give
    # NO false negatives; frozen in the checkpoint manifest
    seen_filter: str = "cuckoo"
    store_exact: bool = True          # verification mode: exact dedup + seen-set export
    # exact-store memtable cap per frontier shard: URL strings beyond this
    # spill to hash-sorted parquet segments under out_dir/exact_spill/
    # (membership keeps only 8 B/key hash arrays resident) — store_exact
    # stays usable at 10^10-URL scale
    exact_spill_threshold: int = 1 << 20
    # pending-QUEUE disk spill (frontier-memory bound at 10^10 URLs —
    # the pending frontier dwarfs the seen set): when a host's sorted
    # queue exceeds ``pending_spill_threshold`` rows after a poll, the
    # tail beyond ``pending_spill_keep`` rows is written to immutable
    # sorted parquet segments under out_dir/pending_spill/; segments
    # reload only when the resident head can no longer prove it
    # dominates every spilled row, so emitted order is byte-identical
    # to the no-spill run (tested).  0 = off.  Not manifest-frozen —
    # spill is semantically invisible, like fetch_strategy.
    pending_spill_threshold: int = 0
    pending_spill_keep: int | None = None
    checkpoint_every: int = 1         # rounds between checkpoints (0 = off)
    actor_num_cpus: float = 0  # frontier actors are RPC-driven; callers hold the CPU slot
    extract_concurrency: int | None = None   # None → stateless tasks (elastic)
    bucketed_dir: str | None = None          # share an ingested layout across runs
    # "objstore": bucket tables ray.put once at warm, zero-copy get +
    #           vectorized searchsorted in every fetch task (default —
    #           fastest measured; one object copy per node on a cluster);
    # "actors": bucket-affine FetchActor pool, pages read once per crawl,
    #           no per-round shuffle (memory = corpus/K/actor);
    # "direct"/"shuffle": partition-pruned disk reads per round
    #           (constant memory — the 100 TB cold paths)
    fetch_strategy: str = "objstore"
    num_fetch_actors: int = 8
    # ready-set block granularity (parallelism).  None → strategy default:
    # 6144 for "direct" (each chunk decodes its touched bucket partitions
    # whole, so decode amplification ≈ chunks-per-bucket — measured 1.4×
    # faster than 1024 at bench scale), 2048 otherwise (round-4 sweep:
    # fewer task boundaries beat 1024 at 32-way, neutral-or-better at 8).
    poll_chunk_rows: int | None = None
    priority_fn: object = None        # §2.10 hook: fn(next_round) -> priority float
    # in-degree link prioritization (Cho, García-Molina & Page 1998,
    # "Efficient crawling through URL ordering" — the backlink-count
    # ordering): a discovered URL's priority is boosted by
    # ln(1 + (in-batch in-link count − 1)) on top of the round's base
    # priority, so pages many fetched pages point at are fetched earlier
    # within their round.  Aliased raw forms that canonicalize to the
    # same URL pool their counts.  Deterministic (no RNG); off by
    # default — it reorders rows within a round, so goldens stay frozen.
    # Frozen in the checkpoint manifest (it changes frontier order).
    indegree_priority: bool = False
    # FOCUSED CRAWLING (Shark-Search lineage — Hersovici et al. 1998; De
    # Bra's fish search): outlinks inherit a relevance boost from their
    # PARENT page's text — priority = base + focus_boost·ln(1 + hits)
    # where hits = case-insensitive occurrence count of the configured
    # keywords in the parent's extracted text (capped at 8).  A URL
    # discovered from several parents keeps the MAX boosted priority
    # (aliased canonical forms too).  Zero-hit parents contribute the
    # exact base priority, so an all-irrelevant corpus is byte-identical
    # to flag-off.  Deterministic; frozen in the checkpoint manifest
    # (changes frontier order).  Mutually exclusive with
    # indegree_priority (two competing order rules).
    focus_keywords: list | None = None
    focus_boost: float = 0.5
    # §7.6 mega-host salting: {host: k} splits that host's frontier queue
    # across k sub-shards, each polled at budget//k per round (recombined
    # politeness stays ≤ budget; fetch_seq recombines via (host, sub)
    # offsets).  Opt-in — changes a salted host's intra-round order.
    salt_hosts: dict | None = None
    # per-host TOTAL page cap for the whole crawl (reference's per-feed
    # max_entries); None = unlimited.  Frozen in the checkpoint manifest.
    max_pages_per_host: int | None = None
    # §2.10 sink hook: fn(crawl_log_batch: pa.Table) -> None, called per
    # batch inside the round execution (the reference's post-save
    # publication surface).  Must be serializable (cloudpickle).
    sink_hook: object = None
    # conditional re-crawl for recurring feeds (If-Modified-Since
    # semantics over the simulated fetch): a re-fetch whose content
    # fingerprint equals the previous one is logged status="unchanged"
    # with empty text/links and is NOT re-parsed.  Off by default — it
    # changes recurring rows' log content, so goldens stay frozen.
    skip_unchanged: bool = False
    # adaptive revisit policy for recurring feeds (Cho & Garcia-Molina
    # 2003): an unchanged re-fetch doubles the feed's interval (capped at
    # base·adaptive_max_factor); a changed one resets it to the registered
    # base.  Independent of skip_unchanged — the page is still re-parsed
    # unless that flag is also set.
    adaptive_recrawl: bool = False
    adaptive_max_factor: int = 8
    # cross-URL content-digest dedup (Heritrix's "content-seen" test —
    # mirror/alias killer): a fetched body whose fingerprint was first
    # seen in a STRICTLY earlier round is logged status="dup_content"
    # with empty text/links and is NOT parsed; its outlinks are dropped
    # (the original copy's links won).  Within-round copies all parse —
    # visibility advances only at round boundaries (seal), so the
    # verdict is deterministic under any batch schedule.  Off by
    # default (changes log content, so goldens stay frozen).
    content_dedup: bool = False
    # honor <link rel="canonical"> (RFC 6596): the declared canonical URL
    # is recorded in the crawl log (extra ``canonical`` column) and offered
    # to the frontier like a discovered outlink.  Off by default — it adds
    # a log column, so goldens stay frozen.
    honor_canonical: bool = False
    # REP HTML bindings (opt-in): honor <meta name=robots> noindex /
    # nofollow / none and per-link rel=nofollow.  A noindex page logs
    # status="noindex" with empty text (its links are still followed —
    # the standard crawler reading); a nofollow/none page offers NO
    # outlinks; rel=nofollow targets are dropped from links/n_links.
    # Off by default — it changes log content, so goldens stay frozen.
    honor_nofollow: bool = False
    # soft-404 screening (opt-in): an HTTP-200 page whose extracted text
    # matches the FROZEN not-found signature (Bar-Yossef et al. WWW'04;
    # functions.extract.detect_soft404) logs status="soft404" with empty
    # text and offers NO outlinks.  Off by default (changes log content).
    soft404_detect: bool = False
    # follow <meta http-equiv=refresh> redirects (WHATWG pragma — the
    # corpus's hermetic 3xx analogue, since the pages table carries no
    # HTTP status): a page declaring an immediate refresh is logged
    # status="redirect" with empty text/links (transitional content is
    # not indexed) and the target is offered to the frontier.  Adds an
    # opt-in ``redirect`` log column; off by default (changes log
    # schema/content, so goldens stay frozen).
    follow_meta_refresh: bool = False
    # max declared delay (seconds) still treated as a redirect
    refresh_max_delay: int = 0
    # honor robots.txt "Sitemap:" directives (sitemaps.org extension):
    # declared sitemap URLs are offered alongside the seeds in round 0,
    # so a host's full page listing is discovered without being seeded.
    # Off by default (changes frontier contents).
    follow_robots_sitemaps: bool = False
    # crawler-trap guard over DISCOVERED links (None = off): kwargs for
    # functions.urlnorm.trap_mask, e.g. {"max_url_len": 2048,
    # "max_path_depth": 32, "max_segment_repeat": 3} — a path segment may
    # appear AT MOST max_segment_repeat times (the 4th /a/b repetition is
    # rejected at the default).  Query strings are exempt.  Rejected URLs
    # never reach the frontier (they also never enter the seen set, so a
    # later non-trap path to the same URL is unaffected).
    trap_guard: dict | None = None
    # tracking-parameter scrub (opt-in): query parameter names (exact or
    # ``prefix*`` wildcards, e.g. ["utm_*", "gclid", "fbclid"]) removed
    # from every canonicalized URL BEFORE hashing/dedup — alias forms of
    # a page that differ only in tracking params collapse to one crawl.
    # Applied after the frozen canonicalizer (its spec is untouched).
    # Frozen in the checkpoint manifest (changes dedup identity).
    strip_params: list | None = None
    # crawl-DEPTH (hop) limit (None = unlimited): a URL's hop depth is
    # its link distance from the seed set at first admission (pending
    # rediscoveries keep the MIN, so the value is deterministic under
    # any offer-batch schedule; seeds = 0, robots-Sitemap offers count
    # as operator-vetted 0 like seeds).  Links found on a page at depth
    # == max_hops are NOT offered, so the crawl explores exactly the
    # ball of radius max_hops around the seeds regardless of how many
    # rounds politeness stretches it over.  Adds an opt-in ``hops``
    # crawl-log column.  Frozen in the checkpoint manifest (changes
    # frontier contents).  Mutually exclusive with indegree_priority /
    # focus_keywords (each swaps the link-explode/dedup kernel).
    max_hops: int | None = None
    # transient-failure RETRY with exponential backoff: a fetch logged
    # status="error" is re-queued by its frontier shard — the n-th retry
    # comes due at failed_round + 2^(n−1) — until ``max_retries``
    # attempts are exhausted (then the URL is dropped permanently; every
    # attempt left its own status="error" log row).  0 = off (frozen
    # goldens).  When on, the crawl log gains an opt-in ``attempt``
    # column.  Frozen in the checkpoint manifest (changes round
    # contents and log schema).
    max_retries: int = 0
    # hermetic failure model for exercising the retry path (the corpus
    # fetch is simulated, so transient 5xx must be injected): e.g.
    # {"mod": 7, "fail_attempts": 1} — a url whose url_hash % mod == 0
    # fails its first ``fail_attempts`` attempts, then succeeds.
    # Deterministic; None = no injected failures.  Optional "hosts":
    # [...] additionally fails EVERY row of the listed hosts while
    # attempt < fail_attempts — the host-concentrated outage that
    # exercises the circuit breaker.
    fail_inject: dict | None = None
    # per-host error-rate CIRCUIT BREAKER: when a host's status="error"
    # fraction over the last completed round reaches this threshold
    # (with ≥ breaker_min_attempts rows observed), the host is suspended
    # — queue kept, not polled — for breaker_cooldown rounds, then
    # resumes.  The host-level complement of per-URL max_retries: a
    # flapping URL backs off alone, a dying HOST stops burning its
    # politeness budget.  0.0 = off (frozen goldens).  Frozen in the
    # checkpoint manifest (changes which rounds a host's rows land in).
    breaker_threshold: float = 0.0
    breaker_min_attempts: int = 8
    breaker_cooldown: int = 2
    # crawl-scope url filter over DISCOVERED links (Heritrix/Nutch-style
    # regex scope rules; None = off): kwargs for functions.urlnorm.
    # scope_mask, e.g. {"allow": [r"^http://(a|b)\.com/"], "deny":
    # [r"\.(jpg|css)$"]} — with a non-empty allow list a discovered url
    # must match at least one allow pattern; any deny match drops it
    # (deny wins).  Applies to outlinks, rel=canonical targets and
    # robots Sitemap: offers; SEEDS are operator-vetted and exempt
    # (same convention as trap_guard).  Out-of-scope urls never enter
    # the seen set.  Frozen in the checkpoint manifest.
    scope_filter: dict | None = None
    resume: bool = False
    stats: dict = field(default_factory=dict)


def _shard_indices(
    hosts: pa.ChunkedArray | pa.Array,
    num_shards: int,
    salt_hosts: dict | None = None,
    url_hashes=None,
) -> list[int]:
    """Per-row shard ids via dictionary-encoding: hash UNIQUE hosts only.
    Salted hosts (§7.6 mega-host splitting) route by
    ``hash(host#(url_hash % k))`` so their queue spreads over k shards."""
    if isinstance(hosts, pa.ChunkedArray):
        hosts = hosts.combine_chunks()
    d = hosts.dictionary_encode()
    uniq = d.dictionary.to_pylist()
    shard_of_uniq = [fingerprint64(h) % num_shards for h in uniq]
    idx = d.indices.to_pylist()
    if not salt_hosts:
        return [shard_of_uniq[i] for i in idx]
    salted_uniq = {i: salt_hosts[h] for i, h in enumerate(uniq) if h in salt_hosts}
    hh = url_hashes.to_pylist() if url_hashes is not None else None
    out = []
    for row, i in enumerate(idx):
        k = salted_uniq.get(i)
        if k:
            out.append(fingerprint64(f"{uniq[i]}#{int(hh[row]) % k}") % num_shards)
        else:
            out.append(shard_of_uniq[i])
    return out


class _RouteToActors:
    """map_batches stage that routes rows to frontier shards and calls
    ``actor.<method>(sub_table)``, blocking on acks (round barrier).
    Emits one row of counts per batch — metadata, not data."""

    def __init__(self, actors: list, method: str, salt_hosts: dict | None = None) -> None:
        self.actors = actors
        self.method = method
        self.salt_hosts = salt_hosts

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"offered": pa.array([0], pa.int64()),
                             "admitted": pa.array([0], pa.int64()),
                             "robots_blocked": pa.array([0], pa.int64())})
        shards = _shard_indices(
            batch["host"], len(self.actors), self.salt_hosts, batch["url_hash"]
        )
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


def _prepare_candidates(
    ds: rd.Dataset, default_priority: float | None = None,
    strip_params: list | None = None,
) -> rd.Dataset:
    """url (+priority, round) → canonical url, surt, host, url_hash rows."""

    def fn(batch: pa.Table) -> pa.Table:
        return _prepare_candidates_table(batch, default_priority, strip_params)

    return ds.map_batches(fn, batch_format="pyarrow")


def _salted_robots_targets(hosts: set, salt_hosts: dict, n_actors: int) -> set[int]:
    """Every sub-shard a salted host's queue spans — its robots rules must
    be replicated to each (shared by the sidecar and fallback loaders)."""
    targets: set[int] = set()
    for h in hosts:
        for i in range(salt_hosts[h]):
            targets.add(fingerprint64(f"{h}#{i}") % n_actors)
    return targets


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
        found = [i is not None for i in order]
        out = group.drop_columns(["bucket"])
        hits = [i for i in order if i is not None]
        if hits:
            # vectorized left-outer align: take hit rows, position each
            # output row at its hit (misses point at 0, masked via if_else)
            # — same mask/take/if_else pattern as the other two strategies
            src = pages.take(pa.array(hits, pa.int64())).combine_chunks()
            pos, k = [], 0
            for f in found:
                pos.append(k if f else 0)
                if f:
                    k += 1
            taken = src.take(pa.array(pos, pa.int64()))
            mask = pa.array(found)
            all_found = all(found)
            for name in ("warc_ts", "html", "lang"):
                col = taken[name].combine_chunks()
                if not all_found:
                    col = pc.if_else(mask, col, pa.scalar(None, col.type))
                out = out.append_column(name, col)
        else:
            for name, typ in (
                ("warc_ts", pa.timestamp("us")), ("html", pa.binary()), ("lang", pa.string())
            ):
                out = out.append_column(name, pa.array([None] * group.num_rows, typ))
        status = pa.array(["fetched" if f else "not_found" for f in found], pa.string())
        return out.append_column("status", status)


def _align_sorted_buckets(batch: pa.Table, nb: int, get_bucket) -> pa.Table:
    """Shared J1 alignment kernel (used by the ``objstore`` and ``actors``
    strategies): rows carrying ``url_hash`` → same rows + fetch columns via
    a vectorized uint64 ``searchsorted`` against each touched bucket's
    sorted hash column.  ``get_bucket(b)`` must return
    ``(bucket table sorted by url_hash, sorted uint64 hash ndarray)``.
    Output row order is bucket-grouped (stable); downstream ordering is
    carried by fetch_seq, not physical row order."""
    import numpy as np

    hh = batch["url_hash"].to_numpy(zero_copy_only=False).astype(np.uint64)
    buckets = hh % np.uint64(nb)
    perm = np.argsort(buckets, kind="stable")
    out = batch.take(pa.array(perm, pa.int64()))
    hh = hh[perm]
    buckets = buckets[perm]
    n = batch.num_rows
    found = np.zeros(n, dtype=bool)
    pieces: list[pa.Table] = []
    i = 0
    while i < n:
        b = int(buckets[i])
        j = i
        while j < n and buckets[j] == b:
            j += 1
        tbl, sh = get_bucket(b)
        sub = hh[i:j]
        idx = np.searchsorted(sh, sub)
        ok = (idx < len(sh)) & (sh[np.minimum(idx, max(len(sh) - 1, 0))] == sub) if len(sh) else np.zeros(j - i, dtype=bool)
        found[i:j] = ok
        if ok.any():
            pieces.append(tbl.take(pa.array(idx[ok], pa.int64())))
        i = j
    if pieces:
        all_found = bool(found.all())
        if all_found:
            # hit rows were appended in output order (bucket-grouped,
            # batch order within bucket) — src IS the aligned payload.
            # Skipping the expander take avoids a second full copy of
            # the html payload per fetch batch (~11 KB/row; the fetch
            # stage is memory-bandwidth-bound at high concurrency).
            taken = pa.concat_tables(pieces)
        else:
            src = pa.concat_tables(pieces).combine_chunks()
            pos = np.cumsum(found) - 1
            pos[~found] = 0
            taken = src.take(pa.array(pos, pa.int64()))
        mask = pa.array(found)
        for name in ("warc_ts", "html", "lang"):
            col = taken[name]
            if isinstance(col, pa.ChunkedArray) and not all_found:
                col = col.combine_chunks()
            if not all_found:
                col = pc.if_else(mask, col, pa.scalar(None, col.type))
            out = out.append_column(name, col)
    else:
        for name, typ in (
            ("warc_ts", pa.timestamp("us")), ("html", pa.binary()), ("lang", pa.string())
        ):
            out = out.append_column(name, pa.array([None] * n, typ))
    status = pa.array(["fetched" if f else "not_found" for f in found], pa.string())
    return out.append_column("status", status)


@ray.remote
class FetchActor:
    """Bucket-affine fetch-sim actor (J1, no-shuffle variant).

    Actor ``k`` of ``K`` serves exactly the buckets ``b % K == k`` and
    caches each bucket's hash-sorted Arrow table + sorted uint64 hash
    array on first access — across ROUNDS, so the pages side is read from
    disk once per crawl instead of once per round.  Row alignment is the
    same vectorized ``searchsorted`` kernel the objstore strategy uses
    (``_align_sorted_buckets``), not a per-row dict probe.  Memory per
    actor = corpus/K and shrinks as the pool grows; at 10^10-URL scale the
    cache would hold only the url_hash→row-group index and read payloads
    lazily (same interface).
    """

    def __init__(self, actor_id: int, pool_size: int, bucketed_dir: str,
                 num_buckets: int = 0) -> None:
        self.actor_id = actor_id
        self.pool_size = pool_size
        self.dir = bucketed_dir
        self.num_buckets = num_buckets
        self.cache: dict[int, tuple] = {}

    def warm(self, num_buckets: int) -> int:
        """Eagerly load every bucket this actor owns (parallel across the
        pool at crawl start — demand-loading inside round 0 serializes
        behind the first fetch calls)."""
        n = 0
        for b in range(num_buckets):
            if b % self.pool_size == self.actor_id:
                n += self._bucket(b)[0].num_rows
        return n

    def _bucket(self, b: int) -> tuple:
        hit = self.cache.get(b)
        if hit is None:
            import numpy as np
            import pyarrow.dataset as pads

            ds = pads.dataset(self.dir, partitioning="hive")
            t = ds.to_table(
                filter=pads.field("bucket") == b,
                columns=["url_hash", "url", "warc_ts", "html", "lang"],
            ).combine_chunks()  # single-chunk columns: take() goes from ~8ms to ~µs
            h = t["url_hash"].to_numpy(zero_copy_only=False).astype(np.uint64)
            perm = np.argsort(h, kind="stable")
            hit = (t.take(pa.array(perm, pa.int64())).combine_chunks(), h[perm])
            self.cache[b] = hit
        return hit

    def fetch(self, table: pa.Table) -> pa.Table:
        """Rows (url_hash, bucket, ...) → same rows + warc_ts/html/lang/status
        (left outer against the cached buckets; only requested rows are
        ever taken/copied from the cache)."""
        return _align_sorted_buckets(
            table.drop_columns(["bucket"]), self.num_buckets, self._bucket
        )


class _FetchViaActors:
    """map_batches stage routing rows to bucket-affine FetchActors.
    No Dataset shuffle: the ready batch is split by ``bucket % K`` and
    joined via actor RPC; results concatenate in row order per split."""

    def __init__(self, fetch_actors: list, num_buckets: int) -> None:
        self.fetch_actors = fetch_actors
        self.nb = num_buckets

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        h = batch["url_hash"].to_numpy(zero_copy_only=False)
        buckets = (h % self.nb).astype("int32")
        batch = batch.append_column("bucket", pa.array(buckets))
        k = len(self.fetch_actors)
        owner = buckets % k
        parts = []
        refs = []
        for a in sorted(set(owner)):
            sub = batch.filter(pa.array(owner == a))
            parts.append(a)
            refs.append(self.fetch_actors[a].fetch.remote(sub))
        results = ray.get(refs)
        return pa.concat_tables(results)


class _FetchDirect:
    """Storage-direct fetch join (J1, the 100 TB path): each task reads the
    pages bucket(s) its rows need straight from the bucketed layout —
    constant memory, no actors, no RPC, fully elastic.  Pairs with
    bucket-ordered ready chunks (frontier ``chunk_order="bucket"``) so a
    task touches ~1 bucket; per-round cost is one decompress of each
    touched bucket partition."""

    def __init__(self, bucketed_dir: str, num_buckets: int) -> None:
        self.dir = bucketed_dir
        self.nb = num_buckets

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        h = batch["url_hash"].to_numpy(zero_copy_only=False)
        buckets = (h % self.nb).astype("int64")
        urls = batch["url"].to_pylist()
        import numpy as np

        perm = np.argsort(buckets, kind="stable")
        out = batch.take(pa.array(perm, pa.int64()))
        found: list[bool] = []
        pieces: list[pa.Table] = []
        i, n = 0, batch.num_rows
        while i < n:
            b = int(buckets[perm[i]])
            j = i
            want = []
            while j < n and buckets[perm[j]] == b:
                want.append(urls[perm[j]])
                j += 1
            pages = read_bucket(self.dir, b, pa.array(want, pa.string()))
            idx = {u: k for k, u in enumerate(pages["url"].to_pylist())}
            locs = [idx.get(u) for u in want]
            found.extend(l is not None for l in locs)
            hit = [l for l in locs if l is not None]
            if hit:
                pieces.append(pages.take(pa.array(hit, pa.int64())))
            i = j
        if pieces:
            src = pa.concat_tables(pieces).combine_chunks()
            pos, k = [], 0
            for f in found:
                pos.append(k if f else 0)
                if f:
                    k += 1
            taken = src.take(pa.array(pos, pa.int64()))
            mask = pa.array(found)
            all_found = all(found)
            for name in ("warc_ts", "html", "lang"):
                col = taken[name].combine_chunks()
                if not all_found:
                    col = pc.if_else(mask, col, pa.scalar(None, col.type))
                out = out.append_column(name, col)
        else:
            for name, typ in (
                ("warc_ts", pa.timestamp("us")), ("html", pa.binary()), ("lang", pa.string())
            ):
                out = out.append_column(name, pa.array([None] * n, typ))
        status = pa.array(["fetched" if f else "not_found" for f in found], pa.string())
        return out.append_column("status", status)


@ray.remote
def _offer_seed_slice(
    seeds_path: str, row_start: int, row_count: int, actors: list,
    salt_hosts: dict | None, strip_params: list | None = None,
) -> dict:
    """Seed-offer task: read one row-slice of the seed list, canonicalize,
    route to frontier shards.  Plain parallel tasks (one per slice) —
    a Dataset execution here costs ~2 executor spin-ups (repartition +
    offer) of pure constant time; the slice tasks do the identical work
    with none of it.  Only the row groups covering the slice are read
    (no N× whole-file decode across tasks).  At 10^10-seed scale the
    slices are per-file."""
    import pyarrow.parquet as _pqs

    pf = _pqs.ParquetFile(seeds_path)
    groups, first_off, off = [], 0, 0
    for i in range(pf.metadata.num_row_groups):
        n = pf.metadata.row_group(i).num_rows
        if off + n > row_start and off < row_start + row_count:
            if not groups:
                first_off = off
            groups.append(i)
        off += n
    if not groups:
        return {"offered": 0, "admitted": 0, "robots_blocked": 0}
    t = pf.read_row_groups(groups)
    t = t.slice(row_start - first_off, row_count)
    ds_like = _prepare_candidates_table(t, default_priority=1.0, strip_params=strip_params)
    counts = _RouteToActors(actors, "offer", salt_hosts)(ds_like)
    return {k: counts[k][0].as_py() for k in counts.column_names}


def _prepare_candidates_table(
    t: pa.Table, default_priority: float, strip_params: list | None = None
) -> pa.Table:
    canon = CanonicalizeStage(strip_params=strip_params)
    out = canon(t)
    if "priority" not in out.column_names:
        out = out.append_column(
            "priority", pa.array([default_priority] * out.num_rows, pa.float64())
        )
    if "round" not in out.column_names:
        out = out.append_column("round", pa.array([0] * out.num_rows, pa.int32()))
    return out.select(["url", "url_hash", "surt", "host", "priority", "round"])


@ray.remote
def _load_bucket_sorted(bucketed_dir: str, bucket: int) -> tuple:
    """Warm task for the objstore fetch strategy: one bucket partition →
    (table sorted by url_hash, sorted uint64 hash array).  Stored ONCE in
    the object store; every fetch task reads it zero-copy."""
    import numpy as np
    import pyarrow.dataset as pads

    ds = pads.dataset(bucketed_dir, partitioning="hive")
    t = ds.to_table(
        filter=pads.field("bucket") == bucket,
        columns=["url_hash", "url", "warc_ts", "html", "lang"],
    ).combine_chunks()
    h = t["url_hash"].to_numpy(zero_copy_only=False).astype(np.uint64)
    perm = np.argsort(h, kind="stable")
    t = t.take(pa.array(perm, pa.int64())).combine_chunks()
    return t, h[perm]


class _FetchViaObjectStore:
    """J1 broadcast variant (bench default): bucket tables are ``ray.put``
    ONCE at warm — immutable Arrow in shared memory — and each fetch task
    ``ray.get``s only the buckets its rows touch (zero-copy on-node; one
    transferred copy per node on a cluster).  Row alignment is a
    vectorized uint64 ``searchsorted`` against the bucket's sorted hash
    column: no actor RPC, no per-batch pages serialization, no actor
    hotspot, fully elastic.  At 100 TB (corpus ≫ cluster RAM) the
    ``direct`` strategy is the same alignment against disk partitions."""

    def __init__(self, refs: dict, num_buckets: int) -> None:
        self.refs = refs
        self.nb = num_buckets

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            # keep the output schema identical to non-empty batches —
            # returning the input unchanged would yield blocks missing the
            # fetch columns and break downstream select/explode
            for name, typ in (
                ("warc_ts", pa.timestamp("us")), ("html", pa.binary()), ("lang", pa.string())
            ):
                batch = batch.append_column(name, pa.array([], typ))
            return batch.append_column("status", pa.array([], pa.string()))
        # zero-copy shared-memory read per touched bucket
        return _align_sorted_buckets(batch, self.nb, lambda b: ray.get(self.refs[b]))


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
        subs = batch["sub"].to_pylist()
        seq = pa.array(
            [off[(h, s)] + r for h, s, r in zip(hosts, subs, ranks)], pa.int64()
        )
        return batch.append_column("fetch_seq", seq)


class _FailureInject:
    """Hermetic transient-failure model (strategy-independent: runs AFTER
    whichever fetch stage, BEFORE extract): a successfully-aligned row
    whose url_hash % mod == 0 with attempt < fail_attempts becomes
    status="error" with null html — the simulated 5xx.  Extract treats
    null-html rows as pass-through, exactly like not_found."""

    def __init__(self, mod: int = 0, fail_attempts: int = 1,
                 hosts: list[str] | None = None) -> None:
        self.mod = mod
        self.fail_attempts = fail_attempts
        self.hosts = frozenset(hosts) if hosts else None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        import numpy as np

        hh = batch["url_hash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        att = batch["attempt"].to_numpy(zero_copy_only=False)
        st = batch["status"].to_numpy(zero_copy_only=False)
        fail = np.zeros(len(hh), dtype=bool)
        if self.mod:
            fail |= hh % np.uint64(self.mod) == 0
        if self.hosts is not None:
            hosts = batch["host"].to_numpy(zero_copy_only=False)
            fail |= np.fromiter(
                (h in self.hosts for h in hosts), dtype=bool, count=len(hosts)
            )
        fail &= (att < self.fail_attempts) & (st == "fetched")
        if not fail.any():
            return batch
        status = pa.array(np.where(fail, "error", st), pa.string())
        html = batch["html"].to_pandas()
        html[fail] = None
        out = batch.set_column(
            batch.schema.get_field_index("status"), "status", status
        )
        return out.set_column(
            out.schema.get_field_index("html"), "html",
            pa.array(html, pa.binary()),
        )


class _OfferLinksStage:
    """Fused link-frontier stage: explode outlinks, canonicalize, route to
    frontier shards, block on offer acks; emits the batch in crawl-log
    shape.  Runs INSIDE the round's single Dataset execution so offering
    costs no extra execution — the log write downstream is the barrier."""

    def __init__(self, actors: list, next_round: int, priority_fn=None,
                 salt_hosts: dict | None = None, sink_hook=None,
                 trap_guard: dict | None = None,
                 scope_filter: dict | None = None,
                 indegree_priority: bool = False,
                 max_retries: int = 0,
                 strip_params: list | None = None,
                 breaker: bool = False,
                 focus_keywords: list | None = None,
                 focus_boost: float = 0.5,
                 max_hops: int | None = None) -> None:
        self.actors = actors
        self.next_round = next_round
        self.priority_fn = priority_fn
        self.salt_hosts = salt_hosts
        self.sink_hook = sink_hook
        self.trap_guard = trap_guard
        self.scope_filter = scope_filter
        self.indegree_priority = indegree_priority
        self.max_retries = max_retries
        self.breaker = breaker
        self.focus_keywords = [k.lower() for k in focus_keywords] if focus_keywords else None
        self.focus_boost = focus_boost
        self.max_hops = max_hops
        self._canon = CanonicalizeStage(strip_params=strip_params)

    def _explode_focused(self, batch: pa.Table) -> pa.Table:
        """Shark-search explode: each parent's outlinks carry priority =
        base + boost·ln(1 + keyword hits in the parent's text, cap 8)."""
        import numpy as np

        ll = batch["links"]
        if isinstance(ll, pa.ChunkedArray):
            ll = ll.combine_chunks()
        flat = pc.list_flatten(ll)
        if len(flat) == 0:
            return pa.table(
                {"url": pa.array([], pa.string()),
                 "priority": pa.array([], pa.float64()),
                 "round": pa.array([], pa.int32())}
            )
        base = (
            self.priority_fn(self.next_round)
            if self.priority_fn
            else 1.0 / (2 + self.next_round)
        )
        kws = self.focus_keywords
        scores = np.fromiter(
            (
                min(sum((t or "").lower().count(k) for k in kws), 8)
                for t in batch["text"].to_pylist()
            ),
            dtype=np.float64, count=batch.num_rows,
        )
        lens = pc.list_value_length(ll).to_numpy(zero_copy_only=False)
        prio = base + self.focus_boost * np.log1p(np.repeat(scores, lens))
        n = len(flat)
        return pa.table(
            {"url": flat,
             "priority": pa.array(prio, pa.float64()),
             "round": pa.array(np.full(n, self.next_round, dtype=np.int32))}
        )

    def _explode_hops(self, batch: pa.Table) -> pa.Table:
        """Crawl-depth explode: children inherit parent depth + 1; links
        on a page already AT max_hops are cut here (they could only land
        beyond the radius)."""
        import numpy as np

        ll = batch["links"]
        if isinstance(ll, pa.ChunkedArray):
            ll = ll.combine_chunks()
        flat = pc.list_flatten(ll)
        empty = pa.table(
            {"url": pa.array([], pa.string()),
             "priority": pa.array([], pa.float64()),
             "round": pa.array([], pa.int32()),
             "hops": pa.array([], pa.int32())}
        )
        if len(flat) == 0:
            return empty
        ph = batch["hops"].to_numpy(zero_copy_only=False).astype(np.int64)
        lens = pc.list_value_length(ll).to_numpy(zero_copy_only=False)
        child = np.repeat(ph + 1, lens)
        keep = child <= self.max_hops
        if not keep.any():
            return empty
        if not keep.all():
            flat = flat.filter(pa.array(keep))
            child = child[keep]
        base = (
            self.priority_fn(self.next_round)
            if self.priority_fn
            else 1.0 / (2 + self.next_round)
        )
        n = len(flat)
        return pa.table(
            {"url": flat,
             "priority": pa.array(np.full(n, base, dtype=np.float64)),
             "round": pa.array(np.full(n, self.next_round, dtype=np.int32)),
             "hops": pa.array(child.astype(np.int32), pa.int32())}
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        # lineage: report this batch's fetched/not_found counts back to the
        # frontier shards that emitted the rows (keyed by the "sub" column)
        # so actor counters and checkpoints carry real per-shard fetch stats
        result_refs = []
        if batch.num_rows:
            nf_mask = pc.equal(batch["status"], "not_found")
            subs = batch["sub"].to_numpy(zero_copy_only=False)
            nf = nf_mask.to_numpy(zero_copy_only=False)
            err = pc.equal(batch["status"], "error").to_numpy(zero_copy_only=False)
            fs = batch["fetch_seq"].to_numpy(zero_copy_only=False)
            import numpy as np

            hosts_np = (
                batch["host"].to_numpy(zero_copy_only=False) if self.breaker else None
            )
            for s in np.unique(subs):
                m = subs == s
                n_nf = int(nf[m].sum())
                n_err = int(err[m].sum())
                # token = the sub-batch's min fetch_seq (globally unique per
                # batch) → record_results is idempotent under task retries
                result_refs.append(
                    self.actors[int(s)].record_results.remote(
                        int(m.sum()) - n_nf - n_err, n_nf, int(fs[m].min())
                    )
                )
                if self.breaker:
                    # circuit-breaker evidence: per-host (rows, errors) for
                    # this sub-batch — same idempotency token scope
                    uh, inv = np.unique(hosts_np[m], return_inverse=True)
                    n_per = np.bincount(inv).astype("int64")
                    e_per = np.bincount(
                        inv, weights=err[m].astype("float64")
                    ).astype("int64")
                    result_refs.append(
                        self.actors[int(s)].record_host_errors.remote(
                            pa.table({"host": pa.array(uh.astype(object), pa.string()),
                                      "n": pa.array(n_per, pa.int64()),
                                      "n_err": pa.array(e_per, pa.int64())}),
                            int(fs[m].min()),
                        )
                    )
            if self.max_retries and err.any():
                # route failures back to their owning shard for backoff
                # re-queueing (the failure happened in round next_round-1)
                fail_cols = batch.select(
                    ["url_hash", "url", "host", "priority", "attempt"]
                    + (["hops"] if self.max_hops is not None else [])
                )
                for s in np.unique(subs[err]):
                    sub_t = fail_cols.filter(pa.array(err & (subs == s)))
                    result_refs.append(
                        self.actors[int(s)].schedule_retries.remote(
                            sub_t, self.next_round - 1, self.max_retries
                        )
                    )
        if batch.num_rows and "content_hash" in batch.column_names:
            # conditional-re-crawl report-back: tracked (recurring) rows'
            # content fingerprints go to the shard that scheduled them so
            # the NEXT re-fetch can compare (If-Modified-Since analogue).
            # content_hash==0 ⇔ untracked or not_found — nothing to record.
            import numpy as np

            ch = batch["content_hash"].to_numpy(zero_copy_only=False)
            tracked = ch != 0
            if tracked.any():
                subs_t = batch["sub"].to_numpy(zero_copy_only=False)
                hh = batch["url_hash"].to_numpy(zero_copy_only=False)
                for s in np.unique(subs_t[tracked]):
                    m = tracked & (subs_t == s)
                    result_refs.append(
                        self.actors[int(s)].record_content_hashes.remote(
                            pa.table(
                                {
                                    "url_hash": pa.array(hh[m], pa.uint64()),
                                    "content_hash": pa.array(ch[m], pa.uint64()),
                                }
                            )
                        )
                    )
        if self.focus_keywords:
            links = self._explode_focused(batch)
        elif self.max_hops is not None:
            links = self._explode_hops(batch)
        else:
            links = explode_links(batch, self.next_round, self.priority_fn)
        for decl_col in ("canonical", "redirect"):
            if decl_col not in batch.column_names:
                continue
            # declared targets (RFC 6596 canonical / meta-refresh redirect)
            # are discovered URLs — offer them with the round's link
            # priority; the frontier's seen filter dedups self-references
            prio = (
                self.priority_fn(self.next_round)
                if self.priority_fn
                else 1.0 / (2 + self.next_round)
            )
            if self.max_hops is not None:
                # declared targets are links too: depth = parent + 1,
                # cut at the radius like the explode path
                ph = batch["hops"].to_numpy(zero_copy_only=False)
                pairs = [
                    (c, int(p) + 1)
                    for c, p in zip(batch[decl_col].to_pylist(), ph)
                    if c and int(p) + 1 <= self.max_hops
                ]
                if pairs:
                    extra = pa.table(
                        {
                            "url": pa.array([c for c, _ in pairs], pa.string()),
                            "priority": pa.array([prio] * len(pairs), pa.float64()),
                            "round": pa.array(
                                [self.next_round] * len(pairs), pa.int32()
                            ),
                            "hops": pa.array([h for _, h in pairs], pa.int32()),
                        }
                    )
                    links = pa.concat_tables([links, extra])
                continue
            cvals = [c for c in batch[decl_col].to_pylist() if c]
            if cvals:
                extra = pa.table(
                    {
                        "url": pa.array(cvals, pa.string()),
                        "priority": pa.array([prio] * len(cvals), pa.float64()),
                        "round": pa.array(
                            [self.next_round] * len(cvals), pa.int32()
                        ),
                    }
                )
                links = pa.concat_tables([links, extra])
        if links.num_rows:
            if self.indegree_priority:
                # in-degree ordering (Cho et al. 1998): keep per-URL raw
                # occurrence counts through the dedup; aliased forms pool
                # after canonicalization below
                vc = pc.value_counts(links["url"])
                base = links["priority"][0].as_py()
                urls = vc.field("values")
                w = vc.field("counts")
                links = pa.table(
                    {
                        "url": urls,
                        "priority": pa.array([base] * len(urls), pa.float64()),
                        "round": pa.array(
                            [self.next_round] * len(urls), pa.int32()
                        ),
                        "w": w,
                    }
                )
            elif self.focus_keywords:
                # focused mode: priorities vary per parent — raw pre-dedup
                # keeps the MAX priority per url (deterministic)
                import numpy as np

                urls_np = links["url"].to_numpy(zero_copy_only=False)
                pr_np = links["priority"].to_numpy(zero_copy_only=False)
                uu, inv = np.unique(urls_np, return_inverse=True)
                pm = np.full(len(uu), -np.inf)
                np.maximum.at(pm, inv, pr_np)
                links = pa.table(
                    {"url": pa.array(uu, pa.string()),
                     "priority": pa.array(pm, pa.float64()),
                     "round": pa.array(
                         np.full(len(uu), self.next_round, dtype=np.int32))}
                )
            elif self.max_hops is not None:
                # depth mode: hops vary per parent — raw pre-dedup keeps
                # the MIN depth per url (deterministic, same as the
                # frontier's pending-rediscovery rule)
                import numpy as np

                urls_np = links["url"].to_numpy(zero_copy_only=False)
                hp_np = links["hops"].to_numpy(zero_copy_only=False)
                uu, inv = np.unique(urls_np, return_inverse=True)
                hm = np.full(len(uu), np.iinfo(np.int64).max, dtype=np.int64)
                np.minimum.at(hm, inv, hp_np.astype(np.int64))
                links = pa.table(
                    {"url": pa.array(uu, pa.string()),
                     "priority": pa.array(
                         np.full(len(uu), links["priority"][0].as_py(),
                                 dtype=np.float64)),
                     "round": pa.array(
                         np.full(len(uu), self.next_round, dtype=np.int32)),
                     "hops": pa.array(hm.astype(np.int32), pa.int32())}
                )
            else:
                # raw-string pre-dedup BEFORE canonicalize: outlinks repeat
                # heavily within a batch and priority/round are constant
                # here, so first-occurrence == any-occurrence; cuts
                # canonicalize work
                uniq = pc.unique(links["url"])
                if len(uniq) < links.num_rows:
                    links = pa.table(
                        {
                            "url": uniq,
                            "priority": pa.array(
                                [links["priority"][0].as_py()] * len(uniq),
                                pa.float64(),
                            ),
                            "round": pa.array(
                                [self.next_round] * len(uniq), pa.int32()
                            ),
                        }
                    )
            cand = self._canon(links)
            if "priority" in cand.column_names and "round" in cand.column_names:
                keep_cols = ["url", "url_hash", "surt", "host", "priority", "round"]
                if "w" in cand.column_names:
                    keep_cols.append("w")
                if "hops" in cand.column_names:
                    keep_cols.append("hops")
                cand = cand.select(keep_cols)
                # J4 pre-dedup: outlinks repeat heavily within a batch; one
                # np.unique here cuts frontier-actor traffic several-fold.
                # Safe: duplicates carry identical (priority, round) so
                # first-occurrence == any-occurrence.
                import numpy as np

                hh = cand["url_hash"].to_numpy(zero_copy_only=False)
                if "w" in cand.column_names:
                    # merge aliased canonical forms: sum their counts, then
                    # boost priority by ln(1 + (in-links − 1)) — w == 1
                    # leaves the base priority untouched (flag-off parity
                    # for singly-linked URLs)
                    _, first_idx, inv = np.unique(
                        hh, return_index=True, return_inverse=True
                    )
                    wsum = np.bincount(
                        inv, weights=cand["w"].to_numpy(zero_copy_only=False)
                    )
                    order = np.argsort(first_idx)
                    cand = cand.take(pa.array(first_idx[order], pa.int64()))
                    prio = cand["priority"].to_numpy(zero_copy_only=False) + (
                        np.log1p(wsum[order] - 1.0)
                    )
                    cand = cand.set_column(
                        cand.schema.get_field_index("priority"),
                        "priority", pa.array(prio, pa.float64()),
                    )
                    cand = cand.drop_columns(["w"])
                elif self.focus_keywords:
                    # aliased canonical forms merge keeping MAX priority
                    _, first_idx, inv = np.unique(
                        hh, return_index=True, return_inverse=True
                    )
                    pmax = np.full(len(first_idx), -np.inf)
                    np.maximum.at(
                        pmax, inv, cand["priority"].to_numpy(zero_copy_only=False)
                    )
                    order = np.argsort(first_idx)
                    cand = cand.take(pa.array(first_idx[order], pa.int64()))
                    cand = cand.set_column(
                        cand.schema.get_field_index("priority"),
                        "priority", pa.array(pmax[order], pa.float64()),
                    )
                elif self.max_hops is not None:
                    # aliased canonical forms merge keeping MIN depth
                    _, first_idx, inv = np.unique(
                        hh, return_index=True, return_inverse=True
                    )
                    hmin = np.full(
                        len(first_idx), np.iinfo(np.int64).max, dtype=np.int64
                    )
                    np.minimum.at(
                        hmin, inv,
                        cand["hops"].to_numpy(zero_copy_only=False).astype(np.int64),
                    )
                    order = np.argsort(first_idx)
                    cand = cand.take(pa.array(first_idx[order], pa.int64()))
                    cand = cand.set_column(
                        cand.schema.get_field_index("hops"),
                        "hops", pa.array(hmin[order].astype(np.int32), pa.int32()),
                    )
                else:
                    _, first_idx = np.unique(hh, return_index=True)
                    if len(first_idx) < len(hh):
                        cand = cand.take(pa.array(np.sort(first_idx), pa.int64()))
                if self.trap_guard is not None and cand.num_rows:
                    # crawler-trap hygiene on DISCOVERED links only (seeds
                    # are operator-vetted): drop over-long / over-deep /
                    # segment-looping URLs before they pollute the frontier
                    from ..functions.urlnorm import trap_mask

                    keep = trap_mask(cand["url"], **self.trap_guard)
                    if not keep.all():
                        cand = cand.filter(pa.array(keep))
                if self.scope_filter is not None and cand.num_rows:
                    # crawl-scope rules on DISCOVERED links only (seeds are
                    # operator-vetted): one RE2 alternation pass per list
                    from ..functions.urlnorm import scope_mask

                    keep = scope_mask(cand["url"], **self.scope_filter)
                    if not keep.all():
                        cand = cand.filter(pa.array(keep))
                shards = _shard_indices(
                    cand["host"], len(self.actors), self.salt_hosts, cand["url_hash"]
                )
                shard_arr = pa.array(shards, pa.int32())
                refs = [
                    self.actors[s].offer.remote(cand.filter(pc.equal(shard_arr, s)))
                    for s in sorted(set(shards))
                ]
                result_refs += refs
        if result_refs:
            ray.get(result_refs)  # ack before this task completes (round barrier)
        cols = LOG_COLUMNS + [
            c for c in ("canonical", "redirect") if c in batch.column_names
        ]
        if self.max_retries and "attempt" in batch.column_names:
            cols.append("attempt")  # opt-in log column, like canonical
        if self.max_hops is not None and "hops" in batch.column_names:
            cols.append("hops")  # opt-in log column: fetched page's depth
        out = batch.select(cols)
        if self.sink_hook is not None:
            # §2.10 publication hook: side-effect per crawl-log batch (the
            # reference's post-save signal), inside the round execution so
            # the log write remains the barrier for hook completion too
            self.sink_hook(out)
        return out


def _robots_host_body(batch: pa.Table) -> pa.Table:
    """THE robots-row discovery rule over pages rows — shared by the
    robots-preload fallback and the sitemap-directive fallback so the
    two paths can never drift: url ends in /robots.txt → (host, body)."""
    mask = pc.ends_with(batch["url"], pattern="/robots.txt")
    sub = batch.filter(mask)
    if sub.num_rows == 0:
        return pa.table({"host": pa.array([], pa.string()),
                         "body": pa.array([], pa.binary())})
    hosts = [u[len("http://"):].split("/", 1)[0] if u.startswith("http://")
             else u[len("https://"):].split("/", 1)[0]
             for u in sub["url"].to_pylist()]
    return pa.table({"host": pa.array(hosts, pa.string()), "body": sub["html"]})


def _load_robots_into_actors(cfg: CrawlConfig, actors: list, bucketed: str | None = None) -> None:
    """Deliver each frontier shard its hosts' robots rules.  Fast path:
    the ingest sidecar ``_robots.parquet`` (one small read); fallback:
    scan the pages table (host-partitioned routing either way)."""
    from ..sources.io import robots_sidecar_path

    if bucketed is not None:
        sidecar = robots_sidecar_path(bucketed)
        if os.path.exists(sidecar):
            import pyarrow.parquet as _pqr

            t = _pqr.read_table(sidecar)
            if t.num_rows:
                shards = _shard_indices(t["host"], len(actors))
                shard_arr = pa.array(shards, pa.int32())
                refs = [
                    actors[s].load_robots.remote(t.filter(pc.equal(shard_arr, s)))
                    for s in sorted(set(shards))
                ]
                if cfg.salt_hosts:
                    # a salted host's queue spans several shards — every
                    # sub-shard needs its robots rules
                    hosts = t["host"].to_pylist()
                    mask = pa.array([h in cfg.salt_hosts for h in hosts])
                    salted_rows = t.filter(mask)
                    if salted_rows.num_rows:
                        targets = _salted_robots_targets(
                            set(salted_rows["host"].to_pylist()),
                            cfg.salt_hosts, len(actors),
                        )
                        refs += [actors[a].load_robots.remote(salted_rows) for a in targets]
                ray.get(refs)
            return

    router_actors = actors
    salt_hosts = cfg.salt_hosts or {}
    to_robots = _robots_host_body

    class RobotsRouter:
        def __call__(self, batch: pa.Table) -> pa.Table:
            if batch.num_rows:
                shards = _shard_indices(batch["host"], len(router_actors))
                shard_arr = pa.array(shards, pa.int32())
                refs = [
                    router_actors[s].load_robots.remote(batch.filter(pc.equal(shard_arr, s)))
                    for s in sorted(set(shards))
                ]
                if salt_hosts:
                    # salted hosts span several shards — replicate their rules
                    # to every sub-shard target (mirrors the sidecar branch)
                    hosts = batch["host"].to_pylist()
                    mask = pa.array([h in salt_hosts for h in hosts])
                    salted_rows = batch.filter(mask)
                    if salted_rows.num_rows:
                        targets = _salted_robots_targets(
                            set(salted_rows["host"].to_pylist()),
                            salt_hosts, len(router_actors),
                        )
                        refs += [
                            router_actors[a].load_robots.remote(salted_rows)
                            for a in targets
                        ]
                ray.get(refs)
            return pa.table({"n": pa.array([batch.num_rows], pa.int64())})

    from ..sources.io import read_pages_any

    (
        read_pages_any(cfg.pages_path, columns=["url", "html"])
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
        "seen_filter": cfg.seen_filter,
        "salt_hosts": cfg.salt_hosts,
        "max_pages_per_host": cfg.max_pages_per_host,
        "skip_unchanged": cfg.skip_unchanged,
        "adaptive_recrawl": cfg.adaptive_recrawl,
        "adaptive_max_factor": cfg.adaptive_max_factor,
        "honor_canonical": cfg.honor_canonical,
        "honor_nofollow": cfg.honor_nofollow,
        "soft404_detect": cfg.soft404_detect,
        "content_dedup": cfg.content_dedup,
        "follow_meta_refresh": cfg.follow_meta_refresh,
        "refresh_max_delay": cfg.refresh_max_delay,
        "trap_guard": cfg.trap_guard,
        "scope_filter": cfg.scope_filter,
        "max_hops": cfg.max_hops,
        "indegree_priority": cfg.indegree_priority,
        "focus_keywords": cfg.focus_keywords,
        "focus_boost": cfg.focus_boost,
        "max_retries": cfg.max_retries,
        "fail_inject": cfg.fail_inject,
        "strip_params": cfg.strip_params,
        "breaker_threshold": cfg.breaker_threshold,
        "breaker_min_attempts": cfg.breaker_min_attempts,
        "breaker_cooldown": cfg.breaker_cooldown,
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
    import sys as _sys
    import time as _time

    trace = os.environ.get("CRAWL_TRACE") == "1"
    _tp = _time.time()

    def _phase(name: str) -> None:
        nonlocal _tp
        if trace:
            print(f"[crawl] phase {name}: {_time.time()-_tp:.2f}s", file=_sys.stderr, flush=True)
        _tp = _time.time()

    if cfg.fetch_strategy not in ("actors", "objstore", "direct", "shuffle"):
        raise ValueError(
            f"unknown fetch_strategy {cfg.fetch_strategy!r}: use 'actors', "
            f"'objstore', 'direct' or 'shuffle'"
        )
    if cfg.focus_keywords and cfg.indegree_priority:
        raise ValueError(
            "focus_keywords and indegree_priority are mutually exclusive: "
            "two competing discovered-URL ordering rules"
        )
    if cfg.max_hops is not None and (cfg.focus_keywords or cfg.indegree_priority):
        raise ValueError(
            "max_hops is mutually exclusive with focus_keywords / "
            "indegree_priority: each swaps the link-explode/dedup kernel"
        )
    if cfg.max_hops is not None and cfg.max_hops < 0:
        raise ValueError("max_hops must be >= 0 (0 = seeds only)")
    for h, k in (cfg.salt_hosts or {}).items():
        if k > cfg.politeness_budget:
            raise ValueError(
                f"salt_hosts[{h!r}]={k} exceeds politeness_budget="
                f"{cfg.politeness_budget}: recombined fetches would break the "
                f"per-host budget invariant"
            )
        if cfg.max_pages_per_host is not None and k > cfg.max_pages_per_host:
            raise ValueError(
                f"salt_hosts[{h!r}]={k} exceeds max_pages_per_host="
                f"{cfg.max_pages_per_host}: each sub-shard floors at cap//k=1, "
                f"so recombined emissions would break the per-host page cap"
            )
    os.makedirs(cfg.out_dir, exist_ok=True)
    if not cfg.resume:  # fresh run: clear stale outputs (write_parquet appends)
        for sub in ("crawl_log", "seen_set", "checkpoints", "exact_spill",
                    "pending_spill"):
            shutil.rmtree(os.path.join(cfg.out_dir, sub), ignore_errors=True)
    else:
        shutil.rmtree(os.path.join(cfg.out_dir, "seen_set"), ignore_errors=True)
    bucketed = ingest_pages(
        cfg.pages_path,
        cfg.bucketed_dir or os.path.join(cfg.out_dir, "pages_bucketed"),
        cfg.num_buckets,
    )
    _phase("ingest")

    # robots sidecar preload happens in each actor's CONSTRUCTOR (parallel
    # across the pool, overlapped with process spawn, guaranteed before any
    # offer) — the driver-side robots phase then only runs the no-sidecar
    # fallback pages scan
    from ..sources.io import robots_sidecar_path

    _sidecar = robots_sidecar_path(bucketed)
    if not os.path.exists(_sidecar):
        _sidecar = None
    actors = [
        FrontierActor.options(num_cpus=cfg.actor_num_cpus).remote(
            i,
            cfg.num_frontier_actors,
            politeness_budget=cfg.politeness_budget,
            filter_capacity=cfg.filter_capacity,
            store_exact=cfg.store_exact,
            salt_hosts=cfg.salt_hosts,
            max_pages_per_host=cfg.max_pages_per_host,
            robots_sidecar=_sidecar,
            exact_spill_dir=os.path.join(cfg.out_dir, "exact_spill", f"shard-{i:05d}"),
            exact_spill_threshold=cfg.exact_spill_threshold,
            pending_spill_dir=os.path.join(
                cfg.out_dir, "pending_spill", f"shard-{i:05d}"
            ),
            pending_spill_threshold=cfg.pending_spill_threshold,
            pending_spill_keep=cfg.pending_spill_keep,
            seen_filter=cfg.seen_filter,
            adaptive_recrawl=cfg.adaptive_recrawl,
            adaptive_max_factor=cfg.adaptive_max_factor,
            breaker_threshold=cfg.breaker_threshold,
            breaker_min_attempts=cfg.breaker_min_attempts,
            breaker_cooldown=cfg.breaker_cooldown,
        )
        for i in range(cfg.num_frontier_actors)
    ]
    # kick actor process spawn + kernel warmup NOW (fire-and-forget) so
    # interpreter startup, imports and first-call numpy/pyarrow kernel
    # init all overlap the fetch-side warm below — otherwise the first
    # seed offer pays the whole pool's cold start (~0.5 s/actor)
    _spawn_refs = [a.warmup.remote() for a in actors]
    fetch_actors = []
    if cfg.fetch_strategy == "actors":
        # num_cpus=0: these are lookup servers called synchronously from map
        # tasks that already hold a CPU slot — reserving CPUs here would
        # deadlock small clusters (pool > num_cpus) and double-count work.
        # max_concurrency: after warm() the cache is complete and fetch()
        # is pure-read; concurrent calls parallelize the arrow take/serialize
        # (GIL-releasing C++) inside each actor.  Cold loads racing in
        # _bucket() are idempotent (equal values, atomic dict store).
        fetch_actors = [
            FetchActor.options(num_cpus=0, max_concurrency=4).remote(
                i, cfg.num_fetch_actors, bucketed, cfg.num_buckets
            )
            for i in range(cfg.num_fetch_actors)
        ]
        ray.get([a.warm.remote(cfg.num_buckets) for a in fetch_actors])
    bucket_refs: dict | None = None

    def _submit_bucket_warm() -> None:
        # broadcast warm: one sorted bucket object per partition, loaded in
        # parallel tasks; round-0 fetch tasks block on any still-loading
        # bucket (pipelined warm — no explicit barrier needed).  Submitted
        # AFTER the seed-offer tasks (round 4): Ray schedules in submission
        # order, so submitting the 64-task ~corpus-sized warm first made
        # the seed offer queue behind ~2 waves of bucket decode — the warm
        # now overlaps the seed ray.get AND round-0 startup instead.
        nonlocal bucket_refs
        if cfg.fetch_strategy == "objstore" and bucket_refs is None:
            bucket_refs = {
                b: _load_bucket_sorted.remote(bucketed, b)
                for b in range(cfg.num_buckets)
            }

    _phase("actors")
    ckpt_dir = os.path.join(cfg.out_dir, "checkpoints")
    log_dir = os.path.join(cfg.out_dir, "crawl_log")

    start_round = 0
    fetch_seq = 0
    manifest = read_manifest(cfg.out_dir) if cfg.resume else None
    if manifest is not None:
        # every routing/politeness-relevant knob is frozen in the manifest:
        # changing any of them on resume would silently alter dedup routing,
        # bucket lookups or politeness vs the checkpointed run
        frozen = {
            "num_shards": cfg.num_frontier_actors,
            "num_buckets": cfg.num_buckets,
            "politeness_budget": cfg.politeness_budget,
            "salt_hosts": cfg.salt_hosts,
            "max_pages_per_host": cfg.max_pages_per_host,
            "seen_filter": cfg.seen_filter,
            "skip_unchanged": cfg.skip_unchanged,
            "adaptive_recrawl": cfg.adaptive_recrawl,
            "adaptive_max_factor": cfg.adaptive_max_factor,
            # honor_canonical changes the LOG SCHEMA (the canonical
            # column) and which URLs get offered — flipping it on resume
            # would mix parquet schemas across round partitions
            "honor_canonical": cfg.honor_canonical,
            # honor_nofollow changes log content (noindex text blanking,
            # filtered links) and which URLs get offered
            "honor_nofollow": cfg.honor_nofollow,
            # soft404 changes log content and which URLs get offered
            "soft404_detect": cfg.soft404_detect,
            # content_dedup changes log content AND which urls get
            # offered (dup pages emit no outlinks) — flipping it on
            # resume would diverge from the checkpointed sealed set
            "content_dedup": cfg.content_dedup,
            # follow_meta_refresh changes the LOG SCHEMA (redirect column)
            # and which URLs get offered, like honor_canonical above
            "follow_meta_refresh": cfg.follow_meta_refresh,
            "refresh_max_delay": cfg.refresh_max_delay,
            # trap_guard / scope_filter change which DISCOVERED urls enter
            # the frontier — flipping them on resume would silently change
            # the crawl's reachable set vs the checkpointed seen filter
            "trap_guard": cfg.trap_guard,
            "scope_filter": cfg.scope_filter,
            # max_hops changes WHICH urls enter the frontier (the depth
            # ball) and the log schema (hops column)
            "max_hops": cfg.max_hops,
            # indegree_priority changes frontier ORDER — resuming with a
            # different setting would interleave rounds ordered by two
            # different rules
            "indegree_priority": cfg.indegree_priority,
            # focused crawling changes frontier ORDER the same way
            "focus_keywords": cfg.focus_keywords,
            "focus_boost": cfg.focus_boost,
            # retry policy changes round contents and the log schema
            "max_retries": cfg.max_retries,
            "fail_inject": cfg.fail_inject,
            # param scrubbing changes dedup identity (url_hash inputs)
            "strip_params": cfg.strip_params,
            # the breaker changes WHICH rounds a host's rows land in
            "breaker_threshold": cfg.breaker_threshold,
            "breaker_min_attempts": cfg.breaker_min_attempts,
            "breaker_cooldown": cfg.breaker_cooldown,
        }
        for key, want in frozen.items():
            have = manifest.get(key)
            if key == "seen_filter" and have is None:
                have = "cuckoo"  # pre-bloom manifests are all cuckoo
            if key in ("skip_unchanged", "adaptive_recrawl", "honor_canonical",
                       "content_dedup") and have is None:
                have = False  # pre-flag manifests never used these
            if key == "adaptive_max_factor" and have is None:
                have = cfg.adaptive_max_factor if not cfg.adaptive_recrawl else 8
            if (
                key in ("trap_guard", "scope_filter", "follow_meta_refresh",
                        "refresh_max_delay", "indegree_priority",
                        "max_retries", "fail_inject", "strip_params",
                        "focus_keywords", "focus_boost", "honor_nofollow",
                        "soft404_detect", "max_hops")
                and key not in manifest
            ):
                continue  # pre-upgrade manifests didn't record these
            if key.startswith("breaker_") and key not in manifest:
                continue  # pre-breaker manifests didn't record these
            if have != want:
                raise ValueError(
                    f"cannot resume with a different {key} (manifest={have!r}, "
                    f"requested={want!r}): frozen at checkpoint time"
                )
        ray.get([a.restore.remote(ckpt_dir) for a in actors])
        start_round = manifest["round"] + 1
        fetch_seq = manifest["fetch_seq"]
        # drop any partially-written rounds after the checkpoint (D3 guard)
        if os.path.isdir(log_dir):
            for d in os.listdir(log_dir):
                if d.startswith("round=") and int(d.split("=")[1]) >= start_round:
                    shutil.rmtree(os.path.join(log_dir, d))
    else:
        if trace:  # split spawn cost out of the robots/seeds timings
            ray.get(_spawn_refs)
            _phase("actor_spawn")
        if _sidecar is None:
            # no sidecar: fall back to the pages-table robots scan
            _load_robots_into_actors(cfg, actors, None)
        _phase("robots")
        # split the seed read so canonicalization parallelizes — a single
        # one-row-group seed file reads as ONE block, serializing the whole
        # canonicalize+offer pass into one task.  At real scale a 10^10-URL
        # seed list spans many files (natural block parallelism); the
        # repartition below only triggers for the single-file case.
        # seed lists (single file OR a flat directory of parquet parts) are
        # offered via plain parallel slice tasks — a Dataset execution here
        # costs two executor spin-ups (repartition + offer) of pure constant
        # time for a side-effect-only pass.  Splitting the read parallelizes
        # canonicalization even for a one-row-group file.  Driver touches
        # only file metadata (num_rows per part); at 10^10-seed scale the
        # slices are per-file and the metadata reads fan out naturally.
        if os.path.isfile(cfg.seeds_path):
            seed_files = [cfg.seeds_path]
        else:
            import glob as _glob

            seed_files = sorted(
                _glob.glob(os.path.join(cfg.seeds_path, "**", "*.parquet"),
                           recursive=True)
            )
        if seed_files:
            import pyarrow.parquet as _pqm

            counts = [_pqm.read_metadata(f).num_rows for f in seed_files]
            n_slices = max(2, cfg.num_frontier_actors * 2)
            step = max(1, -(-sum(counts) // n_slices))
            refs = [
                _offer_seed_slice.remote(f, s, step, actors, cfg.salt_hosts, cfg.strip_params)
                for f, n in zip(seed_files, counts)
                for s in range(0, n, step)
            ]
            _submit_bucket_warm()  # queues behind the seed slices just submitted
            cfg.stats["seed_offered"] = sum(d["offered"] for d in ray.get(refs))
            seeds = rd.read_parquet(cfg.seeds_path)  # for the recurring pass below
        else:
            seeds = rd.read_parquet(cfg.seeds_path)
            offers = _prepare_candidates(
                seeds, default_priority=1.0, strip_params=cfg.strip_params
            ).map_batches(
                _RouteToActors(actors, "offer", cfg.salt_hosts), batch_format="pyarrow"
            )
            cfg.stats["seed_offered"] = int(offers.sum("offered") or 0)
        if "interval" in seeds.schema().names:
            # per-feed re-crawl scheduling (the reference's core operating
            # mode): seeds with interval>0 re-emit every interval rounds
            canon = CanonicalizeStage(strip_params=cfg.strip_params)

            def keep_recurring(batch: pa.Table) -> pa.Table:
                t = canon(batch)
                if "priority" not in t.column_names:
                    t = t.append_column(
                        "priority", pa.array([1.0] * t.num_rows, pa.float64())
                    )
                t = t.select(["url", "url_hash", "surt", "host", "priority", "interval"])
                iv = t["interval"]
                return t.filter(pc.and_kleene(pc.is_valid(iv), pc.greater(iv, 0)))

            reg = seeds.map_batches(keep_recurring, batch_format="pyarrow").map_batches(
                _RouteToActors(actors, "register_recurring", cfg.salt_hosts),
                batch_format="pyarrow",
            )
            cfg.stats["recurring_registered"] = int(reg.sum("admitted") or 0)
        if cfg.follow_robots_sitemaps:
            # robots "Sitemap:" directives → round-0 offers, distributed:
            # the sidecar (or the pages table's robots rows as fallback)
            # maps to candidate URLs inside map_batches; the frontier
            # dedups against seeds as usual
            from ..functions.robots import extract_sitemaps

            if _sidecar is not None:
                src = rd.read_parquet(_sidecar, columns=["body"])
            else:
                # same discovery rule as the robots preload fallback
                src = rd.read_parquet(bucketed, columns=["url", "html"]).map_batches(
                    _robots_host_body, batch_format="pyarrow"
                )

            def to_sitemap_urls(batch: pa.Table) -> pa.Table:
                urls: list[str] = []
                for b in batch["body"].to_pylist():
                    urls.extend(extract_sitemaps(b))
                return pa.table({"url": pa.array(sorted(set(urls)), pa.string())})

            sm_cand = _prepare_candidates(
                src.map_batches(to_sitemap_urls, batch_format="pyarrow"),
                default_priority=1.0,
            )
            if cfg.scope_filter is not None:
                # sitemap targets are DISCOVERED urls — scope rules apply
                from ..functions.urlnorm import scope_mask as _scope_mask

                _sf = cfg.scope_filter

                def in_scope(batch: pa.Table) -> pa.Table:
                    if not batch.num_rows:
                        return batch
                    return batch.filter(pa.array(_scope_mask(batch["url"], **_sf)))

                sm_cand = sm_cand.map_batches(in_scope, batch_format="pyarrow")
            sm_offers = sm_cand.map_batches(
                _RouteToActors(actors, "offer", cfg.salt_hosts), batch_format="pyarrow"
            )
            cfg.stats["sitemap_offered"] = int(sm_offers.sum("offered") or 0)
        _phase("seeds")

    _submit_bucket_warm()  # no-op if already submitted (resume / fallback paths)
    extract = ExtractStage(
        skip_unchanged=cfg.skip_unchanged,
        honor_canonical=cfg.honor_canonical,
        honor_nofollow=cfg.honor_nofollow,
        soft404_detect=cfg.soft404_detect,
        track_content=cfg.skip_unchanged or cfg.adaptive_recrawl,
        follow_refresh=cfg.follow_meta_refresh,
        refresh_max_delay=cfg.refresh_max_delay,
        content_dedup=cfg.content_dedup,
        content_actors=actors if cfg.content_dedup else None,
    )
    rounds_run = 0
    total_fetched = 0
    total_not_found = 0
    rounds_sec = 0.0  # steady-state round wall (incl. checkpoints)
    chunk_rows = cfg.poll_chunk_rows or (
        6144 if cfg.fetch_strategy == "direct" else 2048
    )

    r = start_round
    while r < cfg.max_rounds:
        _t0 = _time.time()
        metas = ray.get(
            [
                a.poll_ready_meta.remote(
                    r,
                    chunk_rows,
                    "host" if cfg.fetch_strategy == "shuffle" else "bucket",
                    cfg.num_buckets,
                )
                for a in actors
            ]
        )
        _t_poll = _time.time() - _t0
        n_ready = sum(sum(m["hosts"].values()) for m in metas)
        if n_ready == 0:
            # nothing pending now — but recurring feeds may come due later:
            # fast-forward the round clock to the earliest re-emission
            # instead of running empty rounds (rounds are the engine's
            # deterministic time axis, so skipping idle ticks is free)
            dues = [m.get("next_due") for m in metas if m.get("next_due") is not None]
            nxt = min(dues) if dues else None
            if nxt is not None and r < nxt < cfg.max_rounds:
                r = nxt
                continue
            break
        ready_refs = [
            a.ready_chunk.remote(j)
            for a, m in zip(actors, metas)
            for j in range(m["n_chunks"])
        ]
        # global fetch_seq offsets keyed (host, sub-shard): hosts ASC, sub
        # ASC within host — identical to plain host ASC when each host
        # lives on one shard; salted hosts recombine deterministically
        host_counts: dict[tuple[str, int], int] = {}
        for sub, m in enumerate(metas):
            for h, c in m["hosts"].items():
                host_counts[(h, sub)] = c
        offsets: dict[tuple[str, int], int] = {}
        acc = fetch_seq
        for key in sorted(host_counts):
            offsets[key] = acc
            acc += host_counts[key]
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

        # ONE Dataset execution per round: fetch-join → extract → offer
        # discovered links to the frontier actors as a side-effect stage →
        # write the round's log partition.  The write is the round barrier:
        # every offer is ray.get-acked inside its task before the task ends,
        # so when write_parquet returns, round r+1's frontier is complete.
        offer_links = _OfferLinksStage(
            actors, r + 1, cfg.priority_fn, cfg.salt_hosts, cfg.sink_hook,
            trap_guard=cfg.trap_guard, scope_filter=cfg.scope_filter,
            indegree_priority=cfg.indegree_priority,
            max_retries=cfg.max_retries,
            strip_params=cfg.strip_params,
            breaker=cfg.breaker_threshold > 0,
            focus_keywords=cfg.focus_keywords,
            focus_boost=cfg.focus_boost,
            max_hops=cfg.max_hops,
        )
        staged = ready.map_batches(_AssignSeq(offsets_ref), batch_format="pyarrow")
        if cfg.fetch_strategy == "actors":
            staged = staged.map_batches(
                _FetchViaActors(fetch_actors, cfg.num_buckets), batch_format="pyarrow"
            )
        elif cfg.fetch_strategy == "objstore":
            staged = staged.map_batches(
                _FetchViaObjectStore(bucket_refs, cfg.num_buckets),
                batch_format="pyarrow",
            )
        elif cfg.fetch_strategy == "direct":
            staged = staged.map_batches(
                _FetchDirect(bucketed, cfg.num_buckets), batch_format="pyarrow"
            )
        else:
            staged = (
                staged.map_batches(add_bucket, batch_format="pyarrow")
                .groupby("bucket")
                .map_groups(fetch_group, batch_format="pyarrow")
            )
        if cfg.fail_inject:
            staged = staged.map_batches(
                _FailureInject(**cfg.fail_inject), batch_format="pyarrow"
            )
        if cfg.extract_concurrency:
            # actor-pool extract: separate operator → fetch output blocks are
            # re-split at target_max_block_size, decoupling fetch RPC
            # granularity from extract task granularity
            staged = staged.map_batches(
                ExtractStage,
                fn_constructor_kwargs={
                    "skip_unchanged": cfg.skip_unchanged,
                    "honor_canonical": cfg.honor_canonical,
                    "track_content": cfg.skip_unchanged or cfg.adaptive_recrawl,
                    "content_dedup": cfg.content_dedup,
                    "content_actors": actors if cfg.content_dedup else None,
                },
                batch_format="pyarrow",
                concurrency=cfg.extract_concurrency,
                num_cpus=1,
            )
        else:
            staged = staged.map_batches(extract, batch_format="pyarrow")
        final_ds = staged.map_batches(offer_links, batch_format="pyarrow")
        final_ds.write_parquet(os.path.join(log_dir, f"round={r}"))
        if trace and os.environ.get("CRAWL_STATS") == "1":
            print(f"[crawl] stats round={r}\n{final_ds.stats()}", file=_sys.stderr, flush=True)

        _t1 = _time.time()
        if cfg.content_dedup:
            # round-boundary seal: this round's content fingerprints
            # become visible to round r+1's dup test — before the
            # checkpoint, so a resume replays identical verdicts
            ray.get([a.seal_content.remote() for a in actors])
        if cfg.checkpoint_every and (r % cfg.checkpoint_every == 0):
            lineage = ray.get([a.checkpoint.remote(ckpt_dir, r) for a in actors])
            _write_manifest(cfg, r, fetch_seq, lineage)
        if trace:
            print(
                f"[crawl] round={r} ready={n_ready} poll={_t_poll:.2f}s "
                f"exec={_t1-_t0:.2f}s ckpt={_time.time()-_t1:.2f}s",
                file=_sys.stderr,
                flush=True,
            )
        rounds_run += 1
        rounds_sec += _time.time() - _t0
        r += 1

    _phase("rounds_total")
    # final seen-set export (S6), verification mode only
    if cfg.store_exact:
        seen_refs = [a.export_seen.remote() for a in actors]
        rd.from_arrow_refs(seen_refs).sort("url_hash").write_parquet(
            os.path.join(cfg.out_dir, "seen_set")
        )
    _phase("seen_export")
    # status totals come from the frontier actors' lineage counters
    # (record_results is acked inside every round's offer stage, so the
    # counters equal the written log's status counts — tested; this
    # replaces a driver-side re-read of the whole log)
    actor_stats = ray.get([a.stats.remote() for a in actors])
    total_fetched = sum(a["fetched"] for a in actor_stats)
    total_not_found = sum(a["not_found"] for a in actor_stats)
    _phase("final_agg")
    stats = {
        "rounds": rounds_run,
        "rounds_sec": round(rounds_sec, 3),
        "fetch_seq": fetch_seq,
        "fetched": total_fetched,
        "not_found": total_not_found,
        "actor_stats": actor_stats,
    }
    cfg.stats.update(stats)
    return stats


def main(argv: list[str] | None = None) -> int:
    """CLI entry (E1): ``python -m opps_feedcrawler_ray.pipelines.crawl
    --pages P --seeds S --out O [...]`` — the ``ray job submit`` target."""
    import argparse

    ap = argparse.ArgumentParser(description="Ray-Data crawl engine")
    ap.add_argument("--pages", required=True, help="pages parquet (input_hint shape)")
    ap.add_argument("--seeds", required=True, help="seed list parquet (url[, priority])")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--actors", type=int, default=8, help="frontier/fetch shard count")
    ap.add_argument("--budget", type=int, default=8, help="politeness budget per host per round")
    ap.add_argument("--buckets", type=int, default=32)
    ap.add_argument("--max-rounds", type=int, default=1000)
    ap.add_argument(
        "--fetch", choices=["actors", "objstore", "direct", "shuffle"], default="objstore"
    )
    ap.add_argument(
        "--seen-filter", choices=["cuckoo", "bloom"], default="cuckoo",
        help="URL-seen membership filter kind (both no-false-negative)"
    )
    ap.add_argument(
        "--follow-robots-sitemaps", action="store_true",
        help="offer robots.txt Sitemap: URLs alongside the seeds (round 0)"
    )
    ap.add_argument(
        "--skip-unchanged", action="store_true",
        help="conditional re-crawl: log recurring re-fetches with unchanged "
             "content as status=unchanged without re-parsing",
    )
    ap.add_argument(
        "--adaptive-recrawl", action="store_true",
        help="revisit policy: double a feed's interval on unchanged "
             "content (capped), reset to base on change",
    )
    ap.add_argument(
        "--content-dedup", action="store_true",
        help="cross-URL content-digest dedup (Heritrix content-seen "
             "test): bodies first seen in an earlier round are logged "
             "status=dup_content without re-parsing",
    )
    ap.add_argument(
        "--honor-canonical", action="store_true",
        help="record <link rel=canonical> targets in the log and offer "
             "them to the frontier (RFC 6596)",
    )
    ap.add_argument(
        "--honor-nofollow", action="store_true",
        help="honor <meta name=robots> noindex/nofollow and per-link "
             "rel=nofollow (REP HTML bindings)",
    )
    ap.add_argument(
        "--soft404-detect", action="store_true",
        help="screen soft 404s: a 200 page whose text matches the frozen "
             "not-found signature logs status=soft404, no text/outlinks",
    )
    ap.add_argument(
        "--follow-meta-refresh", action="store_true",
        help="treat immediate <meta http-equiv=refresh> pages as "
             "redirects: log status=redirect, offer the target",
    )
    ap.add_argument(
        "--indegree-priority", action="store_true",
        help="boost discovered-URL priority by in-batch in-link count "
             "(backlink ordering, Cho et al. 1998)",
    )
    ap.add_argument(
        "--strip-param", action="append", default=None, metavar="NAME",
        help="remove this query parameter (or NAME* prefix) from every "
             "canonical URL before dedup (tracking-param scrub); repeatable",
    )
    ap.add_argument(
        "--max-retries", type=int, default=0,
        help="re-queue status=error fetches with exponential backoff "
             "(n-th retry after 2^(n-1) rounds); 0 = off",
    )
    ap.add_argument(
        "--max-hops", type=int, default=None,
        help="crawl-depth limit: only fetch pages within this many link "
             "hops of the seed set (seeds = 0); adds a 'hops' log column",
    )
    ap.add_argument(
        "--breaker-threshold", type=float, default=0.0, metavar="RATE",
        help="per-host circuit breaker: suspend a host for "
             "--breaker-cooldown rounds when its error fraction over the "
             "last round reaches RATE (>= --breaker-min-attempts rows "
             "observed); 0 = off",
    )
    ap.add_argument("--breaker-min-attempts", type=int, default=8)
    ap.add_argument("--breaker-cooldown", type=int, default=2)
    ap.add_argument(
        "--refresh-max-delay", type=int, default=0, metavar="SECONDS",
        help="max declared refresh delay still treated as a redirect",
    )
    ap.add_argument(
        "--scope-allow", action="append", default=None, metavar="REGEX",
        help="crawl-scope allow rule (repeatable): a discovered url must "
             "match at least one to be offered; seeds are exempt",
    )
    ap.add_argument(
        "--scope-deny", action="append", default=None, metavar="REGEX",
        help="crawl-scope deny rule (repeatable): a discovered url matching "
             "any is dropped (deny wins over allow)",
    )
    ap.add_argument(
        "--focus-keyword", action="append", default=None, metavar="WORD",
        help="focused crawling (repeatable): outlinks of pages whose text "
             "mentions WORD get a relevance-boosted priority "
             "(Shark-Search-style); mutually exclusive with "
             "--indegree-priority",
    )
    ap.add_argument(
        "--focus-boost", type=float, default=0.5,
        help="priority boost scale for --focus-keyword (default 0.5)",
    )
    ap.add_argument(
        "--pending-spill-threshold", type=int, default=0, metavar="ROWS",
        help="spill a host's pending queue beyond this many rows to sorted "
             "parquet segments (frontier memory bound at 10^10 URLs); "
             "0 = off; emitted order is byte-identical either way",
    )
    ap.add_argument(
        "--pending-spill-keep", type=int, default=None, metavar="ROWS",
        help="resident head rows kept per spilled host (default 4x budget)",
    )
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--num-cpus", type=int, default=None, help="ray.init num_cpus (standalone runs)")
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():  # driver-owned sessions skip this
        kw = {"num_cpus": args.num_cpus} if args.num_cpus else {}
        ray.init(address="local", include_dashboard=False, logging_level="ERROR", **kw)
        rd.DataContext.get_current().enable_progress_bars = False
    cfg = CrawlConfig(
        pages_path=args.pages,
        seeds_path=args.seeds,
        out_dir=args.out,
        num_frontier_actors=args.actors,
        num_fetch_actors=args.actors,
        politeness_budget=args.budget,
        num_buckets=args.buckets,
        max_rounds=args.max_rounds,
        fetch_strategy=args.fetch,
        seen_filter=args.seen_filter,
        follow_robots_sitemaps=args.follow_robots_sitemaps,
        skip_unchanged=args.skip_unchanged,
        content_dedup=args.content_dedup,
        adaptive_recrawl=args.adaptive_recrawl,
        honor_canonical=args.honor_canonical,
        honor_nofollow=args.honor_nofollow,
        soft404_detect=args.soft404_detect,
        indegree_priority=args.indegree_priority,
        max_retries=args.max_retries,
        max_hops=args.max_hops,
        breaker_threshold=args.breaker_threshold,
        breaker_min_attempts=args.breaker_min_attempts,
        breaker_cooldown=args.breaker_cooldown,
        strip_params=args.strip_param,
        follow_meta_refresh=args.follow_meta_refresh,
        refresh_max_delay=args.refresh_max_delay,
        scope_filter=(
            {"allow": args.scope_allow, "deny": args.scope_deny}
            if (args.scope_allow or args.scope_deny)
            else None
        ),
        pending_spill_threshold=args.pending_spill_threshold,
        pending_spill_keep=args.pending_spill_keep,
        focus_keywords=args.focus_keyword,
        focus_boost=args.focus_boost,
        resume=args.resume,
    )
    stats = crawl(cfg)
    print(json.dumps({k: v for k, v in stats.items() if k != "actor_stats"}))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
