"""Frontier actors: sharded URL-seen set + per-host politeness queues
(SURVEY.md §2.3 A1/A2, §2.12 ordering rule).

Each actor owns one shard of crawl state, partitioned by
``fingerprint64(host) % num_shards`` — politeness is a per-host
invariant, so the host partition makes every politeness and robots
decision shard-local (no cross-actor coordination, no extra shuffle).

State per shard:
  * ``CuckooFilter`` seen-set (approximate, NO false negatives) +
    optional exact store (verification mode / seen-set export) — a
    bounded-memory LSM-lite (``state/exactstore.py``): URL strings spill
    to hash-sorted parquet segments, only 8 B/key hash arrays stay
    resident, so ``store_exact=True`` holds at 10^10-URL scale;
  * per-host priority heaps of pending URLs, key
    ``(-priority, round_discovered, url)`` — the §2.12 total order
    (priority DESC, round ASC, url ASC), no RNG, no wall clock;
  * per-host parsed robots rules (folded-in A2);
  * lineage counters (offered / admitted / fetched / robots_blocked /
    not_found).

Ordering rule (frozen, SURVEY.md §2.12): each round every host emits up
to ``budget`` URLs in heap order; the round's log serializes hosts in
``host ASC`` order; ``fetch_seq`` enumerates that serialization.  The
actor returns its ready table sorted by (host ASC, rank) and a
``{host: count}`` meta dict; the driver combines metas across shards
into global per-host offsets (metadata only — data blocks never touch
the driver).
"""

from __future__ import annotations

import os
import pickle

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from ..functions.hashing import fingerprint64
from ..functions.robots import RobotsRules, parse_robots
from .bloom import make_seen_filter, seen_filter_from_bytes
from .cuckoo import CuckooFilter
from .exactstore import ExactSeenStore

COUNTER_KEYS = ("offered", "admitted", "fetched", "robots_blocked", "not_found")


def shard_of(host: str, num_shards: int) -> int:
    return fingerprint64(host) % num_shards


@ray.remote
class FrontierActor:
    def __init__(
        self,
        shard_id: int,
        num_shards: int,
        politeness_budget: int = 8,
        filter_capacity: int = 1 << 20,
        store_exact: bool = True,
        salt_hosts: dict[str, int] | None = None,
        max_pages_per_host: int | None = None,
        robots_sidecar: str | None = None,
        exact_spill_dir: str | None = None,
        exact_spill_threshold: int = 1 << 20,
        seen_filter: str = "cuckoo",
        adaptive_recrawl: bool = False,
        adaptive_max_factor: int = 8,
        breaker_threshold: float = 0.0,
        breaker_min_attempts: int = 8,
        breaker_cooldown: int = 2,
        pending_spill_dir: str | None = None,
        pending_spill_threshold: int = 0,
        pending_spill_keep: int | None = None,
    ) -> None:
        # revisit-policy adaptation (Cho & Garcia-Molina 2003): when a
        # recurring re-fetch reports UNCHANGED content the interval
        # doubles (capped at base·max_factor); a CHANGED report resets it
        # to the registered base.  Purely shard-local state.
        self.adaptive_recrawl = adaptive_recrawl
        self.adaptive_max_factor = adaptive_max_factor
        self._base_interval: dict[int, int] = {}
        self.shard_id = shard_id
        self.num_shards = num_shards
        self.budget = politeness_budget
        # per-host TOTAL page cap across the whole crawl (the reference's
        # per-feed max_entries): once a host has emitted this many URLs,
        # its pending queue is discarded.  None = unlimited.
        self.max_per_host = max_pages_per_host
        self.emitted: dict[str, int] = {}
        # §7.6 mega-host salting: a salted host's queue is split across k
        # sub-shards (k actors), each granted budget//k per round — the
        # recombined per-host fetch count stays ≤ budget (politeness exact).
        # k > budget would give each of k sub-shards a floor of 1 URL/round
        # (up to k > budget fetches recombined), so it is rejected.
        self.salt_hosts = salt_hosts or {}
        for h, k in self.salt_hosts.items():
            if k > politeness_budget:
                raise ValueError(
                    f"salt_hosts[{h!r}]={k} exceeds politeness_budget="
                    f"{politeness_budget}: recombined fetches would break the "
                    f"per-host budget invariant"
                )
            if max_pages_per_host is not None and k > max_pages_per_host:
                # same floor-of-1 hazard as the budget: each of k sub-shards
                # would get max(1, cap//k)=1, so recombined emissions could
                # reach k > cap, silently breaking the per-host page cap
                raise ValueError(
                    f"salt_hosts[{h!r}]={k} exceeds max_pages_per_host="
                    f"{max_pages_per_host}: recombined emissions would break "
                    f"the per-host page-cap invariant"
                )
        # north-rule "bloom/cuckoo URL-seen": either filter kind satisfies
        # the no-false-negative contract; kind is frozen in the manifest
        self.seen = make_seen_filter(seen_filter, filter_capacity)
        # exact store (verification mode): bounded-memory LSM-lite — URL
        # strings spill to hash-sorted parquet segments, only 8 B/key
        # sorted hash arrays stay resident (state/exactstore.py)
        self.exact: ExactSeenStore | None = (
            ExactSeenStore(exact_spill_dir, exact_spill_threshold)
            if store_exact
            else None
        )
        # per-host pending lists, sorted ascending by (-priority, round, url)
        # EXCEPT hosts in _dirty (appended since last sort) — offers are
        # O(1) appends, the sort is amortized once per poll (hot path:
        # heappush per offer was the frontier's bottleneck at scale)
        self.heaps: dict[str, list[tuple[float, int, str, int]]] = {}
        self._dirty: set[str] = set()
        # pending-queue DISK SPILL (the frontier-memory complement of the
        # exact store's LSM: at 10^10 URLs the pending frontier dwarfs the
        # seen set).  When a host's sorted queue exceeds ``threshold``
        # rows after a poll, the tail beyond ``keep`` rows is written as
        # an immutable sorted parquet segment; only the best ``keep``
        # rows stay resident.  Per host we track segment paths, the
        # BOUNDARY (best spilled key — every spilled row sorts ≥ it is
        # false; it's the MINIMUM spilled key) and the spilled row count.
        # Poll reloads a host's segments only when the in-memory head can
        # no longer PROVE it dominates every spilled row (head shorter
        # than the budget, or its budget-th key ≥ boundary) — so emitted
        # order is byte-identical to the no-spill run by construction.
        self._pdir = pending_spill_dir
        self._pthresh = int(pending_spill_threshold or 0)
        self._pkeep = int(
            pending_spill_keep
            if pending_spill_keep is not None
            else max(politeness_budget * 4, 64)
        )
        if self._pthresh and self._pthresh <= self._pkeep:
            raise ValueError(
                f"pending_spill_threshold={self._pthresh} must exceed "
                f"pending_spill_keep={self._pkeep} (otherwise every poll spills)"
            )
        if self._pthresh and not pending_spill_dir:
            raise ValueError("pending_spill_threshold requires pending_spill_dir")
        self._pspill: dict[str, list[str]] = {}
        self._pboundary: dict[str, tuple] = {}
        self._pspill_rows: dict[str, int] = {}
        self._pseg_counter = 0
        # segments consumed by a reload/drop since the last durable
        # checkpoint: their files MUST outlive that checkpoint (it still
        # references them for resume) — deleted only after the NEXT
        # checkpoint (which no longer lists them) is atomically published
        self._pspill_consumed: list[str] = []
        self.robots: dict[str, RobotsRules] = {}
        self.counters = dict.fromkeys(COUNTER_KEYS, 0)
        self._last_meta: dict[str, int] = {}
        # per-feed re-crawl scheduling (the reference's Feed.interval loop,
        # in round units — the engine's deterministic clock): host →
        # {url_hash: [url, priority, interval, last_emit_round]}.  Due
        # entries re-enter the host's heap at poll time, bypassing the
        # seen-set (a re-fetch of a known URL is the point) but NOT the
        # politeness budget (they queue like any other candidate).
        self.recurring: dict[str, dict[int, list]] = {}
        # recurring hashes currently sitting in a heap (budget-starved):
        # prevents double-queueing; rebuilt from the heap on restore
        self._recurring_pending: dict[str, set[int]] = {}
        # last-seen content fingerprint per RECURRING url_hash (bounded by
        # |feeds| on this shard — tiny): powers the skip-unchanged
        # conditional re-crawl (If-Modified-Since semantics over the
        # simulated fetch).  _recurring_hashes is the flat membership
        # index (url_hash → host, for adaptive interval lookups); rebuilt
        # from ``recurring`` on restore.
        self.content_hash: dict[int, int] = {}
        self._recurring_hashes: dict[int, str] = {}
        self._result_tokens: set[int] = set()
        # transient-failure RETRY queue (exponential backoff): host →
        # {url_hash: [url, priority, attempts_done, due_round]}.  Due
        # entries re-enter the host's heap at poll time (bypassing the
        # seen filter — the URL IS seen; a retry is the point) but NOT
        # the politeness budget.  ``_retry_attempts`` (url_hash →
        # attempts so far) feeds the ready-set ``attempt`` column; an
        # entry pops when its row is emitted and is re-added only if the
        # fetch fails again.  Bounded by in-flight retries.
        self.retry: dict[str, dict[int, list]] = {}
        self._retry_attempts: dict[int, int] = {}
        self.gave_up = 0
        # hop depth per PENDING url_hash (crawl-depth limit support):
        # recorded at admission from the offer's ``hops`` column, popped
        # when the row is emitted (the value rides the ready set and the
        # offer stage derives children's depth from it).  A pending URL
        # rediscovered at a shallower depth keeps the MIN — min is
        # order-free, so the recorded depth is deterministic under any
        # offer-batch schedule.  Populated ONLY when the crawl sets
        # max_hops (otherwise offers carry no hops column and this stays
        # empty); memory is O(pending frontier), same order as the heaps
        # themselves — at 10^10 pending you'd fold hops into the heap
        # tuple + pending-spill schema instead of a side dict.
        self._hops: dict[int, int] = {}
        # cross-URL CONTENT-DIGEST dedup (the Heritrix "content-seen"
        # test, distinct from skip_unchanged's same-URL comparison):
        # ``_content_seen`` holds fingerprints SEALED at a round
        # boundary; ``_content_pending`` stages this round's sightings.
        # Round-granular visibility keeps the dup verdict independent of
        # batch scheduling order within a round (deterministic).  Shard
        # routing is hash % num_shards — orthogonal to the host-keyed URL
        # shards.  8 B/hash; at 10^10 pages this set takes the same
        # exact-store spill path the URL seen-set uses (exactstore.py).
        self._content_seen: set[int] = set()
        self._content_pending: set[int] = set()
        # per-host error-rate CIRCUIT BREAKER (host-level sibling of the
        # per-URL retry queue): when a host's status="error" fraction over
        # the last completed round reaches ``breaker_threshold`` (with at
        # least ``breaker_min_attempts`` rows observed), the host is
        # suspended — its queue is kept but not polled — for
        # ``breaker_cooldown`` rounds, then resumes automatically.  0.0 =
        # off.  Stats arrive per round via :meth:`record_host_errors` and
        # are evaluated (then cleared) at the NEXT poll, so the decision
        # uses exactly one round's evidence.  Deterministic (counts only,
        # no wall clock); suspension changes WHICH rounds a host's rows
        # appear in, never the frozen within-round ordering rule.
        self.breaker_threshold = breaker_threshold
        self.breaker_min = breaker_min_attempts
        self.breaker_cooldown = breaker_cooldown
        self._breaker_stats: dict[str, list[int]] = {}  # host → [rows, errors]
        self._suspended: dict[str, int] = {}  # host → last suspended round
        self._breaker_next_due: int | None = None
        if robots_sidecar is not None:
            self._load_robots_sidecar(robots_sidecar)

    def _load_robots_sidecar(self, path: str) -> None:
        """Shard-local robots preload in the CONSTRUCTOR (round-3): actor
        methods can never run before ``__init__``, so offers are guaranteed
        to see the rules — without any driver-side barrier.  The parse work
        runs in parallel across the pool, overlapped with process spawn,
        collapsing the driver's sequential robots phase to ~0.  Keeps a
        host's rules iff this shard serves any of its (sub-)queues (salted
        hosts replicate to every sub-shard target, mirroring the driver
        loader's ``_salted_robots_targets``).  Scale note: every actor reads
        the whole sidecar (one small host→body table); at 10^8-host scale
        the sidecar should be hash-partitioned by host so each shard reads
        only its row groups — the filter below is already shard-local."""
        if not os.path.exists(path):
            return
        t = pq.read_table(path)
        for host, body in zip(t["host"].to_pylist(), t["body"].to_pylist()):
            k = self.salt_hosts.get(host)
            mine = fingerprint64(host) % self.num_shards == self.shard_id
            if k and not mine:
                mine = any(
                    fingerprint64(f"{host}#{j}") % self.num_shards == self.shard_id
                    for j in range(k)
                )
            if mine:
                self.robots[host] = parse_robots(body)

    # ------------------------------------------------------------ warmup
    def warmup(self) -> int:
        """Exercise the offer path's numpy/pyarrow kernels on THROWAWAY
        state so the first real offer doesn't pay per-process lazy-import
        and kernel-init costs (~0.5 s/actor measured).  Fired right after
        actor creation, overlapped with fetch-side warm."""
        scratch = CuckooFilter(capacity=1 << 10)
        keys = np.arange(64, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        scratch.add_batch(keys)
        scratch.contains_batch(keys)
        t = pa.table({"x": pa.array(range(8), pa.uint64())})
        t.filter(pa.array([True] * 8)).to_pylist()
        np.unique(keys, return_index=True)
        return 1

    # ------------------------------------------------------------ robots
    def load_robots(self, table: pa.Table) -> int:
        """Rows (host, body binary) → parsed rules for this shard's hosts."""
        for host, body in zip(table["host"].to_pylist(), table["body"].to_pylist()):
            self.robots[host] = parse_robots(body)
        return len(self.robots)

    def _allowed(self, host: str, url: str) -> bool:
        rules = self.robots.get(host)
        if rules is None:
            return True
        path = url.split("/", 3)
        return rules.allowed("/" + path[3] if len(path) > 3 else "/")

    # ------------------------------------------------------------- offer
    def offer(self, table: pa.Table) -> dict[str, int]:
        """Candidate URLs in (columns url, url_hash, host, priority, round).
        Dedup via cuckoo seen-set, robots gate, push to per-host heaps.

        Hot path is vectorized (round-2 rework): membership runs as ONE
        numpy pass over the uint64 hash batch (``contains_batch``), so
        per-row Python work is confined to the NEW rows (robots gate +
        heap append) — in late rounds the duplicate majority costs
        O(vectorized) instead of a per-key cuckoo probe.

        Dedup identity: exact on the 64-bit hash in verification mode
        (order-independent → deterministic under racing offer tasks);
        pure cuckoo when store_exact=False (10^10 scale).  The filter is
        kept in sync either way so checkpoints are mode-portable."""
        import numpy as np

        n = table.num_rows
        if n == 0:
            return {"offered": 0, "admitted": 0, "robots_blocked": 0}
        hh = table["url_hash"].to_numpy(zero_copy_only=False).astype(np.uint64, copy=False)
        # first-occurrence dedup within the batch (sequential-equivalent)
        uniq, first_idx = np.unique(hh, return_index=True)
        hops_of: dict[int, int] | None = None
        if "hops" in table.column_names:
            # crawl-depth mode: per-hash MIN hop depth across in-batch
            # duplicates, then a min-merge into any still-PENDING entry
            # (deterministic: min commutes across racing offer batches)
            hop_arr = table["hops"].to_numpy(zero_copy_only=False).astype(np.int64)
            inv = np.searchsorted(uniq, hh)
            hmin = np.full(len(uniq), np.iinfo(np.int64).max, dtype=np.int64)
            np.minimum.at(hmin, inv, hop_arr)
            hops_of = dict(zip(map(int, uniq), map(int, hmin)))
            ph = self._hops
            if ph:
                for u, hm in hops_of.items():
                    cur = ph.get(u)
                    if cur is not None and hm < cur:
                        ph[u] = hm
        if self.exact is not None:
            maybe = self.seen.contains_batch(uniq)
            new_u = ~maybe
            # filter-positive rows need the exact map's verdict (a cuckoo
            # hit can be a fingerprint collision — never drop on it alone)
            mi = np.flatnonzero(maybe)
            if len(mi):
                new_u[mi] = self.exact.confirm_new(uniq[mi])
            # insert into the filter ONLY keys the filter did not already
            # claim (scalar add()'s behavior: a filter hit skips insert)
            ins = ~maybe & new_u
            self.seen.insert_batch(uniq[ins])
            self.seen.count += int(ins.sum())
        else:
            new_u = self.seen.add_batch(uniq)
        new_rows = np.zeros(n, dtype=bool)
        new_rows[first_idx[new_u]] = True
        admitted = blocked = 0
        if new_rows.any():
            sub = table.filter(pa.array(new_rows))
            urls = sub["url"].to_pylist()
            hashes = sub["url_hash"].to_pylist()
            hosts = sub["host"].to_pylist()
            negp = np.negative(
                sub["priority"].to_numpy(zero_copy_only=False)
            ).tolist()
            rounds = sub["round"].to_pylist()
            if self.exact is not None:
                # seen even if robots-blocked below — one C-level update
                self.exact.add_many(zip(hashes, urls))
            # hot loop: robots gate inlined (a self._allowed call per row
            # pays Ray's actor-method tracing wrapper each time) and all
            # attribute lookups pre-bound
            robots_get = self.robots.get
            heaps = self.heaps
            dirty_add = self._dirty.add
            for url, h, host, np_, rnd in zip(urls, hashes, hosts, negp, rounds):
                rules = robots_get(host)
                if rules is not None:
                    parts = url.split("/", 3)
                    if not rules.allowed("/" + parts[3] if len(parts) > 3 else "/"):
                        blocked += 1
                        continue  # seen but never fetched
                lst = heaps.get(host)
                if lst is None:
                    lst = heaps[host] = []
                lst.append((np_, rnd, url, h))
                dirty_add(host)
                if hops_of is not None:
                    self._hops[h] = hops_of[h]
            admitted = sub.num_rows - blocked
        self.counters["offered"] += n
        self.counters["admitted"] += admitted
        self.counters["robots_blocked"] += blocked
        if self.exact is not None:
            self.exact.maybe_spill()  # bounded memtable (once per batch)
        return {"offered": n, "admitted": admitted, "robots_blocked": blocked}

    # --------------------------------------------------------- recurring
    def register_recurring(self, table: pa.Table) -> dict[str, int]:
        """Rows (url, url_hash, host, priority, interval) → recurring
        registry entries.  First emission is round 0 (the seed offer
        already queued the URL); re-emissions happen every ``interval``
        rounds after the last one.  Robots-disallowed URLs are never
        registered (and re-checked at emit time, since robots rules may
        load after registration)."""
        n = 0
        for url, h, host, prio, iv in zip(
            table["url"].to_pylist(),
            table["url_hash"].to_pylist(),
            table["host"].to_pylist(),
            table["priority"].to_pylist(),
            table["interval"].to_pylist(),
        ):
            if iv and iv > 0 and self._allowed(host, url):
                self.recurring.setdefault(host, {})[h] = [url, float(prio or 1.0), int(iv), 0]
                self._recurring_hashes[h] = host
                self._base_interval[h] = int(iv)
                n += 1
        return {"admitted": n}

    def record_content_hashes(self, table: pa.Table) -> int:
        """Rows (url_hash, content_hash) from the extract stage → update
        the last-seen content fingerprint of RECURRING urls (others are
        ignored: they are fetched once, so there is nothing to compare a
        future fetch against).  Idempotent — last write wins and equal
        content yields equal hashes.  With ``adaptive_recrawl`` the
        report also steers the revisit policy: unchanged content doubles
        the feed's interval (capped at base·max_factor), changed content
        resets it to the registered base."""
        n = 0
        rh = self._recurring_hashes
        for h, ch in zip(
            table["url_hash"].to_pylist(), table["content_hash"].to_pylist()
        ):
            host = rh.get(h)
            if host is None:
                continue
            if self.adaptive_recrawl:
                prev = self.content_hash.get(h)
                ent = self.recurring[host][h]
                base = self._base_interval.get(h, ent[2])
                if prev is not None:
                    if ch == prev:
                        ent[2] = min(ent[2] * 2, base * self.adaptive_max_factor)
                    else:
                        ent[2] = base
            self.content_hash[h] = ch
            n += 1
        return n

    def check_stage_content(self, hashes) -> "np.ndarray":
        """Content-seen test (Heritrix's content-digest dedup, applied
        cross-URL): returns a bool mask of content fingerprints already
        SEALED (first fetched in a strictly earlier round), and stages
        every incoming fingerprint into the pending set, visible only
        after the next :meth:`seal_content`.  Both halves are idempotent
        (set semantics; the visible set is frozen for the whole round),
        so Ray task retries of the extract stage cannot change any
        verdict."""
        h = np.asarray(hashes, dtype=np.uint64)
        seen = self._content_seen
        mask = np.fromiter(
            (int(x) in seen for x in h), dtype=bool, count=len(h)
        )
        self._content_pending.update(int(x) for x in h)
        return mask

    def seal_content(self) -> int:
        """Round-boundary seal: this round's staged content fingerprints
        become visible to the NEXT round's dup test.  Called by the
        crawl loop after the round's log write (the round barrier) and
        BEFORE the checkpoint, so a resumed run re-tests later rounds
        against exactly the sealed set the original run used."""
        self._content_seen |= self._content_pending
        self._content_pending.clear()
        return len(self._content_seen)

    def _emit_due_recurring(self, round_idx: int) -> None:
        for host, entries in self.recurring.items():
            pending = self._recurring_pending.setdefault(host, set())
            for h, ent in entries.items():
                url, prio, iv, last = ent
                if round_idx - last >= iv:
                    if h in pending:
                        # previous emission still budget-starved in the
                        # heap — don't double-queue; cadence restarts
                        # after the pending copy is actually emitted
                        ent[3] = round_idx
                        continue
                    if not self._allowed(host, url):
                        # robots rules may have arrived post-registration.
                        # The entry is treated as EMITTED for cadence
                        # purposes: robots re-evaluates after a full
                        # ``interval`` rounds, not next round.  Deliberate —
                        # a frozen-in-the-past due round would make
                        # next_due_round() return nxt <= r forever (masking
                        # other feeds' future dues from the driver's idle
                        # fast-forward), and a re-arm-next-round retry would
                        # turn a permanently blocked feed into one idle
                        # round per round until max_rounds.
                        ent[3] = round_idx
                        continue
                    self.heaps.setdefault(host, []).append((-prio, round_idx, url, h))
                    self._dirty.add(host)
                    pending.add(h)
                    ent[3] = round_idx

    def next_due_round(self) -> int | None:
        """Earliest future round at which a recurring entry re-emits or a
        retry comes due (the driver fast-forwards idle gaps instead of
        running empty rounds)."""
        due = [
            ent[3] + ent[2]
            for entries in self.recurring.values()
            for ent in entries.values()
        ]
        due += [
            ent[3] for entries in self.retry.values() for ent in entries.values()
        ]
        if self._breaker_next_due is not None:
            due.append(self._breaker_next_due)
        return min(due) if due else None

    # ------------------------------------------------------------- retry
    def schedule_retries(
        self, table: pa.Table, failed_round: int, max_retries: int
    ) -> dict[str, int]:
        """Rows (url_hash, url, host, priority, attempt) that failed in
        ``failed_round``: re-queue with exponential backoff — the n-th
        retry comes due at failed_round + 2^(n−1) — until ``max_retries``
        attempts are exhausted, then give up permanently (the crawl log
        already carries each attempt's status="error" row)."""
        scheduled = 0
        hops_col = (
            table["hops"].to_pylist() if "hops" in table.column_names
            else [0] * table.num_rows
        )
        for h, url, host, prio, att, hop in zip(
            table["url_hash"].to_pylist(), table["url"].to_pylist(),
            table["host"].to_pylist(), table["priority"].to_pylist(),
            table["attempt"].to_pylist(), hops_col,
        ):
            attempts_done = int(att) + 1
            if attempts_done > max_retries:
                self.gave_up += 1
                self._retry_attempts.pop(int(h), None)
                continue
            due = failed_round + (1 << (attempts_done - 1))
            self.retry.setdefault(host, {})[int(h)] = [
                url, float(prio), attempts_done, int(due), int(hop or 0)
            ]
            self._retry_attempts[int(h)] = attempts_done
            scheduled += 1
        return {"scheduled": scheduled, "gave_up": self.gave_up}

    def _emit_due_retries(self, round_idx: int) -> None:
        """Push due retry entries back into their host heaps (seen-filter
        bypass by construction; politeness still applies at poll)."""
        for host in list(self.retry):
            entries = self.retry[host]
            due_hashes = [h for h, ent in entries.items() if ent[3] <= round_idx]
            if not due_hashes:
                continue
            heap = self.heaps.setdefault(host, [])
            for h in due_hashes:
                ent = entries.pop(h)
                url, prio = ent[0], ent[1]
                due = ent[3]
                # 5th field = hop depth (pre-upgrade checkpoints carry 4)
                if len(ent) > 4 and ent[4]:
                    self._hops[h] = int(ent[4])
                heap.append((-prio, due, url, h))
            self._dirty.add(host)
            if not entries:
                del self.retry[host]

    # ---------------------------------------------------- pending spill
    def _spill_tail(self, host: str, rest: list) -> list:
        """``rest`` (sorted) exceeded the spill threshold: keep the best
        ``_pkeep`` rows resident, write the tail as one immutable sorted
        parquet segment (atomic tmp+rename), and lower the host's
        boundary to the tail's best key.  Returns the kept head."""
        keep, tail = rest[: self._pkeep], rest[self._pkeep:]
        os.makedirs(self._pdir, exist_ok=True)
        self._pseg_counter += 1
        path = os.path.join(
            self._pdir, f"pseg-{self.shard_id:05d}-{self._pseg_counter:010d}.parquet"
        )
        t = pa.table(
            {
                "negp": pa.array([r[0] for r in tail], pa.float64()),
                "round": pa.array([r[1] for r in tail], pa.int64()),
                "url": pa.array([r[2] for r in tail], pa.string()),
                "h": pa.array([r[3] for r in tail], pa.uint64()),
            }
        )
        tmp = path + ".tmp"
        pq.write_table(t, tmp)
        os.replace(tmp, path)
        self._pspill.setdefault(host, []).append(path)
        b = (tail[0][0], int(tail[0][1]), tail[0][2], int(tail[0][3]))
        cur = self._pboundary.get(host)
        self._pboundary[host] = b if cur is None or b < cur else cur
        self._pspill_rows[host] = self._pspill_rows.get(host, 0) + len(tail)
        return keep

    def _reload_spill(self, host: str, lst: list) -> list:
        """Merge every spilled segment of ``host`` back into its resident
        list and re-sort.  Called only when the resident head can no
        longer prove it dominates the spill.  Files are NOT deleted here:
        the last durable checkpoint may still reference them for resume —
        they join ``_pspill_consumed`` and are garbage-collected after the
        next checkpoint publishes."""
        for p in self._pspill.pop(host):
            t = pq.read_table(p)
            lst.extend(
                zip(
                    t["negp"].to_pylist(),
                    (int(x) for x in t["round"].to_pylist()),
                    t["url"].to_pylist(),
                    (int(x) for x in t["h"].to_pylist()),
                )
            )
            self._pspill_consumed.append(p)
        self._pboundary.pop(host, None)
        self._pspill_rows.pop(host, None)
        lst.sort()
        return lst

    def _drop_spill(self, host: str) -> None:
        """Host queue discarded (page cap reached): release its segments
        (files persist until the next checkpoint stops referencing them)."""
        self._pspill_consumed.extend(self._pspill.pop(host, []))
        self._pboundary.pop(host, None)
        self._pspill_rows.pop(host, None)

    # -------------------------------------------------------------- poll
    def poll_ready_meta(
        self,
        round_idx: int,
        chunk_rows: int = 1024,
        chunk_order: str = "host",
        num_buckets: int = 64,
    ) -> dict:
        """Two-phase poll, phase 1: pop this round's ready set into staged
        chunks of ≤chunk_rows and return ONLY metadata — per-host counts
        (for global fetch_seq offsets) and the chunk count.  Phase 2
        (:meth:`ready_chunk`) hands each chunk out as its own object ref,
        so the driver's ``from_arrow_refs`` sees many blocks and the
        round's map stages parallelize across the whole cluster instead
        of one task per frontier shard."""
        t = self.poll_ready(round_idx)
        if chunk_order == "bucket" and t.num_rows:
            # bucket-contiguous chunks: each downstream fetch task touches
            # ~1 pages bucket instead of all of them (storage-direct J1).
            # fetch_seq ordering is unaffected — it comes from host_rank +
            # per-host offsets, not from chunk order.
            import numpy as np

            h = t["url_hash"].to_numpy(zero_copy_only=False)
            perm = np.argsort(h % num_buckets, kind="stable")
            t = t.take(pa.array(perm, pa.int64()))
        self._chunks = [
            t.slice(i, chunk_rows) for i in range(0, max(t.num_rows, 1), chunk_rows)
        ]
        if t.num_rows == 0:
            self._chunks = []
        return {
            "hosts": self._last_meta,
            "n_chunks": len(self._chunks),
            "next_due": self.next_due_round(),
        }

    def ready_chunk(self, i: int) -> pa.Table:
        """Two-phase poll, phase 2: staged chunk i (host-ASC slice order)."""
        return self._chunks[i]

    def poll_ready(self, round_idx: int) -> pa.Table:
        """Pop ≤budget per host in the frozen politeness order; returns the
        shard's ready table sorted (host ASC, rank ASC)."""
        self._result_tokens.clear()  # round boundary: new token scope
        if self.recurring:
            self._emit_due_recurring(round_idx)
        if self.retry:
            self._emit_due_retries(round_idx)
        self._breaker_next_due = None
        if self.breaker_threshold:
            # evaluate last round's evidence, then clear the window: a host
            # at/over the error-rate threshold (with enough observations)
            # sits out ``breaker_cooldown`` rounds starting now
            for host, (rows, errs) in self._breaker_stats.items():
                if rows >= self.breaker_min and errs >= self.breaker_threshold * rows:
                    self._suspended[host] = round_idx + self.breaker_cooldown - 1
            self._breaker_stats.clear()
        urls, hashes, hosts, prios, ranks = [], [], [], [], []
        meta: dict[str, int] = {}
        poll_hosts = (
            sorted(set(self.heaps) | set(self._pspill))
            if self._pspill
            else sorted(self.heaps)
        )
        for host in poll_hosts:
            if self.breaker_threshold and self._suspended.get(host, -1) >= round_idx:
                # suspended: keep the queue, skip the round; surface the
                # resume round so the driver's idle fast-forward can't
                # strand a shard whose only pending hosts are cooling down
                d = self._suspended[host] + 1
                if self._breaker_next_due is None or d < self._breaker_next_due:
                    self._breaker_next_due = d
                continue
            lst = self.heaps.get(host)
            if lst is None:
                lst = self.heaps[host] = []
            if host in self._dirty:
                lst.sort()
                self._dirty.discard(host)
            k = self.salt_hosts.get(host)
            budget = self.budget
            rr = self.robots.get(host)
            if rr is not None and rr.crawl_delay and rr.crawl_delay > 1:
                # Crawl-delay enforcement (de-facto robots extension; RFC
                # 9309 leaves it out but crawlers honor it): the round is
                # the scheduling quantum, so a host asking for d units
                # between fetches gets budget/d slots per round, floor 1.
                # Deterministic — no wall clock enters the rule.
                budget = max(1, int(budget / rr.crawl_delay))
            if k:
                # salted hosts floor at 1 per sub-shard: recombined
                # politeness stays ≤ the configured budget (k ≤ budget is
                # validated), though a delay-scaled budget below k is
                # effectively raised to k — a host both mega (salted) and
                # delay-restricted resolves in favor of progress
                budget = max(1, budget // k)
            if self.max_per_host is not None:
                # salted hosts split the cap like the budget (cap//k per
                # sub-shard → recombined total stays ≤ cap)
                cap = max(1, self.max_per_host // k) if k else self.max_per_host
                left = cap - self.emitted.get(host, 0)
                if left <= 0:
                    del self.heaps[host]  # cap reached: discard the queue
                    if host in self._pspill:
                        self._drop_spill(host)
                    continue
                budget = min(budget, left)
            if host in self._pspill and (
                len(lst) < budget or lst[budget - 1] >= self._pboundary[host]
            ):
                # the resident head cannot prove it dominates the spill:
                # merge the segments back before emitting (byte-identical
                # order to the no-spill run by construction)
                lst = self._reload_spill(host, lst)
            take = lst[:budget]
            if take:
                negp, _rnd, u, h = zip(*take)  # C-level column split
                pend = self._recurring_pending.get(host)
                if pend:
                    pend.difference_update(h)  # emitted → cadence may resume
                urls.extend(u)
                hashes.extend(h)
                hosts.extend([host] * len(take))
                prios.extend(-p for p in negp)
                ranks.extend(range(len(take)))
                meta[host] = len(take)
                if self.max_per_host is not None:
                    self.emitted[host] = self.emitted.get(host, 0) + len(take)
            rest = lst[budget:]
            if rest:
                if self._pthresh and len(rest) > self._pthresh:
                    rest = self._spill_tail(host, rest)  # sorted head kept
                self.heaps[host] = rest  # still sorted
            else:
                del self.heaps[host]
        self._last_meta = meta
        # conditional-re-crawl sidecar columns: track=1 marks a RECURRING
        # url (its content hash is worth recording); prev_hash carries the
        # last-seen content fingerprint (0 = none yet).  Fast path: no
        # recurring feeds on this shard → constant zero columns.
        if self._recurring_hashes:
            rh = self._recurring_hashes
            ch = self.content_hash
            track = np.fromiter(
                (h in rh for h in hashes), dtype=np.int8, count=len(hashes)
            )
            prev = np.fromiter(
                (ch.get(h, 0) for h in hashes), dtype=np.uint64, count=len(hashes)
            )
        else:
            track = np.zeros(len(hashes), dtype=np.int8)
            prev = np.zeros(len(hashes), dtype=np.uint64)
        if self._retry_attempts:
            # pop on emit: if this attempt fails again, schedule_retries
            # re-adds with the incremented count; on success it's gone
            ra = self._retry_attempts
            attempt = np.fromiter(
                (ra.pop(h, 0) for h in hashes), dtype=np.int32, count=len(hashes)
            )
        else:
            attempt = np.zeros(len(hashes), dtype=np.int32)
        if self._hops:
            # crawl-depth sidecar: pop on emit (a re-add happens only via
            # the retry path, which restores the entry); 0 = seed depth
            hp = self._hops
            hops = np.fromiter(
                (hp.pop(h, 0) for h in hashes), dtype=np.int32, count=len(hashes)
            )
        else:
            hops = np.zeros(len(hashes), dtype=np.int32)
        return pa.table(
            {
                "hops": pa.array(hops, pa.int32()),
                "attempt": pa.array(attempt, pa.int32()),
                "url_hash": pa.array(hashes, pa.uint64()),
                "url": pa.array(urls, pa.string()),
                "host": pa.array(hosts, pa.string()),
                "priority": pa.array(prios, pa.float64()),
                "round": pa.array(
                    np.full(len(urls), round_idx, dtype=np.int32)
                ),
                "host_rank": pa.array(ranks, pa.int64()),
                "sub": pa.array([self.shard_id] * len(urls), pa.int32()),
                "track": pa.array(track, pa.int8()),
                "prev_hash": pa.array(prev, pa.uint64()),
            }
        )

    def poll_meta(self) -> dict[str, int]:
        """Per-host ready counts of the LAST poll — tiny, driver-safe."""
        return self._last_meta

    def record_results(self, fetched: int, not_found: int, token: int | None = None) -> None:
        """Lineage counter update.  ``token`` (the batch's min fetch_seq —
        globally unique per batch) makes the call IDEMPOTENT: a Ray Data
        task retry re-sending the same batch's counts is ignored, keeping
        counters == written-log rows under fault recovery.  Tokens reset
        at each poll (round boundary)."""
        if token is not None:
            if token in self._result_tokens:
                return
            self._result_tokens.add(token)
        self.counters["fetched"] += fetched
        self.counters["not_found"] += not_found

    def record_host_errors(self, table: pa.Table, token: int | None = None) -> int:
        """Circuit-breaker evidence: rows (host, n, n_err) — per-host row
        and status="error" counts from one offer-stage batch.  Idempotent
        under task retries via the same fetch_seq-token scope as
        :meth:`record_results` (a replayed batch must not double-count a
        host toward suspension).  Accumulates until the next poll
        evaluates and clears the window."""
        if token is not None:
            tok = ("breaker", token)
            if tok in self._result_tokens:
                return 0
            self._result_tokens.add(tok)
        n = 0
        for host, rows, errs in zip(
            table["host"].to_pylist(), table["n"].to_pylist(),
            table["n_err"].to_pylist(),
        ):
            st = self._breaker_stats.setdefault(host, [0, 0])
            st[0] += int(rows)
            st[1] += int(errs)
            n += 1
        return n

    # ------------------------------------------------------------- state
    def pending_count(self) -> int:
        return sum(len(h) for h in self.heaps.values()) + sum(
            self._pspill_rows.values()
        )

    def stats(self) -> dict:
        return {
            "shard": self.shard_id,
            "pending": self.pending_count(),
            "seen": self.seen.count,
            "load_factor": self.seen.load_factor(),
            "gave_up": self.gave_up,
            **self.counters,
        }

    def export_seen(self) -> pa.Table:
        """Seen-set shard for S6 export (verification mode only): k-way
        merge of the spill segments + memtable, sorted by url_hash."""
        if self.exact is None:
            raise RuntimeError("seen-set export requires store_exact=True")
        return self.exact.export()

    # -------------------------------------------------------- checkpoint
    def checkpoint(self, ckpt_dir: str, round_idx: int) -> dict:
        """Atomic per-shard checkpoint: frontier rows + filter + robots +
        counters → parquet+pickle under tmp name, then rename."""
        os.makedirs(ckpt_dir, exist_ok=True)
        rows = []
        for host, heap in self.heaps.items():
            for negp, rnd, url, h in heap:
                rows.append((h, url, host, -negp, rnd))
        rows.sort(key=lambda r: (r[2], r[1]))
        frontier = pa.table(
            {
                "url_hash": pa.array([r[0] for r in rows], pa.uint64()),
                "url": pa.array([r[1] for r in rows], pa.string()),
                "host": pa.array([r[2] for r in rows], pa.string()),
                "priority": pa.array([r[3] for r in rows], pa.float64()),
                "round": pa.array([r[4] for r in rows], pa.int32()),
            }
        )
        blob = {
            "filter": self.seen.to_bytes(),
            # bounded: the memtable (≤ threshold entries) + segment paths;
            # segment FILES are immutable and live outside the blob
            "exact": self.exact.state_blob() if self.exact is not None else None,
            "robots": {h: r.to_tuple() for h, r in self.robots.items()},
            "counters": self.counters,
            "recurring": self.recurring,
            "content_hash": self.content_hash,
            "base_interval": self._base_interval,
            "emitted": self.emitted,
            "retry": self.retry,
            "retry_attempts": self._retry_attempts,
            "gave_up": self.gave_up,
            "hops": self._hops,
            "breaker_stats": self._breaker_stats,
            "suspended": self._suspended,
            # sealed content-digest set as a compact uint64 array (the
            # pending set is empty here: seal_content runs before every
            # checkpoint); sorted → byte-stable blobs for equal state
            "content_seen": np.fromiter(
                sorted(self._content_seen), dtype=np.uint64,
                count=len(self._content_seen),
            ) if self._content_seen else None,
            # pending-spill metadata only: segment FILES are immutable on
            # disk (same pattern as the exact store); the counter persists
            # so post-resume spills never collide with listed segments
            "pending_spill": {
                "segs": self._pspill,
                "boundary": self._pboundary,
                "rows": self._pspill_rows,
                "counter": self._pseg_counter,
            },
            "round": round_idx,
        }
        fpath = os.path.join(ckpt_dir, f"shard-{self.shard_id:05d}.parquet")
        spath = os.path.join(ckpt_dir, f"shard-{self.shard_id:05d}.state")
        for path, write in (
            (fpath, lambda p: pq.write_table(frontier, p)),
            (spath, lambda p: open(p, "wb").write(pickle.dumps(blob, protocol=4))),
        ):
            tmp = path + ".tmp"
            write(tmp)
            os.replace(tmp, path)
        # the new checkpoint no longer references consumed segments — now
        # (and only now) their files are safe to delete; a crash anywhere
        # before this point leaves every referenced file on disk
        for p in self._pspill_consumed:
            try:
                os.remove(p)
            except OSError:
                pass
        self._pspill_consumed = []
        return {
            "partition_id": self.shard_id,
            "round": round_idx,
            **self.counters,
            "filter_bytes": len(blob["filter"]),
        }

    def restore(self, ckpt_dir: str) -> int:
        fpath = os.path.join(ckpt_dir, f"shard-{self.shard_id:05d}.parquet")
        spath = os.path.join(ckpt_dir, f"shard-{self.shard_id:05d}.state")
        frontier = pq.read_table(fpath)
        with open(spath, "rb") as f:
            blob = pickle.load(f)
        self.seen = seen_filter_from_bytes(blob["filter"])
        self.exact = (
            ExactSeenStore.from_blob(blob["exact"])
            if blob["exact"] is not None
            else None
        )
        self.robots = {h: RobotsRules.from_tuple(t) for h, t in blob["robots"].items()}
        self.counters = blob["counters"]
        self.recurring = blob.get("recurring", {})
        self.content_hash = blob.get("content_hash", {})
        self._recurring_hashes = {
            h: host for host, entries in self.recurring.items() for h in entries
        }
        # pre-adaptive blobs carry no base table: current interval = base
        self._base_interval = blob.get("base_interval") or {
            h: entries[h][2]
            for entries in self.recurring.values()
            for h in entries
        }
        self.emitted = blob.get("emitted", {})
        # pre-retry blobs carry no retry state
        self.retry = blob.get("retry", {})
        self._retry_attempts = blob.get("retry_attempts", {})
        self.gave_up = blob.get("gave_up", 0)
        self._hops = blob.get("hops", {})  # pre-depth blobs carry none
        cs = blob.get("content_seen")
        self._content_seen = set(map(int, cs)) if cs is not None else set()
        self._content_pending = set()
        # pre-breaker blobs carry no breaker state
        self._breaker_stats = blob.get("breaker_stats", {})
        self._suspended = blob.get("suspended", {})
        self._breaker_next_due = None
        self._recurring_pending = {}
        self._result_tokens = set()
        ps = blob.get("pending_spill")  # pre-spill blobs carry none
        if ps:
            self._pspill = ps["segs"]
            self._pboundary = ps["boundary"]
            self._pspill_rows = ps["rows"]
            self._pseg_counter = ps["counter"]
            for host, paths in self._pspill.items():
                for p in paths:
                    if not os.path.exists(p):
                        raise FileNotFoundError(
                            f"pending-spill segment missing on resume: {p}"
                        )
        else:
            self._pspill, self._pboundary, self._pspill_rows = {}, {}, {}
            self._pseg_counter = 0
        self._pspill_consumed = []  # orphans from the killed run are inert
        self.heaps = {}
        self._dirty = set()
        for h, url, host, prio, rnd in zip(
            frontier["url_hash"].to_pylist(),
            frontier["url"].to_pylist(),
            frontier["host"].to_pylist(),
            frontier["priority"].to_pylist(),
            frontier["round"].to_pylist(),
        ):
            self.heaps.setdefault(host, []).append((-prio, rnd, url, h))
            self._dirty.add(host)
        # pending recurring emissions are exactly the recurring hashes that
        # sit in the restored heap — rebuild instead of persisting
        for host, entries in self.recurring.items():
            in_heap = {hh for (_n, _r, _u, hh) in self.heaps.get(host, [])}
            pend = set(entries) & in_heap
            if pend:
                self._recurring_pending[host] = pend
        return blob["round"]


def checkpoint_stats(ckpt_dir: str) -> "pa.Table":
    """FRONTIER OBSERVABILITY — one row per checkpoint shard with the
    operational metrics an on-call crawl operator reads first: pending
    queue depth, host spread, seen-filter footprint, robots/recurring
    registry sizes, content-digest count, pending-spill pressure, and
    the lineage counters.  The checkpoint files are the engine's OWN
    durable state (parquet frontier + pickled blob per shard), so the
    read is exact and needs no running crawl.

    Scale shape: one Ray task per shard (shards are the parallelism
    unit, like WARC files); each blob is memory-bounded by construction
    (exact store memtable-capped, spill metadata only), and only the
    one-row summaries return to the driver."""
    import glob as _glob

    import ray

    shard_files = sorted(_glob.glob(os.path.join(ckpt_dir, "shard-*.state")))

    @ray.remote
    def summarize(spath: str) -> dict:
        import pickle as _pickle

        import pyarrow.parquet as _pq

        with open(spath, "rb") as f:
            blob = _pickle.load(f)
        fpath = spath[: -len(".state")] + ".parquet"
        meta = _pq.ParquetFile(fpath)
        hosts = set(
            meta.read(columns=["host"])["host"].to_pylist()
        )
        sp = blob.get("pending_spill") or {}
        c = blob.get("counters") or {}
        cs = blob.get("content_seen")
        return {
            "shard_id": int(os.path.basename(spath)[6:11]),
            "round": int(blob.get("round", -1)),
            "pending_urls": int(meta.metadata.num_rows),
            "n_hosts": len(hosts),
            "filter_bytes": len(blob.get("filter", b"")),
            "robots_hosts": len(blob.get("robots", {})),
            "recurring_feeds": len(blob.get("recurring", {})),
            "content_digests": 0 if cs is None else int(len(cs)),
            "spill_segments": sum(len(v) for v in (sp.get("segs") or {}).values()),
            "spill_rows": sum((sp.get("rows") or {}).values()),
            "fetched": int(c.get("fetched", 0)),
            "parsed": int(c.get("parsed", 0)),
            "errors": int(c.get("errors", 0)),
        }

    rows = ray.get([summarize.remote(p) for p in shard_files])
    rows.sort(key=lambda r: r["shard_id"])
    if not rows:
        return pa.table({"shard_id": pa.array([], pa.int64())})
    cols = list(rows[0].keys())
    return pa.table({k: pa.array([r[k] for r in rows]) for k in cols})
