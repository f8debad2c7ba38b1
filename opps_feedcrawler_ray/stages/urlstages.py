"""Vectorized map_batches stages over Arrow batches (SURVEY.md §2.2).

Every stage is Arrow-in / Arrow-out (``batch_format="pyarrow"``,
zero-copy from the object store) and row-loop-free except where the
kernel is inherently per-string (urlsplit / HTMLParser) — those loops
run over a single batch inside one task, never on the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.extract import (
    detect_kind,
    detect_soft404,
    extract_canonical,
    extract_meta_refresh,
    extract_page,
    extract_robots_directives,
)
from ..functions.hashing import fingerprint64, fingerprint64_batch
from ..functions.urlnorm import (
    canonicalize_batch,
    compile_param_rules,
    strip_query_params,
    surt_form,
)


class CanonicalizeStage:
    """url → url_canon, surt, host, url_hash; drops non-canonicalizable rows.

    ``url_col`` names the input column; output column is always ``url``
    (the canonical form REPLACES the raw string downstream).
    """

    def __init__(self, url_col: str = "url", keep: list[str] | None = None,
                 strip_params: list[str] | None = None) -> None:
        self.url_col = url_col
        self.keep = keep
        # opt-in tracking-param scrub (utm_*, gclid, ...): applied AFTER
        # the frozen canonicalizer, then surt/hash recompute — the frozen
        # canon spec itself is untouched
        self._strip_rules = (
            compile_param_rules(strip_params) if strip_params else None
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch[self.url_col].to_pylist()
        canon, surt, host = canonicalize_batch(urls)
        if self._strip_rules is not None:
            exact, pfx = self._strip_rules
            stripped = [
                strip_query_params(c, exact, pfx) if c and "?" in c else c
                for c in canon
            ]
            surt = [
                surt_form(s) if s is not None and s != c else su
                for s, c, su in zip(stripped, canon, surt)
            ]
            canon = stripped
        mask = np.array([c is not None for c in canon], dtype=bool)
        canon_v = [c for c in canon if c is not None]
        hashes = fingerprint64_batch(canon_v)
        out_cols: dict[str, pa.Array] = {
            "url": pa.array(canon_v, pa.string()),
            "surt": pa.array([s for s in surt if s is not None], pa.string()),
            "host": pa.array([h for h in host if h is not None], pa.string()),
            "url_hash": pa.array(hashes, pa.uint64()),
        }
        keep = self.keep if self.keep is not None else [
            c for c in batch.column_names if c not in out_cols and c != self.url_col
        ]
        filtered = batch.filter(pa.array(mask)) if not mask.all() else batch
        t = pa.table(out_cols)
        for c in keep:
            if c in filtered.column_names:
                t = t.append_column(c, filtered[c])
        return t


class ExtractStage:
    """html → kind, text, links (list<string>), n_links (M5–M7 fused).

    One pass over the batch: kind sniff, text extraction, outlink
    parsing.  Rows with null html (not-found fetches) pass through with
    empty text/links and their status preserved.

    ``skip_unchanged`` (opt-in, needs the frontier's ``track`` /
    ``prev_hash`` sidecar columns): a re-fetched RECURRING url whose
    content fingerprint equals the last fetch's is NOT re-parsed — its
    log row gets status="unchanged", empty text, no links (the
    If-Modified-Since analogue for the simulated fetch).  Content
    fingerprints of tracked rows ride along in a ``content_hash``
    column for the offer stage to report back to the frontier.
    """

    def __init__(
        self,
        skip_unchanged: bool = False,
        honor_canonical: bool = False,
        track_content: bool | None = None,
        follow_refresh: bool = False,
        refresh_max_delay: int = 0,
        content_dedup: bool = False,
        content_actors: list | None = None,
        honor_nofollow: bool = False,
        soft404_detect: bool = False,
    ) -> None:
        self.skip_unchanged = skip_unchanged
        self.honor_canonical = honor_canonical
        # REP HTML bindings (opt-in): <meta name=robots> noindex blanks
        # the page's logged text (status="noindex"; links still followed
        # — the standard crawler reading), nofollow/none drops ALL its
        # outlinks, and per-link rel=nofollow drops just those targets
        # from the links column (so n_links = links FOLLOWED under the
        # flag).  Separate scan; the frozen extractor is untouched.
        self.honor_nofollow = honor_nofollow
        # soft-404 screening (opt-in): an HTTP-200 page whose extracted
        # text matches the FROZEN not-found signature (functions.extract
        # detect_soft404, Bar-Yossef et al. 2004) is treated like a real
        # 404 — status="soft404", empty text, outlinks suppressed (404
        # boilerplate links are navigation noise)
        self.soft404_detect = soft404_detect
        # cross-URL content-digest dedup (Heritrix "content-seen" test):
        # a fetched body whose fingerprint was sealed by a STRICTLY
        # EARLIER round (on a different URL — or the same one, absent
        # skip_unchanged) is logged status="dup_content" with empty
        # text/links and is NOT parsed.  Within-round copies all parse
        # (visibility is round-granular — deterministic under any batch
        # schedule).  The seen set shards across the frontier actors by
        # hash % n; the stage checks+stages each batch with one RPC per
        # touched shard.
        self.content_dedup = content_dedup and content_actors is not None
        self.content_actors = content_actors
        # meta-refresh redirects (opt-in): a page declaring an immediate
        # <meta http-equiv=refresh> is logged status="redirect" with empty
        # text and NO outlinks (its content is transitional by declaration);
        # the target rides in a "redirect" column for the offer stage
        self.follow_refresh = follow_refresh
        self.refresh_max_delay = refresh_max_delay
        # content-fingerprint tracking without parse suppression (the
        # adaptive revisit policy needs the hashes but still re-parses);
        # defaults to skip_unchanged for backward compatibility
        self.track_content = skip_unchanged if track_content is None else track_content

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        htmls = batch["html"].to_pylist()
        canon: list[str | None] = []
        n = batch.num_rows
        cond = (
            self.track_content
            and "track" in batch.column_names
            and "prev_hash" in batch.column_names
        )
        if cond:
            track = batch["track"].to_numpy(zero_copy_only=False)
            prev = batch["prev_hash"].to_numpy(zero_copy_only=False)
            chash = np.zeros(n, dtype=np.uint64)
            unchanged = np.zeros(n, dtype=bool)
        kinds: list[str] = []
        texts: list[str | None] = []
        links: list[list[str]] = []
        redirects: list[str | None] = []
        redirected = np.zeros(n, dtype=bool)
        dup = np.zeros(n, dtype=bool)
        duped = np.zeros(n, dtype=bool)
        noindexed = np.zeros(n, dtype=bool)
        soft404ed = np.zeros(n, dtype=bool)
        body_hash = None
        if self.content_dedup and n:
            import ray

            # one fingerprint pass over the batch's fetched bodies, one
            # check+stage RPC per touched shard (hash % n_shards routing)
            body_hash = np.zeros(n, dtype=np.uint64)
            idxs = [i for i, b in enumerate(htmls) if b is not None]
            if idxs:
                for i in idxs:
                    body_hash[i] = fingerprint64(htmls[i])
                ns = len(self.content_actors)
                shards = (body_hash[idxs] % np.uint64(ns)).astype(np.int64)
                refs, groups = [], []
                for s in np.unique(shards):
                    g = [i for i, sh in zip(idxs, shards) if sh == s]
                    refs.append(
                        self.content_actors[int(s)].check_stage_content.remote(
                            body_hash[g]
                        )
                    )
                    groups.append(g)
                for g, m in zip(groups, ray.get(refs)):
                    dup[g] = m
        for i, (u, b) in enumerate(zip(urls, htmls)):
            if b is None:
                kinds.append("missing")
                texts.append(None)
                links.append([])
                canon.append(None)
                redirects.append(None)
                continue
            if cond and track[i]:
                ch = int(body_hash[i]) if body_hash is not None else fingerprint64(b)
                chash[i] = ch
                if self.skip_unchanged and prev[i] != 0 and ch == prev[i]:
                    # unchanged since the last fetch: skip the parse
                    kinds.append("unchanged")
                    texts.append("")
                    links.append([])
                    canon.append(None)
                    redirects.append(None)
                    unchanged[i] = True
                    continue
            if dup[i]:
                # content-digest dup (sealed in an earlier round): the
                # body was already extracted once — skip the parse, emit
                # no outlinks (the original copy's links won)
                kinds.append("dup_content")
                texts.append("")
                links.append([])
                canon.append(None)
                redirects.append(None)
                duped[i] = True
                continue
            k = detect_kind(u, b)
            if self.follow_refresh:
                tgt = extract_meta_refresh(u, b, k, self.refresh_max_delay)
                redirects.append(tgt)
                if tgt is not None:
                    # transitional page: follow the declared target, don't
                    # index the interstitial's content or outlinks
                    kinds.append(k)
                    texts.append("")
                    links.append([])
                    canon.append(None)
                    redirected[i] = True
                    continue
            kinds.append(k)
            text, lks = extract_page(u, b, k)  # ONE parse for text + links
            if self.honor_nofollow and k == "html":
                ni, nf_all, nf_set = extract_robots_directives(u, b, k)
                if nf_all:
                    lks = []
                elif nf_set:
                    lks = [x for x in lks if x not in nf_set]
                if ni:
                    text = ""
                    noindexed[i] = True
            if self.soft404_detect and k == "html" and detect_soft404(text):
                text = ""
                lks = []
                soft404ed[i] = True
            texts.append(text)
            links.append(lks)
            if self.honor_canonical:
                canon.append(
                    None if soft404ed[i] else extract_canonical(u, b, k)
                )
        out = batch.drop_columns(["html"])
        out = out.append_column("kind", pa.array(kinds, pa.string()))
        out = out.append_column("text", pa.array(texts, pa.string()))
        out = out.append_column("links", pa.array(links, pa.list_(pa.string())))
        out = out.append_column(
            "n_links", pa.array([len(x) for x in links], pa.int32())
        )
        if self.honor_canonical:
            out = out.append_column("canonical", pa.array(canon, pa.string()))
        if self.follow_refresh:
            out = out.append_column("redirect", pa.array(redirects, pa.string()))
            if redirected.any() and "status" in out.column_names:
                st = np.asarray(out["status"].to_pylist(), dtype=object)
                st[redirected] = "redirect"
                idx = out.column_names.index("status")
                out = out.set_column(idx, "status", pa.array(st, pa.string()))
        if duped.any() and "status" in out.column_names:
            st = np.asarray(out["status"].to_pylist(), dtype=object)
            st[duped] = "dup_content"
            idx = out.column_names.index("status")
            out = out.set_column(idx, "status", pa.array(st, pa.string()))
        if noindexed.any() and "status" in out.column_names:
            st = np.asarray(out["status"].to_pylist(), dtype=object)
            st[noindexed] = "noindex"
            idx = out.column_names.index("status")
            out = out.set_column(idx, "status", pa.array(st, pa.string()))
        if soft404ed.any() and "status" in out.column_names:
            st = np.asarray(out["status"].to_pylist(), dtype=object)
            st[soft404ed] = "soft404"
            idx = out.column_names.index("status")
            out = out.set_column(idx, "status", pa.array(st, pa.string()))
        if cond:
            if unchanged.any() and "status" in out.column_names:
                st = np.asarray(out["status"].to_pylist(), dtype=object)
                st[unchanged] = "unchanged"
                idx = out.column_names.index("status")
                out = out.set_column(idx, "status", pa.array(st, pa.string()))
            out = out.append_column("content_hash", pa.array(chash, pa.uint64()))
        return out


def explode_links(batch: pa.Table, round_idx: int, priority_fn=None) -> pa.Table:
    """links list<string> → one row per outlink with discovery metadata."""
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
    prio = priority_fn(round_idx) if priority_fn else 1.0 / (2 + round_idx)
    n = len(flat)
    return pa.table(
        {
            "url": flat,
            "priority": pa.array(np.full(n, prio, dtype=np.float64)),
            "round": pa.array(np.full(n, round_idx, dtype=np.int32)),
        }
    )
