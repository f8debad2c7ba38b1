"""Pinned Arrow schemas for every engine table (SURVEY.md §1.2).

Schemas are declared, never inferred — determinism and ``binary`` html
payloads demand it.  The ``PAGES`` shape is mandated verbatim by
BASELINE.json's input_hint: ``(url:string, warc_ts:timestamp, html:binary,
text:string, lang:string)``.
"""

from __future__ import annotations

import pyarrow as pa

# (a) fetch substrate — exact input_hint shape
PAGES = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

# (b) frontier rows (actor state ⇄ checkpoint parquet)
FRONTIER = pa.schema(
    [
        ("url_hash", pa.uint64()),
        ("url", pa.string()),
        ("surt", pa.string()),
        ("host", pa.string()),
        ("priority", pa.float64()),
        ("round", pa.int32()),
        ("status", pa.string()),  # pending | fetched | robots_blocked | not_found
    ]
)

# ready-to-fetch batch emitted by frontier actors each round
READY = pa.schema(
    [
        ("url_hash", pa.uint64()),
        ("url", pa.string()),
        ("host", pa.string()),
        ("priority", pa.float64()),
        ("round", pa.int32()),
        ("host_rank", pa.int64()),  # 0-based rank within (host, round) politeness order
        ("sub", pa.int32()),        # emitting frontier shard (salted hosts span several)
        ("track", pa.int8()),       # 1 = recurring url (content hash worth recording)
        ("prev_hash", pa.uint64()), # last-seen content fingerprint (0 = none yet)
    ]
)

# (c) crawl log — the engine's output table
CRAWL_LOG = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),
        ("round", pa.int32()),
        ("fetch_seq", pa.int64()),
        ("warc_ts", pa.timestamp("us")),
        ("text", pa.string()),
        ("lang", pa.string()),
        ("n_links", pa.int32()),
        # fetched | not_found | unchanged (skip_unchanged) |
        # redirect (follow_meta_refresh)
        ("status", pa.string()),
    ]
)
# opt-in log columns (present only when the flag is on, frozen in the
# resume manifest): honor_canonical adds ("canonical", pa.string());
# follow_meta_refresh adds ("redirect", pa.string())

SEEN_SET = pa.schema([("url_hash", pa.uint64()), ("url", pa.string())])

SEEDS = pa.schema([("url", pa.string()), ("priority", pa.float64())])

# (d) per-partition checkpoint lineage row
LINEAGE = pa.schema(
    [
        ("partition_id", pa.int32()),
        ("round", pa.int32()),
        ("offered", pa.int64()),
        ("admitted", pa.int64()),
        ("fetched", pa.int64()),
        ("robots_blocked", pa.int64()),
        ("not_found", pa.int64()),
        ("filter_bytes", pa.int64()),
    ]
)
