"""Sources / sinks (SURVEY.md §2.1 S1–S3, S6) and the bucketed pages layout.

The fetch join (§2.4 J1) never shuffles the pages side: ``ingest_pages``
lays the corpus out ONCE as hive-partitioned parquet keyed by
``bucket = url_hash % num_buckets``; each round, per-bucket fetch tasks
read only their bucket's files (partition pruning) and look up the ready
URLs.  At 100 TB the same layout holds — the ready set moves, the pages
don't.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import ray.data as rd

from ..functions.hashing import fingerprint64_array
from ..schemas import PAGES


def read_pages(path: str, columns: list[str] | None = None) -> rd.Dataset:
    """S1: load the Common-Crawl-style pages table (prune columns at the read)."""
    return rd.read_parquet(path, columns=columns)


def _pages_format(path: str) -> tuple[str, bool]:
    """Detect the pages source format from the file (or first file in a
    directory): (parquet | jsonl | csv, gzipped?).  Web-scale text dumps
    ship gzipped as a rule, so ``.jsonl.gz`` / ``.csv.gz`` are
    first-class."""
    p = path
    if os.path.isdir(path):
        for root, _dirs, files in sorted(os.walk(path)):
            data = sorted(f for f in files if not f.startswith("_"))
            if data:
                p = os.path.join(root, data[0])
                break
    name = p.lower()
    gz = name.endswith(".gz")
    if gz:
        name = name[:-3]
    ext = name.rsplit(".", 1)[-1]
    if ext in ("jsonl", "json"):
        return "jsonl", gz
    if ext == "csv":
        return "csv", gz
    if ext == "warc":
        return "warc", gz
    return "parquet", False


def _coerce_pages(batch: pa.Table) -> pa.Table:
    """Coerce a text-format pages batch (jsonl/csv) to the PAGES schema:
    ``html_b64`` (base64 string — binary survives text containers) or a
    utf-8 ``html`` string → binary; ``warc_ts`` epoch-µs int or ISO
    string → timestamp[us].  Not a hot path — runs once per source row
    at ingest."""
    import base64

    cols = {}
    cols["url"] = batch["url"].cast(pa.string())
    ts = batch["warc_ts"]
    if pa.types.is_timestamp(ts.type):
        cols["warc_ts"] = ts.cast(pa.timestamp("us"))
    elif pa.types.is_integer(ts.type):
        cols["warc_ts"] = ts.cast(pa.int64()).cast(pa.timestamp("us"))
    else:
        # Arrow's string→timestamp cast parses ISO 8601 incl. fractional
        # seconds (strptime has no %f)
        cols["warc_ts"] = ts.cast(pa.string()).cast(pa.timestamp("us"))
    if "html_b64" in batch.column_names:
        cols["html"] = pa.array(
            [base64.b64decode(v) if v is not None else None
             for v in batch["html_b64"].to_pylist()],
            pa.binary(),
        )
    else:
        h = batch["html"]
        cols["html"] = (
            h.cast(pa.binary())
            if not pa.types.is_string(h.type)
            else pa.array(
                [v.encode("utf-8") if v is not None else None for v in h.to_pylist()],
                pa.binary(),
            )
        )
    for name in ("text", "lang"):
        cols[name] = batch[name].cast(pa.string()) if name in batch.column_names else pa.array([None] * batch.num_rows, pa.string())
    return pa.table(cols)


def read_pages_any(path: str, columns: list[str] | None = None) -> rd.Dataset:
    """S1 over ANY supported container: parquet (native, column-pruned at
    the read), JSONL, or CSV (both coerced to the PAGES schema —
    ``html_b64`` carries the binary payload through text formats).  The
    crawl's ingest accepts all three; the bucketed layout it produces is
    always parquet."""
    fmt, gz = _pages_format(path)
    if fmt == "parquet":
        return rd.read_parquet(path, columns=columns)
    if fmt == "warc":
        return read_pages_warc(path, columns=columns)
    kw = {"arrow_open_stream_args": {"compression": "gzip"}} if gz else {}
    ds = rd.read_json(path, **kw) if fmt == "jsonl" else rd.read_csv(path, **kw)
    ds = ds.map_batches(_coerce_pages, batch_format="pyarrow")
    if columns:
        ds = ds.select_columns(columns)
    return ds


def write_pages_jsonl(table: pa.Table, path: str) -> None:
    """Test/fixture helper: PAGES-schema table → JSONL with base64 html."""
    import base64
    import json as _json

    with open(path, "w") as f:
        for row in table.to_pylist():
            row["html_b64"] = base64.b64encode(row.pop("html")).decode("ascii")
            ts = row["warc_ts"]
            row["warc_ts"] = ts.strftime("%Y-%m-%dT%H:%M:%S.%f") if ts is not None else None
            f.write(_json.dumps(row, sort_keys=True) + "\n")


def write_pages_warc(table: pa.Table, path: str, member_gzip: bool = True) -> None:
    """Test/fixture helper: PAGES-schema table → WARC/1.0 response
    records (ISO 28500).  ``member_gzip=True`` writes one gzip member
    per record — the Common-Crawl convention (a .warc.gz is a
    CONCATENATION of per-record gzip streams, which stdlib gzip
    decompresses transparently as one stream)."""
    import gzip as _gzip

    def record(row: dict) -> bytes:
        body = row["html"] or b""
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            + b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n" + body
        )
        ts = row["warc_ts"]
        date = ts.strftime("%Y-%m-%dT%H:%M:%SZ") if ts is not None else "1970-01-01T00:00:00Z"
        hdr = (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Target-URI: {row['url']}\r\n"
            f"WARC-Date: {date}\r\n"
            "Content-Type: application/http; msgtype=response\r\n"
            f"Content-Length: {len(http)}\r\n\r\n"
        ).encode()
        return hdr + http + b"\r\n\r\n"

    with open(path, "wb") as f:
        for row in table.to_pylist():
            rec = record(row)
            f.write(_gzip.compress(rec) if member_gzip else rec)


def parse_warc_records(blob: bytes, want_types: tuple = ("response",)) -> pa.Table:
    """WARC/1.0 bytes (plain or gzipped, incl. concatenated per-record
    members) → PAGES-schema table.  Only ``response`` records map to
    rows by default (``want_types`` admits e.g. "conversion" for WET):
    url ← WARC-Target-URI, warc_ts ← WARC-Date, html ← the HTTP
    payload body (headers stripped); text/lang are null — the engine
    re-derives text with its own frozen extractor.  Sequential
    Content-Length walk (the only correct WARC framing); one task per
    WARC file — real dumps ship thousands of ~1 GB files, so files are
    the natural parallelism unit."""
    import gzip as _gzip

    if blob[:2] == b"\x1f\x8b":
        blob = _gzip.decompress(blob)  # multi-member safe
    urls, tss, htmls = [], [], []
    pos = 0
    n = len(blob)
    while pos < n:
        end = blob.find(b"\r\n\r\n", pos)
        if end == -1:
            break
        headers = blob[pos:end].decode("utf-8", "replace")
        lines = headers.split("\r\n")
        if not lines[0].startswith("WARC/"):
            break
        h = {}
        for ln in lines[1:]:
            k, _, v = ln.partition(":")
            h[k.strip().lower()] = v.strip()
        clen = int(h.get("content-length", "0"))
        payload = blob[end + 4 : end + 4 + clen]
        pos = end + 4 + clen
        while blob[pos : pos + 2] == b"\r\n":  # record separator(s)
            pos += 2
        if h.get("warc-type") not in want_types:
            continue
        if payload[:5] == b"HTTP/":
            j = payload.find(b"\r\n\r\n")
            payload = payload[j + 4 :] if j != -1 else b""
        urls.append(h.get("warc-target-uri", ""))
        date = h.get("warc-date")
        tss.append(
            pd.Timestamp(date).tz_localize(None).to_pydatetime() if date else None
        )
        htmls.append(payload)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array([None] * len(urls), pa.string()),
            "lang": pa.array([None] * len(urls), pa.string()),
        }
    )


def read_pages_warc(path: str, columns: list[str] | None = None) -> rd.Dataset:
    """S1 over WARC: one parse task per .warc/.warc.gz file."""

    def parse(batch: dict) -> pa.Table:
        tables = [parse_warc_records(bytes(b)) for b in batch["bytes"]]
        t = pa.concat_tables(tables) if tables else parse_warc_records(b"")
        return t.select(columns) if columns else t

    return rd.read_binary_files(path).map_batches(
        parse, batch_format="numpy", batch_size=1
    )


def read_seeds(path: str) -> rd.Dataset:
    """S2: load the frontier seed list."""
    return rd.read_parquet(path)


import pyarrow.parquet as _pq
import ray as _ray


@_ray.remote
class _RobotsCollector:
    """Accumulates (host, body) robots rows during the single ingest pass
    so robots preload never re-scans the pages table."""

    def __init__(self) -> None:
        self.tables: list[pa.Table] = []

    def add(self, t: pa.Table) -> int:
        self.tables.append(t)
        return t.num_rows

    def dump(self, path: str) -> int:
        schema = pa.schema([("host", pa.string()), ("body", pa.binary())])
        t = pa.concat_tables(self.tables) if self.tables else schema.empty_table()
        tmp = path + ".tmp"
        _pq.write_table(t, tmp)
        os.replace(tmp, path)
        return t.num_rows


def robots_sidecar_path(bucketed_dir: str) -> str:
    return os.path.join(bucketed_dir, "_robots.parquet")


def ingest_pages(pages_path: str, out_dir: str, num_buckets: int) -> str:
    """Bucketed fetch-substrate layout: url_hash-keyed hive partitions,
    plus a tiny ``_robots.parquet`` sidecar of (host, body) collected in
    the SAME pass (robots preload then costs one small-file read, not a
    full corpus scan).

    Drops the golden ``text`` column (verification-only) so fetch reads
    move less data.  Idempotent: skips if the layout already exists.
    """
    marker = os.path.join(out_dir, "_INGESTED")
    if os.path.exists(marker):
        with open(marker) as f:
            existing = f.read().strip()
        if existing and existing != str(num_buckets):
            raise ValueError(
                f"bucketed layout at {out_dir} was ingested with num_buckets="
                f"{existing}, requested {num_buckets}: bucket=url_hash%nb lookups "
                f"would silently miss — re-ingest to a fresh dir or match the count"
            )
        return out_dir

    nb = num_buckets
    collector = _RobotsCollector.remote()

    def add_bucket(batch: pa.Table) -> pa.Table:
        h = fingerprint64_array(batch["url"])
        b = (h.to_numpy(zero_copy_only=False) % nb).astype("int32")
        robots_mask = pc.ends_with(batch["url"], pattern="/robots.txt")
        if pc.any(robots_mask).as_py():
            sub = batch.filter(robots_mask)
            hosts = [
                u.split("//", 1)[1].split("/", 1)[0] for u in sub["url"].to_pylist()
            ]
            _ray.get(
                collector.add.remote(
                    pa.table({"host": pa.array(hosts, pa.string()), "body": sub["html"]})
                )
            )
        return batch.append_column("url_hash", h).append_column("bucket", pa.array(b))

    (
        read_pages_any(pages_path, columns=["url", "warc_ts", "html", "lang"])
        .map_batches(add_bucket, batch_format="pyarrow")
        .write_parquet(out_dir, partition_cols=["bucket"])
    )
    _ray.get(collector.dump.remote(robots_sidecar_path(out_dir)))
    with open(marker, "w") as f:
        f.write(str(num_buckets))
    return out_dir


def read_bucket(bucketed_dir: str, bucket: int, urls: pa.Array) -> pa.Table:
    """Fetch-side lookup: read ONE bucket partition filtered to the ready URLs."""
    ds = pads.dataset(bucketed_dir, partitioning="hive")
    flt = (pads.field("bucket") == bucket) & pads.field("url").isin(urls)
    t = ds.to_table(filter=flt, columns=["url", "warc_ts", "html", "lang"])
    return t


def write_crawl_log(ds: rd.Dataset, out_dir: str, round_idx: int) -> None:
    """S3: per-round partition directory — resumable output layout."""
    ds.write_parquet(os.path.join(out_dir, f"round={round_idx}"))


def pages_schema() -> pa.Schema:
    return PAGES


def export_wet(crawl_log_path: str, out_dir: str) -> int:
    """S3 companion: crawl log → WET (WARC conversion records — the
    Common-Crawl extracted-text distribution format).  One
    ``wet-<min fetch_seq>.warc.wet.gz`` per block (deterministic names,
    resumable like every sink here); only fetched rows export.  Returns
    the record count.  Runs as a streaming Dataset consumer — no
    driver-side materialization."""
    import gzip as _gzip

    os.makedirs(out_dir, exist_ok=True)
    ds = rd.read_parquet(crawl_log_path, columns=["url", "warc_ts", "text", "status", "fetch_seq"])

    def write_block(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch["status"], "fetched"))
        if t.num_rows == 0:
            return pa.table({"n": pa.array([0], pa.int64())})
        seq = int(pc.min(t["fetch_seq"]).as_py())
        parts = []
        for row in t.select(["url", "warc_ts", "text"]).to_pylist():
            body = (row["text"] or "").encode("utf-8")
            ts = row["warc_ts"]
            date = ts.strftime("%Y-%m-%dT%H:%M:%SZ") if ts is not None else "1970-01-01T00:00:00Z"
            hdr = (
                "WARC/1.0\r\n"
                "WARC-Type: conversion\r\n"
                f"WARC-Target-URI: {row['url']}\r\n"
                f"WARC-Date: {date}\r\n"
                "Content-Type: text/plain\r\n"
                f"Content-Length: {len(body)}\r\n\r\n"
            ).encode()
            parts.append(_gzip.compress(hdr + body + b"\r\n\r\n"))
        path = os.path.join(out_dir, f"wet-{seq:012d}.warc.wet.gz")
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(b"".join(parts))
        os.replace(tmp, path)
        return pa.table({"n": pa.array([t.num_rows], pa.int64())})

    return int(ds.map_batches(write_block, batch_format="pyarrow").sum("n") or 0)


def export_wat(crawl_log_path: str, out_dir: str) -> int:
    """Crawl log → WAT (WARC metadata records — the Common-Crawl
    metadata distribution next to WET): per fetched row one
    ``WARC-Type: metadata`` record whose body is the JSON envelope of
    everything the log knows about the fetch (host, round, fetch_seq,
    language, link count, text length).  Deterministic resumable file
    names (``wat-<min fetch_seq>.warc.wat.gz`` per block), streaming
    Dataset consumer, no driver-side materialization — same layout
    rules as :func:`export_wet`."""
    import gzip as _gzip
    import json as _json

    os.makedirs(out_dir, exist_ok=True)
    ds = rd.read_parquet(
        crawl_log_path,
        columns=["url", "host", "round", "fetch_seq", "warc_ts", "text",
                 "lang", "n_links", "status"],
    )

    def write_block(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch["status"], "fetched"))
        if t.num_rows == 0:
            return pa.table({"n": pa.array([0], pa.int64())})
        seq = int(pc.min(t["fetch_seq"]).as_py())
        # metadata needs text LENGTH only — never ship the bodies
        # (the log's bulk) through Python row dicts
        t = t.append_column(
            "text_length", pc.fill_null(pc.utf8_length(t["text"]), 0).cast(pa.int64())
        ).drop_columns(["text"])
        parts = []
        for row in t.to_pylist():
            ts = row["warc_ts"]
            date = ts.strftime("%Y-%m-%dT%H:%M:%SZ") if ts is not None else "1970-01-01T00:00:00Z"
            envelope = {
                "Envelope": {
                    "WARC-Header-Metadata": {
                        "WARC-Target-URI": row["url"],
                        "WARC-Date": date,
                    },
                    "Payload-Metadata": {
                        "host": row["host"],
                        "round": row["round"],
                        "fetch_seq": row["fetch_seq"],
                        "lang": row["lang"],
                        "n_links": row["n_links"],
                        "text_length": row["text_length"],
                    },
                }
            }
            body = _json.dumps(envelope, sort_keys=True).encode("utf-8")
            hdr = (
                "WARC/1.0\r\n"
                "WARC-Type: metadata\r\n"
                f"WARC-Target-URI: {row['url']}\r\n"
                f"WARC-Date: {date}\r\n"
                "Content-Type: application/json\r\n"
                f"Content-Length: {len(body)}\r\n\r\n"
            ).encode()
            parts.append(_gzip.compress(hdr + body + b"\r\n\r\n"))
        path = os.path.join(out_dir, f"wat-{seq:012d}.warc.wat.gz")
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(b"".join(parts))
        os.replace(tmp, path)
        return pa.table({"n": pa.array([t.num_rows], pa.int64())})

    return int(ds.map_batches(write_block, batch_format="pyarrow").sum("n") or 0)


def export_warc_revisits(
    crawl_log_path: str, pages_path: str, out_dir: str
) -> int:
    """Crawl log → WARC ``revisit`` records (WARC/1.1 §6.7.2,
    identical-payload-digest profile) — the record type Common Crawl
    emits when the content-seen test (``--content-seen``) suppresses a
    duplicate body: each ``status="dup_content"`` row becomes a
    body-less record carrying the payload digest and
    ``WARC-Refers-To-Target-URI`` of the ORIGINAL copy (the
    min-fetch_seq fetched row with the same digest).  Completes the
    response/conversion/metadata/revisit record family.

    Scale shape: digests are recomputed in ONE streaming pass over the
    pages table filtered by a broadcast url→fetch_seq map of the log's
    rows (log-sized driver map — the same fits-a-heap assumption the
    rank-table broadcasts document, with a url-bucket co-shuffle as the
    fallback past it); only (digest, url, seq) triples reach the
    driver, bodies never do.  Dup rows are few by construction, so the
    record build is driver-trivial.  Deterministic single
    ``revisit-<min seq>.warc.gz`` (atomic tmp+rename, resumable)."""
    import gzip as _gzip

    import ray

    from ..functions.hashing import fingerprint64

    os.makedirs(out_dir, exist_ok=True)
    log = rd.read_parquet(
        crawl_log_path, columns=["url", "warc_ts", "status", "fetch_seq"]
    ).to_pandas()
    dups = log[log["status"] == "dup_content"]
    if dups.empty:
        return 0
    fetched = log[log["status"].isin(["fetched", "dup_content"])]
    seq_map = dict(zip(fetched["url"], fetched["fetch_seq"].astype("int64")))
    map_ref = ray.put(seq_map)

    def digest(batch: pa.Table) -> pa.Table:
        m = ray.get(map_ref)
        urls, seqs, digs = [], [], []
        for u, b in zip(batch["url"].to_pylist(), batch["html"].to_pylist()):
            s = m.get(u)
            if s is None or b is None:
                continue
            urls.append(u)
            seqs.append(int(s))
            # reinterpret to int64 (the repo-wide hash-key convention)
            digs.append(int(np.int64(np.uint64(fingerprint64(b)))))
        return pa.table({"url": pa.array(urls, pa.string()),
                         "fetch_seq": pa.array(seqs, pa.int64()),
                         "digest": pa.array(digs, pa.int64())})

    d = (
        rd.read_parquet(pages_path, columns=["url", "html"])
        .map_batches(digest, batch_format="pyarrow")
        .to_pandas()
    )
    dup_urls = set(dups["url"])
    originals = (
        d[~d["url"].isin(dup_urls)]
        .sort_values(["digest", "fetch_seq"])
        .drop_duplicates("digest")
        .set_index("digest")
    )
    dd = d[d["url"].isin(dup_urls)].merge(
        dups[["url", "warc_ts", "fetch_seq"]], on="url",
        suffixes=("_page", ""),
    ).sort_values("fetch_seq")
    parts = []
    for _, row in dd.iterrows():
        dig = int(row["digest"])
        ref_url = (
            str(originals.loc[dig, "url"]) if dig in originals.index else ""
        )
        ts = row["warc_ts"]
        date = (ts.strftime("%Y-%m-%dT%H:%M:%SZ")
                if ts is not None else "1970-01-01T00:00:00Z")
        hexd = f"{int(np.uint64(np.int64(dig))):016x}"
        hdr = (
            "WARC/1.1\r\n"
            "WARC-Type: revisit\r\n"
            f"WARC-Target-URI: {row['url']}\r\n"
            f"WARC-Date: {date}\r\n"
            "WARC-Profile: http://netpreserve.org/warc/1.1/revisit/"
            "identical-payload-digest\r\n"
            f"WARC-Payload-Digest: blake2b64:{hexd}\r\n"
            f"WARC-Refers-To-Target-URI: {ref_url}\r\n"
            "Content-Type: application/http; msgtype=response\r\n"
            "Content-Length: 0\r\n\r\n"
        ).encode()
        parts.append(_gzip.compress(hdr + b"\r\n\r\n"))
    seq0 = int(dd["fetch_seq"].min())
    path = os.path.join(out_dir, f"revisit-{seq0:012d}.warc.gz")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(b"".join(parts))
    os.replace(tmp, path)
    return len(parts)


def export_integrity_manifest(out_dir: str, glob_pat: str = "**/*.parquet") -> dict:
    """OUTPUT INTEGRITY MANIFEST — per-file sha256 + byte size + row
    count over a sink directory, plus a Merkle-style root (sha256 of
    the path-ordered file digests).  What a 100 TB pipeline publishes
    next to its output so a consumer (or a resumed run) can verify the
    dataset without re-reading it logically — and locate exactly which
    shard was corrupted in transit.

    Scale shape: hashing fans out as one task per file
    (``read_binary_files`` — files are the parallelism unit, same as
    WARC ingest); row counts come from parquet FOOTERS inside the same
    task (no column data decoded).  The manifest is written atomically
    (tmp+rename) as ``_INTEGRITY.json``; only (path, digest, size,
    rows) tuples ever reach the driver."""
    import glob as _glob
    import hashlib
    import io as _io
    import json as _json

    files = sorted(
        f for f in _glob.glob(os.path.join(out_dir, glob_pat), recursive=True)
        if os.path.isfile(f)
    )
    if not files:
        manifest = {"files": [], "merkle_root": hashlib.sha256(b"").hexdigest(),
                    "n_files": 0, "total_rows": 0, "total_bytes": 0}
    else:
        def digest(batch) -> pa.Table:
            rows_out = {"path": [], "sha256": [], "bytes": [], "rows": []}
            for p, b in zip(batch["path"], batch["bytes"]):
                blob = bytes(b)
                rows_out["path"].append(str(p))
                rows_out["sha256"].append(hashlib.sha256(blob).hexdigest())
                rows_out["bytes"].append(len(blob))
                try:
                    rows_out["rows"].append(
                        int(_pq.ParquetFile(_io.BytesIO(blob)).metadata.num_rows)
                    )
                except Exception:
                    rows_out["rows"].append(-1)
            return pa.table({
                "path": pa.array(rows_out["path"], pa.string()),
                "sha256": pa.array(rows_out["sha256"], pa.string()),
                "bytes": pa.array(rows_out["bytes"], pa.int64()),
                "rows": pa.array(rows_out["rows"], pa.int64()),
            })

        df = (
            rd.read_binary_files(files, include_paths=True)
            .map_batches(digest, batch_format="numpy", batch_size=1)
            .to_pandas()
        )
        df["rel"] = [os.path.relpath(p, out_dir) for p in df["path"]]
        df = df.sort_values("rel").reset_index(drop=True)
        root = hashlib.sha256(
            "".join(df["sha256"]).encode("ascii")
        ).hexdigest()
        manifest = {
            "files": [
                {"path": r["rel"], "sha256": r["sha256"],
                 "bytes": int(r["bytes"]), "rows": int(r["rows"])}
                for _, r in df.iterrows()
            ],
            "merkle_root": root,
            "n_files": len(df),
            "total_rows": int(df.loc[df["rows"] >= 0, "rows"].sum()),
            "total_bytes": int(df["bytes"].sum()),
        }
    path = os.path.join(out_dir, "_INTEGRITY.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        _json.dump(manifest, f, sort_keys=True, indent=1)
    os.replace(tmp, path)
    return manifest


def verify_integrity(out_dir: str) -> dict:
    """Recompute the integrity manifest and diff it against the
    published ``_INTEGRITY.json``: returns ``{"ok": bool, "missing":
    [...], "changed": [...], "extra": [...]}`` naming exactly the
    shards that diverged."""
    import json as _json

    with open(os.path.join(out_dir, "_INTEGRITY.json")) as f:
        want = _json.load(f)
    # recompute WITHOUT republishing: hash to a scratch dict
    import glob as _glob
    import hashlib

    files = sorted(
        f for f in _glob.glob(os.path.join(out_dir, "**/*.parquet"),
                              recursive=True)
        if os.path.isfile(f)
    )
    cur = {}
    for p in files:
        with open(p, "rb") as fh:
            cur[os.path.relpath(p, out_dir)] = hashlib.sha256(
                fh.read()
            ).hexdigest()
    exp = {e["path"]: e["sha256"] for e in want["files"]}
    missing = sorted(set(exp) - set(cur))
    extra = sorted(set(cur) - set(exp))
    changed = sorted(k for k in set(exp) & set(cur) if exp[k] != cur[k])
    return {"ok": not (missing or extra or changed),
            "missing": missing, "changed": changed, "extra": extra}


def compact_parquet_dir(
    src_dir: str, out_dir: str, target_bytes: int = 64 * 1024 * 1024
) -> dict:
    """SMALL-FILES COMPACTION — the sink-maintenance pass every
    long-running resumable pipeline needs: a per-block/per-round writer
    (this engine's crawl log, trainprep shards) accumulates many small
    parquet files whose per-file open/footer cost eventually dominates
    reads.  Plans bins with FIRST-FIT-DECREASING over file sizes
    (footer metadata only — no data read to plan; a file larger than
    ``target_bytes`` keeps its own bin), then rewrites each bin as ONE
    file in a parallel Ray task (atomic tmp+rename, deterministic
    ``compact-<bin>.parquet`` names ⇒ a killed compaction re-runs
    idempotently).  Row order within a bin follows the plan's file
    order (path-sorted), so re-compaction is reproducible.

    This is deliberately raw-``ray.remote`` orchestration: "merge THESE
    files into exactly one output" is a file-level contract the Dataset
    write path can't express.  Returns the plan summary."""
    import glob as _glob

    import ray as _ray2

    files = sorted(
        f for f in _glob.glob(os.path.join(src_dir, "**/*.parquet"),
                              recursive=True)
        if os.path.isfile(f)
    )
    sizes = {f: os.path.getsize(f) for f in files}
    # first-fit-decreasing (size desc, path asc tie — deterministic)
    order = sorted(files, key=lambda f: (-sizes[f], f))
    bins: list[list[str]] = []
    room: list[int] = []
    for f in order:
        placed = False
        for i in range(len(bins)):
            if sizes[f] <= room[i]:
                bins[i].append(f)
                room[i] -= sizes[f]
                placed = True
                break
        if not placed:
            bins.append([f])
            room.append(max(0, target_bytes - sizes[f]))
    # stable content order inside each bin: path order
    bins = [sorted(b) for b in bins]

    os.makedirs(out_dir, exist_ok=True)

    @_ray2.remote
    def rewrite(bin_idx: int, paths: list) -> int:
        import pyarrow as _pa
        import pyarrow.parquet as _pq2

        t = _pa.concat_tables([_pq2.read_table(p) for p in paths])
        out = os.path.join(out_dir, f"compact-{bin_idx:05d}.parquet")
        tmp = out + f".tmp-{bin_idx}"
        _pq2.write_table(t, tmp)
        os.replace(tmp, out)
        return t.num_rows

    rows = _ray2.get([rewrite.remote(i, b) for i, b in enumerate(bins)])
    return {
        "n_input_files": len(files),
        "n_output_files": len(bins),
        "total_rows": int(sum(rows)),
        "total_bytes_in": int(sum(sizes.values())),
        "bins": [[os.path.relpath(p, src_dir) for p in b] for b in bins],
    }


# --- CDX index over WARC files ------------------------------------------


def iter_gzip_members(blob: bytes):
    """Walk a concatenated-member gzip blob (the Common-Crawl WARC
    convention: one gzip member per record) yielding (offset,
    compressed_length, decompressed_bytes) per member — the byte
    geometry a CDX index records so readers can range-request single
    records."""
    import zlib

    # ADVICE r4 (round-5 revision): feeding the whole tail per member —
    # even via a zero-copy memoryview — still cost O(members ×
    # file_size), because zlib materializes everything after the member
    # boundary as the ``unused_data`` bytes copy.  Feeding bounded
    # chunks keeps per-member work at O(member size + chunk): the
    # decompressor sees at most one chunk past its member's end.
    CHUNK = 1 << 20
    mv = memoryview(blob)
    pos, n = 0, len(blob)
    while pos < n:
        d = zlib.decompressobj(wbits=31)
        parts = []
        fed = pos
        while not d.eof and fed < n:
            chunk = mv[fed:fed + CHUNK]
            parts.append(d.decompress(chunk))
            fed += len(chunk)
        if not d.eof:  # truncated trailing member — stop cleanly
            break
        comp_len = (fed - pos) - len(d.unused_data)
        yield pos, comp_len, b"".join(parts)
        pos += comp_len


def _warc_record_fields(rec: bytes) -> dict | None:
    """Minimal WARC/1.0 record header+payload parse for indexing:
    returns {url, date, type, payload} or None if malformed."""
    end = rec.find(b"\r\n\r\n")
    if end == -1:
        return None
    lines = rec[:end].decode("utf-8", "replace").split("\r\n")
    if not lines or not lines[0].startswith("WARC/"):
        return None
    h = {}
    for ln in lines[1:]:
        k, _, v = ln.partition(":")
        h[k.strip().lower()] = v.strip()
    clen = int(h.get("content-length", "0"))
    payload = rec[end + 4:end + 4 + clen]
    if payload[:5] == b"HTTP/":
        j = payload.find(b"\r\n\r\n")
        payload = payload[j + 4:] if j != -1 else b""
    return {
        "url": h.get("warc-target-uri", ""),
        "date": h.get("warc-date", ""),
        "type": h.get("warc-type", ""),
        "payload": payload,
    }


def build_cdx_index(path: str) -> "rd.Dataset":
    """CDX(J)-style capture index over WARC file(s) — the web-archive
    random-access artifact (IIPC CDX convention; Common Crawl ships one
    per crawl): one row per ``response`` record with the canonical
    SURT sort key, 14-digit timestamp, and the (filename, offset,
    length) byte geometry that lets a reader fetch exactly one record
    with a range request + single-member gunzip.  Deviations from the
    legacy format, pinned deliberately: digest is the engine's blake2b-8
    hex (the pinned fingerprint family) instead of SHA1-B32, and the
    output is a Dataset (write_parquet/CSV at will) rather than a text
    CDX file.

    Scale shape: one task per WARC file (the natural unit — real dumps
    ship thousands of ~1 GB files), member-walk inside the task, ONE
    global sort on (surt, ts14) — exactly the exchange the real CDX
    build pays.  Indexing never decodes HTML or buffers more than one
    record."""
    from ..functions.hashing import fingerprint64
    from ..functions.urlnorm import canonicalize_batch

    def index_file(batch: pa.Table) -> pa.Table:
        rows = {"surt": [], "ts14": [], "url": [], "digest": [],
                "offset": [], "length": [], "filename": []}
        for p in batch["path"].to_pylist():
            # raw bytes read in-task: Ray's binary reader force-gunzips
            # by file extension (Codec.detect), which would destroy the
            # compressed byte geometry this index exists to record; on
            # object storage this open() becomes the fs's
            # open_input_stream with compression disabled
            with open(p, "rb") as fh:
                blob = fh.read()
            fname = str(p).rsplit("/", 1)[-1]
            if blob[:2] == b"\x1f\x8b":
                members = iter_gzip_members(blob)
            else:
                # plain WARC: framing walk tracking offsets
                def plain_members(b=blob):
                    pos, n = 0, len(b)
                    while pos < n:
                        end = b.find(b"\r\n\r\n", pos)
                        if end == -1:
                            return
                        lines = b[pos:end].decode("utf-8", "replace").split("\r\n")
                        h = {}
                        for ln in lines[1:]:
                            k, _, v = ln.partition(":")
                            h[k.strip().lower()] = v.strip()
                        clen = int(h.get("content-length", "0"))
                        rec_end = end + 4 + clen
                        while b[rec_end:rec_end + 2] == b"\r\n":
                            rec_end += 2
                        yield pos, rec_end - pos, b[pos:rec_end]
                        pos = rec_end
                members = plain_members()
            for off, clen, rec in members:
                f = _warc_record_fields(rec)
                if f is None or f["type"] != "response" or not f["url"]:
                    continue
                ts14 = "".join(c for c in f["date"] if c.isdigit())[:14]
                _, surts, _ = canonicalize_batch([f["url"]])
                rows["surt"].append(surts[0] or f["url"])
                rows["ts14"].append(ts14)
                rows["url"].append(f["url"])
                rows["digest"].append(format(fingerprint64(f["payload"]), "016x"))
                rows["offset"].append(off)
                rows["length"].append(clen)
                rows["filename"].append(fname)
        return pa.table({
            "surt": pa.array(rows["surt"], pa.string()),
            "ts14": pa.array(rows["ts14"], pa.string()),
            "url": pa.array(rows["url"], pa.string()),
            "digest": pa.array(rows["digest"], pa.string()),
            "offset": pa.array(rows["offset"], pa.int64()),
            "length": pa.array(rows["length"], pa.int64()),
            "filename": pa.array(rows["filename"], pa.string()),
        })

    import glob as _glob

    if os.path.isdir(path):
        files = sorted(
            _glob.glob(os.path.join(path, "**", "*.warc*"), recursive=True)
        )
    else:
        files = [path]
    return (
        rd.from_arrow(pa.table({"path": pa.array(files, pa.string())}))
        .map_batches(index_file, batch_format="pyarrow", batch_size=1)
        .sort(["surt", "ts14"])
    )
