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

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import ray.data as rd

from ..functions.hashing import fingerprint64_array
from ..schemas import PAGES


def read_pages(path: str, columns: list[str] | None = None) -> rd.Dataset:
    """S1: load the Common-Crawl-style pages table (prune columns at the read)."""
    return rd.read_parquet(path, columns=columns)


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
        rd.read_parquet(pages_path, columns=["url", "warc_ts", "html", "lang"])
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
