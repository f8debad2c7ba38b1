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


def ingest_pages(pages_path: str, out_dir: str, num_buckets: int) -> str:
    """Bucketed fetch-substrate layout: url_hash-keyed hive partitions.

    Drops the golden ``text`` column (verification-only) so fetch reads
    move less data.  Idempotent: skips if the layout already exists.
    """
    marker = os.path.join(out_dir, "_INGESTED")
    if os.path.exists(marker):
        return out_dir

    nb = num_buckets

    def add_bucket(batch: pa.Table) -> pa.Table:
        h = fingerprint64_array(batch["url"])
        b = (h.to_numpy(zero_copy_only=False) % nb).astype("int32")
        return batch.append_column("url_hash", h).append_column("bucket", pa.array(b))

    (
        rd.read_parquet(pages_path, columns=["url", "warc_ts", "html", "lang"])
        .map_batches(add_bucket, batch_format="pyarrow")
        .write_parquet(out_dir, partition_cols=["bucket"])
    )
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
