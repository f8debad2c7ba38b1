"""Query-runner CLI — execute any registered pipeline by name against a
table directory, so every operator in the contract registry is reachable
as a user-facing command, not only via the driver harness:

    python -m opps_feedcrawler_ray.pipelines.runner --list
    python -m opps_feedcrawler_ray.pipelines.runner source_stats \
        --sf-dir /root/testdata/sf0.001 --out /tmp/source_stats.parquet
    python -m opps_feedcrawler_ray.pipelines.runner doc_md5 \
        --sf-dir /root/testdata/sf0.001 --head 5

The registry of pipelines lives in the repo-root ``__ray_entry__.py``
(the driver contract); this CLI loads it by file path so the two
surfaces can never drift apart.  Ray is initialised here ONLY when the
CLI owns the process (guarded), never at import time.
"""

from __future__ import annotations

import argparse
import importlib.util
import pathlib
import sys
import time


def _load_registry():
    root = pathlib.Path(__file__).resolve().parents[2]
    entry = root / "__ray_entry__.py"
    if not entry.exists():
        raise FileNotFoundError(
            f"driver-contract registry not found at {entry}; run the CLI "
            "from a checkout that includes __ray_entry__.py"
        )
    spec = importlib.util.spec_from_file_location("__ray_entry__", entry)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.queries()


def _to_table(res):
    """Small driver-side results (pandas / pyarrow) to one Table.
    Dataset results never pass through here — they stream through
    ``_sink_dataset`` so the driver holds at most one batch."""
    import pandas as pd
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return pa.Table.from_pandas(res, preserve_index=False)
    if isinstance(res, pa.Table):
        return res
    raise TypeError(f"unsupported pipeline result type {type(res)!r}")


def _sink_dataset(res, out: str | None, head: int) -> tuple[int, bool]:
    """Stream a Dataset result to its sink: block-wise ParquetWriter for
    --out (never materializing the corpus on the driver), or a
    ``limit(head)`` pull for printing.  Returns (rows, truncated)."""
    import pyarrow.parquet as pq

    if out is None:
        t = _to_table(res.limit(max(head, 0)).to_pandas())
        print(t.to_pandas().to_string(index=False))
        return t.num_rows, True
    writer = None
    rows = 0
    try:
        for batch in res.iter_batches(batch_format="pyarrow"):
            if writer is None:
                writer = pq.ParquetWriter(out, batch.schema)
            writer.write_table(batch)
            rows += batch.num_rows
    finally:
        if writer is not None:
            writer.close()
    return rows, False


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="opps_feedcrawler_ray.pipelines.runner",
        description="Run a registered pipeline against a table directory.",
    )
    ap.add_argument("query", nargs="?", help="registered pipeline name")
    ap.add_argument("--list", action="store_true", help="list pipelines")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001",
                    help="directory with the parquet tables")
    ap.add_argument("--out", default=None,
                    help="write the result to this parquet file")
    ap.add_argument("--head", type=int, default=10,
                    help="rows to print when --out is not given")
    args = ap.parse_args(argv)

    registry = _load_registry()
    if args.list or not args.query:
        for name in sorted(registry):
            print(name)
        print(f"# {len(registry)} pipelines", file=sys.stderr)
        return 0
    if args.query not in registry:
        print(f"unknown pipeline {args.query!r}; see --list", file=sys.stderr)
        return 2

    import ray

    owns_ray = not ray.is_initialized()
    if owns_ray:
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    try:
        import ray.data as rd

        t0 = time.monotonic()
        res = registry[args.query](args.sf_dir)
        if isinstance(res, rd.Dataset):
            rows, truncated = _sink_dataset(res, args.out, args.head)
            secs = time.monotonic() - t0
            what = f"first {rows} rows" if truncated else f"{rows} rows"
            dest = f" -> {args.out}" if args.out else ""
            print(f"{args.query}: {what}{dest} [{secs:.2f}s]",
                  file=sys.stderr)
            return 0
        table = _to_table(res)
        secs = time.monotonic() - t0
        if args.out:
            import pyarrow.parquet as pq

            pq.write_table(table, args.out)
            print(f"{args.query}: {table.num_rows} rows -> {args.out} "
                  f"[{secs:.2f}s]", file=sys.stderr)
        else:
            print(table.slice(0, max(args.head, 0)).to_pandas()
                  .to_string(index=False))
            print(f"# {args.query}: {table.num_rows} rows [{secs:.2f}s]",
                  file=sys.stderr)
        return 0
    finally:
        if owns_ray:
            ray.shutdown()


if __name__ == "__main__":
    raise SystemExit(main())
