"""Local simulator of the driver's correctness harness: run every
queries()[name](sf_dir) AND its oracle_sql()[name] via DuckDB, compare
row count, column names, and order-insensitive value hash.

Usage: python tools/check_contract.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        col = df[c]
        if str(col.dtype).startswith("datetime"):
            df[c] = col.astype("datetime64[us]").astype(str)
        elif col.dtype == object:
            df[c] = col.astype(str)
        elif str(col.dtype).startswith("float"):
            df[c] = col.round(6).astype(str)
        else:
            df[c] = col.astype(str)
    rows = sorted("\x1f".join(r) for r in df.itertuples(index=False, name=None))
    return hashlib.sha256("\x1e".join(rows).encode()).hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as E

    qs = E.queries()
    oracles = E.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            mine = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok(rows-only) {name}: {len(mine)} rows, {sorted(mine.columns)} [{dt:.1f}s]")
            continue
        try:
            gold = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle raised {e}")
            n_fail += 1
            continue
        ok_rows = len(mine) == len(gold)
        ok_cols = sorted(mine.columns) == sorted(gold.columns)
        ok_hash = ok_cols and value_hash(mine) == value_hash(gold)
        status = "OK  " if (ok_rows and ok_cols and ok_hash) else "FAIL"
        if status == "FAIL":
            n_fail += 1
        print(
            f"{status} {name}: rows {len(mine)}/{len(gold)} cols_ok={ok_cols} "
            f"hash_ok={ok_hash} [{dt:.1f}s]"
        )
        if status == "FAIL" and ok_cols:
            m = mine[sorted(mine.columns)].sort_values(sorted(mine.columns)).head(3)
            g = gold[sorted(gold.columns)].sort_values(sorted(gold.columns)).head(3)
            print("  mine:", m.to_dict("records"))
            print("  gold:", g.to_dict("records"))
    ray.shutdown()
    print("FAILURES:", n_fail)
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
