"""Driver-mimic correctness gate: run queries() vs oracle_sql() at a given
sf_dir, compare row count / schema / sorted-value hash the way the driver
does (columns sorted by name before hashing; floats rounded to 6dp).

Usage: python tools/gatecheck.py [sf_dir] [query ...]
Defaults to /root/testdata/sf0.01 and every SQL-gated query.
"""
import hashlib
import os
import sys

import duckdb
import pandas as pd
import ray

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def _hash(df: pd.DataFrame) -> str:
    return hashlib.md5(df.to_csv(index=False).encode()).hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    qs, sqls = e.queries(), e.oracle_sql()
    fails = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        res = fn(sf_dir)
        if hasattr(res, "to_pandas"):
            res = res.to_pandas()
        got = _canon(pd.DataFrame(res))
        if name not in sqls:
            print(f"{name}: rows={len(got)} (no oracle)")
            continue
        exp = _canon(con.execute(sqls[name]).df())
        rows = len(got) == len(exp)
        schema = list(got.columns) == list(exp.columns)
        h = rows and schema and _hash(got) == _hash(exp)
        status = "PASS" if (rows and schema and h) else "FAIL"
        if status == "FAIL":
            fails += 1
        print(f"{name}: {status} rows={rows}({len(got)}/{len(exp)}) "
              f"schema={schema} hash={h}")
    ray.shutdown()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
