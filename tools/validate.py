#!/usr/bin/env python3
"""Dev-loop replica of the driver's correctness gate (dev tooling only —
the shipped library is pure Scala/Spark). Usage:

    python3 tools/validate.py <sfDir> <outDir> [query...]

Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` already produced
<outDir>/<name>/ parquet dirs + oracle_sql.json. Runs each oracle in
DuckDB over the same tables, sorts columns by name and rows by value,
and compares cell-by-cell (exact; floats must be bit-identical, mirroring
a hash compare).
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # normalize list/array cells to tuples so they sort/compare
    def deep(v):
        if isinstance(v, np.ndarray):
            return tuple(deep(x) for x in v.tolist())
        if isinstance(v, (list, tuple)):
            return tuple(deep(x) for x in v)
        return v
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(deep)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracles):
        if only and name not in only:
            continue
        pq = f"{out_dir}/{name}"
        if not glob.glob(f"{pq}/*.parquet"):
            print(f"FAIL {name}: no spark output at {pq}")
            n_fail += 1
            continue
        try:
            got = canon(pd.read_parquet(pq))
            want = canon(con.sql(oracles[name]).df())
        except Exception as e:
            print(f"FAIL {name}: {str(e).splitlines()[0]}")
            n_fail += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
            n_fail += 1
            continue
        eq = got.equals(want)
        if not eq:
            # locate first mismatching cells for the report
            diffs = []
            for c in got.columns:
                a, b = got[c].values, want[c].values
                bad = [i for i in range(len(a)) if not _cell_eq(a[i], b[i])]
                if bad:
                    i = bad[0]
                    diffs.append(f"{c}[{i}]: {a[i]!r} vs {b[i]!r} ({len(bad)} cells)")
            if diffs:
                print(f"FAIL {name}: " + "; ".join(diffs[:3]))
                n_fail += 1
                continue
            # dtype-only difference (e.g. int32 vs int64) — values equal
            print(f"WARN {name}: dtypes differ {dict(got.dtypes)} vs {dict(want.dtypes)} (values equal)")
        print(f"PASS {name} ({len(got)} rows)")
        n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

def _cell_eq(a, b):
    if isinstance(a, float) and isinstance(b, float):
        return (np.isnan(a) and np.isnan(b)) or a == b
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(_cell_eq(x, y) for x, y in zip(a, b))
    try:
        return bool(a == b)
    except Exception:
        return False

if __name__ == "__main__":
    main()
