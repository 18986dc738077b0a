#!/usr/bin/env python3
"""Local oracle check mirroring the driver's t2 compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for each query with an oracle, loads our parquet output and the DuckDB
result, sorts columns by name and rows by all columns, and compares
values exactly (with a diff report on mismatch).
"""
import json
import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) and len(df.columns):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


def main() -> int:
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            got = canon(pd.read_parquet(f"{outdir}/{name}"))
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_fail += 1
            continue
        try:
            exp = canon(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns differ spark={list(got.columns)} duck={list(exp.columns)}")
            n_fail += 1
            continue
        dt = [(c, str(got[c].dtype), str(exp[c].dtype))
              for c in got.columns if str(got[c].dtype) != str(exp[c].dtype)]
        if dt:
            print(f"WARN {name}: dtype mismatch {dt}")
        if len(got) != len(exp):
            print(f"FAIL {name}: rows differ spark={len(got)} duck={len(exp)}")
            n_fail += 1
            continue
        bad = []
        for c in got.columns:
            a, b = got[c], exp[c]
            if a.dtype.kind == "f" or b.dtype.kind == "f":
                aa, bb = a.astype(float), b.astype(float)
                neq = ~((aa == bb) | (aa.isna() & bb.isna()))
            else:
                aa, bb = a.astype(object), b.astype(object)
                neq = ~((aa == bb) | (aa.isna() & bb.isna()))
            if neq.any():
                i = int(np.argmax(neq.values))
                bad.append(f"{c}[{int(neq.sum())} rows, first@{i}: {a.iloc[i]!r} vs {b.iloc[i]!r}]")
        if bad:
            print(f"FAIL {name}: " + "; ".join(bad))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows, {len(got.columns)} cols)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, "
          f"{len(oracle) - n_pass - n_fail} skipped")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
