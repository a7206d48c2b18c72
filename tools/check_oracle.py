#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB over the testdata tables, sorts
columns by name, sorts rows, and compares exactly (with a float diff report
on mismatch). NOT part of the shipped library — dev tooling only.
"""
import glob
import json
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = norm(pd.read_parquet(f"{outdir}/{name}"))
            exp = norm(con.sql(oracle[name]).df())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
            n_fail += 1
            continue
        # exact compare, with float detail on mismatch
        mismatch = []
        for c in got.columns:
            g, e = got[c], exp[c]
            if g.dtype != e.dtype:
                try:
                    e = e.astype(g.dtype)
                except Exception:
                    mismatch.append((c, f"dtype {got[c].dtype} vs {exp[c].dtype}"))
                    continue
            eq = (g == e) | (g.isna() & e.isna())
            if not eq.all():
                bad = (~eq)
                detail = f"{bad.sum()} diffs"
                if pd.api.types.is_float_dtype(g):
                    d = (g[bad] - e[bad]).abs().max()
                    detail += f", max abs diff {d}"
                    ex_i = bad.idxmax()
                    detail += f", e.g. row {ex_i}: {g[ex_i]!r} vs {e[ex_i]!r}"
                else:
                    ex_i = bad.idxmax()
                    detail += f", e.g. row {ex_i}: {g[ex_i]!r} vs {e[ex_i]!r}"
                mismatch.append((c, detail))
        if mismatch:
            print(f"FAIL {name}: " + "; ".join(f"{c}: {d}" for c, d in mismatch))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows, {len(got.columns)} cols)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
