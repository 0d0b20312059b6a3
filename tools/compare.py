#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, runs each SQL in DuckDB with views
over <sfDir>/*.parquet, loads the Spark result parquet from
<verifyOutDir>/<name>/, and compares: row count, column names, and values
(columns sorted by name, rows sorted, exact compare plus a 1e-9-relative
float fallback report).
"""
import glob
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify for a stable total sort across mixed types
    key = df.astype(str).apply(lambda r: "\x1f".join(r), axis=1)
    return df.loc[key.sort_values().index].reset_index(drop=True)


def main() -> None:
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = 0
    for name, sql in sorted(oracle.items()):
        try:
            exp = con.execute(sql).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle SQL error: {e}")
            continue
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            continue
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        if sorted(got.columns) != sorted(exp.columns):
            print(f"FAIL {name}: columns {sorted(got.columns)} != {sorted(exp.columns)}")
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            continue
        g, e = norm(got), norm(exp)
        exact = True
        for c in g.columns:
            gc, ec = g[c], e[c]
            if pd.api.types.is_float_dtype(gc) or pd.api.types.is_float_dtype(ec):
                import numpy as np
                if not np.allclose(gc.astype(float), ec.astype(float),
                                   rtol=0, atol=0, equal_nan=True):
                    close = np.allclose(gc.astype(float), ec.astype(float),
                                        rtol=1e-9, atol=1e-12, equal_nan=True)
                    print(f"  [{name}] col {c}: not bit-exact"
                          + (" (but 1e-9-close)" if close else " (DIVERGENT)"))
                    exact = exact and close
            else:
                if not gc.astype(str).equals(ec.astype(str)):
                    bad = (gc.astype(str) != ec.astype(str))
                    i = bad.idxmax()
                    print(f"  [{name}] col {c}: mismatch at row {i}: "
                          f"spark={gc[i]!r} oracle={ec[i]!r} ({bad.sum()} rows)")
                    exact = False
        if exact:
            n_pass += 1
            print(f"PASS {name} ({len(got)} rows)")
        else:
            print(f"FAIL {name}")
    print(f"== {n_pass}/{len(oracle)} pass ==")


if __name__ == "__main__":
    main()
