#!/usr/bin/env python3
"""Local simulation of the driver's correctness gate.

Usage: python3 tools/check_oracle.py [--strict] <sfDir> <verifyOutDir>

For each query dumped by graft.Verify, runs the matching oracle SQL in
DuckDB over the same parquet tables, canonicalizes both results
(columns sorted by name, rows sorted), and compares values.

Default mode tolerates dtype-width differences and float noise
(np.allclose); --strict mirrors the driver's hash compare: dtypes must
match exactly as materialized by pandas (so a DuckDB HUGEINT -> float64
vs Spark int64 is a FAIL even when values agree) and every cell must be
string-identical. Run strict before shipping — the driver is strict.
Dev-only tool — the engine itself has no Python dependency.
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame, strict: bool) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if not strict:
        # loose mode: normalize ints -> Int64, floats -> rounded float64
        for c in df.columns:
            if pd.api.types.is_float_dtype(df[c]):
                df[c] = df[c].astype("float64").round(9)
            elif pd.api.types.is_integer_dtype(df[c]):
                df[c] = df[c].astype("Int64")
    return df.sort_values(by=list(df.columns), na_position="first",
                          ignore_index=True)

def main(sf_dir, out_dir, strict=False):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        qdir = f"{out_dir}/{name}"
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            exp = canon(con.execute(oracle[name]).df(), strict)
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}"); n_fail += 1; continue
        got = canon(pd.concat([pd.read_parquet(f) for f in files],
                              ignore_index=True), strict)
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
            n_fail += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); n_fail += 1
            continue
        ok = True
        for c in got.columns:
            a, b = got[c], exp[c]
            if strict and str(a.dtype) != str(b.dtype):
                print(f"FAIL {name}: col {c} dtype {a.dtype} vs {b.dtype}")
                ok = False; break
            if not strict and (pd.api.types.is_float_dtype(a)
                               or pd.api.types.is_float_dtype(b)):
                same = np.allclose(a.astype(float).fillna(-1e308),
                                   b.astype(float).fillna(-1e308),
                                   rtol=1e-9, atol=1e-9)
            else:
                same = a.astype(str).equals(b.astype(str))
            if not same:
                bad = None
                for i in range(len(a)):
                    av, bv = a.iloc[i], b.iloc[i]
                    if str(av) != str(bv):
                        bad = (i, av, bv); break
                print(f"FAIL {name}: col {c} differs, first diff {bad}")
                ok = False; break
        if ok:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
        else:
            n_fail += 1
    mode = "strict" if strict else "loose"
    print(f"== {n_pass} pass / {n_fail} fail ({mode}) ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    argv = [a for a in sys.argv[1:] if a != "--strict"]
    main(argv[0], argv[1], strict="--strict" in sys.argv)
