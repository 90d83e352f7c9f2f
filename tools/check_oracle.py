#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query dumped by graft.Verify: load the Spark parquet result,
run the oracle SQL in DuckDB against the same sfDir parquet tables,
sort columns by name, sort rows, and compare values exactly.
"""
import json, sys, os
import duckdb

def canon(rel):
    df = rel.fetchdf()
    df = df[sorted(df.columns)]
    # list/array columns (numpy arrays) are unhashable/unsortable →
    # canonicalize to tuples
    for c in df.columns:
        if df[c].dtype == object and df[c].map(
                lambda v: hasattr(v, "__len__") and not isinstance(v, (str, bytes))).any():
            df[c] = df[c].map(lambda v: tuple(v) if hasattr(v, "__len__")
                              and not isinstance(v, (str, bytes)) else v)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        got = canon(con.sql(f"SELECT * FROM '{d}/*.parquet'"))
        if name not in oracle:
            print(f"  [rows-only] {name}: {len(got)} rows")
            continue
        want = canon(con.sql(oracle[name]))
        ok_schema = list(got.columns) == list(want.columns)
        ok = ok_schema and got.equals(want)
        if not ok and ok_schema and len(got) == len(want):
            # The driver hashes RENDERED values, so the tie-breaker on
            # dtype drift is string-representation equality: int32 5
            # vs string "5" passes (feat_eb_shrinkage is driver-green
            # with exactly that drift), while a DuckDB HUGEINT/DOUBLE
            # reaching the frame renders 2771036.0 against Spark's
            # 2771036 and FAILS — the drift that hash-failed
            # ts_holt_winters for two rounds while the old tolerance
            # (astype(float64) on any mismatch) hid it.
            try:
                ok = all(
                    (got[c].equals(want[c])
                     if str(got[c].dtype) == str(want[c].dtype)
                     else got[c].astype(str).equals(want[c].astype(str)))
                    for c in got.columns)
                if ok:
                    drift = {c: (str(got[c].dtype), str(want[c].dtype))
                             for c in got.columns
                             if str(got[c].dtype) != str(want[c].dtype)}
                    print(f"    [note] {name}: dtype drift {drift} — "
                          "string renderings match, driver-safe")
            except Exception:
                pass
        status = "PASS" if ok else "FAIL"
        n_pass += ok; n_fail += (not ok)
        print(f"  [{status}] {name}: spark={len(got)} oracle={len(want)} rows")
        if not ok:
            if not ok_schema:
                print(f"    schema: spark={list(got.columns)} oracle={list(want.columns)}")
            elif len(got) != len(want):
                print(f"    row counts differ: spark={len(got)} oracle={len(want)}")
            else:
                import pandas as pd
                neq = (got != want) & ~(got.isna() & want.isna())
                bad = neq.any(axis=1)
                print("    spark:", got[bad].head(5).to_string())
                print("    oracle:", want[bad].head(5).to_string())
    print(f"{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
