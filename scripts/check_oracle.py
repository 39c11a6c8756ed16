#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run graft.Verify output
against DuckDB oracle SQL on the same parquet tables, compare row sets.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, os, json, glob
import duckdb
import pandas as pd

def norm_df(df: pd.DataFrame) -> pd.DataFrame:
    # driver semantics: sort columns by name, then compare value multisets
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for comparison
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith(("float", "Float")):
            df[c] = df[c].round(9)
        elif str(df[c].dtype).startswith(("datetime", "date")):
            df[c] = df[c].astype(str)
    try:
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    except Exception:
        df = df.astype(str).sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    results = {}
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        spark_df = duckdb.sql(f"SELECT * FROM '{d}/*.parquet'").df()
        if name not in oracles:
            results[name] = f"rows-only: {len(spark_df)} rows"
            continue
        try:
            oracle_df = con.execute(oracles[name]).df()
        except Exception as e:
            results[name] = f"ORACLE SQL ERROR: {e}"
            continue
        a, b = norm_df(spark_df), norm_df(oracle_df)
        if list(a.columns) != list(b.columns):
            results[name] = f"SCHEMA MISMATCH spark={list(a.columns)} oracle={list(b.columns)}"
        elif len(a) != len(b):
            results[name] = f"ROWCOUNT MISMATCH spark={len(a)} oracle={len(b)}"
        else:
            # cell-wise compare with small float tolerance to spot near-misses
            exact = a.astype(str).equals(b.astype(str))
            if exact:
                results[name] = f"OK ({len(a)} rows)"
            else:
                diff_cols = [c for c in a.columns if not a[c].astype(str).equals(b[c].astype(str))]
                ex = ""
                for c in diff_cols[:2]:
                    mask = a[c].astype(str) != b[c].astype(str)
                    i = mask.idxmax()
                    ex += f" [{c}: spark={a[c][i]!r} oracle={b[c][i]!r}]"
                results[name] = f"VALUE MISMATCH cols={diff_cols}{ex}"
    width = max(len(k) for k in results) if results else 0
    fails = 0
    for k in sorted(results):
        v = results[k]
        if not (v.startswith("OK") or v.startswith("rows-only")):
            fails += 1
        print(f"{k:<{width}}  {v}")
    print(f"\n{len(results)} queries, {fails} failures")
    sys.exit(1 if fails else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
