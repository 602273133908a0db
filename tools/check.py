#!/usr/bin/env python3
"""Local pre-validation of the driver's correctness gate.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir>

Loads each SparkEntry query result (parquet written by graft.Verify),
runs the matching oracle SQL in DuckDB over the same testdata parquet
tables, sorts columns by name, and compares values exactly (and with a
row-sorted fallback so ordering issues are distinguishable from value
issues). Mirrors the driver contract described in the builder prompt.
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].reset_index(drop=True)
    return df

def values_equal(a: pd.DataFrame, b: pd.DataFrame) -> bool:
    if a.shape != b.shape:
        return False
    for col in a.columns:
        av, bv = a[col].values, b[col].values
        if len(av) == 0:
            continue
        if np.issubdtype(a[col].dtype, np.floating) or np.issubdtype(b[col].dtype, np.floating):
            aa = pd.to_numeric(a[col]).astype(float).values
            bb = pd.to_numeric(b[col]).astype(float).values
            na = pd.isna(aa); nb = pd.isna(bb)
            if not (na == nb).all():
                return False
            if not (aa[~na] == bb[~nb]).all():   # EXACT double equality
                return False
        else:
            if not a[col].astype(str).fillna("<NA>").equals(b[col].astype(str).fillna("<NA>")):
                return False
    return True

def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    declared = [d for d in sorted(os.listdir(outdir))
                if os.path.isdir(os.path.join(outdir, d))]
    fails = 0
    for name in sorted(set(oracle) - set(declared)):
        print(f"FAIL {name}: oracle declared but no spark output directory")
        fails += 1
    for name in declared:
        spark_files = glob.glob(os.path.join(outdir, name, "*.parquet"))
        if not spark_files:
            print(f"FAIL {name}: no spark output"); fails += 1; continue
        sdf = pd.read_parquet(os.path.join(outdir, name))
        if name not in oracle:
            print(f"WEAK {name}: no oracle, rows={len(sdf)} " +
                  ("ok" if len(sdf) > 0 else "EMPTY!"))
            if len(sdf) == 0: fails += 1
            continue
        try:
            ddf = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); fails += 1; continue
        s, d = norm(sdf), norm(ddf)
        if list(s.columns) != list(d.columns):
            print(f"FAIL {name}: columns spark={list(s.columns)} duck={list(d.columns)}")
            fails += 1; continue
        schema_note = ""
        for col in s.columns:
            if str(s[col].dtype) != str(d[col].dtype):
                schema_note += f" [dtype {col}: {s[col].dtype} vs {d[col].dtype}]"
        if values_equal(s, d):
            print(f"PASS {name}: {len(s)} rows{schema_note}")
        else:
            ss = s.sort_values(by=list(s.columns), kind="mergesort").reset_index(drop=True)
            dd = d.sort_values(by=list(d.columns), kind="mergesort").reset_index(drop=True)
            if values_equal(ss, dd):
                print(f"ORDER-ONLY-FAIL {name}: values match after row sort{schema_note}")
            else:
                print(f"FAIL {name}: value mismatch{schema_note} "
                      f"(spark {s.shape} vs duck {d.shape})")
                with pd.option_context("display.max_columns", None, "display.width", 250):
                    print("  spark head:\n", s.head(3).to_string())
                    print("  duck  head:\n", d.head(3).to_string())
            fails += 1
    print(f"\n{'ALL PASS' if fails == 0 else f'{fails} FAILURES'} "
          f"({len(declared)} queries)")
    sys.exit(1 if fails else 0)

if __name__ == "__main__":
    main()
