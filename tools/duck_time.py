#!/usr/bin/env python3
"""Time individual oracle SQL queries in DuckDB over an sf dir.

Usage: python3 tools/duck_time.py <oracle_sql.json> <sf_dir> <reps> <query> [query ...]

Prints the per-rep wall times and the median (rep 1 is warm-up, excluded
from the median) — the DuckDB side of a Spark-vs-oracle per-op timing
pair (graft.QBench is the Spark side).
"""
import os, re, sys, json, time, statistics
import duckdb

def main():
    oracle_path, sfdir, reps = sys.argv[1], sys.argv[2], int(sys.argv[3])
    names = sys.argv[4:]
    sqls = json.load(open(oracle_path))
    # d16's oracle bakes the GRAFT_AUDIT_MOD value it was EXPORTED under
    # into its sample predicate. Replaying it under a different EFFECTIVE
    # value (env unset falls back to the Spark side's default of 2, per
    # Dedup.AuditMod) would silently time a different sample than the
    # Spark side draws — fail loudly on the mismatch instead (the
    # exported SQL is the authority; re-export oracle_sql.json to change
    # the mod).
    env_mod = os.environ.get("GRAFT_AUDIT_MOD", "2")
    if "d16_lsh_recall_audit" in names:
        baked = re.search(r"%\s*(\d+)\s*=\s*0", sqls["d16_lsh_recall_audit"])
        if baked and baked.group(1) != env_mod:
            sys.exit(f"GRAFT_AUDIT_MOD={env_mod} but the exported d16 oracle "
                     f"was baked with mod={baked.group(1)} — re-export "
                     "oracle_sql.json under the env you are timing with")
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    for name in names:
        times = []
        for _ in range(reps + 1):
            t0 = time.time()
            con.execute(sqls[name]).fetchall()
            times.append(time.time() - t0)
        med = statistics.median(times[1:])
        print(f"DUCK {name} median={med:.3f} times=" +
              ",".join(f"{t:.3f}" for t in times))

if __name__ == "__main__":
    main()
