#!/usr/bin/env python3
"""Time individual oracle SQL queries in DuckDB over an sf dir.

Usage: python3 tools/duck_time.py <oracle_sql.json> <sf_dir> <reps> <query> [query ...]

Prints the per-rep wall times and the median (rep 1 is warm-up, excluded
from the median) — the DuckDB side of a Spark-vs-oracle per-op timing
pair (graft.QBench is the Spark side).
"""
import sys, json, time, statistics
import duckdb

def main():
    oracle_path, sfdir, reps = sys.argv[1], sys.argv[2], int(sys.argv[3])
    names = sys.argv[4:]
    sqls = json.load(open(oracle_path))
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
