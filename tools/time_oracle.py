#!/usr/bin/env python3
"""Time each DuckDB oracle query for BASELINE.md's measured table.
Usage: time_oracle.py <sfDir> <verifyOut>  (reads <verifyOut>/oracle_sql.json)"""
import json, sys, time
import duckdb

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    total = 0.0
    times = {}
    for name, sql in sorted(oracle.items()):
        t0 = time.time()
        con.execute(sql).fetchall()
        dt = time.time() - t0
        times[name] = dt
        total += dt
        print(f"{name}\t{dt:.2f}")
    print(f"TOTAL\t{total:.2f}")
    json.dump(times, open(f"{out_dir}/oracle_times.json", "w"))

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
