#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: reads Verify's output
directory (<out>/<name>/ parquet + oracle_sql.json), runs each oracle in
DuckDB against the same sf dir, and compares row-by-row with doubles rounded
to 6 dp (FIXTURES.md par.3). Usage: check.py <sfDir> <verifyOut>"""
import json, math, sys
import duckdb

def canon(rows):
    out = []
    for r in rows:
        vals = []
        for k in sorted(r.keys()):
            v = r[k]
            if isinstance(v, float):
                if math.isnan(v): v = "NaN"
                else: v = f"{round(v, 6):.6f}"
            vals.append(str(v))
        out.append(",".join(vals))
    return out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_rows = duckdb.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})"); n_fail += 1; continue
        try:
            oracle_rows = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        s = canon(spark_rows.to_dict("records"))
        o = canon(oracle_rows.to_dict("records"))
        sc = sorted(spark_rows.columns); oc = sorted(oracle_rows.columns)
        if sc != oc:
            print(f"FAIL {name}: columns {sc} vs {oc}"); n_fail += 1; continue
        if len(s) != len(o):
            print(f"FAIL {name}: rows {len(s)} vs {len(o)}"); n_fail += 1; continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(s, o)) if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(s)} rows differ; first at {i}:\n  spark : {a}\n  oracle: {b}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s)} rows)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
