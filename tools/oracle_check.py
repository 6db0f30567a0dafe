#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf tables, compare with the Spark result parquet
(column-name-sorted, row-order-sensitive value compare).

Usage: python3 tools/oracle_check.py <verify_out_dir> <sf_dir>
"""
import json, math, os, sys
import duckdb

def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return str(v)

def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        spark_dir = f"{out_dir}/{name}"
        if not os.path.isdir(spark_dir):
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            o = con.execute(sql)
            o_cols = [d[0] for d in o.description]
            o_rows = o.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_fail += 1; continue
        try:
            s = con.execute(f"SELECT * FROM '{spark_dir}/*.parquet'")
            s_cols = [d[0] for d in s.description]
            s_rows = s.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark read error {e}"); n_fail += 1; continue
        if sorted(o_cols) != sorted(s_cols):
            print(f"FAIL {name}: schema oracle={sorted(o_cols)} spark={sorted(s_cols)}")
            n_fail += 1; continue
        if len(o_rows) != len(s_rows):
            print(f"FAIL {name}: rows oracle={len(o_rows)} spark={len(s_rows)}")
            n_fail += 1; continue
        operm = sorted(range(len(o_cols)), key=lambda i: o_cols[i])
        sperm = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
        bad = None
        for ri, (orow, srow) in enumerate(zip(o_rows, s_rows)):
            oc = [canon(orow[i]) for i in operm]
            sc = [canon(srow[i]) for i in sperm]
            if oc != sc:
                bad = (ri, oc, sc); break
        if bad:
            ri, oc, sc = bad
            print(f"FAIL {name}: row {ri}\n  oracle={oc}\n  spark ={sc}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(o_rows)} rows)"); n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, "
          f"{len(oracles)} oracled / {len([d for d in os.listdir(out_dir) if os.path.isdir(os.path.join(out_dir, d))])} total queries")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
