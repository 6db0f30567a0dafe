#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf tables, compare with the Spark result parquet
(column-name-sorted, row-order-sensitive value compare).

DTYPE-FAITHFUL (round 13): both sides are materialized as dtyped pandas
frames (`.df()`), mirroring the driver's arrow/pandas compare. This is
what catches the HUGEINT class: DuckDB `SUM(BIGINT)` yields HUGEINT,
which pandas materializes as float64 — so an un-cast oracle sum compared
against Spark's int64 canonicalizes to '123.0' vs '123' and FAILS here,
exactly as it fails at the driver (the old `fetchall()` path saw Python
ints on both sides and passed). A lint additionally flags oracle SQL
with aggregate calls not wrapped in CAST as likely dtype hazards.

Usage: python3 tools/oracle_check.py <verify_out_dir> <sf_dir>
"""
import json, math, os, sys
import duckdb
import numpy as np
import pandas as pd

def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon(v[k])}" for k in sorted(v)) + "}"
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return "NaN"
        return repr(f)
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    try:
        if pd.isna(v):
            return "NULL"
    except (TypeError, ValueError):
        pass
    return str(v)

# Oracle-SQL lint: un-cast sums are the dtype hazard that cost a driver
# gate in r12 (DuckDB SUM(BIGINT) -> HUGEINT -> pandas float64 vs Spark
# int64). Rather than regex-guess, ask DuckDB what it will return:
# any HUGEINT/UHUGEINT column in the oracle's result schema is almost
# certainly an un-cast integer aggregate and WILL dtype-split at the
# driver. The dtyped compare below also catches it; the lint names the
# column so the fix is obvious.
def lint(con, name, sql):
    try:
        desc = con.execute(f"DESCRIBE {sql}").fetchall()
    except Exception:
        return
    bad = [(c, t) for (c, t, *_rest) in desc
           if t.upper() in ("HUGEINT", "UHUGEINT", "INT128", "UINT128")]
    if bad:
        print(f"LINT {name}: HUGEINT result column(s) {bad} — wrap the "
              f"aggregate in CAST(... AS BIGINT) or the driver compare "
              f"will see float64 vs int64")

def frame(cur):
    df = cur.df()
    cols = sorted(df.columns.tolist())
    return df[cols]

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
        lint(con, name, sql)
        try:
            o = frame(con.execute(sql))
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_fail += 1; continue
        try:
            s = frame(con.execute(f"SELECT * FROM '{spark_dir}/*.parquet'"))
        except Exception as e:
            print(f"FAIL {name}: spark read error {e}"); n_fail += 1; continue
        if o.columns.tolist() != s.columns.tolist():
            print(f"FAIL {name}: schema oracle={o.columns.tolist()} "
                  f"spark={s.columns.tolist()}")
            n_fail += 1; continue
        if len(o) != len(s):
            print(f"FAIL {name}: rows oracle={len(o)} spark={len(s)}")
            n_fail += 1; continue
        bad = None
        o_rows = list(o.itertuples(index=False, name=None))
        s_rows = list(s.itertuples(index=False, name=None))
        for ri, (orow, srow) in enumerate(zip(o_rows, s_rows)):
            oc = [canon(v) for v in orow]
            sc = [canon(v) for v in srow]
            if oc != sc:
                bad = (ri, oc, sc); break
        if bad:
            ri, oc, sc = bad
            print(f"FAIL {name}: row {ri}\n  oracle={oc}\n  spark ={sc}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(o)} rows)"); n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, "
          f"{len(oracles)} oracled / {len([d for d in os.listdir(out_dir) if os.path.isdir(os.path.join(out_dir, d))])} total queries")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
