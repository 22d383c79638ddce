#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate.

Reads each query result parquet written by graft.Verify, runs the
corresponding oracle SQL in DuckDB over the same sf dir, sorts columns
by name, and compares row counts + values. Usage:

    python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return repr(v)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            ours = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchall()
            ours_cols = [d[0] for d in con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet' LIMIT 0").description]
            theirs_rel = con.sql(sql)
            theirs_cols = [d[0] for d in theirs_rel.description]
            theirs = theirs_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        # driver compare: sort columns by name, then hash values
        oi = sorted(range(len(ours_cols)), key=lambda i: ours_cols[i])
        ti = sorted(range(len(theirs_cols)), key=lambda i: theirs_cols[i])
        if sorted(ours_cols) != sorted(theirs_cols):
            print(f"FAIL {name}: columns {sorted(ours_cols)} vs {sorted(theirs_cols)}")
            n_fail += 1
            continue
        # dtype drift is a warning (value compare below is the gate, but
        # if the driver hashes schemas too, these are the risk spots)
        ours_types = {d[0]: str(d[1]) for d in con.sql(
            f"SELECT * FROM '{out_dir}/{name}/*.parquet' LIMIT 0").description}
        theirs_types = {d[0]: str(d[1]) for d in theirs_rel.description}
        for c in ours_types:
            if ours_types[c] != theirs_types.get(c):
                print(f"  WARN {name}.{c}: ours={ours_types[c]} oracle={theirs_types.get(c)}")
        if len(ours) != len(theirs):
            print(f"FAIL {name}: rows {len(ours)} vs {len(theirs)}")
            n_fail += 1
            continue
        bad = 0
        for r, (ro, rt) in enumerate(zip(ours, theirs)):
            a = [canon(ro[i]) for i in oi]
            b = [canon(rt[i]) for i in ti]
            if a != b:
                bad += 1
                if bad <= 3:
                    print(f"  {name} row {r}: ours={a} oracle={b}")
        if bad:
            print(f"FAIL {name}: {bad}/{len(ours)} mismatched rows")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(ours)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
