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
            ours_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            ours_cols = list(ours_rel.columns)
            ours_types = {c: str(t) for c, t in zip(ours_rel.columns, ours_rel.types)}
            ours = ours_rel.fetchall()
            theirs_rel = con.sql(sql)
            theirs_cols = list(theirs_rel.columns)
            theirs_types = {c: str(t) for c, t in zip(theirs_rel.columns, theirs_rel.types)}
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
        # the driver's hash is TYPE-AWARE: DuckDB logical-type drift
        # (HUGEINT vs BIGINT, INTEGER vs BIGINT, FLOAT vs DOUBLE) fails
        # the driver gate even when every value matches — so it FAILS here.
        type_drift = [c for c in ours_types if ours_types[c] != theirs_types.get(c)]
        if type_drift:
            for c in type_drift:
                print(f"  TYPE {name}.{c}: ours={ours_types[c]} oracle={theirs_types.get(c)}")
            print(f"FAIL {name}: {len(type_drift)} column type drift(s)")
            n_fail += 1
            continue
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


def selftest():
    """Guard: a seeded HUGEINT-vs-BIGINT drift must FAIL, not pass.

    Builds a parquet with a BIGINT sum next to an oracle whose uncast
    integer SUM returns HUGEINT (the exact r5 drift class), runs the
    same compare path as main(), and asserts the drift is caught.
    """
    import os
    import tempfile
    con = duckdb.connect()
    with tempfile.TemporaryDirectory() as d:
        qdir = os.path.join(d, "fx_drift")
        os.makedirs(qdir)
        con.execute(
            f"COPY (SELECT CAST(3 AS BIGINT) AS s) TO '{qdir}/part-0.parquet'")
        ours_rel = con.sql(f"SELECT * FROM '{qdir}/*.parquet'")
        theirs_rel = con.sql("SELECT sum(1) AS s FROM range(3)")  # HUGEINT
        ours_t = {c: str(t) for c, t in zip(ours_rel.columns, ours_rel.types)}
        theirs_t = {c: str(t) for c, t in zip(theirs_rel.columns, theirs_rel.types)}
        drift = [c for c in ours_t if ours_t[c] != theirs_t.get(c)]
        assert drift == ["s"], f"seeded drift not caught: {ours_t} vs {theirs_t}"
        assert ours_rel.fetchall() == theirs_rel.fetchall(), "values should match"
    print("selftest PASS: seeded HUGEINT drift caught despite equal values")
    return 0


if __name__ == "__main__":
    if len(sys.argv) == 2 and sys.argv[1] == "--selftest":
        sys.exit(selftest())
    sys.exit(main(sys.argv[1], sys.argv[2]))
