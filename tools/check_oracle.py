#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` already ran.
For each query: read Spark's parquet result, run the oracle SQL in DuckDB
over the same tables, sort columns by name + rows by all columns, compare.
"""
import json
import math
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(rows, cols, exact=True):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in idx:
            v = r[i]
            if not exact and isinstance(v, float):
                v = float(f"{v:.12g}")  # absorb printf-level noise only
            vals.append(repr(v))
        out.append("|".join(vals))
    return sorted(out), [cols[i] for i in idx]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            g_rows, g_cols = canon(got.fetchall(), got.columns)
            exp = con.sql(sql)
            e_rows, e_cols = canon(exp.fetchall(), exp.columns)
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_bad += 1
            continue
        if g_cols != e_cols:
            print(f"FAIL {name}: columns {g_cols} != {e_cols}")
            n_bad += 1
        elif g_rows != e_rows:
            # diagnose: does it pass with 12-sig-fig float canonicalization?
            # The DRIVER hashes exact values, so a NEAR is still a FAIL here
            # (round-10 lesson: q_conversion_lag was a 1-ulp percentile).
            gl, _ = canon(got.fetchall(), got.columns, exact=False)
            el, _ = canon(exp.fetchall(), exp.columns, exact=False)
            tag = "FAIL(NEAR: ulp-level float drift)" if gl == el else "FAIL"
            diff_g = [r for r in g_rows if r not in set(e_rows)][:3]
            diff_e = [r for r in e_rows if r not in set(g_rows)][:3]
            print(f"{tag} {name}: {len(g_rows)} vs {len(e_rows)} rows; spark-only={diff_g} oracle-only={diff_e}")
            n_bad += 1
        else:
            print(f"ok   {name} ({len(g_rows)} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail ==")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
