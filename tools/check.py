#!/usr/bin/env python3
"""Local oracle self-check, mimicking the driver's compare:
run each oracle SQL in DuckDB over the sf tables, read the engine's
Verify parquet dump, sort columns by name, sort rows, compare values.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows):
    out = []
    for row in rows:
        vals = []
        for v in row:
            if v is None:
                vals.append("NULL")
            elif isinstance(v, float):
                if math.isnan(v):
                    vals.append("NaN")
                else:
                    vals.append(repr(v))
            elif isinstance(v, bool):
                vals.append(str(v))
            elif isinstance(v, (list, tuple)):
                vals.append(str(list(v)))
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        try:
            exp_rel = con.execute(sql)
            exp_cols = sorted(d[0].lower() for d in exp_rel.description)
            idx = [
                [d[0].lower() for d in exp_rel.description].index(c)
                for c in exp_cols]
            exp = canon([[r[i] for i in idx] for r in exp_rel.fetchall()])
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:200]}")
            n_fail += 1
            continue
        try:
            got_rel = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols = sorted(d[0].lower() for d in got_rel.description)
            gidx = [
                [d[0].lower() for d in got_rel.description].index(c)
                for c in got_cols]
            got = canon([[r[i] for i in gidx] for r in got_rel.fetchall()])
        except Exception as e:
            print(f"FAIL {name}: engine output unreadable: {str(e)[:200]}")
            n_fail += 1
            continue
        if exp_cols != got_cols:
            print(f"FAIL {name}: columns exp={exp_cols} got={got_cols}")
            n_fail += 1
        elif len(exp) != len(got):
            print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
            n_fail += 1
        elif exp != got:
            bad = [(e, g) for e, g in zip(exp, got) if e != g][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {bad}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(exp)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail / {n_skip} skip ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
