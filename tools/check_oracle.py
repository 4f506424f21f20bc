#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracleSql in
DuckDB over the same parquet tables and compare (schema-insensitively:
columns sorted by name, rows sorted) with the Verify parquet output.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = round(v, 9)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            want_rel = con.execute(sql)
            want_cols = [d[0] for d in want_rel.description]
            want = canon(want_rel.fetchall(), want_cols)
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        try:
            got_rel = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            got_cols = [d[0] for d in got_rel.description]
            got = canon(got_rel.fetchall(), got_cols)
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_fail += 1
            continue
        if sorted(want_cols) != sorted(got_cols):
            print(f"FAIL {name}: columns differ: duckdb={sorted(want_cols)} spark={sorted(got_cols)}")
            n_fail += 1
        elif want != got:
            print(f"FAIL {name}: rows differ: duckdb={len(want)} spark={len(got)}")
            for i, (w, g) in enumerate(zip(want, got)):
                if w != g:
                    print(f"  first diff at row {i}:\n    duckdb={w}\n    spark ={g}")
                    break
            if len(want) != len(got):
                onlyw = set(want) - set(got)
                onlyg = set(got) - set(want)
                for x in list(onlyw)[:3]:
                    print(f"    only-duckdb: {x}")
                for x in list(onlyg)[:3]:
                    print(f"    only-spark:  {x}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
