#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate (dev tool only —
never imported by the Scala library): compare each Verify-dumped
parquet result against its DuckDB oracle over the same testdata
tables.

Usage: check_oracles.py <verify_out_dir> <sf_dir>
"""
import json
import os
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
                v = f"{v:.9g}"
            vals.append(str(v))
        out.append("\x01".join(vals))
    out.sort()
    return out


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    # a query that THREW in Verify has an oracle entry but no output
    # dir — that must fail the gate loudly, not vanish from the report
    # (st_anomaly's TIMESTAMP_NTZ failure hid exactly this way)
    missing = sorted(set(oracles) - {n for n in os.listdir(out_dir)
                                     if os.path.isdir(os.path.join(out_dir, n))})
    for name in missing:
        print(f"[FAIL-MISSING] {name}: oracle present but Verify wrote no output (query threw?)")
        failures += 1
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        got = con.execute(f"SELECT * FROM '{d}/*.parquet'").fetchall()
        got_cols = [c[0] for c in con.description]
        if name not in oracles:
            print(f"[rows-only] {name}: {len(got)} rows" + (" (EMPTY)" if not got else ""))
            continue
        try:
            want = con.execute(oracles[name]).fetchall()
            want_cols = [c[0] for c in con.description]
        except Exception as e:
            print(f"[FAIL-SQL]  {name}: oracle SQL failed: {e}")
            failures += 1
            continue
        if sorted(got_cols) != sorted(want_cols):
            print(f"[FAIL-COLS] {name}: spark={sorted(got_cols)} duckdb={sorted(want_cols)}")
            failures += 1
            continue
        g, w = canon(got, got_cols), canon(want, want_cols)
        if len(g) != len(w):
            print(f"[FAIL-ROWS] {name}: spark={len(g)} duckdb={len(w)}")
            failures += 1
        elif g != w:
            diff = next(i for i in range(len(g)) if g[i] != w[i])
            print(f"[FAIL-HASH] {name}: first diff at sorted row {diff}:\n  spark : {g[diff][:300]}\n  duckdb: {w[diff][:300]}")
            failures += 1
        else:
            print(f"[MATCH]     {name}: {len(g)} rows")
    print(f"\n{'ALL MATCH' if failures == 0 else f'{failures} FAILURES'}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
