#!/usr/bin/env python3
"""DEV-ONLY local mirror of the driver's correctness gate (not part of the
shipped library). Runs each oracle_sql.json entry in DuckDB over the testdata
parquet tables and compares with the Spark result parquet dumped by
graft.Verify: same row count, same column names, same values after sorting
columns by name.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json, math, sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return round(v, 9)
    return v


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_fail += 1
            continue
        try:
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        gc, wc = sorted(got.columns), sorted(want.columns)
        if gc != wc:
            print(f"FAIL {name}: columns {gc} != {wc}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_fail += 1
            continue
        got, want = got[gc], want[gc]
        bad = 0
        for c in gc:
            a = [norm_cell(x) for x in got[c].tolist()]
            b = [norm_cell(x) for x in want[c].tolist()]
            if a != b:
                for i, (x, y) in enumerate(zip(a, b)):
                    if x != y:
                        print(f"FAIL {name}: col {c} row {i}: spark={x!r} duck={y!r}")
                        break
                bad += 1
        if bad:
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    # queries without oracle get a rows-only check
    import os
    for d in sorted(os.listdir(out_dir)):
        if d not in oracle and os.path.isdir(f"{out_dir}/{d}"):
            n = con.execute(f"SELECT count(*) FROM '{out_dir}/{d}/*.parquet'").fetchone()[0]
            print(f"ROWS {d}: {n}")
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
