#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs
the matching SQL from oracle_sql.json in DuckDB over the same parquet
tables, and compares row-by-row after sorting columns by name and rows by
value. Exact comparison (the driver hashes), with a float report to help
debug near-misses.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
            want = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        gc, wc = sorted(got.columns), sorted(want.columns)
        if gc != wc:
            print(f"FAIL {name}: columns {gc} vs {wc}")
            n_fail += 1
            continue
        # Dtype-strict: the driver hashes raw values, so int64 vs float64/
        # object (e.g. DuckDB typing sum(INTEGER) as HUGEINT) must fail here
        # even when Python == would call the values equal.
        dt_bad = [(c, str(got[c].dtype), str(want[c].dtype))
                  for c in gc if str(got[c].dtype) != str(want[c].dtype)]
        if dt_bad:
            print(f"FAIL {name}: dtypes spark-vs-oracle {dt_bad}")
            n_fail += 1
            continue
        g = [tuple(norm(v) for v in r) for r in got[gc].itertuples(index=False)]
        w = [tuple(norm(v) for v in r) for r in want[wc].itertuples(index=False)]
        g.sort(key=repr)
        w.sort(key=repr)
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} vs {len(w)}")
            n_fail += 1
            continue
        bad = [(a, b) for a, b in zip(g, w) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)} mismatched rows; first: {bad[0]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
