#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify),
runs the matching oracle SQL from oracle_sql.json in DuckDB with views
named after the testdata tables, and compares: column names (sorted),
row counts, and cell values (exact; floats reported with max-abs-diff
when they mismatch).
"""
import glob
import json
import math
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    if isinstance(v, float):
        return v
    return v


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = con.sql(f"SELECT * FROM read_parquet({files!r})").fetchall()
            gcols = [d[0] for d in con.sql(f"SELECT * FROM read_parquet({files!r}) LIMIT 0").description]
            want = con.sql(sql).fetchall()
            wcols = [d[0] for d in con.sql(f"SELECT * FROM ({sql}) LIMIT 0").description]
        except Exception as e:
            print(f"FAIL {name}: {str(e).splitlines()[0][:160]}")
            n_fail += 1
            continue
        if sorted(gcols) != sorted(wcols):
            print(f"FAIL {name}: columns spark={sorted(gcols)} oracle={sorted(wcols)}")
            n_fail += 1
            continue
        # reorder cells by sorted column name, like the driver
        gidx = [gcols.index(c) for c in sorted(gcols)]
        widx = [wcols.index(c) for c in sorted(wcols)]
        grows = [tuple(r[i] for i in gidx) for r in got]
        wrows = [tuple(r[i] for i in widx) for r in want]
        if len(grows) != len(wrows):
            print(f"FAIL {name}: rows spark={len(grows)} oracle={len(wrows)}")
            n_fail += 1
            continue
        bad = None
        maxdiff = 0.0
        for i, (g, w) in enumerate(zip(grows, wrows)):
            for a, b in zip(g, w):
                if a == b:
                    continue
                if isinstance(a, float) and isinstance(b, float):
                    if math.isnan(a) and math.isnan(b):
                        continue
                    maxdiff = max(maxdiff, abs(a - b))
                    if bad is None:
                        bad = (i, a, b)
                else:
                    bad = (i, a, b)
                    maxdiff = float("inf")
                    break
            if maxdiff == float("inf"):
                break
        if bad is None:
            print(f"PASS {name} ({len(grows)} rows)")
            n_pass += 1
        else:
            print(f"FAIL {name}: first diff row {bad[0]}: spark={bad[1]!r} oracle={bad[2]!r} maxdiff={maxdiff}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
