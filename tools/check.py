#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs after `graft.Verify <sfDir> <outDir>`: for each query result parquet
under outDir, executes the matching oracle SQL from oracle_sql.json in
DuckDB against the sfDir parquet tables, then compares row count, column
names, and exact values (strictest plausible interpretation of the
driver's hash compare: columns sorted by name, rows in result order,
exact equality; floats reported with ulp-level diffs when mismatched).
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        return ("f", repr(v))
    return (type(v).__name__, repr(v))


def main(sf_dir, out_dir):
    out = Path(out_dir)
    oracle = json.loads((out / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    n_pass = n_fail = 0
    for name in sorted(oracle):
        rdir = out / name
        if not rdir.exists():
            print(f"FAIL {name}: no spark result dir")
            n_fail += 1
            continue
        try:
            spark_rel = con.sql(
                f"SELECT * FROM read_parquet('{rdir}/*.parquet')")
            spark_cols = sorted(spark_rel.columns)
            spark_rows = spark_rel.select(
                ", ".join(f'"{c}"' for c in spark_cols)).fetchall()
            duck_rel = con.sql(oracle[name])
            duck_cols = sorted(duck_rel.columns)
            duck_rows = duck_rel.select(
                ", ".join(f'"{c}"' for c in duck_cols)).fetchall()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        if spark_cols != duck_cols:
            print(f"FAIL {name}: cols spark={spark_cols} duck={duck_cols}")
            n_fail += 1
            continue
        if len(spark_rows) != len(duck_rows):
            print(f"FAIL {name}: rowcount spark={len(spark_rows)} duck={len(duck_rows)}")
            n_fail += 1
            continue
        bad = None
        for i, (a, b) in enumerate(zip(spark_rows, duck_rows)):
            ca = tuple(canon(x) for x in a)
            cb = tuple(canon(x) for x in b)
            if ca != cb:
                bad = (i, a, b)
                break
        if bad:
            i, a, b = bad
            print(f"FAIL {name}: row {i} differs\n  spark={a}\n  duck ={b}")
            for x, y in zip(a, b):
                if isinstance(x, float) and isinstance(y, float) and x != y:
                    print(f"    float diff: {x!r} vs {y!r} (delta={x - y:.3e})")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_rows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
