#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage:
  sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
  python3 tools/check.py /root/testdata/sf0.01 /tmp/verify_out [query ...]

For each query dumped by graft.Verify, runs the declared oracle SQL in
DuckDB over the same parquet tables, sorts columns by name, sorts rows,
and compares row count / schema / value hash — same scheme the driver
uses for CORRECTNESS_r{N}.json.
"""
import sys, os, json, hashlib
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(val):
    if val is None:
        return "NULL"
    if isinstance(val, float):
        return f"{val:.6g}"
    if isinstance(val, bytes):
        return val.hex()
    return str(val)


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    npass = nfail = nnoor = 0
    for name in names:
        if only and name not in only:
            continue
        tbl = pq.read_table(os.path.join(out_dir, name))
        scols = sorted(tbl.column_names)
        srows = ([tuple(r) for r in zip(*[tbl.column(c).to_pylist()
                                          for c in tbl.column_names])]
                 if tbl.num_rows else [])
        if name not in oracle:
            nnoor += 1
            print(f"{name}: no_oracle ({tbl.num_rows} rows)")
            continue
        try:
            res = con.execute(oracle[name])
            orows = res.fetchall()
            ocols = sorted(d[0] for d in res.description)
        except Exception as e:
            nfail += 1
            print(f"{name}: ORACLE ERROR {e}")
            continue
        ok_rows = len(srows) == len(orows)
        ok_schema = scols == ocols
        sh = table_hash(tbl.column_names, srows)
        oh = table_hash([d[0] for d in res.description], orows)
        ok_hash = sh == oh
        if ok_rows and ok_schema and ok_hash:
            npass += 1
            print(f"{name}: PASS ({len(srows)} rows)")
        else:
            nfail += 1
            print(f"{name}: FAIL rows={len(srows)}/{len(orows)} "
                  f"schema={'ok' if ok_schema else f'{scols} vs {ocols}'} hash={ok_hash}")
    print(f"== {npass} pass, {nfail} fail, {nnoor} no_oracle ==")
    sys.exit(1 if nfail else 0)


if __name__ == "__main__":
    main()
