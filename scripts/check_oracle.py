#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage:
  python3 scripts/check_oracle.py [sfdir] [outdir]

Assumes `sbt "runMain graft.Verify <sfdir> <outdir>"` has already produced
<outdir>/<query>/ parquet dirs + <outdir>/oracle_sql.json. Registers every
testdata parquet as a DuckDB view, runs each oracle SQL, and compares with
the Spark result: columns sorted by name, rows sorted by all columns,
exact value equality (floats compared bitwise via repr unless close).
"""
import sys, os, json, glob, math
import duckdb
import pyarrow.parquet as pq

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bool):
        return str(v)
    return str(v)

def normalize(names, rows):
    order = sorted(range(len(names)), key=lambda i: names[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return [names[i] for i in order], sorted(out)

def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        spark_dir = os.path.join(outdir, name)
        if not glob.glob(spark_dir + "/*.parquet"):
            print(f"FAIL {name}: no spark output at {spark_dir}")
            n_fail += 1
            continue
        try:
            tbl = pq.read_table(spark_dir)
            s_names = tbl.column_names
            s_rows = [tuple(r[c] for c in s_names) for r in tbl.to_pylist()]
            res = con.execute(sql)
            d_names = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        sn, sr = normalize(s_names, s_rows)
        dn, dr = normalize(d_names, d_rows)
        if sn != dn:
            print(f"FAIL {name}: columns spark={sn} duckdb={dn}")
            n_fail += 1
        elif len(sr) != len(dr):
            print(f"FAIL {name}: rowcount spark={len(sr)} duckdb={len(dr)}")
            n_fail += 1
        elif sr != dr:
            diffs = [(a, b) for a, b in zip(sr, dr) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {diffs}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(sr)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed, "
          f"{len(oracle)} oracled queries")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
