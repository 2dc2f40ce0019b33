#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage:
  python3 scripts/check_oracle.py [sfdir] [outdir]

Assumes `sbt "runMain graft.Verify <sfdir> <outdir>"` has already produced
<outdir>/<query>/ parquet dirs + <outdir>/oracle_sql.json. Registers every
testdata parquet as a DuckDB view, runs each oracle SQL, and compares with
the Spark result the way the round-1 driver artifact shows the real gate
does: both sides surface through pandas (Spark via pd.read_parquet, DuckDB
via .df()), columns are sorted by name, rows sorted by stringified values,
and each cell compared by str(). This is TYPE-SENSITIVE in exactly the ways
the driver is: a DuckDB DECIMAL becomes float64 ('6105.7') while a Spark
parquet decimal stays Decimal ('6105.70') → mismatch; a DuckDB
HUGEINT-sum becomes float64 ('123.0') vs Spark int64 ('123') → mismatch.
The fix belongs in the queries (cast final decimals to DOUBLE on both
sides), not here.
"""
import sys, os, json, glob, math, time
import duckdb
import pandas as pd

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm_cell(v):
    # pandas cells: None/NaN/NaT → NULL; everything else by str(), which
    # mirrors a stringify-then-hash gate (float64 repr, Decimal with
    # scale, Timestamp at its native precision).
    if v is None:
        return "NULL"
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    try:
        if pd.isna(v):
            return "NULL"
    except (TypeError, ValueError):
        pass
    return str(v)

def frame_rows(df):
    cols = sorted(df.columns)
    rows = [tuple(norm_cell(v) for v in t)
            for t in df[cols].itertuples(index=False, name=None)]
    return cols, sorted(rows)

def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_pass = n_fail = 0
    timings = []  # (duckdb_sec, name) — the gate's own replay cost
    for name in sorted(oracle):
        sql = oracle[name]
        spark_dir = os.path.join(outdir, name)
        if not glob.glob(spark_dir + "/*.parquet"):
            print(f"FAIL {name}: no spark output at {spark_dir}")
            n_fail += 1
            continue
        try:
            sdf = pd.read_parquet(spark_dir)
            t0 = time.monotonic()
            ddf = con.execute(sql).df()
            timings.append((time.monotonic() - t0, name))
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        sn, sr = frame_rows(sdf)
        dn, dr = frame_rows(ddf)
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
    # Oracle-cost watchdog: the gate runs under the driver's clock, and a
    # single shared/chained CTE left un-MATERIALIZED can re-create a
    # t59-style exponential replay (295 s -> 64 s history, CLAUDE.md rule
    # 22). The slowest-10 table makes any such regression visible the run
    # it lands instead of when the gate times out.
    timings.sort(reverse=True)
    total_oracle = sum(t for t, _ in timings)
    print(f"\n[oracle-cost] total DuckDB replay {total_oracle:.1f}s; slowest 10:")
    for t, name in timings[:10]:
        print(f"[oracle-cost]   {t:6.2f}s  {name}")
    print(f"\n{n_pass} passed, {n_fail} failed, "
          f"{len(oracle)} oracled queries")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
