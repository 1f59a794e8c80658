#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: runs each oracle SQL in
DuckDB over the sf parquet tables and compares against the Spark result
parquet dumped by graft.Verify. Columns sorted by name, rows sorted, exact
value equality (the strictest plausible driver hash)."""
import sys, json, glob
import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    try:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); fails += 1; continue
        spark_df = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        duck_df = con.sql(sql).df()
        # normalize like the driver: columns by name, then row-sort
        sc = spark_df[sorted(spark_df.columns)]
        dc = duck_df[sorted(duck_df.columns)]
        if list(sc.columns) != list(dc.columns):
            print(f"FAIL {name}: columns {list(sc.columns)} vs {list(dc.columns)}")
            fails += 1; continue
        if len(sc) != len(dc):
            print(f"FAIL {name}: rows {len(sc)} vs {len(dc)}"); fails += 1; continue
        sc = sc.sort_values(by=list(sc.columns), ignore_index=True)
        dc = dc.sort_values(by=list(dc.columns), ignore_index=True)
        mismatch = None
        for c in sc.columns:
            a, b = sc[c], dc[c]
            # the driver's hash is dtype-sensitive (r3: q81 int64 vs float64
            # hash-diverged on bit-identical values) — do NOT coerce, fail.
            if a.dtype != b.dtype:
                mismatch = f"dtype[{c}]: spark {a.dtype} vs oracle {b.dtype}"; break
            neq = ~((a == b) | (a.isna() & b.isna()))
            if neq.any():
                i = neq.idxmax()
                mismatch = f"value[{c}] row {i}: {a[i]!r} vs {b[i]!r} ({neq.sum()} diffs)"
                break
        if mismatch:
            print(f"FAIL {name}: {mismatch}"); fails += 1
        else:
            print(f"OK   {name}: {len(sc)} rows")
    except Exception as e:
        print(f"FAIL {name}: exception {str(e)[:300]}"); fails += 1
print(f"{'ALL OK' if fails == 0 else str(fails) + ' FAILURES'} / {len(oracle)} queries")
sys.exit(1 if fails else 0)
