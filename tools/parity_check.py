#!/usr/bin/env python3
"""Local oracle-parity harness mimicking the driver's DuckDB compare.

Usage: python3 tools/parity_check.py <sf_dir> <verify_out_dir> [only...]

`only` args (optional) restrict the compare to the named queries —
fast iteration on one oracle without re-running the heavy ANN chains.

For each <verify_out_dir>/<name> parquet dir (written by graft.Verify):
  - run oracle_sql.json[name] in DuckDB with views over <sf_dir>/*.parquet
  - sort columns by name, compare row counts, schemas (loosely) and values
    (floats to 1e-9 after both engines' own rounding).
Dev-only tool; the real gate is driver-side.
"""
import sys, os, json, math
import duckdb
import pyarrow.parquet as pq
import pyarrow as pa

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    return v

def main(sf_dir, out_dir, only=()):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:
        oracle = {k: v for k, v in oracle.items() if k in only}
    n_pass = n_fail = 0
    for name in sorted(oracle):
        qdir = f"{out_dir}/{name}"
        if not os.path.isdir(qdir):
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            spark_tbl = pq.read_table(qdir)
        except Exception as e:
            print(f"FAIL {name}: unreadable spark output: {e}")
            n_fail += 1
            continue
        try:
            duck = con.sql(oracle[name]).arrow()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:200]}")
            n_fail += 1
            continue
        scols, dcols = sorted(spark_tbl.column_names), sorted(duck.column_names)
        if scols != dcols:
            print(f"FAIL {name}: columns {scols} vs {dcols}")
            n_fail += 1
            continue
        srows = [[norm(spark_tbl.column(c)[i].as_py()) for c in scols]
                 for i in range(spark_tbl.num_rows)]
        drows = [[norm(duck.column(c)[i].as_py()) for c in dcols]
                 for i in range(duck.num_rows)]
        if len(srows) != len(drows):
            print(f"FAIL {name}: rows {len(srows)} vs {len(drows)}")
            n_fail += 1
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(srows, drows)) if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(srows)} rows differ; "
                  f"first at {i}:\n  spark={a}\n  duck ={b}\n  cols={scols}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], tuple(sys.argv[3:])))
