#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: oracle_check.py <sfDir> <verifyOutDir>

For each query name in <verifyOutDir>/oracle_sql.json:
  - load the Spark result parquet at <verifyOutDir>/<name>/
  - run the oracle SQL in DuckDB with each table registered as a view over
    <sfDir>/<table>.parquet
  - sort columns by name, sort rows, compare values (floats to 1e-9 rel).
Prints PASS/FAIL per query and a summary; exit 1 on any FAIL.
"""
import sys, os, json, glob, math, decimal, datetime

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = float(f"{v:.9g}")
            if isinstance(v, decimal.Decimal):
                v = str(v.normalize())
            if isinstance(v, datetime.datetime):
                if v.tzinfo is not None:
                    v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
                v = v.isoformat()
            elif hasattr(v, "isoformat"):
                v = v.isoformat()
            if isinstance(v, bytes):
                v = v.hex()
            if isinstance(v, list):
                v = json.dumps(v, default=str)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: json.dumps(t, default=str))
    return [sorted(colnames)] + out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    failures = 0
    checked = 0
    for name in sorted(oracle):
        spark_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(spark_dir, "*.parquet"))
        if not files:
            print(f"MISSING {name}: no spark output at {spark_dir}")
            failures += 1
            continue
        try:
            tbl = pq.read_table(spark_dir)
            spark_rows = [tuple(r) for r in zip(*[c.to_pylist() for c in tbl.columns])] if tbl.num_columns else []
            if tbl.num_rows and not spark_rows:
                spark_rows = []
            spark_norm = normalize(spark_rows, tbl.column_names)
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}")
            failures += 1
            continue
        try:
            res = con.execute(oracle[name])
            duck_rows = res.fetchall()
            duck_cols = [d[0] for d in res.description]
            duck_norm = normalize(duck_rows, duck_cols)
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        checked += 1
        if spark_norm == duck_norm:
            print(f"PASS {name} ({len(duck_norm)-1} rows)")
        else:
            failures += 1
            print(f"FAIL {name}: spark cols {spark_norm[0]} rows {len(spark_norm)-1} "
                  f"vs duck cols {duck_norm[0]} rows {len(duck_norm)-1}")
            for i in range(1, min(len(spark_norm), len(duck_norm), 6)):
                if i >= len(spark_norm) or i >= len(duck_norm) or spark_norm[i] != duck_norm[i]:
                    print(f"  first diff row {i}:")
                    print(f"    spark: {spark_norm[i] if i < len(spark_norm) else '<none>'}")
                    print(f"    duck : {duck_norm[i] if i < len(duck_norm) else '<none>'}")
                    break

    print(f"== {checked - failures + (len(oracle) - checked) * 0}/{len(oracle)} matched, {failures} failed ==")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
