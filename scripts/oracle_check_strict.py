#!/usr/bin/env python3
"""Strict (exact) variant of the driver's DuckDB-oracle gate.

Usage: oracle_check_strict.py <sfDir> <verifyOutDir> [name...]

Differences from oracle_check.py: floats are compared EXACTLY (full repr,
bit-identical or bust) and decimals as exact unnormalized strings — this
models the driver's hash_match, which is stricter than the 9-sig-digit local
check. Prints per-query PASS/FAIL plus the first differing cell.
"""
import sys, os, json, glob, decimal, datetime

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        return repr(v)                      # exact shortest round-trip repr
    if isinstance(v, decimal.Decimal):
        return "dec:" + str(v.normalize())  # scale-insensitive but exact value
    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return v.isoformat()
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return json.dumps([norm_cell(x) for x in v])
    if isinstance(v, int):
        return "i:" + str(v)
    return v


def normalize(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: json.dumps(t, default=str))
    return [tuple(sorted(colnames))] + out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):  # Spark-written replica (e.g. /tmp/sf1): dir of parts
            src = f"read_parquet('{p}/*.parquet')"
        elif os.path.exists(p):
            src = f"read_parquet('{p}')"
        else:
            continue
        sel = "*"
        if t == "events":
            # driver testdata carries ts as parquet ns-timestamps; the Spark-
            # written replica carries the raw BIGINT nanos (nanosAsLong read).
            # Mirror the engine's timestamp_micros(ts div 1000) so both shapes
            # present the same TIMESTAMP column to every oracle.
            (ts_type,) = [r[1] for r in con.execute(f"DESCRIBE SELECT ts FROM {src}").fetchall()]
            if ts_type == "BIGINT":
                sel = "* REPLACE (make_timestamp(ts // 1000) AS ts)"
        con.execute(f"CREATE VIEW {t} AS SELECT {sel} FROM {src}")

    failures = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        spark_dir = os.path.join(out_dir, name)
        if not glob.glob(os.path.join(spark_dir, "*.parquet")):
            print(f"MISSING {name}")
            failures += 1
            continue
        tbl = pq.read_table(spark_dir)
        spark_rows = list(zip(*[c.to_pylist() for c in tbl.columns])) if tbl.num_columns else []
        s = normalize(spark_rows, tbl.column_names)
        try:
            res = con.execute(oracle[name])
            duck_rows = res.fetchall()
            d = normalize(duck_rows, [x[0] for x in res.description])
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        if s == d:
            print(f"PASS {name} ({len(d)-1} rows)")
        else:
            failures += 1
            print(f"FAIL {name}: spark {len(s)-1} rows cols {s[0]} | duck {len(d)-1} rows cols {d[0]}")
            shown = 0
            for i in range(1, max(len(s), len(d))):
                sv = s[i] if i < len(s) else "<none>"
                dv = d[i] if i < len(d) else "<none>"
                if sv != dv:
                    print(f"  row {i}:\n    spark: {sv}\n    duck : {dv}")
                    shown += 1
                    if shown >= 3:
                        break

    print(f"== strict: {failures} failed ==")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
