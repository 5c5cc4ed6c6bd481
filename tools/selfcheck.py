"""Local replica of the driver's correctness gate.

Runs each __spark_entry__.queries()[name] on Spark and the matching
oracle_sql()[name] on DuckDB against the same parquet tables, then compares
row count, schema (sorted column names), and an order-insensitive value
digest. Used to iterate before the driver does it for real.

Usage: python tools/selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # driver-ish float normalization: round to 6 significant-ish decimals
        return f"{v:.6f}".rstrip("0").rstrip(".")
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def digest(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm_value(r[i]) for i in order) for r in rows)
    import hashlib

    h = hashlib.md5()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest(), lines


def main():
    import duckdb

    import __spark_entry__ as entry
    from dice_spark.session import get_spark

    spark = get_spark("selfcheck", master="local[8]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    queries = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if ONLY and name not in ONLY:
            continue
        if name not in oracles:
            df = fn(spark, SF_DIR)
            print(f"[rows-only] {name}: {df.count()} rows")
            continue
        sdf = fn(spark, SF_DIR)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        res = con.sql(oracles[name])
        dcols = res.columns
        drows = res.fetchall()
        ok = True
        if sorted(c.lower() for c in scols) != sorted(c.lower() for c in dcols):
            print(f"[FAIL schema] {name}: spark={sorted(scols)} duck={sorted(dcols)}")
            ok = False
        if len(srows) != len(drows):
            print(f"[FAIL rows] {name}: spark={len(srows)} duck={len(drows)}")
            ok = False
        if ok:
            sh, sl = digest(srows, [c.lower() for c in scols])
            dh, dl = digest(drows, [c.lower() for c in dcols])
            if sh != dh:
                print(f"[FAIL hash] {name} ({len(srows)} rows)")
                diff = [(a, b) for a, b in zip(sl, dl) if a != b][:5]
                for a, b in diff:
                    print(f"   spark: {a}\n   duck : {b}")
                ok = False
        if ok:
            print(f"[OK] {name}: {len(srows)} rows")
        else:
            failures.append(name)
    print("FAILURES:", failures if failures else "none")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
