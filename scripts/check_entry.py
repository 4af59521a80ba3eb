"""Emulate the driver's verify: run entry() + every queries() entry at
sf0.01 and compare against oracle_sql() via DuckDB (row count, column
names, order-insensitive values)."""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from crego_document_extractor_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = sys.argv[2] if len(sys.argv) > 2 else None

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    if isinstance(v, bool):
        return bool(v)
    return v


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm(r[i]) for i in order) for r in rows)


def main():
    spark = get_spark(master="local[8]")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    print("== entry ==")
    edf = entrymod.entry(spark)
    rows = edf.collect()
    print(f"entry: {len(rows)} rows, schema: {edf.columns}")
    assert len(rows) > 0

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if ONLY and ONLY not in name:
            continue
        df = fn(spark, SF_DIR)
        got_cols = [c.lower() for c in df.columns]
        got = [tuple(r) for r in df.collect()]
        if name not in oracles:
            print(f"{name}: rows-only check, {len(got)} rows")
            continue
        res = con.sql(oracles[name])
        exp_cols = [c.lower() for c in res.columns]
        exp = res.fetchall()
        ok_cols = sorted(got_cols) == sorted(exp_cols)
        ok_rows = len(got) == len(exp)
        ok_vals = ok_cols and ok_rows and canon(got, got_cols) == canon(exp, exp_cols)
        if ok_vals:
            n_pass += 1
            print(f"{name}: OK ({len(got)} rows)")
        else:
            n_fail += 1
            print(f"{name}: FAIL cols={ok_cols} rows={ok_rows}({len(got)} vs {len(exp)})")
            if ok_cols and ok_rows:
                g, e = canon(got, got_cols), canon(exp, exp_cols)
                for a, b in zip(g, e):
                    if a != b:
                        print("   got:", a)
                        print("   exp:", b)
                        break
            else:
                print("   got cols:", got_cols)
                print("   exp cols:", exp_cols)
    print(f"== {n_pass} pass, {n_fail} fail ==")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
