"""Fast oracle-parity iteration loop (mirrors tests/test_entry_oracle.py
compare). Usage: python scripts/check_oracles.py [sf_dir] [name ...]"""

from __future__ import annotations

import math
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6f}"
    return str(v)


def rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(normalize_cell(r[i]) for i in order) for r in rows)


def main():
    import __spark_entry__ as entry_mod
    from kahi_spark.session import get_spark

    spark = get_spark(app_name="oracle_check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    names = sys.argv[2:] or sorted(queries)
    failures = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = queries[name](spark, SF_DIR)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception:
            print(f"FAIL {name}: SPARK ERROR")
            traceback.print_exc(limit=4)
            failures += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(srows)} rows) [{time.time()-t0:.1f}s]")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: DUCKDB ERROR {e}")
            failures += 1
            continue
        if sorted(scols) != sorted(dcols):
            print(f"FAIL {name}: cols spark={sorted(scols)} duck={sorted(dcols)}")
            failures += 1
            continue
        if len(srows) != len(drows):
            print(f"FAIL {name}: rowcount spark={len(srows)} duck={len(drows)}")
            failures += 1
            continue
        sset, dset = rowset(scols, srows), rowset(dcols, drows)
        if sset != dset:
            diff_s = [r for r in sset if r not in dset][:3]
            diff_d = [r for r in dset if r not in sset][:3]
            print(f"FAIL {name}: value mismatch ({len(srows)} rows)")
            print("  spark-only:", diff_s)
            print("  duck-only :", diff_d)
            failures += 1
            continue
        print(f"ok   {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")
    print(f"\n{len(names) - failures}/{len(names)} green")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
