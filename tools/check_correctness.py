"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs every REGISTRY entry on Spark and its oracle SQL on DuckDB over the same
sf dir, then compares row count, column names, and an order-insensitive value
comparison (rows sorted, NaN==NaN, floats exact after both engines' own
rounding). Exit code 1 on any mismatch.

Usage: python tools/check_correctness.py [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from financial_big_data_spark.queries import REGISTRY  # noqa: E402
from financial_big_data_spark.session import build_session  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    if v is None:
        return ("null",)
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        if v == 0.0:
            v = 0.0  # -0.0 → 0.0
        return ("f", repr(v))
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    return ("s", str(v))


def compare(name: str, spark_df, duck_rows, duck_cols) -> list[str]:
    errs = []
    sp_cols = [c.lower() for c in spark_df.columns]
    dk_cols = [c.lower() for c in duck_cols]
    if sorted(sp_cols) != sorted(dk_cols):
        errs.append(f"columns: spark={sorted(sp_cols)} duck={sorted(dk_cols)}")
        return errs
    sp_rows = spark_df.collect()
    if len(sp_rows) != len(duck_rows):
        errs.append(f"rowcount: spark={len(sp_rows)} duck={len(duck_rows)}")
    order = sorted(range(len(sp_cols)), key=lambda i: sp_cols[i])
    dk_order = sorted(range(len(dk_cols)), key=lambda i: dk_cols[i])
    sp_set = sorted(tuple(_norm(r[i]) for i in order) for r in sp_rows)
    dk_set = sorted(tuple(_norm(r[i]) for i in dk_order) for r in duck_rows)
    if sp_set != dk_set:
        n_bad = sum(1 for a, b in zip(sp_set, dk_set) if a != b)
        errs.append(f"values: {n_bad} differing rows (of {len(sp_set)})")
        for a, b in list(zip(sp_set, dk_set))[:2000]:
            if a != b:
                errs.append(f"  spark={a}")
                errs.append(f"  duck ={b}")
                break
    return errs


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--vanilla"]
    vanilla = "--vanilla" in sys.argv
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    if vanilla:
        # simulate the driver: no engine-tuned confs at all
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
    else:
        spark = build_session("check_correctness")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    failures = 0
    for name, (fn, sql) in REGISTRY.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            if sql is None:
                n = df.count()
                print(f"  {name:28s} rows-only n={n} [{time.time()-t0:.1f}s]")
                continue
            rel = con.execute(sql)
            duck_cols = [d[0] for d in rel.description]
            duck_rows = rel.fetchall()
            errs = compare(name, df, duck_rows, duck_cols)
        except Exception as e:  # noqa: BLE001
            errs = [f"EXCEPTION: {type(e).__name__}: {str(e)[:500]}"]
        dt = time.time() - t0
        if errs:
            failures += 1
            print(f"✗ {name:28s} [{dt:.1f}s]")
            for e in errs:
                print(f"    {e}")
        else:
            print(f"✓ {name:28s} [{dt:.1f}s]")
    print(f"\n{'FAIL' if failures else 'OK'}: {failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
