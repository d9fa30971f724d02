"""Bit-exact diff of one registry query vs its DuckDB oracle.

Unlike check_correctness.py (repr-equality, -0.0 masked), this compares raw
float BITS (struct.pack) — the closest local approximation to a driver that
hashes values. Prints every differing cell.

Usage: python tools/bitdiff.py <name> [sf_dir]
"""

from __future__ import annotations

import os
import struct
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from financial_big_data_spark.queries import REGISTRY  # noqa: E402
from financial_big_data_spark.session import build_session  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    if isinstance(v, float):
        return ("f", struct.pack(">d", v).hex())
    return (type(v).__name__, str(v))


def main() -> int:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    fn, sql = REGISTRY[name]
    spark = build_session("bitdiff")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    df = fn(spark, sf_dir)
    sp_cols = [c.lower() for c in df.columns]
    rel = con.execute(sql)
    dk_cols = [d[0].lower() for d in rel.description]
    dk_rows = rel.fetchall()
    sp_rows = df.collect()
    order = sorted(range(len(sp_cols)), key=lambda i: sp_cols[i])
    dk_order = sorted(range(len(dk_cols)), key=lambda i: dk_cols[i])
    cols_sorted = sorted(sp_cols)
    sp = sorted(tuple(norm(r[i]) for i in order) for r in sp_rows)
    dk = sorted(tuple(norm(r[i]) for i in dk_order) for r in dk_rows)
    if len(sp) != len(dk):
        print(f"rowcount spark={len(sp)} duck={len(dk)}")
        return 1
    n_bad = 0
    for a, b in zip(sp, dk):
        if a != b:
            n_bad += 1
            if n_bad <= 20:
                for c, x, y in zip(cols_sorted, a, b):
                    marker = "  <-- DIFF" if x != y else ""
                    print(f"  {c}: spark={x} duck={y}{marker}")
                print("  ---")
    print(f"{n_bad} differing rows of {len(sp)}")
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
