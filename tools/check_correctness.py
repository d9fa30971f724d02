"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs every REGISTRY entry on Spark and its oracle SQL on DuckDB over the same
sf dir, then compares row count, column names, and canonicalized values the
way the driver does: both results converted to pandas, columns sorted by
name, rows sorted, every cell rendered with str() on its pandas-native value.

That per-cell str() render is the contract that bit round 1: it is
DTYPE-SENSITIVE for numbers. A DuckDB integer sum comes back HUGEINT →
pandas float64 → "1148.0", while Spark's bigint renders "1148" — hash
mismatch despite equal values (observed on pred_f1/ev_sessions round 1; fix
is `::BIGINT` in the oracle SQL, never loosening this gate). Likewise -0.0
renders "-0.0" and is NOT masked. Array/list cells raise (unhashable in the
driver's canonicalizer) — queries must project arrays to strings.

Exit code 1 on any mismatch.

Usage: python tools/check_correctness.py [sf_dir] [--vanilla] [name ...]
"""

from __future__ import annotations

import datetime
import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from financial_big_data_spark.queries import REGISTRY  # noqa: E402
from financial_big_data_spark.session import build_session  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _canon(pdf: pd.DataFrame) -> list[tuple]:
    """Driver-style canonical rows: columns sorted by lowercase name, cells
    rendered with str() of the pandas-native value (dtype-sensitive), rows
    sorted. Raises on list/array cells, exactly like the driver."""
    pdf = pdf.copy()
    pdf.columns = [c.lower() for c in pdf.columns]
    pdf = pdf[sorted(pdf.columns)]
    # Timestamps render identically across ns/us units via str(); NaT → "NaT".
    rows = []
    for row in pdf.itertuples(index=False, name=None):
        cells = []
        for v in row:
            if isinstance(v, (list, np.ndarray)):
                raise TypeError("unhashable type: 'list' (array column in result)")
            if v is None:
                cells.append("None")
            elif isinstance(v, float) and np.isnan(v):
                cells.append("nan")
            elif isinstance(v, (pd.Timestamp, datetime.date, datetime.datetime)):
                # The driver equates DATE and midnight TIMESTAMP (both its
                # r01 date queries hashed green across spark-date/duck-ts);
                # render through a common Timestamp form.
                cells.append(str(pd.Timestamp(v)))
            else:
                cells.append(str(v))
        rows.append(tuple(cells))
    rows.sort()
    return rows


def compare(name: str, spark_df, duck_pdf: pd.DataFrame) -> list[str]:
    errs = []
    sp_cols = sorted(c.lower() for c in spark_df.columns)
    dk_cols = sorted(c.lower() for c in duck_pdf.columns)
    if sp_cols != dk_cols:
        errs.append(f"columns: spark={sp_cols} duck={dk_cols}")
        return errs
    sp_pdf = spark_df.toPandas()
    if len(sp_pdf) != len(duck_pdf):
        errs.append(f"rowcount: spark={len(sp_pdf)} duck={len(duck_pdf)}")
    sp_set = _canon(sp_pdf)
    dk_set = _canon(duck_pdf)
    if sp_set != dk_set:
        n_bad = sum(1 for a, b in zip(sp_set, dk_set) if a != b)
        errs.append(f"values: {n_bad} differing rows (of {len(sp_set)})")
        for a, b in zip(sp_set, dk_set):
            if a != b:
                for c, x, y in zip(sp_cols, a, b):
                    if x != y:
                        errs.append(f"  col {c}: spark={x!r} duck={y!r}")
                break
    return errs


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--vanilla"]
    vanilla = "--vanilla" in sys.argv
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    if vanilla:
        # simulate the driver: no engine-tuned confs, hostile non-UTC
        # session timezone (all outputs are TIMESTAMP_NTZ for this reason)
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .config("spark.ui.enabled", "false")
            .config("spark.sql.session.timeZone", "America/New_York")
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
        # Round-12 guard: an oracle entry silently running in a CAPPED
        # dedup regime is exactly how doc_simhash_pairs under-linked at
        # sf0.1 for a round before the close-out gate caught it — drain
        # the truncation signal per query (rows-only entries included)
        # so the regime is visible in the gate output (a truncated CAP
        # on a green row means the oracle happens to tolerate the bias:
        # still a bug to fix).
        def drain_caps() -> None:
            from financial_big_data_spark.operators.dedup import (
                cap_truncation_events,
            )

            for ev in cap_truncation_events(warn=False):
                if ev["truncated"]:
                    print(
                        f"    CAP TRUNCATED: {ev['site']} cap={ev['cap']} "
                        f"overflow_rows={ev['overflow_rows']} hottest="
                        f"{ev['max_bucket_members']} — result is in the "
                        "capped regime, not exact"
                    )

        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            if sql is None:
                n = df.count()
                print(f"  {name:28s} rows-only n={n} [{time.time()-t0:.1f}s]")
                drain_caps()
                continue
            duck_pdf = con.execute(sql).df()
            errs = compare(name, df, duck_pdf)
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
        drain_caps()
    print(f"\n{'FAIL' if failures else 'OK'}: {failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
