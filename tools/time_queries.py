"""Quick per-query timing harness for optimization iteration.

Same discipline as bench.py's headline rows (noop sink, min-of-N,
tracked caches + catalog cache cleared between runs) so numbers are
comparable to the bench, without paying for the full suite.

Usage: python tools/time_queries.py [-n RUNS] name1 name2 ...
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS", "NUMEXPR_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

from financial_big_data_spark.cache import release_tracked  # noqa: E402
from financial_big_data_spark.queries import REGISTRY  # noqa: E402
from financial_big_data_spark.session import build_session  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    runs = 3
    if args and args[0] == "-n":
        runs = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session("time_queries", cpus=cpus, shuffle_partitions=cpus)
    spark.range(1).count()
    for name in args:
        fn, _ = REGISTRY[name]
        # warm once (codegen/classload), untimed
        release_tracked()
        spark.catalog.clearCache()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: WARM FAILED {e}")
            continue
        samples = []
        for _ in range(runs):
            release_tracked()
            spark.catalog.clearCache()
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.time() - t0)
        print(
            f"{name}: min={min(samples):.3f} "
            f"band=[{min(samples):.3f},{max(samples):.3f}] n={runs}",
            flush=True,
        )
    release_tracked()
    spark.stop()


if __name__ == "__main__":
    main()
