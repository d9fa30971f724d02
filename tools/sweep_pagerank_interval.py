"""Sweep pagerank checkpoint_interval on the sf0.1 co-occurrence graph.

Measures the FULL query (edge build + loop, noop-equivalent via count of
the final state) min-of-2 per interval, for the fixed and tol modes and
for PPR. Usage: python tools/sweep_pagerank_interval.py [intervals...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS", "NUMEXPR_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

from pyspark.sql import functions as F  # noqa: E402

from financial_big_data_spark.cache import release_tracked, tracked_persist  # noqa: E402
from financial_big_data_spark.ml.graph import cooccurrence_pairs, pagerank  # noqa: E402
from financial_big_data_spark.queries import _events  # noqa: E402
from financial_big_data_spark.session import build_session  # noqa: E402


def main() -> None:
    intervals = [int(a) for a in sys.argv[1:]] or [2, 5, 10]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session("sweep_pr", cpus=cpus, shuffle_partitions=cpus)
    spark.range(1).count()

    def run(reset_small: bool, tol, interval: int) -> float:
        release_tracked()
        spark.catalog.clearCache()
        t0 = time.time()
        ev = _events(spark, sf_dir)
        pairs = tracked_persist(cooccurrence_pairs(
            ev.select("user_id", "event_type",
                      F.date_trunc("hour", F.col("ts")).alias("hr")),
            node="user_id", keys=["event_type", "hr"], min_shared=3,
        ))
        edges = pairs.unionByName(
            pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        kw = {}
        if reset_small:
            kw["reset"] = (
                edges.select(F.col("src").alias("node"))
                .where(F.col("node") < 50).distinct()
            )
        pr = pagerank(edges, n_iter=10, damping=0.85, tol=tol,
                      checkpoint_interval=interval, **kw)
        pr.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    # warm
    run(False, None, 2)
    for mode, (reset_small, tol) in {
        "pagerank": (False, None),
        "pagerank_tol": (False, 1e-6),
        "ppr": (True, None),
        "ppr_tol": (True, 1e-6),
    }.items():
        for k in intervals:
            samples = [run(reset_small, tol, k) for _ in range(2)]
            print(f"{mode} interval={k}: min={min(samples):.3f} "
                  f"band=[{min(samples):.3f},{max(samples):.3f}]", flush=True)
    release_tracked()
    spark.stop()


if __name__ == "__main__":
    main()
