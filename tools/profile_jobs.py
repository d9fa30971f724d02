"""Job-level profile of one registry query: per-Spark-job wall time.

Runs a query once (warm) then once instrumented, and prints every Spark
job the instrumented run scheduled — submission order, duration, task
count and description — straight from the driver's AppStatusStore. This
is the measure-first tool for queries whose cost is a SEQUENCE of small
jobs (iterative loops, AQE query stages) rather than one heavy stage:
the stage/SQL views aggregate those away, the job list does not.

Usage: python tools/profile_jobs.py name [name ...]
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


def _jobs(spark):
    store = spark._jsparkSession.sparkContext().statusStore()
    out = []
    it = store.jobsList(None).iterator()
    while it.hasNext():
        j = it.next()
        sub = j.submissionTime()
        comp = j.completionTime()
        t0 = sub.get().getTime() if sub.isDefined() else None
        t1 = comp.get().getTime() if comp.isDefined() else None
        out.append(
            {
                "id": j.jobId(),
                "t0": t0,
                "t1": t1,
                "dur_ms": (t1 - t0) if (t0 and t1) else None,
                "tasks": j.numTasks(),
                "desc": (j.description().get() if j.description().isDefined() else j.name())[:110],
            }
        )
    return sorted(out, key=lambda d: d["id"])


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session("profile_jobs", cpus=cpus, shuffle_partitions=cpus)
    spark.range(1).count()
    for name in sys.argv[1:]:
        fn, _ = REGISTRY[name]
        # warm (codegen/classload), untimed
        release_tracked()
        spark.catalog.clearCache()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        release_tracked()
        spark.catalog.clearCache()
        before_ids = {j["id"] for j in _jobs(spark)}
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        jobs = [j for j in _jobs(spark) if j["id"] not in before_ids]
        print(f"\n=== {name}: wall={wall:.3f}s, {len(jobs)} jobs ===")
        prev_t1 = None
        total_dur = 0
        total_gap = 0.0
        for j in jobs:
            gap = (j["t0"] - prev_t1) / 1000.0 if (prev_t1 and j["t0"]) else 0.0
            prev_t1 = j["t1"] or prev_t1
            total_dur += (j["dur_ms"] or 0)
            total_gap += max(gap, 0.0)
            print(
                f"  job {j['id']:>4}  {j['dur_ms'] or -1:>6} ms  gap {gap*1000:>6.0f} ms  "
                f"tasks {j['tasks']:>4}  {j['desc']}"
            )
        print(f"  --- sum(job dur)={total_dur/1000:.3f}s  sum(gaps)={total_gap:.3f}s")
    release_tracked()
    spark.stop()


if __name__ == "__main__":
    main()
