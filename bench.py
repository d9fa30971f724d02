"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is forced end-to-end with a noop sink (full computation, no
driver-side collect — the result never leaves the executors, matching how a
real cluster job would terminate in a write).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from financial_big_data_spark.queries import REGISTRY  # noqa: E402
from financial_big_data_spark.session import build_session  # noqa: E402

# Headline set: the EP2 analytics DAG pieces + the heaviest relational,
# dedup and similarity operators.
HEADLINE = [
    "pricing_summary",
    "nation_revenue",
    "ev_returns",
    "ev_rolling",
    "ev_coarse_regime",
    "ev_regime_distribution",
    "ev_transitions",
    "ev_user_profile",
    "doc_minhash",
    "doc_near_dup_lsh",
    "doc_simhash",
    "emb_topk",
    "emb_knn_dist",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    spark = build_session("bench", cpus=cpus, shuffle_partitions=cpus)
    # Warm the JVM + parquet footers with a trivial action so the first timed
    # query doesn't pay session startup.
    spark.range(1).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn, _ = REGISTRY[name]
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    # EP2 composite: the reference's full market-analysis DAG in one shot
    from financial_big_data_spark.plans import market_analysis_plan
    from financial_big_data_spark.sources.tables import load_table

    t0 = time.time()
    ev = load_table(spark, sf_dir, "events")
    res = market_analysis_plan(
        ev, series="user_id", time="ts", close="value", volume="value",
        order_tiebreak=["event_id"],
    )
    for df in (
        res.regime_distribution,
        res.transition_matrix,
        res.top_transitions,
        res.daily_regime,
        res.profiles,
        res.period_stats,
    ):
        df.write.format("noop").mode("overwrite").save()
    res.unpersist()
    timings["market_analysis_plan"] = round(time.time() - t0, 3)

    out = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
