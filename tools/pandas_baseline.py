"""Single-node pandas equivalent of the EP2 analytics DAG (BENCH yardstick).

BASELINE.md operationalizes the runtime target as: the Spark EP2 DAG at
sf0.1 within 2x of a timed single-node pandas implementation on the same
hardware. This script IS that pandas implementation: same inputs
(events.parquet as the bar table, series=user_id, close=value), same
formulas (the reference's rolling/percentile/classify/islands semantics),
same outputs as plans.market_analysis.market_analysis_plan.

Prints one JSON line: {"metric": "pandas_ep2_baseline", "value": sec, ...}.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

import numpy as np
import pandas as pd


def ep2_pandas(events: pd.DataFrame) -> dict:
    t = {"volatility": 0.02, "ret": 0.01, "trend": 0.6}
    events = events.sort_values(["user_id", "ts", "event_id"])

    g = events.groupby("user_id", sort=False)["value"]
    hourly = g.pct_change()
    daily = g.pct_change(24)
    vol = (
        hourly.groupby(events["user_id"], sort=False)
        .rolling(24)
        .std()
        .reset_index(level=0, drop=True)
        * np.sqrt(24)
    )
    trend = (
        np.sign(daily)
        .groupby(events["user_id"], sort=False)
        .rolling(24)
        .mean()
        .reset_index(level=0, drop=True)
        .abs()
    )
    bull = (daily > t["ret"]) & (trend > t["trend"])
    bear = (daily < -t["ret"]) & (trend > t["trend"])
    hivol = vol > t["volatility"]
    regime = pd.Series("consolidation", index=events.index)
    regime[bull & ~hivol] = "stable_bull"
    regime[bull & hivol] = "volatile_bull"
    regime[bear & ~hivol] = "stable_bear"
    regime[bear & hivol] = "volatile_bear"
    events = events.assign(regime=regime)

    # distribution
    dist = events["regime"].value_counts()

    # transitions (islands) per user
    prev = events.groupby("user_id", sort=False)["regime"].shift()
    change = (events["regime"] != prev) | prev.isna()
    island = change.groupby(events["user_id"], sort=False).cumsum()
    runs = (
        events.assign(_island=island)
        .groupby(["user_id", "_island", "regime"], sort=False)
        .agg(start_time=("ts", "min"), end_time=("ts", "max"))
        .reset_index()
    )
    runs["to_regime"] = runs.groupby("user_id", sort=False)["regime"].shift(-1)
    transitions = runs[runs["to_regime"].notna()].copy()
    transitions["duration"] = (
        transitions["end_time"] - transitions["start_time"]
    ).dt.total_seconds() / 3600

    tmatrix = (
        transitions.groupby(["regime", "to_regime"]).size().rename("n").reset_index()
    )
    tmatrix["probability"] = tmatrix["n"] / tmatrix.groupby("regime")["n"].transform("sum")
    top5 = tmatrix.nlargest(5, "n")

    # daily buckets
    daily_regime = events.groupby(
        [events["ts"].dt.floor("D"), "regime"]
    ).size()

    # per-user profiles
    ret = events.groupby("user_id", sort=False)["value"].pct_change()
    prof = events.assign(_ret=ret).groupby("user_id").agg(
        n_obs=("value", "size"),
        mean_return=("_ret", "mean"),
        volatility=("_ret", "std"),
        skewness=("_ret", "skew"),
        volume_mean=("value", "mean"),
        price_min=("value", "min"),
        price_max=("value", "max"),
    )
    kurt = events.assign(_ret=ret).groupby("user_id")["_ret"].apply(pd.Series.kurt)

    stats = {
        "n_series": events["user_id"].nunique(),
        "n_rows": len(events),
        "avg_volume": events["value"].mean(),
        "volatility": hourly.std(),
        "n_regimes": events["regime"].nunique(),
    }
    return {
        "dist": dist,
        "transitions": len(transitions),
        "tmatrix": tmatrix,
        "top5": top5,
        "daily": daily_regime,
        "profiles": prof,
        "kurt": kurt,
        "stats": stats,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    # the DAG is scan → windows → classify → aggregates (BASELINE.md), so the
    # parquet read is inside the timed section, as it is for the Spark side
    t0 = time.time()
    events = pd.read_parquet(os.path.join(sf_dir, "events.parquet"))
    out = ep2_pandas(events)
    dt = time.time() - t0
    print(
        json.dumps(
            {
                "metric": "pandas_ep2_baseline",
                "value": round(dt, 3),
                "unit": "sec",
                "sf": float(m.group(1).rstrip(".")) if m else None,
                "n_rows": int(out["stats"]["n_rows"]),
                "n_transitions": int(out["transitions"]),
            }
        )
    )


if __name__ == "__main__":
    main()
