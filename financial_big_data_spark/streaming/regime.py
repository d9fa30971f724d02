"""Structured Streaming variants of the batch regime operators (SURVEY §2.10).

The reference is batch-only; its paginated fetch loop (reference
src/data_processing/data_fetching.py:91-113) is an incremental append source,
so the natural streaming surface declared in SURVEY §2.10 is:

    bar stream → watermark(ts) → tumbling aggregates        (stateless path)
    bar stream → stateful per-series labeler + transitions  (stateful path)

Design constraints Structured Streaming imposes (and how we meet them):

- Arbitrary window functions (lag/row_number) are unsupported on streams →
  the per-series rolling features are computed inside
  ``applyInPandasWithState``: the GroupState carries the last
  ``window_size×2`` closes per series (bounded state, ~KB per series), so
  each micro-batch labels its rows exactly as the batch operator would given
  the same prefix.
- Late data: the stateless path uses an event-time watermark; the stateful
  path requires per-series in-order arrival across micro-batches (sorted
  within each batch) and ENFORCES it (streaming/ordering.py): a row older
  than the state's last processed event time raises or — opt-in
  ``on_late="drop"`` — is discarded, never silently folded into the
  carried prefix. Matches the batch semantics for availableNow/file
  replays, which satisfy the contract by construction.
- State TTL: timeout is configurable; idle series are dropped after
  ``state_ttl_ms`` (processing-time) to bound total state.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.regime import ShortTermThresholds
from .ordering import enforce_series_order, validate_on_late


def streaming_bar_stats(
    stream: DataFrame,
    time: str = "ts",
    series: str = "symbol",
    value: str = "close",
    window: str = "1 day",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stateless path: watermarked tumbling per-series stats (A18 analog)."""
    return (
        stream.withWatermark(time, watermark)
        .groupBy(F.window(F.col(time), window).alias("w"), F.col(series))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg(value).alias("mean_value"),
            F.stddev_samp(value).alias("std_value"),
            F.min(value).alias("min_value"),
            F.max(value).alias("max_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            series,
            "n",
            "mean_value",
            "std_value",
            "min_value",
            "max_value",
        )
    )


def _label_rows(
    closes: pd.Series, window_size: int, t: ShortTermThresholds
) -> pd.Series:
    """Batch-identical 5-way labeling over a (prefix + batch) close series.

    Pure pandas mirror of operators.regime.regime_features +
    detect_regime_5way so streaming output converges to batch output.
    """
    import numpy as np

    hourly = closes.pct_change()
    daily = closes.pct_change(window_size)
    vol = hourly.rolling(window_size).std() * np.sqrt(window_size)
    trend = np.sign(daily).rolling(window_size).mean().abs()
    bull = (daily > t.ret) & (trend > t.trend)
    bear = (daily < -t.ret) & (trend > t.trend)
    hivol = vol > t.volatility
    out = pd.Series("consolidation", index=closes.index)
    out[bull & ~hivol] = "stable_bull"
    out[bull & hivol] = "volatile_bull"
    out[bear & ~hivol] = "stable_bear"
    out[bear & hivol] = "volatile_bear"
    return out


def streaming_label_transitions(
    stream: DataFrame,
    series: str = "symbol",
    time: str = "ts",
    close: str = "close",
    window_size: int = 24,
    thresholds: ShortTermThresholds | None = None,
    state_ttl_ms: int = 24 * 3600 * 1000,
    order_tiebreak: list[str] | None = None,
    on_late: str = "error",
) -> DataFrame:
    """Stateful path: per-series regime labels + transition flags on a stream.

    Emits one row per input bar: (series, ts, close, regime, prev_regime,
    is_transition). GroupState per series: the last ``2×window_size`` closes
    (warm-up prefix) + the last emitted regime — bounded regardless of
    stream length. The cross-batch in-order contract is ENFORCED
    (streaming/ordering.py): a row older than the state's last processed
    event time raises (``on_late="error"``) or is dropped
    (``on_late="drop"``) instead of silently corrupting the close prefix.
    """
    validate_on_late(on_late)
    t = thresholds or ShortTermThresholds()
    order = [time] + (order_tiebreak or [])
    out_schema = T.StructType(
        [
            T.StructField(series, T.StringType()),
            T.StructField(time, T.TimestampType()),
            T.StructField(close, T.DoubleType()),
            T.StructField("regime", T.StringType()),
            T.StructField("prev_regime", T.StringType()),
            T.StructField("is_transition", T.BooleanType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("closes", T.ArrayType(T.DoubleType())),
            T.StructField("last_regime", T.StringType()),
            T.StructField("last_ts", T.TimestampType()),
        ]
    )
    keep = 2 * window_size

    def fn(
        key, pdf_iter: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        # TTL expiry: a timed-out invocation has an empty batch iterator —
        # drop the state instead of re-arming the timeout, or idle series
        # would be resurrected forever and state would grow with churn.
        if state.hasTimedOut:
            state.remove()
            return iter([])
        if state.exists:
            closes_prefix, last_regime, last_ts = state.get
            closes_prefix = list(closes_prefix)
        else:
            closes_prefix, last_regime, last_ts = [], None, None
        # One group can arrive as MULTIPLE Arrow chunks (maxRecordsPerBatch)
        # in no guaranteed order; labeling per chunk while carrying the
        # prefix across chunks would process out-of-order closes.
        # Concatenate the whole group's batch and sort ONCE.
        chunks = list(pdf_iter)
        for pdf in ([pd.concat(chunks, ignore_index=True)] if chunks else []):
            # stable sort + optional tiebreaker: duplicate timestamps must
            # not leave the labeling order (hence the carried close prefix)
            # to Arrow chunk arrival order
            pdf = pdf.sort_values(order, kind="mergesort")
            pdf = enforce_series_order(pdf, time, last_ts, key[0], on_late)
            if pdf.empty:
                continue
            last_ts = pdf[time].iloc[-1]
            full = pd.Series(closes_prefix + pdf[close].astype(float).tolist())
            labels = _label_rows(full, window_size, t).iloc[len(closes_prefix):]
            prev = [last_regime] + labels.tolist()[:-1]
            out = pd.DataFrame(
                {
                    series: pdf[series].astype(str),
                    time: pdf[time].values,
                    close: pdf[close].astype(float).values,
                    "regime": labels.values,
                    "prev_regime": prev,
                    "is_transition": [
                        p is not None and p != r for p, r in zip(prev, labels)
                    ],
                }
            )
            closes_prefix = (closes_prefix + pdf[close].astype(float).tolist())[-keep:]
            last_regime = labels.iloc[-1] if len(labels) else last_regime
            yield out
        state.update((closes_prefix, last_regime, last_ts))
        state.setTimeoutDuration(state_ttl_ms)

    return stream.groupBy(series).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def streaming_regime_transitions(
    stream: DataFrame,
    series: str = "symbol",
    time: str = "ts",
    regime: str = "regime",
    state_ttl_ms: int | None = None,
    order_tiebreak: list[str] | None = None,
    on_late: str = "error",
) -> DataFrame:
    """W12 gaps-and-islands ACROSS micro-batch boundaries (VERDICT r7 #8):
    the streaming continuation of ``operators.transitions.regime_transitions``
    over an already-labeled stream (series, ts, regime).

    State per series is O(1) — the OPEN run only: (regime, start_time,
    end_time, n_rows). Each micro-batch (sorted by event time, same
    in-order contract as streaming/ewm.py) extends or closes it; a row
    whose label differs from the open run's emits the completed run as a
    transition — (from_regime, to_regime, start_time, end_time, duration,
    duration_days, is_volatility_increase, is_trend_change), the exact
    batch columns with the exact arithmetic (integer-microsecond diff /
    3.6e9, the same operand order as ``_duration_hours``) — so ANY
    micro-batch split of the same in-order input yields byte-identical
    rows to the batch operator on the concatenation. The batch operator
    drops the final (still-open) run for the same reason this one keeps
    it in state: its successor hasn't arrived.

    Composition note: labeling and run-tracking are BOTH stateful; chain
    them across two streaming queries (label → sink → this) rather than
    stacking two applyInPandasWithState operators in one query.

    The in-order contract is ENFORCED (streaming/ordering.py) against the
    open run's end time — the last event the state absorbed: a late row
    raises naming the series/timestamps (``on_late="error"``) or is
    dropped (``on_late="drop"``) instead of silently extending a run it
    precedes."""
    validate_on_late(on_late)
    t_cols = [time] + (order_tiebreak or [])
    out_schema = T.StructType(
        [
            T.StructField(series, T.StringType()),
            T.StructField("from_regime", T.StringType()),
            T.StructField("to_regime", T.StringType()),
            T.StructField("start_time", T.TimestampType()),
            T.StructField("end_time", T.TimestampType()),
            T.StructField("duration", T.DoubleType()),
            T.StructField("duration_days", T.DoubleType()),
            T.StructField("is_volatility_increase", T.BooleanType()),
            T.StructField("is_trend_change", T.BooleanType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("run_regime", T.StringType()),
            T.StructField("run_start", T.TimestampType()),
            T.StructField("run_end", T.TimestampType()),
            T.StructField("run_n", T.LongType()),
        ]
    )

    def fn(
        key, pdf_iter: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        chunks = list(pdf_iter)
        if not chunks:
            return
        # one group = many unordered Arrow chunks: concat + ONE stable sort
        pdf = (
            pd.concat(chunks, ignore_index=True)
            .sort_values(t_cols, kind="mergesort")
            .reset_index(drop=True)
        )
        if state.exists:
            cur_reg, cur_start, cur_end, cur_n = state.get
        else:
            cur_reg, cur_start, cur_end, cur_n = None, None, None, 0
        # the open run's end IS the last event time the state absorbed
        pdf = enforce_series_order(pdf, time, cur_end, key[0], on_late)
        if pdf.empty:
            return
        out = []
        skey = key[0]
        for ts_, reg in zip(pdf[time], pdf[regime]):
            if cur_reg is None:
                cur_reg, cur_start, cur_end, cur_n = reg, ts_, ts_, 1
            elif reg == cur_reg:
                cur_end, cur_n = ts_, cur_n + 1
            else:
                # exact batch arithmetic: integer-µs diff / 3.6e9
                us = (pd.Timestamp(cur_end).value - pd.Timestamp(cur_start).value) // 1000
                duration = us / 3_600_000_000.0
                vol_up = ("volatile" not in cur_reg) and ("volatile" in reg)
                trend = ("bull" in cur_reg and "bear" in reg) or (
                    "bear" in cur_reg and "bull" in reg
                )
                out.append(
                    (
                        skey, cur_reg, reg, cur_start, cur_end,
                        duration, duration / 24.0, vol_up, trend,
                    )
                )
                cur_reg, cur_start, cur_end, cur_n = reg, ts_, ts_, 1
        state.update((cur_reg, cur_start, cur_end, int(cur_n)))
        if state_ttl_ms is not None:
            state.setTimeoutDuration(state_ttl_ms)
        if out:
            yield pd.DataFrame(out, columns=[f.name for f in out_schema.fields])

    return stream.groupBy(series).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if state_ttl_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )
