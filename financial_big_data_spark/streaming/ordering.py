"""Cross-batch in-order ENFORCEMENT for O(1)-state streaming operators
(VERDICT r8 #5).

The stateful operators in streaming/ewm.py and streaming/regime.py carry
O(1) state per series (the last EWM values, the open run, the rolling
close prefix) and document a per-series in-order delivery contract across
micro-batches: an event-time recurrence with constant state has no
history to re-fold a late row into. Before this module the contract was
documented but UNENFORCED — a late row silently corrupted the recurrence
(every EWM value after it, the open run's extent, the labeling prefix).

Enforcement happens where the state lives: each operator compares the
sorted micro-batch's EARLIEST event time against the last event time its
state processed.

- ``on_late="error"`` (default): raise, naming the series and both
  timestamps — the violation surfaces as a stream failure, not bad data.
- ``on_late="drop"``: discard rows older than the state's watermark-of-
  one (the last processed timestamp) and process the rest; equal
  timestamps pass (the stable-sort tiebreak contract already makes their
  relative order explicit).

A watermark-bounded reorder buffer would instead hold rows in state and
emit on watermark advance — that trades O(1) state for O(buffer) and
emission latency; callers who need it should bound disorder at the
source (e.g. a sorted file replay or an upstream watermarked sort).
"""

from __future__ import annotations

import pandas as pd


def validate_on_late(on_late: str) -> None:
    if on_late not in ("error", "drop"):
        raise ValueError("on_late must be 'error' or 'drop'")


def enforce_series_order(
    pdf: pd.DataFrame, time_col: str, last_ts, key, on_late: str
) -> pd.DataFrame:
    """``pdf``: one series' micro-batch rows, ALREADY sorted by event
    time. ``last_ts``: the last event time the series' state processed
    (None for a fresh series). Returns the rows to process."""
    if last_ts is None or len(pdf) == 0:
        return pdf
    first = pdf[time_col].iloc[0]
    if first >= last_ts:
        return pdf
    if on_late == "error":
        raise ValueError(
            f"out-of-order input for series {key!r}: micro-batch contains "
            f"event time {first} older than the last processed {last_ts}; "
            "O(1)-state streaming operators require per-series in-order "
            "delivery across micro-batches — fix the source ordering, or "
            "pass on_late='drop' to discard late rows"
        )
    return pdf[pdf[time_col] >= last_ts].reset_index(drop=True)
