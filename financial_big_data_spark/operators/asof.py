"""Distributed as-of join (the operator Spark's DataFrame API lacks).

Semantics: for each left row, attach the right row with the greatest
``right_time <= left_time`` for the same key (inclusive backward as-of —
DuckDB's ``ASOF JOIN ... ON l.t >= r.t``, pandas ``merge_asof`` default).

Physical strategy — the *union + ordered forward-fill* formulation:

    tag right rows side=0, left rows side=1
    union → one shuffle on key → sort (time, side) within partitions
    last(right_cols, ignorenulls) over unbounded-preceding frame
    keep side=1 rows

This is the scalable shape: ONE exchange of |L|+|R| rows, a streaming
window pass, no time-range blow-up (a naive ``l.t >= r.t`` range join is
O(|L|·|R|) pairs before aggregation). Ties (right_time == left_time) order
the right row first, giving inclusive matches. At equal right_time within a
key the LAST in (time, tiebreak) order wins — pass ``right_tiebreak`` or
pre-deduplicate the right side to make that choice explicit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str | None = None,
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
    right_tiebreak: str | None = None,
) -> DataFrame:
    """Backward inclusive as-of join; returns left + right_cols{suffix}.

    ``right_cols`` defaults to every right column except key/time.
    """
    right_time = right_time or left_time
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (key, right_time)]
    out_cols = {c: f"{c}{suffix}" for c in right_cols}

    l_tagged = left.select(
        "*",
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(v) for c, v in out_cols.items()],
    )
    r_tagged = right.select(
        F.col(key),
        F.col(right_time).alias(left_time),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(v) for c, v in out_cols.items()],
    )
    for c in left.columns:
        if c not in (key, left_time):
            r_tagged = r_tagged.withColumn(c, F.lit(None).cast(left.schema[c].dataType))

    unioned = l_tagged.unionByName(r_tagged)
    order = [F.col(left_time).asc(), F.col("_side").asc()]
    if right_tiebreak is not None:
        # The tiebreak column may have been renamed with the suffix (when it
        # is also carried as a right_col) — resolve against both forms, and
        # fail loudly rather than silently dropping the requested tiebreak.
        if right_tiebreak in out_cols:
            tb = out_cols[right_tiebreak]
        elif right_tiebreak in unioned.columns:
            tb = right_tiebreak
        else:
            raise ValueError(
                f"right_tiebreak {right_tiebreak!r} is neither a right_col "
                f"nor a column of the unioned frame"
            )
        order.append(F.col(tb).asc_nulls_first())
    w = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.select(
        "*",
        *[
            F.last(v, ignorenulls=True).over(w).alias(f"_f_{v}")
            for v in out_cols.values()
        ],
    )
    result = filled.where(F.col("_side") == 1).select(
        *[c for c in left.columns],
        *[F.col(f"_f_{v}").alias(v) for v in out_cols.values()],
    )
    return result
