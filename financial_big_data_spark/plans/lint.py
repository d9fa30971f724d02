"""Physical-plan scale linter.

``scale_lint(df)`` inspects a DataFrame's (executed) physical plan and
returns the scale anti-patterns the rest of this engine is engineered to
avoid — the checklist a reviewer runs before promoting a query to a
100 TB cluster:

- **partitionless window** — ``Window`` with an empty partition spec
  funnels the whole input through ONE task (the reason
  ``functions.stats.global_running_sum`` exists);
- **cartesian / broadcast-nested-loop join** — O(|L|·|R|) comparisons;
  a theta join that should be re-expressed (e.g. the bucketized
  ``operators.rangejoin.range_join``);
- **single-partition exchange** — ``Exchange SinglePartition`` collapses
  parallelism; legitimate for a final ≤k-row limit, fatal mid-pipeline
  (the linter reports it with surrounding context so the reviewer can
  judge which);
- **row-at-a-time Python UDF** — ``BatchEvalPython`` (the non-Arrow
  path); Arrow-batched pandas UDFs show as ``ArrowEvalPython`` and are
  not flagged.

This is a static TEXT check over Spark's plan rendering — a code-review
aid with the engine's conventions encoded, not a guarantee; plans that
pass can still be slow for data reasons (skew, volume) the text cannot
show.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass
class LintFinding:
    kind: str
    detail: str

    def __str__(self) -> str:  # pragma: no cover - convenience
        return f"[{self.kind}] {self.detail}"


def _plan_text(df: DataFrame, executed: bool = True) -> str:
    qe = df._jdf.queryExecution()
    return (qe.executedPlan() if executed else qe.sparkPlan()).toString()


def scale_lint(df: DataFrame, executed: bool = True) -> list[LintFinding]:
    """Return the scale anti-patterns found in ``df``'s physical plan
    (empty list = clean). ``executed=True`` lints the AQE-final plan when
    the frame has been materialized, else the initial physical plan."""
    text = _plan_text(df, executed)
    findings: list[LintFinding] = []
    for line in text.splitlines():
        s = line.strip()
        # Keyed windows render `Window [exprs], [partspec], [ordering]`
        # (two `], [` separators); the partitionless single-task form
        # OMITS the partition group — `Window [exprs], [ordering]` (one
        # separator) or an explicitly empty `[]` group.
        m = re.match(r"Window\s+(\[.*)", s)
        if m and (
            m.group(1).count("], [") < 2
            or re.search(r"\],\s*\[\s*\],?", m.group(1))
        ):
            findings.append(
                LintFinding(
                    "partitionless-window",
                    f"whole-input single-task window: {s[:160]}",
                )
            )
        if "CartesianProduct" in s:
            findings.append(LintFinding("cartesian-join", s[:160]))
        if "BroadcastNestedLoopJoin" in s:
            findings.append(LintFinding("nested-loop-join", s[:160]))
        if "Exchange SinglePartition" in s:
            findings.append(
                LintFinding(
                    "single-partition-exchange",
                    f"parallelism collapses to 1 here: {s[:160]}",
                )
            )
        if "BatchEvalPython" in s:
            findings.append(
                LintFinding(
                    "row-python-udf",
                    f"non-Arrow row-at-a-time Python: {s[:160]}",
                )
            )
    return findings
