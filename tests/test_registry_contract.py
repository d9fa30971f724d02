"""Driver-contract safety net: every registry query must execute.

Runs each REGISTRY entry at sf0.001 on the shared test session and asserts
it produces a result with a non-empty schema — the pytest-side guard that
no query regresses into an exception (ANSI division, missing column,
unresolvable plan) between oracle-gate runs. Value correctness is the
oracle gate's job (tools/check_correctness.py); this pins executability.
"""

from __future__ import annotations

import pytest

from financial_big_data_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", list(REGISTRY))
def test_registry_query_executes(spark, name):
    fn, sql = REGISTRY[name]
    df = fn(spark, SF)
    assert len(df.columns) > 0
    n = df.count()
    assert n >= 0
    if sql is not None:
        # oracle SQL must at least be non-trivial text mentioning a table
        assert "SELECT" in sql.upper()


def test_registry_ordering_contract():
    """All oracle-backed entries must sit within the driver's 50-entry
    evaluation window; rows-only entries after."""
    entries = list(REGISTRY.items())
    sql_positions = [i for i, (_, (f, s)) in enumerate(entries) if s is not None]
    assert len(sql_positions) == 50
    assert max(sql_positions) <= 49
