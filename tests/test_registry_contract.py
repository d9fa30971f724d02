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
    """The driver's 50-entry evaluation window must be FULLY used: the
    first 50 registry entries all carry oracle SQL. Entries past the
    window may be rows-only or oracle-backed — the local gate
    (tools/check_correctness.py) hash-verifies any oracle SQL regardless
    of position, so extra oracles past 50 strengthen coverage rather than
    displace a driver-checked row."""
    entries = list(REGISTRY.items())
    assert len(entries) >= 50
    assert all(s is not None for _, (_f, s) in entries[:50])


def test_driver_window_carries_showcase_and_is_fully_oracle_backed():
    """Round-11 rotation (VERDICT r10 #5): the first 50 registry entries —
    the driver's hash window — must all be oracle-backed and keep the
    showcase families in view; a future edit that silently pushes them
    past the boundary would downgrade CORRECTNESS_r{N} evidence."""
    from financial_big_data_spark.queries import REGISTRY

    window = list(REGISTRY)[:50]
    assert len(set(window)) == 50
    missing_oracle = [n for n in window if REGISTRY[n][1] is None]
    assert not missing_oracle, f"windowed entries without oracle: {missing_oracle}"
    showcase = {
        "ev_incremental_agg", "ev_incremental_minmax", "ev_incremental_mixed",
        "ev_incremental_distinct_dml", "doc_simhash_pairs", "doc_dup_clusters",
        "doc_span_dedup", "emb_semdedup", "ev_pagerank", "doc_curation",
    }
    assert showcase <= set(window), sorted(showcase - set(window))
