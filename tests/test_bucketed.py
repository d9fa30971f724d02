"""Bucketed co-located join: the plan must contain no Exchange."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from financial_big_data_spark.sources.bucketed import bucketed_join, write_bucketed


@pytest.fixture()
def bucketed_tables(spark):
    ev = spark.range(0, 5000).select(
        (F.col("id") % 200).alias("user_id"),
        F.col("id").alias("event_id"),
        (F.rand(7) * 100).alias("value"),
    )
    dims = spark.range(0, 200).select(
        F.col("id").alias("user_id"),
        F.concat(F.lit("seg_"), (F.col("id") % 5).cast("string")).alias("segment"),
    )
    write_bucketed(ev, "ev_bucketed", "user_id", n_buckets=8, sort_cols=["user_id"])
    write_bucketed(dims, "dim_bucketed", "user_id", n_buckets=8, sort_cols=["user_id"])
    yield "ev_bucketed", "dim_bucketed"
    spark.sql("DROP TABLE IF EXISTS ev_bucketed")
    spark.sql("DROP TABLE IF EXISTS dim_bucketed")


def test_bucketed_join_is_exchange_free(spark, bucketed_tables):
    lt, rt = bucketed_tables
    # disable broadcast so the join would otherwise need a full shuffle —
    # the bucketed layout must make both exchanges unnecessary
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, lt, rt, on="user_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == 5000
        # correctness vs plain join
        ev = spark.table(lt)
        dims = spark.table(rt)
        expected = ev.join(dims, "user_id").count()
        assert joined.count() == expected
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
