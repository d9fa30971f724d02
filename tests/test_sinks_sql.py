"""Sinks (S3/S8/S9), cached-table load (S6), and the Spark SQL surface."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from financial_big_data_spark.sources.tables import load_table, register_views


def test_json_sink_roundtrip(spark, tmp_path, bars_df):
    """S9: JSON sink + re-read preserves rows."""
    out = str(tmp_path / "symbols.json")
    syms = bars_df.select("symbol").distinct()
    syms.write.mode("overwrite").json(out)
    back = spark.read.json(out)
    assert {r.symbol for r in back.collect()} == {r.symbol for r in syms.collect()}


def test_csv_sink_stats(spark, tmp_path, bars_df):
    """S8: text-stats sink as CSV with header."""
    out = str(tmp_path / "stats.csv")
    stats = bars_df.groupBy("symbol").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.avg("close"), 6).alias("avg_close")
    )
    stats.write.mode("overwrite").option("header", True).csv(out)
    back = spark.read.option("header", True).csv(out)
    assert back.count() == 3
    assert set(back.columns) == {"symbol", "n", "avg_close"}


def test_cached_table_load(spark, tmp_path, bars_df):
    """S6: processed-table cache — write once, later loads skip the rebuild."""
    processed = str(tmp_path / "processed")
    if not os.path.exists(processed):
        bars_df.withColumn("ret", F.col("close") / F.lag("close").over(
            __import__("pyspark").sql.Window.partitionBy("symbol").orderBy("ts")
        ) - 1).write.parquet(processed)
    again = spark.read.parquet(processed)
    assert again.count() == bars_df.count()
    assert "ret" in again.columns


def test_sql_surface_over_registered_views(spark):
    """The SQL layer: register_views + spark.sql answering an analytic query."""
    register_views(spark, "/root/testdata/sf0.001", prefix="t1_")
    out = spark.sql(
        """
        SELECT e.event_type, count(*) AS n, round(avg(e.value), 6) AS avg_value
        FROM t1_events e
        WHERE e.user_id IN (SELECT user_id FROM t1_events GROUP BY user_id HAVING count(*) > 10)
        GROUP BY e.event_type
        ORDER BY n DESC
        """
    ).collect()
    assert len(out) == 5
    assert all(r.n > 0 for r in out)


def test_sql_window_over_view(spark):
    register_views(spark, "/root/testdata/sf0.001", prefix="t2_")
    out = spark.sql(
        """
        SELECT user_id, event_id,
               value / nullif(lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 0) - 1 AS ret
        FROM t2_events
        """
    )
    assert out.count() == 1000
    assert out.where("ret IS NOT NULL").count() > 900
