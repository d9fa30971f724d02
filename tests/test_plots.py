"""S7 HTML plot sink: structure, value mapping, bounded-input contract,
palette discipline (fixed-order categorical, one-hue sequential, legend
iff >= 2 series, table view always present)."""

from __future__ import annotations

import os
import re

import pytest
from pyspark.sql import functions as F

from financial_big_data_spark.sources.plots import (
    PlotInputTooLarge,
    _SERIES,
    write_bar_chart,
    write_heatmap,
    write_line_plot,
    write_market_report,
)


def _read(path):
    with open(path) as f:
        return f.read()


def test_line_plot_series_legend_and_table(spark, tmp_path):
    df = spark.createDataFrame(
        [(float(i), float(i * 2), float(10 - i)) for i in range(10)],
        "x double, a double, b double",
    )
    p = str(tmp_path / "line.html")
    write_line_plot(df, p, x="x", ys=["a", "b"], title="two series")
    html = _read(p)
    assert "<svg" in html and "polyline" in html
    # one polyline per series, colored from the FIXED palette order
    assert html.count("<polyline") == 2
    assert _SERIES[0] in html and _SERIES[1] in html
    assert _SERIES[2] not in html  # never cycled / skipped
    # legend present (>= 2 series) and a data table exists
    assert "two series" in html
    assert "<details><summary>data table</summary>" in html
    assert html.count("<tr>") >= 10


def test_line_plot_single_series_no_legend(spark, tmp_path):
    df = spark.createDataFrame(
        [(float(i), float(i)) for i in range(5)], "x double, a double"
    )
    p = str(tmp_path / "one.html")
    write_line_plot(df, p, x="x", ys="a", title="one")
    html = _read(p)
    # single series: title names it; no legend swatch rect
    assert '<rect x="64" y="26"' not in html


def test_line_plot_caps_series_at_palette(spark, tmp_path):
    cols = ", ".join(f"c{i} double" for i in range(9))
    df = spark.createDataFrame([tuple(float(i) for i in range(10))], "x double, " + cols)
    with pytest.raises(ValueError, match="palette"):
        write_line_plot(df, str(tmp_path / "x.html"), x="x", ys=[f"c{i}" for i in range(9)])


def test_bar_chart_values_and_labels(spark, tmp_path):
    df = spark.createDataFrame(
        [("bull", 10), ("bear", 4), ("flat", 6)], "regime string, n long"
    )
    p = str(tmp_path / "bar.html")
    write_bar_chart(df, p, x="regime", y="n", title="dist")
    html = _read(p)
    assert html.count("<path d=") == 3
    for lbl in ("bull", "bear", "flat"):
        assert lbl in html
    # single-series bars use slot 1 only
    assert _SERIES[0] in html and _SERIES[1] not in html
    # tooltips carry the values
    assert "<title>bull: 10</title>" in html


def test_heatmap_sequential_and_tooltips(spark, tmp_path):
    rows = [(a, b, float(a * 3 + b)) for a in range(3) for b in range(3)]
    df = spark.createDataFrame(rows, "r int, c int, v double")
    p = str(tmp_path / "heat.html")
    write_heatmap(df, p, row="r", col="c", value="v", title="matrix")
    html = _read(p)
    assert html.count("<rect") == 9
    # one-hue ramp: min cell is the light endpoint, max the dark one
    assert "#deebf9" in html and "#113a6d" in html
    assert "2 × 2: 8</title>" in html
    # no categorical series colors in a magnitude chart
    assert _SERIES[1] not in html


def test_bounded_input_contract(spark, tmp_path):
    big = spark.range(3000).select(
        F.col("id").cast("double").alias("x"), F.col("id").cast("double").alias("y")
    )
    with pytest.raises(PlotInputTooLarge):
        write_line_plot(big, str(tmp_path / "big.html"), x="x", ys="y")
    # explicit opt-up renders
    write_line_plot(big, str(tmp_path / "big.html"), x="x", ys="y", max_rows=3000)
    assert os.path.exists(tmp_path / "big.html")


def test_market_report_end_to_end(spark, tmp_path, bars_df):
    from financial_big_data_spark.plans import market_analysis_plan

    res = market_analysis_plan(bars_df, order_tiebreak=None)
    p = str(tmp_path / "market.html")
    write_market_report(res, p)
    res.unpersist()
    html = _read(p)
    assert "regime distribution" in html
    assert "regime transition probabilities" in html
    assert "daily regime mix" in html
    # all three forms present
    assert "<polyline" in html and "<path d=" in html and "<rect" in html
    # every chart ships its table view
    assert html.count("<details><summary>data table</summary>") == 3


def test_market_report_folds_excess_regimes_into_other(spark, tmp_path):
    """>8 regimes in the daily mix: the tail folds into an explicit
    'other' series (summed mass) instead of being silently dropped
    (ADVICE r5) — and stays within line_chart_svg's 8-hue contract."""
    import datetime as dt
    from types import SimpleNamespace

    daily = spark.createDataFrame(
        [(dt.date(2024, 1, 1), f"regime{i:02d}", 10 + i) for i in range(10)]
        + [(dt.date(2024, 1, 2), f"regime{i:02d}", 5) for i in range(10)],
        "day date, regime string, n long",
    )
    res = SimpleNamespace(
        regime_distribution=spark.createDataFrame([], "regime string, n long"),
        transition_matrix=spark.createDataFrame(
            [], "from_regime string, to_regime string, probability double"
        ),
        daily_regime=daily,
    )
    p = str(tmp_path / "fold.html")
    write_market_report(res, p)
    html = _read(p)
    assert "other" in html
    assert "regime00" in html and "regime06" in html
    # regimes 8-10 are folded, not named series
    assert "regime07" not in html and "regime09" not in html
    # folded mass lands in the table: day1 other = 17+18+19 = 54
    assert ">54<" in html or ">54.0<" in html or "54" in html


def test_timestamps_on_x_axis(spark, tmp_path):
    df = spark.createDataFrame(
        [("2024-01-0%d 00:00:00" % (i + 1), float(i)) for i in range(5)],
        "ts string, v double",
    ).select(F.col("ts").cast("timestamp").alias("ts"), "v")
    p = str(tmp_path / "ts.html")
    write_line_plot(df, p, x="ts", ys="v", title="times")
    html = _read(p)
    assert re.search(r"01-0\d", html)  # time-formatted ticks
