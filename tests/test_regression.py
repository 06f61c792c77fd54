"""Grouped linear-trend (sufficient-statistics OLS) tests."""

from __future__ import annotations

import pytest

from tmdb_index_spark.operators.regression import grouped_linear_trend


def test_trend_exact_line(spark):
    # y = 2x + 1 exactly
    rows = [(1, x, 2.0 * x + 1.0) for x in range(5)]
    df = spark.createDataFrame(rows, "g long, x long, y double")
    out = grouped_linear_trend(df, "g", "x", "y").collect()[0]
    assert (out["n_points"], out["slope"], out["intercept"]) == (5, 2.0, 1.0)


def test_trend_negative_slope_and_rounding(spark):
    rows = [(1, 0, 10.0), (1, 1, 9.5), (1, 2, 9.0)]
    df = spark.createDataFrame(rows, "g long, x long, y double")
    out = grouped_linear_trend(df, "g", "x", "y").collect()[0]
    assert out["slope"] == -0.5
    assert out["intercept"] == 10.0


def test_trend_zero_variance_x_is_null(spark):
    rows = [(1, 3, 1.0), (1, 3, 2.0), (2, 7, 5.0)]
    df = spark.createDataFrame(rows, "g long, x long, y double")
    out = {r["g"]: r for r in grouped_linear_trend(df, "g", "x", "y").collect()}
    assert out[1]["slope"] is None and out[1]["intercept"] is None
    assert out[2]["slope"] is None  # single point


def test_trend_groups_independent(spark):
    rows = [(1, 0, 0.0), (1, 1, 1.0), (2, 0, 5.0), (2, 1, 3.0)]
    df = spark.createDataFrame(rows, "g long, x long, y double")
    out = {r["g"]: r["slope"] for r in grouped_linear_trend(df, "g", "x", "y").collect()}
    assert out == {1: 1.0, 2: -2.0}


def test_trend_mean_point_on_line(spark):
    # OLS invariant: the fitted line passes through (x̄, ȳ)
    rows = [(1, 1, 4.37), (1, 2, 9.11), (1, 5, 2.25), (1, 9, 7.75)]
    df = spark.createDataFrame(rows, "g long, x long, y double")
    out = grouped_linear_trend(df, "g", "x", "y", round_to=10).collect()[0]
    xbar = (1 + 2 + 5 + 9) / 4.0
    ybar = (4.37 + 9.11 + 2.25 + 7.75) / 4.0
    assert abs(out["slope"] * xbar + out["intercept"] - ybar) < 1e-6
