"""Distribution-drift (histogram KL/JSD) operator tests."""

from __future__ import annotations

import math

import pytest

from tmdb_index_spark.operators.drift import histogram_kl


def _df(spark, a_vals, b_vals):
    rows = [("a", v) for v in a_vals] + [("b", v) for v in b_vals]
    return spark.createDataFrame(rows, "side string, v double")


def test_identical_cohorts_zero_drift(spark):
    vals = [float(i) for i in range(100)]
    out = histogram_kl(_df(spark, vals, vals), "v", "side", "a", "b").collect()[0]
    assert out["n_a"] == 100 and out["n_b"] == 100
    assert out["kl_ab"] == 0.0 and out["kl_ba"] == 0.0 and out["jsd"] == 0.0


def test_disjoint_cohorts_high_drift(spark):
    a = [float(i) for i in range(50)]          # low half
    b = [float(i) for i in range(100, 150)]    # high half
    out = histogram_kl(_df(spark, a, b), "v", "side", "a", "b").collect()[0]
    assert out["kl_ab"] > 1.0 and out["kl_ba"] > 1.0
    assert 0.0 < out["jsd"] <= 1.0  # JSD (log2) is bounded by 1


def test_jsd_symmetric_kl_not(spark):
    a = [0.0] * 80 + [50.0] * 20
    b = [0.0] * 20 + [50.0] * 80
    d1 = histogram_kl(_df(spark, a, b), "v", "side", "a", "b").collect()[0]
    d2 = histogram_kl(_df(spark, b, a), "v", "side", "a", "b").collect()[0]
    assert d1["jsd"] == d2["jsd"]
    assert d1["kl_ab"] == d2["kl_ba"]


def test_matches_reference_computation(spark):
    # tiny case, verified against a straight Python reimplementation
    a = [0.0, 0.0, 1.0]
    b = [0.0, 1.0, 1.0]
    bins = 2
    out = histogram_kl(
        _df(spark, a, b), "v", "side", "a", "b", bins=bins
    ).collect()[0]
    # shared grid lo=0, hi=1: bucket = min(floor(v*2/2.0), 1) -> 0 or... 
    # (v - 0) * 2 / (1 - 0 + 1) = v -> floor(v) -> 0.0->0, 1.0->1
    ca, cb = {0: 2, 1: 1}, {0: 1, 1: 2}
    p = [(ca[i] + 1) / (3 + bins) for i in range(bins)]
    q = [(cb[i] + 1) / (3 + bins) for i in range(bins)]
    kl = sum(pi * math.log2(pi / qi) for pi, qi in zip(p, q))
    assert out["kl_ab"] == round(kl, 4)


def test_other_sides_and_nulls_ignored(spark):
    rows = [("a", 1.0), ("b", 1.0), ("c", 99.0), ("a", None)]
    df = spark.createDataFrame(rows, "side string, v double")
    out = histogram_kl(df, "v", "side", "a", "b").collect()[0]
    assert out["n_a"] == 1 and out["n_b"] == 1
    assert out["kl_ab"] == 0.0


def test_rejects_bad_bins(spark):
    df = _df(spark, [1.0], [2.0])
    with pytest.raises(ValueError):
        histogram_kl(df, "v", "side", "a", "b", bins=1)
