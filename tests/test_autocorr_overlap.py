"""Round-6 analytics-operator tests: series autocorrelation, group
set/shingle overlap, market-basket lift, event trigrams, drawdown,
Benford forensics, CUSUM change-points, weighted percentiles, and
expanding z-score anomalies."""

from __future__ import annotations

import math

import pytest

from tmdb_index_spark.operators.dedup_text import group_shingle_jaccard
from tmdb_index_spark.operators.regression import series_autocorrelation


def _series(spark, ys):
    return spark.createDataFrame(
        [(i, float(y)) for i, y in enumerate(ys)], "x long, y double"
    )


def test_autocorr_alternating_series_is_minus_one(spark):
    out = {
        r["lag"]: r["autocorr"]
        for r in series_autocorrelation(
            _series(spark, [1, -1, 1, -1, 1, -1, 1, -1]), "x", "y", lags=(1, 2)
        ).collect()
    }
    assert out[1] == -1.0  # perfect alternation
    assert out[2] == 1.0   # period 2


def test_autocorr_matches_reference_computation(spark):
    ys = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0]
    out = {
        r["lag"]: (r["n_pairs"], r["autocorr"])
        for r in series_autocorrelation(
            _series(spark, ys), "x", "y", lags=(1,)
        ).collect()
    }
    cur, prev = ys[1:], ys[:-1]
    n = len(cur)
    sx, sy = sum(prev), sum(cur)
    sxy = sum(a * b for a, b in zip(prev, cur))
    sxx, syy = sum(a * a for a in prev), sum(b * b for b in cur)
    ref = (n * sxy - sx * sy) / math.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    assert out[1] == (n, round(ref, 4))


def test_autocorr_gap_days_contribute_no_pair(spark):
    # index 0,1,2,10: lag-1 pairs only (0,1),(1,2) — 10 pairs with 9,
    # which is absent, so it contributes nothing
    df = spark.createDataFrame(
        [(0, 1.0), (1, 2.0), (2, 3.0), (10, 4.0)], "x long, y double"
    )
    out = series_autocorrelation(df, "x", "y", lags=(1,)).collect()[0]
    assert out["n_pairs"] == 2


def test_autocorr_degenerate_nulls(spark):
    # constant series: zero variance -> NULL; single point -> NULL
    out = series_autocorrelation(
        _series(spark, [5, 5, 5, 5]), "x", "y", lags=(1,)
    ).collect()[0]
    assert out["autocorr"] is None
    out2 = series_autocorrelation(
        _series(spark, [1]), "x", "y", lags=(1,)
    ).collect()
    assert out2 == [] or out2[0]["autocorr"] is None


def test_autocorr_validation(spark):
    df = _series(spark, [1, 2])
    with pytest.raises(ValueError):
        series_autocorrelation(df, "x", "y", lags=())
    with pytest.raises(ValueError):
        series_autocorrelation(df, "x", "y", lags=(0,))


# ---------------------------------------------------------------- overlap


def _docs(spark, rows):
    return spark.createDataFrame(rows, "source string, text string")


def test_group_overlap_identical_and_disjoint(spark):
    from tmdb_index_spark.operators.materialize import release_pins

    rows = [
        ("s1", "a b c d"),          # shingles: abc, bcd
        ("s2", "a b c d"),          # identical set
        ("s3", "x y z w"),          # disjoint
    ]
    out = {
        (r["group_a"], r["group_b"]): r
        for r in group_shingle_jaccard(_docs(spark, rows), "source").collect()
    }
    assert out[("s1", "s2")]["jaccard"] == 1.0
    assert out[("s1", "s2")]["n_common"] == 2
    assert ("s1", "s3") not in out  # no shared shingle -> absent
    release_pins()


def test_group_overlap_partial_jaccard(spark):
    from tmdb_index_spark.operators.materialize import release_pins

    # s1: {abc, bcd}; s2: {bcd, cde} -> inter 1, union 3
    rows = [("s1", "a b c d"), ("s2", "b c d e")]
    out = group_shingle_jaccard(_docs(spark, rows), "source").collect()[0]
    assert (out["n_a"], out["n_b"], out["n_common"]) == (2, 2, 1)
    assert out["jaccard"] == round(1 / 3, 4)
    release_pins()


def test_group_overlap_dedups_within_group(spark):
    from tmdb_index_spark.operators.materialize import release_pins

    # same shingle from two docs of one source counts ONCE in the set
    rows = [("s1", "a b c"), ("s1", "a b c"), ("s2", "a b c")]
    out = group_shingle_jaccard(_docs(spark, rows), "source").collect()[0]
    assert (out["n_a"], out["n_b"], out["n_common"]) == (1, 1, 1)
    assert out["jaccard"] == 1.0
    release_pins()


# -------------------------------------------------------------- drawdown


def test_drawdown_known_path(spark):
    from datetime import datetime

    from tmdb_index_spark.queries import QUERIES  # noqa: F401  (style)
    from pyspark.sql import Window, functions as F

    # cumulative path: 10, 5, 12, 3, 8 -> peak-to-trough 12 - 3 = 9
    deltas = [10.0, -5.0, 7.0, -9.0, 5.0]
    rows = [
        (1, datetime(2024, 1, 1, h), h, d) for h, d in enumerate(deltas)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, value double"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col("value").cast("decimal(18,2)")).over(w)
    dd = (
        df.select("user_id", (F.max(cum).over(w) - cum).alias("dd"))
        .groupBy("user_id")
        .agg(F.max("dd").cast("double").alias("max_drawdown"))
        .collect()[0]
    )
    assert dd["max_drawdown"] == 9.0


def test_benford_query_terms_consistent(spark):
    from tmdb_index_spark.queries import QUERIES

    rows = QUERIES["benford_price_check"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert {r["digit"] for r in rows} <= set(range(1, 10))
    # observed probabilities sum to 1 over the emitted digits
    assert abs(sum(r["observed_p"] for r in rows) - 1.0) < 0.01
    # Benford expectation is the exact closed form
    import math

    for r in rows:
        assert r["benford_p"] == round(math.log10(1 + 1 / r["digit"]), 4)
        assert r["chi2_term"] >= 0.0


# ---------------------------------------------------- basket / trigrams


def test_part_pair_lift_math(spark):
    import duckdb

    from tmdb_index_spark.queries import ORACLES, QUERIES

    # cross-engine spot check on the tiny fixture SF — the lift math
    # is already oracle-gated; here assert shape + ranking invariants
    out = QUERIES["part_pair_lift"](spark, "/root/testdata/sf0.001").collect()
    assert len(out) <= 20
    counts = [r["n_orders_both"] for r in out]
    assert counts == sorted(counts, reverse=True)
    assert all(r["part_a"] < r["part_b"] for r in out)
    assert all(r["lift"] > 0 for r in out)


def test_event_trigrams_ordering_and_scope(spark):
    from tmdb_index_spark.queries import QUERIES

    out = QUERIES["frequent_event_trigrams"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert 0 < len(out) <= 15
    counts = [r["n_paths"] for r in out]
    assert counts == sorted(counts, reverse=True)


# ------------------------------------------------------- set overlap


def test_group_set_jaccard_known_sets(spark):
    from tmdb_index_spark.operators.dedup import group_set_jaccard

    rows = [
        ("a", 1), ("a", 2), ("a", 2),  # dup row: set semantics
        ("b", 2), ("b", 3),
        ("c", 9),
    ]
    df = spark.createDataFrame(rows, "g string, u long")
    out = {
        (r["group_a"], r["group_b"]): r
        for r in group_set_jaccard(df, "g", "u").collect()
    }
    ab = out[("a", "b")]
    assert (ab["n_a"], ab["n_b"], ab["n_common"]) == (2, 2, 1)
    assert ab["jaccard"] == round(1 / 3, 4)
    assert ("a", "c") not in out  # disjoint pairs absent


# ----------------------------------------------------------- cusum


def test_cusum_level_shift_detected_at_shift(spark):
    from tmdb_index_spark.operators.regression import cusum_changepoint

    # mean shifts at x=5: 0,0,0,0,0 then 10,10,10,10,10
    rows = [("g", x, 0.0 if x < 5 else 10.0) for x in range(10)]
    df = spark.createDataFrame(rows, "g string, x long, y double")
    out = cusum_changepoint(df, "g", "x", "y").collect()[0]
    # scaled stat peaks at the last pre-shift point (x=4):
    # |n*cum - t*total| = |10*0 - 5*50| = 250 -> /n = 25
    assert out["cp_x"] == 4
    assert out["cusum_max"] == 25.0
    assert out["n_points"] == 10


def test_cusum_stable_series_scores_zero(spark):
    from tmdb_index_spark.operators.regression import cusum_changepoint

    rows = [("g", x, 7.0) for x in range(8)]
    df = spark.createDataFrame(rows, "g string, x long, y double")
    out = cusum_changepoint(df, "g", "x", "y").collect()[0]
    assert out["cusum_max"] == 0.0
    assert out["cp_x"] == 0  # all-zero ties resolve to the earliest x


def test_cusum_groups_independent(spark):
    from tmdb_index_spark.operators.regression import cusum_changepoint

    rows = [("g", x, 0.0 if x < 2 else 4.0) for x in range(4)]
    rows += [("h", x, 1.0) for x in range(3)]
    df = spark.createDataFrame(rows, "g string, x long, y double")
    out = {r["g"]: r for r in cusum_changepoint(df, "g", "x", "y").collect()}
    assert out["g"]["cusum_max"] > 0
    assert out["h"]["cusum_max"] == 0.0


# --------------------------------------------------- weighted percentile


def test_weighted_percentile_basic_median(spark):
    from tmdb_index_spark.operators.aggregates import weighted_percentile

    # values 1..4 with weights 1,1,1,7: half the mass (5) is reached
    # only at value 4
    rows = [("g", 1.0, 1), ("g", 2.0, 1), ("g", 3.0, 1), ("g", 4.0, 7)]
    df = spark.createDataFrame(rows, "g string, v double, w long")
    out = weighted_percentile(df, "g", "v", "w", p=0.5).collect()[0]
    assert out["wp"] == 4.0
    assert out["n_rows"] == 4 and out["total_weight"] == 10.0


def test_weighted_percentile_equal_weights_is_lower_median(spark):
    from tmdb_index_spark.operators.aggregates import weighted_percentile

    rows = [("g", float(v), 1) for v in (10, 20, 30, 40)]
    df = spark.createDataFrame(rows, "g string, v double, w long")
    out = weighted_percentile(df, "g", "v", "w", p=0.5).collect()[0]
    assert out["wp"] == 20.0  # cum 2/4 reaches 0.5 at the 2nd value


def test_weighted_percentile_p1_is_max_and_validation(spark):
    import pytest
    from tmdb_index_spark.operators.aggregates import weighted_percentile

    rows = [("g", 1.0, 1), ("g", 9.0, 1)]
    df = spark.createDataFrame(rows, "g string, v double, w long")
    assert weighted_percentile(df, "g", "v", "w", p=1.0).collect()[0]["wp"] == 9.0
    with pytest.raises(ValueError):
        weighted_percentile(df, "g", "v", "w", p=0.0)


def test_weighted_percentile_null_rows_ignored(spark):
    from tmdb_index_spark.operators.aggregates import weighted_percentile

    rows = [("g", 5.0, 2), ("g", None, 99), ("g", 7.0, None)]
    df = spark.createDataFrame(rows, "g string, v double, w long")
    out = weighted_percentile(df, "g", "v", "w").collect()[0]
    assert out["wp"] == 5.0 and out["n_rows"] == 1


# ----------------------------------------------------- expanding zscore


def test_expanding_z_flags_spike_only(spark):
    from tmdb_index_spark.operators.temporal import expanding_zscore_anomalies

    ys = [10.0, 11.0, 9.0, 10.0, 10.5, 9.5, 50.0, 10.0]
    rows = [("g", x, y) for x, y in enumerate(ys)]
    df = spark.createDataFrame(rows, "g string, x long, y double")
    out = expanding_zscore_anomalies(
        df, "g", "x", "y", z_threshold=3.0, min_history=5
    ).collect()
    assert [(r["x"], r["y"]) for r in out] == [(6, 50.0)]
    assert out[0]["n_prior"] == 6
    assert out[0]["z"] > 3.0


def test_expanding_z_never_uses_future_or_self(spark):
    from tmdb_index_spark.operators.temporal import expanding_zscore_anomalies

    # the spike at the END: prior history is calm, so it flags; a
    # leaky (centered/full-window) stat would dilute its own baseline
    ys = [5.0, 5.2, 4.8, 5.1, 4.9, 5.0, 100.0]
    rows = [("g", x, y) for x, y in enumerate(ys)]
    df = spark.createDataFrame(rows, "g string, x long, y double")
    out = expanding_zscore_anomalies(
        df, "g", "x", "y", z_threshold=3.0, min_history=5
    ).collect()
    assert [r["x"] for r in out] == [6]


def test_expanding_z_constant_history_skipped(spark):
    from tmdb_index_spark.operators.temporal import expanding_zscore_anomalies

    ys = [5.0] * 6 + [99.0]
    rows = [("g", x, y) for x, y in enumerate(ys)]
    df = spark.createDataFrame(rows, "g string, x long, y double")
    # zero-variance history: the spike is NOT flagged (z undefined)
    assert expanding_zscore_anomalies(
        df, "g", "x", "y", min_history=5
    ).count() == 0


def test_expanding_z_validation(spark):
    import pytest
    from tmdb_index_spark.operators.temporal import expanding_zscore_anomalies

    df = spark.createDataFrame([("g", 1, 1.0)], "g string, x long, y double")
    with pytest.raises(ValueError):
        expanding_zscore_anomalies(df, "g", "x", "y", min_history=1)
