"""Tests for the range (point-in-interval) join and the cascaded
time-rollup operators (north-star extensions — operators/ranges.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import rows
from tmdb_index_spark.operators.ranges import (
    cascade_time_rollup,
    point_in_interval_join,
)


def _facts(spark):
    return spark.createDataFrame(
        [(1, 5.0), (2, 10.0), (3, 15.0), (4, 99.0)], "fact_id long, v double"
    )


def _ivals(spark, rows_):
    return spark.createDataFrame(rows_, "ival string, lo double, hi double")


def test_interval_join_basic_membership(spark):
    ivals = _ivals(spark, [("a", 0.0, 10.0), ("b", 10.0, 20.0)])
    got = rows(
        point_in_interval_join(_facts(spark), ivals, "v", "lo", "hi", 10.0),
        order_by="fact_id",
    )
    # half-open: v=10 belongs to b, not a; v=99 unmatched
    assert [(r["fact_id"], r["ival"]) for r in got] == [
        (1, "a"), (2, "b"), (3, "b"),
    ]


def test_interval_join_overlapping_intervals_fan_out(spark):
    ivals = _ivals(spark, [("wide", 0.0, 20.0), ("narrow", 4.0, 6.0)])
    got = rows(
        point_in_interval_join(_facts(spark), ivals, "v", "lo", "hi", 5.0),
        order_by="fact_id",
    )
    # v=5 sits in both intervals -> two rows
    assert sorted((r["fact_id"], r["ival"]) for r in got) == [
        (1, "narrow"), (1, "wide"), (2, "wide"), (3, "wide"),
    ]


def test_interval_join_interval_spanning_many_buckets(spark):
    # bucket_width much smaller than the interval: membership unchanged
    ivals = _ivals(spark, [("all", 0.0, 100.0)])
    got = rows(
        point_in_interval_join(_facts(spark), ivals, "v", "lo", "hi", 3.0),
        order_by="fact_id",
    )
    assert [r["fact_id"] for r in got] == [1, 2, 3, 4]


def test_interval_join_left_keeps_unmatched(spark):
    ivals = _ivals(spark, [("a", 0.0, 10.0)])
    got = rows(
        point_in_interval_join(
            _facts(spark), ivals, "v", "lo", "hi", 10.0, how="left"
        ),
        order_by="fact_id",
    )
    assert len(got) == 4
    assert got[0]["ival"] == "a"
    assert got[3]["fact_id"] == 4 and got[3]["ival"] is None


def test_interval_join_empty_interval_matches_nothing(spark):
    ivals = _ivals(spark, [("empty", 10.0, 10.0), ("rev", 20.0, 5.0)])
    assert (
        point_in_interval_join(
            _facts(spark), ivals, "v", "lo", "hi", 10.0
        ).count()
        == 0
    )


def test_interval_join_no_nested_loop_join(spark):
    # the entire point: an equi-join on the bucket, never a BNLJ
    ivals = _ivals(spark, [("a", 0.0, 10.0)])
    p = (
        point_in_interval_join(_facts(spark), ivals, "v", "lo", "hi", 10.0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p


def test_interval_join_bad_args_raise(spark):
    ivals = _ivals(spark, [("a", 0.0, 10.0)])
    with pytest.raises(ValueError):
        point_in_interval_join(_facts(spark), ivals, "v", "lo", "hi", 0.0)
    with pytest.raises(ValueError):
        point_in_interval_join(
            _facts(spark), ivals, "v", "lo", "hi", 5.0, how="full"
        )


def test_cascade_rollup_matches_direct_aggregation(spark):
    from datetime import datetime

    ev = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1, 0, 10), 1.5),
            (2, datetime(2024, 1, 1, 0, 50), 2.5),
            (3, datetime(2024, 1, 1, 5, 0), 10.0),
            (4, datetime(2024, 1, 2, 0, 0), 4.0),
            (5, datetime(2024, 2, 1, 0, 0), 8.0),
        ],
        "event_id long, ts timestamp, value double",
    )
    grains = cascade_time_rollup(ev)
    # cascade result == direct groupBy from raw, at every grain
    for grain in ("hour", "day", "month"):
        direct = (
            ev.groupBy(F.date_trunc(grain, "ts").alias("bucket"))
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_events"),
                F.sum(F.col("value").cast("decimal(18,2)")).alias("total_value"),
            )
        )
        got = sorted(map(tuple, grains[grain].collect()))
        exp = sorted(map(tuple, direct.collect()))
        assert got == exp, grain
    # and the plan reuse claim: day consumes hour buckets, so hour rows
    # (3 on 2024-01-01) collapse to 2 day rows and 2 month rows
    assert grains["hour"].count() == 4
    assert grains["day"].count() == 3
    assert grains["month"].count() == 2
