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


def test_interval_join_end_exactly_on_bucket_edge(spark):
    # end = 30.0 sits exactly on the 10-wide bucket edge: the final
    # covered bucket is [20, 30) and the (inclusively indexed) bucket
    # starting AT 30 must contribute nothing. A point one ulp under the
    # edge is the case the old 1e-12 epsilon could under-index.
    import math

    just_under = math.nextafter(30.0, 0.0)
    facts = spark.createDataFrame(
        [(1, 20.0), (2, just_under), (3, 30.0), (4, 29.0)],
        "fact_id long, v double",
    )
    ivals = _ivals(spark, [("edge", 10.0, 30.0)])
    got = rows(
        point_in_interval_join(facts, ivals, "v", "lo", "hi", 10.0),
        order_by="fact_id",
    )
    assert [r["fact_id"] for r in got] == [1, 2, 4]  # 30.0 excluded


def test_interval_join_end_one_ulp_above_edge(spark):
    # end one ulp ABOVE the bucket edge: bucket 3 ([30, 40)) holds the
    # single point 30.0 < end; inclusive end-bucket indexing must find
    # it (the documented failure mode of epsilon subtraction, where
    # end - 1e-12 == 30.0 - nothing and the final bucket was skipped
    # whenever ulp(end) > 1e-12 ... here it is the reverse: the
    # subtraction was a no-op only by luck; exact math needs no luck).
    import math

    end = math.nextafter(30.0, 100.0)
    facts = spark.createDataFrame([(1, 30.0)], "fact_id long, v double")
    ivals = _ivals(spark, [("tight", 0.0, end)])
    got = rows(
        point_in_interval_join(facts, ivals, "v", "lo", "hi", 10.0),
        order_by="fact_id",
    )
    assert [r["fact_id"] for r in got] == [1]


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


def test_release_pins_frees_cascade_storage(spark):
    from datetime import datetime

    from tmdb_index_spark.operators import materialize as M

    ev = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 0, 5), 1.0)],
        "event_id long, ts timestamp, value double",
    )
    M.release_pins()  # drop pins left over from other tests
    grains = cascade_time_rollup(ev)
    grains["month"].count()  # materialize the cascade (fills the pins)
    assert grains["hour"].storageLevel.useMemory
    assert len(M._PINNED_FRAMES) == 2  # hour + day
    released = M.release_pins()
    assert released == 2
    assert not grains["hour"].storageLevel.useMemory
    assert not grains["day"].storageLevel.useMemory
    assert M._PINNED_FRAMES == [] and M._SCRATCH_PATHS == []
    # parquet pins register scratch paths that release_pins deletes
    import os

    grains_p = cascade_time_rollup(ev, materialize="parquet")
    grains_p["month"].count()
    paths = [p.removeprefix("file:") for p in M._SCRATCH_PATHS]
    assert len(paths) == 2 and all(os.path.exists(p) for p in paths)
    M.release_pins()
    assert all(not os.path.exists(p) for p in paths)


# ---------------------------------------------------------------- prorate


def test_prorate_even_split_and_remainder_cents(spark):
    from datetime import date

    from tmdb_index_spark.operators.ranges import prorate_over_days

    # 10.00 over 3 days: 334, 333, 333 cents (remainder to earliest)
    rows = [(date(2024, 1, 1), date(2024, 1, 3), 10.00)]
    df = spark.createDataFrame(rows, "s date, e date, v double")
    out = {
        r["day"].isoformat(): r["amount"]
        for r in prorate_over_days(df, "s", "e", "v").collect()
    }
    assert out == {"2024-01-01": 3.34, "2024-01-02": 3.33, "2024-01-03": 3.33}


def test_prorate_totals_conserved_to_the_cent(spark):
    from datetime import date, timedelta

    from tmdb_index_spark.operators.ranges import prorate_over_days
    from pyspark.sql import functions as F

    rows = [
        (date(2024, 1, 1) + timedelta(days=i % 5),
         date(2024, 1, 1) + timedelta(days=i % 5 + i % 7),
         round(13.7 * (i + 1), 2))
        for i in range(50)
    ]
    df = spark.createDataFrame(rows, "s date, e date, v double")
    total_in = round(sum(r[2] for r in rows), 2)
    total_out = (
        prorate_over_days(df, "s", "e", "v")
        .agg(F.round(F.sum("amount"), 2).alias("t"))
        .collect()[0]["t"]
    )
    assert total_out == total_in


def test_prorate_single_day_span_and_invalid_spans(spark):
    from datetime import date

    from tmdb_index_spark.operators.ranges import prorate_over_days

    rows = [
        (date(2024, 1, 1), date(2024, 1, 1), 5.55),   # 1-day span
        (date(2024, 1, 5), date(2024, 1, 1), 99.0),   # end < start: drop
        (None, date(2024, 1, 1), 99.0),               # NULL start: drop
    ]
    df = spark.createDataFrame(rows, "s date, e date, v double")
    out = prorate_over_days(df, "s", "e", "v").collect()
    assert len(out) == 1
    assert out[0]["amount"] == 5.55 and out[0]["n_rows"] == 1


def test_prorate_overlapping_rows_stack(spark):
    from datetime import date

    from tmdb_index_spark.operators.ranges import prorate_over_days

    rows = [
        (date(2024, 1, 1), date(2024, 1, 2), 2.00),
        (date(2024, 1, 2), date(2024, 1, 3), 4.00),
    ]
    df = spark.createDataFrame(rows, "s date, e date, v double")
    out = {
        r["day"].isoformat(): (r["n_rows"], r["amount"])
        for r in prorate_over_days(df, "s", "e", "v").collect()
    }
    assert out["2024-01-02"] == (2, 3.00)
