"""Temporal operator tests: SCD2 history build and interval merge.

The reference keeps only latest state per id (keep-last upsert,
tmdb_index.py:330-366); these cover the versioned-history and
span-merge complements.
"""

from __future__ import annotations

from datetime import datetime

import pytest

from pyspark.sql import functions as F

from tmdb_index_spark.operators.temporal import merge_intervals, scd2_build


def _ts(day, hour=0):
    return datetime(2024, 1, day, hour)


@pytest.fixture(scope="module")
def events(spark):
    # user 1: a -> a (restated) -> b -> a : 3 versions, not 4.
    # user 2: single event -> one open version.
    # user 3: NULL -> NULL -> x : NULL run collapses into one version.
    rows = [
        (1, _ts(1), 10, "a"),
        (1, _ts(2), 11, "a"),
        (1, _ts(3), 12, "b"),
        (1, _ts(4), 13, "a"),
        (2, _ts(1), 20, "z"),
        (3, _ts(1), 30, None),
        (3, _ts(2), 31, None),
        (3, _ts(3), 32, "x"),
    ]
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, state string"
    )


def _hist(df):
    out = scd2_build(df, "user_id", "ts", "state", tiebreak="event_id")
    return {
        (r.user_id, r.version): (r.state, r.valid_from, r.valid_to, r.is_current)
        for r in out.collect()
    }


def test_scd2_collapses_consecutive_duplicates(spark, events):
    h = _hist(events)
    assert [h[(1, v)][0] for v in (1, 2, 3)] == ["a", "b", "a"]
    assert (1, 4) not in h  # the restated 'a' extended version 1


def test_scd2_validity_chain_and_current_flag(spark, events):
    h = _hist(events)
    assert h[(1, 1)] == ("a", _ts(1), _ts(3), False)
    assert h[(1, 2)] == ("b", _ts(3), _ts(4), False)
    assert h[(1, 3)] == ("a", _ts(4), None, True)
    assert h[(2, 1)] == ("z", _ts(1), None, True)


def test_scd2_null_attr_is_a_run(spark, events):
    h = _hist(events)
    assert h[(3, 1)] == (None, _ts(1), _ts(3), False)
    assert h[(3, 2)] == ("x", _ts(3), None, True)


def test_scd2_tiebreak_orders_equal_timestamps(spark):
    # Two state changes at the SAME timestamp: event_id decides the
    # sequence, so versioning is deterministic.
    df = spark.createDataFrame(
        [(1, _ts(1), 2, "b"), (1, _ts(1), 1, "a"), (1, _ts(2), 3, "c")],
        "user_id long, ts timestamp, event_id long, state string",
    )
    h = _hist(df)
    assert [h[(1, v)][0] for v in (1, 2, 3)] == ["a", "b", "c"]


def test_scd2_single_shuffle_plan(spark, events):
    plan = (
        scd2_build(events, "user_id", "ts", "state", tiebreak="event_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1


def _islands(spark, rows):
    df = spark.createDataFrame(
        rows, "key long, start_ts timestamp, end_ts timestamp"
    )
    out = merge_intervals(df, "key", "start_ts", "end_ts")
    return sorted(
        (r.key, r.island_start, r.island_end, r.n_merged)
        for r in out.collect()
    )


def test_merge_intervals_overlap_and_touch(spark):
    got = _islands(
        spark,
        [
            (1, _ts(1), _ts(3)),
            (1, _ts(2), _ts(4)),   # overlaps -> merges
            (1, _ts(4), _ts(5)),   # touches (start == prev end) -> merges
            (1, _ts(7), _ts(8)),   # gap -> new island
        ],
    )
    assert got == [(1, _ts(1), _ts(5), 3), (1, _ts(7), _ts(8), 1)]


def test_merge_intervals_contained_and_out_of_order(spark):
    # A short interval nested in a long one, supplied out of order,
    # must not split the island; the island end is the running MAX of
    # ends, not the last row's end.
    got = _islands(
        spark,
        [
            (1, _ts(2), _ts(3)),
            (1, _ts(1), _ts(9)),
            (1, _ts(4), _ts(5)),
        ],
    )
    assert got == [(1, _ts(1), _ts(9), 3)]


def test_merge_intervals_keys_are_independent(spark):
    got = _islands(spark, [(1, _ts(1), _ts(2)), (2, _ts(1), _ts(2))])
    assert got == [(1, _ts(1), _ts(2), 1), (2, _ts(1), _ts(2), 1)]


def test_merge_intervals_single_shuffle_plan(spark):
    # hashpartitioning(key) satisfies the (key, island) grouping
    # (hash on a subset of the clustering keys), so the island
    # aggregation reuses the window's Exchange: ONE shuffle total,
    # and the aggregate collapses islands in place.
    df = spark.createDataFrame(
        [(1, _ts(1), _ts(2))],
        "key long, start_ts timestamp, end_ts timestamp",
    )
    out = merge_intervals(df, "key", "start_ts", "end_ts")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "partial" in plan
    assert plan.count("Exchange") == 1
