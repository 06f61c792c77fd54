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


# ---------------------------------------------------------------- sliding


def test_sliding_distinct_trailing_window(spark):
    from tmdb_index_spark.operators.temporal import sliding_window_distinct

    rows = [
        (1, _ts(1)),
        (2, _ts(1)),
        (1, _ts(2)),   # repeat user inside window: counted once
        (3, _ts(9)),   # day 9 is > 7 days after day 1
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {
        r["day"].day: r["n_active"]
        for r in sliding_window_distinct(df, window_days=7).collect()
    }
    # day 1: users {1,2}; day 2: {1,2} (day-1 events still in window);
    # day 9: only user 3 (days 1-2 fell out of [3, 9]).
    assert out == {1: 2, 2: 2, 9: 1}


def test_sliding_distinct_only_event_days_emitted(spark):
    from tmdb_index_spark.operators.temporal import sliding_window_distinct

    df = spark.createDataFrame(
        [(1, _ts(1)), (2, _ts(5))], "user_id long, ts timestamp"
    )
    days = sorted(
        r["day"].day
        for r in sliding_window_distinct(df, window_days=7).collect()
    )
    # days 2-4 have no events of their own: not emitted even though
    # day-1 activity falls inside their trailing window.
    assert days == [1, 5]


def test_sliding_distinct_window_1_is_per_day_distinct(spark):
    from tmdb_index_spark.operators.temporal import sliding_window_distinct

    df = spark.createDataFrame(
        [(1, _ts(1)), (1, _ts(1, 5)), (2, _ts(2))],
        "user_id long, ts timestamp",
    )
    out = {
        r["day"].day: r["n_active"]
        for r in sliding_window_distinct(df, window_days=1).collect()
    }
    assert out == {1: 1, 2: 1}


def test_sliding_distinct_rejects_bad_window(spark):
    from tmdb_index_spark.operators.temporal import sliding_window_distinct

    df = spark.createDataFrame([(1, _ts(1))], "user_id long, ts timestamp")
    with pytest.raises(ValueError):
        sliding_window_distinct(df, window_days=0)


# ---------------------------------------------------------------- markov


def test_transition_matrix_counts_and_probs(spark):
    from tmdb_index_spark.operators.temporal import transition_matrix

    rows = [
        (1, _ts(1), 1, "a"),
        (1, _ts(2), 2, "b"),
        (1, _ts(3), 3, "a"),
        (2, _ts(1), 4, "a"),
        (2, _ts(2), 5, "b"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    out = {
        (r["prev_event"], r["next_event"]): (r["n_transitions"], r["p"])
        for r in transition_matrix(df).collect()
    }
    # a->b twice, b->a once; P(b|a)=1.0, P(a|b)=1.0
    assert out == {("a", "b"): (2, 1.0), ("b", "a"): (1, 1.0)}


def test_transition_matrix_no_cross_user_bigrams(spark):
    from tmdb_index_spark.operators.temporal import transition_matrix

    rows = [(1, _ts(1), 1, "a"), (2, _ts(2), 2, "b")]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    assert transition_matrix(df).count() == 0


def test_transition_matrix_tiebreak_is_deterministic(spark):
    from tmdb_index_spark.operators.temporal import transition_matrix

    # same ts: event_id orders the pair
    rows = [(1, _ts(1), 2, "b"), (1, _ts(1), 1, "a")]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    out = transition_matrix(df).collect()
    assert [(r["prev_event"], r["next_event"]) for r in out] == [("a", "b")]


def test_transition_matrix_row_probs_sum_to_one(spark):
    from tmdb_index_spark.operators.temporal import transition_matrix

    rows = [
        (1, _ts(1), 1, "a"),
        (1, _ts(2), 2, "b"),
        (1, _ts(3), 3, "a"),
        (1, _ts(4), 4, "c"),
        (1, _ts(5), 5, "a"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    sums = (
        transition_matrix(df)
        .groupBy("prev_event")
        .agg(F.round(F.sum("p"), 4).alias("s"))
        .collect()
    )
    assert all(abs(r["s"] - 1.0) < 1e-9 for r in sums)


# ---------------------------------------------------------------- twap


def test_twap_locf_weighting(spark):
    from tmdb_index_spark.operators.temporal import time_weighted_avg

    # value 10 holds 1h, value 20 holds 3h -> twap = (10*1 + 20*3)/4
    rows = [
        (1, _ts(1, 0), 1, 10.0),
        (1, _ts(1, 1), 2, 20.0),
        (1, _ts(1, 4), 3, 99.0),  # last obs: no weight
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, value double"
    )
    out = time_weighted_avg(df, tiebreak_col="event_id").collect()[0]
    assert out["n_obs"] == 3
    assert out["twap"] == 17.5


def test_twap_single_obs_is_null(spark):
    from tmdb_index_spark.operators.temporal import time_weighted_avg

    df = spark.createDataFrame(
        [(1, _ts(1), 1, 5.0)],
        "user_id long, ts timestamp, event_id long, value double",
    )
    out = time_weighted_avg(df, tiebreak_col="event_id").collect()[0]
    assert out["twap"] is None and out["n_obs"] == 1


def test_twap_differs_from_plain_avg_on_irregular_sampling(spark):
    from tmdb_index_spark.operators.temporal import time_weighted_avg

    # burst of high values in one second, then a long low period:
    # plain AVG is pulled to the burst, TWAP is not
    rows = [
        (1, _ts(1, 0), 1, 100.0),
        (1, _ts(1, 0), 2, 100.0),  # same ts: zero-weight for first
        (1, _ts(1, 1), 3, 0.0),
        (1, _ts(2, 1), 4, 0.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, value double"
    )
    out = time_weighted_avg(df, tiebreak_col="event_id").collect()[0]
    # weights: 0h(tie), 1h @100, 24h @0 -> 100/25 = 4.0
    assert out["twap"] == 4.0


def test_twap_per_user_independent(spark):
    from tmdb_index_spark.operators.temporal import time_weighted_avg

    rows = [
        (1, _ts(1, 0), 1, 10.0), (1, _ts(1, 2), 2, 0.0),
        (2, _ts(1, 0), 3, 50.0), (2, _ts(1, 1), 4, 0.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, value double"
    )
    out = {r["user_id"]: r["twap"] for r in time_weighted_avg(df, tiebreak_col="event_id").collect()}
    assert out == {1: 10.0, 2: 50.0}


# ---------------------------------------------------------------- gaps


def test_missing_periods_reports_holes_only(spark):
    from tmdb_index_spark.operators.temporal import missing_periods

    rows = [("a", 1), ("a", 2), ("a", 5), ("b", 10)]
    df = spark.createDataFrame(rows, "g string, i long")
    out = sorted(
        (r["g"], r["missing_idx"])
        for r in missing_periods(df, "g", "i").collect()
    )
    assert out == [("a", 3), ("a", 4)]  # b has no span, no holes


def test_missing_periods_duplicates_and_bounds_not_missing(spark):
    from tmdb_index_spark.operators.temporal import missing_periods

    rows = [("a", 1), ("a", 1), ("a", 3)]
    df = spark.createDataFrame(rows, "g string, i long")
    out = [r["missing_idx"] for r in missing_periods(df, "g", "i").collect()]
    assert out == [2]


def test_missing_periods_span_cap(spark):
    from tmdb_index_spark.operators.temporal import missing_periods

    rows = [("a", 0), ("a", 1_000)]
    df = spark.createDataFrame(rows, "g string, i long")
    out = missing_periods(df, "g", "i", max_span=10).collect()
    assert all(r["span_truncated"] for r in out)
    assert len(out) == 10  # indices 1..10 scanned, rest beyond cap
    import pytest

    with pytest.raises(ValueError):
        missing_periods(df, "g", "i", max_span=0)
