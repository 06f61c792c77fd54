"""Tests for deterministic global ordering (operators/ordering.py):
positions without a single-partition global window."""

from __future__ import annotations

from pyspark.sql import functions as F

from tmdb_index_spark.operators.ordering import (
    deterministic_shuffle,
    global_row_positions,
)


def test_positions_are_exact_global_ranks(spark):
    # scattered keys across value ranges, including negatives and a tie
    rows_ = [(i, k) for i, k in enumerate([50, -3, 17, 1000, 0, 17, 999, -100])]
    df = spark.createDataFrame(rows_, "id long, k long")
    got = global_row_positions(df, "k", tiebreak=["id"], buckets=4).collect()
    by_pos = {r["pos"]: (r["k"], r["id"]) for r in got}
    # positions are a permutation of 0..N-1
    assert sorted(by_pos) == list(range(len(rows_)))
    # and enumerate rows in exact (k, id) order
    expect = sorted(((k, i) for i, k in rows_))
    assert [by_pos[p] for p in range(len(rows_))] == expect


def test_positions_skewed_keys_still_correct(spark):
    # 90% of rows share one key: one bucket dominates, ranks still exact
    rows_ = [(i, 7 if i < 45 else i) for i in range(50)]
    df = spark.createDataFrame(rows_, "id long, k long")
    got = global_row_positions(df, "k", tiebreak=["id"], buckets=8).collect()
    by_pos = {r["pos"]: (r["k"], r["id"]) for r in got}
    assert [by_pos[p] for p in range(50)] == sorted(((k, i) for i, k in rows_))


def test_positions_independent_of_bucket_count(spark):
    df = spark.createDataFrame([(i, i * 37 % 101) for i in range(60)], "id long, k long")
    a = {r["id"]: r["pos"] for r in global_row_positions(df, "k", ["id"], buckets=2).collect()}
    b = {r["id"]: r["pos"] for r in global_row_positions(df, "k", ["id"], buckets=16).collect()}
    assert a == b


def test_shuffle_deterministic_and_seed_sensitive(spark):
    df = spark.createDataFrame([(i,) for i in range(40)], "doc_id long")
    a = {r["doc_id"]: r["pos"] for r in deterministic_shuffle(df, "doc_id", seed=1).collect()}
    b = {r["doc_id"]: r["pos"] for r in deterministic_shuffle(df, "doc_id", seed=1).collect()}
    c = {r["doc_id"]: r["pos"] for r in deterministic_shuffle(df, "doc_id", seed=2).collect()}
    assert a == b                      # same seed -> identical order
    assert sorted(a.values()) == list(range(40))
    assert a != c                      # different seed -> different order
    assert a != {i: i for i in range(40)}  # and it actually shuffles


def test_data_path_window_is_bucket_partitioned(spark):
    # SinglePartition exchanges exist only in the bounded-size subtrees
    # (the 1-row min/max aggregate and the |buckets|-row offsets
    # window); the DATA path — the row_number window every row flows
    # through — must be hash-partitioned on the bucket, never global.
    df = spark.createDataFrame([(i,) for i in range(100)], "doc_id long")
    plan = (
        deterministic_shuffle(df, "doc_id", seed=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "hashpartitioning(__bkt__" in plan
    # the full-row window sorts by (__bkt__-partition, key) — a GLOBAL
    # rangepartitioning sort of the data would mean the funnel is back
    assert "rangepartitioning" not in plan.lower()
