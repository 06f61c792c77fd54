"""Bucketed-store tests: the join-based upsert matches the window-based
one exactly, and over a bucketed index the merge plans with NO Exchange
on the index side (SCALE.md's co-located merge claim, executable)."""

from __future__ import annotations

import re

from tests.conftest import rows
from tmdb_index_spark.operators.upsert import (
    update_or_append,
    update_or_append_join,
)
from tmdb_index_spark.sources.bucketed import (
    load_bucketed,
    merge_into_bucketed,
    save_bucketed,
)


def _old(spark):
    return spark.createDataFrame(
        [(0, "a", 10), (1, "b", 11), (2, "c", 12)], "id long, v string, extra long"
    )


def _batch(spark):
    # id 1 updated (v whole-row wins, extra carried), id 5 appended,
    # id 2 updated with NULL v (whole-row semantics: null overwrites)
    return spark.createDataFrame(
        [(1, "B"), (5, "e"), (2, None)], "id long, v string"
    )


def test_join_upsert_matches_window_upsert(spark):
    a = rows(update_or_append(_old(spark), _batch(spark)))
    b = rows(update_or_append_join(_old(spark), _batch(spark)))
    assert a == b
    assert b == [
        {"id": 0, "v": "a", "extra": 10},
        {"id": 1, "v": "B", "extra": 11},
        {"id": 2, "v": None, "extra": 12},
        {"id": 5, "v": "e", "extra": None},
    ]


def test_join_upsert_schema_evolution(spark):
    batch = spark.createDataFrame([(7, True)], "id long, flag boolean")
    out = rows(update_or_append_join(_old(spark), batch))
    assert out[-1] == {"id": 7, "v": None, "extra": None, "flag": True}
    assert out[0] == {"id": 0, "v": "a", "extra": 10, "flag": None}


def test_bucketed_merge_no_index_exchange(spark, tmp_path):
    spark.sql("DROP TABLE IF EXISTS idx_v1")
    spark.sql("DROP TABLE IF EXISTS idx_v2")
    save_bucketed(_old(spark), "idx_v1", n_buckets=4)

    index = load_bucketed(spark, "idx_v1")
    merged = update_or_append_join(index, _batch(spark))
    plan = merged._jdf.queryExecution().executedPlan().toString()
    # Exactly one Exchange: the batch side shuffling to the bucket
    # partitioning. The bucketed index scan must not re-shuffle.
    n_exchanges = len(re.findall(r"Exchange hashpartitioning", plan))
    assert n_exchanges == 1, plan
    assert "bucket" in plan.lower()

    out = merge_into_bucketed(spark, "idx_v1", _batch(spark), "idx_v2", n_buckets=4)
    assert rows(out) == rows(update_or_append(_old(spark), _batch(spark)))


# ------------------------------------------------------------ skew report


def test_skew_report_identifies_heavy_key(spark):
    from tmdb_index_spark.operators.skew import skew_report

    rows = [(1,)] * 90 + [(2,)] * 5 + [(3,)] * 5
    df = spark.createDataFrame(rows, "k long")
    out = skew_report(df, "k", top_k=2).collect()
    assert out[0]["k"] == 1 and out[0]["n_rows"] == 90
    assert out[0]["share"] == 0.9
    assert out[0]["skew_x"] == 2.7  # 0.9 * 3 keys
    assert len(out) == 2


def test_skew_report_uniform_keys_skew_one(spark):
    from tmdb_index_spark.operators.skew import skew_report

    rows = [(i % 4,) for i in range(100)]
    df = spark.createDataFrame(rows, "k long")
    out = skew_report(df, "k", top_k=10).collect()
    assert len(out) == 4
    assert all(r["skew_x"] == 1.0 for r in out)
    # count ties broken by key ascending
    assert [r["k"] for r in out] == [0, 1, 2, 3]


def test_skew_report_topk_plan_and_validation(spark):
    import pytest
    from tmdb_index_spark.operators.skew import skew_report

    df = spark.createDataFrame([(1,)], "k long")
    plan = skew_report(df, "k")._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    with pytest.raises(ValueError):
        skew_report(df, "k", top_k=0)
