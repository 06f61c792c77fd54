"""Upsert core tests, mirroring reference test_tmdb_index.py:29-92
(align_id_col, update_or_append incl. schema evolution)."""

from __future__ import annotations

import pytest

from tests.conftest import rows
from tmdb_index_spark.operators.upsert import (
    align_id_col,
    ordered_union_schema,
    update_or_append,
    validate_id,
)


def test_align_id_col_fills_gaps(spark):
    df = spark.createDataFrame([(0, 10), (2, 30)], "id long, value long")
    out = align_id_col(df)
    assert rows(out) == [
        {"id": 0, "value": 10},
        {"id": 1, "value": None},
        {"id": 2, "value": 30},
    ]
    assert out.columns == ["id", "value"]


def test_align_id_col_empty(spark):
    df = spark.createDataFrame([], "id long, value long")
    out = align_id_col(df)
    assert out.count() == 0
    assert out.columns == ["id", "value"]


def test_align_id_col_already_dense(spark):
    df = spark.createDataFrame([(0, 1), (1, 2)], "id long, v long")
    assert rows(align_id_col(df)) == [{"id": 0, "v": 1}, {"id": 1, "v": 2}]


def test_update_or_append_replaces_and_appends(spark):
    df = spark.createDataFrame([(0, 1), (1, 2)], "id long, v long")
    other = spark.createDataFrame([(1, 20), (2, 30)], "id long, v long")
    assert rows(update_or_append(df, other)) == [
        {"id": 0, "v": 1},
        {"id": 1, "v": 20},
        {"id": 2, "v": 30},
    ]


def test_update_or_append_schema_evolution(spark):
    # overlapping {id,a,b} vs {id,b,c}: output order a, b then new c;
    # appended rows carry nulls, updated rows take incoming b, keep own a.
    df = spark.createDataFrame([(0, 1, 2), (1, 3, 4)], "id long, a long, b long")
    other = spark.createDataFrame([(1, 40, 5), (2, 60, 7)], "id long, b long, c long")
    out = update_or_append(df, other)
    assert out.columns == ["id", "a", "b", "c"]
    assert rows(out) == [
        {"id": 0, "a": 1, "b": 2, "c": None},
        {"id": 1, "a": 3, "b": 40, "c": 5},
        {"id": 2, "a": None, "b": 60, "c": 7},
    ]


def test_update_or_append_enrichment_preserves_df_only_columns(spark):
    # id=1 updated by `other` which lacks column a → keeps old a (J2).
    df = spark.createDataFrame([(1, 100, 2)], "id long, a long, b long")
    other = spark.createDataFrame([(1, 99)], "id long, b long")
    assert rows(update_or_append(df, other)) == [{"id": 1, "a": 100, "b": 99}]


def test_update_or_append_empty_other(spark):
    df = spark.createDataFrame([(0, 1)], "id long, v long")
    other = spark.createDataFrame([], "id long, v long")
    assert rows(update_or_append(df, other)) == [{"id": 0, "v": 1}]


def test_update_or_append_empty_df(spark):
    df = spark.createDataFrame([], "id long")
    other = spark.createDataFrame([(0, True)], "id long, adult boolean")
    out = update_or_append(df, other)
    assert out.columns == ["id", "adult"]
    assert rows(out) == [{"id": 0, "adult": True}]


def test_update_or_append_dtype_mismatch_raises(spark):
    df = spark.createDataFrame([(0, 1)], "id long, v long")
    other = spark.createDataFrame([(0, "x")], "id long, v string")
    with pytest.raises(TypeError):
        update_or_append(df, other)


def test_update_or_append_requires_id(spark):
    df = spark.createDataFrame([(0,)], "x long")
    other = spark.createDataFrame([(0,)], "id long")
    with pytest.raises(ValueError):
        update_or_append(df, other)


def test_ordered_union_schema_order(spark):
    df = spark.createDataFrame([], "id long, a long, b long")
    other = spark.createDataFrame([], "id long, b long, c long, d long")
    assert ordered_union_schema(df, other) == ["id", "a", "b", "c", "d"]


def test_validate_id_ok(spark):
    validate_id(spark.createDataFrame([(0,), (1,), (2,)], "id long"))
    validate_id(spark.createDataFrame([], "id long"))  # empty is valid


@pytest.mark.parametrize(
    "ids, msg",
    [
        ([1, 2], "start at 0"),
        ([0, 2], "consecutive"),
        ([0, 0, 1], "unique"),
        ([0, None, 2], "nulls"),
    ],
)
def test_validate_id_violations(spark, ids, msg):
    df = spark.createDataFrame([(i,) for i in ids], "id long")
    with pytest.raises(AssertionError, match=msg):
        validate_id(df)
