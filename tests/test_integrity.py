"""Bucketed table-checksum tests."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from tmdb_index_spark.operators.integrity import table_checksum


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, name string, amt double")


def test_checksum_equal_tables_equal_digests(spark):
    rows = [(i, f"n{i}", i * 1.5) for i in range(100)]
    a = table_checksum(_df(spark, rows), "id", buckets=8).collect()
    b = table_checksum(_df(spark, list(reversed(rows))), "id", buckets=8).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # order-independent


def test_checksum_detects_single_value_change(spark):
    rows = [(i, f"n{i}", 1.0) for i in range(100)]
    tampered = [(i, f"n{i}", 1.0 if i != 42 else 1.01) for i in range(100)]
    a = {r["bucket"]: r["checksum"] for r in table_checksum(_df(spark, rows), "id", buckets=8).collect()}
    b = {r["bucket"]: r["checksum"] for r in table_checksum(_df(spark, tampered), "id", buckets=8).collect()}
    diff = [k for k in a if a[k] != b.get(k)]
    assert len(diff) == 1  # localized to exactly one bucket


def test_checksum_counts_catch_xor_cancellation(spark):
    # the same row duplicated twice XORs to no-op: counts must differ
    rows = [(1, "a", 1.0)]
    dup = [(1, "a", 1.0), (1, "a", 1.0), (1, "a", 1.0)]
    a = table_checksum(_df(spark, rows), "id", buckets=4).collect()
    b = table_checksum(_df(spark, dup), "id", buckets=4).collect()
    assert a[0]["checksum"] == b[0]["checksum"]  # XOR of odd copies equal
    assert a[0]["n_rows"] != b[0]["n_rows"]      # counts disagree


def test_checksum_null_distinct_from_empty_string(spark):
    a = table_checksum(_df(spark, [(1, None, 1.0)]), "id", buckets=1).collect()
    b = table_checksum(_df(spark, [(1, "", 1.0)]), "id", buckets=1).collect()
    assert a[0]["checksum"] != b[0]["checksum"]


def test_checksum_column_subset_and_validation(spark):
    df = _df(spark, [(1, "a", 1.0), (2, "b", 2.0)])
    out = table_checksum(df, "id", cols=["id", "name"], buckets=2)
    assert out.columns == ["bucket", "n_rows", "checksum"]
    with pytest.raises(ValueError):
        table_checksum(df, "id", buckets=0)
