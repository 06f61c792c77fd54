"""Z-order layout tests: Morton key math, repartition clustering,
locality stats."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from tmdb_index_spark.operators.layout import (
    zorder_key,
    zorder_locality_stats,
    zorder_repartition,
)


def _morton2(x: int, y: int, bits: int = 8) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_key_matches_reference_interleave(spark):
    rows = [(x, y) for x in range(8) for y in range(8)]
    df = spark.createDataFrame(rows, "x long, y long")
    out = df.select(
        "x", "y", zorder_key([F.col("x"), F.col("y")], bits=3).alias("z")
    ).collect()
    for r in out:
        assert r["z"] == _morton2(r["x"], r["y"], bits=3)


def test_zorder_key_validates_inputs(spark):
    with pytest.raises(ValueError):
        zorder_key([], bits=8)
    with pytest.raises(ValueError):
        zorder_key([F.col("x")], bits=0)


def test_zorder_repartition_clusters_both_dims(spark):
    # a 32x32 grid z-ordered into 4 partitions: every partition must
    # cover a rectangle far smaller than the full extent in BOTH dims
    # (a 1-D sort would cover the full extent of the other dim)
    rows = [(x, y) for x in range(32) for y in range(32)]
    df = spark.createDataFrame(rows, "x long, y long")
    parts = (
        zorder_repartition(df, ["x", "y"], bits=5, num_partitions=4)
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(
            (F.max("x") - F.min("x")).alias("xspan"),
            (F.max("y") - F.min("y")).alias("yspan"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    assert sum(r["n"] for r in parts) == 1024
    for r in parts:
        if r["n"] >= 64:  # ignore tiny boundary partitions
            assert r["xspan"] <= 20 and r["yspan"] <= 20


def test_locality_stats_tight_rectangles(spark):
    rows = [(x, y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(rows, "x long, y long")
    out = zorder_locality_stats(df, ["x", "y"], bits=6, prefix_bits=4).collect()
    assert sum(r["n_rows"] for r in out) == 4096
    # 16 buckets of a 64x64 grid: each is a 16x16 quadrant
    assert len(out) == 16
    for r in out:
        assert r["x_max"] - r["x_min"] == 15
        assert r["y_max"] - r["y_min"] == 15


def test_locality_stats_validates_prefix(spark):
    df = spark.createDataFrame([(1, 1)], "x long, y long")
    with pytest.raises(ValueError):
        zorder_locality_stats(df, ["x", "y"], bits=4, prefix_bits=9)
