"""Tests for the publish matrix runner and the distributed NTILE core.

Both pin round-3 advisory findings: the matrix must really be
fail-fast:false (an exception in one entity cannot abort the rest), and
the distributed ntile rewrite must reproduce the window form's
nulls-first semantics instead of crashing on NULL values.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from tmdb_index_spark.queries import ntile_quartiles_distributed
from tools.publish_all import MATRIX, run_matrix


def test_run_matrix_survives_exceptions_and_runs_all_entries():
    attempted = []

    def runner(spark, feed, t, args, fixed_clock):
        attempted.append(t)
        if t == "movie":
            raise RuntimeError("feed exploded")
        return t != "tv"  # tv fails via the shrink-guard False path

    failed = run_matrix(None, None, None, False, runner=runner)
    assert attempted == list(MATRIX)
    assert failed == ["movie", "tv"]


def test_run_matrix_all_green():
    failed = run_matrix(None, None, None, False, runner=lambda *a: True)
    assert failed == []


def test_ntile_distributed_matches_window_with_nulls(spark):
    rows = [
        (0, None),
        (1, 5.0),
        (2, None),
        (3, 1.0),
        (4, 3.0),
        (5, 2.0),
        (6, 4.0),
        (7, 0.5),
        (8, 9.0),
        (9, None),
    ]
    ev = spark.createDataFrame(rows, "event_id long, value double")
    got = ntile_quartiles_distributed(ev.sparkSession, ev).orderBy("quartile").collect()
    w = Window.orderBy(F.asc("value"), F.asc("event_id"))
    exp = (
        ev.withColumn("quartile", F.ntile(4).over(w))
        .groupBy("quartile")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
        .select(
            F.col("quartile").cast("long").alias("quartile"),
            "n_events",
            "lo",
            "hi",
        )
        .orderBy("quartile")
        .collect()
    )
    assert got == exp
