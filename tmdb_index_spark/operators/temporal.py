"""Temporal modeling operators: SCD type-2 history build and
interval merge (gaps-and-islands over explicit [start, end) spans).

Neither exists in the reference (tmdb_index.py keeps only the latest
state per id — the keep-last upsert, tmdb_index.py:330-366); these are
the warehouse-side complements: ``scd2_build`` turns that same change
feed into a full versioned history instead of discarding superseded
rows, and ``merge_intervals`` collapses overlapping validity/activity
spans into islands.

Scale design (100 TB): both operators shuffle exactly once, on the
entity key, and every window runs inside that partitioning — no
global sort, no join, nothing quadratic. Partition count follows
``spark.sql.shuffle.partitions``; skewed keys (one entity with
millions of versions) degrade to a single fat task the same way any
keyed window does, and the standard salting answer does not apply
because runs/islands need full per-key event order — document, don't
hide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["scd2_build", "merge_intervals"]


def scd2_build(
    df: DataFrame,
    key: str,
    ts_col: str,
    attr_col: str,
    tiebreak: str | None = None,
) -> DataFrame:
    """Build a slowly-changing-dimension type-2 history from an event
    stream: one output row per RUN of consecutive identical
    ``attr_col`` values per ``key``, with ``valid_from`` (first event
    of the run), ``valid_to`` (start of the next run, NULL while
    current), ``version`` (1-based per key) and ``is_current``.

    Consecutive duplicates collapse (an event restating the current
    value extends the open version instead of cutting a new one) —
    the defining SCD2 semantic that a plain lead() over raw events
    gets wrong. Run detection is a null-safe change flag against
    lag(attr) inside one window partitioning on ``key`` ordered by
    (``ts_col``, ``tiebreak``); keeping only the change rows performs
    the collapse without any aggregation, so the whole history builds
    in a single shuffle.

    ``tiebreak`` (default: the key itself, useless for intra-key ties
    — pass an event id when timestamps can collide) makes the order,
    and therefore the versioning, deterministic.
    """
    tb = tiebreak or key
    order = [F.col(ts_col).asc(), F.col(tb).asc()]
    w = Window.partitionBy(key).orderBy(*order)
    # A run START is the first event per key or any event whose attr
    # differs (null-safely: NULL is a value, a NULL-run is a run) from
    # its predecessor. Keeping only the start rows IS the collapse —
    # no groupBy: valid_from is the start's own ts, valid_to the next
    # start's. Both windows share partitioning (key) AND ordering
    # (ts, tiebreak), so the whole operator is ONE Exchange + one
    # local sort; versions/leads run over the already-filtered start
    # rows in place (plan-pinned in tests/test_plans.py).
    starts = (
        df.select(key, ts_col, attr_col, tb)
        .withColumn(
            "__start__",
            (F.row_number().over(w) == 1)
            | ~F.col(attr_col).eqNullSafe(F.lag(attr_col).over(w)),
        )
        .filter(F.col("__start__"))
    )
    return (
        starts.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w))
        .withColumn("version", F.row_number().over(w))
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop("__start__", ts_col, *([tb] if tb != key else []))
    )


def merge_intervals(
    df: DataFrame,
    key: str,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Merge overlapping or touching ``[start, end)`` intervals per
    ``key`` into maximal islands: one output row per island with
    ``island_start``, ``island_end`` and ``n_merged`` (source interval
    count).

    Gaps-and-islands over explicit spans (NOT point events — that is
    ``sessionize``): an interval opens a new island iff its start lies
    strictly after the running maximum end of all earlier intervals of
    the same key; islands are then the running sum of those break
    flags. Touching intervals (``start == prev_end``) merge, matching
    half-open semantics. One shuffle on ``key``; both windows and the
    final groupBy reuse that partitioning.
    """
    order = [F.col(start_col).asc(), F.col(end_col).asc()]
    w = Window.partitionBy(key).orderBy(*order)
    prev = w.rowsBetween(Window.unboundedPreceding, -1)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    flagged = (
        df.select(key, start_col, end_col)
        .withColumn("__prev_end__", F.max(end_col).over(prev))
        .withColumn(
            "__brk__",
            F.when(
                F.col("__prev_end__").isNull()
                | (F.col(start_col) > F.col("__prev_end__")),
                1,
            ).otherwise(0),
        )
        .withColumn("__island__", F.sum("__brk__").over(run))
    )
    return flagged.groupBy(key, "__island__").agg(
        F.min(start_col).alias("island_start"),
        F.max(end_col).alias("island_end"),
        F.count(F.lit(1)).cast("bigint").alias("n_merged"),
    ).withColumnRenamed("__island__", "island")
