"""Input-width guard for compute-heavy map stages.

A parquet scan can never split below one ROW GROUP, so a small corpus
written as a single-row-group file (the driver's sf0.001–0.1 fixtures;
any `coalesce(1)` artifact, including this engine's own single-file
index sink) scans as ONE task — and every downstream per-row compute
stage (shingling, md5 hashing, vector folds, Arrow batches) inherits
that width until the first shuffle. On local[32] that is 31 idle cores;
on a cluster it is an entire stage bottlenecked on one executor core.

:func:`widen_small_scan` repartitions only when the plan's current
width is below the session's default parallelism. At production scale
a 100 TB table scans as tens of thousands of row-group splits, the
condition is false, and this is a zero-cost no-op — the repartition
(and its tiny shuffle of raw input rows) exists exactly and only in
the small-input regime where the input fits in memory many times over
and the shuffle is trivially cheap.

Deliberately NOT applied globally (e.g. inside the shared table
reader): operators whose contract is "map-only, no shuffle at any
scale" (media decode, redaction, quality scoring) must keep plans
with zero Exchange nodes — their per-row work is light enough that
single-task execution at tiny scale is fine, and the plan property is
pinned by tests. Heavy-compute operators opt in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["widen_small_scan"]


def widen_small_scan(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition ``df`` up to ``min_partitions`` (default:
    the session's default parallelism) iff its current plan width is
    narrower. Row-order neutral for every downstream use in this
    engine (aggregations, hash joins, keyed windows).

    Probe cost (intentional): ``df.rdd.getNumPartitions()`` forces one
    physical planning pass of the upstream plan at operator-BUILD time,
    and the compiled width it reports is the pre-AQE one. That is the
    point — the decision must be made before execution, and the widths
    this guard acts on (a handful of row-group splits vs the session's
    parallelism) are not ones AQE re-plans. The probe is per operator
    call on plans that are scan-rooted and small; if build-time ever
    matters, pass ``min_partitions`` explicitly from a known width
    instead."""
    target = (
        min_partitions
        if min_partitions is not None
        else df.sparkSession.sparkContext.defaultParallelism
    )
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
