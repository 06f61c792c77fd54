"""Range (point-in-interval) join and cascaded time rollups.

Two operator families Spark has no native physical strategy for, each
re-expressed as equi-join / reuse-friendly plans (the reference engine
has neither; they are north-star extensions listed alongside the as-of
join):

* :func:`point_in_interval_join` — join fact points into dimension
  intervals (``start <= point < end``). Spark plans a bare inequality
  join as BroadcastNestedLoopJoin — |facts|·|intervals| comparisons,
  the classic silent scale-killer. This operator buckets both sides at
  ``bucket_width`` granularity: each interval explodes into the
  buckets it covers, each point maps to exactly one bucket, the join
  becomes an EQUI-join on the bucket id (hash-partitionable, AQE- and
  skew-handling-eligible), and the original predicate remains as a
  residual filter. Cost: |intervals| × avg_buckets_per_interval extra
  index rows — pick ``bucket_width`` near the typical interval length
  so that factor stays small (the TimescaleDB/interval-index rule).

* :func:`cascade_time_rollup` — hypertable-style continuous-aggregate
  cascade: hour from raw, day from HOUR, month from DAY. Each coarser
  grain re-aggregates the previous grain's partial aggregates (sums of
  sums, sums of counts), so raw data is scanned exactly once and the
  day/month shuffles move |hours| / |days| rows, not |raw|. That reuse
  is the entire point of a continuous aggregate at 100 TB: the naive
  union of three groupBys over raw is three full scans + three full
  shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["point_in_interval_join", "cascade_time_rollup", "prorate_over_days"]


def point_in_interval_join(
    facts: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: float,
    broadcast_intervals: bool = True,
    how: str = "inner",
) -> DataFrame:
    """Join each fact row to every interval containing its point
    (half-open: ``start <= point < end``).

    Returns facts columns + intervals columns. ``how='left'`` keeps
    unmatched facts (interval columns null). The bucketed index join
    keeps the big side hash-partitioned on a dense numeric key; set
    ``broadcast_intervals=False`` when the interval table is itself
    fact-sized (the join then shuffles both sides on the bucket id).
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner or left, got {how!r}")
    w = float(bucket_width)
    # Interval side: one row per covered bucket, END BUCKET INCLUSIVE.
    # Correctness argument, exact in IEEE arithmetic with no epsilon:
    # the facts side computes bucket(p) = floor(p / w) with the same
    # double division, and division by a positive w is monotonic, so
    # p < end  =>  floor(p/w) <= floor(end/w) = b1 — every bucket a
    # matching point can land in is indexed. When end lies exactly on
    # a bucket edge this indexes one bucket no matching point falls
    # in; the residual predicate filters those rows, costing one
    # candidate bucket per such interval. (An earlier version made the
    # end bucket exclusive via a 1e-12 epsilon; wherever
    # ulp(end) > 1e-12 the subtraction was a no-op, and on near-edge
    # values it could under-index the final bucket — a missed
    # candidate the residual cannot recover. Exactness beats the one
    # saved bucket.) Empty/invalid intervals (end <= start) produce
    # the start bucket only and are then removed by the residual.
    b0 = F.floor(F.col(start_col) / w).cast("long")
    b1 = F.floor(F.col(end_col) / w).cast("long")
    idx = intervals.select(
        "*", F.explode(F.sequence(b0, F.greatest(b1, b0))).alias("__bucket__")
    )
    if broadcast_intervals:
        idx = F.broadcast(idx)
    pts = facts.withColumn(
        "__bucket__", F.floor(F.col(point_col) / w).cast("long")
    )
    residual = (F.col(point_col) >= F.col(start_col)) & (
        F.col(point_col) < F.col(end_col)
    )
    if how == "inner":
        return pts.join(idx, "__bucket__").filter(residual).drop("__bucket__")
    # left: residual must live in the join condition, not a post-filter
    # (a post-filter would drop the null-extended rows again)
    cond = (pts["__bucket__"] == idx["__bucket__"]) & residual
    return (
        pts.join(idx, cond, "left")
        .drop(idx["__bucket__"])
        .drop(pts["__bucket__"])
    )


def cascade_time_rollup(
    events: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    group_cols: tuple[str, ...] = (),
    materialize: str = "cache",
    scratch_dir: str | None = None,
) -> dict[str, DataFrame]:
    """Continuous-aggregate cascade: ``{'hour': df, 'day': df,
    'month': df}``, each with ``(bucket, *group_cols, n_events,
    total_value)``.

    The hour frame aggregates raw events; day aggregates the HOUR
    frame (``sum(n_events)``, ``sum(total_value)``); month aggregates
    the day frame. Decimal-exact value sums so re-aggregation is
    bit-identical to a direct groupBy at every grain (pinned by test
    and by the catalog oracle, which computes each grain directly from
    raw in SQL).

    The hour and day frames are PINNED (`materialize` — cache by
    default, 'parquet' for a shared-scratch cluster): a consumer that
    unions all three grains would otherwise re-execute the hour
    aggregate (and the raw scan under it) once per branch — Spark's
    ReuseExchange does not canonicalize across the differing
    downstream aggregates, so without pinning the "raw scanned once"
    claim silently becomes three scans.

    The returned hour/day frames ARE the pinned handles — callers may
    ``.unpersist()`` them directly once consumers have materialized,
    or call :func:`tmdb_index_spark.operators.materialize
    .release_pins` to drop every outstanding pin (what bench.py does
    between passes); otherwise each invocation parks two cached
    frames in executor storage for the session's lifetime.
    """
    from tmdb_index_spark.operators.materialize import pin_frame

    gc = list(group_cols)

    def _roll(df: DataFrame, grain: str, src_bucket: str, agg_exprs) -> DataFrame:
        return (
            df.groupBy(
                F.date_trunc(grain, F.col(src_bucket)).alias("bucket"), *gc
            )
            .agg(*agg_exprs)
        )

    hour = _roll(
        events,
        "hour",
        ts_col,
        [
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(18,2)")).alias("total_value"),
        ],
    )
    reagg = [
        F.sum("n_events").cast("long").alias("n_events"),
        F.sum("total_value").alias("total_value"),
    ]
    hour = pin_frame(hour, materialize, scratch_dir)
    day = pin_frame(_roll(hour, "day", "bucket", reagg), materialize, scratch_dir)
    month = _roll(day, "month", "bucket", reagg)
    return {"hour": hour, "day": day, "month": month}


def prorate_over_days(
    df: DataFrame,
    start_col: str,
    end_col: str,
    value_col: str,
    day_col: str = "day",
) -> DataFrame:
    """Allocate each row's value evenly across the calendar days of
    its [start, end] date span (inclusive) and roll up per day — the
    warehouse proration that turns per-order amounts into daily
    run-rates (revenue in transit, active-contract value, burn).

    Exactness: the naive ``value / n_days`` float share makes the
    daily totals depend on summation order. Instead the value is
    converted to integer CENTS and allocated like an accountant:
    every day gets ``cents div n``, and the first ``cents mod n``
    days get one extra cent — integer arithmetic end-to-end, so the
    per-day totals are exact, sum back to the originals to the cent,
    and reproduce bit-for-bit on any engine or partitioning.

    Scale shape: one bounded Generate per row (fan-out = span length
    in days — bounded by the domain, e.g. ship→receipt ≤ a month) and
    one partial-aggregated groupBy on the day. Rows with NULL dates
    or end < start are dropped (no valid span). Values are rounded to
    cents on entry.

    Returns ``(day_col, n_rows, amount)`` — ``n_rows`` the number of
    source rows touching the day, ``amount`` the allocated total.
    """
    start = F.col(start_col).cast("date")
    end = F.col(end_col).cast("date")
    n = F.datediff(end, start) + 1
    cents = F.round(F.col(value_col).cast("double") * 100).cast("long")
    base = df.select(
        start.alias("__s__"),
        n.alias("__n__"),
        cents.alias("__c__"),
    ).filter(F.col("__n__") >= 1)
    # materialize the per-row scalars BEFORE the Generate (the
    # explode-sibling lesson), then fan out one row per covered day
    idx = base.select(
        "__s__", "__n__", "__c__",
        F.explode(F.sequence(F.lit(0), F.col("__n__") - 1)).alias("__i__"),
    )
    share = (F.col("__c__") / F.col("__n__")).cast("long") + F.when(
        F.col("__i__") < F.col("__c__") % F.col("__n__"), 1
    ).otherwise(0)
    return (
        idx.select(
            F.date_add(F.col("__s__"), F.col("__i__")).alias(day_col),
            share.alias("__share__"),
        )
        .groupBy(day_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            (F.sum("__share__") / 100.0).alias("amount"),
        )
    )
