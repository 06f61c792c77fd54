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

__all__ = [
    "scd2_build",
    "merge_intervals",
    "sliding_window_distinct",
    "transition_matrix",
    "time_weighted_avg",
    "expanding_zscore_anomalies",
    "missing_periods",
]


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

    SINGLE-SORT INVARIANT (load-bearing): ``(start, end)`` is NOT a
    total order when duplicate spans exist (e.g. two same-day events
    for one key), so the break flags and their running sum are only
    mutually consistent because Spark evaluates the second window over
    the FIRST window's physical output order — same partitioning, same
    ordering, no Exchange or re-shuffle between the two WindowExec
    nodes, so tied rows cannot swap between passes. Any re-spelling
    that evaluates the two passes over independently sorted streams
    (e.g. two separate SQL CTE window scans on an engine with a
    parallel non-stable sort) can assign a duplicate span to the wrong
    island and inflate the island extent while keeping counts intact —
    observed in a DuckDB oracle at sf0.1 (3/1000 suppliers, +8-9 days).
    If you port this operator, either pre-aggregate duplicate
    ``(key, start, end)`` rows first (carrying a multiplicity column
    into ``n_merged``) or append a unique tiebreak column to every
    ORDER BY.
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


def sliding_window_distinct(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    window_days: int = 7,
) -> DataFrame:
    """Trailing-window distinct count per day: for every calendar day
    that has at least one event, the number of distinct ``key_col``
    values seen in the ``window_days`` days ending on it (inclusive) —
    the classic "7-day active users" metric, which no built-in window
    frame expresses because COUNT(DISTINCT) over a moving frame is not
    decomposable.

    Scale shape: the input first collapses to DISTINCT
    ``(key, day)`` — the only shuffle proportional to the data, and it
    partial-aggregates map-side — then each surviving pair explodes
    into the ≤``window_days`` trailing days it contributes to (a
    bounded, constant-factor Generate, not a join against a calendar),
    and a second distinct aggregate per contribution day produces the
    counts. A semi-join against the distinct event days drops
    contribution days with no events of their own, so the output
    matches the "days present in the data" contract. Nothing is
    quadratic; the blow-up factor is exactly ``window_days``.

    Returns ``(day, n_active)`` with ``day`` a date column.
    """
    if window_days < 1:
        raise ValueError("window_days must be >= 1")
    day = F.col(ts_col).cast("date")
    pairs = df.select(
        F.col(key_col).alias("__k__"), day.alias("__day__")
    ).distinct()
    contrib = pairs.select(
        "__k__",
        F.explode(
            F.sequence(
                F.col("__day__"),
                F.date_add(F.col("__day__"), window_days - 1),
            )
        ).alias("day"),
    )
    event_days = pairs.select(F.col("__day__").alias("day")).distinct()
    return (
        contrib.join(event_days, "day", "left_semi")
        .groupBy("day")
        .agg(F.count_distinct(F.col("__k__")).alias("n_active"))
    )


def transition_matrix(
    df: DataFrame,
    seq_col: str = "user_id",
    event_col: str = "event_type",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
) -> DataFrame:
    """First-order Markov transition matrix over per-entity event
    sequences: for every ordered pair of consecutive events within a
    ``seq_col`` stream, the transition count and the row-normalized
    probability P(next | prev). The bigram complement of
    ``user_event_sequences`` (which keeps whole paths) — this is what
    feeds next-event prediction baselines and funnel-anomaly checks.

    Scale shape: one shuffle on the sequence key, a ``lag`` window
    inside that partitioning, then a ``groupBy (prev, next)`` whose
    cardinality is |event vocabulary|² — tiny — so the second shuffle
    partial-aggregates to almost nothing map-side. The row-sum
    normalizer reuses the aggregated matrix itself via a window over
    ``prev`` (vocabulary-sized partitions), never a second scan of the
    events. ``order_cols`` must make the per-entity order total or
    ties would make prev/next nondeterministic across engines.

    Returns ``(prev_event, next_event, n_transitions, p)`` with ``p``
    rounded to 4 for stable cross-engine compares.
    """
    w = Window.partitionBy(seq_col).orderBy(
        *[F.col(c) for c in order_cols]
    )
    steps = df.select(
        F.lag(F.col(event_col)).over(w).alias("prev_event"),
        F.col(event_col).alias("next_event"),
    ).filter(F.col("prev_event").isNotNull())
    counts = steps.groupBy("prev_event", "next_event").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_transitions")
    )
    wrow = Window.partitionBy("prev_event")
    return counts.select(
        "prev_event",
        "next_event",
        "n_transitions",
        F.round(
            F.col("n_transitions")
            / F.sum("n_transitions").over(wrow).cast("double"),
            4,
        ).alias("p"),
    )


def time_weighted_avg(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str | None = None,
    round_to: int = 4,
) -> DataFrame:
    """Time-weighted average (TWAP) per entity: the mean of
    ``value_col`` under last-observation-carried-forward weighting —
    each observation holds from its timestamp until the next one, so
    its weight is that holding duration in seconds. The metric a
    plain AVG silently gets wrong whenever sampling is irregular
    (bursts of readings overweight the burst).

    The entity's last observation has no holding interval and
    contributes no weight; entities with a single observation (or all
    observations at one instant) have zero total weight and report a
    NULL TWAP — there is no interval to average over.

    Scale shape: one shuffle on the entity key, a ``lead`` window
    inside it, then a partial-aggregated groupBy on the same key —
    the second shuffle moves one row per entity. Weights are integer
    MICROseconds (``unix_micros`` — exact, where floored-seconds
    arithmetic diverges between engines on sub-second timestamps; the
    unit cancels in the ratio) and values DECIMAL(18,2), so the
    weighted sums are exact: no float crosses a shuffle and the
    result is bit-reproducible on any engine or partitioning. Pass
    ``tiebreak_col`` if timestamps can tie within an entity.

    Returns ``(key_col, n_obs, twap)``.
    """
    order = [F.col(ts_col).asc()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(key_col).orderBy(*order)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    dur = (F.lead(us).over(w) - us).cast("decimal(18,0)")
    val = F.col(value_col).cast("decimal(18,2)")
    obs = df.select(
        F.col(key_col),
        (val * dur).alias("__wv__"),
        dur.alias("__w__"),
    )
    agg = obs.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_obs"),
        F.sum("__wv__").alias("__swv__"),
        F.sum("__w__").alias("__sw__"),
    )
    twap = F.when(
        F.col("__sw__") > 0,
        F.col("__swv__").cast("double") / F.col("__sw__").cast("double"),
    )
    return agg.select(
        key_col, "n_obs", F.round(twap, round_to).alias("twap")
    )


def expanding_zscore_anomalies(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
    z_threshold: float = 3.0,
    min_history: int = 5,
    round_to: int = 4,
) -> DataFrame:
    """Online-style anomaly flags over a batch series: for each point,
    the z-score of ``y`` against the EXPANDING window of strictly
    earlier points (never itself or the future — the leak-free
    framing a deployed monitor would have seen), flagging
    ``|z| > z_threshold`` once at least ``min_history`` prior points
    exist.

    The expanding mean/std derive from three exact decimal prefix
    sums (count, Σy, Σy²) in one ordered window per group — variance
    via the sum-of-squares identity n·Σy² − (Σy)², combined in
    double at the end (same engine-parity argument as
    `regression.grouped_linear_trend`). One shuffle on the group
    key; everything runs inside that partitioning.

    Returns the anomalous rows only:
    ``(group_col, x_col, y, n_prior, z)`` with ``z`` rounded.
    """
    if min_history < 2:
        raise ValueError(f"min_history must be >= 2, got {min_history}")
    y = F.col(y_col).cast("decimal(18,2)")
    word = (
        Window.partitionBy(group_col)
        .orderBy(F.col(x_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    n = F.count(F.lit(1)).over(word)
    sy = F.sum(y).over(word).cast("decimal(18,2)")
    syy = F.sum(y * y).over(word).cast("decimal(38,4)")
    stepped = df.select(
        F.col(group_col),
        F.col(x_col),
        y.alias("__y__"),
        n.alias("__n__"),
        sy.alias("__sy__"),
        syy.alias("__syy__"),
    )
    nd = F.col("__n__").cast("double")
    syd = F.col("__sy__").cast("double")
    syyd = F.col("__syy__").cast("double")
    var_num = nd * syyd - syd * syd  # = n² · variance
    mean = syd / nd
    std = F.sqrt(var_num) / nd
    z = (F.col("__y__").cast("double") - mean) / std
    return (
        stepped.filter(
            (F.col("__n__") >= min_history) & (var_num > 0.0)
        )
        .withColumn("__z__", z)
        .filter(F.abs(F.col("__z__")) > z_threshold)
        .select(
            group_col,
            x_col,
            F.col("__y__").cast("double").alias("y"),
            F.col("__n__").cast("bigint").alias("n_prior"),
            F.round("__z__", round_to).alias("z"),
        )
    )


def missing_periods(
    df: DataFrame,
    group_col: str,
    idx_col: str,
    max_span: int = 100_000,
) -> DataFrame:
    """Gap detection over a regular integer index (heartbeat
    monitoring): for each group, the index values MISSING between its
    first and last observation — silent days of a feed, dropped
    partitions of a backfill, dead sensors. The complement of
    `gap_fill_locf` (which fills gaps; this reports them).

    Scale shape: collapse to distinct (group, idx) — the only
    data-proportional shuffle — then each group's [min, max] span (a
    group-sized aggregate) explodes into its full index range and
    anti-joins the observed values; fan-out is the SPAN length, not
    the row count, and ``max_span`` guards against a pathological
    group (one sensor with a 30-year hole) exploding the plan — such
    groups are reported with ``span_truncated = true`` and scanned
    only up to the cap.

    Returns ``(group_col, missing_idx, span_truncated)`` — one row
    per missing index value.
    """
    if max_span < 1:
        raise ValueError(f"max_span must be >= 1, got {max_span}")
    obs = df.select(
        F.col(group_col), F.col(idx_col).cast("long").alias("__i__")
    ).distinct()
    span = obs.groupBy(group_col).agg(
        F.min("__i__").alias("__lo__"), F.max("__i__").alias("__hi__")
    )
    trunc = (F.col("__hi__") - F.col("__lo__")) > max_span
    hi_eff = F.when(
        trunc, F.col("__lo__") + max_span
    ).otherwise(F.col("__hi__"))
    grid = span.select(
        group_col,
        trunc.alias("span_truncated"),
        F.explode(F.sequence(F.col("__lo__"), hi_eff)).alias("__i__"),
    )
    return (
        grid.join(obs, [group_col, "__i__"], "left_anti")
        .select(
            group_col,
            F.col("__i__").alias("missing_idx"),
            "span_truncated",
        )
    )
