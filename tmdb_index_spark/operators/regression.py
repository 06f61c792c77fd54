"""Per-group linear regression via sufficient statistics.

No reference counterpart (tmdb_index.py computes only count-style
profile stats, tmdb_index.py:478-516); this is the grouped trend-line
fit an analytics engine needs for drift detection ("is this user's
spend rising?") and feature pipelines (slope-of-activity features).

The whole fit reduces to five per-group sums — n, Σx, Σy, Σxy, Σx² —
so it is ONE partial-aggregated groupBy: map-side combine collapses
each partition to one row per group before the single shuffle, the
textbook "algebraic aggregate" shape that scales to any N. The
closed forms

    slope     = (n·Σxy − Σx·Σy) / (n·Σx² − Σx²ₛᵤₘ)
    intercept = (Σy − slope·Σx) / n

are evaluated on the driver-free aggregated row.

Exactness: float sums across a shuffle are order-dependent, which
would make the result unreproducible bit-for-bit across engines and
runs. All five sums are therefore accumulated in DECIMAL (exact for
inputs with bounded scale, e.g. money values and epoch seconds); only
the final division happens in double. Callers whose y has unbounded
scale should pre-round to the precision they mean.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["grouped_linear_trend", "series_autocorrelation", "cusum_changepoint"]


def grouped_linear_trend(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
    round_to: int = 4,
) -> DataFrame:
    """OLS fit of ``y ~ x`` per group. ``x_col`` must be integral
    (epoch seconds, day numbers); ``y_col`` is cast to DECIMAL(18,2).
    Groups whose x has zero variance (single point, or all x equal)
    report NULL slope/intercept — there is no line to fit.

    Returns ``(group_col, n_points, slope, intercept)`` with slope and
    intercept rounded to ``round_to``.
    """
    x = F.col(x_col).cast("decimal(18,0)")
    y = F.col(y_col).cast("decimal(18,2)")
    agg = df.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_points"),
        F.sum(x).alias("__sx__"),
        F.sum(y).alias("__sy__"),
        F.sum(x * y).alias("__sxy__"),
        F.sum(x * x).alias("__sxx__"),
    )
    n = F.col("n_points").cast("decimal(38,0)")
    det = (n * F.col("__sxx__") - F.col("__sx__") * F.col("__sx__")).cast(
        "double"
    )
    num = (n * F.col("__sxy__") - F.col("__sx__") * F.col("__sy__")).cast(
        "double"
    )
    slope = F.when(det != 0.0, num / det)
    intercept = (
        F.col("__sy__").cast("double") - slope * F.col("__sx__").cast("double")
    ) / F.col("n_points").cast("double")
    return agg.select(
        group_col,
        "n_points",
        F.round(slope, round_to).alias("slope"),
        F.round(intercept, round_to).alias("intercept"),
    )


def series_autocorrelation(
    df: DataFrame,
    x_col: str,
    y_col: str,
    lags: tuple[int, ...] = (1, 7),
    round_to: int = 4,
) -> DataFrame:
    """Lag-k autocorrelation of a regularly-indexed series: Pearson
    correlation between ``y`` at index ``x`` and ``y`` at index
    ``x - k``, for each ``k`` in ``lags`` — the seasonality /
    persistence diagnostic (lag-7 on daily data = weekly cycle).
    ``x_col`` must be an integer index (day number); gaps are
    handled by joining on exact index difference, so a missing day
    contributes no pair rather than a misaligned one.

    Scale shape: the pair construction is a self-equi-join on
    ``x - k`` per lag — on series data this frame is already the
    OUTPUT of an upstream rollup (|days|, not |events|), so the
    joins are trivially small; correlation reduces to the five
    DECIMAL-exact sufficient sums per lag (one partial-aggregated
    groupBy over the union of lag-tagged pairs), same exactness
    argument as :func:`grouped_linear_trend`.

    Returns ``(lag, n_pairs, autocorr)``; NULL autocorr where a lag
    has < 2 pairs or zero variance on either side.
    """
    if not lags or any(k < 1 for k in lags):
        raise ValueError(f"lags must be positive integers, got {lags}")
    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast("decimal(18,2)")
    base = df.select(x.alias("__x__"), y.alias("__y__"))
    tagged = None
    for k in lags:
        cur = base.select(
            F.lit(k).cast("bigint").alias("lag"),
            F.col("__x__"),
            F.col("__y__").alias("__cur__"),
        )
        prev = base.select(
            (F.col("__x__") + k).alias("__x__"),
            F.col("__y__").alias("__prev__"),
        )
        pairs = cur.join(prev, "__x__")
        tagged = pairs if tagged is None else tagged.unionByName(pairs)
    agg = tagged.groupBy("lag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum("__cur__").alias("__sy__"),
        F.sum("__prev__").alias("__sx__"),
        F.sum(F.col("__cur__") * F.col("__prev__")).alias("__sxy__"),
        F.sum(F.col("__cur__") * F.col("__cur__")).alias("__syy__"),
        F.sum(F.col("__prev__") * F.col("__prev__")).alias("__sxx__"),
    )
    # Sums are decimal-exact; the FINAL combination runs in double on
    # both engines — n·Σxy would exceed DECIMAL(38) typing rules in
    # DuckDB/Spark (silent rescale on one side, error on the other),
    # while double arithmetic on bit-equal inputs is identical.
    n = F.col("n_pairs").cast("double")
    sx, sy = F.col("__sx__").cast("double"), F.col("__sy__").cast("double")
    sxy = F.col("__sxy__").cast("double")
    sxx = F.col("__sxx__").cast("double")
    syy = F.col("__syy__").cast("double")
    cov = n * sxy - sx * sy
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    corr = F.when(
        (F.col("n_pairs") >= 2) & (vx > 0.0) & (vy > 0.0),
        cov / F.sqrt(vx * vy),
    )
    return agg.select(
        "lag", "n_pairs", F.round(corr, round_to).alias("autocorr")
    )


def cusum_changepoint(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
    round_to: int = 4,
) -> DataFrame:
    """CUSUM change-point score per group: the maximum absolute
    cumulative deviation of ``y`` from its group mean, walked in
    ``x`` order, plus the ``x`` where it peaks — the classic
    level-shift detector (a series with a mean shift accumulates
    deviation up to the shift point; a stable series hovers near 0).

    Exactness without a mean division: the running statistic is kept
    SCALED — ``s'_t = n·cumsum(y)[t] − t·total(y)`` equals
    ``n · cumsum(y − ȳ)[t]`` in exact decimal arithmetic (no
    intermediate division, so no engine-specific decimal rounding);
    the score divides by ``n`` only at the very end, in double. The
    peak position is made deterministic by maximizing the struct
    ``(|s'|, −x)`` — ties resolve to the earliest ``x`` identically
    on every engine.

    Scale shape: one shuffle on the group key; the group total rides
    an unbounded window inside that partitioning (no second scan) and
    the cumulative sum an ordered window in the same partitioning —
    one Exchange total. Returns
    ``(group_col, n_points, cp_x, cusum_max)``.
    """
    y = F.col(y_col).cast("decimal(18,2)")
    x = F.col(x_col).cast("long")
    wall = Window.partitionBy(group_col)
    word = (
        Window.partitionBy(group_col)
        .orderBy(x.asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    n = F.count(F.lit(1)).over(wall)
    tot = F.sum(y).over(wall).cast("decimal(18,2)")
    t = F.row_number().over(
        Window.partitionBy(group_col).orderBy(x.asc())
    )
    cum = F.sum(y).over(word).cast("decimal(18,2)")
    # DECIMAL(18,0) × DECIMAL(18,2) → DECIMAL(37,2): inside the 38-digit
    # cap on BOTH engines, so no silent rescale/overflow divergence
    s = n.cast("decimal(18,0)") * cum - t.cast("decimal(18,0)") * tot
    stepped = df.select(
        F.col(group_col),
        x.alias("__x__"),
        n.alias("__n__"),
        F.abs(s).alias("__abs__"),
    )
    best = F.max(F.struct(F.col("__abs__"), (-F.col("__x__")).alias("__nx__")))
    return (
        stepped.groupBy(group_col)
        .agg(
            F.max("__n__").cast("bigint").alias("n_points"),
            best.alias("__best__"),
        )
        .select(
            group_col,
            "n_points",
            (-F.col("__best__.__nx__")).cast("bigint").alias("cp_x"),
            F.round(
                F.col("__best__.__abs__").cast("double")
                / F.col("n_points").cast("double"),
                round_to,
            ).alias("cusum_max"),
        )
    )
