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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["grouped_linear_trend"]


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
