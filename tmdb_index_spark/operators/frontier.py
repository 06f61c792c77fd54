"""2D Pareto frontier (skyline) without a global-sort funnel.

No reference counterpart (tmdb_index.py has no multi-objective
selection); this is the warehouse-native "best trade-off set" query —
e.g. cheapest-for-their-size parts, fastest-for-their-cost plans —
that naive SQL spells as an O(N²) ``NOT EXISTS`` self-join and naive
Spark spells as a single-partition global sort.

Derivation (both dimensions minimized): over the DISTINCT ``(x, y)``
pairs in lexicographic ``(x asc, y asc)`` order, a pair is dominated
iff ``min(y)`` over the strictly-earlier pairs is ``<= y``:

* an earlier pair with smaller ``x`` and ``y' <= y`` dominates
  outright;
* an earlier pair with equal ``x`` must have ``y' < y`` (pairs are
  distinct), which also dominates;
* conversely if no earlier pair has ``y' <= y`` nothing can dominate,
  because any dominator is lex-earlier.

So the frontier is a running-minimum filter — a one-pass cummin, not a
self-join. The cummin itself is computed without ``Exchange
SinglePartition`` using the same data-derived bucket trick as
`operators/ordering.py`: bucket = monotone scaling of ``x`` into B
bins (1-row min/max aggregate, broadcast), per-bucket exclusive cummin
runs inside ``partitionBy(bucket)`` (fully parallel), and the
cross-bucket carry is a prefix-min window over the |buckets|-row
bucket aggregate — bounded by B, never by N. Earlier bucket ⇒
strictly smaller ``x`` (monotonicity), so the carry is exactly the
min over all earlier-``x`` pairs.

Scale shape: one shuffle to collapse to distinct pairs (map-side
partial agg — the frontier input is |distinct pairs|, usually orders
of magnitude below |rows|), one keyed window, one broadcast join.
Nothing quadratic at any N.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["frontier_2d"]


def frontier_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    count_col: str = "n_rows",
    buckets: int | None = None,
) -> DataFrame:
    """Return the Pareto-minimal distinct ``(x, y)`` pairs of ``df``
    (no other pair is <= in both dimensions and < in at least one),
    with ``count_col`` = how many input rows sit at each frontier
    point. Both columns must be numeric and non-NULL (NULL has no
    place in a dominance order — filter first).
    """
    b = buckets or df.sparkSession.sparkContext.defaultParallelism
    pairs = df.groupBy(x_col, y_col).agg(
        F.count(F.lit(1)).cast("bigint").alias(count_col)
    )
    x = F.col(x_col).cast("double")
    mm = pairs.agg(
        F.min(x).alias("__lo__"), F.max(x).alias("__hi__")
    )
    bucket = F.least(
        F.floor(
            (x - F.col("__lo__")) * b / (F.col("__hi__") - F.col("__lo__") + 1.0)
        ),
        F.lit(b - 1),
    ).cast("long")
    tagged = pairs.crossJoin(F.broadcast(mm)).withColumn("__bkt__", bucket)
    # per-bucket exclusive running min of y in (x, y) lex order
    wrun = (
        Window.partitionBy("__bkt__")
        .orderBy(F.col(x_col).asc(), F.col(y_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # cross-bucket carry: min y of every earlier bucket (|buckets| rows)
    per_bucket = tagged.groupBy("__bkt__").agg(
        F.min(F.col(y_col)).alias("__bmin__")
    )
    wpre = (
        Window.orderBy("__bkt__")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = per_bucket.select(
        "__bkt__", F.min("__bmin__").over(wpre).alias("__carry__")
    )
    dominated = (
        F.least(
            F.coalesce(F.col("__run__"), F.lit(float("inf"))),
            F.coalesce(F.col("__carry__"), F.lit(float("inf"))),
        )
        <= F.col(y_col)
    )
    return (
        tagged.join(F.broadcast(carry), "__bkt__")
        .withColumn("__run__", F.min(F.col(y_col)).over(wrun))
        .filter(~dominated)
        .select(x_col, y_col, count_col)
    )
