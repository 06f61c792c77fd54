"""Distribution-drift detection between two cohorts of one column.

No reference counterpart (tmdb_index.py profiles single snapshots —
null/true/unique counts, tmdb_index.py:478-516); this is the
train-vs-serve / yesterday-vs-today monitor an ML data platform runs
on every feature: histogram both cohorts on a SHARED binning, smooth,
and compare with KL divergence (both directions — KL is asymmetric)
and the bounded, symmetric Jensen-Shannon divergence (log2, so JSD ∈
[0, 1]).

Scale shape: the shared bin grid comes from the global min/max over
BOTH cohorts (a 1-row aggregate, broadcast — using per-cohort ranges
would silently compare different grids); the histogram is one
partial-aggregated groupBy producing ≤ 2·bins rows; all divergence
arithmetic runs on that tiny frame. One full-data pass, one shuffle
of bin-count partials, nothing proportional to N after that.

Determinism: binning is the floor-before-cast arithmetic shared with
``value_histogram`` (DuckDB's double→int cast rounds where Spark
truncates — FLOOR first on both engines); smoothing is add-one over
the full grid so empty bins are defined; divergences are double math
over ≤ bins terms, rounded before comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["histogram_kl"]


def histogram_kl(
    df: DataFrame,
    value_col: str,
    side_col: str,
    side_a: str,
    side_b: str,
    bins: int = 20,
    round_to: int = 4,
) -> DataFrame:
    """Drift of ``value_col`` between the rows where ``side_col``
    equals ``side_a`` (cohort P) vs ``side_b`` (cohort Q). Rows in
    neither cohort are ignored; NULL values are ignored (a histogram
    has no NULL bin — profile NULL rates separately).

    Returns one row: ``(n_a, n_b, n_bins, kl_ab, kl_ba, jsd)`` with
    divergences in bits (log2), rounded to ``round_to``. An empty
    cohort still produces a defined (smoothing-mass-only) result —
    check ``n_a``/``n_b`` before trusting the divergence; if BOTH
    cohorts are empty every metric is NULL.
    """
    if bins < 2:
        raise ValueError(f"bins must be >= 2, got {bins}")
    v = F.col(value_col).cast("double")
    side = F.when(F.col(side_col) == side_a, F.lit("a")).when(
        F.col(side_col) == side_b, F.lit("b")
    )
    rows = df.select(side.alias("__side__"), v.alias("__v__")).filter(
        F.col("__side__").isNotNull() & F.col("__v__").isNotNull()
    )
    mm = rows.agg(
        F.min("__v__").alias("__lo__"), F.max("__v__").alias("__hi__")
    )
    bucket = F.least(
        F.floor(
            (F.col("__v__") - F.col("__lo__"))
            * bins
            / (F.col("__hi__") - F.col("__lo__") + F.lit(1.0))
        ).cast("long"),
        F.lit(bins - 1),
    )
    counts = (
        rows.crossJoin(F.broadcast(mm))
        .select(F.col("__side__"), bucket.alias("__b__"))
        .groupBy("__side__", "__b__")
        .agg(F.count(F.lit(1)).alias("__c__"))
    )
    # pivot to (bin, c_a, c_b) on the tiny aggregated frame; absent
    # bins contribute their smoothing mass via the n_bins term below
    wide = counts.groupBy("__b__").agg(
        F.sum(F.when(F.col("__side__") == "a", F.col("__c__")).otherwise(0)).alias("__ca__"),
        F.sum(F.when(F.col("__side__") == "b", F.col("__c__")).otherwise(0)).alias("__cb__"),
    )
    tot = wide.agg(
        F.sum("__ca__").alias("__na__"), F.sum("__cb__").alias("__nb__")
    )
    t = wide.crossJoin(F.broadcast(tot))
    p = (F.col("__ca__") + 1) / (F.col("__na__") + bins)
    q = (F.col("__cb__") + 1) / (F.col("__nb__") + bins)
    m = (p + q) / 2
    per_bin = t.select(
        "__na__",
        "__nb__",
        (p * F.log2(p / q)).alias("__klab__"),
        (q * F.log2(q / p)).alias("__klba__"),
        (p / 2 * F.log2(p / m) + q / 2 * F.log2(q / m)).alias("__jsd__"),
    )
    agg = per_bin.groupBy("__na__", "__nb__").agg(
        F.count(F.lit(1)).alias("__occ__"),
        F.sum("__klab__").alias("__sab__"),
        F.sum("__klba__").alias("__sba__"),
        F.sum("__jsd__").alias("__sjs__"),
    )
    # empty-bin correction: each of the (bins - occ) absent bins has
    # count 0 on both sides, i.e. p0 = 1/(n_a+bins), q0 = 1/(n_b+bins)
    na, nb = F.col("__na__"), F.col("__nb__")
    occ = F.col("__occ__")
    p0 = 1.0 / (na + bins)
    q0 = 1.0 / (nb + bins)
    m0 = (p0 + q0) / 2
    empty = (F.lit(bins) - occ).cast("double")
    out = agg.select(
        na.cast("bigint").alias("n_a"),
        nb.cast("bigint").alias("n_b"),
        F.lit(bins).cast("bigint").alias("n_bins"),
        F.round(
            F.col("__sab__") + empty * p0 * F.log2(p0 / q0), round_to
        ).alias("kl_ab"),
        F.round(
            F.col("__sba__") + empty * q0 * F.log2(q0 / p0), round_to
        ).alias("kl_ba"),
        F.round(
            F.col("__sjs__")
            + empty * (p0 / 2 * F.log2(p0 / m0) + q0 / 2 * F.log2(q0 / m0)),
            round_to,
        ).alias("jsd"),
    )
    return out
