"""Declarative data-quality constraint checks.

Generalizes the reference's single hard-coded invariant — the dense
surrogate-key check (``/root/reference/tmdb_index.py:107-114``,
re-expressed in :func:`tmdb_index_spark.operators.upsert.validate_id`)
— into a composable check family a training-data pipeline runs per
batch: uniqueness, non-null, value ranges, and referential integrity.

Each check returns a 1-row ``(check, n_violations)`` frame;
:func:`run_checks` unions them into one summary. All checks are
single-aggregate or anti-join shaped — no check is ever more expensive
than one shuffle over the audited column(s), and unioned checks over
the same table share the scan after Spark's common-subexpression reuse.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _summary(name: str, count_df: DataFrame) -> DataFrame:
    return count_df.select(
        F.lit(name).alias("check"),
        F.col("n").cast("long").alias("n_violations"),
    )


def check_unique(df: DataFrame, cols: list[str], name: str | None = None) -> DataFrame:
    """Rows participating in a duplicated key (0 when ``cols`` is a
    candidate key). Counts ALL members of duplicate groups, not just
    the extras, so the number reads as 'rows you must inspect'."""
    dupes = (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("__c__"))
        .filter(F.col("__c__") > 1)
        .agg(F.coalesce(F.sum("__c__"), F.lit(0)).alias("n"))
    )
    return _summary(name or f"unique({','.join(cols)})", dupes)


def check_non_null(df: DataFrame, col: str, name: str | None = None) -> DataFrame:
    nulls = df.agg(
        F.count(F.when(F.col(col).isNull(), 1)).alias("n")
    )
    return _summary(name or f"non_null({col})", nulls)


def check_range(
    df: DataFrame,
    col: str,
    lo: float | None = None,
    hi: float | None = None,
    name: str | None = None,
) -> DataFrame:
    """Non-null values outside [lo, hi] (either bound optional)."""
    cond = F.lit(False)
    if lo is not None:
        cond = cond | (F.col(col) < lo)
    if hi is not None:
        cond = cond | (F.col(col) > hi)
    out = df.agg(F.count(F.when(cond, 1)).alias("n"))
    return _summary(name or f"range({col})", out)


def check_foreign_key(
    child: DataFrame,
    col: str,
    parent: DataFrame,
    parent_col: str,
    name: str | None = None,
) -> DataFrame:
    """Child rows whose non-null key has no parent (left-anti join;
    broadcast when the parent key set is dimension-sized)."""
    orphans = (
        child.select(F.col(col)).filter(F.col(col).isNotNull())
        .join(
            parent.select(F.col(parent_col).alias(col)).distinct(),
            col,
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return _summary(name or f"fk({col})", orphans)


def run_checks(checks: list[DataFrame]) -> DataFrame:
    """Union per-check summaries into one ``(check, n_violations)``
    frame — the per-batch audit artifact."""
    if not checks:
        raise ValueError("run_checks needs at least one check")
    return reduce(DataFrame.unionByName, checks)


def fd_profile(
    df: DataFrame,
    candidates: list[tuple[str, str]],
) -> DataFrame:
    """Functional-dependency DISCOVERY — the complement of the
    declarative checks above: instead of asserting a known constraint,
    measure how close each candidate ``lhs → rhs`` dependency is to
    holding, the profiling signal schema-inference and data-contract
    tools are built on (e.g. Papenbrock & Naumann's FD-discovery
    framing, SIGMOD 2016 — here restricted to given candidates, which
    is the scalable production form).

    For each candidate: the number of distinct ``lhs`` groups, how
    many of those groups see more than one ``rhs`` value (violating
    groups), the violating ROW count, and the violation rate. An FD
    that holds exactly has 0 violating groups; near-FDs (rate under a
    few percent) are usually dirty data, not false rules.

    Plan: one ``(lhs, rhs)`` pair-count aggregate per candidate (two
    partial-aggregated groupBys — the pair collapse, then the group
    rollup), unioned; each candidate's work is bounded by its distinct
    pair count, never the row count, and candidates share the source
    scan under common-subexpression reuse."""
    if not candidates:
        raise ValueError("fd_profile needs at least one (lhs, rhs) candidate")
    outs = []
    for lhs, rhs in candidates:
        pairs = (
            df.groupBy(lhs, rhs)
            .agg(F.count(F.lit(1)).alias("__rows__"))
            .groupBy(lhs)
            .agg(
                F.count(F.lit(1)).alias("__nrhs__"),
                F.sum("__rows__").alias("__grows__"),
            )
        )
        outs.append(
            pairs.agg(
                F.lit(f"{lhs}->{rhs}").alias("candidate"),
                F.count(F.lit(1)).cast("bigint").alias("n_groups"),
                F.sum(F.when(F.col("__nrhs__") > 1, 1).otherwise(0))
                .cast("bigint")
                .alias("n_violating_groups"),
                F.sum(
                    F.when(F.col("__nrhs__") > 1, F.col("__grows__")).otherwise(
                        0
                    )
                )
                .cast("bigint")
                .alias("n_violating_rows"),
                F.round(
                    F.sum(
                        F.when(F.col("__nrhs__") > 1, F.col("__grows__"))
                        .otherwise(0)
                    ).cast("double")
                    / F.sum("__grows__").cast("double"),
                    6,
                ).alias("violation_rate"),
            )
        )
    return reduce(DataFrame.unionByName, outs)
