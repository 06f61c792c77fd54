"""Per-column profiling (SURVEY.md §2.6 C8, §2.4 A3-A6).

Reference ``compute_stats`` (tmdb_index.py:142-175) profiles every
column of the new frame — null count, true/false counts for booleans,
exact uniqueness of non-null values, and an updated-count against the
old frame — and renders a small all-string stats table.

Execution shape: ONE multi-aggregate pass over the new frame computes
every per-column statistic simultaneously (Catalyst fuses them into a
single scan + partial/final aggregate — no per-column scans), plus one
id-keyed full-outer-join pass against the old frame for updated counts.
The reference's positional null-padding (``_series_pad``,
tmdb_index.py:135-139) is the full outer join here: ids past the
shorter frame's length naturally pair with nulls.

Semantics preserved exactly:
* ``updated`` uses null-propagating ``!=`` — a change from null to
  value (or vice versa) is NOT counted (reference tmdb_index.py:161).
* ``unique`` is computed over non-null values only.
* formatting: ``"{n:,} ({n/row_count:.1%})"``; empty string for zero.

Delta: dtype strings are Spark's (``bigint``, ``boolean``, ...) rather
than Polars reprs (``u32``, ``bool``) — the engine's native types.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["compute_stats"]


def _fmt(n: int, row_count: int) -> str:
    if n == 0 or row_count == 0:
        return ""
    return f"{n:,} ({n / row_count:.1%})"


def compute_stats(
    df_old: DataFrame, df_new: DataFrame, approx: bool = False
) -> DataFrame:
    """All-string stats table ``{name, dtype, null, true, false, unique,
    updated}``, one row per column of ``df_new`` (reference
    tmdb_index.py:142-175).

    ``approx=True`` is the 100 TB path: ``approx_count_distinct`` (HLL,
    default 5% rsd) replaces the exact distinct count — same single-pass
    plan, bounded memory per column instead of an exact hash set. The
    uniqueness flag then tolerates the sketch's error margin. Exact
    remains the default for reference/oracle parity (SCALE.md).
    """
    spark = df_new.sparkSession
    dtypes = dict(df_new.dtypes)
    old_cols = set(df_old.columns)

    distinct_of = F.approx_count_distinct if approx else F.count_distinct

    # Pass 1: every per-column stat in one aggregate over df_new.
    aggs = [F.count(F.lit(1)).alias("__n__")]
    for c in df_new.columns:
        col = F.col(c)
        aggs.append(F.sum(col.isNull().cast("long")).alias(f"null__{c}"))
        aggs.append(distinct_of(col).alias(f"distinct__{c}"))
        aggs.append(F.count(col).alias(f"nonnull__{c}"))
        if dtypes[c] == "boolean":
            aggs.append(F.sum(col.cast("long")).alias(f"true__{c}"))
            aggs.append(F.sum((~col).cast("long")).alias(f"false__{c}"))
    stats = df_new.agg(*aggs).collect()[0].asDict()
    row_count = stats["__n__"]

    # Pass 2: updated counts — full outer join on id pads the shorter
    # frame with nulls (reference _series_pad); null-propagating !=
    # counts only both-non-null differences.
    shared = [c for c in df_new.columns if c in old_cols]
    updated: dict[str, int] = {c: 0 for c in df_new.columns}
    if shared and "id" in df_new.columns and "id" in df_old.columns:
        o = df_old.select("id", *[F.col(c).alias(f"__old_{c}") for c in shared if c != "id"])
        n = df_new.select("id", *[F.col(c).alias(f"__new_{c}") for c in shared if c != "id"])
        joined = n.join(o, on="id", how="outer")
        upd_aggs = []
        for c in shared:
            if c == "id":
                continue
            upd_aggs.append(
                F.sum(
                    (F.col(f"__new_{c}") != F.col(f"__old_{c}")).cast("long")
                ).alias(f"upd__{c}")
            )
        if upd_aggs:
            upd = joined.agg(*upd_aggs).collect()[0].asDict()
            for c in shared:
                if c != "id":
                    updated[c] = int(upd[f"upd__{c}"] or 0)

    rows = []
    for c in df_new.columns:
        is_bool = dtypes[c] == "boolean"
        nonnull = int(stats[f"nonnull__{c}"] or 0)
        distinct = int(stats[f"distinct__{c}"] or 0)
        # HLL error tolerance when approx: within 5% of nonnull counts
        # as "unique". Exact mode requires equality.
        unique = (
            distinct == nonnull
            if not approx
            else nonnull > 0 and abs(distinct - nonnull) <= 0.05 * nonnull
        )
        rows.append(
            {
                "name": c,
                "dtype": dtypes[c],
                "null": _fmt(int(stats[f"null__{c}"] or 0), row_count),
                "true": _fmt(int(stats[f"true__{c}"] or 0), row_count) if is_bool else "",
                "false": _fmt(int(stats[f"false__{c}"] or 0), row_count) if is_bool else "",
                "unique": "true" if unique else "",
                "updated": _fmt(updated[c], row_count),
            }
        )
    return spark.createDataFrame(
        rows,
        "name string, dtype string, null string, true string, false string, "
        "unique string, updated string",
    )
