"""As-of (point-in-time) join — an operator Spark lacks natively.

For each left row, attach the latest right row whose timestamp is at or
before the left's, per key. The classic implementations are a
range-condition join (O(n·m) per key without interval indexing) or a
per-key sort-merge; the Spark-idiomatic single-shuffle form used here:

1. union both sides with a side tag (right rows carry their payload,
   left rows carry null payload);
2. one window per key ordered by (ts, side) with
   ``last_value(payload, ignoreNulls=True)`` carrying the most recent
   right payload forward;
3. keep the left rows — each now holds the as-of right value.

One shuffle on the key (the window), no range cross-product, no skew
beyond the key's own row count — the same plan shape Flink's temporal
join and kdb's aj compile to. Right rows tie-breaking at equal ts:
``side`` orders right (0) before left (1), so a right row AT the left
timestamp is visible to it (inclusive as-of, matching DuckDB's
``ASOF JOIN ... ON l.ts >= r.ts`` semantics — the oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["as_of_join"]


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: tuple[str, ...] | None = None,
) -> DataFrame:
    """Left rows + the latest ``right`` values at-or-before their
    timestamp, per ``on`` key. Right-only ``value_cols`` (default: all
    non-key, non-ts right columns) appear nulled where no right row
    precedes the left row."""
    if value_cols is None:
        value_cols = tuple(c for c in right.columns if c not in (on, right_ts))

    l_tagged = left.select(
        F.col(on),
        F.col(left_ts).alias("__ts__"),
        F.lit(1).alias("__side__"),
        *[F.col(c) for c in left.columns if c not in (on, left_ts)],
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__r_{c}__") for c in value_cols],
    )
    r_tagged = right.select(
        F.col(on),
        F.col(right_ts).alias("__ts__"),
        F.lit(0).alias("__side__"),
        *[
            F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
            for c in left.columns
            if c not in (on, left_ts)
        ],
        *[F.col(c).alias(f"__r_{c}__") for c in value_cols],
    )
    unioned = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("__ts__").asc(), F.col("__side__").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(F.col(f"__r_{c}__"), ignorenulls=True)
            .over(w)
            .alias(f"__asof_{c}__")
            for c in value_cols
        ],
    )
    return (
        carried.filter(F.col("__side__") == 1)
        .select(
            F.col(on),
            F.col("__ts__").alias(left_ts),
            *[F.col(c) for c in left.columns if c not in (on, left_ts)],
            *[F.col(f"__asof_{c}__").alias(c) for c in value_cols],
        )
    )
