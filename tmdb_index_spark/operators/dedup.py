"""Key-dedup operators (SURVEY.md §2.5 D2/D3/D4/D6).

Polars' ``unique(keep="first"/"last", maintain_order=True)`` depends on
physical row order, which a distributed relation does not have.  Every
dedup here therefore takes an EXPLICIT order column — an arrival index,
source priority, or timestamp — and resolves winners with a
``row_number`` window.  Callers that fold ordered feeds (e.g. per-day
changes batches) attach the day index as the order column
(reference call sites: tmdb_index.py:104,214,344-348).

Scale notes: one shuffle on the key; AQE skew-join/partition-coalescing
applies.  For the 100 TB path, pre-bucketing the table by the dedup key
removes the shuffle entirely.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["dedup_keep_last", "dedup_keep_first", "duplicate_ids"]


def _dedup(
    df: DataFrame, keys: Sequence[str], order: Sequence[Column | str], desc: bool
) -> DataFrame:
    cols = [F.col(c) if isinstance(c, str) else c for c in order]
    ordering = [c.desc() for c in cols] if desc else [c.asc() for c in cols]
    w = Window.partitionBy(*keys).orderBy(*ordering)
    return (
        df.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") == 1)
        .drop("__rn__")
    )


def dedup_keep_last(
    df: DataFrame, keys: Sequence[str] = ("id",), order: Sequence[Column | str] = ()
) -> DataFrame:
    """Keep the row with the HIGHEST ``order`` value per key (the
    reference's keep-last over arrival order, tmdb_index.py:104,214)."""
    if not order:
        raise ValueError("keep-last needs an explicit order column (arrival index)")
    return _dedup(df, keys, order, desc=True)


def dedup_keep_first(
    df: DataFrame, keys: Sequence[str] = ("id",), order: Sequence[Column | str] = ()
) -> DataFrame:
    """Keep the row with the LOWEST ``order`` value per key (the
    reference's sort-then-keep-first for export id collisions,
    tmdb_index.py:344-348)."""
    if not order:
        raise ValueError("keep-first needs an explicit order column (source priority)")
    return _dedup(df, keys, order, desc=False)


def duplicate_ids(df: DataFrame, key: str = "id") -> DataFrame:
    """Keys occurring more than once (reference ``duplicate_ids``,
    tmdb_index.py:327-328).  Returns a one-column DataFrame of keys;
    partial aggregation makes this map-side-combining, no window."""
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("__n__"))
        .filter(F.col("__n__") > 1)
        .select(key)
    )
