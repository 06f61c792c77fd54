"""Work-selection operators (SURVEY.md §2.5 D9/D10, §2.2 P7/P8).

The reference picks which ids to (re)fetch from the external-ids API:

* rows whose last change is newer than their last fetch
  (``date >= retrieved_at`` rounded to day — tmdb_index.py:491-495);
* backfill: the first ``backfill_limit`` never-fetched rows in id order
  (ordinal rank — tmdb_index.py:497-511);
* refresh: the ``refresh_limit`` longest-unfetched rows
  (rank over ``retrieved_at`` — tmdb_index.py:516-520).

Deliberate semantic choice (SURVEY.md P8): the reference uses Polars
``dt.round("1d")`` (round-to-NEAREST day); we use ``date_trunc`` (floor).
The oracle SQL encodes the same floor so both sides agree; the delta
only moves afternoon fetches by one day of staleness.

Scale notes: a global rank is a single-partition sort at 100 TB — so
top-k selection is expressed as ``ORDER BY ... LIMIT k`` instead, which
Spark executes as TakeOrderedAndProject (per-partition heap of k, then
a k-sized merge on the driver — no global shuffle).  Ties are broken by
``id`` to keep results deterministic where the reference relied on
physical row order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "select_stale_candidates",
    "select_backfill_candidates",
    "select_refresh_candidates",
    "build_fetch_worklist",
]


def select_stale_candidates(df: DataFrame) -> DataFrame:
    """Rows changed since their last fetch (reference tmdb_index.py:491-495)."""
    if "date" not in df.columns or "retrieved_at" not in df.columns:
        return df.limit(0)
    return df.filter(
        F.col("date").isNotNull()
        & F.col("retrieved_at").isNotNull()
        & (F.col("date").cast("timestamp") >= F.date_trunc("day", F.col("retrieved_at")))
    )


def select_backfill_candidates(df: DataFrame, limit: int) -> DataFrame:
    """First ``limit`` never-fetched rows in id order (reference
    tmdb_index.py:497-511).  Rows with no ``retrieved_at`` column at all
    are all candidates (fresh index)."""
    if limit <= 0:
        return df.limit(0)
    if "retrieved_at" in df.columns:
        df = df.filter(F.col("retrieved_at").isNull())
    return df.orderBy("id").limit(limit)


def select_refresh_candidates(df: DataFrame, limit: int) -> DataFrame:
    """The ``limit`` oldest-fetched rows (reference tmdb_index.py:516-520).
    Nulls are excluded (Polars rank leaves them unranked); ties broken
    by id for determinism."""
    if limit <= 0 or "retrieved_at" not in df.columns:
        return df.limit(0)
    return (
        df.filter(F.col("retrieved_at").isNotNull())
        .orderBy(F.col("retrieved_at").asc(), F.col("id").asc())
        .limit(limit)
    )


def build_fetch_worklist(
    df: DataFrame, backfill_limit: int = 10_000, refresh_limit: int = 1_000
) -> DataFrame:
    """Distinct ids to fetch: stale ∪ backfill ∪ refresh (the OR of the
    reference's predicate list, tmdb_index.py:489-527)."""
    parts = [
        select_stale_candidates(df).select("id"),
        select_backfill_candidates(df, backfill_limit).select("id"),
        select_refresh_candidates(df, refresh_limit).select("id"),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.distinct()
