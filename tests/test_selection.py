"""Work-selection tests (SURVEY.md D9/D10, P7/P8)."""

from __future__ import annotations

from datetime import date, datetime

from tests.conftest import rows
from tmdb_index_spark.operators.selection import (
    build_fetch_worklist,
    select_backfill_candidates,
    select_refresh_candidates,
    select_stale_candidates,
)

SCHEMA = "id long, date date, retrieved_at timestamp"


def _frame(spark):
    return spark.createDataFrame(
        [
            # changed after fetch → stale
            (0, date(2024, 5, 2), datetime(2024, 5, 1, 12)),
            # fetched after change → fresh
            (1, date(2024, 4, 1), datetime(2024, 5, 1, 12)),
            # never fetched → backfill candidates
            (2, date(2024, 5, 1), None),
            (3, None, None),
            # old fetches → refresh candidates
            (4, None, datetime(2023, 1, 1)),
            (5, None, datetime(2023, 2, 1)),
        ],
        SCHEMA,
    )


def test_stale(spark):
    assert [r["id"] for r in rows(select_stale_candidates(_frame(spark)))] == [0]


def test_stale_same_day_counts(spark):
    # change date == trunc(fetch day) → stale (>=, reference :491-495)
    df = spark.createDataFrame([(0, date(2024, 5, 1), datetime(2024, 5, 1, 23))], SCHEMA)
    assert [r["id"] for r in rows(select_stale_candidates(df))] == [0]


def test_backfill_limit_in_id_order(spark):
    out = select_backfill_candidates(_frame(spark), limit=1)
    assert [r["id"] for r in rows(out)] == [2]
    out2 = select_backfill_candidates(_frame(spark), limit=10)
    assert [r["id"] for r in rows(out2)] == [2, 3]


def test_backfill_without_retrieved_at_column(spark):
    df = spark.createDataFrame([(3,), (1,), (2,)], "id long")
    out = select_backfill_candidates(df, limit=2)
    assert [r["id"] for r in rows(out)] == [1, 2]


def test_refresh_oldest_first(spark):
    out = select_refresh_candidates(_frame(spark), limit=1)
    assert [r["id"] for r in rows(out)] == [4]
    out2 = select_refresh_candidates(_frame(spark), limit=10)
    assert sorted(r["id"] for r in rows(out2)) == [0, 1, 4, 5]


def test_worklist_union_distinct(spark):
    out = build_fetch_worklist(_frame(spark), backfill_limit=10, refresh_limit=1)
    assert sorted(r["id"] for r in rows(out)) == [0, 2, 3, 4]
