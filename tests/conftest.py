from __future__ import annotations

import pytest

from tmdb_index_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tmdb_index_spark_tests", shuffle_partitions=4)
    yield s


def rows(df, order_by="id"):
    """Sorted-collect comparison helper: list of dicts ordered by key."""
    if order_by and order_by in df.columns:
        df = df.orderBy(order_by)
    return [r.asDict() for r in df.collect()]
