from __future__ import annotations

import tempfile

import pytest

from tmdb_index_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    # Isolated warehouse: catalog tables (bucketed-store tests) must not
    # leak into the repo or collide with leftovers from prior sessions.
    warehouse = tempfile.mkdtemp(prefix="tmdb_index_spark_warehouse_")
    s = get_spark(
        "tmdb_index_spark_tests",
        shuffle_partitions=4,
        extra_conf={"spark.sql.warehouse.dir": warehouse},
    )
    yield s


def rows(df, order_by="id"):
    """Sorted-collect comparison helper: list of dicts ordered by key."""
    if order_by and order_by in df.columns:
        df = df.orderBy(order_by)
    return [r.asDict() for r in df.collect()]
