"""Registry-identity invariants across the queries package split.

The round-10 split of queries.py into a package must never change the
driver-facing contract: the exact catalog key set, the oracle coverage
partition (static / dynamic / rows-only), and the callability of every
entry. The manifest file pins the key set — adding or removing a
catalog query is a deliberate act that updates the manifest in the
same commit.
"""

from __future__ import annotations

import os

from tmdb_index_spark.queries import (
    DYNAMIC_ORACLE_BUILDERS,
    ORACLES,
    QUERIES,
    ROWS_ONLY_QUERIES,
)

_MANIFEST = os.path.join(
    os.path.dirname(__file__), "fixtures", "catalog_keys.txt"
)


def test_catalog_key_set_matches_manifest():
    pinned = set(open(_MANIFEST).read().split())
    assert set(QUERIES) == pinned, (
        f"catalog drifted from manifest: +{sorted(set(QUERIES) - pinned)} "
        f"-{sorted(pinned - set(QUERIES))} — update "
        "tests/fixtures/catalog_keys.txt deliberately in the same change"
    )


def test_every_query_has_exactly_one_oracle_contract():
    static = set(ORACLES)
    dynamic = set(DYNAMIC_ORACLE_BUILDERS)
    rows_only = set(ROWS_ONLY_QUERIES)
    assert static <= set(QUERIES)
    assert dynamic <= set(QUERIES)
    assert rows_only <= set(QUERIES)
    # no query claims two contract kinds
    assert not static & dynamic
    assert not static & rows_only
    assert not dynamic & rows_only
    # full partition: everything is value-checkable or declared rows-only
    uncovered = set(QUERIES) - static - dynamic - rows_only
    assert not uncovered, f"queries with no oracle contract: {sorted(uncovered)}"


def test_registries_are_callable_and_sql():
    for name, fn in QUERIES.items():
        assert callable(fn), name
    for name, sql in ORACLES.items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name
    for name, build in DYNAMIC_ORACLE_BUILDERS.items():
        assert callable(build), name
