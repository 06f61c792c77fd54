"""Declared schemas for the index table and its three feeds.

Type-mapping decisions (SURVEY.md §1.3; reference tmdb_index.py:28-59):

* Polars ``UInt32`` → Spark ``LongType``.  Spark has no unsigned types;
  ``IntegerType`` would overflow at 2^31 while UInt32 reaches 2^32-1.
* Polars ``Datetime(ns)`` → Spark ``TimestampType`` (µs).  Sub-µs
  precision loss is an accepted, documented semantic delta.
* Column ORDER is significant: the reference asserts exact column order
  in its tests, so every schema here is an ordered StructType and the
  engine preserves declared order through schema evolution.
"""

from __future__ import annotations

from pyspark.sql import types as T

__all__ = [
    "ENTITY_TYPES",
    "UINT32_MAX",
    "empty_index_schema",
    "index_schema",
    "changes_schema",
    "export_schema",
    "external_ids_schema",
]

#: TMDB entity types (reference tmdb_index.py:20).
ENTITY_TYPES = ("movie", "tv", "person")

#: Upper bound of the reference's UInt32 id domain (tmdb_index.py:28).
UINT32_MAX = 2**32 - 1


def empty_index_schema() -> T.StructType:
    """Bootstrap schema for a fresh index (reference tmdb_index.py:672)."""
    return T.StructType([T.StructField("id", T.LongType(), False)])


def index_schema(entity_type: str = "movie") -> T.StructType:
    """Full index schema after a complete ``process`` run.

    Mirrors the observed post-process shape (reference
    test_tmdb_index.py:497-506,535-545); ``tvdb_id`` exists for tv only
    (tmdb_index.py:46,461-464).
    """
    fields = [
        T.StructField("id", T.LongType(), False),
        T.StructField("date", T.DateType(), True),
        T.StructField("adult", T.BooleanType(), True),
        T.StructField("in_export", T.BooleanType(), True),
        T.StructField("success", T.BooleanType(), True),
        T.StructField("retrieved_at", T.TimestampType(), True),
        T.StructField("imdb_numeric_id", T.LongType(), True),
    ]
    if entity_type == "tv":
        fields.append(T.StructField("tvdb_id", T.LongType(), True))
    fields.append(T.StructField("wikidata_numeric_id", T.LongType(), True))
    return T.StructType(fields)


def changes_schema() -> T.StructType:
    """One day of the changes feed (reference tmdb_index.py:178-183,211)."""
    return T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("adult", T.BooleanType(), True),
            T.StructField("date", T.DateType(), False),
        ]
    )


def export_schema() -> T.StructType:
    """Daily ID export batch (reference tmdb_index.py:316-321)."""
    return T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("in_export", T.BooleanType(), False),
        ]
    )


def external_ids_schema(entity_type: str = "movie") -> T.StructType:
    """External-ids enrichment batch (reference tmdb_index.py:30-59).

    ``success=False`` encodes a 404: all other columns null except id
    and retrieved_at.
    """
    fields = [
        T.StructField("success", T.BooleanType(), True),
        T.StructField("id", T.LongType(), False),
        T.StructField("retrieved_at", T.TimestampType(), True),
        T.StructField("imdb_numeric_id", T.LongType(), True),
    ]
    if entity_type == "tv":
        fields.append(T.StructField("tvdb_id", T.LongType(), True))
    fields.append(T.StructField("wikidata_numeric_id", T.LongType(), True))
    return T.StructType(fields)
