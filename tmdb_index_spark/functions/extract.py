"""Numeric-ID extraction and range clamping (SURVEY.md §2.2 P10/P11).

Reference behavior (tmdb_index.py:22-26,405-411,430-440):

* per-entity-type regex patterns pull the numeric part out of IMDb
  (``tt123``/``nm123``), Wikidata (``Q123``) identifiers; no match → null;
* extracted values outside the UInt32 domain are clamped to null.

Implemented as pure Column expressions — they stay inside whole-stage
codegen; no Python round-trips.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from tmdb_index_spark.schemas import UINT32_MAX

__all__ = [
    "IMDB_PATTERNS",
    "extract_numeric_id",
    "imdb_numeric_id",
    "wikidata_numeric_id",
    "clamp_uint32",
]

#: IMDb id prefix per entity type (reference tmdb_index.py:22-26):
#: movie/tv ids look like ``tt0111161``, person ids like ``nm0000151``.
IMDB_PATTERNS = {
    "movie": r"tt(\d+)",
    "tv": r"tt(\d+)",
    "person": r"nm(\d+)",
}

WIKIDATA_PATTERN = r"Q(\d+)"


def extract_numeric_id(col: Column | str, pattern: str) -> Column:
    """``regexp_extract`` group 1 as long; empty match → null (Spark's
    regexp_extract returns '' on no match, which must not cast to 0)."""
    c = F.col(col) if isinstance(col, str) else col
    digits = F.regexp_extract(c, pattern, 1)
    return clamp_uint32(F.when(digits != "", digits.cast("long")))


def imdb_numeric_id(col: Column | str, entity_type: str = "movie") -> Column:
    """IMDb numeric id for the given entity type (reference
    tmdb_index.py:430-434)."""
    return extract_numeric_id(col, IMDB_PATTERNS[entity_type])


def wikidata_numeric_id(col: Column | str) -> Column:
    """Wikidata numeric id (reference tmdb_index.py:436-440)."""
    return extract_numeric_id(col, WIKIDATA_PATTERN)


def clamp_uint32(col: Column | str) -> Column:
    """Null out values outside [0, 2^32-1] (reference ``_clamp_uint32``,
    tmdb_index.py:405-411 — the reference also warns; warning is a
    driver-side concern, the column semantic is the clamp)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.between(0, UINT32_MAX), c)
