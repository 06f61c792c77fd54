"""Scalar/column expression library — all JVM-side built-ins, zero UDFs
in the reference-parity surface (SURVEY.md §2.7: the reference has no
UDFs either; regex + clamping are expressible with built-ins)."""

from tmdb_index_spark.functions.extract import (
    clamp_uint32,
    extract_numeric_id,
    imdb_numeric_id,
    wikidata_numeric_id,
)
from tmdb_index_spark.functions.hashing import row_hash

__all__ = [
    "clamp_uint32",
    "extract_numeric_id",
    "imdb_numeric_id",
    "wikidata_numeric_id",
    "row_hash",
]
