"""Row-identity hashing (SURVEY.md §2.2 P13).

Reference uses ``df.hash_rows()`` (tmdb_index.py:129) purely for
equality structure; we use ``xxhash64`` over all columns.  Hash VALUES
differ between engines by design — only equal-rows→equal-hash matters.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["row_hash"]


def row_hash(df: DataFrame, *cols: str) -> Column:
    """64-bit hash over ``cols`` (default: all columns, in order)."""
    use = list(cols) if cols else df.columns
    return F.xxhash64(*use)
