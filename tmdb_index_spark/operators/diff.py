"""Row-identity diffing (SURVEY.md §2.6 C7, §2.2 P13).

The reference diffs positionally — ``df[:min_len].hash_rows() !=
other[:min_len].hash_rows()`` (tmdb_index.py:117-132) — which is valid
only because row position == id (the dense-key invariant).  Here the
same comparison is keyed: join old and new on ``id`` for ids below the
common length and compare per-side row hashes.

``xxhash64`` values differ from Polars' ``hash_rows`` — only the
EQUALITY STRUCTURE matters (equal rows hash equal), which both satisfy.
If the two frames have different column sets, every joined row hashes
different — same outcome as the reference (hash over different widths).

Scale notes: one shuffle on ``id`` for the join (or zero if both sides
are bucketed by id); the hash is computed map-side inside codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["change_summary", "change_summary_df"]


def change_summary(df_old: DataFrame, df_new: DataFrame) -> tuple[int, int, int]:
    """(added, removed, updated) between two dense-id frames (reference
    ``change_summary``, tmdb_index.py:117-132).

    added/removed are length deltas (the dense invariant means growth is
    append-only); updated counts common-id rows whose row hash changed.
    """
    old_len = df_old.count()
    new_len = df_new.count()
    added = max(0, new_len - old_len)
    removed = max(0, old_len - new_len)
    min_len = min(old_len, new_len)

    old_h = df_old.filter(F.col("id") < min_len).select(
        "id", F.xxhash64(*df_old.columns).alias("__h_old__")
    )
    new_h = df_new.filter(F.col("id") < min_len).select(
        "id", F.xxhash64(*df_new.columns).alias("__h_new__")
    )
    updated = (
        old_h.join(new_h, on="id", how="inner")
        .filter(F.col("__h_old__") != F.col("__h_new__"))
        .count()
    )
    return added, removed, updated


def change_summary_df(df_old: DataFrame, df_new: DataFrame) -> DataFrame:
    """Single-row DataFrame form of :func:`change_summary` (for the
    oracle harness)."""
    added, removed, updated = change_summary(df_old, df_new)
    spark = df_new.sparkSession
    return spark.createDataFrame(
        [(added, removed, updated)], "added long, removed long, updated long"
    )
