"""Deterministic sampling / dataset splitting for training pipelines.

Random splits are useless at 100 TB — reruns must land every row in the
same split without storing assignments. Both operators key off the
engine-portable md5 hash, so the same row lands in the same
split/sample in any engine, any partitioning, any rerun:

* :func:`hash_split` — train/test/val by hash-mod buckets over a key.
* :func:`hash_sample` — a deterministic ~fraction sample.

Map-only; no shuffle, no RNG state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tmdb_index_spark.functions.text import portable_hash60

__all__ = ["hash_split", "hash_sample", "split_column", "stratified_sample"]

#: Granularity of split fractions (hash buckets).
_BUCKETS = 10_000


def _bucket(key: Column) -> Column:
    return portable_hash60(key.cast("string")) % _BUCKETS


def split_column(
    key: Column | str, fractions: dict[str, float]
) -> Column:
    """Split-name column from hash buckets over ``key``. ``fractions``
    maps names to fractions summing to ≤ 1; remainder rows get null
    (useful as a holdout)."""
    c = F.col(key) if isinstance(key, str) else key
    b = _bucket(c)
    expr = F.lit(None).cast("string")
    upper = 0.0
    bounds = []
    for name, frac in fractions.items():
        lower = upper
        upper += frac
        bounds.append((name, int(lower * _BUCKETS), int(upper * _BUCKETS)))
    if upper > 1.0 + 1e-9:
        raise ValueError(f"fractions sum to {upper} > 1")
    for name, lo, hi in reversed(bounds):
        expr = F.when((b >= lo) & (b < hi), F.lit(name)).otherwise(expr)
    return expr


def hash_split(
    df: DataFrame, key: str, fractions: dict[str, float], col: str = "split"
) -> DataFrame:
    """Append a deterministic split column (e.g. ``{"train": 0.9,
    "test": 0.1}``)."""
    return df.withColumn(col, split_column(key, fractions))


def hash_sample(df: DataFrame, key: str, fraction: float) -> DataFrame:
    """Deterministic ~``fraction`` subset by hash bucket."""
    if not 0 <= fraction <= 1:
        raise ValueError("fraction must be in [0, 1]")
    return df.filter(_bucket(F.col(key)) < int(fraction * _BUCKETS))


def stratified_sample(
    df: DataFrame, strata_col: str, key: str, fractions: dict[str, float]
) -> DataFrame:
    """Deterministic per-stratum sampling: each stratum keeps its own
    hash-bucket fraction (e.g. downsample the dominant class, keep all
    of the rare one — the class-rebalancing shape). Strata absent from
    ``fractions`` are dropped; still map-only, no shuffle, no RNG —
    ``df.sampleBy`` gives approximate, seed-dependent strata instead.
    """
    for name, frac in fractions.items():
        if not 0 <= frac <= 1:
            raise ValueError(f"fraction for {name!r} must be in [0, 1]")
    b = _bucket(F.col(key))
    thresh = F.lit(None).cast("int")
    for name, frac in fractions.items():
        thresh = F.when(
            F.col(strata_col) == name, F.lit(int(frac * _BUCKETS))
        ).otherwise(thresh)
    return df.filter(b < thresh)
