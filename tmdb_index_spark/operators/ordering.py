"""Deterministic global ordering without a global funnel.

A training pipeline needs a reproducible global order twice: to
shuffle a corpus deterministically (fixed seed → same training order
on every run) and to assign contiguous positions (shard offsets,
resume points). The naive Spark spelling —
``row_number() OVER (ORDER BY key)`` — is an ``Exchange
SinglePartition``: every row through ONE task, the canonical
100 TB-killer. And the tempting fix — ``repartitionByRange`` + a
per-partition offset pass — is subtly broken: the range sampler draws
new boundaries per JOB, so a separate counting job can disagree with
the positioning job's partitions.

:func:`global_row_positions` instead derives buckets from the DATA in
one lineage:

1. bucket = a monotone function of the key (equal keys → equal
   bucket), scaled into ``buckets`` bins from the key's [min, max]
   (1-row aggregate, broadcast — never collected);
2. per-bucket counts → exclusive running offsets (a window over
   |buckets| rows — bounded by the bucket count, not by N);
3. position = bucket offset + (row_number within bucket − 1); the
   within-bucket window partitions by bucket, fully parallel.

Because the bucket function is monotone in the key, bucket-major order
IS global key order, and positions are exact 0..N−1 ranks —
deterministic for any partitioning, any cluster size, any sampler.

Balance caveat: bucket sizes mirror the key distribution. For the
shuffle use-case the key is a uniform md5 hash, so buckets are even;
for skewed natural keys positions stay CORRECT but one bucket may
dominate — pass a hash of the key instead when balance matters.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["global_row_positions", "deterministic_shuffle"]


def global_row_positions(
    df: DataFrame,
    key_col: str,
    tiebreak: list[str] | None = None,
    pos_col: str = "pos",
    buckets: int | None = None,
) -> DataFrame:
    """Append ``pos_col``: the 0-based global rank of each row under
    ``(key_col, *tiebreak)`` ascending. ``key_col`` must be numeric;
    ``(key_col, *tiebreak)`` must be a total order (unique) or
    equal rows receive arbitrary-but-disjoint positions.
    """
    tb = tiebreak or []
    b = buckets or df.sparkSession.sparkContext.defaultParallelism
    key = F.col(key_col)
    mm = df.agg(
        F.min(key).cast("double").alias("__lo__"),
        F.max(key).cast("double").alias("__hi__"),
    )
    # monotone in key; equal keys -> equal bucket; max key -> bucket b-1
    bucket = F.least(
        F.floor(
            (key.cast("double") - F.col("__lo__"))
            * b
            / (F.col("__hi__") - F.col("__lo__") + 1.0)
        ),
        F.lit(b - 1),
    ).cast("long")
    tagged = df.crossJoin(F.broadcast(mm)).withColumn("__bkt__", bucket)
    # |buckets| rows: the one intentionally-tiny single-partition window
    counts = tagged.groupBy("__bkt__").agg(F.count(F.lit(1)).alias("__cnt__"))
    woff = Window.orderBy("__bkt__").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = counts.select(
        "__bkt__",
        (F.sum("__cnt__").over(woff) - F.col("__cnt__")).alias("__off__"),
    )
    w = Window.partitionBy("__bkt__").orderBy(
        key, *[F.col(c) for c in tb]
    )
    return (
        tagged.join(F.broadcast(offsets), "__bkt__")
        .withColumn(
            pos_col,
            (F.row_number().over(w) - 1 + F.col("__off__")).cast("long"),
        )
        .drop("__bkt__", "__off__", "__lo__", "__hi__")
    )


def deterministic_shuffle(
    df: DataFrame,
    key_col: str,
    seed: int = 0,
    pos_col: str = "pos",
    buckets: int | None = None,
) -> DataFrame:
    """Reproducible corpus shuffle: order rows by the portable 60-bit
    md5 hash of ``key_col`` (salted with ``seed``), tiebroken by the
    key itself, and assign contiguous positions 0..N−1. Same seed →
    same training order on every run, any cluster size. The hash key
    is uniform, so buckets — and the position windows — stay balanced.
    """
    from tmdb_index_spark.functions.text import portable_hash60

    h = portable_hash60(F.col(key_col).cast("string"), seed=seed)
    return global_row_positions(
        df.withColumn("__shufkey__", h),
        "__shufkey__",
        tiebreak=[key_col],
        pos_col=pos_col,
        buckets=buckets,
    ).drop("__shufkey__")
