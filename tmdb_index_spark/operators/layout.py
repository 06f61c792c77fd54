"""Z-order (Morton-curve) data layout for multi-dimensional skipping.

No reference counterpart (the reference sorts its single parquet file
by ``id`` only — tmdb_index.py:706-710); this is the lakehouse layout
step that makes min/max row-group statistics effective for MORE THAN
ONE filter column at once. Sorting 100 TB by ``(a)`` gives perfect
pruning on ``a`` and none on ``b``; writing in Z-order of ``(a, b)``
interleaves the bits of both, so contiguous Z-ranges cover small
rectangles in (a, b) space and row-group min/max stats prune on
EITHER predicate (the Delta/Iceberg OPTIMIZE ZORDER rationale).

Spark-first shape: the Z-key is pure integer column arithmetic
(quantize each dimension to ``bits`` levels between its min and max —
a 1-row aggregate, broadcast, never collected — then interleave bits
with shift/or folds), so it runs inside whole-stage codegen;
``zorder_repartition`` then range-partitions on the key, which is
Spark's sampled global sort — each output file covers one compact
Z-range. Quantization makes the key DATA-DERIVED but deterministic:
the same rows produce the same keys on any engine (the DuckDB oracle
reproduces them bit-for-bit), unlike hash-based clustering.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zorder_key", "zorder_repartition", "zorder_locality_stats"]


def _quantize(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Scale ``col`` from [lo, hi] onto the integer grid [0, 2^bits)."""
    levels = F.lit(float(2**bits))
    q = F.floor(
        (col.cast("double") - lo) * levels / (hi - lo + F.lit(1.0))
    ).cast("long")
    return F.least(q, F.lit(2**bits - 1))


def zorder_key(cols: list[Column], bits: int = 8) -> Column:
    """Interleave the low ``bits`` bits of already-quantized integer
    columns into one Morton key: bit ``i`` of column ``d`` lands at
    position ``i * len(cols) + d``. Columns must already be in
    ``[0, 2^bits)`` (see :func:`_quantize`)."""
    ndims = len(cols)
    if not 1 <= ndims <= 4:
        raise ValueError("zorder_key interleaves 1-4 columns")
    if not 1 <= bits <= 15:
        raise ValueError("bits must be in [1, 15]")
    z = F.lit(0).cast("long")
    for i in range(bits):
        for d, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, i * ndims + d)
    return z


def zorder_repartition(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    num_partitions: int | None = None,
    z_col: str = "__z__",
) -> DataFrame:
    """Cluster ``df`` for writing: quantize ``cols`` against their
    data min/max, range-partition on the Morton key, and sort within
    partitions by it — each output file then covers one compact
    rectangle per dimension, which is what row-group min/max skipping
    needs. One sampled range shuffle; the min/max probe is a 1-row
    broadcast aggregate."""
    mm = df.agg(
        *[
            f
            for c in cols
            for f in (
                F.min(F.col(c).cast("double")).alias(f"__lo_{c}__"),
                F.max(F.col(c).cast("double")).alias(f"__hi_{c}__"),
            )
        ]
    )
    qcols = [
        _quantize(
            F.col(c), F.col(f"__lo_{c}__"), F.col(f"__hi_{c}__"), bits
        )
        for c in cols
    ]
    tagged = df.crossJoin(F.broadcast(mm)).withColumn(
        z_col, zorder_key(qcols, bits)
    )
    tagged = tagged.drop(
        *[f"__lo_{c}__" for c in cols], *[f"__hi_{c}__" for c in cols]
    )
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    return tagged.repartitionByRange(n, F.col(z_col)).sortWithinPartitions(
        z_col
    )


def zorder_locality_stats(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    prefix_bits: int = 6,
) -> DataFrame:
    """Measure what Z-ordering buys: group rows by the top
    ``prefix_bits`` of their Morton key (a contiguous Z-range ≈ one
    file after :func:`zorder_repartition`) and report each range's
    row count plus per-dimension min/max span. Tight spans in EVERY
    dimension are exactly the property that makes min/max stats prune
    multi-column predicates. Deterministic integer arithmetic
    end-to-end, so an oracle reproduces it bit-for-bit.

    Returns ``(z_bucket, n_rows, <col>_min, <col>_max, ...)``.
    """
    if prefix_bits < 1 or prefix_bits > bits * len(cols):
        raise ValueError("prefix_bits must be in [1, bits * len(cols)]")
    mm = df.agg(
        *[
            f
            for c in cols
            for f in (
                F.min(F.col(c).cast("double")).alias(f"__lo_{c}__"),
                F.max(F.col(c).cast("double")).alias(f"__hi_{c}__"),
            )
        ]
    )
    qcols = [
        _quantize(
            F.col(c), F.col(f"__lo_{c}__"), F.col(f"__hi_{c}__"), bits
        )
        for c in cols
    ]
    z = zorder_key(qcols, bits)
    shift = bits * len(cols) - prefix_bits
    tagged = df.crossJoin(F.broadcast(mm)).withColumn(
        "z_bucket", F.shiftright(z, shift)
    )
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_rows")]
    for c in cols:
        aggs.append(F.min(F.col(c)).alias(f"{c}_min"))
        aggs.append(F.max(F.col(c)).alias(f"{c}_max"))
    return tagged.groupBy("z_bucket").agg(*aggs)
