"""Bloom-filter semi-join reduction.

The 100 TB problem this solves: a fact-side semi-join against a
dimension subset normally either broadcasts the whole key set (fine
for small dims, but the broadcast grows with |dim|) or shuffles the
fact table on the join key (the expensive path). A Bloom filter is the
classic middle ground — a CONSTANT-SIZE bitmap (m bits, sized from
|dim| at build time) that the fact scan tests with k portable hashes,
discarding almost every non-matching row before any join or shuffle.
Spark's own runtime row-level filtering
(``spark.sql.optimizer.runtime.bloomFilter.enabled``) applies the same
idea inside AQE; this operator makes it an explicit, engine-portable
primitive whose hash family (:func:`portable_hash60`, md5-based) a
DuckDB oracle can reproduce bit-for-bit — ``might_contain`` semantics
become plain SQL set membership over the same positions.

Guarantees: NO false negatives ever (every true match passes); false
positives are bounded by the standard (1 − e^{−kn/m})^k and are
resolved by the residual exact join the caller keeps. Build cost is
one pass over the (small) dim side; the bitmap is ``m/64`` longs on
the driver — with the default 16 bits/key a 1M-key dim is a 2 MB
broadcast regardless of fact size.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tmdb_index_spark.functions.text import portable_hash60

__all__ = ["auto_m_bits", "build_bloom", "with_bloom_flag"]


def auto_m_bits(n_keys: int, bits_per_key: int = 16) -> int:
    """Power-of-two bitmap size from the build-side key count:
    ``2^ceil(log2(bits_per_key·n))``. Power-of-two keeps the modulo
    cheap and the formula is deterministic from ``COUNT(*)``, so an
    external oracle can derive the same ``m``."""
    return 1 << max(4, math.ceil(math.log2(bits_per_key * max(n_keys, 1))))


def _positions(key: Column, m_bits: int, k_hashes: int) -> list[Column]:
    return [
        F.pmod(portable_hash60(key, seed), F.lit(m_bits))
        for seed in range(k_hashes)
    ]


def build_bloom(
    df: DataFrame,
    key_col: str,
    m_bits: int,
    k_hashes: int = 3,
) -> list[int]:
    """One pass over the build side: explode each key into its k bit
    positions, OR them into 64-bit words with a partial-aggregated
    ``bit_or``, and collect the ≤ m/64 words to the driver (the only
    collect — it is the bitmap itself, not data)."""
    n_words = (m_bits + 63) // 64
    key = F.col(key_col).cast("string")
    words = (
        df.select(
            F.explode(
                F.array(*_positions(key, m_bits, k_hashes))
            ).alias("__pos__")
        )
        .select(
            F.shiftrightunsigned(F.col("__pos__"), 6).alias("__word__"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(__pos__ % 64 AS INT))"
            ).alias("__mask__"),
        )
        .groupBy("__word__")
        .agg(F.expr("bit_or(__mask__)").alias("__mask__"))
    )
    from tmdb_index_spark.operators.materialize import bounded_collect

    # ≤ one row per 64-bit word of the bitmap, by construction of
    # __word__ = pos >> 6 < m_bits/64 — enforced, not assumed
    words = bounded_collect(words, n_words, "bloom filter bitmap words")
    bitmap = [0] * n_words
    for row in words:
        bitmap[row["__word__"]] = row["__mask__"]
    return bitmap


def with_bloom_flag(
    df: DataFrame,
    key_col: str,
    bitmap: list[int],
    m_bits: int,
    k_hashes: int = 3,
    flag_col: str = "bloom_pass",
) -> DataFrame:
    """Map-only ``might_contain``: add ``flag_col`` = true iff ALL k
    hash positions of ``key_col`` are set in ``bitmap``. Pure column
    expressions against a SINGLE literal array — no join, no shuffle,
    whole-stage codegen keeps it JVM-side.

    The bitmap must be one ``Literal`` of ``ArrayType`` (``F.lit`` on
    the whole list), NOT ``F.array(*[F.lit(w) ...])``: the latter is
    one expression node per 64-bit word, and at the docstring's
    advertised sizing (1M-key dim × 16 bits/key → 2^24 bits → 262,144
    words) a per-word expression tree blows up Catalyst analysis,
    codegen, and per-task plan serialization — the "constant-size
    broadcast" claim only holds when the bitmap is a single constant
    (regression-tested at 2^20 bits in ``test_bloom.py``)."""
    key = F.col(key_col).cast("string")
    out = df.withColumn(
        "__bwords__",
        F.lit([int(w) for w in bitmap]).cast("array<bigint>"),
    )
    tests = []
    for seed, pos in enumerate(_positions(key, m_bits, k_hashes)):
        pc = f"__bpos{seed}__"
        out = out.withColumn(pc, pos)
        tests.append(
            f"(element_at(__bwords__,"
            f" CAST(shiftrightunsigned({pc}, 6) AS INT) + 1)"
            f" & shiftleft(CAST(1 AS BIGINT), CAST({pc} % 64 AS INT)))"
            f" != 0"
        )
    out = out.withColumn(flag_col, F.expr(" AND ".join(tests)))
    return out.drop(
        "__bwords__", *[f"__bpos{s}__" for s in range(k_hashes)]
    )
