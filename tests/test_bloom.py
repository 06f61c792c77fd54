"""Bloom-filter semi-join reduction: correctness + plan properties.

The contract at 100 TB: the fact side is touched by MAP-ONLY column
expressions (hash, shift, mask against a constant-folded literal
bitmap) — no join, no shuffle — and the structure has zero false
negatives at any (m, k).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tmdb_index_spark.operators.bloom import (
    auto_m_bits,
    build_bloom,
    with_bloom_flag,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def dim_and_fact(spark):
    dim = (
        spark.read.parquet(f"{SF}/part.parquet")
        .filter(F.col("p_brand") == "Brand#11")
        .select("p_partkey")
        .distinct()
    )
    fact = spark.read.parquet(f"{SF}/lineitem.parquet").select("l_partkey")
    return dim, fact


def test_no_false_negatives(spark, dim_and_fact):
    dim, fact = dim_and_fact
    m = auto_m_bits(dim.count())
    bitmap = build_bloom(dim, "p_partkey", m, k_hashes=3)
    flagged = with_bloom_flag(fact, "l_partkey", bitmap, m, k_hashes=3)
    missed = (
        flagged.join(dim, flagged.l_partkey == dim.p_partkey, "left_semi")
        .filter(~F.col("bloom_pass"))
        .count()
    )
    assert missed == 0


def test_tiny_bitmap_still_sound(spark, dim_and_fact):
    """Even a saturating 16-bit bitmap (every position set) may only
    widen the pass set — never drop a true match."""
    dim, fact = dim_and_fact
    bitmap = build_bloom(dim, "p_partkey", 16, k_hashes=2)
    flagged = with_bloom_flag(fact, "l_partkey", bitmap, 16, k_hashes=2)
    missed = (
        flagged.join(dim, flagged.l_partkey == dim.p_partkey, "left_semi")
        .filter(~F.col("bloom_pass"))
        .count()
    )
    assert missed == 0


def test_bitmap_is_deterministic(spark, dim_and_fact):
    dim, _ = dim_and_fact
    m = auto_m_bits(dim.count())
    a = build_bloom(dim, "p_partkey", m, k_hashes=3)
    b = build_bloom(dim.repartition(7), "p_partkey", m, k_hashes=3)
    assert a == b  # partitioning-invariant (bit_or is commutative)


def test_auto_m_bits_power_of_two_and_monotone():
    sizes = [auto_m_bits(n) for n in (1, 10, 100, 1000, 10**6)]
    assert all(s & (s - 1) == 0 for s in sizes)
    assert sizes == sorted(sizes)
    assert auto_m_bits(10**6) >= 16 * 10**6  # ≥ bits_per_key per key


def test_flag_is_map_only(spark, dim_and_fact):
    """with_bloom_flag adds NO exchange and NO join: the fact plan
    keeps exactly the exchanges the input already had (zero for a bare
    scan)."""
    dim, fact = dim_and_fact
    m = auto_m_bits(dim.count())
    bitmap = build_bloom(dim, "p_partkey", m, k_hashes=3)
    flagged = with_bloom_flag(fact, "l_partkey", bitmap, m, k_hashes=3)
    plan = flagged._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_fp_rate_bounded_at_default_sizing(spark, dim_and_fact):
    """16 bits/key + 3 hashes ⇒ theoretical fp ≈ (1−e^{−3/16})³ ≈ 0.5%;
    assert an order-of-magnitude cap so sizing regressions surface."""
    dim, fact = dim_and_fact
    m = auto_m_bits(dim.count())
    bitmap = build_bloom(dim, "p_partkey", m, k_hashes=3)
    flagged = with_bloom_flag(
        fact, "l_partkey", bitmap, m, k_hashes=3
    ).join(
        dim.withColumn("__hit__", F.lit(1)),
        F.col("l_partkey") == F.col("p_partkey"),
        "left",
    )
    row = flagged.agg(
        F.sum(
            F.when(F.col("bloom_pass") & F.col("__hit__").isNull(), 1)
            .otherwise(0)
        ).alias("fp"),
        F.sum(F.when(F.col("__hit__").isNull(), 1).otherwise(0)).alias("neg"),
    ).collect()[0]
    assert row["fp"] / max(row["neg"], 1) < 0.05


def test_realistic_bitmap_size_plan_stays_small(spark):
    """ADVICE round-6 regression: at production sizing (2^20 bits =
    16,384 words here; 2^24 at a 1M-key dim) a per-word expression tree
    blew up plan build/serialization. The single-literal bitmap must
    keep the executed plan text bounded and evaluate correctly."""
    import time

    m = 1 << 20  # 2^20 bits -> 16,384 64-bit words
    bitmap = [0] * (m // 64)
    # set the exact bits for key "42" so the flag is true
    from tmdb_index_spark.functions.text import portable_hash60

    probe = spark.range(1).select(
        *[
            F.pmod(portable_hash60(F.lit("42"), seed), F.lit(m)).alias(f"p{seed}")
            for seed in range(3)
        ]
    ).collect()[0]
    for seed in range(3):
        pos = probe[f"p{seed}"]
        bitmap[pos // 64] |= 1 << (pos % 64)
    df = spark.createDataFrame([(42,), (43,)], "k long")
    t0 = time.time()
    out = with_bloom_flag(df, "k", bitmap, m, k_hashes=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert time.time() - t0 < 30  # per-word trees took unboundedly long
    got = {r["k"]: r["bloom_pass"] for r in out.collect()}
    assert got[42] is True
    assert got[43] is False  # all-zero words elsewhere: no stray bits
