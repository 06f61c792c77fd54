"""Quantitative error bounds for the portable sketch queries.

Round 12 replaced the engine-private sketches (HLL++ digests, GK
quantile sketches) with portable expression-level ones
(`operators/sketches.py`) whose estimates a DuckDB oracle reproduces
bit-for-bit — so the driver gate now hash-checks them.  These tests
add what the hash check can't see: each estimate must sit within its
documented error envelope of the EXACT twin on the same data, and the
linear-counting / harmonic regime routing must behave.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from tmdb_index_spark import queries as Q
from tmdb_index_spark.operators.sketches import (
    hash_sample_pred,
    portable_hll_distinct,
)

SF = "/root/testdata/sf0.01"

#: b=10 (1024 registers): ~3.2% rsd harmonic, few-% linear-counting;
#: generous 3-sigma-ish envelope.
HLL_REL_TOL = 0.10

#: 1/4 Bernoulli sample, groups of ~2000 events -> ~500 sampled; rank
#: se at the median ~ sqrt(.25/500) ~ 2.2%; allow ~3.5 sigma.
QUANTILE_RANK_TOL = 0.08


def test_approx_distinct_users_daily_within_hll_error(spark):
    got = {
        r["day"]: r["approx_users"]
        for r in Q.QUERIES["approx_distinct_users_daily"](spark, SF).collect()
    }
    ev = Q._events(spark, SF)
    exact = {
        r["day"]: r["exact_users"]
        for r in ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.count_distinct("user_id").alias("exact_users"))
        .collect()
    }
    assert set(got) == set(exact)
    for day, approx in got.items():
        rel = abs(approx - exact[day]) / max(exact[day], 1)
        assert rel <= HLL_REL_TOL, (day, approx, exact[day], rel)


def test_approx_value_quantiles_within_rank_error(spark):
    rows = Q.QUERIES["approx_value_quantiles"](spark, SF).collect()
    ev = Q._events(spark, SF)
    values = {
        et: sorted(
            r["value"]
            for r in ev.filter(F.col("event_type") == et)
            .select("value")
            .collect()
        )
        for et in {r["event_type"] for r in rows}
    }
    for r in rows:
        vs = values[r["event_type"]]
        n = len(vs)
        assert r["n"] == n
        # the sample is a fixed hash predicate: size is deterministic
        # and should be ~n/4
        assert 0.15 * n <= r["n_sampled"] <= 0.35 * n
        for p, col in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
            lo_rank = max(0, int((p - QUANTILE_RANK_TOL) * (n - 1)))
            hi_rank = min(n - 1, int((p + QUANTILE_RANK_TOL) * (n - 1)) + 1)
            assert vs[lo_rank] <= r[col] <= vs[hi_rank], (
                r["event_type"], col, r[col], vs[lo_rank], vs[hi_rank],
            )


def test_portable_hll_regimes_and_determinism(spark):
    # small group -> linear-counting regime: near-exact; the estimate
    # must also be IDENTICAL across runs/partitionings (pure function
    # of the key set).
    df = spark.range(0, 2000).select(
        (F.col("id") % 2).alias("g"),
        F.when(F.col("id") % 2 == 0, F.col("id") % 50)
        .otherwise(F.col("id"))
        .alias("k"),
    )
    out = {
        r["g"]: (r["approx_distinct"], r["n_rows"])
        for r in portable_hll_distinct(df, "k", ["g"], b=10).collect()
    }
    # group 0: even ids mod 50 -> 25 distinct of 1000 rows; group 1:
    # 1000 distinct
    assert out[0][1] == 1000 and out[1][1] == 1000
    assert abs(out[0][0] - 25) / 25 < 0.05
    assert abs(out[1][0] - 1000) / 1000 < 0.10
    out2 = {
        r["g"]: (r["approx_distinct"], r["n_rows"])
        for r in portable_hll_distinct(
            df.repartition(7), "k", ["g"], b=10
        ).collect()
    }
    assert out == out2


def test_portable_hll_harmonic_regime(spark):
    # enough distinct keys to exceed 2.5 * m (b=6 -> m=64, threshold
    # 160): exercises the raw harmonic branch within its rsd envelope
    # (1.04/8 = 13%; allow 3 sigma).
    df = spark.range(0, 5000).select(F.lit(1).alias("g"), F.col("id").alias("k"))
    row = portable_hll_distinct(df, "k", ["g"], b=6).collect()[0]
    assert abs(row["approx_distinct"] - 5000) / 5000 < 3 * 1.04 / math.sqrt(64)


def test_hash_sample_pred_is_deterministic_partition(spark):
    df = spark.range(0, 10_000)
    a = df.filter(hash_sample_pred(F.col("id"), 4)).count()
    b = df.repartition(13).filter(hash_sample_pred(F.col("id"), 4)).count()
    assert a == b
    # ~1/4 +- loose binomial envelope
    assert 2000 < a < 3000


def test_tuned_sample_denom_next_power_of_two(spark):
    from tmdb_index_spark.operators.sketches import tuned_sample_denom

    cases = [
        (0, 4), (1, 4), (100, 4), (400, 4),      # q <= min_denom
        (401, 8), (799, 8), (800, 8),            # q in (4, 8]
        (1600, 16),                              # q exactly a power of two
        (1601, 32),                              # one past it
        (100_000, 1024),                         # q = 1000 -> 1024
    ]
    df = spark.createDataFrame([(n,) for n, _ in cases], "n long")
    got = {
        r["n"]: r["d"]
        for r in df.select(
            "n", tuned_sample_denom(F.col("n"), 100).alias("d")
        ).collect()
    }
    for n, want in cases:
        assert got[n] == want, (n, got[n], want)


def test_check_unique_hll_estimates_and_is_partition_invariant(spark):
    from tmdb_index_spark.operators.checks import check_unique_hll

    # 600 distinct composite keys, the first 100 duplicated 3x
    rows = [(i % 600, (i % 600) % 7, i) for i in range(600)]
    rows += [(k, k % 7, 10_000 + k) for k in range(100) for _ in range(2)]
    df = spark.createDataFrame(rows, "a long, b int, payload long")

    out = check_unique_hll(df, ["a", "b"]).collect()
    assert len(out) == 1
    r = out[0]
    assert r["check"] == "unique(a,b)"
    assert r["n_rows"] == 800
    assert abs(r["approx_unique"] - 600) <= 0.10 * 600

    # the estimate is a pure function of the key set: repartitioning
    # must not move it by even an ulp
    again = check_unique_hll(df.repartition(13), ["a", "b"]).collect()[0]
    assert again["approx_unique"] == r["approx_unique"]

    # NULL key components flow through the canonical encoding (same
    # scheme as the exact checks) instead of dropping the row
    with_null = df.withColumn(
        "a", F.when(F.col("payload") == 0, None).otherwise(F.col("a"))
    )
    rn = check_unique_hll(with_null, ["a", "b"]).collect()[0]
    assert rn["n_rows"] == 800


def test_portable_hll_null_keys_follow_count_distinct(spark):
    """NULL keys hit no register (count-distinct semantics, round-12
    advisor) but still count in n_rows; an all-NULL group estimates 0
    — and the DuckDB oracle mirror agrees bit-for-bit."""
    import duckdb
    import pandas as pd

    from tmdb_index_spark.operators.sketches import portable_hll_oracle_sql

    rows = [("a", str(i % 40) if i % 5 else None) for i in range(200)]
    rows += [("b", None)] * 25
    df = spark.createDataFrame(rows, "g string, k string")
    got = {
        r["g"]: (r["approx_distinct"], r["n_rows"])
        for r in portable_hll_distinct(df, "k", ["g"], b=10).collect()
    }
    exact_a = (
        df.filter("g = 'a'").select("k").na.drop().distinct().count()
    )
    assert got["a"][1] == 200  # nulls still counted as rows
    assert abs(got["a"][0] - exact_a) / exact_a < 0.05  # LC regime
    assert got["b"] == (0.0, 25)  # all-null group -> zero distinct

    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["g", "k"]))
    sql = portable_hll_oracle_sql(
        key_sql="k", group_sql="g", group_alias="g", from_sql="t", b=10
    )
    oracle = {r[0]: (r[1], r[2]) for r in con.sql(sql).fetchall()}
    assert oracle == got
