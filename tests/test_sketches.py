"""Quantitative error bounds for the sketch queries.

The two approx catalog entries are rows-only under the driver gate
(HLL registers and quantile digests are engine-private, so no DuckDB
oracle can hash-match them). These tests give them the quantitative
check the gate can't: each sketch output must sit within its
documented error envelope of the EXACT twin computed on the same data.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tmdb_index_spark import queries as Q

SF = "/root/testdata/sf0.01"

#: approx_count_distinct runs at rsd=0.02; 3 standard deviations.
HLL_REL_TOL = 0.06

#: percentile_approx runs at accuracy=10_000 (rank error 1/10000);
#: allow a generous ±1% RANK window around each requested quantile.
QUANTILE_RANK_TOL = 0.01


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
        for p, col in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
            lo_rank = max(0, int((p - QUANTILE_RANK_TOL) * (n - 1)))
            hi_rank = min(n - 1, int((p + QUANTILE_RANK_TOL) * (n - 1)) + 1)
            assert vs[lo_rank] <= r[col] <= vs[hi_rank], (
                r["event_type"], col, r[col], vs[lo_rank], vs[hi_rank],
            )
