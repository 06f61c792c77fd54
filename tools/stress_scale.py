"""Scale-stress run: time the FULL headline-query set at sf0.1 and at
a ``make_scaled_sf.py`` output (~10×), and report the scaling ratio per
query. Linear-ish ratios (≤ the replication factor) validate the
bounded-shuffle claims empirically; superlinear ratios indicate a fixed
parameter that must grow with N — and the script demonstrates the lever
where one exists (IVF cell count, via the self-tuning
:func:`~tmdb_index_spark.operators.similarity.ivf_index_topk`).

Emits a BENCH-style JSON line per scale point plus the ratio table, so
BASELINE.md can carry an sf1.0 referent measured with the same
min-of-N methodology as bench.py.

Usage:
    PYTHONPATH=/root/repo python tools/stress_scale.py \
        [small_dir] [big_dir] [factor]
"""

from __future__ import annotations

import json
import sys
import time


def _time(make) -> float:
    """Time a QUERY CONSTRUCTION + execution: ``make`` is a thunk so
    queries that do bounded driver-side work at construction (e.g. the
    calendar-bounded robust_trend_daily collect+numpy grid) are timed
    honestly — passing a pre-built DataFrame would clock only the
    final literal write (round-7 review finding)."""
    t0 = time.perf_counter()
    make().write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 2)


def main() -> int:
    small = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    big = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf_scaled"
    factor = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0

    from bench import BENCH_QUERIES

    from tmdb_index_spark.operators.similarity import (
        ivf2_index_topk,
        ivf_index_topk,
        lsh_index_topk,
    )
    from tmdb_index_spark.queries import QUERIES
    from tmdb_index_spark.session import get_spark

    spark = get_spark("stress-scale")
    spark.sparkContext.setLogLevel("ERROR")

    # warmup
    QUERIES["flagship_scan_filter"](spark, small).write.format("noop").mode(
        "overwrite"
    ).save()

    # LLM-prep extensions stressed alongside the headline set: the
    # pack_sequences sharded-window claim ("no one-task serial scan")
    # and the decontam broadcast shape are argued in docstrings — this
    # run measures them at ~10x. SPARK_GRAFT_STRESS_SET=full stresses
    # every registered catalog query instead.
    import os

    explicit = os.environ.get("SPARK_GRAFT_STRESS_QUERIES")
    if explicit:
        # explicit comma-list: the per-round targeted slices (e.g. the
        # round-11 next-tier 100x sweep) name their set directly
        stress_set = [q.strip() for q in explicit.split(",") if q.strip()]
        unknown = [q for q in stress_set if q not in QUERIES]
        if unknown:
            raise SystemExit(f"unknown stress queries: {unknown}")
    elif os.environ.get("SPARK_GRAFT_STRESS_SET") == "full":
        stress_set = list(QUERIES)
    else:
        # Derived from bench's own lists (ADVICE r6: a hand-maintained
        # subset silently omitted half the round-6 additions, so
        # routine stress runs stopped regression-checking the scale
        # rows SCALE.md publishes) — headline + every extended-bench
        # query, deduplicated in order.
        from bench import EXTENDED_QUERIES

        stress_set = list(dict.fromkeys(BENCH_QUERIES + EXTENDED_QUERIES))

    from tmdb_index_spark.operators.materialize import release_pins

    report: dict[str, dict[str, float]] = {}
    for name in stress_set:
        release_pins(drop_all=True)
        spark.catalog.clearCache()
        t_small = _time(lambda: QUERIES[name](spark, small))
        release_pins(drop_all=True)
        spark.catalog.clearCache()
        t_big = _time(lambda: QUERIES[name](spark, big))
        report[name] = {
            "small_sec": t_small,
            "big_sec": t_big,
            "ratio": round(t_big / max(t_small, 1e-9), 1),
        }
        print(f"{name}: {t_small}s -> {t_big}s (x{report[name]['ratio']})")

    if os.environ.get("SPARK_GRAFT_STRESS_LEVERS") == "0":
        totals = {
            "small_total": round(sum(r["small_sec"] for r in report.values() if "small_sec" in r), 2),
            "big_total": round(sum(r["big_sec"] for r in report.values() if "big_sec" in r), 2),
        }
        print(json.dumps({"factor": factor, **totals, "queries": report}))
        return 0

    # IVF scale lever: the catalog query keeps its FIXED pinned cells
    # (the documented failure mode — within-cell work quadratic in N);
    # ivf_index_topk defaults cells to sqrt(N) and BLAS assignment
    # above the size threshold, which is the production configuration.
    import pyspark.sql.functions as F

    for label, d in (("small", small), ("big", big)):
        emb = spark.read.parquet(f"{d}/embeddings.parquet").select(
            "vec_id", F.col("embedding")
        )
        n = emb.count()
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        ivf_index_topk(emb, k=3, n_estimate=n, max_sample=4000).write.format(
            "noop"
        ).mode("overwrite").save()
        t = round(time.perf_counter() - t0, 2)
        report[f"ivf_index_topk_selftuned_{label}"] = {"sec": t, "n": n}
        print(f"ivf_index_topk self-tuned ({label}, n={n}): {t}s")
    st = report["ivf_index_topk_selftuned_small"]["sec"]
    bt = report["ivf_index_topk_selftuned_big"]["sec"]
    report["ivf_index_topk_selftuned_ratio"] = {
        "ratio": round(bt / max(st, 1e-9), 1)
    }
    print(f"ivf self-tuned ratio at {factor}x: x{report['ivf_index_topk_selftuned_ratio']['ratio']}")

    # Two-level IVF lever (round 7): hierarchical assignment bounds
    # total work at N^(4/3) — measured alongside flat so the ratio gap
    # (and the fit-fix regression) stays visible round over round.
    for label, d in (("small", small), ("big", big)):
        emb = spark.read.parquet(f"{d}/embeddings.parquet").select(
            "vec_id", F.col("embedding")
        )
        n = emb.count()
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        ivf2_index_topk(emb, k=3, probe_coarse=2, n_estimate=n).write.format(
            "noop"
        ).mode("overwrite").save()
        t = round(time.perf_counter() - t0, 2)
        report[f"ivf2_index_topk_{label}"] = {"sec": t, "n": n}
        print(f"ivf2_index_topk ({label}, n={n}): {t}s")
    st = report["ivf2_index_topk_small"]["sec"]
    bt = report["ivf2_index_topk_big"]["sec"]
    report["ivf2_index_topk_ratio"] = {"ratio": round(bt / max(st, 1e-9), 1)}
    print(f"ivf2 ratio at {factor}x: x{report['ivf2_index_topk_ratio']['ratio']}")

    # LSH scale lever: the catalog query pins 8 bits (oracle-exact);
    # lsh_index_topk grows bits with log2(N/target_bucket), holding
    # bucket occupancy — and within-bucket quadratic work — constant.
    for label, d in (("small", small), ("big", big)):
        emb = spark.read.parquet(f"{d}/embeddings.parquet").select(
            "vec_id", F.col("embedding")
        )
        n = emb.count()
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        lsh_index_topk(emb, k=5, n_estimate=n, dim=64).write.format(
            "noop"
        ).mode("overwrite").save()
        t = round(time.perf_counter() - t0, 2)
        report[f"lsh_index_topk_selftuned_{label}"] = {"sec": t, "n": n}
        print(f"lsh_index_topk self-tuned ({label}, n={n}): {t}s")
    st = report["lsh_index_topk_selftuned_small"]["sec"]
    bt = report["lsh_index_topk_selftuned_big"]["sec"]
    report["lsh_index_topk_selftuned_ratio"] = {
        "ratio": round(bt / max(st, 1e-9), 1)
    }
    print(f"lsh self-tuned ratio at {factor}x: x{report['lsh_index_topk_selftuned_ratio']['ratio']}")

    totals = {
        "small_total": round(sum(r["small_sec"] for r in report.values() if "small_sec" in r), 2),
        "big_total": round(sum(r["big_sec"] for r in report.values() if "big_sec" in r), 2),
    }
    print(json.dumps({"factor": factor, **totals, "queries": report}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
