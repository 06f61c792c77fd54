"""Headline-query benchmark.

Runs the engine's representative queries at ``$SPARK_GRAFT_SF_DIR``
(default /root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and
prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with a noop sink (full computation, no
driver collect — the same shape a cluster job has). A warmup run of the
flagship query absorbs JVM/codegen startup so timings measure the
engine, not the JIT. Per query the reported number is the BEST of
``$SPARK_GRAFT_BENCH_RUNS`` (default 2) executions: single-shot
timings on a shared box swing ±15-20% run-to-run, which would drown
real regressions; min-of-N is the standard way to measure the code
rather than the scheduler.
"""

from __future__ import annotations

import json
import os
import sys
import time

BENCH_QUERIES = [
    # reference surface
    "flagship_scan_filter",
    "q1_pricing_summary",
    "q3_order_revenue_topk",
    "q5_local_supplier_volume",
    "q14_promo_revenue",
    "json_props_rollup",
    "upsert_keep_last",
    "align_dense_ids",
    "sessionize_events",
    "hourly_windowed_counts",
    # north-star extensions
    "dedup_exact_hash",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "simhash_fingerprints",
    "simhash_neardups",
    "embedding_topk",
    "embedding_lsh_topk",
    "embedding_ivf_topk",
    "text_quality",
    "tfidf_terms",
    "bm25_search",
]


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "0.1")

    from tmdb_index_spark.queries import QUERIES
    from tmdb_index_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warmup: JVM + codegen + parquet footer caches.
    QUERIES["flagship_scan_filter"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    # Whole-pass repetition, not per-query: each pass starts from a
    # cleared cache and runs the list in order, so in-pass cache reuse
    # (e.g. minhash riding jaccard's shingle cache) matches the
    # round-1 methodology and no query is ever timed against its OWN
    # still-warm cache.
    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2")))
    timings: dict[str, float] = {}
    passes: list[dict[str, float]] = []
    for _ in range(runs):
        spark.catalog.clearCache()
        this_pass: dict[str, float] = {}
        for name in BENCH_QUERIES:
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.perf_counter() - t0
            this_pass[name] = round(dt, 3)
            timings[name] = round(min(timings.get(name, dt), dt), 3)
        passes.append(this_pass)

    total = round(sum(timings.values()), 3)
    # "queries" is min-of-N (measures the code, not the scheduler);
    # "passes" carries every raw pass so any referent methodology —
    # single-shot (pass 0) or min-of-N — can be compared like for like.
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "passes": passes,
                "sf": sf,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
