"""Measure the SemDeDup election SHUFFLE payload: raw vectors vs PQ
codes (`semantic_dedup` vs `semantic_dedup_pq`) on the same embeddings
table, reading per-stage shuffle write bytes from the Spark UI REST API
— the observable the PQ payload exists to shrink (the per-cell
groupBy is the one data-sized shuffle in the SemDeDup plan; at 100 TB
its bytes are the job's network bill).

Usage:
    PYTHONPATH=/root/repo python tools/measure_pq_shuffle.py [emb_dir]

Prints one JSON line: {"n": N, "raw_shuffle_bytes": ..,
"pq_shuffle_bytes": .., "reduction_x": .., "raw_sec": .., "pq_sec": ..,
"flags_agree": ..}.
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request


def _stages(spark) -> dict[int, dict]:
    """completed stages by id from the live UI REST API."""
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    url = f"{base}/api/v1/applications/{app}/stages?status=complete"
    with urllib.request.urlopen(url) as r:
        rows = json.load(r)
    return {s["stageId"]: s for s in rows}


def _run(spark, make) -> tuple[float, int]:
    """(wall sec, shuffle write bytes) of one full materialization."""
    before = set(_stages(spark))
    t0 = time.perf_counter()
    make().write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    after = _stages(spark)
    new = [s for sid, s in after.items() if sid not in before]
    return round(wall, 2), sum(s["shuffleWriteBytes"] for s in new)


def main() -> int:
    emb_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from tmdb_index_spark.operators.similarity import (
        semantic_dedup,
        semantic_dedup_pq,
    )
    from tmdb_index_spark.session import get_spark

    # the session factory disables the UI; the REST stage-metrics API
    # rides on it, so turn it back on for this measurement process
    spark = get_spark(
        "pq-shuffle", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{emb_dir}/embeddings.parquet")
    n = emb.count()

    # warmup (JVM/codegen) — not measured
    emb.limit(10).count()

    raw_sec, raw_b = _run(
        spark, lambda: semantic_dedup(emb, 0.4, n_estimate=n)
    )
    pq_sec, pq_b = _run(
        spark, lambda: semantic_dedup_pq(emb, 0.4, n_estimate=n)
    )

    # same keep-rate ballpark sanity (PQ sims are approximate, so the
    # flag sets may differ at the margin — report the agreement rate)
    rawf = semantic_dedup(emb, 0.4, n_estimate=n).select(
        "vec_id", "keep"
    )
    pqf = semantic_dedup_pq(emb, 0.4, n_estimate=n).select(
        "vec_id", "keep"
    )
    agree = (
        rawf.join(pqf.withColumnRenamed("keep", "k2"), "vec_id")
        .filter("keep = k2")
        .count()
    )

    print(
        json.dumps(
            {
                "n": n,
                "raw_shuffle_bytes": raw_b,
                "pq_shuffle_bytes": pq_b,
                "reduction_x": round(raw_b / max(pq_b, 1), 2),
                "raw_sec": raw_sec,
                "pq_sec": pq_sec,
                "flags_agree": round(agree / max(n, 1), 4),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
