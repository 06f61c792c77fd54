"""Scale-stress run: time the most expensive catalog queries at sf0.1
and at a ``make_scaled_sf.py`` output (~10×), and report the scaling
ratio per query. Linear-ish ratios (≈ the replication factor) validate
the bounded-shuffle claims empirically; superlinear ratios indicate a
fixed parameter that must grow with N (and the script demonstrates the
lever where one exists — IVF cell count).

Usage:
    PYTHONPATH=/root/repo python tools/stress_scale.py \
        [small_dir] [big_dir] [factor]
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F

STRESS_QUERIES = [
    "q1_pricing_summary",
    "text_quality",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "embedding_ivf_topk",
]


def _time(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 2)


def main() -> int:
    small = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    big = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf_scaled"
    factor = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0

    from tmdb_index_spark.operators.similarity import fit_centroids, ivf_topk
    from tmdb_index_spark.queries import QUERIES
    from tmdb_index_spark.session import get_spark

    spark = get_spark("stress-scale")
    spark.sparkContext.setLogLevel("ERROR")

    # warmup
    QUERIES["flagship_scan_filter"](spark, small).write.format("noop").mode(
        "overwrite"
    ).save()

    report: dict[str, dict[str, float]] = {}
    for name in STRESS_QUERIES:
        spark.catalog.clearCache()
        t_small = _time(QUERIES[name](spark, small))
        spark.catalog.clearCache()
        t_big = _time(QUERIES[name](spark, big))
        report[name] = {
            "small_sec": t_small,
            "big_sec": t_big,
            "ratio": round(t_big / max(t_small, 1e-9), 1),
        }
        print(f"{name}: {t_small}s -> {t_big}s (x{report[name]['ratio']})")

    # IVF scale lever: cells must grow with N (fixed cells make
    # within-cell work quadratic in corpus size), and at high cell
    # counts assignment must be BLAS (assign_impl='pandas'), not the
    # interpreted per-centroid fold.
    emb = spark.read.parquet(f"{big}/embeddings.parquet").select(
        "vec_id", F.col("embedding")
    )
    for assign_impl in ("expr", "pandas"):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        cents = fit_centroids(emb, 64, max_sample=4000)
        ivf_topk(emb, cents, k=3, assign_impl=assign_impl).write.format(
            "noop"
        ).mode("overwrite").save()
        t_lever = round(time.perf_counter() - t0, 2)
        report[f"embedding_ivf_topk@64cells_big_{assign_impl}"] = {
            "big_sec": t_lever
        }
        print(
            f"embedding_ivf_topk, 64 fitted cells, assign={assign_impl}, "
            f"at {factor}x: {t_lever}s"
        )

    print(json.dumps({"factor": factor, "queries": report}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
