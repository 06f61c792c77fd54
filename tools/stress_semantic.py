"""SemDeDup regime-cliff stress: time the DEFAULT semantic_dedup
policy on embeddings tables scaled ACROSS the k-means fit cap
(``semantic_cells(N) > max_sample`` at N > 1.28M vectors), where the
pre-round-11 code silently clamped the fit and reverted election work
toward Θ(N²/max_sample).

Scale points (built with ``make_scaled_sf.py <src> <dst> 1 <emb_factor>``
— per-replica coordinate rolls, see that module's doc):

* 200k vectors  (emb_factor 100): cells = 1563  → two-level regime
* 2M   vectors  (emb_factor 1000): cells = 15625 → sign-bit LSH regime

A ≲10× wall-clock ratio for 10× data across the cliff is the pass
criterion SCALE.md records; the regimes are asserted, not assumed.

Usage:
    PYTHONPATH=/root/repo python tools/stress_semantic.py \
        [small_dir] [big_dir]
"""

from __future__ import annotations

import json
import sys
import time
import warnings


def _run(spark, sf_dir: str) -> tuple[float, int, str]:
    from tmdb_index_spark.operators.materialize import release_pins
    from tmdb_index_spark.operators.similarity import (
        SEMANTIC_TWO_LEVEL_CELLS,
        semantic_cells,
        semantic_dedup,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    cells = semantic_cells(n)
    regime = (
        "lsh"
        if cells > 10_000
        else ("two-level" if cells > SEMANTIC_TWO_LEVEL_CELLS else "flat")
    )
    spark.catalog.clearCache()
    release_pins(drop_all=True)
    t0 = time.perf_counter()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # the loud LSH switch, expected
        out = semantic_dedup(emb, threshold=0.9, n_estimate=n)
        kept = out.filter("keep").count()
        total = out.count()
    dt = round(time.perf_counter() - t0, 2)
    assert total == n, f"election lost rows: {total} != {n}"
    print(
        f"{sf_dir}: n={n} cells={cells} regime={regime} "
        f"kept={kept} ({dt}s)",
        flush=True,
    )
    return dt, n, regime


def main() -> int:
    small = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf_emb200k"
    big = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf_emb2m"

    from tmdb_index_spark.session import get_spark

    spark = get_spark("stress-semantic")
    spark.sparkContext.setLogLevel("ERROR")
    # warmup: JVM + Arrow paths on the small table
    spark.read.parquet(f"{small}/embeddings.parquet").limit(
        1000
    ).count()

    t_small, n_small, r_small = _run(spark, small)
    t_big, n_big, r_big = _run(spark, big)
    data_ratio = n_big / n_small
    ratio = round(t_big / t_small, 2)
    print(
        json.dumps(
            {
                "metric": "semantic_dedup_regime_cliff",
                "small": {"n": n_small, "sec": t_small, "regime": r_small},
                "big": {"n": n_big, "sec": t_big, "regime": r_big},
                "data_ratio": data_ratio,
                "time_ratio": ratio,
                "unit": "sec",
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
