"""Controlled A/B for the round-14 persisted PQ-codes sidecar.

The semantic-novelty stage (``pq_novelty_ids``) previously re-ran
``ivf_assign`` + ``pq_encode`` over the ENTIRE standing index's
embeddings every micro-batch — map-only, never shuffled, but a full
index scan + per-vector argmin/encode per batch, the exact cost shape
the round-13 band sidecar removed for MinHash.  This script measures
the removed term at a production-ish index size: synthesize N index
vectors + a small batch on parquet, fit the model once, then time the
novelty stage (a) recomputing the index codes live and (b) reading the
persisted ``(id, cell, codes)`` sidecar.  Results are identical by
construction (same model literals, pure functions) and asserted.

Timings are same-session, interleaved second-run minima — the honest
comparison shape SCALE.md's round-12/13 A/Bs use.

``impl`` picks the assignment engine: ``expr`` is the oracle-exact
fold the catalog queries pin (cost |vectors|·|cells|·dim — the live
arm is quasi-quadratic in index size since cells grow with N and is
computationally infeasible per batch past ~10^5·10^3), ``pandas`` the
BLAS matmul production uses at scale (ULP-tie caveat in ``ivf_assign``).

Usage: PYTHONPATH=/root/repo python tools/measure_codes_sidecar.py \
    [n_index] [n_batch] [dim] [impl]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time


def main() -> int:
    n_index = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    n_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    dim = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    impl = sys.argv[4] if len(sys.argv) > 4 else "expr"

    from pyspark.sql import functions as F

    from tmdb_index_spark.operators.similarity import (
        fit_centroids,
        fit_pq,
        pq_code_rows,
        pq_novelty_ids,
        semantic_cells,
    )
    from tmdb_index_spark.session import get_spark

    spark = get_spark("measure-codes-sidecar")
    spark.sparkContext.setLogLevel("ERROR")
    base = tempfile.mkdtemp(prefix="codes_ab_")

    # deterministic synthetic embeddings on parquet (the production
    # shape: the index side is a table scan, not an in-memory frame)
    def synth(path: str, n: int, seed: int) -> None:
        df = spark.range(n).select(
            F.col("id").alias("vec_id"),
            F.array(
                *[
                    F.sin(
                        (F.col("id") * (j + 1) + seed) * 0.6180339887498949
                    )
                    for j in range(dim)
                ]
            ).alias("embedding"),
        )
        df.write.mode("overwrite").parquet(path)

    synth(f"{base}/index_emb.parquet", n_index, 1)
    synth(f"{base}/batch_emb.parquet", n_batch, 7)
    idx = spark.read.parquet(f"{base}/index_emb.parquet")
    bat = spark.read.parquet(f"{base}/batch_emb.parquet")

    cells = semantic_cells(n_index)
    cents = fit_centroids(idx, cells)
    books = fit_pq(idx, m=8, ks=16)
    print(
        f"n_index={n_index} n_batch={n_batch} dim={dim} "
        f"cells={cells} impl={impl}"
    )

    def live() -> int:
        return pq_novelty_ids(
            idx, bat, 0.6, cents, books, assign_impl=impl
        ).count()

    t0 = time.perf_counter()
    codes_path = f"{base}/codes.parquet"
    pq_code_rows(idx, cents, books, assign_impl=impl).write.mode(
        "overwrite"
    ).parquet(codes_path)
    t_build = round(time.perf_counter() - t0, 2)
    stored = spark.read.parquet(codes_path)

    def sidecar() -> int:
        return pq_novelty_ids(
            idx, bat, 0.6, cents, books,
            assign_impl=impl, index_codes=stored,
        ).count()

    # interleave arms; report second-run (warm-plan) times
    results: dict[str, list[float]] = {"live": [], "sidecar": []}
    counts = set()
    for _ in range(2):
        for name, fn in (("live", live), ("sidecar", sidecar)):
            t0 = time.perf_counter()
            counts.add(fn())
            results[name].append(round(time.perf_counter() - t0, 2))
    assert len(counts) == 1, f"arms disagree: {counts}"
    t_live, t_side = results["live"][-1], results["sidecar"][-1]
    print(
        json.dumps(
            {
                "metric": "pq_codes_sidecar_ab",
                "n_index": n_index,
                "n_batch": n_batch,
                "dim": dim,
                "cells": cells,
                "impl": impl,
                "live_sec": t_live,
                "sidecar_sec": t_side,
                "sidecar_build_sec": t_build,
                "speedup": round(t_live / t_side, 2) if t_side else None,
                "all_runs": results,
                "novelty_dups": counts.pop(),
                "unit": "sec",
            }
        )
    )
    shutil.rmtree(base, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
