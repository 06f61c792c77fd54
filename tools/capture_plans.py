"""Dump ``.explain("formatted")`` for named catalog queries.

Usage::

    PYTHONPATH=/root/repo python tools/capture_plans.py <out_dir> <suffix> [names...]

Writes ``<out_dir>/<name>_<suffix>.txt`` for each query (default: the
headline bench list).  Queries are isolated the same way the oracle
gate isolates them (release_pins + clearCache per query) so a
build-time pin from one query never rewrites another's captured plan.
"""

from __future__ import annotations

import os
import sys


def main() -> int:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "plans/r14"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from tmdb_index_spark.operators.materialize import release_pins
    from tmdb_index_spark.queries import QUERIES
    from tmdb_index_spark.session import get_spark

    if not names:
        import bench

        names = list(bench.BENCH_QUERIES)

    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        release_pins()
        spark.catalog.clearCache()
        df = QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
