"""Per-query Spark job-structure probe: jobs launched at plan BUILD vs
at CONSUME (one noop-sinked action), gate-style isolation.

Wall-clock on this box is bimodally noisy; job counts are the
noise-immune evidence the round-14 sweep used ad hoc. Counting uses
the MAX retained job id (ids are sequential), not ``len(getJobIds())``,
so the status tracker's retained-job eviction cap cannot clamp deltas
late in a sweep.

Usage::

    PYTHONPATH=/root/repo python tools/job_count.py [-n N] name [name...]

Prints ``name build consume [xN]`` per query (min build/consume over N
repeats; N default 1).
"""

from __future__ import annotations

import os
import sys


def _max_job_id(sc) -> int:
    ids = sc.statusTracker().getJobIdsForGroup(None)
    return max(ids) if ids else -1


def main() -> int:
    args = sys.argv[1:]
    runs = 1
    if args and args[0] == "-n":
        runs = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from tmdb_index_spark.operators.materialize import release_pins
    from tmdb_index_spark.queries import QUERIES
    from tmdb_index_spark.session import get_spark

    spark = get_spark("job-count")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    QUERIES["flagship_scan_filter"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    for name in args:
        best: tuple[int, int] | None = None
        for _ in range(runs):
            release_pins(drop_all=True)
            spark.catalog.clearCache()
            j0 = _max_job_id(sc)
            df = QUERIES[name](spark, sf_dir)
            j1 = _max_job_id(sc)
            df.write.format("noop").mode("overwrite").save()
            j2 = _max_job_id(sc)
            cur = (j1 - j0, j2 - j1)
            if best is None or sum(cur) < sum(best):
                best = cur
        print(f"{name} build={best[0]} consume={best[1]}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
