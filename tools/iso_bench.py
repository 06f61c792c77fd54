"""Time named catalog queries in isolation (bench methodology: noop
sink, release_pins + clearCache between runs, min of N).

Usage::

    PYTHONPATH=/root/repo python tools/iso_bench.py [-n N] name [name...]

Prints one ``name min [all runs]`` line per query. Warmup: one
flagship_scan_filter pass, like bench.py.
"""

from __future__ import annotations

import os
import sys
import time


def main() -> int:
    args = sys.argv[1:]
    runs = 3
    if args and args[0] == "-n":
        runs = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from tmdb_index_spark.operators.materialize import release_pins
    from tmdb_index_spark.queries import QUERIES
    from tmdb_index_spark.session import get_spark

    spark = get_spark("iso-bench")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["flagship_scan_filter"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    for name in args:
        times = []
        for _ in range(runs):
            release_pins(drop_all=True)
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            times.append(round(time.perf_counter() - t0, 3))
        print(f"{name} {min(times)} {times}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
