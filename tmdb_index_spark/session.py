"""SparkSession factory tuned for this engine.

Local test mode is ``local[N]`` (one JVM); the configs below are chosen
so the same code scales to a multi-executor cluster:

* AQE on — runtime coalescing, skew-join splitting, and broadcast
  conversion replace hand-scheduled physical plans at 100 TB.
* ``spark.sql.shuffle.partitions`` sized to cores locally; on a real
  cluster AQE's coalescing makes the initial number mostly a ceiling.
* Session timezone pinned to UTC so timestamps compare bit-for-bit with
  the DuckDB oracle (DuckDB timestamps are UTC-naive).
* Arrow enabled for any pandas interchange (Pandas UDFs, createDataFrame
  from pandas).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark"]


def get_spark(
    app_name: str = "tmdb_index_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    Honors ``SPARK_GRAFT_CPUS`` (driver contract) for local parallelism.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "")
    master = os.environ.get("SPARK_MASTER", f"local[{cpus or '*'}]")
    if shuffle_partitions is None:
        try:
            shuffle_partitions = int(cpus) if cpus else (os.cpu_count() or 8)
        except ValueError:
            shuffle_partitions = os.cpu_count() or 8

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # parallelismFirst=true (the default) floors AQE coalescing at
        # defaultParallelism, so a 15k-row rollup shuffle still runs 32
        # tasks — pure task-launch overhead that dominates the bounded
        # frames the rank/ntile family reduces everything to (measured:
        # ~1/3 of nation_spend_gini's wall time). False = respect the
        # advisory size, the setting Spark's own docs recommend for
        # busy clusters and the right call at 100 TB, where a
        # 1000-executor cluster wants shuffle partitions sized by
        # bytes, not by a per-job core floor.
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        # With parallelismFirst off the advisory size IS the reduce-task
        # granule: 64 MB (the default) starves CPU-heavy mid-size
        # shuffles (the shingle joins run 2-3 tasks on 32 cores —
        # measured 1.7x on dedup_ngram_jaccard), while 8 MB keeps them
        # ~wide and still coalesces the ≤1 MB bounded rollup shuffles
        # to a single task. On a real cluster raise this toward the
        # default; the value scales per-executor-core, not per-job.
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
