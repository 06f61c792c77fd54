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
