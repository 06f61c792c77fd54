"""Input-width guard for compute-heavy map stages.

A parquet scan can never split below one ROW GROUP, so a small corpus
written as a single-row-group file (the driver's sf0.001–0.1 fixtures;
any `coalesce(1)` artifact, including this engine's own single-file
index sink) scans as ONE task — and every downstream per-row compute
stage (shingling, md5 hashing, vector folds, Arrow batches) inherits
that width until the first shuffle. On local[32] that is 31 idle cores;
on a cluster it is an entire stage bottlenecked on one executor core.

:func:`widen_small_scan` repartitions only when the plan's current
width is below the session's default parallelism. At production scale
a 100 TB table scans as tens of thousands of row-group splits, the
condition is false, and this is a zero-cost no-op — the repartition
(and its tiny shuffle of raw input rows) exists exactly and only in
the small-input regime where the input fits in memory many times over
and the shuffle is trivially cheap.

Deliberately NOT applied globally (e.g. inside the shared table
reader): operators whose contract is "map-only, no shuffle at any
scale" (media decode, redaction, quality scoring) must keep plans
with zero Exchange nodes — their per-row work is light enough that
single-task execution at tiny scale is fine, and the plan property is
pinned by tests. Heavy-compute operators opt in.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame

__all__ = [
    "metadata_scan_rowcount",
    "widen_probe_is_cheap",
    "widen_small_scan",
]


def _estimated_scan_width(df: DataFrame) -> int | None:
    """Compiled scan width estimated from INPUT FILE SIZES — metadata
    only, no job, no AQE stage materialization. Returns ``None`` when
    the plan is not file-rooted (checkpointed / local relations), or
    when a size lookup fails.

    Why not ``df.rdd.getNumPartitions()`` (the original probe): under
    AQE, building a plan's final RDD MATERIALIZES its upstream query
    stages — probing a join-bearing frame at operator-build time ran
    the join's broadcast-exchange job (measured 2.5 s per
    ``ivf_assign`` call on the sf0.1 ingest path) whose result is not
    reused by the real execution. Spark assigns each file
    ``ceil(size / maxPartitionBytes)`` splits, so the file sizes give
    the same split count the probe would have compiled, without
    executing anything. (Both the probe and this estimate count
    SPLITS, not row groups — a single-row-group file bigger than one
    split still scans effectively narrow either way.)
    """
    try:
        files = df.inputFiles()
    except Exception:  # non-SQL plans / session gone
        return None
    if not files:
        return None
    spark = df.sparkSession
    sc = spark.sparkContext
    try:
        max_bytes = int(
            spark._jsparkSession.sessionState().conf().filesMaxPartitionBytes()
        )
    except Exception:
        max_bytes = 128 * 1024 * 1024
    try:
        hconf = sc._jsc.hadoopConfiguration()
        jvm = sc._jvm
        width = 0
        for f in files:
            p = jvm.org.apache.hadoop.fs.Path(f)
            fs = p.getFileSystem(hconf)
            size = int(fs.getFileStatus(p).getLen())
            width += max(1, math.ceil(size / max_bytes))
        return width
    except Exception:  # unreadable path — let the caller fall back
        return None


def metadata_scan_rowcount(df: DataFrame, max_files: int = 64) -> int | None:
    """EXACT row count of a bare (row-preserving) parquet scan from the
    file footers — metadata only, no Spark job. Returns ``None``
    whenever exactness cannot be proven from the plan, in which case
    the caller must fall back to ``df.count()``.

    Several operator builds gate or size themselves on the input's row
    count (the uniqueness-audit scale gate, ``semantic_cells``' cell
    budget, the tuned ANN families' occupancy rules). When the input
    is the raw table scan — the common catalog case — that count is
    already written in every parquet footer; running a cluster job to
    re-derive it is one serial driver round-trip per operator build
    (guide §1.5 fixed per-job overhead, §5 driver discipline). This
    helper reads the footers through the JVM's Hadoop filesystem (so
    HDFS/S3 paths behave exactly like local ones) and accepts ONLY
    plans whose analyzed form is ``Project*/SubqueryAlias*`` over a
    single parquet ``LogicalRelation`` — the node kinds that can never
    change cardinality. Anything else (filters, joins, generators,
    checkpointed frames, non-parquet sources) returns ``None``.

    ``max_files`` bounds the driver-side footer loop: a table of
    thousands of files is exactly the case where the distributed
    ``count()`` (itself footer-based per task, but parallel) is the
    right tool, so past the bound we decline rather than serialize a
    listing-sized loop on the driver.
    """
    try:
        plan = df._jdf.queryExecution().analyzed()
        while plan.getClass().getSimpleName() in ("Project", "SubqueryAlias"):
            plan = plan.children().apply(0)
        if plan.getClass().getSimpleName() != "LogicalRelation":
            return None
        if "Parquet" not in plan.relation().fileFormat().getClass().getSimpleName():
            return None
        files = df.inputFiles()
        if not files or len(files) > max_files:
            return None
        sc = df.sparkSession.sparkContext
        jvm = sc._jvm
        hconf = sc._jsc.hadoopConfiguration()
        total = 0
        for f in files:
            p = jvm.org.apache.hadoop.fs.Path(f)
            rdr = jvm.org.apache.parquet.hadoop.ParquetFileReader.open(
                jvm.org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
                    p, hconf
                )
            )
            try:
                total += int(rdr.getRecordCount())
            finally:
                rdr.close()
        return total
    except Exception:  # plan-shape drift / unreadable footer — decline
        return None


def widen_probe_is_cheap(df: DataFrame) -> bool:
    """True when :func:`widen_small_scan`'s width probe cannot
    materialize upstream AQE stages: file-rooted plans (the width is
    estimated from file sizes — metadata only) or ``Project`` /
    ``SubqueryAlias`` over a ``LogicalRDD`` / ``LocalRelation``
    (checkpoint-pinned or literal frames — nothing upstream left to
    materialize, so the RDD fallback probe is cheap). Operators that
    accept ARBITRARY caller frames (``tokenize_and_mix``) gate their
    opt-in widen on this so a direct caller with an unpinned
    join-bearing corpus never pays build-time jobs just to measure
    width (round-14 ADVICE)."""
    try:
        if df.inputFiles():
            return True
    except Exception:  # non-SQL plan — fall through to the plan check
        pass
    try:
        plan = df._jdf.queryExecution().analyzed()
        while plan.getClass().getSimpleName() in ("Project", "SubqueryAlias"):
            plan = plan.children().apply(0)
        return plan.getClass().getSimpleName() in (
            "LogicalRDD",
            "LocalRelation",
        )
    except Exception:  # plan-shape drift — be conservative, skip widen
        return False


def widen_small_scan(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition ``df`` up to ``min_partitions`` (default:
    the session's default parallelism) iff its current plan width is
    narrower. Row-order neutral for every downstream use in this
    engine (aggregations, hash joins, keyed windows).

    Width probe: estimated from input file sizes when the plan is
    file-rooted (:func:`_estimated_scan_width` — metadata only, so a
    join above the scan is NOT executed just to measure it); the
    ``df.rdd.getNumPartitions()`` planning probe remains the fallback
    for non-file-rooted inputs (checkpointed frames, local relations),
    where building the RDD is cheap because there is nothing upstream
    to materialize. If build-time ever matters on an exotic plan, pass
    ``min_partitions`` explicitly from a known width instead. When
    ``len(inputFiles) >= target`` the answer is known without touching
    the filesystem."""
    target = (
        min_partitions
        if min_partitions is not None
        else df.sparkSession.sparkContext.defaultParallelism
    )
    try:
        files = df.inputFiles()
    except Exception:
        files = []
    if files and len(files) >= target:
        return df
    width = _estimated_scan_width(df) if files else None
    if width is None:
        width = df.rdd.getNumPartitions()
    if width >= target:
        return df
    return df.repartition(target)
