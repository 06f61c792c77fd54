"""Pin a DataFrame that feeds multiple plan subtrees.

Spark recomputes a shared subtree once per consumer unless it is
pinned: an expensive stage (Python ``mapInPandas``, a tokenize+shuffle
pass over the corpus) that feeds a self-join or several aggregates
would otherwise run 2-4x. Three pinning strategies:

* ``"cache"`` (default): storage-memory cache — right while the frame
  fits cluster memory (small/medium corpora). Also the only mode with
  no filesystem requirements. Does NOT truncate the logical plan.
* ``"checkpoint"``: lazy ``localCheckpoint`` — cache semantics PLUS
  logical-plan truncation, required when pinned stages chain (see the
  in-function comment).
* ``"parquet"``: write once and re-read — the 100 TB path. Bounded
  memory, truncated lineage/statistics, and the expensive stage
  provably executes exactly once (a cache-evicted partition would
  otherwise recompute mid-join and, for a nondeterministic Python
  stage, could desynchronize the join sides).

Scratch location for ``"parquet"``: callers on a multi-node cluster
should pass ``scratch_dir`` pointing at SHARED storage (HDFS/S3/NFS) —
executor tasks write the files, so a driver-local temp dir would leave
the re-read incomplete. When ``scratch_dir`` is omitted the path is
derived from ``spark.sql.warehouse.dir``, which on a configured
cluster already names shared storage (and in local mode a local dir,
which is then also correct). Local scratch dirs are best-effort
deleted at interpreter exit; remote (``scheme://``) dirs are the
caller's retention responsibility — delete them once the returned
frame is no longer needed.
"""

from __future__ import annotations

import atexit
import shutil
import threading
import uuid

from pyspark.sql import DataFrame

_SCRATCH_PATHS: list[str] = []
_PINNED_FRAMES: list[DataFrame] = []
#: Guards the two ledger lists: operators may now pin from a driver
#: side-thread running concurrently with the main build (guide §2.6 —
#: prepare_corpus overlaps its fit collects with the stage chain), and
#: a release racing an append must see a consistent ledger.
_LEDGER_LOCK = threading.RLock()


def register_pin(df: DataFrame) -> DataFrame:
    """Register an externally-persisted frame (an eager checkpoint a
    loop manages itself) with the ledger so :func:`release_pins` frees
    its blocks; returns ``df`` unchanged."""
    with _LEDGER_LOCK:
        _PINNED_FRAMES.append(df)
    return df


def _cleanup() -> None:
    for p in _SCRATCH_PATHS:
        local = p[len("file:"):] if p.startswith("file:") else p
        if "://" not in local:
            shutil.rmtree(local, ignore_errors=True)


atexit.register(_cleanup)


def pin_frame(
    df: DataFrame, materialize: str = "cache", scratch_dir: str | None = None
) -> DataFrame:
    """Return ``df`` pinned so repeated consumption computes it once.

    Every pin is registered; call :func:`release_pins` once the
    consuming query has materialized to return the storage (cached
    blocks / scratch files) — a long-lived session or bench loop that
    re-invokes a pinning operator would otherwise accumulate one pin
    per call until memory-eviction pressure (cache) or interpreter
    exit (parquet scratch)."""
    if materialize == "cache":
        out = df.cache()
        with _LEDGER_LOCK:
            _PINNED_FRAMES.append(out)
        return out
    if materialize == "checkpoint":
        # localCheckpoint TRUNCATES THE LOGICAL PLAN (lineage) as well
        # as pinning the data — required when pins CHAIN: a stage that
        # consumes its cached input k times still embeds the input's
        # full plan k times in its own, so an n-stage composite grows
        # a ~k^n-node plan tree that OOMs the driver at plan-string
        # build (hit live by prepare_corpus at sf0.001). Lazy
        # (eager=False): materializes on first consumption, blocks
        # stored on executors like cache. Trade: recompute after
        # executor loss needs the checkpoint blocks (no lineage), so
        # long multi-tenant jobs should prefer "parquet".
        out = df.localCheckpoint(eager=False)
        with _LEDGER_LOCK:
            _PINNED_FRAMES.append(out)
        return out
    if materialize == "parquet":
        spark = df.sparkSession
        base = scratch_dir or (
            spark.conf.get("spark.sql.warehouse.dir").rstrip("/")
            + "/_pin_scratch"
        )
        path = f"{base}/pin_{uuid.uuid4().hex}.parquet"
        df.write.mode("overwrite").parquet(path)
        with _LEDGER_LOCK:
            _SCRATCH_PATHS.append(path)
        return spark.read.parquet(path)
    raise ValueError(
        f"materialize must be 'cache', 'checkpoint' or 'parquet', "
        f"got {materialize!r}"
    )


def bounded_collect(df: DataFrame, bound: int, what: str) -> list:
    """``collect()`` with a DECLARED driver-side bound: fetch at most
    ``bound + 1`` rows (the limit is pushed into the plan, so an
    over-bound frame never materializes on the driver) and raise if
    the extra row exists. Every driver-side collect in this engine is
    bounded by construction — scalar aggregates, capped fit samples,
    dim-key bitmaps, calendar-bounded rollups — and this helper makes
    each bound EXPLICIT and ENFORCED instead of a comment: a schema
    drift or filter bug that silently turns a "≤10k rows" frame into
    a data-proportional one fails loudly here instead of OOMing the
    driver at 100 TB (round-7 stretch #7 / round-8 VERDICT #7).

    ``what`` names the site in the error. Row ORDER is the plan's
    (add an orderBy upstream if determinism matters — a LocalLimit
    under shuffle is otherwise arbitrary-prefix).
    """
    if bound < 0:
        raise ValueError(f"bound must be >= 0, got {bound}")
    rows = df.limit(bound + 1).collect()
    if len(rows) > bound:
        raise RuntimeError(
            f"bounded_collect: {what} exceeded its declared driver-side "
            f"bound of {bound} rows — the frame is no longer "
            f"driver-bounded; use the distributed spelling instead"
        )
    return rows


def _checkpoint_rdd_id(df: DataFrame) -> int | None:
    """The JVM RDD id behind a ``localCheckpoint``-pinned frame, or
    None for non-checkpoint frames. A checkpointed Dataset's analyzed
    plan is a ``LogicalRDD`` holding the exact internal RDD whose
    blocks the checkpoint persisted — ``DataFrame.unpersist()`` cannot
    reach it (it only clears the catalog cache entry), so scoped
    release needs this id to free the blocks without sweeping
    caller-owned persistence."""
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() != "LogicalRDD":
            return None
        return int(plan.rdd().id())
    except Exception:  # plan shape drift / session gone — skip scoping
        return None


def release_pins(drop_all: bool = False) -> int:
    """Unpersist every frame pinned so far and delete local parquet
    scratch; returns the number of pins released. Call after the
    consumer of the pinned frames has fully materialized (collected /
    written) — releasing earlier silently degrades a ``cache`` pin
    back to per-consumer recomputation, and makes any LATER use of a
    ``checkpoint`` pin fail outright (its lineage was truncated, so
    the dropped blocks cannot be recomputed). Remote (``scheme://``)
    scratch dirs remain the caller's retention responsibility.

    ``DataFrame.unpersist()`` does NOT free ``localCheckpoint`` blocks
    (they belong to the checkpointed internal RDD, not the catalog
    cache), so checkpoint pins and the CC family's eager round
    checkpoints would otherwise accumulate until driver GC +
    ContextCleaner get around to them — two CC-family queries
    back-to-back at the 100× stress scale OOMed a 48 GB heap on
    exactly those leftover blocks. The default frees EXACTLY the
    ledger's own checkpoint RDDs (ids read off each pinned frame's
    ``LogicalRDD``) — persistence the CALLER created outside the
    ledger survives, so a library call cannot yank a frame the caller
    still needs (round-10 advisor: the previous sweep-everything
    default broke caller-owned checkpoints outright, with no lineage
    left to recompute them). ``drop_all=True`` is the bench/stress
    between-passes reset: it additionally drops EVERY still-persistent
    RDD in the session, callers' included."""
    with _LEDGER_LOCK:
        frames = list(_PINNED_FRAMES)
        _PINNED_FRAMES.clear()
        paths = list(_SCRATCH_PATHS)
        _SCRATCH_PATHS.clear()
    n = len(frames) + len(paths)
    own_ids = set()
    for f in frames:
        rid = _checkpoint_rdd_id(f)
        if rid is not None:
            own_ids.add(rid)
        try:
            f.unpersist()
        except Exception:  # session already stopped — nothing to free
            pass
    for p in paths:
        local = p[len("file:"):] if p.startswith("file:") else p
        if "://" not in local:
            shutil.rmtree(local, ignore_errors=True)
    try:
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        if spark is not None:
            jrdds = spark.sparkContext._jsc.getPersistentRDDs()
            for rid, jrdd in list(jrdds.items()):
                if drop_all or int(rid) in own_ids:
                    jrdd.unpersist(False)
    except Exception:  # no active session / JVM gone — nothing to free
        pass
    return n
