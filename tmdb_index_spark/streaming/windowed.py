"""Structured Streaming operators.

The reference has no streaming engine — its daily cron + per-day
changes feed is micro-batch incremental processing with exactly-once
upsert semantics (SURVEY.md §2.7). These operators are the Spark-native
streaming expression of the same semantics, plus the windowed
aggregations a training-data event pipeline needs:

* :func:`windowed_event_counts` — tumbling event-time windows with a
  watermark for late data. The transformation is source-agnostic: pass
  a batch DataFrame and it computes the same answer (the watermark is
  only attached to streaming inputs), which is how the tests pin
  stream/batch parity.
* :func:`sessionize_stream` — event-time session windows via
  ``F.session_window`` (gap-based), the streaming twin of the batch
  ``sessionize_events`` query.
* :func:`run_upsert_stream` — ``foreachBatch`` + ``update_or_append``:
  every micro-batch merges into a persistent parquet index with
  keep-last semantics. ``Trigger.AvailableNow`` drains what exists and
  stops — the daily-cron shape, restartable from the checkpoint.

Scale notes: windowed aggs are the canonical streaming shuffle — state
is bounded by (watermark horizon × key cardinality), so the watermark
is mandatory at 100 TB. foreachBatch gives exactly-once only as
idempotent-overwrite; the upsert merge is idempotent on replay because
re-merging the same batch reaches the same fixpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tmdb_index_spark.operators.upsert import update_or_append

__all__ = [
    "windowed_event_counts",
    "recover_and_swap",
    "sessionize_stream",
    "run_upsert_stream",
    "attribute_outcomes",
    "dedup_stream",
    "enrich_stream",
]


def dedup_stream(
    events: DataFrame,
    keys: tuple[str, ...] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Ingestion dedup: drop re-delivered rows by key, keeping state
    only inside the watermark horizon.

    At-least-once transports (log shippers, HTTP retries, replayed
    Kafka offsets) re-deliver events; this is the first stage of any
    streaming training-data ingest. ``dropDuplicatesWithinWatermark``
    keys state by ``keys`` and EVICTS each key once the watermark
    passes it — bounded state, unlike plain ``dropDuplicates`` on a
    stream, which holds every key forever and is the classic OOM-in-
    week-two incident. Duplicates arriving later than the watermark
    horizon are not caught (that bound is the price of bounded state —
    choose the horizon from the transport's redelivery window).

    On a batch frame this degrades to a DETERMINISTIC keep-first: the
    row kept per key is the minimum over (``ts_col``, then the
    remaining columns in schema order) — a batch frame has no arrival
    order, and plain ``dropDuplicates`` keeps an arbitrary row, so the
    advertised stream/batch parity would only hold when duplicate
    deliveries carry identical payloads. With keep-min the batch path
    matches the streaming first-arrival rule whenever redeliveries
    preserve the event timestamp (the at-least-once transport case),
    and is at least reproducible when they don't.
    """
    if events.isStreaming:
        return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            list(keys)
        )
    from pyspark.sql import Window

    order = [ts_col] + [
        c for c in events.columns if c not in keys and c != ts_col
    ]
    w = Window.partitionBy(*keys).orderBy(*[F.asc(c) for c in order])
    return (
        events.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") == 1)
        .drop("__rn__")
    )


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling-window counts/sums per event_type with late-data bound.

    Works identically on a batch frame (no watermark attached) — used
    to assert stream/batch parity in tests.
    """
    if events.isStreaming:
        events = events.withWatermark(ts_col, watermark)
    return (
        events.groupBy(
            F.window(F.col(ts_col), window_duration).alias("win"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sessionize_stream(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Session windows per user: a session extends while events arrive
    within ``gap`` of the previous one. ``session_window`` keys state by
    (user, open-session); the watermark closes sessions and evicts
    state."""
    if events.isStreaming:
        events = events.withWatermark(ts_col, watermark)
    return (
        events.groupBy(
            F.session_window(F.col(ts_col), gap).alias("win"), F.col("user_id")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("user_id"),
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
        )
    )


def attribute_outcomes(
    actions: DataFrame,
    outcomes: DataFrame,
    key: str = "user_id",
    within: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream event-time interval join: pair every outcome with
    each prior action by the same key within ``within`` (the ad-click /
    purchase attribution shape).

    Both inputs get the watermark and the join condition carries the
    time-range bound — that pair is what lets Spark EXPIRE buffered
    state (state per side ≈ watermark horizon + interval × key arrival
    rate) instead of holding both streams forever; an unbounded-state
    stream-stream join is the classic production incident. Works
    identically on batch frames (no watermark attached), which is how
    the tests pin stream/batch parity.
    """
    a = actions.select(
        F.col(key),
        F.col("event_id").alias("action_id"),
        F.col("ts").alias("action_ts"),
    )
    o = outcomes.select(
        F.col(key).alias(f"__{key}__"),
        F.col("event_id").alias("outcome_id"),
        F.col("ts").alias("outcome_ts"),
    )
    if a.isStreaming:
        a = a.withWatermark("action_ts", watermark)
    if o.isStreaming:
        o = o.withWatermark("outcome_ts", watermark)
    cond = (
        (a[key] == o[f"__{key}__"])
        & (F.col("outcome_ts") >= F.col("action_ts"))
        & (F.col("outcome_ts") <= F.col("action_ts") + F.expr(f"INTERVAL {within}"))
    )
    return a.join(o, cond).select(
        key, "action_id", "action_ts", "outcome_id", "outcome_ts"
    )


def recover_and_swap(spark, index_path: str, build) -> None:
    """Crash-safe parquet-index maintenance shared by the
    ``foreachBatch`` folds (:func:`run_upsert_stream`, the corpus
    :func:`~tmdb_index_spark.streaming.ingest.run_ingest_stream`):
    roll back a half-finished previous swap (``.old`` survives a crash
    between rename-aside and rename-in), call ``build(index_frame)``
    — ``index_frame`` is None on genuine bootstrap; any read/merge
    failure must FAIL the batch, never except-and-bootstrap (that
    shape overwrites the whole index with one batch's rows on a
    transient IO error) — write the result to ``.staging`` (the plan
    reads ``index_path``, so an in-place overwrite would read its own
    output), then rename-aside + rename-in. No driver-side
    materialization; index size is unbounded."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path
    fs = hpath(index_path).getFileSystem(spark._jsc.hadoopConfiguration())
    cur, old, staging = (
        hpath(index_path),
        hpath(index_path + ".old"),
        hpath(index_path + ".staging"),
    )
    if fs.exists(old):
        if fs.exists(cur):
            fs.delete(old, True)
        else:
            fs.rename(old, cur)
    index = spark.read.parquet(index_path) if fs.exists(cur) else None
    merged = build(index)
    merged.write.mode("overwrite").parquet(index_path + ".staging")
    if fs.exists(cur) and not fs.rename(cur, old):
        raise IOError(f"failed to rename {cur} aside to {old}")
    if not fs.rename(staging, cur):
        raise IOError(f"failed to swap {staging} into {cur}")
    fs.delete(old, True)


def run_upsert_stream(
    batches: DataFrame,
    index_path: str,
    checkpoint_dir: str,
    available_now: bool = True,
    seq_col: str | None = None,
) -> None:
    """Fold a stream of change batches into a persistent parquet index.

    Each micro-batch upserts via ``update_or_append`` (incoming row
    wins per id) and atomically overwrites the index — the streaming
    twin of the reference's per-day fold (tmdb_index.py:248-254). With
    ``Trigger.AvailableNow`` this drains pending batches and returns:
    the daily-cron lifecycle, restartable from ``checkpoint_dir``.

    Duplicate ids WITHIN one micro-batch resolve keep-last, mirroring
    the per-day dedup (reference tmdb_index.py:214). Pass ``seq_col``
    (an event-time / sequence column) to make that tie-break
    deterministic across replays; without it the fallback is physical
    arrival order (``monotonically_increasing_id``), which is stable
    within one execution but ARBITRARY across task retries — fine when
    intra-batch duplicates are idempotent re-sends, wrong when they
    carry different payloads.

    Crash safety: the index swap is rename-aside (never
    delete-then-rename), and bootstrap only happens when the index
    genuinely doesn't exist — a transient read error aborts the batch
    instead of silently overwriting the index with one batch's rows.
    A crash mid-swap leaves ``<index>.old``, which the next batch (or
    restarted run) rolls back before merging.
    """
    spark = batches.sparkSession

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import Window

        order = F.col(seq_col).desc() if seq_col else None
        if order is None:
            # DELTAS.md #6: arrival-order fallback — winner is
            # arbitrary under task retries; pass seq_col for a
            # replay-deterministic election
            batch_df = batch_df.withColumn(
                "__arrival__", F.monotonically_increasing_id()
            )
            order = F.col("__arrival__").desc()
        w = Window.partitionBy("id").orderBy(order)
        deduped = (
            batch_df.withColumn("__rn__", F.row_number().over(w))
            .filter(F.col("__rn__") == 1)
            .drop("__rn__", "__arrival__")
        )

        recover_and_swap(
            spark,
            index_path,
            lambda index: deduped
            if index is None
            else update_or_append(index, deduped),
        )

    writer = batches.writeStream.foreachBatch(merge).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    writer.start().awaitTermination()


def enrich_stream(
    events: DataFrame,
    dim: DataFrame,
    on: str = "user_id",
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment join: attach dimension attributes to a
    live event stream (the lookup-table pattern — user profile, device
    registry, geo table).

    Stream-static joins are STATELESS in Structured Streaming: each
    micro-batch joins against the static side as of that batch, no
    watermark and no state store involved — so this is the cheapest
    join shape a streaming pipeline has, and the first choice before
    reaching for a stream-stream join. The static side is explicitly
    ``broadcast()`` (a dimension that fits one executor's memory at
    100 TB fact scale is still the common case); drop the hint by
    passing a pre-transformed ``dim`` if the dimension is genuinely
    fact-sized — Spark then shuffles the static side per batch, which
    is the signal to pre-key and bucket it instead.

    The same expression works on a batch frame (identical join), which
    is how the parity test pins semantics. Inner and left joins only:
    right/full joins against a stream are not meaningful batch-by-batch
    (the stream side is never "complete").
    """
    if how not in ("left", "inner"):
        raise ValueError(f"stream-static join must be left or inner, got {how!r}")
    return events.join(F.broadcast(dim), on, how)
