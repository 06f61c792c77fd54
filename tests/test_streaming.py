"""Structured Streaming tests: stream/batch parity for windowed aggs,
session windows, and the foreachBatch incremental upsert."""

from __future__ import annotations

import os
from datetime import datetime

import pytest
from pyspark.sql import types as T

from tmdb_index_spark.streaming.windowed import (
    run_upsert_stream,
    sessionize_stream,
    windowed_event_counts,
)

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)

EVENTS = [
    (0, datetime(2024, 1, 1, 0, 5), 1, "click", 1.0),
    (1, datetime(2024, 1, 1, 0, 45), 1, "click", 2.0),
    (2, datetime(2024, 1, 1, 1, 10), 1, "view", 3.0),   # >30min gap: new session
    (3, datetime(2024, 1, 1, 0, 20), 2, "click", 4.0),
]


def _write_events(spark, path):
    spark.createDataFrame(EVENTS, EVENT_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)


def _drain(stream_df, tmpdir, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", f"{tmpdir}/ckpt_{name}")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.sql(f"SELECT * FROM {name}")


def test_windowed_counts_stream_matches_batch(spark, tmp_path):
    src = str(tmp_path / "events")
    _write_events(spark, src)
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
    got = _drain(
        windowed_event_counts(stream, "1 hour"), str(tmp_path), "win_counts"
    ).collect()
    exp = windowed_event_counts(
        spark.read.parquet(src), "1 hour"
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, exp))
    assert len(got) == 2  # (h0, click) ×3 events across both users; (h1, view)


def test_sessionize_stream_gap_semantics(spark, tmp_path):
    src = str(tmp_path / "events")
    _write_events(spark, src)
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
    got = _drain(
        sessionize_stream(stream, gap="30 minutes"), str(tmp_path), "sessions"
    ).collect()
    per_user = {}
    for r in got:
        per_user.setdefault(r["user_id"], []).append(r)
    # user 1: events at 0:05/0:45 chain into one session, 1:10 opens another
    assert len(per_user[1]) == 2
    assert len(per_user[2]) == 1
    assert sum(r["n_events"] for r in per_user[1]) == 3


def test_upsert_stream_folds_batches(spark, tmp_path):
    batches = str(tmp_path / "batches")
    index = str(tmp_path / "index.parquet")
    schema = "id long, v string"
    # batch 1: ids 0,1 — written first
    spark.createDataFrame([(0, "a"), (1, "b")], schema).coalesce(1).write.mode(
        "append"
    ).parquet(batches)
    stream = spark.readStream.schema(
        T.StructType(
            [T.StructField("id", T.LongType()), T.StructField("v", T.StringType())]
        )
    ).parquet(batches)
    run_upsert_stream(stream, index, str(tmp_path / "ckpt1"))
    first = {r["id"]: r["v"] for r in spark.read.parquet(index).collect()}
    assert first == {0: "a", 1: "b"}

    # batch 2: id 1 overwritten, id 2 appended; restart drains only the new file
    spark.createDataFrame([(1, "B"), (2, "c")], schema).coalesce(1).write.mode(
        "append"
    ).parquet(batches)
    stream2 = spark.readStream.schema(
        T.StructType(
            [T.StructField("id", T.LongType()), T.StructField("v", T.StringType())]
        )
    ).parquet(batches)
    run_upsert_stream(stream2, index, str(tmp_path / "ckpt1"))
    final = {r["id"]: r["v"] for r in spark.read.parquet(index).collect()}
    assert final == {0: "a", 1: "B", 2: "c"}


def _stream(spark, path):
    return spark.readStream.schema(
        T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("v", T.StringType()),
                T.StructField("seq", T.LongType()),
            ]
        )
    ).parquet(path)


def test_upsert_stream_seq_col_tie_break(spark, tmp_path):
    """Intra-batch duplicate ids resolve by the EXPLICIT sequence
    column, not physical arrival order — deterministic across
    retries/replays."""
    batches = str(tmp_path / "b")
    index = str(tmp_path / "idx.parquet")
    # seq order deliberately disagrees with row order
    spark.createDataFrame(
        [(1, "late", 10), (1, "early", 5), (2, "only", 1)],
        "id long, v string, seq long",
    ).coalesce(1).write.mode("append").parquet(batches)
    run_upsert_stream(
        _stream(spark, batches), index, str(tmp_path / "ck"), seq_col="seq"
    )
    got = {r["id"]: r["v"] for r in spark.read.parquet(index).collect()}
    assert got == {1: "late", 2: "only"}


def test_upsert_stream_recovers_mid_swap_crash(spark, tmp_path):
    """A crash between rename-aside and rename-in leaves only
    <index>.old; the next batch must roll the old index back and merge
    into it, not bootstrap over nothing."""
    import shutil

    batches = str(tmp_path / "b")
    index = str(tmp_path / "idx.parquet")
    spark.createDataFrame([(0, "a", 1)], "id long, v string, seq long").coalesce(
        1
    ).write.mode("append").parquet(batches)
    run_upsert_stream(_stream(spark, batches), index, str(tmp_path / "ck"))

    # Simulate the crash window: index renamed aside, swap-in never ran.
    shutil.move(index, index + ".old")
    assert not os.path.exists(index)

    spark.createDataFrame([(1, "b", 2)], "id long, v string, seq long").coalesce(
        1
    ).write.mode("append").parquet(batches)
    run_upsert_stream(_stream(spark, batches), index, str(tmp_path / "ck"))
    got = {r["id"]: r["v"] for r in spark.read.parquet(index).collect()}
    assert got == {0: "a", 1: "b"}  # id 0 survived the crash
    assert not os.path.exists(index + ".old")


def test_upsert_stream_unreadable_index_fails_not_bootstraps(spark, tmp_path):
    """An EXISTING but unreadable index must abort the batch — the
    round-1 except-bootstrap shape would silently replace the whole
    index with the current batch."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    batches = str(tmp_path / "b")
    index = str(tmp_path / "idx.parquet")
    os.makedirs(index)  # exists, but holds no readable parquet
    spark.createDataFrame([(0, "a", 1)], "id long, v string, seq long").coalesce(
        1
    ).write.mode("append").parquet(batches)
    with pytest.raises(StreamingQueryException):
        run_upsert_stream(_stream(spark, batches), index, str(tmp_path / "ck"))
    assert os.listdir(index) == []  # untouched, not overwritten


def test_dedup_stream_drops_redelivered_across_batches(spark, tmp_path):
    """Re-delivered event_ids (same batch or a later micro-batch within
    the watermark) must be dropped; batch mode degrades to plain
    dropDuplicates."""
    from tmdb_index_spark.streaming.windowed import dedup_stream

    src = str(tmp_path / "src")
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("v", T.StringType()),
        ]
    )
    t = datetime(2024, 1, 1, 12, 0, 0)
    # file 1: ids 1,2,2 (intra-batch dup); file 2: redelivered 2 + new 3
    spark.createDataFrame(
        [(1, t, "a"), (2, t, "b"), (2, t, "b")], schema
    ).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame([(2, t, "b"), (3, t, "c")], schema).coalesce(
        1
    ).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # force multiple micro-batches
        .parquet(src)
    )
    out = dedup_stream(stream, keys=("event_id",), watermark="10 hours")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r["event_id"]: r["v"] for r in spark.sql("SELECT * FROM dedup_sink").collect()
    }
    assert got == {1: "a", 2: "b", 3: "c"}

    # batch parity: same key set survives
    batch = spark.read.parquet(src)
    assert sorted(
        r["event_id"] for r in dedup_stream(batch).collect()
    ) == [1, 2, 3]


def test_stateful_running_totals_across_batches(spark, tmp_path):
    from tmdb_index_spark.streaming.stateful import running_user_totals

    src = str(tmp_path / "ev")
    ckpt = str(tmp_path / "ckpt_state")
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    spark.createDataFrame(EVENTS[:2], EVENT_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    def drain(name):
        # foreachBatch (not the memory sink): only sinks with replayable
        # commit logs support restarting from the checkpoint, which is
        # exactly what this test exercises.
        rows: list = []

        def collect(batch_df, batch_id):
            rows.extend(batch_df.collect())

        q = (
            running_user_totals(spark.readStream.schema(schema).parquet(src))
            .writeStream.foreachBatch(collect)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {r["user_id"]: (r["n_events"], r["total_value"]) for r in rows}

    first = drain("state_b1")
    assert first == {1: (2, 3.0)}

    # second file arrives; state persists across the restart via checkpoint
    spark.createDataFrame(EVENTS[2:], EVENT_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    second = drain("state_b2")
    assert second == {1: (3, 6.0), 2: (1, 4.0)}


CLICKS = [
    (10, datetime(2024, 1, 1, 0, 0), 1, "click", 0.0),
    (11, datetime(2024, 1, 1, 1, 0), 1, "click", 0.0),
    (12, datetime(2024, 1, 1, 0, 10), 2, "click", 0.0),
]
PURCHASES = [
    (20, datetime(2024, 1, 1, 0, 20), 1, "purchase", 9.0),   # within 30m of click 10
    (21, datetime(2024, 1, 1, 2, 30), 1, "purchase", 5.0),   # not within 30m of any click
    (22, datetime(2024, 1, 1, 0, 25), 2, "purchase", 7.0),   # within 30m of click 12
]


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    from tmdb_index_spark.streaming.windowed import attribute_outcomes

    a_path, o_path = str(tmp_path / "clicks"), str(tmp_path / "purchases")
    spark.createDataFrame(CLICKS, EVENT_SCHEMA).coalesce(1).write.parquet(a_path)
    spark.createDataFrame(PURCHASES, EVENT_SCHEMA).coalesce(1).write.parquet(o_path)

    batch = attribute_outcomes(
        spark.read.parquet(a_path), spark.read.parquet(o_path)
    )
    expected = {(1, 10, 20), (2, 12, 22)}
    got_batch = {
        (r.user_id, r.action_id, r.outcome_id) for r in batch.collect()
    }
    assert got_batch == expected

    stream = attribute_outcomes(
        spark.readStream.schema(EVENT_SCHEMA).parquet(a_path),
        spark.readStream.schema(EVENT_SCHEMA).parquet(o_path),
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("attrib")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_attrib"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got_stream = {
        (r.user_id, r.action_id, r.outcome_id)
        for r in spark.sql("SELECT * FROM attrib").collect()
    }
    assert got_stream == expected


def test_enrich_stream_static_join_matches_batch(spark, tmp_path):
    import pytest

    from tmdb_index_spark.streaming.windowed import enrich_stream

    src = str(tmp_path / "events")
    _write_events(spark, src)
    dim = spark.createDataFrame(
        [(1, "gold"), (3, "silver")], "user_id int, tier string"
    )
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
    q = (
        enrich_stream(stream, dim)
        .writeStream.format("memory")
        .queryName("enriched")
        .outputMode("append")
        .option("checkpointLocation", f"{tmp_path}/ckpt_enrich")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT * FROM enriched").collect()
    exp = enrich_stream(spark.read.parquet(src), dim).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, exp))
    # left semantics: user 2 (no dim row) survives with NULL tier
    tiers = {r["user_id"]: r["tier"] for r in got}
    assert tiers[1] == "gold" and tiers[2] is None
    with pytest.raises(ValueError):
        enrich_stream(stream, dim, how="full")


DOCS_B1 = [
    (1, "the quick brown fox jumps over the lazy dog again and again"),
    (2, "completely different content about spark streaming state stores"),
]
DOCS_B2 = [
    # near-identical to doc 1 (one word changed at the end)
    (3, "the quick brown fox jumps over the lazy dog again and once"),
    # novel
    (4, "yet another unrelated document with fresh vocabulary entirely"),
    # exact redelivery of doc 1: must NOT self-match or duplicate state
    (1, "the quick brown fox jumps over the lazy dog again and again"),
]
DOC_SCHEMA = "doc_id long, text string"


def test_neardup_stream_detects_across_batches(spark, tmp_path):
    from tmdb_index_spark.streaming.neardup import neardup_detect_stream

    src = str(tmp_path / "docs")
    ckpt = str(tmp_path / "ckpt_neardup")
    spark.createDataFrame(DOCS_B1, DOC_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    def drain():
        rows: list = []

        def collect(batch_df, batch_id):
            rows.extend(batch_df.collect())

        q = (
            neardup_detect_stream(
                spark.readStream.schema(DOC_SCHEMA).parquet(src)
            )
            .writeStream.foreachBatch(collect)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return rows

    first = drain()
    assert first == []  # two unrelated docs: no detections

    spark.createDataFrame(DOCS_B2, DOC_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    second = drain()
    pairs = {(r["doc_id"], r["matched_id"]) for r in second}
    # doc 3 is a near-dup of the doc-1 signature kept in bucket state
    assert pairs == {(3, 1)}
    assert all(r["sig_sim"] >= 0.5 for r in second)
    # the redelivered doc 1 neither self-matched nor matched doc 3
    assert not any(r["doc_id"] == 1 for r in second)


def test_neardup_stream_agrees_with_batch_signatures(spark):
    # the stream's row-local signature must equal the batch operator's
    # explode->groupBy signature for the same docs
    import pyspark.sql.functions as F

    from tmdb_index_spark.operators.dedup_text import minhash_signatures
    from tmdb_index_spark.streaming.neardup import _sig_mapper

    df = spark.createDataFrame(DOCS_B1 + DOCS_B2[:2], DOC_SCHEMA)
    batch = {
        r["doc_id"]: [r[f"minhash_{i}"] for i in range(16)]
        for r in minhash_signatures(df, num_hashes=16).collect()
    }
    stream_form = {
        r["doc_id"]: list(r["sig"])
        for r in df.mapInPandas(
            _sig_mapper("text", "doc_id", 3, 16), "doc_id long, sig array<long>"
        ).collect()
    }
    assert stream_form == batch


def test_neardup_stream_rejects_bad_bands(spark):
    import pytest

    from tmdb_index_spark.streaming.neardup import neardup_detect_stream

    df = spark.createDataFrame(DOCS_B1, DOC_SCHEMA)
    with pytest.raises(ValueError):
        neardup_detect_stream(df, num_hashes=16, bands=5)


# ------------------------------------------------------- transitions


def test_running_transitions_stream_batch_parity(spark, tmp_path):
    from collections import Counter

    from tmdb_index_spark.operators.temporal import transition_matrix
    from tmdb_index_spark.streaming.stateful import running_transitions

    src = str(tmp_path / "tr_ev")
    ckpt = str(tmp_path / "tr_ckpt")

    batch1 = [
        (0, datetime(2024, 1, 1, 0, 0), 1, "click", 0.0),
        (1, datetime(2024, 1, 1, 0, 1), 1, "view", 0.0),
        (2, datetime(2024, 1, 1, 0, 0), 2, "click", 0.0),
    ]
    # batch 2 continues user 1 (view -> purchase spans the boundary)
    batch2 = [
        (3, datetime(2024, 1, 1, 0, 2), 1, "purchase", 0.0),
        (4, datetime(2024, 1, 1, 0, 3), 2, "click", 0.0),
    ]

    deltas: list = []

    def drain():
        def collect(batch_df, batch_id):
            deltas.extend(batch_df.collect())

        q = (
            running_transitions(
                spark.readStream.schema(EVENT_SCHEMA).parquet(src)
            )
            .writeStream.foreachBatch(collect)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    spark.createDataFrame(batch1, EVENT_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    drain()
    spark.createDataFrame(batch2, EVENT_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    drain()

    streamed = Counter()
    for r in deltas:
        streamed[(r["prev_event"], r["next_event"])] += r["n"]

    all_events = spark.createDataFrame(batch1 + batch2, EVENT_SCHEMA)
    batch = {
        (r["prev_event"], r["next_event"]): r["n_transitions"]
        for r in transition_matrix(all_events).collect()
    }
    assert dict(streamed) == batch
    # the boundary-spanning transition was counted exactly once
    assert streamed[("view", "purchase")] == 1


def test_heavy_hitters_misra_gries_guarantees(spark, tmp_path):
    # capacity 2 with 4 distinct users forces the mergeable-summaries
    # shrink; after draining both appends the classic MG guarantees
    # must hold against the exact counts.
    from collections import Counter

    from tmdb_index_spark.streaming.stateful import running_heavy_hitters

    src = str(tmp_path / "hh_ev")
    ckpt = str(tmp_path / "hh_ckpt")

    def ev(eid, uid):
        return (eid, datetime(2024, 1, 1, 0, eid % 60), uid, "click", 0.0)

    batch1 = [ev(i, 1) for i in range(6)] + [ev(10 + i, 2) for i in range(3)]
    batch2 = (
        [ev(20 + i, 1) for i in range(4)]
        + [ev(30 + i, 3) for i in range(2)]
        + [ev(40, 4)]
    )
    true = Counter()
    for b in (batch1, batch2):
        for e in b:
            true[e[2]] += 1

    emissions: list = []

    def drain():
        def collect(batch_df, batch_id):
            emissions.append(batch_df.collect())

        q = (
            running_heavy_hitters(
                spark.readStream.schema(EVENT_SCHEMA).parquet(src),
                capacity=2,
            )
            .writeStream.foreachBatch(collect)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    for batch in (batch1, batch2):
        spark.createDataFrame(batch, EVENT_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        drain()

    final = [r for batch in emissions[-1:] for r in batch]
    assert final, "final drain must emit the summary"
    assert len(final) <= 2  # capacity bound on state
    err = final[0]["err"]
    for r in final:
        assert r["count_lb"] <= true[r["user_id"]] <= r["count_lb"] + err
    # every user whose true count exceeds the error offset must survive
    kept = {r["user_id"] for r in final}
    for uid, c in true.items():
        if c > err:
            assert uid in kept, (uid, c, err)


def test_heavy_hitters_capacity_validation(spark):
    import pytest as _pytest

    from tmdb_index_spark.streaming.stateful import running_heavy_hitters

    with _pytest.raises(ValueError, match="capacity"):
        running_heavy_hitters(None, capacity=0)


# ---------------------------------------------------------------------------
# run_ingest_stream (streaming corpus ingestion)
# ---------------------------------------------------------------------------


def _ingest_words(prefix, n=30):
    return " ".join(f"{prefix}{i:02d}" for i in range(n))


def test_ingest_stream_folds_novel_content_only(spark, tmp_path):
    from tmdb_index_spark.streaming.ingest import run_ingest_stream

    batches = str(tmp_path / "doc_batches")
    index = str(tmp_path / "corpus_index.parquet")
    stats = str(tmp_path / "ingest_stats")
    schema = "doc_id long, text string, source string"
    ta, tb, tc = _ingest_words("a"), _ingest_words("b"), _ingest_words("c")

    def _stream():
        return spark.readStream.schema(
            T.StructType(
                [
                    T.StructField("doc_id", T.LongType()),
                    T.StructField("text", T.StringType()),
                    T.StructField("source", T.StringType()),
                ]
            )
        ).parquet(batches)

    # batch 1: doc 3 is a byte-dup of doc 1 inside the batch
    spark.createDataFrame(
        [(1, ta, "s"), (2, tb, "s"), (3, ta, "s")], schema
    ).coalesce(1).write.mode("append").parquet(batches)
    run_ingest_stream(_stream(), index, stats, str(tmp_path / "ck1"))
    assert sorted(
        r["doc_id"] for r in spark.read.parquet(index).collect()
    ) == [1, 2]
    s0 = spark.read.parquet(stats).filter("batch_id = 0").collect()[0]
    assert (s0["n_batch"], s0["n_exact_batch_dup"], s0["n_kept"]) == (3, 1, 2)

    # batch 2: 4 novel; 5 re-sends doc 1's exact content; 6 is a
    # TOKEN-dup of doc 2 (double space -> md5 differs, shingles equal)
    spark.createDataFrame(
        [(4, tc, "s"), (5, ta, "s"), (6, tb.replace(" ", "  ", 1), "s")],
        schema,
    ).coalesce(1).write.mode("append").parquet(batches)
    run_ingest_stream(_stream(), index, stats, str(tmp_path / "ck1"))
    assert sorted(
        r["doc_id"] for r in spark.read.parquet(index).collect()
    ) == [1, 2, 4]
    s1 = spark.read.parquet(stats).filter("batch_id = 1").collect()[0]
    assert s1["n_batch"] == 3
    assert s1["n_exact_index_dup"] == 1   # doc 5
    assert s1["n_near_index_dup"] == 1    # doc 6
    assert s1["n_kept"] == 1              # doc 4

    # full replay under a FRESH checkpoint: every document's content is
    # already in the index, so the fold is a no-op fixpoint — this is
    # the post-swap crash window (index updated, checkpoint gone)
    run_ingest_stream(_stream(), index, stats, str(tmp_path / "ck2"))
    assert sorted(
        r["doc_id"] for r in spark.read.parquet(index).collect()
    ) == [1, 2, 4]
    # and the yield ledger must SURVIVE the replay: the replayed batch
    # (all 6 docs vs the already-updated index) would recompute
    # zero-yield rows, but a committed batch partition is never
    # overwritten, so batch 0 still reports its true first-run yields
    s0_replay = spark.read.parquet(stats).filter("batch_id = 0").collect()[0]
    assert (
        s0_replay["n_batch"],
        s0_replay["n_exact_batch_dup"],
        s0_replay["n_kept"],
    ) == (3, 1, 2)


def test_ingest_ledger_survives_replay_without_success_markers(
    spark, tmp_path
):
    """The ledger's replay guard keys on its OWN ``_LEDGER_SUCCESS``
    sentinel, not the committer's ``_SUCCESS`` (round-12 advisor): with
    ``marksuccessfuljobs`` disabled, a post-swap replay must still skip
    committed partitions instead of overwriting the true yield rows
    with zero-yield recomputations."""
    import os

    from tmdb_index_spark.streaming.ingest import run_ingest_stream

    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    key = "mapreduce.fileoutputcommitter.marksuccessfuljobs"
    old = hconf.get(key)
    hconf.set(key, "false")
    try:
        batches = str(tmp_path / "doc_batches")
        index = str(tmp_path / "corpus_index.parquet")
        stats = str(tmp_path / "ingest_stats")
        ta, tb = _ingest_words("a"), _ingest_words("b")
        spark.createDataFrame(
            [(1, ta, "s"), (2, tb, "s"), (3, ta, "s")],
            "doc_id long, text string, source string",
        ).coalesce(1).write.mode("append").parquet(batches)

        def _stream():
            return spark.readStream.schema(
                "doc_id long, text string, source string"
            ).parquet(batches)

        run_ingest_stream(_stream(), index, stats, str(tmp_path / "ck1"))
        part = os.path.join(stats, "batch_id=0")
        # the committer config took effect AND our sentinel landed
        assert not os.path.exists(os.path.join(part, "_SUCCESS"))
        assert os.path.exists(os.path.join(part, "_LEDGER_SUCCESS"))
        # post-swap replay under a fresh checkpoint: all content already
        # indexed -> recomputed stats would be zero-yield lies; the
        # committed partition must survive untouched
        run_ingest_stream(_stream(), index, stats, str(tmp_path / "ck2"))
        s0 = spark.read.parquet(stats).filter("batch_id = 0").collect()[0]
        assert (s0["n_batch"], s0["n_exact_batch_dup"], s0["n_kept"]) == (
            3,
            1,
            2,
        )
    finally:
        if old is None:
            hconf.unset(key)
        else:
            hconf.set(key, old)


def test_ingest_ledger_accepts_legacy_success_marker(spark, tmp_path):
    """Upgrade compatibility (round-13 ADVICE): a stats partition
    committed by a pre-``_LEDGER_SUCCESS`` version of the loop carries
    only the committer's ``_SUCCESS`` marker — a post-upgrade replay of
    that batch must treat it as committed rather than overwrite its
    true yield rows with zero-yield recomputations."""
    import os

    from tmdb_index_spark.streaming.ingest import run_ingest_stream

    batches = str(tmp_path / "doc_batches")
    index = str(tmp_path / "corpus_index.parquet")
    stats = str(tmp_path / "ingest_stats")
    ta, tb = _ingest_words("a"), _ingest_words("b")
    spark.createDataFrame(
        [(1, ta, "s"), (2, tb, "s"), (3, ta, "s")],
        "doc_id long, text string, source string",
    ).coalesce(1).write.mode("append").parquet(batches)

    def _stream():
        return spark.readStream.schema(
            "doc_id long, text string, source string"
        ).parquet(batches)

    run_ingest_stream(_stream(), index, stats, str(tmp_path / "ck1"))
    part = os.path.join(stats, "batch_id=0")
    # rewrite history: the partition looks like a pre-upgrade commit
    # (committer _SUCCESS present, ledger sentinel absent)
    os.remove(os.path.join(part, "_LEDGER_SUCCESS"))
    open(os.path.join(part, "_SUCCESS"), "w").close()
    run_ingest_stream(_stream(), index, stats, str(tmp_path / "ck2"))
    s0 = spark.read.parquet(stats).filter("batch_id = 0").collect()[0]
    assert (s0["n_batch"], s0["n_exact_batch_dup"], s0["n_kept"]) == (
        3,
        1,
        2,
    )


def test_ingest_stream_semantic_stage_parity_and_model_reuse(
    spark, tmp_path
):
    """Round-13 capability parity: the streaming ingest wrapper runs
    the batch composite's semantic (PQ/SDC) novelty stage per
    micro-batch — a paraphrase-grade near-dup (disjoint tokens, so
    MinHash admits it; near-identical embedding) of already-indexed
    content must drop at stage 3b, with stats equal to the sequential
    batch composite's — and the persisted ANN model artifact survives
    a post-swap replay without refitting."""
    import numpy as np

    from tmdb_index_spark.operators.ann_store import load_ann_model
    from tmdb_index_spark.operators.corpus_pipeline import (
        ingest_corpus_batch,
    )
    from tmdb_index_spark.operators.materialize import release_pins
    from tmdb_index_spark.streaming.ingest import run_ingest_stream

    rng = np.random.RandomState(3)
    dim = 16
    vecs = rng.randn(5, dim)
    schema = "doc_id long, text string, source string"
    batch1 = [
        (i, f"first wave document {i} alpha{i} beta{i} gamma{i}", "s")
        for i in range(5)
    ]
    # doc 10: paraphrase of doc 2 (disjoint tokens, embedding = doc
    # 2's + tiny noise); doc 11: genuinely novel direction
    novel = None
    for s in range(200):
        cand = np.random.RandomState(500 + s).randn(dim)
        cos = vecs @ cand / (
            np.linalg.norm(vecs, axis=1) * np.linalg.norm(cand)
        )
        if np.abs(cos).max() < 0.4:
            novel = cand
            break
    assert novel is not None
    batch2 = [
        (10, "rephrased rendition using wholly other terms", "s"),
        (11, "unrelated fresh subject matter entirely", "s"),
    ]
    emb_rows = [(i, [float(x) for x in vecs[i]]) for i in range(5)]
    emb_rows += [
        (10, [float(x) for x in vecs[2] + 0.01 * rng.randn(dim)]),
        (11, [float(x) for x in novel]),
    ]
    emb = spark.createDataFrame(
        emb_rows, "vec_id long, embedding array<double>"
    )

    batches = str(tmp_path / "doc_batches")
    index = str(tmp_path / "corpus_index.parquet")
    stats = str(tmp_path / "ingest_stats")
    mp = str(tmp_path / "ann_model.parquet")
    spark.createDataFrame(batch1, schema).coalesce(1).write.mode(
        "append"
    ).parquet(batches)
    spark.createDataFrame(batch2, schema).coalesce(1).write.mode(
        "append"
    ).parquet(batches)

    def _stream():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(batches)
        )

    run_ingest_stream(
        _stream(), index, stats, str(tmp_path / "ck1"),
        embeddings=emb, semantic_threshold=0.6, model_path=mp,
    )
    got_ids = sorted(
        r["doc_id"] for r in spark.read.parquet(index).collect()
    )
    assert got_ids == [0, 1, 2, 3, 4, 11]  # 10 dropped at stage 3b
    s1 = spark.read.parquet(stats).filter("batch_id = 1").collect()[0]
    assert s1["n_semantic_index_dup"] == 1
    assert s1["n_near_index_dup"] == 0  # MinHash did NOT catch it
    assert s1["n_kept"] == 1
    # bootstrap batch fit nothing (empty index); batch 2 fit v1
    model = load_ann_model(spark, mp)
    assert model is not None and model["meta"]["fit_id"] == 1

    # sequential batch-composite parity on the same two batches
    empty = spark.createDataFrame([], schema)
    b1 = ingest_corpus_batch(
        empty, spark.createDataFrame(batch1, schema),
        embeddings=emb, semantic_threshold=0.6, materialize="cache",
    )
    b2 = ingest_corpus_batch(
        b1["new_index"], spark.createDataFrame(batch2, schema),
        embeddings=emb, semantic_threshold=0.6, materialize="cache",
    )
    assert sorted(
        r["doc_id"] for r in b2["new_index"].select("doc_id").collect()
    ) == got_ids
    seq = b2["stats"].collect()[0]
    for c in (
        "n_batch", "n_exact_batch_dup", "n_exact_index_dup",
        "n_near_index_dup", "n_semantic_index_dup", "n_kept",
    ):
        assert s1[c] == seq[c], (c, s1[c], seq[c])
    release_pins()

    # post-swap replay (fresh checkpoint): index is a fixpoint, the
    # ledger survives, and the stored model is REUSED (fit_id stays 1)
    run_ingest_stream(
        _stream(), index, stats, str(tmp_path / "ck2"),
        embeddings=emb, semantic_threshold=0.6, model_path=mp,
    )
    assert sorted(
        r["doc_id"] for r in spark.read.parquet(index).collect()
    ) == got_ids
    s1_replay = spark.read.parquet(stats).filter("batch_id = 1").collect()[0]
    assert s1_replay["n_semantic_index_dup"] == 1
    assert s1_replay["n_kept"] == 1
    model2 = load_ann_model(spark, mp)
    assert model2["meta"]["fit_id"] == 1
    assert model2["meta"]["fit_md5"] == model["meta"]["fit_md5"]


def test_ingest_stream_bucketed_index_parity_and_replay(spark, tmp_path):
    """Round-14 bucket-incremental index: with index_buckets the
    streamed corpus (read via the manifest) and the per-batch stats
    are identical to the rename-aside swap's, a fold writes ONLY the
    touched buckets, replay under a fresh checkpoint is a fixpoint,
    and the band sidecar's rebuild path resolves the manifest view
    (never the raw directory tree with its superseded versions)."""
    import os

    from tmdb_index_spark.sources.bucket_store import (
        read_bucket_index,
        read_bucket_manifest,
    )
    from tmdb_index_spark.streaming.ingest import run_ingest_stream

    schema = "doc_id long, text string, source string"
    ta, tb, tc = _ingest_words("a"), _ingest_words("b"), _ingest_words("c")
    batches = str(tmp_path / "doc_batches")
    spark.createDataFrame(
        [(1, ta, "s"), (2, tb, "s"), (3, ta, "s")], schema
    ).coalesce(1).write.mode("append").parquet(batches)
    spark.createDataFrame(
        [(4, tc, "s"), (5, ta, "s"), (6, tb.replace(" ", "  ", 1), "s")],
        schema,
    ).coalesce(1).write.mode("append").parquet(batches)

    def _run(index, stats, ck, **kw):
        run_ingest_stream(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(batches),
            index, stats, ck, **kw,
        )

    index_b = str(tmp_path / "idx_bucketed")
    stats_b = str(tmp_path / "st_bucketed")
    bp = str(tmp_path / "bands.parquet")
    _run(index_b, stats_b, str(tmp_path / "ck_b"),
         index_buckets=8, bands_path=bp)

    index_p = str(tmp_path / "idx_plain.parquet")
    stats_p = str(tmp_path / "st_plain")
    _run(index_p, stats_p, str(tmp_path / "ck_p"))

    got = read_bucket_index(spark, index_b)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, spark.read.parquet(index_p).collect())
    )
    assert sorted(r["doc_id"] for r in got.collect()) == [1, 2, 4]
    for bid in (0, 1):
        sb = spark.read.parquet(stats_b).filter(
            f"batch_id = {bid}"
        ).collect()[0]
        sp = spark.read.parquet(stats_p).filter(
            f"batch_id = {bid}"
        ).collect()[0]
        for c in (
            "n_batch", "n_exact_batch_dup", "n_exact_index_dup",
            "n_near_index_dup", "n_kept",
        ):
            assert sb[c] == sp[c], (bid, c, sb[c], sp[c])

    # fold shape: batch 2 kept ONE doc (id 4) -> exactly one touched
    # bucket in v=2, everything else still pointing at v=1
    man = read_bucket_manifest(spark, index_b)
    assert man["version"] == 2 and man["n_buckets"] == 8
    v2 = [d for d in man["buckets"].values() if "v=2" in d]
    assert len(v2) == 1

    # replay under a fresh checkpoint: the composite sees the updated
    # index, keeps nothing, the fold commits nothing (version stays),
    # the ledger survives, and the index is a fixpoint
    _run(index_b, stats_b, str(tmp_path / "ck_b2"),
         index_buckets=8, bands_path=bp)
    assert read_bucket_manifest(spark, index_b)["version"] == 2
    assert sorted(
        r["doc_id"]
        for r in read_bucket_index(spark, index_b).collect()
    ) == [1, 2, 4]
    s1 = spark.read.parquet(stats_b).filter("batch_id = 1").collect()[0]
    assert (s1["n_near_index_dup"], s1["n_kept"]) == (1, 1)
    # no whole-index artifact was ever written in bucketed mode
    assert not os.path.exists(os.path.join(index_b + ".staging"))


def test_ingest_stream_codes_sidecar_parity_and_lifecycle(spark, tmp_path):
    """Round-14 persisted PQ-codes sidecar: with codes_path the
    streamed index + stats are identical to the recompute path, the
    sidecar equals a from-scratch encode of the final index under the
    stored model, its meta binds it to BOTH the index artifact's
    fingerprint and the model's fit fingerprint, incremental
    maintenance (same checkpoint, new batch) replaces exactly the
    kept ids' rows, and codes_path without the model artifact params
    is rejected up front."""
    import numpy as np
    import pytest as _pytest

    from pyspark.sql import functions as F

    from tmdb_index_spark.operators.ann_store import load_ann_model
    from tmdb_index_spark.operators.similarity import pq_code_rows
    from tmdb_index_spark.streaming.ingest import (
        _listing_fingerprint,
        _load_codes_sidecar,
        run_ingest_stream,
    )

    rng = np.random.RandomState(7)
    dim = 16
    vecs = rng.randn(5, dim)
    schema = "doc_id long, text string, source string"
    batch1 = [
        (i, f"first wave document {i} alpha{i} beta{i} gamma{i}", "s")
        for i in range(5)
    ]
    # doc 10: paraphrase of doc 2 (disjoint tokens, near-identical
    # embedding) -> must drop at stage 3b; doc 11: novel direction
    novel = None
    for s in range(200):
        cand = np.random.RandomState(900 + s).randn(dim)
        cos = vecs @ cand / (
            np.linalg.norm(vecs, axis=1) * np.linalg.norm(cand)
        )
        if np.abs(cos).max() < 0.4:
            novel = cand
            break
    assert novel is not None
    batch2 = [
        (10, "rephrased rendition using wholly other terms", "s"),
        (11, "unrelated fresh subject matter entirely", "s"),
    ]
    emb_rows = [(i, [float(x) for x in vecs[i]]) for i in range(5)]
    emb_rows += [
        (10, [float(x) for x in vecs[2] + 0.01 * rng.randn(dim)]),
        (11, [float(x) for x in novel]),
        (12, [float(x) for x in -novel]),  # batch 3's novel doc
    ]
    emb = spark.createDataFrame(
        emb_rows, "vec_id long, embedding array<double>"
    )
    batches = str(tmp_path / "doc_batches")
    for b in (batch1, batch2):
        spark.createDataFrame(b, schema).coalesce(1).write.mode(
            "append"
        ).parquet(batches)

    def _run(index, stats, ck, **kw):
        run_ingest_stream(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(batches),
            index, stats, ck,
            embeddings=emb, semantic_threshold=0.6, **kw,
        )

    with _pytest.raises(ValueError, match="codes_path requires"):
        _run(
            str(tmp_path / "x.parquet"), str(tmp_path / "xs"),
            str(tmp_path / "ckx"), codes_path=str(tmp_path / "c.parquet"),
        )

    index_c = str(tmp_path / "idx_codes.parquet")
    stats_c = str(tmp_path / "st_codes")
    mp = str(tmp_path / "ann_model.parquet")
    cp = str(tmp_path / "codes.parquet")
    _run(index_c, stats_c, str(tmp_path / "ck_c"),
         model_path=mp, codes_path=cp)

    index_p = str(tmp_path / "idx_plain.parquet")
    stats_p = str(tmp_path / "st_plain")
    _run(index_p, stats_p, str(tmp_path / "ck_p"))

    ids_c = sorted(
        r["doc_id"] for r in spark.read.parquet(index_c).collect()
    )
    ids_p = sorted(
        r["doc_id"] for r in spark.read.parquet(index_p).collect()
    )
    assert ids_c == ids_p == [0, 1, 2, 3, 4, 11]
    s1c = spark.read.parquet(stats_c).filter("batch_id = 1").collect()[0]
    s1p = spark.read.parquet(stats_p).filter("batch_id = 1").collect()[0]
    for c in (
        "n_batch", "n_exact_index_dup", "n_near_index_dup",
        "n_semantic_index_dup", "n_kept",
    ):
        assert s1c[c] == s1p[c], (c, s1c[c], s1p[c])
    assert s1c["n_semantic_index_dup"] == 1  # doc 10 dropped at 3b

    model = load_ann_model(spark, mp)
    assert model is not None

    def _expected_codes():
        return sorted(
            map(
                tuple,
                pq_code_rows(
                    emb.join(
                        spark.read.parquet(index_c).select(
                            F.col("doc_id").alias("vec_id")
                        ),
                        "vec_id",
                    ),
                    model["centroids"],
                    model["codebooks"],
                ).collect(),
            )
        )

    fp = _listing_fingerprint(spark, index_c)
    side, side_md5 = _load_codes_sidecar(spark, cp, fp, "expr")
    assert side is not None
    assert side_md5 == model["meta"]["fit_md5"]
    assert sorted(map(tuple, side.collect())) == _expected_codes()
    # staleness: wrong index fingerprint -> rejected
    assert _load_codes_sidecar(spark, cp, "not-the-fp", "expr") == (
        None, None,
    )
    # engine binding: cells stored under one assign impl must never
    # pair with batch cells computed under the other (ULP ties)
    assert _load_codes_sidecar(spark, cp, fp, "pandas") == (None, None)

    # incremental maintenance: SAME checkpoint, one new batch with a
    # novel doc -> only doc 12's row is added, everything else kept
    spark.createDataFrame(
        [(12, "a third entirely distinct theme", "s")], schema
    ).coalesce(1).write.mode("append").parquet(batches)
    _run(index_c, stats_c, str(tmp_path / "ck_c"),
         model_path=mp, codes_path=cp)
    assert sorted(
        r["doc_id"] for r in spark.read.parquet(index_c).collect()
    ) == [0, 1, 2, 3, 4, 11, 12]
    model2 = load_ann_model(spark, mp)
    assert model2["meta"]["fit_id"] == model["meta"]["fit_id"]  # reused
    fp2 = _listing_fingerprint(spark, index_c)
    side2, side2_md5 = _load_codes_sidecar(spark, cp, fp2, "expr")
    assert side2 is not None and side2_md5 == model2["meta"]["fit_md5"]
    assert sorted(map(tuple, side2.collect())) == _expected_codes()


def test_ingest_stream_band_sidecar_parity_and_staleness(spark, tmp_path):
    """Round-13 persisted band sidecar: with bands_path the streamed
    index + stats are identical to the recompute path, the sidecar's
    meta fingerprint binds it to the CURRENT index artifact (so a
    stale or re-parameterized sidecar is rejected, never trusted), and
    incremental maintenance replaces exactly the kept ids' rows."""
    from tmdb_index_spark.operators.dedup_text import minhash_band_buckets
    from tmdb_index_spark.streaming.ingest import (
        _listing_fingerprint,
        _load_band_sidecar,
        run_ingest_stream,
    )

    schema = "doc_id long, text string, source string"
    ta, tb, tc = _ingest_words("a"), _ingest_words("b"), _ingest_words("c")
    batches = str(tmp_path / "doc_batches")
    # batch 1: docs 1,2 (3 an exact dup); batch 2: 4 novel, 5 exact
    # re-send of 1, 6 a token-dup of 2 (caught only via MinHash bands)
    spark.createDataFrame(
        [(1, ta, "s"), (2, tb, "s"), (3, ta, "s")], schema
    ).coalesce(1).write.mode("append").parquet(batches)
    spark.createDataFrame(
        [(4, tc, "s"), (5, ta, "s"), (6, tb.replace(" ", "  ", 1), "s")],
        schema,
    ).coalesce(1).write.mode("append").parquet(batches)

    def _run(index, stats, ck, **kw):
        run_ingest_stream(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(batches),
            index, stats, ck, **kw,
        )

    index_b = str(tmp_path / "idx_bands.parquet")
    stats_b = str(tmp_path / "st_bands")
    bp = str(tmp_path / "bands.parquet")
    _run(index_b, stats_b, str(tmp_path / "ck_b"), bands_path=bp)

    index_p = str(tmp_path / "idx_plain.parquet")
    stats_p = str(tmp_path / "st_plain")
    _run(index_p, stats_p, str(tmp_path / "ck_p"))

    ids_b = sorted(
        r["doc_id"] for r in spark.read.parquet(index_b).collect()
    )
    ids_p = sorted(
        r["doc_id"] for r in spark.read.parquet(index_p).collect()
    )
    assert ids_b == ids_p == [1, 2, 4]
    s1b = spark.read.parquet(stats_b).filter("batch_id = 1").collect()[0]
    s1p = spark.read.parquet(stats_p).filter("batch_id = 1").collect()[0]
    for c in ("n_batch", "n_exact_index_dup", "n_near_index_dup", "n_kept"):
        assert s1b[c] == s1p[c], (c, s1b[c], s1p[c])
    assert s1b["n_near_index_dup"] == 1  # doc 6 caught from STORED bands

    # the sidecar equals a from-scratch banding of the final index and
    # its fingerprint matches the live index artifact
    fp = _listing_fingerprint(spark, index_b)
    side = _load_band_sidecar(spark, bp, fp, 16, 4)
    assert side is not None
    expect = sorted(
        map(
            tuple,
            minhash_band_buckets(
                spark.read.parquet(index_b), out_id="index_id"
            ).collect(),
        )
    )
    assert sorted(map(tuple, side.collect())) == expect

    # staleness: wrong fingerprint or banding params -> rejected
    assert _load_band_sidecar(spark, bp, "not-the-fp", 16, 4) is None
    assert _load_band_sidecar(spark, bp, fp, 32, 4) is None
    assert _load_band_sidecar(spark, bp, fp, 16, 8) is None

    # replay under a fresh checkpoint: fixpoint index, sidecar still
    # consistent with the (re-swapped) artifact
    _run(index_b, stats_b, str(tmp_path / "ck_b2"), bands_path=bp)
    fp2 = _listing_fingerprint(spark, index_b)
    side2 = _load_band_sidecar(spark, bp, fp2, 16, 4)
    assert side2 is not None
    assert sorted(map(tuple, side2.collect())) == expect
