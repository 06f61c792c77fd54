"""Scripted end-to-end drive of the streaming surface (round-7 VERDICT
stretch #8): the two round-6 streaming additions exercised only by
pytest get a driveable outside-the-suite check against the REAL fixture
tables, with self-verifying assertions.

1. ``running_transitions`` — drain the sf0.001 events table as a
   multi-micro-batch file stream (one parquet file per trigger) and
   assert the summed per-batch deltas equal the batch
   ``transition_matrix`` on the same rows (cross-boundary transitions
   counted exactly once).
2. ``neardup_detect_stream`` — drain the sf0.001 documents table the
   same way and re-verify every emitted detection post-hoc: the pair
   really collides in the reported band and its signature agreement
   really clears the threshold (recomputed in pandas from the same
   md5 signature function).

Usage:
    PYTHONPATH=/root/repo python tools/drive_streaming.py [sf_dir]

Exit 0 + "STREAM DRIVE OK" = both assertions held.
"""

from __future__ import annotations

import shutil
import sys
import tempfile
from collections import Counter


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    scratch = tempfile.mkdtemp(prefix="stream_drive_")

    from pyspark.sql import functions as F

    from tmdb_index_spark.operators.temporal import transition_matrix
    from tmdb_index_spark.session import get_spark
    from tmdb_index_spark.streaming.neardup import neardup_detect_stream
    from tmdb_index_spark.streaming.stateful import running_transitions

    spark = get_spark("stream-drive")
    spark.sparkContext.setLogLevel("ERROR")

    # ---- 1. running_transitions parity over the real events table ----
    # The operator's documented contract is per-key IN-ORDER delivery
    # across micro-batches (replayed-log semantics), so the drive slices
    # the table into 4 TIME-ordered tranches and drains after each
    # append — the same redelivery shape the test suite uses, here over
    # the full fixture table.
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    ev_schema = events.schema
    src = f"{scratch}/events"
    # quartile cuts as epoch seconds (approxQuantile rejects
    # TimestampNTZ); converted back to naive datetimes for the filters
    import datetime as _dt

    cuts = [
        _dt.datetime.fromtimestamp(c, tz=_dt.timezone.utc).replace(
            tzinfo=None
        )
        for c in events.agg(
            F.expr(
                "percentile(unix_micros(cast(ts as timestamp)) / 1e6, "
                "array(0.25, 0.5, 0.75))"
            )
        ).collect()[0][0]
    ]

    deltas: list = []

    def collect(batch_df, _bid):
        deltas.extend(batch_df.collect())

    def drain():
        q = (
            running_transitions(
                spark.readStream.schema(ev_schema).parquet(src)
            )
            .writeStream.foreachBatch(collect)
            .outputMode("append")
            .option("checkpointLocation", f"{scratch}/ckpt_tr")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    lo = None
    for hi in [*cuts, None]:
        sl = events
        if lo is not None:
            sl = sl.filter(F.col("ts") > F.lit(lo))
        if hi is not None:
            sl = sl.filter(F.col("ts") <= F.lit(hi))
        sl.coalesce(1).write.mode("append").parquet(src)
        drain()
        lo = hi

    streamed = Counter()
    for r in deltas:
        streamed[(r["prev_event"], r["next_event"])] += r["n"]
    batch = {
        (r["prev_event"], r["next_event"]): r["n_transitions"]
        for r in transition_matrix(events).collect()
    }
    assert dict(streamed) == batch, (
        f"stream/batch transition mismatch: "
        f"{dict(streamed)} != {batch}"
    )
    print(
        f"running_transitions: {sum(batch.values())} transitions, "
        f"{len(deltas)} streamed delta rows over 4 time-ordered "
        f"micro-batches — parity OK"
    )

    # ---- 2. neardup_detect_stream detections re-verified post-hoc ----
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    dsrc = f"{scratch}/docs"
    docs.repartition(3).write.mode("overwrite").parquet(dsrc)

    hits: list = []

    def collect_hits(batch_df, _bid):
        hits.extend(batch_df.collect())

    q2 = (
        neardup_detect_stream(
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(dsrc)
        )
        .writeStream.foreachBatch(collect_hits)
        .outputMode("update")
        .option("checkpointLocation", f"{scratch}/ckpt_nd")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()
    assert hits, "expected near-dup detections on the documents fixture"

    # recompute signatures in pandas with the library's own mapper and
    # verify each detection's band collision + agreement threshold
    import pandas as pd

    from tmdb_index_spark.streaming.neardup import _sig_mapper

    pdf = docs.toPandas()
    sigs_out = pd.concat(
        list(_sig_mapper("text", "doc_id", 3, 16)(iter([pdf])))
    )
    sig_by_id = {
        int(r.doc_id): list(r.sig) for r in sigs_out.itertuples()
    }
    r = 16 // 4
    bad = 0
    for h in hits:
        a, b = sig_by_id[h["doc_id"]], sig_by_id[h["matched_id"]]
        band = h["band"]
        if a[band * r:(band + 1) * r] != b[band * r:(band + 1) * r]:
            bad += 1
            continue
        agree = sum(x == y for x, y in zip(a, b)) / 16
        if agree < 0.5 or abs(agree - h["sig_sim"]) > 1e-9:
            bad += 1
    assert bad == 0, f"{bad}/{len(hits)} detections failed re-verification"
    print(
        f"neardup_detect_stream: {len(hits)} detections over 3 "
        f"micro-batches, all band collisions + agreements re-verified OK"
    )

    # ---- 3. running_heavy_hitters MG guarantees over real events ----
    # Reuse the 4 time-ordered event tranches from drive 1: drain the
    # Misra-Gries summaries per event type, then verify the classic
    # guarantees against EXACT per-(type, user) counts: count_lb <=
    # true <= count_lb + err for every emitted candidate, every user
    # with true > err survives, and the state stays within capacity.
    from tmdb_index_spark.streaming.stateful import running_heavy_hitters

    hh_rows: list = []

    def collect_hh(batch_df, _bid):
        hh_rows.append(batch_df.collect())

    q3 = (
        running_heavy_hitters(
            spark.readStream.schema(ev_schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src),
            capacity=8,
        )
        .writeStream.foreachBatch(collect_hh)
        .outputMode("append")
        .option("checkpointLocation", f"{scratch}/ckpt_hh")
        .trigger(availableNow=True)
        .start()
    )
    q3.awaitTermination()
    # later emissions supersede earlier ones per type
    final: dict = {}
    for batch in hh_rows:
        by_type: dict = {}
        for r in batch:
            by_type.setdefault(r["event_type"], []).append(r)
        for et, rows_ in by_type.items():
            final[et] = rows_
    true_counts = Counter(
        (r["event_type"], r["user_id"])
        for r in events.select("event_type", "user_id").collect()
    )
    checked = 0
    for et, rows_ in final.items():
        assert len(rows_) <= 8, (et, len(rows_))
        err = rows_[0]["err"] if rows_ else 0
        kept = {r["user_id"] for r in rows_}
        for r in rows_:
            t = true_counts[(et, r["user_id"])]
            assert r["count_lb"] <= t <= r["count_lb"] + err, (et, r, t)
            checked += 1
        for (tet, uid), c in true_counts.items():
            if tet == et and c > err:
                assert uid in kept, (et, uid, c, err)
    print(
        f"running_heavy_hitters: {checked} final candidates across "
        f"{len(final)} event types verified against exact counts "
        f"(capacity 8, 4 micro-batches) — MG guarantees OK"
    )

    # ---- 4. run_ingest_stream vs the batch composite, real docs ----
    # Drain the documents table in two halves through the streaming
    # corpus-ingestion fold, then verify the final index against the
    # BATCH composite applied sequentially to the same two halves —
    # stream/batch parity for the reference's daily-maintenance shape.
    from tmdb_index_spark.operators.corpus_pipeline import (
        ingest_corpus_batch,
    )
    from tmdb_index_spark.operators.materialize import release_pins
    from tmdb_index_spark.streaming.ingest import run_ingest_stream

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    half1 = docs.filter(F.col("doc_id") % 2 == 0)
    half2 = docs.filter(F.col("doc_id") % 2 == 1)
    doc_src = f"{scratch}/doc_batches"
    half1.coalesce(1).write.mode("append").parquet(doc_src)
    half2.coalesce(1).write.mode("append").parquet(doc_src)
    run_ingest_stream(
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(doc_src),
        f"{scratch}/corpus_index.parquet",
        f"{scratch}/ingest_stats",
        f"{scratch}/ckpt_ingest",
    )
    stream_ids = sorted(
        r["doc_id"]
        for r in spark.read.parquet(f"{scratch}/corpus_index.parquet")
        .select("doc_id")
        .collect()
    )
    empty = spark.createDataFrame([], docs.schema)
    b1 = ingest_corpus_batch(empty, half1, materialize="cache")
    b2 = ingest_corpus_batch(b1["new_index"], half2, materialize="cache")
    batch_ids = sorted(
        r["doc_id"] for r in b2["new_index"].select("doc_id").collect()
    )
    release_pins()
    assert stream_ids == batch_ids, (
        f"stream/batch ingest divergence: {len(stream_ids)} vs "
        f"{len(batch_ids)} index rows"
    )
    n_stats = spark.read.parquet(f"{scratch}/ingest_stats").count()
    assert n_stats > 0
    print(
        f"run_ingest_stream: {len(stream_ids)} index docs after 2 "
        f"micro-batches — equals the sequential batch composite; "
        f"{n_stats} per-source stats rows landed"
    )

    # ---- 5. streaming semantic novelty parity (round 13) ----
    # Same two-half drive as #4, but with the PQ/SDC semantic stage on
    # and a SYNTHETIC paraphrase planted in batch 2: token-disjoint
    # text (MinHash admits it) whose embedding is a batch-1 doc's plus
    # tiny noise (cos ~ 0.9999).  The streamed index + per-batch
    # n_semantic_index_dup stats must equal the sequential batch
    # composite's, the paraphrase must drop at stage 3b, and the
    # persisted ANN model artifact must be the batch-2 fit (v1).
    from tmdb_index_spark.operators.ann_store import load_ann_model

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    h1_ids = {r["doc_id"] for r in half1.select("doc_id").collect()}
    donor = next(
        r
        for r in emb.orderBy("vec_id").limit(200).collect()
        if r["vec_id"] in h1_ids
    )
    synth_id = int(
        docs.agg(F.max("doc_id")).collect()[0][0]
    ) + 1000
    synth_vec = [float(x) + 1e-4 for x in donor["embedding"]]
    emb_all = emb.unionByName(
        spark.createDataFrame(
            [(synth_id, synth_vec)],
            "vec_id long, embedding array<double>",
        )
    )
    tmpl = half2.limit(1).collect()[0].asDict()
    tmpl.update(
        doc_id=synth_id,
        text="qq ww ee rr tt yy uu ii oo pp synthetic paraphrase tokens",
    )
    synth_doc = spark.createDataFrame([tmpl], docs.schema)
    batch2 = half2.unionByName(synth_doc)

    sem_src = f"{scratch}/sem_batches"
    half1.coalesce(1).write.mode("append").parquet(sem_src)
    batch2.coalesce(1).write.mode("append").parquet(sem_src)
    sem_index = f"{scratch}/sem_index.parquet"
    sem_stats = f"{scratch}/sem_stats"
    model_path = f"{scratch}/ann_model.parquet"
    run_ingest_stream(
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(sem_src),
        sem_index,
        sem_stats,
        f"{scratch}/ckpt_sem",
        embeddings=emb_all,
        semantic_threshold=0.9,
        model_path=model_path,
        bands_path=f"{scratch}/bands.parquet",
    )
    sem_stream_ids = sorted(
        r["doc_id"]
        for r in spark.read.parquet(sem_index).select("doc_id").collect()
    )
    assert synth_id not in sem_stream_ids, (
        "the planted paraphrase must drop at the semantic stage"
    )
    ledger = {
        r["batch_id"]: r
        for r in spark.read.parquet(sem_stats)
        .groupBy("batch_id")
        .agg(
            F.sum("n_semantic_index_dup").alias("n_sem"),
            F.sum("n_near_index_dup").alias("n_near"),
            F.sum("n_kept").alias("n_kept"),
        )
        .collect()
    }
    assert ledger[1]["n_sem"] >= 1, "batch 2 must report the semantic drop"
    model = load_ann_model(spark, model_path)
    assert model is not None and model["meta"]["fit_id"] == 1

    sb1 = ingest_corpus_batch(
        empty, half1, materialize="cache",
        embeddings=emb_all, semantic_threshold=0.9,
    )
    sb2 = ingest_corpus_batch(
        sb1["new_index"], batch2, materialize="cache",
        embeddings=emb_all, semantic_threshold=0.9,
    )
    sem_batch_ids = sorted(
        r["doc_id"] for r in sb2["new_index"].select("doc_id").collect()
    )
    seq_stats = sb2["stats"].agg(
        F.sum("n_semantic_index_dup").alias("n_sem"),
        F.sum("n_near_index_dup").alias("n_near"),
        F.sum("n_kept").alias("n_kept"),
    ).collect()[0]
    release_pins()
    assert sem_stream_ids == sem_batch_ids, (
        f"semantic stream/batch index divergence: {len(sem_stream_ids)} "
        f"vs {len(sem_batch_ids)} rows"
    )
    for c in ("n_sem", "n_near", "n_kept"):
        assert ledger[1][c] == seq_stats[c], (
            c, ledger[1][c], seq_stats[c],
        )
    print(
        f"run_ingest_stream(semantic): {len(sem_stream_ids)} index docs, "
        f"planted paraphrase dropped at stage 3b "
        f"(batch-2 n_semantic_index_dup={ledger[1]['n_sem']}, "
        f"n_kept={ledger[1]['n_kept']}) — equals the sequential batch "
        f"composite; ANN model artifact v{model['meta']['fit_id']} + "
        f"MinHash band sidecar persisted"
    )

    # ---- 6. full round-14 production shape: bucketed index + all ----
    # The same semantic two-batch drive as #5, but with EVERY
    # round-13/14 persistence lever on at once — bucket-incremental
    # index (index_buckets), ANN model artifact (model_path), MinHash
    # band sidecar (bands_path), and PQ-codes sidecar (codes_path).
    # The sidecars and the storage layout are pure accelerators, so
    # the manifest-resolved index and the stats ledger must be
    # IDENTICAL to drive #5's plain-layout, sidecar-maintaining run;
    # the codes sidecar must equal a from-scratch encode of the final
    # index under the stored model and carry both binding
    # fingerprints; and the bucket fold must have committed exactly
    # two manifest versions with batch-2's touched buckets in v=2.
    from tmdb_index_spark.operators.similarity import pq_code_rows
    from tmdb_index_spark.sources.bucket_store import (
        read_bucket_index,
        read_bucket_manifest,
    )
    from tmdb_index_spark.streaming.ingest import (
        _listing_fingerprint,
        _load_codes_sidecar,
    )

    full_index = f"{scratch}/full_index"
    full_stats = f"{scratch}/full_stats"
    full_model = f"{scratch}/full_model.parquet"
    full_codes = f"{scratch}/full_codes.parquet"
    run_ingest_stream(
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(sem_src),
        full_index,
        full_stats,
        f"{scratch}/ckpt_full",
        embeddings=emb_all,
        semantic_threshold=0.9,
        model_path=full_model,
        bands_path=f"{scratch}/full_bands.parquet",
        codes_path=full_codes,
        index_buckets=16,
    )
    full_ids = sorted(
        r["doc_id"]
        for r in read_bucket_index(spark, full_index)
        .select("doc_id")
        .collect()
    )
    assert full_ids == sem_stream_ids, (
        f"bucketed+sidecar run diverged from the plain layout: "
        f"{len(full_ids)} vs {len(sem_stream_ids)} index rows"
    )
    full_ledger = {
        r["batch_id"]: r
        for r in spark.read.parquet(full_stats)
        .groupBy("batch_id")
        .agg(
            F.sum("n_semantic_index_dup").alias("n_sem"),
            F.sum("n_near_index_dup").alias("n_near"),
            F.sum("n_kept").alias("n_kept"),
        )
        .collect()
    }
    for bid in (0, 1):
        for c in ("n_sem", "n_near", "n_kept"):
            assert full_ledger[bid][c] == (
                ledger[bid][c] if bid in ledger else None
            ), (bid, c)
    man = read_bucket_manifest(spark, full_index)
    assert man["version"] == 2 and man["n_buckets"] == 16
    v2 = [d for d in man["buckets"].values() if "v=2" in d]
    # batch 2 keeps ~239 docs here, enough to touch every bucket —
    # write proportionality at SMALL batch sizes is pinned by
    # tests/test_bucket_store.py::test_fold_write_bytes_proportional_to_batch;
    # this drive pins the versioned-commit shape and cross-layout parity
    assert 0 < len(v2) <= man["n_buckets"]
    full_mod = load_ann_model(spark, full_model)
    assert full_mod is not None
    side, side_md5 = _load_codes_sidecar(
        spark, full_codes, _listing_fingerprint(spark, full_index), "expr"
    )
    assert side is not None
    assert side_md5 == full_mod["meta"]["fit_md5"]
    expected_codes = sorted(
        map(
            tuple,
            pq_code_rows(
                emb_all.join(
                    read_bucket_index(spark, full_index).select(
                        F.col("doc_id").alias("vec_id")
                    ),
                    "vec_id",
                ),
                full_mod["centroids"],
                full_mod["codebooks"],
            ).collect(),
        )
    )
    assert sorted(map(tuple, side.collect())) == expected_codes
    print(
        f"run_ingest_stream(bucketed+sidecars): {len(full_ids)} index "
        f"docs across {man['n_buckets']} buckets (v2 touched "
        f"{len(v2)}) — identical to the plain layout; codes sidecar "
        f"({len(expected_codes)} rows) matches a from-scratch encode "
        f"under the persisted model and both binding fingerprints hold"
    )

    shutil.rmtree(scratch, ignore_errors=True)
    print("STREAM DRIVE OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
