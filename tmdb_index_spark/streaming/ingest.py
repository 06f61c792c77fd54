"""Streaming corpus ingestion — the reference's daily maintenance
loop (``process()`` folds each day's changes into the standing index,
``tmdb_index.py:546-568``) as a Structured Streaming job over
DOCUMENT batches: every micro-batch runs the batch-vs-index novelty
composite (:func:`~tmdb_index_spark.operators.corpus_pipeline
.ingest_corpus_batch` — exact-within-batch dedup, content-hash
anti-join vs the index, batch-broadcast MinHash-LSH novelty, optional
PQ/SDC semantic novelty with a persisted cross-batch model artifact,
upsert fold-in) and maintains TWO artifacts:

* the standing corpus index at ``index_path`` (crash-safe
  rename-aside swap — :func:`~tmdb_index_spark.streaming.windowed
  .recover_and_swap`);
* an append-only per-batch yield ledger under ``stats_path`` (one
  partition directory per micro-batch id — the stats a
  crawl-ingestion pipeline alarms on).

Idempotence on replay — both crash windows:

* crash BEFORE the index swap: the replayed batch re-ingests against
  the UNCHANGED index, recomputes identical stats rows, and the index
  ``update_or_append`` reaches the same fixpoint.  (Its stats
  partition, if it committed, already holds those identical rows, so
  skipping the rewrite is also correct.)
* crash AFTER the swap but before the streaming checkpoint commits:
  the replayed batch re-ingests against the ALREADY-UPDATED index —
  every doc drops at the exact-vs-index stage and the recomputed
  stats would be zero-yield lies.  The ledger write therefore SKIPS
  any batch partition that already carries a ``_SUCCESS`` marker: the
  true yield rows written just before the swap survive the replay.
  (Stats land strictly before the swap, so a committed partition can
  never be mid-write when the swap exists.)  The committed marker is
  an EXPLICIT ``_LEDGER_SUCCESS`` sentinel this module writes itself
  — not the committer's ``_SUCCESS``, which vanishes when a
  deployment disables ``mapreduce.fileoutputcommitter
  .marksuccessfuljobs`` and would silently re-open the exact replay
  hole this guard closes (round-12 advisor).

State lives in the PARQUET artifacts, not the state store — the
index is unbounded corpus state, exactly what Spark's own docs route
through ``foreachBatch``; the in-state-store alternative for the
novelty half is :mod:`tmdb_index_spark.streaming.neardup`.
"""

from __future__ import annotations

import posixpath

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tmdb_index_spark.operators.corpus_pipeline import ingest_corpus_batch
from tmdb_index_spark.operators.materialize import release_pins
from tmdb_index_spark.streaming.windowed import recover_and_swap

__all__ = ["run_ingest_stream"]


def _listing_fingerprint(spark, path: str) -> str | None:
    """md5 over the sorted (name, length, mtime) listing of a parquet
    artifact directory — changes on every rename-in swap, so it
    identifies WHICH index version a sidecar was built against without
    touching the data itself (an FS metadata op, not a scan)."""
    import hashlib

    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path
    p = hpath(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(p):
        return None
    entries = []
    it = fs.listFiles(p, True)
    while it.hasNext():
        st = it.next()
        entries.append(
            (
                st.getPath().getName(),
                int(st.getLen()),
                int(st.getModificationTime()),
            )
        )
    h = hashlib.md5()
    for e in sorted(entries):
        h.update(repr(e).encode())
    return h.hexdigest()


def _load_band_sidecar(
    spark, bands_path: str, index_fp: str | None, num_hashes: int, bands: int
):
    """The persisted ``(index_id, band, key)`` sidecar, or ``None``
    unless its meta row matches BOTH the current index fingerprint and
    the banding parameters — a stale, torn, or re-parameterized
    sidecar must silently fall back to the recompute path, never feed
    wrong candidates."""
    if index_fp is None:
        return None
    try:
        meta = spark.read.parquet(bands_path + ".meta").collect()
        if len(meta) != 1:
            return None
        m = meta[0]
        if (
            m["fp"] != index_fp
            or m["num_hashes"] != num_hashes
            or m["bands"] != bands
        ):
            return None
        return spark.read.parquet(bands_path)
    except Exception:  # noqa: BLE001 — absent/torn -> recompute
        return None


def _load_codes_sidecar(
    spark, codes_path: str, index_fp: str | None, assign_impl: str
):
    """The persisted ``(emb_id, cell, codes)`` sidecar plus the model
    fingerprint it was encoded under, or ``(None, None)`` unless its
    meta row matches the CURRENT index listing fingerprint AND the
    assignment engine this run uses (``expr`` and ``pandas`` agree
    everywhere except float-ULP exact-tie assignments, so cells stored
    under one engine must never pair with batch cells computed under
    the other — the enforced form of the one-impl-per-sidecar-life
    contract).  The model binding is validated downstream by
    ``ingest_corpus_batch`` against the fit the batch actually uses —
    so a refit mid-lifecycle, an engine switch, a torn meta, or a
    swapped index all degrade to the recompute path, never to wrong
    candidate cells."""
    if index_fp is None:
        return None, None
    try:
        meta = spark.read.parquet(codes_path + ".meta").collect()
        if (
            len(meta) != 1
            or meta[0]["fp"] != index_fp
            or meta[0]["assign_impl"] != assign_impl
        ):
            return None, None
        return spark.read.parquet(codes_path), meta[0]["fit_md5"]
    except Exception:  # noqa: BLE001 — absent/torn/pre-field -> recompute
        return None, None


def run_ingest_stream(
    batches: DataFrame,
    index_path: str,
    stats_path: str,
    checkpoint_dir: str,
    available_now: bool = True,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    jaccard_threshold: float = 0.5,
    num_hashes: int = 16,
    bands: int = 4,
    seq_col: str | None = None,
    embeddings: DataFrame | None = None,
    emb_id_col: str = "vec_id",
    emb_vec_col: str = "embedding",
    semantic_threshold: float | None = None,
    pq_m: int = 8,
    pq_ks: int = 16,
    model_path: str | None = None,
    bands_path: str | None = None,
    codes_path: str | None = None,
    index_buckets: int | None = None,
    semantic_assign_impl: str = "expr",
) -> None:
    """Drain a stream of document batches into the standing corpus
    index, admitting only novel content per micro-batch. With
    ``Trigger.AvailableNow`` (default) this is the daily-cron
    lifecycle: drain what exists, write index + stats, stop,
    restartable from ``checkpoint_dir``.

    Intra-batch duplicate ids resolve keep-last before the composite
    runs (its contract requires ids unique within the batch); pass
    ``seq_col`` for a replay-deterministic tie-break, exactly as
    :func:`~tmdb_index_spark.streaming.windowed.run_upsert_stream`.
    The very first batch ingests against an EMPTY index of the batch's
    own schema — one code path, so batch 1's stats rows are real
    (its within-batch duplicates still drop).

    ``embeddings`` + ``semantic_threshold`` (round 13) enable the
    composite's OPTIONAL stage 3b per micro-batch — PQ-coded SDC
    novelty vs the standing index, the paraphrase-grade near-dups
    token-level MinHash admits — restoring full capability parity
    with the batch composite (a stream-fed pipeline previously
    admitted what the batch path dropped).  ``embeddings`` is a
    STATIC frame joined inside ``foreachBatch`` (batch context), so
    per-batch semantics, stats columns (``n_semantic_index_dup``),
    and replay idempotence are exactly the batch composite's.  Pass
    ``model_path`` to persist the stage-3b fit as a versioned
    artifact reused across micro-batches (:mod:`~tmdb_index_spark
    .operators.ann_store`) — at streaming cadence the refit-per-batch
    alternative pays a driver-side sample collect + k-means per
    trigger for an identical model.

    ``bands_path`` (round 13) persists the MinHash novelty stage's
    INDEX-side band signatures the same way: without it, every
    micro-batch re-shingles and re-md5s the entire standing index —
    at 100 TB and daily cadence, the loop's dominant cost.  The
    sidecar holds one ``(index_id, band, key)`` row per band per
    indexed doc plus a meta row binding it to the index artifact's
    listing fingerprint and banding parameters; each batch loads it
    only when the fingerprint matches the CURRENT index (a stale,
    torn, or re-parameterized sidecar silently falls back to the
    recompute path — a crash anywhere between the index swap and the
    sidecar swap can therefore never feed wrong candidates), updates
    it incrementally after the swap (kept ids' rows replaced,
    everything else untouched), and stamps the post-swap fingerprint
    last.  Results are bit-identical with and without the sidecar —
    the banding is a pure function of the text bytes.

    ``codes_path`` (round 14) is the semantic stage's twin of
    ``bands_path``: without it, stage 3b re-runs ``ivf_assign`` +
    ``pq_encode`` over the ENTIRE standing index's embeddings every
    micro-batch — map-only, but a full index scan per batch, the last
    index-proportional compute in the daily loop now that the model
    fit (``model_path``) and the MinHash bands (``bands_path``) both
    persist.  The sidecar holds one ``(emb_id, cell, codes)`` row per
    indexed doc with an embedding (:func:`~tmdb_index_spark.operators
    .similarity.pq_code_rows`) plus a meta row binding it to the index
    listing fingerprint AND the model fingerprint it was encoded
    under; it is consumed only when both match (``ingest_corpus_batch``
    re-checks the model side against the fit the batch actually uses),
    maintained incrementally per batch (kept ids' rows replaced),
    REBUILT from scratch on a model refit (old rows encode the old
    model's cells), and stamped LAST — every crash window degrades to
    recompute.  Requires ``embeddings`` + ``semantic_threshold`` +
    ``model_path``.  Results are identical with and without it: the
    code rows are a pure function of embedding bytes + model values.
    ``semantic_assign_impl`` flows through to every assign/encode in
    the loop (stage 3b AND sidecar maintenance — one impl for the life
    of a sidecar, see ``ingest_corpus_batch``); production at
    ``|index|·cells·dim`` scale sets ``"pandas"``.

    ``index_buckets`` (round 14) switches the index artifact from the
    rename-aside swap — which rewrites the WHOLE index every
    micro-batch, per-batch write bytes proportional to the INDEX — to
    the bucket-incremental store (:mod:`~tmdb_index_spark.sources
    .bucket_store`): the index lives as id-hash-bucketed parquet
    directories behind a versioned manifest committed LAST, and each
    fold rewrites only the buckets the batch's kept docs land in —
    write bytes proportional to the BATCH.  Same upsert semantics,
    same stats ledger, same replay fixpoints (an already-folded batch
    keeps nothing, so no buckets are touched), same degrade-to-
    previous-state crash windows; sidecars fingerprint and rebuild
    against the manifest-resolved view.  Consumers read the index via
    :func:`~tmdb_index_spark.sources.bucket_store.read_bucket_index`
    instead of a bare ``spark.read.parquet``.  The bucket count is
    fixed at store creation (manifest-recorded; folds validate)."""
    spark = batches.sparkSession
    if codes_path and not (
        embeddings is not None
        and semantic_threshold is not None
        and model_path
    ):
        raise ValueError(
            "codes_path requires embeddings, semantic_threshold, and "
            "model_path — the sidecar is keyed to the persisted model "
            "artifact's fingerprint"
        )

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import Window

        order = F.col(seq_col).desc() if seq_col else None
        if order is None:
            # DELTAS.md #6: arrival-order fallback — winner is
            # arbitrary under task retries; pass seq_col for a
            # replay-deterministic election (same contract as
            # run_upsert_stream)
            batch_df = batch_df.withColumn(
                "__arrival__", F.monotonically_increasing_id()
            )
            order = F.col("__arrival__").desc()
        w = Window.partitionBy(id_col).orderBy(order)
        deduped = (
            batch_df.withColumn("__rn__", F.row_number().over(w))
            .filter(F.col("__rn__") == 1)
            .drop("__rn__", "__arrival__")
        )

        pre_fp = _listing_fingerprint(spark, index_path)
        stored_bands = None
        if bands_path:
            stored_bands = _load_band_sidecar(
                spark, bands_path, pre_fp, num_hashes, bands
            )
        stored_codes, stored_codes_md5 = (None, None)
        if codes_path:
            stored_codes, stored_codes_md5 = _load_codes_sidecar(
                spark, codes_path, pre_fp, semantic_assign_impl
            )
        state: dict = {}

        def build(index: DataFrame | None) -> DataFrame:
            if index is None:
                index = spark.createDataFrame([], deduped.schema)
            out = ingest_corpus_batch(
                index,
                deduped,
                text_col=text_col,
                id_col=id_col,
                source_col=source_col,
                jaccard_threshold=jaccard_threshold,
                num_hashes=num_hashes,
                bands=bands,
                materialize="cache",
                embeddings=embeddings,
                emb_id_col=emb_id_col,
                emb_vec_col=emb_vec_col,
                semantic_threshold=semantic_threshold,
                pq_m=pq_m,
                pq_ks=pq_ks,
                model_path=model_path,
                index_bands=stored_bands,
                index_codes=stored_codes,
                index_codes_fit_md5=stored_codes_md5,
                semantic_assign_impl=semantic_assign_impl,
            )
            state["out"] = out
            if bands_path or codes_path:
                # materialize the kept ids BEFORE the index swap: their
                # lineage reads index_path, which the swap replaces
                # (localCheckpoint truncates the lineage, so no
                # post-swap recompute can chase the old files)
                state["kept_ids"] = (
                    out["kept"]
                    .select(F.col(id_col).alias("index_id"))
                    .localCheckpoint(True)
                )
            if bands_path:
                from tmdb_index_spark.operators.dedup_text import (
                    minhash_band_buckets,
                )

                state["kept_bands"] = minhash_band_buckets(
                    out["kept"], text_col, id_col, 3, num_hashes, bands,
                    out_id="index_id",
                ).localCheckpoint(True)
            # per-batch yield rows land BEFORE the index swap, and
            # NEVER overwrite an already-committed partition: a replay
            # after a post-swap crash recomputes zero-yield rows (the
            # index already holds the batch) which must not clobber the
            # true ledger (module docstring, both crash windows).
            part = posixpath.join(stats_path, f"batch_id={batch_id}")
            jvm = spark._jvm
            hpath = jvm.org.apache.hadoop.fs.Path
            fs = hpath(part).getFileSystem(spark._jsc.hadoopConfiguration())
            sentinel = hpath(posixpath.join(part, "_LEDGER_SUCCESS"))
            # a partition committed by a pre-_LEDGER_SUCCESS version of
            # this loop carries only the committer's _SUCCESS marker:
            # treat EITHER as committed, or a post-upgrade replay of
            # the one in-flight batch would overwrite its true yield
            # rows with zero-yield recomputations (round-13 ADVICE).
            # Safe in every crash window: the committer writes _SUCCESS
            # LAST at job commit, so its presence implies the parquet
            # under it is complete and identical to what a pre-swap
            # replay would rewrite.
            legacy = hpath(posixpath.join(part, "_SUCCESS"))
            if not (fs.exists(sentinel) or fs.exists(legacy)):
                out["stats"].write.mode("overwrite").parquet(part)
                # own sentinel, written only after the parquet commit:
                # independent of the committer's marksuccessfuljobs
                # setting (module docstring).  A crash between the two
                # writes replays pre-swap, where the recomputed rows
                # are identical and the rewrite is harmless.
                fs.createNewFile(sentinel)
            return out["new_index"]

        def read_index() -> DataFrame:
            """The CURRENT committed index under either layout — the
            sidecar rebuild paths must never read the bucket store's
            raw directory tree (it holds superseded versions)."""
            if index_buckets:
                from tmdb_index_spark.sources.bucket_store import (
                    read_bucket_index,
                )

                cur = read_bucket_index(spark, index_path)
                if cur is None:
                    return spark.createDataFrame([], deduped.schema)
                return cur
            return spark.read.parquet(index_path)

        try:
            if index_buckets:
                from tmdb_index_spark.sources.bucket_store import (
                    fold_bucket_index,
                    read_bucket_index,
                )

                # bucketed layout: no whole-index rewrite — run the
                # composite against the manifest-resolved view, then
                # fold ONLY the kept docs' buckets (out["new_index"]
                # is lazy and never executed in this mode)
                build(read_bucket_index(spark, index_path))
                fold_bucket_index(
                    spark,
                    index_path,
                    state["out"]["kept"],
                    id_col,
                    index_buckets,
                )
            else:
                recover_and_swap(spark, index_path, build)
            if bands_path:
                # maintain the band sidecar AFTER the index swap, with
                # the same rename-aside machinery; the meta fingerprint
                # (post-swap listing) lands LAST, so a crash anywhere
                # in between leaves a sidecar the next batch rejects
                # and recomputes — never one it wrongly trusts
                def build_bands(old: DataFrame | None) -> DataFrame:
                    if stored_bands is not None and old is not None:
                        return old.join(
                            state["kept_ids"], "index_id", "left_anti"
                        ).unionByName(state["kept_bands"])
                    from tmdb_index_spark.operators.dedup_text import (
                        minhash_band_buckets,
                    )

                    return minhash_band_buckets(
                        read_index(),
                        text_col, id_col, 3, num_hashes, bands,
                        out_id="index_id",
                    )

                recover_and_swap(spark, bands_path, build_bands)
                spark.createDataFrame(
                    [
                        (
                            _listing_fingerprint(spark, index_path),
                            num_hashes,
                            bands,
                        )
                    ],
                    "fp string, num_hashes int, bands int",
                ).coalesce(1).write.mode("overwrite").parquet(
                    bands_path + ".meta"
                )
            if codes_path:
                from tmdb_index_spark.operators.ann_store import (
                    load_ann_model,
                )
                from tmdb_index_spark.operators.similarity import (
                    pq_code_rows,
                )

                # the model the NEXT batch will reuse is whatever the
                # artifact holds now (this batch saved before the swap
                # if it refit); no artifact yet (bootstrap batch, the
                # semantic stage never ran) -> no sidecar this round,
                # and any leftover meta's fingerprint is now stale so
                # the next batch rejects it
                model = load_ann_model(spark, model_path)
                if model is not None:
                    cur_md5 = model["meta"]["fit_md5"]
                    kept_eids = state["kept_ids"].select(
                        F.col("index_id").alias(emb_id_col)
                    )

                    def build_codes(old: DataFrame | None) -> DataFrame:
                        # incremental only when the stored rows encode
                        # THIS model; a refit invalidates every stored
                        # cell/code, so rebuild the whole index once
                        if (
                            stored_codes is not None
                            and stored_codes_md5 == cur_md5
                            and old is not None
                        ):
                            kept_codes = pq_code_rows(
                                embeddings.join(kept_eids, emb_id_col),
                                model["centroids"],
                                model["codebooks"],
                                emb_id_col,
                                emb_vec_col,
                                assign_impl=semantic_assign_impl,
                            )
                            return old.join(
                                kept_eids, emb_id_col, "left_anti"
                            ).unionByName(kept_codes)
                        return pq_code_rows(
                            embeddings.join(
                                read_index().select(
                                    F.col(id_col).alias(emb_id_col)
                                ),
                                emb_id_col,
                            ),
                            model["centroids"],
                            model["codebooks"],
                            emb_id_col,
                            emb_vec_col,
                            assign_impl=semantic_assign_impl,
                        )

                    recover_and_swap(spark, codes_path, build_codes)
                    spark.createDataFrame(
                        [
                            (
                                _listing_fingerprint(spark, index_path),
                                cur_md5,
                                pq_m,
                                pq_ks,
                                semantic_assign_impl,
                            )
                        ],
                        "fp string, fit_md5 string, pq_m int, pq_ks int,"
                        " assign_impl string",
                    ).coalesce(1).write.mode("overwrite").parquet(
                        codes_path + ".meta"
                    )
        finally:
            # frees exactly the ledger-owned cache pins the composite
            # made for this batch (caller-owned caches survive)
            release_pins()

    writer = batches.writeStream.foreachBatch(merge).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    writer.start().awaitTermination()
