"""Persisted, versioned ANN model artifacts (centroids + PQ codebooks).

The incremental ingestion composite (:func:`~tmdb_index_spark.operators
.corpus_pipeline.ingest_corpus_batch`) originally refit its k-means
centroids and PQ codebooks from the index sample on EVERY call.  That
is correct — the fit is a pure function of the bounded deterministic
sample — but at the reference's daily-cron cadence (``publish.yml``
cron; resume logic ``tmdb_index.py:241-256``) over a 100 TB index the
production shape is a persisted model artifact reused across batches,
refit only when the index outgrows it: FAISS-style index lifecycle
management, applied to the semantic-novelty stage.

This module stores both model pieces plus versioning metadata as ONE
parquet dataset (single write = smallest torn-write window; the loader
is defensive and treats any unreadable/incomplete artifact as "no
model", which simply triggers a refit):

* ``kind='centroid'`` rows — ``(cell, vec)``, the flat IVF quantizer;
* ``kind='pq'`` rows — ``(sub, code, vec)``, the per-subspace
  codebooks;
* one ``kind='meta'`` row — ``fit_id`` (monotone version), ``n_fit``
  (index size the fit saw), ``cells``, ``pq_m``/``pq_ks``, and
  ``fit_md5`` (a fingerprint of the fitted values themselves, so two
  artifacts can be compared without loading the vectors).

Staleness is the sketch family's occupancy rule: the artifact was fit
for ``cells = semantic_cells(n_fit)``; once the CURRENT index size
wants at least twice (or at most half) that many cells, mean cell
occupancy has drifted 2x from the fit's design point and
:func:`ann_model_stale` says refit.  Between those bounds every batch
reuses the stored fit — zero driver-side sample collects, zero k-means
jobs per micro-batch, and (because reuse pins the literal centroid
values) identical cell assignments across the whole reuse window.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "ann_model_fingerprint",
    "ann_model_stale",
    "load_ann_model",
    "save_ann_model",
]

_MODEL_SCHEMA = (
    "kind string, cell long, sub int, code int, vec array<double>, "
    "fit_id long, n_fit long, cells int, pq_m int, pq_ks int, "
    "fit_md5 string"
)


def ann_model_fingerprint(
    centroids: list[tuple[int, list[float]]],
    codebooks: list[list[tuple[int, list[float]]]],
) -> str:
    """md5 over the fitted values themselves — identifies a fit exactly
    (the fit is deterministic, so equal fingerprints mean bit-equal
    models) without shipping the vectors."""
    h = hashlib.md5()
    for cid, vec in centroids:
        h.update(repr((int(cid), [float(x) for x in vec])).encode())
    for book in codebooks:
        for code, vec in book:
            h.update(repr((int(code), [float(x) for x in vec])).encode())
    return h.hexdigest()


def ann_model_stale(meta: dict, n_now: int) -> bool:
    """Occupancy-rule refit trigger: the artifact carries the cell
    count its fit targeted; refit once the current index size wants
    >= 2x (or <= 1/2x) that many cells under the shared
    :func:`~tmdb_index_spark.operators.similarity.semantic_cells`
    rule — i.e. mean cell occupancy has drifted 2x from the design
    point in either direction."""
    from tmdb_index_spark.operators.similarity import semantic_cells

    want = semantic_cells(int(n_now))
    fitted = int(meta["cells"])
    return want >= 2 * fitted or 2 * want <= fitted


def save_ann_model(
    spark: SparkSession,
    path: str,
    centroids: list[tuple[int, list[float]]],
    codebooks: list[list[tuple[int, list[float]]]],
    *,
    fit_id: int,
    n_fit: int,
    pq_m: int,
    pq_ks: int,
) -> dict:
    """Persist one fitted model version; returns its meta dict.  The
    whole artifact (both model pieces + meta) lands in a single
    parquet write, so a crash can only leave an artifact the loader
    rejects wholesale — never a silently mixed version."""
    cells = len(centroids)
    md5 = ann_model_fingerprint(centroids, codebooks)
    rows: list[tuple] = [
        (
            "centroid",
            int(cid),
            None,
            None,
            [float(x) for x in vec],
            None,
            None,
            None,
            None,
            None,
            None,
        )
        for cid, vec in centroids
    ]
    rows += [
        (
            "pq",
            None,
            int(j),
            int(code),
            [float(x) for x in vec],
            None,
            None,
            None,
            None,
            None,
            None,
        )
        for j, book in enumerate(codebooks)
        for code, vec in book
    ]
    rows.append(
        (
            "meta",
            None,
            None,
            None,
            None,
            int(fit_id),
            int(n_fit),
            int(cells),
            int(pq_m),
            int(pq_ks),
            md5,
        )
    )
    # bounded driver-side frame (<= fit-sample-cap centroid rows +
    # m*ks codebook rows + 1): one file keeps reload a single-task scan
    spark.createDataFrame(rows, _MODEL_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)
    return {
        "fit_id": int(fit_id),
        "n_fit": int(n_fit),
        "cells": int(cells),
        "pq_m": int(pq_m),
        "pq_ks": int(pq_ks),
        "fit_md5": md5,
    }


def _collect_model(df: DataFrame) -> dict | None:
    rows = df.collect()
    meta_rows = [r for r in rows if r["kind"] == "meta"]
    if len(meta_rows) != 1:
        return None
    meta_row = meta_rows[0]
    meta = {
        "fit_id": meta_row["fit_id"],
        "n_fit": meta_row["n_fit"],
        "cells": meta_row["cells"],
        "pq_m": meta_row["pq_m"],
        "pq_ks": meta_row["pq_ks"],
        "fit_md5": meta_row["fit_md5"],
    }
    cents = sorted(
        (int(r["cell"]), [float(x) for x in r["vec"]])
        for r in rows
        if r["kind"] == "centroid"
    )
    pq_rows = sorted(
        (int(r["sub"]), int(r["code"]), [float(x) for x in r["vec"]])
        for r in rows
        if r["kind"] == "pq"
    )
    books: list[list[tuple[int, list[float]]]] = []
    for sub, code, vec in pq_rows:
        while len(books) <= sub:
            books.append([])
        books[sub].append((code, vec))
    # integrity: the advertised shape must match the stored rows, and
    # the fingerprint must reproduce — anything else is a torn write.
    # Books are checked against the stored subspace count and for a
    # uniform per-book size, NOT against pq_ks: a tiny fit sample
    # legitimately yields fewer than the requested ks codes (k-means
    # clamps k to the sample size).
    # a centroid-only artifact (pq_m == 0 — e.g. prepare_corpus with
    # the raw election payload) is legal; a torn one (meta promises
    # books the rows lack) is not
    if len(cents) != meta["cells"]:
        return None
    if len(books) != meta["pq_m"]:
        return None
    if books and any(
        len(b) == 0 or len(b) != len(books[0]) for b in books
    ):
        return None
    if ann_model_fingerprint(cents, books) != meta["fit_md5"]:
        return None
    return {"centroids": cents, "codebooks": books, "meta": meta}


def load_ann_model(spark: SparkSession, path: str) -> dict | None:
    """Load the artifact at ``path``; returns ``{"centroids",
    "codebooks", "meta"}`` or ``None`` when absent, torn, or
    fingerprint-inconsistent (callers then refit — a missing model is
    never an error, just a cold cache)."""
    try:
        df = spark.read.schema(_MODEL_SCHEMA).parquet(path)
        return _collect_model(df)
    except Exception:  # noqa: BLE001 — absent/unreadable -> refit
        return None
