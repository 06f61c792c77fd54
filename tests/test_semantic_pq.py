"""Tests for the PQ-code election payload of SemDeDup
(semantic_dedup_pq / semantic_elect_codes): flag parity with the raw
election under exact reconstruction, duplicate-code collapse, and the
codes-only shuffle payload claim."""

from __future__ import annotations

import pytest

from tmdb_index_spark.operators.similarity import (
    fit_pq,
    pq_encode,
    semantic_assign,
    semantic_dedup,
    semantic_dedup_pq,
    semantic_elect,
    semantic_elect_codes,
)

# d=8, m=4 (sub=2): every subspace slice is drawn from <= 4 distinct
# 2-d subvectors, all with exactly-representable power-of-two
# components, so (a) fit_pq's ks=16 codebooks cover every distinct
# subvector -> reconstruction is EXACT, and (b) every dot/sum is exact
# in float64 -> no ULP risk at the ROUND(...,4) boundary: the PQ
# election must equal the raw election bit-for-bit.
_SUBS = [[1.0, 0.0], [0.0, 1.0], [0.5, 0.5], [0.25, 1.0]]


def _corpus(spark, n=40):
    rows = []
    for i in range(n):
        v = []
        for j in range(4):
            v.extend(_SUBS[(i * (j + 1) + i // 7) % 4])
        rows.append((i, [float(x) for x in v]))
    # exact duplicates to force real drops
    rows.append((n, rows[0][1]))
    rows.append((n + 1, rows[3][1]))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )


def test_pq_election_matches_raw_under_exact_reconstruction(spark):
    emb = _corpus(spark)
    raw = {
        (r["vec_id"], r["cell"], r["keep"])
        for r in semantic_dedup(emb, threshold=0.9, cells=3).collect()
    }
    pq = {
        (r["vec_id"], r["cell"], r["keep"])
        for r in semantic_dedup_pq(emb, threshold=0.9, cells=3, m=4).collect()
    }
    assert pq == raw and len(pq) == emb.count()
    assert any(not k for _, _, k in pq)  # the threshold really drops


def test_elect_codes_contract_recomputed_independently(spark):
    """Recompute the SDC election from reconstructed vectors in numpy
    and compare the flag set."""
    import numpy as np

    emb = _corpus(spark)
    assigned = semantic_assign(emb, 3, emb.count())
    books = fit_pq(emb, m=4, ks=16)
    coded = pq_encode(assigned, books, "vec_id", "embedding").select(
        "vec_id", "cell", "codes"
    )
    got = {
        (r["vec_id"], r["keep"])
        for r in semantic_elect_codes(coded, 0.9, books).collect()
    }

    CB = np.array(
        [[cv for _, cv in sorted(b, key=lambda t: t[0])] for b in books],
        dtype="float64",
    )
    rows = coded.collect()
    ids = np.array([r["vec_id"] for r in rows])
    cells = {r["vec_id"]: r["cell"] for r in rows}
    R = np.stack(
        [
            np.concatenate([CB[j][r["codes"][j]] for j in range(4)])
            for r in rows
        ]
    )
    nrm = np.sqrt((R * R).sum(axis=1))
    S = np.round((R @ R.T) / np.outer(nrm, nrm), 4)
    expect = set()
    for b in range(len(ids)):
        drop = any(
            ids[a] < ids[b]
            and cells[int(ids[a])] == cells[int(ids[b])]
            and S[a, b] >= 0.9
            for a in range(len(ids))
        )
        expect.add((int(ids[b]), not drop))
    assert got == expect


def test_duplicate_vectors_share_code_and_collapse(spark):
    """Exact duplicates quantize to the same code word, score SDC
    cosine 1.0, and the higher id drops even at threshold 1.0."""
    emb = _corpus(spark, n=12)  # ids 12, 13 duplicate ids 0, 3
    out = {
        r["vec_id"]: r["keep"]
        for r in semantic_dedup_pq(emb, threshold=1.0, cells=1, m=4).collect()
    }
    assert out[12] is False and out[13] is False
    assert out[0] is True and out[3] is True


def test_pq_shuffle_payload_is_codes_only(spark):
    """The raw embedding column must NOT cross the per-cell election
    shuffle: above the pq_encode MapInPandas node the plan carries only
    (vec_id, cell, codes)."""
    emb = _corpus(spark)
    out = semantic_dedup_pq(emb, threshold=0.9, cells=3, m=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    head, _, _ = plan.partition("MapInPandas")
    assert "FlatMapGroupsInPandas" in head and "Exchange" in head
    assert "embedding" not in head


def test_semantic_dedup_pq_validation(spark):
    emb = _corpus(spark)
    with pytest.raises(ValueError, match="subspaces"):
        semantic_dedup_pq(emb, cells=2, m=3)  # 8 % 3 != 0


def test_pq_novelty_zero_norm_reconstruction_is_novel(spark):
    """Zero-norm PQ reconstructions are ALWAYS NOVEL by contract
    (round-12 advisor): the guarded cosine denominator scores such
    pairs NULL, which fails the threshold filter deliberately."""
    from tmdb_index_spark.operators.similarity import pq_novelty_ids

    cents = [(0, [0.0, 0.0])]
    books = [[(0, [0.0, 0.0]), (1, [1.0, 1.0])]]
    idx = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    bat = spark.createDataFrame(
        [(10, [0.01, 0.0]), (11, [0.9, 1.1])],
        "vec_id long, embedding array<double>",
    )
    got = sorted(
        r["vec_id"]
        for r in pq_novelty_ids(idx, bat, 0.5, cents, books).collect()
    )
    # 11 codes to the [1,1] word on both sides -> SDC sim 1.0 -> dup;
    # 10 codes to the all-zero word -> zero norm -> novel by contract
    assert got == [11]


def test_pq_novelty_precomputed_index_codes_identical(spark):
    """Round 14: feeding pq_novelty_ids the index side's precomputed
    (id, cell, codes) rows — the persisted-sidecar path — must return
    exactly the recompute path's ids, and ingest_corpus_batch must
    IGNORE sidecar rows whose fit fingerprint doesn't name the model
    the batch actually uses (falling back to recompute, never feeding
    wrong candidate cells)."""
    from pyspark.sql import functions as F

    from tmdb_index_spark.operators.corpus_pipeline import (
        ingest_corpus_batch,
    )
    from tmdb_index_spark.operators.materialize import release_pins
    from tmdb_index_spark.operators.similarity import (
        fit_centroids,
        pq_code_rows,
        pq_novelty_ids,
    )

    emb = _corpus(spark)
    idx_emb = emb.filter("vec_id < 30")
    bat_emb = emb.filter("vec_id >= 30")
    cents = fit_centroids(idx_emb, 3)
    books = fit_pq(idx_emb, m=4, ks=16)
    live = sorted(
        r["vec_id"]
        for r in pq_novelty_ids(idx_emb, bat_emb, 0.9, cents, books).collect()
    )
    codes = pq_code_rows(idx_emb, cents, books)
    assert codes.columns == ["vec_id", "cell", "codes"]
    via_sidecar = sorted(
        r["vec_id"]
        for r in pq_novelty_ids(
            idx_emb, bat_emb, 0.9, cents, books, index_codes=codes
        ).collect()
    )
    assert via_sidecar == live and live  # non-vacuous

    # composite guard: a WRONG (here: garbage-cell) sidecar under a
    # mismatched fingerprint must not change the output
    docs = emb.select(
        F.col("vec_id").alias("doc_id"),
        F.concat(
            F.lit("doc "), F.col("vec_id").cast("string")
        ).alias("text"),
        F.lit("s").alias("source"),
    )
    index_docs = docs.filter("doc_id < 30")
    batch_docs = docs.filter("doc_id >= 30")
    base = ingest_corpus_batch(
        index_docs, batch_docs,
        embeddings=emb, semantic_threshold=0.9, materialize="cache",
    )
    base_ids = sorted(
        r["doc_id"] for r in base["new_index"].select("doc_id").collect()
    )
    garbage = codes.withColumn("cell", F.lit(999).cast("long"))
    guarded = ingest_corpus_batch(
        index_docs, batch_docs,
        embeddings=emb, semantic_threshold=0.9, materialize="cache",
        index_codes=garbage, index_codes_fit_md5="not-the-fit",
    )
    assert sorted(
        r["doc_id"] for r in guarded["new_index"].select("doc_id").collect()
    ) == base_ids
    release_pins()


def test_ivfpq_multiprobe_recall_and_determinism(spark):
    """Round-13 nprobe on the PQ path: multi-probe output keeps the
    family contract (rank per query, rounded sims, id tie-break), is
    deterministic across rebuilds, and ADC recall vs brute-force
    cosine top-1 is at least the single-probe path's."""
    from tmdb_index_spark.operators.similarity import (
        brute_force_topk,
        ivfpq_index_topk,
    )

    emb = _corpus(spark)

    def run(nprobe):
        return ivfpq_index_topk(
            emb, k=2, m=4, ks=4, cells=4, nprobe=nprobe
        )

    rows = run(2).collect()
    assert set(run(2).columns) == {
        "query_id", "neighbor_id", "adc_sim", "rank"
    }
    assert all(r["rank"] in (1, 2) for r in rows)
    again = run(2).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))

    brute = {
        r["query_id"]: r["neighbor_id"]
        for r in brute_force_topk(emb, emb, k=1).collect()
    }

    def recall(nprobe):
        got = {
            r["query_id"]: r["neighbor_id"]
            for r in run(nprobe).collect()
            if r["rank"] == 1
        }
        return sum(got.get(q) == n for q, n in brute.items()) / len(brute)

    assert recall(2) >= recall(1)
