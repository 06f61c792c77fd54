"""TF-IDF / BM25 operator tests (north-star text analysis).

Small hand-computed corpora; the sf0.01 oracle gate covers the
cross-engine numeric path, these pin the semantics.
"""

from __future__ import annotations

import math

import pytest

from tmdb_index_spark.operators.ranking import (
    bm25_topk,
    term_frequencies,
    tfidf_top_terms,
)


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            (0, "apple banana apple"),
            (1, "banana cherry"),
            (2, "apple cherry cherry date"),
        ],
        "doc_id long, text string",
    )


def test_term_frequencies(corpus):
    got = {
        (r.doc_id, r.term): r.tf
        for r in term_frequencies(corpus).collect()
    }
    assert got[(0, "apple")] == 2
    assert got[(0, "banana")] == 1
    assert got[(2, "cherry")] == 2
    assert (1, "apple") not in got


def test_tfidf_ranks_rare_terms_highest(corpus):
    out = tfidf_top_terms(corpus, k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 2: 'date' appears in 1 of 3 docs (idf=ln 3), 'cherry' tf=2 in
    # 2 of 3 docs (idf=ln 1.5). tf*idf: date=1.0986 > cherry=0.8109.
    top2 = by_doc[2]
    assert [r.term for r in sorted(top2, key=lambda r: r.rank)] == ["date", "cherry"]
    assert top2[0].tfidf == pytest.approx(round(math.log(3.0), 4), abs=1e-4)
    # every doc emits at most k rows, ranks are 1..k
    for rows_ in by_doc.values():
        assert sorted(r.rank for r in rows_) == list(range(1, len(rows_) + 1))


def test_bm25_prefers_matching_rare_terms(corpus):
    out = bm25_topk(corpus, ["date", "banana"], k=3).collect()
    ranked = [r.doc_id for r in sorted(out, key=lambda r: r.rank)]
    # doc 2 matches the rarest term 'date'; docs 0 and 1 match only
    # 'banana'. Doc 1 is shorter than doc 0 (length normalization), so
    # its banana hit scores higher.
    assert ranked[0] == 2
    assert ranked[1] == 1 and ranked[2] == 0
    assert all(r.score > 0 for r in out)


def test_bm25_ignores_docs_without_query_terms(spark):
    df = spark.createDataFrame(
        [(0, "x y z"), (1, "q r s")], "doc_id long, text string"
    )
    out = bm25_topk(df, ["x"], k=10).collect()
    assert [r.doc_id for r in out] == [0]


def test_bm25_parquet_pin_lands_in_warehouse_and_cleans_up(corpus, spark):
    # The parquet pin path without an explicit scratch_dir must derive
    # its location from spark.sql.warehouse.dir (shared storage on a
    # real cluster — executor tasks write the files, so a driver-local
    # temp dir would leave the re-read incomplete) and best-effort
    # delete it at interpreter exit.
    import os

    from tmdb_index_spark.operators import materialize as M

    warehouse = spark.conf.get("spark.sql.warehouse.dir").rstrip("/")
    if warehouse.startswith("file:"):
        warehouse = warehouse[len("file:"):]
    before = list(M._SCRATCH_PATHS)
    out = bm25_topk(corpus, ["apple"], k=3, materialize="parquet")
    assert out.count() > 0
    new = [p for p in M._SCRATCH_PATHS if p not in before]
    assert new, "parquet pin registered no scratch path"
    for p in new:
        local = p[len("file:"):] if p.startswith("file:") else p
        assert local.startswith(warehouse + "/_pin_scratch/"), p
        assert os.path.isdir(local), "scratch parquet not written"
    M._cleanup()
    for p in new:
        local = p[len("file:"):] if p.startswith("file:") else p
        assert not os.path.exists(local), "scratch not cleaned"


def test_bm25_empty_query_returns_empty_frame(corpus):
    out = bm25_topk(corpus, [], k=10)
    assert out.columns == ["doc_id", "score", "rank"]
    assert out.count() == 0
    # duplicate-only input collapsing to empty hits the same path
    assert bm25_topk(corpus, ["apple", "apple"], k=1).count() == 1


# ---------------------------------------------------------------------------
# rrf_fuse
# ---------------------------------------------------------------------------

from tmdb_index_spark.operators.ranking import rrf_fuse  # noqa: E402


def _leg(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, rank long")


def test_rrf_fuse_hand_computed(spark):
    lex = _leg(spark, [(1, 1), (2, 2)])
    sem = _leg(spark, [(2, 1), (3, 2)])
    got = {r.doc_id: r for r in rrf_fuse({"lex": lex, "sem": sem}).collect()}
    assert got[1].rrf_score == 1.0 / 61
    assert got[2].rrf_score == 1.0 / 62 + 1.0 / 61
    assert got[3].rrf_score == 1.0 / 62
    assert (got[1].lex_rank, got[1].sem_rank) == (1, None)
    assert (got[2].lex_rank, got[2].sem_rank) == (2, 1)
    assert (got[3].lex_rank, got[3].sem_rank) == (None, 2)


def test_rrf_fuse_three_legs(spark):
    legs = {
        "a": _leg(spark, [(7, 1)]),
        "b": _leg(spark, [(7, 3)]),
        "c": _leg(spark, [(7, 5)]),
    }
    [r] = rrf_fuse(legs, k=10).collect()
    assert r.rrf_score == 1.0 / 11 + 1.0 / 13 + 1.0 / 15
    assert (r.a_rank, r.b_rank, r.c_rank) == (1, 3, 5)


def test_rrf_fuse_validation(spark):
    with pytest.raises(ValueError):
        rrf_fuse({})
    with pytest.raises(ValueError):
        rrf_fuse({"a": _leg(spark, [(1, 1)])}, k=-1)


def test_hybrid_query_final_topk_never_global_sorts(spark):
    from tmdb_index_spark.queries import QUERIES

    plan = (
        QUERIES["hybrid_rrf_search"](spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
