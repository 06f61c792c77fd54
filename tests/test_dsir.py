"""DSIR hashed n-gram importance resampling (`llm_prep.dsir_logweights`).

The value test re-derives every quantized bucket weight and per-doc sum
in pure Python (hashlib md5 — the same portable hash contract the
DuckDB oracles use), so the operator's integer outputs are pinned
exactly, not just directionally.
"""
from __future__ import annotations

import hashlib
import math
import re

import pytest
from pyspark.sql import functions as F

from tmdb_index_spark.operators.llm_prep import dsir_logweights

from tests.conftest import rows


def _df(spark, rows_, schema="doc_id long, text string, source string"):
    return spark.createDataFrame(rows_, schema)


def _grams(text: str) -> list[str]:
    toks = re.findall(r"[a-z0-9]+", (text or "").lower())
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _bucket(g: str, n_buckets: int) -> int:
    return int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % n_buckets


def _expected_logw_q(docs, target_sources, n_buckets=128):
    """Pure-Python mirror of the operator: {doc_id: quantized logw}."""
    cr: dict[int, int] = {}
    ct: dict[int, int] = {}
    per_doc: dict[int, dict[int, int]] = {}
    for doc_id, text, source in docs:
        for g in _grams(text):
            b = _bucket(g, n_buckets)
            cr[b] = cr.get(b, 0) + 1
            if source in target_sources:
                ct[b] = ct.get(b, 0) + 1
            per_doc.setdefault(doc_id, {})[b] = (
                per_doc.get(doc_id, {}).get(b, 0) + 1
            )
    tr, tt = sum(cr.values()), sum(ct.values())
    lwq = {
        b: round(
            (
                math.log((ct.get(b, 0) + 1) / (tt + n_buckets))
                - math.log((cr.get(b, 0) + 1) / (tr + n_buckets))
            )
            * 1e9
        )
        for b in range(n_buckets)
    }
    return {
        doc_id: sum(n * lwq[b] for b, n in buckets.items())
        for doc_id, buckets in per_doc.items()
    }


DOCS = [
    (1, "alpha beta alpha gamma", "wiki"),
    (2, "beta alpha beta beta", "wiki"),
    (3, "zebra quux zebra noise", "crawl"),
    (4, "quux noise quux zebra", "crawl"),
    (5, "alpha beta gamma alpha", "crawl"),  # crawl doc that LOOKS wiki
    (6, "!!! ???", "crawl"),  # zero n-grams under [a-z0-9]+
]


def test_dsir_logweights_match_python_mirror_exactly(spark):
    df = _df(spark, DOCS)
    got = {
        r["doc_id"]: r["logw_q"]
        for r in rows(
            dsir_logweights(df, F.col("source") == "wiki"), order_by="doc_id"
        )
    }
    want = _expected_logw_q(DOCS, {"wiki"})
    assert got == want
    # Zero-gram doc is absent (dense-flag policy belongs to the caller).
    assert 6 not in got


def test_dsir_separates_target_like_from_raw_only(spark):
    df = _df(spark, DOCS)
    got = {
        r["doc_id"]: r["logw_q"]
        for r in rows(
            dsir_logweights(df, F.col("source") == "wiki"), order_by="doc_id"
        )
    }
    # The resampling contract is the ORDERING: every target-vocabulary
    # doc (wherever it lives — doc 5 is a crawl doc that looks wiki)
    # outranks every raw-only-vocabulary doc. Signs are not asserted:
    # at tiny counts the +1-smoothing prior mass ln((tt+B)/(tr+B))
    # shifts all weights negative; a top-k / quantile keep-policy is
    # scale-free, which is why the operator returns weights and not a
    # fixed threshold decision.
    assert min(got[1], got[2], got[5]) > max(got[3], got[4])


def test_dsir_plan_reuses_heavy_exchange_and_broadcasts_weights(spark):
    df = _df(spark, DOCS)
    out = dsir_logweights(df, F.col("source") == "wiki")
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    # The (doc, bucket) count shuffle feeds both the distribution fit
    # and the per-doc sum: it must execute ONCE (AQE exchange reuse),
    # and the fitted 128-row weight table must attach by broadcast.
    assert "ReusedExchange" in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_dsir_rejects_degenerate_bucket_count(spark):
    df = _df(spark, DOCS)
    with pytest.raises(ValueError, match="n_buckets"):
        dsir_logweights(df, F.col("source") == "wiki", n_buckets=1)
