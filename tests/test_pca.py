"""Deterministic sampled PCA (`similarity.fit_pca*`, `pca_projection_sql`).

Parity strategy under test: the fit is pure numpy (orthonormality /
ordering / sign convention asserted against an independent SVD), and
the projection the engines run is ONE shared unrolled expression
string, pinned here against a direct numpy projection to the exact
integer-micro quantization the catalog query aggregates.
"""
from __future__ import annotations

import numpy as np
import pytest

from tmdb_index_spark.operators.similarity import (
    fit_pca,
    fit_pca_array,
    pca_projection_sql,
)

from tests.conftest import rows


def _X(n=80, d=6, seed=7):
    rng = np.random.RandomState(seed)
    # anisotropic cloud so the top components are unambiguous
    scales = np.array([5.0, 3.0, 1.0, 0.5, 0.2, 0.1])[:d]
    return rng.randn(n, d) * scales + rng.randn(d)


def test_fit_pca_array_matches_svd_subspace_and_conventions():
    X = _X()
    mu, comps, evr = fit_pca_array(X, 3)
    # components orthonormal
    G = comps @ comps.T
    assert np.allclose(G, np.eye(3), atol=1e-10)
    # explained variance descending and positive for this cloud
    assert evr[0] > evr[1] > evr[2] > 0
    # sign convention: largest-|entry| coordinate is positive
    for c in comps:
        assert c[np.abs(c).argmax()] > 0
    # same subspace as the SVD of the centered data: |cos| of each
    # fitted component with its SVD twin is 1
    _, _, Vt = np.linalg.svd(X - X.mean(axis=0), full_matrices=False)
    for i in range(3):
        assert abs(float(comps[i] @ Vt[i])) == pytest.approx(1.0, abs=1e-8)


def test_fit_pca_array_is_deterministic_rerun():
    X = _X()
    a = fit_pca_array(X, 2)
    b = fit_pca_array(X.copy(), 2)
    assert np.array_equal(a[0], b[0])
    assert np.array_equal(a[1], b[1])
    assert a[2] == b[2]


def test_fit_pca_array_rejects_bad_components():
    with pytest.raises(ValueError, match="n_components"):
        fit_pca_array(_X(), 0)


def test_spark_projection_matches_numpy_to_the_quantum(spark):
    X = _X(n=40, d=4).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(len(X))],
        "vec_id long, embedding array<float>",
    )
    mu, comps, evr = fit_pca(df, 2)
    expr = pca_projection_sql(mu, comps[0], "embedding")
    got = {
        r["vec_id"]: r["q"]
        for r in rows(
            df.selectExpr(
                "vec_id", f"CAST(ROUND(({expr}) * 1e6) AS BIGINT) AS q"
            ),
            order_by="vec_id",
        )
    }
    Xd = X.astype("float64")
    want = {
        i: round(float((Xd[i] - np.array(mu)) @ np.array(comps[0])) * 1e6)
        for i in range(len(X))
    }
    # integer-micro quantization: numpy's fused dot and the SQL chain
    # may differ by float noise far below the quantum, never more
    assert all(abs(got[i] - want[i]) <= 1 for i in want)


def test_pca_projection_sql_indexing_modes():
    s0 = pca_projection_sql([0.0, 1.0], [2.0, 3.0], "v")
    s1 = pca_projection_sql([0.0, 1.0], [2.0, 3.0], "v", one_based=True)
    assert "v[0]" in s0 and "v[1]" in s0 and "v[2]" not in s0
    assert "v[1]" in s1 and "v[2]" in s1 and "v[0]" not in s1


def test_catalog_query_plan_is_map_only_single_shuffle(spark):
    from tmdb_index_spark.queries import embedding_pca_labels

    df = embedding_pca_labels(spark, "/root/testdata/sf0.001")
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # AQE prints the Initial Plan below the Final Plan — assert on the
    # final section only
    final = plan.split("== Initial Plan ==")[0]
    assert "Join" not in final and "CartesianProduct" not in final
    # projection is map-only: the ONLY exchange is the bounded label
    # aggregation's
    assert final.count("Exchange hashpartitioning") == 1
