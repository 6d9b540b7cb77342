"""Distributed PCA (operators/pca.py) vs a full-data numpy reference: the
Gram-partial path must reproduce exact covariance PCA up to float noise,
with the imposed sign convention making results build-independent."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from etl_hiscox_spark.operators.pca import pca_fit, pca_project


def _make_df(spark, n=300, d=8, seed=7):
    rng = np.random.default_rng(seed)
    # anisotropic data: variance concentrated in two directions
    basis = rng.standard_normal((d, d))
    scales = np.array([10.0, 5.0] + [0.5] * (d - 2))
    x = rng.standard_normal((n, d)) * scales @ basis.T + rng.standard_normal(d) * 3
    rows = [(i, [float(v) for v in x[i]]) for i in range(n)]
    return spark.createDataFrame(rows, "id long, embedding array<double>"), x


def _numpy_pca(x, k):
    cov = np.cov(x, rowvar=False, ddof=1)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:k]
    comps = v[:, order].T
    for i in range(k):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return comps, w[order]


def test_pca_fit_matches_numpy_reference(spark):
    df, x = _make_df(spark)
    model = pca_fit(df.repartition(7), "embedding", k=3)
    ref_comps, ref_ev = _numpy_pca(x, 3)
    np.testing.assert_allclose(model.explained_variance, ref_ev, rtol=1e-8)
    np.testing.assert_allclose(model.components, ref_comps, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(model.mean, x.mean(axis=0), rtol=1e-9)
    assert model.n_rows == len(x)
    # components are orthonormal
    np.testing.assert_allclose(model.components @ model.components.T, np.eye(3), atol=1e-9)
    # ratio ordering and bound
    r = model.explained_variance_ratio
    assert r[0] >= r[1] >= r[2] >= 0 and r.sum() <= 1 + 1e-9


def test_pca_fit_partition_invariant(spark):
    df, _ = _make_df(spark, n=120, d=5, seed=11)
    m1 = pca_fit(df.repartition(1), "embedding", k=2)
    m8 = pca_fit(df.repartition(8), "embedding", k=2)
    np.testing.assert_allclose(m1.components, m8.components, rtol=1e-9, atol=1e-10)


def test_pca_project_centers_and_rotates(spark):
    df, x = _make_df(spark, n=100, d=6, seed=3)
    model = pca_fit(df, "embedding", k=2)
    out = pca_project(df, "embedding", model, out_col="pc")
    got = {r["id"]: np.array(r["pc"]) for r in out.collect()}
    ref = (x - x.mean(axis=0)) @ model.components.T
    for i in range(100):
        np.testing.assert_allclose(got[i], ref[i], rtol=1e-7, atol=1e-9)
    # projected coordinates are uncorrelated with variance = eigenvalues
    proj = np.stack([got[i] for i in range(100)])
    cov = np.cov(proj, rowvar=False, ddof=1)
    np.testing.assert_allclose(np.diag(cov), model.explained_variance, rtol=1e-7)
    assert abs(cov[0, 1]) < 1e-7


def test_pca_fit_errors(spark):
    df, _ = _make_df(spark, n=10, d=4, seed=1)
    with pytest.raises(ValueError, match="k must be"):
        pca_fit(df, "embedding", k=5)
    empty = df.filter(F.col("id") < 0)
    with pytest.raises(ValueError, match="empty"):
        pca_fit(empty, "embedding", k=2)
    one = df.limit(1)
    with pytest.raises(ValueError, match=">= 2 rows"):
        pca_fit(one, "embedding", k=2)
