"""regression (OLS/ridge via distributed normal equations) and PCA
(quantized-Gram covariance + driver eigh) vs numpy closed forms.

Reference parity targets: functions/regression.py (sklearn ols/ridge),
functions/pca.py (sklearn PCA) — both re-derived from the normal
equations / eigendecomposition, no sklearn.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tstoolbox_spark.operators.pca import (
    pca_fit,
    pca_transform,
    quantized_covariance,
)
from tstoolbox_spark.operators.regression import ols_fit, ols_predict


@pytest.fixture(scope="module")
def reg_pdf():
    rng = np.random.RandomState(11)
    n = 400
    x1 = rng.randint(0, 24, n)
    x2 = rng.randint(1, 8, n)
    x3 = rng.randint(1, 29, n)
    y = 3.0 + 0.7 * x1 - 1.3 * x2 + 0.1 * x3 + rng.randn(n)
    return pd.DataFrame(
        {"k": np.where(np.arange(n) % 2 == 0, "a", "b"),
         "x1": x1, "x2": x2, "x3": x3, "y": np.round(y, 2)}
    )


def _np_ols(sub, xs, lam=0.0):
    X = np.column_stack([np.ones(len(sub))] + [sub[c] for c in xs])
    A = X.T @ X
    A[1:, 1:] += lam * np.eye(len(xs))
    return np.linalg.solve(A, X.T @ sub["y"].to_numpy())


def test_ols_p2_cramer_matches_numpy(spark, reg_pdf):
    sdf = spark.createDataFrame(reg_pdf)
    out = ols_fit(sdf, "y", ["x1", "x2"], key_cols=["k"]).toPandas()
    assert set(out.columns) == {"k", "intercept", "b_x1", "b_x2", "r2"}
    for _, row in out.iterrows():
        sub = reg_pdf[reg_pdf["k"] == row["k"]]
        beta = _np_ols(sub, ["x1", "x2"])
        np.testing.assert_allclose(
            [row["intercept"], row["b_x1"], row["b_x2"]], beta, rtol=1e-9
        )
        resid = sub["y"] - beta[0] - beta[1] * sub["x1"] - beta[2] * sub["x2"]
        sst = ((sub["y"] - sub["y"].mean()) ** 2).sum()
        np.testing.assert_allclose(row["r2"], 1 - (resid**2).sum() / sst,
                                   rtol=1e-6)


def test_ols_p3_numpy_path_and_ridge(spark, reg_pdf):
    sdf = spark.createDataFrame(reg_pdf)
    for lam in (0.0, 5.0):
        out = ols_fit(
            sdf, "y", ["x1", "x2", "x3"], key_cols=["k"], ridge=lam
        ).toPandas()
        for _, row in out.iterrows():
            sub = reg_pdf[reg_pdf["k"] == row["k"]]
            beta = _np_ols(sub, ["x1", "x2", "x3"], lam)
            np.testing.assert_allclose(
                [row["intercept"], row["b_x1"], row["b_x2"], row["b_x3"]],
                beta, rtol=1e-8,
            )


def test_ols_ridge_p2_expression_path(spark, reg_pdf):
    sdf = spark.createDataFrame(reg_pdf)
    out = ols_fit(sdf, "y", ["x1", "x2"], key_cols=["k"],
                  ridge=2.5).toPandas()
    for _, row in out.iterrows():
        sub = reg_pdf[reg_pdf["k"] == row["k"]]
        beta = _np_ols(sub, ["x1", "x2"], 2.5)
        np.testing.assert_allclose(
            [row["intercept"], row["b_x1"], row["b_x2"]], beta, rtol=1e-9
        )


def test_ols_predict_residuals(spark, reg_pdf):
    sdf = spark.createDataFrame(reg_pdf)
    coef = ols_fit(sdf, "y", ["x1", "x2"], key_cols=["k"])
    pred = ols_predict(sdf, coef, "y", ["x1", "x2"],
                       key_cols=["k"]).toPandas()
    assert {"y_pred", "y_resid"} <= set(pred.columns)
    np.testing.assert_allclose(
        pred["y_resid"], pred["y"] - pred["y_pred"], atol=1e-12
    )
    # residuals of an OLS fit with intercept sum to ~0 per key
    for _, g in pred.groupby("k"):
        assert abs(g["y_resid"].mean()) < 1e-8


def test_ols_rejects_empty_regressors(spark, reg_pdf):
    sdf = spark.createDataFrame(reg_pdf)
    with pytest.raises(ValueError):
        ols_fit(sdf, "y", [])


@pytest.fixture(scope="module")
def emb_pdf():
    rng = np.random.RandomState(3)
    d, n = 12, 300
    basis = rng.randn(3, d)
    X = rng.randn(n, 3) @ basis + 0.05 * rng.randn(n, d)
    return pd.DataFrame(
        {"vec_id": np.arange(n),
         "embedding": [r.astype(np.float64) for r in X]}
    )


def test_quantized_covariance_matches_numpy(spark, emb_pdf):
    sdf = spark.createDataFrame(emb_pdf)
    cov = quantized_covariance(sdf, "embedding").toPandas()
    X = np.stack(emb_pdf["embedding"].to_numpy())
    Q = np.floor(X * 1e6) / 1e6
    C = np.cov(Q, rowvar=False)
    assert len(cov) == 12 * 13 // 2
    for r in cov.itertuples():
        np.testing.assert_allclose(r.cov, C[r.i, r.j], atol=1e-12)


def test_pca_fit_transform(spark, emb_pdf):
    sdf = spark.createDataFrame(emb_pdf)
    comps, var = pca_fit(sdf, "embedding", k=4)
    assert comps.shape == (4, 12)
    # unit, orthogonal, variance descending
    np.testing.assert_allclose(comps @ comps.T, np.eye(4), atol=1e-10)
    assert all(var[i] >= var[i + 1] for i in range(3))
    # 3-factor data: top-3 capture nearly all variance
    assert var[:3].sum() / var.sum() > 0.95
    proj = (pca_transform(sdf, comps, "embedding")
            .orderBy("vec_id").toPandas())
    X = np.stack(emb_pdf["embedding"].to_numpy())
    expected = X @ comps.T
    got = proj[["pc0", "pc1", "pc2", "pc3"]].to_numpy()
    np.testing.assert_allclose(got, expected, atol=1e-9)


def test_quantized_covariance_is_partitioning_invariant(spark, emb_pdf):
    """The scale claim: exact integer partials make the result
    bit-identical under any partitioning (stand-in for executor
    count)."""
    sdf = spark.createDataFrame(emb_pdf)
    a = (quantized_covariance(sdf.repartition(1), "embedding")
         .orderBy("i", "j").toPandas())
    b = (quantized_covariance(sdf.repartition(13), "embedding")
         .orderBy("i", "j").toPandas())
    assert (a["cov"].to_numpy() == b["cov"].to_numpy()).all()
