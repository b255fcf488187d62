"""Distributed logistic regression (operators/logreg.py): parity with
a sequential numpy replica, convergence on separable data, and the
one-agg-per-iteration contract."""

from __future__ import annotations

import numpy as np
import pytest

from big_data_pr_spark.operators.logreg import (
    LogRegModel,
    fit_logreg,
    log_loss,
    score_expr,
)


def _ref_fit(X, y, n_iters, lr, l2=0.0):
    mean = X.mean(axis=0)
    std = np.maximum(X.std(axis=0), 1e-12)
    Z = (X - mean) / std
    n, m = X.shape
    w = np.zeros(m)
    b = 0.0
    for _ in range(n_iters):
        p = 1.0 / (1.0 + np.exp(-(Z @ w + b)))
        err = p - y
        b -= lr * err.sum() / n
        w = w - lr * ((Z * err[:, None]).sum(axis=0) / n + l2 * w)
    return w, b, mean, std


@pytest.mark.parametrize("seed", [0, 1])
def test_fit_logreg_matches_numpy_reference(spark, seed):
    rng = np.random.RandomState(seed)
    n = 400
    X = rng.randn(n, 3).round(4)
    y = (X[:, 0] + 0.5 * X[:, 1] + 0.1 * rng.randn(n) > 0).astype(float)
    rows = [
        (i, float(X[i, 0]), float(X[i, 1]), float(X[i, 2]), float(y[i]))
        for i in range(n)
    ]
    df = spark.createDataFrame(
        rows, "id long, f0 double, f1 double, f2 double, y double"
    )
    model = fit_logreg(df, ["f0", "f1", "f2"], "y", n_iters=15, lr=0.5)
    w, b, mean, std = _ref_fit(X, y, n_iters=15, lr=0.5)
    np.testing.assert_allclose(model.weights, w, rtol=0, atol=1e-8)
    assert model.bias == pytest.approx(b, abs=1e-8)
    np.testing.assert_allclose(model.mean, mean, rtol=0, atol=1e-9)
    np.testing.assert_allclose(model.std, std, rtol=0, atol=1e-9)


def test_fit_logreg_separates(spark):
    """Separable data: accuracy > 95% and loss below chance."""
    rng = np.random.RandomState(7)
    n = 500
    X = rng.randn(n, 2)
    y = (2 * X[:, 0] - X[:, 1] > 0).astype(float)
    df = spark.createDataFrame(
        [(float(X[i, 0]), float(X[i, 1]), float(y[i])) for i in range(n)],
        "f0 double, f1 double, y double",
    )
    model = fit_logreg(df, ["f0", "f1"], "y", n_iters=60, lr=1.0)
    from pyspark.sql import functions as F

    acc = (
        df.select(((score_expr(model) > 0.5).cast("double") == F.col("y")).alias("ok"))
        .agg(F.avg(F.col("ok").cast("double")))
        .collect()[0][0]
    )
    assert acc > 0.95
    assert log_loss(df, model, "y") < 0.3


def test_score_expr_no_python(spark):
    """Scoring a literal model is pure codegen: no UDF node in the plan."""
    import contextlib
    import io

    model = LogRegModel(features=["f0"], weights=[1.0], bias=0.0)
    df = spark.range(10).selectExpr("cast(id as double) as f0")
    out = df.select(score_expr(model).alias("p"))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("simple")
    assert "Python" not in buf.getvalue()


def test_driver_fit_matches_distributed_within_ulps(spark):
    """r9: below the cardinality gate fit_logreg runs the GD loop on
    driver numpy (1 collect instead of n_iters aggregation jobs). Both
    paths share standardization constants and update formulas; the
    gradients differ only by summation order / exp() ulps, so weights
    must agree tightly — and the two paths' scores must rank rows
    identically."""
    import numpy as np

    rng = np.random.default_rng(5)
    rows = [
        (float(a), float(b), float(1.0 if 2 * a - b > 0 else 0.0))
        for a, b in rng.normal(0, 1, size=(500, 2))
    ]
    df = spark.createDataFrame(rows, "f0 double, f1 double, y double")
    m_drv = fit_logreg(df, ["f0", "f1"], "y", n_iters=20, lr=0.5)
    m_dist = fit_logreg(
        df, ["f0", "f1"], "y", n_iters=20, lr=0.5, driver_fit_max_rows=0
    )
    assert m_drv.mean == m_dist.mean and m_drv.std == m_dist.std
    np.testing.assert_allclose(m_drv.weights, m_dist.weights, rtol=1e-9)
    assert m_drv.bias == pytest.approx(m_dist.bias, rel=1e-9)
