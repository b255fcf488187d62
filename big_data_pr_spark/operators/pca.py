"""Distributed PCA over an embedding column — one-pass second-moment
statistics, driver-side eigendecomposition, JVM-side projection.

The classic large-scale PCA split (the shape MLlib's RowMatrix PCA and
every map-reduce PCA paper use): the cluster reduces the corpus to
``(n, Σv, Σ v·vᵀ)`` — d + d² doubles of state regardless of corpus
size — with Arrow-batched partial aggregation; the d×d
eigendecomposition is O(d³) driver work (micro-seconds for embedding
dims); the projection back over the corpus is a pure codegen
dot-product expression, so the scoring path has NO Python at all.

Reference capability this generalizes: the reference's MinMaxScaler
feature preprocessing (app.py:207-218 scales model inputs before the
XGBoost forecast) — PCA is the same fit-small-state / transform-wide
pattern one step up, and the standard dimensionality reducer in front
of the ANN / clustering operators in this repo (similarity.py,
ann_index.py).

At 100 TB: ``gram_stats`` is a single scan with per-Arrow-batch numpy
partials (each batch contributes ONE (n, s, g) row ≈ d² doubles);
the driver combine handles one row per batch — thousands of rows, not
corpus-scale. For d where d² rows stop being "tiny driver state"
(d ≳ 10⁴), swap the combine for a treeAggregate-style two-level
reduce; embedding dims here (64-4096) are far below that.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .similarity import dot


def gram_stats(df: DataFrame, vec_col: str = "embedding", dim: int | None = None):
    """One-pass ``(n, Σv, Σ v·vᵀ)`` over a fixed-dim array column.

    Returns ``(n, s, g)`` as ``(int, np.ndarray[d], np.ndarray[d, d])``.
    Rows with NULL or wrong-length vectors are skipped (counted out of
    ``n``), so one corrupt embedding can't poison the fit.
    """
    import numpy as np

    if dim is None:
        probe = df.select(F.size(vec_col).alias("d")).filter(
            F.col("d") > 0
        ).limit(1).collect()
        if not probe:
            raise ValueError(f"no non-empty vectors in {vec_col!r}")
        dim = probe[0]["d"]

    d = int(dim)

    def partials(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            mats = [
                np.asarray(v, dtype=np.float64)
                for v in pdf[vec_col]
                if v is not None and len(v) == d
            ]
            if not mats:
                continue
            x = np.stack(mats)
            yield pd.DataFrame(
                {
                    "n": [x.shape[0]],
                    "s": [x.sum(axis=0).tolist()],
                    "g": [(x.T @ x).ravel().tolist()],
                }
            )

    rows = (
        df.select(vec_col)
        .mapInPandas(partials, schema="n long, s array<double>, g array<double>")
        .collect()
    )
    if not rows:
        raise ValueError(f"no valid vectors in {vec_col!r}")
    n = sum(r["n"] for r in rows)
    s = np.sum([np.asarray(r["s"]) for r in rows], axis=0)
    g = np.sum([np.asarray(r["g"]).reshape(d, d) for r in rows], axis=0)
    return n, s, g


@dataclass(frozen=True)
class PCAModel:
    """Fitted PCA: driver-sized arrays, JSON-serializable lists."""

    mean: list[float]  # d
    components: list[list[float]]  # k × d, rows orthonormal
    explained_variance: list[float]  # k, descending
    explained_variance_ratio: list[float]  # k


def fit_pca(
    df: DataFrame, vec_col: str = "embedding", k: int = 2, dim: int | None = None
) -> PCAModel:
    """Fit top-``k`` principal components from one distributed pass.

    Population covariance ``C = G/n − m·mᵀ``; components are the top-k
    eigenvectors of the symmetric ``C`` (numpy ``eigh``), sign-fixed so
    each component's largest-|entry| coordinate is positive — the same
    determinism convention sklearn uses, making fits reproducible
    across runs and partitionings up to float summation order.
    """
    import numpy as np

    n, s, g = gram_stats(df, vec_col, dim)
    m = s / n
    cov = g / n - np.outer(m, m)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T  # k × d
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    top = evals[order]
    total = float(evals.sum())
    return PCAModel(
        mean=m.tolist(),
        components=[row.tolist() for row in comps],
        explained_variance=[float(v) for v in top],
        explained_variance_ratio=[float(v / total) if total else 0.0 for v in top],
    )


def project_expr(vec_col: Column | str, component: list[float], mean: list[float]) -> Column:
    """``(v − mean)·c`` as a pure codegen expression: the dot product
    folds JVM-side and ``mean·c`` collapses to one literal constant —
    zero Python in the projection path."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    const = sum(mi * ci for mi, ci in zip(mean, component))
    return dot(v, F.lit([float(c) for c in component])) - F.lit(float(const))


def project(
    df: DataFrame,
    model: PCAModel,
    vec_col: str = "embedding",
    prefix: str = "pc",
) -> DataFrame:
    """Append ``pc1..pck`` projection columns (whole-stage codegen)."""
    out = df
    for i, comp in enumerate(model.components, start=1):
        out = out.withColumn(
            f"{prefix}{i}", project_expr(vec_col, comp, model.mean)
        )
    return out
