"""Distributed logistic regression: the linear text-classifier shape
(fastText-without-embeddings) used for corpus quality / language
gating in training-data pipelines.

Spark-first: training is full-batch gradient descent where EACH
iteration is ONE aggregation — the per-row probability
``σ(w·x + b)`` is a pure column expression over literal weights
(JVM codegen, no UDF), and the gradient ``Σ (p − y)·x_j`` reduces to
m+1 sums with map-side partial aggregation. The only driver-side state
is the (m+1)-float weight vector. At 100 TB: n_iters corpus scans,
zero data shuffles (the agg's exchange carries m+1 doubles per
partition) — the same shape Spark MLlib's LogisticRegression uses per
LBFGS iteration.

Inference is the same literal expression — `score_expr` — so scoring
is a zero-shuffle narrow map and (unlike UDF-based models) fully
SQL-expressible: the `logreg_score_events` registry query hash-checks
it against DuckDB.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class LogRegModel:
    features: list[str]
    weights: list[float] = field(default_factory=list)
    bias: float = 0.0
    # standardization constants baked at fit time (applied in the
    # score expression, so serving needs no separate transform step)
    mean: list[float] = field(default_factory=list)
    std: list[float] = field(default_factory=list)

    def to_json(self) -> str:
        import json  # noqa: PLC0415

        return json.dumps({"kind": "logreg", **self.__dict__})

    @classmethod
    def from_json(cls, s: str) -> LogRegModel:
        import json  # noqa: PLC0415

        d = json.loads(s)
        d.pop("kind", None)
        return cls(**d)


def score_expr(model: LogRegModel, cols: dict[str, Column] | None = None) -> Column:
    """``σ(Σ wⱼ·(xⱼ−μⱼ)/σⱼ + b)`` as a single codegen expression."""
    z: Column = F.lit(float(model.bias))
    for j, name in enumerate(model.features):
        x = (cols or {}).get(name, F.col(name)).cast("double")
        if model.mean:
            x = (x - F.lit(model.mean[j])) / F.lit(model.std[j])
        z = z + F.lit(float(model.weights[j])) * x
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def fit_logreg(
    df: DataFrame,
    features: list[str],
    label: str,
    n_iters: int = 30,
    lr: float = 0.5,
    l2: float = 0.0,
    driver_fit_max_rows: int = 200_000,
) -> LogRegModel:
    """Full-batch GD on standardized features. Deterministic: no RNG,
    weights start at 0, feature moments come from exact aggregates.

    Cardinality gate (fit_gbt / connected_components pattern, r9):
    below ``driver_fit_max_rows`` the n_iters aggregation jobs are pure
    scheduling overhead (~0.24 s/job floor measured on a 1-task frame),
    so the feature matrix is collected ONCE and the identical GD loop
    runs on driver numpy — same standardization constants (from the
    same Spark aggregate), same update formulas; gradients differ from
    the distributed path only by float summation order / exp() ulps
    (pinned within tolerance in tests/test_logreg.py). Above the gate,
    each iteration is ONE m+1-sum aggregation over the corpus — the
    100 TB shape. All fit_logreg registry consumers are rows-only (no
    value-hash oracle), so ulp-level drift cannot flip a driver gate."""
    m = len(features)
    aggs = []
    for f in features:
        c = F.col(f).cast("double")
        aggs += [F.avg(c).alias(f"m_{f}"), F.stddev_pop(c).alias(f"s_{f}")]
    aggs.append(F.count(F.lit(1)).alias("n"))
    row = df.agg(*aggs).collect()[0]
    mean = [float(row[f"m_{f}"]) for f in features]
    std = [max(float(row[f"s_{f}"] or 0.0), 1e-12) for f in features]
    n = int(row["n"])

    model = LogRegModel(features=list(features), weights=[0.0] * m, bias=0.0,
                        mean=mean, std=std)
    if n == 0:
        return model

    if n <= driver_fit_max_rows:
        import numpy as np  # noqa: PLC0415

        rows = df.select(
            F.col(label).cast("double").alias("__y"),
            *[F.col(f).cast("double") for f in features],
        ).collect()
        y_arr = np.fromiter((r["__y"] for r in rows), dtype=np.float64, count=n)
        X = np.empty((n, m), dtype=np.float64)
        for j, f in enumerate(features):
            X[:, j] = np.fromiter(
                (r[f] for r in rows), dtype=np.float64, count=n
            )
        Xs = (X - np.asarray(mean)) / np.asarray(std)
        w = np.zeros(m, dtype=np.float64)
        b = 0.0
        for _ in range(n_iters):
            p = 1.0 / (1.0 + np.exp(-(Xs @ w + b)))
            err = p - y_arr
            b -= lr * float(err.sum()) / n
            w = w - lr * ((Xs.T @ err) / n + l2 * w)
        model.bias = float(b)
        model.weights = [float(x) for x in w]
        return model

    y = F.col(label).cast("double")
    for _ in range(n_iters):
        p = score_expr(model)
        err = p - y
        g = df.agg(
            F.sum(err).alias("g_b"),
            *[
                F.sum(
                    err * (F.col(f).cast("double") - F.lit(mean[j])) / F.lit(std[j])
                ).alias(f"g_{j}")
                for j, f in enumerate(features)
            ],
        ).collect()[0]
        model.bias -= lr * float(g["g_b"]) / n
        model.weights = [
            w - lr * (float(g[f"g_{j}"]) / n + l2 * w)
            for j, w in enumerate(model.weights)
        ]
    return model


def log_loss(df: DataFrame, model: LogRegModel, label: str) -> float:
    """Mean binary cross-entropy — ONE aggregation."""
    p = score_expr(model)
    y = F.col(label).cast("double")
    eps = F.lit(1e-12)
    ll = -(y * F.log(F.greatest(p, eps)) + (1 - y) * F.log(F.greatest(1 - p, eps)))
    return float(df.agg(F.avg(ll)).collect()[0][0])
