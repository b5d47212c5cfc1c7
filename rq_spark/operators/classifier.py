"""In-engine quality-classifier training: logistic regression by
distributed IRLS — the shape of the fastText/quality-filter stage of
a training-data pipeline (fit a small linear model on per-document
features, then score the whole corpus with pure expressions).

Scale design:
* TRAINING is iterative one-pass statistics: each IRLS round maps the
  corpus once (`mapInPandas`), emitting per-batch PARTIAL sums of the
  weighted normal equations — XᵀWX (d×d) and XᵀWz (d) — so the
  shuffle/collect volume per round is O(d²), never O(corpus). The
  driver solves the d×d system (d = a handful of features).
* INFERENCE is a pure `pyspark.sql.functions` expression
  (`predict_proba`): the fitted coefficients fold into a sigmoid of a
  codegen'd linear combination — scoring 100 TB costs one scan with
  zero Python.

No SQL-expressible oracle exists for the fitted optimum (iterative,
FP-order-sensitive partial sums), so correctness is pinned in
tests/test_classifier.py against a local numpy IRLS on the identical
data (coefficients agree to ~1e-6) plus separation floors — the same
evidence tier as the ANN recall assertions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fit_logistic(
    df: DataFrame,
    feature_cols: list[Column],
    label_col: Column,
    iters: int = 6,
    reg: float = 1e-6,
) -> np.ndarray:
    """Fit P(label=1 | x) = sigmoid(β₀ + β·x) by IRLS. Returns β of
    length len(feature_cols)+1 (intercept first). `reg` is a ridge
    term that also tames perfectly-separable data."""
    d = len(feature_cols) + 1
    data = df.select(
        F.array(*[c.cast("double") for c in feature_cols]).alias("x"),
        label_col.cast("double").alias("y"),
    )
    beta = np.zeros(d)

    def partials_for(b: np.ndarray):
        def gen(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                x = np.stack(pdf["x"].to_numpy()).astype(np.float64)
                x = np.hstack([np.ones((len(x), 1)), x])
                y = pdf["y"].to_numpy().astype(np.float64)
                eta = x @ b
                p = 1.0 / (1.0 + np.exp(-eta))
                w = np.maximum(p * (1.0 - p), 1e-9)
                z = eta + (y - p) / w
                xw = x * w[:, None]
                xtwx = x.T @ xw            # (d, d)
                xtwz = xw.T @ z            # (d,)
                yield pd.DataFrame(
                    {"vals": [np.concatenate([xtwx.ravel(), xtwz]).tolist()]}
                )

        return gen

    for _ in range(iters):
        rows = data.mapInPandas(
            partials_for(beta.copy()), "vals array<double>"
        ).collect()
        acc = np.zeros(d * d + d)
        for r in rows:
            acc += np.array(r["vals"])
        xtwx = acc[: d * d].reshape(d, d) + reg * np.eye(d)
        xtwz = acc[d * d :]
        beta = np.linalg.solve(xtwx, xtwz)
    return beta


def predict_proba(beta: np.ndarray, feature_cols: list[Column]) -> Column:
    """sigmoid(β₀ + β·x) as a pure codegen expression — the zero-Python
    corpus-scoring pass."""
    z = F.lit(float(beta[0]))
    for b, c in zip(beta[1:], feature_cols):
        z = z + F.lit(float(b)) * c.cast("double")
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
