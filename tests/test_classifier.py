"""Distributed IRLS logistic regression (operators/classifier.py):
coefficients match a local numpy IRLS on identical data, the fitted
model separates its target, and inference is a pure expression."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from rq_spark.operators import text as X
from rq_spark.operators.classifier import fit_logistic, predict_proba
from rq_spark.queries.helpers import table

SF = "/root/testdata/sf0.001"


def _features_and_label(spark):
    docs = table(spark, SF, "documents")
    t = F.col("text")
    scores = X.lang_scores(t)
    feats = [scores[lang].cast("double") for lang in ("en", "de", "fr", "es")]
    qf = X.quality_features(t)
    feats += [qf["uniq_ratio"], qf["alpha_ratio"]]
    label = (X.lang_id(t) == "en").cast("double")
    return docs, feats, label


def _local_irls(x, y, iters=6, reg=1e-6):
    x = np.hstack([np.ones((len(x), 1)), x])
    beta = np.zeros(x.shape[1])
    for _ in range(iters):
        eta = x @ beta
        p = 1.0 / (1.0 + np.exp(-eta))
        w = np.maximum(p * (1.0 - p), 1e-9)
        z = eta + (y - p) / w
        xw = x * w[:, None]
        beta = np.linalg.solve(
            x.T @ xw + reg * np.eye(x.shape[1]), xw.T @ z
        )
    return beta


def test_fit_matches_local_reference_and_separates(spark):
    docs, feats, label = _features_and_label(spark)
    beta = fit_logistic(docs, feats, label, iters=6)

    rows = docs.select(
        F.array(*[c.cast("double") for c in feats]).alias("x"),
        label.alias("y"),
    ).collect()
    x = np.stack([np.array(r["x"]) for r in rows])
    y = np.array([r["y"] for r in rows])
    ref = _local_irls(x, y, iters=6)
    # distributed partial sums differ from the local order by FP
    # rounding only; after 6 IRLS rounds both sit at the same optimum
    assert np.allclose(beta, ref, rtol=1e-5, atol=1e-7), (beta, ref)

    # the model must actually rank en-docs above the rest (AUC floor)
    scored = docs.select(
        label.alias("y"), predict_proba(beta, feats).alias("p")
    ).collect()
    pos = sorted(r["p"] for r in scored if r["y"] == 1.0)
    neg = sorted(r["p"] for r in scored if r["y"] == 0.0)
    assert pos and neg
    # exact AUC via rank-sum
    import itertools

    all_sorted = sorted((p, 1) for p in pos) + sorted((p, 0) for p in neg)
    all_sorted.sort()
    rank_sum = sum(
        i + 1 for i, (_, is_pos) in enumerate(all_sorted) if is_pos
    )
    auc = (rank_sum - len(pos) * (len(pos) + 1) / 2) / (len(pos) * len(neg))
    assert auc >= 0.9, f"AUC {auc}"


def test_predict_proba_is_pure_expression(spark):
    docs, feats, _ = _features_and_label(spark)
    beta = np.array([0.1] + [0.2] * len(feats))
    df = docs.select(predict_proba(beta, feats).alias("p"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Scan parquet" in plan
    vals = [r["p"] for r in df.limit(20).collect()]
    assert all(0.0 < v < 1.0 for v in vals)
