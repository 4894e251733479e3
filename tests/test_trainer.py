"""Distributed logistic-regression trainer ≡ pure-NumPy reference, and the
distilled student recovers the teacher gate."""

from __future__ import annotations

import numpy as np

from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.datapipe.trainer import (
    FEATURE_NAMES,
    LEARNING_RATE,
    N_ITER,
    featurize_for_quality_gate,
    train_logreg,
)
from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.sources.tables import load_table

from .conftest import SF_SMOKE


def _numpy_reference(x: np.ndarray, y: np.ndarray, n_iter: int, lr: float) -> np.ndarray:
    w = np.zeros(x.shape[1] + 1)
    for _ in range(n_iter):
        p = 1.0 / (1.0 + np.exp(-(x @ w[:-1] + w[-1])))
        err = p - y
        grad = np.concatenate([x.T @ err, [err.sum()]])
        w = w - lr * grad / len(y)
    return w


def test_distributed_training_matches_numpy_and_recovers_teacher(spark):
    feat = featurize_for_quality_gate(load_table(spark, SF_SMOKE, "documents"))
    rows = feat.orderBy("doc_id").collect()
    x = np.array([[r[name] for name in FEATURE_NAMES] for r in rows])
    y = np.array([r["label"] for r in rows])
    assert 0.2 < y.mean() < 0.8  # the teacher gate is non-degenerate here

    w_dist = np.array(train_logreg(feat, n_iter=N_ITER, lr=LEARNING_RATE))
    w_ref = _numpy_reference(x, y, N_ITER, LEARNING_RATE)
    # partition-order float noise only — amplified over N_ITER rounds but
    # must stay far below model scale
    assert np.allclose(w_dist, w_ref, rtol=1e-6, atol=1e-9), (w_dist, w_ref)

    # distillation succeeded: the student reproduces the teacher verdicts
    p = 1.0 / (1.0 + np.exp(-(x @ w_dist[:-1] + w_dist[-1])))
    acc = float(((p >= 0.5) == (y == 1.0)).mean())
    assert acc >= 0.9, acc
