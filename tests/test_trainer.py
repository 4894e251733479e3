"""Distributed logistic-regression trainer ≡ pure-NumPy reference, and the
distilled student recovers the teacher gate."""

from __future__ import annotations

import numpy as np

from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.datapipe.trainer import (
    FEATURE_NAMES,
    L2,
    N_ITER,
    featurize_for_quality_gate,
    train_logreg,
)
from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.sources.tables import load_table

from .conftest import SF_SMOKE


def _numpy_reference(x: np.ndarray, y: np.ndarray, n_iter: int, l2: float) -> np.ndarray:
    """Same regularized Newton/IRLS the distributed trainer runs (L2 on
    the feature weights only — the bias is unpenalized, mirroring
    ``train_logreg``)."""
    dim = x.shape[1] + 1
    xt = np.hstack([x, np.ones((len(y), 1))])
    w = np.zeros(dim)
    l2_mask = np.ones(dim)
    l2_mask[-1] = 0.0
    for _ in range(n_iter):
        p = 1.0 / (1.0 + np.exp(-(xt @ w)))
        err = p - y
        r = p * (1.0 - p)
        grad = xt.T @ err / len(y) + l2 * l2_mask * w
        hess = xt.T @ (xt * r[:, None]) / len(y) + l2 * np.diag(l2_mask)
        w = w - np.linalg.solve(hess, grad)
    return w


def test_distributed_training_matches_numpy_and_recovers_teacher(spark):
    feat = featurize_for_quality_gate(load_table(spark, SF_SMOKE, "documents"))
    rows = feat.orderBy("doc_id").collect()
    x = np.array([[r[name] for name in FEATURE_NAMES] for r in rows])
    y = np.array([r["label"] for r in rows])
    assert 0.2 < y.mean() < 0.8  # the teacher gate is non-degenerate here

    w_dist = np.array(train_logreg(feat, n_iter=N_ITER, l2=L2))
    w_ref = _numpy_reference(x, y, N_ITER, L2)
    # partition-order float noise only — amplified over N_ITER rounds but
    # must stay far below model scale
    assert np.allclose(w_dist, w_ref, rtol=1e-6, atol=1e-9), (w_dist, w_ref)

    # distillation succeeded: the student reproduces the teacher verdicts
    p = 1.0 / (1.0 + np.exp(-(x @ w_dist[:-1] + w_dist[-1])))
    acc = float(((p >= 0.5) == (y == 1.0)).mean())
    assert acc >= 0.9, acc
