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


def test_trained_gate_packs_like_independent_repack(spark):
    """The TRAINED classifier driven through the same pluggable
    ``pack_corpus_gated`` plan the oracle-backed deployed-gate query uses:
    the gated packed manifest must equal an independent pandas repack of
    the (oracle-verified) ungated manifest restricted to the NumPy-computed
    keep set — proving "swap in a trained model" is a one-line change with
    the packing plumbing already verified."""
    from collections import defaultdict

    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.datapipe.curate import (
        pack_corpus_gated,
    )
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.datapipe.scrub import (
        PACK_TOKEN_BUDGET,
    )
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.registry import load_all

    docs = load_table(spark, SF_SMOKE, "documents")
    w = np.array(train_logreg(featurize_for_quality_gate(docs)))
    feats = featurize_for_quality_gate(docs).toPandas()
    z = feats[list(FEATURE_NAMES)].to_numpy() @ w[:-1] + w[-1]
    keep_ids = set(feats.doc_id[z >= 0])  # sigmoid(z) >= 0.5 <=> z >= 0

    keep_df = spark.createDataFrame([(int(i),) for i in sorted(keep_ids)], "doc_id long")
    got = sorted(map(tuple, pack_corpus_gated(spark, SF_SMOKE, keep_df).collect()))

    base = load_all()["curate_pack_corpus"].fn(spark, SF_SMOKE).toPandas()
    # the gate must actually cut (else this test is vacuous) but not empty
    assert 0 < len(base[base.doc_id.isin(keep_ids)]) < len(base)
    surv = base[base.doc_id.isin(keep_ids)].sort_values(["source", "doc_id"])
    cum: dict[str, int] = defaultdict(int)
    expected = []
    for r in surv.itertuples():
        c0 = cum[r.source]
        c1 = c0 + r.n_tokens
        cum[r.source] = c1
        expected.append(
            (
                r.doc_id,
                r.source,
                r.n_tokens,
                c0 // PACK_TOKEN_BUDGET,
                (c1 - 1) // PACK_TOKEN_BUDGET,
                c0 % PACK_TOKEN_BUDGET,
            )
        )
    assert got == sorted(expected)
