"""Distributed training of a model-based quality gate (distillation).

``textstats.quality_model_score`` deploys a FIXED linear gate; this module
closes the loop by LEARNING a gate on-cluster — the distillation step real
corpus pipelines run (fastText-style quality classifiers trained to mimic
a rule-based teacher, then deployed at scan speed).  The teacher here is
the repo's own ``QUALITY_WEIGHTS`` keep/drop verdict; the student is a
logistic regression over the same surface features (differently scaled,
so the student must genuinely re-locate the boundary).  Teacher-linear ⇒
separable ⇒ the student's recovery is checkable (accuracy floor +
exact-equality against a NumPy reference run in ``test_trainer.py``).

Structured exactly like the big case:

- featurization is one declarative pass over the documents scan
  (token/stopword/char counts — no Python);
- each training iteration is ONE distributed aggregation: Arrow-batched
  partial gradients (a d-vector per partition) summed by Spark, applied
  driver-side — the classic "broadcast parameters, reduce gradients"
  data-parallel loop (parameter state is d+1 doubles; NEVER corpus-sized);
- iteration count is fixed (no data-dependent convergence test), so the
  whole run is deterministic given the corpus (up to partition-order
  float noise in the gradient sums, bounded in the test).

At 100 TB nothing changes shape: gradients stay d-sized, the feature pass
stays one scan, and batches stream through Arrow without per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import tokens_col
from ..registry import register
from .textstats import QUALITY_WEIGHTS, STOPWORDS

#: feature order is part of the model contract (weights align by index)
FEATURE_NAMES: tuple[str, ...] = ("n_toks_h", "stop_ratio", "chars_per_tok_d")

N_ITER = 30
LEARNING_RATE = 1.0


def featurize_for_quality_gate(docs: DataFrame) -> DataFrame:
    """(doc_id, label, features): teacher verdict + student features.

    The teacher score reuses the deployed gate's exact arithmetic
    (``QUALITY_WEIGHTS`` over n_tokens, stopword ratio, chars/token); the
    student sees the same quantities rescaled to O(1) ranges (hecto-tokens,
    ratio, deci-chars/token) — shared scale keeps one global learning rate
    honest."""
    toks = tokens_col("text")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    feats = docs.select(
        "doc_id",
        F.size(toks).cast("double").alias("nt"),
        F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x))).cast("double").alias("ns"),
        F.length("text").cast("double").alias("nc"),
    )
    w0, w1, w2, w3 = QUALITY_WEIGHTS
    teacher = (
        (F.lit(w0) + F.lit(w1) * F.col("nt"))
        + F.lit(w2) * (F.col("ns") / F.col("nt"))
        + F.lit(w3) * (F.col("nc") / F.col("nt"))
    )
    return feats.select(
        "doc_id",
        (teacher >= 0).cast("double").alias("label"),
        (F.col("nt") / 100.0).alias("n_toks_h"),
        (F.col("ns") / F.col("nt")).alias("stop_ratio"),
        (F.col("nc") / F.col("nt") / 10.0).alias("chars_per_tok_d"),
    )


def train_logreg(features: DataFrame, n_iter: int = N_ITER, lr: float = LEARNING_RATE) -> list[float]:
    """Full-batch gradient descent; returns [w_0..w_{d-1}, bias].

    Each round broadcasts the current weights inside the Arrow task
    closure and reduces one (d+1)-vector of gradient sums plus the row
    count — a single narrow aggregation over the feature frame."""
    d = len(FEATURE_NAMES)
    w = [0.0] * (d + 1)
    feat_cols = list(FEATURE_NAMES)
    grad_schema = ", ".join([f"g{i} double" for i in range(d + 1)] + ["n long"])
    # materialize the featurized frame ONCE: without this every round
    # re-runs the scan + tokenization that produced the features (measured
    # ~10x of the query's cost at 30 rounds).  The cached frame is (d+1)
    # doubles per row — at 100 TB you stage it to parquet instead (the
    # ``datapipe.stage`` discipline); the training loop itself only ever
    # touches these narrow rows.
    frame = features.select(*feat_cols, "label").persist()

    for _ in range(n_iter):
        w_now = list(w)  # captured by value in the task closure

        def partial_grads(batches):
            import numpy as _np
            import pandas as _pd

            wv = _np.array(w_now[:-1])
            b = w_now[-1]
            for pdf in batches:
                x = pdf[feat_cols].to_numpy(dtype=float)
                y = pdf["label"].to_numpy(dtype=float)
                p = 1.0 / (1.0 + _np.exp(-(x @ wv + b)))
                err = p - y
                out = {f"g{i}": [float(x[:, i] @ err)] for i in range(len(feat_cols))}
                out[f"g{len(feat_cols)}"] = [float(err.sum())]
                out["n"] = [len(y)]
                yield _pd.DataFrame(out)

        sums = (
            frame.mapInPandas(partial_grads, schema=grad_schema)
            .agg(
                *[F.sum(f"g{i}").alias(f"g{i}") for i in range(d + 1)],
                F.sum("n").alias("n"),
            )
            .collect()[0]
        )
        n = sums["n"]
        w = [w[i] - lr * sums[f"g{i}"] / n for i in range(d + 1)]
    frame.unpersist()
    return w


@register("train_quality_classifier", oracle=None, tags=("datapipe", "ml", "iterative"))
def q_train_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learned quality gate: logistic weights distilled on-cluster from the
    deployed rule-based teacher (rows-only — iterative; pinned against a
    pure-NumPy reference run and an accuracy floor in ``test_trainer.py``).
    Output is the model itself, one (feature, weight) row each plus the
    bias — the artifact a ``quality_model_score``-style scan applies."""
    from ..sources import load_table

    feat = featurize_for_quality_gate(load_table(spark, sf_dir, "documents"))
    w = train_logreg(feat)
    rows = [(name, float(wi)) for name, wi in zip(FEATURE_NAMES, w[:-1])]
    rows.append(("bias", float(w[-1])))
    return spark.createDataFrame(rows, "feature string, weight double")
