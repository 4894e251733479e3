"""Distributed PCA over the embedding table: top principal component via a
one-pass Gram/covariance aggregation + power iteration.

No reference counterpart (SURVEY.md §2.9 extension tier).  The standard
split for PCA at scale (the same physical shape Spark MLlib's
``computePrincipalComponents`` uses): the corpus-sized work is ONE
``mapInPandas`` pass emitting per-batch partial sums (Σx, Σxxᵀ, n) as
NumPy float64 — Arrow-batched, embarrassingly parallel, reduced by a tiny
aggregation — and the eigen-solve then runs on the d×d covariance matrix,
which scales with the embedding WIDTH squared (64² here), never with the
corpus.  Power iteration with a fixed deterministic start and iteration
count, so the result is reproducible bit-for-bit across runs and cluster
sizes (the partial sums are order-sensitive at the last ulp; the final
8-dp rounding absorbs that).

Rows-only driver check (eigen-solves aren't SQL); the component is pinned
against ``numpy.linalg.eigh`` in ``tests/test_pca.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..registry import register
from ..sources import load_table

POWER_ITERATIONS = 50


def covariance_parts(emb: DataFrame, dim: int) -> DataFrame:
    """Per-batch partial (n, Σx, vec(Σxxᵀ)) — the single corpus pass."""

    def parts(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            x = np.asarray(list(pdf["embedding"]), dtype=np.float64)
            if x.size == 0:
                continue
            yield pd.DataFrame(
                {
                    "n": [x.shape[0]],
                    "s": [x.sum(axis=0).tolist()],
                    "g": [(x.T @ x).ravel().tolist()],
                }
            )

    return emb.select("embedding").mapInPandas(
        parts, schema="n long, s array<double>, g array<double>"
    )


def top_component_with_diag(emb: DataFrame, dim: int, iterations: int = POWER_ITERATIONS):
    """(eigenvalue, eigenvector, trace, max diagonal entry) of the sample
    covariance's top component — THE solve; ``top_component`` delegates
    here (one body, so the hash-gated registered surface and the
    golden-pinned detail surface can never validate different solves —
    the r10 copy-paste split the round-10 advice flagged).

    One partial row per Arrow batch comes back to the driver and is
    numpy-summed there — executors×batches rows of d²+d floats, the classic
    treeAggregate endpoint, independent of corpus size.  (The declarative
    alternative — an agg of d²+d ``F.sum(element_at(...))`` expressions —
    measured 20× slower: four thousand aggregate expressions blow up
    codegen compile time.)"""
    import numpy as np

    rows = covariance_parts(emb, dim).collect()
    n = sum(r["n"] for r in rows)
    mean = np.sum([r["s"] for r in rows], axis=0) / n
    gram = np.sum([np.asarray(r["g"], dtype=np.float64) for r in rows], axis=0).reshape(dim, dim)
    cov = gram / n - np.outer(mean, mean)
    v = np.ones(dim) / np.sqrt(dim)  # deterministic start
    for _ in range(iterations):
        w = cov @ v
        v = w / np.linalg.norm(w)
    # canonical sign: first nonzero loading positive
    nz = np.nonzero(np.round(v, 12))[0]
    if nz.size and v[nz[0]] < 0:
        v = -v
    eigenvalue = float(v @ cov @ v)
    return eigenvalue, v, float(np.trace(cov)), float(cov.diagonal().max())


def top_component(emb: DataFrame, dim: int, iterations: int = POWER_ITERATIONS):
    """The long-standing 3-tuple API (eigenvalue, eigenvector, trace) —
    a view over ``top_component_with_diag`` kept for its pytest callers."""
    eigenvalue, v, trace, _ = top_component_with_diag(emb, dim, iterations)
    return eigenvalue, v, trace


def embedding_top_component_detail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the embedding cloud: one row per
    dimension with its loading, plus the shared explained-variance ratio.
    The 8-dp rounding makes the output stable across partitionings (float
    summation order differs; the eigenvector is conditioned far above
    1e-8).  The registered ``embedding_top_component`` wraps this in the
    eigen-bound summary; this surface keeps the ``numpy.linalg.eigh`` pin
    in ``test_drift_pca.py``."""
    emb = load_table(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").first()["embedding"])
    eigenvalue, v, trace = top_component(emb, dim)
    spark_rows = [
        (i, round(float(v[i]), 8), round(eigenvalue, 8), round(eigenvalue / trace, 8))
        for i in range(dim)
    ]
    return spark.createDataFrame(
        spark_rows, "dim int, loading double, eigenvalue double, explained_ratio double"
    )


_TOP_COMPONENT_BOUND_ORACLE = """
WITH d AS (SELECT len(embedding) AS w FROM embeddings LIMIT 1)
SELECT CAST(u.k AS INTEGER) AS dim,
       TRUE AS loadings_unit_norm,
       TRUE AS rayleigh_ge_max_dim_var,
       TRUE AS ratio_in_unit_interval
FROM d, UNNEST(range(d.w)) AS u(k)
"""


@register(
    "embedding_top_component",
    oracle=_TOP_COMPONENT_BOUND_ORACLE,
    tags=("datapipe", "embeddings", "iterative", "r4"),
)
def q_embedding_top_component(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered surface of the top-PC solve (round-10 oracle-ization):
    the DIMENSION universe is oracle-exact (one row per embedding
    dimension — a solve emitting the wrong width fails the hash), and
    three eigen-facts the power iteration must satisfy are computed
    driver-side and asserted TRUE by the twin: the eigenvector is unit
    norm, its Rayleigh quotient DOMINATES every single dimension's
    variance (λ₁ ≥ max_j cov_jj — the e_j Rayleigh bound; a mis-converged
    or mis-normalized iterate fails it, measured margin ≈ 1.5× at the
    test scales), and the explained-variance ratio lies in (0, 1].
    Loadings/eigenvalue stay on ``embedding_top_component_detail`` with
    the ``numpy.linalg.eigh`` replica pin.

    Plan: the same single corpus pass (``covariance_parts``); the bound
    arithmetic is dim×dim driver math."""
    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").first()["embedding"])
    eigenvalue, v, trace, max_diag = top_component_with_diag(emb, dim)
    unit = bool(abs(float(np.linalg.norm(v)) - 1.0) < 1e-9)
    rayleigh = bool(eigenvalue >= max_diag - 1e-12)
    ratio = eigenvalue / trace
    ratio_ok = bool(0.0 < ratio <= 1.0 + 1e-12)
    rows = [(i, unit, rayleigh, ratio_ok) for i in range(dim)]
    return spark.createDataFrame(
        rows,
        "dim int, loadings_unit_norm boolean, rayleigh_ge_max_dim_var boolean, "
        "ratio_in_unit_interval boolean",
    )
