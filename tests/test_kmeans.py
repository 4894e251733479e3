"""Pins distributed Lloyd's k-means: exact blob recovery on separated
clusters, agreement with a pure-numpy Lloyd's using the same deterministic
initialization, and the empty-cluster guard."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import Row

from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.datapipe.kmeans import kmeans_fit


def _df(spark, vecs):
    return spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in v], label="x") for i, v in enumerate(vecs)]
    )


def _numpy_lloyd(vecs, ids, k, iters):
    x = np.asarray(vecs, dtype=np.float64)
    order = sorted(range(len(ids)), key=lambda i: (hashlib.md5(str(ids[i]).encode()).hexdigest(), ids[i]))
    centroids = x[order[:k]].copy()
    for _ in range(iters):
        scores = x @ centroids.T - 0.5 * (centroids * centroids).sum(axis=1)
        best = np.argmax(scores, axis=1)
        for c in range(k):
            m = x[best == c]
            if len(m):
                centroids[c] = m.mean(axis=0)
    scores = x @ centroids.T - 0.5 * (centroids * centroids).sum(axis=1)
    return centroids, np.argmax(scores, axis=1)


def test_kmeans_recovers_separated_blobs(spark):
    rng = np.random.RandomState(11)
    blobs = [np.array([10.0, 0.0]), np.array([-10.0, 0.0]), np.array([0.0, 10.0])]
    vecs, truth = [], []
    for b, center in enumerate(blobs):
        for _ in range(30):
            vecs.append(center + rng.randn(2) * 0.3)
            truth.append(b)
    cents, assigned = kmeans_fit(_df(spark, vecs), k=3, iters=8)
    got = {r["vec_id"]: r["cluster"] for r in assigned.collect()}
    # every blob maps to exactly one cluster and vice versa
    mapping = {}
    for i, b in enumerate(truth):
        mapping.setdefault(b, set()).add(got[i])
    assert all(len(cl) == 1 for cl in mapping.values())
    assert len({next(iter(cl)) for cl in mapping.values()}) == 3
    # centroids sit on the blob means
    for b, center in enumerate(blobs):
        c = next(iter(mapping[b]))
        assert np.allclose(cents[c], np.mean([v for v, t in zip(vecs, truth) if t == b], axis=0), atol=1e-9)
    # dist2 is the squared distance to the assigned centroid
    row = assigned.orderBy("vec_id").first()
    assert row["dist2"] == pytest.approx(float(((vecs[0] - cents[got[0]]) ** 2).sum()), rel=1e-9)


def test_kmeans_matches_numpy_reference(spark):
    rng = np.random.RandomState(5)
    vecs = rng.randn(120, 4)
    cents, assigned = kmeans_fit(_df(spark, vecs), k=4, iters=5)
    ref_cents, ref_assign = _numpy_lloyd(vecs, list(range(len(vecs))), k=4, iters=5)
    got = {r["vec_id"]: r["cluster"] for r in assigned.collect()}
    assert np.allclose(cents, ref_cents, atol=1e-8)
    assert all(got[i] == ref_assign[i] for i in range(len(vecs)))
