"""Unit semantics for the drift statistics and the distributed PCA
component (registered-query parity lives in ``test_oracle_parity`` for the
oracle-backed pair; PCA is pinned against numpy here)."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import Row

from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.datapipe.pca import (
    top_component,
)
from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.operators.drift import (
    ks_statistic,
)


def _ev(spark, rows):
    base = dt.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [
            Row(event_id=i, ts=base, user_id=1, event_type=t, value=float(v), props="{}")
            for i, (t, v) in enumerate(rows)
        ]
    )


def test_ks_zero_for_identical_one_for_disjoint(spark):
    same = _ev(spark, [("a", v) for v in (1, 2, 3)] + [("b", v) for v in (1, 2, 3)])
    d0 = ks_statistic(same, "value", "event_type", "a", "b").collect()[0]["ks_distance"]
    assert d0 == pytest.approx(0.0, abs=1e-12)

    disjoint = _ev(spark, [("a", v) for v in (1, 2)] + [("b", v) for v in (10, 20)])
    d1 = ks_statistic(disjoint, "value", "event_type", "a", "b").collect()[0]["ks_distance"]
    assert d1 == pytest.approx(1.0, abs=1e-12)


def test_ks_known_half_shift(spark):
    # A = {1,2,3,4}, B = {3,4,5,6}: max CDF gap is 0.5 (at value 2)
    ev = _ev(spark, [("a", v) for v in (1, 2, 3, 4)] + [("b", v) for v in (3, 4, 5, 6)])
    d = ks_statistic(ev, "value", "event_type", "a", "b").collect()[0]["ks_distance"]
    assert d == pytest.approx(0.5, abs=1e-12)


def test_top_component_matches_numpy_eigh(spark):
    rng = np.random.RandomState(7)
    # anisotropic cloud: dominant direction along (1,1,0)/sqrt(2)
    base = rng.randn(300, 3) * np.array([0.2, 0.2, 0.1])
    base[:, 0] += base[:, 1] * 3
    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in row], label="x") for i, row in enumerate(base)]
    )
    eigval, v, trace = top_component(df, 3)
    cov = np.cov(base.T, bias=True)
    w_np, v_np = np.linalg.eigh(cov)
    top = v_np[:, -1]
    if top[np.nonzero(np.round(top, 12))[0][0]] < 0:
        top = -top
    assert eigval == pytest.approx(w_np[-1], rel=1e-9)
    assert np.allclose(v, top, atol=1e-6)
    assert trace == pytest.approx(np.trace(cov), rel=1e-9)


def test_top_component_partition_invariant(spark):
    rng = np.random.RandomState(3)
    data = rng.randn(200, 4)
    rows = [Row(vec_id=i, embedding=[float(x) for x in r], label="x") for i, r in enumerate(data)]
    one = top_component(spark.createDataFrame(rows).coalesce(1), 4)
    many = top_component(spark.createDataFrame(rows).repartition(8), 4)
    assert one[0] == pytest.approx(many[0], rel=1e-9)
    assert np.allclose(one[1], many[1], atol=1e-9)
