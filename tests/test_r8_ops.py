"""Round-8-tier operator pins: BM25 retrieval, DSIR importance weights,
and CUPED adjustment, each against a brute-force
pure-Python/pandas reference over the sf0.001 smoke tables, with
non-vacuity assertions that the interesting paths (multi-term matches,
non-trivial theta) actually occur in the smoke data."""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter

import pandas as pd

from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.datapipe.mixture import (
    DSIR_ALPHA,
    DSIR_BUCKETS,
    DSIR_TARGET_SOURCES,
    q_dsir_importance_weights,
)
from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.datapipe.textstats import (
    BM25_B,
    BM25_K1,
    BM25_TOP_K,
    RRF_QUERY_TERMS,
    q_bm25_topk_docs,
)
from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.operators.behavior import (
    CUPED_SPLIT,
    q_ab_test_cuped_value,
)

from tests.conftest import SF_SMOKE


def _tokens(text: str) -> list[str]:
    return re.sub(r"\s+", " ", text.strip().lower()).split(" ")


# --- BM25 ---------------------------------------------------------------------


def _py_bm25() -> list[tuple[int, int, int, float]]:
    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    toks = {r.doc_id: _tokens(r.text) for _, r in docs.iterrows()}
    n_docs = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n_docs
    tf = {d: Counter(t for t in ts if t in RRF_QUERY_TERMS) for d, ts in toks.items()}
    df = Counter(t for c in tf.values() for t in c)
    out = []
    for d, c in tf.items():
        if not c:
            continue
        dl = len(toks[d])
        score = sum(
            math.log(1 + (n_docs - df[t] + 0.5) / (df[t] + 0.5))
            * f * (BM25_K1 + 1) / (f + BM25_K1 * (1 - BM25_B + BM25_B * dl / avgdl))
            for t, f in c.items()
        )
        out.append((d, len(c), dl, round(score, 9)))
    out.sort(key=lambda r: (-r[3], r[0]))
    return out[:BM25_TOP_K]


def test_bm25_matches_python_reference(spark):
    expected = _py_bm25()
    got = [
        (r.doc_id, r.matched_terms, r.dl, r.bm25)
        for r in q_bm25_topk_docs(spark, SF_SMOKE).collect()
    ]
    assert [g[:3] for g in got] == [e[:3] for e in expected]
    for g, e in zip(got, expected):
        assert abs(g[3] - e[3]) < 1e-8
    # non-vacuous: the ranking actually exercises multi-term accumulation
    assert any(m >= 2 for _, m, _, _ in got)
    # BM25 orders the list: scores non-increasing
    scores = [g[3] for g in got]
    assert scores == sorted(scores, reverse=True)


# --- DSIR ---------------------------------------------------------------------


def _py_dsir() -> dict[int, tuple[str, int, float]]:
    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    bucket_of = lambda t: hashlib.md5(t.encode()).hexdigest()[:2]
    per_doc: dict[int, tuple[str, Counter]] = {}
    raw: Counter = Counter()
    tgt: Counter = Counter()
    for _, r in docs.iterrows():
        c = Counter(bucket_of(t) for t in _tokens(r.text))
        per_doc[r.doc_id] = (r.source, c)
        raw.update(c)
        if r.source in DSIR_TARGET_SOURCES:
            tgt.update(c)
    rn, tn = sum(raw.values()), sum(tgt.values())
    out = {}
    for d, (src, c) in per_doc.items():
        w = sum(
            k
            * (
                math.log((tgt.get(b, 0) + DSIR_ALPHA) / (tn + DSIR_ALPHA * DSIR_BUCKETS))
                - math.log((raw[b] + DSIR_ALPHA) / (rn + DSIR_ALPHA * DSIR_BUCKETS))
            )
            for b, k in c.items()
        )
        out[d] = (src, sum(c.values()), w)
    return out


def test_dsir_matches_python_reference(spark):
    expected = _py_dsir()
    rows = q_dsir_importance_weights(spark, SF_SMOKE).collect()
    assert len(rows) == len(expected)
    for r in rows:
        src, n, w = expected[r.doc_id]
        assert r.source == src and r.n_toks == n
        assert abs(r.dsir_logweight - w) < 1e-7
    # non-vacuous: target docs should on average score higher than non-target
    by_target = {True: [], False: []}
    for r in rows:
        by_target[r.source in DSIR_TARGET_SOURCES].append(r.dsir_logweight)
    assert sum(by_target[True]) / len(by_target[True]) > sum(by_target[False]) / len(
        by_target[False]
    )


# --- CUPED --------------------------------------------------------------------


def _py_cuped() -> dict[str, tuple[int, float, float, float]]:
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    split = pd.Timestamp(CUPED_SPLIT)
    per = ev.groupby("user_id").apply(
        lambda g: pd.Series(
            {
                "x": g.loc[g.ts < split, "value"].sum(),
                "y": g.loc[g.ts >= split, "value"].sum(),
            }
        ),
        include_groups=False,
    )
    variants = {
        u: "A" if int(hashlib.md5(str(u).encode()).hexdigest()[0], 16) < 8 else "B"
        for u in per.index
    }
    per["variant"] = [variants[u] for u in per.index]
    n = len(per)
    varx = per.x.var(ddof=0)
    theta = 0.0 if varx == 0 else per.x.cov(per.y, ddof=0) / varx
    gx = per.x.mean()
    out = {}
    for v, g in per.groupby("variant"):
        out[v] = (len(g), g.y.mean(), theta, g.y.mean() - theta * (g.x.mean() - gx))
    return out


def test_cuped_matches_python_reference(spark):
    expected = _py_cuped()
    rows = {r.variant: r for r in q_ab_test_cuped_value(spark, SF_SMOKE).collect()}
    assert set(rows) == set(expected)
    for v, (n, my, th, adj) in expected.items():
        r = rows[v]
        assert r.n_users == n
        assert abs(r.mean_y - my) < 1e-5
        assert abs(r.theta - th) < 1e-5
        assert abs(r.mean_y_cuped - adj) < 1e-5
    # non-vacuous: a real covariate relationship exists in the smoke data
    assert abs(next(iter(rows.values())).theta) > 1e-6
