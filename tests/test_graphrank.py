"""Pins the TextRank solver: distributed weighted PageRank must match a
pure-Python fixed-point reference to ~1e-9, conserve probability mass, and
reproduce the analytic ranking on a star graph."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row

from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.datapipe.graphrank import (
    DAMPING,
    ITERATIONS,
    cooccurrence_edges,
    doc_term_pairs,
    pagerank,
)


def _reference_pagerank(edges, damping=DAMPING, iterations=ITERATIONS):
    """Plain-dict weighted PageRank, same update rule."""
    adj: dict[str, dict[str, float]] = {}
    for a, b, w in edges:
        adj.setdefault(a, {})[b] = adj.setdefault(a, {}).get(b, 0) + w
        adj.setdefault(b, {})[a] = adj.setdefault(b, {}).get(a, 0) + w
    nodes = sorted(adj)
    n = len(nodes)
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(iterations):
        out_w = {u: sum(adj[u].values()) for u in nodes}
        nxt = {}
        for v in nodes:
            inflow = sum(rank[u] * w / out_w[u] for u, nbrs in adj.items() for t, w in nbrs.items() if t == v)
            nxt[v] = (1 - damping) / n + damping * inflow
        rank = nxt
    return rank


def _run(spark, edges):
    df = spark.createDataFrame([Row(src=a, dst=b, weight=w) for a, b, w in edges])
    return {r["term"]: r["rank"] for r in pagerank(df).collect()}


def test_pagerank_matches_reference_on_weighted_graph(spark):
    edges = [
        ("a", "b", 3), ("a", "c", 1), ("b", "c", 2), ("c", "d", 5),
        ("d", "e", 1), ("b", "e", 4), ("a", "e", 2),
    ]
    got = _run(spark, edges)
    want = _reference_pagerank(edges)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9)
    assert math.isclose(sum(got.values()), 1.0, abs_tol=1e-9)


def test_pagerank_star_graph_center_dominates(spark):
    """K1,4 star: the hub must outrank every leaf, leaves tie exactly."""
    edges = [("hub", leaf, 1) for leaf in ("l1", "l2", "l3", "l4")]
    got = _run(spark, edges)
    leaves = [got[f"l{i}"] for i in range(1, 5)]
    assert got["hub"] > max(leaves)
    assert max(leaves) - min(leaves) < 1e-12


def test_textrank_edges_from_docs(spark):
    """Co-occurrence edges: distinct-doc counting (repeats inside one doc
    don't inflate weight), a<b canonical direction, vocab restriction."""
    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text="apple banana apple cherry"),
            Row(doc_id=1, text="apple banana"),
            Row(doc_id=2, text="zebra unique"),
        ]
    )
    dt = doc_term_pairs(docs, vocab_size=3)  # top-3 df: apple(2) banana(2) cherry/unique/zebra(1) → tie on term asc picks cherry
    edges = {(r["src"], r["dst"]): r["weight"] for r in cooccurrence_edges(dt).collect()}
    assert edges[("apple", "banana")] == 2  # both docs, repeat in doc 0 not double-counted
    assert edges[("apple", "cherry")] == 1
    assert ("banana", "apple") not in edges
    assert not any("zebra" in e for pair in edges for e in pair)
