"""Graph ranking over corpus-derived graphs: weighted PageRank on the term
co-occurrence graph (TextRank keyword extraction).

No reference counterpart (SURVEY.md §2.9 extension tier).  Complements the
connected-components / triangle operators in ``datapipe.cluster``: those
answer "which docs form duplicate clusters"; this ranks *terms* by graph
centrality — the TextRank formulation (Mihalcea & Tarau 2004) of PageRank
(Page et al. 1999) over an undirected co-occurrence graph.

Iterative, so no SQL oracle (rows-only driver check); the fixed-point math
is pinned against a pure-Python reference in ``tests/test_graphrank.py``.

100 TB story: the corpus-sized work is ONE doc×term containment pass
(explode + semi-join against a broadcast vocabulary) and ONE per-doc pair
expansion bounded by |vocab| — both hash-keyed shuffles.  The iteration then
runs on the |vocab|²-bounded edge table, which is tiny by construction
(vocabulary is capped), exactly how production PageRank separates the
edge-build pass from the solve.  Lineage is cut with ``localCheckpoint``
every few rounds (same pattern as ``cluster.connected_components``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import tokens_of
from ..registry import register
from .stage import staged_features

VOCAB_SIZE = 50
DAMPING = 0.85
ITERATIONS = 10
_CHECKPOINT_EVERY = 5


def doc_term_pairs(docs: DataFrame, vocab_size: int = VOCAB_SIZE) -> DataFrame:
    """Distinct (doc_id, term) containment pairs restricted to the top
    ``vocab_size`` terms by document frequency (ties broken by term).  The
    vocabulary is an aggregate-then-limit — small — and broadcast into the
    containment semi-join."""
    dt = docs.select(
        "doc_id", F.explode(F.array_distinct(tokens_of(docs))).alias("term")
    )
    vocab = (
        dt.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(vocab_size)
        .select("term")
    )
    return dt.join(F.broadcast(vocab), "term").select("doc_id", "term")


def cooccurrence_edges(dt: DataFrame) -> DataFrame:
    """Undirected weighted edges (a < b, weight = co-occurring doc count).
    Self-join keyed on doc_id; per-doc fan-out is bounded by |vocab|."""
    a = dt.alias("a")
    b = dt.alias("b")
    return (
        a.join(b, (F.col("a.doc_id") == F.col("b.doc_id")) & (F.col("a.term") < F.col("b.term")))
        .groupBy(F.col("a.term").alias("src"), F.col("b.term").alias("dst"))
        .agg(F.count(F.lit(1)).alias("weight"))
    )


def pagerank(edges: DataFrame, damping: float = DAMPING, iterations: int = ITERATIONS) -> DataFrame:
    """Weighted PageRank on an undirected edge list (src, dst, weight).

    rank_{t+1}(v) = (1-d)/N + d * Σ_{u~v} rank_t(u) · w_uv / W_u, with W_u
    the total incident weight at u.  Every step is expressed on DataFrames
    (directed expansion → join ranks → groupBy dst), so the solve itself
    distributes if the graph ever outgrows one node."""
    directed = edges.select("src", "dst", "weight").union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
    )
    out_w = directed.groupBy("src").agg(F.sum("weight").alias("w_total"))
    links = (
        directed.join(out_w, "src")
        .select("src", "dst", (F.col("weight") / F.col("w_total")).alias("share"))
        .localCheckpoint(eager=True)
    )
    nodes = links.select(F.col("src").alias("term")).distinct().localCheckpoint(eager=True)
    n = nodes.count()  # |vocab|-bounded: control-flow scalar, not corpus-sized
    ranks = nodes.select("term", F.lit(1.0 / n).alias("rank"))
    for it in range(1, iterations + 1):
        contrib = (
            links.join(ranks, links["src"] == ranks["term"])
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("share")).alias("inflow"))
        )
        ranks = nodes.join(contrib, nodes["term"] == contrib["dst"], "left").select(
            "term",
            (
                F.lit((1.0 - damping) / n)
                + F.lit(damping) * F.coalesce(F.col("inflow"), F.lit(0.0))
            ).alias("rank"),
        )
        if it % _CHECKPOINT_EVERY == 0:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


@register("textrank_keywords", oracle=None, tags=("datapipe", "graph", "iterative", "r4"))
def q_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 corpus keywords by TextRank centrality.  Rows-only driver
    check (iterative fixed point — not SQL-expressible); the solver is
    pinned against a pure-Python PageRank and analytic star-graph ranks in
    ``tests/test_graphrank.py``.  The containment pass reads the staged
    token frame (tokenize-once)."""
    docs = staged_features(spark, sf_dir)
    edges = cooccurrence_edges(doc_term_pairs(docs))
    return (
        pagerank(edges)
        .orderBy(F.desc("rank"), F.asc("term"))
        .limit(20)
    )
