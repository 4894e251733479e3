"""Graph ranking over corpus-derived graphs: weighted PageRank on the term
co-occurrence graph (TextRank keyword extraction).

No reference counterpart (SURVEY.md §2.9 extension tier).  Complements the
connected-components / triangle operators in ``datapipe.cluster``: those
answer "which docs form duplicate clusters"; this ranks *terms* by graph
centrality — the TextRank formulation (Mihalcea & Tarau 2004) of PageRank
(Page et al. 1999) over an undirected co-occurrence graph.

The fixed-point math is pinned against a pure-Python reference in
``tests/test_graphrank.py``.

100 TB story: the corpus-sized work is ONE doc×term containment pass
(explode + semi-join against a broadcast vocabulary) and ONE per-doc pair
expansion bounded by |vocab| — both hash-keyed shuffles.  The fixed point
then runs driver-side on the |vocab|²-bounded edge table, which is tiny by
construction (vocabulary is a capped constant), exactly how production
PageRank separates the edge-build pass from the solve — the same
model-sized driver-math shape as ``pca.top_component``.
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
    the total incident weight at u.

    The fixed point is solved DRIVER-SIDE over the collected edge list —
    the CC-fingerprint rule (collects may scale with the model, never the
    corpus) applies exactly: the edge table is ≤ |vocab|²/2 rows with
    |vocab| a compile-time constant ({VOCAB_SIZE}), so the collect is
    bounded at 1,225 rows at ANY corpus size — the corpus-sized work
    (containment pass, edge aggregation) stays distributed in the caller.
    The round-11 rewrite of a 10-iteration DataFrame join/groupBy loop
    whose every step was scheduling overhead on a ≤ 1,225-row frame
    (measured: ~3.5 s of the 4.3 s query; same dim×dim driver-math shape
    as ``pca.top_component``).  Same update rule and float64 arithmetic
    as the distributed form; summation order differs only within the
    1e-9 solver tolerance pinned in ``tests/test_graphrank.py`` (the
    goldens round ranks to 9 dp)."""
    import numpy as np

    rows = edges.select("src", "dst", "weight").collect()  # |vocab|²-bounded
    spark = edges.sparkSession
    if not rows:
        return spark.createDataFrame([], "term string, rank double")
    terms = sorted({r["src"] for r in rows} | {r["dst"] for r in rows})
    idx = {t: i for i, t in enumerate(terms)}
    n = len(terms)
    w = np.zeros((n, n), dtype=np.float64)
    for r in rows:
        i, j = idx[r["src"]], idx[r["dst"]]
        w[i, j] += float(r["weight"])
        w[j, i] += float(r["weight"])
    out_w = w.sum(axis=1)  # every term in the edge list has ≥ 1 edge
    share = w / out_w[:, None]  # share[u, v] = w_uv / W_u
    rank = np.full(n, 1.0 / n)
    for _ in range(iterations):
        rank = (1.0 - damping) / n + damping * (share.T @ rank)
    return spark.createDataFrame(
        [(t, float(rank[idx[t]])) for t in terms], "term string, rank double"
    )


TEXTRANK_TOP_K = 20


def textrank_keywords_detail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{TEXTRANK_TOP_K} corpus keywords by TextRank centrality — the
    (term, rank) surface the goldens pin; the solver is additionally
    pinned against a pure-Python PageRank and analytic star-graph ranks in
    ``tests/test_graphrank.py``.  The containment pass reads the staged
    token frame (tokenize-once).  The registered ``textrank_keywords``
    wraps this in the graph-structure bound summary.

    The containment pass runs exactly once: ``pagerank`` collects the
    |vocab|²-bounded edge table for its driver-side solve, the only
    consumer here (the old DataFrame solver UNIONed the edge subtree
    with its swap, which needed an explicit checkpoint)."""
    docs = staged_features(spark, sf_dir)
    edges = cooccurrence_edges(doc_term_pairs(docs))
    return (
        pagerank(edges)
        .orderBy(F.desc("rank"), F.asc("term"))
        .limit(TEXTRANK_TOP_K)
    )


#: DuckDB twin for the registered summary: the graph's NODE COUNT is
#: SQL-recomputable (top-|vocab|-df terms that co-occur with another
#: vocab term in some document), so n_keywords = least(k, |nodes|) is an
#: exact column; the PageRank-dependent facts are Spark-computed booleans
#: the twin asserts TRUE.
_TEXTRANK_BOUND_ORACLE = f"""
WITH t AS (
  SELECT doc_id, string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS toks
  FROM documents
), dt AS (
  SELECT DISTINCT doc_id, tok AS term FROM t, UNNEST(toks) AS u(tok)
), vocab AS (
  SELECT term FROM dt GROUP BY term ORDER BY COUNT(*) DESC, term LIMIT {VOCAB_SIZE}
), vdt AS (
  SELECT dt.doc_id, dt.term FROM dt JOIN vocab USING (term)
), nodes AS (
  SELECT DISTINCT a.term
  FROM vdt a JOIN vdt b ON a.doc_id = b.doc_id AND a.term <> b.term
)
SELECT CAST(LEAST({TEXTRANK_TOP_K}, COUNT(*)) AS BIGINT) AS n_keywords,
       TRUE AS all_terms_are_graph_nodes,
       TRUE AS ranks_in_range,
       TRUE AS ranks_sum_le_one
FROM nodes
"""


@register(
    "textrank_keywords",
    oracle=_TEXTRANK_BOUND_ORACLE,
    tags=("datapipe", "graph", "iterative", "r4"),
)
def q_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered surface of the TextRank tier (round-10 oracle-ization):
    the iterative fixed point itself has no SQL form, but the GRAPH it
    runs on does — the DuckDB twin recomputes the co-occurrence node
    universe (top-{VOCAB_SIZE}-df terms with at least one in-document
    vocab partner) and checks n_keywords = least({TEXTRANK_TOP_K},
    |nodes|) exactly, alongside three Spark-computed booleans it asserts
    TRUE: every emitted keyword is a graph node, every rank lies in
    (0, 1), and the top-k rank mass is ≤ 1 (the full fixed point sums to
    1 up to float fold noise).  A vocabulary/edge-construction bug — the
    corpus-sized half of the operator — now fails the driver's hash gate;
    the solver numerics stay pinned by the detail goldens and the
    pure-Python replica.

    Plan: one containment pass + the |vocab|²-bounded driver solve (same
    as the detail — the summary legs are |vocab|-sized)."""
    docs = staged_features(spark, sf_dir)
    dt = doc_term_pairs(docs)
    # localCheckpoint: `edges` (≤ |vocab|²/2 rows) feeds pagerank's
    # driver-side collect AND the node-universe leg.  Without the pin the
    # corpus containment pass — the only corpus-sized work here —
    # re-executes once per leg (measured: 12.7 s vs the 5.5 s single-pass
    # detail in the r10 driver bench).  `top` needs no pin since round
    # 11: pagerank returns a LocalRelation, so both its consumers re-run
    # only a 50-row local sort.
    edges = cooccurrence_edges(dt).localCheckpoint(eager=True)
    top = (
        pagerank(edges)
        .orderBy(F.desc("rank"), F.asc("term"))
        .limit(TEXTRANK_TOP_K)
    )
    nodes = (
        edges.select(F.col("src").alias("term"))
        .union(edges.select(F.col("dst").alias("term")))
        .distinct()
    )
    non_nodes = top.join(nodes, "term", "left_anti").agg(
        F.count(F.lit(1)).cast("long").alias("n_non_nodes")
    )
    stats = top.agg(
        F.count(F.lit(1)).cast("long").alias("n_keywords"),
        F.min("rank").alias("min_rank"),
        F.max("rank").alias("max_rank"),
        F.sum("rank").alias("rank_mass"),
    )
    return stats.crossJoin(F.broadcast(non_nodes)).select(
        "n_keywords",
        (F.col("n_non_nodes") == 0).alias("all_terms_are_graph_nodes"),
        ((F.col("min_rank") > 0) & (F.col("max_rank") < 1)).alias("ranks_in_range"),
        (F.col("rank_mass") <= 1.0 + 1e-9).alias("ranks_sum_le_one"),
    )
