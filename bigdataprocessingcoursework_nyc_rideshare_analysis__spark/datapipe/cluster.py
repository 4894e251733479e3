"""Duplicate-cluster resolution: connected components over near-dup pairs.

Pairwise near-dup detection (``datapipe.dedup``) yields *edges*; an actual
dedup pass needs *clusters* — near-duplication is not transitive (a~b and
b~c does not imply a~c), so chains must be collapsed into one group with one
canonical representative before dropping rows.  No reference counterpart
(the reference has no iterative algorithms at all; SURVEY.md §2.9) — this is
the engine-extension tier for LLM training-data curation.

Algorithm: iterative min-label propagation, the DataFrame-native form of
connected components (the same fixpoint GraphFrames/GraphX converge to).
Each iteration is one join + one min-aggregation — both shuffle on ``id``,
so at 100 TB consecutive iterations reuse the same hash partitioning and AQE
coalesces the tiny label-frontier exchanges.  ``localCheckpoint`` truncates
the lineage each round (without it the plan doubles per iteration and the
driver re-optimizes an exponentially growing tree).  Iterations are bounded
by the cluster diameter — near-dup clusters are shallow (a handful of hops),
not web-graph-deep; the alternating large-star/small-star variant (Kiveris
et al., "Connected Components in MapReduce") drops the bound to
O(log diameter) and is the documented upgrade path if clusters ever get deep.

The driver loop is *control flow only* (one scalar count per iteration —
the convergence test); all data stays distributed.

Oracle: DuckDB ``WITH RECURSIVE`` min-label reachability over the exact
Jaccard pair set — the textbook SQL formulation of the same fixpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table
from .dedup import _JACCARD_CTES, JACCARD_THRESHOLD, jaccard_pairs, shingle_sets


def connected_components(
    edges: DataFrame,
    vertices: DataFrame,
    max_iter: int = 25,
) -> DataFrame:
    """(id, label) with label = min vertex id reachable in the undirected
    graph; singletons keep their own id.

    ``edges``: (src, dst) one row per undirected edge (either orientation).
    ``vertices``: (id) — every node, including isolated ones.
    """
    sym = edges.select("src", "dst").union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    # the edge set is re-joined every iteration — materialize it once and cut
    # its lineage (at 100 TB: write to parquet bucketed by src instead)
    sym = sym.localCheckpoint(eager=True)
    # iterate ONLY over nodes that touch an edge: in a dedup workload the
    # duplicate-pair graph covers a small fraction of the corpus, so the
    # per-iteration join/agg runs on |edge-nodes| rows, not |corpus| rows —
    # isolated vertices are attached as singletons in one pass at the end
    labels = sym.select(F.col("src").alias("id")).distinct().select(
        "id", F.col("id").alias("label")
    )

    converged = False
    for _ in range(max_iter):
        neigh = (
            sym.join(labels.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("label").alias("nmin"))
        )
        merged = labels.join(neigh, "id", "left").localCheckpoint(eager=True)
        changed = merged.filter(F.col("nmin") < F.col("label")).limit(1).count()
        labels = merged.select(
            "id",
            F.when(F.col("nmin") < F.col("label"), F.col("nmin"))
            .otherwise(F.col("label"))
            .alias("label"),
        )
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(f"connected_components did not converge in {max_iter} iterations")
    return vertices.join(labels, "id", "left").select(
        "id", F.coalesce("label", F.col("id")).alias("label")
    )


_CC_ORACLE = f"""
WITH RECURSIVE {_JACCARD_CTES},
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM jpairs
  UNION ALL
  SELECT doc_b, doc_a FROM jpairs
),
reach(node, root) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.dst, r.root FROM reach r JOIN edges e ON e.src = r.node
),
assign AS (
  SELECT node AS doc_id, MIN(root) AS cluster_id FROM reach GROUP BY node
)
SELECT doc_id, cluster_id,
       COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size
FROM assign
"""


@register("neardup_connected_components", oracle=_CC_ORACLE, tags=("datapipe", "dedup", "iterative"))
def q_neardup_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collapse exact-Jaccard near-dup pairs into duplicate clusters: every
    document mapped to its component's min doc_id (the canonical survivor)
    plus the component size.  Downstream keeps ``doc_id == cluster_id`` rows
    (one representative per cluster) — the step that turns pair detection
    into an actual dedup of the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = jaccard_pairs(shingle_sets(docs).persist(), JACCARD_THRESHOLD)
    assign = connected_components(
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")),
        docs.select(F.col("doc_id").alias("id")),
    )
    from pyspark.sql import Window

    return assign.select(
        F.col("id").alias("doc_id"),
        F.col("label").alias("cluster_id"),
        F.count(F.lit(1)).over(Window.partitionBy("label")).alias("cluster_size"),
    )
