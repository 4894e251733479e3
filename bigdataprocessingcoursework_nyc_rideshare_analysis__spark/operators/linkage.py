"""Fuzzy record linkage: edit-distance-bounded entity pair detection via
deletion-neighborhood blocking (the SymSpell scheme).

No reference counterpart (SURVEY.md §2.9 extension tier).  The classic
scale problem: find all pairs of names within Levenshtein distance 1
without the O(n²) cross join.  The published SymSpell observation: if
``lev(a, b) <= 1`` then the sets ``{a} ∪ deletes1(a)`` and
``{b} ∪ deletes1(b)`` intersect — a substitution pair shares the deletion
at the edited position, an insert/delete pair shares the shorter string
itself.  So the plan is: explode each name into its ``len+1`` variants,
hash-join on the variant, then verify the bounded candidate set with an
exact ``levenshtein`` call.  Completely shuffle-keyed on the variant
string; candidate buckets stay tiny unless the data is pathologically
uniform, and the verify step removes any false positives the blocking
admits (distance-2 pairs can collide on a variant).

At 100 TB the variant explosion is a constant factor (name length + 1) on
the *entity* table — dimension-sized, not fact-sized — and the join never
materializes non-candidate pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table

#: ``array_distinct`` matters: deleting any character of an equal-character
#: run yields the SAME variant (think digit runs like ``000000``), and
#: duplicate variants inflate each join bucket quadratically.
_DELETES_SQL = (
    "array_distinct(transform(sequence(0, length({c})), i -> "
    "IF(i = 0, {c}, concat(substring({c}, 1, i-1), substring({c}, i+1)))))"
)

_FUZZY_ORACLE = """
WITH v AS (
  SELECT c_custkey, c_name, unnest(list_distinct(list_transform(range(0, length(c_name) + 1),
           i -> CASE WHEN i = 0 THEN c_name
                     ELSE substr(c_name, 1, i-1) || substr(c_name, i+1) END))) AS variant
  FROM customer
), cand AS (
  SELECT DISTINCT a.c_custkey AS custkey_a, a.c_name AS name_a,
                  b.c_custkey AS custkey_b, b.c_name AS name_b
  FROM v a JOIN v b ON a.variant = b.variant AND a.c_name < b.c_name
)
SELECT custkey_a, name_a, custkey_b, name_b,
       levenshtein(name_a, name_b) AS dist
FROM cand
WHERE levenshtein(name_a, name_b) <= 1
"""


def deletion_variants(df: DataFrame, col: str) -> DataFrame:
    """Explode each string into itself plus every single-character
    deletion — the distance-1 neighborhood key set."""
    return df.select(
        "*", F.explode(F.expr(_DELETES_SQL.format(c=col))).alias("variant")
    )


def fuzzy_pairs(df: DataFrame, key: str, name: str, max_dist: int = 1) -> DataFrame:
    """All (a < b) pairs with ``levenshtein <= max_dist`` (supported:
    ``max_dist=1``) via deletion-neighborhood blocking + exact verify.

    The probe side is explicitly spread to the session's default
    parallelism first: the verify stage (explode x ~|name| variants, then
    candidate join + thresholded levenshtein) is CPU-bound, and when the
    dim-sized input arrives as ONE parquet split with the other side
    broadcast, the whole pipeline runs in a single task (measured 4.1 s ->
    0.6 s at sf0.1 from this repartition alone).  The explicit partition
    count keeps AQE from size-coalescing the tiny-but-hot rows back into
    one partition — byte-based coalescing is wrong for compute-bound
    stages."""
    spread = df.select(key, name).repartition(
        df.sparkSession.sparkContext.defaultParallelism, F.col(key)
    )
    v = deletion_variants(spread, name)
    a = v.select(
        F.col(key).alias("custkey_a"), F.col(name).alias("name_a"), "variant"
    )
    b = v.select(
        F.col(key).alias("custkey_b"), F.col(name).alias("name_b"), "variant"
    )
    # thresholded levenshtein early-exits the DP once the bound is blown
    # (returns -1 past the threshold, hence between, not <=) — measured
    # ~25% off the verify stage on dense candidate sets
    dist = F.levenshtein("name_a", "name_b", max_dist)
    return (
        a.join(b, ["variant"])
        .filter((F.col("name_a") < F.col("name_b")) & dist.between(0, max_dist))
        .drop("variant")
        .distinct()
        .withColumn("dist", dist)
    )


@register("fuzzy_customer_pairs", oracle=_FUZZY_ORACLE, tags=("linkage", "join", "r4"))
def q_fuzzy_customer_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer names within edit distance 1 of each other — the
    dedup-candidate report a master-data pipeline runs before merging
    entities."""
    return fuzzy_pairs(load_table(spark, sf_dir, "customer"), "c_custkey", "c_name")


ER_SAMPLE_MOD = 7  # deterministic key sample keeps the oracle's reachability
                   # fixpoint tractable (the dense synthetic name graph forms
                   # one giant component on the full keyspace, and a recursive
                   # CTE's reach table is quadratic in component size; the
                   # Spark CC side has no such limit)

_IDENTITY_CLUSTER_ORACLE = """
WITH RECURSIVE base AS MATERIALIZED (
  SELECT c_custkey, c_name FROM customer WHERE c_custkey % 7 = 0
), v AS MATERIALIZED (
  SELECT c_custkey, c_name, unnest(list_distinct(list_transform(range(0, length(c_name) + 1),
           i -> CASE WHEN i = 0 THEN c_name
                     ELSE substr(c_name, 1, i-1) || substr(c_name, i+1) END))) AS variant
  FROM base
), cand AS MATERIALIZED (
  SELECT DISTINCT a.c_custkey AS custkey_a, b.c_custkey AS custkey_b
  FROM v a JOIN v b ON a.variant = b.variant AND a.c_name < b.c_name
  WHERE levenshtein(a.c_name, b.c_name) <= 1
), edges AS MATERIALIZED (
  SELECT custkey_a AS src, custkey_b AS dst FROM cand
  UNION ALL
  SELECT custkey_b, custkey_a FROM cand
), reach(node, root) AS (
  SELECT c_custkey, c_custkey FROM base
  UNION
  SELECT e.dst, r.root FROM reach r JOIN edges e ON e.src = r.node
), assign AS (
  SELECT node AS custkey, MIN(root) AS cluster_id FROM reach GROUP BY 1
)
SELECT custkey, cluster_id,
       COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size
FROM assign
"""


@register("customer_identity_clusters", oracle=_IDENTITY_CLUSTER_ORACLE, tags=("linkage", "graph", "r5"))
def q_customer_identity_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution end-to-end: the fuzzy name-match pairs collapsed
    into identity clusters by the SAME large-star/small-star connected
    components that clusters document near-dups — linkage finds candidate
    merges pairwise, but a master-data merge needs the TRANSITIVE entity
    ("A≈B, B≈C ⇒ one customer"), and this composition proves the CC
    operator is generic over any edge source.  Every sampled customer
    appears, labeled by its cluster's min custkey; singletons are their
    own cluster.

    Domain is the deterministic ``c_custkey % {ER_SAMPLE_MOD}`` sample —
    an ORACLE-tractability bound, not an engine one: the synthetic names
    form one giant edit-distance component on the full keyspace, and the
    recursive-CTE reachability table the oracle relies on is quadratic in
    component size (Spark's large-star/small-star CC is O(log diameter)
    and handles the full graph fine — exactly the asymmetry that motivates
    the distributed algorithm).  The oracle covers the identical
    SymSpell-blocked + Levenshtein-verified pair set, so the whole pipeline
    (blocking → verify → transitive closure) is differentially checked as
    one unit."""
    from pyspark.sql import Window

    from ..datapipe.cluster import connected_components

    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_custkey") % ER_SAMPLE_MOD == 0
    )
    pairs = fuzzy_pairs(cust, "c_custkey", "c_name")
    assign = connected_components(
        pairs.select(F.col("custkey_a").alias("src"), F.col("custkey_b").alias("dst")),
        cust.select(F.col("c_custkey").alias("id")),
    )
    return assign.select(
        F.col("id").alias("custkey"),
        F.col("label").alias("cluster_id"),
        F.count(F.lit(1)).over(Window.partitionBy("label")).alias("cluster_size"),
    )
