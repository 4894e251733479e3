"""CDC-style MERGE (SCD-1 upsert) and table profiling — warehouse
maintenance operators the reference lacks entirely (its pipeline is
read-only analytics; SURVEY.md §2.1 lists only scans and CSV sinks).

Vanilla Spark has no ``MERGE INTO`` against parquet (that's a table-format
feature — Delta/Iceberg); the engine-level primitive underneath every such
implementation is the same: full-outer join of target and changes on the
key, change side wins per column.  Expressed declaratively, the join
shuffles both sides once on the key; at 100 TB you bucket the target by the
merge key at write time so only the (much smaller) change set shuffles, and
write back partition-overwrite-dynamic so untouched partitions aren't
rewritten.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table


def merge_upsert(target: DataFrame, changes: DataFrame, key: str) -> DataFrame:
    """SCD-1 merge: rows in ``changes`` update matching ``target`` rows
    column-by-column (change value wins when non-null) and insert when the
    key is new.  Schema = target schema; change-only columns must exist in
    the target."""
    t = target.alias("t")
    c = changes.alias("c")
    out_cols = []
    for col in target.columns:
        if col == key:
            out_cols.append(F.coalesce(F.col(f"c.{key}"), F.col(f"t.{key}")).alias(key))
        elif col in changes.columns:
            out_cols.append(F.coalesce(F.col(f"c.{col}"), F.col(f"t.{col}")).alias(col))
        else:
            out_cols.append(F.col(f"t.{col}").alias(col))
    return t.join(c, F.col(f"t.{key}") == F.col(f"c.{key}"), "full_outer").select(*out_cols)


# deterministic change set derived from the customer table itself: every
# 10th key gets a segment update; shifted keys are brand-new inserts
_MERGE_ORACLE = """
WITH changes AS (
  SELECT c_custkey, 'UPDATED' AS c_mktsegment FROM customer WHERE c_custkey % 10 = 0
  UNION ALL
  SELECT c_custkey + 10000000, 'INSERTED' AS c_mktsegment
  FROM customer WHERE c_custkey % 100 = 0
)
SELECT COALESCE(c.c_custkey, t.c_custkey) AS c_custkey,
       t.c_name AS c_name,
       COALESCE(c.c_mktsegment, t.c_mktsegment) AS c_mktsegment
FROM customer t FULL OUTER JOIN changes c ON t.c_custkey = c.c_custkey
"""


@register("customer_merge_upsert", oracle=_MERGE_ORACLE, tags=("merge", "join"))
def q_customer_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE of a deterministic change set into the customer dim: segment
    updates for every 10th key, inserts under shifted keys.  Inserted rows
    carry null for columns the change set doesn't provide (c_name) —
    the same sparse-row semantics ``MERGE INTO`` produces."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    updates = (
        cust.filter(F.col("c_custkey") % 10 == 0)
        .select("c_custkey", F.lit("UPDATED").alias("c_mktsegment"))
    )
    inserts = (
        cust.filter(F.col("c_custkey") % 100 == 0)
        .select(
            (F.col("c_custkey") + 10000000).alias("c_custkey"),
            F.lit("INSERTED").alias("c_mktsegment"),
        )
    )
    return merge_upsert(cust, updates.union(inserts), key="c_custkey")


_PROFILE_ORACLE = """
SELECT 'o_custkey' AS column_name,
       COUNT(*) AS n_rows,
       COUNT(o_custkey) AS n_nonnull,
       COUNT(DISTINCT o_custkey) AS n_distinct
FROM orders
UNION ALL
SELECT 'o_orderstatus', COUNT(*), COUNT(o_orderstatus), COUNT(DISTINCT o_orderstatus)
FROM orders
UNION ALL
SELECT 'o_orderpriority', COUNT(*), COUNT(o_orderpriority), COUNT(DISTINCT o_orderpriority)
FROM orders
"""


@register("orders_column_profile", oracle=_PROFILE_ORACLE, tags=("profile", "agg"))
def q_orders_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality profile (row/non-null/distinct counts per column) — the
    ingestion-gate health check run before a snapshot is admitted to the
    corpus.  One pass per profiled column here for oracle clarity; the
    single-pass form aggregates ``count(col)`` for all columns together
    and pairs each with ``approx_count_distinct`` when exact NDV isn't
    required (exact distinct per column forces its own shuffle)."""
    orders = load_table(spark, sf_dir, "orders")
    parts = []
    for col in ("o_custkey", "o_orderstatus", "o_orderpriority"):
        parts.append(
            orders.agg(
                F.lit(col).alias("column_name"),
                F.count(F.lit(1)).alias("n_rows"),
                F.count(col).alias("n_nonnull"),
                F.countDistinct(col).alias("n_distinct"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out
