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


# --- snapshot diff (change data capture) --------------------------------------

_DIFF_UPD_MOD = 17  # keys perturbed in the synthetic "old" snapshot
_DIFF_INS_MOD = 31  # keys absent from "old" → inserts in "new"
_DIFF_DEL_MOD = 29  # extra old-only keys (negated) → deletes

_SNAPSHOT_DIFF_ORACLE = f"""
WITH new AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders
), old AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         CASE WHEN o_orderkey % {_DIFF_UPD_MOD} = 0 THEN o_totalprice + 1 ELSE o_totalprice END AS o_totalprice
  FROM orders WHERE o_orderkey % {_DIFF_INS_MOD} <> 0
  UNION ALL
  SELECT -o_orderkey, o_custkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % {_DIFF_DEL_MOD} = 0
)
SELECT CASE WHEN o.o_orderkey IS NULL THEN 'I'
            WHEN n.o_orderkey IS NULL THEN 'D'
            ELSE 'U' END AS op,
       COALESCE(n.o_orderkey, o.o_orderkey) AS o_orderkey
FROM new n FULL OUTER JOIN old o ON n.o_orderkey = o.o_orderkey
WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
   OR NOT (n.o_custkey IS NOT DISTINCT FROM o.o_custkey
           AND n.o_orderstatus IS NOT DISTINCT FROM o.o_orderstatus
           AND n.o_totalprice IS NOT DISTINCT FROM o.o_totalprice)
"""


def snapshot_diff(new: DataFrame, old: DataFrame, key: str) -> DataFrame:
    """(op, key) change set between two snapshots sharing a schema:
    'I' = key only in ``new``, 'D' = only in ``old``, 'U' = present in both
    with any payload column differing (null-safe comparison — no hashing,
    no string formatting, so engine number-rendering can't leak in).

    The CDC primitive incremental pipelines derive deltas from when the
    source can't emit a change feed: one full-outer join keyed on the
    primary key; payload comparison is map-side.  Unchanged rows are
    dropped, so the output is |changes|-sized, not |table|-sized."""
    payload = [c for c in new.columns if c != key]
    n = new.alias("n")
    o = old.alias("o")
    same = F.lit(True)
    for c in payload:
        same = same & F.col(f"n.{c}").eqNullSafe(F.col(f"o.{c}"))
    nk, ok = F.col(f"n.{key}"), F.col(f"o.{key}")
    return (
        n.join(o, nk == ok, "full_outer")
        .filter(ok.isNull() | nk.isNull() | ~same)
        .select(
            F.when(ok.isNull(), "I").when(nk.isNull(), "D").otherwise("U").alias("op"),
            F.coalesce(nk, ok).alias(key),
        )
    )


@register("snapshot_diff_orders", oracle=_SNAPSHOT_DIFF_ORACLE, tags=("merge", "cdc"))
def q_snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff of orders against a deterministically-perturbed prior
    snapshot (every ``_DIFF_UPD_MOD``-th key's price bumped → 'U', every
    ``_DIFF_INS_MOD``-th key removed from old → 'I', negated copies of
    every ``_DIFF_DEL_MOD``-th key added to old → 'D') — proving all three
    change classes fire, differentially against the oracle."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    old = orders.filter(F.col("o_orderkey") % _DIFF_INS_MOD != 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % _DIFF_UPD_MOD == 0, F.col("o_totalprice") + 1
        ).otherwise(F.col("o_totalprice")),
    ).unionByName(
        orders.filter(F.col("o_orderkey") % _DIFF_DEL_MOD == 0).withColumn(
            "o_orderkey", -F.col("o_orderkey")
        )
    )
    return snapshot_diff(orders, old, "o_orderkey")


# --- incremental aggregate maintenance (IVM) --------------------------------

_IVM_ORACLE = """
SELECT o_custkey,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders
GROUP BY o_custkey
"""


def apply_agg_deltas(
    base_agg: DataFrame, new: DataFrame, old: DataFrame, key: str, group: str, money: str
) -> DataFrame:
    """Maintain ``group → (count, decimal sum)`` under a snapshot change
    without recomputing from the fact table.

    Change rows are found with one key-wise full-outer join (same shape as
    ``snapshot_diff``); each changed key contributes (+new payload) and/or
    (−old payload) to its group's delta; the |changes|-sized delta aggregate
    then full-outer-merges into the maintained aggregate.  Every sum flows
    through DECIMAL — addition is associative and exact, so the maintained
    result is BIT-IDENTICAL to a recompute, which is exactly what the
    DuckDB oracle does (it recomputes from the new snapshot; the Spark side
    never touches it).  Groups whose count reaches zero are dropped.

    100 TB story: the two corpus-sized inputs are joined once on the
    primary key (co-partitionable / bucketable); everything downstream is
    |changes|- or |groups|-sized.  This is the standard incremental-view-
    maintenance shape for distributive aggregates (COUNT/SUM; MIN/MAX would
    need per-group recompute on deletes)."""
    n = new.alias("n")
    o = old.alias("o")
    nk, ok = F.col(f"n.{key}"), F.col(f"o.{key}")
    payload = [c for c in new.columns if c != key]
    same = F.lit(True)
    for c in payload:
        same = same & F.col(f"n.{c}").eqNullSafe(F.col(f"o.{c}"))
    changed = n.join(o, nk == ok, "full_outer").filter(ok.isNull() | nk.isNull() | ~same)
    dec = "decimal(18,2)"
    plus = changed.filter(nk.isNotNull()).select(
        F.col(f"n.{group}").alias(group),
        F.col(f"n.{money}").cast(dec).alias("dm"),
        F.lit(1).alias("dn"),
    )
    minus = changed.filter(ok.isNotNull()).select(
        F.col(f"o.{group}").alias(group),
        (-F.col(f"o.{money}").cast(dec)).alias("dm"),
        F.lit(-1).alias("dn"),
    )
    deltas = (
        plus.unionByName(minus)
        .groupBy(group)
        .agg(F.sum("dm").alias("dm"), F.sum("dn").cast("bigint").alias("dn"))
    )
    b = base_agg.alias("b")
    d = deltas.alias("d")
    bg, dg = F.col(f"b.{group}"), F.col(f"d.{group}")
    zero = F.lit(0).cast(dec)
    return (
        b.join(d, bg == dg, "full_outer")
        .select(
            F.coalesce(bg, dg).alias(group),
            (F.coalesce(F.col("b.n_orders"), F.lit(0)) + F.coalesce(F.col("d.dn"), F.lit(0)))
            .cast("bigint")
            .alias("n_orders"),
            (F.coalesce(F.col("b.rev_dec"), zero) + F.coalesce(F.col("d.dm"), zero)).alias(
                "rev_dec"
            ),
        )
        .filter(F.col("n_orders") > 0)
    )


@register("rollup_apply_cdc", oracle=_IVM_ORACLE, tags=("merge", "cdc", "ivm", "r4"))
def q_rollup_apply_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally maintain the per-customer order rollup across the same
    synthetic snapshot change as ``snapshot_diff_orders``: the maintained
    aggregate starts from the OLD snapshot, the delta derived from the
    old→new diff is applied, and the result must bit-match the oracle's
    full recompute over the NEW snapshot — the differential proof that the
    incremental path loses nothing."""
    new = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    old = new.filter(F.col("o_orderkey") % _DIFF_INS_MOD != 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % _DIFF_UPD_MOD == 0, F.col("o_totalprice") + 1
        ).otherwise(F.col("o_totalprice")),
    ).unionByName(
        new.filter(F.col("o_orderkey") % _DIFF_DEL_MOD == 0).withColumn(
            "o_orderkey", -F.col("o_orderkey")
        )
    )
    base = old.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev_dec"),
    )
    out = apply_agg_deltas(base, new, old, "o_orderkey", "o_custkey", "o_totalprice")
    return out.select(
        "o_custkey", "n_orders", F.col("rev_dec").cast("double").alias("revenue")
    )


# --- right-to-be-forgotten cascade (decremental maintenance) -------------------

FORGET_MOD = 97  # user_id % 97 == 0 is the deletion request set

_FORGET_ORACLE = f"""
SELECT CAST(ts AS DATE) AS day, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS value_sum
FROM events
WHERE user_id % {FORGET_MOD} <> 0
GROUP BY 1, 2
"""


@register("forget_users_cascade", oracle=_FORGET_ORACLE, tags=("merge", "privacy", "ivm", "r10"))
def q_forget_users_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten cascade into derived aggregates, maintained
    DECREMENTALLY: given a deletion-request set (``user_id % {FORGET_MOD}
    == 0`` stands in for the GDPR/CCPA queue), the daily per-type rollup is
    corrected by SUBTRACTING only the deleted users' contributions from the
    standing aggregate — never re-scanning the surviving corpus — while the
    oracle recomputes from the filtered fact table, so the driver's hash
    check IS the differential proof that the cheap path equals the rebuild.

    This is the compliance shape at 100 TB: deletion sets are tiny relative
    to the corpus, so the erasure sweep touches (a) the fact rows of the
    deleted users (a broadcast-semi-join scan) and (b) |affected groups|
    delta rows — not the petabyte of everyone else's aggregates.  Exact
    DECIMAL sums make subtraction lossless (float sums would drift from the
    rebuild); groups whose count reaches zero drop out entirely, leaving no
    tombstone of the deleted users' existence."""
    ev = load_table(spark, sf_dir, "events")
    key = F.col("user_id") % FORGET_MOD == 0
    dec = "decimal(18,6)"
    base = ev.groupBy(F.to_date("ts").alias("day"), "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.col("value").cast(dec)).alias("v_dec"),
    )
    removed = ev.filter(key).groupBy(F.to_date("ts").alias("day"), "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("dn"),
        F.sum(F.col("value").cast(dec)).alias("dv"),
    )
    zero = F.lit(0).cast(dec)
    return (
        base.join(removed, ["day", "event_type"], "left")
        .select(
            "day",
            "event_type",
            (F.col("n_events") - F.coalesce(F.col("dn"), F.lit(0))).cast("long").alias("n_events"),
            (F.col("v_dec") - F.coalesce(F.col("dv"), zero)).cast("double").alias("value_sum"),
        )
        .filter(F.col("n_events") > 0)
    )
