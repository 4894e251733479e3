"""Top-K operators — reference task 3 (``codes/task3.py:74-118``).

Three shapes:
- dense_rank top-5 boroughs per month, pickup side (``task3.py:80-89``)
- the same window spec reused on the dropoff side (``task3.py:93-105``)
- top-30 routes by total revenue via global sort+limit (``task3.py:109-118``)

dense_rank (not row_number) is load-bearing: ties keep *more* than K rows per
group, and the golden outputs rely on it (SURVEY.md §2.5 W1).

Scale strategy (100 TB):
- The window ranks *post-aggregation* data (|boroughs|×|months| rows), so the
  expensive part is the count aggregation — partial-agg collapses it map-side;
  the window itself shuffles only the tiny aggregate.  Never window the raw
  fact.
- ``orderBy(desc).limit(K)`` plans as ``TakeOrderedAndProject`` — per-partition
  top-K then a driver merge of K×partitions rows; no global sort is ever
  materialized.  A deterministic tiebreaker column makes the result stable
  under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.scalar import money_sum, route_label
from ..registry import register
from ..sources import load_tables

# Generic core ---------------------------------------------------------------


def top_k_per_group(
    df: DataFrame,
    partition_cols: list[str],
    order_col: str,
    k: int,
    descending: bool = True,
    keep_rank: bool = False,
) -> DataFrame:
    """dense_rank-within-group top-K (``codes/task3.py:80-86``): rank rows in
    each partition, keep rank ≤ k, drop the rank column (unless asked)."""
    order = F.desc(order_col) if descending else F.asc(order_col)
    w = Window.partitionBy(*partition_cols).orderBy(order)
    ranked = df.withColumn("rank", F.dense_rank().over(w)).filter(F.col("rank") <= k)
    return ranked if keep_rank else ranked.drop("rank")


def top_k_global(df: DataFrame, order_cols: list[Column], k: int) -> DataFrame:
    """Global top-K: ``orderBy(...).limit(k)`` → TakeOrderedAndProject
    (``codes/task3.py:115``).  Callers pass a tiebreaker as the last sort key
    so results are deterministic under ties."""
    return df.orderBy(*order_cols).limit(k)


# Star-schema queries --------------------------------------------------------


def _borough_month_counts(spark: SparkSession, sf_dir: str, side: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "lineitem", "orders", "supplier", "customer", "nation")
    li = t["lineitem"].select(
        "l_orderkey", "l_suppkey", F.month("l_shipdate").cast("int").alias("ship_month")
    )
    nat = t["nation"]
    if side == "pickup":
        sup = t["supplier"]
        dim = (
            sup.join(F.broadcast(nat), sup["s_nationkey"] == nat["n_nationkey"], "left")
            .select("s_suppkey", F.col("n_name").alias("Pickup_Borough"))
        )
        fact = li.join(F.broadcast(dim), li["l_suppkey"] == dim["s_suppkey"], "left")
        key = "Pickup_Borough"
    else:
        orders, cus = t["orders"], t["customer"]
        dim = (
            cus.join(F.broadcast(nat), cus["c_nationkey"] == nat["n_nationkey"], "left")
            .select("c_custkey", F.col("n_name").alias("Dropoff_Borough"))
        )
        ords = orders.select("o_orderkey", "o_custkey")
        fact = (
            li.join(ords, li["l_orderkey"] == ords["o_orderkey"], "left")
            .join(F.broadcast(dim), ords["o_custkey"] == dim["c_custkey"], "left")
        )
        key = "Dropoff_Borough"
    return fact.groupBy(key, "ship_month").agg(F.count(F.lit(1)).alias("trip_count"))


_TOP5_PICKUP_ORACLE = """
WITH counts AS (
  SELECT sn.n_name AS Pickup_Borough,
         CAST(month(l.l_shipdate) AS INTEGER) AS ship_month,
         COUNT(*) AS trip_count
  FROM lineitem l
  LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
  LEFT JOIN nation sn ON s.s_nationkey = sn.n_nationkey
  GROUP BY 1, 2
)
SELECT Pickup_Borough, ship_month, trip_count
FROM counts
QUALIFY DENSE_RANK() OVER (PARTITION BY ship_month ORDER BY trip_count DESC) <= 5
"""


@register("top5_pickup_boroughs_by_month", oracle=_TOP5_PICKUP_ORACLE, tags=("window", "topk"))
def q_top5_pickup(spark: SparkSession, sf_dir: str) -> DataFrame:
    counts = _borough_month_counts(spark, sf_dir, "pickup")
    return top_k_per_group(counts, ["ship_month"], "trip_count", 5)


_TOP5_DROPOFF_ORACLE = """
WITH counts AS (
  SELECT cn.n_name AS Dropoff_Borough,
         CAST(month(l.l_shipdate) AS INTEGER) AS ship_month,
         COUNT(*) AS trip_count
  FROM lineitem l
  LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
  LEFT JOIN customer c ON o.o_custkey = c.c_custkey
  LEFT JOIN nation cn ON c.c_nationkey = cn.n_nationkey
  GROUP BY 1, 2
)
SELECT Dropoff_Borough, ship_month, trip_count
FROM counts
QUALIFY DENSE_RANK() OVER (PARTITION BY ship_month ORDER BY trip_count DESC) <= 5
"""


@register("top5_dropoff_boroughs_by_month", oracle=_TOP5_DROPOFF_ORACLE, tags=("window", "topk"))
def q_top5_dropoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    counts = _borough_month_counts(spark, sf_dir, "dropoff")
    return top_k_per_group(counts, ["ship_month"], "trip_count", 5)


_ROUTE_REVENUE_ORACLE = """
WITH enr AS (
  SELECT concat_ws(' to ', sn.n_name, cn.n_name) AS Route,
         CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS profit
  FROM lineitem l
  LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
  LEFT JOIN nation sn ON s.s_nationkey = sn.n_nationkey
  LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
  LEFT JOIN customer c ON o.o_custkey = c.c_custkey
  LEFT JOIN nation cn ON c.c_nationkey = cn.n_nationkey
)
SELECT Route, CAST(SUM(profit) AS DOUBLE) AS total_profit
FROM enr GROUP BY 1
ORDER BY total_profit DESC, Route ASC
LIMIT 30
"""


@register("route_revenue_top30", oracle=_ROUTE_REVENUE_ORACLE, tags=("agg", "topk"))
def q_route_revenue_top30(spark: SparkSession, sf_dir: str, use_warehouse: bool = False) -> DataFrame:
    """Borough-level route revenue, top 30 (``codes/task3.py:109-118``).
    Route tiebreaker added so the LIMIT frontier is deterministic."""
    from .enrich import enriched_trips

    enr = enriched_trips(spark, sf_dir, use_warehouse=use_warehouse).withColumn(
        "Route", route_label("Pickup_Borough", "Dropoff_Borough")
    ).withColumn(
        "profit",
        F.col("fare").cast("decimal(18,2)") * (F.lit(1) - F.col("discount").cast("decimal(18,2)")),
    )
    totals = enr.groupBy("Route").agg(F.sum("profit").cast("double").alias("total_profit"))
    return top_k_global(totals, [F.desc("total_profit"), F.asc("Route")], 30)
