"""Filter-family operators — reference task 6 (``codes/task6.py:74-118``).

Three shapes:
- groupBy + HAVING-style band predicate on the aggregated count
  (``task6.py:74-78``)
- equality pre-filter → group count → re-attach the constant column
  (``task6.py:84-90``)
- conjunctive borough-corridor filter → scalar count (``task6.py:99-106``)

Scale strategy: equality/conjunctive predicates on dimension-derived columns
sit *above* broadcast joins in the logical plan, and Catalyst pushes the
corresponding key filters below the join onto the (pruned, pushdown-capable)
parquet scan where the predicate references fact columns.  The HAVING band is
evaluated post-aggregation on |boroughs|×|time_of_day| rows — trivially small
at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_tables

BAND_LO, BAND_HI = 0, 450  # calibrated: sf0.01 cells span 106..1243, median ~460


def having_band(df: DataFrame, keys: list[str], lo: int, hi: int, alias: str = "trip_count") -> DataFrame:
    """groupBy(keys).count() with an exclusive (lo, hi) band on the count —
    SQL HAVING (``codes/task6.py:74-78``)."""
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias(alias))
    return counts.filter((F.col(alias) > lo) & (F.col(alias) < hi))


def _pickup_priority_fact(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "lineitem", "orders", "supplier", "nation")
    li = t["lineitem"].select("l_orderkey", "l_suppkey")
    sup, nat = t["supplier"], t["nation"]
    dim = (
        sup.join(F.broadcast(nat), sup["s_nationkey"] == nat["n_nationkey"], "left")
        .select("s_suppkey", F.col("n_name").alias("Pickup_Borough"))
    )
    ords = t["orders"].select("o_orderkey", F.col("o_orderpriority").alias("time_of_day"))
    return (
        li.join(F.broadcast(dim), li["l_suppkey"] == dim["s_suppkey"], "left")
        .join(ords, li["l_orderkey"] == ords["o_orderkey"], "left")
    )


_BAND_ORACLE = f"""
SELECT sn.n_name AS Pickup_Borough, o.o_orderpriority AS time_of_day, COUNT(*) AS trip_count
FROM lineitem l
LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
LEFT JOIN nation sn ON s.s_nationkey = sn.n_nationkey
LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY 1, 2
HAVING COUNT(*) > {BAND_LO} AND COUNT(*) < {BAND_HI}
"""


@register("borough_timeofday_band", oracle=_BAND_ORACLE, tags=("filter", "agg"))
def q_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    return having_band(
        _pickup_priority_fact(spark, sf_dir), ["Pickup_Borough", "time_of_day"], BAND_LO, BAND_HI
    )


_URGENT_ORACLE = """
SELECT sn.n_name AS Pickup_Borough, COUNT(*) AS trip_count, '1-URGENT' AS time_of_day
FROM lineitem l
LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
LEFT JOIN nation sn ON s.s_nationkey = sn.n_nationkey
LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderpriority = '1-URGENT'
GROUP BY 1
"""


@register("urgent_trips_by_borough", oracle=_URGENT_ORACLE, tags=("filter", "agg"))
def q_urgent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equality filter → count per borough → constant column re-attached
    (``codes/task6.py:84-90``: the 'evening trips' query)."""
    return (
        _pickup_priority_fact(spark, sf_dir)
        .filter(F.col("time_of_day") == "1-URGENT")
        .groupBy("Pickup_Borough")
        .agg(F.count(F.lit(1)).alias("trip_count"))
        .withColumn("time_of_day", F.lit("1-URGENT"))
    )


_CORRIDOR_ORACLE = """
SELECT COUNT(*) AS trip_count
FROM lineitem l
LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
LEFT JOIN nation sn ON s.s_nationkey = sn.n_nationkey
LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
LEFT JOIN customer c ON o.o_custkey = c.c_custkey
LEFT JOIN nation cn ON c.c_nationkey = cn.n_nationkey
WHERE sn.n_name = 'NATION_9' AND cn.n_name = 'NATION_10'
"""


@register("corridor_trip_count", oracle=_CORRIDOR_ORACLE, tags=("filter",))
def q_corridor(spark: SparkSession, sf_dir: str, use_warehouse: bool = False) -> DataFrame:
    """Conjunctive corridor filter → scalar count as a 1-row DataFrame
    (``codes/task6.py:99-106``: Brooklyn → Staten Island)."""
    from .enrich import enriched_trips

    enr = enriched_trips(spark, sf_dir, use_warehouse=use_warehouse)
    return (
        enr.filter((F.col("Pickup_Borough") == "NATION_9") & (F.col("Dropoff_Borough") == "NATION_10"))
        .agg(F.count(F.lit(1)).alias("trip_count"))
    )
