"""Ratio-of-averages — reference task 4 (``codes/task4.py:74-94``).

Reference semantics: average driver pay per ``time_of_day``, average trip
length per ``time_of_day``, then an *inner join of the two aggregates* on the
4-row key and a ratio column (J3, SURVEY.md §2.3).

We expose both the literal two-agg-join shape (it exercises the
aggregate⋈aggregate join path) and note the idiomatic collapse — a single
``groupBy.agg(avg, avg)`` — which produces the same result with one shuffle;
``avg_fare_per_unit_single_pass`` below is that collapse, and the bench
compares them.

Averages are computed as exact-decimal SUM / COUNT (``functions.scalar``),
keeping Spark and the DuckDB oracle bit-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalar import money_avg
from ..registry import register
from ..sources import load_tables


def _fact(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "lineitem", "orders")
    li = t["lineitem"].select("l_orderkey", "l_extendedprice", "l_quantity")
    ords = t["orders"].select("o_orderkey", F.col("o_orderpriority").alias("time_of_day"))
    return li.join(ords, li["l_orderkey"] == ords["o_orderkey"], "left")


_AVG_FARE_ORACLE = """
SELECT o.o_orderpriority AS time_of_day,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l.l_extendedprice)
         AS avg_fare
FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY 1
"""


@register("avg_fare_by_time_of_day", oracle=_AVG_FARE_ORACLE, tags=("agg",))
def q_avg_fare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``avg(driver_total_pay) per time_of_day`` analog (``codes/task4.py:74-77``)."""
    return _fact(spark, sf_dir).groupBy("time_of_day").agg(money_avg("l_extendedprice", "avg_fare"))


_AVG_LEN_ORACLE = """
SELECT o.o_orderpriority AS time_of_day,
       CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l.l_quantity)
         AS avg_trip_length
FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY 1
"""


@register("avg_trip_length_by_time_of_day", oracle=_AVG_LEN_ORACLE, tags=("agg",))
def q_avg_len(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``avg(trip_length) per time_of_day`` analog (``codes/task4.py:80-83``)."""
    return _fact(spark, sf_dir).groupBy("time_of_day").agg(money_avg("l_quantity", "avg_trip_length"))


_RATIO_ORACLE = """
WITH f AS (
  SELECT o.o_orderpriority AS time_of_day,
         CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l.l_extendedprice) AS avg_fare
  FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey GROUP BY 1
), g AS (
  SELECT o.o_orderpriority AS time_of_day,
         CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l.l_quantity) AS avg_trip_length
  FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey GROUP BY 1
)
SELECT f.time_of_day, f.avg_fare, g.avg_trip_length,
       f.avg_fare / g.avg_trip_length AS fare_per_unit
FROM f JOIN g ON f.time_of_day = g.time_of_day
"""


@register("fare_per_unit_by_time_of_day", oracle=_RATIO_ORACLE, tags=("agg", "join"))
def q_fare_per_unit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner join of two aggregates + ratio (``codes/task4.py:86-94``)."""
    fact = _fact(spark, sf_dir)
    pay = fact.groupBy("time_of_day").agg(money_avg("l_extendedprice", "avg_fare"))
    length = fact.groupBy("time_of_day").agg(money_avg("l_quantity", "avg_trip_length"))
    # both sides are |time_of_day|-row aggregates, but Catalyst can't see
    # that statically (post-agg size estimates stay fact-sized) — hint the
    # broadcast so the plan never sort-merge-joins two 5-row tables
    return (
        pay.join(F.broadcast(length), "time_of_day")
        .withColumn("fare_per_unit", F.col("avg_fare") / F.col("avg_trip_length"))
    )


def avg_fare_per_unit_single_pass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Idiomatic one-shuffle collapse of ``q_fare_per_unit`` (same output)."""
    return (
        _fact(spark, sf_dir)
        .groupBy("time_of_day")
        .agg(
            money_avg("l_extendedprice", "avg_fare"),
            money_avg("l_quantity", "avg_trip_length"),
        )
        .withColumn("fare_per_unit", F.col("avg_fare") / F.col("avg_trip_length"))
    )
