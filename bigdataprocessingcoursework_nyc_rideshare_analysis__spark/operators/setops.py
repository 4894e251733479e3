"""Set operations and semi/anti joins.

The reference uses none of these (SURVEY.md §2.7) — they are engine
completions that fall out of Spark nearly free and round out the relational
surface: UNION / INTERSECT / EXCEPT with DISTINCT semantics, and LEFT SEMI /
LEFT ANTI joins (the idiomatic EXISTS / NOT EXISTS).

Scale strategy: semi/anti joins ship only the join key of the right side and
stop probing at first match — strictly cheaper than inner-join+distinct; the
set ops hash-shuffle distinct rows.  All are single-shuffle on testdata keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table

HIGH_QTY = 45.0


def _day1_users(spark: SparkSession, sf_dir: str, event_type: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter((F.col("event_type") == event_type) & (F.dayofmonth("ts") == 1))
        .select("user_id")
        .distinct()
    )


_EXCEPT_ORACLE = """
SELECT DISTINCT user_id FROM events WHERE event_type = 'click' AND day(ts) = 1
EXCEPT
SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase' AND day(ts) = 1
"""


@register("day1_clickers_minus_purchasers", oracle=_EXCEPT_ORACLE, tags=("setop",))
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): users who clicked on day 1 but did not purchase."""
    return _day1_users(spark, sf_dir, "click").exceptAll(
        _day1_users(spark, sf_dir, "purchase")
    ).distinct()


_INTERSECT_ORACLE = """
SELECT DISTINCT user_id FROM events WHERE event_type = 'click' AND day(ts) = 1
INTERSECT
SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase' AND day(ts) = 1
"""


@register("day1_clickers_and_purchasers", oracle=_INTERSECT_ORACLE, tags=("setop",))
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct): users who both clicked and purchased on day 1."""
    return _day1_users(spark, sf_dir, "click").intersect(_day1_users(spark, sf_dir, "purchase"))


_UNION_ORACLE = """
SELECT DISTINCT user_id FROM events WHERE event_type = 'click' AND day(ts) = 1
UNION
SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase' AND day(ts) = 1
"""


@register("day1_engaged_users", oracle=_UNION_ORACLE, tags=("setop",))
def q_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct): users who clicked or purchased on day 1."""
    return (
        _day1_users(spark, sf_dir, "click")
        .union(_day1_users(spark, sf_dir, "purchase"))
        .distinct()
    )


_SEMI_ORACLE = f"""
SELECT o.o_orderstatus, COUNT(*) AS n_orders
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > {HIGH_QTY})
GROUP BY 1
"""


@register("orders_with_high_qty_item", oracle=_SEMI_ORACLE, tags=("join", "semi"))
def q_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join ≡ EXISTS: orders containing at least one high-quantity
    line item, counted by status."""
    orders = load_table(spark, sf_dir, "orders")
    hi = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > HIGH_QTY)
    return (
        orders.join(hi, orders["o_orderkey"] == hi["l_orderkey"], "left_semi")
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


_ANTI_ORACLE = f"""
SELECT o.o_orderstatus, COUNT(*) AS n_orders
FROM orders o
WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > {HIGH_QTY})
GROUP BY 1
"""


@register("orders_without_high_qty_item", oracle=_ANTI_ORACLE, tags=("join", "anti"))
def q_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join ≡ NOT EXISTS: orders with no high-quantity line item."""
    orders = load_table(spark, sf_dir, "orders")
    hi = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > HIGH_QTY)
    return (
        orders.join(hi, orders["o_orderkey"] == hi["l_orderkey"], "left_anti")
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
