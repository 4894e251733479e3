"""Pivoted route counts — reference task 7 (``codes/task7.py:79-94``).

Reference semantics: zone-level route label, ``groupBy(Route)
.pivot(business).count()``, ``fillna(0)`` so one-sided routes count as zero
(without it the row total is null), derived ``total_count``, global top-10.

Scale strategy: pivot values are passed explicitly — Spark otherwise runs an
extra distinct-values job over the full fact to discover them
(SURVEY.md §2.4 A10).  The pivot itself is just a grouped conditional
aggregation, so it shares the single-shuffle profile of any groupBy; the
oracle expresses it as ``COUNT(*) FILTER`` which is the same physical idea.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalar import route_label
from ..registry import register
from .topk import top_k_global

BUSINESS_VALUES = ("A", "N", "R")  # l_returnflag domain (≙ {Uber, Lyft})


def pivot_counts(
    df: DataFrame, group_col: str, pivot_col: str, values: tuple[str, ...]
) -> DataFrame:
    """groupBy(group).pivot(pivot, values).count() + fillna(0) + total
    (``codes/task7.py:83-87``), with stable lowercase ``<v>_count`` names."""
    out = df.groupBy(group_col).pivot(pivot_col, list(values)).count().fillna(0)
    total = None
    for v in values:
        out = out.withColumnRenamed(v, f"{v.lower()}_count")
        c = F.col(f"{v.lower()}_count")
        total = c if total is None else total + c
    return out.withColumn("total_count", total)


_PIVOT_ORACLE = """
WITH enr AS (
  SELECT concat_ws(' to ', s.s_name, c.c_mktsegment) AS Route, l.l_returnflag AS business
  FROM lineitem l
  LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
  LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
  LEFT JOIN customer c ON o.o_custkey = c.c_custkey
)
SELECT Route,
       COUNT(*) FILTER (WHERE business = 'A') AS a_count,
       COUNT(*) FILTER (WHERE business = 'N') AS n_count,
       COUNT(*) FILTER (WHERE business = 'R') AS r_count,
       COUNT(*) FILTER (WHERE business IN ('A','N','R')) AS total_count
FROM enr GROUP BY 1
ORDER BY total_count DESC, Route ASC
LIMIT 10
"""


@register("route_pivot_by_business_top10", oracle=_PIVOT_ORACLE, tags=("pivot", "topk"))
def q_route_pivot(spark: SparkSession, sf_dir: str, use_warehouse: bool = False) -> DataFrame:
    from .enrich import enriched_trips

    enr = enriched_trips(spark, sf_dir, use_warehouse=use_warehouse).withColumn(
        "Route", route_label("Pickup_Zone", "Dropoff_Zone")
    )
    pivoted = pivot_counts(enr, "Route", "business", BUSINESS_VALUES)
    return top_k_global(pivoted, [F.desc("total_count"), F.asc("Route")], 10)
