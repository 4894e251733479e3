"""Monthly business rollups — reference task 2 (``codes/task2.py:73-103``).

Reference semantics: over the enriched view, (a) trip counts per
(business, month), (b) ``sum(rideshare_profit)`` per (business, month),
(c) ``sum(driver_total_pay)`` per (business, month); results formatted with
``format_number`` *at presentation time only* (SURVEY.md §2.8 C5 — the
numeric comparison happens pre-format).

Idiomatic divergence: the reference re-runs the full two-join prelude for
each rollup even though none of the dimension columns are used.  We aggregate
straight off the fact table — Catalyst prunes the scan to 2-3 columns
(check ``ReadSchema`` in the plan) and the job is a single
partial→shuffle→final HashAggregate.  At 100 TB the group-key cardinality
(|business| × 12) is tiny, so the map-side partial aggregation collapses the
shuffle to ~nothing.

Money sums go through exact decimal (see ``functions.scalar``); the
reference's FLOAT accumulation (``codes/task2.py:73-74``) is documented, not
replicated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalar import money_sum
from ..registry import register
from ..sources import load_table

# Generic core ---------------------------------------------------------------


def rollup_counts(df: DataFrame, keys: list[str], alias: str = "trip_count") -> DataFrame:
    """``groupBy(keys).count()`` with a stable alias (``codes/task2.py:80-83``)."""
    return df.groupBy(*keys).agg(F.count(F.lit(1)).alias(alias))


def rollup_money_sum(df: DataFrame, keys: list[str], col: str, alias: str) -> DataFrame:
    """Exact money sum per group (``codes/task2.py:89-100``)."""
    return df.groupBy(*keys).agg(money_sum(col, alias))


# Star-schema queries --------------------------------------------------------


def _fact(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_returnflag").alias("business"),
        F.month("l_shipdate").cast("int").alias("ship_month"),
        F.col("l_extendedprice"),
        F.col("l_discount"),
    )


@register(
    "trip_count_by_business_month",
    oracle="""
SELECT l_returnflag AS business,
       CAST(month(l_shipdate) AS INTEGER) AS ship_month,
       COUNT(*) AS trip_count
FROM lineitem GROUP BY 1, 2
""",
    tags=("agg",),
)
def q_trip_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return rollup_counts(_fact(spark, sf_dir), ["business", "ship_month"])


@register(
    "profit_by_business_month",
    oracle="""
SELECT l_returnflag AS business,
       CAST(month(l_shipdate) AS INTEGER) AS ship_month,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS total_profit
FROM lineitem GROUP BY 1, 2
""",
    tags=("agg",),
)
def q_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discounted revenue as the ``rideshare_profit`` analog
    (``codes/task2.py:89-93``)."""
    df = _fact(spark, sf_dir).withColumn(
        "profit",
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)")),
    )
    return df.groupBy("business", "ship_month").agg(
        F.sum("profit").cast("double").alias("total_profit")
    )


@register(
    "salted_earnings_by_business_month",
    oracle="""
SELECT l_returnflag AS business,
       CAST(month(l_shipdate) AS INTEGER) AS ship_month,
       COUNT(*) AS trip_count,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM lineitem GROUP BY 1, 2
""",
    tags=("agg", "skew"),
)
def q_salted_earnings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof two-phase rollup (``functions.skew.salted_sum_count``).
    The oracle is the *plain* GROUP BY — the salted plan must be
    bit-identical to the unsalted result, which is the whole point."""
    from ..functions.skew import salted_sum_count

    return salted_sum_count(
        _fact(spark, sf_dir), ["business", "ship_month"], "l_extendedprice"
    )


@register(
    "earnings_by_business_month",
    oracle="""
SELECT l_returnflag AS business,
       CAST(month(l_shipdate) AS INTEGER) AS ship_month,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_earnings
FROM lineitem GROUP BY 1, 2
""",
    tags=("agg",),
)
def q_earnings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``sum(driver_total_pay)`` analog (``codes/task2.py:99-103``)."""
    return rollup_money_sum(
        _fact(spark, sf_dir), ["business", "ship_month"], "l_extendedprice", "total_earnings"
    )


_PANDAS_API_ORACLE = """
SELECT event_type, COUNT(*) AS n_events
FROM events GROUP BY event_type
"""


@register("pandas_api_event_counts", oracle=_PANDAS_API_ORACLE, tags=("agg", "pandas-api"))
def q_pandas_api_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pandas-API-on-Spark surface (``pyspark.pandas``): a groupby-size
    written as pandas idiom, executed distributed, converted back to a
    plain DataFrame.  Exists to prove the third query API (DataFrame, SQL,
    pandas-API) stays on the same engine and oracle contract — the plan
    underneath is the identical partial/final hash aggregate; use it for
    pandas-fluent users, not for new hot paths."""
    import pyspark.pandas as ps

    from ..sources import load_table

    ev = load_table(spark, sf_dir, "events")
    psdf = ev.select("event_type").pandas_api()
    counts = psdf.groupby("event_type").size().rename("n_events")
    out = counts.to_frame().reset_index().to_spark()
    return out.select("event_type", F.col("n_events").cast("long"))
