"""Reference-native pipelines: the seven coursework tasks, end-to-end, on
rideshare-shaped DataFrames.

A user of the reference runs ``spark-submit codes/taskN.py``; here each task
is a function over ``(trips, zones)`` DataFrames (see
``sources.rideshare.read_rideshare_csv``) built from the engine's generic
operators.  Differences from the reference are deliberate and documented:

- the enriched view is built ONCE and (optionally) cached — the reference
  re-runs the two-join prelude in every script and for every action
  (SURVEY.md §4 "Caching / reuse: absent");
- numerics are typed (double / exact decimal), never strings
  (``codes/task2.py:73-74`` float casts; ``codes/task3.py:112`` implicit
  string sum);
- ``format_number`` thousands-formatting is applied only in the dedicated
  presentation helper, never before arithmetic (``codes/task2.py:93``);
- the task-5 threshold scan stays in Spark instead of pandas
  (``codes/task5.py:91-92``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalar import money_sum, route_label
from ..operators.enrich import enrich_with_dim
from ..operators.filters import having_band
from ..operators.pivot import pivot_counts
from ..operators.topk import top_k_global, top_k_per_group


def build_enriched_view(trips: DataFrame, zones: DataFrame, cache: bool = False) -> DataFrame:
    """The 21-column enriched substrate (``codes/task1.py:45-69``;
    ``Images/task1_op1.2.png``): two left joins against the zone dimension
    with ``Pickup_*`` / ``Dropoff_*`` renames, join keys dropped, epoch date
    decoded to a real date plus month/day columns."""
    enriched = enrich_with_dim(
        trips, zones, "pickup_location", "LocationID",
        {"Borough": "Pickup_Borough", "Zone": "Pickup_Zone", "service_zone": "Pickup_service_zone"},
    )
    enriched = enrich_with_dim(
        enriched, zones, "dropoff_location", "LocationID",
        {"Borough": "Dropoff_Borough", "Zone": "Dropoff_Zone", "service_zone": "Dropoff_service_zone"},
    )
    enriched = (
        enriched.withColumn("trip_date", F.to_date(F.timestamp_seconds(F.col("date"))))
        .withColumn("month", F.month("trip_date").cast("int"))
        .withColumn("day", F.dayofmonth("trip_date").cast("int"))
    )
    return enriched.cache() if cache else enriched


def task1_enrich_and_validate(trips: DataFrame, zones: DataFrame) -> tuple[DataFrame, int]:
    """Task 1 (``codes/task1.py``): enriched view + row-count integrity check
    (the count must equal the input count — left joins lose nothing)."""
    enriched = build_enriched_view(trips, zones)
    return enriched, enriched.count()


def task2_monthly_rollups(enriched: DataFrame) -> dict[str, DataFrame]:
    """Task 2 (``codes/task2.py:80-103``): trips / profit / earnings per
    (business, month)."""
    by = ["business", "month"]
    return {
        "trip_count": enriched.groupBy(*by).agg(F.count(F.lit(1)).alias("trip_count")),
        "total_profit": enriched.groupBy(*by).agg(money_sum("rideshare_profit", "total_profit")),
        "total_earnings": enriched.groupBy(*by).agg(money_sum("driver_total_pay", "total_earnings")),
    }


def task3_topk(enriched: DataFrame, k_boroughs: int = 5, k_routes: int = 30) -> dict[str, DataFrame]:
    """Task 3 (``codes/task3.py:74-118``): top-5 pickup/dropoff boroughs per
    month (dense_rank — ties can exceed 5) and top-30 routes by revenue."""
    pickup = enriched.groupBy("Pickup_Borough", "month").agg(F.count(F.lit(1)).alias("trip_count"))
    dropoff = enriched.groupBy("Dropoff_Borough", "month").agg(F.count(F.lit(1)).alias("trip_count"))
    routes = (
        enriched.withColumn("Route", route_label("Pickup_Borough", "Dropoff_Borough"))
        .groupBy("Route")
        .agg(money_sum("driver_total_pay", "total_profit"))
    )
    return {
        "top_pickup": top_k_per_group(pickup, ["month"], "trip_count", k_boroughs),
        "top_dropoff": top_k_per_group(dropoff, ["month"], "trip_count", k_boroughs),
        "top_routes": top_k_global(routes, [F.desc("total_profit"), F.asc("Route")], k_routes),
    }


def task4_ratio_of_averages(enriched: DataFrame) -> DataFrame:
    """Task 4 (``codes/task4.py:74-94``): avg pay and avg trip length per
    time_of_day and their ratio — collapsed to one aggregation (same result,
    one shuffle; the reference joins two separate aggregates)."""
    return (
        enriched.groupBy("time_of_day")
        .agg(
            (F.sum(F.col("driver_total_pay").cast("decimal(18,2)")).cast("double")
             / F.count("driver_total_pay")).alias("average_drivertotalpay"),
            (F.sum(F.col("trip_length").cast("decimal(18,2)")).cast("double")
             / F.count("trip_length")).alias("average_triplength"),
        )
        .withColumn(
            "average_earning_per_mile",
            F.col("average_drivertotalpay") / F.col("average_triplength"),
        )
    )


def task5_daily_anomaly(enriched: DataFrame, month: int = 1, threshold: float = 300.0) -> dict[str, DataFrame]:
    """Task 5 (``codes/task5.py:74-92``): January daily average waiting time
    plus the anomalous days — threshold applied in Spark, not pandas."""
    daily = (
        enriched.filter(F.col("month") == month)
        .groupBy("day")
        .agg(
            (F.sum(F.col("request_to_pickup").cast("decimal(18,2)")).cast("double")
             / F.count("request_to_pickup")).alias("average_waiting_time")
        )
        .orderBy("day")
    )
    return {
        "daily": daily,
        "anomalous_days": daily.filter(F.col("average_waiting_time") > threshold),
    }


def task6_filters(
    enriched: DataFrame,
    band: tuple[int, int] = (0, 1000),
    evening: str = "evening",
    corridor: tuple[str, str] = ("Brooklyn", "Staten Island"),
) -> dict[str, DataFrame]:
    """Task 6 (``codes/task6.py:74-118``): HAVING band on
    (Pickup_Borough, time_of_day) counts; evening counts per borough;
    corridor trip count."""
    lo, hi = band
    evening_counts = (
        enriched.filter(F.col("time_of_day") == evening)
        .groupBy("Pickup_Borough")
        .agg(F.count(F.lit(1)).alias("trip_count"))
        .withColumn("time_of_day", F.lit(evening))
        .orderBy("Pickup_Borough")
    )
    corridor_count = (
        enriched.filter(
            (F.col("Pickup_Borough") == corridor[0]) & (F.col("Dropoff_Borough") == corridor[1])
        ).agg(F.count(F.lit(1)).alias("trip_count"))
    )
    return {
        "band": having_band(enriched, ["Pickup_Borough", "time_of_day"], lo, hi)
        .orderBy("Pickup_Borough", "time_of_day"),
        "evening": evening_counts,
        "corridor": corridor_count,
    }


def task7_route_pivot(enriched: DataFrame, k: int = 10) -> DataFrame:
    """Task 7 (``codes/task7.py:79-94``): zone-level routes pivoted by
    business with zero-fill, total, top-10."""
    routed = enriched.withColumn("Route", route_label("Pickup_Zone", "Dropoff_Zone"))
    pivoted = pivot_counts(routed, "Route", "business", ("Uber", "Lyft"))
    return top_k_global(pivoted, [F.desc("total_count"), F.asc("Route")], k)


def present_money(df: DataFrame, cols: list[str]) -> DataFrame:
    """Presentation-only thousands formatting (``codes/task2.py:93,103``) —
    returns string columns; never feed these back into arithmetic."""
    out = df
    for c in cols:
        out = out.withColumn(c, F.format_number(F.col(c), 2))
    return out
