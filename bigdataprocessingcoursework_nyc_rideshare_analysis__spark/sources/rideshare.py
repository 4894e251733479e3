"""Reference-native input shapes: the NYC rideshare fact CSV and the taxi
zone lookup dimension.

The reference reads both CSVs with ``header=true`` and *no* schema
(``codes/task1.py:40-41``), so all 15+4 columns land as nullable strings and
every downstream numeric op relies on implicit casts (``codes/task2.py:73-74``
casts to float at point of use; ``codes/task3.py:112`` sums a raw string).
Our engine reads with explicit schemas — strings never leak into arithmetic,
and the parquet/CSV scanners can push filters and prune columns.

These schemas are exercised by the unit-test fixtures (FIXTURES.md §A), which
encode the reference's tricky semantics: unmatched zone IDs surviving the
left join, ``Unknown``/``NA`` dimension values, dense_rank ties, pivot
null-fill.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def rideshare_schema() -> StructType:
    """15-column fact schema (``Images/task1_op1.2.png``; FIXTURES.md §A1).

    ``date`` is unix epoch seconds (decoded downstream, cf.
    ``codes/task1.py:69``); money/durations are DOUBLE (the reference's
    float-vs-string mix is documented in SURVEY.md §1.2 and deliberately not
    replicated).
    """
    return StructType(
        [
            StructField("business", StringType()),
            StructField("pickup_location", IntegerType()),
            StructField("dropoff_location", IntegerType()),
            StructField("trip_length", DoubleType()),
            StructField("request_to_pickup", DoubleType()),
            StructField("total_ride_time", DoubleType()),
            StructField("on_scene_to_pickup", DoubleType()),
            StructField("on_scene_to_dropoff", DoubleType()),
            StructField("time_of_day", StringType()),
            StructField("date", LongType()),
            StructField("passenger_fare", DoubleType()),
            StructField("driver_total_pay", DoubleType()),
            StructField("rideshare_profit", DoubleType()),
            StructField("hourly_rate", DoubleType()),
            StructField("dollars_per_mile", DoubleType()),
        ]
    )


def zone_lookup_schema() -> StructType:
    """Zone dimension schema (FIXTURES.md §A2; join sites ``codes/task1.py:45-63``)."""
    return StructType(
        [
            StructField("LocationID", IntegerType()),
            StructField("Borough", StringType()),
            StructField("Zone", StringType()),
            StructField("service_zone", StringType()),
        ]
    )


def read_rideshare_csv(spark: SparkSession, fact_path: str, zone_path: str) -> tuple[DataFrame, DataFrame]:
    """Read reference-native CSVs with explicit schemas and a decoded date.

    Returns ``(trips, zones)``.  ``trip_date`` is a real DateType (the
    reference keeps a ``yyyy-MM-dd`` *string*, ``codes/task1.py:69``).
    """
    trips = (
        spark.read.option("header", "true")
        .schema(rideshare_schema())
        .csv(fact_path)
        .withColumn("trip_date", F.to_date(F.timestamp_seconds(F.col("date"))))
    )
    zones = spark.read.option("header", "true").schema(zone_lookup_schema()).csv(zone_path)
    return trips, zones
