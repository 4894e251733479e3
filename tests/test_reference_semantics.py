"""Unit fixtures in the *reference-native* rideshare shape (FIXTURES.md §A).

These encode the reference's tricky semantics with hand-built tiny tables:
- left-join null survival for unmatched zone IDs (``codes/task1.py:45-48``;
  golden outputs contain Unknown/null boroughs)
- dense_rank ties yielding >K rows per group (``codes/task3.py:80-83``)
- pivot + fillna(0) for one-sided routes (``codes/task7.py:86-87``)
- HAVING band on aggregated counts (``codes/task6.py:77``)
- epoch-seconds date decoding (``codes/task1.py:69``)
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.operators.enrich import enrich_with_dim
from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.operators.filters import having_band
from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.operators.pivot import pivot_counts
from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.operators.topk import top_k_per_group
from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.sources.rideshare import (
    rideshare_schema,
    zone_lookup_schema,
)


def _zones(spark):
    return spark.createDataFrame(
        [
            (1, "Manhattan", "Midtown", "Yellow Zone"),
            (2, "Brooklyn", "Bay Ridge", "Boro Zone"),
            (3, "Unknown", "NA", "N/A"),
        ],
        schema=zone_lookup_schema(),
    )


def _trips(spark):
    # pickup 99 has no zone-lookup match → nulls must survive the left join
    rows = [
        ("Uber", 1, 2, 4.98, 226.0, 761.0, 19.0, 780.0, "morning", 1672531200, 22.82, 13.69, 9.13, 63.18, 2.75),
        ("Uber", 2, 3, 2.00, 100.0, 300.0, 10.0, 310.0, "evening", 1675209600, 10.00, 7.00, 3.00, 50.0, 2.0),
        ("Lyft", 99, 1, 1.50, 50.0, 200.0, 5.0, 205.0, "night", 1672617600, 8.00, 6.00, 2.00, 40.0, 1.5),
    ]
    return spark.createDataFrame(rows, schema=rideshare_schema())


def test_left_join_null_survival(spark):
    trips, zones = _trips(spark), _zones(spark)
    enriched = enrich_with_dim(
        trips, zones, "pickup_location", "LocationID",
        {"Borough": "Pickup_Borough", "Zone": "Pickup_Zone"},
    )
    assert enriched.count() == 3  # no rows lost (codes/task1.py:78 integrity check)
    row = enriched.filter(F.col("pickup_location") == 99).first()
    assert row["Pickup_Borough"] is None and row["Pickup_Zone"] is None
    assert "LocationID" not in enriched.columns  # join key dropped (task1.py:54)


def test_unknown_zone_values_survive_to_groups(spark):
    trips, zones = _trips(spark), _zones(spark)
    enriched = enrich_with_dim(
        trips, zones, "dropoff_location", "LocationID",
        {"Borough": "Dropoff_Borough", "Zone": "Dropoff_Zone"},
    )
    groups = dict(
        enriched.groupBy("Dropoff_Borough").count().collect()
    )
    assert groups.get("Unknown") == 1  # the literal Unknown/NA zone rows


def test_dense_rank_ties_exceed_k(spark):
    # two boroughs tie on trip_count in one month → top-1 returns BOTH
    counts = spark.createDataFrame(
        [("Manhattan", 1, 10), ("Brooklyn", 1, 10), ("Queens", 1, 5)],
        ["borough", "month", "trip_count"],
    )
    top1 = top_k_per_group(counts, ["month"], "trip_count", 1)
    got = {r["borough"] for r in top1.collect()}
    assert got == {"Manhattan", "Brooklyn"}  # dense_rank, not row_number


def test_pivot_fillna_zero_for_one_sided_routes(spark):
    df = spark.createDataFrame(
        [("R1", "Uber"), ("R1", "Uber"), ("R1", "Lyft"), ("R2", "Uber")],
        ["Route", "business"],
    )
    out = pivot_counts(df, "Route", "business", ("Uber", "Lyft"))
    r2 = out.filter(F.col("Route") == "R2").first()
    assert r2["lyft_count"] == 0  # fillna(0), not null (codes/task7.py:86)
    assert r2["total_count"] == 1  # 0 + 1, not null


def test_having_band_is_exclusive(spark):
    df = spark.createDataFrame(
        [("A",)] * 5 + [("B",)] * 10 + [("C",)] * 1, ["k"]
    )
    out = having_band(df, ["k"], 1, 10)
    got = {r["k"]: r["trip_count"] for r in out.collect()}
    assert got == {"A": 5}  # 1 and 10 excluded (strict band, task6.py:77)


def test_epoch_date_decoding(spark):
    trips = _trips(spark).withColumn(
        "trip_date", F.to_date(F.timestamp_seconds(F.col("date")))
    )
    months = sorted(
        r["m"] for r in trips.select(F.month("trip_date").alias("m")).collect()
    )
    assert months == [1, 1, 2]  # 2023-01-01, 2023-01-02, 2023-02-01 (UTC)
