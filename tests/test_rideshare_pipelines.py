"""End-to-end reference-native pipelines on a fixture that encodes every
tricky property from FIXTURES.md §A3: unmatched zone IDs, Unknown/NA zones,
dense_rank ties, one-sided pivot routes, band boundaries, the day-1 waiting
anomaly, months 1-5."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.pipelines import (
    build_enriched_view,
    task1_enrich_and_validate,
    task2_monthly_rollups,
    task3_topk,
    task4_ratio_of_averages,
    task5_daily_anomaly,
    task6_filters,
    task7_route_pivot,
)
from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.pipelines.rideshare import present_money
from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.sources.rideshare import (
    rideshare_schema,
    zone_lookup_schema,
)

UTC = dt.timezone.utc


def _epoch(y, m, d, h=12):
    return int(dt.datetime(y, m, d, h, tzinfo=UTC).timestamp())


@pytest.fixture(scope="module")
def zones(spark):
    return spark.createDataFrame(
        [
            (1, "Manhattan", "Midtown", "Yellow Zone"),
            (2, "Brooklyn", "Bay Ridge", "Boro Zone"),
            (3, "Staten Island", "Arrochar", "Boro Zone"),
            (4, "Unknown", "NA", "N/A"),
            (5, "Queens", "JFK Airport", "Airports"),
        ],
        schema=zone_lookup_schema(),
    )


@pytest.fixture(scope="module")
def trips(spark):
    def trip(business, pu, do, tod, epoch, fare=10.0, pay=6.0, wait=100.0, length=2.0):
        return (
            business, pu, do, length, wait, 600.0, 10.0, 610.0, tod, epoch,
            fare, pay, fare - pay, 30.0, fare / length,
        )

    rows = [
        # month 1: Manhattan x2 and Brooklyn x2 pickups → dense_rank TIE at top
        trip("Uber", 1, 2, "morning", _epoch(2023, 1, 1), wait=400.0),   # day-1 anomaly
        trip("Uber", 1, 3, "evening", _epoch(2023, 1, 1), wait=450.0),   # day-1 anomaly
        trip("Uber", 2, 1, "evening", _epoch(2023, 1, 2), wait=100.0),
        trip("Lyft", 2, 4, "night", _epoch(2023, 1, 3), wait=120.0, fare=5.0, pay=7.0),  # negative profit; Unknown dropoff
        # month 2: unmatched pickup 99 (no zone row) + Brooklyn→Staten Island corridor
        trip("Uber", 99, 1, "afternoon", _epoch(2023, 2, 10)),
        trip("Uber", 2, 3, "evening", _epoch(2023, 2, 11)),
        # months 3-5 singletons (JFK route pivot: Uber-only)
        trip("Uber", 5, 4, "morning", _epoch(2023, 3, 5)),
        trip("Lyft", 1, 1, "afternoon", _epoch(2023, 4, 6)),
        trip("Uber", 3, 2, "night", _epoch(2023, 5, 7)),
    ]
    return spark.createDataFrame(rows, schema=rideshare_schema())


def test_task1_no_rows_lost(spark, trips, zones):
    enriched, n = task1_enrich_and_validate(trips, zones)
    assert n == trips.count() == 9
    # unmatched pickup survives with null borough
    nulls = enriched.filter(F.col("Pickup_Borough").isNull()).collect()
    assert [r["pickup_location"] for r in nulls] == [99]
    # all 21+3 derived columns present
    for col in ("Pickup_service_zone", "Dropoff_service_zone", "trip_date", "month", "day"):
        assert col in enriched.columns


def test_task2_rollups_and_negative_profit(spark, trips, zones):
    enriched = build_enriched_view(trips, zones)
    out = task2_monthly_rollups(enriched)
    counts = {(r["business"], r["month"]): r["trip_count"] for r in out["trip_count"].collect()}
    assert counts[("Uber", 1)] == 3 and counts[("Lyft", 1)] == 1
    profit = {(r["business"], r["month"]): r["total_profit"] for r in out["total_profit"].collect()}
    assert profit[("Lyft", 1)] == -2.0  # negative profit preserved
    formatted = present_money(out["total_profit"], ["total_profit"])
    assert dict(formatted.dtypes)["total_profit"] == "string"


def test_task3_dense_rank_tie_and_routes(spark, trips, zones):
    enriched = build_enriched_view(trips, zones)
    out = task3_topk(enriched, k_boroughs=1, k_routes=3)
    month1 = [r for r in out["top_pickup"].collect() if r["month"] == 1]
    assert {r["Pickup_Borough"] for r in month1} == {"Manhattan", "Brooklyn"}  # tie keeps both
    routes = out["top_routes"].collect()
    assert len(routes) == 3 and routes[0]["total_profit"] >= routes[-1]["total_profit"]


def test_task4_ratio(spark, trips, zones):
    enriched = build_enriched_view(trips, zones)
    out = {r["time_of_day"]: r for r in task4_ratio_of_averages(enriched).collect()}
    r = out["morning"]
    assert r["average_earning_per_mile"] == pytest.approx(
        r["average_drivertotalpay"] / r["average_triplength"]
    )


def test_task5_day1_anomaly_only(spark, trips, zones):
    enriched = build_enriched_view(trips, zones)
    out = task5_daily_anomaly(enriched, month=1, threshold=300.0)
    daily = {r["day"]: r["average_waiting_time"] for r in out["daily"].collect()}
    assert daily[1] == pytest.approx(425.0)  # (400+450)/2
    anomalous = [r["day"] for r in out["anomalous_days"].collect()]
    assert anomalous == [1]  # reference golden: exactly day 1 (Images/task5_op2.png)


def test_task6_filters(spark, trips, zones):
    enriched = build_enriched_view(trips, zones)
    out = task6_filters(enriched, band=(0, 2), corridor=("Brooklyn", "Staten Island"))
    assert out["corridor"].first()["trip_count"] == 1
    evening = {r["Pickup_Borough"]: r["trip_count"] for r in out["evening"].collect()}
    assert evening == {"Manhattan": 1, "Brooklyn": 2}
    band_rows = out["band"].collect()
    assert band_rows and all(0 < r["trip_count"] < 2 for r in band_rows)


def test_task7_pivot_zero_fill_and_na_zone(spark, trips, zones):
    enriched = build_enriched_view(trips, zones)
    out = task7_route_pivot(enriched, k=10).collect()
    rows = {r["Route"]: r for r in out}
    jfk = rows["JFK Airport to NA"]  # the reference's literal golden route label
    assert jfk["uber_count"] == 1 and jfk["lyft_count"] == 0 and jfk["total_count"] == 1
