"""Semantics of the custom temporal operators: as-of tie/no-match rules,
range-band edge handling."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.operators.temporal import (
    asof_join,
    range_band_join,
)

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _ts(minutes):
    return T0 + dt.timedelta(minutes=minutes)


def test_asof_join_picks_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [(1, 101, _ts(10)), (1, 102, _ts(30)), (2, 201, _ts(5))],
        ["user_id", "event_id", "ts"],
    )
    right = spark.createDataFrame(
        [(1, _ts(0)), (1, _ts(10)), (1, _ts(20)), (2, _ts(6))],
        ["user_id", "ts"],
    )
    out = {r["event_id"]: r["last_click_ts"] for r in
           asof_join(left, right, "user_id", asof_col="last_click_ts").collect()}
    assert out[101] == _ts(10)   # tie: right at exactly left.ts matches
    assert out[102] == _ts(20)   # latest ≤ 30, not the earliest
    assert out[201] is None      # right row is AFTER left → no match, null


def test_asof_join_keeps_all_left_rows(spark):
    left = spark.createDataFrame([(9, 901, _ts(1))], ["user_id", "event_id", "ts"])
    right = spark.createDataFrame([(8, _ts(0))], ["user_id", "ts"])  # different key
    rows = asof_join(left, right, "user_id").collect()
    assert len(rows) == 1 and rows[0]["asof_ts"] is None


def test_range_band_half_open_edges(spark):
    fact = spark.createDataFrame(
        [(0.0,), (49.99,), (50.0,), (199.99,), (200.0,), (9999.0,)], ["value"]
    )
    out = range_band_join(fact, "value").groupBy("band").count().collect()
    got = {r["band"]: r["count"] for r in out}
    assert got == {"low": 2, "mid": 2, "high": 2}  # boundaries land in the upper band
