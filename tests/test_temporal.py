"""Semantics of the custom temporal operators: as-of tie/no-match rules,
range-band edge handling."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.operators.temporal import (
    asof_join,
    range_band_join,
)

from .conftest import SF_SMOKE

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


def test_interpolation_semantics(spark):
    """Grid points coinciding with events emit the exact value; points
    between two events emit the linear blend; the walk never extrapolates
    past the last observation."""
    import datetime as dt

    from pyspark.sql import functions as F

    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.operators.temporal import (
        INTERP_STEP_US,
        q_interpolated_series,
    )

    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.sources.tables import load_table

    out = q_interpolated_series(spark, SF_SMOKE)
    ev = load_table(spark, SF_SMOKE, "events")
    # pick one user deterministically
    uid = ev.selectExpr("min(user_id) AS u").collect()[0]["u"]
    rows = sorted(
        out.filter(F.col("user_id") == uid).collect(), key=lambda r: r["grid_ts"]
    )
    assert rows, "grid must be non-empty for an active user"
    # first grid point == user's first event timestamp -> exact value
    first_ev = (
        ev.filter(F.col("user_id") == uid)
        .orderBy("ts", "event_id")
        .select("ts", "value")
        .collect()[0]
    )
    assert abs(rows[0]["grid_ts"].timestamp() - first_ev["ts"].timestamp()) < 1e-6
    assert rows[0]["value_interp"] == first_ev["value"]
    # grid spacing is exactly the configured step
    for a, b in zip(rows, rows[1:]):
        assert round((b["grid_ts"] - a["grid_ts"]).total_seconds() * 1e6) == INTERP_STEP_US
    # every interpolated value lies within the user's observed value range
    lo, hi = (
        ev.filter(F.col("user_id") == uid)
        .agg(F.min("value"), F.max("value"))
        .collect()[0]
    )
    for r in rows:
        assert r["value_interp"] is not None
        assert lo - 1e-9 <= r["value_interp"] <= hi + 1e-9


def test_rolling_distinct_users_exact_on_hand_case(spark):
    """A user active on several days inside one window counts ONCE per
    window-end day; the explode-dedup shape must equal the naive per-day
    recompute."""
    rows = [
        # user 1 active day 1 and day 3 → covers window-ends 1..7 and 3..9
        (1, dt.datetime(2024, 1, 1)), (1, dt.datetime(2024, 1, 3)),
        # user 2 active day 8 only
        (2, dt.datetime(2024, 1, 8)),
    ]
    ev = spark.createDataFrame(rows, ["user_id", "ts"])
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.operators.temporal import (
        rolling_distinct_users,
    )

    got = {str(r["day"]): r["active_users_7d"] for r in rolling_distinct_users(ev).collect()}
    # expected: days 1-7 → user1 once; day 8 → user1 (active day 3 covers 3..9) + user2
    assert got["2024-01-01"] == 1
    assert got["2024-01-02"] == 1  # user1 counted once though active twice in window on day 3+
    assert got["2024-01-03"] == 1
    assert got["2024-01-07"] == 1
    assert got["2024-01-08"] == 2
