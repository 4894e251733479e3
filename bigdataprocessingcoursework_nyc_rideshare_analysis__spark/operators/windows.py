"""Analytic window operators with explicit frames: rolling aggregates and
lag/lead deltas.

The reference's only window is an unframed ranking (SURVEY.md §2.5 — "no
frame specs, no lag/lead"); these complete the window surface:

- rolling average over the last N events per user (``ROWS BETWEEN N-1
  PRECEDING AND CURRENT ROW``), decimal-exact so both engines agree bit-wise;
- inter-event gap via ``lag`` (the building block sessionization uses).

Scale: one shuffle to co-locate each user's events + an in-partition sort —
identical profile to sessionization; frames add O(frame) state per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table

ROLLING_N = 5


_ROLLING_ORACLE = f"""
SELECT event_id, user_id, ts, value,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) / COUNT(value) OVER w
         AS rolling_avg_value,
       COUNT(*) OVER w AS n_in_window
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
             ROWS BETWEEN {ROLLING_N - 1} PRECEDING AND CURRENT ROW)
"""


@register("rolling_avg_value_per_user", oracle=_ROLLING_ORACLE, tags=("window", "frame"))
def q_rolling_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving average of the last 5 event values per user."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(-(ROLLING_N - 1), Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        (F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double") / F.count("value").over(w))
        .alias("rolling_avg_value"),
        F.count(F.lit(1)).over(w).alias("n_in_window"),
    )


_GAP_ORACLE = """
SELECT event_id, user_id, ts,
       datediff('microsecond', lag(ts) OVER w, ts) AS gap_us,
       lead(event_id) OVER w AS next_event_id
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
"""


@register("event_gaps_per_user", oracle=_GAP_ORACLE, tags=("window", "lag"))
def q_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-event gap (lag) and next event id (lead)."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))).alias("gap_us"),
        F.lead("event_id").over(w).alias("next_event_id"),
    )
