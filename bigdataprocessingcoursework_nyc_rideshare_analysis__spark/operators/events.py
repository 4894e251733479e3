"""Event-stream batch operators over the ``events`` table.

The reference has no streaming surface (SURVEY.md §2.9); these operators are
the engine extension that makes the ``events`` fixture first-class: temporal
bucketing, gap-based sessionization, and semi-structured (JSON) extraction.
``streaming.windows`` provides the Structured Streaming counterpart of the
hourly rollup, and the test suite proves batch/stream parity.

Scale strategy:
- hourly rollup: single shuffle on (hour, event_type); map-side partials make
  it cardinality-bound, not data-bound.
- sessionization: one shuffle to co-locate each user's events
  (``Window.partitionBy(user_id)``); state per user is a sort — at 100 TB
  with a hot user you would pre-bucket by user_id and let AQE handle skew.
  This is the batch equivalent of ``session_window`` in streaming.
- JSON extraction: ``get_json_object`` is JVM-side; at scale prefer
  ``from_json`` with an explicit schema (also JVM) so the parse happens once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table

SESSION_GAP_MIN = 30


_HOURLY_ORACLE = """
SELECT date_trunc('hour', ts) AS hour, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(value) AS avg_value
FROM events GROUP BY 1, 2
"""


@register("events_hourly_rollup", oracle=_HOURLY_ORACLE, tags=("temporal", "agg"))
def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(F.col("value").cast("decimal(18,2)")).cast("double") / F.count("value"))
            .alias("avg_value"),
        )
    )


def sessionize(df: DataFrame, user_col: str, ts_col: str, gap_minutes: int) -> DataFrame:
    """Gap-based sessionization: a new session starts when the inter-event
    gap exceeds ``gap_minutes``.  Classic lag → flag → running-sum pattern;
    deterministic tiebreak on event ordering via (ts, event_id)."""
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc(), F.col("event_id").asc())
    gap_us = gap_minutes * 60 * 1_000_000
    flagged = df.withColumn(
        "new_session",
        (
            F.coalesce(
                F.unix_micros(F.col(ts_col)) - F.unix_micros(F.lag(ts_col).over(w)),
                F.lit(gap_us + 1),
            )
            > gap_us
        ).cast("int"),
    )
    return flagged.withColumn(
        "session_id", F.sum("new_session").over(w).cast("long")
    ).drop("new_session")


_SESSIONS_ORACLE = f"""
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN datediff('microsecond', lag(ts) OVER w, ts) IS NULL
                OR datediff('microsecond', lag(ts) OVER w, ts) > {SESSION_GAP_MIN} * 60 * 1000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
), sessions AS (
  SELECT user_id, ts, event_id,
         CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM flagged
)
SELECT user_id, session_id,
       COUNT(*) AS n_events,
       MIN(ts) AS session_start,
       MAX(ts) AS session_end,
       datediff('microsecond', MIN(ts), MAX(ts)) AS duration_us
FROM sessions GROUP BY 1, 2
"""


@register("events_sessionize", oracle=_SESSIONS_ORACLE, tags=("window", "temporal"))
def q_events_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    sess = sessionize(ev, "user_id", "ts", SESSION_GAP_MIN)
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias("duration_us"),
    )


_JSON_ORACLE = """
SELECT event_type,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
       COUNT(json_extract_string(props, '$.k')) AS n_with_k
FROM events GROUP BY 1
"""


@register("events_json_extract", oracle=_JSON_ORACLE, tags=("semi-structured", "agg"))
def q_events_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed extraction from the JSON ``props`` column + rollup."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.withColumn("k", k).groupBy("event_type").agg(
        F.sum("k").cast("bigint").alias("sum_k"),
        F.count("k").alias("n_with_k"),
    )
