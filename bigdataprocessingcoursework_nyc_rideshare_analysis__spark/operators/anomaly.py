"""Daily-average anomaly detection — reference task 5 (``codes/task5.py:74-92``).

Reference semantics: filter to January, average waiting time per
day-of-month, sort by day, then a *driver-side pandas* threshold scan
(``>300s``) to name anomalous days.

Star-schema realization: the ``events`` stream table (all of January 2024)
with ``value`` as the waiting-time analog; threshold calibrated to the
synthetic distribution (daily means ~48-55).

Idiomatic divergence: the threshold filter stays *in Spark* (``F6`` upgrade,
SURVEY.md §2.2) — the reference's ``toPandas()`` + boolean mask pattern pulls
an aggregate across the Py4J boundary just to compare against a constant, and
its three separate actions re-execute the pipeline three times (no cache).
Our pipeline is one job; at 100 TB the daily aggregate is 31 rows either way,
but the input scan happens once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table

WAIT_THRESHOLD = 52.0  # calibrated: only a few January days exceed it


def daily_average(df: DataFrame, ts_col: str, value_col: str, month: int) -> DataFrame:
    """Per-day-of-month average of ``value_col`` within ``month``
    (``codes/task5.py:74-80``), decimal-exact."""
    return (
        df.filter(F.month(ts_col) == month)
        .withColumn("day", F.dayofmonth(ts_col).cast("int"))
        .groupBy("day")
        .agg(
            (F.sum(F.col(value_col).cast("decimal(18,2)")).cast("double") / F.count(value_col))
            .alias("average_waiting_time")
        )
    )


_DAILY_ORACLE = """
SELECT CAST(day(ts) AS INTEGER) AS day,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(value) AS average_waiting_time
FROM events
WHERE month(ts) = 1
GROUP BY 1
"""


@register("daily_avg_wait_january", oracle=_DAILY_ORACLE, tags=("agg", "temporal"))
def q_daily_avg_wait(spark: SparkSession, sf_dir: str) -> DataFrame:
    return daily_average(load_table(spark, sf_dir, "events"), "ts", "value", month=1)


_ANOMALY_ORACLE = f"""
SELECT day, average_waiting_time FROM (
  SELECT CAST(day(ts) AS INTEGER) AS day,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(value) AS average_waiting_time
  FROM events
  WHERE month(ts) = 1
  GROUP BY 1
) WHERE average_waiting_time > {WAIT_THRESHOLD}
"""


@register("anomalous_wait_days", oracle=_ANOMALY_ORACLE, tags=("agg", "temporal"))
def q_anomalous_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Days whose average exceeds the threshold (``codes/task5.py:91-92``,
    kept distributed instead of pandas-side)."""
    daily = daily_average(load_table(spark, sf_dir, "events"), "ts", "value", month=1)
    return daily.filter(F.col("average_waiting_time") > WAIT_THRESHOLD)
