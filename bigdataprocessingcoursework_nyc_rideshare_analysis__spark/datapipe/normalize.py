"""Grouped-map feature normalization via ``applyInPandas``.

The grouped-map pattern — whole group in, whole group out as one pandas
frame — is the escape hatch for per-group logic that needs the full group in
memory (model scoring, per-entity calibration).  Min-max scaling is used
here because its arithmetic ((x - min) / (max - min)) is bit-deterministic:
min/max are order-independent, so the DuckDB oracle matches exactly even
through the Arrow round-trip — proving the plumbing without a tolerance
fudge.

Scale: one shuffle on the group key; each group must fit in one worker's
memory (fine for per-user events; for giant groups fall back to the
window-function formulation, also shown in the oracle).  The UDF is a
closure — see the pickle-by-value rule in ``streaming.stateful``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from ..registry import register
from ..sources import load_table

NORMALIZED_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("value", DoubleType()),
        StructField("norm_value", DoubleType()),
    ]
)


def minmax_normalize(df: DataFrame, key: str = "user_id", value: str = "value") -> DataFrame:
    """Per-key min-max scaling to [0, 1]; constant groups yield null."""

    def scale(pdf: pd.DataFrame) -> pd.DataFrame:
        lo, hi = pdf[value].min(), pdf[value].max()
        # constant groups must be true NULLs, not NaN: a float64 Series of
        # None is NaN, which Arrow ships to Spark as NaN — the SQL CASE
        # oracle yields NULL, and NaN vs NULL hash-mismatches.  The masked
        # nullable Float64 dtype round-trips through Arrow as real nulls.
        norm = (
            (pdf[value] - lo) / (hi - lo)
            if hi > lo
            else pd.array([pd.NA] * len(pdf), dtype="Float64")
        )
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "user_id": pdf[key],
                "value": pdf[value],
                "norm_value": norm,
            }
        )

    return df.groupBy(key).applyInPandas(scale, schema=NORMALIZED_SCHEMA)


_MINMAX_ORACLE = """
SELECT event_id, user_id, value,
       CASE WHEN MAX(value) OVER w > MIN(value) OVER w
            THEN (value - MIN(value) OVER w) / (MAX(value) OVER w - MIN(value) OVER w)
       END AS norm_value
FROM events
WINDOW w AS (PARTITION BY user_id)
"""


@register("minmax_normalized_values", oracle=_MINMAX_ORACLE, tags=("datapipe", "grouped-map"))
def q_minmax_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    return minmax_normalize(ev)
