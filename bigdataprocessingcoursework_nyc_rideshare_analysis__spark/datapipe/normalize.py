"""Per-group feature normalization — declarative window form (the plan to
run) plus the ``applyInPandas`` grouped-map form (the API surface, proven
equivalent).

The grouped-map pattern — whole group in, whole group out as one pandas
frame — is the escape hatch for per-group logic that needs the full group in
memory (model scoring, per-entity calibration).  Min-max scaling is used
here because its arithmetic ((x - min) / (max - min)) is bit-deterministic:
min/max are order-independent, so the DuckDB oracle matches exactly even
through the Arrow round-trip — proving the plumbing without a tolerance
fudge.

WHICH FORM TO RUN: for an expressible-in-SQL scaler over MANY SMALL groups
(per-user events: ~10 rows/group), grouped-map is the wrong physical shape
— one Python function call + two pandas frame constructions per group make
the per-group overhead, not the arithmetic, the cost (measured 3.7 s vs
0.4 s at sf0.1).  The registered query therefore plans the window form
(one shuffle, JVM-side, any group size); ``minmax_normalize`` remains the
grouped-map escape hatch for logic a window can't express, and
``test_datapipe.py`` pins the two bit-identical.  The UDF is a closure —
see the pickle-by-value rule in ``streaming.stateful``.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
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


def minmax_normalize_window(df: DataFrame, key: str = "user_id", value: str = "value") -> DataFrame:
    """Window-function formulation of the same scaler: one hash exchange on
    the key, unbounded min/max frames, all JVM-side — the shape that wins
    whenever the per-group logic is SQL-expressible (any group size, no
    per-group Python dispatch)."""
    from pyspark.sql import Window

    w = Window.partitionBy(key)
    lo, hi = F.min(value).over(w), F.max(value).over(w)
    return df.select(
        "event_id",
        F.col(key).alias("user_id"),
        F.col(value).alias("value"),
        F.when(hi > lo, (F.col(value) - lo) / (hi - lo)).alias("norm_value"),
    )


_MINMAX_ORACLE = """
SELECT event_id, user_id, value,
       CASE WHEN MAX(value) OVER w > MIN(value) OVER w
            THEN (value - MIN(value) OVER w) / (MAX(value) OVER w - MIN(value) OVER w)
       END AS norm_value
FROM events
WINDOW w AS (PARTITION BY user_id)
"""


@register("minmax_normalized_values", oracle=_MINMAX_ORACLE, tags=("datapipe", "window"))
def q_minmax_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user min-max scaling, window form (see module docstring for why
    the registered plan is the window, not the grouped-map: ~10-row groups
    make per-group Python dispatch the dominant cost — 9× at sf0.1)."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    return minmax_normalize_window(ev)
