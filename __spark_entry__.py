"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship enrichment query at sf0.001;
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 plus the datapipe extensions, backed by the package registry
(`bigdataprocessingcoursework_nyc_rideshare_analysis__spark.registry`).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.registry import load_all  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.operators.enrich import enriched_trips

    return enriched_trips(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query; LSH/stateful
    ops are deliberately omitted (rows-only check)."""
    return {name: spec.oracle for name, spec in load_all().items() if spec.oracle is not None}
