"""Central query registry wiring operators to the driver contract.

Each named query is a ``(spark, sf_dir) -> DataFrame`` callable plus (when
SQL-expressible) the equivalent ANSI SQL the DuckDB oracle runs on the same
parquet tables.  ``__spark_entry__.queries()`` / ``oracle_sql()`` read from
here; keeping the Spark code and its oracle adjacent in each operator module
keeps the two in sync.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None  # ANSI SQL for DuckDB, or None → rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: add a query to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, tags=tags)
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every operator module (side effect: registration) and return
    the full registry."""
    from .operators import (  # noqa: F401
        enrich,
        rollup,
        topk,
        averages,
        anomaly,
        filters,
        pivot,
        events,
        setops,
        analytics,
        temporal,
        windows,
        olap,
        merge,
    )
    from .datapipe import dedup, similarity, textstats, multimodal, normalize, curate, cluster  # noqa: F401
    from .sources import pydatasource  # noqa: F401

    return REGISTRY
