"""Bucketed trip warehouse — the amortized answer to the fact×fact shuffle.

``enriched_trips`` joins lineitem⋈orders on orderkey: at 100 TB that is the
single heaviest exchange in the rideshare tier, and it is paid by EVERY
query built on the enriched view.  The warehouse pays that shuffle once at
ingest instead: ``build_trip_warehouse`` writes lineitem and orders as
bucketed+sorted managed tables keyed by orderkey, after which the join is
exchange-free — Catalyst reads the bucketing metadata, sees both sides
already hash-distributed on the join key, and plans a sort-merge join with
no Exchange and no Sort (pinned in ``tests/test_bucketing.py``).

This is deliberately NOT wired into the registered queries: the driver's
correctness harness runs against the raw parquet directories, and a
registered query that writes managed tables into an arbitrary cwd-relative
warehouse would be a side effect, not a query.  Pipelines opt in via
``enriched_trips(..., use_warehouse=True)`` after a one-time build.
"""

from __future__ import annotations

import os
import re
import shutil
from urllib.parse import urlparse

from pyspark.sql import SparkSession

from .tables import load_table
from .sinks import write_bucketed_table

#: (table, bucket key) — the two sides of the fact×fact edge
_WAREHOUSE_SPEC = (("lineitem", "l_orderkey"), ("orders", "o_orderkey"))
DEFAULT_BUCKETS = 32


def _suffix(sf_dir: str) -> str:
    """Scale-factor-specific table suffix so warehouses for different test
    dirs coexist (sf0.001 → ``sf0_001``)."""
    return re.sub(r"[^0-9A-Za-z]+", "_", os.path.basename(os.path.normpath(sf_dir)))


def warehouse_table_names(sf_dir: str) -> dict[str, str]:
    sfx = _suffix(sf_dir)
    return {tbl: f"wh_{tbl}_{sfx}" for tbl, _ in _WAREHOUSE_SPEC}


def warehouse_exists(spark: SparkSession, sf_dir: str) -> bool:
    return all(
        spark.catalog.tableExists(name) for name in warehouse_table_names(sf_dir).values()
    )


def build_trip_warehouse(
    spark: SparkSession, sf_dir: str, n_buckets: int = DEFAULT_BUCKETS, force: bool = False
) -> dict[str, str]:
    """One-time ingest: write lineitem and orders bucketed by orderkey.

    Idempotent (skips existing tables unless ``force``).  Bucket count must
    match on both sides for the exchange-free join; at a real 100 TB ingest
    pick ``n_buckets`` so each bucket file lands in the 128 MB–1 GB range.
    Returns ``{source_table: warehouse_table_name}``.
    """
    names = warehouse_table_names(sf_dir)
    for tbl, key in _WAREHOUSE_SPEC:
        if force or not spark.catalog.tableExists(names[tbl]):
            if not spark.catalog.tableExists(names[tbl]):
                # a managed-table DIRECTORY left by an earlier session is not
                # in this session's (in-memory derby) catalog, and saveAsTable
                # refuses to reuse the location (LOCATION_ALREADY_EXISTS) —
                # the warehouse is a rebuildable cache we own, so clear it
                _remove_stray_location(spark, names[tbl])
            write_bucketed_table(load_table(spark, sf_dir, tbl), names[tbl], key, n_buckets)
    return names


def _remove_stray_location(spark: SparkSession, table: str) -> None:
    """Delete an orphaned managed-table directory (location exists on the
    local filesystem, table absent from the current catalog)."""
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse"))
    if wh.scheme not in ("", "file"):
        return  # non-local warehouse: nothing we should touch
    loc = os.path.join(wh.path or wh.netloc, table.lower())
    if os.path.exists(loc):
        shutil.rmtree(loc, ignore_errors=True)


# --- user-bucketed events warehouse ---------------------------------------------

def events_warehouse_name(sf_dir: str) -> str:
    return f"wh_events_{_suffix(sf_dir)}"


def events_warehouse_exists(spark: SparkSession, sf_dir: str) -> bool:
    return spark.catalog.tableExists(events_warehouse_name(sf_dir))


def build_events_warehouse(
    spark: SparkSession, sf_dir: str, n_buckets: int = DEFAULT_BUCKETS, force: bool = False
) -> str:
    """One-time ingest of the events fact bucketed by ``user_id`` and
    sorted within buckets by ``(user_id, ts, event_id)`` — the behavioral
    tier's counterpart to the orderkey trip warehouse.  Every user-keyed
    aggregation (feature vectors, retention, growth accounting) drops its
    Exchange, and user-partitioned WINDOWS (sessionize, transitions, lag
    features) inherit both the distribution and the sort from the scan —
    the two heaviest recurring costs of the events tier, paid once.
    Idempotent; returns the managed-table name."""
    name = events_warehouse_name(sf_dir)
    if force or not spark.catalog.tableExists(name):
        if not spark.catalog.tableExists(name):
            _remove_stray_location(spark, name)
        write_bucketed_table(
            load_table(spark, sf_dir, "events"),
            name,
            "user_id",
            n_buckets,
            sort_by=["user_id", "ts", "event_id"],
        )
    return name
