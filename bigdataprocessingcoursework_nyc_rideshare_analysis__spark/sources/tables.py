"""Readers for the driver's synthetic star schema (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file each under ``{sf_dir}/``.

Scale notes (100 TB design point):
- parquet scans stay fully declarative (``spark.read.parquet``) so Catalyst
  keeps predicate pushdown / column pruning / partition pruning; at scale the
  fact tables would be written partitioned by date and these readers pick
  partition pruning up for free.
- ``events.ts`` has shipped as both parquet TIMESTAMP(NANOS) (read as
  epoch-nanos long via ``nanosAsLong``, floor-divided to micros) and
  TIMESTAMP(MICROS) without UTC adjustment (read as TIMESTAMP_NTZ, re-tagged
  to the UTC session zone); both normalizations yield the same epoch-micros
  DuckDB sees, so oracle comparisons agree exactly either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import configure

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: timestamp columns whose physical parquet encoding varies by generator
#: version: nanosecond timestamps arrive as epoch-nanos longs (via
#: ``nanosAsLong``), microsecond timestamps without UTC adjustment arrive as
#: TIMESTAMP_NTZ.  Both are normalized to plain TimestampType so every
#: downstream expression (``unix_micros``, window ranges, date funcs) sees
#: one type regardless of how the data was written.
_TS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one star-schema table, normalizing timestamp encodings."""
    configure(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col in _TS_COLS.get(name, ()):
        dtype = dict(df.dtypes).get(col)
        if dtype == "bigint":
            # floor-truncate nanos → micros with integer `div` (no double
            # round-trip: epoch-nanos exceeds double's 53-bit mantissa).
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
        elif dtype == "timestamp_ntz":
            # session tz is pinned to UTC (session.RUNTIME_CONFS), so this
            # cast is a pure re-tag: the same wall-clock micros DuckDB sees
            # in its naive TIMESTAMP, byte-identical epoch values.  Cast to
            # the *instant* type explicitly — a bare "timestamp" resolves
            # via spark.sql.timestampType, which on an externally-built
            # session set to TIMESTAMP_NTZ would make this a silent no-op
            # (RUNTIME_CONFS also pins TIMESTAMP_LTZ, belt-and-braces).
            df = df.withColumn(col, F.col(col).cast("timestamp_ltz"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Load several tables at once; defaults to all of them."""
    use = names or TABLE_NAMES
    return {name: load_table(spark, sf_dir, name) for name in use}


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Expose tables as temp views (named after the table) so queries can be
    written in plain ``spark.sql`` — the engine's SQL API surface.  Views are
    lazy: registering is metadata-only, scans still prune and push down."""
    for name, df in load_tables(spark, sf_dir, *names).items():
        df.createOrReplaceTempView(name)
