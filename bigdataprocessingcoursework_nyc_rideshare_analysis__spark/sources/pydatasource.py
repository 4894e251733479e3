"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API) — the
engine's "bring your own source" extension point.

The reference reads only CSV (SURVEY.md §2.1); a complete engine must show
how a *new* source format plugs in.  This one generates a deterministic
synthetic document corpus: trivial content, but the full surface is real —
``DataSource``/``DataSourceReader`` registration, schema declaration,
option passing, and (the part that matters at scale) **partition planning**:
``partitions()`` splits the id range so every executor reads its own slice
in parallel; nothing funnels through the driver.

Because generation is a pure function of ``doc_id``, the same corpus is
expressible in SQL — so even a custom Python source gets a DuckDB oracle
(``generate_series`` + string ops), keeping the differential-test discipline.

Classes are built inside a factory: cloudpickle serializes locally-defined
classes BY VALUE, so executors never need this package importable (the
same worker-import rule as every mapInPandas closure here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..registry import register

SOURCE_NAME = "synthetic_docs"
DEFAULT_N_DOCS = 1000
DEFAULT_PARTITIONS = 8


def _build_datasource():
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    class RangePartition(InputPartition):
        def __init__(self, start: int, end: int):
            self.start, self.end = start, end

    class SyntheticDocsReader(DataSourceReader):
        def __init__(self, options):
            self.n_docs = int(options.get("n_docs", DEFAULT_N_DOCS))
            self.n_partitions = int(options.get("partitions", DEFAULT_PARTITIONS))

        def partitions(self):
            step = -(-self.n_docs // self.n_partitions)
            return [
                RangePartition(lo, min(lo + step, self.n_docs))
                for lo in range(0, self.n_docs, step)
            ]

        def read(self, partition):
            # Yield ONE Arrow RecordBatch per partition, not per-row Python
            # tuples: the per-row path costs a pickle round-trip and type
            # coercion for every record (measured ~4-6 s for 1,000 rows —
            # the per-row Python tax).  Spark 4's DataSource API accepts
            # pyarrow.RecordBatch directly, so the whole partition crosses
            # the boundary as one columnar buffer.
            import pyarrow as pa

            ids = list(range(partition.start, partition.end))
            suffixes = ["w " * r for r in range(7)]
            texts = [f"synthetic document {i} body {suffixes[i % 7]}" for i in ids]
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, type=pa.int64()), pa.array(texts, type=pa.string())],
                names=["doc_id", "text"],
            )

    class SyntheticDocsSource(DataSource):
        @classmethod
        def name(cls):
            return SOURCE_NAME

        def schema(self):
            return "doc_id bigint, text string"

        def reader(self, schema):
            return SyntheticDocsReader(self.options)

    return SyntheticDocsSource


def register_synthetic_source(spark: SparkSession) -> None:
    spark.dataSource.register(_build_datasource())


_SYNTH_ORACLE = f"""
SELECT i AS doc_id,
       'synthetic document ' || CAST(i AS VARCHAR) || ' body ' ||
         repeat('w ', CAST(i % 7 AS INTEGER)) AS text
FROM generate_series(0, {DEFAULT_N_DOCS - 1}) t(i)
"""


@register("synthetic_source_scan", oracle=_SYNTH_ORACLE, tags=("source", "pydatasource"))
def q_synthetic_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan of the custom Python data source (sf_dir unused: the source is
    generative).  The oracle reproduces the generator in SQL — proving the
    custom source integrates without giving up differential testing."""
    register_synthetic_source(spark)
    return (
        spark.read.format(SOURCE_NAME)
        .option("n_docs", DEFAULT_N_DOCS)
        .option("partitions", DEFAULT_PARTITIONS)
        .load()
    )
