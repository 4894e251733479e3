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
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        DataSourceStreamReader,
        InputPartition,
    )

    # closure, not module-level: everything the executor-side readers touch
    # must pickle BY VALUE (workers don't import this package)
    def _gen_batch(start: int, end: int):
        """One Arrow RecordBatch of synthetic docs for [start, end) — shared
        by the batch and streaming readers so both surfaces emit identical
        rows."""
        import pyarrow as pa

        ids = list(range(start, end))
        suffixes = ["w " * r for r in range(7)]
        texts = [f"synthetic document {i} body {suffixes[i % 7]}" for i in ids]
        return pa.RecordBatch.from_arrays(
            [pa.array(ids, type=pa.int64()), pa.array(texts, type=pa.string())],
            names=["doc_id", "text"],
        )

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
            yield _gen_batch(partition.start, partition.end)

    class SyntheticDocsStreamReader(DataSourceStreamReader):
        """Micro-batch reader over the same generator: the offset is simply
        how many docs have been emitted.  Each trigger advances by
        ``batch_docs`` (admission control), ``partitions(start, end)``
        splits the batch range so executors read slices in parallel, and
        ``readBetweenOffsets`` replay (after failure) regenerates exactly
        the same rows — the determinism that makes end-to-end exactly-once
        possible downstream."""

        def __init__(self, options):
            self.n_docs = int(options.get("n_docs", DEFAULT_N_DOCS))
            self.n_partitions = int(options.get("partitions", DEFAULT_PARTITIONS))
            self.batch_docs = int(options.get("batch_docs", max(1, self.n_docs // 4)))

        def initialOffset(self):
            return {"pos": 0}

        def latestOffset(self):
            # grow by one micro-batch per trigger, capped at the corpus end
            self._latest = getattr(self, "_latest", 0)
            self._latest = min(self.n_docs, self._latest + self.batch_docs)
            return {"pos": self._latest}

        def partitions(self, start, end):
            lo, hi = start["pos"], end["pos"]
            step = max(1, -(-(hi - lo) // self.n_partitions))
            return [RangePartition(i, min(i + step, hi)) for i in range(lo, hi, step)]

        def read(self, partition):
            yield _gen_batch(partition.start, partition.end)

        def commit(self, end):
            pass  # nothing external to clean up: the generator is pure

    class SyntheticDocsSource(DataSource):
        @classmethod
        def name(cls):
            return SOURCE_NAME

        def schema(self):
            return "doc_id bigint, text string"

        def reader(self, schema):
            return SyntheticDocsReader(self.options)

        def streamReader(self, schema):
            return SyntheticDocsStreamReader(self.options)

    return SyntheticDocsSource


def register_synthetic_source(spark: SparkSession) -> None:
    spark.dataSource.register(_build_datasource())


# --- JSONL shard source with a committing writer -----------------------------

SHARDS_SOURCE_NAME = "doc_shards"
MANIFEST_NAME = "_MANIFEST.json"


def _build_shards_datasource():
    """JSONL shard store (the interchange format LLM corpora actually ship
    as) with the FULL Spark 4 Python DataSource surface: Arrow-batched
    ``DataSourceArrowWriter`` with a real two-phase commit, plus a reader
    that plans one partition per committed shard.

    Commit protocol (the cloud-storage pattern, exercised end-to-end):
    every write task streams its partition to an UNCOMMITTED ``_tmp-*``
    shard and returns a commit message; only the driver-side ``commit()``
    renames shards to final names and publishes the manifest — so a crashed
    or speculative task leaves debris that is never visible to readers
    (``abort()`` and the manifest reader both ignore ``_tmp-*``).  Readers
    list the MANIFEST, not the directory: torn writes cannot be read.  On a
    cluster the same steps target an object store; nothing in the protocol
    relies on a shared local filesystem beyond this demo deployment.
    """
    import json
    import os
    import uuid
    from dataclasses import dataclass

    from pyspark.sql.datasource import (
        DataSource,
        DataSourceArrowWriter,
        DataSourceReader,
        InputPartition,
        WriterCommitMessage,
    )

    @dataclass
    class ShardCommit(WriterCommitMessage):
        tmp_name: str
        final_name: str
        rows: int

    class ShardPartition(InputPartition):
        def __init__(self, path: str):
            self.path = path

    class DocShardsWriter(DataSourceArrowWriter):
        def __init__(self, options, overwrite: bool):
            self.path = options["path"]
            self.overwrite = overwrite

        def write(self, iterator):
            os.makedirs(self.path, exist_ok=True)
            shard = f"shard-{uuid.uuid4().hex}.jsonl"
            tmp = os.path.join(self.path, f"_tmp-{shard}")
            rows = 0
            with open(tmp, "w") as fh:
                for batch in iterator:  # Arrow RecordBatches, not per-row pickles
                    for row in batch.to_pylist():
                        fh.write(json.dumps(row, sort_keys=True) + "\n")
                        rows += 1
            return ShardCommit(tmp_name=f"_tmp-{shard}", final_name=shard, rows=rows)

        def commit(self, messages):
            manifest_path = os.path.join(self.path, MANIFEST_NAME)
            shards = []
            if not self.overwrite and os.path.exists(manifest_path):
                with open(manifest_path) as fh:
                    shards = json.load(fh)["shards"]
            elif self.overwrite and os.path.exists(manifest_path):
                with open(manifest_path) as fh:
                    for old in json.load(fh)["shards"]:
                        try:
                            os.remove(os.path.join(self.path, old["name"]))
                        except FileNotFoundError:
                            pass
            for m in messages:
                os.rename(
                    os.path.join(self.path, m.tmp_name), os.path.join(self.path, m.final_name)
                )
                shards.append({"name": m.final_name, "rows": m.rows})
            tmp_manifest = manifest_path + ".tmp"
            with open(tmp_manifest, "w") as fh:
                json.dump({"shards": sorted(shards, key=lambda s: s["name"])}, fh, indent=1)
            os.replace(tmp_manifest, manifest_path)  # atomic publish

        def abort(self, messages):
            for m in messages:
                if m is None:
                    continue
                try:
                    os.remove(os.path.join(self.path, m.tmp_name))
                except FileNotFoundError:
                    pass

    class DocShardsReader(DataSourceReader):
        def __init__(self, options):
            self.path = options["path"]

        def partitions(self):
            with open(os.path.join(self.path, MANIFEST_NAME)) as fh:
                manifest = json.load(fh)
            # one partition per committed shard; uncommitted _tmp-* debris
            # is invisible by construction
            return [
                ShardPartition(os.path.join(self.path, s["name"])) for s in manifest["shards"]
            ]

        def read(self, partition):
            import pyarrow as pa

            ids, texts = [], []
            with open(partition.path) as fh:
                for line in fh:
                    rec = json.loads(line)
                    ids.append(rec["doc_id"])
                    texts.append(rec["text"])
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, type=pa.int64()), pa.array(texts, type=pa.string())],
                names=["doc_id", "text"],
            )

    class DocShardsSource(DataSource):
        @classmethod
        def name(cls):
            return SHARDS_SOURCE_NAME

        def schema(self):
            return "doc_id bigint, text string"

        def reader(self, schema):
            return DocShardsReader(self.options)

        def writer(self, schema, overwrite):
            return DocShardsWriter(self.options, overwrite)

    return DocShardsSource


def register_doc_shards_source(spark: SparkSession) -> None:
    spark.dataSource.register(_build_shards_datasource())


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
