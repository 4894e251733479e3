"""Sink discipline: single-file CSV only for small aggregates; partitioned
parquet round-trips with partition pruning available to readers."""

from __future__ import annotations

import glob
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.sources import load_table
from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.sources.sinks import (
    SinkSafetyError,
    write_partitioned_parquet,
    write_single_csv,
)

from .conftest import SF_SMOKE


@pytest.fixture()
def outdir():
    d = tempfile.mkdtemp(prefix="sink_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_single_csv_one_file_with_header(spark, outdir):
    df = spark.createDataFrame([("Uber", 1, 10), ("Lyft", 1, 2)], ["business", "month", "n"])
    write_single_csv(df, f"{outdir}/agg")
    parts = glob.glob(f"{outdir}/agg/part-*.csv")
    assert len(parts) == 1  # coalesce(1): exactly one data file
    with open(parts[0]) as f:
        header = f.readline().strip()
    assert header == "business,month,n"


def test_single_csv_refuses_fact_scale(spark, outdir):
    big = spark.range(1000)
    with pytest.raises(SinkSafetyError):
        write_single_csv(big, f"{outdir}/big", max_rows=100)


def test_partitioned_parquet_roundtrip(spark, outdir):
    df = spark.createDataFrame(
        [("Uber", 1, 10.0), ("Lyft", 2, 2.0), ("Uber", 2, 5.0)], ["business", "month", "v"]
    )
    write_partitioned_parquet(df, f"{outdir}/pq", partition_by=["month"])
    assert glob.glob(f"{outdir}/pq/month=1")  # hive-style layout → partition pruning
    back = spark.read.parquet(f"{outdir}/pq")
    assert back.count() == 3
    pruned = back.filter(F.col("month") == 1)
    assert pruned.count() == 1


def test_partition_filter_prunes_at_plan_level(spark, outdir):
    """A filter on the partition column must become a PartitionFilters entry
    on the scan (directories skipped at planning) — not a post-scan Filter
    over all files."""
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.plans import plan_string

    df = spark.createDataFrame(
        [("Uber", m, float(m)) for m in range(1, 6)], ["business", "month", "v"]
    )
    write_partitioned_parquet(df, f"{outdir}/pruned", partition_by=["month"])
    pruned = spark.read.parquet(f"{outdir}/pruned").filter(F.col("month") == 3)
    plan = plan_string(pruned)
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and "month" in pf[0], plan


def test_json_lines_roundtrip_with_schema(spark, outdir):
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.sources.sinks import (
        read_json_lines,
        write_json_lines,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    path = f"{outdir}/docs_jsonl"
    write_json_lines(docs, path)
    back = read_json_lines(spark, path, schema=docs.schema)
    assert back.schema == docs.schema
    assert sorted(r["doc_id"] for r in back.collect()) == sorted(
        r["doc_id"] for r in docs.collect()
    )


def test_orc_roundtrip_and_filter_pushdown(spark, outdir):
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.sources.sinks import (
        read_orc,
        write_orc,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    path = f"{outdir}/docs_orc"
    write_orc(docs, path)
    back = read_orc(spark, path)
    assert back.count() == docs.count()
    plan = back.filter(back.doc_id > 100).select("doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(doc_id), GreaterThan(doc_id,100)" in plan
