"""Salted skew utilities must be result-identical to their unsalted forms."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.functions.skew import (
    salted_join,
    salted_sum_count,
)
from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.sources import load_table

from .conftest import SF_SMOKE


def test_salted_agg_equals_plain_agg(spark):
    li = load_table(spark, SF_SMOKE, "lineitem").select(
        F.col("l_returnflag").alias("k"), F.col("l_extendedprice").alias("v")
    )
    plain = {
        r["k"]: (r["n"], r["s"])
        for r in li.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("v").cast("decimal(18,2)")).cast("double").alias("s"),
        )
        .collect()
    }
    salted = {
        r["k"]: (r["trip_count"], r["total_value"])
        for r in salted_sum_count(li, ["k"], "v").collect()
    }
    assert salted == plain  # bit-identical (exact decimal is associative)


def test_salted_join_equals_plain_join(spark):
    li = load_table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_suppkey")
    sup = load_table(spark, SF_SMOKE, "supplier").select("s_suppkey", "s_name")
    plain = (
        li.join(sup, li["l_suppkey"] == sup["s_suppkey"], "left")
        .groupBy("s_name")
        .count()
    )
    salted = salted_join(li, sup, "l_suppkey", "s_suppkey").groupBy("s_name").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
