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


def test_aqe_splits_skewed_join_partition(spark):
    """The third leg of the skew toolkit (salting = rewrite,
    join_key_skew_profile = detection, THIS = runtime mitigation): with the
    skew thresholds stood down to local scale, AQE must detect the hot key
    and split its partition at runtime — the executed plan's sort-merge
    join carries the skew=true marker.  At 100 TB the same mechanism fires
    on its default thresholds with no query change; this pins that the
    engine's session leaves AQE free to do so (e.g. no accidental
    skewJoin.enabled=false, no shuffle-partition pinning that blocks it)."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "false",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # one hot key carrying ~100k rows vs 1k cold keys with 10 each
        hot = spark.range(0, 100_000).select(
            F.lit(0).alias("k"), F.col("id").alias("payload")
        )
        cold = spark.range(0, 10_000).select(
            (F.col("id") % 1_000 + 1).alias("k"), F.col("id").alias("payload")
        )
        left = hot.union(cold)
        right = spark.range(0, 1_001).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("attr")
        )
        joined = left.join(right, "k")
        # execute THIS df's plan (count() would finalize a different query)
        assert len(joined.collect()) == 110_000
        final_plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final_plan, final_plan[:4000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_keyed_running_sum_equals_plain_keyed_window(spark):
    """The two-level range-partitioned form (round-7 packing rework) must be
    bit-identical to Window.partitionBy(key) — including across uneven key
    sizes and a key small enough to fit entirely inside one range
    partition."""
    from pyspark.sql import Window

    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.functions.skew import (
        keyed_running_sum,
    )

    df = spark.range(0, 5_000).select(
        (F.when(F.col("id") % 10 < 7, F.lit("big")).otherwise(
            (F.col("id") % 3).cast("string"))).alias("k"),
        F.col("id").alias("ord"),
        (F.col("id") % 97 + 1).alias("v"),
    )
    w = (
        Window.partitionBy("k").orderBy("ord")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    plain = {(r["k"], r["ord"]): r["cum"] for r in df.withColumn("cum", F.sum("v").over(w)).collect()}
    two_level = {
        (r["k"], r["ord"]): r["cum"]
        for r in keyed_running_sum(df, ["k"], ["ord"], "v", "cum").collect()
    }
    assert two_level == plain


def test_keyed_row_number_equals_plain_keyed_window(spark):
    from pyspark.sql import Window

    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.functions.skew import (
        keyed_row_number,
    )

    df = spark.range(0, 3_000).select(
        (F.col("id") % 4).alias("k"), (F.col("id") * 7 % 3_001).alias("ord")
    )
    w = Window.partitionBy("k").orderBy("ord")
    plain = {
        (r["k"], r["ord"]): r["rn"]
        for r in df.withColumn("rn", F.row_number().over(w)).collect()
    }
    two_level = {
        (r["k"], r["ord"]): r["rn"]
        for r in keyed_row_number(df, ["k"], ["ord"], "rn").collect()
    }
    assert two_level == plain


def test_ntile_from_rn_equals_window_ntile(spark):
    """ntile_from_rn must reproduce Spark's window NTILE bit-for-bit across
    the remainder edge cases the sf oracles never hit: n < buckets,
    n == buckets, n % buckets ∈ {0, 1, buckets-1}."""
    from pyspark.sql import Window

    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.functions.skew import (
        global_row_number,
        ntile_from_rn,
    )

    for n, buckets in [(1, 4), (3, 4), (4, 4), (5, 4), (7, 4), (8, 4), (9, 4), (100, 7), (13, 5)]:
        df = spark.range(n).select(F.col("id").alias("k"), (F.col("id") * 37 % 101).alias("v"))
        w = Window.orderBy("v", "k")
        want = {
            r["k"]: r["t"]
            for r in df.select("k", F.ntile(buckets).over(w).alias("t")).collect()
        }
        rn = global_row_number(df, ["v", "k"], "rn")
        got = {
            r["k"]: r["t"]
            for r in rn.select(
                "k", ntile_from_rn(F.col("rn"), F.lit(n), buckets).cast("int").alias("t")
            ).collect()
        }
        assert got == want, (n, buckets)


def test_salted_shuffle_layout_has_no_hot_partition(spark):
    """The straggler pin for the measured skew receipt
    (``tools/scaling_curve.py --skew``): under hash partitioning on the
    bare key, a 40%-hot key owns ≥40% of ONE shuffle partition (the
    single-task straggler the salted path exists to break); partitioning
    on (key, salt) must cap every partition near its fair share.  Pinned
    on a synthetic hot-key frame shaped like the receipt's fact
    (hot iff mix(id) % 10 < 4)."""
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.functions.skew import (
        DEFAULT_SALT_BUCKETS,
        with_salt,
    )

    n, n_keys, par = 40_000, 997, 8
    base = spark.range(n).select(
        F.when(F.pmod(F.xxhash64("id"), F.lit(10)) < 4, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id", F.lit(1)), F.lit(n_keys)) + 1)
        .alias("k")
    )

    def max_share(frame, cols):
        dist = (
            frame.repartition(par, *[F.col(c) for c in cols])
            .groupBy(F.spark_partition_id().alias("p"))
            .count()
        )
        return dist.agg(F.max("count")).first()[0] / n

    # pmod(xxhash64, 10) < 4: hot share lands near 40%
    hot_share = base.filter(F.col("k") == 0).count() / n
    assert 0.3 <= hot_share <= 0.5
    unsalted = max_share(base, ["k"])
    salted = max_share(with_salt(base, DEFAULT_SALT_BUCKETS), ["k", "_salt"])
    assert unsalted >= hot_share  # the hot key serializes one partition
    # fair share is 1/par = 12.5%; allow hash-placement noise but nothing
    # resembling the hot partition
    assert salted <= 0.25
    assert salted < unsalted / 1.8
