"""aqe_off_clone: per-query conf isolation with parent re-sync semantics."""

from __future__ import annotations

from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.session import aqe_off_clone


def test_clone_is_cached_and_isolated(spark):
    c1 = aqe_off_clone(spark)
    c2 = aqe_off_clone(spark)
    assert c1 is c2  # one clone per parent — sweeps don't accumulate sessions
    assert c1 is not spark
    assert c1.conf.get("spark.sql.adaptive.enabled") == "false"
    # the parent keeps AQE (the right default everywhere else)
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"


def test_clone_resyncs_parent_confs_on_each_call(spark):
    """Round-6 advice: the cached clone must follow the PARENT's conf view —
    a harness retuning shuffle partitions mid-sweep propagates, and a conf
    mutated on the shared clone resets instead of persisting."""
    clone = aqe_off_clone(spark)
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        # parent retunes after the clone exists -> next call re-syncs
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        assert aqe_off_clone(spark).conf.get("spark.sql.shuffle.partitions") == "7"
        # a mutation leaked onto the shared clone resets on the next call
        clone.conf.set("spark.sql.shuffle.partitions", "3")
        assert aqe_off_clone(spark).conf.get("spark.sql.shuffle.partitions") == "7"
        # AQE stays off through every re-sync
        assert clone.conf.get("spark.sql.adaptive.enabled") == "false"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
