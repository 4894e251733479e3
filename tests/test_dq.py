"""Data-quality suite semantics: constraints must FIRE on dirty data (a
suite that can only pass proves nothing) and quantify violations exactly."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.operators.dq import (
    orders_checks,
    q_dq_orders,
    run_checks,
)

from .conftest import SF_SMOKE


def test_dq_clean_fixture_passes_all(spark):
    rows = {r["constraint_name"]: r for r in q_dq_orders(spark, SF_SMOKE).collect()}
    assert len(rows) == 7
    assert all(r["passed"] for r in rows.values()), rows
    assert rows["orders_nonempty"]["metric"] > 0
    assert all(
        rows[c]["metric"] == 0
        for c in rows
        if c != "orders_nonempty"
    )


def test_dq_constraints_fire_on_dirty_data(spark):
    ts = datetime.datetime(1996, 6, 1)
    dirty = spark.createDataFrame(
        [
            # (orderkey, custkey, status, totalprice, orderdate)
            (1, 10, "O", 100.0, ts),
            (1, 11, "F", 50.0, ts),          # duplicate key
            (2, None, "P", 10.0, ts),         # null custkey
            (3, 12, "X", 20.0, ts),           # bad status
            (4, 13, "O", -5.0, ts),           # non-positive price
            (5, 14, "O", 0.0, ts),            # zero price (also non-positive)
            (6, 15, "O", 30.0, datetime.datetime(1980, 1, 1)),  # out of range
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, o_orderdate timestamp",
    )
    got = {r["constraint_name"]: r for r in run_checks(dirty, orders_checks()).collect()}
    assert got["orders_nonempty"]["passed"] and got["orders_nonempty"]["metric"] == 7
    assert not got["o_orderkey_unique"]["passed"] and got["o_orderkey_unique"]["metric"] == 1
    assert not got["o_custkey_complete"]["passed"] and got["o_custkey_complete"]["metric"] == 1
    assert not got["o_totalprice_positive"]["passed"] and got["o_totalprice_positive"]["metric"] == 2
    assert not got["o_orderstatus_in_domain"]["passed"] and got["o_orderstatus_in_domain"]["metric"] == 1
    assert not got["o_orderdate_in_range"]["passed"] and got["o_orderdate_in_range"]["metric"] == 1


def test_dq_single_aggregation_pass(spark):
    """All non-FK constraints must share ONE aggregation over one scan —
    the whole point of declaring them together."""
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.plans import plan_string

    spark.catalog.clearCache()
    plan = plan_string(q_dq_orders(spark, SF_SMOKE))
    # one scan for the metrics agg + one for the anti-join probe + customer
    assert plan.count("orders.parquet") <= 2, plan


def test_observe_audit_matches_dedicated_aggregation(spark):
    """Observed metrics must equal a dedicated aggregation over the same
    frame, arrive via the action itself (CollectMetrics in the plan), and
    measure exactly the row-flow at the attach point (post-filter here)."""
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.operators.dq import (
        observe_audit,
        violations,
    )
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.sources import load_table

    orders = load_table(spark, SF_SMOKE, "orders").filter(F.col("o_totalprice") > 1000)
    metrics = {
        "n_rows": F.count(F.lit(1)).cast("long"),
        "null_cust": violations(F.col("o_custkey").isNull()),
        "total_price": F.sum(F.col("o_totalprice").cast("decimal(18,2)")),
    }
    instrumented, obs = observe_audit(orders, metrics)
    assert "CollectMetrics" in instrumented._jdf.queryExecution().toString()

    n_consumed = instrumented.count()  # the action the metrics ride on
    got = obs.get
    want = orders.agg(*[m.alias(k) for k, m in metrics.items()]).collect()[0].asDict()
    assert got["n_rows"] == n_consumed == want["n_rows"]
    assert got["null_cust"] == want["null_cust"] == 0
    assert got["total_price"] == want["total_price"]
