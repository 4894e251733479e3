"""Physical-plan pins: the plan we *want*, not just the first one that runs.

At 100 TB these properties are the difference between minutes and days:
dimension joins must broadcast, scans must prune to referenced columns,
top-K must not materialize a global sort, and no operator may degenerate
into a cartesian product (except the deliberate brute-force ANN baseline).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.operators.anomaly import q_daily_avg_wait
from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.operators.enrich import enriched_trips
from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.operators.rollup import q_trip_count
from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.operators.topk import q_route_revenue_top30
from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.plans import plan_string

from .conftest import SF_SMOKE


def test_enrich_uses_broadcast_joins(spark):
    plan = plan_string(enriched_trips(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_rollup_prunes_scan_columns(spark):
    plan = plan_string(q_trip_count(spark, SF_SMOKE))
    # the lineitem scan must read only the two referenced columns
    scan = [line for line in plan.splitlines() if "ReadSchema" in line]
    assert scan, plan
    schema_line = scan[0]
    assert "l_returnflag" in schema_line and "l_shipdate" in schema_line
    assert "l_extendedprice" not in schema_line and "l_comment" not in schema_line


def test_rollup_has_partial_aggregation(spark):
    plan = plan_string(q_trip_count(spark, SF_SMOKE))
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_topk_plans_take_ordered_not_global_sort(spark):
    plan = plan_string(q_route_revenue_top30(spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in plan


def test_month_filter_pushed_to_scan(spark):
    df = q_daily_avg_wait(spark, SF_SMOKE)
    plan = plan_string(df)
    # the January predicate must sit in the scan stage (pushed/partial),
    # not above a full materialization — look for a PushedFilters or an
    # early Filter directly over the FileScan
    assert "month" in plan.lower()
    assert "CartesianProduct" not in plan


def test_whole_stage_codegen_on_hot_path(spark):
    plan = plan_string(q_trip_count(spark, SF_SMOKE), mode="codegen")
    assert "WholeStageCodegen" in plan


def test_star_join_broadcasts_every_dimension(spark):
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.operators.olap import q_revenue_by_nation

    plan = plan_string(q_revenue_by_nation(spark, SF_SMOKE))
    # customer, nation, region all ride the broadcast hint; only the
    # fact×fact lineitem⋈orders edge may shuffle
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan


def test_segment_filter_pushed_into_customer_scan(spark):
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.operators.olap import q_top_building_orders

    plan = plan_string(q_top_building_orders(spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in plan
    # the BUILDING predicate must reach the parquet scan
    pushed = [line for line in plan.splitlines() if "PushedFilters" in line and "BUILDING" in line]
    assert pushed, plan
