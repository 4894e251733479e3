"""Declarative data-quality constraint suite (Deequ-style) — schema/content
validation as an engine operator.

A constraint set (completeness, uniqueness, domain membership, range,
positivity, referential integrity) evaluates in ONE aggregation pass over
the table — every metric is a conditional sum or count-distinct inside the
same ``agg`` — plus one anti-join per foreign-key check.  Output is the
audit table a pipeline gates on: (constraint_name, metric, passed), where
``metric`` is the violation count (row count for the non-emptiness check).

This is the ingest-side guard a 100 TB pipeline runs before promoting a
snapshot: one scan however many constraints you declare (they share the
single aggregation), FK checks shuffle on the key only.  The pattern is
public knowledge via AWS Deequ / Great Expectations; the implementation is
plain conditional aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_tables

ORDERS_DATE_LO = "1995-01-01 00:00:00"
ORDERS_DATE_HI = "2001-12-31 00:00:00"
ORDER_STATUS_DOMAIN = ("O", "F", "P")


def violations(cond: Column) -> Column:
    """Count of rows violating ``cond == False`` ... i.e. rows where the
    violation predicate ``cond`` holds.  NULL predicate counts as a
    violation for completeness-style checks only if the caller encodes it."""
    return F.sum(F.when(cond, 1).otherwise(0)).cast("long")


def run_checks(
    df: DataFrame, checks: list[tuple[str, Column, bool]], fk_frames: list[tuple[str, DataFrame]] = ()
) -> DataFrame:
    """Evaluate constraints in one aggregation pass.

    ``checks``: (name, metric aggregate Column, pass_iff_zero) — with
    pass_iff_zero=False the check passes iff metric > 0 (non-emptiness).
    ``fk_frames``: (name, single-row DataFrame with an ``orphans`` column)
    appended via cross join — one per referential-integrity check."""
    metrics = df.agg(*[m.alias(f"m{i}") for i, (_, m, _) in enumerate(checks)])
    for _, fk in fk_frames:
        metrics = metrics.crossJoin(fk)
    rows = []
    for i, (name, _, pass_iff_zero) in enumerate(checks):
        m = F.col(f"m{i}")
        passed = (m == 0) if pass_iff_zero else (m > 0)
        rows.append(F.struct(F.lit(name).alias("constraint_name"), m.alias("metric"), passed.alias("passed")))
    for j, (name, _) in enumerate(fk_frames):
        m = F.col(f"orphans{j}")
        rows.append(F.struct(F.lit(name).alias("constraint_name"), m.alias("metric"), (m == 0).alias("passed")))
    return metrics.select(F.explode(F.array(*rows)).alias("c")).select("c.*")


_DQ_ORACLE = f"""
WITH m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS dup_keys,
         CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_cust,
         CAST(SUM(CASE WHEN NOT (o_totalprice > 0) THEN 1 ELSE 0 END) AS BIGINT) AS nonpos_price,
         CAST(SUM(CASE WHEN o_orderstatus NOT IN {ORDER_STATUS_DOMAIN!r} THEN 1 ELSE 0 END) AS BIGINT) AS bad_status,
         CAST(SUM(CASE WHEN o_orderdate < TIMESTAMP '{ORDERS_DATE_LO}'
                         OR o_orderdate > TIMESTAMP '{ORDERS_DATE_HI}' THEN 1 ELSE 0 END) AS BIGINT) AS bad_date
  FROM orders
), fk AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS orphans
  FROM orders o WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
)
SELECT 'orders_nonempty' AS constraint_name, n_rows AS metric, n_rows > 0 AS passed FROM m
UNION ALL SELECT 'o_orderkey_unique', dup_keys, dup_keys = 0 FROM m
UNION ALL SELECT 'o_custkey_complete', null_cust, null_cust = 0 FROM m
UNION ALL SELECT 'o_totalprice_positive', nonpos_price, nonpos_price = 0 FROM m
UNION ALL SELECT 'o_orderstatus_in_domain', bad_status, bad_status = 0 FROM m
UNION ALL SELECT 'o_orderdate_in_range', bad_date, bad_date = 0 FROM m
UNION ALL SELECT 'o_custkey_fk_customer', orphans, orphans = 0 FROM fk
"""


def orders_checks() -> list[tuple[str, Column, bool]]:
    """The orders-table constraint suite (shared by the registered query and
    the dirty-data tests)."""
    status_arr = F.array(*[F.lit(s) for s in ORDER_STATUS_DOMAIN])
    return [
        ("orders_nonempty", F.count(F.lit(1)).cast("long"), False),
        (
            "o_orderkey_unique",
            (F.count(F.lit(1)) - F.count_distinct(F.col("o_orderkey"))).cast("long"),
            True,
        ),
        ("o_custkey_complete", violations(F.col("o_custkey").isNull()), True),
        ("o_totalprice_positive", violations(~(F.col("o_totalprice") > 0)), True),
        (
            "o_orderstatus_in_domain",
            violations(~F.array_contains(status_arr, F.col("o_orderstatus"))),
            True,
        ),
        (
            "o_orderdate_in_range",
            violations(
                (F.col("o_orderdate") < F.lit(ORDERS_DATE_LO).cast("timestamp"))
                | (F.col("o_orderdate") > F.lit(ORDERS_DATE_HI).cast("timestamp"))
            ),
            True,
        ),
    ]


@register("dq_orders_suite", oracle=_DQ_ORACLE, tags=("dq", "audit"))
def q_dq_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality audit of the orders table: six single-pass constraints
    plus customer referential integrity (see module docstring)."""
    t = load_tables(spark, sf_dir, "orders", "customer")
    orders, customer = t["orders"], t["customer"]
    orphans = (
        orders.join(customer.select("c_custkey"), orders["o_custkey"] == F.col("c_custkey"), "left_anti")
        .agg(F.count(F.lit(1)).cast("long").alias("orphans0"))
    )
    return run_checks(orders, orders_checks(), fk_frames=[("o_custkey_fk_customer", orphans)])
