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
from ..sources import load_table, load_tables

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


RECON_TOP_K = 50

_RECON_ORACLE = f"""
WITH detail AS (
  SELECT l_orderkey AS o_orderkey,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS detail_total,
         COUNT(*) AS n_lines
  FROM lineitem GROUP BY 1
)
SELECT o.o_orderkey,
       CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS header_total,
       COALESCE(d.detail_total, 0.0) AS detail_total,
       COALESCE(d.n_lines, 0) AS n_lines,
       CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) AS DOUBLE) - COALESCE(d.detail_total, 0.0)
         AS delta
FROM orders o LEFT JOIN detail d ON d.o_orderkey = o.o_orderkey
ORDER BY abs(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) AS DOUBLE)
             - COALESCE(d.detail_total, 0.0)) DESC, o.o_orderkey
LIMIT {RECON_TOP_K}
"""


@register("order_revenue_reconciliation", oracle=_RECON_ORACLE, tags=("dq", "audit", "r5"))
def q_order_revenue_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header/detail reconciliation — the classic cross-table warehouse
    audit the single-table constraint suite (``dq_orders_suite``) cannot
    express: each order's header total against the exact-decimal sum of
    its line items, worst {RECON_TOP_K} discrepancies first (headerless
    lines are caught by the suite's FK anti-join; line-less headers
    surface here with detail_total 0).

    Money stays DECIMAL(18,2) through the sum and is cast to double ONCE
    per side, so the delta is a single exact subtraction — bit-identical
    cross-engine.  Plan: one order-keyed partial-aggregated rollup of
    lineitem, an order-keyed join (bucketed warehouse makes it
    exchange-free at scale), TakeOrderedAndProject for the top-K."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    detail = li.groupBy(F.col("l_orderkey").alias("o_orderkey")).agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("detail_total"),
        F.count(F.lit(1)).alias("n_lines"),
    )
    header = orders.select(
        "o_orderkey", F.col("o_totalprice").cast("decimal(18,2)").cast("double").alias("header_total")
    )
    joined = header.join(detail, "o_orderkey", "left").select(
        "o_orderkey",
        "header_total",
        F.coalesce(F.col("detail_total"), F.lit(0.0)).alias("detail_total"),
        F.coalesce(F.col("n_lines"), F.lit(0)).alias("n_lines"),
        (F.col("header_total") - F.coalesce(F.col("detail_total"), F.lit(0.0))).alias("delta"),
    )
    return joined.orderBy(F.abs(F.col("delta")).desc(), "o_orderkey").limit(RECON_TOP_K)


K_ANON_THRESHOLD = 5

_KANON_ORACLE = f"""
WITH cells AS (
  SELECT lang, source, n_chars // 100 AS size_band, COUNT(*) AS group_size
  FROM documents GROUP BY 1, 2, 3
)
SELECT lang, source, CAST(size_band AS BIGINT) AS size_band, group_size
FROM cells WHERE group_size < {K_ANON_THRESHOLD}
"""


@register("k_anonymity_violations", oracle=_KANON_ORACLE, tags=("dq", "privacy", "r5"))
def q_k_anonymity_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the documents table's quasi-identifiers
    (lang, source, 100-char size band): every combination shared by fewer
    than {K_ANON_THRESHOLD} records — the re-identification risk report a
    release review runs BEFORE publishing a dataset (a unique
    quasi-identifier combination singles a record out even with direct
    identifiers scrubbed; ``pii_scrub_docs`` removes identifiers, this
    finds the joins that re-create them).

    One map-side-combined aggregate, output bounded by the violating-cell
    count; integer band arithmetic is identical on both engines.  The fix
    actions (generalize bands, suppress cells) are one filter away."""
    docs = load_table(spark, sf_dir, "documents")
    cells = docs.groupBy(
        "lang", "source", F.expr("n_chars div 100").cast("bigint").alias("size_band")
    ).agg(F.count(F.lit(1)).alias("group_size"))
    return cells.filter(F.col("group_size") < K_ANON_THRESHOLD)


DP_EPSILON = 1.0  # Laplace scale b = sensitivity/epsilon = 1/epsilon for counts

_DP_ORACLE = f"""
WITH counts AS (
  SELECT event_type, COUNT(*) AS true_count FROM events GROUP BY 1
),
noised AS (
  SELECT event_type, true_count,
         (CAST(('0x' || substr(md5('dp:' || event_type), 1, 8)) AS BIGINT)
            / 4294967296.0) - 0.5 AS u
  FROM counts
)
SELECT event_type,
       ROUND(true_count
             + CASE WHEN u >= 0 THEN -(1.0 / {DP_EPSILON}) * ln(1.0 - 2.0 * u)
                    ELSE (1.0 / {DP_EPSILON}) * ln(1.0 + 2.0 * u) END,
             9) AS dp_count
FROM noised
"""


@register("dp_noisy_event_counts", oracle=_DP_ORACLE, tags=("dq", "privacy", "r5"))
def q_dp_noisy_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private count release (ε = {DP_EPSILON} Laplace
    mechanism) with DETERMINISTIC pseudo-noise: the Laplace draw comes from
    inverse-CDF-transforming a uniform derived from ``md5('dp:' || key)``
    — so the release is reproducible across engines and reruns (the
    property the differential check needs, and what a production release
    pipeline wants anyway: re-running a publication must not spend fresh
    privacy budget by emitting a different draw).  True counts are never
    in the output; sensitivity of a count is 1, so b = 1/ε.

    The noise arithmetic is one hash→uniform division, one ln (the
    ``zipf_slope_terms`` precedent), one multiply — rounded once.  Pure
    map-side after the count aggregate.  NOTE: deterministic noise is
    sound only when each release key is published ONCE; a re-keyed re-query
    is a fresh mechanism invocation and must re-randomize the seed prefix."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("true_count"))
    u = (
        F.conv(F.substring(F.md5(F.concat(F.lit("dp:"), F.col("event_type"))), 1, 8), 16, 10)
        .cast("bigint")
        / F.lit(4294967296.0)
    ) - F.lit(0.5)
    noise = F.when(
        u >= 0, F.lit(-(1.0 / DP_EPSILON)) * F.log(F.lit(1.0) - F.lit(2.0) * u)
    ).otherwise(F.lit(1.0 / DP_EPSILON) * F.log(F.lit(1.0) + F.lit(2.0) * u))
    return counts.select(
        "event_type",
        F.round(F.col("true_count") + noise, 9).alias("dp_count"),
    )


_BENFORD_ORACLE = """
WITH digits AS (
  SELECT CAST(substr(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR), 1, 1) AS BIGINT) AS d
  FROM orders WHERE o_totalprice >= 1
),
obs AS (SELECT d, COUNT(*) AS n FROM digits GROUP BY 1),
tot AS (SELECT SUM(n) AS total FROM obs),
spine AS (SELECT CAST(i AS BIGINT) AS d FROM UNNEST(range(1, 10)) AS u(i))
SELECT s.d AS leading_digit,
       COALESCE(obs.n, 0) AS n,
       ROUND(CAST(COALESCE(obs.n, 0) AS DOUBLE) / tot.total, 9) AS observed_share,
       ROUND(ln(1.0 + 1.0 / s.d) / ln(10.0), 9) AS benford_share,
       ROUND(CAST(COALESCE(obs.n, 0) AS DOUBLE) / tot.total
             - ln(1.0 + 1.0 / s.d) / ln(10.0), 9) AS deviation
FROM spine s LEFT JOIN obs ON obs.d = s.d CROSS JOIN tot
"""


@register("benford_order_totals", oracle=_BENFORD_ORACLE, tags=("dq", "forensic", "r5"))
def q_benford_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals — the forensic
    screen for fabricated or systematically-generated monetary data
    (organic multi-scale amounts follow P(d) = log₁₀(1 + 1/d); synthetic
    or tampered ledgers routinely don't, and THIS corpus is synthetic, so
    the deviation column is the finding).  Completes the audit family:
    constraint suite (validity) → reconciliation (consistency) → Benford
    (plausibility).

    The leading digit comes from the DECIMAL string form (exact — no
    float log10 on the value itself); expected shares are ln-ratio
    constants (the ``zipf_slope_terms`` ln precedent) and each output is
    a per-digit row, so no cross-row float summation exists at all.  One
    map-side-combined digit count; output is 9 rows regardless of scale."""
    orders = load_table(spark, sf_dir, "orders")
    digits = orders.filter(F.col("o_totalprice") >= 1).select(
        F.substring(F.col("o_totalprice").cast("decimal(18,2)").cast("string"), 1, 1)
        .cast("bigint")
        .alias("d")
    )
    obs = digits.groupBy("d").agg(F.count(F.lit(1)).alias("n"))
    tot = obs.agg(F.sum("n").alias("total"))
    spine = spark.range(1, 10).select(F.col("id").alias("leading_digit"))
    benford = F.log(F.lit(1.0) + F.lit(1.0) / F.col("leading_digit")) / F.log(F.lit(10.0))
    share = F.coalesce(F.col("n"), F.lit(0)).cast("double") / F.col("total")
    return (
        spine.join(F.broadcast(obs.withColumnRenamed("d", "leading_digit")), "leading_digit", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "leading_digit",
            F.coalesce(F.col("n"), F.lit(0)).alias("n"),
            F.round(share, 9).alias("observed_share"),
            F.round(benford, 9).alias("benford_share"),
            F.round(share - benford, 9).alias("deviation"),
        )
    )


# --- zero-extra-pass observed metrics ----------------------------------------


def observe_audit(df: DataFrame, metrics: dict[str, Column], name: str = "audit"):
    """Attach audit metrics that are collected DURING the consumer's own
    action — ``df.observe`` inserts a ``CollectMetrics`` node into the plan,
    so the aggregates ride along with whatever job materializes the frame
    (write, collect, count) at zero additional scans.

    This is the complement to ``run_checks``: the constraint suite is a
    *dedicated* single-pass aggregation job you run to gate a promotion;
    ``observe_audit`` is the always-on instrumentation a production sink
    wraps around every write (row counts, null counts, value sums for
    reconciliation) where a second scan of a 100 TB input purely for
    metrics would double the pipeline's cost.  The driver-side
    ``Observation`` handle blocks until the action finishes, then exposes
    the metric row as a dict — compare against expectations and fail the
    pipeline AFTER the write but BEFORE the commit/promote step.

    Constraints inherited from Spark's observe contract: metric columns
    must be aggregate expressions without distinct, and the metrics are
    computed over exactly the rows the action consumed (a ``limit`` above
    the observe sees only the limited rows — attach the observe at the
    point whose row-flow you mean to measure).

    Returns ``(instrumented_df, observation)``; read
    ``observation.get`` after running an action on the returned frame.
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    return df.observe(obs, *[m.alias(k) for k, m in metrics.items()]), obs
