"""Multi-way star joins — the OLAP spine beyond the reference's 2-table joins.

The reference never joins more than fact×dim (SURVEY.md §2.3: "no
semi/anti/theta/range/as-of joins", ≤2-table joins); a complete analytics
engine must handle the star-schema shape: one fact table joined through a
chain of dimensions with selective filters, grouped, and ranked.  These
queries exercise exactly what Catalyst must get right at 100 TB —
join *reordering* (filter the 1500-row customer dim before it meets the
60M-row lineitem), *broadcast* selection for every dimension, filter
*pushdown* into the parquet scans, and partial aggregation above the join.

SQL-first surface: ``revenue_by_nation`` is expressed as ONE SQL string
executed verbatim by both Spark (over temp views, see ``register_views``)
and the DuckDB oracle — demonstrating the engine's ``spark.sql`` API and
making the differential test definitionally fair.  The broadcast hint rides
in a ``/*+ ... */`` comment: Spark reads it, DuckDB ignores it as a comment.

Money math is decimal-exact end-to-end (``functions.scalar``), so the
revenue doubles are bit-identical across engines and partition orders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table
from ..sources.tables import register_views

# One SQL text, two engines: Spark executes it over the registered temp
# views; DuckDB runs it as the oracle.  Keep it ANSI — no engine-specific
# functions — and keep hints inside comments.
_REVENUE_BY_NATION_SQL = """
SELECT /*+ BROADCAST(c), BROADCAST(n), BROADCAST(r) */
       n.n_name AS nation,
       r.r_name AS region,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY n.n_name, r.r_name
"""


@register("revenue_by_nation", oracle=_REVENUE_BY_NATION_SQL, tags=("olap", "join", "sql"))
def q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-table star join through the customer→nation→region chain, revenue
    per nation.  Runs the *same SQL text as the oracle* via ``spark.sql``
    over temp views — the engine's SQL API surface.

    Plan shape to preserve at scale: lineitem⋈orders shuffles on orderkey
    (both fact-sized — at 100 TB, bucket both by orderkey to skip it);
    customer/nation/region all broadcast; aggregation is partial above the
    join, final on the 25-nation key space."""
    register_views(spark, sf_dir, "lineitem", "orders", "customer", "nation", "region")
    return spark.sql(_REVENUE_BY_NATION_SQL)


_TOP_ORDERS_ORACLE = """
SELECT o.o_orderkey,
       o.o_orderpriority,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY o.o_orderkey, o.o_orderpriority
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""


@register("top_building_orders_by_revenue", oracle=_TOP_ORDERS_ORACLE, tags=("olap", "join", "topk"))
def q_top_building_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective-dimension star join + global top-K: orders of BUILDING-
    segment customers ranked by revenue.

    The segment filter lands on the 1500-row customer dim *before* any
    fact-table contact — Catalyst pushes it into the parquet scan and the
    surviving ~⅕ of customers broadcast; the top-10 plans as
    TakeOrderedAndProject (no global sort materialized).  Deterministic
    tiebreak on o_orderkey keeps the LIMIT stable across engines."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    revenue = (
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
        )
        .cast("double")
        .alias("revenue")
    )
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .groupBy("o_orderkey", "o_orderpriority")
        .agg(revenue)
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


# --- grouping sets -----------------------------------------------------------

# One SQL text, two engines (same contract as revenue_by_nation): explicit
# GROUPING SETS — finer control than CUBE/ROLLUP (operators.analytics) when
# only specific marginal combinations are wanted.  The per-set aggregation
# is one shuffle whose width is the union of requested group keys; Spark
# plans an Expand (one input row → one row per set) feeding a single
# hash aggregate, so cost scales with |sets|, not with separate passes.
_GROUPING_SETS_SQL = """
WITH e AS (
  SELECT event_type, CAST(ts AS DATE) AS day, value FROM events
)
SELECT event_type, day,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM e
GROUP BY GROUPING SETS ((event_type), (day), (event_type, day), ())
"""


@register("event_grouping_sets", oracle=_GROUPING_SETS_SQL, tags=("olap", "agg", "sql"))
def q_event_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS over (event_type), (day), both, and the grand
    total — four marginal aggregates in one pass over the fact table."""
    register_views(spark, sf_dir, "events")
    return spark.sql(_GROUPING_SETS_SQL)


# --- scalar subqueries -------------------------------------------------------

# Predicate rewritten to exact arithmetic: `price > avg(price)` ⟺
# `price * count > sum(price)` with decimal/int on both sides, so row
# membership can't flip on engine-specific float division of the average.
_ABOVE_AVG_SQL = """
SELECT o_orderkey, o_custkey,
       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS totalprice
FROM orders
WHERE CAST(o_totalprice AS DECIMAL(18,2)) * (SELECT COUNT(*) FROM orders)
      > (SELECT SUM(CAST(o_totalprice AS DECIMAL(18,2))) FROM orders)
"""


@register("orders_above_avg_price", oracle=_ABOVE_AVG_SQL, tags=("olap", "subquery", "sql"))
def q_orders_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery SQL surface: orders priced above the global average,
    one SQL text on both engines.  Catalyst plans each uncorrelated scalar
    subquery as its own tiny aggregation job whose single-row result is
    broadcast into the main scan's filter — at 100 TB that is one extra
    cheap pass, not a join.  (The exact-arithmetic predicate rewrite is the
    SURVEY §7.4 numeric-fidelity discipline applied to a threshold.)"""
    register_views(spark, sf_dir, "orders")
    return spark.sql(_ABOVE_AVG_SQL)


# --- lateral joins -----------------------------------------------------------

# Ordering and the emitted balance both go through DECIMAL(18,2) so row
# membership and ties are engine-independent; c_custkey breaks exact-balance
# ties deterministically.
_LATERAL_TOPK_SQL = """
SELECT n.n_name AS nation, t.c_custkey, t.c_name, t.acctbal
FROM nation n, LATERAL (
  SELECT c_custkey, c_name,
         CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS acctbal
  FROM customer
  WHERE c_nationkey = n.n_nationkey
  ORDER BY CAST(c_acctbal AS DECIMAL(18,2)) DESC, c_custkey
  LIMIT 3
) t
"""


@register("top_customers_per_nation_lateral", oracle=_LATERAL_TOPK_SQL, tags=("olap", "join", "sql"))
def q_top_customers_per_nation_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery surface: top-3 customers by account
    balance for each nation, one SQL text on both engines.

    The lateral form is the declarative way users write per-group top-K
    when the outer side is a table, not a group-by — and the plan is where
    Spark earns it: Catalyst decorrelates the LIMIT-bearing subquery into
    a window rank over a customer shuffle partitioned by nationkey, NOT
    |nation| repeated scans (the imperative loop a naive engine would run
    is exactly what decorrelation deletes).  At 100 TB: nation broadcasts;
    the decorrelator's one artifact is a global range-sort exchange for
    the subquery's ORDER BY ahead of the window's own sort — one exchange
    more than the hand-written ``top_k_per_group``, which is the
    documented trade for the declarative form."""
    register_views(spark, sf_dir, "nation", "customer")
    return spark.sql(_LATERAL_TOPK_SQL)


# ---------------------------------------------------------------------------
# Explicit Bloom-filter runtime prefilter: build-side key digest broadcast
# ahead of the exact join.
# ---------------------------------------------------------------------------

#: Bloom geometry: m bits / k hash functions.  m bounds the broadcast state
#: regardless of build-side cardinality (at 100 TB you size m to the real
#: key count; the POINT is that the digest is O(m), not O(keys)).
BLOOM_M_BITS = 1 << 16
BLOOM_SEEDS = (101, 202, 303)

_BLOOM_SEMIJOIN_ORACLE = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
"""


@register("bloom_prefilter_urgent_revenue", oracle=_BLOOM_SEMIJOIN_ORACLE, tags=("olap", "semijoin", "bloom", "r6"))
def q_bloom_prefilter_urgent_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join revenue of urgent orders' lineitems, computed through an
    EXPLICIT Bloom-filter runtime prefilter: hash the build side's keys
    into an m-bit digest (materialized as the distinct set-bit positions —
    ≤ m rows however large the build side grows), broadcast it, drop every
    probe row whose k positions aren't all set, and only then run the
    exact shuffle semi-join on the survivors.  False positives are removed
    by the exact confirm, so the result is EXACTLY the semi-join (the
    oracle is the plain ``IN`` subquery) — the Bloom stage only cuts the
    shuffle volume.

    This is the hand-rolled form of Spark's own runtime filter
    (``spark.sql.optimizer.runtime.bloomFilter.enabled``, which injects the
    same digest under an AQE plan); materializing it explicitly is how you
    REUSE one built filter across several probe-side facts or persist it
    next to a snapshot for incremental loads.  All hashing is JVM-side
    (``xxhash64`` with per-function seeds, ``pmod`` into m); the k
    membership tests are k broadcast left-semi hash joins against the
    ≤ m-row position set — no explode of the probe side, no Python.
    At 1000 executors the probe scan streams through k broadcast probes
    and only the surviving fraction reaches the orderkey exchange."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey")

    def positions(key):
        return [F.pmod(F.xxhash64(key, F.lit(s)), F.lit(BLOOM_M_BITS)) for s in BLOOM_SEEDS]

    bloom = (
        urgent.select(F.explode(F.array(*positions(F.col("o_orderkey")))).alias("pos"))
        .distinct()
    )
    probe = li
    for i, p in enumerate(positions(F.col("l_orderkey"))):
        member = bloom.withColumnRenamed("pos", f"pos{i}")
        probe = probe.join(F.broadcast(member), p == F.col(f"pos{i}"), "left_semi")
    return (
        probe.join(urgent, probe.l_orderkey == urgent.o_orderkey, "left_semi")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
            )
            .cast("double")
            .alias("revenue"),
        )
    )


# --- parameterized SQL (named parameter markers) -------------------------------

PARAM_MIN_TOTAL = 50_000.0
PARAM_PRIORITY = "1-URGENT"

_PARAM_SQL_ORACLE = f"""
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders
WHERE o_totalprice >= {PARAM_MIN_TOTAL} AND o_orderpriority <> '{PARAM_PRIORITY}'
GROUP BY 1
"""


@register("big_order_mix_param_sql", oracle=_PARAM_SQL_ORACLE, tags=("olap", "sql", "r7"))
def q_big_order_mix_param_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order mix above a value threshold, excluding one priority class —
    executed through Spark's PARAMETERIZED SQL surface
    (``spark.sql(sql, args={{...}})``, named parameter markers): the
    injection-safe way applications template queries, and the one SQL-API
    surface the repo's verbatim-SQL demos didn't yet exercise.  The
    parameters bind as typed literals in the plan (so constant folding and
    scan pushdown see real values — same physical plan as inlining); the
    oracle is the identical SQL with the literals inlined, which IS the
    binding-correctness claim."""
    register_views(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders
        WHERE o_totalprice >= :min_total AND o_orderpriority <> :excluded
        GROUP BY 1
        """,
        args={"min_total": PARAM_MIN_TOTAL, "excluded": PARAM_PRIORITY},
    )


# --- SQL UDF (CREATE FUNCTION ... RETURN expr) ---------------------------------

_SQL_UDF_ORACLE = """
SELECT l_returnflag,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM lineitem GROUP BY 1
"""


@register("revenue_by_flag_sql_udf", oracle=_SQL_UDF_ORACLE, tags=("olap", "sql", "r7"))
def q_revenue_by_flag_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by return flag, with the discount formula packaged as a SQL
    UDF (``CREATE TEMPORARY FUNCTION ... RETURN expr`` — the declarative
    UDF surface Spark 4 ships: shareable like a Python UDF but INLINED by
    Catalyst into whole-stage codegen, so unlike a Python UDF it costs
    nothing and pushes down like any expression).  The declared RETURNS
    type must carry the product's full scale — DECIMAL(38,4), not (18,2):
    a narrower declaration ROUNDS EVERY ROW before the sum (caught by the
    oracle diff at the 4th decimal).  The oracle inlines the body —
    identical results prove the function boundary is transparent.
    Exact DECIMAL accumulation as everywhere else (``_revenue`` in
    ``operators.tpch``)."""
    register_views(spark, sf_dir, "lineitem")
    spark.sql(
        """CREATE OR REPLACE TEMPORARY FUNCTION disc_rev(p DECIMAL(18,2), d DECIMAL(18,2))
           RETURNS DECIMAL(38,4) RETURN p * (1 - d)"""
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               CAST(SUM(disc_rev(CAST(l_extendedprice AS DECIMAL(18,2)),
                                 CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        FROM lineitem GROUP BY 1
        """
    )
