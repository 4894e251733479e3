"""Custom temporal operators Spark lacks natively: as-of join, range join,
value histograms.

These follow the playbook for "operator the engine doesn't ship": express it
as a composition of existing DataFrame ops so Catalyst still owns the
physical plan — no Python in the row path, no custom strategy needed.

- **As-of join** (`asof_join`): for each left row, the latest right row with
  ``right.ts <= left.ts`` per key.  Implemented as the classic union-tag +
  running ``last(ignorenulls)`` window: one shuffle on the key, linear state,
  no per-row probing.  At 100 TB this beats the naive
  ``join + filter + max`` (which explodes to |left|×|right-per-key| rows);
  the single sort-within-key is exactly what a dedicated as-of operator
  would do.  DuckDB's native ``ASOF JOIN`` is the oracle.
- **Range join** (`range_band_join`): non-equi join of a fact against a
  small bands dimension (``value BETWEEN lo AND hi``).  With the dimension
  broadcast this is a BroadcastNestedLoopJoin — the *correct* plan when one
  side is tiny; the alternative (bucketing the fact by band boundaries)
  only pays off when both sides are large.
- **Histogram** (`value_histogram`): fixed-width bucketing via floor
  division — pure map-side arithmetic + one aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table, load_tables


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    asof_col: str = "asof_ts",
) -> DataFrame:
    """Left as-of join: attach to each left row the greatest ``right_ts``
    with ``right_ts <= left_ts`` for the same ``key`` (null if none).

    Union-tag construction: right rows sort *before* left rows at equal
    timestamps (tag 0 < 1) so ties match, per ASOF semantics.
    """
    r = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_tag"),
        F.col(right_ts).alias(asof_col),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in left.columns if c != key],
    )
    l = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_tag"),
        F.lit(None).cast(dict(right.dtypes)[right_ts]).alias(asof_col),
        *[F.col(c) for c in left.columns if c != key],
    )
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t").asc(), F.col("_tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        r.unionByName(l)
        .withColumn(asof_col, F.last(asof_col, ignorenulls=True).over(w))
        .filter(F.col("_tag") == 1)
    )
    return out.select(
        F.col("_k").alias(key),
        *[c for c in left.columns if c != key],
        asof_col,
    )


_ASOF_ORACLE = """
SELECT e.user_id, e.event_id, e.ts, c.ts AS last_click_ts
FROM (SELECT user_id, event_id, ts FROM events WHERE event_type = 'error') e
ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'click') c
  ON e.user_id = c.user_id AND c.ts <= e.ts
"""


@register("asof_last_click_before_error", oracle=_ASOF_ORACLE, tags=("join", "asof", "temporal"))
def q_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every error event, the timestamp of the same user's latest click
    at or before it (the canonical as-of/point-in-time lookup)."""
    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select("user_id", "event_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    return asof_join(errors, clicks, key="user_id", asof_col="last_click_ts")


#: (band, lo, hi) — inclusive bounds, small literal dimension
VALUE_BANDS = (
    ("low", 0.0, 50.0),
    ("mid", 50.0, 200.0),
    ("high", 200.0, 10_000.0),
)


def range_band_join(fact: DataFrame, value_col: str) -> DataFrame:
    """Non-equi join against the broadcast bands dimension:
    ``lo <= value < hi`` (half-open so bands don't double-count edges).

    This is the *generic* range-join operator — it handles bands supplied
    at runtime, overlapping bands (row multiplication), and band attributes
    beyond the label.  For STATIC non-overlapping bands prefer
    ``band_case_expr``: the BroadcastNestedLoopJoin here evaluates
    |bands| predicates per fact row through join machinery, while the CASE
    chain compiles into the scan's whole-stage-codegen with zero join."""
    bands = fact.sparkSession.createDataFrame(list(VALUE_BANDS), ["band", "lo", "hi"])
    v = F.col(value_col)
    return fact.join(F.broadcast(bands), (v >= F.col("lo")) & (v < F.col("hi")), "left")


def band_case_expr(value_col: str, bands=VALUE_BANDS) -> Column:
    """Map-side banding for static non-overlapping bands: a CASE WHEN chain
    — no join at all, evaluated inside the scan stage's generated code.
    Values outside every band yield NULL, matching the left range-join."""
    v = F.col(value_col)
    expr = None
    for band, lo, hi in bands:
        cond = (v >= F.lit(lo)) & (v < F.lit(hi))
        expr = F.when(cond, band) if expr is None else expr.when(cond, band)
    return expr


_RANGE_ORACLE = """
SELECT b.band, e.event_type, COUNT(*) AS n_events
FROM events e
LEFT JOIN (VALUES ('low', 0.0, 50.0), ('mid', 50.0, 200.0), ('high', 200.0, 10000.0))
  AS b(band, lo, hi)
  ON e.value >= b.lo AND e.value < b.hi
GROUP BY 1, 2
"""


@register("value_band_counts", oracle=_RANGE_ORACLE, tags=("join", "range"))
def q_range_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded counts via the map-side CASE expression (bands are static and
    non-overlapping, so no join is needed — the SQL range-join oracle stays
    the semantic spec, the plan is scan → partial agg → one shuffle)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("band", band_case_expr("value"))
        .groupBy("band", "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


_HIST_ORACLE = """
SELECT CAST(floor(value / 50.0) AS BIGINT) AS bucket,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events GROUP BY 1
"""


@register("value_histogram", oracle=_HIST_ORACLE, tags=("agg", "histogram"))
def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width (50-unit) histogram of event values."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("bucket", F.floor(F.col("value") / 50.0))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
    )


# --- date-spine gap-fill -----------------------------------------------------

_GAPFILL_ORACLE = """
WITH d AS (
  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_events
  FROM events GROUP BY 1
), b AS (
  SELECT MIN(day) AS lo, MAX(day) AS hi FROM d
), spine AS (
  SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day FROM b
)
SELECT s.day, CAST(COALESCE(d.n_events, 0) AS BIGINT) AS n_events
FROM spine s LEFT JOIN d ON s.day = d.day
"""


@register("daily_event_counts_gapfill", oracle=_GAPFILL_ORACLE, tags=("temporal", "gapfill"))
def q_daily_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily event counts over a *dense* date spine: days with no events
    appear with an explicit 0 instead of silently missing — the gap-fill
    shape every downstream time-series consumer (rolling windows, anomaly
    baselines, charting) assumes.

    The spine is generated from the aggregate's own min/max via
    ``sequence(lo, hi)`` + ``explode`` — a one-row driver-free pipeline, so
    no collect and no hand-written date range.  Both join sides are |days|-sized
    after aggregation; the *daily counts* side is broadcast (the spine is
    the preserved side of the left join, which can't be the build side).  At 100 TB the only large stage is the initial day-keyed
    count, whose partial aggregation reduces each scan partition to
    |days| rows before the exchange."""
    return daily_gapfilled(load_table(spark, sf_dir, "events"))


def daily_gapfilled(ev: DataFrame) -> DataFrame:
    """(day, n_events) over the dense min..max date spine (see the query
    docstring above); reused by the rolling-window query below."""
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(F.count(F.lit(1)).alias("n_events"))
    spine = (
        daily.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
        .select(F.explode(F.sequence("lo", "hi")).alias("day"))
    )
    return (
        spine.join(F.broadcast(daily), "day", "left")
        .select("day", F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"))
    )


_ROLLING7_ORACLE = """
WITH d AS (
  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_events
  FROM events GROUP BY 1
), b AS (
  SELECT MIN(day) AS lo, MAX(day) AS hi FROM d
), spine AS (
  SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day FROM b
), dense AS (
  SELECT s.day, CAST(COALESCE(d.n_events, 0) AS BIGINT) AS n_events
  FROM spine s LEFT JOIN d ON s.day = d.day
)
SELECT day, n_events,
       CAST(SUM(n_events) OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
         AS rolling_7d
FROM dense
"""


@register("rolling_7day_event_counts", oracle=_ROLLING7_ORACLE, tags=("temporal", "window", "gapfill"))
def q_rolling_7day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day event volume per day.  Composes the gap-fill with a
    ROWS frame: on the *dense* spine, ROWS 6 PRECEDING is exactly the
    trailing week (on raw, gappy daily aggregates it silently isn't — the
    reason gap-fill is a first-class operator here, and why the RANGE-frame
    alternative is only needed when you can't densify).  The window is
    unpartitioned, but it runs over |days| rows post-aggregation — tiny by
    construction; never put an unpartitioned window over fact-scale rows."""
    dense = daily_gapfilled(load_table(spark, sf_dir, "events"))
    w = Window.orderBy("day").rowsBetween(-6, Window.currentRow)
    return dense.select(
        "day", "n_events", F.sum("n_events").over(w).cast("long").alias("rolling_7d")
    )


_RETENTION_ORACLE = """
WITH fd AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day FROM events GROUP BY 1
), act AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
)
SELECT fd.cohort_day, datediff('day', fd.cohort_day, act.day) AS day_offset,
       COUNT(*) AS n_active
FROM act JOIN fd ON act.user_id = fd.user_id
GROUP BY 1, 2
"""


@register("user_retention_cohorts", oracle=_RETENTION_ORACLE, tags=("temporal", "cohort"))
def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-seen day, counted
    on each later active day as an offset from their cohort day.

    Two aggregations share the user_id shuffle key (first-seen min and the
    distinct activity set), then a user-keyed equi-join and a final small
    aggregation on (cohort_day, offset).  At 100 TB the first-seen table is
    |users|-sized and the join co-partitions on user_id with AQE sizing the
    exchanges; nothing driver-side."""
    ev = load_table(spark, sf_dir, "events")
    fd = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("cohort_day"))
    act = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    return (
        act.join(fd, "user_id")
        .groupBy("cohort_day", F.datediff("day", "cohort_day").alias("day_offset"))
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


# --- time-series resample + linear interpolation -----------------------------

INTERP_STEP_US = 6 * 3_600_000_000  # 6-hour grid, in epoch microseconds

_INTERP_ORACLE = f"""
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS t, value, event_id FROM events
), bounds AS (
  SELECT user_id, MIN(t) AS t0, MAX(t) AS t1 FROM ev GROUP BY user_id
), grid AS (
  SELECT user_id, t0 + k * {INTERP_STEP_US} AS g
  FROM bounds, unnest(generate_series(0, CAST(floor((t1 - t0) / {INTERP_STEP_US}) AS BIGINT))) u(k)
), tagged AS (
  SELECT user_id, t AS pos, 0 AS is_grid, t, value, event_id FROM ev
  UNION ALL
  SELECT user_id, g AS pos, 1 AS is_grid, NULL, NULL, NULL FROM grid
), walked AS (
  SELECT user_id, pos, is_grid,
         last_value(t IGNORE NULLS) OVER w_prev AS prev_t,
         last_value(value IGNORE NULLS) OVER w_prev AS prev_v,
         first_value(t IGNORE NULLS) OVER w_next AS next_t,
         first_value(value IGNORE NULLS) OVER w_next AS next_v
  FROM tagged
  WINDOW w_prev AS (PARTITION BY user_id ORDER BY pos ASC, is_grid ASC, event_id ASC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         w_next AS (PARTITION BY user_id ORDER BY pos ASC, is_grid ASC, event_id ASC
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT user_id,
       make_timestamp(pos) AS grid_ts,
       CASE WHEN pos = prev_t THEN prev_v
            ELSE prev_v + (next_v - prev_v)
                 * (CAST(pos - prev_t AS DOUBLE) / CAST(next_t - prev_t AS DOUBLE))
       END AS value_interp
FROM walked
WHERE is_grid = 1
"""


@register("interpolated_user_series", oracle=_INTERP_ORACLE, tags=("temporal", "resample", "interpolation"))
def q_interpolated_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample each user's irregular event series onto a 6-hour grid with
    linear interpolation — the feature-pipeline primitive that turns event
    logs into fixed-step model inputs.

    Shape: (1) per-user [min, max] bounds — one aggregation; (2) grid rows
    via ``sequence`` + ``explode`` (integer epoch arithmetic, no Python);
    (3) union grid with events and walk ONE user-keyed window both ways —
    ``last(ignorenulls)`` up to the row gives the preceding observation,
    ``first(ignorenulls)`` from the row gives the following one;
    (4) map-side interpolation arithmetic.  Sort ties break (pos, is_grid,
    event_id): an event at exactly a grid timestamp sorts before the grid
    row, so the grid row reads it as "previous" and the CASE emits the
    exact value (also covering the k=0 grid point = first event).  Both
    windows share one shuffle on user_id; grid size is |span/step| per
    user — bounded by time, not corpus, so the plan holds at 100 TB.  The
    interpolation expression is written identically in the oracle so the
    IEEE doubles match bit-for-bit."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("t"), "value", "event_id"
    )
    step = F.lit(INTERP_STEP_US).cast("long")
    bounds = ev.groupBy("user_id").agg(F.min("t").alias("t0"), F.max("t").alias("t1"))
    grid = bounds.select(
        "user_id",
        F.explode(F.sequence(F.lit(0).cast("long"), F.floor((F.col("t1") - F.col("t0")) / step).cast("long"))).alias("k"),
        "t0",
    ).select("user_id", (F.col("t0") + F.col("k") * step).alias("pos"))
    tagged = ev.select(
        "user_id", F.col("t").alias("pos"), F.lit(0).alias("is_grid"), "t", "value", "event_id"
    ).unionByName(
        grid.select(
            "user_id",
            "pos",
            F.lit(1).alias("is_grid"),
            F.lit(None).cast("long").alias("t"),
            F.lit(None).cast("double").alias("value"),
            F.lit(None).cast("long").alias("event_id"),
        )
    )
    order = [F.asc("pos"), F.asc("is_grid"), F.asc("event_id")]
    w_prev = Window.partitionBy("user_id").orderBy(*order).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_next = Window.partitionBy("user_id").orderBy(*order).rowsBetween(Window.currentRow, Window.unboundedFollowing)
    walked = tagged.select(
        "user_id",
        "pos",
        "is_grid",
        F.last("t", ignorenulls=True).over(w_prev).alias("prev_t"),
        F.last("value", ignorenulls=True).over(w_prev).alias("prev_v"),
        F.first("t", ignorenulls=True).over(w_next).alias("next_t"),
        F.first("value", ignorenulls=True).over(w_next).alias("next_v"),
    )
    interp = F.col("prev_v") + (F.col("next_v") - F.col("prev_v")) * (
        (F.col("pos") - F.col("prev_t")).cast("double") / (F.col("next_t") - F.col("prev_t")).cast("double")
    )
    return (
        walked.filter(F.col("is_grid") == 1)
        .select(
            "user_id",
            F.timestamp_micros("pos").alias("grid_ts"),
            F.when(F.col("pos") == F.col("prev_t"), F.col("prev_v")).otherwise(interp).alias("value_interp"),
        )
    )


# --- time-weighted average ----------------------------------------------------

_TWAP_ORACLE = """
WITH t AS (
  SELECT user_id, event_id, epoch_us(ts) AS t,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v_cents
  FROM events
), d AS (
  SELECT user_id, t, v_cents,
         LEAD(t) OVER (PARTITION BY user_id ORDER BY t, event_id) - t AS dt
  FROM t
), agg AS (
  SELECT user_id,
         CAST(COUNT(*) AS BIGINT) AS n_points,
         CAST(MAX(t) - MIN(t) AS BIGINT) AS span_us,
         CAST(SUM(v_cents * dt) AS BIGINT) AS wsum_cus
  FROM d GROUP BY user_id
)
SELECT user_id, n_points, span_us,
       CASE WHEN span_us > 0
            THEN CAST(wsum_cus AS DOUBLE) / CAST(span_us * 100 AS DOUBLE) END AS twap
FROM agg
"""


@register("time_weighted_avg_per_user", oracle=_TWAP_ORACLE, tags=("temporal", "window"))
def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per user over an IRREGULAR event series —
    the metric a plain AVG gets wrong whenever sampling is uneven (a value
    held for 6 hours must weigh 360x one held for a minute; standard for
    billing meters, position marks, sensor rollups).

    Step-function integral: each observation holds until the next one, so
    twap = SUM(value_i * (t_{i+1} - t_i)) / (t_last - t_first).

    Numeric scheme, chosen for cross-engine bit-equality: values quantize
    to integer CENTS, intervals stay integer MICROSECONDS, and the weighted
    sum is a pure int64 SUM (order-independent, exact; bounded ~2.5e16 <<
    int64).  The only floating-point ops are two int64->double conversions
    (correctly rounded, single-step in every engine — unlike decimal->
    double, which DuckDB performs as two roundings and drifts 1 ulp on
    >2^53 sums) and ONE division.  Single-point / zero-span users yield
    NULL.  Plan: one lead window + one aggregation, both keyed on user_id
    — a single exchange."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("t"),
        (F.col("value").cast("decimal(18,2)") * 100).cast("long").alias("v_cents"),
    )
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    d = ev.select(
        "user_id",
        "t",
        "v_cents",
        (F.lead("t").over(w) - F.col("t")).alias("dt"),
    )
    agg = d.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_points"),
        (F.max("t") - F.min("t")).cast("long").alias("span_us"),
        F.sum(F.col("v_cents") * F.col("dt")).cast("long").alias("wsum_cus"),
    )
    return agg.select(
        "user_id",
        "n_points",
        "span_us",
        F.when(
            F.col("span_us") > 0,
            F.col("wsum_cus").cast("double") / (F.col("span_us") * 100).cast("double"),
        ).alias("twap"),
    )


# --- SCD2 validity-interval dimension join ------------------------------------

SCD2_SPLIT = "1997-06-01 00:00:00"
_SCD2_LO = "1992-01-01 00:00:00"
_SCD2_HI = "2002-01-01 00:00:00"

_SCD2_ORACLE = f"""
WITH dim AS (
  SELECT c_custkey, c_mktsegment AS segment,
         TIMESTAMP '{_SCD2_LO}' AS valid_from, TIMESTAMP '{SCD2_SPLIT}' AS valid_to
  FROM customer
  UNION ALL
  SELECT c_custkey,
         CASE WHEN c_custkey % 3 = 0 THEN 'MIGRATED' ELSE c_mktsegment END,
         TIMESTAMP '{SCD2_SPLIT}', TIMESTAMP '{_SCD2_HI}'
  FROM customer
)
SELECT o.o_orderkey, o.o_custkey, d.segment AS segment_at_order
FROM orders o
JOIN dim d ON o.o_custkey = d.c_custkey
          AND o.o_orderdate >= d.valid_from AND o.o_orderdate < d.valid_to
"""


@register("scd2_segment_at_order", oracle=_SCD2_ORACLE, tags=("temporal", "join", "scd"))
def q_scd2_segment_at_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension join: resolve each order against the dimension
    version VALID AT ORDER TIME (half-open [valid_from, valid_to)
    intervals) — the point-in-time-correct enrichment that prevents
    training-data leakage from joining facts to future attribute values
    (an as-of join against explicit validity intervals).

    The versioned dimension here is built deterministically from customer
    (pre/post-split segment, every 3rd customer migrated) so both engines
    construct identical versions.  Plan: equi-join on the customer key
    carries the plan (dimension broadcasts); the interval predicate is a
    residual filter on the joined row — never a range-only join.  At
    100 TB an SCD2 dimension stays dimension-sized (versions, not
    history-of-facts), so the broadcast survives."""
    t = load_tables(spark, sf_dir, "orders", "customer")
    cust = t["customer"]
    lo = F.lit(_SCD2_LO).cast("timestamp")
    split = F.lit(SCD2_SPLIT).cast("timestamp")
    hi = F.lit(_SCD2_HI).cast("timestamp")
    v1 = cust.select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        lo.alias("valid_from"),
        split.alias("valid_to"),
    )
    v2 = cust.select(
        "c_custkey",
        F.when(F.col("c_custkey") % 3 == 0, "MIGRATED").otherwise(F.col("c_mktsegment")).alias("segment"),
        split.alias("valid_from"),
        hi.alias("valid_to"),
    )
    dim = v1.unionByName(v2)
    o = t["orders"]
    return (
        o.join(
            F.broadcast(dim),
            (o["o_custkey"] == dim["c_custkey"])
            & (o["o_orderdate"] >= dim["valid_from"])
            & (o["o_orderdate"] < dim["valid_to"]),
        )
        .select("o_orderkey", "o_custkey", F.col("segment").alias("segment_at_order"))
    )


# --- day-over-day growth ------------------------------------------------------

_GROWTH_ORACLE = """
WITH d AS (
  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1
)
SELECT day, n_events,
       LAG(n_events) OVER (ORDER BY day) AS prev_events,
       n_events - LAG(n_events) OVER (ORDER BY day) AS delta,
       CAST(n_events - LAG(n_events) OVER (ORDER BY day) AS DOUBLE)
         / LAG(n_events) OVER (ORDER BY day) AS growth
FROM d
"""


@register("daily_event_growth", oracle=_GROWTH_ORACLE, tags=("temporal", "window"))
def q_daily_event_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day event volume deltas and growth rate (NULL on the first
    day) — the trend primitive behind monitoring dashboards.  The lag
    window is GLOBAL (no partition key) which is normally a scale smell,
    but it runs over the |days|-sized daily rollup, not the corpus — the
    aggregation reduces first, so the single-partition sort touches a few
    hundred rows regardless of input size (same reasoning as the date
    spine in the gap-fill operator).  Growth divides exact int64 counts —
    one IEEE division, bit-identical cross-engine."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("n_events")
    )
    w = Window.orderBy("day")
    prev = F.lag("n_events").over(w)
    return d.select(
        "day",
        "n_events",
        prev.alias("prev_events"),
        (F.col("n_events") - prev).alias("delta"),
        ((F.col("n_events") - prev).cast("double") / prev).alias("growth"),
    )



BURST_Z = 2.0

_BURST_ORACLE = """
WITH d AS (
  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_events
  FROM events GROUP BY 1
), b AS (
  SELECT MIN(day) AS lo, MAX(day) AS hi FROM d
), spine AS (
  SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day FROM b
), dense AS (
  SELECT s.day, CAST(COALESCE(d.n_events, 0) AS BIGINT) AS n_events
  FROM spine s LEFT JOIN d ON s.day = d.day
), stats AS (
  SELECT avg(CAST(n_events AS DOUBLE)) AS mu,
         stddev_pop(CAST(n_events AS DOUBLE)) AS sigma
  FROM dense
)
SELECT day, n_events,
       ROUND((n_events - mu) / sigma, 12) AS zscore
FROM dense, stats
WHERE sigma > 0 AND (n_events - mu) / sigma > 2.0
"""


@register("daily_event_bursts", oracle=_BURST_ORACLE, tags=("temporal", "anomaly", "r4"))
def q_daily_event_bursts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burst detection on the gap-filled daily series: days whose event
    count sits more than ``BURST_Z`` population standard deviations above
    the mean.  Gap-filling first matters — silently-missing zero days
    would bias the baseline upward and hide bursts.  The stats are one
    1-row aggregate broadcast back over the |days| spine."""
    dense = daily_gapfilled(load_table(spark, sf_dir, "events"))
    stats = dense.agg(
        F.avg(F.col("n_events").cast("double")).alias("mu"),
        F.stddev_pop(F.col("n_events").cast("double")).alias("sigma"),
    )
    z = (F.col("n_events") - F.col("mu")) / F.col("sigma")
    return (
        dense.join(F.broadcast(stats))
        .filter((F.col("sigma") > 0) & (z > BURST_Z))
        .select("day", "n_events", F.round(z, 12).alias("zscore"))
    )



EWMA_ALPHA = 0.3

_EWMA_ORACLE = f"""
WITH d AS (
  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_events
  FROM events GROUP BY 1
), b AS (
  SELECT MIN(day) AS lo, MAX(day) AS hi FROM d
), spine AS (
  SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day FROM b
), dense AS (
  SELECT s.day, CAST(COALESCE(d.n_events, 0) AS BIGINT) AS n_events,
         CAST(s.day - MIN(s.day) OVER () AS DOUBLE) AS t
  FROM spine s LEFT JOIN d ON s.day = d.day
), scaled AS (
  SELECT day, n_events, t,
         SUM(n_events * POW({1 - EWMA_ALPHA}, -t)) OVER (ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
  FROM dense
)
SELECT day, n_events,
       ROUND({EWMA_ALPHA} * POW({1 - EWMA_ALPHA}, t) * s
             / (1.0 - POW({1 - EWMA_ALPHA}, t + 1)), 9) AS ewma
FROM scaled
"""


@register("daily_ewma_counts", oracle=_EWMA_ORACLE, tags=("temporal", "timeseries", "r4"))
def q_daily_ewma_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average of the gap-filled daily event
    series (α = {EWMA_ALPHA}, bias-corrected like pandas ``ewm(adjust=True)``).

    The recursive EWMA is re-expressed CLOSED-FORM so it stays one window
    pass: with the series scaled by (1-α)^(-t), the EWMA is an ordered
    cumulative sum times α(1-α)^t (normalized by 1-(1-α)^(t+1)).  The
    ordered cumsum runs over the |days|-bounded spine; the scaling is safe
    while the horizon is bounded ((1-α)^(-t) grows exponentially — at
    longer horizons you window the cumsum to a e.g. 60-day tail where
    older terms are numerically zero anyway).  9-dp rounding pins pow ulp
    drift; the cumsum itself is order-identical in both engines."""
    dense = daily_gapfilled(load_table(spark, sf_dir, "events"))
    t = F.datediff(F.col("day"), F.min("day").over(Window.partitionBy())).cast("double")
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    beta = 1 - EWMA_ALPHA
    scaled = dense.select(
        "day",
        "n_events",
        t.alias("t"),
    ).select(
        "day",
        "n_events",
        "t",
        F.sum(F.col("n_events") * F.pow(F.lit(beta), -F.col("t"))).over(w).alias("s"),
    )
    ewma = (
        F.lit(EWMA_ALPHA)
        * F.pow(F.lit(beta), F.col("t"))
        * F.col("s")
        / (F.lit(1.0) - F.pow(F.lit(beta), F.col("t") + 1))
    )
    return scaled.select("day", "n_events", F.round(ewma, 9).alias("ewma"))



_LATE_MOD = 13  # every 13th event arrives late (synthetic late batch)

_BACKFILL_ORACLE = """
SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_events
FROM events GROUP BY 1
"""


@register("late_data_backfill", oracle=_BACKFILL_ORACLE, tags=("temporal", "backfill", "r4"))
def q_late_data_backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-scoped late-data backfill: the daily rollup is first built
    WITHOUT the late batch (every {_LATE_MOD}th event, synthetically held
    back), then repaired by recomputing ONLY the days the late batch
    touches — unaffected days keep their original aggregate rows untouched.
    The oracle recomputes the rollup over everything, so the driver check
    is the completeness proof (same differential device as
    ``rollup_apply_cdc``, but scoped to partitions instead of keys — the
    batch-pipeline pattern for hourly/daily jobs receiving stragglers).

    Scale shape: affected_days is |late-batch-days|-sized and broadcast
    both into the late-partition recompute (a partition-pruning filter at
    100 TB, where the fact is date-partitioned) and as the anti-join that
    drops stale rows from the standing aggregate."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", F.to_date("ts").alias("day")
    )
    late = ev.filter(F.col("event_id") % _LATE_MOD == 0)
    on_time = ev.filter(F.col("event_id") % _LATE_MOD != 0)
    base_rollup = on_time.groupBy("day").agg(F.count(F.lit(1)).alias("n_events"))
    affected = late.select("day").distinct()
    repaired = (
        ev.join(F.broadcast(affected), "day")  # prunes to affected partitions
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    untouched = base_rollup.join(F.broadcast(affected), "day", "left_anti")
    return untouched.unionByName(repaired)


_ROLLING_DISTINCT_ORACLE = """
WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
span AS (SELECT MIN(CAST(ts AS DATE)) AS lo, MAX(CAST(ts AS DATE)) AS hi FROM events),
spine AS (SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day FROM span),
cover AS (
  SELECT DISTINCT ud.user_id, s.day
  FROM ud JOIN spine s ON s.day >= ud.d AND s.day <= ud.d + INTERVAL 6 DAY
)
SELECT day, COUNT(*) AS active_users_7d
FROM cover GROUP BY 1
"""


@register(
    "rolling_7day_distinct_users",
    oracle=_ROLLING_DISTINCT_ORACLE,
    tags=("temporal", "window", "distinct"),
)
def q_rolling_7day_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day DISTINCT active users per day — the windowed-distinct
    aggregate that defines rolling DAU/WAU dashboards and does NOT fit a
    window frame, because COUNT(DISTINCT) over a moving frame can't be
    maintained incrementally by frame arithmetic (a departing row may or
    may not retire its user).

    The distributed shape that works at 100 TB: dedup to (user, active
    day) — |users|×|days| bounded — then explode each active day to the ≤7
    window-end days it covers (a bounded 7× fan-out, NOT a range self-join),
    dedup (user, window-end) once more, and count per day.  Every stage is
    a hash shuffle on bounded keys; no per-day rescan, no quadratic pair
    set, no sketch approximation — this is exact.  The spine semi-join
    clips the fan-out's overhang past the observed range."""
    return rolling_distinct_users(load_table(spark, sf_dir, "events"))


def rolling_distinct_users(ev: DataFrame, window_days: int = 7) -> DataFrame:
    """(day, active_users_7d) per the query docstring above; the explode
    fan-out is ``window_days``-bounded."""
    ud = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    spine = daily_gapfilled(ev).select("day")
    cover = ud.select(
        "user_id",
        F.explode(F.sequence(F.col("d"), F.date_add(F.col("d"), window_days - 1))).alias("day"),
    ).distinct()
    return (
        cover.join(spine, "day", "left_semi")
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("active_users_7d"))
    )


_STREAK_ORACLE = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
grp AS (
  SELECT user_id, day,
         date_diff('day', DATE '1970-01-01', day)
           - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS island
  FROM days
),
streaks AS (
  SELECT user_id, island, COUNT(*) AS streak_days,
         MIN(day) AS streak_start, MAX(day) AS streak_end
  FROM grp GROUP BY 1, 2
),
best AS (
  SELECT user_id, streak_days, streak_start, streak_end,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY streak_days DESC, streak_start) AS rn
  FROM streaks
)
SELECT user_id, streak_days, streak_start, streak_end
FROM best WHERE rn = 1
"""


@register("longest_daily_streak_per_user", oracle=_STREAK_ORACLE, tags=("temporal", "window", "r5"))
def q_longest_daily_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: each user's longest run of CONSECUTIVE active days
    (earliest run on ties) — the classic islands construction: on the
    distinct (user, day) grid, ``day_number − row_number`` is constant
    exactly within a consecutive run, so one subtraction turns streak
    detection into a plain groupBy.  Engagement-streak / uptime-run /
    contiguous-coverage analyses are all this one shape.

    Plan: distinct day grid (one shuffle), island id from a user-keyed
    window (same hash partitioning — no second exchange), streak groupBy
    and best-streak window again on user — Exchange reuse keeps the whole
    chain on ONE user-keyed repartition.  No global sort anywhere; day
    arithmetic is exact integer date math on both engines."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    days = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    grp = days.withColumn(
        "island", F.datediff("day", F.lit("1970-01-01")) - F.row_number().over(w)
    )
    streaks = grp.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("streak_days"),
        F.min("day").alias("streak_start"),
        F.max("day").alias("streak_end"),
    )
    wb = Window.partitionBy("user_id").orderBy(F.desc("streak_days"), F.asc("streak_start"))
    return (
        streaks.withColumn("rn", F.row_number().over(wb))
        .filter(F.col("rn") == 1)
        .select("user_id", "streak_days", "streak_start", "streak_end")
    )


_TUMBLING_ORACLE = """
SELECT make_timestamp((epoch_us(ts) // 900000000) * 900000000) AS window_start,
       event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users
FROM events GROUP BY 1, 2
"""


@register("events_15min_tumbling", oracle=_TUMBLING_ORACLE, tags=("temporal", "agg", "r5"))
def q_events_15min_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch tumbling-window rollup via the built-in ``window()`` aggregate
    — the BATCH twin of the streaming hourly rollup, at 15-minute grain.
    ``F.window`` is the same expression batch and streaming, so a backfill
    job and the live stream share one definition (the lambda-architecture
    unification Structured Streaming promises); the oracle states the
    window start arithmetically (epoch div 900) to pin the epoch-aligned
    bucketing exactly.  Plan: plain hash aggregate — the window struct is
    a map-side projection, no extra shuffle over a date_trunc rollup."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "15 minutes").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
            "n_users",
        )
    )


_HOPPING_ORACLE = """
WITH k AS (SELECT CAST(i AS BIGINT) AS k FROM UNNEST(range(0, 4)) AS u(i))
SELECT make_timestamp(((epoch_us(ts) // 900000000) - k.k) * 900000000) AS window_start,
       COUNT(*) AS n_events
FROM events CROSS JOIN k
GROUP BY 1
"""


@register("events_hourly_hopping", oracle=_HOPPING_ORACLE, tags=("temporal", "agg", "r5"))
def q_events_hourly_hopping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping (sliding) window counts: 1-hour windows every 15 minutes, so
    each event lands in exactly 4 overlapping windows — the smoothed-rate
    view dashboards and alert rules want (a tumbling hour quantizes a burst
    to one bucket; hops see it from 4 phases).  ``F.window(ts, '1 hour',
    '15 minutes')`` expands map-side to the 4 assignments (duration/slide),
    the deliberate 4× row inflation the oracle mirrors with an explicit
    offset table; then one hash aggregate.  At 100 TB the inflation factor
    is the knob: duration/slide = state × smoothness."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("win"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("win.start").alias("window_start"), "n_events")
    )


CUSUM_SLACK = 0.5   # slack (k) in stddev-free count units: half the mean drift allowance
CUSUM_THRESH = 5.0  # alarm when the cusum statistic exceeds this many mean-units

_CUSUM_ORACLE = """
WITH d AS (
  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_events
  FROM events GROUP BY 1
), b AS (
  SELECT MIN(day) AS lo, MAX(day) AS hi FROM d
), spine AS (
  SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day FROM b
), series AS (
  SELECT s.day, CAST(COALESCE(d.n_events, 0) AS BIGINT) AS n_events
  FROM spine s LEFT JOIN d ON s.day = d.day
), m AS (
  SELECT CAST(SUM(n_events) AS DOUBLE) / COUNT(*) AS mu FROM series
), pre AS (
  SELECT day, n_events,
         SUM(n_events - (m.mu * (1 + {K}))) OVER (ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prefix
  FROM series CROSS JOIN m
), st AS (
  SELECT day, n_events, prefix,
         MIN(prefix) OVER (ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lowmark
  FROM pre
)
SELECT st.day, st.n_events,
       ROUND(greatest(st.prefix - least(st.lowmark, 0.0), 0.0) / m.mu, 9) AS cusum,
       (greatest(st.prefix - least(st.lowmark, 0.0), 0.0) / m.mu) > {H} AS alarm
FROM st CROSS JOIN m
"""


@register(
    "cusum_daily_level_shift",
    oracle=_CUSUM_ORACLE.replace("{K}", str(CUSUM_SLACK)).replace("{H}", str(CUSUM_THRESH)),
    tags=("temporal", "anomaly", "r5"),
)
def q_cusum_daily_level_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM level-shift detector over the gap-filled daily
    series: alarms on a SUSTAINED upward shift that per-day z-score burst
    detection misses (many small exceedances accumulate; one spike decays).
    The textbook recursion s_t = max(0, s_{t-1} + (x_t − k)) is not a
    window expression — but its closed form IS: s_t = prefix_t −
    min(0, prefix_1..t), so the whole detector is one running sum plus one
    running min on the same ordered window (Exchange-free beyond the
    |days|-sized rollup, the EWMA closed-form trick's sibling).  The 0 in
    the inner min is the empty prefix P_0 = 0 (s_0 = 0): without it, a
    series whose cumulative deviation starts positive — a burst or level
    shift from day 1, the detector's target case — would be understated
    (row 1 forced to 0) and alarms missed.

    Determinism: both running aggregates fold in day order on both engines,
    so the float sums associate identically; one division by the mean
    normalizes to mean-units and rounds once.  The |days|-sized global
    window is the scale posture of the whole daily-series family."""
    from pyspark.sql import Window

    series = daily_gapfilled(load_table(spark, sf_dir, "events"))
    mu = series.agg(
        (F.sum("n_events").cast("double") / F.count(F.lit(1))).alias("mu")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pre = series.crossJoin(F.broadcast(mu)).withColumn(
        "prefix",
        F.sum(F.col("n_events") - F.col("mu") * (1 + CUSUM_SLACK)).over(w),
    )
    st = pre.withColumn("lowmark", F.min("prefix").over(w))
    cusum = (
        F.greatest(F.col("prefix") - F.least(F.col("lowmark"), F.lit(0.0)), F.lit(0.0))
        / F.col("mu")
    )
    return st.select(
        "day",
        "n_events",
        F.round(cusum, 9).alias("cusum"),
        (cusum > CUSUM_THRESH).alias("alarm"),
    )


SEASONAL_LAG_DAYS = 7

_SEASONAL_NAIVE_ORACLE = f"""
WITH d AS (
  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_events
  FROM events GROUP BY 1
), b AS (
  SELECT MIN(day) AS lo, MAX(day) AS hi FROM d
), spine AS (
  SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day FROM b
), series AS (
  SELECT s.day, CAST(COALESCE(d.n_events, 0) AS BIGINT) AS n_events
  FROM spine s LEFT JOIN d ON s.day = d.day
)
SELECT day, n_events,
       LAG(n_events, {SEASONAL_LAG_DAYS}) OVER (ORDER BY day) AS forecast,
       abs(n_events - LAG(n_events, {SEASONAL_LAG_DAYS}) OVER (ORDER BY day)) AS abs_error
FROM series
QUALIFY forecast IS NOT NULL
"""


@register("seasonal_naive_forecast_error", oracle=_SEASONAL_NAIVE_ORACLE, tags=("temporal", "forecast", "r5"))
def q_seasonal_naive_forecast_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naïve forecast baseline (ŷ_t = y_{{t−{SEASONAL_LAG_DAYS}}})
    with per-day absolute error — the denominator every serious forecast
    evaluation (MASE) scales by, and the sanity bar any model must beat.
    Exact integer counts and differences; the gap-filled spine makes the
    weekly lag a true calendar lag (ROWS lag over dense days), not a
    row-position accident.  One |days|-sized ordered window after the
    day-keyed rollup."""
    from pyspark.sql import Window

    series = daily_gapfilled(load_table(spark, sf_dir, "events"))
    w = Window.orderBy("day")
    out = series.withColumn("forecast", F.lag("n_events", SEASONAL_LAG_DAYS).over(w))
    return (
        out.filter(F.col("forecast").isNotNull())
        .select(
            "day",
            "n_events",
            "forecast",
            F.abs(F.col("n_events") - F.col("forecast")).alias("abs_error"),
        )
    )


M4_BUCKETS = 100

_M4_ORACLE = f"""
WITH b AS (
  SELECT MIN(epoch_us(ts)) AS lo, MAX(epoch_us(ts)) AS hi FROM events
),
assigned AS (
  SELECT e.event_id, e.value, epoch_us(e.ts) AS us,
         least(((epoch_us(e.ts) - b.lo) * {M4_BUCKETS}) // (b.hi - b.lo + 1),
               {M4_BUCKETS} - 1) AS bucket
  FROM events e CROSS JOIN b
),
ranked AS (
  SELECT bucket, value,
         ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY us, event_id) AS rn_a,
         ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY us DESC, event_id DESC) AS rn_z
  FROM assigned
)
SELECT bucket, COUNT(*) AS n,
       MIN(value) AS v_min, MAX(value) AS v_max,
       MAX(CASE WHEN rn_a = 1 THEN value END) AS v_first,
       MAX(CASE WHEN rn_z = 1 THEN value END) AS v_last
FROM ranked GROUP BY bucket
"""


@register("m4_downsample_values", oracle=_M4_ORACLE, tags=("temporal", "viz", "r5"))
def q_m4_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 time-series downsampling (Jugel et al., VLDB 2014): per
    pixel-column time bucket, keep min / max / first / last of the value
    stream — the four points that make a width-{M4_BUCKETS} line chart of
    millions of points PIXEL-PERFECT, which naive every-k-th sampling is
    not (it clips extremes; M4 is the error-free visualization-aware
    aggregation).  The charting counterpart of the analytics histograms.

    Bucket assignment is exact integer µs arithmetic off the stream's own
    [min, max] (one broadcast 1-row bound frame, no driver round-trip);
    first/last pick the (us, event_id)-lexicographic extremes so both
    engines choose identical endpoints.  Plan (round-8 keyed sweep): the
    old bucket-keyed rank window bounded parallelism by |pixels| while
    every event flowed through it — replaced by struct-MIN/MAX argmin
    aggregates ((us, event_id) is unique, so the lexicographic struct
    extreme IS the rank-1 selection, and the trailing value field can
    never participate in the comparison), making the whole query ONE
    map-side-combinable aggregation; output is 4 points per pixel
    regardless of corpus size, which IS the point."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.min(F.unix_micros("ts")).alias("lo"), F.max(F.unix_micros("ts")).alias("hi")
    )
    assigned = ev.crossJoin(F.broadcast(bounds)).select(
        "event_id",
        "value",
        F.unix_micros("ts").alias("us"),
        F.least(
            F.expr(
                f"((unix_micros(ts) - lo) * {M4_BUCKETS}) div (hi - lo + 1)"
            ),
            F.lit(M4_BUCKETS - 1),
        ).alias("bucket"),
    )
    return assigned.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("value").alias("v_min"),
        F.max("value").alias("v_max"),
        F.min(F.struct("us", "event_id", "value")).getField("value").alias("v_first"),
        F.max(F.struct("us", "event_id", "value")).getField("value").alias("v_last"),
    )


# --- seasonal decomposition --------------------------------------------------

#: centered moving-average half-width: 3 ⇒ a 7-day (weekly) trend window
DECOMP_HALF_WIDTH = 3

_DOW_DECOMP_ORACLE = f"""
WITH d AS (
  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_events
  FROM events GROUP BY 1
), b AS (
  SELECT MIN(day) AS lo, MAX(day) AS hi FROM d
), spine AS (
  SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day FROM b
), dense AS (
  SELECT s.day, CAST(COALESCE(d.n_events, 0) AS BIGINT) AS n_events
  FROM spine s LEFT JOIN d ON s.day = d.day
), tr AS (
  SELECT day, n_events,
         SUM(n_events) OVER w7 AS t7,
         COUNT(*) OVER w7 AS c7
  FROM dense
  WINDOW w7 AS (ORDER BY day
      ROWS BETWEEN {DECOMP_HALF_WIDTH} PRECEDING AND {DECOMP_HALF_WIDTH} FOLLOWING)
), se AS (
  SELECT day, n_events,
         CAST(t7 AS DOUBLE) / c7 AS trend,
         CAST(SUM(420 * n_events - (420 * t7) // c7) OVER wd AS DOUBLE)
           / (420.0 * COUNT(*) OVER wd) AS seasonal
  FROM tr
  WINDOW wd AS (PARTITION BY isodow(day) - 1)
)
SELECT day, n_events, ROUND(trend, 9) AS trend, ROUND(seasonal, 9) AS seasonal,
       ROUND(n_events - trend - seasonal, 9) AS residual
FROM se
"""


@register("daily_dow_decomposition", oracle=_DOW_DECOMP_ORACLE, tags=("temporal", "timeseries", "r6"))
def q_daily_dow_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition of the daily event series:
    trend = 7-day centered moving average over the gap-filled spine,
    seasonal = per-day-of-week mean of the detrended series, residual =
    observed − trend − seasonal — the STL-lite every ops dashboard runs
    before alerting on raw counts (a Monday dip is seasonality, not an
    incident; the residual is what anomaly thresholds should see, cf. the
    CUSUM and burst detectors that consume series like this).

    All three components are window expressions over the |days|-sized daily
    aggregate, so after the day-keyed partial count the whole decomposition
    is dashboard-sized: the unpartitioned ORDER BY day window is the
    documented single-series cost (|days| rows — thousands, not billions —
    same bound as the EWMA/autocorrelation queries).  Day-of-week mapping
    pins Spark ``weekday()`` (0=Monday) to DuckDB ``isodow()-1`` so the
    seasonal groups agree across engines.

    Float-determinism discipline: a naive ``AVG(n - trend)`` over the
    weekday partition would sum doubles in shuffle-arrival order —
    nondeterministic and engine-divergent at the 9-dp rounding boundary.
    Instead the detrended value is kept EXACT: trend = t7/c7 where t7 is
    the integer window sum and c7 ∈ {4..7} all divide 420, so
    420·(n − t7/c7) = 420·n − (420·t7) div c7 is an exact int64; the
    seasonal mean is that integer sum (order-free) with ONE float division
    at the end — bit-identical on any engine and any row order."""
    dense = daily_gapfilled(load_table(spark, sf_dir, "events"))
    w_trend = Window.orderBy("day").rowsBetween(-DECOMP_HALF_WIDTH, DECOMP_HALF_WIDTH)
    tr = dense.select(
        "day",
        "n_events",
        F.sum("n_events").over(w_trend).alias("t7"),
        F.count(F.lit(1)).over(w_trend).alias("c7"),
    )
    w_dow = Window.partitionBy(F.weekday("day"))
    se = tr.select(
        "day",
        "n_events",
        (F.col("t7").cast("double") / F.col("c7")).alias("trend"),
        (
            F.sum(F.expr("420 * n_events - (420 * t7) div c7")).over(w_dow).cast("double")
            / (F.count(F.lit(1)).over(w_dow) * F.lit(420.0))
        ).alias("seasonal"),
    )
    return se.select(
        "day",
        "n_events",
        F.round("trend", 9).alias("trend"),
        F.round("seasonal", 9).alias("seasonal"),
        F.round(F.col("n_events") - F.col("trend") - F.col("seasonal"), 9).alias("residual"),
    )


# --- Theil–Sen robust trend ---------------------------------------------------

_THEILSEN_ORACLE = """
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day, COUNT(*) AS n
  FROM events GROUP BY 1
), idx AS (
  SELECT CAST(day - MIN(day) OVER () AS BIGINT) AS x, CAST(n AS DOUBLE) AS y FROM daily
), slopes AS (
  SELECT (b.y - a.y) / (b.x - a.x) AS slope
  FROM idx a JOIN idx b ON a.x < b.x
), m AS (
  SELECT quantile_cont(slope, 0.5) AS slope FROM slopes
)
SELECT m.slope AS slope,
       (SELECT quantile_cont(y, 0.5) FROM idx)
         - m.slope * (SELECT quantile_cont(x, 0.5) FROM idx) AS intercept,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM idx) AS n_days
FROM m
"""


@register("theilsen_daily_trend", oracle=_THEILSEN_ORACLE, tags=("temporal", "stats", "timeseries", "r7"))
def q_theilsen_daily_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen estimator of the daily event-volume trend: the MEDIAN of
    all pairwise slopes between day aggregates (x = day index from the first
    observed day, y = count), with the standard median-based intercept
    ``median(y) - slope * median(x)``.  Robust to ~29% outlier days, where
    the OLS trend in ``event_volume_trend`` is dragged by a single burst —
    the pair covers both estimators' semantics.

    Scale shape: ONE corpus scan and ONE corpus shuffle (the daily count
    aggregate); the day series then collapses to a single sorted array row
    and the quadratic pair expansion happens as array ``transform``s on that
    one row (3.6k slopes/decade of data, |days|²-bounded — never
    corpus-sized).  The naive formulation (self-join of the daily frame +
    three ``percentile`` branches) re-scans events SIX times because the
    branch exchanges differ and nothing is reused; this form exists to
    scan once.  Array medians reproduce interpolated ``quantile_cont``
    exactly: sort, take the middle element (odd n) or the mean of the two
    middles (even n)."""

    def _median(arr: Column) -> Column:
        s = F.array_sort(arr)
        n = F.size(s)
        mid = (n / 2).cast("int")
        return F.when(
            n % 2 == 1, F.element_at(s, mid + 1)
        ).otherwise((F.element_at(s, mid) + F.element_at(s, mid + 1)) / 2.0)

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("double").alias("y")
    )
    packed = daily.agg(F.array_sort(F.collect_list(F.struct("day", "y"))).alias("dy"))
    first_day = F.col("dy")[0]["day"]
    arrays = packed.select(
        F.transform("dy", lambda d: F.datediff(d["day"], first_day).cast("double")).alias("xs"),
        F.transform("dy", lambda d: d["y"]).alias("ys"),
        F.size("dy").alias("n"),
    )
    # sequence(1, 0) would DESCEND — guard the n_days == 1 degenerate case
    slopes = F.when(F.col("n") >= 2, F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.col("n") - 1),
            lambda i: F.transform(
                F.sequence(i + 1, F.col("n")),
                lambda j: (F.element_at("ys", j) - F.element_at("ys", i))
                / (F.element_at("xs", j) - F.element_at("xs", i)),
            ),
        )
    ))
    return arrays.select(
        _median(slopes).alias("slope"),
        F.col("n").cast("long").alias("n_days"),
        _median(F.col("ys")).alias("my"),
        _median(F.col("xs")).alias("mx"),
    ).select(
        "slope",
        (F.col("my") - F.col("slope") * F.col("mx")).alias("intercept"),
        "n_days",
    )


# --- record-high days (running-max filter) ------------------------------------

_RECORD_HIGH_ORACLE = """
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day, COUNT(*) AS n_events
  FROM events GROUP BY 1
)
SELECT day, n_events FROM (
  SELECT day, n_events,
         MAX(n_events) OVER (ORDER BY day ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_max
  FROM daily
) WHERE prior_max IS NULL OR n_events > prior_max
"""


@register("record_high_days", oracle=_RECORD_HIGH_ORACLE, tags=("temporal", "window", "timeseries", "r7"))
def q_record_high_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Days whose event count strictly exceeds every earlier day's (the
    running-max record filter; the first day is a record by definition).
    Counterpart of the running-SUM pattern in ``monthly_revenue_running_total``
    — same one-shuffle day aggregate, then a window over the model-sized
    daily frame (|days| rows on one partition: bounded by corpus age in
    days, not corpus size, so the unpartitioned window is safe here and
    documented for the same reason as ``peak_concurrent_sessions``)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(F.count(F.lit(1)).alias("n_events"))
    w = Window.orderBy(F.col("day").asc()).rowsBetween(Window.unboundedPreceding, -1)
    return (
        daily.withColumn("prior_max", F.max("n_events").over(w))
        .filter(F.col("prior_max").isNull() | (F.col("n_events") > F.col("prior_max")))
        .select("day", "n_events")
    )


# --- rolling cross-series correlation ------------------------------------------

_ROLLING_CORR_ORACLE = """
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS DOUBLE) AS x,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS DOUBLE) AS y
  FROM events GROUP BY 1
), r AS (
  SELECT day,
         COUNT(*) OVER w AS n,
         SUM(x) OVER w AS sx, SUM(y) OVER w AS sy, SUM(x * y) OVER w AS sxy,
         SUM(x * x) OVER w AS sxx, SUM(y * y) OVER w AS syy,
         ROW_NUMBER() OVER (ORDER BY day ASC) AS rn
  FROM daily
  WINDOW w AS (ORDER BY day ASC ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
)
SELECT day,
       CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
            THEN (n * sxy - sx * sy)
                 / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
            ELSE NULL END AS rolling_corr
FROM r WHERE rn >= 7
"""


@register("rolling_corr_click_purchase", oracle=_ROLLING_CORR_ORACLE, tags=("temporal", "window", "stats", "timeseries", "r7"))
def q_rolling_corr_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day Pearson correlation between the click and purchase
    daily volumes — the co-movement monitor behind "did the purchase funnel
    decouple from traffic this week?".  Frame semantics are ROWS (7 most
    recent OBSERVED days), the right spec on a dense daily series; windows
    shorter than 7 days are suppressed rather than emitting unstable
    small-n correlations, and zero-variance windows yield NULL identically
    in both engines (no 0/0 NaN leakage).

    Exactness: x/y are integer counts in doubles, the six rolling sums are
    7-term sums of exact products, and the closed form divides once at the
    end with a pinned evaluation order — bit-identical across engines and
    partitionings, same discipline as ``corr_value_hour_by_event_type``.
    One corpus shuffle (conditional daily aggregate); all windows run over
    the model-sized daily frame (|days| rows, same bounded-single-partition
    note as ``record_high_days``)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).cast("double").alias("x"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).cast("double").alias("y"),
    )
    w = Window.orderBy(F.col("day").asc()).rowsBetween(-6, 0)
    wn = Window.orderBy(F.col("day").asc())
    r = daily.select(
        "day",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("x").over(w).alias("sx"),
        F.sum("y").over(w).alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(w).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).over(w).alias("syy"),
        F.row_number().over(wn).alias("rn"),
    ).filter(F.col("rn") >= 7)
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return r.select(
        "day",
        F.when(
            (vx > 0) & (vy > 0),
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (F.sqrt(vx) * F.sqrt(vy)),
        ).alias("rolling_corr"),
    )


# --- co-grouped pandas as-of (API surface demo) --------------------------------

#: deterministic 1-in-N user sample for the cogroup API demo (see below)
COGROUP_USER_MOD = 8

_ASOF_COGROUP_ORACLE = f"""
SELECT e.user_id, e.event_id, e.ts, c.ts AS last_click_ts
FROM (SELECT user_id, event_id, ts FROM events
      WHERE event_type = 'error' AND user_id % {COGROUP_USER_MOD} = 0) e
ASOF LEFT JOIN (SELECT user_id, ts FROM events
                WHERE event_type = 'click' AND user_id % {COGROUP_USER_MOD} = 0) c
  ON e.user_id = c.user_id AND c.ts <= e.ts
"""


@register("asof_last_click_cogroup", oracle=_ASOF_COGROUP_ORACLE, tags=("join", "asof", "temporal", "pandas-api", "r7"))
def q_asof_cogroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The as-of join AGAIN, as ``groupBy().cogroup().applyInPandas`` with
    ``pandas.merge_asof`` per user — the co-grouped-map API surface
    (the one Arrow-batched pandas variant the repo didn't already
    exercise; grouped-map, grouped-agg, mapInPandas, mapInArrow and
    stateful all have operators).  Same oracle SHAPE as
    ``asof_last_click_before_error`` (DuckDB ASOF LEFT JOIN) restricted to
    the same sample — byte-identical output IS the demo's correctness claim.

    This is the API-coverage twin, not the production path: the union-tag
    ``asof_join`` stays entirely in whole-stage codegen, while this plan
    pays two FlatMapCoGroupsInPandas Arrow crossings.  Because the twin
    exists purely to exercise the API, it runs on a DETERMINISTIC 1-in-
    {COGROUP_USER_MOD} user sample (``user_id % {COGROUP_USER_MOD} = 0`` on
    both sides, pushed to the parquet scan): the cogroup machinery — Arrow
    cogrouping, per-group ``merge_asof``, empty-side handling — is
    exercised identically, without paying the full corpus's per-group
    Python dispatch (the unsampled form was the sweep's single most
    expensive query at 10.5 s, 17× its production twin; round-5 verdict
    carried it weak for exactly this).  Per-group state is one user's
    events (pandas sorts in-memory per group), so it scales in users like
    every other user-partitioned operator; a hot user bounds the batch.
    The inner function is NESTED deliberately: cloudpickle then serializes
    it by value, so Python workers never need this package importable
    (module-level functions break exactly when the driver imports the
    engine from a cwd the workers don't share)."""
    import pandas as pd  # noqa: PLC0415

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id") % COGROUP_USER_MOD == 0
    )
    errors = ev.filter(F.col("event_type") == "error").select("user_id", "event_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        # either side of a cogroup can arrive EMPTY — and an empty side may
        # carry no columns at all, so don't touch its columns before checking
        if left.empty:
            return pd.DataFrame(
                {
                    "user_id": pd.Series([], dtype="int64"),
                    "event_id": pd.Series([], dtype="int64"),
                    "ts": pd.Series([], dtype="datetime64[ns]"),
                    "last_click_ts": pd.Series([], dtype="datetime64[ns]"),
                }
            )
        left = left.sort_values("ts")
        if right.empty:  # errors but no clicks: ASOF left join keeps them, null match
            out = left.copy()
            out["last_click_ts"] = pd.NaT
            return out[["user_id", "event_id", "ts", "last_click_ts"]]
        right = right.sort_values("ts").rename(columns={"ts": "last_click_ts"})
        out = pd.merge_asof(
            left,
            right[["last_click_ts"]],
            left_on="ts",
            right_on="last_click_ts",
            direction="backward",
            allow_exact_matches=True,  # ties match, per ASOF semantics
        )
        return out[["user_id", "event_id", "ts", "last_click_ts"]]

    return (
        errors.groupBy("user_id")
        .cogroup(clicks.groupBy("user_id"))
        .applyInPandas(merge, "user_id long, event_id long, ts timestamp, last_click_ts timestamp")
    )


# --- Mann-Kendall monotonic-trend test -----------------------------------------

#: two-sided 5% normal critical value (z_{0.975}), identical literal both engines.
MK_Z_CRIT = 1.959963984540054

_MANN_KENDALL_ORACLE = f"""
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1
),
s AS (
  SELECT CAST(COALESCE(SUM(CASE WHEN b.n > a.n THEN 1 WHEN b.n < a.n THEN -1 ELSE 0 END), 0)
              AS BIGINT) AS s_stat
  FROM daily a JOIN daily b ON b.day > a.day
),
ties AS (
  SELECT CAST(COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT) AS tie_sum
  FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM daily GROUP BY n) g
),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM daily),
v AS (
  SELECT nn.n_days, s.s_stat,
         nn.n_days * (nn.n_days - 1) * (2 * nn.n_days + 5) - ties.tie_sum AS var18
  FROM nn CROSS JOIN s CROSS JOIN ties
)
SELECT n_days, s_stat,
       ROUND(CAST(var18 AS DOUBLE) / 18, 9) AS var_s,
       ROUND(CASE WHEN var18 = 0 OR s_stat = 0 THEN 0.0
                  WHEN s_stat > 0 THEN (CAST(s_stat AS DOUBLE) - 1) / sqrt(CAST(var18 AS DOUBLE) / 18)
                  ELSE (CAST(s_stat AS DOUBLE) + 1) / sqrt(CAST(var18 AS DOUBLE) / 18) END, 9) AS z,
       CASE WHEN var18 = 0 OR s_stat = 0 THEN 'no trend'
            WHEN s_stat > 0 AND (CAST(s_stat AS DOUBLE) - 1) / sqrt(CAST(var18 AS DOUBLE) / 18) > {MK_Z_CRIT}
              THEN 'increasing'
            WHEN s_stat < 0 AND (CAST(s_stat AS DOUBLE) + 1) / sqrt(CAST(var18 AS DOUBLE) / 18) < -{MK_Z_CRIT}
              THEN 'decreasing'
            ELSE 'no trend' END AS verdict
FROM v
"""


@register(
    "mann_kendall_daily_trend",
    oracle=_MANN_KENDALL_ORACLE,
    tags=("temporal", "stats", "timeseries", "r9"),
)
def q_mann_kendall_daily_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall nonparametric monotonic-trend test on the daily event
    volume: S = Σ_{i<j} sign(n_j − n_i) over day-ordered counts, the
    tie-corrected variance Var(S) = [n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)]/18,
    and the continuity-corrected z = (S ∓ 1)/√Var(S) with a 5% two-sided
    verdict.  The distribution-free significance companion to the
    ``theilsen_daily_trend`` slope estimate (Theil-Sen says HOW steep,
    Mann-Kendall says WHETHER the monotone trend is real) — together the
    textbook robust-trend pair.

    Scale shape mirrors Theil-Sen: ONE corpus scan and ONE shuffle (the
    daily aggregate); the |days|-row series then collapses to a single
    array row where the |days|²-bounded pair sweep and the per-element tie
    multiplicities run as array transforms — never a corpus-sized join.
    Exactness: counts, S, tie terms and the variance numerator are all
    exact int64 (the per-element tie identity Σ_i (c_i−1)(2c_i+5) over
    elements of each tie group equals Σ_t t(t−1)(2t+5) over groups); z is
    the single double expression, rounded once."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(F.count(F.lit(1)).alias("n"))
    packed = daily.agg(F.array_sort(F.collect_list(F.struct("day", "n"))).alias("dn"))
    arrays = packed.select(
        F.transform("dn", lambda d: d["n"]).alias("ys"), F.size("dn").alias("n_days")
    )
    from ..functions.arrays import ordered_pairs

    s_stat = F.aggregate(
        F.transform(
            ordered_pairs("ys"),
            lambda p: F.when(p["b"] > p["a"], 1).when(p["b"] < p["a"], -1).otherwise(0),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    # per-element tie identity: each element of a size-t tie group contributes
    # (t-1)(2t+5), so the element sum equals the group sum Σ t(t-1)(2t+5);
    # the multiplicity column materializes ONCE so the fold reads it, not
    # re-evaluates the O(n) filter per factor
    with_cnts = arrays.withColumn(
        "cnts",
        F.transform("ys", lambda y: F.size(F.filter("ys", lambda o: o == y)).cast("long")),
    )
    tie_sum = F.aggregate(
        "cnts", F.lit(0).cast("long"), lambda acc, c: acc + (c - 1) * (2 * c + 5)
    )
    nd = F.col("n_days").cast("long")
    # alias the long n_days only AFTER the array exprs resolve: a same-select
    # `.alias("n_days")` would shadow the int input via lateral column
    # aliasing and coerce element_at's index to bigint (analysis error)
    stats = with_cnts.select(
        F.col("n_days").alias("nd_int"),
        s_stat.alias("s_stat"),
        (nd * (nd - 1) * (2 * nd + 5) - tie_sum).alias("var18"),
    ).select(F.col("nd_int").cast("long").alias("n_days"), "s_stat", "var18")
    var_d = F.col("var18").cast("double") / 18
    z_raw = (
        F.when((F.col("var18") == 0) | (F.col("s_stat") == 0), F.lit(0.0))
        .when(F.col("s_stat") > 0, (F.col("s_stat").cast("double") - 1) / F.sqrt(var_d))
        .otherwise((F.col("s_stat").cast("double") + 1) / F.sqrt(var_d))
    )
    return stats.select(
        "n_days",
        "s_stat",
        F.round(var_d, 9).alias("var_s"),
        F.round(z_raw, 9).alias("z"),
        F.when((F.col("var18") == 0) | (F.col("s_stat") == 0), "no trend")
        .when((F.col("s_stat") > 0) & (z_raw > MK_Z_CRIT), "increasing")
        .when((F.col("s_stat") < 0) & (z_raw < -MK_Z_CRIT), "decreasing")
        .otherwise("no trend")
        .alias("verdict"),
    )


# --- autocorrelation function + Ljung-Box white-noise test ----------------------

#: ACF lags reported / pooled by the portmanteau test.
ACF_MAX_LAG = 7
#: chi-square 95% critical value at ACF_MAX_LAG degrees of freedom.
LJUNG_BOX_CRIT = 14.067140449340169

_ACF_ORACLE = f"""
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1
),
idx AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS t, y FROM daily),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS s FROM idx),
den AS (
  SELECT CAST(SUM((nn.n * idx.y - nn.s) * (nn.n * idx.y - nn.s)) AS BIGINT) AS d
  FROM idx CROSS JOIN nn
),
lags(k) AS (VALUES {", ".join(f"({k})" for k in range(1, ACF_MAX_LAG + 1))}),
num AS (
  SELECT l.k, CAST(SUM((nn.n * a.y - nn.s) * (nn.n * b.y - nn.s)) AS BIGINT) AS m,
         CAST(COUNT(*) AS BIGINT) AS n_pairs
  FROM lags l
  JOIN idx a ON TRUE
  JOIN idx b ON b.t = a.t - l.k
  CROSS JOIN nn
  GROUP BY l.k
)
SELECT CAST(num.k AS INTEGER) AS lag, num.n_pairs,
       ROUND(CAST(num.m AS DOUBLE) / CAST(den.d AS DOUBLE), 9) AS acf
FROM num CROSS JOIN den
"""


def _acf_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One packed row: ys (day-ordered counts), n, and the integerized
    centered sums — shared by the ACF table and the Ljung-Box statistic.

    Integerization: r_k's numerator and denominator are computed on
    n·y_t − S (all int64), i.e. the centered series scaled by n, so both
    sums are EXACT integers on every engine and partition order — the
    naive (y_t − ȳ) form sums doubles whose reduction order differs.
    Magnitude bound: |n·y − S| < n·max(y), so the squared sums stay below
    int64 for n·max(y) < ~3·10⁶·√n — years of daily buckets at millions of
    events/day; past that the one-line upgrade is DECIMAL(38,0) folds."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(F.count(F.lit(1)).alias("y"))
    packed = daily.agg(F.array_sort(F.collect_list(F.struct("day", "y"))).alias("dy"))
    return packed.select(
        F.transform("dy", lambda d: d["y"]).alias("ys"), F.size("dy").alias("n_days")
    )


def _acf_ratio(k: int):
    """num_k / den as one double expression over the packed arrays row."""
    n = F.col("n_days").cast("long")
    s = F.aggregate("ys", F.lit(0).cast("long"), lambda acc, x: acc + x)
    dev = lambda t: n * F.element_at("ys", t) - s  # exact int64 centered value
    den = F.aggregate(
        F.sequence(F.lit(1), F.col("n_days")),
        F.lit(0).cast("long"),
        lambda acc, t: acc + dev(t) * dev(t),
    )
    num = F.when(
        F.col("n_days") > k,
        F.aggregate(
            F.sequence(F.lit(k + 1), F.col("n_days")),
            F.lit(0).cast("long"),
            lambda acc, t: acc + dev(t) * dev(t - k),
        ),
    ).otherwise(F.lit(0).cast("long"))
    return num.cast("double") / den.cast("double")


@register("daily_acf", oracle=_ACF_ORACLE, tags=("temporal", "stats", "timeseries", "r9"))
def q_daily_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample autocorrelation of the daily event volume at lags 1…{ACF_MAX_LAG}:
    r_k = Σ(y_t − ȳ)(y_{t−k} − ȳ) / Σ(y_t − ȳ)² — the diagnostic behind
    every seasonality decision already in the repo (the 7-day MA window in
    ``daily_dow_decomposition``, the weekly lag in
    ``seasonal_naive_forecast_error``): a weekly cycle shows up as a
    positive spike at lag 7.  Scale shape mirrors Theil-Sen/Mann-Kendall:
    ONE corpus scan + ONE shuffle (the daily aggregate), then the series
    collapses to a packed array row where each lag's sum is an O(n) fold.
    Exactness: the centered series is integerized as n·y_t − S (see
    ``_acf_arrays``), so numerator and denominator are exact int64 sums on
    both engines; one division per lag, rounded once."""
    arrays = _acf_arrays(spark, sf_dir)
    nd = F.col("n_days").cast("long")
    rows = F.array(
        *[
            F.struct(
                F.lit(k).alias("lag"),
                F.greatest(nd - k, F.lit(0).cast("long")).alias("n_pairs"),
                F.round(_acf_ratio(k), 9).alias("acf"),
            )
            for k in range(1, ACF_MAX_LAG + 1)
        ]
    )
    return (
        arrays.select(F.explode(rows).alias("r"))
        .select("r.lag", "r.n_pairs", "r.acf")
        .filter(F.col("n_pairs") > 0)
    )


_LJUNG_BOX_ORACLE = f"""
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1
),
idx AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS t, y FROM daily),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS s FROM idx),
den AS (
  SELECT CAST(SUM((nn.n * idx.y - nn.s) * (nn.n * idx.y - nn.s)) AS BIGINT) AS d
  FROM idx CROSS JOIN nn
),
lags(k) AS (VALUES {", ".join(f"({k})" for k in range(1, ACF_MAX_LAG + 1))}),
num AS (
  SELECT l.k, CAST(SUM((nn.n * a.y - nn.s) * (nn.n * b.y - nn.s)) AS BIGINT) AS m
  FROM lags l
  JOIN idx a ON TRUE
  JOIN idx b ON b.t = a.t - l.k
  CROSS JOIN nn
  GROUP BY l.k
),
r AS (
  SELECT {", ".join(
    f"MAX(CASE WHEN num.k = {k} THEN CAST(num.m AS DOUBLE) / CAST(den.d AS DOUBLE) END) AS r{k}"
    for k in range(1, ACF_MAX_LAG + 1)
  )},
         MAX(nn.n) AS n
  FROM num CROSS JOIN den CROSS JOIN nn
)
SELECT CAST(n AS BIGINT) AS n_days, CAST({ACF_MAX_LAG} AS INTEGER) AS lags,
       ROUND(n * (n + 2.0) * ({" + ".join(f"(r{k} * r{k}) / (n - {k})" for k in range(1, ACF_MAX_LAG + 1))}), 9) AS q_stat,
       CASE WHEN n * (n + 2.0) * ({" + ".join(f"(r{k} * r{k}) / (n - {k})" for k in range(1, ACF_MAX_LAG + 1))}) > {LJUNG_BOX_CRIT}
            THEN 'autocorrelated' ELSE 'white noise' END AS verdict
FROM r
"""


@register("ljung_box_daily", oracle=_LJUNG_BOX_ORACLE, tags=("temporal", "stats", "timeseries", "r9"))
def q_ljung_box_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau test pooling the first {ACF_MAX_LAG} daily
    autocorrelations: Q = n(n+2)·Σ_k r_k²/(n−k), compared to the χ²({ACF_MAX_LAG})
    95 % critical value — "is the daily series white noise at all?", the
    gate you check before fitting any of the repo's trend/seasonal models.
    Q is a FIXED {ACF_MAX_LAG}-term parse tree over the exact-integer-ratio
    r_k values (a literal sum, not a float aggregation — order-free by
    construction), evaluated on the same packed-array row as ``daily_acf``;
    one round at the end.  Requires n_days > {ACF_MAX_LAG} (guaranteed by
    any month of data; shorter series would divide by zero in the n−k
    terms, which the oracle would equally refuse)."""
    arrays = _acf_arrays(spark, sf_dir)
    nd = F.col("n_days").cast("double")
    q_stat = None
    for k in range(1, ACF_MAX_LAG + 1):
        r = _acf_ratio(k)
        term = (r * r) / (nd - k)
        q_stat = term if q_stat is None else q_stat + term
    q_stat = nd * (nd + 2.0) * q_stat
    return arrays.select(
        F.col("n_days").cast("long").alias("n_days"),
        F.lit(ACF_MAX_LAG).cast("int").alias("lags"),
        F.round(q_stat, 9).alias("q_stat"),
        F.when(q_stat > LJUNG_BOX_CRIT, "autocorrelated")
        .otherwise("white noise")
        .alias("verdict"),
    )


# --- binary-segmentation changepoint --------------------------------------------

_CHANGEPOINT_ORACLE = """
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1
),
idx AS (
  SELECT day, y,
         CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS t,
         CAST(SUM(y) OVER (ORDER BY day) AS BIGINT) AS sl
  FROM daily
),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS s FROM daily),
g AS (
  SELECT idx.day, idx.t, idx.sl, nn.n, nn.s,
         CAST(nn.n * idx.sl - idx.t * nn.s AS DOUBLE) AS num
  FROM idx CROSS JOIN nn
  WHERE idx.t < nn.n
)
SELECT day AS split_day, CAST(t AS BIGINT) AS split_index, CAST(n AS BIGINT) AS n_days,
       ROUND(CAST(sl AS DOUBLE) / t, 9) AS mean_left,
       ROUND(CAST(s - sl AS DOUBLE) / (n - t), 9) AS mean_right,
       ROUND(CAST(s - sl AS DOUBLE) / (n - t) - CAST(sl AS DOUBLE) / t, 9) AS shift,
       ROUND(num * num / (CAST(t AS DOUBLE) * (n - t)), 9) AS g_stat
FROM g
ORDER BY num * num / (CAST(t AS DOUBLE) * (n - t)) DESC, t ASC
LIMIT 1
"""


@register("daily_changepoint", oracle=_CHANGEPOINT_ORACLE, tags=("temporal", "stats", "timeseries", "r9"))
def q_daily_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-changepoint detection by binary segmentation on the daily
    event volume: the split τ maximizing the between-segment sum of squares
    B(τ) = τ(μ_L − ȳ)² + (n−τ)(μ_R − ȳ)², reduced to the integer form
    g(τ) = (n·S_L(τ) − τ·S)² / (τ(n−τ)) so every candidate's score is one
    double expression over exact int64 prefix sums — the retrospective
    "WHEN did the level shift?" answer next to CUSUM's sequential "did it
    shift?" alarm (recursing on the two halves is classic binary
    segmentation; one level is the operator, the driver recursion is the
    caller's loop).  Ties break on the earliest split.

    Scale shape: one corpus scan + the daily aggregate shuffle; the
    prefix-sum window and the argmax run over the |days|-row frame (a
    bounded single-partition window, same budget as ``record_high_days``),
    and the top-1 is a TakeOrderedAndProject.  Exactness: S_L, t·S are
    exact int64 (|n·S_L| ≤ n·S bounds validity to n·S < 2⁵³ — decades at
    billions of events/day); the score is a fixed parse tree, rounded
    once for display but compared unrounded."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(F.count(F.lit(1)).alias("y"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    idx = daily.select(
        "day",
        F.row_number().over(Window.orderBy("day")).cast("long").alias("t"),
        F.sum("y").over(w).cast("long").alias("sl"),
    )
    nn = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"), F.sum("y").cast("long").alias("s")
    )  # 1 row, broadcast, lazy
    g = (
        idx.crossJoin(F.broadcast(nn))
        .filter(F.col("t") < F.col("n"))
        .withColumn("num", (F.col("n") * F.col("sl") - F.col("t") * F.col("s")).cast("double"))
        .withColumn(
            "g_raw", F.col("num") * F.col("num") / (F.col("t").cast("double") * (F.col("n") - F.col("t")))
        )
    )
    mean_left = F.col("sl").cast("double") / F.col("t")
    mean_right = (F.col("s") - F.col("sl")).cast("double") / (F.col("n") - F.col("t"))
    return (
        g.orderBy(F.desc("g_raw"), F.asc("t"))
        .limit(1)
        .select(
            F.col("day").alias("split_day"),
            F.col("t").alias("split_index"),
            F.col("n").alias("n_days"),
            F.round(mean_left, 9).alias("mean_left"),
            F.round(mean_right, 9).alias("mean_right"),
            F.round(mean_right - mean_left, 9).alias("shift"),
            F.round("g_raw", 9).alias("g_stat"),
        )
    )


# --- trailing robust (median/MAD) outlier band ----------------------------------

#: trailing window width (days) and the MAD multiple that flags a day.
ROBUST_BAND_WINDOW = 7
ROBUST_BAND_K = 3

_ROBUST_BAND_ORACLE = f"""
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1
),
win AS (
  SELECT day, y,
         list_sort(list(y) OVER (ORDER BY day
                                 ROWS BETWEEN {ROBUST_BAND_WINDOW - 1} PRECEDING AND CURRENT ROW)) AS w
  FROM daily
),
med AS (
  SELECT day, y, w, w[(len(w) + 1) // 2] AS med
  FROM win WHERE len(w) = {ROBUST_BAND_WINDOW}
),
mad AS (
  -- deviations over the SAME ROWS-based window list as the median (a
  -- calendar-interval rescan would see fewer rows whenever a day has no
  -- events, diverging from the rows-frame the engine side uses)
  SELECT day, y, med,
         list_sort(list_transform(w, v -> abs(v - med)))[(len(w) + 1) // 2] AS mad
  FROM med
)
SELECT day, y, CAST(med AS BIGINT) AS med, CAST(mad AS BIGINT) AS mad,
       y - med > {ROBUST_BAND_K} * mad OR med - y > {ROBUST_BAND_K} * mad AS is_outlier
FROM mad
"""


@register("daily_robust_band", oracle=_ROBUST_BAND_ORACLE, tags=("temporal", "stats", "timeseries", "r9"))
def q_daily_robust_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing {W}-day robust outlier band on the daily event volume: each
    day compared to the DISCRETE median and MAD of its own trailing window,
    flagged when it leaves the ±{K}·MAD band — the rolling counterpart of
    the global ``mad_outlier_events`` and the robust alternative to
    ``daily_event_bursts``'s EWMA (a single extreme day poisons a trailing
    mean; it moves a trailing median by one rank).  The window is the last
    {W} OBSERVED days (a ROWS frame), not a calendar interval — zero-event
    days don't shrink it, and the oracle mirrors the same rows semantics.
    Warmup days with a short window are suppressed so every verdict uses a
    full window.

    Exactness: counts are int64, the trailing window materializes as a
    sorted {W}-element array (collect_list over a ROWS frame), and the
    lower median / MAD are rank selections — every value in the output is
    an exact integer, the flag an exact integer comparison; no floats
    anywhere.  Scale shape: one corpus shuffle (daily aggregate), then a
    bounded single-partition window over the |days| frame with O({W})
    state per row (same budget class as ``record_high_days``)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("y")
    )
    w = Window.orderBy("day").rowsBetween(-(ROBUST_BAND_WINDOW - 1), Window.currentRow)
    win = daily.withColumn("w", F.array_sort(F.collect_list("y").over(w))).filter(
        F.size("w") == ROBUST_BAND_WINDOW
    )

    def lower_median(arr):
        n = F.size(arr)
        return F.element_at(arr, ((n + 1) / 2).cast("int"))

    med = win.withColumn("med", lower_median(F.col("w")))
    mad_arr = F.array_sort(F.transform("w", lambda v: F.abs(v - F.col("med"))))
    mad = med.withColumn("mad", lower_median(mad_arr))
    dev = F.col("y") - F.col("med")
    return mad.select(
        "day",
        "y",
        F.col("med").cast("long").alias("med"),
        F.col("mad").cast("long").alias("mad"),
        ((dev > ROBUST_BAND_K * F.col("mad")) | (-dev > ROBUST_BAND_K * F.col("mad"))).alias(
            "is_outlier"
        ),
    )


# --- cohort cumulative value (LTV curve) -----------------------------------------

_LTV_ORACLE = """
WITH fd AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day FROM events GROUP BY 1
),
cs AS (SELECT cohort_day, CAST(COUNT(*) AS BIGINT) AS cohort_size FROM fd GROUP BY 1),
dv AS (
  SELECT fd.cohort_day,
         CAST(datediff('day', fd.cohort_day, CAST(e.ts AS DATE)) AS BIGINT) AS day_offset,
         CAST(SUM(CAST(e.value AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS day_value
  FROM events e JOIN fd ON fd.user_id = e.user_id
  GROUP BY 1, 2
)
SELECT dv.cohort_day, dv.day_offset, cs.cohort_size,
       ROUND(CAST(SUM(dv.day_value) OVER (PARTITION BY dv.cohort_day ORDER BY dv.day_offset)
                  AS DOUBLE) / cs.cohort_size, 9) AS cum_value_per_user
FROM dv JOIN cs ON cs.cohort_day = dv.cohort_day
"""


@register("cohort_ltv_curve", oracle=_LTV_ORACLE, tags=("temporal", "cohort", "r9"))
def q_cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV curve: cumulative value per user by days since first
    seen, one row per (cohort_day, offset) — the monetized companion to
    ``user_retention_cohorts`` (retention says who comes back; this says
    what the average cohort member has been WORTH by day k, the curve
    payback-period and CAC decisions read).

    Scale shape: the first-seen table and the per-(cohort, offset) value
    rollup share the user-keyed shuffle; the cumulative window then runs
    per cohort over ≤|days| offsets (cohort-keyed partitions, no global
    sort).  Exactness: day values accumulate as exact decimal, the running
    sum is a window over exact decimals, and the per-user division is the
    single double step, rounded once."""
    ev = load_table(spark, sf_dir, "events")
    fd = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("cohort_day"))
    cs = fd.groupBy("cohort_day").agg(F.count(F.lit(1)).cast("long").alias("cohort_size"))
    dv = (
        ev.join(fd, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff(F.to_date("ts"), F.col("cohort_day")).cast("long").alias("day_offset"),
        )
        .agg(F.sum(F.col("value").cast("decimal(18,6)")).cast("decimal(38,6)").alias("day_value"))
    )
    w = (
        Window.partitionBy("cohort_day")
        .orderBy("day_offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        dv.withColumn("cum", F.sum("day_value").over(w))
        .join(F.broadcast(cs), "cohort_day")
        .select(
            "cohort_day",
            "day_offset",
            "cohort_size",
            F.round(F.col("cum").cast("double") / F.col("cohort_size"), 9).alias(
                "cum_value_per_user"
            ),
        )
    )


# --- Mann-Whitney rank-sum: weekday vs weekend ------------------------------------

_RANKSUM_ORACLE = """
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1
),
lab AS (
  SELECT y, CASE WHEN dayofweek(day) IN (0, 6) THEN 1 ELSE 0 END AS is_weekend
  FROM daily
),
g AS (
  SELECT y, CAST(SUM(is_weekend) AS BIGINT) AS w,
         CAST(COUNT(*) - SUM(is_weekend) AS BIGINT) AS d
  FROM lab GROUP BY 1
),
c AS (
  SELECT w, d,
         CAST(SUM(w + d) OVER (ORDER BY y) - (w + d) AS BIGINT) AS below
  FROM g
),
s AS (
  SELECT CAST(SUM(w) AS BIGINT) AS nw, CAST(SUM(d) AS BIGINT) AS nd,
         SUM(CAST(w AS DOUBLE) * (CAST(below AS DOUBLE) + (CAST(w AS DOUBLE) + d) / 2 + 0.5)) AS rw,
         SUM(CAST((w + d) AS DOUBLE) * (w + d) * (w + d) - (w + d)) AS tie3
  FROM c
)
SELECT nw AS n_weekend, nd AS n_weekday,
       ROUND(rw, 9) AS weekend_ranksum,
       ROUND(rw - nw * (nw + 1.0) / 2, 9) AS u_stat,
       ROUND(CASE WHEN nw = 0 OR nd = 0 THEN 0.0 ELSE
         (rw - nw * (nw + nd + 1.0) / 2)
         / sqrt(CAST(nw AS DOUBLE) * nd / 12
                * ((nw + nd + 1.0) - tie3 / (CAST(nw + nd AS DOUBLE) * (nw + nd - 1)))) END, 9) AS z
FROM s
"""


@register("weekend_volume_ranksum", oracle=_RANKSUM_ORACLE, tags=("temporal", "stats", "r9"))
def q_weekend_volume_ranksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon-Mann-Whitney rank-sum test of weekend vs weekday daily
    volume: the weekend group's midrank sum, the U statistic, and the
    tie-corrected normal z — the distribution-free two-sample test that
    answers "are weekends a DIFFERENT population?" where
    ``daily_dow_decomposition`` only estimates by how much (same
    machinery family as ``quality_score_auc``: U/(n₁n₂) IS an AUC).

    Sort-free exactness, same lattice discipline as the AUC: collapse to
    one row per distinct count, cumulative window over the collapsed
    frame; each group's midrank contribution w·(below + (w+d)/2 + ½) is a
    sum of exact multiples of 0.5 (order-free below 2⁵²); the tie term
    Σ(t³−t) is exact integer arithmetic in double (t ≤ |days|).  One z
    expression, rounded once."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(F.count(F.lit(1)).alias("y"))
    lab = daily.select(
        "y", F.when(F.dayofweek("day").isin(1, 7), 1).otherwise(0).alias("is_weekend")
    )
    g = lab.groupBy("y").agg(
        F.sum("is_weekend").cast("long").alias("w"),
        (F.count(F.lit(1)) - F.sum("is_weekend")).cast("long").alias("d"),
    )
    wlat = Window.orderBy("y").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    c = g.withColumn(
        "below", (F.sum(F.col("w") + F.col("d")).over(wlat) - (F.col("w") + F.col("d"))).cast("long")
    )
    t = (F.col("w") + F.col("d")).cast("double")
    s = c.agg(
        F.sum("w").cast("long").alias("nw"),
        F.sum("d").cast("long").alias("nd"),
        F.sum(
            F.col("w").cast("double")
            * (F.col("below").cast("double") + (F.col("w").cast("double") + F.col("d")) / 2 + 0.5)
        ).alias("rw"),
        F.sum(t * t * t - t).alias("tie3"),
    )
    nw, nd = F.col("nw").cast("double"), F.col("nd").cast("double")
    z = F.when((F.col("nw") == 0) | (F.col("nd") == 0), F.lit(0.0)).otherwise(
        (F.col("rw") - nw * (nw + nd + 1.0) / 2)
        / F.sqrt(
            nw * nd / 12 * ((nw + nd + 1.0) - F.col("tie3") / ((nw + nd) * (nw + nd - 1)))
        )
    )
    return s.select(
        F.col("nw").alias("n_weekend"),
        F.col("nd").alias("n_weekday"),
        F.round("rw", 9).alias("weekend_ranksum"),
        F.round(F.col("rw") - nw * (nw + 1.0) / 2, 9).alias("u_stat"),
        F.round(z, 9).alias("z"),
    )


# --- Kendall tau-b between two daily series ---------------------------------------

_KENDALL_ORACLE = """
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS x,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS y
  FROM events GROUP BY 1
),
p AS (
  SELECT CAST(SUM(CASE WHEN (b.x - a.x) * (b.y - a.y) > 0 THEN 1 ELSE 0 END) AS BIGINT) AS conc,
         CAST(SUM(CASE WHEN (b.x - a.x) * (b.y - a.y) < 0 THEN 1 ELSE 0 END) AS BIGINT) AS disc,
         CAST(SUM(CASE WHEN a.x = b.x AND a.y <> b.y THEN 1 ELSE 0 END) AS BIGINT) AS tx,
         CAST(SUM(CASE WHEN a.y = b.y AND a.x <> b.x THEN 1 ELSE 0 END) AS BIGINT) AS ty,
         CAST(COUNT(*) AS BIGINT) AS n_pairs
  FROM daily a JOIN daily b ON b.day > a.day
),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM daily)
SELECT nn.n AS n_days, p.conc AS concordant, p.disc AS discordant,
       ROUND(CASE WHEN p.conc + p.disc + p.tx = 0 OR p.conc + p.disc + p.ty = 0 THEN 0.0
             ELSE (p.conc - p.disc)
                  / sqrt(CAST(p.conc + p.disc + p.tx AS DOUBLE) * (p.conc + p.disc + p.ty)) END, 9)
         AS tau_b
FROM p CROSS JOIN nn
"""


@register("kendall_tau_click_purchase", oracle=_KENDALL_ORACLE, tags=("temporal", "stats", "timeseries", "r9"))
def q_kendall_tau_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall τ-b between the daily click and purchase volumes:
    (concordant − discordant) / √((C+D+Tx)(C+D+Ty)) over all day pairs,
    with the tie adjustment in each margin — the robust, outlier-immune
    companion to ``rolling_corr_click_purchase``'s Pearson view (one
    viral spike day can manufacture Pearson correlation; it contributes
    exactly n−1 concordances to τ).

    Scale shape mirrors Mann-Kendall: ONE corpus scan + the daily
    two-counter aggregate, then the |days|²-bounded pair sweep as array
    transforms on a single packed row.  Exactness: every pair classifies
    by exact integer comparisons; C, D, Tx, Ty are exact int64; one
    guarded division, rounded once."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).cast("long").alias("x"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).cast("long").alias("y"),
    )
    packed = daily.agg(F.array_sort(F.collect_list(F.struct("day", "x", "y"))).alias("dxy"))
    arrays = packed.select(
        F.transform("dxy", lambda d: d["x"]).alias("xs"),
        F.transform("dxy", lambda d: d["y"]).alias("ys"),
        F.size("dxy").alias("n_days"),
    )

    from ..functions.arrays import ordered_pairs

    # ONE pair sweep classifies every (i<j) pair into a code (concordant /
    # discordant / x-tie / y-tie / both-tie); the four counts then fold over
    # the MATERIALIZED codes array — the earlier per-statistic pair_count
    # calls rebuilt the O(n²) nested expansion four times
    code = lambda p: (
        F.when((p["b"]["xs"] - p["a"]["xs"]) * (p["b"]["ys"] - p["a"]["ys"]) > 0, 0)
        .when((p["b"]["xs"] - p["a"]["xs"]) * (p["b"]["ys"] - p["a"]["ys"]) < 0, 1)
        .when((p["b"]["xs"] == p["a"]["xs"]) & (p["b"]["ys"] != p["a"]["ys"]), 2)
        .when((p["b"]["ys"] == p["a"]["ys"]) & (p["b"]["xs"] != p["a"]["xs"]), 3)
        .otherwise(4)
    )
    coded = arrays.withColumn(
        "codes", F.transform(ordered_pairs(F.arrays_zip("xs", "ys")), code)
    )

    def count_code(k: int):
        return F.aggregate(
            "codes", F.lit(0).cast("long"), lambda acc, c: acc + F.when(c == k, 1).otherwise(0)
        )

    stats = coded.select(
        F.col("n_days").cast("long").alias("n_days"),
        count_code(0).alias("concordant"),
        count_code(1).alias("discordant"),
        count_code(2).alias("tx"),
        count_code(3).alias("ty"),
    )
    cd = F.col("concordant") - F.col("discordant")
    d1 = (F.col("concordant") + F.col("discordant") + F.col("tx")).cast("double")
    d2 = (F.col("concordant") + F.col("discordant") + F.col("ty")).cast("double")
    return stats.select(
        "n_days",
        "concordant",
        "discordant",
        F.round(
            F.when((d1 == 0) | (d2 == 0), 0.0).otherwise(cd.cast("double") / F.sqrt(d1 * d2)), 9
        ).alias("tau_b"),
    )

