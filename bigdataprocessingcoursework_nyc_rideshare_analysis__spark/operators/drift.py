"""Distribution-drift statistics: two-sample Kolmogorov–Smirnov distance
and the corpus Zipf-law fit.

No reference counterpart (SURVEY.md §2.9 extension tier).  Both are the
monitoring half of a data pipeline — detecting when a new snapshot's value
distribution or token distribution has shifted from the last one:

- ``ks_drift_click_vs_purchase``: binned two-sample KS statistic
  ``D = max_x |F_A(x) − F_B(x)|`` between two event populations.  Values
  are binned first (one decimal), so the ordered-CDF window runs over the
  bounded |bins| aggregate, not the raw stream — the binning is the scale
  lever that keeps the global-order step O(bins) instead of O(rows), and
  the bin width is the resolution of the drift alarm.
- ``zipf_slope_terms``: OLS slope/intercept of ln(freq) on ln(rank) over
  the top terms — natural text tracks slope ≈ −1 (Zipf's law); a corpus
  whose slope drifts toward 0 is boilerplate-heavy or synthetic.  The
  corpus-sized work is one term-count aggregation; the regression runs on
  the |top-k| rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..datapipe.stage import staged_features
from ..functions.text import tokens_of
from ..registry import register
from ..sources import load_table

KS_GROUP_A = "click"
KS_GROUP_B = "purchase"

_KS_ORACLE = f"""
WITH binned AS (
  SELECT ROUND(value, 1) AS bin,
         SUM(CASE WHEN event_type = '{KS_GROUP_A}' THEN 1 ELSE 0 END) AS a_c,
         SUM(CASE WHEN event_type = '{KS_GROUP_B}' THEN 1 ELSE 0 END) AS b_c
  FROM events
  WHERE event_type IN ('{KS_GROUP_A}', '{KS_GROUP_B}')
  GROUP BY 1
), cdf AS (
  SELECT bin,
         SUM(a_c) OVER (ORDER BY bin) / CAST(SUM(a_c) OVER () AS DOUBLE) AS cdf_a,
         SUM(b_c) OVER (ORDER BY bin) / CAST(SUM(b_c) OVER () AS DOUBLE) AS cdf_b
  FROM binned
)
SELECT '{KS_GROUP_A}' AS group_a, '{KS_GROUP_B}' AS group_b,
       MAX(ABS(cdf_a - cdf_b)) AS ks_distance
FROM cdf
"""


def ks_statistic(df: DataFrame, value_col: str, group_col: str, a: str, b: str) -> DataFrame:
    """Binned two-sample KS distance between groups ``a`` and ``b``."""
    binned = (
        df.filter(F.col(group_col).isin(a, b))
        .groupBy(F.round(value_col, 1).alias("bin"))
        .agg(
            F.sum(F.when(F.col(group_col) == a, 1).otherwise(0)).alias("a_c"),
            F.sum(F.when(F.col(group_col) == b, 1).otherwise(0)).alias("b_c"),
        )
    )
    # |bins|-row table: the unpartitioned window is bounded by bin count
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    tot = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    cdf = binned.select(
        (F.sum("a_c").over(w) / F.sum("a_c").over(tot).cast("double")).alias("cdf_a"),
        (F.sum("b_c").over(w) / F.sum("b_c").over(tot).cast("double")).alias("cdf_b"),
    )
    return cdf.agg(
        F.lit(a).alias("group_a"),
        F.lit(b).alias("group_b"),
        F.max(F.abs(F.col("cdf_a") - F.col("cdf_b"))).alias("ks_distance"),
    )


@register("ks_drift_click_vs_purchase", oracle=_KS_ORACLE, tags=("events", "stats", "drift", "r4"))
def q_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KS distance between click and purchase value distributions."""
    ev = load_table(spark, sf_dir, "events")
    return ks_statistic(ev, "value", "event_type", KS_GROUP_A, KS_GROUP_B)


ZIPF_TOP_TERMS = 1000

_ZIPF_ORACLE = f"""
WITH counts AS (
  SELECT t.term, COUNT(*) AS freq
  FROM (SELECT unnest(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS term
        FROM documents) t
  GROUP BY t.term
), ranked AS (
  SELECT freq, ROW_NUMBER() OVER (ORDER BY freq DESC, term ASC) AS rank
  FROM counts
  ORDER BY freq DESC, term ASC
  LIMIT {ZIPF_TOP_TERMS}
)
SELECT COUNT(*) AS n_terms,
       ROUND(regr_slope(ln(CAST(freq AS DOUBLE)), ln(CAST(rank AS DOUBLE))), 12) AS zipf_slope,
       ROUND(regr_intercept(ln(CAST(freq AS DOUBLE)), ln(CAST(rank AS DOUBLE))), 12) AS zipf_intercept
FROM ranked
"""


@register("zipf_slope_terms", oracle=_ZIPF_ORACLE, tags=("datapipe", "text", "stats", "r4"))
def q_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf fit of the term rank-frequency curve: OLS of ln(freq) on
    ln(rank) over the top {ZIPF_TOP_TERMS} terms (deterministic rank via
    (freq desc, term asc)).  slope = covar_pop/var_pop, the textbook OLS
    identity both engines implement; one 12-dp rounding pins ulp drift in
    ln/÷.  Term counts come off the staged token frame (tokenize-once)."""
    docs = staged_features(spark, sf_dir)
    counts = (
        docs.select(F.explode(tokens_of(docs)).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("term"))
        .limit(ZIPF_TOP_TERMS)
    )
    w = Window.orderBy(F.desc("freq"), F.asc("term"))
    ranked = counts.select(
        F.log(F.col("freq").cast("double")).alias("lf"),
        F.log(F.row_number().over(w).cast("double")).alias("lr"),
    )
    slope = F.covar_pop("lr", "lf") / F.var_pop("lr")
    return ranked.agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.round(slope, 12).alias("zipf_slope"),
        F.round(F.avg("lf") - slope * F.avg("lr"), 12).alias("zipf_intercept"),
    )


# --- trend + autocorrelation ------------------------------------------------

_TREND_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS c
  FROM events GROUP BY 1, 2
), x AS (
  SELECT event_type,
         CAST(d - MIN(d) OVER (PARTITION BY event_type) AS DOUBLE) AS day_x,
         CAST(c AS DOUBLE) AS y
  FROM daily
)
SELECT event_type,
       COUNT(*) AS n_days,
       ROUND(regr_slope(y, day_x), 12) AS trend_per_day,
       ROUND(regr_intercept(y, day_x), 12) AS level
FROM x
GROUP BY event_type
"""


@register("event_volume_trend", oracle=_TREND_ORACLE, tags=("events", "stats", "drift", "r4"))
def q_event_volume_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type volume trend: OLS slope of daily counts against days
    since that type's first appearance — the grow/decay health metric a
    pipeline alerts on.  Two hash aggregations + a per-type min window; the
    regression identity (covar_pop/var_pop) runs on the |types|×|days|
    aggregate."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).alias("c")
    )
    w = Window.partitionBy("event_type")
    x = daily.select(
        "event_type",
        F.datediff(F.col("d"), F.min("d").over(w)).cast("double").alias("day_x"),
        F.col("c").cast("double").alias("y"),
    )
    slope = F.covar_pop("day_x", "y") / F.var_pop("day_x")
    return x.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.round(slope, 12).alias("trend_per_day"),
        F.round(F.avg("y") - slope * F.avg("day_x"), 12).alias("level"),
    )


AUTOCORR_LAG = 1

_AUTOCORR_ORACLE = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, COUNT(*) AS c FROM events GROUP BY 1
), lagged AS (
  SELECT CAST(c AS DOUBLE) AS y,
         CAST(LAG(c, {AUTOCORR_LAG}) OVER (ORDER BY d) AS DOUBLE) AS y_prev
  FROM daily
)
SELECT {AUTOCORR_LAG} AS lag,
       COUNT(*) AS n_pairs,
       ROUND(corr(y, y_prev), 12) AS autocorr
FROM lagged WHERE y_prev IS NOT NULL
"""


@register("daily_autocorrelation", oracle=_AUTOCORR_ORACLE, tags=("events", "stats", "drift", "r4"))
def q_daily_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of the daily event-count series — near 0 for
    independent days, near 1 for strong day-over-day persistence (and a
    cheap seasonality probe at lag 7).  The unpartitioned lag window runs
    on the |days| aggregate, not the raw stream."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(F.count(F.lit(1)).alias("c"))
    w = Window.orderBy("d")
    lagged = daily.select(
        F.col("c").cast("double").alias("y"),
        F.lag("c", AUTOCORR_LAG).over(w).cast("double").alias("y_prev"),
    ).filter(F.col("y_prev").isNotNull())
    return lagged.agg(
        F.lit(AUTOCORR_LAG).alias("lag"),
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.corr("y", "y_prev"), 12).alias("autocorr"),
    )


_CONTINGENCY_ORACLE = """
WITH cells AS (
  SELECT event_type, CAST(hour(ts) // 6 AS BIGINT) AS daypart, COUNT(*) AS observed
  FROM events GROUP BY 1, 2
),
rows_ AS (SELECT event_type, SUM(observed) AS r_tot FROM cells GROUP BY 1),
cols_ AS (SELECT daypart, SUM(observed) AS c_tot FROM cells GROUP BY 1),
tot AS (SELECT SUM(observed) AS n FROM cells)
SELECT c.event_type, c.daypart, c.observed,
       ROUND(CAST(r.r_tot * co.c_tot AS DOUBLE) / tot.n, 9) AS expected,
       ROUND(
         (c.observed - CAST(r.r_tot * co.c_tot AS DOUBLE) / tot.n)
           * (c.observed - CAST(r.r_tot * co.c_tot AS DOUBLE) / tot.n)
           / (CAST(r.r_tot * co.c_tot AS DOUBLE) / tot.n),
         9) AS chi2_contribution
FROM cells c
JOIN rows_ r ON r.event_type = c.event_type
JOIN cols_ co ON co.daypart = c.daypart
CROSS JOIN tot
"""


@register("event_daypart_contingency", oracle=_CONTINGENCY_ORACLE, tags=("drift", "stats", "r5"))
def q_event_daypart_contingency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square contingency analysis of event_type × day-part (6-hour
    bands): observed vs independence-expected counts and each cell's χ²
    contribution — the categorical drift/independence companion to the
    numeric KS statistic above (is behaviour time-of-day dependent, and
    WHICH cells drive it).  The per-cell table is the deliverable: summing
    ``chi2_contribution`` gives the χ² statistic, but a float sum over
    unordered cells is summation-order-sensitive, so the pinned contract
    stops at cells (each one exact int64 margins → one division chain,
    rounded once — bit-identical cross-engine) and the scalar is one
    ``agg`` away for the consumer.

    Plan: one map-side-combined cell aggregate (|types|×|dayparts| rows),
    margins reduced FROM THE CELLS (never a second corpus scan), broadcast
    margin joins.  Corpus cost = one aggregation pass regardless of scale."""
    ev = load_table(spark, sf_dir, "events")
    cells = (
        ev.select("event_type", (F.hour("ts") / 6).cast("bigint").alias("daypart"))
        .groupBy("event_type", "daypart")
        .agg(F.count(F.lit(1)).alias("observed"))
    )
    # margins as WINDOW sums over the |types|×|dayparts| cells frame — the
    # separate rows_/cols_/tot rollups re-derived the corpus aggregate per
    # branch (4 corpus passes statically); windows keep it at ONE, and the
    # window exchanges move ≤20 rows
    from pyspark.sql import Window

    margined = cells.select(
        "event_type",
        "daypart",
        "observed",
        F.sum("observed").over(Window.partitionBy("event_type")).alias("r_tot"),
        F.sum("observed").over(Window.partitionBy("daypart")).alias("c_tot"),
        F.sum("observed").over(Window.partitionBy()).alias("n"),
    )
    expected = (F.col("r_tot") * F.col("c_tot")).cast("double") / F.col("n")
    return (
        margined
        .select(
            "event_type",
            "daypart",
            "observed",
            F.round(expected, 9).alias("expected"),
            F.round(
                (F.col("observed") - expected) * (F.col("observed") - expected) / expected, 9
            ).alias("chi2_contribution"),
        )
    )


PSI_BINS = 10
PSI_SMOOTH = 0.5  # additive smoothing so empty comparison bins stay finite

_PSI_ORACLE = f"""
WITH ref AS (
  SELECT value, ROW_NUMBER() OVER () AS rid FROM events WHERE event_type = 'click'
),
cmp AS (
  SELECT value, ROW_NUMBER() OVER () AS rid FROM events WHERE event_type = 'purchase'
),
ranked AS (
  SELECT value, ROW_NUMBER() OVER (ORDER BY value) AS rn, COUNT(*) OVER () AS n FROM ref
),
edges AS (
  SELECT CAST(i AS BIGINT) AS i, MAX(CASE WHEN rn = greatest(((n + 1) * i) // {PSI_BINS}, 1) THEN value END) AS edge
  FROM ranked, UNNEST(range(1, {PSI_BINS})) AS u(i)
  GROUP BY 1
),
rbin AS (
  SELECT 1 + COUNT(e.edge) FILTER (WHERE r.value > e.edge) AS bin
  FROM ref r CROSS JOIN edges e GROUP BY r.rid
),
cbin AS (
  SELECT 1 + COUNT(e.edge) FILTER (WHERE c.value > e.edge) AS bin
  FROM cmp c CROSS JOIN edges e GROUP BY c.rid
),
rc AS (SELECT bin, COUNT(*) AS ref_n FROM rbin GROUP BY 1),
cc AS (SELECT bin, COUNT(*) AS cmp_n FROM cbin GROUP BY 1),
tot AS (SELECT (SELECT COUNT(*) FROM ref) AS rn, (SELECT COUNT(*) FROM cmp) AS cn),
bins AS (SELECT CAST(i AS BIGINT) + 1 AS bin FROM UNNEST(range(0, {PSI_BINS})) AS u(i))
SELECT b.bin,
       COALESCE(rc.ref_n, 0) AS ref_n,
       COALESCE(cc.cmp_n, 0) AS cmp_n,
       ROUND((COALESCE(rc.ref_n, 0) + {PSI_SMOOTH}) / (tot.rn + {PSI_BINS} * {PSI_SMOOTH}), 9) AS p,
       ROUND((COALESCE(cc.cmp_n, 0) + {PSI_SMOOTH}) / (tot.cn + {PSI_BINS} * {PSI_SMOOTH}), 9) AS q,
       ROUND(
         ((COALESCE(rc.ref_n, 0) + {PSI_SMOOTH}) / (tot.rn + {PSI_BINS} * {PSI_SMOOTH})
          - (COALESCE(cc.cmp_n, 0) + {PSI_SMOOTH}) / (tot.cn + {PSI_BINS} * {PSI_SMOOTH}))
         * ln(((COALESCE(rc.ref_n, 0) + {PSI_SMOOTH}) / (tot.rn + {PSI_BINS} * {PSI_SMOOTH}))
              / ((COALESCE(cc.cmp_n, 0) + {PSI_SMOOTH}) / (tot.cn + {PSI_BINS} * {PSI_SMOOTH}))),
         9) AS psi_contribution
FROM bins b
LEFT JOIN rc ON rc.bin = b.bin
LEFT JOIN cc ON cc.bin = b.bin
CROSS JOIN tot
"""


@register("psi_click_vs_purchase", oracle=_PSI_ORACLE, tags=("drift", "stats", "r5"))
def q_psi_click_vs_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the click and purchase value
    distributions — the ML-monitoring standard for feature/score drift
    (PSI < 0.1 stable, > 0.25 shifted), complementing the KS statistic
    above: KS gives one worst-case distance, PSI localizes drift to bins.
    Bin edges are the reference side's exact decile values (rank selection,
    the quartile family's rule), so bins are data-defined, not synthetic;
    both populations are assigned by counting edges below each value
    against the broadcast 9-row edge table; smoothing (+{PSI_SMOOTH}) keeps
    empty comparison bins finite.

    Per-bin output (ref_n, cmp_n, p, q, psi_contribution) — summing the
    contributions yields the scalar PSI, but the pinned contract stops at
    bins for the same reason as the χ² cells: a float sum over unordered
    bins is summation-order-sensitive, while each bin's value is one
    division chain + one ln, rounded once.  Plan: rank numbering over the
    REFERENCE slice via ``global_row_number`` (round-8 sweep — the old
    unpartitioned window funneled every click row through one task, the
    only FACT-sized offender in the package), then two broadcast-join +
    count passes; corpus cost = two filtered scans.  `value` has ties and
    no unique tiebreak column, so rn is an arbitrary permutation within
    each tie group — harmless here because the ranks are only ever mapped
    back to VALUES (decile edges), and equal values yield the same edge
    under any tie permutation."""
    from ..functions.skew import global_row_number

    ev = load_table(spark, sf_dir, "events")
    ref = ev.filter(F.col("event_type") == "click").select("value")
    cmp = ev.filter(F.col("event_type") == "purchase").select("value")
    # the reference-slice size rides out of the helper (count_alias) — no
    # second filtered events scan for the 1-row count crossJoin (r12)
    ranked = global_row_number(ref, ["value"], "rn", count_alias="n")
    edges = (
        ranked.crossJoin(F.broadcast(spark.range(1, PSI_BINS).select(F.col("id").alias("i"))))
        .groupBy("i")
        .agg(
            F.max(
                F.when(F.col("rn") == F.expr(f"greatest(((n + 1) * i) div {PSI_BINS}, 1)"), F.col("value"))
            ).alias("edge")
        )
    )

    # collapse the 9 edges to ONE sorted array row and assign bins as a
    # map-side array scan: bin = 1 + |{edges < value}|.  The previous form
    # expanded every fact row 9× (crossJoin) and re-grouped per row id —
    # a corpus-sized shuffle per side that carried no information the
    # broadcast array doesn't.
    edge_arr = edges.agg(F.sort_array(F.collect_list("edge")).alias("earr"))

    def binned(side: DataFrame, out: str) -> DataFrame:
        return (
            side.crossJoin(F.broadcast(edge_arr))
            .select(
                (
                    F.lit(1)
                    + F.size(F.filter("earr", lambda e: F.col("value") > e))
                ).alias("bin")
            )
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias(out))
        )

    rc, cc_ = binned(ref, "ref_n"), binned(cmp, "cmp_n")
    tot = ref.agg(F.count(F.lit(1)).alias("rn")).crossJoin(cmp.agg(F.count(F.lit(1)).alias("cn")))
    bins = spark.range(1, PSI_BINS + 1).select(F.col("id").alias("bin"))
    p = (F.coalesce(F.col("ref_n"), F.lit(0)) + PSI_SMOOTH) / (F.col("rn") + PSI_BINS * PSI_SMOOTH)
    q = (F.coalesce(F.col("cmp_n"), F.lit(0)) + PSI_SMOOTH) / (F.col("cn") + PSI_BINS * PSI_SMOOTH)
    return (
        bins.join(F.broadcast(rc), "bin", "left")
        .join(F.broadcast(cc_), "bin", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "bin",
            F.coalesce(F.col("ref_n"), F.lit(0)).alias("ref_n"),
            F.coalesce(F.col("cmp_n"), F.lit(0)).alias("cmp_n"),
            F.round(p, 9).alias("p"),
            F.round(q, 9).alias("q"),
            F.round((p - q) * F.log(p / q), 9).alias("psi_contribution"),
        )
    )
