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
