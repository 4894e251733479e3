"""Classifier-evaluation metrics over the quality-score pipeline: ROC AUC,
reliability (calibration) bins, and cross-source score calibration.

A curation stack that scores documents (``quality_model_score``) needs the
matching evaluation tier before anyone trusts the scores: does the score
*discriminate* (AUC), is its probability output *honest* (reliability
bins), and does it rank every *source* on a comparable scale (pooled-CDF
calibration)?  The label used throughout is ``lang = 'en'`` — non-vacuous
because the score's stopword-ratio feature is built from ENGLISH stopwords,
so the heuristic genuinely separates English from the other languages, and
the label is derived from a column the score never reads.

Determinism discipline (same as the rest of the datapipe tier): every
statistic is assembled from exact integers or half-integers — the
Mann-Whitney rank numerator is a sum of exact multiples of 0.5 (order-free
in IEEE double below 2**52), probability masses are summed as exact
decimals — with ONE double division and ONE ``round(…, 9)`` at the end, so
both engines emit bit-identical values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from .textstats import _SCORE_CTES, _quality_score_frame

#: positive-class label: the language the quality features were built for.
AUC_POSITIVE_LANG = "en"

#: fixed-width reliability bins over the softsign prob range (-1, 1).
CALIBRATION_BINS = 10

_AUC_ORACLE = f"""
WITH {_SCORE_CTES},
lab AS (
  SELECT score, CASE WHEN lang = '{AUC_POSITIVE_LANG}' THEN 1 ELSE 0 END AS pos
  FROM scored
),
g AS (
  SELECT score, CAST(SUM(pos) AS BIGINT) AS p,
         CAST(COUNT(*) - SUM(pos) AS BIGINT) AS q
  FROM lab GROUP BY 1
),
c AS (
  SELECT p, q,
         CAST(SUM(q) OVER (ORDER BY score) - q AS BIGINT) AS below
  FROM g
),
s AS (
  SELECT CAST(SUM(p) AS BIGINT) AS np, CAST(SUM(q) AS BIGINT) AS nq,
         SUM(CAST(p AS DOUBLE) * (CAST(below AS DOUBLE) + CAST(q AS DOUBLE) / 2)) AS num
  FROM c
)
SELECT np AS n_pos, nq AS n_neg,
       ROUND(num / (CAST(np AS DOUBLE) * CAST(nq AS DOUBLE)), 9) AS auc,
       ROUND(2 * num / (CAST(np AS DOUBLE) * CAST(nq AS DOUBLE)) - 1, 9) AS gini
FROM s
"""


@register("quality_score_auc", oracle=_AUC_ORACLE, tags=("datapipe", "eval", "quality", "r9"))
def q_quality_score_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC AUC of the heuristic quality score against the ``lang = 'en'``
    label via the Mann-Whitney U identity with midrank tie handling:
    AUC = Σ_groups p_g · (neg_below_g + q_g/2) / (n_pos · n_neg) — the
    probability a random positive outranks a random negative, ties counted
    half.  Gini = 2·AUC − 1 alongside (the accuracy-ratio form bankers
    report).  Sort-free formulation: the corpus first collapses to one row
    PER DISTINCT SCORE (the score lattice is spanned by the three small
    integer features, so distinct scores ≪ documents), the cumulative-
    negative window then runs over that collapsed frame, never the corpus.
    At 100 TB the same plan holds — groupBy(score) is the only corpus
    shuffle; if a future real-valued model makes scores unique per doc, the
    exact fallback is the two-phase global-rank pattern
    (``events_global_sequence``).

    Exactness: p, q, below are exact int64; each numerator term is an exact
    multiple of 0.5, so the double sum is order-free below 2**52; one
    division, one round."""
    scored = _quality_score_frame(spark, sf_dir)
    lab = scored.select(
        "score",
        F.when(F.col("lang") == AUC_POSITIVE_LANG, 1).otherwise(0).alias("pos"),
    )
    g = lab.groupBy("score").agg(
        F.sum("pos").cast("long").alias("p"),
        (F.count(F.lit(1)) - F.sum("pos")).cast("long").alias("q"),
    )
    w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    c = g.withColumn("below", (F.sum("q").over(w) - F.col("q")).cast("long"))
    num = F.sum(
        F.col("p").cast("double") * (F.col("below").cast("double") + F.col("q").cast("double") / 2)
    )
    s = c.agg(
        F.sum("p").cast("long").alias("n_pos"),
        F.sum("q").cast("long").alias("n_neg"),
        num.alias("num"),
    )
    denom = F.col("n_pos").cast("double") * F.col("n_neg").cast("double")
    return s.select(
        "n_pos",
        "n_neg",
        F.round(F.col("num") / denom, 9).alias("auc"),
        F.round(2 * F.col("num") / denom - 1, 9).alias("gini"),
    )


_CALIBRATION_ORACLE = f"""
WITH {_SCORE_CTES},
pr AS (
  SELECT score / (1 + abs(score)) AS prob,
         CASE WHEN lang = '{AUC_POSITIVE_LANG}' THEN 1 ELSE 0 END AS pos
  FROM scored
),
b AS (
  SELECT CAST(least(floor((prob + 1) * {CALIBRATION_BINS} / 2), {CALIBRATION_BINS - 1}) AS INTEGER) AS bin,
         prob, pos
  FROM pr
)
SELECT bin,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(CAST(SUM(CAST(prob AS DECIMAL(14,12))) AS DOUBLE) / COUNT(*), 9) AS mean_prob,
       ROUND(CAST(SUM(pos) AS DOUBLE) / COUNT(*), 9) AS frac_positive
FROM b
GROUP BY bin
ORDER BY bin
"""


@register(
    "quality_calibration_bins",
    oracle=_CALIBRATION_ORACLE,
    tags=("datapipe", "eval", "quality", "r9"),
)
def q_quality_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram for the softsign quality probability: fixed-width
    bins over its (−1, 1) range, each reporting mean predicted prob vs the
    empirical positive rate — the calibration audit that tells you whether
    0.8 means 80 %.  Fixed-width bins (not NTILE deciles) on purpose: the
    bin id is a stateless per-row expression, so the whole query is one
    map + a {CALIBRATION_BINS}-row aggregate with NO global sort — the
    shape that survives 100 TB, where an unpartitioned NTILE would not.

    Exactness: the bin edge test and prob are identical double parse trees
    on both engines; per-bin prob mass accumulates as DECIMAL(14,12) casts
    of those identical doubles (exact, order-free decimal sums), and the
    positive count is int64 — one division + round each at the end."""
    scored = _quality_score_frame(spark, sf_dir)
    prob = F.col("score") / (F.lit(1) + F.abs("score"))
    pr = scored.select(
        prob.alias("prob"),
        F.when(F.col("lang") == AUC_POSITIVE_LANG, 1).otherwise(0).alias("pos"),
    )
    bin_col = F.least(
        F.floor((F.col("prob") + 1) * CALIBRATION_BINS / 2), F.lit(CALIBRATION_BINS - 1)
    ).cast("int")
    return (
        pr.select(bin_col.alias("bin"), "prob", "pos")
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.round(
                F.sum(F.col("prob").cast("decimal(14,12)")).cast("double") / F.count(F.lit(1)), 9
            ).alias("mean_prob"),
            F.round(F.sum("pos").cast("double") / F.count(F.lit(1)), 9).alias("frac_positive"),
        )
        .orderBy("bin")
    )


_SOURCE_CAL_ORACLE = f"""
WITH {_SCORE_CTES},
src AS (
  SELECT s.doc_id, s.score, d.source
  FROM scored s JOIN documents d ON d.doc_id = s.doc_id
),
g AS (
  SELECT score, CAST(COUNT(*) AS BIGINT) AS c FROM src GROUP BY 1
),
cum AS (
  SELECT score, c,
         CAST(2 * (SUM(c) OVER (ORDER BY score) - c) + c AS BIGINT) AS mid2
  FROM g
),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM g)
SELECT src.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(CAST(SUM(CAST(cum.mid2 AS DECIMAL(38,0))) AS DOUBLE)
             / (2.0 * COUNT(*) * MAX(tot.n)), 9) AS mean_cdf,
       ROUND(CAST(MIN(cum.mid2) AS DOUBLE) / (2.0 * MAX(tot.n)), 9) AS min_cdf,
       ROUND(CAST(MAX(cum.mid2) AS DOUBLE) / (2.0 * MAX(tot.n)), 9) AS max_cdf
FROM src
JOIN cum ON cum.score = src.score
CROSS JOIN tot
GROUP BY src.source
"""


@register(
    "source_score_calibration",
    oracle=_SOURCE_CAL_ORACLE,
    tags=("datapipe", "eval", "quality", "mixture", "r9"),
)
def q_source_score_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source score calibration: each document's pooled midrank CDF
    position P(score < s) + ½·P(score = s), rolled up per source as
    mean/min/max.  A source whose mean CDF sits far from 0.5 is scored
    systematically high or low relative to the pool — exactly what skews a
    mixture built from a single global score threshold; this is the audit
    you run before ``source_mixture_weights`` trusts one cutoff across
    sources (mean_cdf per source IS the AUC of that source vs the pool, up
    to the affine map 2·x − 1).

    Scale shape: groupBy(score) collapses the corpus to the score lattice,
    the cumulative window runs over that collapsed frame only, and the
    per-doc CDF comes back via an equi-join on score (shuffle join at
    scale; the lattice side is small enough to broadcast here).  Exactness:
    mid2 = 2·cum_below + c is exact int64, summed per source as
    DECIMAL(38,0) (exact past the double mantissa at any corpus size) —
    one double division + round per output."""
    scored = _quality_score_frame(spark, sf_dir)
    from ..sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    src = scored.join(docs, "doc_id").select("doc_id", "score", "source")
    g = src.groupBy("score").agg(F.count(F.lit(1)).cast("long").alias("c"))
    w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = g.select(
        "score",
        (2 * (F.sum("c").over(w) - F.col("c")) + F.col("c")).cast("long").alias("mid2"),
    )
    tot = g.agg(F.sum("c").cast("long").alias("n"))  # 1 row, broadcast, lazy
    return (
        src.join(F.broadcast(cum), "score")
        .crossJoin(F.broadcast(tot))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.round(
                F.sum(F.col("mid2").cast("decimal(38,0)")).cast("double")
                / (2.0 * F.count(F.lit(1)) * F.max("n")),
                9,
            ).alias("mean_cdf"),
            F.round(F.min("mid2").cast("double") / (2.0 * F.max("n")), 9).alias("min_cdf"),
            F.round(F.max("mid2").cast("double") / (2.0 * F.max("n")), 9).alias("max_cdf"),
        )
    )
