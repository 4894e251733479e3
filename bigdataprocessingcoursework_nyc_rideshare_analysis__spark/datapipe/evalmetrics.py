"""Classifier-evaluation metrics over the curation pipeline: ROC AUC,
reliability (calibration) bins, cross-source score calibration for the
quality score, and confusion-matrix / classification-report / Cohen-κ
evaluation of the language-ID predictor.

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


# --- language-ID classifier evaluation ------------------------------------------

#: the fixed class set both engines iterate in the same order.
LANG_CLASSES = ("de", "en", "es", "fr", "zh")


def _per_class_margin_aggs() -> list:
    """The 15 conditional-sum margin aggregates (t_/p_/tp_ per class) the
    classification report and the κ summary both build their metrics from
    — shared so the count definitions can never drift between the two."""
    aggs = []
    for c in LANG_CLASSES:
        aggs += [
            F.sum(F.when(F.col("labeled_lang") == c, 1).otherwise(0)).cast("long").alias(f"t_{c}"),
            F.sum(F.when(F.col("predicted_lang") == c, 1).otherwise(0))
            .cast("long")
            .alias(f"p_{c}"),
            F.sum(
                F.when(
                    (F.col("labeled_lang") == c) & (F.col("predicted_lang") == c), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias(f"tp_{c}"),
        ]
    return aggs


def _lang_pred_sql() -> str:
    from .textstats import _LANG_ORACLE

    return _LANG_ORACLE


_CONFUSION_ORACLE = f"""
SELECT labeled_lang, predicted_lang, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM ({{pred}}) pred
GROUP BY 1, 2
"""


def _confusion_oracle() -> str:
    return _CONFUSION_ORACLE.format(pred=_lang_pred_sql())


@register(
    "langid_confusion_matrix",
    oracle=_confusion_oracle(),
    tags=("datapipe", "eval", "text", "r9"),
)
def q_langid_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the marker-word language-ID predictor
    (``lang_id``) against the labeled language: one row per
    (labeled, predicted) pair with its document count — the raw error
    anatomy every downstream metric (precision/recall/κ) is derived from,
    and the artifact you inspect to see WHICH languages the heuristic
    confuses (on this corpus the weak marker lists collapse most classes
    into 'en'/'de', which is exactly what the report quantifies).  Scale
    shape: the per-doc predictor is a stateless select; the matrix is one
    ≤|classes|²-key aggregate — nothing here grows past 25 rows."""
    from .textstats import q_lang_id

    return (
        q_lang_id(spark, sf_dir)
        .groupBy("labeled_lang", "predicted_lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )


_REPORT_ORACLE_TEMPLATE = """
WITH conf AS (
  SELECT labeled_lang, predicted_lang, COUNT(*) AS n
  FROM ({pred}) p GROUP BY 1, 2
),
classes(lang) AS (VALUES {classes}),
tm AS (SELECT labeled_lang AS lang, SUM(n) AS n_true FROM conf GROUP BY 1),
pm AS (SELECT predicted_lang AS lang, SUM(n) AS n_pred FROM conf GROUP BY 1),
dg AS (SELECT labeled_lang AS lang, SUM(n) AS tp FROM conf
       WHERE labeled_lang = predicted_lang GROUP BY 1),
j AS (
  SELECT c.lang,
         CAST(COALESCE(tm.n_true, 0) AS BIGINT) AS n_true,
         CAST(COALESCE(pm.n_pred, 0) AS BIGINT) AS n_pred,
         CAST(COALESCE(dg.tp, 0) AS BIGINT) AS tp
  FROM classes c
  LEFT JOIN tm ON tm.lang = c.lang
  LEFT JOIN pm ON pm.lang = c.lang
  LEFT JOIN dg ON dg.lang = c.lang
)
SELECT lang, n_true, n_pred, tp,
       ROUND(CASE WHEN n_pred = 0 THEN 0.0 ELSE CAST(tp AS DOUBLE) / n_pred END, 9) AS precision,
       ROUND(CASE WHEN n_true = 0 THEN 0.0 ELSE CAST(tp AS DOUBLE) / n_true END, 9) AS recall,
       ROUND(CASE WHEN tp = 0 THEN 0.0
             ELSE 2.0 * tp / (CAST(n_pred AS DOUBLE) + CAST(n_true AS DOUBLE)) END, 9) AS f1
FROM j
"""


def _report_oracle() -> str:
    classes = ", ".join(f"('{c}')" for c in LANG_CLASSES)
    return _REPORT_ORACLE_TEMPLATE.format(pred=_lang_pred_sql(), classes=classes)


@register(
    "langid_classification_report",
    oracle=_report_oracle(),
    tags=("datapipe", "eval", "text", "r9"),
)
def q_langid_classification_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class precision / recall / F1 for the language-ID predictor —
    the sklearn-style classification report, assembled from the confusion
    margins.  Rows are driven by the FIXED class list (not the observed
    labels) so an absent or never-predicted class still reports zeros on
    both engines.  F1 uses the margin identity 2·tp/(n_pred + n_true) —
    one division instead of a P/R compose, so no intermediate rounding.
    All counts exact int64; three guarded divisions, each rounded once.
    Scale shape: ONE corpus pass — all 15 margin counts come from a single
    conditional-sum aggregate row (the three-branch margin-join alternative
    re-ran the predictor scan per branch, 3× the cost), exploded into the
    5-row report via an array of structs (the unpivot idiom)."""
    from .textstats import q_lang_id

    pred = q_lang_id(spark, sf_dir)
    m = pred.agg(*_per_class_margin_aggs())  # one row, 15 exact counts
    j = m.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("lang"),
                        F.col(f"t_{c}").alias("n_true"),
                        F.col(f"p_{c}").alias("n_pred"),
                        F.col(f"tp_{c}").alias("tp"),
                    )
                    for c in LANG_CLASSES
                ]
            )
        ).alias("r")
    ).select("r.lang", "r.n_true", "r.n_pred", "r.tp")
    return j.select(
        "lang",
        "n_true",
        "n_pred",
        "tp",
        F.round(
            F.when(F.col("n_pred") == 0, 0.0).otherwise(
                F.col("tp").cast("double") / F.col("n_pred")
            ),
            9,
        ).alias("precision"),
        F.round(
            F.when(F.col("n_true") == 0, 0.0).otherwise(
                F.col("tp").cast("double") / F.col("n_true")
            ),
            9,
        ).alias("recall"),
        F.round(
            F.when(F.col("tp") == 0, 0.0).otherwise(
                2.0 * F.col("tp") / (F.col("n_pred").cast("double") + F.col("n_true").cast("double"))
            ),
            9,
        ).alias("f1"),
    )


def _kappa_oracle() -> str:
    per_class = []
    for c in LANG_CLASSES:
        per_class.append(
            f"CAST(SUM(CASE WHEN labeled_lang = '{c}' THEN 1 ELSE 0 END) AS BIGINT) AS t_{c},\n"
            f"       CAST(SUM(CASE WHEN predicted_lang = '{c}' THEN 1 ELSE 0 END) AS BIGINT) AS p_{c},\n"
            f"       CAST(SUM(CASE WHEN labeled_lang = '{c}' AND predicted_lang = '{c}' THEN 1 ELSE 0 END) AS BIGINT) AS tp_{c}"
        )
    pe_terms = " + ".join(
        f"CAST(t_{c} AS DOUBLE) * CAST(p_{c} AS DOUBLE)" for c in LANG_CLASSES
    )
    f1_terms = " + ".join(
        f"(CASE WHEN tp_{c} = 0 THEN 0.0 ELSE 2.0 * tp_{c} / (CAST(p_{c} AS DOUBLE) + CAST(t_{c} AS DOUBLE)) END)"
        for c in LANG_CLASSES
    )
    return f"""
WITH m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN labeled_lang = predicted_lang THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
       {", ".join(per_class)}
  FROM ({_lang_pred_sql()}) p
)
SELECT n_docs, n_correct,
       ROUND(CAST(n_correct AS DOUBLE) / n_docs, 9) AS accuracy,
       ROUND(({pe_terms}) / (CAST(n_docs AS DOUBLE) * CAST(n_docs AS DOUBLE)), 9) AS expected_agreement,
       ROUND(CASE WHEN ({pe_terms}) / (CAST(n_docs AS DOUBLE) * CAST(n_docs AS DOUBLE)) = 1
                  THEN 0.0
                  ELSE (CAST(n_correct AS DOUBLE) / n_docs
                        - ({pe_terms}) / (CAST(n_docs AS DOUBLE) * CAST(n_docs AS DOUBLE)))
                       / (1 - ({pe_terms}) / (CAST(n_docs AS DOUBLE) * CAST(n_docs AS DOUBLE))) END, 9) AS cohen_kappa,
       ROUND(({f1_terms}) / {len(LANG_CLASSES)}, 9) AS macro_f1
FROM m
"""


@register(
    "langid_agreement_stats",
    oracle=_kappa_oracle(),
    tags=("datapipe", "eval", "text", "r9"),
)
def q_langid_agreement_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row agreement summary for the language-ID predictor: accuracy,
    chance-expected agreement, Cohen's κ (chance-corrected agreement — the
    honest headline when one class dominates predictions, as 'en' does
    here), and macro-F1 (classes weighted equally, so the dominant class
    cannot hide the others' failure).  Everything is derived from ONE
    conditional-sum aggregate row: per-class true/predicted/diagonal
    counts are exact int64, and κ / macro-F1 are single fixed parse trees
    over those counts (a literal 5-term sum, NOT a float aggregation —
    order-free by construction), each rounded once.  Scale shape: one
    stateless predictor select + one 1-row aggregate; nothing downstream
    exceeds one row."""
    from .textstats import q_lang_id

    pred = q_lang_id(spark, sf_dir)
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(
            F.when(F.col("labeled_lang") == F.col("predicted_lang"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_correct"),
    ] + _per_class_margin_aggs()
    m = pred.agg(*aggs)
    nd = F.col("n_docs").cast("double")
    pe = None
    for c in LANG_CLASSES:
        term = F.col(f"t_{c}").cast("double") * F.col(f"p_{c}").cast("double")
        pe = term if pe is None else pe + term
    pe = pe / (nd * nd)
    po = F.col("n_correct").cast("double") / F.col("n_docs")
    f1_sum = None
    for c in LANG_CLASSES:
        f1 = F.when(F.col(f"tp_{c}") == 0, 0.0).otherwise(
            2.0 * F.col(f"tp_{c}")
            / (F.col(f"p_{c}").cast("double") + F.col(f"t_{c}").cast("double"))
        )
        f1_sum = f1 if f1_sum is None else f1_sum + f1
    return m.select(
        "n_docs",
        "n_correct",
        F.round(po, 9).alias("accuracy"),
        F.round(pe, 9).alias("expected_agreement"),
        F.round(F.when(pe == 1, 0.0).otherwise((po - pe) / (1 - pe)), 9).alias("cohen_kappa"),
        F.round(f1_sum / len(LANG_CLASSES), 9).alias("macro_f1"),
    )


# --- ROC curve points -----------------------------------------------------------

_ROC_ORACLE = f"""
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
  SELECT score,
         CAST(SUM(p) OVER (ORDER BY score DESC) AS BIGINT) AS cum_tp,
         CAST(SUM(q) OVER (ORDER BY score DESC) AS BIGINT) AS cum_fp
  FROM g
),
tot AS (SELECT CAST(SUM(p) AS BIGINT) AS np, CAST(SUM(q) AS BIGINT) AS nq FROM g)
SELECT c.score AS threshold, c.cum_tp, c.cum_fp,
       ROUND(CAST(c.cum_tp AS DOUBLE) / CAST(tot.np AS DOUBLE), 9) AS tpr,
       ROUND(CAST(c.cum_fp AS DOUBLE) / CAST(tot.nq AS DOUBLE), 9) AS fpr,
       ROUND(CAST(c.cum_tp AS DOUBLE) / (CAST(c.cum_tp AS DOUBLE) + CAST(c.cum_fp AS DOUBLE)), 9)
         AS precision
FROM c CROSS JOIN tot
"""


@register("quality_roc_points", oracle=_ROC_ORACLE, tags=("datapipe", "eval", "quality", "r9"))
def q_quality_roc_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ROC/PR operating-point table for the quality score against
    the ``lang = '{AUC_POSITIVE_LANG}'`` label: one row per distinct score
    threshold ("predict positive when score ≥ t") with cumulative tp/fp,
    TPR, FPR and precision — the curve ``quality_score_auc`` integrates,
    needed whenever someone picks an OPERATING threshold rather than
    reporting a ranking summary.  Same sort-free lattice discipline as the
    AUC: groupBy(score) is the only corpus shuffle, the cumulative window
    runs over the collapsed score lattice, totals broadcast from a 1-row
    aggregate.  Exactness: every cumulative count is int64; three
    divisions of exact ints, each rounded once.  cum_tp + cum_fp ≥ 1 on
    every emitted row (thresholds exist only at observed scores), so
    precision never divides by zero."""
    scored = _quality_score_frame(spark, sf_dir)
    lab = scored.select(
        "score",
        F.when(F.col("lang") == AUC_POSITIVE_LANG, 1).otherwise(0).alias("pos"),
    )
    g = lab.groupBy("score").agg(
        F.sum("pos").cast("long").alias("p"),
        (F.count(F.lit(1)) - F.sum("pos")).cast("long").alias("q"),
    )
    w = Window.orderBy(F.desc("score")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    c = g.select(
        F.col("score").alias("threshold"),
        F.sum("p").over(w).cast("long").alias("cum_tp"),
        F.sum("q").over(w).cast("long").alias("cum_fp"),
    )
    tot = g.agg(
        F.sum("p").cast("long").alias("np"), F.sum("q").cast("long").alias("nq")
    )  # 1 row, broadcast, lazy
    return c.crossJoin(F.broadcast(tot)).select(
        "threshold",
        "cum_tp",
        "cum_fp",
        F.round(F.col("cum_tp").cast("double") / F.col("np").cast("double"), 9).alias("tpr"),
        F.round(F.col("cum_fp").cast("double") / F.col("nq").cast("double"), 9).alias("fpr"),
        F.round(
            F.col("cum_tp").cast("double")
            / (F.col("cum_tp").cast("double") + F.col("cum_fp").cast("double")),
            9,
        ).alias("precision"),
    )
