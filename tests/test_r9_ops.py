"""Round-9-tier operator pins: ROC AUC / calibration / source-calibration
over the quality score, and the Mann-Kendall trend test — each against a
brute-force pure-Python/pandas reference over the sf0.001 smoke tables,
with non-vacuity assertions that the interesting paths (ties, both label
classes, a non-degenerate S statistic) actually occur in the smoke data."""

from __future__ import annotations

import math
import re
from collections import Counter

import pandas as pd

from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.datapipe.evalmetrics import (
    AUC_POSITIVE_LANG,
    CALIBRATION_BINS,
    q_quality_calibration_bins,
    q_quality_score_auc,
    q_source_score_calibration,
)
from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.datapipe.textstats import (
    QUALITY_WEIGHTS,
    STOPWORDS,
)
from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.operators.temporal import (
    MK_Z_CRIT,
    q_mann_kendall_daily_trend,
)

from tests.conftest import SF_SMOKE


def _tokens(text: str) -> list[str]:
    return re.sub(r"\s+", " ", text.strip().lower()).split(" ")


def _scores() -> pd.DataFrame:
    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    w0, w1, w2, w3 = QUALITY_WEIGHTS
    rows = []
    for _, r in docs.iterrows():
        toks = re.sub(r"\s+", " ", r.text.strip().lower()).split(" ")
        n_tok, n_stop, n_chars = len(toks), sum(t in STOPWORDS for t in toks), len(r.text)
        score = ((w0 + w1 * float(n_tok)) + w2 * (n_stop / n_tok)) + w3 * (n_chars / n_tok)
        rows.append((r.doc_id, r.lang, r.source, score))
    return pd.DataFrame(rows, columns=["doc_id", "lang", "source", "score"])


# --- ROC AUC --------------------------------------------------------------------


def _py_auc(df: pd.DataFrame) -> tuple[int, int, float]:
    pos = sorted(df.loc[df.lang == AUC_POSITIVE_LANG, "score"])
    neg = sorted(df.loc[df.lang != AUC_POSITIVE_LANG, "score"])
    num = 0.0
    for p in pos:  # brute force: wins + half-ties over all pairs
        for n in neg:
            num += 1.0 if p > n else (0.5 if p == n else 0.0)
    return len(pos), len(neg), num / (len(pos) * len(neg))


def test_quality_auc_matches_bruteforce_pairs(spark):
    df = _scores()
    n_pos, n_neg, auc = _py_auc(df)
    row = q_quality_score_auc(spark, SF_SMOKE).collect()[0]
    assert (row.n_pos, row.n_neg) == (n_pos, n_neg)
    assert abs(row.auc - auc) < 1e-8
    assert abs(row.gini - (2 * auc - 1)) < 1e-8
    # non-vacuous: both classes present, score ties exist (midrank path), and
    # the score genuinely discriminates the language label (in the smoke
    # corpus the length features outweigh the English-stopword feature, so
    # the direction is BELOW 0.5 — what matters is distance from coin-flip)
    assert n_pos > 0 and n_neg > 0
    assert df.score.duplicated().any()
    assert abs(row.auc - 0.5) > 0.01


# --- reliability bins -----------------------------------------------------------


def test_calibration_bins_match_pandas(spark):
    df = _scores()
    df["prob"] = df.score / (1 + df.score.abs())
    df["pos"] = (df.lang == AUC_POSITIVE_LANG).astype(int)
    df["bin"] = (
        ((df.prob + 1) * CALIBRATION_BINS / 2).apply(math.floor).clip(upper=CALIBRATION_BINS - 1)
    )
    got = {r.bin: r for r in q_quality_calibration_bins(spark, SF_SMOKE).collect()}
    exp = df.groupby("bin").agg(n=("prob", "size"), mp=("prob", "mean"), fp=("pos", "mean"))
    assert set(got) == set(exp.index)
    for b, e in exp.iterrows():
        assert got[b].n_docs == e.n
        assert abs(got[b].mean_prob - e.mp) < 1e-9
        assert abs(got[b].frac_positive - e.fp) < 1e-9
    # non-vacuous: multiple bins occupied, counts cover the corpus
    assert len(got) >= 2
    assert sum(r.n_docs for r in got.values()) == len(df)
    # mean predicted prob sits inside each bin's edges
    for b, r in got.items():
        lo, hi = 2 * b / CALIBRATION_BINS - 1, 2 * (b + 1) / CALIBRATION_BINS - 1
        assert lo - 1e-12 <= r.mean_prob <= hi + 1e-12


# --- cross-source calibration ---------------------------------------------------


def test_source_calibration_matches_midrank_cdf(spark):
    df = _scores().sort_values("score")
    n = len(df)
    counts = Counter(df.score)
    below, cdf_at = 0, {}
    for s in sorted(counts):
        cdf_at[s] = (below + counts[s] / 2) / n
        below += counts[s]
    df["cdf"] = df.score.map(cdf_at)
    got = {r.source: r for r in q_source_score_calibration(spark, SF_SMOKE).collect()}
    exp = df.groupby("source").agg(n=("cdf", "size"), m=("cdf", "mean"),
                                   lo=("cdf", "min"), hi=("cdf", "max"))
    assert set(got) == set(exp.index)
    for src, e in exp.iterrows():
        assert got[src].n_docs == e.n
        assert abs(got[src].mean_cdf - e.m) < 1e-9
        assert abs(got[src].min_cdf - e.lo) < 1e-9
        assert abs(got[src].max_cdf - e.hi) < 1e-9
    # non-vacuous: several sources, and the doc-weighted mean CDF is 0.5
    assert len(got) >= 3
    pooled = sum(r.n_docs * r.mean_cdf for r in got.values()) / n
    assert abs(pooled - 0.5) < 1e-6


# --- Mann-Kendall ---------------------------------------------------------------


def test_mann_kendall_matches_bruteforce(spark):
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    daily = ev.groupby(ev.ts.dt.floor("D")).size().sort_index().tolist()
    n = len(daily)
    s = sum(
        (daily[j] > daily[i]) - (daily[j] < daily[i])
        for i in range(n)
        for j in range(i + 1, n)
    )
    ties = Counter(daily)
    var18 = n * (n - 1) * (2 * n + 5) - sum(t * (t - 1) * (2 * t + 5) for t in ties.values())
    var_s = var18 / 18
    z = 0.0 if s == 0 or var18 == 0 else (s - (1 if s > 0 else -1)) / math.sqrt(var_s)
    verdict = (
        "increasing" if z > MK_Z_CRIT else "decreasing" if z < -MK_Z_CRIT else "no trend"
    )
    row = q_mann_kendall_daily_trend(spark, SF_SMOKE).collect()[0]
    assert row.n_days == n
    assert row.s_stat == s
    assert abs(row.var_s - var_s) < 1e-6
    assert abs(row.z - z) < 1e-8
    assert row.verdict == verdict
    # non-vacuous: a real series with a non-degenerate statistic
    assert n >= 10 and s != 0


# --- language-ID evaluation -------------------------------------------------------


def _py_langid() -> pd.DataFrame:
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.datapipe.textstats import (
        LANG_MARKERS,
    )

    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    rows = []
    for _, r in docs.iterrows():
        toks = set(re.sub(r"\s+", " ", r.text.strip().lower()).split(" "))
        scores = {lang: len(toks & set(m)) for lang, m in LANG_MARKERS.items()}
        best = max(scores.values())
        pred = next(lang for lang in sorted(scores) if scores[lang] >= best)
        rows.append((r.doc_id, r.lang, pred))
    return pd.DataFrame(rows, columns=["doc_id", "labeled", "predicted"])


def test_langid_confusion_matrix_matches_python(spark):
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.datapipe.evalmetrics import (
        q_langid_confusion_matrix,
    )

    df = _py_langid()
    exp = df.groupby(["labeled", "predicted"]).size()
    got = {
        (r.labeled_lang, r.predicted_lang): r.n_docs
        for r in q_langid_confusion_matrix(spark, SF_SMOKE).collect()
    }
    assert got == exp.to_dict()
    # non-vacuous: real misclassification exists (off-diagonal mass)
    assert any(l != p for l, p in got)


def test_langid_report_and_kappa_match_python(spark):
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.datapipe.evalmetrics import (
        LANG_CLASSES,
        q_langid_agreement_stats,
        q_langid_classification_report,
    )

    df = _py_langid()
    n = len(df)
    stats = {}
    for c in LANG_CLASSES:
        t = (df.labeled == c).sum()
        p = (df.predicted == c).sum()
        tp = ((df.labeled == c) & (df.predicted == c)).sum()
        stats[c] = (int(t), int(p), int(tp))
    rep = {r.lang: r for r in q_langid_classification_report(spark, SF_SMOKE).collect()}
    assert set(rep) == set(LANG_CLASSES)
    for c, (t, p, tp) in stats.items():
        r = rep[c]
        assert (r.n_true, r.n_pred, r.tp) == (t, p, tp)
        assert abs(r.precision - (tp / p if p else 0.0)) < 1e-9
        assert abs(r.recall - (tp / t if t else 0.0)) < 1e-9
        assert abs(r.f1 - (2 * tp / (p + t) if tp else 0.0)) < 1e-9
    row = q_langid_agreement_stats(spark, SF_SMOKE).collect()[0]
    correct = int((df.labeled == df.predicted).sum())
    po = correct / n
    pe = sum(t * p for t, p, _ in stats.values()) / (n * n)
    kappa = 0.0 if pe == 1 else (po - pe) / (1 - pe)
    macro = sum(2 * tp / (p + t) if tp else 0.0 for t, p, tp in stats.values()) / len(LANG_CLASSES)
    assert row.n_docs == n and row.n_correct == correct
    assert abs(row.accuracy - po) < 1e-9
    assert abs(row.expected_agreement - pe) < 1e-9
    assert abs(row.cohen_kappa - kappa) < 1e-9
    assert abs(row.macro_f1 - macro) < 1e-9
    # non-vacuous: kappa is strictly below raw accuracy (chance correction
    # bites when one class dominates predictions) and the matrix is imperfect
    assert row.cohen_kappa < row.accuracy
    assert correct < n


# --- ROC curve points -------------------------------------------------------------


def test_roc_points_match_python(spark):
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.datapipe.evalmetrics import (
        q_quality_roc_points,
    )

    df = _scores()
    df["pos"] = (df.lang == AUC_POSITIVE_LANG).astype(int)
    g = df.groupby("score").agg(p=("pos", "sum"), n=("pos", "size")).sort_index(ascending=False)
    g["q"] = g.n - g.p
    np_, nq = int(g.p.sum()), int(g.q.sum())
    cum_tp, cum_fp, exp = 0, 0, {}
    for s, r in g.iterrows():
        cum_tp += int(r.p)
        cum_fp += int(r.q)
        exp[s] = (cum_tp, cum_fp, cum_tp / np_, cum_fp / nq, cum_tp / (cum_tp + cum_fp))
    got = {r.threshold: r for r in q_quality_roc_points(spark, SF_SMOKE).collect()}
    assert set(got) == set(exp)
    for s, (tp, fp, tpr, fpr, prec) in exp.items():
        r = got[s]
        assert (r.cum_tp, r.cum_fp) == (tp, fp)
        assert abs(r.tpr - tpr) < 1e-9 and abs(r.fpr - fpr) < 1e-9
        assert abs(r.precision - prec) < 1e-9
    # non-vacuous: the curve actually moves (many thresholds, full sweep ends
    # at (1,1)) and is monotone in both axes
    assert len(got) > 10
    pts = sorted((r.fpr, r.tpr) for r in got.values())
    assert pts[-1] == (1.0, 1.0)
    assert all(a[1] <= b[1] for a, b in zip(pts, pts[1:]))


# --- ACF + Ljung-Box --------------------------------------------------------------


def _py_acf(max_lag: int) -> tuple[int, dict[int, float]]:
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    y = ev.groupby(ev.ts.dt.floor("D")).size().sort_index().tolist()
    n = len(y)
    ybar = sum(y) / n
    den = sum((v - ybar) ** 2 for v in y)
    acf = {
        k: sum((y[t] - ybar) * (y[t - k] - ybar) for t in range(k, n)) / den
        for k in range(1, max_lag + 1)
    }
    return n, acf


def test_daily_acf_matches_python(spark):
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.operators.temporal import (
        ACF_MAX_LAG,
        q_daily_acf,
    )

    n, acf = _py_acf(ACF_MAX_LAG)
    rows = {r.lag: r for r in q_daily_acf(spark, SF_SMOKE).collect()}
    assert set(rows) == set(acf)
    for k, r in rows.items():
        assert r.n_pairs == n - k
        assert abs(r.acf - acf[k]) < 1e-8
    # non-vacuous: lag-1 autocorrelation is a real (nonzero) statistic and
    # all |acf| <= 1
    assert abs(rows[1].acf) > 1e-6
    assert all(abs(r.acf) <= 1 + 1e-12 for r in rows.values())


def test_ljung_box_matches_python(spark):
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.operators.temporal import (
        ACF_MAX_LAG,
        LJUNG_BOX_CRIT,
        q_ljung_box_daily,
    )

    n, acf = _py_acf(ACF_MAX_LAG)
    q = n * (n + 2.0) * sum(acf[k] ** 2 / (n - k) for k in range(1, ACF_MAX_LAG + 1))
    row = q_ljung_box_daily(spark, SF_SMOKE).collect()[0]
    assert row.n_days == n and row.lags == ACF_MAX_LAG
    assert abs(row.q_stat - q) < 1e-6
    assert row.verdict == ("autocorrelated" if q > LJUNG_BOX_CRIT else "white noise")
    assert n > ACF_MAX_LAG  # the n-k denominators are all positive


# --- embedding prefix energy --------------------------------------------------------


def test_prefix_energy_matches_python(spark):
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.datapipe.similarity import (
        PREFIX_DIMS,
        q_embedding_prefix_energy,
    )

    emb = pd.read_parquet(f"{SF_SMOKE}/embeddings.parquet")
    qs = [[math.floor(float(x) * 1_000_000) for x in v] for v in emb.embedding]
    exp = {}
    for k in PREFIX_DIMS:
        pks = [sum(x * x for x in v[:k]) for v in qs]
        tots = [sum(x * x for x in v) for v in qs]
        micro = sum(pks) / sum(tots)
        macro = sum(p / t for p, t in zip(pks, tots) if t) / len(qs)
        exp[k] = (len(qs), micro, macro)
    got = {r.prefix_dims: r for r in q_embedding_prefix_energy(spark, SF_SMOKE).collect()}
    assert set(got) == set(exp)
    for k, (n, micro, macro) in exp.items():
        r = got[k]
        assert r.n_vecs == n
        assert abs(r.micro_energy - micro) < 1e-8
        assert abs(r.macro_energy - macro) < 1e-8
    # non-vacuous: energy strictly increases with the budget and the full
    # budget retains everything
    ms = [got[k].micro_energy for k in sorted(got)]
    assert all(a < b for a, b in zip(ms, ms[1:]))
    assert got[max(PREFIX_DIMS)].micro_energy == 1.0


# --- changepoint ------------------------------------------------------------------


def test_changepoint_matches_bruteforce(spark):
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.operators.temporal import (
        q_daily_changepoint,
    )

    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    daily = ev.groupby(ev.ts.dt.floor("D")).size().sort_index()
    y, days = daily.tolist(), daily.index.tolist()
    n, s = len(y), sum(y)
    best = None
    sl = 0
    for t in range(1, n):
        sl += y[t - 1]
        num = float(n * sl - t * s)
        g = num * num / (t * (n - t))
        if best is None or g > best[0]:
            best = (g, t, sl)
    g, t, sl = best
    row = q_daily_changepoint(spark, SF_SMOKE).collect()[0]
    assert row.n_days == n and row.split_index == t
    assert row.split_day == days[t - 1].date()
    assert abs(row.mean_left - sl / t) < 1e-9
    assert abs(row.mean_right - (s - sl) / (n - t)) < 1e-9
    assert abs(row.shift - ((s - sl) / (n - t) - sl / t)) < 1e-9
    assert abs(row.g_stat - g) < 1e-4
    # non-vacuous: the split is interior and the shift is a real level change
    assert 1 <= t < n and abs(row.shift) > 0


# --- per-source diversity -----------------------------------------------------------


def test_source_entropy_matches_python(spark):
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.datapipe.textstats import (
        q_source_token_entropy,
    )

    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    agg: dict[str, Counter] = {}
    for _, r in docs.iterrows():
        agg.setdefault(r.source, Counter()).update(_tokens(r.text))
    got = {r.source: r for r in q_source_token_entropy(spark, SF_SMOKE).collect()}
    assert set(got) == set(agg)
    for src, c in agg.items():
        n, v = sum(c.values()), len(c)
        h = math.log(n) - sum(k * math.log(k) for k in c.values()) / n
        r = got[src]
        assert (r.n_tokens, r.vocab_size) == (n, v)
        assert abs(r.entropy - h) < 1e-8
        assert abs(r.norm_entropy - (h / math.log(v) if v > 1 else 0.0)) < 1e-8
    # non-vacuous: entropy is positive and below its ln(vocab) ceiling
    assert all(0 < r.entropy < math.log(r.vocab_size) + 1e-9 for r in got.values())


def test_source_distinct_ngrams_matches_python(spark):
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.datapipe.textstats import (
        q_source_distinct_ngrams,
    )

    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    uni: dict[str, list] = {}
    big: dict[str, list] = {}
    for _, r in docs.iterrows():
        toks = _tokens(r.text)
        uni.setdefault(r.source, []).extend(toks)
        big.setdefault(r.source, []).extend(
            f"{a} {b}" for a, b in zip(toks, toks[1:])
        )
    got = {r.source: r for r in q_source_distinct_ngrams(spark, SF_SMOKE).collect()}
    assert set(got) == set(uni)
    for src in uni:
        r = got[src]
        t1, d1 = len(uni[src]), len(set(uni[src]))
        t2, d2 = len(big[src]), len(set(big[src]))
        assert (r.total_unigrams, r.distinct_unigrams) == (t1, d1)
        assert (r.total_bigrams, r.distinct_bigrams) == (t2, d2)
        assert abs(r.distinct_1 - d1 / t1) < 1e-9
        assert abs(r.distinct_2 - (d2 / t2 if t2 else 0.0)) < 1e-9
    # non-vacuous: repetition exists (distinct_1 < 1) and bigrams diversify
    # faster than unigrams on natural-ish text
    assert all(r.distinct_1 < 1 for r in got.values())
    assert all(r.distinct_2 > r.distinct_1 for r in got.values())


# --- quantile normalization ---------------------------------------------------------


def test_quantile_normalization_matches_python(spark):
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.datapipe.normalize import (
        q_quantile_normalized_scores,
    )

    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    docs["score"] = [
        r.n_chars / len(_tokens(r.text)) for _, r in docs.iterrows()
    ]
    pooled = sorted(docs.score)
    n = len(pooled)
    exp = {}
    for src, g in docs.groupby("source"):
        g = g.sort_values(["score", "doc_id"])
        ns = len(g)
        for i, (_, r) in enumerate(g.iterrows(), start=1):
            f = 0.5 if ns == 1 else (i - 1) / (ns - 1)
            p = f * (n - 1)
            jlo = math.floor(p)
            frac = p - jlo
            xlo = pooled[jlo]
            xhi = xlo if frac == 0 else pooled[jlo + 1]
            exp[r.doc_id] = (src, xlo * (1 - frac) + xhi * frac)
    rows = q_quantile_normalized_scores(spark, SF_SMOKE).collect()
    assert len(rows) == len(exp)
    for r in rows:
        src, norm = exp[r.doc_id]
        assert r.source == src
        assert abs(r.norm_score - norm) < 1e-6
    # non-vacuous: the transform genuinely aligns the sources — the spread of
    # per-source means shrinks, and every source's max lands on the pooled max
    got = pd.DataFrame([(r.source, r.score, r.norm_score) for r in rows],
                       columns=["source", "score", "norm"])
    before = got.groupby("source").score.mean()
    after = got.groupby("source").norm.mean()
    assert (after.max() - after.min()) < (before.max() - before.min())
    assert (got.groupby("source").norm.max() - max(pooled)).abs().max() < 1e-9


# --- skyline / SRM -----------------------------------------------------------------


def test_ab_srm_check_matches_python(spark):
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.operators.behavior import (
        SRM_CHI2_CRIT,
        q_ab_srm_check,
    )
    import hashlib

    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    users = ev.user_id.unique()
    n_a = sum(1 for u in users if int(hashlib.md5(str(u).encode()).hexdigest()[0], 16) < 8)
    n_b = len(users) - n_a
    half = len(users) / 2
    chi2 = (n_a - half) ** 2 / half + (n_b - half) ** 2 / half
    row = q_ab_srm_check(spark, SF_SMOKE).collect()[0]
    assert (row.n_a, row.n_b) == (n_a, n_b)
    assert abs(row.chi2 - chi2) < 1e-9
    assert row.verdict == ("mismatch" if chi2 > SRM_CHI2_CRIT else "balanced")
    # non-vacuous: both arms populated by a healthy assignment
    assert n_a > 0 and n_b > 0


# --- robust band / dispersion / jackknife -------------------------------------------


def test_daily_robust_band_matches_python(spark):
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.operators.temporal import (
        ROBUST_BAND_K,
        ROBUST_BAND_WINDOW,
        q_daily_robust_band,
    )

    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    daily = ev.groupby(ev.ts.dt.floor("D")).size().sort_index()
    y, days = daily.tolist(), [d.date() for d in daily.index]
    exp = {}
    for i in range(ROBUST_BAND_WINDOW - 1, len(y)):
        w = sorted(y[i - ROBUST_BAND_WINDOW + 1 : i + 1])
        med = w[(len(w) + 1) // 2 - 1]
        d = sorted(abs(v - med) for v in y[i - ROBUST_BAND_WINDOW + 1 : i + 1])
        mad = d[(len(d) + 1) // 2 - 1]
        exp[days[i]] = (y[i], med, mad, abs(y[i] - med) > ROBUST_BAND_K * mad)
    rows = {r.day: r for r in q_daily_robust_band(spark, SF_SMOKE).collect()}
    assert set(rows) == set(exp)
    for d, (yv, med, mad, flag) in exp.items():
        r = rows[d]
        assert (r.y, r.med, r.mad, r.is_outlier) == (yv, med, mad, flag)
    # non-vacuous: warmup suppressed, full coverage afterwards
    assert len(rows) == len(y) - (ROBUST_BAND_WINDOW - 1)


def test_event_type_dispersion_matches_python(spark):
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.operators.behavior import (
        q_event_type_dispersion,
    )

    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    g = ev.groupby(["event_type", ev.ts.dt.floor("D")]).size()
    rows = {r.event_type: r for r in q_event_type_dispersion(spark, SF_SMOKE).collect()}
    for et, s in g.groupby(level=0):
        y = s.tolist()
        n = len(y)
        mean = sum(y) / n
        var = sum(v * v for v in y) / n - mean * mean
        disp = var / mean
        r = rows[et]
        assert r.n_days == n and r.total_events == sum(y)
        assert abs(r.dispersion - disp) < 1e-6
        assert r.verdict == ("bursty" if disp > 1.5 else "regular" if disp < 0.5 else "poisson-like")
    # non-vacuous: dispersion is a real positive statistic everywhere
    assert all(r.dispersion > 0 for r in rows.values())


def test_purchase_rate_jackknife_matches_python(spark):
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.operators.behavior import (
        q_purchase_rate_jackknife_ci,
    )

    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    g = ev.groupby(ev.ts.dt.floor("D")).agg(
        n=("event_type", "size"),
        c=("event_type", lambda s: (s == "purchase").sum()),
    )
    d, nn, cc = len(g), int(g.n.sum()), int(g.c.sum())
    thetas = [(cc - int(r.c)) / (nn - int(r.n)) for _, r in g.iterrows()]
    tbar = sum(thetas) / d
    jk_var = (d - 1) / d * sum((t - tbar) ** 2 for t in thetas)
    rate = cc / nn
    row = q_purchase_rate_jackknife_ci(spark, SF_SMOKE).collect()[0]
    assert (row.n_days, row.purchases, row.events) == (d, cc, nn)
    assert abs(row.rate - rate) < 1e-9
    assert abs(row.jk_var - jk_var) < 1e-9  # output is rounded at 9 dp
    half = 1.959963984540054 * math.sqrt(jk_var)
    assert abs(row.ci_lo - (rate - half)) < 1e-8
    assert abs(row.ci_hi - (rate + half)) < 1e-8
    # non-vacuous: the interval is a real nonzero-width band containing the rate
    assert row.ci_lo < row.rate < row.ci_hi


# --- proximity search / cohort LTV ---------------------------------------------------


def test_proximity_search_matches_python(spark):
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.datapipe.textstats import (
        PROXIMITY_TERMS,
        PROXIMITY_WINDOW,
        q_proximity_phrase_search,
    )

    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    exp = {}
    for _, r in docs.iterrows():
        toks = _tokens(r.text)
        pa = [i for i, t in enumerate(toks, 1) if t == PROXIMITY_TERMS[0]]
        pb = [i for i, t in enumerate(toks, 1) if t == PROXIMITY_TERMS[1]]
        if pa and pb:
            dists = [abs(x - y) for x in pa for y in pb]
            if min(dists) <= PROXIMITY_WINDOW:
                exp[r.doc_id] = (min(dists), len(dists))
    got = {r.doc_id: (r.min_dist, r.n_pairs) for r in q_proximity_phrase_search(spark, SF_SMOKE).collect()}
    assert got == exp
    # non-vacuous: proximity is selective — hits exist but bag-of-words
    # co-occurrence alone would admit more docs
    both = sum(
        1
        for _, r in docs.iterrows()
        if PROXIMITY_TERMS[0] in _tokens(r.text) and PROXIMITY_TERMS[1] in _tokens(r.text)
    )
    assert 0 < len(got) < both


def test_cohort_ltv_matches_pandas(spark):
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.operators.temporal import (
        q_cohort_ltv_curve,
    )
    from decimal import Decimal

    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    ev["day"] = ev.ts.dt.floor("D").dt.date
    fd = ev.groupby("user_id").day.min().rename("cohort_day")
    ev = ev.join(fd, on="user_id")
    ev["off"] = [(d - c).days for d, c in zip(ev.day, ev.cohort_day)]
    ev["v"] = [Decimal(str(v)).quantize(Decimal("0.000001")) for v in ev.value]
    sizes = fd.value_counts()
    dv = ev.groupby(["cohort_day", "off"]).v.sum().sort_index()
    exp = {}
    for cohort, g in dv.groupby(level=0):
        cum = Decimal(0)
        for (c, off), val in g.items():
            cum += val
            exp[(c, off)] = float(cum) / sizes[cohort]
    got = {
        (r.cohort_day, r.day_offset): (r.cohort_size, r.cum_value_per_user)
        for r in q_cohort_ltv_curve(spark, SF_SMOKE).collect()
    }
    assert set(got) == set(exp)
    for k, (size, cum) in got.items():
        assert size == sizes[k[0]]
        assert abs(cum - exp[k]) < 1e-6
    # non-vacuous: curves are non-decreasing in offset within each cohort
    import itertools

    for cohort, grp in itertools.groupby(sorted(got), key=lambda k: k[0]):
        vals = [got[k][1] for k in grp]
        assert all(a <= b + 1e-9 for a, b in zip(vals, vals[1:]))


# --- rank-sum / Kendall tau ----------------------------------------------------------


def test_weekend_ranksum_matches_python(spark):
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.operators.temporal import (
        q_weekend_volume_ranksum,
    )

    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    daily = ev.groupby(ev.ts.dt.floor("D")).size().sort_index()
    vals = [(d.dayofweek >= 5, y) for d, y in daily.items()]  # pandas: Sat=5, Sun=6
    ys = sorted(y for _, y in vals)
    midrank = {}
    i = 0
    while i < len(ys):
        j = i
        while j < len(ys) and ys[j] == ys[i]:
            j += 1
        for _ in range(i, j):
            midrank.setdefault(ys[i], (i + 1 + j) / 2)
        i = j
    weekend = [y for we, y in vals if we]
    weekday = [y for we, y in vals if not we]
    nw, nd = len(weekend), len(weekday)
    rw = sum(midrank[y] for y in weekend)
    ties = Counter(ys)
    tie3 = sum(t**3 - t for t in ties.values())
    n = nw + nd
    z = (rw - nw * (n + 1) / 2) / math.sqrt(nw * nd / 12 * ((n + 1) - tie3 / (n * (n - 1))))
    row = q_weekend_volume_ranksum(spark, SF_SMOKE).collect()[0]
    assert (row.n_weekend, row.n_weekday) == (nw, nd)
    assert abs(row.weekend_ranksum - rw) < 1e-9
    assert abs(row.u_stat - (rw - nw * (nw + 1) / 2)) < 1e-9
    assert abs(row.z - z) < 1e-8
    # non-vacuous: both groups populated
    assert nw > 0 and nd > 0


def test_kendall_tau_matches_python(spark):
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.operators.temporal import (
        q_kendall_tau_click_purchase,
    )

    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    g = ev.groupby([ev.ts.dt.floor("D"), "event_type"]).size().unstack(fill_value=0)
    x = g.get("click").sort_index().tolist()
    y = g.get("purchase").sort_index().tolist()
    n = len(x)
    conc = disc = tx = ty = 0
    for i in range(n):
        for j in range(i + 1, n):
            a, b = x[j] - x[i], y[j] - y[i]
            if a * b > 0:
                conc += 1
            elif a * b < 0:
                disc += 1
            elif a == 0 and b != 0:
                tx += 1
            elif b == 0 and a != 0:
                ty += 1
    tau = (conc - disc) / math.sqrt((conc + disc + tx) * (conc + disc + ty))
    row = q_kendall_tau_click_purchase(spark, SF_SMOKE).collect()[0]
    assert row.n_days == n
    assert (row.concordant, row.discordant) == (conc, disc)
    assert abs(row.tau_b - tau) < 1e-8
    # non-vacuous: both concordant and discordant pairs occur
    assert conc > 0 and disc > 0


# --- ordered_pairs helper -------------------------------------------------------------


def test_ordered_pairs_property(spark):
    """The shared pair fan-out helper matches itertools.combinations on
    generated arrays, including duplicates (positional pairs) and the
    n < 2 empty guard."""
    import itertools

    from pyspark.sql import functions as F

    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.functions.arrays import (
        ordered_pairs,
    )

    cases = [[], [7], [1, 2], [3, 3], [1, 2, 2, 5], list(range(8)), [5, 1, 5, 1, 5]]
    df = spark.createDataFrame([(i, c) for i, c in enumerate(cases)], "i int, arr array<int>")
    rows = {
        r.i: [(p.a, p.b) for p in r.pairs]
        for r in df.select("i", ordered_pairs("arr").alias("pairs")).collect()
    }
    for i, c in enumerate(cases):
        assert rows[i] == list(itertools.combinations(c, 2)), (i, c)


# --- user feature vector ---------------------------------------------------------------


def test_user_feature_vector_matches_pandas(spark):
    from decimal import Decimal

    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.operators.behavior import (
        FEATURE_EVENT_TYPES,
        q_user_feature_vector,
    )

    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet").sort_values(["user_id", "ts", "event_id"])
    corpus_max = ev.ts.max()
    rows = {r.user_id: r for r in q_user_feature_vector(spark, SF_SMOKE).collect()}
    assert set(rows) == set(ev.user_id.unique())
    gap = pd.Timedelta(minutes=30)
    for uid, g in ev.groupby("user_id"):
        r = rows[uid]
        assert r.n_events == len(g)
        assert r.n_active_days == g.ts.dt.floor("D").nunique()
        sessions = 1 + (g.ts.diff() > gap).sum()
        assert r.n_sessions == sessions
        vs = sum(Decimal(str(v)).quantize(Decimal("0.000001")) for v in g.value)
        assert abs(r.value_sum - float(vs)) < 1e-6
        assert r.recency_us == int((corpus_max - g.ts.max()).value // 1000)
        assert r.tenure_us == int((g.ts.max() - g.ts.min()).value // 1000)
        counts = {t: int((g.event_type == t).sum()) for t in FEATURE_EVENT_TYPES}
        for t, c in counts.items():
            assert getattr(r, f"n_{t}") == c
        n = len(g)
        h = math.log(n) - sum(c * math.log(c) for c in counts.values() if c) / n
        assert abs(r.type_entropy - h) < 1e-8
        best = max(counts.values())
        assert r.modal_type == next(t for t in FEATURE_EVENT_TYPES if counts[t] >= best)
    # non-vacuous: multi-session users and entropy spread both exist
    assert any(r.n_sessions > 1 for r in rows.values())
    assert len({round(r.type_entropy, 3) for r in rows.values()}) > 5


def test_bigram_lm_bits_matches_pure_python_replica(spark):
    """The add-k bigram LM scorer must agree with an independent
    pure-Python replica (model counts AND per-doc mean bits) on real
    sf0.001 documents — pins the smoothing formula, the in-row bigram
    construction (zip of token-array slices), and the <2-token dropout."""
    import math
    import re as _re
    from collections import Counter

    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.datapipe.textstats import (
        BIGRAM_LM_K,
        q_doc_bigram_lm_bits,
    )
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.sources import load_table

    from .conftest import SF_SMOKE

    docs = {
        r["doc_id"]: _re.sub(r"\s+", " ", r["text"].lower().strip()).split(" ")
        for r in load_table(spark, SF_SMOKE, "documents").select("doc_id", "text").collect()
    }
    c12: Counter = Counter()
    vocab = set()
    for toks in docs.values():
        vocab.update(toks)
        c12.update(zip(toks, toks[1:]))
    c1: Counter = Counter()
    for (w1, _w2), c in c12.items():
        c1[w1] += c
    v = len(vocab)

    def bits(w1: str, w2: str) -> float:
        return round(
            -math.log2((c12[(w1, w2)] + BIGRAM_LM_K) / (c1[w1] + BIGRAM_LM_K * v)), 12
        )

    want = {}
    for d, toks in docs.items():
        if len(toks) < 2:
            continue
        vals = [bits(a, b) for a, b in zip(toks, toks[1:])]
        want[d] = (len(vals), round(sum(vals) / len(vals), 9))

    got = {
        r["doc_id"]: (r["n_bigrams"], r["bits_per_token"])
        for r in q_doc_bigram_lm_bits(spark, SF_SMOKE).collect()
    }
    assert set(got) == set(want)
    for d in want:
        assert got[d][0] == want[d][0], d
        assert abs(got[d][1] - want[d][1]) < 1e-8, d
