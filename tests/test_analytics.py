"""Semantic checks for the analytics extensions."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.operators.analytics import (
    q_approx_distinct_users,
    q_cube,
    q_distinct_users,
)

from .conftest import SF_SMOKE


def test_approx_distinct_within_rsd(spark):
    # raw-estimate bound (the registered query now folds the estimate into
    # an oracle-checkable est_within_tol boolean, r9): recompute the HLL++
    # estimate directly and bound it against the exact counts
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.operators.analytics import (
        APPROX_DISTINCT_RSD,
    )
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.sources import load_table
    from pyspark.sql import functions as F

    exact = {r["event_type"]: r["n_users"] for r in q_distinct_users(spark, SF_SMOKE).collect()}
    approx = {
        r["event_type"]: r["est"]
        for r in load_table(spark, SF_SMOKE, "events")
        .groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=APPROX_DISTINCT_RSD).alias("est"))
        .collect()
    }
    assert exact.keys() == approx.keys()
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(2, 0.1 * n), (k, n, approx[k])
    reg = {
        r["event_type"]: (r["n_users_exact"], r["est_within_tol"])
        for r in q_approx_distinct_users(spark, SF_SMOKE).collect()
    }
    assert reg == {k: (n, True) for k, n in exact.items()}


def test_approx_p50_tracks_exact_median(spark):
    # raw-sketch bound (the registered query now brackets each estimate
    # between exact order statistics as oracle-checkable booleans, r9):
    # recompute the sketch directly and bound p50 vs the exact median
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.operators.analytics import (
        _APPROX_PCT_PS,
        APPROX_PCT_ACCURACY,
        q_approx_percentiles,
        q_median_value,
    )
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.sources import load_table
    from pyspark.sql import functions as F

    exact = {r["event_type"]: r["median_value"] for r in q_median_value(spark, SF_SMOKE).collect()}
    raw = {
        r["event_type"]: r["pcts"]
        for r in load_table(spark, SF_SMOKE, "events")
        .groupBy("event_type")
        .agg(
            F.percentile_approx("value", list(_APPROX_PCT_PS), APPROX_PCT_ACCURACY).alias("pcts")
        )
        .collect()
    }
    assert exact.keys() == raw.keys()
    for k, m in exact.items():
        spread = abs(m) if m else 1.0
        assert abs(raw[k][0] - m) <= 0.1 * spread + 1e-9, (k, m, raw[k][0])
        # percentiles are ordered
        assert raw[k][0] <= raw[k][1] <= raw[k][2]
    # registered form: every bracket-containment boolean holds, brackets ordered
    for r in q_approx_percentiles(spark, SF_SMOKE).collect():
        assert r["p50_ok"] and r["p95_ok"] and r["p99_ok"]
        assert r["p50_lo"] <= r["p50_hi"] <= r["p95_hi"] <= r["p99_hi"]


def test_cube_grand_total_matches_detail_sum(spark):
    rows = q_cube(spark, SF_SMOKE).collect()
    grand = [r for r in rows if r["business"] is None and r["ship_month"] is None]
    detail = [r for r in rows if r["business"] is not None and r["ship_month"] is not None]
    assert len(grand) == 1
    assert grand[0]["trip_count"] == sum(r["trip_count"] for r in detail)


def test_sketch_rollup_union_matches_whole_corpus_sketch(spark):
    """Mergeability: the union of daily HLL sketches must estimate exactly
    what one sketch over the whole corpus estimates (DataSketches is
    deterministic on a given value set), and both must track the exact
    distinct count within the sketch's error envelope."""
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.operators.analytics import (
        sketch_rollup_detail,
    )
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.sources import load_table
    from pyspark.sql import functions as F

    from .conftest import SF_SMOKE

    rows = {r["event_type"]: r for r in sketch_rollup_detail(spark, SF_SMOKE).collect()}
    assert rows
    whole = {
        r["event_type"]: r["est"]
        for r in load_table(spark, SF_SMOKE, "events")
        .groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).cast("long").alias("est"))
        .collect()
    }
    again = {r["event_type"]: r for r in sketch_rollup_detail(spark, SF_SMOKE).collect()}
    for et, r in rows.items():
        assert r["distinct_users_est"] == whole[et]  # union of dailies ≡ one sketch
        assert r["distinct_users_est"] == again[et]["distinct_users_est"]  # deterministic
        exact = r["distinct_users_exact"]
        assert abs(r["distinct_users_est"] - exact) <= max(2, 0.05 * exact)
        assert r["n_days"] >= 1
