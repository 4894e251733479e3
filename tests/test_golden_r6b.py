"""sf0.001 golden rows for the REMAINING rows-only queries (follow-up to
``test_golden_r6.py``): with these, every one of the registry's 22
no-oracle queries carries exact committed golden rows in addition to its
property/replica pin — full refactor insurance for the tier the driver's
hash gate can't reach.

All are seeded-deterministic and partition-count independent per their
docstrings (``embedding_top_component`` and ``kmeans_embedding_clusters``
additionally carry explicit partition-invariance/replica tests); floats
are pinned at 9 dp, large outputs pinned on a deterministic doc/vec-id
stride sample.  ``train_quality_classifier`` is deliberately NOT golden-
pinned at full precision — its gradient sums carry partition-order float
noise by design (bounded in ``test_trainer.py``) — so it is pinned here
at 6 dp, well outside the noise band and well inside model scale.
"""

from __future__ import annotations

from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.registry import load_all

SF_SMOKE = "/root/testdata/sf0.001"

_GOLDEN_EMB_LSH = [
    (23, 319, 0.453151802), (45, 237, 0.470961706), (124, 454, 0.469770568),
    (171, 358, 0.469975895), (244, 477, 0.479015633), (352, 411,
    0.457330822), (390, 483, 0.454306784)
]

_GOLDEN_APPROX_DISTINCT = [
    ('click', 15), ('error', 15), ('purchase', 15), ('signup', 15), ('view',
    15)
]

_GOLDEN_APPROX_PCT = [
    ('click', 33.19, 148.12, 253.94), ('error', 33.55, 124.6, 185.57),
    ('purchase', 35.62, 140.64, 213.1), ('signup', 37.9, 156.01, 230.25),
    ('view', 37.11, 127.11, 285.2)
]

_GOLDEN_SEMDEDUP_DUPS = [
    (116, 5), (134, 7), (165, 3), (203, 5), (215, 3), (227, 7), (230, 1),
    (250, 7), (319, 6), (342, 4), (355, 4), (362, 6), (404, 0), (406, 2),
    (411, 2), (445, 3), (455, 2), (462, 3), (470, 5), (471, 4), (472, 0),
    (477, 3), (494, 4)
]

_GOLDEN_KMEANS_SAMPLE = [
    (0, 4, 0.984286135), (25, 4, 0.92406446), (50, 2, 0.987942322), (75, 4,
    0.970283599), (100, 3, 0.933620095), (125, 4, 0.947864742), (150, 7,
    0.917493339), (175, 0, 0.970209213), (200, 4, 0.963403183), (225, 4,
    0.913182248), (250, 7, 0.886244971), (275, 0, 0.884431706), (300, 4,
    0.966521233), (325, 2, 0.931260474), (350, 4, 0.9726628), (375, 2,
    0.93969221), (400, 2, 0.890459706), (425, 4, 0.961538051), (450, 5,
    0.919834352), (475, 2, 0.95348304)
]

_GOLDEN_TOP_COMPONENT = [
    (0, 0.15302719, 0.02887526, 0.02892406), (1, 0.05218726, 0.02887526,
    0.02892406), (2, -0.06086092, 0.02887526, 0.02892406), (3, 0.17545527,
    0.02887526, 0.02892406), (4, -0.01686486, 0.02887526, 0.02892406), (5,
    -0.22071276, 0.02887526, 0.02892406), (6, -0.16224947, 0.02887526,
    0.02892406), (7, -0.16126877, 0.02887526, 0.02892406)
]

_GOLDEN_TEXTRANK = [
    ('a', 0.033391444), ('agg', 0.033067091), ('batch', 0.032818022),
    ('big', 0.033452667), ('column', 0.033088065), ('customer',
    0.033449245), ('fast', 0.033640869), ('filter', 0.03286071), ('key',
    0.033559082), ('merge', 0.033722606), ('part', 0.033662244), ('query',
    0.034481972), ('scan', 0.033692706), ('sort', 0.033923672), ('spark',
    0.032805813), ('stream', 0.033191278), ('table', 0.033121858), ('the',
    0.033155338), ('value', 0.033388595), ('window', 0.034184566)
]

_GOLDEN_BPE_MERGES = [
    (1, 'e', 'r', 'er', 4650), (2, 'o', 'r', 'or', 2880), (3, 'i', 'n',
    'in', 2858), (4, 'o', 'w', 'ow', 2763), (5, 's', 't', 'st', 2721), (6,
    'l', 'u', 'lu', 1928), (7, 'a', 'r', 'ar', 1873), (8, 'p', 'ar', 'par',
    1873), (9, 'm', 'er', 'mer', 1824), (10, 'a', 't', 'at', 1806), (11,
    'a', 'n', 'an', 984), (12, 'c', 'an', 'can', 984), (13, 's', 'can',
    'scan', 984), (14, 'c', 'o', 'co', 978), (15, 'co', 'lu', 'colu', 978),
    (16, 'colu', 'm', 'colum', 978), (17, 'colum', 'n', 'column', 978), (18,
    'd', 'ow', 'dow', 976), (19, 'in', 'dow', 'indow', 976), (20, 'w',
    'indow', 'window', 976), (21, 'd', 'er', 'der', 975), (22, 'or', 'der',
    'order', 975), (23, 'or', 't', 'ort', 974), (24, 's', 'ort', 'sort',
    974)
]

_GOLDEN_BPE_ENCODE_SAMPLE = [
    (0, 23, 62, 't|h|e|f|a|st|k|e|y|order|sort|t'), (25, 32, 91,
    'r|ow|order|c|u|st|o|mer|sort|a|g|g'), (50, 22, 59,
    't|h|e|f|a|st|k|e|y|order|sort|t'), (75, 42, 140,
    'f|a|st|sort|b|at|c|h|s|m|a|l'), (100, 89, 278,
    'd|at|a|f|a|st|scan|par|t|column|b|at'), (125, 61, 194,
    'column|v|e|c|t|or|k|e|y|a|l|in'), (150, 14, 50,
    'c|u|st|o|mer|s|par|k|a|s|m|a'), (175, 88, 286,
    's|l|ow|d|at|a|s|l|ow|a|g|g'), (200, 59, 191,
    'h|a|s|h|t|h|e|j|o|in|column|t'), (225, 27, 86,
    'l|in|e|q|u|er|y|t|a|b|l|e'), (250, 36, 103,
    'window|t|h|e|k|e|y|g|r|o|u|p'), (275, 64, 195,
    'a|b|i|g|g|r|o|u|p|scan|f|a'), (300, 79, 218,
    'scan|c|u|st|o|mer|h|a|s|h|order|scan'), (325, 18, 45,
    'par|t|par|t|l|in|e|window|f|i|l|t'), (350, 53, 168,
    'v|a|lu|e|scan|sort|mer|g|e|mer|g|e'), (375, 35, 130,
    'r|ow|f|i|l|t|er|h|a|s|h|d'), (400, 15, 44,
    'k|e|y|v|e|c|t|or|scan|window|s|par'), (425, 36, 110,
    'window|t|h|e|b|i|g|scan|q|u|er|y'), (450, 42, 137,
    'v|a|lu|e|k|e|y|sort|c|u|st|o'), (475, 68, 198,
    'd|at|a|k|e|y|order|a|t|a|b|l')
]

_GOLDEN_ABSORPTION = [
    ('click', 0.480397692, 0.519602308), ('signup', 0.47366478, 0.52633522),
    ('view', 0.470382976, 0.529617024)
]


_GOLDEN_TRAINER_W6 = {
    "n_toks_h": 9.914832,
    "stop_ratio": 3.747882,
    "chars_per_tok_d": -1.187494,
    "bias": -6.140884,
}


def _rows(spark, name):
    return load_all()[name].fn(spark, SF_SMOKE).collect()


def test_golden_embedding_lsh_pairs(spark):
    # round-10: the pair output moved to the detail surface (the registered
    # query is the oracle-gated bound summary, checked below)
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.datapipe.dedup import (
        embedding_lsh_detail,
    )

    got = sorted(
        (r.vec_a, r.vec_b, round(r.cos_sim, 9))
        for r in embedding_lsh_detail(spark, SF_SMOKE).collect()
    )
    assert got == _GOLDEN_EMB_LSH


def test_golden_embedding_lsh_registered_bounds(spark):
    rows = _rows(spark, "neardup_embedding_lsh")
    assert len(rows) == 1
    r = rows[0]
    assert r.n_true_pairs == len(_GOLDEN_EMB_LSH)  # recall 1.0 at sf0.001
    assert r.found_subset_of_truth is True
    assert r.sims_match_truth is True
    assert r.recall_ge_floor is True


def test_golden_approx_distinct(spark):
    # the registered query emits the oracle-checkable bound form since r9;
    # the golden still pins the RAW HLL++ estimates (same params) directly
    from pyspark.sql import functions as F

    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.operators.analytics import (
        APPROX_DISTINCT_RSD,
    )
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.sources import load_table

    got = sorted(
        (r.event_type, r.est)
        for r in load_table(spark, SF_SMOKE, "events")
        .groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=APPROX_DISTINCT_RSD).alias("est"))
        .collect()
    )
    assert got == _GOLDEN_APPROX_DISTINCT
    reg = sorted(
        (r.event_type, r.n_users_exact, r.est_within_tol)
        for r in _rows(spark, "approx_distinct_users_by_event_type")
    )
    assert reg == [(et, 15, True) for et, _e in _GOLDEN_APPROX_DISTINCT]


def test_golden_approx_percentiles(spark):
    # raw sketch values pinned directly (same params as the registered
    # query); the registered bound form's booleans must all hold
    from pyspark.sql import functions as F

    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.operators.analytics import (
        _APPROX_PCT_PS,
        APPROX_PCT_ACCURACY,
    )
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.sources import load_table

    got = sorted(
        (r.event_type, round(r.pcts[0], 9), round(r.pcts[1], 9), round(r.pcts[2], 9))
        for r in load_table(spark, SF_SMOKE, "events")
        .groupBy("event_type")
        .agg(
            F.percentile_approx("value", list(_APPROX_PCT_PS), APPROX_PCT_ACCURACY).alias("pcts")
        )
        .collect()
    )
    assert got == _GOLDEN_APPROX_PCT
    for r in _rows(spark, "approx_percentiles_by_event_type"):
        assert r.p50_ok and r.p95_ok and r.p99_ok


def test_golden_semantic_dedup_dup_set(spark):
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.datapipe.kmeans import (
        semantic_dedup_docs_detail,
    )

    det = semantic_dedup_docs_detail(spark, SF_SMOKE).collect()
    got = sorted((r.vec_id, r.cluster) for r in det if r.is_dup)
    assert got == _GOLDEN_SEMDEDUP_DUPS
    assert len(det) == 500  # full corpus emitted
    # registered (oracle-gated) surface: vector universe + recheck booleans
    reg = {r.vec_id: tuple(r) for r in _rows(spark, "semantic_dedup_docs")}
    assert len(reg) == 500
    assert all(v == (k, True, True, True) for k, v in reg.items())


def test_golden_kmeans_sample(spark):
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.datapipe.kmeans import (
        kmeans_embedding_clusters_detail,
    )

    got = sorted(
        (r.vec_id, r.cluster, round(r.dist2, 9))
        for r in kmeans_embedding_clusters_detail(spark, SF_SMOKE).collect()
        if r.vec_id % 25 == 0
    )
    assert got == _GOLDEN_KMEANS_SAMPLE
    # registered (oracle-gated) surface: vector universe + range booleans
    reg = {r.vec_id: tuple(r) for r in _rows(spark, "kmeans_embedding_clusters")}
    assert reg and all(v == (k, True, True) for k, v in reg.items())


def test_golden_top_component_head(spark):
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.datapipe.pca import (
        embedding_top_component_detail,
    )

    got = sorted(
        (r.dim, round(r.loading, 9), round(r.eigenvalue, 9), round(r.explained_ratio, 9))
        for r in embedding_top_component_detail(spark, SF_SMOKE).collect()
    )[:8]
    assert got == _GOLDEN_TOP_COMPONENT
    # registered (oracle-gated) surface: dim universe + eigen bounds
    reg_rows = sorted(tuple(r) for r in _rows(spark, "embedding_top_component"))
    assert reg_rows == [(i, True, True, True) for i in range(64)]


def test_golden_textrank(spark):
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.datapipe.graphrank import (
        textrank_keywords_detail,
    )

    got = sorted(
        (r.term, round(r.rank, 9))
        for r in textrank_keywords_detail(spark, SF_SMOKE).collect()
    )
    assert got == _GOLDEN_TEXTRANK


def test_golden_bpe_merge_table(spark):
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.datapipe.bpe import (
        bpe_learn_merges_detail,
    )

    got = sorted(
        (r["rank"], r.left, r.right, r.merged, r.pair_freq)
        for r in bpe_learn_merges_detail(spark, SF_SMOKE).collect()
    )
    assert got == _GOLDEN_BPE_MERGES
    # registered (oracle-gated) surface: rank universe + invariants
    reg_rows = sorted(tuple(r) for r in _rows(spark, "bpe_learn_merges"))
    assert reg_rows == [(rnk, True, True, True) for rnk, *_ in sorted(_GOLDEN_BPE_MERGES)]


def test_golden_bpe_encode_sample(spark):
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.datapipe.bpe import (
        bpe_encode_docs_detail,
    )

    got = sorted(
        (r.doc_id, r.n_words, r.n_bpe_tokens, r.preview)
        for r in bpe_encode_docs_detail(spark, SF_SMOKE).collect()
        if r.doc_id % 25 == 0
    )
    assert got == _GOLDEN_BPE_ENCODE_SAMPLE


def test_golden_absorption(spark):
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.operators.behavior import (
        absorption_purchase_vs_error_detail,
    )

    got = sorted(
        (r.start_state, round(r.p_purchase, 9), round(r.p_error, 9))
        for r in absorption_purchase_vs_error_detail(spark, SF_SMOKE).collect()
    )
    assert got == _GOLDEN_ABSORPTION
    # registered (oracle-gated) surface: transient universe + axiom booleans
    reg_rows = sorted(tuple(r) for r in _rows(spark, "absorption_purchase_vs_error"))
    assert reg_rows == sorted((s, True, True) for s, _p, _e in _GOLDEN_ABSORPTION)


def test_golden_trained_classifier_weights(spark):
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.datapipe.trainer import (
        train_quality_classifier_detail,
    )

    got = {
        r.feature: round(r.weight, 6)
        for r in train_quality_classifier_detail(spark, SF_SMOKE).collect()
    }
    assert got == _GOLDEN_TRAINER_W6
    # registered (oracle-gated) surface: model universe + distillation booleans
    reg = {r.feature: tuple(r) for r in _rows(spark, "train_quality_classifier")}
    assert set(reg) == set(got)
    assert all(v == (k, 500, True, True) for k, v in reg.items())
