"""sf0.001 golden rows added in round 7.

``ann_recall_report`` was the ONE rows-only query without committed golden
rows (round-6 advice: COVERAGE.md's "every rows-only query carries goldens"
claim was not true for it — its inputs are staged and deterministic, so
there is no reason to settle for bounds-only checks).  Same discipline as
``test_golden_r6.py``: pin the EXACT output at sf0.001; regenerate only on
a deliberate semantic change (re-tuned index constants, changed panel
geometry).
"""

from __future__ import annotations

from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.registry import load_all

SF_SMOKE = "/root/testdata/sf0.001"

# (method, n_queries, mean_recall, min_recall) — exact: recalls are ratios
# of small integers (hits / TOP_K over N_QUERIES), no float accumulation
_GOLDEN_ANN_RECALL = [
    ("lsh", 10, 0.38, 0.2),
    ("ivf", 10, 0.68, 0.4),
    ("pq", 10, 0.74, 0.4),
    ("ivfpq", 10, 0.64, 0.4),
]


def test_ann_recall_report_golden_rows(spark):
    # round-10: the raw numbers moved to the DETAIL surface (the registered
    # query is the oracle-gated floor-boolean summary); the golden pins the
    # detail, and the registered output is checked against it below
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.datapipe.similarity import (
        ann_recall_report_detail,
    )

    df = ann_recall_report_detail(spark, SF_SMOKE)
    rows = sorted(tuple(r) for r in df.collect())
    assert rows == sorted(_GOLDEN_ANN_RECALL)


def test_ann_recall_report_registered_golden_rows(spark):
    df = load_all()["ann_recall_report"].fn(spark, SF_SMOKE)
    rows = sorted(tuple(r) for r in df.collect())
    assert rows == sorted((m, n, True) for m, n, _mean, _min in _GOLDEN_ANN_RECALL)


# media_image_neardup_phash: exact full output at sf0.001 in compact form —
# the pair set is precisely the constructed twins (media_a % 4 == 0,
# media_b = media_a + VARIANT_OFFSET, doc_ids 0..496), with hamming 1 for
# the six media whose perturbed byte flips a dHash comparison and 0 for the
# rest (the +16 bump lands on the same side of the neighbour comparison).
_PHASH_HAMMING_ONES = {104, 132, 276, 308, 348, 368}


def test_media_image_neardup_golden_rows(spark):
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.datapipe.multimodal import (
        VARIANT_MOD,
        VARIANT_OFFSET,
        media_image_neardup_detail,
    )

    rows = sorted(
        (r["media_a"], r["media_b"], r["hamming"])
        for r in media_image_neardup_detail(spark, SF_SMOKE).collect()
    )
    expected = sorted(
        (a, a + VARIANT_OFFSET, 1 if a in _PHASH_HAMMING_ONES else 0)
        for a in range(0, 497, VARIANT_MOD)
    )
    assert rows == expected
    # registered (oracle-gated) surface: same pairs, threshold boolean
    reg_rows = sorted(
        tuple(r)
        for r in load_all()["media_image_neardup_phash"].fn(spark, SF_SMOKE).collect()
    )
    assert reg_rows == sorted((a, b, True) for a, b, _h in expected)


# media_audio_neardup_fp: same compact exact-output pin as the image tier
_AUDIO_FP_HAMMING_ONES = {412, 472}


def test_media_audio_neardup_golden_rows(spark):
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.datapipe.multimodal import (
        VARIANT_MOD,
        VARIANT_OFFSET,
        media_audio_neardup_detail,
    )

    rows = sorted(
        (r["media_a"], r["media_b"], r["hamming"])
        for r in media_audio_neardup_detail(spark, SF_SMOKE).collect()
    )
    expected = sorted(
        (a, a + VARIANT_OFFSET, 1 if a in _AUDIO_FP_HAMMING_ONES else 0)
        for a in range(0, 497, VARIANT_MOD)
    )
    assert rows == expected
    reg_rows = sorted(
        tuple(r)
        for r in load_all()["media_audio_neardup_fp"].fn(spark, SF_SMOKE).collect()
    )
    assert reg_rows == sorted((a, b, True) for a, b, _h in expected)


# pack_bestfit_efficiency: exact sf0.001 golden rows (20 sources) —
# (source, n_docs, n_bins, total_tokens, padding_tokens, fill_rate)
_GOLDEN_BESTFIT = [
    ("src0", 25, 8, 1533, 515, 0.748535156),
    ("src1", 25, 8, 1441, 607, 0.703613281),
    ("src10", 25, 7, 1376, 416, 0.767857143),
    ("src11", 25, 8, 1426, 622, 0.696289063),
    ("src12", 25, 8, 1479, 569, 0.722167969),
    ("src13", 25, 7, 1269, 523, 0.708147321),
    ("src14", 25, 8, 1657, 391, 0.809082031),
    ("src15", 25, 8, 1332, 716, 0.650390625),
    ("src16", 25, 8, 1414, 634, 0.690429688),
    ("src17", 25, 7, 1314, 478, 0.733258929),
    ("src18", 25, 7, 1271, 521, 0.709263393),
    ("src19", 25, 8, 1369, 679, 0.668457031),
    ("src2", 25, 7, 1267, 525, 0.70703125),
    ("src3", 25, 8, 1560, 488, 0.76171875),
    ("src4", 25, 8, 1316, 732, 0.642578125),
    ("src5", 25, 7, 1216, 576, 0.678571429),
    ("src6", 25, 8, 1466, 582, 0.715820313),
    ("src7", 25, 8, 1212, 836, 0.591796875),
    ("src8", 25, 9, 1632, 672, 0.708333333),
    ("src9", 25, 8, 1389, 659, 0.678222656),
]


def test_pack_bestfit_efficiency_golden_rows(spark):
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.datapipe.curate import (
        pack_bestfit_efficiency_detail,
    )

    rows = sorted(
        tuple(r) for r in pack_bestfit_efficiency_detail(spark, SF_SMOKE).collect()
    )
    assert rows == sorted(_GOLDEN_BESTFIT)
    # registered (oracle-gated) surface: conservation columns + invariants
    reg_rows = sorted(
        tuple(r) for r in load_all()["pack_bestfit_efficiency"].fn(spark, SF_SMOKE).collect()
    )
    expected = sorted(
        (src, n_docs, total, True, True)
        for src, n_docs, _bins, total, _pad, _fill in _GOLDEN_BESTFIT
    )
    assert reg_rows == expected
