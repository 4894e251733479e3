"""sf0.001 golden rows for the six rows-only queries that previously had
only property/replica tests (round-5 verdict item 3): ``ann_ivf_topk``,
``ann_pq_topk``, ``ann_ivfpq_topk``, ``coreset_kcenter_sample``,
``doc_compression_ratio``, ``daily_distinct_users_sketch_rollup``.

The driver's hash gate never covers these (no SQL form → rows-only), and a
refactor that silently changes a seed, codebook geometry, or greedy tie
order could keep the recall/replica pins green while changing every
emitted row.  These goldens pin the EXACT output at sf0.001 — all six are
seeded-deterministic and partition-count independent per their docstrings;
regenerate only on a deliberate semantic change.

(Same discipline as tests/test_datapipe.py's minhash/simhash/ann-lsh
goldens; split into this file because the r6 batch covers queries from
three different modules.)
"""

from __future__ import annotations

from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.registry import load_all

SF_SMOKE = "/root/testdata/sf0.001"

_GOLDEN_ANN_IVF = [
    (0, 1, 17, 0.334456812), (0, 2, 225, 0.315127956), (0, 3, 12,
    0.311028191), (0, 4, 260, 0.298670168), (0, 5, 73, 0.297238655), (1, 1,
    257, 0.39176277), (1, 2, 129, 0.351480878), (1, 3, 440, 0.299304156),
    (1, 4, 75, 0.289978495), (1, 5, 455, 0.282432402), (2, 1, 443,
    0.357569236), (2, 2, 62, 0.28999639), (2, 3, 246, 0.289768502), (2, 4,
    309, 0.25234359), (2, 5, 132, 0.246668963), (3, 1, 205, 0.336595751),
    (3, 2, 212, 0.319721647), (3, 3, 84, 0.319663924), (3, 4, 426,
    0.315099065), (3, 5, 156, 0.311071119), (4, 1, 345, 0.374941548), (4, 2,
    98, 0.339768248), (4, 3, 143, 0.329711833), (4, 4, 343, 0.312433245),
    (4, 5, 57, 0.298747666), (5, 1, 113, 0.364432515), (5, 2, 448,
    0.279151652), (5, 3, 118, 0.273542276), (5, 4, 296, 0.268567563), (5, 5,
    377, 0.267445263), (6, 1, 434, 0.305747641), (6, 2, 78, 0.29407356), (6,
    3, 495, 0.260575878), (6, 4, 312, 0.25504535), (6, 5, 352, 0.253825953),
    (7, 1, 466, 0.324004385), (7, 2, 329, 0.30511107), (7, 3, 220,
    0.299404234), (7, 4, 18, 0.285971033), (7, 5, 198, 0.25728906), (8, 1,
    20, 0.33007872), (8, 2, 385, 0.326576673), (8, 3, 190, 0.324203247), (8,
    4, 231, 0.323991642), (8, 5, 132, 0.309925118), (9, 1, 381,
    0.356691958), (9, 2, 107, 0.329678451), (9, 3, 261, 0.279712772), (9, 4,
    327, 0.259396181), (9, 5, 463, 0.25135449)
]

_GOLDEN_ANN_PQ = [
    (0, 1, 225, 0.315127956), (0, 2, 12, 0.311028191), (0, 3, 483,
    0.300451758), (0, 4, 260, 0.298670168), (0, 5, 73, 0.297238655), (1, 1,
    257, 0.39176277), (1, 2, 209, 0.381544973), (1, 3, 129, 0.351480878),
    (1, 4, 440, 0.299304156), (1, 5, 75, 0.289978495), (2, 1, 443,
    0.357569236), (2, 2, 62, 0.28999639), (2, 3, 246, 0.289768502), (2, 4,
    185, 0.282940995), (2, 5, 91, 0.2789152), (3, 1, 223, 0.340916724), (3,
    2, 205, 0.336595751), (3, 3, 212, 0.319721647), (3, 4, 84, 0.319663924),
    (3, 5, 426, 0.315099065), (4, 1, 345, 0.374941548), (4, 2, 98,
    0.339768248), (4, 3, 143, 0.329711833), (4, 4, 343, 0.312433245), (4, 5,
    62, 0.288641873), (5, 1, 113, 0.364432515), (5, 2, 440, 0.309256681),
    (5, 3, 298, 0.299073465), (5, 4, 448, 0.279151652), (5, 5, 31,
    0.262664317), (6, 1, 141, 0.345879592), (6, 2, 434, 0.305747641), (6, 3,
    280, 0.285944333), (6, 4, 495, 0.260575878), (6, 5, 312, 0.25504535),
    (7, 1, 382, 0.349853349), (7, 2, 209, 0.30624973), (7, 3, 220,
    0.299404234), (7, 4, 18, 0.285971033), (7, 5, 326, 0.270094356), (8, 1,
    20, 0.33007872), (8, 2, 385, 0.326576673), (8, 3, 132, 0.309925118), (8,
    4, 118, 0.278422817), (8, 5, 375, 0.275047847), (9, 1, 381,
    0.356691958), (9, 2, 261, 0.279712772), (9, 3, 327, 0.259396181), (9, 4,
    88, 0.25182675), (9, 5, 463, 0.25135449)
]

_GOLDEN_ANN_IVFPQ = [
    (0, 1, 225, 0.315127956), (0, 2, 12, 0.311028191), (0, 3, 260,
    0.298670168), (0, 4, 73, 0.297238655), (0, 5, 232, 0.267339023), (1, 1,
    257, 0.39176277), (1, 2, 129, 0.351480878), (1, 3, 440, 0.299304156),
    (1, 4, 75, 0.289978495), (1, 5, 455, 0.282432402), (2, 1, 443,
    0.357569236), (2, 2, 62, 0.28999639), (2, 3, 246, 0.289768502), (2, 4,
    309, 0.25234359), (2, 5, 132, 0.246668963), (3, 1, 205, 0.336595751),
    (3, 2, 212, 0.319721647), (3, 3, 84, 0.319663924), (3, 4, 426,
    0.315099065), (3, 5, 156, 0.311071119), (4, 1, 345, 0.374941548), (4, 2,
    98, 0.339768248), (4, 3, 143, 0.329711833), (4, 4, 343, 0.312433245),
    (4, 5, 57, 0.298747666), (5, 1, 113, 0.364432515), (5, 2, 448,
    0.279151652), (5, 3, 118, 0.273542276), (5, 4, 296, 0.268567563), (5, 5,
    377, 0.267445263), (6, 1, 434, 0.305747641), (6, 2, 78, 0.29407356), (6,
    3, 495, 0.260575878), (6, 4, 312, 0.25504535), (6, 5, 352, 0.253825953),
    (7, 1, 329, 0.30511107), (7, 2, 220, 0.299404234), (7, 3, 18,
    0.285971033), (7, 4, 198, 0.25728906), (7, 5, 249, 0.256072669), (8, 1,
    20, 0.33007872), (8, 2, 385, 0.326576673), (8, 3, 190, 0.324203247), (8,
    4, 231, 0.323991642), (8, 5, 132, 0.309925118), (9, 1, 381,
    0.356691958), (9, 2, 107, 0.329678451), (9, 3, 261, 0.279712772), (9, 4,
    327, 0.259396181), (9, 5, 463, 0.25135449)
]

_GOLDEN_KCENTER = [
    (0, 0, None), (1, 310, 2739397382524), (2, 74, 2345896467560), (3, 334,
    2176590963739), (4, 357, 2088379479579), (5, 488, 2017794952065), (6,
    46, 1971757150549), (7, 174, 1948062058178)
]

_GOLDEN_COMPRESSION_SAMPLE = [
    (0, 128, 90, 0.703125), (25, 171, 107, 0.625730994), (50, 124, 88,
    0.709677419), (75, 224, 127, 0.566964286), (100, 476, 210, 0.441176471),
    (125, 347, 167, 0.481268012), (150, 82, 70, 0.853658537), (175, 473,
    210, 0.44397463), (200, 356, 162, 0.45505618), (225, 156, 106,
    0.679487179), (250, 193, 120, 0.621761658), (275, 371, 173,
    0.466307278), (300, 443, 189, 0.426636569), (325, 93, 72, 0.774193548),
    (350, 278, 148, 0.532374101), (375, 189, 114, 0.603174603), (400, 78,
    71, 0.91025641), (425, 200, 119, 0.595), (450, 211, 128, 0.606635071),
    (475, 360, 173, 0.480555556)
]

_GOLDEN_SKETCH_ROLLUP = [
    ('click', 30, 15, 15), ('error', 30, 15, 15), ('purchase', 30, 15, 15),
    ('signup', 30, 15, 15), ('view', 30, 15, 15)
]


def _ann_detail(spark, method):
    # round-10: the registered ann_*_topk are oracle-gated bound summaries;
    # the goldens pin the DETAIL probes (the panel surface the stage
    # persists) — values unchanged
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.datapipe.similarity import (
        ANN_METHODS,
    )

    return dict(ANN_METHODS)[method](spark, SF_SMOKE)


def test_golden_ann_ivf_rows(spark):
    got = sorted(
        (r.query_id, r.rank, r.neighbor_id, round(r.cos_sim, 9))
        for r in _ann_detail(spark, "ivf").collect()
    )
    assert got == _GOLDEN_ANN_IVF


def test_golden_ann_pq_rows(spark):
    got = sorted(
        (r.query_id, r.rank, r.neighbor_id, round(r.cos_sim, 9))
        for r in _ann_detail(spark, "pq").collect()
    )
    assert got == _GOLDEN_ANN_PQ


def test_golden_ann_ivfpq_rows(spark):
    got = sorted(
        (r.query_id, r.rank, r.neighbor_id, round(r.cos_sim, 9))
        for r in _ann_detail(spark, "ivfpq").collect()
    )
    assert got == _GOLDEN_ANN_IVFPQ


def test_golden_kcenter_rows(spark):
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.datapipe.similarity import (
        coreset_kcenter_detail,
    )

    got = sorted(
        (r["round"], r.vec_id, r.dist2_to_set)
        for r in coreset_kcenter_detail(spark, SF_SMOKE).collect()
    )
    assert got == _GOLDEN_KCENTER
    # registered (oracle-gated) surface: round universe + greedy invariants
    reg_rows = sorted(
        tuple(r) for r in load_all()["coreset_kcenter_sample"].fn(spark, SF_SMOKE).collect()
    )
    assert reg_rows == [(rnd, True, True, True) for rnd, _v, _d in sorted(_GOLDEN_KCENTER)]


def test_golden_compression_ratio_sample(spark):
    # every 25th doc_id (20 of 500): enough to pin the zlib level, the
    # byte-count convention, and the ratio arithmetic without a 500-row blob
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.datapipe.textstats import (
        doc_compression_ratio_detail,
    )

    got = sorted(
        (r.doc_id, r.n_bytes, r.n_compressed, round(r.ratio, 9))
        for r in doc_compression_ratio_detail(spark, SF_SMOKE).collect()
        if r.doc_id % 25 == 0
    )
    assert got == _GOLDEN_COMPRESSION_SAMPLE
    # registered (oracle-gated) surface: byte conservation + codec bounds
    reg = {
        r.doc_id: tuple(r)
        for r in load_all()["doc_compression_ratio"].fn(spark, SF_SMOKE).collect()
        if r.doc_id % 25 == 0
    }
    assert reg == {d: (d, nb, True, True) for d, nb, _nc, _r in got}


def test_golden_sketch_rollup_rows(spark):
    # the raw-estimate surface moved to sketch_rollup_detail in round 9
    # (the registered query now exposes the oracle-checkable bound form);
    # the golden pins the DETAIL values — same computation, same numbers
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.operators.analytics import (
        sketch_rollup_detail,
    )

    got = sorted(
        (r.event_type, r.n_days, r.distinct_users_est, r.distinct_users_exact)
        for r in sketch_rollup_detail(spark, SF_SMOKE).collect()
    )
    assert got == _GOLDEN_SKETCH_ROLLUP
    reg = sorted(
        (r.event_type, r.n_days, r.distinct_users_exact, r.est_within_tol)
        for r in load_all()["daily_distinct_users_sketch_rollup"].fn(spark, SF_SMOKE).collect()
    )
    assert reg == [(et, nd, ex, True) for et, nd, _est, ex in _GOLDEN_SKETCH_ROLLUP]
