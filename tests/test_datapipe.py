"""Semantic tests for the dedup / similarity extensions: the approximate
(scale-path) operators are validated against their exact ground truths."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.datapipe.dedup import (
    JACCARD_THRESHOLD,
    jaccard_pairs,
    dedup_simhash_detail,
    minhash_lsh_detail,
    q_neardup_jaccard,
    shingle_sets,
)
from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.datapipe.similarity import (
    TOP_K,
    ivf_topk_detail,
    lsh_topk_detail,
    q_ann_cosine_topk,
)

from .conftest import SF_SMOKE


def _pairs(df):
    return {(r["doc_a"], r["doc_b"]) for r in df.collect()}


def test_minhash_lsh_vs_exact_jaccard(spark):
    """LSH candidates are verified exactly, so: no false positives, and
    high-similarity pairs (j≥0.95) must all be found."""
    exact = q_neardup_jaccard(spark, SF_SMOKE)
    lsh = minhash_lsh_detail(spark, SF_SMOKE)
    exact_pairs = _pairs(exact)
    lsh_pairs = _pairs(lsh)
    assert lsh_pairs <= exact_pairs  # exact verification kills false positives
    strong = _pairs(exact.filter(F.col("jaccard") >= 0.95))
    assert strong <= lsh_pairs  # identical/near-identical docs never missed
    if exact_pairs:
        recall = len(lsh_pairs) / len(exact_pairs)
        assert recall >= 0.8, f"LSH recall {recall:.2f} too low"


def test_exact_duplicates_have_identical_simhash(spark):
    """Documents with jaccard 1.0 shingle sets must collide in simhash
    (hamming 0) and therefore be reported."""
    exact = q_neardup_jaccard(spark, SF_SMOKE)
    identical = _pairs(exact.filter(F.col("jaccard") >= 1.0))
    sim = dedup_simhash_detail(spark, SF_SMOKE)
    sim_pairs = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in sim.collect()}
    for pair in identical:
        assert pair in sim_pairs and sim_pairs[pair] == 0


def test_jaccard_pairs_small_known_case(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c d e"),
            (2, "a b c d e"),  # identical → j=1.0
            (3, "a b c d x"),  # shingles {abc,bcd,cdx} vs {abc,bcd,cde}: j=0.5
            (4, "zz yy xx ww vv"),
        ],
        ["doc_id", "text"],
    )
    out = jaccard_pairs(shingle_sets(docs), 0.99)
    assert _pairs(out) == {(1, 2)}
    out_low = jaccard_pairs(shingle_sets(docs), 0.5)
    assert _pairs(out_low) == {(1, 2), (1, 3), (2, 3)}


def test_lsh_topk_results_are_true_cosine_order(spark):
    """Within returned candidates the ranking must agree with brute force:
    every LSH hit at rank r has cosine ≤ the brute-force rank-r hit."""
    brute = {
        (r["query_id"], r["rank"]): r["cos_sim"]
        for r in q_ann_cosine_topk(spark, SF_SMOKE).collect()
    }
    lsh_rows = lsh_topk_detail(spark, SF_SMOKE).collect()
    assert lsh_rows, "LSH returned nothing"
    for r in lsh_rows:
        key = (r["query_id"], r["rank"])
        if key in brute:
            assert r["cos_sim"] <= brute[key] + 1e-12
    # and each query returns at most TOP_K rows
    per_q = {}
    for r in lsh_rows:
        per_q[r["query_id"]] = per_q.get(r["query_id"], 0) + 1
    assert max(per_q.values()) <= TOP_K


def test_curate_pipeline_invariants(spark):
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.datapipe.curate import (
        MAX_TOKENS,
        MIN_TOKENS,
        TARGET_LANG,
        q_curate,
    )

    rows = q_curate(spark, SF_SMOKE).collect()
    assert rows, "curation emptied the corpus"
    fingerprints = [r["fingerprint"] for r in rows]
    assert len(fingerprints) == len(set(fingerprints)), "dedup stage leaked duplicates"
    for r in rows:
        assert r["predicted_lang"] == TARGET_LANG
        assert MIN_TOKENS <= r["n_tokens"] <= MAX_TOKENS
        assert r["n_bpe_tokens"] >= r["n_tokens"] >= 1


def test_ivf_topk_recall_vs_brute_force(spark):
    """Probing IVF_NPROBE of IVF_LISTS centroid lists must recover a usable
    fraction of the true top-k (random synthetic vectors cluster weakly, so
    the bar is recall ≥ nprobe/lists with margin, not ≥ 0.9)."""
    brute = {
        (r["query_id"], r["neighbor_id"]) for r in q_ann_cosine_topk(spark, SF_SMOKE).collect()
    }
    ivf_rows = ivf_topk_detail(spark, SF_SMOKE).collect()
    assert ivf_rows, "IVF returned nothing"
    ivf = {(r["query_id"], r["neighbor_id"]) for r in ivf_rows}
    recall = len(ivf & brute) / len(brute)
    assert recall >= 0.3, f"IVF recall {recall:.2f} too low"
    per_q = {}
    for r in ivf_rows:
        per_q[r["query_id"]] = per_q.get(r["query_id"], 0) + 1
    assert max(per_q.values()) <= TOP_K


def test_embedding_lsh_vs_exact_cosine(spark):
    """The LSH-bucketed embedding near-dup path verifies candidates with the
    same exact quantized cosine as the all-pairs truth, so: no false
    positives, and recall against the ground truth clears the OR-amplified
    design bar (12 tables × 4 bits ≈ 0.9 at the 0.45 threshold)."""
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.datapipe.dedup import (
        embedding_lsh_detail,
        q_neardup_embedding,
    )

    truth = {
        (r["vec_a"], r["vec_b"]): r["cos_sim"]
        for r in q_neardup_embedding(spark, SF_SMOKE).collect()
    }
    approx = {
        (r["vec_a"], r["vec_b"]): r["cos_sim"]
        for r in embedding_lsh_detail(spark, SF_SMOKE).collect()
    }
    assert truth, "ground truth empty — threshold/fixture drifted"
    assert set(approx) <= set(truth)  # exact verify kills false positives
    for pair, sim in approx.items():
        assert sim == truth[pair]  # identical quantized-cosine arithmetic
    recall = len(approx) / len(truth)
    assert recall >= 0.7, f"embedding LSH recall {recall:.2f} too low"


def test_minmax_constant_group_yields_true_nulls(spark):
    """A constant group must produce NULL norm_value (SQL CASE semantics),
    not NaN — NaN vs NULL is a latent cross-engine hash mismatch (the Arrow
    float64 path silently turns None into NaN; the nullable Float64 path
    does not)."""
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.datapipe.normalize import (
        minmax_normalize,
    )

    df = spark.createDataFrame(
        [(1, 10, 5.0), (2, 10, 5.0), (3, 20, 1.0), (4, 20, 3.0)],
        "event_id long, user_id long, value double",
    )
    rows = {r["event_id"]: r["norm_value"] for r in minmax_normalize(df).collect()}
    assert rows[1] is None and rows[2] is None  # constant group: true NULLs
    assert rows[3] == 0.0 and rows[4] == 1.0


def test_minmax_grouped_map_matches_window_form(spark):
    """The applyInPandas escape hatch and the registered window plan must be
    bit-identical (same IEEE subtraction/division on the same values), so
    swapping forms is purely a physical-plan decision."""
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.datapipe.normalize import (
        minmax_normalize,
        minmax_normalize_window,
    )
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.sources import load_table

    from .conftest import SF_SMOKE

    ev = load_table(spark, SF_SMOKE, "events").select("event_id", "user_id", "value")
    gm = {r["event_id"]: r["norm_value"] for r in minmax_normalize(ev).collect()}
    win = {r["event_id"]: r["norm_value"] for r in minmax_normalize_window(ev).collect()}
    assert gm == win


def test_lsh_candidate_pairs_respects_bands_param(spark):
    """bands != default must band the signature consistently (regression:
    the stacked explode iterated the module constant, so bands<8 raised on
    missing columns and bands>8 silently ignored the extra bands)."""
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.datapipe.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        shingle_sets,
    )
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.sources import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    sig = minhash_signatures(shingle_sets(docs))
    for bands in (4, 16):
        pairs = lsh_candidate_pairs(sig, bands=bands)
        assert pairs.columns == ["doc_a", "doc_b"]
        pairs.limit(1).collect()  # executes the banded plan


def test_prefix_filter_equals_ground_truth_jaccard(spark):
    """Prefix filtering is EXACT: its pair set and jaccard values must
    equal the all-pairs ground truth bit-for-bit (same output contract,
    same oracle)."""
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.registry import load_all

    reg = load_all()
    truth = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in reg["neardup_jaccard_pairs"].fn(spark, SF_SMOKE).collect()
    }
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in reg["neardup_prefix_filter"].fn(spark, SF_SMOKE).collect()
    }
    assert got == truth


# --- sf0.001 golden rows for queries with no SQL oracle -----------------------
#
# The driver's hash gate never covers these (LSH banding / sketches have no
# SQL form; the driver records rows-only), so their correctness rests on the
# recall/invariant pytest pins — which a refactor that silently changes the
# banding geometry, hash seed, or candidate-verify threshold could satisfy
# while changing every emitted row.  These goldens pin the EXACT output at
# sf0.001 (deterministic: seeded hyperplanes, md5/xxhash term hashing,
# quantized-integer cosine with pinned tie order; all partition-count
# independent — regenerate only on a deliberate semantic change).

_GOLDEN_MINHASH = [
    (0, 50, 0.952380952), (0, 82, 0.954545455), (5, 450, 0.975609756),
    (8, 12, 0.973684211), (8, 120, 0.986486486), (8, 360, 0.986666667),
    (12, 120, 0.960526316), (12, 360, 0.986842105), (16, 369, 0.988235294),
    (26, 176, 0.988505747), (33, 436, 0.888888889), (45, 487, 0.964285714),
    (50, 82, 0.909090909), (56, 157, 0.981481481), (77, 459, 0.987179487),
    (89, 114, 0.928571429), (99, 174, 0.988095238), (110, 467, 0.989130435),
    (119, 425, 0.971428571), (120, 360, 0.973333333), (144, 161, 0.988636364),
    (211, 404, 0.984615385), (229, 263, 0.956521739), (260, 391, 0.988764045),
    (270, 329, 0.988095238), (328, 428, 0.974358974), (349, 411, 0.980769231),
    (474, 498, 0.989361702),
]

_GOLDEN_SIMHASH = [
    (8, 12, 1), (8, 120, 2), (8, 360, 1), (12, 120, 3), (12, 360, 0),
    (16, 369, 3), (26, 176, 2), (56, 157, 2), (77, 459, 2), (99, 174, 1),
    (120, 360, 3), (144, 161, 1), (211, 404, 3), (260, 391, 1), (270, 329, 2),
    (328, 428, 2), (474, 498, 1),
]

_GOLDEN_ANN_LSH = [
    (0, 1, 225, 0.315127956), (0, 2, 483, 0.300451758), (0, 3, 73, 0.297238655),
    (0, 4, 212, 0.28139979), (0, 5, 347, 0.274508254),
    (1, 1, 257, 0.39176277), (1, 2, 129, 0.351480878), (1, 3, 376, 0.304812114),
    (1, 4, 183, 0.246153288), (1, 5, 208, 0.236210016),
    (2, 1, 62, 0.28999639), (2, 2, 246, 0.289768502), (2, 3, 234, 0.277687619),
    (2, 4, 441, 0.253965886), (2, 5, 488, 0.238606354),
    (3, 1, 223, 0.340916724), (3, 2, 212, 0.319721647), (3, 3, 426, 0.315099065),
    (3, 4, 72, 0.308942252), (3, 5, 380, 0.219033986),
    (4, 1, 345, 0.374941548), (4, 2, 57, 0.298747666), (4, 3, 357, 0.295447367),
    (4, 4, 229, 0.267757516), (4, 5, 472, 0.266340895),
    (5, 1, 113, 0.364432515), (5, 2, 118, 0.273542276), (5, 3, 143, 0.236488257),
    (5, 4, 109, 0.224228697), (5, 5, 219, 0.221852311),
    (6, 1, 78, 0.29407356), (6, 2, 467, 0.264865289), (6, 3, 444, 0.256030481),
    (6, 4, 486, 0.235413933), (6, 5, 438, 0.210513923),
    (7, 1, 466, 0.324004385), (7, 2, 18, 0.285971033), (7, 3, 198, 0.25728906),
    (7, 4, 249, 0.256072669), (7, 5, 341, 0.252291434),
    (8, 1, 20, 0.33007872), (8, 2, 385, 0.326576673), (8, 3, 61, 0.249005673),
    (8, 4, 209, 0.247477026), (8, 5, 407, 0.240301085),
    (9, 1, 107, 0.329678451), (9, 2, 216, 0.272537392), (9, 3, 327, 0.259396181),
    (9, 4, 314, 0.250929141), (9, 5, 305, 0.236176418),
]

_GOLDEN_HEAVY_HITTERS = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
]


def test_golden_minhash_lsh_rows(spark):
    got = sorted(
        (r.doc_a, r.doc_b, round(r.jaccard, 9))
        for r in minhash_lsh_detail(spark, SF_SMOKE).collect()
    )
    assert got == _GOLDEN_MINHASH


def test_golden_simhash_rows(spark):
    got = sorted(
        (r.doc_a, r.doc_b, r.hamming) for r in dedup_simhash_detail(spark, SF_SMOKE).collect()
    )
    assert got == _GOLDEN_SIMHASH


def test_golden_ann_lsh_rows(spark):
    got = sorted(
        (r.query_id, r.rank, r.neighbor_id, round(r.cos_sim, 9))
        for r in lsh_topk_detail(spark, SF_SMOKE).collect()
    )
    assert got == _GOLDEN_ANN_LSH


def test_golden_heavy_hitter_terms(spark):
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.datapipe.textstats import (
        approx_heavy_hitters_detail,
    )
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.registry import load_all

    got = sorted(r.term for r in approx_heavy_hitters_detail(spark, SF_SMOKE).collect())
    assert got == _GOLDEN_HEAVY_HITTERS
    # registered (oracle-gated) surface: superset guarantee holds
    rows = load_all()["approx_heavy_hitter_terms"].fn(spark, SF_SMOKE).collect()
    assert len(rows) == 1 and rows[0].true_heavy_all_found is True


def test_ann_bound_summaries_all_methods(spark):
    """Registered ann_*_topk surfaces (round-10 oracle-ization): one row
    per panel query, exact k counts on both sides, and the corpus-mean
    recall floor boolean TRUE for every tier at the smoke scale."""
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.datapipe.similarity import (
        ANN_MEAN_RECALL_FLOORS,
        N_QUERIES,
    )
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.registry import load_all

    reg = load_all()
    for method in ANN_MEAN_RECALL_FLOORS:
        rows = reg[f"ann_{method}_topk"].fn(spark, SF_SMOKE).collect()
        assert len(rows) == N_QUERIES, method
        assert {r.query_id for r in rows} == set(range(N_QUERIES)), method
        for r in rows:
            assert r.n_results == TOP_K and r.n_true == TOP_K, (method, r)
            assert r.mean_recall_ge_floor is True, (method, r)


def test_scaled_ann_knobs_formula():
    """Scale-aware probe knobs (round-10): equal to the pinned constants
    at and below the calibration corpus, monotonically non-decreasing,
    nprobe capped at the list count, and at the sf100 receipt's 2M-vector
    point large enough to matter (the values the --ann --deep100 sweep
    measures against the sf10 floors)."""
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.datapipe.similarity import (
        ANN_KNOB_BASE_N,
        IVF_LISTS,
        IVF_NPROBE,
        PQ_SHORTLIST,
        scaled_ann_knobs,
    )

    for n in (1, 100, ANN_KNOB_BASE_N):
        k = scaled_ann_knobs(n)
        assert k["nprobe"] == IVF_NPROBE and k["shortlist_mult"] == PQ_SHORTLIST, n
    prev = scaled_ann_knobs(1)
    for n in (2_048, 20_000, 200_000, 2_000_000, 2 * 10 ** 9):
        k = scaled_ann_knobs(n)
        assert k["nprobe"] >= prev["nprobe"]
        assert k["shortlist_mult"] >= prev["shortlist_mult"]
        assert k["nprobe"] <= IVF_LISTS
        prev = k
    two_m = scaled_ann_knobs(2_000_000)
    assert two_m["nprobe"] >= 8 and two_m["shortlist_mult"] >= 4 * PQ_SHORTLIST


def test_registered_ann_path_defaults_to_scaled_knobs(spark):
    """Round-11: ``scaled_ann_knobs`` is the REGISTERED default, not an
    opt-in sweep path — the knob parameters of every tunable detail fn
    default to None and resolve from the corpus count (a revert to
    hardcoded pinned constants flips the default back to the path the
    sf100 receipt showed decaying).  Behavioral receipt: at calibration
    scale the default-path panel is row-identical to an explicit
    pinned-knob probe (which is why every golden and driver hash was
    unchanged by the switch)."""
    import inspect

    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.datapipe.similarity import (
        IVF_NPROBE,
        ivf_topk_detail,
        ivfpq_topk_detail,
        pq_topk_detail,
        scaled_ann_knobs,
    )

    for fn, params in (
        (ivf_topk_detail, ("nprobe",)),
        (pq_topk_detail, ("shortlist_mult",)),
        (ivfpq_topk_detail, ("nprobe", "shortlist_mult")),
    ):
        sig = inspect.signature(fn)
        for p in params:
            assert sig.parameters[p].default is None, (fn.__name__, p)
    # 500-vector corpus → scaled == pinned → identical panels
    assert scaled_ann_knobs(500)["nprobe"] == IVF_NPROBE
    default_rows = sorted(map(tuple, ivf_topk_detail(spark, SF_SMOKE).collect()))
    pinned_rows = sorted(map(tuple, ivf_topk_detail(spark, SF_SMOKE, nprobe=IVF_NPROBE).collect()))
    assert default_rows == pinned_rows and default_rows
