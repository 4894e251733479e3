"""Semantic tests for the dedup / similarity extensions: the approximate
(scale-path) operators are validated against their exact ground truths."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.datapipe.dedup import (
    JACCARD_THRESHOLD,
    jaccard_pairs,
    q_dedup_simhash,
    q_neardup_jaccard,
    q_neardup_minhash,
    shingle_sets,
)
from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.datapipe.similarity import (
    TOP_K,
    q_ann_cosine_topk,
    q_ann_ivf_topk,
    q_ann_lsh_topk,
)

from .conftest import SF_SMOKE


def _pairs(df):
    return {(r["doc_a"], r["doc_b"]) for r in df.collect()}


def test_minhash_lsh_vs_exact_jaccard(spark):
    """LSH candidates are verified exactly, so: no false positives, and
    high-similarity pairs (j≥0.95) must all be found."""
    exact = q_neardup_jaccard(spark, SF_SMOKE)
    lsh = q_neardup_minhash(spark, SF_SMOKE)
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
    sim = q_dedup_simhash(spark, SF_SMOKE)
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
    lsh_rows = q_ann_lsh_topk(spark, SF_SMOKE).collect()
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
    ivf_rows = q_ann_ivf_topk(spark, SF_SMOKE).collect()
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
        q_neardup_embedding,
        q_neardup_embedding_lsh,
    )

    truth = {
        (r["vec_a"], r["vec_b"]): r["cos_sim"]
        for r in q_neardup_embedding(spark, SF_SMOKE).collect()
    }
    approx = {
        (r["vec_a"], r["vec_b"]): r["cos_sim"]
        for r in q_neardup_embedding_lsh(spark, SF_SMOKE).collect()
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
