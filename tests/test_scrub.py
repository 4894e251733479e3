"""Semantics tests for the corpus-hygiene operators (PII scrub, repetition
gate, contamination sweep, sequence packing) beyond their DuckDB oracles."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.datapipe.scrub import (
    PACK_TOKEN_BUDGET,
    q_contamination,
    q_doc_repetition,
    q_pack_sequences,
    q_pii_scrub,
    scrub_pii,
)

from .conftest import SF_SMOKE


def test_scrub_pii_redacts_email_and_phone(spark):
    df = spark.createDataFrame(
        [
            (1, "mail alice.smith+x@corp.example.org now"),
            (2, "call +555-0123-4567 tomorrow"),
            (3, "nothing sensitive here"),
        ],
        "id long, s string",
    )
    got = {r["id"]: r["c"] for r in df.select("id", scrub_pii("s").alias("c")).collect()}
    assert got[1] == "mail <EMAIL> now"
    assert got[2] == "call <PHONE> tomorrow"
    assert got[3] == "nothing sensitive here"


def test_pii_scrub_query_fires_on_every_doc(spark):
    out = q_pii_scrub(spark, SF_SMOKE)
    assert out.filter(~F.col("had_email") | ~F.col("had_phone")).count() == 0
    leftovers = out.filter(
        F.col("clean_text").contains("@example.com") | F.col("clean_text").rlike(r"\+555-")
    )
    assert leftovers.count() == 0  # every injected PII string was redacted


def test_repetition_score_known_doc(spark):
    # "a b a b a" → bigrams [a b, b a, a b, b a]: 4 total, 2 distinct → 0.5
    docs = spark.createDataFrame([(1, "a b a b a")], "doc_id long, text string")
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.functions.text import (
        shingles_col,
        tokens_col,
    )

    row = (
        docs.select("doc_id", tokens_col("text").alias("toks"))
        .select("doc_id", shingles_col("toks", 2).alias("grams"))
        .select(
            (F.lit(1.0) - F.size(F.array_distinct("grams")).cast("double") / F.size("grams")).alias(
                "dup_frac"
            )
        )
        .collect()[0]
    )
    assert row["dup_frac"] == 0.5


def test_repetition_gate_splits_corpus(spark):
    out = q_doc_repetition(spark, SF_SMOKE)
    n = out.count()
    assert n > 0
    kept = out.filter("keep").count()
    assert 0 < kept <= n  # the gate keeps most docs and the verdict is total


def test_contamination_flags_only_cross_split_pairs(spark):
    out = q_contamination(spark, SF_SMOKE).collect()
    for r in out:
        assert r["train_doc_id"] % 97 != 0
        assert r["eval_doc_id"] % 97 == 0
        assert r["n_common"] >= 3


def test_pack_sequences_invariants(spark):
    rows = q_pack_sequences(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0 <= r["seq_offset"] < PACK_TOKEN_BUDGET
        assert r["first_seq"] <= r["last_seq"]
    # per source: doc spans tile the token stream with no gaps or overlaps
    by_source: dict = {}
    for r in rows:
        by_source.setdefault(r["source"], []).append(r)
    for source, docs in by_source.items():
        docs.sort(key=lambda r: r["doc_id"])
        cum = 0
        for r in docs:
            assert r["first_seq"] == cum // PACK_TOKEN_BUDGET
            assert r["seq_offset"] == cum % PACK_TOKEN_BUDGET
            cum += r["n_tokens"]
            assert r["last_seq"] == (cum - 1) // PACK_TOKEN_BUDGET


def test_curate_pack_composes_all_gates(spark):
    """curate_pack survivors = curated manifest ∩ repetition-keep −
    eval-split − contaminated, and the packed spans tile per source."""
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.datapipe.curate import (
        q_curate,
        q_curate_pack,
    )

    packed = q_curate_pack(spark, SF_SMOKE).collect()
    assert packed
    manifest_ids = {r["doc_id"] for r in q_curate(spark, SF_SMOKE).collect()}
    contaminated = {r["train_doc_id"] for r in q_contamination(spark, SF_SMOKE).collect()}
    kept = {r["doc_id"] for r in q_doc_repetition(spark, SF_SMOKE).collect() if r["keep"]}
    for r in packed:
        assert r["doc_id"] in manifest_ids
        assert r["doc_id"] % 97 != 0
        assert r["doc_id"] not in contaminated
        assert r["doc_id"] in kept
        assert 0 <= r["seq_offset"] < PACK_TOKEN_BUDGET
