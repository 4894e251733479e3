"""Semantics tests for the round-3 curation operators: incremental dedup,
per-source quotas, quality scoring/deciles, content-defined chunking."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.datapipe.dedup import (
    INCR_MOD,
    q_incremental_dedup,
)
from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.datapipe.scrub import (
    SOURCE_QUOTA,
    q_source_quota_sample,
)
from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.datapipe.textstats import (
    q_cdc_chunk_docs,
    q_quality_deciles,
    q_quality_model_score,
)
from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.functions.text import (
    normalize_text,
)
from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.sources import load_table

from .conftest import SF_SMOKE


def test_incremental_dedup_excludes_existing_and_batch_dupes(spark):
    feat = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", F.md5(normalize_text("text")).alias("fingerprint")
    )
    existing = {
        r["fingerprint"]
        for r in feat.filter(F.col("doc_id") % INCR_MOD != 0).collect()
    }
    survivors = q_incremental_dedup(spark, SF_SMOKE).collect()
    assert survivors
    fps = [r["fingerprint"] for r in survivors]
    assert len(fps) == len(set(fps))  # at most one survivor per fingerprint
    assert not (set(fps) & existing)  # nothing already in the standing corpus
    for r in survivors:
        assert r["doc_id"] % INCR_MOD == 0  # survivors come from the batch


def test_source_quota_caps_and_is_deterministic(spark):
    rows = q_source_quota_sample(spark, SF_SMOKE).collect()
    per_source: dict[str, list] = {}
    for r in rows:
        per_source.setdefault(r["source"], []).append(r["rank_in_source"])
    totals = {
        r["source"]: r["n"]
        for r in load_table(spark, SF_SMOKE, "documents")
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for src, ranks in per_source.items():
        assert len(ranks) == min(SOURCE_QUOTA, totals[src])
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
    again = {(r["doc_id"], r["source"]) for r in q_source_quota_sample(spark, SF_SMOKE).collect()}
    assert again == {(r["doc_id"], r["source"]) for r in rows}


def test_quality_score_softsign_bounds_and_verdict(spark):
    rows = q_quality_model_score(spark, SF_SMOKE).collect()
    assert rows
    assert any(r["keep"] for r in rows) and any(not r["keep"] for r in rows)
    for r in rows:
        assert -1.0 < r["prob"] < 1.0
        assert r["keep"] == (r["score"] >= 0)
        assert (r["prob"] >= 0) == (r["score"] >= 0)


def test_quality_deciles_balanced_within_language(spark):
    rows = q_quality_deciles(spark, SF_SMOKE).collect()
    per_lang: dict[str, dict[int, int]] = {}
    for r in rows:
        per_lang.setdefault(r["lang"], {}).setdefault(r["decile"], 0)
        per_lang[r["lang"]][r["decile"]] += 1
    for lang, counts in per_lang.items():
        if sum(counts.values()) >= 10:
            assert set(counts) == set(range(1, 11))
            assert max(counts.values()) - min(counts.values()) <= 1  # ntile balance
    buckets = {r["decile"]: r["bucket"] for r in rows}
    for d, b in buckets.items():
        assert b == ("head" if d <= 3 else "middle" if d <= 7 else "tail")


def test_cdc_chunks_reconstruct_document(spark):
    """Concatenating a doc's chunks in chunk order must reproduce its
    normalized text exactly (chunking is a partition, not a sample)."""
    chunks = q_cdc_chunk_docs(spark, SF_SMOKE)
    rebuilt = (
        chunks.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("chunk_id", "chunk_text"))),
                    lambda x: x["chunk_text"],
                ),
                " ",
            ).alias("rebuilt")
        )
    )
    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", normalize_text("text").alias("norm")
    )
    bad = rebuilt.join(docs, "doc_id").filter(F.col("rebuilt") != F.col("norm")).count()
    assert bad == 0


def test_cdc_chunking_is_shift_resistant(spark):
    """Insert one token mid-document: chunk hashes before AND after the edit
    point must survive unchanged — the shift-resistance property a
    fixed-width (every-16-tokens) chunking lacks, and the reason CDC chunk
    hashes work as cross-snapshot dedup keys."""
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.datapipe.textstats import (
        cdc_chunks,
    )

    base = [f"w{i}" for i in range(200)]
    edited = base[:100] + ["inserted"] + base[100:]
    toked = spark.createDataFrame(
        [(1, base), (2, edited)], "doc_id long, toks array<string>"
    )
    per_doc: dict[int, set] = {1: set(), 2: set()}
    for r in cdc_chunks(toked).collect():
        per_doc[r["doc_id"]].add(r["chunk_hash"])
    # the edit invalidates at most 2 chunks per side (the edited chunk, or
    # the two halves if the inserted token is itself a boundary)
    assert len(per_doc[1] - per_doc[2]) <= 2
    assert len(per_doc[2] - per_doc[1]) <= 2
    assert len(per_doc[1] & per_doc[2]) >= len(per_doc[1]) - 2


def test_packing_efficiency_waste_is_one_tail_per_source(spark):
    """Concat-and-chunk packs densely: the only padding a source can carry
    is the tail of its LAST sequence, so padding_tokens < budget and the
    capacity identity n_sequences·budget = total + padding must hold
    exactly; consistency with the packed manifest it audits is pinned by
    recomputing the inputs from curate_pack_corpus."""
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.datapipe.scrub import (
        PACK_TOKEN_BUDGET,
    )
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.registry import load_all

    reg = load_all()
    rows = reg["packing_efficiency_by_source"].fn(spark, SF_SMOKE).collect()
    assert rows
    packed = reg["curate_pack_corpus"].fn(spark, SF_SMOKE).toPandas()
    for r in rows:
        assert 0 < r["fill_rate"] <= 1.0
        assert 0 <= r["padding_tokens"] < PACK_TOKEN_BUDGET
        assert r["n_sequences"] * PACK_TOKEN_BUDGET == r["total_tokens"] + r["padding_tokens"]
        assert 0.0 <= r["split_doc_share"] <= 1.0
        src = packed[packed.source == r["source"]]
        assert r["n_docs"] == len(src)
        assert r["total_tokens"] == int(src.n_tokens.sum())
        assert r["n_sequences"] == int(src.last_seq.max()) + 1


def test_length_bucketed_batches_invariants(spark):
    from collections import defaultdict

    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.datapipe.curate import (
        BATCH_SIZE,
        LENGTH_BUCKET_WIDTH,
        q_length_bucketed_batches,
    )

    rows = q_length_bucketed_batches(spark, SF_SMOKE).collect()
    assert len(rows) == 500  # every document is assigned, none dropped
    batches = defaultdict(list)
    for r in rows:
        assert r.bucket == r.n_tokens // LENGTH_BUCKET_WIDTH
        assert r.pad_tokens >= 0
        batches[(r.bucket, r.batch_id)].append(r)
    for members in batches.values():
        assert len(members) <= BATCH_SIZE
        assert sorted(m.pos_in_batch for m in members) == list(range(len(members)))
        mx = max(m.n_tokens for m in members)
        for m in members:
            # pad to the batch max only — the length-grouping win
            assert m.pad_tokens == mx - m.n_tokens
            assert m.pad_tokens < LENGTH_BUCKET_WIDTH  # bucket bounds the pad


def test_preference_pairs_invariants(spark):
    from collections import Counter

    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.datapipe.curate import (
        q_preference_pairs_by_source,
    )
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.registry import load_all

    rows = q_preference_pairs_by_source(spark, SF_SMOKE).collect()
    assert rows
    # chosen are keep verdicts, rejected are drops -> margin strictly positive
    assert all(r.margin > 0 for r in rows)
    # no document appears in two pairs (either side)
    used = [r.chosen_doc_id for r in rows] + [r.rejected_doc_id for r in rows]
    assert len(used) == len(set(used))
    # pair count per source = min(|keep|, |drop|)
    verdicts = {
        r.doc_id: r.keep for r in load_all()["quality_model_score"].fn(spark, SF_SMOKE).collect()
    }
    import duckdb  # only for reading the source column cheaply

    src = dict(
        duckdb.connect().execute(
            f"SELECT doc_id, source FROM read_parquet('{SF_SMOKE}/documents.parquet')"
        ).fetchall()
    )
    keep_n, drop_n, pair_n = Counter(), Counter(), Counter()
    for d, k in verdicts.items():
        (keep_n if k else drop_n)[src[d]] += 1
    for r in rows:
        pair_n[r.source] += 1
    for s in set(keep_n) | set(drop_n):
        assert pair_n[s] == min(keep_n[s], drop_n[s]), s


def test_filtered_topk_respects_label_constraint(spark):
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.datapipe.similarity import (
        TOP_K,
        q_ann_filtered_topk,
    )
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.sources import load_table

    labels = {
        r.vec_id: r.label for r in load_table(spark, SF_SMOKE, "embeddings").collect()
    }
    rows = q_ann_filtered_topk(spark, SF_SMOKE).collect()
    per_query = {}
    for r in rows:
        assert labels[r.neighbor_id] == labels[r.query_id]  # the WHERE clause holds
        per_query.setdefault(r.query_id, []).append(r.rank)
    for q, ranks in per_query.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= TOP_K
