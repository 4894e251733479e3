"""Round-7 operator tests: the suffix-array (dyadic doubling) dedup tier.

Constructed-corpus checks pin the SEMANTICS (which dyadic lengths read as
duplicated, what the longest-duplicate extraction returns) independently of
the DuckDB oracle, which replays the same md5 chain and would agree with a
consistently-wrong recursion.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.datapipe.dedup import (
    SA_BASE,
    SA_LEVELS,
    _dyadic_hash_frame,
)


def _doc_frame(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).select("doc_id", F.col("text"))


def test_dyadic_levels_detect_exact_shared_substring(spark):
    # two documents share a 32-token run; everything else is unique filler
    shared = " ".join(f"s{i}" for i in range(32))
    fill_a = " ".join(f"a{i}" for i in range(40))
    fill_b = " ".join(f"b{i}" for i in range(40))
    feat = _doc_frame(spark, [f"{fill_a} {shared}", f"{shared} {fill_b}"])
    lv = _dyadic_hash_frame(feat)
    dup = (
        lv.groupBy("lvl", "h").count().filter(F.col("count") >= 2)
        .groupBy("lvl").count().collect()
    )
    dup_levels = {r["lvl"] for r in dup}
    # a 32-token shared run contains duplicated windows at win_len 4..32
    # (levels 0..3) and cannot contain a 64-token (level 4) duplicate
    assert dup_levels == {0, 1, 2, 3}


def test_dyadic_hash_is_content_keyed_across_positions(spark):
    # the same text at DIFFERENT offsets in different docs must collide:
    # level hashes depend on window content only, never on position
    shared = " ".join(f"t{i}" for i in range(SA_BASE))
    feat = _doc_frame(spark, [f"x1 x2 x3 {shared}", f"{shared} y1 y2"])
    lv = _dyadic_hash_frame(feat).filter(F.col("lvl") == 0)
    top = lv.groupBy("h").count().agg(F.max("count")).collect()[0][0]
    assert top == 2


def test_longest_duplicates_returns_deepest_bracket(spark, tmp_path):
    # registry-level check on real testdata: every row sits at ONE win_len
    # (the deepest duplicated level), text length matches the bracket, and
    # the example location really contains the reported text
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.registry import load_all

    reg = load_all()
    rows = reg["sa_longest_duplicates"].fn(spark, "/root/testdata/sf0.001").collect()
    assert rows, "synthetic corpus has exact duplicate docs, so duplicates exist"
    win_lens = {r["win_len"] for r in rows}
    assert len(win_lens) == 1
    wl = win_lens.pop()
    assert wl in {SA_BASE * 2**j for j in range(SA_LEVELS)}
    for r in rows[:5]:
        assert len(r["dup_text"].split(" ")) == wl
    prof = {
        r["win_len"]: r["n_distinct_dup_texts"]
        for r in reg["sa_duplicate_length_profile"].fn(spark, "/root/testdata/sf0.001").collect()
    }
    # the longest query's level is the profile's max duplicated length,
    # and its row count equals that level's distinct-text count
    assert wl == max(prof)
    assert len(rows) == prof[wl]
