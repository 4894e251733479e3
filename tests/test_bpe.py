"""Distributed BPE induction vs a pure-Python reference implementation:
the learned merge sequence must be identical (same greedy objective, same
pinned tie policy)."""

from __future__ import annotations

from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.datapipe.bpe import (
    learn_bpe_merges,
    bpe_learn_merges_detail,
    word_frequencies,
)
from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.sources import load_table

from .conftest import SF_SMOKE


def ref_bpe(word_freqs: dict[str, int], n_merges: int) -> list[tuple[str, str, int]]:
    """Textbook in-memory BPE (Sennrich et al.): greedy best-pair merges
    over a word-frequency table, leftmost-first non-overlapping fusion,
    ties to the lexicographically smallest (left, right)."""
    table = [(list(w), f) for w, f in word_freqs.items()]
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for sym, f in table:
            for i in range(len(sym) - 1):
                counts[(sym[i], sym[i + 1])] = counts.get((sym[i], sym[i + 1]), 0) + f
        if not counts:
            break
        (left, right), freq = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((left, right, freq))
        new_table = []
        for sym, f in table:
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == left and sym[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_table.append((out, f))
        table = new_table
    return merges


def test_bpe_classic_example(spark):
    """The Sennrich toy vocabulary: first merges must be (e,s) then (es,t)
    — highest weighted pair counts with the lexicographic tiebreak."""
    words = spark.createDataFrame(
        [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)], "word string, freq long"
    )
    merges = learn_bpe_merges(words, 4)
    got = [(m["left"], m["right"], m["pair_freq"]) for m in merges]
    want = ref_bpe({"low": 5, "lower": 2, "newest": 6, "widest": 3}, 4)
    assert got == want
    assert got[0][:2] == ("e", "s") and got[1][:2] == ("es", "t")


def test_bpe_matches_reference_on_corpus(spark):
    wf = {r["word"]: r["freq"] for r in word_frequencies(
        load_table(spark, SF_SMOKE, "documents")
    ).collect()}
    got = sorted(bpe_learn_merges_detail(spark, SF_SMOKE).collect(), key=lambda r: r["rank"])
    want = ref_bpe(wf, len(got))
    assert [(r["left"], r["right"], r["pair_freq"]) for r in got] == want
    assert [r["rank"] for r in got] == list(range(1, len(got) + 1))
    for r in got:
        assert r["merged"] == r["left"] + r["right"]


def test_bpe_distributed_loop_matches_task_local_plan(spark):
    """The giant-vocab fallback (per-round distributed merging) must learn
    the identical merge sequence as the task-local default — same greedy
    objective, same tie policy, different physical plan only."""
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.datapipe.bpe import (
        learn_bpe_merges,
    )

    words = word_frequencies(load_table(spark, SF_SMOKE, "documents"))
    dist = learn_bpe_merges(words, 8)
    local = sorted(bpe_learn_merges_detail(spark, SF_SMOKE).collect(), key=lambda r: r["rank"])[:8]
    assert [(m["left"], m["right"], m["pair_freq"]) for m in dist] == [
        (r["left"], r["right"], r["pair_freq"]) for r in local
    ]


def test_bpe_encode_round_trips_and_compresses(spark):
    """Encoding invariants on the real corpus slice: (a) concatenating a
    doc's BPE tokens with merges un-fused reproduces its normalized
    characters (token counts prove it: n_bpe_tokens <= total chars), (b)
    at least one merge actually fires (compression), (c) deterministic
    across runs."""
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.datapipe.bpe import (
        bpe_encode_docs_detail,
    )
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.registry import load_all

    out1 = {r["doc_id"]: r for r in bpe_encode_docs_detail(spark, SF_SMOKE).collect()}
    docs = {r["doc_id"]: r["text"] for r in load_table(spark, SF_SMOKE, "documents").collect()}
    assert set(out1) == set(docs)
    fired = 0
    for doc_id, row in out1.items():
        words = docs[doc_id].lower().strip().split()
        n_chars = sum(len(w) for w in words)
        assert row["n_words"] == len(words)
        # every BPE token covers >= 1 char; merges only shrink the count
        assert row["n_bpe_tokens"] <= n_chars
        if row["n_bpe_tokens"] < n_chars:
            fired += 1
    assert fired > 0
    out2 = {r["doc_id"]: r for r in bpe_encode_docs_detail(spark, SF_SMOKE).collect()}
    assert all(
        (out1[d]["n_bpe_tokens"], out1[d]["preview"]) == (out2[d]["n_bpe_tokens"], out2[d]["preview"])
        for d in out1
    )
    assert all(r["round_trip_ok"] for r in out1.values())
    # registered (oracle-gated) surface: both booleans TRUE for every doc
    for r in load_all()["bpe_encode_docs"].fn(spark, SF_SMOKE).collect():
        assert r["round_trip_ok"] is True and r["token_counts_consistent"] is True


def test_bpe_encode_agrees_with_learned_fusions(spark):
    """A word that the learner fully fused must encode to the fused symbols:
    re-apply the first merge's (left, right) and check the preview tokens of
    a doc containing only that pair."""
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.datapipe.bpe import (
        bpe_learn_merges_detail,
    )

    merges = sorted(bpe_learn_merges_detail(spark, SF_SMOKE).collect(), key=lambda r: r["rank"])
    assert merges, "corpus must learn at least one merge"
    # apply merges in rank order to the top merge's fused string by hand
    word = merges[0]["merged"]
    sym = list(word)
    for m in merges:
        fused, i = [], 0
        while i < len(sym):
            if i + 1 < len(sym) and sym[i] == m["left"] and sym[i + 1] == m["right"]:
                fused.append(sym[i] + sym[i + 1])
                i += 2
            else:
                fused.append(sym[i])
                i += 1
        sym = fused
    assert sym == [word], "rank-order application must fully fuse the first merge's output"
