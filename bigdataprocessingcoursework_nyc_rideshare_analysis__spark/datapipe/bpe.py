"""Distributed BPE vocabulary induction — tokenizer training as an engine
operator.

Byte-pair encoding is learned the way production trainers (and the original
Sennrich et al. algorithm) do it: NOT by rescanning the corpus per merge,
but by

1. ONE corpus pass → word-frequency table (the only job that touches the
   100 TB of text; its output is |vocab|-sized, orders of magnitude
   smaller), then
2. an iterative merge loop over that small weighted table: count adjacent
   symbol pairs (weighted by word frequency), pick the most frequent pair,
   fuse it inside every word's symbol sequence, repeat.

Scale shape: the corpus pass is explode+groupBy (partial aggregation, one
term-keyed exchange).  Each merge round is one explode+sum over the vocab
table plus a 1-row argmax ``collect`` (control flow only — same discipline
as connected-components' convergence fingerprint), and the in-word pair
fusion is a JVM-side ``aggregate`` fold over the symbol array (no Python in
the loop).  ``localCheckpoint`` every few rounds truncates the growing
lineage exactly as in ``datapipe.cluster``.

Not SQL-expressible (iterative argmax-dependent rewrites) → rows-only
driver check; pytest verifies the merge sequence against a pure-Python
reference implementation on the same corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import tokens_of
from ..registry import register
from .stage import staged_features

BPE_MERGES = 24  # merges to learn in the registered query
_CHECKPOINT_EVERY = 6


def word_frequencies(docs: DataFrame) -> DataFrame:
    """(word, freq) over whitespace tokens — the single corpus-sized pass.
    Accepts raw ``documents`` or the staged token frame."""
    return (
        docs.select(F.explode(tokens_of(docs)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _merge_pair_col(sym: Column, left: str, right: str) -> Column:
    """Fuse every non-overlapping, leftmost-first (left, right) adjacency in
    a symbol array: a fold that either replaces the accumulator's tail with
    the merged symbol or appends the current one.  Pure JVM higher-order
    function — runs inside codegen over the |vocab|-row table."""
    merged = left + right

    def step(acc: Column, x: Column) -> Column:
        tail_matches = (F.size(acc) > 0) & (F.element_at(acc, -1) == F.lit(left)) & (
            x == F.lit(right)
        )
        fused = F.concat(
            F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
        )
        return F.when(tail_matches, fused).otherwise(F.concat(acc, F.array(x)))

    return F.aggregate(sym, F.array().cast("array<string>"), step)


def learn_bpe_merges(words: DataFrame, n_merges: int) -> list[dict]:
    """Greedy BPE over a (word, freq) table; returns the ordered merge list
    as dicts with rank / left / right / merged / pair_freq.

    Tie policy (pinned so every engine and the reference implementation
    agree): highest weighted count, then lexicographically smallest
    (left, right)."""
    sym = words.select(
        "freq", F.split(F.col("word"), "").alias("sym")
    ).localCheckpoint(eager=True)

    merges: list[dict] = []
    for rank in range(1, n_merges + 1):
        # guarded sequence: sequence(1, 0) would DESCEND for fully-fused
        # single-symbol words (same pitfall as functions.text.shingles_col)
        idx = F.when(
            F.size("sym") >= 2, F.sequence(F.lit(1), F.size("sym") - 1)
        ).otherwise(F.array().cast("array<int>"))
        pairs = sym.select(
            "freq",
            F.explode(
                F.transform(
                    idx,
                    lambda i: F.struct(
                        F.element_at("sym", i).alias("left"),
                        F.element_at("sym", i + 1).alias("right"),
                    ),
                )
            ).alias("p"),
        ).select(F.col("p.left").alias("left"), F.col("p.right").alias("right"), "freq")
        top = (
            pairs.groupBy("left", "right")
            .agg(F.sum("freq").alias("pair_freq"))
            .orderBy(F.desc("pair_freq"), F.asc("left"), F.asc("right"))
            .limit(1)
            .collect()
        )
        if not top:  # every word fully fused
            break
        row = top[0]
        merges.append(
            {
                "rank": rank,
                "left": row["left"],
                "right": row["right"],
                "merged": row["left"] + row["right"],
                "pair_freq": row["pair_freq"],
            }
        )
        sym = sym.select("freq", _merge_pair_col(F.col("sym"), row["left"], row["right"]).alias("sym"))
        if rank % _CHECKPOINT_EVERY == 0:
            sym = sym.localCheckpoint(eager=True)
    return merges


def bpe_learn_merges_detail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn the first ``BPE_MERGES`` merges from the corpus.  Output: one
    row per merge in learned order — the artifact a tokenizer build
    consumes.  Merge-sequence equality vs a pure-Python reference AND vs
    the distributed per-round loop is pinned in ``tests/test_bpe.py``;
    the registered ``bpe_learn_merges`` wraps this in the well-formedness
    bound summary.

    Physical split mirrors production trainers: the corpus-sized pass
    (explode + groupBy) is distributed; the merge loop then runs over the
    |vocab|-sized weighted table INSIDE ONE EXECUTOR TASK
    (``coalesce(1).mapInPandas``) — natural-language vocabularies are
    Heaps'-law bounded (millions of words at 100 TB, a few MB weighted),
    so the loop is in-memory work wherever it runs, and shipping it into a
    task keeps the whole query one lazy plan with zero driver collects.
    Per-round DISTRIBUTED merging (``learn_bpe_merges``) remains the
    fallback for a vocabulary that outgrows a task (byte-level BPE over
    non-segmented scripts): same pinned tie policy, measured ~0.6 s/round
    overhead at 24 rounds — which is why it is not the default."""
    docs = staged_features(spark, sf_dir)
    n_merges = BPE_MERGES

    def run_merges(batches):
        import pandas as pd

        freqs: dict[str, int] = {}
        for pdf in batches:
            for w, f in zip(pdf["word"], pdf["freq"]):
                freqs[w] = freqs.get(w, 0) + int(f)
        table = [(list(w), f) for w, f in freqs.items()]
        out = []
        for rank in range(1, n_merges + 1):
            counts: dict[tuple[str, str], int] = {}
            for sym, f in table:
                for i in range(len(sym) - 1):
                    counts[(sym[i], sym[i + 1])] = counts.get((sym[i], sym[i + 1]), 0) + f
            if not counts:
                break
            (left, right), freq = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
            out.append((rank, left, right, left + right, freq))
            new_table = []
            for sym, f in table:
                fused, i = [], 0
                while i < len(sym):
                    if i + 1 < len(sym) and sym[i] == left and sym[i + 1] == right:
                        fused.append(left + right)
                        i += 2
                    else:
                        fused.append(sym[i])
                        i += 1
                new_table.append((fused, f))
            table = new_table
        if out:
            yield pd.DataFrame(
                out, columns=["rank", "left", "right", "merged", "pair_freq"]
            )

    return (
        word_frequencies(docs)
        .coalesce(1)
        .mapInPandas(run_merges, schema="rank int, left string, right string, merged string, pair_freq long")
    )


#: CORPUS PRECONDITION (round-10 advice — documented so a gate failure at
#: a new scale is diagnosable rather than mysterious): this universe
#: assumes the corpus is rich enough to support all ``BPE_MERGES`` merges.
#: The learner truncates when the pair supply is exhausted (every word
#: reduced to a single symbol), so on a degenerate corpus (e.g. a handful
#: of one-character words) the Spark side would emit FEWER than
#: ``BPE_MERGES`` rows and the hash gate would fail on row count — that
#: failure means "corpus too small for the configured merge budget", not
#: a learner bug.  The learned count itself is not SQL-derivable (the
#: merge loop is iterative), so the precondition is documented instead of
#: computed; every test/driver corpus (≥ sf0.001, ~31k running words)
#: supports 24 merges with orders of magnitude to spare.  Same contract
#: for ``_VOCAB_CURVE_BOUND_ORACLE`` below.
_BPE_LEARN_BOUND_ORACLE = f"""
SELECT CAST(k AS INTEGER) AS rank,
       TRUE AS merged_is_concat,
       TRUE AS sides_are_known_symbols,
       TRUE AS pair_freq_positive
FROM range(1, {BPE_MERGES + 1}) t(k)
"""


@register(
    "bpe_learn_merges", oracle=_BPE_LEARN_BOUND_ORACLE, tags=("datapipe", "text", "iterative")
)
def q_bpe_learn_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered surface of the BPE learner (round-10 oracle-ization):
    the MERGE-RANK universe is oracle-exact (exactly ``BPE_MERGES``
    ordered merges — a learner that stalls or double-emits fails the
    hash), and three BPE well-formedness invariants are Spark-computed
    booleans the twin asserts TRUE: the merged symbol is the concatenation
    of its sides, each side is a KNOWN symbol (a single character or the
    merged output of an EARLIER rank — the property that makes the merge
    list a valid tokenizer), and every merge fired on a positive pair
    frequency.  The learned (left, right, freq) sequence stays on
    ``bpe_learn_merges_detail`` with the pure-Python and distributed-loop
    equality pins.

    Plan: same learn pass; the well-formedness join runs on the
    ``BPE_MERGES``-row output."""
    det = bpe_learn_merges_detail(spark, sf_dir)
    # earliest rank per merged symbol: two ranks can in principle fuse to
    # the same string (("a","bc") and ("ab","c")), and a bare join would
    # then duplicate rows — exists-with-earliest keeps the frame 1:1
    earlier = det.groupBy(F.col("merged").alias("sym")).agg(
        F.min("rank").alias("sym_rank")
    )

    def side_known(col: str) -> "Column":
        return (F.length(col) == 1) | F.col(f"{col}_known")

    out = det
    for side in ("left", "right"):
        out = (
            out.join(
                earlier.select(
                    F.col("sym").alias(side), F.col("sym_rank").alias(f"{side}_rank")
                ),
                side,
                "left",
            )
            .withColumn(
                f"{side}_known",
                F.coalesce(F.col(f"{side}_rank") < F.col("rank"), F.lit(False)),
            )
            .drop(f"{side}_rank")
        )
    return out.select(
        "rank",
        (F.col("merged") == F.concat("left", "right")).alias("merged_is_concat"),
        (side_known("left") & side_known("right")).alias("sides_are_known_symbols"),
        (F.col("pair_freq") > 0).alias("pair_freq_positive"),
    )


def bpe_encode_docs_detail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the learned BPE merge table to the corpus — the tokenizer
    *application* half that pairs with ``bpe_learn_merges``.  Output: one
    row per document with whitespace-word, character, and BPE-token counts,
    a deterministic preview of the first 12 tokens, and the in-kernel
    round-trip verdict (concatenating the doc's BPE tokens reproduces its
    normalized characters — BPE merges are concatenations, so the decode
    is free).

    The merge table is collected to the driver first — BOUNDED by
    construction at ``BPE_MERGES`` rows (same control-flow-collect rule as
    IVF's capped training sample), then shipped inside the encode closure.
    Encoding itself is an Arrow-batched ``mapInPandas`` pass with a
    per-task word→tokens memo (Zipf makes the hit rate high), zero
    shuffles: the 100 TB cost is exactly one scan of the corpus.
    Round-trip and merge-consistency are additionally pinned in
    ``tests/test_bpe.py``; the registered ``bpe_encode_docs`` exposes the
    oracle-gated summary shape."""
    docs = staged_features(spark, sf_dir)
    merge_rows = sorted(
        bpe_learn_merges_detail(spark, sf_dir).collect(), key=lambda r: r["rank"]
    )
    merges = [(r["left"], r["right"]) for r in merge_rows]

    def encode(batches):
        import pandas as pd

        memo: dict[str, list[str]] = {}

        def enc_word(word: str) -> list[str]:
            got = memo.get(word)
            if got is not None:
                return got
            sym = list(word)
            for left, right in merges:
                fused, i = [], 0
                while i < len(sym):
                    if i + 1 < len(sym) and sym[i] == left and sym[i + 1] == right:
                        fused.append(left + right)
                        i += 2
                    else:
                        fused.append(sym[i])
                        i += 1
                sym = fused
            memo[word] = sym
            return sym

        for pdf in batches:
            out = []
            for doc_id, words in zip(pdf["doc_id"], pdf["toks"]):
                toks: list[str] = []
                chars = 0
                for w in words:
                    chars += len(str(w))
                    toks.extend(enc_word(str(w)))
                rt = "".join(toks) == "".join(str(w) for w in words)
                out.append(
                    (int(doc_id), len(words), chars, len(toks), "|".join(toks[:12]), rt)
                )
            yield pd.DataFrame(
                out,
                columns=["doc_id", "n_words", "n_chars", "n_bpe_tokens", "preview", "round_trip_ok"],
            )

    return docs.select("doc_id", "toks").mapInPandas(
        encode,
        schema=(
            "doc_id long, n_words int, n_chars int, n_bpe_tokens int, "
            "preview string, round_trip_ok boolean"
        ),
    )


_BPE_ENCODE_BOUND_ORACLE = """
WITH t AS (
  SELECT doc_id, string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS toks
  FROM documents
)
SELECT doc_id, CAST(len(toks) AS INTEGER) AS n_words,
       TRUE AS round_trip_ok,
       TRUE AS token_counts_consistent
FROM t
"""


@register("bpe_encode_docs", oracle=_BPE_ENCODE_BOUND_ORACLE, tags=("datapipe", "text", "r4"))
def q_bpe_encode_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered surface of the BPE encoder (round-10 oracle-ization):
    one row per document with the EXACT columns the DuckDB twin recomputes
    (doc_id, whitespace-word count) and two Spark-computed booleans it
    asserts TRUE — the tokenizer's defining LOSSLESSNESS property
    (concatenating the doc's BPE tokens reproduces its normalized
    characters, verified in-kernel per document) and count sanity
    (n_words ≤ n_bpe_tokens ≤ n_chars: merges only fuse within words and
    every token covers ≥ 1 character).  An encoder bug that drops or
    corrupts text now fails the driver's hash gate on the exact document
    it breaks; token counts and previews stay on
    ``bpe_encode_docs_detail`` with their pytest pins.

    Plan: identical to the detail pass — one corpus scan, zero shuffles;
    the booleans are per-row expressions."""
    det = bpe_encode_docs_detail(spark, sf_dir)
    return det.select(
        "doc_id",
        "n_words",
        "round_trip_ok",
        (
            (F.col("n_words") <= F.col("n_bpe_tokens"))
            & (F.col("n_bpe_tokens") <= F.col("n_chars"))
        ).alias("token_counts_consistent"),
    )


#: merge-count checkpoints for the vocab-size curve: prefixes of ONE learned
#: merge list (BPE's ordered merges mean "first k merges" IS the size-k
#: tokenizer — no re-learning per size)
VOCAB_CURVE_SIZES = (6, 12, BPE_MERGES)


def _vocab_curve_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer vocab-size trade-off curve — the measurement that decides a
    training pipeline's merge budget: for each merge-count checkpoint in
    {VOCAB_CURVE_SIZES}, the corpus-wide token count, fertility
    (tokens/word) and chars/token the size-k tokenizer would produce.
    Fertility falling slowly past a checkpoint means the extra vocab buys
    little compression — the standard knee-finding readout (Rust et al.
    2021 use fertility to compare tokenizers; this plots it against size).

    Key identity making this ONE corpus pass instead of |sizes| re-learns:
    BPE merges are ORDERED, so the size-k tokenizer is exactly the first k
    merges of the size-{BPE_MERGES} learn (``bpe_learn_merges``, collected
    to the driver — bounded at {BPE_MERGES} rows).  The encode pass applies
    merges incrementally and snapshots token counts at each checkpoint —
    all sizes measured in a single Arrow scan with a per-task word memo,
    then one |sizes|-row aggregation.  Golden rows + a consistency pin
    against the encoder (the full-size checkpoint must reproduce its
    total) live in ``test_golden_r8.py`` / ``test_bpe.py`` via
    ``bpe_vocab_size_curve_detail``; the registered query exposes the
    oracle-gated conservation/monotonicity shape.  Emits total_chars too
    (the registered surface's exact column); the detail selection drops
    it to keep the pinned golden shape."""
    docs = staged_features(spark, sf_dir)
    merge_rows = sorted(
        bpe_learn_merges_detail(spark, sf_dir).collect(), key=lambda r: r["rank"]
    )
    merges = [(r["left"], r["right"]) for r in merge_rows]
    sizes = tuple(k for k in VOCAB_CURVE_SIZES if k <= len(merges)) or (len(merges),)

    def count_tokens(batches):
        import pandas as pd

        memo: dict[str, list[int]] = {}

        def counts_per_size(word: str) -> list[int]:
            got = memo.get(word)
            if got is not None:
                return got
            sym = list(word)
            out: list[int] = []
            nxt = 0
            for rank, (left, right) in enumerate(merges, start=1):
                fused, i = [], 0
                while i < len(sym):
                    if i + 1 < len(sym) and sym[i] == left and sym[i + 1] == right:
                        fused.append(left + right)
                        i += 2
                    else:
                        fused.append(sym[i])
                        i += 1
                sym = fused
                while nxt < len(sizes) and rank == sizes[nxt]:
                    out.append(len(sym))
                    nxt += 1
            while nxt < len(sizes):  # merges exhausted before a checkpoint
                out.append(len(sym))
                nxt += 1
            memo[word] = out
            return out

        for pdf in batches:
            words = 0
            chars = 0
            toks = [0] * len(sizes)
            for ws in pdf["toks"]:
                for w in ws:
                    w = str(w)
                    words += 1
                    chars += len(w)
                    for j, c in enumerate(counts_per_size(w)):
                        toks[j] += c
            yield pd.DataFrame(
                [(k, words, chars, toks[j]) for j, k in enumerate(sizes)],
                columns=["n_merges", "words", "chars", "tokens"],
            )

    partials = docs.select("toks").mapInPandas(
        count_tokens, schema="n_merges int, words long, chars long, tokens long"
    )
    return (
        partials.groupBy("n_merges")
        .agg(
            F.sum("words").alias("total_words"),
            F.sum("chars").alias("total_chars"),
            F.sum("tokens").alias("total_tokens"),
        )
        .select(
            "n_merges",
            "total_words",
            "total_chars",
            "total_tokens",
            F.round(F.col("total_tokens") / F.col("total_words"), 9).alias("fertility"),
            F.round(F.col("total_chars") / F.col("total_tokens"), 9).alias("chars_per_token"),
        )
    )


def bpe_vocab_size_curve_detail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curve surface the goldens pin: (n_merges, total_words,
    total_tokens, fertility, chars_per_token) — see ``_vocab_curve_frame``
    for the single-scan multi-checkpoint encode."""
    return _vocab_curve_frame(spark, sf_dir).select(
        "n_merges", "total_words", "total_tokens", "fertility", "chars_per_token"
    )


#: CORPUS PRECONDITION: assumes every ``VOCAB_CURVE_SIZES`` checkpoint is
#: learnable from the corpus — see the ``_BPE_LEARN_BOUND_ORACLE`` note.
_VOCAB_CURVE_BOUND_ORACLE = f"""
WITH t AS (
  SELECT string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS toks
  FROM documents
), w AS (
  SELECT CAST(SUM(len(toks)) AS BIGINT) AS total_words,
         CAST(SUM(list_sum(list_transform(toks, x -> length(x)))) AS BIGINT) AS total_chars
  FROM t
)
SELECT CAST(k AS INTEGER) AS n_merges, total_words, total_chars,
       TRUE AS tokens_within_bounds,
       TRUE AS tokens_nonincreasing
FROM w, (VALUES {", ".join(f"({k})" for k in VOCAB_CURVE_SIZES)}) v(k)
"""


@register(
    "bpe_vocab_size_curve",
    oracle=_VOCAB_CURVE_BOUND_ORACLE,
    tags=("datapipe", "text", "tokenizer", "r8"),
)
def q_bpe_vocab_size_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered surface of the tokenizer vocab-size curve (round-10
    oracle-ization): per-checkpoint rows whose EXACT columns the DuckDB
    twin recomputes — the checkpoint ids and the corpus word/char totals
    (conservation through the multi-checkpoint encode: a kernel that
    drops or double-counts a word fails the hash) — plus two Spark-computed
    booleans it asserts TRUE: every checkpoint's token total lies in
    [total_words, total_chars] (merges fuse within words; a token covers
    ≥ 1 char), and totals are NON-INCREASING in the merge count (each
    added merge can only fuse).  The fertility/compression numbers stay on
    ``bpe_vocab_size_curve_detail`` with the goldens and the
    full-checkpoint ≡ ``bpe_encode_docs`` consistency pin.

    Plan: same single Arrow scan; the cross-checkpoint monotonicity window
    runs on the |checkpoints|-row aggregate."""
    from pyspark.sql import Window

    cur = _vocab_curve_frame(spark, sf_dir)
    # |VOCAB_CURVE_SIZES|-row frame: the unpartitioned window is bounded
    w = Window.orderBy("n_merges")
    prev = F.lag("total_tokens").over(w)
    return cur.select(
        "n_merges",
        "total_words",
        "total_chars",
        (
            (F.col("total_words") <= F.col("total_tokens"))
            & (F.col("total_tokens") <= F.col("total_chars"))
        ).alias("tokens_within_bounds"),
        F.coalesce(prev >= F.col("total_tokens"), F.lit(True)).alias(
            "tokens_nonincreasing"
        ),
    )
