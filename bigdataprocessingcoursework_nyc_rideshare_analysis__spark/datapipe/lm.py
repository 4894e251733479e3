"""Language-model quality signals: unigram-LM cross-entropy (the
perplexity filter) and top-k vocabulary coverage per document.

No reference counterpart (SURVEY.md §2.9 extension tier).  Perplexity
filtering is the canonical corpus-quality gate (CCNet scores every
paragraph with a small LM and drops the worst tail); the distributed shape
of the *unigram* variant is fully SQL-expressible, so it gets a DuckDB
oracle, and the same plan shape carries any higher-order LM whose table
fits a broadcast.

Plan for both queries: one corpus pass builds the term table (hash agg),
which is Heaps'-law bounded (millions of rows at 100 TB — broadcastable);
the per-doc pass explodes tokens, broadcast-joins the term table, and
re-aggregates by doc_id.  Two shuffles keyed on term and doc_id — nothing
scales worse than the token count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import tokens_of
from ..registry import register
from .stage import staged_features

COVERAGE_TOP_K = 500

#: stupid-backoff discount (Brants et al. 2007, "Large Language Models in
#: Machine Translation" — the web-scale LM built exactly this way on
#: MapReduce)
BACKOFF = 0.4

_LOGPPL_ORACLE = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS term
  FROM documents
), vocab AS (
  SELECT term, COUNT(*) AS c FROM tok GROUP BY term
), tot AS (
  SELECT SUM(c) AS t, COUNT(*) AS v FROM vocab
)
SELECT tok.doc_id,
       COUNT(*) AS n_tokens,
       ROUND(-SUM(ln((vocab.c + 1.0) / (tot.t + tot.v))) / COUNT(*), 9) AS cross_entropy
FROM tok JOIN vocab USING (term), tot
GROUP BY tok.doc_id
"""


@register("unigram_logppl_docs", oracle=_LOGPPL_ORACLE, tags=("datapipe", "text", "quality", "r4"))
def q_unigram_logppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document cross-entropy (nats/token) under the corpus's own
    add-one-smoothed unigram LM — the perplexity quality gate: documents
    full of rare tokens (junk, OCR noise, generated gibberish) score high
    and get dropped at a percentile threshold downstream.  12-dp rounding
    pins ln-ulp drift, as elsewhere.  Reads the staged token frame — the
    tokenize-once scan shared with the dedup/curation tier."""
    docs = staged_features(spark, sf_dir)
    tok = docs.select("doc_id", F.explode(tokens_of(docs)).alias("term"))
    vocab = tok.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    tot = vocab.agg(F.sum("c").alias("t"), F.count(F.lit(1)).alias("v"))
    logp = F.log((F.col("c") + 1.0) / (F.col("t") + F.col("v")))
    return (
        tok.join(F.broadcast(vocab), "term")
        .join(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            # 9 dp, not 12: thousands-of-terms ln-sums drift past the 12th
            # decimal (seen at sf0.1); per-row ln users keep 12
            F.round(-F.sum(logp) / F.count(F.lit(1)), 9).alias("cross_entropy"),
        )
    )


_BIGRAM_ORACLE = f"""
WITH t AS (
  SELECT doc_id, string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS toks
  FROM documents
), tok AS (
  SELECT doc_id, generate_subscripts(toks, 1) AS pos, unnest(toks) AS term FROM t
), pairs AS (
  SELECT a.doc_id, a.term AS w1, b.term AS w2
  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
), tuni AS (
  SELECT term, COUNT(*) AS c FROM tok WHERE doc_id % 2 = 0 GROUP BY term
), ttot AS (
  SELECT SUM(c) AS t, COUNT(*) AS v FROM tuni
), tbig AS (
  SELECT w1, w2, COUNT(*) AS bc FROM pairs WHERE doc_id % 2 = 0 GROUP BY w1, w2
)
SELECT p.doc_id,
       COUNT(*) AS n_bigrams,
       ROUND(SUM(CASE WHEN tbig.bc IS NOT NULL
                      THEN ln(CAST(tbig.bc AS DOUBLE) / u1.c)
                      ELSE ln({BACKOFF} * (COALESCE(u2.c, 0) + 1.0) / (ttot.t + ttot.v))
                 END) / COUNT(*), 9) AS avg_logprob
FROM pairs p
LEFT JOIN tbig ON p.w1 = tbig.w1 AND p.w2 = tbig.w2
LEFT JOIN tuni u1 ON p.w1 = u1.term
LEFT JOIN tuni u2 ON p.w2 = u2.term, ttot
GROUP BY p.doc_id
"""


@register("bigram_backoff_logprob", oracle=_BIGRAM_ORACLE, tags=("datapipe", "text", "quality", "r6"))
def q_bigram_backoff_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean bigram log-probability under a stupid-backoff LM
    (Brants et al. 2007) trained on the held-out even-``doc_id`` half of the
    corpus: P(w2|w1) = bc/c(w1) when the bigram was seen in training, else
    {BACKOFF}·(c(w2)+1)/(N+V) (add-one-smoothed unigram backoff — the
    odd-half docs genuinely contain unseen bigrams/terms, which is what the
    backoff path exists for).  This is the higher-order companion to
    ``unigram_logppl_docs`` and the distributed shape of every count-based
    LM quality gate: the n-gram table is an aggregation (Heaps-bounded,
    broadcastable through the low orders), scoring is explode → broadcast
    join → re-aggregate.  Two corpus passes (train counts, scoring), all
    shuffles keyed on n-gram or doc_id — nothing scales worse than token
    count.  Bigram extraction stays array-native (``arrays_zip`` of shifted
    slices) so no per-token shuffle exists before the join."""
    docs = staged_features(spark, sf_dir)
    bigrams = F.expr(
        "arrays_zip(slice(toks, 1, size(toks)-1), slice(toks, 2, size(toks)-1))"
    )
    pairs = docs.select("doc_id", F.explode(bigrams).alias("bg")).select(
        "doc_id", F.col("bg.0").alias("w1"), F.col("bg.1").alias("w2")
    )
    train = docs.filter(F.col("doc_id") % 2 == 0)
    tuni = (
        train.select(F.explode("toks").alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    ttot = tuni.agg(F.sum("c").alias("t"), F.count(F.lit(1)).alias("v"))
    tbig = (
        train.select(F.explode(bigrams).alias("bg"))
        .select(F.col("bg.0").alias("w1"), F.col("bg.1").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("bc"))
    )
    u1 = tuni.select(F.col("term").alias("w1"), F.col("c").alias("c1"))
    u2 = tuni.select(F.col("term").alias("w2"), F.col("c").alias("c2"))
    logp = F.when(
        F.col("bc").isNotNull(), F.log(F.col("bc").cast("double") / F.col("c1"))
    ).otherwise(
        F.log(BACKOFF * (F.coalesce(F.col("c2"), F.lit(0)) + 1.0) / (F.col("t") + F.col("v")))
    )
    return (
        pairs.join(F.broadcast(tbig), ["w1", "w2"], "left")
        .join(F.broadcast(u1), "w1", "left")
        .join(F.broadcast(u2), "w2", "left")
        .join(F.broadcast(ttot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.sum(logp) / F.count(F.lit(1)), 9).alias("avg_logprob"),
        )
    )


_COVERAGE_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS term
  FROM documents
), topk AS (
  SELECT term FROM (
    SELECT term, COUNT(*) AS c FROM tok GROUP BY term
    ORDER BY c DESC, term ASC LIMIT {COVERAGE_TOP_K}
  )
)
SELECT tok.doc_id,
       COUNT(*) AS n_tokens,
       CAST(SUM(CASE WHEN topk.term IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS in_vocab,
       CAST(SUM(CASE WHEN topk.term IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS coverage
FROM tok LEFT JOIN topk ON tok.term = topk.term
GROUP BY tok.doc_id
"""


@register("vocab_coverage_docs", oracle=_COVERAGE_ORACLE, tags=("datapipe", "text", "quality", "r4"))
def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document coverage by the top-{COVERAGE_TOP_K} vocabulary
    (deterministic (freq desc, term asc) cut) — the OOV-rate signal a
    tokenizer/vocab decision consumes: low coverage means the doc is
    off-distribution for the vocab being trained."""
    docs = staged_features(spark, sf_dir)
    tok = docs.select("doc_id", F.explode(tokens_of(docs)).alias("term"))
    topk = (
        tok.groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("term"))
        .limit(COVERAGE_TOP_K)
        .select("term", F.lit(True).alias("in_top"))
    )
    hit = F.when(F.col("in_top"), 1).otherwise(0)
    return (
        tok.join(F.broadcast(topk), "term", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(hit).cast("bigint").alias("in_vocab"),
            (F.sum(hit).cast("double") / F.count(F.lit(1))).alias("coverage"),
        )
    )
