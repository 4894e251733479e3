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
