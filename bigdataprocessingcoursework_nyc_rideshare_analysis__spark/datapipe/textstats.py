"""Text analysis for training-data curation: token counting, quality
scoring, language ID, fingerprinting.

All pure JVM column expressions (SURVEY.md §7.2 step 6) — each operator has a
DuckDB oracle, and the ratios are derived from integer counts so both engines
produce bit-identical doubles.

Scale: every operator here is a stateless ``select`` over the documents table
— embarrassingly parallel, no shuffle at all (check the plan: a single
WholeStageCodegen over the scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import normalize_text, tokens_col
from ..registry import register
from ..sources import load_table

#: BPE-ish segmentation: letter runs, digit runs, single other non-space —
#: same RE2-compatible pattern on both engines.
BPE_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

#: deterministic per-language marker words (argmax → predicted language)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "nicht", "mit"),
    "en": ("the", "a", "of", "and", "to", "in"),
    "es": ("el", "la", "de", "que", "y", "en"),
    "fr": ("le", "la", "les", "et", "des", "un"),
    "zh": ("de", "shi", "le", "zai", "he", "you"),
}

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it", "that", "for")


_TOKEN_ORACLE = f"""
SELECT doc_id,
       CAST(len(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS INTEGER)
         AS n_tokens,
       CAST(len(regexp_extract_all(text, '{BPE_PATTERN}')) AS INTEGER) AS n_bpe_tokens,
       CAST(length(text) AS INTEGER) AS n_chars
FROM documents
"""


@register("token_counts", oracle=_TOKEN_ORACLE, tags=("datapipe", "text"))
def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token count + BPE-ish segment count + byte-ish char count."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(tokens_col("text")).cast("int").alias("n_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(BPE_PATTERN), 0)).cast("int").alias("n_bpe_tokens"),
        F.length("text").cast("int").alias("n_chars"),
    )


_QUALITY_ORACLE = f"""
WITH t AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS toks,
         length(text) AS n_chars,
         length(regexp_replace(text, '[^!-/:-@\\[-`{{-~]', '', 'g')) AS n_punct
  FROM documents
), s AS (
  SELECT doc_id, n_chars,
         CAST(len(toks) AS INTEGER) AS n_tokens,
         CAST(len(list_filter(toks, x -> list_contains({list(STOPWORDS)!r}, x))) AS INTEGER) AS n_stop,
         CAST(n_punct AS INTEGER) AS n_punct
  FROM t
)
SELECT doc_id, n_tokens, n_stop, n_punct,
       CAST(n_stop AS DOUBLE) / n_tokens AS stopword_ratio,
       CAST(n_punct AS DOUBLE) / n_chars AS punct_ratio,
       CAST(n_chars AS DOUBLE) / n_tokens AS avg_token_chars
FROM s
"""


@register("doc_quality", oracle=_QUALITY_ORACLE, tags=("datapipe", "text"))
def q_doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length / punctuation / stopword quality signals (heuristic quality
    scoring for corpus filtering)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens_col("text")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_tokens = F.size(toks).cast("int")
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x))).cast("int")
    n_punct = F.length(F.regexp_replace("text", r"[^!-/:-@\[-`{-~]", "")).cast("int")
    n_chars = F.length("text").cast("int")
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        n_stop.alias("n_stop"),
        n_punct.alias("n_punct"),
        (n_stop.cast("double") / n_tokens).alias("stopword_ratio"),
        (n_punct.cast("double") / n_chars).alias("punct_ratio"),
        (n_chars.cast("double") / n_tokens).alias("avg_token_chars"),
    )


def _lang_score_sql(lang: str) -> str:
    markers = list(LANG_MARKERS[lang])
    return (
        f"CAST(len(list_intersect(list_distinct(toks), {markers!r})) AS INTEGER)"
    )


_LANG_ORACLE = f"""
WITH t AS (
  SELECT doc_id, lang AS labeled_lang,
         string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS toks
  FROM documents
), scored AS (
  SELECT doc_id, labeled_lang,
         {", ".join(f"{_lang_score_sql(lang)} AS s_{lang}" for lang in sorted(LANG_MARKERS))}
  FROM t
)
SELECT doc_id, labeled_lang,
       CASE
         {" ".join(f"WHEN s_{lang} >= greatest(s_de, s_en, s_es, s_fr, s_zh) THEN '{lang}'" for lang in sorted(LANG_MARKERS))}
       END AS predicted_lang
FROM scored
"""


@register("lang_id", oracle=_LANG_ORACLE, tags=("datapipe", "text"))
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language ID: per-language distinct-hit counts, argmax with
    alphabetical tiebreak (n-gram-heuristic family; deterministic)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.array_distinct(tokens_col("text"))
    scored = docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        *[
            F.size(F.array_intersect(toks, F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])))
            .cast("int")
            .alias(f"s_{lang}")
            for lang in sorted(LANG_MARKERS)
        ],
    )
    best = F.greatest(*[F.col(f"s_{lang}") for lang in sorted(LANG_MARKERS)])
    pred = F.when(F.col(f"s_{sorted(LANG_MARKERS)[0]}") >= best, sorted(LANG_MARKERS)[0])
    for lang in sorted(LANG_MARKERS)[1:]:
        pred = pred.when(F.col(f"s_{lang}") >= best, lang)
    return scored.select("doc_id", "labeled_lang", pred.alias("predicted_lang"))


_BIGRAM_ORACLE = """
WITH t AS (
  SELECT doc_id, string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS toks
  FROM documents
)
SELECT doc_id, toks[i] || ' ' || toks[i+1] AS ngram, CAST(i AS INTEGER) AS pos
FROM t, UNNEST(range(1, len(toks))) AS u(i)
"""


@register("bigram_expansion_udtf", oracle=_BIGRAM_ORACLE, tags=("datapipe", "text", "udtf"))
def q_bigram_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF surface: one input row → N output rows via a user-defined
    table function in a SQL ``LATERAL`` join.

    This exists to prove the UDTF API end-to-end (registration, lateral
    invocation, schema declaration) — for *production* n-gram expansion use
    the declarative ``shingles_col`` + ``explode`` (whole-stage codegen);
    row-at-a-time Python is the documented slow path.  The UDTF class is
    defined inside this function so cloudpickle ships it by value (workers
    never import this package)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="ngram: string, pos: int")
    class Bigrams:
        def eval(self, text: str):
            toks = text.split(" ")
            for i in range(len(toks) - 1):
                yield (toks[i] + " " + toks[i + 1], i + 1)

    spark.udtf.register("bigrams", Bigrams)
    docs = load_table(spark, sf_dir, "documents")
    docs.select("doc_id", normalize_text("text").alias("norm_text")).createOrReplaceTempView(
        "_bigram_docs"
    )
    return spark.sql(
        "SELECT d.doc_id, b.ngram, b.pos FROM _bigram_docs d, LATERAL bigrams(d.norm_text) b"
    )


_FINGERPRINT_ORACLE = """
SELECT doc_id,
       md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint
FROM documents
"""


@register("doc_fingerprint", oracle=_FINGERPRINT_ORACLE, tags=("datapipe", "text"))
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable per-document fingerprint (md5 of normalized text) — the join
    key for cross-snapshot dedup."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", F.md5(normalize_text("text")).alias("fingerprint"))
