"""Boilerplate removal for LLM training corpora: corpus-level segment-hash
deduplication (the CCNet-style line/paragraph dedup adapted to unstructured
text) and the hot-segment report that shows what it removed.

No reference counterpart (SURVEY.md §2.9 extension tier).  Web corpora are
full of repeated non-content text — navigation chrome, cookie banners,
license footers — that exact *document* dedup never touches because every
page differs somewhere.  The published fix (CCNet, and the line-dedup pass
in most open-corpus pipelines) hashes each line/paragraph and drops those
whose hash recurs across many documents.  The synthetic corpus has no
newlines, so the unit here is a fixed-width token segment (``SEG_TOKENS``),
which is also the honest 100 TB shape: segmentation is per-row array math,
the global frequency table is ONE hash-keyed shuffle over segments, and the
verdict joins back by segment hash.  Hot boilerplate hashes are exactly the
keys AQE's skew-join split handles.

As with ``pii_scrub_docs``, the corpus carries no real boilerplate, so the
queries first prepend a deterministic per-source banner (aligned to one
segment) — proving differentially, against the oracle, that removal fires.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import tokens_col
from ..registry import register
from .stage import staged_segments

#: Tokens per segment (the dedup unit).
SEG_TOKENS = 16
#: A segment recurring in >= this many distinct docs is boilerplate.
BOILERPLATE_MIN_DOCS = 4

#: Exactly SEG_TOKENS tokens once the source name is spliced in, so the
#: banner occupies segment 0 on its own and is identical across each
#: source's documents.
_BANNER_PREFIX = "all rights reserved visit the "
_BANNER_SUFFIX = " portal subscribe to our newsletter for daily updates terms apply "

_SEGMENTS_CTE = f"""
WITH raw AS (
  SELECT doc_id,
         'all rights reserved visit the ' || source ||
         ' portal subscribe to our newsletter for daily updates terms apply ' || text AS raw_text
  FROM documents
), t AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(trim(raw_text)), '\\s+', ' ', 'g'), ' ') AS toks
  FROM raw
), g AS (
  SELECT doc_id,
         list_transform(range(0, CAST(ceil(len(toks) / {SEG_TOKENS}.0) AS INT)),
                        i -> array_to_string(toks[i*{SEG_TOKENS}+1 : i*{SEG_TOKENS}+{SEG_TOKENS}], ' ')) AS segs
  FROM t
), s AS (
  SELECT doc_id, unnest(range(0, len(segs))) AS seg_idx, unnest(segs) AS seg FROM g
), freq AS (
  SELECT md5(seg) AS h, COUNT(DISTINCT doc_id) AS df, COUNT(*) AS occurrences
  FROM s GROUP BY 1
)
"""

_DEDUP_ORACLE = _SEGMENTS_CTE + f"""
SELECT s.doc_id,
       COUNT(*) AS n_segs,
       CAST(SUM(CASE WHEN f.df >= {BOILERPLATE_MIN_DOCS} THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
       COALESCE(string_agg(CASE WHEN f.df < {BOILERPLATE_MIN_DOCS} THEN s.seg END,
                           ' ' ORDER BY s.seg_idx), '') AS kept_text
FROM s JOIN freq f ON md5(s.seg) = f.h
GROUP BY s.doc_id
"""

_HOT_ORACLE = _SEGMENTS_CTE + f"""
SELECT any_value(s.seg) AS seg, f.df, f.occurrences
FROM freq f JOIN s ON md5(s.seg) = f.h
WHERE f.df >= {BOILERPLATE_MIN_DOCS}
GROUP BY f.h, f.df, f.occurrences
ORDER BY f.df DESC, seg ASC
LIMIT 20
"""


def _bannered_tokens(docs: DataFrame) -> Column:
    """Token array of banner+text.  On the staged frame the banner tokens
    are prepended as an array to the pre-tokenized ``toks`` (no re-tokenize
    of the corpus); on raw documents the concatenated string is tokenized
    in place.  Both normalize identically — the banner is already
    lowercase single-spaced."""
    banner = F.split(
        F.concat(F.lit(_BANNER_PREFIX), F.col("source"), F.lit(_BANNER_SUFFIX.rstrip())),
        " ",
    )
    if "toks" in docs.columns:
        # a fully-empty text stages as [""] — drop the empty token so the
        # result matches tokenizing the concatenated string (which trims)
        return F.concat(banner, F.filter(F.col("toks"), lambda x: x != F.lit("")))
    return tokens_col(
        F.concat(F.lit(_BANNER_PREFIX), F.col("source"), F.lit(_BANNER_SUFFIX), F.col("text"))
    )


def segment_table(docs: DataFrame, width: int = SEG_TOKENS) -> DataFrame:
    """(doc_id, seg_idx, seg): fixed-width token segments of the bannered
    corpus.  Per-row array math only — the corpus-sized explode feeds the
    one shuffle downstream."""
    toks = _bannered_tokens(docs)
    segged = docs.select(
        "doc_id",
        F.transform(
            F.sequence(F.lit(0), F.ceil(F.size(toks) / width).cast("int") - 1),
            lambda i: F.concat_ws(
                " ", F.slice(toks, i * width + 1, width)
            ),
        ).alias("segs"),
    )
    return segged.select(
        "doc_id",
        F.posexplode("segs").alias("seg_idx", "seg"),
    )


def segment_frequencies(segments: DataFrame) -> DataFrame:
    """(h, df, occurrences): corpus-wide per-segment-hash document
    frequency.  The one hash-keyed shuffle; hot boilerplate hashes are the
    skewed keys AQE splits."""
    return (
        segments.groupBy(F.md5("seg").alias("h"))
        .agg(
            F.countDistinct("doc_id").alias("df"),
            F.count(F.lit(1)).alias("occurrences"),
        )
    )


@register("boilerplate_segment_dedup", oracle=_DEDUP_ORACLE, tags=("datapipe", "boilerplate", "r4"))
def q_boilerplate_segment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Remove segments recurring in >= ``BOILERPLATE_MIN_DOCS`` distinct
    docs; reassemble each document from its kept segments in order.

    Plan: segment explode → global hash-frequency agg → join back on the
    segment hash → one per-doc groupBy reassembling ``kept_text``.  Two
    shuffles total (frequency agg, per-doc regroup); no driver round-trip;
    every stage keys on a hash, so partitioning stays uniform at 100 TB.
    Segments build from the staged token frame (tokenize-once), are hashed
    ONCE, and are staged to parquet (``staged_segments``) so the frequency
    branch and the join-back branch don't each re-run the scan + banner +
    explode (the segment frame feeds both sides of its own self-join —
    measured ~2× cold) — staged rather than ``persist()``-ed so nothing
    cached outlives the query (round-3 advice: the old persist leaked a
    cached frame per invocation for the session's lifetime)."""
    segs = staged_segments(spark, sf_dir)
    freq = segs.groupBy("h").agg(
        F.countDistinct("doc_id").alias("df"),
        F.count(F.lit(1)).alias("occurrences"),
    )
    keep = F.col("df") < BOILERPLATE_MIN_DOCS
    flagged = segs.join(freq, "h").select(
        "doc_id", "seg_idx", "seg", keep.alias("keep")
    )
    kept_struct = F.when(F.col("keep"), F.struct("seg_idx", "seg"))
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_segs"),
        F.sum(F.when(F.col("keep"), 0).otherwise(1)).alias("n_removed"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(kept_struct)), lambda x: x["seg"]
            ),
            " ",
        ).alias("kept_text"),
    )


@register("boilerplate_hot_segments", oracle=_HOT_ORACLE, tags=("datapipe", "boilerplate", "r4"))
def q_boilerplate_hot_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The top-20 boilerplate segments by document frequency — the report a
    curation run ships alongside the scrubbed corpus (what got cut, and how
    widespread it was).  Reuses the frequency table; the join back to one
    exemplar segment string per hash stays hash-keyed."""
    segs = staged_segments(spark, sf_dir)
    freq = (
        segs.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("df"), F.count(F.lit(1)).alias("occurrences"))
        .filter(F.col("df") >= BOILERPLATE_MIN_DOCS)
    )
    return (
        freq.join(segs, "h")
        .groupBy("h", "df", "occurrences")
        .agg(F.any_value("seg").alias("seg"))
        .select("seg", "df", "occurrences")
        .orderBy(F.desc("df"), F.asc("seg"))
        .limit(20)
    )
