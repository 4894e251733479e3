"""Text column expressions used by the datapipe (dedup / quality / lang-id).

Everything here is built from JVM-side ``pyspark.sql.functions`` — no Python
UDFs — so the hot path stays inside whole-stage codegen and the same logic is
expressible as the DuckDB oracle SQL (see ``datapipe``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_text(col: Column | str) -> Column:
    """Lowercase, trim, collapse internal whitespace — the canonical form
    hashed for exact dedup (mirrors ``regexp_replace(lower(trim(x)),'\\s+',' ')``
    in the oracle)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")


def tokens_col(col: Column | str) -> Column:
    """Whitespace tokenization of normalized text → array<string>."""
    return F.split(normalize_text(col), " ")


def shingles_col(col: Column | str, k: int = 3) -> Column:
    """k-token shingles (``k``-grams over words) → array<string>.

    Built declaratively: ``transform(sequence(1, n-k+1), i -> concat_ws(' ',
    tokens[i..i+k-1]))`` with 1-based ``element_at`` — the exact construction
    the DuckDB oracle uses (``list_transform(range(1, n-k+2), ...)``; Spark's
    ``sequence`` is end-inclusive, DuckDB's ``range`` end-exclusive), so
    shingle sets agree between engines.  Documents shorter than ``k`` tokens
    yield an empty array (guarded: ``sequence(1, 0)`` would *descend*).

    PERFORMANCE: pass an already-materialized ``array<string>`` *column* of
    tokens, not raw text.  Referencing ``tokens_col(text)`` here inlines the
    regex+split into every ``element_at`` — Catalyst does not CSE across the
    lambda, so a k=3 shingle recomputes the tokenization 3× per index (a
    measured ~7× slowdown on 500-char docs).  ``shingles_from_text`` below
    is the safe two-step helper.
    """
    toks = F.col(col) if isinstance(col, str) else col
    idx = F.when(
        F.size(toks) >= k, F.sequence(F.lit(1), F.size(toks) - (k - 1))
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(k)]),
    )


def tokens_of(df) -> Column:
    """Token array for a corpus frame: the pre-tokenized ``toks`` column
    when the frame is the staged feature table (``datapipe.stage``), else
    tokenize ``text`` in place.  Lets operators accept either raw
    ``documents`` (tests, ad-hoc) or the staged frame (the shared-scan
    path every registered text query routes through)."""
    return F.col("toks") if "toks" in df.columns else tokens_col("text")
