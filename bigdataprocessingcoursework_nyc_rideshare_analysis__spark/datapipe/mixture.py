"""Dataset-mixture operators for LLM training-data pipelines: per-source
temperature resampling weights and the deterministic doc-level sample that
applies them.

No reference counterpart (SURVEY.md §2.9 extension tier).  Multi-source
corpora are never trained at their natural proportions — a handful of crawl
sources dwarf the curated ones, so pipelines re-weight sources with a
temperature exponent (w_s ∝ p_s^α, α < 1 flattens the distribution; the
scheme used by multilingual/multi-corpus samplers in published LLM training
recipes).  Both queries are single-shuffle shapes that hold at 100 TB:

- ``source_mixture_weights``: one groupBy(source) over token counts (the
  per-row token count is codegen'd array math), then a 1-row total joined
  back by broadcast.  |sources| is tiny; the only corpus-sized cost is the
  scan.
- ``mixture_resample_docs``: joins the |sources|-row weight table back to
  the corpus (broadcast) and gates each doc on an md5-derived bucket —
  content-hash sampling, so the subset is reproducible across engines,
  partitionings, and retries (same rationale as ``stratified_hash_sample``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import tokens_of
from ..registry import register
from ..sources import load_table
from .stage import staged_features

#: Temperature exponent: w_s ∝ p_s^alpha (alpha=1 → natural mix, 0 → uniform).
MIXTURE_ALPHA = 0.7

#: Global budget as a fraction of the natural corpus: the resampled corpus
#: targets ``BUDGET_FRAC × total_tokens`` tokens, allocated by weight.
BUDGET_FRAC = 0.5

_WEIGHTS_ORACLE = f"""
WITH per_source AS (
  SELECT source,
         COUNT(*) AS n_docs,
         SUM(len(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '))) AS n_tokens
  FROM documents
  GROUP BY source
), tot AS (
  SELECT SUM(n_tokens) AS total_tokens, SUM(POW(CAST(n_tokens AS DOUBLE), {MIXTURE_ALPHA})) AS z
  FROM per_source
)
SELECT source,
       n_docs,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_tokens AS DOUBLE) / total_tokens AS p_natural,
       ROUND(POW(CAST(n_tokens AS DOUBLE), {MIXTURE_ALPHA}) / z, 12) AS weight,
       ROUND((POW(CAST(n_tokens AS DOUBLE), {MIXTURE_ALPHA}) / z)
         / (CAST(n_tokens AS DOUBLE) / total_tokens), 12) AS epochs
FROM per_source, tot
ORDER BY source
"""


def source_token_stats(docs: DataFrame) -> DataFrame:
    """(source, n_docs, n_tokens) — the one corpus-sized pass.  Accepts raw
    ``documents`` or the staged feature frame (pre-tokenized ``toks``)."""
    return (
        docs.select("source", F.size(tokens_of(docs)).alias("n_tok"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
        )
    )


def mixture_weights(docs: DataFrame, alpha: float = MIXTURE_ALPHA) -> DataFrame:
    """Temperature-resampled source weights: w_s = n_s^α / Σ n^α, plus the
    natural share and the implied epoch multiplier (w_s / p_s > 1 means the
    source is over-sampled relative to its natural size)."""
    per_source = source_token_stats(docs)
    tot = per_source.agg(
        F.sum("n_tokens").alias("total_tokens"),
        F.sum(F.pow(F.col("n_tokens").cast("double"), F.lit(alpha))).alias("z"),
    )
    p_nat = F.col("n_tokens").cast("double") / F.col("total_tokens")
    w = F.pow(F.col("n_tokens").cast("double"), F.lit(alpha)) / F.col("z")
    return (
        per_source.join(F.broadcast(tot))  # 1-row totals: broadcast cross join
        .select(
            "source",
            "n_docs",
            "n_tokens",
            p_nat.alias("p_natural"),
            # Math.pow (JVM) and pow (C) may differ in the last ulp; one
            # 12-dp rounding in both engines pins the published artifact.
            F.round(w, 12).alias("weight"),
            F.round(w / p_nat, 12).alias("epochs"),
        )
        .orderBy("source")
    )


@register("source_mixture_weights", oracle=_WEIGHTS_ORACLE, tags=("datapipe", "mixture", "r4"))
def q_source_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source temperature resampling weights (α=0.7) over the corpus,
    via the staged token frame (shared tokenize-once scan)."""
    return mixture_weights(staged_features(spark, sf_dir))


_RESAMPLE_ORACLE = f"""
WITH per_source AS (
  SELECT source,
         SUM(len(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '))) AS n_tokens
  FROM documents
  GROUP BY source
), tot AS (
  SELECT SUM(n_tokens) AS total_tokens, SUM(POW(CAST(n_tokens AS DOUBLE), {MIXTURE_ALPHA})) AS z
  FROM per_source
), rates AS (
  SELECT source,
         CAST(ROUND(LEAST(1.0,
               {BUDGET_FRAC} * ROUND((POW(CAST(n_tokens AS DOUBLE), {MIXTURE_ALPHA}) / z)
                 / (CAST(n_tokens AS DOUBLE) / total_tokens), 12)) * 1000, 0) AS INTEGER) AS keep_per_mille
  FROM per_source, tot
)
SELECT d.doc_id, d.source, r.keep_per_mille
FROM documents d JOIN rates r USING (source)
WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000
      < r.keep_per_mille
"""


@register("mixture_resample_docs", oracle=_RESAMPLE_ORACLE, tags=("datapipe", "mixture", "r4"))
def q_mixture_resample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the mixture weights as a deterministic doc-level sample.

    Each source's keep-rate is ``min(1, BUDGET_FRAC × epochs_s)`` — the
    token budget allocated by weight, expressed as a per-mille integer
    threshold (rounded once, so both engines gate on the same integer) — and
    a doc survives iff its md5 bucket falls under the threshold.  Plan: the
    |sources|-row rate table broadcast-joins back to the corpus; the gate is
    a stateless filter.  Sources whose epochs exceed 1/BUDGET_FRAC keep
    everything (up-sampling beyond 1.0 is repetition, handled at batch
    assembly, not here)."""
    docs = staged_features(spark, sf_dir)
    rates = mixture_weights(docs).select(
        "source",
        F.round(F.least(F.lit(1.0), F.lit(BUDGET_FRAC) * F.col("epochs")) * 1000, 0)
        .cast("int")
        .alias("keep_per_mille"),
    )
    bucket = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
        "bigint"
    ) % 1000
    return (
        docs.join(F.broadcast(rates), "source")
        .filter(bucket < F.col("keep_per_mille"))
        .select("doc_id", "source", "keep_per_mille")
    )


# --- loader-side shard manifest ---------------------------------------------

N_SHARDS = 8

_SHARD_ORACLE = f"""
WITH keyed AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS shuffle_key
  FROM documents
)
SELECT doc_id,
       CAST(shuffle_key % {N_SHARDS} AS INTEGER) AS shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY shuffle_key % {N_SHARDS}
                               ORDER BY shuffle_key, doc_id) AS BIGINT) AS position
FROM keyed
"""


@register("training_shard_manifest", oracle=_SHARD_ORACLE, tags=("datapipe", "mixture", "loader", "r4"))
def q_training_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle for the training data loader: every doc
    gets a shard and a position within it, both derived from a content
    hash — reproducible across runs/engines/partitionings, which a resumable
    training job requires (step N must mean the same examples everywhere).

    The 100 TB point: a uniform random *global* order normally means a
    global sort.  Hashing first makes the order pseudo-random, so sorting
    WITHIN hash-assigned shards is equivalent — one hash exchange on the
    shard id plus per-shard sorts, never a single-partition global sort.
    (doc_id breaks md5-prefix ties deterministically.)"""
    docs = load_table(spark, sf_dir, "documents")
    shuffle_key = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("bigint")
    keyed = docs.select("doc_id", shuffle_key.alias("shuffle_key"))
    shard = (F.col("shuffle_key") % N_SHARDS).cast("int")
    w = Window.partitionBy(shard).orderBy("shuffle_key", "doc_id")
    return keyed.select(
        "doc_id",
        shard.alias("shard"),
        F.row_number().over(w).cast("bigint").alias("position"),
    )


# --- deterministic weighted sampling (Efraimidis–Spirakis) ------------------

WEIGHTED_SAMPLE_K = 200

_WSAMPLE_ORACLE = f"""
WITH keyed AS (
  SELECT doc_id, source, n_chars,
         ROUND(ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) + 1)
                  / 4294967297.0) / n_chars, 12) AS sort_key
  FROM documents
  WHERE n_chars > 0
)
SELECT doc_id, source, n_chars, sort_key
FROM keyed
ORDER BY sort_key DESC, doc_id ASC
LIMIT {WEIGHTED_SAMPLE_K}
"""


@register("weighted_doc_sample", oracle=_WSAMPLE_ORACLE, tags=("datapipe", "mixture", "sampling", "r4"))
def q_weighted_doc_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement, deterministically: the
    Efraimidis–Spirakis A-ES scheme (key = u^(1/w), keep the top-k keys)
    with the uniform u derived from a content hash instead of an RNG — so
    the sample is weighted by ``n_chars`` AND reproducible across engines,
    runs, and partitionings (ln(u)/w is monotone in u^(1/w); 12-dp
    rounding pins ln-ulp drift, doc_id breaks residual ties).

    The scale shape is the published one: the key is a per-row expression,
    and top-k by key is ``TakeOrderedAndProject`` — per-partition heaps +
    a k-row driver merge, never a global sort."""
    docs = load_table(spark, sf_dir, "documents")
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast("bigint")
        + 1
    ) / F.lit(4294967297.0)
    key = F.round(F.log(u) / F.col("n_chars"), 12)
    return (
        docs.filter(F.col("n_chars") > 0)
        .select("doc_id", "source", "n_chars", key.alias("sort_key"))
        .orderBy(F.desc("sort_key"), F.asc("doc_id"))
        .limit(WEIGHTED_SAMPLE_K)
    )


# --- DSIR: hashed-n-gram importance weights -----------------------------------

#: The curated target domain: importance weights rank raw docs by how
#: target-like their hashed unigram profile is.
DSIR_TARGET_SOURCES = ("src0", "src1", "src2", "src3")
#: Hash-feature buckets (first two md5 hex chars → 256 buckets).
DSIR_BUCKETS = 256
#: Laplace smoothing mass per bucket.
DSIR_ALPHA = 1.0

_DSIR_SRC_SQL = ", ".join(f"'{s}'" for s in DSIR_TARGET_SOURCES)

_DSIR_ORACLE = f"""
WITH t AS (
  SELECT doc_id, source,
         string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS toks
  FROM documents
), b AS (
  SELECT doc_id, source, substr(md5(term), 1, 2) AS bucket, COUNT(*) AS c
  FROM (SELECT doc_id, source, unnest(toks) AS term FROM t) x
  GROUP BY 1, 2, 3
),
raw AS (SELECT bucket, SUM(c) AS rc FROM b GROUP BY 1),
tgt AS (SELECT bucket, SUM(c) AS tc FROM b WHERE source IN ({_DSIR_SRC_SQL}) GROUP BY 1),
tot AS (
  SELECT (SELECT SUM(c) FROM b) AS rn,
         (SELECT SUM(c) FROM b WHERE source IN ({_DSIR_SRC_SQL})) AS tn
)
SELECT b.doc_id,
       MAX(b.source) AS source,
       CAST(SUM(b.c) AS BIGINT) AS n_toks,
       ROUND(CAST(SUM(CAST(b.c * (ln((COALESCE(tgt.tc, 0) + {DSIR_ALPHA}) / (tot.tn + {DSIR_ALPHA} * {DSIR_BUCKETS}))
                                  - ln((raw.rc + {DSIR_ALPHA}) / (tot.rn + {DSIR_ALPHA} * {DSIR_BUCKETS})))
                       AS DECIMAL(28,15))) AS DOUBLE), 9)
         AS dsir_logweight
FROM b
JOIN raw ON raw.bucket = b.bucket
LEFT JOIN tgt ON tgt.bucket = b.bucket
CROSS JOIN tot
GROUP BY b.doc_id
"""


@register("dsir_importance_weights", oracle=_DSIR_ORACLE, tags=("datapipe", "mixture", "selection", "r8"))
def q_dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (Xie et al., NeurIPS 2023: Data Selection
    via Importance Resampling): score every raw document by the
    log-likelihood ratio of its HASHED unigram profile under a target-domain
    bag-of-buckets LM vs the raw-corpus LM — the published recipe for
    selecting pretraining data that "looks like" a curated domain without
    training a classifier.  Features are md5-bucketed unigrams
    ({DSIR_BUCKETS} buckets, first two hex chars — cross-engine stable, the
    hashing trick bounds the LM at a constant size regardless of
    vocabulary), both bucket LMs are Laplace-smoothed (α={DSIR_ALPHA}), and
    log w(d) = Σ_b c_db·(ln p_target(b) − ln p_raw(b)).  Downstream,
    ``mixture_resample_docs``'s content-hash gate applied to a
    softmax/top-quantile of these weights IS the resampling step; the
    weights table here is the reusable artifact.

    Determinism: bucket counts are exact int64 on both engines (md5 on
    identical normalized tokens); each log term is a fixed IEEE parse tree,
    CAST to DECIMAL(28,15) per term so the per-doc sum is an exact decimal
    accumulation — order-free regardless of partial-aggregation order (the
    ``source_token_entropy`` discipline; a raw double SUM would depend on
    shuffle arrival order) — then rounded once at 9 dp.  Scale shape: one explode→groupBy over (doc,
    bucket) — output bounded by |docs|·{DSIR_BUCKETS}, not vocabulary —
    then two {DSIR_BUCKETS}-row LM tables and a 1-row totals frame, all
    broadcast back; no corpus-sized shuffle beyond the bucket-count
    aggregate.  At 100 TB the LM tables are still {DSIR_BUCKETS} rows:
    the method's whole point is that target-likeness scoring stays
    embarrassingly parallel."""
    docs = staged_features(spark, sf_dir)
    is_target = F.col("source").isin(*DSIR_TARGET_SOURCES)
    b = (
        docs.select("doc_id", "source", F.explode(tokens_of(docs)).alias("term"))
        .withColumn("bucket", F.substring(F.md5("term"), 1, 2))
        .groupBy("doc_id", "source", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # ONE conditional aggregate builds both LMs (raw + target) from b, and
    # the totals roll up from the 256-row LM frame — separate raw/tgt/tot
    # branches would recompute the corpus explode per branch (8 shuffles,
    # 4 corpus passes in the earlier plan; now 2 passes over b's lineage)
    lm = b.groupBy("bucket").agg(
        F.sum("c").alias("rc"),
        F.sum(F.when(is_target, F.col("c")).otherwise(F.lit(0))).alias("tc"),
    )
    tot = lm.agg(
        F.sum("rc").alias("rn"),
        F.sum("tc").alias("tn"),
    )  # 1 row off the {DSIR_BUCKETS}-row LM frame, broadcast, lazy
    alpha, nb = DSIR_ALPHA, DSIR_BUCKETS
    term = F.col("c") * (
        F.log((F.col("tc") + alpha) / (F.col("tn") + alpha * nb))
        - F.log((F.col("rc") + alpha) / (F.col("rn") + alpha * nb))
    )
    return (
        b.join(F.broadcast(lm), "bucket")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.max("source").alias("source"),
            F.sum("c").cast("long").alias("n_toks"),
            F.round(F.sum(term.cast("decimal(28,15)")).cast("double"), 9).alias(
                "dsir_logweight"
            ),
        )
    )


# --- length-distribution-matched resampling ------------------------------------

#: reference split: every LENMATCH_REF_MOD-th doc plays the target corpus
#: whose token-length profile the pool is resampled to match
LENMATCH_REF_MOD = 5
LENMATCH_BUCKET = 16  # tokens per length bucket

_LENMATCH_ORACLE = f"""
WITH t AS (
  SELECT doc_id,
         CAST(len(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS BIGINT) AS n
  FROM documents
), b AS (
  SELECT doc_id, CAST(n // {LENMATCH_BUCKET} AS BIGINT) AS bucket,
         doc_id % {LENMATCH_REF_MOD} = 0 AS is_ref
  FROM t
), rc AS (SELECT bucket, COUNT(*) AS c FROM b WHERE is_ref GROUP BY 1),
pc AS (SELECT bucket, COUNT(*) AS c FROM b WHERE NOT is_ref GROUP BY 1),
tots AS (SELECT (SELECT SUM(c) FROM rc) AS rt, (SELECT SUM(c) FROM pc) AS pt),
ratio AS (
  SELECT p.bucket,
         ROUND(CAST(COALESCE(r.c, 0) * pt AS DOUBLE) / CAST(rt * p.c AS DOUBLE), 12) AS r
  FROM pc p LEFT JOIN rc r USING (bucket), tots
), mx AS (SELECT MAX(r) AS m FROM ratio),
rates AS (
  SELECT bucket, CAST(ROUND(r / m * 1000, 0) AS INTEGER) AS keep_per_mille
  FROM ratio, mx
)
SELECT b.doc_id, b.bucket, rates.keep_per_mille
FROM b JOIN rates USING (bucket)
WHERE NOT b.is_ref
  AND CAST(('0x' || substr(md5(CAST(b.doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000
      < rates.keep_per_mille
"""


@register(
    "length_matched_resample",
    oracle=_LENMATCH_ORACLE,
    tags=("datapipe", "mixture", "sampling", "r12"),
)
def q_length_matched_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-matched rejection sampling: resample the training pool
    so its token-LENGTH profile matches a reference split's — the
    curation move when pretraining data must mirror a target domain's
    shape (SFT length profile, an eval suite, a high-quality seed corpus)
    rather than just flatten sources (``mixture_resample_docs``) or
    reweight by n-gram likelihood (``dsir_importance_weights``).

    Per length bucket, acceptance ∝ ref_share / pool_share, normalized so
    the most-underrepresented bucket keeps everything (the standard
    scale-to-max rejection rule — no bucket needs up-sampling, which is
    repetition and belongs to batch assembly).  The rate becomes a rounded
    per-mille integer and a doc survives iff its md5 bucket falls under
    it — the same deterministic threshold contract as the mixture
    resampler, so both engines gate on identical integers.

    Plan: two |buckets|-row aggregates off the staged token frame, a 1-row
    max, everything broadcast back onto one corpus scan with a stateless
    filter — no data-sized shuffle anywhere."""
    feat = staged_features(spark, sf_dir)
    b = feat.select(
        "doc_id",
        (F.size("toks").cast("long") / LENMATCH_BUCKET).cast("long").alias("bucket"),
        (F.col("doc_id") % LENMATCH_REF_MOD == 0).alias("is_ref"),
    )
    rc = b.filter("is_ref").groupBy("bucket").agg(F.count(F.lit(1)).alias("rc"))
    pc = b.filter(~F.col("is_ref")).groupBy("bucket").agg(F.count(F.lit(1)).alias("pc"))
    tots = F.broadcast(
        rc.agg(F.sum("rc").alias("rt")).crossJoin(pc.agg(F.sum("pc").alias("pt")))
    )
    ratio = (
        pc.join(rc, "bucket", "left")
        .crossJoin(tots)
        .select(
            "bucket",
            F.round(
                (F.coalesce(F.col("rc"), F.lit(0)) * F.col("pt")).cast("double")
                / (F.col("rt") * F.col("pc")).cast("double"),
                12,
            ).alias("r"),
        )
    )
    mx = F.broadcast(ratio.agg(F.max("r").alias("m")))
    rates = ratio.crossJoin(mx).select(
        "bucket",
        F.round(F.col("r") / F.col("m") * 1000, 0).cast("int").alias("keep_per_mille"),
    )
    gate = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
        "bigint"
    ) % 1000
    return (
        b.filter(~F.col("is_ref"))
        .join(F.broadcast(rates), "bucket")
        .filter(gate < F.col("keep_per_mille"))
        .select("doc_id", "bucket", "keep_per_mille")
    )


# --- water-filling source caps ---------------------------------------------------

WATERFILL_BUDGET_FRAC = 0.5  # global token budget as a fraction of the corpus

_WATERFILL_ORACLE = f"""
WITH per_source AS (
  SELECT source,
         CAST(SUM(len(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
), b AS (
  SELECT CAST(floor(SUM(n_tokens) * {WATERFILL_BUDGET_FRAC}) AS BIGINT) AS budget,
         CAST(COUNT(*) AS BIGINT) AS n_src,
         CAST(MAX(n_tokens) AS BIGINT) AS max_tok
  FROM per_source
), ordered AS (
  SELECT source, n_tokens,
         ROW_NUMBER() OVER (ORDER BY n_tokens ASC, source ASC) AS k,
         SUM(n_tokens) OVER (ORDER BY n_tokens ASC, source ASC
                             ROWS UNBOUNDED PRECEDING) AS prefix
  FROM per_source
), feasible AS (
  SELECT o.k, (o.prefix - o.n_tokens + (b.n_src - o.k + 1) * o.n_tokens) >= b.budget AS full_at_k,
         o.prefix - o.n_tokens AS prefix_before, o.n_tokens
  FROM ordered o, b
), kstar AS (
  SELECT MIN(k) AS k FROM feasible WHERE full_at_k
), cap AS (
  SELECT CASE WHEN kstar.k IS NULL THEN CAST(b.max_tok AS DOUBLE)
              ELSE (b.budget - f.prefix_before) / CAST(b.n_src - kstar.k + 1 AS DOUBLE)
         END AS c
  FROM b LEFT JOIN kstar ON TRUE LEFT JOIN feasible f ON f.k = kstar.k
)
SELECT p.source, p.n_tokens,
       ROUND(cap.c, 9) AS cap_tokens,
       ROUND(LEAST(CAST(p.n_tokens AS DOUBLE), cap.c), 9) AS alloc_tokens,
       ROUND(LEAST(CAST(p.n_tokens AS DOUBLE), cap.c) / p.n_tokens, 9) AS kept_frac
FROM per_source p, cap
"""


@register(
    "waterfill_source_caps",
    oracle=_WATERFILL_ORACLE,
    tags=("datapipe", "mixture", "r12"),
)
def q_waterfill_source_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Water-filling token-budget allocation across sources: find the cap c
    with Σ_s min(tokens_s, c) = budget and give every source min(tokens_s,
    c) — the max-min-fair answer to "we can afford {WATERFILL_BUDGET_FRAC:.0%}
    of the corpus; which sources shrink?"  Small sources keep everything,
    the largest are clipped to one common water level — the cap-allocation
    complement of the temperature weights (which RESHAPE shares; this
    ENFORCES a budget fairly).

    Closed form, no iteration: sort sources by size ascending; the first
    index k where prefix_{{k-1}} + (n−k+1)·tokens_k ≥ budget brackets the
    water level, and c = (budget − prefix_{{k-1}}) / (n−k+1).  All windows
    and joins run on the |sources|-row aggregate — the corpus is touched by
    ONE token-count scan; everything after is broadcast-sized.  Exact: the
    bracketing uses integer sums; c is one double division, rounded 9 dp on
    both engines."""
    from .stage import staged_features

    per_source = (
        staged_features(spark, sf_dir)
        .groupBy("source")
        .agg(F.sum(F.size("toks").cast("long")).alias("n_tokens"))
    )
    b = F.broadcast(
        per_source.agg(
            F.floor(F.sum("n_tokens") * WATERFILL_BUDGET_FRAC).cast("long").alias("budget"),
            F.count(F.lit(1)).alias("n_src"),
            F.max("n_tokens").alias("max_tok"),
        )
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.asc("n_tokens"), F.asc("source"))
    ordered = per_source.select(
        "source",
        "n_tokens",
        F.row_number().over(w).alias("k"),
        F.sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).alias("prefix"),
    )
    feas = ordered.crossJoin(b).withColumn(
        "full_at_k",
        (F.col("prefix") - F.col("n_tokens") + (F.col("n_src") - F.col("k") + 1) * F.col("n_tokens"))
        >= F.col("budget"),
    )
    kstar = F.broadcast(feas.filter("full_at_k").agg(F.min("k").alias("kstar")))
    cap = F.broadcast(
        feas.crossJoin(kstar)
        .filter(F.col("k") == F.col("kstar"))
        .select(
            ((F.col("budget") - (F.col("prefix") - F.col("n_tokens")))
             / (F.col("n_src") - F.col("kstar") + 1).cast("double")).alias("c")
        )
        .unionByName(
            # budget >= total corpus: no k qualifies... (kstar empty) — cap at max
            kstar.crossJoin(b)
            .filter(F.col("kstar").isNull())
            .select(F.col("max_tok").cast("double").alias("c"))
        )
    )
    alloc = F.least(F.col("n_tokens").cast("double"), F.col("c"))
    return per_source.crossJoin(cap).select(
        "source",
        "n_tokens",
        F.round(F.col("c"), 9).alias("cap_tokens"),
        F.round(alloc, 9).alias("alloc_tokens"),
        F.round(alloc / F.col("n_tokens"), 9).alias("kept_frac"),
    )
