"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed with Arrow-batched ``mapInPandas``.

Design (the piece that must be real even where codecs are stubbed):
- media rows are ``(id, payload: binary, media_type: string, meta: struct)``;
  payloads are opaque bytes — Spark shuffles/stores them without
  interpretation, so the same plumbing carries images, audio, or video.
- feature extraction runs as ``mapInPandas``: Arrow delivers each partition
  as pandas batches, Python touches bytes only inside the batch loop, and
  the output schema is declared up front (required for Catalyst to plan
  downstream ops).
- actual codec work (JPEG decode, resampling, frame sampling) needs
  libraries not present in this container → ``decode_image`` and friends
  raise ``NotImplementedError`` with the intended contract; the deterministic
  byte-level features (size, digest) are real and oracle-checked, proving the
  schema/partitioning/UDF-signature path end-to-end.

Scale: payload bytes dominate — partition count must track *bytes* not rows
(``spark.sql.files.maxPartitionBytes``); never collect payloads; features
detach from payloads as early as possible so downstream shuffles move only
scalars.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..registry import register
from ..sources import load_table

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("digest", StringType()),
        StructField("media_type", StringType()),
    ]
)


def decode_image(payload: bytes) -> "object":
    """Decode an image payload to HxWxC uint8.  STUB: the container has no
    image codec; a deployment wires Pillow/libvips here."""
    raise NotImplementedError("image codecs not available in this environment")


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """Resize an image payload.  STUB (see ``decode_image``)."""
    raise NotImplementedError("image codecs not available in this environment")


def sample_frames(payload: bytes, every_n: int) -> list[bytes]:
    """Sample frames from a video payload.  STUB (see ``decode_image``)."""
    raise NotImplementedError("video codecs not available in this environment")


def byte_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads: size + sha-free
    md5 digest (deterministic, codec-free).  The pattern — mapInPandas with a
    declared schema, batch-local Python — is exactly what a real decode
    would use."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "digest": pdf["payload"].map(lambda b: hashlib.md5(bytes(b)).hexdigest()),
                    "media_type": pdf["media_type"],
                }
            )

    return df.mapInPandas(extract, schema=FEATURE_SCHEMA)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: treat document text bytes as opaque payloads (the container
    has no binary fixture table; utf-8 bytes are real binary as far as the
    engine is concerned)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.lit("text/plain").alias("media_type"),
        F.octet_length("text").cast("long").alias("n_bytes"),
    )


_MEDIA_ORACLE = """
SELECT doc_id AS media_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS digest,
       'text/plain' AS media_type
FROM documents
"""


@register("media_byte_features", oracle=_MEDIA_ORACLE, tags=("datapipe", "multimodal"))
def q_media_byte_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end multimodal plumbing: binary column → mapInPandas feature
    extraction, oracle-checked via the deterministic byte features."""
    docs = load_table(spark, sf_dir, "documents")
    return byte_features(documents_as_media(docs))


# --- frame manifest (1 → N expansion over binary payloads) -------------------

FRAME_BYTES = 256
FRAME_STRIDE = 2  # keep every 2nd frame (sample_frames semantics)

_FRAME_ORACLE = f"""
SELECT doc_id AS media_id,
       CAST(i AS INTEGER) AS frame_idx,
       CAST(i * {FRAME_BYTES} AS BIGINT) AS byte_offset,
       CAST(least({FRAME_BYTES}, octet_length(encode(text)) - i * {FRAME_BYTES}) AS BIGINT)
         AS frame_bytes
FROM documents,
     UNNEST(range(CAST(ceil(octet_length(encode(text)) / {FRAME_BYTES}.0) AS BIGINT))) AS u(i)
WHERE i % {FRAME_STRIDE} = 0
"""


@register("media_frame_manifest", oracle=_FRAME_ORACLE, tags=("datapipe", "multimodal"))
def q_media_frame_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling plumbing: each payload is cut into
    fixed-size frames inside an Arrow-batched ``mapInPandas`` (1 row → N
    rows over a binary column), keeping every ``FRAME_STRIDE``-th frame.

    The Python stage slices the *actual bytes* (so the batch shape, binary
    Arrow transfer, and expansion semantics are real); the emitted manifest
    (offset/length per kept frame) is deterministic from payload size, which
    is what the oracle checks.  A real video decoder drops into the same
    seam (``sample_frames`` above) with codec output replacing byte slices.
    Scale: stateless per-row expansion — no shuffle; output partitioning
    inherits the scan."""
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents")
    media = documents_as_media(docs)

    def frames(batches):
        for pdf in batches:
            ids, idxs, offs, lens = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                buf = bytes(payload)
                for i in range(0, -(-len(buf) // FRAME_BYTES), FRAME_STRIDE):
                    chunk = buf[i * FRAME_BYTES : (i + 1) * FRAME_BYTES]
                    ids.append(mid)
                    idxs.append(i)
                    offs.append(i * FRAME_BYTES)
                    lens.append(len(chunk))
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "byte_offset": offs, "frame_bytes": lens}
            )

    return media.select("media_id", "payload").mapInPandas(
        frames, schema="media_id long, frame_idx int, byte_offset long, frame_bytes long"
    )


# --- chunk-level payload dedup (storage shape) ------------------------------

CHUNK_CHARS = 128

_CHUNK_DEDUP_ORACLE = f"""
WITH chunks AS (
  SELECT doc_id AS media_id,
         md5(substr(text, CAST(i * {CHUNK_CHARS} + 1 AS INTEGER), {CHUNK_CHARS})) AS digest,
         CAST(least({CHUNK_CHARS}, length(text) - i * {CHUNK_CHARS}) AS BIGINT) AS chunk_chars
  FROM documents,
       UNNEST(range(CAST(ceil(length(text) / {CHUNK_CHARS}.0) AS BIGINT))) AS u(i)
)
SELECT digest,
       COUNT(*) AS n_copies,
       COUNT(DISTINCT media_id) AS n_media,
       any_value(chunk_chars) AS chunk_chars,
       CAST((COUNT(*) - 1) * any_value(chunk_chars) AS BIGINT) AS saved_chars
FROM chunks
GROUP BY digest
HAVING COUNT(*) >= 2
"""


@register("media_chunk_dedup", oracle=_CHUNK_DEDUP_ORACLE, tags=("datapipe", "multimodal", "dedup", "r4"))
def q_media_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level payload deduplication — the content-addressable-storage
    shape (fixed-width chunks, digest groupBy, dedup savings accounting)
    that backup/blob systems run over petabytes.  The corpus's genuine
    duplicate documents produce shared chunks, so the savings report is
    non-empty without synthetic injection.  One per-row chunk explode +
    one digest-keyed shuffle; chunk payloads never move — only digests do,
    which is the entire trick at 100 TB.  (``any_value(chunk_chars)`` is
    deterministic: equal-digest chunks are equal strings, hence equal
    lengths, bar an md5 collision.)"""
    docs = load_table(spark, sf_dir, "documents")
    n_chunks = F.ceil(F.length("text") / CHUNK_CHARS).cast("int")
    chunks = docs.select(
        F.col("doc_id").alias("media_id"),
        F.posexplode(
            F.expr(
                f"transform(sequence(0, int(ceil(length(text) / {CHUNK_CHARS}.0)) - 1),"
                f" i -> substr(text, i * {CHUNK_CHARS} + 1, {CHUNK_CHARS}))"
            )
        ).alias("i", "chunk"),
        F.length("text").alias("len"),
    ).select(
        "media_id",
        F.md5("chunk").alias("digest"),
        F.least(F.lit(CHUNK_CHARS), F.col("len") - F.col("i") * CHUNK_CHARS)
        .cast("long")
        .alias("chunk_chars"),
    )
    return (
        chunks.groupBy("digest")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.countDistinct("media_id").alias("n_media"),
            F.any_value("chunk_chars").alias("chunk_chars"),
            ((F.count(F.lit(1)) - 1) * F.any_value("chunk_chars")).cast("bigint").alias("saved_chars"),
        )
        .filter(F.col("n_copies") >= 2)
    )
