"""Multimodal plumbing: binary payload columns + mapInPandas feature
extraction, with codec stubs clearly gated."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.datapipe.multimodal import (
    FEATURE_SCHEMA,
    byte_features,
    decode_image,
    documents_as_media,
    resize_image,
    sample_frames,
)
from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.sources import load_table

from .conftest import SF_SMOKE


def test_byte_features_schema_and_values(spark):
    docs = load_table(spark, SF_SMOKE, "documents").limit(20)
    media = documents_as_media(docs)
    assert dict(media.dtypes)["payload"] == "binary"
    feats = byte_features(media)
    assert feats.schema == FEATURE_SCHEMA
    rows = {r["media_id"]: r for r in feats.collect()}
    src = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert rows.keys() == src.keys()
    for doc_id, text in src.items():
        raw = text.encode("utf-8")
        assert rows[doc_id]["n_bytes"] == len(raw)
        assert rows[doc_id]["digest"] == hashlib.md5(raw).hexdigest()
        assert rows[doc_id]["media_type"] == "text/plain"


def test_codec_stubs_are_gated(spark):
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff")
    with pytest.raises(NotImplementedError):
        resize_image(b"\xff\xd8\xff", 32, 32)
    with pytest.raises(NotImplementedError):
        sample_frames(b"\x00", 10)
