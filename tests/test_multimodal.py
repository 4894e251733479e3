"""Multimodal plumbing: binary payload columns + mapInPandas feature
extraction, a REAL pure-Python image codec (PPM/BMP), and the remaining
video-codec stub clearly gated."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.datapipe.multimodal import (
    FEATURE_SCHEMA,
    IMG_H,
    IMG_W,
    byte_features,
    decode_image,
    documents_as_media,
    encode_ppm,
    q_media_image_stats,
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
    # compressed formats (JPEG magic here) remain the deployment seam
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff")
    with pytest.raises(NotImplementedError):
        resize_image(b"\xff\xd8\xff", 32, 32)
    with pytest.raises(NotImplementedError):
        sample_frames(b"\x00", 10)


# --- pure-Python PPM/BMP codec ------------------------------------------------


def _rand_img(h: int, w: int, seed: int) -> np.ndarray:
    return np.random.RandomState(seed).randint(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_ppm_round_trip():
    for seed, (h, w) in enumerate([(1, 1), (3, 5), (16, 16), (7, 31)]):
        img = _rand_img(h, w, seed)
        out = decode_image(encode_ppm(img))
        assert out.shape == (h, w, 3)
        assert np.array_equal(out, img)


def test_ppm_header_comments_and_whitespace():
    img = _rand_img(2, 3, 0)
    # the PPM spec allows comments and arbitrary whitespace between header
    # tokens; exactly one whitespace byte separates maxval from the raster
    buf = b"P6 # comment\n# another comment\n 3\t2 # dims\n255\n" + img.tobytes()
    assert np.array_equal(decode_image(buf), img)


def test_ppm_truncated_raster_raises():
    img = _rand_img(4, 4, 1)
    with pytest.raises(ValueError, match="truncated"):
        decode_image(encode_ppm(img)[:-5])


def test_ppm_only_maxval_255():
    with pytest.raises(ValueError, match="maxval"):
        decode_image(b"P6\n1 1\n65535\n\x00\x00\x00\x00\x00\x00")


def _encode_bmp24(img: np.ndarray) -> bytes:
    """Hand-built 24-bit BI_RGB BMP: bottom-up rows, BGR, 4-byte row pad —
    an independent encoder so the decoder test isn't self-referential."""
    h, w, _ = img.shape
    stride = ((w * 3 + 3) // 4) * 4
    raster = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        row = bytearray()
        for x in range(w):
            r, g, b = img[y, x]
            row += bytes([b, g, r])  # BGR
        row += b"\x00" * (stride - len(row))
        raster += row
    header = (
        b"BM"
        + (54 + len(raster)).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little")  # data offset
        + (40).to_bytes(4, "little")  # BITMAPINFOHEADER size
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)  # positive → bottom-up
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")  # bpp
        + (0).to_bytes(4, "little")  # BI_RGB
        + b"\x00" * 20
    )
    return bytes(header) + bytes(raster)


def test_bmp_decode_matches_independent_encoder():
    # w=3 exercises the 4-byte row padding (9 bytes → stride 12)
    for seed, (h, w) in enumerate([(2, 3), (5, 4), (3, 7)]):
        img = _rand_img(h, w, seed + 10)
        assert np.array_equal(decode_image(_encode_bmp24(img)), img)


def test_bmp_rejects_unsupported_variants():
    img = _rand_img(2, 2, 0)
    buf = bytearray(_encode_bmp24(img))
    buf[28:30] = (32).to_bytes(2, "little")  # 32-bpp
    with pytest.raises(NotImplementedError, match="24-bit"):
        decode_image(bytes(buf))
    with pytest.raises(ValueError, match="truncated"):
        decode_image(_encode_bmp24(img)[:-1])


def test_resize_nearest_neighbor_parity():
    img = _rand_img(16, 16, 3)
    out = decode_image(resize_image(encode_ppm(img), 8, 8))
    # floor index map: src = dst * n // m
    expect = img[(np.arange(8) * 16) // 8][:, (np.arange(8) * 16) // 8]
    assert np.array_equal(out, expect)
    # upscale repeats pixels: 2x2 → 4x4 blocks of the source pixels
    up = decode_image(resize_image(encode_ppm(_rand_img(2, 2, 4)), 4, 4))
    src = _rand_img(2, 2, 4)
    assert np.array_equal(up, src[(np.arange(4) * 2) // 4][:, (np.arange(4) * 2) // 4])


def test_media_image_stats_query(spark):
    rows = {r["media_id"]: r for r in q_media_image_stats(spark, SF_SMOKE).collect()}
    docs = load_table(spark, SF_SMOKE, "documents").count()
    assert len(rows) == docs
    j = np.arange(IMG_H * IMG_W * 3, dtype=np.int64)
    for mid in list(rows)[:5]:
        r = rows[mid]
        assert (r["width"], r["height"]) == (IMG_W, IMG_H)
        flat = (mid * 31 + j) % 256
        img = flat.reshape(IMG_H, IMG_W, 3)
        assert r["mean_r"] == img[:, :, 0].sum() / (IMG_W * IMG_H)
        assert r["mean_b"] == img[:, :, 2].sum() / (IMG_W * IMG_H)
        small = img[(np.arange(8) * IMG_H) // 8][:, (np.arange(8) * IMG_W) // 8]
        assert r["r8_mean_g"] == small[:, :, 1].sum() / 64


# --- pure-Python WAV codec ------------------------------------------------------


def test_wav_round_trip_and_chunk_scan():
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.datapipe.multimodal import (
        decode_audio,
        encode_wav,
    )

    rng = np.random.RandomState(7)
    samples = rng.randint(-32768, 32768, size=200).astype("<i2")
    out, rate = decode_audio(encode_wav(samples, 16000))
    assert rate == 16000
    assert np.array_equal(out, samples)
    # decoder must SCAN chunks, not assume a 44-byte layout: inject a LIST
    # chunk (odd size → even padding) between fmt and data
    buf = bytearray(encode_wav(samples, 8000))
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + (5).to_bytes(4, "little") + b"INFOx" + b"\x00"  # pad to even
    patched = bytes(buf[:fmt_end]) + extra + bytes(buf[fmt_end:])
    patched = patched[:4] + (len(patched) - 8).to_bytes(4, "little") + patched[8:]
    out2, rate2 = decode_audio(patched)
    assert rate2 == 8000
    assert np.array_equal(out2, samples)


def test_wav_rejects_unsupported_variants():
    import struct

    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.datapipe.multimodal import (
        decode_audio,
        encode_wav,
    )

    with pytest.raises(NotImplementedError, match="container"):
        decode_audio(b"\xff\xfb\x90\x00mp3-ish")
    buf = bytearray(encode_wav(np.zeros(4, dtype="<i2"), 8000))
    buf[22:24] = struct.pack("<H", 2)  # stereo
    with pytest.raises(NotImplementedError, match="mono"):
        decode_audio(bytes(buf))
    with pytest.raises(ValueError, match="truncated"):
        decode_audio(bytes(encode_wav(np.zeros(4, dtype="<i2"), 8000))[:-3])


def test_media_audio_stats_query(spark):
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.datapipe.multimodal import (
        AUDIO_N_SAMPLES,
        AUDIO_RATE,
        q_media_audio_stats,
    )

    rows = {r["media_id"]: r for r in q_media_audio_stats(spark, SF_SMOKE).collect()}
    docs = load_table(spark, SF_SMOKE, "documents").count()
    assert len(rows) == docs
    i = np.arange(AUDIO_N_SAMPLES, dtype=np.int64)
    for mid in list(rows)[:5]:
        x = ((mid * 7 + i * 13) % 65536) - 32768
        r = rows[mid]
        assert r["n_samples"] == AUDIO_N_SAMPLES
        assert r["duration_us"] == AUDIO_N_SAMPLES * 1_000_000 // AUDIO_RATE
        assert r["sum_pcm"] == int(x.sum())
        assert r["peak"] == int(np.abs(x).max())
        assert r["rms"] == float(np.sqrt((x * x).sum() / AUDIO_N_SAMPLES))


# --- pure-Python Y4M video demux -------------------------------------------------


def test_y4m_round_trip_and_sampling():
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.datapipe.multimodal import (
        encode_y4m,
        parse_y4m,
        sample_frames,
    )

    rng = np.random.RandomState(5)
    w, h = 4, 2
    frames = [rng.bytes(w * h * 3 // 2) for _ in range(7)]
    buf = encode_y4m(frames, w, h)
    pw, ph, got = parse_y4m(buf)
    assert (pw, ph) == (w, h)
    assert got == frames
    assert sample_frames(buf, 3) == [frames[0], frames[3], frames[6]]


def test_y4m_rejects_unsupported_and_truncated():
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.datapipe.multimodal import (
        encode_y4m,
        parse_y4m,
        sample_frames,
    )

    # compressed video stays the deployment seam
    with pytest.raises(NotImplementedError, match="container"):
        sample_frames(b"\x00\x00\x00\x18ftypmp42", 2)
    buf = encode_y4m([b"\x00" * 6], 2, 2)
    with pytest.raises(ValueError, match="truncated"):
        parse_y4m(buf[:-2])
    c422 = buf.replace(b"C420", b"C422")
    with pytest.raises(NotImplementedError, match="C420"):
        parse_y4m(c422)


def test_media_video_frame_stats_query(spark):
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.datapipe.multimodal import (
        VID_N_FRAMES,
        VID_STRIDE,
        _Y4M_FRAME_BYTES,
        q_media_video_frame_stats,
    )

    rows = q_media_video_frame_stats(spark, SF_SMOKE).collect()
    docs = load_table(spark, SF_SMOKE, "documents").count()
    kept = len([f for f in range(VID_N_FRAMES) if f % VID_STRIDE == 0])
    assert len(rows) == docs * kept
    k = np.arange(_Y4M_FRAME_BYTES, dtype=np.int64)
    sample = [r for r in rows if r["media_id"] == 7 and r["frame_idx"] == 2]
    assert len(sample) == 1
    x = (7 * 11 + 2 * 17 + k * 5) % 256
    assert sample[0]["y_mean"] == x[:16].sum() / 16
    assert sample[0]["u_mean"] == x[16:20].sum() / 4
    assert sample[0]["v_mean"] == x[20:].sum() / 4
