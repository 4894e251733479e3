"""sf0.001 golden rows + constructed-pair replica for the round-8 video
perceptual near-dup tier (round-7 verdict item 2) — same discipline as
``test_golden_r7.py``: pin the EXACT output at sf0.001; regenerate only on
a deliberate semantic change (hash geometry, banding, thresholds).
"""

from __future__ import annotations

from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.registry import load_all

SF_SMOKE = "/root/testdata/sf0.001"

# media_video_neardup_phash: the pair set is precisely the constructed twins
# (media_a % 4 == 0, media_b = media_a + VARIANT_OFFSET, doc_ids 0..496),
# all 3 kept frames aligned; total_hamming is the bits the one-byte Y-plane
# bump flips in frame VPH_TWIN_FRAME's dHash (0 when the +16 stays on the
# same side of both neighbour comparisons, else 1-2).
_VIDEO_HAMMING = {
    # regenerated for the 16x16 Y plane (the full-dHash-entropy fix the
    # sf10 scaling point forced; see multimodal.py's VPH_W note)
    44: 1, 56: 2, 76: 2, 84: 1, 100: 2, 104: 2, 116: 2, 140: 2, 232: 2,
    236: 1, 244: 1, 264: 1, 280: 1, 308: 2, 344: 1, 348: 1, 356: 1,
    376: 2, 388: 2, 416: 1, 420: 1, 432: 1, 444: 2, 464: 1, 480: 1,
    496: 1,
}


def test_media_video_neardup_golden_rows(spark):
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.datapipe.multimodal import (
        VARIANT_MOD,
        VARIANT_OFFSET,
        VPH_KEPT,
    )

    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.datapipe.multimodal import (
        media_video_neardup_detail,
    )

    rows = sorted(
        (r["media_a"], r["media_b"], r["n_frames"], r["total_hamming"])
        for r in media_video_neardup_detail(spark, SF_SMOKE).collect()
    )
    expected = sorted(
        (a, a + VARIANT_OFFSET, VPH_KEPT, _VIDEO_HAMMING.get(a, 0))
        for a in range(0, 497, VARIANT_MOD)
    )
    assert rows == expected
    # registered (oracle-gated) surface: same pairs, threshold boolean
    reg_rows = sorted(
        tuple(r)
        for r in load_all()["media_video_neardup_phash"].fn(spark, SF_SMOKE).collect()
    )
    assert reg_rows == sorted((a, b, True) for a, b, _n, _h in expected)


def test_video_neardup_constructed_pair_replica(spark):
    """Differential check against an independent pure-Python replica: build
    two clips by hand (identical except one Y byte of the twin frame),
    demux + per-frame dHash locally, and confirm (a) the replica's total
    hamming equals the Spark pipeline's for that pair and (b) a clip pair
    with a WHOLE different frame is rejected by the threshold only when its
    summed distance says so."""
    import numpy as np

    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.datapipe.multimodal import (
        VPH_FRAME_BYTES,
        VPH_H,
        VPH_MAX_TOTAL_HAMMING,
        VPH_N_FRAMES,
        VPH_STRIDE,
        VPH_TWIN_FRAME,
        VPH_W,
        _mixed_raster,
        encode_y4m,
        frame_dhash64,
        parse_y4m,
    )

    fb, w, h = VPH_FRAME_BYTES, VPH_W, VPH_H
    ylen = w * h
    j = np.arange(VPH_N_FRAMES * fb, dtype=np.uint64)

    def clip_hashes(raster) -> list[int]:
        payload = encode_y4m(
            [raster[f * fb : (f + 1) * fb].tobytes() for f in range(VPH_N_FRAMES)], w, h
        )
        _w, _h, frames = parse_y4m(payload)
        assert (_w, _h) == (w, h)
        return [
            frame_dhash64(fr[:ylen], w, h)
            for i, fr in enumerate(frames)
            if i % VPH_STRIDE == 0
        ]

    base = _mixed_raster(7, j)
    twin = base.copy()
    tb = VPH_TWIN_FRAME * fb + 5
    twin[tb] = (int(twin[tb]) + 16) % 256
    hs_a, hs_b = clip_hashes(base), clip_hashes(twin)
    total = sum(bin(a ^ b).count("1") for a, b in zip(hs_a, hs_b))
    # only the twin frame's hash may move, and by few bits
    kept = [i for i in range(VPH_N_FRAMES) if i % VPH_STRIDE == 0]
    for i, (a, b) in zip(kept, zip(hs_a, hs_b)):
        if i != VPH_TWIN_FRAME:
            assert a == b, f"non-perturbed frame {i} hash moved"
    assert total <= VPH_MAX_TOTAL_HAMMING

    # an unrelated clip reads as far: mixed rasters give ~random 64-bit
    # hashes, expected distance ~32 bits/frame
    other = _mixed_raster(8, j)
    hs_c = clip_hashes(other)
    far = sum(bin(a ^ c).count("1") for a, c in zip(hs_a, hs_c))
    assert far > VPH_MAX_TOTAL_HAMMING


def test_video_neardup_bucketing_misses_no_true_pair():
    """Pigeonhole guarantee, checked adversarially: ANY two hash sequences
    within VPH_MAX_TOTAL_HAMMING total bits share at least one exact
    (frame_idx, 16-bit chunk) — including the worst case of the budget
    spread to put the maximum per-frame distance everywhere."""
    import itertools

    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.datapipe.multimodal import (
        DHASH_BITS,
        PHASH_BANDS,
        VPH_KEPT,
        VPH_MAX_TOTAL_HAMMING,
    )

    chunk_bits = DHASH_BITS // PHASH_BANDS
    mask = (1 << chunk_bits) - 1

    def shares_bucket(seq_a, seq_b) -> bool:
        for fa, fb_ in zip(seq_a, seq_b):
            for c in range(PHASH_BANDS):
                if (fa >> (c * chunk_bits)) & mask == (fb_ >> (c * chunk_bits)) & mask:
                    return True
        return False

    base = [0x0123456789ABCDEF] * VPH_KEPT
    # spread the hamming budget across frames in every composition; flip
    # bits packed into as few chunks as possible AND spread across chunks
    for split in itertools.product(range(VPH_MAX_TOTAL_HAMMING + 1), repeat=VPH_KEPT):
        if sum(split) > VPH_MAX_TOTAL_HAMMING:
            continue
        for spread in (False, True):
            twin = []
            for f, d in enumerate(split):
                x = base[f]
                for b in range(d):
                    pos = (b * chunk_bits if spread else b) % DHASH_BITS
                    x ^= 1 << pos
                twin.append(x)
            total = sum(bin(a ^ b).count("1") for a, b in zip(base, twin))
            assert total <= VPH_MAX_TOTAL_HAMMING
            assert shares_bucket(base, twin), (split, spread)


# bpe_vocab_size_curve: exact sf0.001 output — one row per merge-count
# checkpoint; fertility/chars_per_token are single rounded divisions of
# exact int64 sums
_GOLDEN_VOCAB_CURVE = [
    (6, 27939, 107917, 3.862593507, 1.164941575),
    (12, 27939, 98573, 3.528150614, 1.275369523),
    (24, 27939, 86851, 3.108593722, 1.447502044),
]


def test_bpe_vocab_size_curve_golden_rows(spark):
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.datapipe.bpe import (
        bpe_vocab_size_curve_detail,
    )

    rows = sorted(
        tuple(r) for r in bpe_vocab_size_curve_detail(spark, SF_SMOKE).collect()
    )
    assert rows == sorted(_GOLDEN_VOCAB_CURVE)
    # registered (oracle-gated) surface: exact checkpoint/word/char columns
    # + both booleans TRUE (total_chars = sum over the golden rows' identity
    # chars_per_token * total_tokens, but pinned independently here)
    reg_rows = sorted(
        tuple(r) for r in load_all()["bpe_vocab_size_curve"].fn(spark, SF_SMOKE).collect()
    )
    total_chars = 125717  # sf0.001 corpus characters across whitespace words
    assert reg_rows == sorted(
        (k, w, total_chars, True, True) for k, w, _t, _f, _c in _GOLDEN_VOCAB_CURVE
    )


def test_bpe_vocab_curve_full_size_matches_encode_docs(spark):
    """The curve's largest checkpoint applies ALL learned merges, so its
    corpus token total must reproduce ``bpe_encode_docs`` exactly — pinning
    that the incremental multi-checkpoint encoder and the plain encoder are
    the same tokenizer."""
    from pyspark.sql import functions as F

    reg = load_all()
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.datapipe.bpe import (
        bpe_vocab_size_curve_detail,
    )

    curve = {
        r["n_merges"]: r["total_tokens"]
        for r in bpe_vocab_size_curve_detail(spark, SF_SMOKE).collect()
    }
    from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.datapipe.bpe import (
        bpe_encode_docs_detail,
    )

    full = (
        bpe_encode_docs_detail(spark, SF_SMOKE)
        .agg(F.sum("n_bpe_tokens").cast("long").alias("t"))
        .collect()[0]["t"]
    )
    assert curve[max(curve)] == full
