"""Baseline JPEG codec tests (multimodal/jpeg.py, r9).

JPEG is lossy, so roundtrips assert bounded error (tight at quality
95–100 on smooth images, exact on flat blocks) rather than identity.
One vector is hand-assembled from the ITU T.81 spec — huffman codes and
IDCT value computed by hand — so the decoder is pinned to the public
spec, not merely self-consistent with our encoder.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import assume, given, settings
from hypothesis import strategies as st

from data_ingestion_system_spark.multimodal.jpeg import decode_jpeg, encode_jpeg


def _smooth(h: int, w: int) -> np.ndarray:
    """Linear ramps — low-frequency content JPEG preserves well."""
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            xx * 255 // max(w - 1, 1),
            yy * 255 // max(h - 1, 1),
            (xx + yy) * 255 // max(w + h - 2, 1),
        ],
        axis=2,
    ).astype(np.uint8)


@pytest.mark.parametrize("subsample", ["444", "420"])
@pytest.mark.parametrize("restart_interval", [0, 2])
def test_jpeg_roundtrip_bounded_error(subsample, restart_interval):
    img = _smooth(24, 33)
    out = decode_jpeg(
        encode_jpeg(img, quality=95, subsample=subsample, restart_interval=restart_interval)
    )
    assert out.shape == img.shape
    tol = 4 if subsample == "444" else 12  # chroma box-down/nearest-up costs more
    assert np.abs(out.astype(int) - img.astype(int)).max() <= tol


def test_jpeg_flat_block_exact():
    """A flat image has only DC energy; quality 90 luma DC step still
    lands on the exact value after quantize→dequantize."""
    flat = np.full((16, 24, 3), 130, np.uint8)
    out = decode_jpeg(encode_jpeg(flat, quality=90))
    assert (out == 130).all()


def test_jpeg_q100_near_lossless_on_noise():
    rng = np.random.default_rng(0)
    noise = rng.integers(0, 256, size=(17, 9, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(noise, quality=100, subsample="444"))
    err = np.abs(out.astype(int) - noise.astype(int))
    assert err.max() <= 3  # q100 tables are ~all-ones; only rounding noise


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=20),
    h=st.integers(min_value=1, max_value=20),
    quality=st.integers(min_value=80, max_value=100),
    subsample=st.sampled_from(["444", "420"]),
)
def test_jpeg_roundtrip_property(w, h, quality, subsample):
    """Any dimensions (including non-multiple-of-8/16 needing edge
    padding) decode back to the exact same shape with bounded error on
    smooth content. 4:2:0 on 1-2px dims averages the ramp's whole
    chroma range into one sample (libjpeg does the same), so no RGB
    bound is meaningful there — that regime is pinned by the dedicated
    degenerate-dims test below via luma, which is never subsampled."""
    assume(subsample == "444" or min(h, w) >= 3)
    img = _smooth(h, w)
    out = decode_jpeg(encode_jpeg(img, quality=quality, subsample=subsample))
    assert out.shape == img.shape
    # 4:2:0 chroma error scales with the ramp's per-pixel chroma step
    # (~255/(min_dim-1), halved by the 2x2 box filter, amplified 1.772x
    # on blue): measured worst case over the whole strategy space decays
    # 83 (min dim 3) → 43 (6) → <=37 (7+); the curve below bounds it
    # with margin at every point.
    m = min(h, w)
    tol = 40 if subsample == "444" or m >= 7 else 40 + 230 // (m - 1)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= tol


def test_jpeg_420_degenerate_dims_keep_luma():
    """1-2px-wide 4:2:0: chroma legitimately collapses to one averaged
    sample, but decode must succeed with the right shape and the
    (full-resolution) luma plane must survive."""
    for h, w in ((1, 2), (2, 1), (2, 2), (1, 20), (20, 2)):
        img = _smooth(h, w)
        out = decode_jpeg(encode_jpeg(img, quality=80, subsample="420"))
        assert out.shape == img.shape
        # wrong chroma pushes R/B into the 0/255 clip, which shifts the
        # implied luma of the clipped RGB too — hence 40, not ~4
        luma = lambda a: 0.299 * a[..., 0] + 0.587 * a[..., 1] + 0.114 * a[..., 2]
        assert np.abs(luma(out.astype(float)) - luma(img.astype(float))).max() <= 40


def test_jpeg_hand_assembled_spec_vector():
    """8×8 single-component gray JPEG assembled by hand from T.81:
    q[DC]=16, flat level 160 → DC coeff 8·(160−128)=256 → quantized 16;
    Annex K DC-luma category-5 code is 110, magnitude bits 10000, AC
    EOB is 1010 → entropy bytes 0xD0 0xAF (padded with 1s). The decoder
    must reproduce the flat 160 gray block, promoted to RGB."""
    from data_ingestion_system_spark.multimodal.jpeg import (
        HT_AC_LUMA,
        HT_DC_LUMA,
        ZIGZAG,
    )

    qz = [0] * 64
    qnat = [16] + [1] * 63  # natural order: DC step 16, AC step 1
    for k in range(64):
        qz[k] = qnat[ZIGZAG[k]]
    payload = b"\xff\xd8"
    payload += b"\xff\xdb" + (67).to_bytes(2, "big") + bytes([0]) + bytes(qz)
    payload += (
        b"\xff\xc0" + (11).to_bytes(2, "big") + bytes([8]) + (8).to_bytes(2, "big")
        + (8).to_bytes(2, "big") + bytes([1]) + bytes([1, 0x11, 0])
    )
    for tc_th, (counts, symbols) in ((0x00, HT_DC_LUMA), (0x10, HT_AC_LUMA)):
        payload += (
            b"\xff\xc4" + (19 + len(symbols)).to_bytes(2, "big")
            + bytes([tc_th]) + bytes(counts) + bytes(symbols)
        )
    payload += b"\xff\xda" + (8).to_bytes(2, "big") + bytes([1, 1, 0x00, 0, 63, 0])
    payload += b"\xd0\xaf"  # 110 10000 1010 + 1111 padding
    payload += b"\xff\xd9"
    out = decode_jpeg(payload)
    assert out.shape == (8, 8, 3)
    assert (out == 160).all()


def test_jpeg_error_paths():
    img = _smooth(8, 8)
    good = encode_jpeg(img, quality=90)
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG" + good[4:])
    with pytest.raises(ValueError):
        decode_jpeg(good[:40])  # truncated in the headers
    with pytest.raises(ValueError):
        decode_jpeg(good[:-10])  # truncated entropy data (no EOI)
    prog = bytearray(good)
    sof = prog.index(b"\xff\xc0")
    prog[sof + 1] = 0xC2  # progressive
    with pytest.raises(NotImplementedError, match="SOF2"):
        decode_jpeg(bytes(prog))


def test_jpeg_420_chroma_actually_subsampled():
    """4:2:0 output must be smaller than 4:4:4 for chroma-rich content
    (proves the subsampled path is actually taken, not silently 444)."""
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    b444 = len(encode_jpeg(img, quality=90, subsample="444"))
    b420 = len(encode_jpeg(img, quality=90, subsample="420"))
    assert b420 < b444


def test_jpeg_through_spark_image_path(spark):
    """decode ships by value into executors: image_features over JPEG
    payloads reports the right dims and near-correct channel means."""
    from data_ingestion_system_spark.multimodal.columns import image_features

    img = _smooth(13, 21)
    rows = [(i, bytearray(encode_jpeg(img, quality=95))) for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary").repartition(2)
    got = image_features(df).collect()
    assert len(got) == 4
    for r in got:
        assert (r.width, r.height) == (21, 13)
        for ch, col in enumerate(("mean_r", "mean_g", "mean_b")):
            assert abs(getattr(r, col) - float(img[:, :, ch].mean())) < 2.0


def test_jpeg_fill_bytes_before_markers():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker,
    both between header segments and before RSTn in the entropy stream.
    Real encoders emit them for alignment; one such file must not kill a
    whole mapInPandas batch."""
    img = _smooth(24, 17)
    good = encode_jpeg(img, quality=95, restart_interval=2)
    base = decode_jpeg(good)

    # fill bytes between header segments (before DQT's 0xFF 0xDB)
    dqt = good.index(b"\xff\xdb")
    padded = good[:dqt] + b"\xff\xff\xff" + good[dqt:]
    assert (decode_jpeg(padded) == base).all()

    # fill byte before the first restart marker in the scan
    sos = good.index(b"\xff\xda")
    rst = good.index(b"\xff\xd0", sos)
    padded = good[:rst] + b"\xff" + good[rst:]
    assert (decode_jpeg(padded) == base).all()
