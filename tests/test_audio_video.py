"""WAV / Y4M codec + resize + thumbnail tests (multimodal r9).

Audio and video are real decoders now (pure stdlib + numpy): WAV PCM
roundtrips bit-tight, Y4M 4:4:4 roundtrips to within YCbCr rounding, and
frame-sampling is verified to be a seek (byte offsets computed from the
header, skipped frames untouched — asserted by corrupting a skipped
frame's bytes and still decoding the sampled ones).
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from data_ingestion_system_spark.multimodal.audio_video import (
    audio_features,
    encode_wav,
    encode_y4m,
    make_wav_decoder,
    make_y4m_decoder,
    make_y4m_parser,
    video_features,
)
from data_ingestion_system_spark.multimodal.codecs import resize_image

decode_wav = make_wav_decoder()
decode_y4m = make_y4m_decoder()
parse_y4m = make_y4m_parser()


# ------------------------------------------------------------------ WAV


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=500),
    ch=st.integers(min_value=1, max_value=2),
    rate=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_wav_pcm16_roundtrip(n, ch, rate, seed):
    rng = np.random.default_rng(seed)
    x = rng.uniform(-1, 1, size=(n, ch))
    out, got_rate = decode_wav(encode_wav(x, rate))
    assert got_rate == rate
    assert out.shape == (n, ch)
    # one quantization step plus the 32767-encode / 32768-decode scale skew
    assert np.abs(out - x).max() < 1.6 / 32768


def test_wav_pcm8_roundtrip():
    x = np.linspace(-1, 1, 64).reshape(-1, 1)
    out, rate = decode_wav(encode_wav(x, 8000, bits=8))
    assert rate == 8000
    assert np.abs(out - x).max() < 1.0 / 120


def test_wav_24_and_32bit_and_float():
    # hand-build fmt/data for the depths encode_wav doesn't emit
    def wav(fmt_code, ch, rate, bits, data):
        block = ch * bits // 8
        fmt = (
            fmt_code.to_bytes(2, "little") + ch.to_bytes(2, "little")
            + rate.to_bytes(4, "little") + (rate * block).to_bytes(4, "little")
            + block.to_bytes(2, "little") + bits.to_bytes(2, "little")
        )
        body = (
            b"WAVEfmt " + len(fmt).to_bytes(4, "little") + fmt
            + b"data" + len(data).to_bytes(4, "little") + data
        )
        return b"RIFF" + len(body).to_bytes(4, "little") + body

    # 24-bit: value 2^23-1 → ~1.0; -2^23 → -1.0
    d24 = (0x7FFFFF).to_bytes(3, "little") + (0x800000).to_bytes(3, "little")
    x, _ = decode_wav(wav(1, 1, 8000, 24, d24))
    assert x.shape == (2, 1)
    assert abs(x[0, 0] - (2**23 - 1) / 2**23) < 1e-9 and abs(x[1, 0] + 1.0) < 1e-9
    # 32-bit int
    d32 = (2**31 - 1).to_bytes(4, "little", signed=True) + (-(2**31)).to_bytes(4, "little", signed=True)
    x, _ = decode_wav(wav(1, 1, 8000, 32, d32))
    assert abs(x[0, 0] - (2**31 - 1) / 2**31) < 1e-9 and abs(x[1, 0] + 1.0) < 1e-9
    # IEEE float
    df = np.array([0.25, -0.5], "<f4").tobytes()
    x, _ = decode_wav(wav(3, 1, 8000, 32, df))
    assert abs(x[0, 0] - 0.25) < 1e-7 and abs(x[1, 0] + 0.5) < 1e-7


def test_wav_malformed_and_stubs():
    good = encode_wav(np.zeros((4, 1)), 8000)
    with pytest.raises(ValueError, match="magic"):
        decode_wav(b"RIFX" + good[4:])
    with pytest.raises(ValueError, match="truncated"):
        decode_wav(good[:-2])
    adpcm = bytearray(good)
    adpcm[20] = 2  # MS ADPCM format code
    with pytest.raises(NotImplementedError):
        decode_wav(bytes(adpcm))


def test_audio_features_spark(spark):
    """mapInPandas audio path end to end: a 440 Hz sine's RMS is
    amp/sqrt(2) and its ZCR is 2·f/rate, both recovered from the
    decoded WAV inside executors."""
    rate, f, amp, n = 8000, 440.0, 0.5, 8000
    t = np.arange(n) / rate
    x = (amp * np.sin(2 * np.pi * f * t)).reshape(-1, 1)
    rows = [(i, bytearray(encode_wav(x, rate))) for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary").repartition(2)
    got = audio_features(df).collect()
    assert len(got) == 3
    for r in got:
        assert (r.n_samples, r.n_channels, r.sample_rate) == (n, 1, rate)
        assert abs(r.duration_s - 1.0) < 1e-9
        assert abs(r.rms - amp / np.sqrt(2)) < 1e-3
        assert abs(r.zcr - 2 * f / rate) < 5e-3
        assert abs(r.peak - amp) < 1e-3


# ------------------------------------------------------------------ Y4M


def _clip(n=6, h=12, w=16, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(n, h, w, 3), dtype=np.uint8)


def test_y4m_444_roundtrip_tight():
    clip = _clip()
    frames, w, h, fps = decode_y4m(encode_y4m(clip, fps=(30, 1), csp="444"))
    assert (w, h, fps) == (16, 12, (30, 1))
    assert frames.shape == clip.shape
    # RGB→YCbCr→RGB at 4:4:4 costs only rounding
    assert np.abs(frames.astype(int) - clip.astype(int)).max() <= 2


def test_y4m_420_shapes_and_bounded_error():
    # smooth content (linear ramps): chroma box-down/nearest-up error is
    # bounded; noise clips R/B and would not be a fair 4:2:0 test
    yy, xx = np.mgrid[0:12, 0:16]
    frame = np.stack(
        [xx * 255 // 15, yy * 255 // 11, (xx + yy) * 255 // 26], axis=2
    ).astype(np.uint8)
    clip = np.stack([frame] * 4)
    frames, w, h, _ = decode_y4m(encode_y4m(clip, csp="420"))
    assert frames.shape == clip.shape
    assert np.abs(frames.astype(int) - clip.astype(int)).max() <= 24


def test_y4m_frame_sampling_is_a_seek():
    """Sampling must not read skipped frames: corrupt a skipped frame's
    pixel bytes (keeping its FRAME marker) and the sampled decode still
    succeeds with identical output."""
    clip = _clip(n=10)
    payload = bytearray(encode_y4m(clip, csp="444"))
    w, h, num, den, csp, fsize, off = parse_y4m(bytes(payload))
    stride = 6 + fsize
    want, *_ = decode_y4m(bytes(payload), every=3)  # frames 0,3,6,9
    for k in (1, 2, 4, 5, 7, 8):  # corrupt every skipped frame
        p = off + k * stride + 6
        payload[p : p + 16] = b"\xee" * 16
    got, *_ = decode_y4m(bytes(payload), every=3)
    assert (got == want).all()
    assert len(got) == 4


def test_y4m_limit_and_errors():
    clip = _clip(n=5)
    payload = encode_y4m(clip, csp="444")
    got, *_ = decode_y4m(payload, every=1, limit=2)
    assert len(got) == 2
    with pytest.raises(ValueError, match="magic"):
        decode_y4m(b"JUNK" + payload[4:])
    with pytest.raises(ValueError, match="partial"):
        decode_y4m(payload[:-10])
    with pytest.raises(NotImplementedError, match="colourspace"):
        decode_y4m(payload.replace(b"C444", b"C411", 1))


def test_video_features_spark(spark):
    """mapInPandas video path end to end: geometry from the header,
    luma stats from sampled frames only (bounded per-clip cost)."""
    clips = {}
    rows = []
    for i in range(4):
        n = 6 + i * 3
        clip = np.full((n, 8, 10, 3), 40 + 10 * i, np.uint8)
        clips[i] = (n, clip)
        rows.append((i, bytearray(encode_y4m(clip, fps=(24, 1), csp="444"))))
    df = spark.createDataFrame(rows, "doc_id long, payload binary").repartition(2)
    got = {r.doc_id: r for r in video_features(df, every=4, limit=3).collect()}
    assert len(got) == 4
    for i, (n, clip) in clips.items():
        r = got[i]
        assert (r.n_frames, r.width, r.height) == (n, 10, 8)
        assert abs(r.fps - 24.0) < 1e-9
        assert r.sampled_frames == min(-(-n // 4), 3)
        assert abs(r.mean_luma - (40 + 10 * i)) <= 1.0  # flat clip
        assert r.luma_range <= 1e-9


# --------------------------------------------------------------- resize


def test_resize_nearest_identity_and_downscale():
    img = _clip(n=1)[0]
    assert (resize_image(img, img.shape[0], img.shape[1], "nearest") == img).all()
    half = resize_image(img, 6, 8, "nearest")
    # pixel-center convention: output (i, j) samples input (2i+1, 2j+1)
    # at 2x downscale — pinned exactly, not or-ed with a shape check
    assert half.shape == (6, 8, 3)
    assert (half == img[1::2, 1::2][:6, :8]).all()


def test_resize_bilinear_flat_and_gradient():
    flat = np.full((9, 7, 3), 77, np.uint8)
    assert (resize_image(flat, 4, 13, "bilinear") == 77).all()
    # a linear horizontal ramp must stay monotone after resize
    ramp = np.tile(np.linspace(0, 255, 32).astype(np.uint8), (8, 1))
    out = resize_image(np.stack([ramp] * 3, 2), 8, 16, "bilinear")
    col = out[0, :, 0].astype(int)
    assert (np.diff(col) >= 0).all() and col[0] < col[-1]


def test_resize_grayscale_2d():
    g = np.arange(64, dtype=np.uint8).reshape(8, 8)
    out = resize_image(g, 4, 4, "bilinear")
    assert out.shape == (4, 4)


def test_resize_bad_args():
    img = np.zeros((4, 4, 3), np.uint8)
    with pytest.raises(ValueError, match="target size"):
        resize_image(img, 0, 4)
    with pytest.raises(ValueError, match="method"):
        resize_image(img, 2, 2, "bicubic")


def test_image_thumbnails_spark(spark):
    """decode→resize→featurize composite: mixed-format payloads of the
    same image produce near-identical thumb vectors, shaped for the ANN
    operators (array<double>, unit range)."""
    from data_ingestion_system_spark.multimodal.codecs import encode_bmp, encode_png
    from data_ingestion_system_spark.multimodal.columns import (
        encode_ppm,
        image_thumbnails,
    )

    rng = np.random.default_rng(17)
    img = rng.integers(0, 256, size=(20, 30, 3), dtype=np.uint8)
    rows = [
        (0, bytearray(encode_ppm(img))),
        (1, bytearray(encode_png(img, filter_type=3))),
        (2, bytearray(encode_bmp(img))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary").repartition(2)
    got = {r.doc_id: r for r in image_thumbnails(df, th=4, tw=4).collect()}
    assert len(got) == 3
    base = np.array(got[0].thumb)
    assert base.shape == (16,) and (base >= 0).all() and (base <= 1).all()
    for i in (1, 2):
        assert np.abs(np.array(got[i].thumb) - base).max() < 1e-12
        assert (got[i].width, got[i].height) == (30, 20)


def test_wav_mono_1d_encodes_as_n_frames_one_channel():
    """A natural mono call — encode_wav(sin_wave, rate) with a 1-D
    array — must mean (n, 1), not a 1-frame n-channel WAV."""
    t = np.arange(800) / 8000.0
    x = 0.5 * np.sin(2 * np.pi * 440 * t)
    out, rate = decode_wav(encode_wav(x, 8000))
    assert out.shape == (800, 1)
    assert np.abs(out[:, 0] - x).max() < 1.6 / 32768
    with pytest.raises(ValueError, match="ndim"):
        encode_wav(np.zeros((2, 3, 4)), 8000)


def test_y4m_high_bitdepth_colourspace_raises():
    """C420p10/p12/p16 carry 2-byte samples; matching them to the 8-bit
    4:2:0 plane math would mis-size every frame. They must refuse."""
    clip = np.zeros((2, 4, 4, 3), np.uint8)
    good = encode_y4m(clip, fps=(24, 1), csp="420")
    for depth in (b"10", b"12", b"16"):
        bad = good.replace(b"C420\n", b"C420p" + depth + b"\n", 1)
        assert bad != good
        with pytest.raises(NotImplementedError, match="colourspace"):
            parse_y4m(bad)
