"""PNG / BMP codec tests (multimodal/codecs.py, r9).

The container has no codec libraries, so these codecs are pure
stdlib-zlib + numpy; tests roundtrip through our own encoders (which can
emit every PNG scanline-filter type, so each unfilter branch is driven),
fuzz malformed payloads, and prove the three real formats produce
bit-identical pixels through the magic-routed `decode_image` and the
mapInPandas image path.
"""

from __future__ import annotations

import zlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from data_ingestion_system_spark.multimodal.codecs import (
    decode_bmp,
    decode_png,
    encode_bmp,
    encode_png,
    encode_png_palette,
)
from data_ingestion_system_spark.multimodal.columns import decode_image, encode_ppm
from data_ingestion_system_spark.multimodal.jpeg import encode_jpeg


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        len(data).to_bytes(4, "big")
        + ctype
        + data
        + (zlib.crc32(ctype + data) & 0xFFFFFFFF).to_bytes(4, "big")
    )


def _png(ihdr13: bytes, raw: bytes, extra: bytes = b"") -> bytes:
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr13)
        + extra
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def _ihdr(w: int, h: int, depth: int, color: int, interlace: int = 0) -> bytes:
    return (
        w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + bytes([depth, color, 0, 0, interlace])
    )


# --- PNG roundtrip: every filter type is the identity ---


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_png_roundtrip_each_filter(filter_type):
    rng = np.random.default_rng(40 + filter_type)
    img = rng.integers(0, 256, size=(7, 11, 3), dtype=np.uint8)
    out = decode_png(encode_png(img, filter_type=filter_type))
    assert out.shape == img.shape
    assert (out == img).all()


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=16),
    h=st.integers(min_value=1, max_value=16),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    filter_type=st.integers(min_value=0, max_value=4),
)
def test_png_roundtrip_property(w, h, seed, filter_type):
    """encode_png → decode_png is the identity for any (H, W, 3) uint8
    image, any dimensions, any scanline filter."""
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    out = decode_png(encode_png(img, filter_type=filter_type))
    assert (out == img).all()


# --- PNG color types beyond truecolor ---


def test_png_grayscale_decodes_to_rgb():
    gray = np.arange(24, dtype=np.uint8).reshape(4, 6)
    raw = b"".join(b"\x00" + gray[y].tobytes() for y in range(4))
    out = decode_png(_png(_ihdr(6, 4, 8, 0), raw))
    assert out.shape == (4, 6, 3)
    assert (out[:, :, 0] == gray).all() and (out == out[:, :, :1]).all()


def test_png_gray_alpha_drops_alpha():
    ga = np.arange(48, dtype=np.uint8).reshape(4, 6, 2)
    raw = b"".join(b"\x00" + ga[y].tobytes() for y in range(4))
    out = decode_png(_png(_ihdr(6, 4, 8, 4), raw))
    assert out.shape == (4, 6, 3)
    assert (out[:, :, 0] == ga[:, :, 0]).all() and (out == out[:, :, :1]).all()


def test_png_rgba_drops_alpha():
    rng = np.random.default_rng(3)
    rgba = rng.integers(0, 256, size=(5, 3, 4), dtype=np.uint8)
    raw = b"".join(b"\x00" + rgba[y].tobytes() for y in range(5))
    out = decode_png(_png(_ihdr(3, 5, 8, 6), raw))
    assert (out == rgba[:, :, :3]).all()


def test_png_palette_roundtrip():
    rng = np.random.default_rng(9)
    palette = rng.integers(0, 256, size=(17, 3), dtype=np.uint8)
    idx = rng.integers(0, 17, size=(6, 8), dtype=np.uint8)
    out = decode_png(encode_png_palette(idx, palette))
    assert (out == palette[idx]).all()


def test_png_palette_index_out_of_range_raises():
    palette = np.zeros((4, 3), dtype=np.uint8)
    idx = np.full((2, 2), 9, dtype=np.uint8)
    with pytest.raises(ValueError, match="palette index"):
        decode_png(encode_png_palette(idx, palette))


def test_png_ancillary_chunks_skipped():
    img = np.arange(36, dtype=np.uint8).reshape(3, 4, 3)
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(3))
    payload = _png(_ihdr(4, 3, 8, 2), raw, extra=_chunk(b"tEXt", b"k\x00v"))
    assert (decode_png(payload) == img).all()


def test_png_multiple_idat_chunks():
    """The IDAT stream may be split across chunks at any byte boundary."""
    img = np.arange(60, dtype=np.uint8).reshape(4, 5, 3)
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(4))
    z = zlib.compress(raw)
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", _ihdr(5, 4, 8, 2))
        + _chunk(b"IDAT", z[:7])
        + _chunk(b"IDAT", z[7:])
        + _chunk(b"IEND", b"")
    )
    assert (decode_png(payload) == img).all()


# --- PNG malformed payloads fail loudly, never return garbage ---


def test_png_crc_mismatch_raises():
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    payload = bytearray(encode_png(img))
    payload[-5] ^= 0xFF  # corrupt IEND CRC
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(payload))


@settings(max_examples=40, deadline=None)
@given(cut=st.integers(min_value=8, max_value=80))
def test_png_truncation_raises(cut):
    img = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    payload = encode_png(img)
    cut = min(cut, len(payload) - 1)
    with pytest.raises((ValueError, zlib.error)):
        decode_png(payload[:cut])


def test_png_interlace_and_depth_stubs():
    raw = b"\x00" + bytes(3)
    with pytest.raises(NotImplementedError, match="interlace"):
        decode_png(_png(_ihdr(1, 1, 8, 2, interlace=1), raw))
    with pytest.raises(NotImplementedError, match="depth"):
        decode_png(_png(_ihdr(1, 1, 16, 2), b"\x00" + bytes(6)))


def test_png_bad_filter_type_raises():
    raw = b"\x09" + bytes(3)  # filter type 9 is not in the spec
    with pytest.raises(ValueError, match="filter type"):
        decode_png(_png(_ihdr(1, 1, 8, 2), raw))


def test_png_size_mismatch_raises():
    raw = b"\x00" + bytes(5)  # 1x1 RGB wants 4 bytes/row incl. filter
    with pytest.raises(ValueError, match="decompressed size"):
        decode_png(_png(_ihdr(1, 1, 8, 2), raw))


# --- BMP ---


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=16),
    h=st.integers(min_value=1, max_value=16),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_bmp_roundtrip_property(w, h, seed):
    """encode_bmp → decode_bmp is the identity, including the widths
    whose 3·w byte rows need 4-byte padding."""
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    out = decode_bmp(encode_bmp(img))
    assert (out == img).all()


def test_bmp_top_down_and_32bit():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(3, 2, 3), dtype=np.uint8)
    w, h = 2, 3
    # hand-build a top-down 32-bit BGRA BMP of the same pixels
    bgra = np.zeros((h, w, 4), dtype=np.uint8)
    bgra[:, :, :3] = img[:, :, ::-1]
    bgra[:, :, 3] = 255
    body = bgra.tobytes()  # 32-bit rows are already 4-byte aligned
    dib = (
        (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + (-h).to_bytes(4, "little", signed=True)  # negative height = top-down
        + (1).to_bytes(2, "little")
        + (32).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(body).to_bytes(4, "little")
        + bytes(16)
    )
    payload = (
        b"BM"
        + (54 + len(body)).to_bytes(4, "little")
        + bytes(4)
        + (54).to_bytes(4, "little")
        + dib
        + body
    )
    assert (decode_bmp(payload) == img).all()


def test_bmp_malformed_raises():
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    good = bytearray(encode_bmp(img))
    with pytest.raises(ValueError, match="magic"):
        decode_bmp(b"XX" + bytes(good[2:]))
    with pytest.raises(ValueError, match="truncated"):
        decode_bmp(bytes(good[:-3]))
    rle = bytearray(good)
    rle[30] = 1  # BI_RLE8
    with pytest.raises(NotImplementedError, match="compression"):
        decode_bmp(bytes(rle))
    mono = bytearray(good)
    mono[28] = 8  # 8-bit paletted
    with pytest.raises(NotImplementedError, match="bit"):
        decode_bmp(bytes(mono))


# --- the magic router: all three real formats agree on pixels ---


def test_decode_image_routes_all_formats():
    rng = np.random.default_rng(21)
    img = rng.integers(0, 256, size=(6, 9, 3), dtype=np.uint8)
    for payload in (encode_ppm(img), encode_png(img, filter_type=4), encode_bmp(img)):
        assert (decode_image(payload) == img).all()
    # JPEG routes to the real (lossy) baseline decoder
    jout = decode_image(encode_jpeg(img, quality=100))
    assert jout.shape == img.shape
    with pytest.raises(NotImplementedError, match="magic"):
        decode_image(b"RIFF....WEBP")


def test_image_features_mixed_containers(spark):
    """The mapInPandas image path decodes MIXED containers (PPM, PNG —
    one per filter type — and BMP) of the same synthetic pixels and
    reports identical pixel stats for all of them: the router runs
    inside executors (by-value pickled), not just on the driver."""
    from data_ingestion_system_spark.multimodal.columns import image_features

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    payloads = [encode_ppm(img), encode_bmp(img)] + [
        encode_png(img, filter_type=ft) for ft in range(5)
    ]
    rows = [(i, bytearray(p)) for i, p in enumerate(payloads)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary").repartition(3)
    got = image_features(df).collect()
    assert len(got) == len(payloads)
    want = tuple(round(float(img[:, :, c].mean()), 6) for c in range(3))
    for r in got:
        assert (r.width, r.height) == (7, 5)
        assert (r.mean_r, r.mean_g, r.mean_b) == want


# ------------------------------------------------------------------ GIF


def _gif_pal(n=64, seed=7):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (n, 3), dtype=np.uint8)


@pytest.mark.parametrize("interlace", [False, True])
def test_gif_roundtrip_lossless(interlace):
    """GIF is lossless indexed color: decode(encode(idx, pal)) must be
    exactly pal[idx], interlaced or not."""
    from data_ingestion_system_spark.multimodal.codecs import decode_gif, encode_gif

    rng = np.random.default_rng(3)
    pal = _gif_pal()
    idx = rng.integers(0, 64, (33, 47), dtype=np.uint8)
    out = decode_gif(encode_gif(idx, pal, interlace=interlace))
    assert out.shape == (33, 47, 3)
    assert (out == pal[idx]).all()


def test_gif_animated_decodes_first_frame():
    from data_ingestion_system_spark.multimodal.codecs import decode_gif, encode_gif

    rng = np.random.default_rng(4)
    pal = _gif_pal()
    idx = rng.integers(0, 64, (9, 11), dtype=np.uint8)
    out = decode_gif(encode_gif(idx, pal, n_frames=3))
    assert (out == pal[idx]).all()


def test_gif_kwkwk_spec_vector():
    """Hand-assembled LZW stream exercising the KwKwK case (code ==
    table size) that a real compressing encoder emits but our
    uncompressed-literal encoder never does: mcs=2, codes
    [clear=4, 1, 6, end=5] decode to pixels [1, 1, 1] per the GIF spec
    (Appendix F): code 6 == len(table) → entry = prev + prev[0]."""
    from data_ingestion_system_spark.multimodal.codecs import decode_gif

    pal = bytes(
        bytearray([0, 0, 0, 10, 20, 30, 40, 50, 60, 70, 80, 90])
    )  # 4 RGB entries
    # codes 4,1,6,5 at 3 bits, LSB-first: 4 | 1<<3 | 6<<6 | 5<<9 = 2956
    lzw = (2956).to_bytes(2, "little")
    payload = (
        b"GIF89a"
        + (3).to_bytes(2, "little") + (1).to_bytes(2, "little")
        + bytes([0x81, 0, 0])  # GCT, 4 entries; bg 0
        + pal
        + b"\x2c" + b"\x00" * 4
        + (3).to_bytes(2, "little") + (1).to_bytes(2, "little")
        + b"\x00"
        + bytes([2])  # LZW min code size
        + bytes([len(lzw)]) + lzw + b"\x00"
        + b"\x3b"
    )
    out = decode_gif(payload)
    assert out.shape == (1, 3, 3)
    assert (out == np.array([10, 20, 30], np.uint8)).all()


def test_gif_transparency_substitutes_background():
    """89a GCE transparency: transparent-index pixels decode as the
    screen background color (features run on RGB, not RGBA)."""
    from data_ingestion_system_spark.multimodal.codecs import decode_gif, encode_gif

    pal = _gif_pal()
    idx = np.array([[1, 2], [3, 1]], np.uint8)
    p = encode_gif(idx, pal)
    hdr = 6 + 7 + 768  # header + LSD + 256-entry GCT
    gce = b"\x21\xf9\x04\x01\x00\x00\x01\x00"  # flags|1, transparent idx 1
    out = decode_gif(p[:hdr] + gce + p[hdr:])
    bg = pal[0]
    assert (out[0, 0] == bg).all() and (out[1, 1] == bg).all()
    assert (out[0, 1] == pal[2]).all() and (out[1, 0] == pal[3]).all()


def test_gif_error_paths():
    from data_ingestion_system_spark.multimodal.codecs import decode_gif, encode_gif

    pal = _gif_pal()
    idx = np.zeros((4, 5), np.uint8)
    good = encode_gif(idx, pal)
    with pytest.raises(ValueError, match="magic"):
        decode_gif(b"JIF89a" + good[6:])
    with pytest.raises(ValueError, match="truncated"):
        decode_gif(good[: 6 + 7 + 100])  # inside the GCT
    with pytest.raises(ValueError, match="truncated"):
        decode_gif(good[:-12])  # inside the LZW sub-blocks
    with pytest.raises(ValueError, match="trailer"):
        # LSD + GCT then straight to trailer: no image data
        decode_gif(good[: 6 + 7 + 768] + b"\x3b")
    bad = bytearray(good)
    ioff = 6 + 7 + 768  # image descriptor offset
    assert bad[ioff] == 0x2C
    bad[ioff + 5 : ioff + 7] = (99).to_bytes(2, "little")  # frame w > screen w
    with pytest.raises(ValueError, match="rectangle"):
        decode_gif(bytes(bad))


def test_gif_through_spark_image_path(spark):
    """Magic-routed GIF decode inside image_features executors."""
    from data_ingestion_system_spark.multimodal.codecs import encode_gif
    from data_ingestion_system_spark.multimodal.columns import image_features

    pal = _gif_pal()
    rng = np.random.default_rng(9)
    idx = rng.integers(0, 64, (13, 21), dtype=np.uint8)
    img = pal[idx]
    rows = [(i, bytearray(encode_gif(idx, pal))) for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary").repartition(2)
    got = image_features(df).collect()
    assert len(got) == 4
    for r in got:
        assert (r.width, r.height) == (21, 13)
        for ch, col in enumerate(("mean_r", "mean_g", "mean_b")):
            assert abs(getattr(r, col) - float(img[:, :, ch].mean())) < 1e-6


@settings(max_examples=60, deadline=None)
@given(
    cut=st.integers(min_value=0, max_value=851),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_gif_truncation_fuzz(cut, seed):
    """Every strict prefix of a valid GIF must raise ValueError — never
    hang, never return garbage (same contract the PPM fuzz pins)."""
    from data_ingestion_system_spark.multimodal.codecs import decode_gif, encode_gif

    rng = np.random.default_rng(seed)
    idx = rng.integers(0, 64, (6, 8), dtype=np.uint8)
    p = encode_gif(idx, _gif_pal(seed=seed))
    with pytest.raises(ValueError):
        decode_gif(p[: min(cut, len(p) - 1)])


@settings(max_examples=60, deadline=None)
@given(
    pos=st.integers(min_value=6, max_value=850),
    val=st.integers(min_value=0, max_value=255),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_gif_corruption_fuzz(pos, val, seed):
    """Single-byte corruption anywhere past the magic must either raise
    (ValueError/NotImplementedError) or decode to a well-formed frame —
    wrong pixels are acceptable for a lossy-corrupt input, crashes and
    hangs are not."""
    from data_ingestion_system_spark.multimodal.codecs import decode_gif, encode_gif

    rng = np.random.default_rng(seed)
    idx = rng.integers(0, 64, (6, 8), dtype=np.uint8)
    p = bytearray(encode_gif(idx, _gif_pal(seed=seed)))
    pos = min(pos, len(p) - 1)
    p[pos] = val
    try:
        out = decode_gif(bytes(p))
    except (ValueError, NotImplementedError):
        return
    assert out.ndim == 3 and out.shape[2] == 3 and out.dtype.name == "uint8"


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=80),
    w=st.integers(min_value=1, max_value=80),
    style=st.integers(min_value=0, max_value=2),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_gif_compressed_roundtrip(h, w, style, seed):
    """compress=True emits REAL dictionary LZW — variable code width,
    table growth — so these roundtrips walk the decoder's 9→10→11→12
    width-growth path that the uncompressed encoder (fixed 9-bit
    literals + early clears) never reaches."""
    from data_ingestion_system_spark.multimodal.codecs import decode_gif, encode_gif

    rng = np.random.default_rng(seed)
    pal = _gif_pal(256, seed=1)
    if style == 0:
        idx = rng.integers(0, 256, (h, w)).astype(np.uint8)
    elif style == 1:
        idx = (np.add.outer(np.arange(h), np.arange(w)) % 256).astype(np.uint8)
    else:
        idx = np.full((h, w), seed % 256, np.uint8)
    assert (decode_gif(encode_gif(idx, pal, compress=True)) == pal[idx]).all()


def test_gif_compressed_deep_dictionary_and_table_reset():
    """Big low-entropy image: the LZW dictionary fills to 4096 (12-bit
    cap) and resets mid-stream; output must still be exact and the
    stream must be genuinely compressed (dictionary actually used)."""
    from data_ingestion_system_spark.multimodal.codecs import decode_gif, encode_gif

    pal = _gif_pal(256, seed=2)
    idx = (np.arange(500 * 400) % 251 // 3).astype(np.uint8).reshape(500, 400)
    p = encode_gif(idx, pal, compress=True)
    assert (decode_gif(p) == pal[idx]).all()
    assert len(p) < len(encode_gif(idx, pal)) / 3


def test_gif_last_gce_wins():
    """Two GCEs before the image: the second (transparency flag clear)
    must fully override the first — the frame decodes opaque."""
    from data_ingestion_system_spark.multimodal.codecs import decode_gif, encode_gif

    pal = _gif_pal()
    idx = np.array([[1, 2]], np.uint8)
    p = encode_gif(idx, pal)
    hdr = 6 + 7 + 768
    gce_on = b"\x21\xf9\x04\x01\x00\x00\x01\x00"   # transparent idx 1
    gce_off = b"\x21\xf9\x04\x00\x00\x00\x05\x00"  # flag clear
    out = decode_gif(p[:hdr] + gce_on + gce_off + p[hdr:])
    assert (out[0, 0] == pal[1]).all()  # NOT background-substituted


def test_gif_background_comes_from_global_table():
    """bg_index refers to the GLOBAL color table even when the frame
    carries a local one (spec); transparent pixels must take GCT[bg],
    not LCT[bg]."""
    from data_ingestion_system_spark.multimodal.codecs import decode_gif, encode_gif

    pal_local = _gif_pal(256, seed=5)
    idx = np.array([[1, 2]], np.uint8)
    p = bytearray(encode_gif(idx, pal_local))
    # swap the GCT for a distinct global palette whose entry 0 is known
    pal_global = _gif_pal(256, seed=6)
    pal_global[0] = (7, 77, 177)
    p[13 : 13 + 768] = pal_global.tobytes()
    # give the image descriptor a local color table = pal_local
    ioff = 6 + 7 + 768
    assert p[ioff] == 0x2C
    p[ioff + 9] |= 0x87  # LCT present, 256 entries
    p[ioff + 10 : ioff + 10] = pal_local.tobytes()
    gce = b"\x21\xf9\x04\x01\x00\x00\x01\x00"  # transparent idx 1
    out = decode_gif(bytes(p[:ioff]) + gce + bytes(p[ioff:]))
    assert (out[0, 0] == (7, 77, 177)).all()  # GCT background
    assert (out[0, 1] == pal_local[2]).all()  # LCT pixels


def test_gif_trailer_check_is_structural():
    """ADVICE r9: a stray 0x3B byte inside a later block's DATA must not
    satisfy the trailer check — the walk is structural, so a file cut
    mid-extension after frame 1 fails loudly even when the cut region
    happens to contain semicolons; the same blocks properly terminated
    and trailed still decode."""
    from data_ingestion_system_spark.multimodal.codecs import decode_gif, encode_gif

    pal = _gif_pal()
    idx = np.zeros((4, 5), np.uint8)
    good = encode_gif(idx, pal)
    assert good[-1] == 0x3B
    body = good[:-1]  # frame 1 complete, trailer stripped
    # comment extension whose data bytes are semicolons (0x3B), then CUT
    cut_mid_ext = body + b"\x21\xfe\x05;;;;;"
    with pytest.raises(ValueError, match="truncated"):
        decode_gif(cut_mid_ext)
    # same extension, properly 0-terminated and trailed: decodes
    ok = body + b"\x21\xfe\x05;;;;;\x00\x3b"
    out = decode_gif(ok)
    assert out.shape == (4, 5, 3)
    # junk block introducer after frame 1 is structural garbage, not
    # silently scanned past
    with pytest.raises(ValueError, match="unexpected block"):
        decode_gif(body + b"\x99\x3b")
