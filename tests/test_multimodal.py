"""Multimodal column plumbing: exact assertions for the deterministic
extractors (since r9 the catalog query also carries a closed-form DuckDB
oracle, so the driver hash-checks the mapInPandas path too)."""

from __future__ import annotations

import pytest

from data_ingestion_system_spark.multimodal.columns import (
    decode_image_stub,
    multimodal_features,
)


def test_fake_features_match_python(spark, sf_dir):
    """Mixed-modality surface: text rows carry exact byte stats of the
    utf-8 payload; every PPM_PLANT_EVERY-th doc is a planted binary PPM
    whose stats are the stats of the synthetic payload bytes."""
    from data_ingestion_system_spark.multimodal.columns import (
        PPM_PLANT_EVERY,
        synth_ppm,
    )

    out = multimodal_features(spark, sf_dir).limit(40).collect()
    assert len(out) == 40
    import duckdb

    rows = duckdb.connect().execute(
        f"SELECT doc_id, text FROM read_parquet('{sf_dir}/documents.parquet') ORDER BY doc_id LIMIT 40"
    ).fetchall()
    expected = {}
    for doc_id, text in rows:
        b = synth_ppm(doc_id) if doc_id % PPM_PLANT_EVERY == 0 else text.encode("utf-8")
        expected[doc_id] = (len(b), sum(b) / len(b) if b else 0.0, sum(b[:8]))
    assert any(r.mime == "image/ppm" for r in out)  # fixture plants some
    for r in out:
        n_bytes, mean_byte, first8 = expected[r.doc_id]
        assert r.n_bytes == n_bytes
        # the catalog query round_port's floats at 6dp (it has a
        # closed-form DuckDB oracle since r9)
        assert abs(r.mean_byte - mean_byte) < 6e-7
        assert r.first8_sum == first8


def test_catalog_surface_runs_real_ppm_decode(spark, sf_dir):
    """The REAL decoder's pixel stats, computed through the catalog
    query itself (r8 ask #5): planted rows decode to the synth image's
    per-channel means (verified against an independent numpy decode of
    the same payload); text rows carry null pixel columns."""
    import numpy as np

    from data_ingestion_system_spark.multimodal.columns import (
        PPM_PLANT_EVERY,
        PPM_SYNTH_H,
        PPM_SYNTH_W,
        decode_image,
        synth_ppm,
    )

    out = multimodal_features(spark, sf_dir).limit(64).collect()
    ppm_rows = [r for r in out if r.mime == "image/ppm"]
    text_rows = [r for r in out if r.mime == "text/plain"]
    assert ppm_rows and text_rows
    for r in ppm_rows:
        assert r.doc_id % PPM_PLANT_EVERY == 0
        img = decode_image(synth_ppm(r.doc_id))  # independent decode
        assert (r.width, r.height) == (PPM_SYNTH_W, PPM_SYNTH_H)
        assert img.shape == (PPM_SYNTH_H, PPM_SYNTH_W, 3)
        assert abs(r.mean_r - float(np.mean(img[:, :, 0]))) < 6e-7
        assert abs(r.mean_g - float(np.mean(img[:, :, 1]))) < 6e-7
        assert abs(r.mean_b - float(np.mean(img[:, :, 2]))) < 6e-7
    for r in text_rows:
        assert r.width is None and r.height is None
        assert r.mean_r is None and r.mean_g is None and r.mean_b is None


def test_decode_stub_raises():
    # a JPEG with no scan data is truncated (the decoder is REAL since
    # r9); a format with no codec-free decoder stays honestly stubbed
    with pytest.raises(ValueError):
        decode_image_stub(b"\xff\xd8\xff")
    with pytest.raises(NotImplementedError):
        decode_image_stub(b"RIFF\x00\x00\x00\x00WEBP")


def test_ppm_decode_roundtrip():
    """decode_image is REAL for binary PPM (r8): header parsing with
    comments, pixel bytes back as (H, W, 3) uint8."""
    import numpy as np

    from data_ingestion_system_spark.multimodal.columns import (
        decode_image,
        encode_ppm,
    )

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(5, 9, 3), dtype=np.uint8)
    assert (decode_image(encode_ppm(img)) == img).all()
    # header comments are spec-legal and must be skipped
    commented = b"P6\n# a comment\n9 5\n# more\n255\n" + img.tobytes()
    assert (decode_image(commented) == img).all()
    with pytest.raises(ValueError):
        decode_image(b"P6\n2 2\n255\n\x00\x00\x00")  # truncated
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff\xe0")  # JPEG is REAL since r9: truncated → error
    with pytest.raises(ValueError):
        decode_image(b"\x89PNG\r\n\x1a\n")  # PNG is REAL since r9: truncated → error


def test_image_features_real_pixel_stats(spark):
    """The mapInPandas image path runs END TO END on real decoded
    pixels: deterministic PPM payloads in, per-channel means out,
    asserted against an independent numpy computation."""
    import numpy as np

    from data_ingestion_system_spark.multimodal.columns import (
        encode_ppm,
        image_features,
    )

    imgs = {}
    rows = []
    for doc_id in range(12):
        rng = np.random.default_rng(doc_id)
        h, w = 3 + doc_id % 4, 5 + doc_id % 3
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        imgs[doc_id] = img
        rows.append((doc_id, bytearray(encode_ppm(img))))
    df = spark.createDataFrame(rows, "doc_id long, payload binary").repartition(4)
    got = {r.doc_id: r for r in image_features(df).collect()}
    assert len(got) == 12
    for doc_id, img in imgs.items():
        r = got[doc_id]
        assert (r.width, r.height) == (img.shape[1], img.shape[0])
        for ch, col in enumerate(("mean_r", "mean_g", "mean_b")):
            assert abs(getattr(r, col) - float(img[:, :, ch].mean())) < 1e-6


def test_ppm_maxval_rescale():
    """maxval < 255 is spec-legal: samples are 0..maxval and must
    rescale to the uint8 contract, not pass through raw."""
    import numpy as np

    from data_ingestion_system_spark.multimodal.columns import decode_image

    # 1x2 image at maxval=15: (15,0,7) -> (255,0,119... round(7*255/15)=119)
    payload = b"P6\n2 1\n15\n" + bytes([15, 0, 7, 1, 15, 15])
    img = decode_image(payload)
    assert img.tolist() == [[[255, 0, 119], [17, 255, 255]]]
    with pytest.raises(ValueError):
        decode_image(b"")  # malformed, not "codec format"


# --- property fuzz for the real decoder (pure python, no Spark) ---

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=16),
    h=st.integers(min_value=1, max_value=16),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_ppm_roundtrip_property(w, h, seed):
    """encode_ppm -> decode_image is the identity for any (H, W, 3)
    uint8 image, any dimensions."""
    import numpy as np

    from data_ingestion_system_spark.multimodal.columns import decode_image, encode_ppm

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    out = decode_image(encode_ppm(img))
    assert out.shape == img.shape
    assert (out == img).all()


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=8),
    h=st.integers(min_value=1, max_value=8),
    comment=st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=20
    ),
    cut=st.integers(min_value=1, max_value=10),
)
def test_ppm_header_comments_and_truncation(w, h, comment, cut):
    """'#' comments anywhere in the header whitespace are skipped; a
    payload missing pixel bytes raises (never returns garbage)."""
    import numpy as np
    import pytest as _pytest

    from data_ingestion_system_spark.multimodal.columns import decode_image

    img = np.arange(w * h * 3, dtype=np.uint64).astype(np.uint8).reshape(h, w, 3)
    # comment lines may not contain a newline (that ends them)
    c = comment.replace("\n", " ")
    payload = (
        b"P6\n#%s\n%d %d\n#%s\n255\n" % (c.encode(), w, h, c.encode())
        + img.tobytes()
    )
    out = decode_image(payload)
    assert (out == img).all()
    truncated = payload[: len(payload) - min(cut, w * h * 3)]
    with _pytest.raises(ValueError, match="truncated"):
        decode_image(truncated)
