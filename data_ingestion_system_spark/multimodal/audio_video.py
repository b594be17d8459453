"""Audio (WAV) and video (Y4M) decode + feature extraction — pure numpy.

Completes the multimodal column surface (images in columns.py/codecs.py/
jpeg.py): audio and video also ride as opaque `binary` columns and two
more REAL decoders need no codec library —

- **WAV** — RIFF/WAVE chunk walk + PCM 8/16/24/32-bit sample decode
  (IEEE-float 32 too); everything is stdlib byte slicing + numpy.
- **Y4M (YUV4MPEG2)** — the uncompressed video interchange format the
  ffmpeg/libvpx toolchains use: one ASCII header line, then
  `FRAME\\n` + raw YUV planes per frame. Because every frame has the
  same computable byte size, FRAME-SAMPLING IS A SEEK, not a decode:
  sampling every k-th frame of a long clip touches only the sampled
  bytes — the property that matters when the column holds hours of
  video at 100 TB.

Compressed containers (MP3/AAC/MP4/H.264/...) raise NotImplementedError
honestly — their codecs are not in this container; the Spark plumbing
(binary column → mapInPandas extractor) is identical when they are.

Feature extractors follow columns.py's contract: Arrow-batched
mapInPandas, schemas declared, and every decode closure built by a
``make_*`` factory (all imports/tables inside) so cloudpickle ships it
BY VALUE to executors that cannot import this package.

Reference parity: the reference system (Chuyi111/Data-Ingestion-System)
stores no media at all; this module is part of the mandated
training-data-pipeline extension surface.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)


# ---------------------------------------------------------------- WAV ---


def make_wav_decoder():
    """Factory → ``decode(payload) -> (samples, sample_rate)`` where
    ``samples`` is float64 in [-1, 1] with shape (n_frames, n_channels).

    PCM 8 (unsigned) / 16 / 24 / 32-bit signed LE and 32-bit IEEE
    float; compressed WAVs (ADPCM, MP3-in-WAV) raise
    NotImplementedError.
    """

    def decode(payload: bytes):
        import numpy as np

        if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
            raise ValueError("not a WAV: bad RIFF/WAVE magic")
        pos = 12
        fmt = None
        data = None
        while pos + 8 <= len(payload):
            cid = payload[pos : pos + 4]
            clen = int.from_bytes(payload[pos + 4 : pos + 8], "little")
            body = payload[pos + 8 : pos + 8 + clen]
            if len(body) != clen:
                raise ValueError(f"truncated WAV: chunk {cid!r} cut short")
            if cid == b"fmt ":
                fmt = body
            elif cid == b"data":
                data = body
            pos += 8 + clen + (clen & 1)  # chunks are word-aligned
        if fmt is None or data is None:
            raise ValueError("WAV missing fmt/data chunk")
        audio_format = int.from_bytes(fmt[0:2], "little")
        channels = int.from_bytes(fmt[2:4], "little")
        rate = int.from_bytes(fmt[4:8], "little")
        bits = int.from_bytes(fmt[14:16], "little")
        if channels <= 0 or rate <= 0:
            raise ValueError(f"WAV: bad fmt (channels={channels}, rate={rate})")
        if audio_format == 1:  # PCM
            if bits == 8:
                x = np.frombuffer(data, np.uint8).astype(np.float64)
                x = (x - 128.0) / 128.0
            elif bits == 16:
                x = np.frombuffer(data, "<i2").astype(np.float64) / 32768.0
            elif bits == 24:
                raw = np.frombuffer(data, np.uint8)
                n = len(raw) // 3
                b = raw[: n * 3].reshape(n, 3).astype(np.int64)
                v = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
                v = np.where(v >= 1 << 23, v - (1 << 24), v)
                x = v.astype(np.float64) / float(1 << 23)
            elif bits == 32:
                x = np.frombuffer(data, "<i4").astype(np.float64) / float(1 << 31)
            else:
                raise NotImplementedError(f"{bits}-bit PCM WAV not supported")
        elif audio_format == 3 and bits == 32:  # IEEE float
            x = np.frombuffer(data, "<f4").astype(np.float64)
        else:
            raise NotImplementedError(
                f"WAV audio format {audio_format} needs a codec this "
                "container does not ship (PCM/float only)"
            )
        n = len(x) // channels
        return x[: n * channels].reshape(n, channels), rate

    return decode


def encode_wav(samples, rate: int, bits: int = 16) -> bytes:
    """(n, ch) float in [-1, 1] → PCM WAV bytes (16-bit by default)."""
    import numpy as np

    samples = np.asarray(samples, np.float64)
    if samples.ndim == 1:
        samples = samples[:, None]  # mono (n,) → (n, 1) frames-by-channels
    elif samples.ndim != 2:
        raise ValueError(f"encode_wav wants (n, ch) or (n,), got ndim={samples.ndim}")
    n, ch = samples.shape
    if bits == 16:
        pcm = np.clip(np.round(samples * 32767.0), -32768, 32767).astype("<i2")
    elif bits == 8:
        pcm = np.clip(np.round(samples * 127.0) + 128, 0, 255).astype(np.uint8)
    else:
        raise ValueError(f"encode_wav supports 8/16-bit, not {bits}")
    data = pcm.tobytes()
    block = ch * bits // 8
    fmt = (
        (1).to_bytes(2, "little")
        + ch.to_bytes(2, "little")
        + rate.to_bytes(4, "little")
        + (rate * block).to_bytes(4, "little")
        + block.to_bytes(2, "little")
        + bits.to_bytes(2, "little")
    )
    body = (
        b"WAVE"
        + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
        + b"data" + len(data).to_bytes(4, "little") + data
        + (b"\x00" if len(data) & 1 else b"")
    )
    return b"RIFF" + len(body).to_bytes(4, "little") + body


AUDIO_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_samples", LongType()),
        StructField("n_channels", LongType()),
        StructField("sample_rate", LongType()),
        StructField("duration_s", DoubleType()),
        StructField("rms", DoubleType()),
        StructField("peak", DoubleType()),
        StructField("zcr", DoubleType()),
    ]
)


def make_audio_feature_extractor():
    """Arrow-batched WAV feature extractor: duration, RMS, peak,
    zero-crossing rate (channel 0). Swap the stats for a real
    embedding model without touching the plan. Self-contained closure
    (by-value pickle)."""
    decode = make_wav_decoder()

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        import pandas as _pd

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                x, rate = decode(bytes(payload))
                c0 = x[:, 0]
                zc = float(np.mean(np.signbit(c0[1:]) != np.signbit(c0[:-1]))) if len(c0) > 1 else 0.0
                rows.append(
                    (
                        int(doc_id),
                        int(x.shape[0]),
                        int(x.shape[1]),
                        int(rate),
                        float(x.shape[0]) / rate,
                        float(np.sqrt(np.mean(x**2))) if x.size else 0.0,
                        float(np.abs(x).max(initial=0.0)),
                        zc,
                    )
                )
            yield _pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_samples", "n_channels", "sample_rate",
                    "duration_s", "rms", "peak", "zcr",
                ],
            )

    return extract


def audio_features(audio: DataFrame) -> DataFrame:
    """(doc_id, payload[binary WAV]) → decoded per-clip audio stats via
    mapInPandas — the audio twin of columns.image_features."""
    return audio.select("doc_id", "payload").mapInPandas(
        make_audio_feature_extractor(), schema=AUDIO_FEATURE_SCHEMA
    )


# ---------------------------------------------------------------- Y4M ---


def make_y4m_parser():
    """Factory → ``parse(payload) -> (w, h, fps_num, fps_den, csp,
    frame_data_size, first_frame_offset)``.

    Parsing only the header is what makes frame-sampling a seek: frame
    k's bytes start at ``first_frame_offset + k * (6 + frame_data_size)``
    (every frame is the fixed-size marker ``FRAME\\n`` + planes).
    Frames with per-frame parameters (rare, spec-legal) are rejected so
    the fixed-stride contract stays sound.
    """

    def parse(payload: bytes):
        if payload[:9] != b"YUV4MPEG2":
            raise ValueError("not a Y4M: bad magic")
        nl = payload.find(b"\n")
        if nl < 0:
            raise ValueError("truncated Y4M: no header newline")
        w = h = None
        num, den = 25, 1
        csp = "420"
        for tok in payload[9:nl].split():
            t = tok.decode("ascii", "replace")
            if t[0] == "W":
                w = int(t[1:])
            elif t[0] == "H":
                h = int(t[1:])
            elif t[0] == "F":
                num, den = (int(v) for v in t[1:].split(":"))
            elif t[0] == "C":
                # exact 8-bit variants only: C420p10/p12/p16 carry 2-byte
                # samples and must NOT fall into the 8-bit plane math
                if t[1:] in ("420", "420jpeg", "420mpeg2", "420paldv"):
                    csp = "420"  # chroma-siting variants share plane sizes
                elif t[1:] == "444":
                    csp = "444"
                elif t[1:] == "mono":
                    csp = "mono"
                else:
                    raise NotImplementedError(f"Y4M colourspace {t} not supported")
            # Ip/A/X tokens: irrelevant to plane sizes — skipped
        if not w or not h:
            raise ValueError("Y4M header missing W/H")
        if csp == "420":
            if w % 2 or h % 2:
                raise ValueError("Y4M 4:2:0 needs even dimensions")
            fsize = w * h + 2 * (w // 2) * (h // 2)
        elif csp == "444":
            fsize = 3 * w * h
        else:
            fsize = w * h
        return w, h, num, den, csp, fsize, nl + 1

    return parse


def make_y4m_decoder():
    """Factory → ``decode(payload, every=1, limit=None) ->
    (frames, w, h, fps)`` where ``frames`` is uint8 RGB of shape
    (k, H, W, 3) holding every ``every``-th frame (at most ``limit``).

    Sampling slices directly to each sampled frame's offset — the
    skipped frames' bytes are never touched.
    """
    parse = make_y4m_parser()

    def decode(payload: bytes, every: int = 1, limit=None):
        import numpy as np

        w, h, num, den, csp, fsize, off = parse(payload)
        stride = 6 + fsize  # b"FRAME\n" + planes
        total = (len(payload) - off) // stride
        if (len(payload) - off) % stride:
            raise ValueError("truncated Y4M: partial trailing frame")
        idx = list(range(0, total, max(1, every)))
        if limit is not None:
            idx = idx[:limit]
        frames = []
        for k in idx:
            p = off + k * stride
            if payload[p : p + 6] != b"FRAME\n":
                raise ValueError(
                    f"Y4M frame {k}: marker missing (per-frame params unsupported)"
                )
            raw = np.frombuffer(payload, np.uint8, count=fsize, offset=p + 6)
            if csp == "mono":
                y = raw.reshape(h, w).astype(np.float64)
                cb = cr = np.full((h, w), 128.0)
            elif csp == "444":
                y = raw[: w * h].reshape(h, w).astype(np.float64)
                cb = raw[w * h : 2 * w * h].reshape(h, w).astype(np.float64)
                cr = raw[2 * w * h :].reshape(h, w).astype(np.float64)
            else:  # 420
                cw, chh = w // 2, h // 2
                y = raw[: w * h].reshape(h, w).astype(np.float64)
                cb = raw[w * h : w * h + cw * chh].reshape(chh, cw)
                cr = raw[w * h + cw * chh :].reshape(chh, cw)
                cb = np.repeat(np.repeat(cb, 2, 0), 2, 1).astype(np.float64)
                cr = np.repeat(np.repeat(cr, 2, 0), 2, 1).astype(np.float64)
            r = y + 1.402 * (cr - 128.0)
            g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
            b = y + 1.772 * (cb - 128.0)
            frames.append(
                np.clip(np.round(np.stack([r, g, b], 2)), 0, 255).astype(np.uint8)
            )
        out = np.stack(frames) if frames else np.zeros((0, h, w, 3), np.uint8)
        return out, w, h, (num, den)

    return decode


def encode_y4m(frames, fps=(25, 1), csp: str = "444") -> bytes:
    """(n, H, W, 3) uint8 RGB → Y4M bytes (4:4:4 or box-filtered 4:2:0
    — the fixture twin of make_y4m_decoder)."""
    import numpy as np

    frames = np.asarray(frames, np.float64)
    n, h, w = frames.shape[0], frames.shape[1], frames.shape[2]
    if csp == "420" and (w % 2 or h % 2):
        raise ValueError("Y4M 4:2:0 needs even dimensions")
    head = b"YUV4MPEG2 W%d H%d F%d:%d Ip A1:1 C%s\n" % (
        w, h, fps[0], fps[1], csp.encode(),
    )
    out = [head]
    for f in frames:
        r, g, b = f[:, :, 0], f[:, :, 1], f[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if csp == "420":
            cb = (cb[0::2, 0::2] + cb[0::2, 1::2] + cb[1::2, 0::2] + cb[1::2, 1::2]) / 4
            cr = (cr[0::2, 0::2] + cr[0::2, 1::2] + cr[1::2, 0::2] + cr[1::2, 1::2]) / 4
        planes = b"".join(
            np.clip(np.round(p), 0, 255).astype(np.uint8).tobytes() for p in (y, cb, cr)
        )
        out.append(b"FRAME\n" + planes)
    return b"".join(out)


VIDEO_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_frames", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("fps", DoubleType()),
        StructField("sampled_frames", LongType()),
        StructField("mean_luma", DoubleType()),
        StructField("luma_range", DoubleType()),
    ]
)


def make_video_feature_extractor(every: int = 5, limit: int = 8):
    """Arrow-batched Y4M extractor: clip geometry from the header alone,
    pixel stats from every ``every``-th frame (≤ ``limit``) — the
    frame-sample contract, so cost per clip is bounded no matter how
    long the clip is. Self-contained closure (by-value pickle)."""
    parse = make_y4m_parser()
    decode = make_y4m_decoder()

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        import pandas as _pd

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                w, h, num, den, csp, fsize, off = parse(b)
                total = (len(b) - off) // (6 + fsize)
                frames, _, _, _ = decode(b, every=every, limit=limit)
                luma = (
                    0.299 * frames[:, :, :, 0]
                    + 0.587 * frames[:, :, :, 1]
                    + 0.114 * frames[:, :, :, 2]
                )
                per_frame = luma.reshape(len(frames), -1).mean(axis=1) if len(frames) else np.zeros(0)
                rows.append(
                    (
                        int(doc_id),
                        int(total),
                        int(w),
                        int(h),
                        float(num) / den,
                        int(len(frames)),
                        float(per_frame.mean()) if len(frames) else 0.0,
                        float(per_frame.max() - per_frame.min()) if len(frames) else 0.0,
                    )
                )
            yield _pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_frames", "width", "height", "fps",
                    "sampled_frames", "mean_luma", "luma_range",
                ],
            )

    return extract


def video_features(video: DataFrame, every: int = 5, limit: int = 8) -> DataFrame:
    """(doc_id, payload[binary Y4M]) → clip geometry + sampled-frame
    luma stats via mapInPandas — the video twin of image_features,
    with frame-sampling as the bounded-cost contract."""
    return video.select("doc_id", "payload").mapInPandas(
        make_video_feature_extractor(every=every, limit=limit),
        schema=VIDEO_FEATURE_SCHEMA,
    )
