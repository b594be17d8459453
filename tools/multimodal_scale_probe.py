#!/usr/bin/env python
"""Multimodal decode/extract throughput probe (round 9).

The r9 multimodal surface decodes five image formats, WAV audio, and Y4M
video with pure numpy/stdlib closures inside mapInPandas. This probe
measures what that costs per row at corpus scale, on synthetic payloads
generated IN the executors (so payload bytes never cross the driver):

  1. `image_features` over PPM / PNG / GIF / JPEG payloads — decode docs/s and
     decoded MB/s per format (PNG pays zlib+unfilter, JPEG pays
     huffman+IDCT; the gap is the real codec cost a 100 TB vision
     pipeline budgets for).
  2. `image_thumbnails` — the decode→bilinear-resize→featurize composite.
  3. `audio_features` over 1-second 16-bit WAV clips — clips/s.
  4. `video_features` over N-frame Y4M clips with every=4 sampling —
     clips/s, plus the seek-vs-decode ratio: the same clips with
     every=1 (decode all frames) as the control, so the bounded-cost
     frame-sampling contract is a measured number, not a claim.

Each cell reports wall seconds for ROWS rows on local[CPUS]. Payload
sizes are chosen so a cell is seconds, not minutes; throughput scales
linearly in rows by construction (stateless per-row extract — verified
by the half-rows warm-up reading ~2x the rate's wall).

Usage:
    python tools/multimodal_scale_probe.py [rows] [--json out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.types import BinaryType  # noqa: E402

from data_ingestion_system_spark.multimodal.audio_video import (  # noqa: E402
    audio_features,
    encode_wav,
    encode_y4m,
    video_features,
)
from data_ingestion_system_spark.multimodal.codecs import (  # noqa: E402
    encode_bmp,
    encode_gif,
    encode_png,
)
from data_ingestion_system_spark.multimodal.columns import (  # noqa: E402
    encode_ppm,
    image_features,
    image_thumbnails,
)
from data_ingestion_system_spark.multimodal.jpeg import encode_jpeg  # noqa: E402
from data_ingestion_system_spark.session import get_spark  # noqa: E402

IMG_H, IMG_W = 64, 96  # 18 KiB decoded per image
WAV_RATE, WAV_SECONDS = 16000, 1.0
# clips must be long enough that frame decode dominates per-row overhead,
# else the seek-vs-decode ratio measures pandas assembly, not sampling
VID_FRAMES, VID_H, VID_W = 96, 120, 160  # ~2.8 MB 4:2:0 payload per clip


def _payload_maker(fmt: str):
    """(doc_id → bytes) closure; runs in executors. The captured encoders
    are MODULE-LEVEL functions, which cloudpickle serializes by
    reference (module + qualname) even when held in closure cells — so
    executors must be able to import the package. main() pins
    spark.executorEnv.PYTHONPATH to the repo root (same convention as
    the other probes) instead of relying on the launch cwd."""
    import numpy as np

    if fmt in ("ppm", "png", "png_paeth", "bmp", "jpeg"):
        enc = {"ppm": encode_ppm, "png": encode_png,
               "png_paeth": lambda a: encode_png(a, filter_type=4),
               "bmp": encode_bmp,
               "jpeg": lambda a: encode_jpeg(a, quality=90, subsample="420")}[fmt]
        h, w = IMG_H, IMG_W

        def make(doc_id: int) -> bytes:
            k = np.arange(h * w * 3, dtype=np.int64)
            img = ((doc_id * 31 + k * 7) % 256).astype(np.uint8).reshape(h, w, 3)
            return enc(img)

    elif fmt == "gif":  # palette format: synthesize the index plane
        h, w = IMG_H, IMG_W

        def make(doc_id: int) -> bytes:
            pal = (np.arange(64 * 3, dtype=np.int64) * 5 % 256).astype(
                np.uint8
            ).reshape(64, 3)
            k = np.arange(h * w, dtype=np.int64)
            idx = ((doc_id * 31 + k * 7) % 64).astype(np.uint8).reshape(h, w)
            # compress=True: real-world GIFs are dictionary-LZW coded —
            # fewer codes than pixels; the uncompressed literal stream
            # would be the 1-code-per-pixel worst case
            return encode_gif(idx, pal, compress=True)

    elif fmt == "wav":
        n = int(WAV_RATE * WAV_SECONDS)

        def make(doc_id: int) -> bytes:
            t = np.arange(n) / WAV_RATE
            x = 0.5 * np.sin(2 * np.pi * (200 + doc_id % 100) * t)
            return encode_wav(x.reshape(-1, 1), WAV_RATE)

    elif fmt == "y4m":

        def make(doc_id: int) -> bytes:
            k = np.arange(VID_H * VID_W * 3, dtype=np.int64)
            base = ((doc_id * 31 + k * 7) % 256).astype(np.uint8).reshape(VID_H, VID_W, 3)
            clip = np.stack([np.roll(base, f, axis=1) for f in range(VID_FRAMES)])
            return encode_y4m(clip, fps=(24, 1), csp="420")

    else:
        raise ValueError(fmt)
    return make


def _payload_df(spark, rows: int, fmt: str):
    make = _payload_maker(fmt)

    def build(s):
        return s.map(lambda d: make(int(d)))

    udf = F.pandas_udf(build, BinaryType())
    n_parts = spark.sparkContext.defaultParallelism
    return (
        spark.range(rows, numPartitions=n_parts)
        .select(F.col("id").alias("doc_id"), udf(F.col("id")).alias("payload"))
    )


def _time_extract(df, extract_fn, **kw) -> tuple[float, int]:
    t0 = time.time()
    n = extract_fn(df, **kw).count() if kw else extract_fn(df).count()
    return time.time() - t0, n


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 20000
    spark = get_spark(extra_conf={"spark.executorEnv.PYTHONPATH": _REPO})
    out: dict = {"rows": rows, "cpus": os.cpu_count(),
                 "img": f"{IMG_W}x{IMG_H}", "vid": f"{VID_FRAMES}f {VID_W}x{VID_H}"}

    # png = filter-0 rows (the library's own encoder default);
    # png_paeth = every row Paeth-filtered — the adaptive-filter cost an
    # externally-encoded (libpng/Pillow) corpus actually pays
    decoded_mb = rows * IMG_H * IMG_W * 3 / 1e6
    for fmt in ("ppm", "png", "png_paeth", "gif", "jpeg"):
        df = _payload_df(spark, rows, fmt).persist()
        df.count()  # materialize payloads so encode cost is excluded
        wall, n = _time_extract(df, image_features)
        assert n == rows
        out[f"image_{fmt}"] = {
            "wall_s": round(wall, 2),
            "docs_per_s": round(rows / wall),
            "decoded_mb_per_s": round(decoded_mb / wall, 1),
        }
        if fmt == "ppm":
            wall, n = _time_extract(df, image_thumbnails)
            out["thumbnails_ppm"] = {
                "wall_s": round(wall, 2),
                "docs_per_s": round(rows / wall),
            }
        df.unpersist()

    df = _payload_df(spark, rows, "wav").persist()
    df.count()
    wall, n = _time_extract(df, audio_features)
    assert n == rows
    out["audio_wav"] = {
        "wall_s": round(wall, 2),
        "clips_per_s": round(rows / wall),
        "audio_s_per_s": round(rows * WAV_SECONDS / wall),
    }
    df.unpersist()

    vrows = max(rows // 100, 50)  # video payloads are ~150x an image
    df = _payload_df(spark, vrows, "y4m").persist()
    df.count()
    _time_extract(df, video_features, every=16, limit=6)  # JIT warm-up, discarded
    wall_full, _ = _time_extract(df, video_features, every=1, limit=VID_FRAMES)
    wall_sample, n = _time_extract(df, video_features, every=16, limit=6)
    assert n == vrows
    out["video_y4m"] = {
        "rows": vrows,
        "sampled_wall_s": round(wall_sample, 2),
        "full_decode_wall_s": round(wall_full, 2),
        "clips_per_s_sampled": round(vrows / wall_sample, 1),
        "video_s_per_s_sampled": round(vrows * VID_FRAMES / 24.0 / wall_sample),
        "seek_speedup": round(wall_full / wall_sample, 2),
    }
    df.unpersist()

    print(json.dumps(out, indent=1))
    if "--json" in sys.argv:
        path = sys.argv[sys.argv.index("--json") + 1]
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
