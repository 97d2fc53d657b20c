"""Multimodal binary-payload plumbing: images / video frames as opaque bytes.

The audio path (decode_stage) is this engine's fully-real multimodal lane.
This module generalizes the same Spark-side plumbing — typed binary column +
metadata columns + Arrow-batched mapInPandas feature extraction with bounded
batch sizes — to image/video payloads.

Codec reality in this sandbox: real image/audio libs (PIL, ffmpeg) are not
installed, so JPEG/PNG decode is STUBBED behind an import-gate
(NotImplementedError), while the deterministic raw formats below are fully
implemented and tested:
  * 'rgb8'  — bytes = height*width*3 uint8 (row-major RGB)
  * 'vid8'  — bytes = n_frames*height*width uint8 (mono frames)
The schema, partitioning, UDF signature and batch shapes are the real,
scale-ready parts; swapping the stub for PIL.Image.open is a kernel-local
change.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_SCHEMA_DDL = "img_id string, bytes binary, width int, height int, fmt string"

_FEAT_DDL = (
    "img_id string, width int, height int, fmt string, decode_ok boolean, "
    "mean_r double, mean_g double, mean_b double, std_gray double"
)


def decode_image(buf: bytes | None, width: int, height: int, fmt: str) -> np.ndarray | None:
    """bytes -> HxWx3 uint8 array; None if undecodable."""
    if buf is None or fmt is None:
        return None
    if fmt == "rgb8":
        if len(buf) != width * height * 3:
            return None
        return np.frombuffer(buf, dtype=np.uint8).reshape(height, width, 3)
    if fmt in ("jpeg", "png"):
        try:
            from PIL import Image  # noqa: F401  (not installed in sandbox)
        except ImportError as e:
            raise NotImplementedError(
                "compressed image decode requires PIL; install it and decode "
                "via Image.open(io.BytesIO(buf)) here"
            ) from e
        raise NotImplementedError("unreachable in sandbox")
    return None


def image_features(images: DataFrame) -> DataFrame:
    """Arrow-batched per-image features (channel means, gray stddev).

    Same conditional-enrich shape as the audio decode stage: per-row-only
    math, bytes consumed and dropped, ~40-byte rows downstream.
    """
    def _feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "img_id": pdf["img_id"], "width": pdf["width"],
                "height": pdf["height"], "fmt": pdf["fmt"],
            }
            n = len(pdf)
            ok = np.zeros(n, dtype=bool)
            mr, mg, mb, sg = (np.full(n, np.nan) for _ in range(4))
            for i, (buf, w, h, fmt) in enumerate(
                zip(pdf["bytes"], pdf["width"], pdf["height"], pdf["fmt"])
            ):
                try:
                    img = decode_image(buf, int(w), int(h), fmt)
                except NotImplementedError:
                    img = None
                if img is None:
                    continue
                ok[i] = True
                x = img.astype(np.float64)
                mr[i], mg[i], mb[i] = x[..., 0].mean(), x[..., 1].mean(), x[..., 2].mean()
                sg[i] = x.mean(axis=2).std()
            yield pd.DataFrame(
                {**out, "decode_ok": ok, "mean_r": mr, "mean_g": mg, "mean_b": mb, "std_gray": sg}
            )

    return images.mapInPandas(_feats, schema=_FEAT_DDL)


def resize_rgb8(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize (pure-numpy, deterministic)."""
    h, w = img.shape[:2]
    yi = (np.arange(out_h) * h // out_h).astype(np.int64)
    xi = (np.arange(out_w) * w // out_w).astype(np.int64)
    return img[yi][:, xi]


VIDEO_FRAME_DDL = "vid_id string, frame_idx int, mean double, std double"


def sample_video_frames(videos: DataFrame, every_k: int = 10) -> DataFrame:
    """Frame sampling over 'vid8' payloads: one output row per k-th frame.

    1 -> n row fan-out inside mapInPandas (the video analogue of U2 explode).
    """
    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"vid_id": [], "frame_idx": [], "mean": [], "std": []}
            for vid, buf, w, h in zip(pdf["vid_id"], pdf["bytes"], pdf["width"], pdf["height"]):
                if buf is None or w <= 0 or h <= 0:
                    continue
                fsize = int(w) * int(h)
                n_frames = len(buf) // fsize
                if n_frames == 0 or len(buf) % fsize != 0:
                    continue
                arr = np.frombuffer(buf, dtype=np.uint8).reshape(n_frames, fsize)
                for fi in range(0, n_frames, every_k):
                    f = arr[fi].astype(np.float64)
                    rows["vid_id"].append(vid)
                    rows["frame_idx"].append(fi)
                    rows["mean"].append(float(f.mean()))
                    rows["std"].append(float(f.std()))
            yield pd.DataFrame(rows)

    return videos.select("vid_id", "bytes", "width", "height").mapInPandas(
        _frames, schema=VIDEO_FRAME_DDL
    )


def synth_images(spark, n: int, width: int = 32, height: int = 24) -> DataFrame:
    """Deterministic synthetic rgb8 image table (seeded per row index)."""
    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            recs = []
            for i in b["id"]:
                rng = np.random.default_rng([4242, int(i)])
                img = rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)
                recs.append(
                    {
                        "img_id": f"img_{int(i):08d}",
                        "bytes": img.tobytes(),
                        "width": width,
                        "height": height,
                        "fmt": "rgb8" if i % 17 != 0 else "jpeg",  # stubbed rows
                    }
                )
            yield pd.DataFrame(recs)

    return spark.range(n).mapInPandas(_gen, schema=IMAGE_SCHEMA_DDL)
