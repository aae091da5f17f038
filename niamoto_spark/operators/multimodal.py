"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Image decode is REAL for PNG/BMP via the pure-python codec in
``sources/imagecodec.py`` (PIL upgrades it to every format when
installed); audio/video decode and JPEG stay gated (no librosa/av/DCT in
a pure build) with the deterministic fake decoder covering their
plumbing in tests.  Schemas, Arrow batch shapes, mapInPandas signatures,
and partitioning are production-shaped either way.

Scale notes: binary payloads dominate row size, so operators here
- never shuffle the binary column (feature extraction projects it away
  before any wide transform), and
- run decode inside ``mapInPandas`` so one Python worker handles a whole
  Arrow batch (amortized codec startup, zero pickling per row).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from niamoto_spark.registry import PluginType, register

IMAGE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("mime", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("mime", T.StringType(), True),
    T.StructField("n_bytes", T.LongType(), True),
    T.StructField("payload_hash", T.StringType(), True),
    T.StructField("feature", T.ArrayType(T.FloatType()), True),
])


def decode_image(payload: bytes) -> "np.ndarray":
    """Decode an image payload to an HxWx3 uint8 array.

    REAL for PNG/BMP (pure-python codec, sources/imagecodec.py) and for
    anything PIL handles when pillow is installed; JPEG/video without PIL
    raise (a DCT codec is out of scope for a pure build)."""
    from niamoto_spark.sources.imagecodec import decode_image as _decode

    return _decode(payload)


def _fake_decode(payload: bytes, side: int = 8) -> np.ndarray:
    """Deterministic fake decoder used by tests: bytes -> pseudo-pixel grid
    (repeatable, content-dependent)."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    reps = int(np.ceil(side * side * 3 / max(len(arr), 1)))
    return np.tile(arr, reps)[: side * side * 3].reshape(side, side, 3)


@register("media_features", PluginType.TRANSFORMER)
def media_features(df: DataFrame, use_fake_decoder: bool = False,
                   feature_dim: int = 16) -> DataFrame:
    """Extract per-media features: byte count, content hash, and a
    ``feature_dim``-float embedding from the decoded pixels (mean-pooled
    grid).  The binary column is consumed inside the batch and NOT emitted —
    downstream joins carry only ids + features."""
    decoder = _fake_decode if use_fake_decoder else decode_image

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                payload = r["payload"] or b""
                px = decoder(bytes(payload))
                flat = px.astype(np.float32).ravel()
                chunks = np.array_split(flat, feature_dim)
                feat = [float(c.mean()) if len(c) else 0.0 for c in chunks]
                rows.append({
                    "media_id": r["media_id"],
                    "mime": r["mime"],
                    "n_bytes": len(payload),
                    "payload_hash": hashlib.md5(payload).hexdigest(),
                    "feature": feat,
                })
            yield pd.DataFrame(rows)

    return df.mapInPandas(extract, schema=FEATURE_SCHEMA)


@register("media_resize", PluginType.TRANSFORMER)
def media_resize(df: DataFrame, target: tuple[int, int] = (64, 64),
                 use_fake_decoder: bool = False) -> DataFrame:
    """Resize plumbing: decode -> nearest-neighbor resample -> re-emit
    payload bytes.  Uses the fake decoder in tests; the resample itself is
    real numpy."""
    decoder = _fake_decode if use_fake_decoder else decode_image
    out_schema = df.schema

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        th, tw = target
        for pdf in batches:
            payloads = []
            for p in pdf["payload"]:
                px = decoder(bytes(p or b""))
                h, w = px.shape[:2]
                yi = (np.arange(th) * h // th).clip(0, h - 1)
                xi = (np.arange(tw) * w // tw).clip(0, w - 1)
                payloads.append(px[np.ix_(yi, xi)].tobytes())
            pdf = pdf.copy()
            pdf["payload"] = payloads
            pdf["width"], pdf["height"] = tw, th
            yield pdf

    return df.mapInPandas(resize, schema=out_schema)


def frame_sample_plan(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: expands (media_id, frame_count in meta)
    into one row per sampled frame index — pure Spark (sequence + explode);
    the actual frame decode plugs into media_features."""
    frames = F.sequence(F.lit(0),
                        F.greatest(F.coalesce(F.element_at("meta", "frame_count")
                                               .cast("int"), F.lit(0)) - 1, F.lit(0)),
                        F.lit(every_n))
    return df.select("media_id", F.explode(frames).alias("frame_idx"))
