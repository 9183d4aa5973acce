"""Multimodal columns — image/audio/video as opaque binary + metadata.

Design: a multimodal column is a struct
    (data: binary, mime: string, width/height/duration: typed metadata)
so partitioning, predicate pushdown on metadata, and column pruning all
work on the typed part while payloads stay opaque bytes.

Decode / feature-extract run as Arrow-batched pandas functions via
``mapInPandas`` — the image/audio libraries are NOT in this container,
so the decode kernels are deterministic fakes / NotImplementedError
stubs behind real, tested Spark plumbing (schema, batching, partition
shape). Swapping in PIL/librosa later changes ONE function body.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("data", T.BinaryType()),
    T.StructField("mime", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_ms", T.LongType()),
])


def attach_media(df: DataFrame, data_col: str, mime: str) -> DataFrame:
    """Wrap a binary column into the typed media struct."""
    return df.withColumn("media", F.struct(
        F.col(data_col).alias("data"),
        F.lit(mime).alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    ))


def _fake_decode_image(data: bytes) -> tuple[int, int]:
    """Deterministic stand-in for an image decoder (no PIL in this
    container): derives a fake (width, height) from the byte content.
    Replace with PIL.Image.open when available."""
    if data is None:
        return (0, 0)
    h = len(data)
    return (64 + h % 512, 64 + (h * 7) % 512)


def decode_images(df: DataFrame, media_col: str = "media") -> DataFrame:
    """Populate width/height via mapInPandas (Arrow batches).

    The plumbing (schema preservation, batch iteration, null payloads)
    is real and tested; only the pixel decode is stubbed.
    """
    out_schema = T.StructType(
        [f for f in df.schema.fields if f.name != media_col] + [
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ])

    other_cols = [f.name for f in df.schema.fields if f.name != media_col]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            dims = pdf[media_col].map(
                lambda m: _fake_decode_image(m["data"] if m is not None else None))
            res = pdf[other_cols].copy()
            res["width"] = [d[0] for d in dims]
            res["height"] = [d[1] for d in dims]
            yield res

    return df.mapInPandas(batches, schema=out_schema)


def extract_image_features(df: DataFrame, media_col: str = "media",
                           dim: int = 8) -> DataFrame:
    """Feature extraction stub: deterministic byte-histogram 'embedding'
    per payload, emitted as array<float>. Real models plug into the
    same mapInPandas shape (batched, Arrow)."""
    out_schema = T.StructType(
        [f for f in df.schema.fields if f.name != media_col] + [
            T.StructField("features", T.ArrayType(T.FloatType())),
        ])
    other_cols = [f.name for f in df.schema.fields if f.name != media_col]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for m in pdf[media_col]:
                data = m["data"] if m is not None else None
                if not data:
                    feats.append([0.0] * dim)
                    continue
                buckets = [0] * dim
                for byte in data:
                    buckets[byte % dim] += 1
                total = float(len(data))
                feats.append([b / total for b in buckets])
            res = pdf[other_cols].copy()
            res["features"] = feats
            yield res

    return df.mapInPandas(batches, schema=out_schema)


def sample_video_frames(df: DataFrame, media_col: str = "media",
                        every_ms: int = 1000) -> DataFrame:
    """Frame sampling stub: real decoders are not in this container."""
    raise NotImplementedError(
        "video frame sampling requires a codec library (e.g. pyav); "
        "the mapInPandas plumbing mirrors decode_images")
