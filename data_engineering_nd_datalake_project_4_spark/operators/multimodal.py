"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, processed with Arrow-batched Pandas UDFs over ``mapInPandas``.

The Spark-side plumbing is real and tested: schemas, batch iteration,
partition-preserving transforms, output contracts. The actual codec work
(JPEG decode, audio resample, video frame extraction) requires libraries
not present in this container — those steps are STUBBED behind
``_decode_*`` functions that either raise ``NotImplementedError``
(``strict=True``) or produce a deterministic fake derived from the bytes
(default, so pipelines are end-to-end testable).

Scale notes: ``mapInPandas`` streams Arrow batches — memory is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` regardless of blob size;
decode parallelism = partition count, so repartition by a size-balanced
key before heavy decode stages. Blobs never pass through a shuffle here:
all transforms are narrow (per-partition).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Canonical media-table schema: opaque payload + typed metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("content", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("feat_dim", IntegerType(), False),
        StructField("features", ArrayType(FloatType()), False),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame", BinaryType(), False),
    ]
)


def _fake_decode_bytes(content: bytes, dim: int) -> list[float]:
    """Deterministic fake 'decoded features': sha256-seeded floats in [0,1).
    Clearly NOT a real decoder — stands in for (decode → model forward)
    so the distributed plumbing is testable in this container."""
    out: list[float] = []
    counter = 0
    while len(out) < dim:
        h = hashlib.sha256(content + counter.to_bytes(4, "little")).digest()
        out.extend(b / 255.0 for b in h)
        counter += 1
    return out[:dim]


def _decode_image(content: bytes, strict: bool) -> list[float]:
    if strict:
        raise NotImplementedError(
            "real image decode requires PIL/opencv (not in this container); "
            "swap _decode_image for a real implementation in production"
        )
    return _fake_decode_bytes(content, 64)


def image_features(df: DataFrame, dim: int = 64, strict: bool = False) -> DataFrame:
    """Decode + feature-extract image blobs via mapInPandas (Arrow batches).

    Input: MEDIA_SCHEMA-shaped df. Output: IMAGE_FEATURES_SCHEMA. Narrow
    transform — no shuffle; each Arrow batch is processed in one Python
    call (vectorized per-batch loop, never per-row Python round-trips).
    """
    import pandas as pd

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            rows = pdf[pdf["kind"] == "image"]
            yield pd.DataFrame(
                {
                    "media_id": rows["media_id"],
                    "feat_dim": dim,
                    "features": [
                        _decode_image(bytes(c), strict) if c is not None else [0.0] * dim
                        for c in rows["content"]
                    ],
                }
            )

    return df.mapInPandas(batches, IMAGE_FEATURES_SCHEMA)


def sample_video_frames(df: DataFrame, every_ms: int = 1000, strict: bool = False) -> DataFrame:
    """Sample frames from video blobs: one output row per sampled frame.

    The fake samples ``duration_ms // every_ms`` pseudo-frames (sha256
    slices of the payload); a real implementation would seek+decode.
    """
    import pandas as pd

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            rows = pdf[pdf["kind"] == "video"]
            ids: list[int] = []
            idxs: list[int] = []
            frames: list[bytes] = []
            for _, r in rows.iterrows():
                if strict:
                    raise NotImplementedError("real video decode not available here")
                n = max(1, int((r["duration_ms"] or 0) // every_ms))
                for i in range(n):
                    ids.append(r["media_id"])
                    idxs.append(i)
                    frames.append(
                        hashlib.sha256(bytes(r["content"]) + i.to_bytes(4, "little")).digest()
                    )
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    return df.mapInPandas(batches, FRAME_SCHEMA)


def media_stats(df: DataFrame) -> DataFrame:
    """Pure-JVM metadata aggregation (no Python): blob sizes per kind."""
    return (
        df.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.length("content")).alias("total_bytes"),
            F.max(F.length("content")).alias("max_bytes"),
        )
    )
