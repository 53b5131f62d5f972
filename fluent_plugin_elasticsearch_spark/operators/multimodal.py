"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas UDFs.

The Spark-side machinery (schemas, batch iteration, partition sizing,
UDF signatures) is real and tested; the actual media decode is STUBBED
(this container ships no image/audio codecs) behind deterministic fakes
clearly marked below — swap `_decode_image_stub` for a PIL/ffmpeg call in
production and nothing else changes.

Scale notes: binary payloads dominate partition size — callers should set
``spark.sql.files.maxPartitionBytes`` low (e.g. 64 MB) for media tables
and keep metadata in sidecar columns so filters prune before decode.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)


def _decode_image_stub(payload: bytes) -> np.ndarray:
    """STUB — deterministic fake decode (md5-seeded 8x8x3 'pixels').
    Production: replace with PIL.Image.open(io.BytesIO(payload));
    the UDF plumbing (batching, schema, feature shape) is unchanged."""
    seed = int.from_bytes(hashlib.md5(payload).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)


_IMAGE_DECODER = None  # module-level so the closure pickles to workers


def set_image_decoder(fn) -> None:
    """THE swap point: install a real decoder (must be picklable, i.e. a
    top-level function) taking bytes → HxWx3 uint8 ndarray. Downstream UDF
    plumbing — Arrow batching, schemas, feature shapes — is unchanged."""
    global _IMAGE_DECODER
    _IMAGE_DECODER = fn


def get_image_decoder():
    """Resolution order: explicitly installed decoder → PIL if importable
    (real decode) → the deterministic stub (this container has no codecs)."""
    if _IMAGE_DECODER is not None:
        return _IMAGE_DECODER
    try:
        import io

        from PIL import Image  # noqa: F401

        def pil_decode(payload: bytes) -> np.ndarray:
            return np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))

        return pil_decode
    except ImportError:
        return _decode_image_stub


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("sha1", T.StringType()),
        T.StructField("mean_intensity", T.DoubleType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def extract_media_features(media: DataFrame) -> DataFrame:
    """Decode + featurize media payloads via mapInPandas (one Python call
    per Arrow batch; payload bytes stay zero-copy through Arrow)."""

    decoder = get_image_decoder()  # resolved at plan time, shipped to workers

    def run(batches):
        for pdf in batches:
            feats, means = [], []
            for payload in pdf["payload"]:
                img = decoder(bytes(payload))
                means.append(float(img.mean()))
                # channel-mean histogram as the stand-in embedding
                feats.append(img.reshape(-1, 3).mean(axis=0).astype(np.float32).tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["payload"].map(len).astype("int32"),
                    "sha1": pdf["payload"].map(lambda b: hashlib.sha1(bytes(b)).hexdigest()),
                    "mean_intensity": means,
                    "feature": feats,
                }
            )

    return media.select("media_id", "payload").mapInPandas(run, FEATURE_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """STUB resize — production swaps the body for a real resample. Shape
    of the operator (binary→binary projection, metadata update) is real."""

    def run(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": pdf["payload"],  # stub: passthrough bytes
                    "width": width,
                    "height": height,
                }
            )

    schema = "media_id long, payload binary, width int, height int"
    return media.select("media_id", "payload").mapInPandas(run, schema)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """STUB video frame sampling: emits (media_id, frame_idx, frame_ts_ms)
    rows from duration metadata — the explode is real, the decode is not."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.greatest((F.col("duration_ms") / every_ms).cast("int") - 1, F.lit(0)))
            ).alias("frame_idx"),
        )
        .withColumn("frame_ts_ms", F.col("frame_idx") * every_ms)
    )


def synthetic_media_df(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic media fixture (binary payloads from seeded bytes)."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = [
        (
            i,
            kinds[i % 3],
            rng.bytes(128 + int(rng.integers(0, 256))),
            "application/octet-stream",
            8,
            8,
            int(rng.integers(1000, 10_000)),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
