"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schema, partitioning, Arrow
batch shapes through ``mapInPandas`` — while the codec step is stubbed
behind an import-try (no image/audio libs in this container): with PIL/etc.
present the real decode runs; without, a clearly-marked deterministic fake
derived from the bytes keeps the pipeline exercisable end-to-end.

Batch sizing: media blobs are large — tune
``spark.sql.execution.arrow.maxRecordsPerBatch`` down (e.g. 64) so an Arrow
batch of decoded frames fits executor memory; the iterator contract of
``mapInPandas`` means we never hold more than one batch per task.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("content", T.BinaryType(), True),  # opaque payload
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
        T.StructField("decoder", T.StringType(), False),  # 'real' | 'stub'
    ]
)

try:  # pragma: no cover - not present in this container
    from PIL import Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False


def generate_media(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table: payload bytes derived from
    sha256(seed, id) — no randomness, no external data."""
    df = spark.range(n)
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.xxhash64(F.lit(seed), "id"), F.lit(3)) + 1).cast("int"),
    )
    blob = F.sha2(F.concat(F.lit(str(seed)), F.col("id").cast("string")), 256)
    return df.select(
        F.col("id").alias("media_id"),
        kind.alias("kind"),
        F.concat(kind, F.lit("/synthetic")).alias("mime"),
        F.when(kind == "image", (F.pmod(F.xxhash64("id"), F.lit(512)) + 16).cast("int"))
        .otherwise(F.lit(None).cast("int")).alias("width"),
        F.when(kind == "image", (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(512)) + 16).cast("int"))
        .otherwise(F.lit(None).cast("int")).alias("height"),
        F.when(kind != "image", (F.pmod(F.xxhash64("id", F.lit(2)), F.lit(60_000)) + 100).cast("int"))
        .otherwise(F.lit(None).cast("int")).alias("duration_ms"),
        # repeat the digest to make a plausibly-sized opaque payload
        F.encode(F.repeat(blob, 16), "utf-8").alias("content"),
    )


def _stub_feature(content: bytes, dim: int) -> np.ndarray:
    """STUB decode: a deterministic unit vector from the payload digest.
    Replace with a real decode+model when codec libs are available."""
    h = hashlib.sha256(content).digest()
    raw = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=np.uint32)
    v = (raw.astype(np.float64) / np.iinfo(np.uint32).max) - 0.5
    n = np.linalg.norm(v)
    return (v / n).astype(np.float32)


def extract_features(df: DataFrame, dim: int = 32) -> DataFrame:
    """Decode + feature-extract via ``mapInPandas`` (Arrow batches, iterator
    contract — one batch in flight per task).  Real decode requires codec
    libs; otherwise the stub path runs and is labeled ``decoder='stub'``."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if _HAVE_PIL:  # pragma: no cover
                raise NotImplementedError(
                    "real image decode goes here (PIL present); wire the model"
                )
            feats = [
                _stub_feature(bytes(c), dim) if c is not None else None
                for c in pdf["content"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                    "decoder": "stub",
                }
            )

    return df.mapInPandas(fn, FEATURE_SCHEMA)


def frame_sample(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled timestamp
    (the decode itself is the stub above).  Pure JVM expansion —
    ``sequence`` + ``explode`` — so the fan-out cost is Spark-native."""
    vids = df.where(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))
        ).alias("frame_ms"),
    )
