"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark side (schemas, batching, partition sizing, UDF signatures) is
real and tested; the codec step is STUBBED because media libraries are
not available in this environment:

* ``decode=\"fake\"`` (default) derives a deterministic feature vector
  from the bytes themselves (md5-seeded), so pipelines and tests run
  end-to-end with stable outputs;
* ``decode=\"real\"`` raises ``NotImplementedError`` at the exact point
  where a PIL/ffmpeg call would go.

At scale: media rows are wide — keep ``spark.sql.files.maxPartitionBytes``
small for balanced partitions, and always select the metadata columns
WITHOUT the binary payload when only metadata is needed (column pruning
keeps the payload unread in parquet).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, FloatType, IntegerType, LongType,
                               StringType, StructField, StructType)

FEATURE_DIM = 16

FEATURES_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("media_type", StringType()),
    StructField("n_bytes", LongType()),
    StructField("content_hash", StringType()),
    StructField("feature", ArrayType(FloatType())),
    StructField("width", IntegerType()),          # fake-decoded metadata
    StructField("height", IntegerType()),
])


def _fake_decode(payload: bytes, media_type: str):
    """Deterministic stand-in for a real codec: md5-seeded features +
    plausible dimensions. Replace with PIL/soundfile/ffmpeg in `real`."""
    digest = hashlib.md5(payload).digest()
    rng = np.frombuffer(digest, dtype=np.uint8).astype(np.float32)
    feature = np.resize(rng, FEATURE_DIM) / 255.0
    width = 16 + int(digest[0]) % 240
    height = 16 + int(digest[1]) % 240
    return feature, width, height


def extract_features(media: DataFrame, payload_col: str = "payload",
                     decode: str = "fake") -> DataFrame:
    """mapInPandas feature extraction over binary payloads. Arrow streams
    the binary column in bounded batches, so executor memory stays flat
    regardless of per-row payload size."""
    if decode == "real":
        raise NotImplementedError(
            "real media decoding requires PIL/ffmpeg, absent here; the "
            "Spark plumbing below is identical for the real path")

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, widths, heights, hashes, sizes = [], [], [], [], []
            for payload in pdf[payload_col]:
                data = bytes(payload) if payload is not None else b""
                f, w, h = _fake_decode(data, "image")
                feats.append(f.tolist())
                widths.append(w)
                heights.append(h)
                hashes.append(hashlib.md5(data).hexdigest())
                sizes.append(len(data))
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "media_type": pdf["media_type"],
                "n_bytes": pd.Series(sizes, dtype="int64"),
                "content_hash": hashes,
                "feature": pd.Series(feats, dtype=object),
                "width": pd.Series(widths, dtype="int32"),
                "height": pd.Series(heights, dtype="int32"),
            })

    return media.mapInPandas(_extract, schema=FEATURES_SCHEMA)


def frame_sample_plan(video: DataFrame, every_n: int = 30) -> DataFrame:
    """Plumbing for frame sampling: explode frame indices from metadata
    (n_frames) WITHOUT touching payloads — the decode of selected frames
    happens in extract_features on the exploded rows."""
    return video.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
                  ).alias("frame_idx"))


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests: payload bytes derived
    from the id."""
    df = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                     (F.pmod("id", F.lit(3)) + 1).cast("int")).alias("media_type"),
        F.encode(F.concat(F.lit("payload-"), F.col("id").cast("string"),
                          F.repeat(F.lit("x"), (F.pmod("id", F.lit(100)) * 17
                                                ).cast("int"))),
                 "utf-8").alias("payload"))
    return df
