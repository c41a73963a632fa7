"""Multimodal column plumbing — binary payloads + typed metadata.

Images/audio/video ride as opaque ``binary`` columns with a metadata struct;
decode/resize/frame-sample run as Arrow-batched ``mapInPandas`` UDFs.  The
actual codec step is STUBBED (no imaging/audio libraries in this
environment): ``decode_stub=True`` produces a deterministic fake feature
vector from the bytes so the Spark-side plumbing — schema, batch shape,
partitioning — is real and testable; a real deployment swaps `_decode_image`
for a PIL/ffmpeg call with the same signature.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),          # image|audio|video
        T.StructField("payload", T.BinaryType(), True),         # opaque bytes
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = hash-derived bytes)."""
    df = spark.range(n).withColumnRenamed("id", "media_id")
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.xxhash64("media_id", F.lit(seed)), F.lit(3)) + 1).cast("int"),
    )
    payload = F.sha2(F.concat(F.lit("payload"), F.col("media_id").cast("string")), 256).cast("binary")
    return df.select(
        "media_id",
        kind.alias("kind"),
        payload.alias("payload"),
        F.struct(
            F.lit(64).alias("width"), F.lit(64).alias("height"),
            (F.pmod(F.xxhash64("media_id"), F.lit(10000))).cast("int").alias("duration_ms"),
            F.lit("stub").alias("codec"),
        ).alias("meta"),
    )


def _decode_image(payload: bytes, decode_stub: bool) -> np.ndarray:
    if not decode_stub:
        # Real path: PIL.Image.open(io.BytesIO(payload)) -> resize -> np array.
        raise NotImplementedError("image decoding requires an imaging library")
    digest = hashlib.sha256(payload or b"").digest()
    return (np.frombuffer(digest, dtype=np.uint8)[:16].astype(np.float32) / 255.0)


def extract_features(media: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads."""

    def fn(batches):
        for pdf in batches:
            feats = [
                _decode_image(p, decode_stub).tolist() if p is not None else None
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0),
                    "feature": feats,
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(fn, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per (media_id, frame_ts) — the
    explode happens JVM-side so the decoder UDF receives a bounded work
    list per partition."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)), F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
        .orderBy("media_id", "frame_ts_ms")
    )
